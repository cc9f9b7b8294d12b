"""Distributed prefix sums (running totals over a GLOBAL ordering).

The naive Spark spelling — ``sum(x) OVER (ORDER BY ...)`` with no
PARTITION BY — funnels the entire frame through a single-partition
WindowExec: the exact anti-pattern the round-2 audit flagged on the old
ntile-based RFM key.  It is fine on 16 k rows and fatal on 10 B.

The scale-safe shape implemented here is the classic two-level scan:

1. bucket every row by a range of the primary order column, using exact
   ``percentile`` cutoffs (a mergeable aggregate — map-side partial
   count-maps, no global sort).  Bucketing is monotone w.r.t. the global
   order because ties on the order column always land in the same bucket.
2. cumulative-sum WITHIN each bucket (parallel WindowExec, one shuffle on
   the bucket id).
3. cumulative-sum the per-bucket totals (a frame with as many rows as
   buckets — trivially small) and broadcast-join each bucket's prefix
   offset back.

``global cumsum = bucket offset + within-bucket cumsum`` — identical
values to the single-partition window, computed with bounded per-task
state at any scale.  The DuckDB oracles of callers use the plain
single-partition window spelling, so the equivalence is hash-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bucketed_cumsum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    tiebreak_col: str,
    descending: bool = True,
    n_buckets: int = 16,
) -> DataFrame:
    """Add ``cum`` (running total of ``value_col``) and ``total`` columns
    under the global ordering (order_col desc|asc, tiebreak_col asc),
    without a single-partition window over ``df``.

    ``value_col`` must be integral (bigint) so partial sums are exact and
    order-independent; callers convert money to cents first.
    """
    qs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.agg(F.percentile(order_col, qs).alias("cuts"))
    # bucket id: number of cutoffs at-or-above (desc) / at-or-below (asc)
    # this row — monotone in the order column, ties share a bucket.
    withb = df.crossJoin(F.broadcast(cuts))
    if descending:
        b = sum(
            (F.col(order_col) <= F.get("cuts", k)).cast("int")
            for k in range(n_buckets - 1)
        )
        order = [F.desc(order_col), F.asc(tiebreak_col)]
    else:
        b = sum(
            (F.col(order_col) >= F.get("cuts", k)).cast("int")
            for k in range(n_buckets - 1)
        )
        order = [F.asc(order_col), F.asc(tiebreak_col)]
    withb = withb.withColumn("_b", b).drop("cuts")
    wb = (
        Window.partitionBy("_b")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = withb.withColumn("_within", F.sum(value_col).over(wb))
    bsums = withb.groupBy("_b").agg(F.sum(value_col).alias("_bsum"))
    # per-bucket prefix offsets: a window over <= n_buckets rows — the
    # single-partition window is applied only to this tiny frame.
    wo = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = bsums.select(
        "_b",
        F.coalesce(F.sum("_bsum").over(wo), F.lit(0)).alias("_offset"),
        F.sum("_bsum").over(wall).alias("total"),
    )
    return (
        within.join(F.broadcast(offsets), "_b")
        .withColumn("cum", F.col("_offset") + F.col("_within"))
        .drop("_b", "_within", "_offset")
    )
