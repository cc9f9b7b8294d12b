"""Eleventh relational wave (X78-X79): distribution statistics on the
scale-safe prefix-sum machinery — grouped weighted median (few huge
groups, the case a plain partitionBy window serializes) and the Gini
coefficient of revenue concentration (global ranks without a global
sort).  Both oracles use the naive single-partition window spelling, so
the hash match IS the proof the bucketed formulations agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debias_spark.catalog import table
from debias_spark.operators.prefixsum import (
    bucketed_cumsum_with_rank,
    grouped_bucketed_cumsum,
)
from debias_spark.registry import register


@register(
    "lineitem_weighted_median_price",
    "X78",
    oracle="""
    WITH v AS (
        SELECT l_returnflag AS flag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
               CAST(l_quantity AS BIGINT) AS w,
               l_orderkey * 8 + l_linenumber AS tb
        FROM lineitem
    ), c AS (
        SELECT flag, cents, w,
               sum(w) OVER (PARTITION BY flag ORDER BY cents, tb
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(w) OVER (PARTITION BY flag) AS total
        FROM v
    )
    SELECT flag,
           count(*) AS n_items,
           CAST(max(total) AS BIGINT) AS total_weight,
           min(CASE WHEN 2 * cum >= total THEN cents END) AS median_cents
    FROM c GROUP BY flag
    """,
)
def lineitem_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag — the weighted
    median has no built-in aggregate in either engine, and the few-huge-
    groups shape (3 flags over billions of lines) makes the textbook
    ``Window.partitionBy(flag)`` cumulative sum a 3-task serialization.
    operators/prefixsum.grouped_bucketed_cumsum runs the running weight
    through (flag, price-range-bucket) windows instead — parallel within
    each flag — and the median is the smallest price whose cumulative
    weight reaches half the flag's total (exact BIGINT comparison, no
    interpolation).  The oracle uses the naive per-flag window; the hash
    match proves the bucketed equivalence."""
    li = table(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("w"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("tb"),
    )
    c = grouped_bucketed_cumsum(
        v, group_col="flag", value_col="w", order_col="cents", tiebreak_col="tb"
    )
    return c.groupBy("flag").agg(
        F.count("*").alias("n_items"),
        F.max("total").cast("long").alias("total_weight"),
        F.min(
            F.when(2 * F.col("cum") >= F.col("total"), F.col("cents"))
        ).alias("median_cents"),
    )


@register(
    "orders_gini_revenue",
    "X79",
    oracle="""
    WITH pc AS (
        SELECT o_custkey,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
        FROM orders GROUP BY o_custkey
    ), r AS (
        SELECT rev,
               row_number() OVER (ORDER BY rev, o_custkey) AS rnk,
               count(*) OVER () AS n,
               sum(rev) OVER () AS t
        FROM pc
    )
    SELECT CAST(max(n) AS BIGINT) AS n_customers,
           CAST(max(t) AS BIGINT) AS total_cents,
           (2 * CAST(sum(rnk * rev) AS BIGINT) - (max(n) + 1) * max(t))
               * 10000 // (max(n) * max(t)) AS gini_bp
    FROM r
    """,
)
def orders_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue (0 bp = perfect equality,
    ~10000 bp = one customer holds everything): G = (2*Σ i*x_i - (n+1)T)
    / (nT) over revenues sorted ascending with rank i.  The global rank
    comes from operators/prefixsum.bucketed_cumsum_with_rank — bucket
    count offsets + within-bucket row_number — so no single-partition
    sort touches the per-customer frame; the oracle's row_number() OVER
    (ORDER BY ...) is the naive spelling being hash-proved.  All terms
    are exact BIGINTs in basis points (Σ i*x_i holds to ~sf10; the
    documented upgrade past that is DECIMAL(38,0), same shape)."""
    o = table(spark, sf_dir, "orders")
    pc = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    r = bucketed_cumsum_with_rank(
        pc, value_col="rev", order_col="rev", tiebreak_col="o_custkey",
        descending=False,
    )
    return r.agg(
        F.max("n_rows").cast("long").alias("n_customers"),
        F.max("total").cast("long").alias("total_cents"),
        F.expr(
            "(2 * CAST(sum(rnk * rev) AS BIGINT)"
            " - (max(n_rows) + 1) * max(total)) * 10000"
            " div (max(n_rows) * max(total))"
        ).alias("gini_bp"),
    )
