"""Round-7 wave 14 (Z62): sliding distinct users via WINDOWED HLL
sketch union — the 100 TB shape the exact key (X119) promises.

Reference parity: none — the reference (SirHooke/debias-batch-processor)
has no sketches; extension per SURVEY §2.H (H13/X28/Z51 sketch family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debias_spark.catalog import table
from debias_spark.registry import register


@register(
    "events_sliding_distinct_hll_banded",
    "Z62",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), days AS MATERIALIZED (
        SELECT DISTINCT day FROM du
    ), win AS (
        SELECT d.day,
               count(DISTINCT u.user_id) AS exact_users
        FROM days d
        JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
        GROUP BY d.day
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(exact_users AS BIGINT) AS exact_users_7d,
           TRUE AS est_in_band
    FROM win ORDER BY day
    """,
)
def events_sliding_distinct_hll_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users via MERGEABLE SKETCHES: one HLL
    sketch per day (bytes, built incrementally), unioned over a 7-row
    window frame — so the rolling reach metric costs sketch merges, not
    a 7-day re-dedup per day.  This delivers the scale path X119's
    docstring promises: the exact sliding distinct shuffles (window,
    user) pairs whose volume multiplies with the slide ratio; the
    sketch version shuffles one ~10KB sketch per day regardless of
    user count, and ANY window length is the same merge.

    Banded value oracle (X28 technique): the estimate never leaves the
    query; emitted are the exact 7-day distinct counts plus whether the
    WINDOWED-UNION estimate lands within ±5% of each (lgConfigK=14,
    ~0.8% standard error — 6x margin covering the union path).  The
    tiny per-day frame makes the window sort intentional-single-
    partition (non-foldable constant key, no degradation warning).

    Scale shape: one map-side-combined daily sketch aggregate + one
    bounded-frame window union; the exact side (for the band) is the
    X119 two-phase distinct, computed once here as the yardstick."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    # ~31-row frame: intentional single partition, non-foldable key
    wconst = F.unix_date("day") * 0
    w = Window.partitionBy(wconst).orderBy("day").rowsBetween(-6, 0)
    est = daily.select(
        "day",
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias("est"),
    )
    du = ev.select(F.to_date("ts").alias("uday"), "user_id").distinct()
    days = du.select(F.col("uday").alias("day")).distinct()
    exact = (
        days.join(
            du,
            (F.col("uday") >= F.date_sub(F.col("day"), 6))
            & (F.col("uday") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    return (
        est.join(exact, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("exact_users").cast("long").alias("exact_users_7d"),
            (
                F.abs(F.col("est") - F.col("exact_users"))
                <= F.col("exact_users") * F.lit(0.05)
            ).alias("est_in_band"),
        )
        .orderBy("day")
    )
