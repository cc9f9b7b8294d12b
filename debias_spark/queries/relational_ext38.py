"""Round-7 wave 11 (X158, Y58): inter-purchase time distribution and
length-percentile corpus trim.

Reference parity: none — the reference (SirHooke/debias-batch-processor)
has no analytics beyond two bar charts; extensions per SURVEY §2.H.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debias_spark.catalog import table
from debias_spark.registry import register


@register(
    "orders_interpurchase_gaps",
    "X158",
    oracle="""
    WITH g AS (
        SELECT o_custkey,
               date_diff('day',
                         lag(CAST(o_orderdate AS DATE)) OVER (
                             PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey),
                         CAST(o_orderdate AS DATE)) AS gap_days
        FROM orders
    ), b AS (
        SELECT CASE WHEN gap_days <= 30 THEN '00-030'
                    WHEN gap_days <= 90 THEN '031-090'
                    WHEN gap_days <= 180 THEN '091-180'
                    WHEN gap_days <= 365 THEN '181-365'
                    ELSE '366+' END AS bucket,
               gap_days
        FROM g WHERE gap_days IS NOT NULL
    )
    SELECT bucket,
           count(*) AS n_gaps,
           CAST(min(gap_days) AS BIGINT) AS min_days,
           CAST(max(gap_days) AS BIGINT) AS max_days,
           CAST(sum(gap_days) AS BIGINT) AS total_days
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def orders_interpurchase_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase time distribution: the day gap between each
    customer's consecutive orders, bucketed into the standard
    repurchase-cycle bands — the input to churn-risk rules ("no order
    for > 2x the customer's typical gap") and replenishment models.
    Gaps are exact integer day differences from a lag over the
    (customer, date, orderkey) total order.

    Scale shape: one user-partitioned window (parallel across
    customers, ~10 rows each), then a 5-bucket aggregate.  No global
    sort, no self-join."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = o.select(
        "o_custkey",
        F.datediff(
            F.to_date("o_orderdate"),
            F.lag(F.to_date("o_orderdate")).over(w),
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    bucket = (
        F.when(F.col("gap_days") <= 30, "00-030")
        .when(F.col("gap_days") <= 90, "031-090")
        .when(F.col("gap_days") <= 180, "091-180")
        .when(F.col("gap_days") <= 365, "181-365")
        .otherwise("366+")
    )
    return (
        g.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_gaps"),
            F.min("gap_days").cast("long").alias("min_days"),
            F.max("gap_days").cast("long").alias("max_days"),
            F.sum("gap_days").cast("long").alias("total_days"),
        )
        .orderBy("bucket")
    )


@register(
    "docs_length_percentile_trim",
    "Y58",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
        FROM documents
    ), cuts AS (
        -- exact inverted-CDF percentiles on integer lengths: both
        -- engines pick actual data values, no interpolation ambiguity
        SELECT quantile_disc(n_chars, 0.05) AS lo,
               quantile_disc(n_chars, 0.95) AS hi
        FROM t
    )
    SELECT t.lang,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN t.n_chars >= cuts.lo AND t.n_chars <= cuts.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN t.n_chars >= cuts.lo AND t.n_chars <= cuts.hi
                         THEN t.doc_id ELSE 0 END) AS BIGINT) AS kept_id_sum,
           CAST(max(cuts.lo) AS BIGINT) AS lo_cut,
           CAST(max(cuts.hi) AS BIGINT) AS hi_cut
    FROM t, cuts
    GROUP BY t.lang ORDER BY t.lang
    """,
)
def docs_length_percentile_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-percentile corpus trim: drop the shortest and longest 5%
    of documents by character count — the outlier-trim stage every
    pretraining pipeline runs before quality scoring (fragments and
    concatenation accidents live in the tails).  Cutoffs are EXACT
    discrete percentiles (percentile_disc / quantile_disc pick real data
    values, so both engines cut at the identical integer — no
    interpolated float threshold); kept_id_sum pins the exact surviving
    set per language.

    Scale shape: one mergeable exact-percentile aggregate (count-map
    partials) broadcast back over the scan; one grouped rollup.  At
    100 TB the exact percentile swaps for approx_percentile with a
    banded guard (the X4c pattern) — the plan shape is unchanged."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    )
    cuts = docs.agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY n_chars)").alias("lo"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY n_chars)").alias("hi"),
    )
    j = docs.crossJoin(F.broadcast(cuts))
    kept = (F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi"))
    return (
        j.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.sum(F.when(kept, F.col("doc_id")).otherwise(0))
            .cast("long")
            .alias("kept_id_sum"),
            F.max("lo").cast("long").alias("lo_cut"),
            F.max("hi").cast("long").alias("hi_cut"),
        )
        .orderBy("lang")
    )
