"""Fifth relational wave (X30-X31): customer RFM segmentation and event
dwell-time — two everyday product-analytics workloads, each a distinct
plan shape (agg -> global quantile bucketing; per-key lead window).

Reference parity note: the reference app has no joins/windows at all
(SURVEY §2.G); these extend the §2.H mandate and are DuckDB-oracled like
every other key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debias_spark.catalog import table
from debias_spark.registry import register


@register(
    "customer_rfm_segments",
    "X30",
    oracle="""
    WITH rfm AS (
        SELECT o_custkey,
               CAST(max(floor(epoch(o_orderdate))) AS BIGINT) AS last_s,
               count(*) AS frequency,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS monetary_cents
        FROM orders GROUP BY o_custkey
    ), scored AS (
        SELECT o_custkey, last_s, frequency, monetary_cents,
               ntile(4) OVER (ORDER BY last_s, o_custkey) AS r_score,
               ntile(4) OVER (ORDER BY frequency, o_custkey) AS f_score,
               ntile(4) OVER (ORDER BY monetary_cents, o_custkey) AS m_score
        FROM rfm
    )
    SELECT r_score, f_score, m_score,
           count(*) AS n_customers,
           CAST(sum(monetary_cents) // count(*) AS BIGINT) AS avg_monetary_cents
    FROM scored GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency/frequency/monetary aggregate,
    quartile-scored (ntile over deterministic total orders — ties broken on
    the key), rolled up to segment sizes.  Plan shape: one groupBy shuffle,
    then three ntiles sharing ONE single-partition sort (the scored frame
    is one row per customer — small), then a map-side rollup.  At 100 TB
    the per-customer frame is the only global sort input and it is ~1/400th
    of the raw data; beyond that, replace ntile with approx percentile
    cutoffs joined back (documented, not needed at this scale)."""
    o = table(spark, sf_dir, "orders")
    # money as integer cents: bigint sums are order-independent and
    # engine-exact, so both the ntile ordering and the averages are
    # deterministic (double sums can differ in the last ulp across engines
    # and land on opposite sides of a half-cent rounding boundary).
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    rfm = o.groupBy("o_custkey").agg(
        F.max(F.unix_seconds(F.col("o_orderdate").cast("timestamp"))).alias("last_s"),
        F.count("*").alias("frequency"),
        F.sum(cents).alias("monetary_cents"),
    )
    scored = rfm.select(
        "o_custkey",
        "frequency",
        "monetary_cents",
        F.ntile(4).over(Window.orderBy("last_s", "o_custkey")).cast("long").alias("r_score"),
        F.ntile(4).over(Window.orderBy("frequency", "o_custkey")).cast("long").alias("f_score"),
        F.ntile(4).over(Window.orderBy("monetary_cents", "o_custkey")).cast("long").alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_customers"),
            # integer division keeps the average engine-exact (Spark round()
            # on doubles uses the shortest decimal repr, DuckDB the true
            # binary value — they disagree at half-cent boundaries)
            F.expr("sum(monetary_cents) div count(*)").alias("avg_monetary_cents"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@register(
    "event_dwell_time",
    "X31",
    oracle="""
    WITH nexted AS (
        SELECT event_type,
               floor(epoch(lead(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)))
                   - floor(epoch(ts)) AS dwell_s
        FROM events
    )
    SELECT event_type,
           count(dwell_s) AS n_dwells,
           CAST(sum(dwell_s) AS BIGINT) AS total_dwell_s,
           round(avg(dwell_s), 4) AS avg_dwell_s
    FROM nexted WHERE dwell_s IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def event_dwell_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell time: per user, seconds until that user's next event (lead
    over the user/time window — each user's LAST event has no dwell and is
    excluded), averaged per event type.  One shuffle on user_id for the
    window, map-side combine for the rollup — the canonical event-analytics
    plan at any scale."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_seconds(F.col("ts").cast("timestamp"))
    dwell = F.lead(sec).over(w) - sec
    return (
        ev.select("event_type", dwell.alias("dwell_s"))
        .filter(F.col("dwell_s").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_dwells"),
            F.sum("dwell_s").cast("long").alias("total_dwell_s"),
            F.round(F.avg("dwell_s"), 4).alias("avg_dwell_s"),
        )
        .orderBy("event_type")
    )
