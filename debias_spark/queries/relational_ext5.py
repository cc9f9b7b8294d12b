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
    "tpch_q17_small_quantity",
    "X32",
    oracle="""
    WITH part_avg AS (
        SELECT l_partkey AS pk, 0.5 * avg(l_quantity) AS half_avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN part_avg ON pk = l_partkey
    WHERE p_brand = 'Brand#12' AND l_quantity < half_avg_qty
    """,
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar aggregate (each line compared to
    ITS part's average quantity).  Decorrelated the way Catalyst would: the
    per-part average is a groupBy joined back — and since one row per part
    is dim-sized, BOTH joins broadcast and the fact never shuffles.  (The
    naive correlated form re-aggregates per probe row — quadratic; the
    decorrelated form is two linear passes.)"""
    li = table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12").select(
        "p_partkey"
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(part_avg), F.col("pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q21_sole_late_shipper",
    "X33",
    oracle="""
    WITH late AS (
        SELECT l_orderkey, l_suppkey FROM lineitem JOIN orders
          ON o_orderkey = l_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    SELECT s_name, count(*) AS numwait
    FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name ORDER BY numwait DESC, s_name
    """,
)
def tpch_q21_sole_late_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: double-correlated EXISTS + NOT EXISTS — suppliers
    who were the ONLY late shipper on a multi-supplier order.  Both
    correlations run as semi/anti joins on the order key: one left-semi
    against other-supplier lines, one left-anti against other-supplier
    LATE lines; the late set is computed once and reused for probe and
    anti sides.  Every join is key-partitioned — no per-row re-scan, which
    is what the correlated subquery would naively do."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = late.alias("l3")
    others = l1.join(
        l2,
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "left_semi",
    )
    sole = others.join(
        l3,
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
        "left_anti",
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
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
