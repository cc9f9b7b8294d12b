"""Fourth relational wave: the remaining canonical TPC-H query shapes
(exists/anti correlated subqueries, disjunctive pushdown, having-filtered
join-back, conditional-aggregate classification, promo ratio), time-series
gap filling, and a manual semi-join prefilter that models Spark's runtime
bloom-filter pruning.

Reference parity note: the reference app (call-debias.py, analytics/) has no
joins or subqueries at all — everything here extends SURVEY §2.H's mandate
(relational breadth for the 100 TB analytics engine), oracled against DuckDB
like every other key.  Determinism rules as everywhere: doubles rounded
identically on both sides, every top-k tiebroken on a unique key, timestamps
surfaced as strings or epoch bigints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debias_spark.catalog import table
from debias_spark.registry import register


@register(
    "tpch_q4_order_priority",
    "X34",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS = left-semi join with a non-equi
    residual.  The semi join keeps the orders side small (quarter filter is
    scan-pushed); no lineitem row survives the join, so the shuffle carries
    only (l_orderkey, l_shipdate)."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1996-04-01 00:00:00'"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o["o_orderkey"] == li["l_orderkey"])
            & (li["l_shipdate"] > o["o_orderdate"]),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q12_priority_class",
    "X35",
    oracle="""
    SELECT l_returnflag,
           count(*) FILTER (o_orderpriority IN ('1-URGENT', '2-HIGH'))
               AS high_line_count,
           count(*) FILTER (o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
               AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def tpch_q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional-aggregate classification.  Both
    counts come from ONE pass over the joined rows (no per-class re-scan);
    the year filter is pushed to the lineitem scan."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "tpch_q14_promo_revenue",
    "X36",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                             THEN CAST(floor(l_extendedprice * (1 - l_discount)
                                             * 100 + 0.5) AS BIGINT)
                             ELSE 0 END)
                 / sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                  * 100 + 0.5) AS BIGINT)), 4)
               AS promo_revenue_pct,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: broadcast dim join + conditional-sum ratio.  part is
    broadcast (dim-sized), so the month of lineitem never shuffles; the
    ratio is computed from two sums of the same single pass.  Revenue is
    integerized per row (floor(x*100+0.5) — pure IEEE ops, bit-identical in
    any engine) so the sums are order-independent bigints: double sums
    depend on partial-aggregation order and can land on opposite sides of
    the final rounding boundary across engines."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1996-03-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1996-04-01 00:00:00'"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev_cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("long")
    promo_cents = F.when(F.col("p_type") == "PROMO", rev_cents).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo_cents) / F.sum(rev_cents), 4).alias(
                "promo_revenue_pct"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "tpch_q18_large_orders",
    "X23",
    oracle="""
    WITH big AS (
        SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 260
    )
    SELECT c_name, o.o_orderkey, round(o_totalprice, 2) AS o_totalprice,
           sum_qty
    FROM big JOIN orders o ON big.l_orderkey = o.o_orderkey
             JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o.o_orderkey LIMIT 20
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate joined back to its
    parents.  The heavy groupBy(l_orderkey) runs FIRST and the >260 filter
    cuts it to ~1% before any join, so the join inputs are tiny; order of
    operations is the whole point of this plan at scale."""
    li = table(spark, sf_dir, "lineitem")
    # filter on the RAW sum (matching the oracle's HAVING sum(l_quantity) >
    # 260 exactly); round only in the projected column.  Filtering on the
    # rounded value is equivalent only while l_quantity is integral, which
    # a testdata regeneration could silently change.
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .filter(F.col("raw_qty") > 260)
        .select("l_orderkey", F.round(F.col("raw_qty"), 2).alias("sum_qty"))
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "o_orderkey", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@register(
    "tpch_q19_disjunctive",
    "X24",
    oracle="""
    SELECT round(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                          AS BIGINT)) / 100.0, 2) AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive (OR-of-ANDs) join residual.  Catalyst
    extracts the common subexpressions it can push: the brand/size
    disjunction prunes the broadcast part side at its scan, and only the
    mixed part+lineitem terms stay as the join residual."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & s.between(1, 15) & q.between(1, 20))
        | ((b == "Brand#23") & s.between(10, 30) & q.between(10, 30))
        | ((b == "Brand#3") & s.between(20, 50) & q.between(20, 40))
    )
    # integer-cents revenue: per-row floor(x*100+0.5) is bit-identical
    # across engines, and the bigint sum is order-independent — the raw
    # double sum depends on partial-aggregation order.
    rev_cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("long")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.round(F.sum(rev_cents) / 100.0, 2).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@register(
    "tpch_q22_idle_balances",
    "X25",
    oracle="""
    WITH avg_bal AS (
        SELECT sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) * 1.0
               / count(*) AS a_cents
        FROM customer WHERE c_acctbal > 0.0
    ), recent AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '2000-08-01'
    )
    SELECT c_nationkey, count(*) AS numcust,
           round(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0, 2)
               AS totacctbal
    FROM customer, avg_bal
    WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) > a_cents
      AND c_custkey NOT IN (SELECT o_custkey FROM recent)
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def tpch_q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery + NOT EXISTS anti join.  The global
    average is a 1-row broadcast (never a collect); the anti join's build
    side is the filtered DISTINCT custkey set.  (Adapted predicate: every
    synthetic customer has orders, so 'no order at all' would be empty —
    'no order in the final year' keeps the anti join selective.)  Balances
    are integerized per row (floor(x*100+0.5), bit-identical IEEE ops) so
    both the average threshold and the group totals are order-independent
    — a double avg() depends on partial-aggregation order, and a customer
    sitting within one ulp of it can flip sides across engines."""
    c = table(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(cents) * 1.0 / F.count("*")).alias("a_cents")
    )
    recent = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '2000-08-01 00:00:00'"))
        .select("o_custkey")
        .distinct()
    )
    return (
        c.withColumn("bal_cents", cents)
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("bal_cents") > F.col("a_cents"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("bal_cents") / 100.0, 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "timeseries_gapfill",
    "X26",
    oracle="""
    WITH bounds AS (
        SELECT CAST(floor(epoch(min(ts)) / 3600) * 3600 AS BIGINT) AS start_s
        FROM events
    ), grid AS (
        SELECT unnest(generate_series(start_s, start_s + 23 * 3600, 3600)) AS hour_s
        FROM bounds
    ), types AS (
        SELECT DISTINCT event_type FROM events
    ), counts AS (
        SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS hour_s,
               event_type, count(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT g.hour_s, t.event_type, coalesce(c.n, 0) AS n
    FROM grid g CROSS JOIN types t
    LEFT JOIN counts c ON c.hour_s = g.hour_s AND c.event_type = t.event_type
    ORDER BY g.hour_s, t.event_type
    """,
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a dense hour x event_type grid left-joined
    to sparse counts, zeros where no events landed.  The grid is generated
    from a 1-row aggregate (sequence + explode — never a driver loop) and is
    tiny, so it broadcasts; the only big-data pass is the counts aggregate.
    Hours surface as epoch bigints (timestamp-free comparison contract)."""
    ev = table(spark, sf_dir, "events")
    # NTZ -> epoch seconds: cast to (UTC-session) timestamp first, as
    # everywhere else in the engine (ANSI mode forbids ntz -> bigint).
    sec = F.unix_seconds(F.col("ts").cast("timestamp"))
    hour_s = (sec - F.pmod(sec, F.lit(3600))).alias("hour_s")
    counts = ev.select(hour_s, "event_type").groupBy("hour_s", "event_type").agg(
        F.count("*").alias("n")
    )
    bounds = ev.agg(
        (F.min(sec) - F.pmod(F.min(sec), F.lit(3600))).alias("start_s")
    )
    grid = bounds.select(
        F.explode(
            F.sequence(
                F.col("start_s"), F.col("start_s") + 23 * 3600, F.lit(3600)
            )
        ).alias("hour_s")
    )
    types = ev.select("event_type").distinct()
    dense = F.broadcast(grid.crossJoin(types))
    return (
        dense.join(counts, ["hour_s", "event_type"], "left")
        .select("hour_s", "event_type", F.coalesce("n", F.lit(0)).alias("n"))
        .orderBy("hour_s", "event_type")
    )


@register(
    "snapshot_diff_full_outer",
    "X29",
    oracle="""
    WITH old AS (
        SELECT o_orderkey, round(o_totalprice, 2) AS price
        FROM orders WHERE o_orderkey % 10 <> 0
    ), new AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0
                    THEN round(o_totalprice * 1.1, 2)
                    ELSE round(o_totalprice, 2) END AS price
        FROM orders WHERE o_orderkey % 7 <> 0
    )
    SELECT CASE WHEN old.o_orderkey IS NULL THEN 'added'
                WHEN new.o_orderkey IS NULL THEN 'removed'
                WHEN old.price <> new.price THEN 'changed'
                ELSE 'unchanged' END AS status,
           count(*) AS n,
           CAST(sum(coalesce(old.o_orderkey, new.o_orderkey)) AS BIGINT)
               AS key_checksum
    FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
    GROUP BY status ORDER BY status
    """,
)
def snapshot_diff_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (CDC-style): FULL OUTER join of two table versions on
    the primary key, each row classified added / removed / changed /
    unchanged, rolled up to counts + a key checksum.  The two 'versions'
    are deterministic views of the same orders table (drop o_orderkey%10
    from old, drop %7 from new, reprice %3), so the diff is exactly
    reproducible.  At 100 TB both sides shuffle once on the join key — the
    same single-shuffle co-partitioning as any equi-join, and the classify +
    rollup is map-side after it; with bucketed snapshot layout even that
    shuffle disappears."""
    base = table(spark, sf_dir, "orders")
    old = base.filter(F.col("o_orderkey") % 10 != 0).select(
        F.col("o_orderkey").alias("k_old"),
        F.round("o_totalprice", 2).alias("price_old"),
    )
    new = base.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("k_new"),
        F.when(
            F.col("o_orderkey") % 3 == 0, F.round(F.col("o_totalprice") * 1.1, 2)
        )
        .otherwise(F.round("o_totalprice", 2))
        .alias("price_new"),
    )
    status = (
        F.when(F.col("k_old").isNull(), "added")
        .when(F.col("k_new").isNull(), "removed")
        .when(F.col("price_old") != F.col("price_new"), "changed")
        .otherwise("unchanged")
    )
    return (
        old.join(new, F.col("k_old") == F.col("k_new"), "full_outer")
        .select(
            status.alias("status"),
            F.coalesce("k_old", "k_new").alias("k"),
        )
        .groupBy("status")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("long").alias("key_checksum"),
        )
        .orderBy("status")
    )


@register(
    "agg_hll_sketch_union",
    "X28",
    oracle="""
    SELECT CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           count(*) AS n_events,
           count(DISTINCT user_id) AS exact_uniques,
           TRUE AS union_in_band
    FROM events
    """,
)
def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: one HLL sketch per day
    (hll_sketch_agg), union-merged into the period estimate
    (hll_union_agg -> hll_sketch_estimate).  This two-level shape is THE
    100 TB distinct-counting pattern: daily partitions build sketches
    incrementally (bytes per day, not user lists), and any period rollup is
    a cheap sketch union — no re-scan of history, unlike a flat
    count(DISTINCT) whose shuffle grows with the period.

    Banded value oracle (upgraded from rows-only, the X4c/X88 technique):
    the union estimate never leaves the query; emitted instead are the
    exact uniques plus whether the DAILY-SKETCH-UNION estimate lands within
    ±5% of exact (lgConfigK=14 gives ~0.8% standard error — 6x margin, and
    crucially the band covers the union-of-sketches path, not just one
    sketch).  The ±5% property test in tests/test_llm_ops_properties.py
    remains as the sf-independent guard."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"),
        F.count("*").alias("n_events"),
    )
    unioned = daily.agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("n_events").alias("n_events"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = ev.agg(F.countDistinct("user_id").alias("exact_uniques"))
    return unioned.crossJoin(F.broadcast(exact)).select(
        "n_days",
        "n_events",
        "exact_uniques",
        (
            F.abs(F.col("est") - F.col("exact_uniques"))
            <= F.col("exact_uniques") * F.lit(0.05)
        ).alias("union_in_band"),
    )


@register(
    "join_prefilter_hashbucket",
    "X27",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'PROMO' AND p_size <= 10
    """,
)
def join_prefilter_hashbucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join runtime prefilter: the selective dim's join keys are hashed
    into coarse buckets (a one-hash Bloom filter), broadcast, and applied to
    the fact BEFORE the real join — the hand-rolled form of Spark's runtime
    bloom-filter join pruning (spark.sql.optimizer.runtime.bloomFilter.*,
    which production enables instead of this).  The prefilter passes a
    superset, the exact broadcast join then decides membership, so the
    result is identical to the plain join the oracle states — at 100 TB the
    win is fact rows dropped at the scan instead of carried to the join."""
    dim = (
        table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "PROMO") & (F.col("p_size") <= 10))
        .select("p_partkey")
    )
    buckets = dim.select(
        F.pmod(F.xxhash64("p_partkey"), F.lit(8192)).alias("b")
    ).distinct()
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    prefiltered = li.join(
        F.broadcast(buckets),
        F.pmod(F.xxhash64("l_partkey"), F.lit(8192)) == F.col("b"),
        "left_semi",
    )
    return prefiltered.join(
        F.broadcast(dim), F.col("l_partkey") == F.col("p_partkey")
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count("*").alias("n"),
    )
