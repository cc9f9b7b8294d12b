"""Relational extension operators (SURVEY §2.H: H1-H6, H11-H13, H17).

The reference contains no joins, windows, rollups, set ops or date/math
functions (SURVEY §2.G — the file->record->tag correlation is maintained by
denormalization, never a join).  These are the north-star extensions that
make the engine a complete analytics surface, all expressed as declarative
DataFrame plans so Catalyst picks join strategies (with explicit
broadcast/merge hints where we know better) and AQE re-plans at runtime.

Determinism discipline (SURVEY §7): every double aggregate is rounded in
BOTH engines; every top-k carries a unique tiebreak key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debias_spark.catalog import table
from debias_spark.registry import register

# --- joins (H1-H5) -----------------------------------------------------------


@register(
    "join_broadcast_hash",
    "H1",
    oracle="""
    SELECT p_brand,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def join_broadcast_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join with an explicitly broadcast small dimension.

    part is tiny relative to lineitem at every scale; broadcasting removes
    the shuffle of the 100 TB fact side entirely — the join happens map-side
    inside the lineitem scan stage."""
    li = table(spark, sf_dir, "lineitem")
    pt = table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "join_sortmerge_large",
    "H2",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_lines,
           round(sum(l_quantity), 2) AS sum_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_sortmerge_large(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi join: both sides too large to broadcast at target
    scale, so shuffle both on the join key (sort-merge; hinted so local-mode
    autoBroadcast doesn't mask the cluster-scale plan).  At 100 TB this is
    the case for bucketing both tables on orderkey to pre-co-locate."""
    o = table(spark, sf_dir, "orders").hint("merge")
    li = table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@register(
    "join_left_outer",
    "H3",
    oracle="""
    SELECT c_custkey,
           count(o_orderkey) AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 2) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with null handling: customers with zero orders keep a
    row (count of a null column = 0, sum coalesced to 0)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@register(
    "join_semi_anti",
    "H4",
    oracle="""
    SELECT c_custkey, 'has_orders' AS status FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    UNION ALL
    SELECT c_custkey, 'no_orders' AS status FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti joins: existence filters that never duplicate
    the probe side (the right side is only a filter, nothing is joined in)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    cond = c.c_custkey == o.o_custkey
    semi = c.join(o, cond, "left_semi").select("c_custkey", F.lit("has_orders").alias("status"))
    anti = c.join(o, cond, "left_anti").select("c_custkey", F.lit("no_orders").alias("status"))
    return semi.unionAll(anti)


@register(
    "join_multiway_star",
    "H5",
    oracle="""
    SELECT l_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1996-01-01'
    GROUP BY l_orderkey, order_date
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def join_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-table star join, TPC-H Q3 shape: selective dimension filter,
    date-range fact filters (pushed to the scans), chained equi joins,
    agg + deterministic top-k.  Catalyst reorders; the customer side is
    broadcast-eligible after its segment filter."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --- windows (H6) ------------------------------------------------------------


@register(
    "window_rank_lag_frame",
    "H6",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           rank() OVER w AS rk,
           lag(l_quantity) OVER w AS prev_qty,
           round(sum(l_quantity) OVER (
                 PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_quantity, l_extendedprice, l_suppkey, l_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_quantity, l_extendedprice, l_suppkey, l_partkey)
    """,
)
def window_rank_lag_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + analytic + running-frame window functions in one pass:
    one shuffle on the partition key serves all three (same window spec).

    (l_orderkey, l_linenumber) is NOT unique in the testdata, so the window
    orders by enough columns for a total order — any remaining ties are
    between fully identical rows, making lag/rank output well-defined."""
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_quantity", "l_extendedprice", "l_suppkey", "l_partkey"
    )
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.rank().over(w).cast("long").alias("rk"),
        F.lag("l_quantity").over(w).alias("prev_qty"),
        F.round(F.sum("l_quantity").over(frame), 2).alias("running_qty"),
    )


# --- set ops / rollup / approx (H11-H13) -------------------------------------


@register(
    "set_ops",
    "H11",
    oracle="""
    SELECT 'both' AS op, k FROM
        (SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'only_customer' AS op, k FROM
        (SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'any' AS op, k FROM
        (SELECT c_custkey AS k FROM customer UNION SELECT o_custkey FROM orders)
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION (distinct) on key projections, tagged and
    stacked into one result."""
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    both = c.intersect(o).select(F.lit("both").alias("op"), "k")
    only_c = c.exceptAll(o).distinct().select(F.lit("only_customer").alias("op"), "k")
    any_k = c.union(o).distinct().select(F.lit("any").alias("op"), "k")
    return both.unionAll(only_c).unionAll(any_k)


@register(
    "grouping_rollup",
    "H12",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def grouping_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP totals: detail rows + per-flag subtotals + grand total, one
    shuffle (Spark expands grouping sets map-side)."""
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("*").alias("n"),
    )


@register(
    "agg_approx_distinct",
    "H13",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS approx_in_band
    FROM events GROUP BY event_type
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the scale path for distinct
    counts — mergeable sketches, no giant exact-distinct shuffle.

    Banded value oracle (upgraded from rows-only, the X4c/X88 technique):
    the estimate itself is engine-specific and never leaves the query;
    what IS emitted — and what DuckDB can state — is the exact count plus
    whether the estimate lands within ±5% of it (rsd=0.01 guarantees ~1%,
    so the band has 5x margin on any input).  A sketch regression flips
    the boolean and breaks the driver hash.

    Plan shape: distinct (event_type, user_id) pairs FIRST, then a plain
    count + sketch over the deduped rows — HLL is duplicate-insensitive,
    so the estimate is bit-identical to sketching the raw rows, while the
    mixed exact+approx single groupBy would Expand (2x rows through the
    shuffle: one replica per aggregate family).  Measured 1.82s -> 0.87s
    at sf0.1, interleaved min-of-3, outputs exactly equal."""
    ev = table(spark, sf_dir, "events")
    # NULL user_id filtered BEFORE the distinct so the exact count matches
    # the oracle's count(DISTINCT user_id), which never counts the NULL
    # group (the X167 latent-divergence class, r9 advice — swept in r10)
    pairs = (
        ev.select("event_type", "user_id")
        .where(F.col("user_id").isNotNull())
        .distinct()
    )
    agg = pairs.groupBy("event_type").agg(
        F.count("*").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.01).alias("acd"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("acd") - F.col("exact_users"))
            <= F.col("exact_users") * F.lit(0.05)
        ).alias("approx_in_band"),
    )


# --- scalar function pack (H17) ----------------------------------------------


@register(
    "scalar_fn_pack",
    "H17",
    oracle="""
    SELECT event_id,
           CAST(year(ts) AS INTEGER) AS y,
           CAST(month(ts) AS INTEGER) AS m,
           CAST(datediff('day', TIMESTAMP '2024-01-01', ts) AS INTEGER) AS days_in,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day_str,
           round(abs(value), 2) + 0.0 AS abs_val,
           round(power(abs(value), 0.5), 4) + 0.0 AS sqrt_val,
           substr(event_type, 1, 3) AS type3,
           upper(event_type) AS type_uc,
           regexp_extract(props, '"k": *([0-9]+)', 1) AS k_str,
           event_type AS type_from_map,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_json
    FROM events
    """,
)
def scalar_fn_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/math/string/map/json scalar functions in one projection — all
    JVM-side inside whole-stage codegen, no UDFs.  The map columns build
    map_from_entries and read it back with element_at (semantic identity,
    which is exactly what the oracle states)."""
    ev = table(spark, sf_dir, "events")
    m = F.map_from_entries(
        F.array(
            F.struct(F.lit("type").alias("key"), F.col("event_type").alias("value")),
        )
    )
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.datediff(F.col("ts"), F.expr("TIMESTAMP_NTZ '2024-01-01 00:00:00'")).alias("days_in"),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day_str"),
        (F.round(F.abs("value"), 2) + 0.0).alias("abs_val"),
        (F.round(F.pow(F.abs("value"), 0.5), 4) + 0.0).alias("sqrt_val"),
        F.substring("event_type", 1, 3).alias("type3"),
        F.upper("event_type").alias("type_uc"),
        F.regexp_extract("props", '"k": *([0-9]+)', 1).alias("k_str"),
        F.element_at(m, "type").alias("type_from_map"),
        F.get_json_object("props", "$.k").cast("long").alias("k_json"),
    )
