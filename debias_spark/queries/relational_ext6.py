"""Sixth relational wave (X40-X48): TPC-H suite completion — Q2, Q7, Q8,
Q9, Q11, Q13, Q15, Q16, Q20.

With these, every TPC-H query shape is registered (Q1/Q3-Q6/Q10/Q12/Q14/
Q17-Q19/Q21/Q22 landed in earlier waves).  The testdata has no ``partsupp``
table and ``part``/``supplier`` lack a few columns (p_mfgr, p_container,
s_address, comments), so Q2/Q11/Q16/Q20 are ADAPTED: the part-supplier
relation is derived from ``lineitem`` (which supplier actually shipped
which part, at what unit price / quantity) and comment-regex filters map to
existing columns.  Each adaptation keeps the query's defining PLAN SHAPE —
correlated min decorrelated by join-back (Q2), scalar-subquery fraction
threshold (Q11), distinct-agg + NOT-IN exclusion (Q16), dominant-share
semi-join chain (Q20) — which is what the suite exercises.

Determinism discipline (same as the ext4/ext5 waves): money is integerized
per row as floor(x*100+0.5) cents — bit-identical IEEE ops in any engine —
so every sum is an order-independent bigint and every rounded output or
threshold comparison is engine-exact.  Quantities are integral doubles, so
their sums are exact without integerization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debias_spark.catalog import table
from debias_spark.registry import register

# per-row revenue in integer cents (order-independent bigint sums)
_REV_CENTS_SQL = "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)"


def _rev_cents() -> F.Column:
    return F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("long")


@register(
    "tpch_q7_nation_trade",
    "X40",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           round(sum({_REV_CENTS_SQL}) / 100.0, 2) + 0.0 AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
       OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): revenue flowing between two nations, per
    year, both directions.  Plan shape: supplier and customer are each
    nation-FILTERED first (broadcast of the 2-row nation side cuts both to
    ~2/25 before any fact join), lineitem joins orders on the order key,
    then the reduced supplier/customer sides attach — no forced broadcast
    of SF-scaled tables; AQE picks broadcast at small SF from measured
    sizes.  The pair disjunction is evaluated on the two attached nation
    names, exactly as written."""
    nations = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_8")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", _rev_cents().alias("cents")
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8")
    ) | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg((F.round(F.sum("cents") / 100.0, 2) + 0.0).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q8_market_share",
    "X41",
    oracle=f"""
    WITH vol AS (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               {_REV_CENTS_SQL} AS cents,
               n1.n_name AS supp_nation
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region   ON n2.n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
    )
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END)
                 * 1.0 / sum(cents), 4) + 0.0 AS mkt_share
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_3's share of STANDARD-part
    revenue sold into the EUROPE customer market, per order year.  Plan
    shape: the customer side is region-filtered via broadcast
    nation+region; the part filter broadcasts into the fact scan; the share
    is a conditional-sum ratio over ONE pass (no second scan for the
    denominator).  Integer-cents numerator/denominator make the ratio
    engine-exact."""
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro_nations = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("euro_nk"))
    cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(euro_nations), F.col("c_nationkey") == F.col("euro_nk"))
        .select("c_custkey")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD").select(
        "p_partkey"
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", _rev_cents().alias("cents")
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    vol = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
    )
    brazil = F.when(F.col("supp_nation") == "NATION_3", F.col("cents")).otherwise(
        F.lit(0)
    )
    return (
        vol.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (F.round(F.sum(brazil) * 1.0 / F.sum("cents"), 4) + 0.0).alias(
                "mkt_share"
            )
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q9_product_profit",
    "X42",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           round(sum(CAST(floor((l_extendedprice * (1 - l_discount)
                                 - 0.6 * p_retailprice * l_quantity) * 100
                                + 0.5) AS BIGINT)) / 100.0, 2) + 0.0 AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, o_year
    ORDER BY nation, o_year
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), ADAPTED: no partsupp, so supply cost
    is proxied as 60% of p_retailprice (reference parity is the SHAPE —
    profit expression over a 5-way star join, grouped by supplier nation
    and order year).  Per-row profit is integerized to cents before the sum
    (can be negative; floor(x+0.5) is the same IEEE op in both engines
    either side of zero).  The part-name filter broadcasts; supplier/nation
    attach to the fact after its orders join."""
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit_cents = F.floor(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
        )
        * 100
        + 0.5
    ).cast("long")
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg((F.round(F.sum(profit_cents) / 100.0, 2) + 0.0).alias("profit"))
        .orderBy("nation", "o_year")
    )


@register(
    "tpch_q13_order_distribution",
    "X43",
    oracle="""
    WITH per_cust AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM per_cust GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): histogram of
    per-customer order counts, excluding urgent orders (the comment-regex
    exclusion mapped onto o_orderpriority).  Plan shape: orders are
    AGGREGATED FIRST on o_custkey (one fact-sized shuffle collapsed
    map-side), then customer LEFT-joins the counts on the same key — both
    sides partitioned by custkey, and zero-order customers surface via the
    left join + coalesce, never via a fact-side outer join.  Pure counts:
    no floating point anywhere."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    per_cust_orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    per_cust = c.join(
        per_cust_orders, F.col("c_custkey") == F.col("o_custkey"), "left"
    ).select(F.coalesce(F.col("n_orders"), F.lit(0)).alias("c_count"))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_q15_top_supplier",
    "X44",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey, sum({_REV_CENTS_SQL}) AS total_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           round(total_cents / 100.0, 2) + 0.0 AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_cents = (SELECT max(total_cents) FROM rev)
    ORDER BY s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) achieving the maximum revenue
    in one quarter.  Plan shape: the revenue view is one date-pruned
    aggregate; the scalar max is a 1-row broadcast cross join (never a
    collect); the equality filter then keeps the argmax row(s); supplier
    names attach last, on the already-tiny winner set.  Integer-cents totals
    make the max comparison exact — a double sum could disagree with the
    oracle's max by one ulp and return a different supplier."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1997-04-01 00:00:00'"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev_cents()).alias("total_cents"))
    mx = rev.agg(F.max("total_cents").alias("max_cents"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_cents") == F.col("max_cents"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.round(F.col("total_cents") / 100.0, 2) + 0.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q2_min_cost_supplier",
    "X45",
    oracle="""
    WITH psel AS (
        SELECT p_partkey, p_name FROM part
        WHERE p_size BETWEEN 10 AND 30 AND p_type = 'LARGE'
    ), unit AS (
        SELECT l_partkey, l_suppkey,
               min(CAST(floor(l_extendedprice / l_quantity * 100 + 0.5)
                        AS BIGINT)) AS unit_cents
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM psel)
        GROUP BY l_partkey, l_suppkey
    ), euro_supp AS (
        SELECT s_suppkey, s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ), offers AS (
        SELECT u.l_partkey, u.l_suppkey, u.unit_cents, e.s_name, e.n_name
        FROM unit u JOIN euro_supp e ON e.s_suppkey = u.l_suppkey
    ), best AS (
        SELECT l_partkey AS bp, min(unit_cents) AS best_cents
        FROM offers GROUP BY l_partkey
    )
    SELECT p_partkey, p_name, s_name, n_name AS supp_nation,
           round(unit_cents / 100.0, 2) + 0.0 AS unit_price
    FROM offers
    JOIN best ON bp = l_partkey AND unit_cents = best_cents
    JOIN psel ON p_partkey = l_partkey
    ORDER BY p_partkey, s_name
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), ADAPTED: no partsupp, so the offer
    relation is derived from lineitem — a supplier's unit price for a part
    is the min observed extendedprice/quantity, in cents.  The defining
    shape survives intact: a correlated MIN subquery decorrelated as a
    per-part aggregate joined back on (partkey, price), restricted to one
    region's suppliers, with attribute filters on part.  All-ties semantics
    match TPC-H (every supplier at the min price returns).  The selective
    part filter is applied FIRST as a semi join into lineitem — the offer
    aggregate and per-part min then run over ~3% of the fact instead of all
    of it (the filter-last form scanned lineitem twice in full).  The
    join-back reuses the partkey partitioning of the offers aggregate."""
    psel = table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 30) & (F.col("p_type") == "LARGE")
    ).select("p_partkey", "p_name")
    li = table(spark, sf_dir, "lineitem")
    unit = (
        li.join(
            psel.select("p_partkey"),
            F.col("p_partkey") == F.col("l_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.floor(
                    F.col("l_extendedprice") / F.col("l_quantity") * 100 + 0.5
                ).cast("long")
            ).alias("unit_cents")
        )
    )
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro_supp = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", F.col("n_name").alias("supp_nation"))
    )
    offers = unit.join(euro_supp, F.col("s_suppkey") == F.col("l_suppkey"))
    best = offers.groupBy(F.col("l_partkey").alias("bp")).agg(
        F.min("unit_cents").alias("best_cents")
    )
    p = psel
    return (
        offers.join(
            best,
            (F.col("bp") == F.col("l_partkey"))
            & (F.col("unit_cents") == F.col("best_cents")),
        )
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "supp_nation",
            (F.round(F.col("unit_cents") / 100.0, 2) + 0.0).alias("unit_price"),
        )
        .orderBy("p_partkey", "s_name")
    )


@register(
    "tpch_q11_important_inventory",
    "X46",
    oracle=f"""
    WITH top_nation AS (
        SELECT s_nationkey FROM supplier GROUP BY s_nationkey
        ORDER BY count(*) DESC, s_nationkey LIMIT 1
    ), nat_value AS (
        SELECT l_partkey, CAST(sum({_REV_CENTS_SQL}) AS BIGINT) AS value_cents
        FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        WHERE s_nationkey = (SELECT s_nationkey FROM top_nation)
        GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, value_cents
    FROM nat_value
    WHERE value_cents > (SELECT sum(value_cents) * 0.001 FROM nat_value)
    ORDER BY value_cents DESC, p_partkey
    """,
)
def tpch_q11_important_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock), ADAPTED: no partsupp, so a part's value
    held by a nation = revenue its suppliers shipped of that part; the
    nation is the one with the most suppliers (deterministic tie-break on
    key) so the query is non-empty at every SF.  The defining shape
    survives: group per part, keep parts above a FRACTION of the nation
    total — a scalar subquery over the same aggregate, broadcast as one
    row, never a collect.  Integer-cents values make the fraction threshold
    engine-exact."""
    supp = table(spark, sf_dir, "supplier")
    top_nation = (
        supp.groupBy("s_nationkey")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "s_nationkey")
        .limit(1)
        .select("s_nationkey")
    )
    nat_supp = supp.join(
        F.broadcast(top_nation), "s_nationkey", "left_semi"
    ).select("s_suppkey")
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", _rev_cents().alias("cents")
    )
    nat_value = (
        li.join(nat_supp, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum("cents").alias("value_cents"))
    )
    threshold = nat_value.agg(
        (F.sum("value_cents") * 0.001).alias("thresh")
    )
    return (
        nat_value.crossJoin(F.broadcast(threshold))
        .filter(F.col("value_cents") > F.col("thresh"))
        .select(F.col("l_partkey").alias("p_partkey"), "value_cents")
        .orderBy(F.desc("value_cents"), "p_partkey")
    )


@register(
    "tpch_q16_supplier_count",
    "X47",
    oracle="""
    WITH excluded AS (
        SELECT s_suppkey FROM supplier
        WHERE s_acctbal < (SELECT avg(s_acctbal) * 0.5 FROM supplier)
    )
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'MEDIUM'
      AND p_size IN (1, 9, 15, 20, 25, 36, 44, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM excluded)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (part-supplier relationships), ADAPTED: the part-supplier
    relation comes from lineitem; the complaint-comment exclusion maps to
    suppliers holding under half the average account balance.  The defining
    shape survives: distinct-supplier count per part attribute triple, an
    attribute IN-list pruned at the part scan, and a NOT-IN exclusion run
    as a LEFT-ANTI join (build side = the excluded supplier set, which is
    supplier-scaled — AQE chooses broadcast at small SF; the anti join
    never rewrites to a nullable NOT-IN nested loop because the subquery is
    join-keyed)."""
    supp = table(spark, sf_dir, "supplier")
    avg_bal = supp.agg((F.avg("s_acctbal") * 0.5).alias("half_avg"))
    excluded = (
        supp.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("s_acctbal") < F.col("half_avg"))
        .select("s_suppkey")
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 9, 15, 20, 25, 36, 44, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(excluded, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q20_dominant_supplier",
    "X48",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty_ps
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%bolt%'
        GROUP BY l_partkey, l_suppkey
    ), totals AS (
        SELECT l_partkey AS tp, sum(qty_ps) AS qty_p,
               count(*) AS n_supp
        FROM ps GROUP BY l_partkey
    ), dominant AS (
        SELECT DISTINCT l_suppkey FROM ps JOIN totals ON tp = l_partkey
        WHERE n_supp > 1 AND qty_ps * n_supp > 3.0 * qty_p
    )
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
    ORDER BY s_suppkey
    """,
)
def tpch_q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (excess-stock suppliers), ADAPTED: no partsupp availqty,
    so the correlated half-sum test becomes a dominant-share test —
    suppliers who shipped more than 3x their fair share (share * n_supp >
    3) of some bolt part with multiple suppliers.  Share thresholds are
    scale-free, so the key stays selective-but-nonempty at every SF.  The
    defining shape survives: two-level aggregate (part-supplier, then
    part), join-back on the part key (partitioning reused), DISTINCT
    supplier set, then a SEMI join into supplier — the name table never
    joins the fact.  Quantities are integral doubles: sums and the 3x
    comparison are exact."""
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%")).select(
        "p_partkey"
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    ps = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty_ps"))
    )
    totals = ps.groupBy(F.col("l_partkey").alias("tp")).agg(
        F.sum("qty_ps").alias("qty_p"), F.count("*").alias("n_supp")
    )
    dominant = (
        ps.join(totals, F.col("tp") == F.col("l_partkey"))
        .filter(
            (F.col("n_supp") > 1)
            & (F.col("qty_ps") * F.col("n_supp") > 3.0 * F.col("qty_p"))
        )
        .select("l_suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        s.join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .orderBy("s_suppkey")
    )
