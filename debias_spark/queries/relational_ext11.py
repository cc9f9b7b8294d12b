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


@register(
    "events_cusum_changepoint",
    "X80",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS n
        FROM events GROUP BY day
    ), stats AS (
        SELECT CAST(sum(n) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n_days
        FROM daily
    ), cusum AS (
        SELECT day, n,
               CAST(sum(n * (SELECT n_days FROM stats))
                    OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 - CAST(row_number() OVER (ORDER BY day) AS BIGINT)
                   * (SELECT total FROM stats) AS dev_scaled
        FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS changepoint_day,
           n AS day_count,
           abs(dev_scaled) AS cusum_magnitude
    FROM cusum ORDER BY abs(dev_scaled) DESC, day LIMIT 1
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection over daily event volume: the day where
    the cumulative deviation from the global mean rate peaks — the
    standard level-shift detector.  Deviations are kept EXACT by scaling
    into integer units (sum(n)*n_days - i*total instead of sum(n - mean)
    with a fractional mean), so the argmax cannot flip on float error.
    The cumulative window runs over the DAILY frame — one row per day,
    thousands of rows at any corpus scale — so the unpartitioned window
    is bounded by calendar length, not data volume (the same
    small-frame exemption as the prefix-sum offset scans)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from debias_spark.catalog import table as _table

    ev = _table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count("*").alias("n"))
    stats = daily.agg(
        F.sum("n").alias("total"), F.count("*").alias("n_days")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wr = Window.orderBy("day")
    cusum = (
        daily.crossJoin(F.broadcast(stats))
        .withColumn(
            "dev_scaled",
            (F.sum(F.col("n") * F.col("n_days")).over(w)).cast("long")
            - F.row_number().over(wr).cast("long") * F.col("total"),
        )
    )
    return (
        cusum.select(
            F.date_format("day", "yyyy-MM-dd").alias("changepoint_day"),
            F.col("n").alias("day_count"),
            F.abs("dev_scaled").alias("cusum_magnitude"),
        )
        .orderBy(F.desc("cusum_magnitude"), "changepoint_day")
        .limit(1)
    )


@register(
    "sql_lateral_topn_nations",
    "X81",
    oracle="""
    SELECT r.r_name, l.n_name, l.n_customers
    FROM region r, LATERAL (
        SELECT n.n_name, count(*) AS n_customers
        FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
        WHERE n.n_regionkey = r.r_regionkey
        GROUP BY n.n_name
        ORDER BY n_customers DESC, n_name LIMIT 2
    ) l
    """,
)
def sql_lateral_topn_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:1999 lateral derived table, Spark
    4 syntax): per region, the top-2 nations by customer count — the
    near-identical SQL text runs in DuckDB as the oracle, demonstrating
    the engine's ANSI lateral surface rather than a DataFrame spelling
    (the window row_number equivalent lives in H6/X11 keys).  Catalyst
    decorrelates the lateral into a join + per-group top-k under the
    hood, so the declarative form costs nothing over the manual one.

    Engine-knowledge note from this round: Spark 4.1's WITH RECURSIVE
    supports UNION ALL only (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), so
    cyclic transitive closure is NOT yet expressible natively — which is
    why dedup_clusters keeps its driver-iterated pointer-jumping loop
    with the recursion living in the DuckDB oracle instead."""
    table(spark, sf_dir, "region").createOrReplaceTempView("region")
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT r.r_name, l.n_name, l.n_customers
        FROM region r, LATERAL (
            SELECT n.n_name, count(*) AS n_customers
            FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
            WHERE n.n_regionkey = r.r_regionkey
            GROUP BY n.n_name
            ORDER BY n_customers DESC, n_name LIMIT 2
        ) l
        """
    )
