"""Thirteenth relational wave (X91-X92): k-core graph decomposition over
the co-purchase graph, and an exact-arithmetic exponentially-weighted
demand forecast — the iterative-peel and time-decay aggregation shapes the
engine did not yet expose as first-class keys.

No reference citations: the reference (SirHooke/debias-batch-processor)
has no graphs or time-series smoothing; north-star extensions per
SURVEY §2.H.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debias_spark.catalog import table
from debias_spark.registry import register


_KCORE_K = 3
_KCORE_ROUNDS = 4


def _kcore_oracle() -> str:
    """Unrolled fixed-round peel as chained CTEs: DuckDB replays exactly
    the synchronous rounds the Spark loop performs.

    Every round CTE is MATERIALIZED: each e{{r}} is referenced three
    times (both degree orientations + the next filter) and each k{{r}}
    twice through IN-subqueries, and DuckDB's default inlining
    re-evaluates the whole peel chain per reference — measured 112 s for
    the 4-round oracle at sf0.01 vs ~1 s materialized.  The same
    reuse-count doctrine as the Spark side's per-round checkpoints."""
    ctes = [
        "items AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)",
        """pairs AS MATERIALIZED (
            SELECT a.l_partkey AS pa, b.l_partkey AS pb
            FROM items a JOIN items b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)""",
        "e0 AS MATERIALIZED (SELECT pa, pb FROM pairs GROUP BY pa, pb HAVING count(*) >= 2)",
    ]
    for r in range(_KCORE_ROUNDS):
        ctes.append(f"""d{r} AS MATERIALIZED (
            SELECT node, count(*) AS d FROM (
                SELECT pa AS node FROM e{r} UNION ALL SELECT pb FROM e{r}
            ) GROUP BY node)""")
        ctes.append(
            f"k{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE d >= {_KCORE_K})"
        )
        ctes.append(f"""e{r + 1} AS MATERIALIZED (
            SELECT pa, pb FROM e{r}
            WHERE pa IN (SELECT node FROM k{r})
              AND pb IN (SELECT node FROM k{r}))""")
    r = _KCORE_ROUNDS
    return (
        "WITH " + ",\n".join(ctes) + f"""
    SELECT node AS part, count(*) AS degree FROM (
        SELECT pa AS node FROM e{r} UNION ALL SELECT pb FROM e{r}
    ) GROUP BY node
    ORDER BY part
    """
    )


@register("graph_kcore_copurchase", "X91", oracle=_kcore_oracle())
def graph_kcore_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{R}-round {k}-core peel of the co-purchase graph (same support>=2
    edge set as the X67 triangles / X89 PageRank): each round drops every
    part with fewer than {k} surviving co-purchase partners and the edges
    touching it, reporting the surviving parts with their residual
    degree — the standard dense-cohort extractor (recommendation cores,
    spam rings) and, with PageRank and connected components, the third
    canonical iterative-graph shape.

    Scale shape: the edge list builds once (basket-local, operators/
    graph.py) and is checkpointed; each round is two node-keyed
    aggregates plus two semi-joins of the edge list against the
    surviving-node frame — message-passing rounds that shuffle node ids
    only, AQE broadcasting the node frame when the core shrinks small.
    The round count is FIXED ({R}) so the result is well-defined without
    a convergence test; a converged k-core is the fixpoint of the same
    loop."""
    from debias_spark.operators.graph import copurchase_edges

    und = copurchase_edges(spark, sf_dir, min_support=2).localCheckpoint(
        eager=True
    )
    for r in range(_KCORE_ROUNDS):
        directed = und.select(F.col("pa").alias("node")).unionAll(
            und.select(F.col("pb").alias("node"))
        )
        keep = (
            directed.groupBy("node")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") >= _KCORE_K)
            .select("node")
        )
        und = (
            und.join(keep, und["pa"] == keep["node"], "left_semi")
            .join(keep, und["pb"] == keep["node"], "left_semi")
            # checkpoint EVERY round — unlike PageRank's rank vector
            # (read once per round, so a stride-2 cadence only doubles
            # plan depth), the edge frame is read THREE times per round
            # (both union orientations + the semi-join base), so each
            # un-checkpointed round multiplies the plan: measured 213 s
            # for the 4-round peel under a default-conf 200-partition
            # session at sf0.01 with stride 2, vs ~3 s checkpointing
            # per round.  Reuse count, not round count, picks the cadence.
            .localCheckpoint(eager=True)
        )
    final = und.select(F.col("pa").alias("node")).unionAll(
        und.select(F.col("pb").alias("node"))
    )
    return (
        final.groupBy("node")
        .agg(F.count("*").alias("degree"))
        .select(F.col("node").alias("part"), "degree")
        .orderBy("part")
    )


graph_kcore_copurchase.__doc__ = graph_kcore_copurchase.__doc__.replace(
    "{k}", str(_KCORE_K)
).replace("{R}", str(_KCORE_ROUNDS))


_EWMA_ALPHA_X10 = 3  # alpha = 0.3, spelled exactly as 3/10
_EWMA_HORIZON = 8  # trailing weeks in the bounded-window EWMA


@register(
    "orders_demand_forecast_ewma8",
    "X92",
    oracle=f"""
    WITH wk AS (
        SELECT p.p_brand AS brand,
               date_diff('day', DATE '1970-01-01', l.l_shipdate) // 7 AS w,
               CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY brand, w
    ), mx AS (SELECT max(w) AS mw FROM wk),
    weighted AS (
        SELECT brand,
               CAST(sum(qty * CAST(pow(7, mx.mw - w) AS BIGINT)
                            * CAST(pow(10, {_EWMA_HORIZON - 1} - (mx.mw - w))
                                   AS BIGINT)) AS BIGINT) AS s_num
        FROM wk, mx
        WHERE mx.mw - w < {_EWMA_HORIZON}
        GROUP BY brand
    )
    SELECT brand, s_num,
           round(CAST({_EWMA_ALPHA_X10} * s_num AS DOUBLE)
                 / {10 ** _EWMA_HORIZON}, 4) AS ewma_qty
    FROM weighted
    ORDER BY brand
    """,
)
def orders_demand_forecast_ewma8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted demand forecast per part brand: weekly
    shipped quantity over the trailing {H} weeks, smoothed with
    EWMA(alpha=0.3) and zero initial level — the time-decay aggregation a
    demand pipeline runs per refresh.  Missing weeks contribute zero
    demand, which the closed form handles for free (absent terms ARE
    zero terms).

    Determinism doctrine: the decay weights (7/10)^k are kept EXACT by
    integer-scaling to a common 10^{Hm1} denominator — each term is
    qty * 7^k * 10^({Hm1}-k), a BIGINT product (max ~1e16, no overflow),
    summed exactly; alpha enters as one final double division of exact
    integers, so both engines perform the identical single IEEE op and
    the value-hash cannot drift on float-sum association order.  The
    bounded {H}-week horizon is what makes the scaling exact — an
    unbounded EWMA would need float powers and become
    association-sensitive.

    Scale shape: one broadcast dim join (part), one (brand, week)
    aggregate with map-side partials, a broadcast 1-row max-week frame,
    and a brand-keyed weighted rollup — no windows, no sorts."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    wk = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .select(
            F.col("p_brand").alias("brand"),
            F.expr("datediff(l_shipdate, DATE '1970-01-01') div 7").alias("w"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .groupBy("brand", "w")
        .agg(F.sum("q").alias("qty"))
        # the (brand, week) frame is dimension-sized and read TWICE (max
        # week + the weighted rollup) — checkpoint it so the second read
        # does not rescan lineitem through the join
        .localCheckpoint(eager=True)
    )
    mx = wk.agg(F.max("w").alias("mw"))
    k = (F.col("mw") - F.col("w")).cast("int")
    weight = (
        F.pow(F.lit(7), k).cast("long")
        * F.pow(F.lit(10), F.lit(_EWMA_HORIZON - 1) - k).cast("long")
    )
    weighted = (
        wk.crossJoin(F.broadcast(mx))
        .filter(k < _EWMA_HORIZON)
        .groupBy("brand")
        .agg(F.sum(F.col("qty") * weight).alias("s_num"))
    )
    return weighted.select(
        "brand",
        "s_num",
        F.round(
            (F.col("s_num") * _EWMA_ALPHA_X10).cast("double")
            / F.lit(float(10 ** _EWMA_HORIZON)),
            4,
        ).alias("ewma_qty"),
    ).orderBy("brand")


orders_demand_forecast_ewma8.__doc__ = orders_demand_forecast_ewma8.__doc__.replace(
    "{H}", str(_EWMA_HORIZON)
).replace("{Hm1}", str(_EWMA_HORIZON - 1))
