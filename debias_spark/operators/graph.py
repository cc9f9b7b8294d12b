"""Co-purchase basket/pair construction, shared by the basket-analytics
keys (orders_market_basket X52, orders_basket_lift X54,
orders_copurchase_triangles X67, graph_pagerank_copurchase X89).

Edge build doctrine: pair generation is BASKET-LOCAL.  Instead of
distinct + self-join on the order key (three shuffles: distinct, join,
support aggregate), collect each order's part set once and explode the
ordered pairs — one shuffle to group baskets, one to aggregate support.
``collect_set`` dedups (order, part) repeats, so per-order pair
multiplicity matches the distinct+self-join spelling exactly (A/B'd
exceptAll-empty at sf0.1).

Pair expansion is spelled as posexplode + tail-slice explode, NOT a
nested ``transform(.., transform(slice(..)))`` lambda: higher-order
functions with lambdas run as interpreted expressions outside
whole-stage codegen, and the nested spelling measured 1.51 s vs 0.96 s
for this one (min-of-3 at sf0.1; the self-join spelling sits between at
1.21 s).  Two plain generators stay inside codegen.

The per-basket blow-up is O(basket^2) in a single task either way (the
self-join has the identical per-key fan-out), so the rewrite strictly
removes shuffles without changing the skew profile; a pathological
mega-basket would be salted upstream in both spellings.

A second payoff of the basket frame: per-item frequencies and the order
count are map-side explodes/aggregates over the SAME frame — keys that
need pairs + item counts + order count (basket_lift) derive all three
from one shuffle instead of re-shuffling lineitem per aggregate.

No reference citation: the reference (SirHooke/debias-batch-processor)
has no joins or graphs; north-star extension per SURVEY §2.H.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debias_spark.catalog import table


def order_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per order: (l_orderkey, ps) with ps the SORTED distinct
    part set of the order — the single-shuffle base every basket
    aggregate derives from."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )


def basket_pair_support(baskets: DataFrame) -> DataFrame:
    """(pa, pb, support) for every unordered part pair (pa < pb) with
    support = number of baskets containing both; no threshold applied.

    Sorted set => pairing each element with its strict tail yields each
    unordered pair exactly once with pa < pb; posexplode + slice are
    codegen'd generators (no interpreted lambda)."""
    lhs = baskets.select(F.posexplode("ps").alias("i", "pa"), "ps")
    pairs = lhs.select(
        "pa",
        F.explode(F.expr("slice(ps, i + 2, size(ps) - i - 1)")).alias("pb"),
    )
    return pairs.groupBy("pa", "pb").agg(F.count("*").alias("support"))


def copurchase_edges(
    spark: SparkSession, sf_dir: str, min_support: int = 2
) -> DataFrame:
    """Undirected co-purchase edge list (pa < pb), support-filtered.

    support(pa, pb) = number of orders whose basket contains both parts;
    only pairs with support >= ``min_support`` survive.  Returned columns:
    (pa, pb)."""
    return (
        basket_pair_support(order_baskets(spark, sf_dir))
        .filter(F.col("support") >= min_support)
        .select("pa", "pb")
    )
