"""Bucketing proof: the production upgrade SCALE.md claims for fact-fact
joins (H2), demonstrated end-to-end.

Both fact tables are written bucketed+sorted on the join key; the join then
runs WITHOUT any Exchange — at 100 TB that is the difference between
shuffling two fact tables per run and shuffling them once at layout time.
This stays a test (not a registry key) because the driver's tables are
plain parquet directories; the layout decision belongs to the deployment.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debias_spark.catalog import table

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    (
        li.write.mode("overwrite")
        .bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("bt_lineitem")
    )
    (
        o.write.mode("overwrite")
        .bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("bt_orders")
    )
    yield "bt_lineitem", "bt_orders"
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bt_orders")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    """Joining two tables bucketed on the join key must produce a
    SortMergeJoin with ZERO Exchange operators — the buckets are already
    co-located, so neither fact side shuffles."""
    lt, ot = bucketed_tables
    li = spark.table(lt)
    o = spark.table(ot)
    # disable auto-broadcast so the plan can't cheat with a broadcast join
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey)
        phys = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in phys, phys
        assert "Exchange" not in phys, phys
        # and the result matches the plain-parquet join
        expected = (
            table(spark, sf_dir, "lineitem")
            .join(
                table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    """An aggregate keyed on the bucket column reuses the bucket layout:
    no Exchange before the final aggregate either."""
    lt, _ = bucketed_tables
    agg = (
        spark.table(lt)
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    phys = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in phys, phys
