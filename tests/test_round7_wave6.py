"""Round-7 wave-7 tests (X152, Z58, Y56, MM9): hint plan evidence,
advisor arithmetic, entropy bounds, bbox invariants.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from debias_spark.registry import load_all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def specs():
    return load_all_queries()


def test_partitioning_hints_exchange_evidence(spark):
    from debias_spark.catalog import table

    table(spark, SF, "orders").createOrReplaceTempView("_x152_orders")
    rep = spark.sql(
        "SELECT /*+ REPARTITION(16, o_custkey) */ * FROM _x152_orders"
    )
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    assert "RepartitionByExpression" in plan and "o_custkey" in plan
    phys = rep._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(o_custkey" in phys and "REPARTITION_BY_NUM" in phys
    reb = spark.sql("SELECT /*+ REBALANCE */ * FROM _x152_orders")
    assert "RebalancePartitions" in reb._jdf.queryExecution().optimizedPlan().toString()
    co = spark.sql("SELECT /*+ COALESCE(4) */ * FROM _x152_orders")
    assert "Coalesce" in co._jdf.queryExecution().executedPlan().toString()


def test_hints_values_identical(spark, specs):
    rows = specs["sql_partitioning_hints_pack"].fn(spark, SF).collect()
    assert len(rows) == 3
    assert len({(r.n, r.rev_cents) for r in rows}) == 1


def test_advisor_arithmetic(spark, specs):
    rows = {r.tbl: r for r in specs["diag_shuffle_partition_advisor"].fn(spark, SF).collect()}
    assert set(rows) == {"events", "orders"}
    for r in rows.values():
        assert r.est_bytes > r.n_rows * 32  # 4 numeric cols alone = 32 B/row
        assert r.rec_shuffle_partitions == max(
            1, math.ceil(r.est_bytes / (64 * 1024 * 1024))
        )


def test_renyi_entropy_bounds(spark, specs):
    rows = specs["docs_trigram_renyi_entropy"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        # 0 <= H2 <= ln(n_distinct) (uniform over observed grams)
        assert 0 <= r.renyi2_e6 <= math.log(r.n_distinct) * 1e6 + 1
        assert 1 <= r.n_distinct <= r.n_grams


def test_bbox_invariants(spark, specs):
    rows = specs["multimodal_bbox_area_stats"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_boxes <= 5
        assert r.max_area <= r.total_area <= r.n_boxes * r.max_area
        assert 0 <= r.n_overlaps <= r.n_boxes * (r.n_boxes - 1) // 2
    # overlap signal is exercised somewhere in the corpus
    assert any(r.n_overlaps > 0 for r in rows)


def test_asof_nearest_direction_consistency(spark, specs):
    rows = specs["join_asof_nearest"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert (r.direction is None) == (r.gap_s is None)
        if r.gap_s is not None:
            assert r.gap_s >= 0 and r.direction in ("backward", "forward")


def test_ltv_curve_monotone(spark, specs):
    rows = specs["orders_cohort_ltv_curve"].fn(spark, SF).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort, []).append((r.age_months, r.cum_ltv_cents_per_cust))
    for pts in by_cohort.values():
        ages = [a for a, _ in pts]
        assert ages == sorted(ages)
        vals = [v for _, v in pts]
        assert vals == sorted(vals)  # cumulative LTV never decreases


def test_neighbor_jaccard_bounds(spark, specs):
    rows = specs["graph_neighbor_jaccard"].fn(spark, SF).collect()
    for r in rows:
        assert 2000 <= r.jaccard_e4 <= 10000
        assert r.n_common >= 1
