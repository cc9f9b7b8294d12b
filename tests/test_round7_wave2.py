"""Round-7 wave-3 tests (X144-X145, Y53-Y54): side contracts the oracle
comparison can't see — budget conservation, boilerplate monotonicity,
map-pack entry counts, IGNORE NULLS semantics on a hand-built frame.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debias_spark.registry import load_all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def specs():
    return load_all_queries()


def test_mixture_budget_conservation(spark, specs):
    rows = specs["corpus_mixture_temperature"].fn(spark, SF).collect()
    assert len(rows) == 5  # one per lang
    total_w = sum(r.weight_e6 for r in rows)
    # weights are independently floored e6 shares: sum within 5 ulps of 1
    assert abs(total_w - 1_000_000) <= 5
    total_docs = sum(r.target_docs for r in rows)
    assert abs(total_docs - 100_000) <= 5
    # temperature flattens: no language's weight exceeds proportional
    # share^(1/2) ordering — i.e. weight order matches count order
    by_n = sorted(rows, key=lambda r: r.n_docs)
    assert [r.lang for r in by_n] == [
        r.lang for r in sorted(rows, key=lambda r: r.weight_e6)
    ]


def test_boilerplate_monotone_and_conserving(spark, specs):
    from debias_spark.catalog import table

    rows = specs["dedup_boilerplate_lines"].fn(spark, SF).collect()
    docs = table(spark, SF, "documents")
    n_docs_nonempty = docs.filter(
        F.size(F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")) > 0
    ).count()
    assert len(rows) == n_docs_nonempty
    for r in rows:
        assert 0 <= r.n_boiler_chunks <= r.n_chunks
        # retained tokens can never exceed the doc's token count
        # (chunks are disjoint): n_chunks * CHUNK bounds it above
        assert 0 <= r.n_tokens_retained <= r.n_chunks * 8


def test_map_pack_entry_identities(spark, specs):
    rows = specs["sql_map_funcs_pack"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.doubled == 2 * r.n
        assert r.zipped == 3 * r.n
    # map keys are (event_type, day)-unique
    keys = [(r.event_type, r.day) for r in rows]
    assert len(keys) == len(set(keys))


def test_ignore_nulls_semantics_handbuilt(spark):
    """Pin the forward-fill semantics on a frame with known gaps."""
    df = spark.createDataFrame(
        [(1, 1, 1, "error", 99.0), (1, 2, 2, "view", 10.0),
         (1, 3, 3, "error", 99.0), (1, 4, 4, "view", 20.0)],
        "user_id long, ts long, event_id long, event_type string, value double",
    ).withColumn("ts", F.timestamp_seconds("ts"))
    df.createOrReplaceTempView("_x144_ev")
    out = spark.sql(
        """
        WITH m AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN event_type = 'error' THEN NULL ELSE value END AS m
            FROM _x144_ev
        )
        SELECT event_id,
               last_value(m) IGNORE NULLS OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff,
               lag(m) IGNORE NULLS OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM m ORDER BY event_id
        """
    ).collect()
    assert [(r.ff, r.prev) for r in out] == [
        (None, None),       # gap before any observation
        (10.0, None),       # first observation
        (10.0, 10.0),       # gap forward-fills, prev skips the NULL
        (20.0, 10.0),       # next observation; prev is last OBSERVED
    ]
