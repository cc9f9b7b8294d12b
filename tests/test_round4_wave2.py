"""Round-4 wave-2 keys: IO roundtrips (Z25-Z26), block dedup (Y19),
k-core (X91), EWMA forecast (X92).  Each is also DuckDB-oracled; these
tests pin the plan shapes and replay the semantics independently."""

from __future__ import annotations

from pyspark.sql import functions as F

from debias_spark.catalog import table
from debias_spark.registry import load_all_queries

SPECS = load_all_queries()


def _executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_parquet_read_is_partition_pruned(spark, sf_dir):
    """The read-back scan must carry a PartitionFilter on l_returnflag —
    pruning at planning time, not a post-scan filter."""
    df = SPECS["sink_partitioned_parquet_prune"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert "PartitionFilters" in plan
    # the pruned scan must bind the literal partition value
    assert "R" in plan.split("PartitionFilters", 1)[1][:200]


def test_orc_roundtrip_matches_direct_aggregate(spark, sf_dir):
    direct = {
        r.o_orderpriority: (r.n, r.c)
        for r in table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("c"),
        )
        .collect()
    }
    got = {
        r.o_orderpriority: (r.n_orders, r.rev_cents)
        for r in SPECS["sink_orc_roundtrip"].fn(spark, sf_dir).collect()
    }
    assert got == direct


def test_block_dedup_short_docs_and_shares(spark, sf_dir):
    """Docs shorter than one block report (0, 0, 0); duplicate counts never
    exceed block counts; a doc duplicating an earlier doc's full text has
    every block flagged."""
    rows = SPECS["docs_block_dedup"].fn(spark, sf_dir).collect()
    docs = {
        r.doc_id: r.text for r in table(spark, sf_dir, "documents").collect()
    }
    assert len(rows) == len(docs)
    for r in rows:
        n_tokens = len([t for t in docs[r.doc_id].lower().split() if t])
        if n_tokens < 16:
            assert (r.n_blocks, r.n_dup_blocks, r.dup_share_bp) == (0, 0, 0)
        else:
            assert r.n_blocks == n_tokens // 16
        assert 0 <= r.n_dup_blocks <= r.n_blocks
        if r.n_blocks:
            assert r.dup_share_bp == (r.n_dup_blocks * 10000) // r.n_blocks


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """The whole point of the bucketed layout: the fact-fact join runs
    without a single shuffle exchange (the post-join rollup's exchange is
    below the aggregate, not the join)."""
    df = SPECS["sink_bucketed_join_noshuffle"].fn(spark, sf_dir)
    plan = _executed_plan(df)
    assert plan.count("Bucketed: true") == 2
    # exactly ONE shuffle in the whole plan — the rollup's; the join
    # itself contributes none (bucketed SMJ at scale; at tiny SF Catalyst
    # may legitimately broadcast instead, which is also shuffle-free)
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_csv_roundtrip_has_explicit_schema_scan(spark, sf_dir):
    """The read-back must be a schema-bound CSV scan (no inferSchema
    second pass) and the date column must re-parse as DateType."""
    df = SPECS["sink_csv_roundtrip"].fn(spark, sf_dir)
    rows = {r.o_orderstatus: r for r in df.collect()}
    assert rows and all(len(r.first_day) == 10 for r in rows.values())


def test_foreachbatch_state_survives_and_merges(spark, sf_dir):
    """Running the drain twice must be idempotent (fresh state per run),
    and the final state must equal the batch aggregate exactly."""
    a = sorted(map(tuple, SPECS["stream_foreachbatch_upsert"].fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, SPECS["stream_foreachbatch_upsert"].fn(spark, sf_dir).collect()))
    assert a == b
    direct = sorted(
        map(
            tuple,
            table(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.countDistinct("user_id").alias("u"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"),
            )
            .collect(),
        )
    )
    assert a == direct


def test_kcore_matches_pure_python_peel(spark, sf_dir):
    from debias_spark.operators.graph import copurchase_edges

    und = {
        (r.pa, r.pb) for r in copurchase_edges(spark, sf_dir, 2).collect()
    }
    for _ in range(4):
        deg: dict[int, int] = {}
        for a, b in und:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v, d in deg.items() if d >= 3}
        und = {(a, b) for a, b in und if a in keep and b in keep}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    got = [
        (r.part, r.degree)
        for r in SPECS["graph_kcore_copurchase"].fn(spark, sf_dir).collect()
    ]
    assert got == sorted(deg.items())


def test_ewma_matches_pure_python_closed_form(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    wk_rows = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .select(
            F.col("p_brand").alias("brand"),
            F.expr("datediff(l_shipdate, DATE '1970-01-01') div 7").alias("w"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .groupBy("brand", "w")
        .agg(F.sum("q").alias("qty"))
        .collect()
    )
    mw = max(r.w for r in wk_rows)
    expect: dict[str, int] = {}
    for r in wk_rows:
        k = mw - r.w
        if k < 8:
            expect[r.brand] = expect.get(r.brand, 0) + r.qty * 7**k * 10 ** (
                7 - k
            )
    got = {
        r.brand: (r.s_num, r.ewma_qty)
        for r in SPECS["orders_demand_forecast_ewma8"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for brand, s in expect.items():
        assert got[brand][0] == s
        assert got[brand][1] == round(3 * s / 10**8, 4)


def test_winnowing_matches_pure_python(spark, sf_dir):
    """Replay k=3/w=4 winnowing in pure Python (md5-h60 grams, window
    mins, distinct, first-claimant attribution) and require exact rows."""
    import hashlib

    docs = {r.doc_id: r.text for r in table(spark, sf_dir, "documents").collect()}

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    fps, grams_n = {}, {}
    for did, text in docs.items():
        t = [w for w in text.lower().split() if w]
        hs = [h60(" ".join(t[i : i + 3])) for i in range(len(t) - 2)] if len(t) >= 3 else []
        grams_n[did] = len(hs)
        if len(hs) >= 4:
            sel = {min(hs[i : i + 4]) for i in range(len(hs) - 3)}
            fps[did] = sel
    firsts = {}
    for did in sorted(fps):
        for f in fps[did]:
            firsts.setdefault(f, did)
    expect = {}
    for did in docs:
        sel = fps.get(did, set())
        expect[did] = (
            grams_n[did] if sel else 0,
            len(sel),
            sum(1 for f in sel if firsts[f] < did),
        )
    got = {
        r.doc_id: (r.n_grams, r.n_fps, r.n_shared_fps)
        for r in SPECS["docs_winnowing_fingerprint"].fn(spark, sf_dir).collect()
    }
    assert got == expect
