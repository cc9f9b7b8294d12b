"""Round-12 wave tests (Y75 incremental IVF-PQ index maintenance): the
side contracts the shared value oracle cannot see — engine-side equality
with the static build, inverted-list state layout, per-drop append
behavior, and the narrowed Y74 checkpoint's search plan staying
broadcast-only over a persisted-state index.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from debias_spark.registry import load_all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def specs():
    return load_all_queries()


@pytest.fixture(scope="module")
def incr_rows(spark, specs):
    return specs["similarity_ann_ivfpq_incremental"].fn(spark, SF).collect()


def test_incremental_ivfpq_equals_static(spark, specs, incr_rows):
    """The per-drop index appends must reproduce the one-shot search
    bit-for-bit — the engine-side twin of the shared-oracle proof (an
    index absorbs drops; it is not rebuilt)."""
    static = sorted(
        map(tuple, specs["similarity_ann_ivfpq"].fn(spark, SF).collect())
    )
    assert sorted(map(tuple, incr_rows)) == static


def test_incremental_ivfpq_state_is_inverted_lists(spark, specs, incr_rows):
    """The persisted state is hive-partitioned by cell (the inverted-list
    layout) and accumulated across >= 2 drops within at least one cell —
    proof the index was appended to, not rewritten."""
    from debias_spark.queries.io_roundtrip import _WAREHOUSE

    app = spark.sparkContext.applicationId
    dirs = glob.glob(os.path.join(_WAREHOUSE, f"y75_index_sf0.001_{app}"))
    assert len(dirs) == 1, dirs
    cells = [d for d in os.listdir(dirs[0]) if d.startswith("cell=")]
    assert cells, os.listdir(dirs[0])
    # at least one cell partition holds files from >= 2 append jobs
    per_cell_files = [
        len(glob.glob(os.path.join(dirs[0], c, "*.parquet"))) for c in cells
    ]
    assert max(per_cell_files) >= 2, per_cell_files
    # one state row per corpus vector, narrow schema
    idx = spark.read.parquet(dirs[0])
    assert set(idx.columns) == {"vec_id", "nrm", "cell", "codes"}
    n_emb = (
        spark.read.parquet(os.path.join(SF, "embeddings.parquet")).count()
    )
    assert idx.count() == n_emb
    assert idx.select("vec_id").distinct().count() == n_emb


def test_incremental_ivfpq_search_plan_broadcast_only(spark, specs, incr_rows):
    """ivfpq_search over PERSISTED state (not the checkpointed scan) must
    keep the Y74 plan discipline: no Python, no cartesian, every join a
    BroadcastHashJoin pinned by construction."""
    from debias_spark.plans import executed_plan, join_strategies

    df = specs["similarity_ann_ivfpq_incremental"].fn(spark, SF)
    phys = executed_plan(df)
    assert "BatchEvalPython" not in phys and "ArrowEvalPython" not in phys
    joins = join_strategies(df)
    assert "CartesianProduct" not in joins
    assert "BroadcastNestedLoopJoin" not in joins, joins
    assert set(joins) == {"BroadcastHashJoin"}, joins


def test_compaction_noop_on_already_compact_state(spark, specs, monkeypatch):
    """The Z68 drain with an env-lowered threshold must survive a
    compaction firing on an already-compact state (after == before is a
    no-op, not a failure — r11 advice)."""
    import debias_spark.queries.pipeline_e2e2 as mod

    # threshold 0: every post-2nd-batch compaction fires, including ones
    # where the state is already one file per band
    monkeypatch.setenv("DEBIAS_Z68_COMPACT_FILES", "0")
    rows = specs["pipeline_incremental_neardup"].fn(spark, SF).collect()
    assert rows and mod.LAST_COMPACTIONS >= 2


def test_dup_source_matrix_plan_no_selfjoin_single_scan(spark, specs):
    """Y76 must attribute cross-source duplication WITHOUT a gram
    self-join: one documents scan, zero joins, pair explosion as an
    expression (per-gram state bounded by the source catalog)."""
    from debias_spark.plans import executed_plan, join_strategies

    df = specs["docs_substring_dup_source_matrix"].fn(spark, SF)
    assert join_strategies(df) == [] or join_strategies(df) == set() or not join_strategies(df)
    phys = executed_plan(df)
    assert phys.count("Scan parquet") == 1, phys[:2000]
    assert "BatchEvalPython" not in phys and "ArrowEvalPython" not in phys


def test_dup_source_matrix_pairs_ordered_and_consistent(spark, specs):
    """source_a < source_b on every row; shared-gram counts are symmetric
    by construction so the matrix carries each pair exactly once."""
    rows = specs["docs_substring_dup_source_matrix"].fn(spark, SF).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.source_a < r.source_b
        assert (r.source_a, r.source_b) not in seen
        seen.add((r.source_a, r.source_b))
        assert r.occ_a >= r.n_shared_grams and r.occ_b >= r.n_shared_grams
        assert r.dochits_a >= r.n_shared_grams and r.dochits_b >= r.n_shared_grams


def test_band_salt_guard_identical_results(spark, specs, monkeypatch):
    """The salted candidate join must be BIT-IDENTICAL to the plain path
    (every (id, j) pair meets exactly once, in id's salt shard) — proven
    by running the whole Z68 key both ways (r11 verdict item 4)."""
    import debias_spark.queries.pipeline_e2e2 as mod

    monkeypatch.delenv("DEBIAS_BAND_SALT_BUDGET", raising=False)
    plain = sorted(
        map(tuple, specs["pipeline_incremental_neardup"].fn(spark, SF).collect())
    )
    assert mod.LAST_SALT_R == 1  # normal corpus: no hot bucket, no salt
    monkeypatch.setenv("DEBIAS_BAND_SALT_BUDGET", "1")
    salted = sorted(
        map(tuple, specs["pipeline_incremental_neardup"].fn(spark, SF).collect())
    )
    assert mod.LAST_SALT_R >= 2  # budget 1: any colliding bucket forces salt
    assert salted == plain


def test_band_salt_guard_autotune_on_skewed_fixture(spark, tmp_path, monkeypatch):
    """A boilerplate-heavy fixture (one band bucket >= 100x the median)
    must drive the derived salt factor past 1 at the DEFAULT budget, and
    the salted candidate set must equal the plain-join candidate set."""
    from pyspark.sql import functions as F

    import debias_spark.queries.pipeline_e2e2 as mod
    from debias_spark.operators.dedup import bands_from_sig, minhash_sig_wide, word_shingles

    # 5000 docs sharing one boilerplate text -> one (band, hash) bucket of
    # 5000 rows per band; 200 unique docs give the cold median
    rows = [(i, "the same boilerplate disclaimer text repeated everywhere") for i in range(5000)]
    rows += [(10_000 + i, f"unique document number {i} with its own words {i * 7}") for i in range(200)]
    docs = spark.createDataFrame(rows, "id long, text string")
    sh = docs.select("id", word_shingles(F.col("text"), 1).alias("sh")).filter(F.size("sh") > 0)
    banded = bands_from_sig(minhash_sig_wide(sh, 32), 32, 4)
    idx = banded.select(
        F.col("id").alias("j"),
        F.col("band_id").alias("j_band"),
        F.col("band_hash").alias("j_hash"),
    )
    probe = banded.filter(F.col("id") >= 4000)  # a "drop" probing the rest
    monkeypatch.delenv("DEBIAS_BAND_SALT_BUDGET", raising=False)
    salted = mod.band_candidates(probe, idx)
    assert mod.LAST_SALT_R >= 2, mod.LAST_SALT_R  # autotuned, default budget
    # plan assertion: the remedy is IN the plan — probe side salted
    # (pmod over hash), state side exploded across the shards
    plan = salted._jdf.queryExecution().toString()
    assert "pmod" in plan and ("explode" in plan or "Generate" in plan), plan[:1500]
    n_salted = salted.count()
    monkeypatch.setenv("DEBIAS_BAND_SALT_BUDGET", "0")  # guard off -> plain join
    plain = mod.band_candidates(probe, idx)
    assert mod.LAST_SALT_R == 1
    assert n_salted == plain.count()


def test_tombstone_search_excludes_deleted_and_matters(spark, specs):
    """Deleted vec_ids must never appear as candidates, the tombstone set
    must be non-empty at test scale, and at least one query's results
    must actually differ from the undeleted search (the delete is real,
    not vacuous)."""
    from debias_spark.queries.llm_ops38 import _TOMB_MOD, _TOMB_REM, _PQ_CODES

    from debias_spark.catalog import table
    from debias_spark.queries.llm_ops37 import pq_codebook, pq_index_frame

    rows = specs["similarity_ann_ivfpq_tombstone"].fn(spark, SF).collect()
    assert rows
    deleted = lambda i: i % _TOMB_MOD == _TOMB_REM and i >= _PQ_CODES
    assert all(not deleted(r.cand_id) for r in rows)
    n_emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet")).count()
    n_tomb = sum(1 for i in range(n_emb) if deleted(i))
    assert n_tomb >= 1  # the fixture really has delete targets
    # the masking is real at the INDEX level: live rows = corpus - tombs
    # (at this tiny SF the deleted vectors may not sit in any top-3, so
    # result difference vs Y74 is not a sound assertion; the shared-shape
    # oracle hash at sf0.01 proves masked == filtered-corpus search)
    emb = table(spark, SF, "embeddings")
    book = pq_codebook(emb)
    index = pq_index_frame(emb, book)
    tombs = emb.select("vec_id").filter(
        (F.col("vec_id") % _TOMB_MOD == _TOMB_REM) & (F.col("vec_id") >= _PQ_CODES)
    )
    live_n = index.join(tombs, "vec_id", "anti").count()
    assert live_n == n_emb - n_tomb
