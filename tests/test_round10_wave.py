"""Round-10 wave: semantic contracts of the capstone and its siblings
beyond the oracle hash (test_oracle_parity covers value equality)."""

from __future__ import annotations

from pyspark.sql import functions as F

from debias_spark.catalog import table
from debias_spark.registry import load_all_queries

SPECS = load_all_queries()


def q(name, spark, sf_dir):
    return SPECS[name].fn(spark, sf_dir)


def test_corpus_build_manifest_contracts(spark, sf_dir):
    rows = q("pipeline_corpus_build", spark, sf_dir).collect()
    assert rows, "empty manifest"
    for r in rows:
        assert 1 <= r.n_bins <= r.n_docs, r
        assert r.min_doc_id // 100 == r.shard, r
        assert r.sum_tokens > 0, r
    # the capstone packs a strict subset of the pool: fewer docs than the
    # raw training pool (quality + dedup stages must drop something)
    pool = table(spark, sf_dir, "documents").filter(F.col("doc_id") >= 20).count()
    assert sum(r.n_docs for r in rows) < pool


def test_corpus_build_subset_of_quality_keepers(spark, sf_dir):
    """Every packed doc must be a quality keeper — stage 1 is the X53
    gate, so the capstone's survivor set is a subset of its keepers."""
    from debias_spark.operators.text import quality_features, quality_verdict

    d = table(spark, sf_dir, "documents")
    n_tokens, n_punct = quality_features(F.col("text"))
    keepers = {
        r.doc_id
        for r in d.select(
            "doc_id",
            quality_verdict(F.col("n_chars").cast("long"), n_tokens, n_punct).alias("v"),
        )
        .filter((F.col("v") == "keep") & (F.col("doc_id") >= 20))
        .collect()
    }
    manifest = q("pipeline_corpus_build", spark, sf_dir).collect()
    # manifest min ids must be keepers (spot check on the manifest column)
    for r in manifest:
        assert r.min_doc_id in keepers, r


def test_substring_rewrite_accounting(spark, sf_dir):
    rows = q("docs_substring_dedup_rewrite", spark, sf_dir).collect()
    docs = table(spark, sf_dir, "documents")
    n_docs = docs.count()
    # independent per-doc length (not the query's own L column): the
    # rewrite must conserve characters — kept + removed = original
    orig_len = {
        r.doc_id: r.L
        for r in docs.select("doc_id", F.length("text").alias("L")).collect()
    }
    assert len(rows) == n_docs  # every doc gets a rewrite row
    assert any(r.removed_chars > 0 for r in rows), "no spans cut anywhere"
    empty_digest = "d41d8cd98f00b204"  # md5('') prefix
    for r in rows:
        assert r.new_len >= 0, r
        assert r.new_len + r.removed_chars == orig_len[r.doc_id], r
        assert (r.n_spans == 0) == (r.removed_chars == 0), r
        if r.new_len == 0 and r.removed_chars > 0:
            assert r.new_digest == empty_digest, r


def test_ivf_pinned_topk_cardinality(spark, sf_dir):
    rows = q("similarity_ann_ivf_pinned", spark, sf_dir).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.cand_id)
        assert r.query_id != r.cand_id
    for qs, cands in per_q.items():
        assert 1 <= len(cands) <= 3, (qs, cands)
        assert len(set(cands)) == len(cands), (qs, cands)


def test_corpus_build_is_deterministic(spark, sf_dir):
    """Two runs over the same input must produce the IDENTICAL manifest:
    the NFD packer is a per-shard python fold, the near-dup screen a
    pure predicate, the decontam screen a static set — nothing may
    depend on partitioning or execution order."""
    a = sorted(map(tuple, q("pipeline_corpus_build", spark, sf_dir).collect()))
    b = sorted(map(tuple, q("pipeline_corpus_build", spark, sf_dir).collect()))
    assert a == b


def test_quarantine_replay_partitions_corpus(spark, sf_dir):
    rows = q("pipeline_quarantine_replay", spark, sf_dir).collect()
    n_docs = table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    routes = {r.route for r in rows}
    assert "kept_first" in routes
    # the gate fires at every SF (short docs exist in the fixtures)
    assert any(rt.startswith("dead:") or rt == "kept_replayed" for rt in routes), routes
