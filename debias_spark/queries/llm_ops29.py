"""Round-8 wave 1 (Y62): the pre-training split workflow in one key —
deterministic stratified train/val/test assignment (Y10 semantics) fused
with the semantic decontamination screen (Y57 semantics): train docs too
close to the val/test embeddings are REMOVED before the per-(split, lang)
corpus accounting is emitted.

Reference parity: none — the reference (SirHooke/debias-batch-processor)
has no corpus surface; extension per SURVEY §2.H (r7 verdict growth item
6b: "stratified/temporal train-val-test decontamination join combining
Y10 + Y57 semantics in one key — the actual pre-training split workflow").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debias_spark.catalog import table
from debias_spark.operators.similarity import dot, l2_norm
from debias_spark.registry import register

# 98/1/1 split by key arithmetic: the eval splits are SMALL by design —
# that is what makes the decontamination screen's eval side broadcastable
# at any corpus scale (cf. embedding_decontamination_screen's contract).
_TRAIN_LT = 98
_VAL_EQ = 98
_THRESH_E4 = 6000
# floor-eps doctrine (llm_ops15): Spark adds the pre-folded 0.5 + 1e-9 in
# ONE IEEE addition; the oracle spells the identical single addition as
# the literal 0.500000001e0.
_EPS = 0.5 + 1e-9


@register(
    "docs_train_split_decontaminated",
    "Y62",
    oracle=f"""
    WITH base AS MATERIALIZED (
        SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars,
               CAST(e.embedding AS DOUBLE[]) AS v,
               CASE WHEN d.doc_id % 100 < {_TRAIN_LT} THEN 'train'
                    WHEN d.doc_id % 100 = {_VAL_EQ} THEN 'val'
                    ELSE 'test' END AS split
        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    ), ev AS MATERIALIZED (
        SELECT doc_id AS eval_id, v AS ev FROM base WHERE split <> 'train'
    ), contaminated AS (
        SELECT DISTINCT b.doc_id
        FROM base b JOIN ev
          ON floor(list_cosine_similarity(b.v, ev.ev) * 10000
                   + 0.500000001e0) >= {_THRESH_E4}
        WHERE b.split = 'train'
    )
    SELECT b.split, b.lang,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_removed,
           CAST(sum(CASE WHEN c.doc_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN c.doc_id IS NULL THEN n_chars ELSE 0 END)
                AS BIGINT) AS kept_chars
    FROM base b LEFT JOIN contaminated c ON c.doc_id = b.doc_id
    GROUP BY b.split, b.lang
    ORDER BY b.split, b.lang
    """,
)
def docs_train_split_decontaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified split + decontamination in one pass: every embedded
    document gets a deterministic 98/1/1 train/val/test assignment by
    key arithmetic (no RNG state — reproducible at any cluster size,
    Y10's contract), then train docs whose best cosine against ANY
    val/test embedding reaches 0.60 are removed (paraphrase leakage the
    n-gram screens Y9/Y12 miss), and the key emits the per-(split, lang)
    corpus accounting a pre-training data team actually reports: docs,
    removals, survivors, surviving characters.

    Scale shape: the eval side is small BY CONSTRUCTION (1+1% of keys —
    real eval sets are fixed-size, not corpus-proportional), so it
    broadcasts and the screen is ONE scan of the train split with a
    bounded per-row loop — the H8/Y57 exact shape; a corpus-scale eval
    set would drop in the H8b LSH bucketing unchanged.  Contamination is
    an EXISTS (max-sim >= threshold) aggregate, not a pair emission, so
    the shuffle after the screen carries one boolean per train doc; the
    final rollup groups a (split, lang)-bounded frame."""
    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    split = (
        F.when(F.col("doc_id") % 100 < _TRAIN_LT, "train")
        .when(F.col("doc_id") % 100 == _VAL_EQ, "val")
        .otherwise("test")
    )
    base = (
        docs.join(emb, docs["doc_id"] == emb["vec_id"])
        .select(
            "doc_id",
            "lang",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("embedding").alias("v"),
            split.alias("split"),
            l2_norm(F.col("embedding")).alias("nrm"),
        )
    )
    ev = base.filter(F.col("split") != "train").select(
        F.col("v").alias("ev"), F.col("nrm").alias("en")
    )
    sim_e4 = F.floor(
        dot(F.col("v"), F.col("ev")) / (F.col("nrm") * F.col("en")) * 10000
        + F.lit(_EPS)
    ).cast("long")
    # EXISTS via max-sim: one row per train doc survives the screen shuffle
    screened = (
        base.filter(F.col("split") == "train")
        .crossJoin(F.broadcast(ev))
        .select("doc_id", sim_e4.alias("sim_e4"))
        .groupBy("doc_id")
        .agg(F.max("sim_e4").alias("best_e4"))
        .filter(F.col("best_e4") >= _THRESH_E4)
        .select("doc_id", F.lit(True).alias("hit"))
    )
    acc = base.join(F.broadcast(screened), "doc_id", "left").select(
        "split",
        "lang",
        "n_chars",
        F.coalesce(F.col("hit"), F.lit(False)).alias("hit"),
    )
    return (
        acc.groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("hit").cast("long")).alias("n_removed"),
            F.sum((~F.col("hit")).cast("long")).alias("n_kept"),
            F.sum(F.when(~F.col("hit"), F.col("n_chars")).otherwise(F.lit(0))).alias(
                "kept_chars"
            ),
        )
        .orderBy("split", "lang")
    )
