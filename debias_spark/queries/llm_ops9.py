"""Round-4 LLM-pipeline wave 2 (Y19): sequence-block exact dedup — the
"paragraph dedup" stage of corpus cleaning (CCNet-style) re-expressed over
fixed token blocks, since the synthetic corpus has no paragraph breaks.

No reference citation: the reference pipeline (call-debias.py) has no
dedup machinery; north-star LLM-data-pipeline extension (SURVEY §2.H).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debias_spark.catalog import table
from debias_spark.registry import register


_BLOCK = 16  # tokens per block; full blocks only


@register(
    "docs_block_dedup",
    "Y19",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           t -> t <> '') AS t
        FROM documents
    ), blocks AS (
        SELECT doc_id,
               unnest([array_to_string(t[s:s + {_BLOCK - 1}], ' ')
                       FOR s IN range(1, len(t) - {_BLOCK - 2}, {_BLOCK})])
                   AS blk
        FROM toks
        WHERE len(t) >= {_BLOCK}
    ), firsts AS (
        SELECT blk, min(doc_id) AS first_doc FROM blocks GROUP BY blk
    ), per_doc AS (
        SELECT b.doc_id,
               count(*) AS n_blocks,
               CAST(sum(CASE WHEN f.first_doc < b.doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup_blocks
        FROM blocks b JOIN firsts f USING (blk)
        GROUP BY b.doc_id
    )
    SELECT d.doc_id,
           coalesce(p.n_blocks, 0) AS n_blocks,
           coalesce(p.n_dup_blocks, 0) AS n_dup_blocks,
           CASE WHEN p.n_blocks > 0
                THEN (p.n_dup_blocks * 10000) // p.n_blocks
                ELSE 0 END AS dup_share_bp
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
)
def docs_block_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-block exact dedup: chop each document into consecutive
    {B}-token blocks (full blocks only), attribute each distinct block to
    its first-claimant document (min doc_id), and report per document how
    many of its block instances are duplicates of an earlier document —
    the paragraph-level complement to document-level MinHash/SimHash that
    catches templated spans and block-level copy-paste.

    Scale shape: block building is map-side (lambda-bound token array,
    one O(block) slice per NON-OVERLAPPING block — total work linear in
    tokens, unlike the per-position shingle expansions); attribution is
    the min-aggregate + join-back pattern of text_ngram_novelty_curve —
    one aggregate keyed by block text, one shuffle join of the instance
    stream against the firsts frame, one doc-keyed rollup.  Nothing is
    all-pairs; the join key could drop to a 60-bit hash (h60) at corpus
    scale to shuffle 8-byte keys instead of block strings, at the
    standard negligible-collision tradeoff."""
    from debias_spark.operators.dedup import bind_once, word_tokens

    def build(t: F.Column) -> F.Column:
        starts = F.sequence(F.lit(1), F.size(t) - F.lit(_BLOCK - 1), F.lit(_BLOCK))
        blocks = F.transform(
            starts, lambda s: F.concat_ws(" ", F.slice(t, s, _BLOCK))
        )
        return F.when(F.size(t) >= _BLOCK, blocks).otherwise(
            F.array().cast("array<string>")
        )

    docs = table(spark, sf_dir, "documents")
    inst = docs.select(
        "doc_id",
        F.explode(bind_once(word_tokens(F.col("text")), build)).alias("blk"),
    )
    firsts = inst.groupBy("blk").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        inst.join(firsts, "blk")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum((F.col("first_doc") < F.col("doc_id")).cast("long")).alias(
                "n_dup_blocks"
            ),
        )
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_blocks", F.lit(0)).alias("n_blocks"),
        F.coalesce("n_dup_blocks", F.lit(0)).alias("n_dup_blocks"),
        F.coalesce(
            F.expr("(n_dup_blocks * 10000) div n_blocks"), F.lit(0)
        ).alias("dup_share_bp"),
    )


docs_block_dedup.__doc__ = docs_block_dedup.__doc__.replace("{B}", str(_BLOCK))
