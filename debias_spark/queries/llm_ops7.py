"""LLM-pipeline wave 7 (Y11): BPE tokenizer-vocabulary fit — the
tokenizer-training step of a training-data pipeline, and the registry's
second iterative-algorithm representative (alongside dedup_clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from debias_spark.catalog import table
from debias_spark.operators.bpe import bpe_fit, bpe_oracle, word_freqs
from debias_spark.registry import register

_DUCK_ALL_TOKENS = (
    "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
)


@register(
    "bpe_vocab_fit",
    "Y11",
    oracle=bpe_oracle(10, _DUCK_ALL_TOKENS),
    bench=False,  # 10 driver-synchronized rounds; excluded like dedup_clusters
)
def bpe_vocab_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit 10 BPE merges over the corpus vocabulary and return the merge
    table (rank, pair, merged, weighted count).  One corpus-scale
    word-count aggregation; the merge loop then iterates on the BOUNDED
    vocabulary frame with one 1-row argmax collect per round — the
    correct 100 TB shape for tokenizer training (the corpus never
    re-scans).  Greedy left-to-right merge application via non-
    overlapping string replace is identical in Spark and DuckDB, so the
    oracle replays the whole fit as 10 unrolled SQL rounds and
    hash-matches an actually-iterative engine run (same evidence
    doctrine as dedup_clusters' recursive-CTE closure)."""
    docs = table(spark, sf_dir, "documents")
    return bpe_fit(spark, word_freqs(docs), n_merges=10)


_EVAL_MAX_ID = 20  # docs below this id play the held-out benchmark set


@register(
    "docs_contamination_ngram_audit",
    "Y12",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               {_DUCK_ALL_TOKENS} AS t
        FROM documents
    ), grams AS (
        SELECT DISTINCT doc_id, gram FROM (
            SELECT doc_id,
                   unnest([array_to_string(t[i:i+7], ' ')
                           FOR i IN range(1, greatest(len(t) - 6, 0) + 1)])
                       AS gram
            FROM toks
        )
    ), eval_grams AS (
        SELECT DISTINCT gram FROM grams WHERE doc_id < {_EVAL_MAX_ID}
    )
    SELECT g.doc_id, count(*) AS n_hits,
           min(g.gram) AS sample_gram
    FROM grams g JOIN eval_grams e ON e.gram = g.gram
    WHERE g.doc_id >= {_EVAL_MAX_ID}
    GROUP BY g.doc_id
    """,
)
def docs_contamination_ngram_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination audit against a DERIVED eval set: the
    benchmark docs' (doc_id < 20) distinct 8-token windows are joined
    against every training doc's windows — the production shape
    text_decontaminate's fixed phrase list only gestures at.  The eval
    gram set is bounded (eval benchmarks are small by nature), so it
    BROADCASTS; the train side streams through one window-lead gram
    build (codegen, cf. text_crossdoc_ngram_dup) and one doc_id rollup.
    At 100 TB the broadcast becomes a bloom-filter prefilter plus this
    exact join for survivors — same plan skeleton.  Output: contaminated
    doc ids with hit counts and a deterministic sample gram."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from debias_spark.catalog import table as _table
    from debias_spark.operators.dedup import word_tokens

    d = _table(spark, sf_dir, "documents")
    ex = d.select(
        "doc_id", F.posexplode(word_tokens(F.col("text"))).alias("pos", "t")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("t")] + [F.lead("t", i).over(w) for i in range(1, 8)]
    grams = (
        ex.select(
            "doc_id",
            F.concat_ws(" ", *parts).alias("gram"),
            F.lead("t", 7).over(w).alias("_t7"),
        )
        .filter(F.col("_t7").isNotNull())
        .drop("_t7")
        .distinct()
    )
    eval_grams = (
        grams.filter(F.col("doc_id") < _EVAL_MAX_ID).select("gram").distinct()
    )
    return (
        grams.filter(F.col("doc_id") >= _EVAL_MAX_ID)
        .join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"), F.min("gram").alias("sample_gram"))
    )
