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
