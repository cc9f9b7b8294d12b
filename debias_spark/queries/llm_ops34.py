"""Round-9 wave 4 (Y72): bloom-filter decontamination prefilter — the
100 TB shape Y12's docstring promises ("the broadcast becomes a
bloom-filter prefilter plus this exact join for survivors"), made real
as pure expressions: a bit array built from the eval gram set, probed
with two md5-derived hashes per train gram, the survivors exact-joined.

Reference parity: the reference has no dedup/decontamination at all;
this is the standard contamination screen for web-scale training
corpora (eval set small, corpus enormous — the broadcast join's hash
table is replaced by a few KB of bloom bits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debias_spark.catalog import table
from debias_spark.operators.skew import fan_out
from debias_spark.operators.dedup import H60_SQL
from debias_spark.queries.llm_ops7 import _EVAL_MAX_ID, NGRAM_AUDIT_ORACLE
from debias_spark.registry import register

_M_BITS = 1 << 17  # bloom width: 131072 bits = 2048 longs (~16 KB)
_GRAM_N = 8
_EVAL_CAP = 500_000  # hard bound on the collected eval gram set

def bloom_bits_literal(grams: list[str], m_bits: int = _M_BITS) -> str:
    """Build the bloom bit array driver-side from a bounded gram set and
    return it as a Spark ``array(...)`` literal of signed longs — the
    ~16 KB replacement for a broadcast hash table.  Shared by Y72 and the
    corpus-build capstone (Z75) so both provably probe the same filter."""
    import hashlib

    words = [0] * (m_bits // 64)
    for g in grams:
        hx = hashlib.md5(g.encode("utf-8")).hexdigest()
        for h in (int(hx[:15], 16) % m_bits, int(hx[15:30], 16) % m_bits):
            words[h // 64] |= 1 << (h % 64)
    # signed-long wrap: Spark array<bigint> literals are signed 64-bit
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    return "array(" + ",".join(f"{w}L" for w in words) + ")"


def bloom_member(bits: str, m_bits: int = _M_BITS) -> F.Column:
    """Pure-expression bloom probe over a ``gram`` column: two md5-derived
    hashes test their bits in the literal array — no UDF, no broadcast
    hash table, runs inside whole-stage codegen.  ONE bits literal in the
    plan: both probes run inside a forall over the two hash expressions
    (md5 evaluated twice, not four times)."""
    h1 = H60_SQL.format(x="gram") + f" % {m_bits}"
    h2 = f"CAST(conv(substr(md5(gram), 16, 15), 16, 10) AS BIGINT) % {m_bits}"
    return F.expr(
        f"forall(array({h1}, {h2}), h ->"
        f" (shiftright(element_at({bits}, CAST(h div 64 AS INT) + 1),"
        f" CAST(h % 64 AS INT)) & 1) = 1)"
    )


@register("docs_decontam_bloom_prefilter", "Y72", oracle=NGRAM_AUDIT_ORACLE)
def docs_decontam_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Y12's contamination audit behind a BLOOM PREFILTER: the eval
    set's distinct 8-token grams (bounded — eval benchmarks are small by
    nature; hard-capped here) build a 131072-bit / 2-hash bloom filter
    driver-side, shipped to executors as a 2048-long literal array; each
    train gram probes the bits with two md5-derived hashes as PURE
    Catalyst expressions (shiftright + bitwise-and on the array
    elements — no UDF, no broadcast hash table), and only bloom
    survivors reach the exact broadcast join.  Blooms have NO false
    negatives, so the final result is bit-identical to Y12's — proven by
    hashing against Y12's EXACT oracle text — while false positives die
    in the exact join.

    At 100 TB this is THE decontamination plan: the corpus-side scan
    carries a ~16 KB bit array instead of a multi-GB broadcast, the
    prefilter runs inside whole-stage codegen, and the exact join sees
    only the (tiny) candidate stream.  The in-code selectivity assert
    pins that the prefilter actually filtered (a bloom sized too small
    degrades to a pass-through, silently un-doing the plan)."""
    from debias_spark.operators.text import word_ngrams_frame

    docs = table(spark, sf_dir, "documents")
    # NOT checkpointed (r13): the gram build is a zero-exchange array
    # expression now (word_ngrams_frame respell), so recomputing the
    # map-only explode per consumer beats materializing the full gram
    # string stream (interleaved A/B at sf0.1: ~3.0 s vs ~3.3 s)
    grams = word_ngrams_frame(fan_out(docs), _GRAM_N)  # scan-level fan_out
    # bounded driver-side collect: the eval set DEFINES the filter (same
    # class as the BPE merge-table collects); capped loudly
    eset = [
        r.gram
        for r in grams.filter(F.col("doc_id") < _EVAL_MAX_ID)
        .select("gram")
        .distinct()
        .collect()
    ]
    if len(eset) > _EVAL_CAP:
        raise RuntimeError(
            f"eval gram set {len(eset)} exceeds the {_EVAL_CAP} bloom cap"
        )
    bits = bloom_bits_literal(eset, _M_BITS)
    member = bloom_member(bits, _M_BITS)
    train = grams.filter(F.col("doc_id") >= _EVAL_MAX_ID)
    # selectivity guard in ONE aggregate pass (not two count jobs); a
    # raise, not assert — the guard must survive python -O
    st = train.agg(
        F.count("*").alias("n_train"), F.sum(member.cast("long")).alias("n_pre")
    ).collect()[0]
    if st.n_train > 0 and st.n_pre >= st.n_train:
        raise RuntimeError(
            f"bloom prefilter passed everything ({st.n_pre}/{st.n_train}) — "
            "filter width degraded to a pass-through"
        )
    eval_grams = spark.createDataFrame([(g,) for g in eset], "gram string")
    return (
        train.filter(member)
        .join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"), F.min("gram").alias("sample_gram"))
    )
