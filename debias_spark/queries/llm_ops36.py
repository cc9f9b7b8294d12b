"""Round-10 wave 1: the two measure->remedy / rows-only->value-oracled
upgrades the r9 verdict ranked first after the capstone.

* Y5b ``similarity_ann_ivf_pinned`` — the IVF probe math of Y5, made
  value-oracled by PINNING the centroids as literals (the H8b
  literal-hyperplane pattern): in production the index definition
  persists a prior fit's centroids, so freezing them is the real
  contract, not a test convenience.  Y5 itself stays as the
  engine-internal-fit variant (rows-only by design).

* Y73 ``docs_substring_dedup_rewrite`` — the remedy for Y68's measure:
  every duplicated 20-char window keeps its FIRST corpus occurrence and
  every later occurrence is CUT from the text, with per-doc removed-char
  accounting and the digest of the rewritten document.  Completes the
  measure->remedy loop for char-level dedup the way Z66/Y71 did for
  skew and banding.

Reference parity: none — the reference (SirHooke/debias-batch-processor,
953 lines, no dedup/ANN surface) has neither; extensions per SURVEY §2.H.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debias_spark.catalog import table
from debias_spark.operators.skew import fan_out
from debias_spark.registry import register

# ---------------------------------------------------------------------------
# Y5b: IVF ANN with pinned literal centroids (value-oracled twin of Y5)
# ---------------------------------------------------------------------------

_IVF_K, _IVF_DIM, _IVF_TOPK = 8, 64, 3
_SCORE_ROUND = 6  # decimals for the pre-argmax score rounding (both engines)


def _ivf_pinned_oracle() -> str:
    from debias_spark.operators.similarity import ivf_pinned_centroids

    cents = ivf_pinned_centroids(_IVF_K, _IVF_DIM)
    # per-centroid scores rounded to _SCORE_ROUND decimals BEFORE the
    # argmax, mirroring assign_cell(score_round=...) exactly: a near-tie
    # cell can then never diverge on accumulation order between engines
    scores = ", ".join(
        "round(list_dot_product(v, [{}]::DOUBLE[]) - {}, {})".format(
            ",".join(repr(c) for c in cent),
            repr(float(sum(c * c for c in cent) / 2.0)),
            _SCORE_ROUND,
        )
        for cent in cents
    )
    return f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), a AS (
        SELECT vec_id, v, [{scores}] AS s FROM e
    ), c AS (
        -- argmax with lowest-index tie-break: list_position returns the
        -- FIRST occurrence of the max, matching assign_cell's struct-max
        SELECT vec_id, v,
               CAST(list_position(s, list_max(s)) - 1 AS INTEGER) AS cell
        FROM a
    ), p AS (
        SELECT vec_id AS query_id, v AS q, cell FROM c WHERE vec_id < 10
    ), scored AS (
        SELECT p.query_id, c.vec_id AS cand_id,
               round(list_cosine_similarity(p.q, c.v), 4) AS sim
        FROM p JOIN c ON c.cell = p.cell AND c.vec_id <> p.query_id
    )
    SELECT query_id, cand_id, sim FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, cand_id) AS rn
        FROM scored
    ) WHERE rn <= {_IVF_TOPK}
    """


@register("similarity_ann_ivf_pinned", "Y5b", oracle=_ivf_pinned_oracle())
def similarity_ann_ivf_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with PINNED centroids: the exact probe math of
    similarity_ann_ivf (llm_ops2.py), but the centroids are frozen
    literals instead of a seeded engine-internal k-means fit — which is
    what a production IVF index actually is after its one-time fit
    persists.  Cell = argmax_j (v . c_j - |c_j|^2 / 2) with ties to the
    lowest cell (assign_cell, the expression-level spec — a SEQUENTIAL
    double fold matching DuckDB's list_dot_product operation order, with
    each per-centroid score ROUNDED to 6 decimals before the argmax in
    BOTH engines so a near-tie cell can never diverge on accumulation
    order, r10 advice); probes (vec_id < 10) score only their own cell;
    top-3 by rounded cosine with cand_id tiebreak.

    This upgrades the IVF family out of rows-only residue (r9 verdict
    gap #2): Y5 keeps pinning the fit-is-engine-internal variant, this
    twin value-proves the assignment + bucketed-probe plan.  Scale
    shape: centroid literals broadcast in the plan itself; the probe
    join is cell-equi (never all-pairs); one corpus scan assigns, the
    bounded probe side reuses it."""
    from debias_spark.operators.similarity import (
        assign_cell,
        dot,
        ivf_pinned_centroids,
        l2_norm,
    )

    cents = ivf_pinned_centroids(_IVF_K, _IVF_DIM)
    emb = table(spark, sf_dir, "embeddings")
    # one scan assigns cells + norms; both join sides are views of it
    cells = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("v"),
        l2_norm(F.col("embedding")).alias("nrm"),
        assign_cell(F.col("embedding"), cents, score_round=_SCORE_ROUND).alias(
            "cell"
        ),
    ).localCheckpoint(eager=True)
    probes = cells.filter(F.col("cand_id") < 10).select(
        F.col("cand_id").alias("query_id"),
        F.col("v").alias("q"),
        F.col("nrm").alias("qn"),
        "cell",
    )
    scored = (
        probes.join(cells, "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                dot(F.col("q"), F.col("v")) / (F.col("qn") * F.col("nrm")), 4
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _IVF_TOPK)
        .select("query_id", "cand_id", "sim")
    )


# ---------------------------------------------------------------------------
# Y73: exact-substring scrubber — CUT the spans Y68 measures
# ---------------------------------------------------------------------------

_K = 20  # char k-gram width (must match Y68's _SPAN_K for the family story)


@register(
    "docs_substring_dedup_rewrite",
    "Y73",
    oracle=f"""
    WITH mx AS (
        SELECT max(length(text)) AS m FROM documents
    ), dims AS (
        SELECT unnest(range(1, (SELECT m FROM mx) - {_K - 2})) AS i
    ), g AS MATERIALIZED (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS L, CAST(i AS BIGINT) AS pos,
               substr(md5(substr(text, CAST(i AS INT), {_K})), 1, 16) AS gk
        FROM documents JOIN dims ON i <= length(text) - {_K - 1}
        WHERE length(text) >= {_K}
    ), cut AS (
        -- keep-first-corpus-wide: every occurrence of a gram AFTER its
        -- (doc_id, pos)-minimal one is cut
        SELECT doc_id, L, pos FROM (
            SELECT doc_id, L, pos,
                   row_number() OVER (PARTITION BY gk
                                      ORDER BY doc_id, pos) AS rn
            FROM g
        ) WHERE rn >= 2
    ), isl AS (
        SELECT doc_id, L, pos,
               CASE WHEN max(pos + {_K}) OVER w1 IS NULL
                         OR pos > max(pos + {_K}) OVER w1
                    THEN 1 ELSE 0 END AS brk
        FROM cut
        WINDOW w1 AS (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), isl2 AS (
        SELECT doc_id, L, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM isl
    ), spans AS (
        SELECT doc_id, max(L) AS L, island,
               min(pos) AS s, max(pos) + {_K} AS e
        FROM isl2 GROUP BY doc_id, island
    ), segs AS (
        SELECT doc_id, a, seg_len FROM (
            SELECT doc_id,
                   coalesce(lag(e) OVER w2, 1) AS a,
                   s - coalesce(lag(e) OVER w2, 1) AS seg_len
            FROM spans WINDOW w2 AS (PARTITION BY doc_id ORDER BY s)
            UNION ALL
            SELECT doc_id, max(e) AS a, max(L) - max(e) + 1 AS seg_len
            FROM spans GROUP BY doc_id
        ) WHERE seg_len > 0
    ), kept AS (
        SELECT s.doc_id,
               string_agg(substr(d.text, CAST(s.a AS INT),
                                 CAST(s.seg_len AS INT)), '' ORDER BY s.a)
                   AS new_text
        FROM segs s JOIN documents d USING (doc_id)
        GROUP BY s.doc_id
    ), acct AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(e - s) AS BIGINT) AS removed_chars
        FROM spans GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(a.n_spans, 0) AS n_spans,
           coalesce(a.removed_chars, 0) AS removed_chars,
           CAST(length(d.text) - coalesce(a.removed_chars, 0) AS BIGINT)
               AS new_len,
           substr(md5(CASE WHEN a.n_spans IS NULL THEN d.text
                           ELSE coalesce(k.new_text, '') END), 1, 16)
               AS new_digest
    FROM documents d
    LEFT JOIN acct a USING (doc_id) LEFT JOIN kept k USING (doc_id)
    """,
)
def docs_substring_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring SCRUBBER — the remedy for Y68's measurement
    (llm_ops31.py:189): every 20-char window whose content occurs
    earlier in the corpus (by (doc_id, pos) order) marks its chars for
    removal; overlapping marked windows merge into maximal spans
    (running-max-end gaps-and-islands, so abutting windows fuse); the
    kept segments between spans are re-concatenated into the rewritten
    document.  Keep-first-corpus-wide is the suffix-array-dedup policy
    ("Deduplicating Training Data Makes Language Models Better"): one
    copy of every duplicated substring survives, everywhere else it is
    cut.  Output per doc: span count, removed chars, new length, and the
    16-hex digest of the REWRITTEN text — the digest makes the oracle
    hash prove the actual string surgery, not just the accounting.

    Scale shape: the position explode is a fused codegen generator; the
    keep-first decision shuffles 16-hex gram digests + positions (never
    gram text) through ONE row_number window; island merge and segment
    derivation are per-doc windows; the rebuild joins segments back to
    the doc text once and concatenates with an ordered-struct sort —
    all engine-side, no collect, no UDF.  Docs fully covered by earlier
    copies rewrite to the empty string (digest of '' — distinct from
    the untouched-doc branch, which keeps its original digest)."""
    docs = table(spark, sf_dir, "documents")
    # fan_out: the char-gram md5 explode runs above a single-row-group
    # scan — spread the base rows first (r13, no-op on split inputs)
    base = fan_out(docs).select(
        "doc_id", "text", F.length("text").cast("long").alias("L")
    )
    pos = base.filter(F.col("L") >= _K).select(
        "doc_id",
        "L",
        "text",
        F.explode(
            F.sequence(F.lit(1), F.length("text") - F.lit(_K - 1))
        ).alias("pos"),
    )
    grams = pos.select(
        "doc_id",
        "L",
        F.col("pos").cast("long").alias("pos"),
        F.substring(F.md5(F.expr(f"substring(text, pos, {_K})")), 1, 16).alias("gk"),
    )
    w_first = Window.partitionBy("gk").orderBy("doc_id", "pos")
    cut = (
        grams.withColumn("rn", F.row_number().over(w_first))
        .filter(F.col("rn") >= 2)
        .select("doc_id", "L", "pos")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + _K).over(
        w_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = cut.withColumn(
        "brk",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn("island", F.sum("brk").over(w_doc))
    spans = isl.groupBy("doc_id", "island").agg(
        F.max("L").alias("L"),
        F.min("pos").alias("s"),
        (F.max("pos") + F.lit(_K)).alias("e"),
    )
    w_span = Window.partitionBy("doc_id").orderBy("s")
    seg_pre = spans.select(
        "doc_id",
        F.coalesce(F.lag("e").over(w_span), F.lit(1)).alias("a"),
        (F.col("s") - F.coalesce(F.lag("e").over(w_span), F.lit(1))).alias("seg_len"),
    )
    seg_tail = spans.groupBy("doc_id").agg(
        F.max("e").alias("a"), (F.max("L") - F.max("e") + 1).alias("seg_len")
    )
    segs = seg_pre.unionByName(seg_tail).filter(F.col("seg_len") > 0)
    kept = (
        segs.join(docs.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id",
            "a",
            F.expr("substring(text, CAST(a AS INT), CAST(seg_len AS INT))").alias(
                "seg"
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(a, seg))),"
                " x -> x.seg), '')"
            ).alias("new_text")
        )
    )
    acct = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("e") - F.col("s")).alias("removed_chars"),
    )
    return (
        base.join(acct, "doc_id", "left")
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("removed_chars", F.lit(0)).alias("removed_chars"),
            (F.col("L") - F.coalesce("removed_chars", F.lit(0))).alias("new_len"),
            F.substring(
                F.md5(
                    F.when(F.col("n_spans").isNull(), F.col("text")).otherwise(
                        F.coalesce("new_text", F.lit(""))
                    )
                ),
                1,
                16,
            ).alias("new_digest"),
        )
    )
