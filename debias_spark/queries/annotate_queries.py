"""Annotation pipeline queries (SURVEY F1/F2 + the flagship).

The deterministic lexicon annotator makes the reference's external-API map
fully testable: the DuckDB oracle replays the same lexicon match in SQL, so
even the UDF path gets a value-level correctness gate instead of rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debias_spark.annotate import annotate
from debias_spark.annotate.annotator import flagged
from debias_spark.catalog import table
from debias_spark.registry import register

# Keep in sync with annotate.lexicon.DEFAULT_LEXICON (sorted).
_TERMS = ["big", "error", "old", "slow", "small", "young"]
_EN_EXTRA = ["legacy"]

_TERMS_SQL = "[" + ",".join(f"'{t}'" for t in _TERMS) + "]"
_EN_SQL = "[" + ",".join(f"'{t}'" for t in _EN_EXTRA) + "]"

# tokens present in the per-language lexicon, deduplicated
_HITS_SQL = f"""
    list_intersect(list_distinct(string_split(lower(text), ' ')),
        {_TERMS_SQL} || CASE WHEN lang = 'en' THEN {_EN_SQL}
                             ELSE CAST([] AS VARCHAR[]) END)
"""

_ISSUE_CASE_SQL = """
    CASE t WHEN 'slow'  THEN 'performance stereotype'
           WHEN 'small' THEN 'diminutive framing'
           WHEN 'big'   THEN 'aggrandizing framing'
           WHEN 'error' THEN 'deficit framing'
           ELSE 'age bias' END
"""


@register(
    "map_batch_annotate",
    "F1",
    oracle=f"""
    SELECT doc_id,
           CAST(len(hits) AS BIGINT) AS n_tags,
           coalesce(array_to_string(list_sort(hits), ','), '') AS tag_terms
    FROM (SELECT doc_id, {_HITS_SQL} AS hits FROM documents)
    """,
)
def map_batch_annotate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch external annotation call (call-debias.py:41-51), rebuilt as
    an Arrow-vectorized mapInPandas with in-UDF retry + _error column (F2).
    Value-level oracle: the lexicon match replayed in SQL."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    ann = annotate(docs)
    terms = F.transform("tags", lambda t: t["literal"])
    return ann.select(
        "doc_id",
        F.size("tags").cast("long").alias("n_tags"),
        F.array_join(F.array_sort(terms), ",").alias("tag_terms"),
    )


@register(
    "annotate_issue_distribution",
    "F1+E1",
    oracle=f"""
    SELECT issue, count(*) AS n_detections FROM (
        SELECT {_ISSUE_CASE_SQL} AS issue FROM (
            SELECT unnest({_HITS_SQL}) AS t FROM documents
        )
    ) GROUP BY issue ORDER BY n_detections DESC, issue
    """,
)
def annotate_issue_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP: the reference's signature analytics question — detections
    per issue (dashboard_widget.py:94-113) — over the full pipeline:
    scan -> annotate (vectorized UDF) -> truthiness filter -> explode(tags)
    -> hash agg -> ranked sort with deterministic tiebreak."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    ann = annotate(docs)
    tags = flagged(ann).select(F.explode("tags").alias("tag"))
    return (
        tags.groupBy(F.col("tag.issue").alias("issue"))
        .agg(F.count("*").alias("n_detections"))
        .orderBy(F.desc("n_detections"), F.asc("issue"))
    )
