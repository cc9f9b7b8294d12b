"""End-to-end pipeline: the reference's whole behavior, PySpark-native.

Reference lifecycle (SURVEY §3.1): scan partitioned corpus -> batch-annotate
per file (sequential, one HTTP call in flight) -> write one JSON doc per
file -> PDF report for flagged files -> pandas analytics over the outputs.

Spark lifecycle: one declarative plan per stage; annotation fans out across
executors in Arrow batches instead of serializing on one call at a time;
sinks are distributed with a per-file compatibility mode; analytics are the
registered E-series queries over the re-read outputs.
"""

from __future__ import annotations

import configparser
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debias_spark.annotate import AnnotateConfig, analytics_frame, annotate, flagged
from debias_spark.sources import (
    read_corpus,
    read_outputs,
    write_outputs_partitioned,
    write_outputs_per_file,
)
from debias_spark.sources.text_corpus import (
    SUPPORTED_LANGUAGES,
    split_record,
    with_line_seq,
)


@dataclass
class PipelineConfig:
    """The reference's config surface (call-debias.py:27-36, readme.md:77-95)."""

    input_folder: str
    output_folder: str
    use_ner: bool = True
    use_llm: bool = False
    max_retries: int = 5

    @classmethod
    def from_ini(cls, path: str) -> "PipelineConfig":
        cp = configparser.ConfigParser()
        cp.read(path)
        s = cp["settings"]
        if not s.get("INPUT_FOLDER") or not s.get("OUTPUT_FOLDER"):
            raise ValueError(
                f"config {path}: [settings] must define INPUT_FOLDER and "
                "OUTPUT_FOLDER (reference key names, readme.md usage)"
            )
        return cls(
            input_folder=s.get("INPUT_FOLDER"),
            output_folder=s.get("OUTPUT_FOLDER"),
            use_ner=s.getboolean("USE_NER", fallback=True),
            use_llm=s.getboolean("USE_LLM", fallback=False),
            max_retries=s.getint("MAX_RETRIES", fallback=5),
        )

    def to_ini(self, path: str) -> None:
        cp = configparser.ConfigParser()
        cp["settings"] = {
            "INPUT_FOLDER": self.input_folder,
            "OUTPUT_FOLDER": self.output_folder,
            "USE_NER": str(self.use_ner),
            "USE_LLM": str(self.use_llm),
            "MAX_RETRIES": str(self.max_retries),
        }
        with open(path, "w") as fh:
            cp.write(fh)


def run_pipeline(
    spark: SparkSession,
    cfg: PipelineConfig,
    client_factory=None,
    per_file_compat: bool = True,
    languages: tuple[str, ...] = SUPPORTED_LANGUAGES,
) -> DataFrame:
    """Scan -> annotate -> sink.  Returns the annotated corpus DataFrame.

    per_file_compat=True writes the reference's '<stem>-output.json' docs;
    False writes the distributed language-partitioned NDJSON sink (the
    100 TB path)."""
    corpus = read_corpus(spark, cfg.input_folder, languages=languages)
    # _seq (per-file line number) makes the per-file results arrays and the
    # report row order deterministic in input order, like the reference.
    corpus = with_line_seq(corpus)
    ann_cfg = AnnotateConfig(
        max_retries=cfg.max_retries, use_ner=cfg.use_ner, use_llm=cfg.use_llm
    )
    if client_factory is not None:
        ann_cfg.client_factory = client_factory
    annotated = annotate(corpus, text_col="value", lang_col="language", config=ann_cfg)
    if per_file_compat:
        write_outputs_per_file(annotated, cfg.output_folder)
    else:
        write_outputs_partitioned(annotated, cfg.output_folder)
    return annotated


def report_rows(annotated: DataFrame) -> DataFrame:
    """The PDF report's dataflow (call-debias.py:54-136) as a DataFrame:
    flagged records only, first-comma split projection, one row per tag with
    the record cells blanked after the first tag row (enumerate-index
    semantics at :106-107).  Rendering (reportlab) stays a driver-side sink
    over this frame."""
    base = split_record(flagged(annotated), "value")
    # seq = input-file line order so rendered rows appear in the same order
    # as the reference's report (it walks lines sequentially).
    seq = (
        F.col("_seq") if "_seq" in base.columns else F.monotonically_increasing_id()
    )
    ex = base.select(
        "src_file",
        seq.cast("long").alias("seq"),
        "record_num",
        "literal_text",
        F.posexplode("tags").alias("tag_pos", "tag"),
    )
    first = F.col("tag_pos") == 0
    return ex.select(
        "src_file",
        "seq",
        F.when(first, F.col("record_num")).otherwise("").alias("record_cell"),
        F.when(first, F.col("literal_text")).otherwise("").alias("literal_cell"),
        F.format_string(
            "Literal: %s\nIssue: %s\nSource: %s",
            F.col("tag.literal"),
            F.col("tag.issue"),
            F.col("tag.source"),
        ).alias("tag_details"),
        "tag_pos",
    )


def analytics_view(spark: SparkSession, output_dir: str) -> DataFrame:
    """The §1.3 denormalized analytics frame rebuilt from the written
    outputs: file, language, record_literal, issue_literal,
    tag_count_per_record — record rows UNION ALL tag rows (N+1)."""
    docs = read_outputs(spark, output_dir)
    rec = docs.select("file", F.explode("results").alias("r")).select(
        "file",
        F.col("r.language").alias("language"),
        F.col("r.literal").alias("record_literal"),
        F.coalesce(F.size("r.tags"), F.lit(0)).alias("tag_count_per_record"),
        F.col("r.tags").alias("tags"),
    )
    record_rows = rec.select(
        "file",
        "language",
        "record_literal",
        F.lit(None).cast("string").alias("issue_literal"),
        "tag_count_per_record",
    )
    tag_rows = rec.select(
        "file",
        "language",
        "record_literal",
        F.explode("tags").alias("tag"),
        "tag_count_per_record",
    ).select(
        "file",
        "language",
        "record_literal",
        F.col("tag.literal").alias("issue_literal"),
        "tag_count_per_record",
    )
    return record_rows.unionAll(tag_rows)


def issue_distribution(frame: DataFrame, language: str | None = None) -> DataFrame:
    """Dashboard chart 1 (dashboard_widget.py:94-152): detections per issue
    literal, optional language filter, ranked with deterministic tiebreak."""
    tags = frame.filter(F.col("issue_literal").isNotNull())
    if language is not None:
        tags = tags.filter(F.col("language") == language)
    return (
        tags.groupBy("issue_literal")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("issue_literal"))
    )


def record_distribution(frame: DataFrame) -> DataFrame:
    """Dashboard chart 2 (dashboard_widget.py:157-204): histogram of
    issue-count-per-record.  The record-level rows guarantee 0-tag records
    appear in the 0 bucket."""
    per_record = frame.groupBy("record_literal").agg(
        F.max("tag_count_per_record").alias("n_issues")
    )
    return per_record.groupBy("n_issues").agg(F.count("*").alias("n_records")).orderBy("n_issues")
