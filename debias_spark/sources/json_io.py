"""Annotation-output JSON source/sink (SURVEY §1.2, §2.A A3/A4).

The reference writes one ``<stem>-output.json`` response document per input
file (call-debias.py:141,154) and the analytics parser globs
``*-output.json`` back (analytics/parser.py:16) — the suffix is
load-bearing.  Two sinks:

* ``write_outputs_partitioned`` — the scale path: newline-delimited JSON,
  partitioned by language, written fully distributed.  This is what a
  100 TB run uses; downstream reads are partition-pruned.
* ``write_outputs_per_file`` — the compatibility path: exact per-file
  response documents with the reference's naming contract, so existing
  consumers of the reference's output directory can point at ours
  unchanged.  Document assembly happens distributed (groupBy + to_json);
  only the final small-file writes land on the driver, which is the
  correct place for a many-small-files contract.
"""

from __future__ import annotations

import pathlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

TAG_SCHEMA = StructType(
    [
        StructField("literal", StringType()),
        StructField("issue", StringType()),
        StructField("source", StringType()),
    ]
)

# SURVEY §1.2 — the canonical nested response document
RESPONSE_SCHEMA = StructType(
    [
        StructField(
            "results",
            ArrayType(
                StructType(
                    [
                        StructField("literal", StringType()),
                        StructField("language", StringType()),
                        StructField("tags", ArrayType(TAG_SCHEMA)),
                    ]
                )
            ),
        )
    ]
)


def _result_struct() -> F.Column:
    return F.struct(
        F.col("literal"),
        F.col("language"),
        F.col("tags").cast(ArrayType(TAG_SCHEMA)).alias("tags"),
    )


def write_outputs_partitioned(annotated: DataFrame, output_dir: str) -> None:
    """Scale-path sink: one JSON line per record, partitioned by language."""
    (
        annotated.select("src_file", "language", _result_struct().alias("result"))
        .write.mode("overwrite")
        .partitionBy("language")
        .json(output_dir)
    )


def assemble_response_docs(annotated: DataFrame) -> DataFrame:
    """(src_file, json) — one reference-shaped response document per input
    file, assembled distributed (collect_list under the src_file shuffle)."""
    return (
        annotated.groupBy("src_file")
        .agg(F.collect_list(_result_struct()).alias("results"))
        .select(
            "src_file",
            F.to_json(F.struct(F.col("results"))).alias("json"),
        )
    )


def write_outputs_per_file(annotated: DataFrame, output_dir: str) -> list[str]:
    """Compatibility sink honoring the '<stem>-output.json' naming contract.
    Returns the written filenames."""
    out = pathlib.Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    written = []
    for row in assemble_response_docs(annotated).collect():
        stem = row.src_file.rsplit(".", 1)[0]
        name = f"{stem}-output.json"
        (out / name).write_text(row.json)
        written.append(name)
    return sorted(written)


def read_outputs(spark: SparkSession, output_dir: str) -> DataFrame:
    """Analytics source: glob *-output.json response docs back into the
    nested row type + source filename (analytics/parser.py:16-20)."""
    return (
        spark.read.schema(RESPONSE_SCHEMA)
        .option("multiLine", "true")
        .json(f"{output_dir}/*-output.json")
        .withColumn("file", F.regexp_extract(F.input_file_name(), r"/([^/]+)$", 1))
    )
