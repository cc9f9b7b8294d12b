"""Source/sink format coverage: CSV / JSON / ORC round-trips with schema
fidelity (parquet is exercised everywhere else)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debias_spark.catalog import table


def _norm(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_format_roundtrip(spark, sf_dir, tmp_path, fmt):
    src = table(spark, sf_dir, "nation")
    out = str(tmp_path / f"nation_{fmt}")
    writer = src.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true")
    getattr(writer, fmt)(out)
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", "true").schema(src.schema)
    elif fmt == "json":
        reader = reader.schema(src.schema)
    back = getattr(reader, fmt)(out)
    assert back.schema == src.schema
    assert _norm(back) == _norm(src)


def test_csv_quoting_and_nulls(spark, tmp_path):
    """CSV escape hatches: embedded delimiters/quotes and null round-trip."""
    rows = [(1, 'has,comma', None), (2, 'has "quotes"', 'x'), (3, None, 'y')]
    df = spark.createDataFrame(rows, "id int, a string, b string")
    out = str(tmp_path / "quoted_csv")
    df.write.mode("overwrite").option("header", "true").csv(out)
    back = spark.read.option("header", "true").schema(df.schema).csv(out)
    assert _norm(back) == _norm(df)
