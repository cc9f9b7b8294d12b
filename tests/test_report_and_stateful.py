"""Report renderer sink + custom stateful streaming operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from debias_spark.annotate import annotate
from debias_spark.catalog import table
from debias_spark.pipeline import report_rows
from debias_spark.report import HAVE_REPORTLAB, render_reports
from debias_spark.streaming import run_available_now, stream_events
from debias_spark.streaming.stateful import running_user_counts


@pytest.fixture()
def annotated(spark):
    rows = [
        ("1, slow old ride", "en", "a.csv"),
        ("2, clean", "en", "a.csv"),
        ("1, big thing", "de", "b.csv"),
    ]
    df = spark.createDataFrame(rows, ["value", "language", "src_file"])
    return annotate(df, text_col="value", lang_col="language")


def test_render_text_reports(annotated, tmp_path):
    names = render_reports(report_rows(annotated), str(tmp_path))
    assert names == ["a.txt", "b.txt"]
    content = (tmp_path / "a.txt").read_text()
    assert "Record #" in content and "Issue: " in content
    # flagged-only: record 2 (clean) must not appear
    assert "clean" not in content


def test_render_pdf_raises_without_reportlab(annotated, tmp_path):
    if HAVE_REPORTLAB:
        names = render_reports(report_rows(annotated), str(tmp_path), fmt="pdf")
        assert names == ["a.pdf", "b.pdf"]
    else:
        with pytest.raises(NotImplementedError, match="reportlab"):
            render_reports(report_rows(annotated), str(tmp_path), fmt="pdf")


def test_stateful_counts_match_batch(spark, sf_dir):
    """The custom stateful aggregate's final state must equal the batch
    groupBy — state-store execution, identical semantics."""
    out = run_available_now(
        running_user_counts(stream_events(spark, sf_dir)), spark, output_mode="update"
    )
    # update mode may emit one row per user per trigger: the final row per
    # user is the one with the max running count
    final = (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("sum_value").alias("sum_value"))
        .collect()
    )
    batch = {
        r.user_id: (r.n, round(r.s, 2))
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    got = {r.user_id: (r.n_events, round(r.sum_value, 2)) for r in final}
    assert got == batch
