"""Batch-vs-stream equivalence (SURVEY §5): the same window plan must give
identical results run over the batch table and over the file stream with
the availableNow trigger."""

from __future__ import annotations

from debias_spark.catalog import table
from debias_spark.streaming import (
    run_available_now,
    session_window_counts,
    stream_events,
    tumbling_counts,
)


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_batch_equals_stream(spark, sf_dir):
    batch = tumbling_counts(table(spark, sf_dir, "events"))
    stream = run_available_now(
        tumbling_counts(stream_events(spark, sf_dir)), spark, output_mode="complete"
    )
    assert _sorted_rows(batch) == _sorted_rows(stream)


def test_incremental_parquet_sink_is_incremental(spark, sf_dir, tmp_path):
    """foreachBatch sink: first drain writes everything; a second drain
    against the same checkpoint writes NOTHING new (incremental progress,
    not the reference's full re-scan)."""
    from debias_spark.streaming.incremental import incremental_parquet_sink

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    incremental_parquet_sink(stream_events(spark, sf_dir), out, ckpt)
    n_events = spark.read.parquet(out).count()
    assert n_events == spark.read.parquet(f"{sf_dir}/events.parquet").count()
    incremental_parquet_sink(stream_events(spark, sf_dir), out, ckpt)
    assert spark.read.parquet(out).count() == n_events  # no re-processing


def test_session_window_invariants(spark, sf_dir):
    out = run_available_now(session_window_counts(stream_events(spark, sf_dir)), spark)
    rows = out.collect()
    assert len(rows) > 0
    total_events = table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) <= total_events  # watermark may hold tail back
    assert all(r.session_start <= r.session_end for r in rows)
    assert all(r.n_events >= 1 for r in rows)
