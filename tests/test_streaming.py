"""Batch-vs-stream equivalence (SURVEY §5): the same window plan must give
identical results run over the batch table and over the file stream with
the availableNow trigger."""

from __future__ import annotations

from pyspark.sql import functions as F

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


def test_session_stream_equals_batch(spark, tmp_path):
    """The two registered session keys agree row-for-row: the rows-only
    streaming `stream_session_window` (state store, watermark, availableNow)
    and the oracle-checked batch `sessionize_batch` (gaps-and-islands
    windows) produce the same per-user session sequence — (n_events,
    duration) in session order — on a shared fixture.

    Fixture rules that make exact equality well-defined:
    * whole-second timestamps (batch truncates to seconds);
    * no gap of exactly 300 s (the two engines close half-open interval
      edges differently there);
    * a flush event 2000 s after the last real event advances the watermark
      past every real session so append mode emits all of them (the flush
      user itself is excluded from the comparison).
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    from debias_spark.registry import load_all_queries

    base = 1_700_000_000  # epoch seconds; written as TIMESTAMP(NANOS)
    rows, eid = [], 0
    # user -> sessions as lists of intra-session offsets (seconds)
    plan = {
        1: [[0, 10, 250], [0], [0, 299]],
        2: [[0, 120], [0, 50, 50, 50]],
        3: [[0]],
    }
    for user, sessions in plan.items():
        t = base + user * 10_000
        for sess in sessions:
            start = t
            for off in sess:
                eid += 1
                rows.append((eid, user, (start + off) * 1_000_000_000, "click", 1.0))
            t = start + (sess[-1] if sess else 0) + 400  # inter-session gap > 300
    flush_ts = max(r[2] for r in rows) // 1_000_000_000 + 2000
    rows.append((eid + 1, 999, flush_ts * 1_000_000_000, "flush", 0.0))

    # One FILE named events.parquet with a true TIMESTAMP(NANOS) ts column —
    # exactly the driver testdata's layout (stream_events glob-filters on the
    # file name; a Spark-written directory would not match).
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("ns")),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"), store_schema=False)

    qs = load_all_queries()
    streamed = qs["stream_session_window"].fn(spark, str(tmp_path)).collect()
    batch = qs["sessionize_batch"].fn(spark, str(tmp_path)).collect()

    def _stream_sessions(rows):
        out = {}
        for r in rows:
            if r.user_id == 999:
                continue
            start = r.session_start
            end = r.session_end
            from datetime import datetime

            dur = int(
                (
                    datetime.fromisoformat(end) - datetime.fromisoformat(start)
                ).total_seconds()
            ) - 300  # session_window end = last event + gap
            out.setdefault(r.user_id, []).append((start, r.n_events, dur))
        return {
            u: [(n, d) for _, n, d in sorted(v)] for u, v in out.items()
        }

    def _batch_sessions(rows):
        out = {}
        for r in rows:
            if r.user_id == 999:
                continue
            out.setdefault(r.user_id, []).append((r.session_id, r.n_events, r.duration_s))
        return {
            u: [(n, d) for _, n, d in sorted(v)] for u, v in out.items()
        }

    assert _stream_sessions(streamed) == _batch_sessions(batch)


def test_session_window_invariants(spark, sf_dir):
    out = run_available_now(session_window_counts(stream_events(spark, sf_dir)), spark)
    rows = out.collect()
    assert len(rows) > 0
    total_events = table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) <= total_events  # watermark may hold tail back
    assert all(r.session_start <= r.session_end for r in rows)
    assert all(r.n_events >= 1 for r in rows)


def test_stream_dedup_watermark_bounds(spark, sf_dir):
    """Watermark dedup: per event_type, first-seen count is bounded below
    by the batch distinct-user count (state eviction can only re-admit a
    key, never lose one) and above by the raw event count."""
    from debias_spark.registry import load_all_queries

    out = {
        r.event_type: r.n_first_seen
        for r in load_all_queries()["stream_dedup_watermark"].fn(spark, sf_dir).collect()
    }
    ev = table(spark, sf_dir, "events")
    distinct = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    raw = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert set(out) == set(distinct)
    for t, n in out.items():
        assert distinct[t] <= n <= raw[t], (t, n, distinct[t], raw[t])


def test_stream_stream_join_rows_verify_against_batch(spark, sf_dir):
    """Every emitted (purchase, click) row must satisfy the join predicate
    against the BATCH tables: same user, click within the hour before the
    purchase — the stream join may drop late rows (watermark) but must
    never emit a wrong pair."""
    from debias_spark.registry import load_all_queries

    rows = load_all_queries()["stream_stream_join"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("t")
    )
    clicks = {(r.user_id, r.t) for r in ev.filter("event_type = 'click'").collect()}
    purchases = {
        (r.user_id, r.t) for r in ev.filter("event_type = 'purchase'").collect()
    }
    from datetime import datetime, timedelta

    fmt = "%Y-%m-%d %H:%M:%S"
    for r in rows:
        assert (r.user_id, r.purchase_time) in purchases
        assert (r.user_id, r.click_time) in clicks
        p = datetime.strptime(r.purchase_time, fmt)
        c = datetime.strptime(r.click_time, fmt)
        assert p - timedelta(hours=1) <= c <= p, (r.user_id, r.click_time, r.purchase_time)
