"""Event-time window + streaming queries (SURVEY §2.H H14-H16)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debias_spark.catalog import table
from debias_spark.registry import register
from debias_spark.streaming import (
    run_available_now,
    session_window_counts,
    stream_events,
    tumbling_counts,
)


@register(
    "window_tumbling_event_time",
    "H14",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) + 0.0 AS sum_val
    FROM events GROUP BY window_start, event_type
    """,
)
def window_tumbling_event_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows, batch mode.  The identical plan
    (streaming.tumbling_counts) runs under Structured Streaming; the
    batch-vs-stream equivalence test proves result parity."""
    return tumbling_counts(table(spark, sf_dir, "events"))


@register(
    "window_sliding",
    "H15",
    oracle="""
    WITH b AS (
        SELECT CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) AS w1, value
        FROM events
    ), w AS (
        SELECT w1 AS ws, value FROM b
        UNION ALL
        SELECT w1 - 1800 AS ws, value FROM b
    )
    SELECT strftime(make_timestamp(ws * 1000000), '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n,
           round(sum(value), 2) + 0.0 AS sum_val
    FROM w GROUP BY ws
    """,
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour every 30 minutes): each event lands in two
    overlapping windows — Spark's window() generates both rows; the oracle
    states the same as a two-bucket UNION."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), (F.round(F.sum("value"), 2) + 0.0).alias("sum_val"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "sum_val",
        )
    )


@register(
    "stream_stateful_user_counts",
    "H16b",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS value_cents
    FROM events GROUP BY user_id
    """,
    bench=False,
)
def stream_stateful_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    counts in explicit group state, drained with availableNow — VALUE
    ORACLED (upgraded from rows-only in round 6 via the Z34 drain
    discipline): update mode may emit one row per user per micro-batch,
    but n_events strictly increases per emission, so the max-n_events row
    per user IS the final state regardless of how the source splits into
    batches — making the selected set batch-split-independent and
    hash-comparable to the batch groupBy the oracle runs.  The state
    carries integer cents (per-row floor(v*100+0.5) before accumulation)
    so float summation order cannot drift the value either.

    Scale shape: state is keyed by user_id, each trigger shuffles only
    that batch's rows to their state partitions, and Arrow batches feed
    the Python state function — the applyInPandasWithState contract a
    100 TB clickstream sessionizer relies on."""
    from debias_spark.streaming.stateful import running_user_counts

    stream = stream_events(spark, sf_dir)
    out = run_available_now(running_user_counts(stream), spark, output_mode="update")
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "value_cents")
    )


@register("stream_session_window", "H16", oracle=None, bench=False)  # rows-only
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows + watermark over a real file stream, availableNow
    trigger — the dashboard's Refresh re-scan (dashboard_widget.py:73) as an
    incremental stream.  Append mode emits sessions finalized by the
    watermark.  No faithful DuckDB oracle (gaps-and-islands + watermark
    semantics) -> rows-only; session invariants asserted in tests."""
    stream = stream_events(spark, sf_dir)
    return run_available_now(session_window_counts(stream), spark)


@register(
    "stream_rate_alert",
    "H18",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n
        FROM events GROUP BY h, event_type
    ), med AS (
        SELECT event_type, quantile_cont(n, 0.5) AS med_n
        FROM hourly GROUP BY event_type
    ), dev AS (
        SELECT h2.event_type, abs(h2.n - m.med_n) AS adev
        FROM hourly h2 JOIN med m USING (event_type)
    ), mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad_n
        FROM dev GROUP BY event_type
    ), thr AS (
        SELECT m.event_type, m.med_n + 3.0 * d.mad_n AS thr_n
        FROM med m JOIN mad d USING (event_type)
    )
    SELECT strftime(h.h, '%Y-%m-%d %H:%M:%S') AS window_start,
           h.event_type, h.n,
           round(t.thr_n, 4) + 0.0 AS thr_rounded,
           h.n > t.thr_n AS alert
    FROM hourly h JOIN thr t USING (event_type)
    """,
    bench=False,
)
def stream_rate_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming operational alerting: hourly event-rate counts per type
    flagged against a robust (median + 3*MAD of historical hourly rates)
    threshold — the on-call rate monitor, run as a REAL Structured
    Streaming query (stream-static broadcast join before the windowed
    aggregation, availableNow drain).  Thresholds are fitted in batch
    from the same table, the fit-offline/score-online split every
    production alerter uses.

    Unusually for a streaming key, the drained output is deterministic —
    complete-mode tumbling counts + a static threshold frame — so this
    key carries a full DuckDB oracle: the driver hash-matches an actual
    streaming execution against batch SQL, the strongest stream-batch
    equivalence evidence in the registry (stream_static_join_counts is
    the other)."""
    from debias_spark.streaming.incremental import rate_alerts

    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count("*").alias("n"))
    med = hourly.groupBy("event_type").agg(
        F.percentile("n", 0.5).alias("med_n")
    )
    dev = hourly.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("n") - F.col("med_n")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", 0.5).alias("mad_n")
    )
    thr = med.join(mad, "event_type").select(
        "event_type", (F.col("med_n") + 3.0 * F.col("mad_n")).alias("thr_n")
    )
    stream = stream_events(spark, sf_dir)
    return run_available_now(
        rate_alerts(stream, thr), spark, output_mode="complete"
    )
