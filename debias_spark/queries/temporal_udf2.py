"""Round-7 wave 4 (T13): forward as-of join with tolerance — the
pandas.merge_asof(direction='forward', tolerance=...) semantics, spelled
as a reversed-frame window so it never range-joins.

Reference parity: none — the reference (SirHooke/debias-batch-processor)
has no temporal surface; extension per SURVEY §2.H (T family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debias_spark.catalog import table
from debias_spark.registry import register

_TOL_S = 1800  # 30-minute tolerance


@register(
    "join_asof_forward_tolerance",
    "T13",
    oracle=f"""
    WITH w AS (
        SELECT event_id, user_id, event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS sec,
               min(CASE WHEN event_type = 'view'
                        THEN CAST(floor(epoch(ts)) AS BIGINT) END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
               ) AS next_view_sec
        FROM events
    )
    SELECT event_id, user_id, sec AS purchase_sec,
           CASE WHEN next_view_sec - sec <= {_TOL_S}
                THEN next_view_sec END AS next_view_sec,
           CASE WHEN next_view_sec - sec <= {_TOL_S}
                THEN next_view_sec - sec END AS gap_s
    FROM w WHERE event_type = 'purchase'
    ORDER BY event_id
    """,
)
def join_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: for every purchase, the FIRST view
    event strictly after it by the same user, matched only within 30
    minutes (merge_asof direction='forward' semantics — the
    post-purchase-engagement counterpart of T1's backward last-click).
    Like T1, this is not a join at all: a min over the FOLLOWING window
    frame per user delivers the next-view time in one pass — one
    shuffle on user_id, no range self-join, which is how a forward
    as-of must execute at 100 TB.  Out-of-tolerance matches null out
    AFTER the window (the window finds the nearest; tolerance is a
    projection), and all comparisons are whole-second integers so both
    engines agree regardless of timestamp precision.

    Scale shape: one user-partitioned window + projection + filter —
    embarrassingly parallel across users."""
    ev = table(spark, sf_dir, "events")
    sec = F.unix_seconds(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    next_view = F.min(
        F.when(F.col("event_type") == "view", sec)
    ).over(w)
    base = ev.select(
        "event_id",
        "user_id",
        "event_type",
        sec.alias("sec"),
        next_view.alias("nv"),
    ).filter(F.col("event_type") == "purchase")
    in_tol = (F.col("nv") - F.col("sec")) <= _TOL_S
    return base.select(
        "event_id",
        "user_id",
        F.col("sec").alias("purchase_sec"),
        F.when(in_tol, F.col("nv")).alias("next_view_sec"),
        F.when(in_tol, F.col("nv") - F.col("sec")).alias("gap_s"),
    ).orderBy("event_id")
