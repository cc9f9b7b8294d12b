"""Round-5 relational wave 2 (X97-X98): a portable count-min sketch with
heavy-hitter estimates, and regex sequence-pattern matching over per-user
event strings (the MATCH_RECOGNIZE-lite primitive).

No reference citation: the reference (SirHooke/debias-batch-processor) has
no aggregation/sketch surface (SURVEY §2.G); north-star extensions per
SURVEY §2.H.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debias_spark.catalog import table
from debias_spark.registry import register

_CM_D = 4  # hash rows
_CM_W = 256  # buckets per row


def _cm_bucket(i: int, key):
    """Row-i count-min bucket of a string column: first 4 md5 hex chars of
    the salted key, mod width — engine-portable (DuckDB restates it as
    ('0x' || substr(md5(...), 1, 4))::BIGINT % w)."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}:"), key)), 1, 4), 16, 10)
        .cast("long")
        % _CM_W
    )


@register(
    "agg_countmin_heavyhitters",
    "X97",
    oracle=f"""
    WITH keyed AS MATERIALIZED (
        SELECT CAST(user_id AS VARCHAR) AS k FROM events
    ), cm AS MATERIALIZED (
        SELECT r.i AS i,
               (('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || k), 1, 4))::BIGINT
                % {_CM_W}) AS bucket,
               count(*) AS c
        FROM keyed CROSS JOIN range({_CM_D}) r(i)
        GROUP BY 1, 2
    ), top AS MATERIALIZED (
        SELECT user_id, count(*) AS n_exact FROM events
        GROUP BY user_id ORDER BY n_exact DESC, user_id LIMIT 10
    )
    SELECT t.user_id, t.n_exact,
           min(c.c) AS cm_est,
           CAST(min(c.c) - t.n_exact AS BIGINT) AS overcount
    FROM top t
    CROSS JOIN range({_CM_D}) r(i)
    JOIN cm c
      ON c.i = r.i
     AND c.bucket = (('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':'
                      || CAST(t.user_id AS VARCHAR)), 1, 4))::BIGINT % {_CM_W})
    GROUP BY t.user_id, t.n_exact
    """,
)
def agg_countmin_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation, FULLY value-oracled: build a
    4x256 CM table over event user_ids (md5-salted bucket hashes,
    so both engines compute bit-identical sketches — no banding needed),
    then estimate the true top-10 users' frequencies as the min over the
    4 bucket counters.  overcount = est - exact is the CM collision
    error, >= 0 by construction; a hash or merge bug anywhere flips the
    driver hash.

    Why CM at 100 TB: the sketch is a FIXED-SIZE (d x w counters),
    fully mergeable aggregate — per-partition sketches combine by
    element-wise addition, so frequency estimation over any key universe
    costs one map-side-combined shuffle of d*w longs per partition,
    versus a full groupBy whose shuffle grows with the key cardinality.
    Here the build IS a groupBy (i, bucket) — bounded at d*w = 1024
    rows regardless of input size — and the estimate probe broadcasts that
    tiny table back onto the candidate keys.

    Plan: one scan explodes each row into 4 (i, bucket) pairs
    (generator, codegen); the CM aggregate is map-side combined into
    <= 1024 rows; the exact top-10 is a separate count-topN
    (TakeOrdered, no global sort); the probe joins top-10 x 4 rows
    against the broadcast CM table."""
    ev = table(spark, sf_dir, "events")
    keyed = ev.select(F.col("user_id").cast("string").alias("k"))
    cm = (
        keyed.select(
            F.posexplode(F.array(*[_cm_bucket(i, F.col("k")) for i in range(_CM_D)]))
            .alias("i", "bucket")
        )
        .groupBy("i", "bucket")
        .agg(F.count("*").alias("c"))
    )
    top = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), "user_id")
        .limit(10)
    )
    probes = top.select(
        "user_id",
        "n_exact",
        F.posexplode(
            F.array(
                *[
                    _cm_bucket(i, F.col("user_id").cast("string"))
                    for i in range(_CM_D)
                ]
            )
        ).alias("i", "bucket"),
    )
    return (
        probes.join(F.broadcast(cm), ["i", "bucket"])
        .groupBy("user_id", "n_exact")
        .agg(
            F.min("c").alias("cm_est"),
            (F.min("c") - F.col("n_exact")).cast("long").alias("overcount"),
        )
    )


@register(
    "events_sequence_pattern",
    "X98",
    oracle="""
    WITH seq AS MATERIALIZED (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS s
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(s) AS INTEGER) AS n_events,
           regexp_matches(s, 'v.*c.*p') AS funnel_vcp,
           regexp_matches(s, 'e{2}') AS double_error
    FROM seq
    """,
)
def events_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching (MATCH_RECOGNIZE-lite): encode each
    user's event history as an ordered initial-letter string (event types
    click/error/purchase/signup/view have distinct initials) and run regex
    patterns over it — did the user complete the view->click->purchase
    funnel in order?  did they ever hit two consecutive errors?  The
    (ts, event_id) sort key is a total order, so the encoding is
    deterministic and both engines agree exactly.

    The string encoding is the scalable trick: pattern state collapses
    into one groupBy + a per-row regex instead of k self-joins (the
    k-step funnel join explodes combinatorially; the regex scan is linear
    in history length).  Spark side sorts via array_sort over
    (ts, event_id, initial) structs — lexicographic struct order equals
    the SQL ORDER BY — then folds to a string.

    Scale shape: one shuffle (groupBy user), per-user state bounded by
    history length; a pathological mega-user would cap/split history
    upstream, same as any sessionization."""
    ev = table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "ts", "event_id", F.substring("event_type", 1, 1).alias("ini")
                )
            )
        ).alias("seq")
    )
    s = F.concat_ws("", F.transform("seq", lambda x: x["ini"]))
    return seq.select(
        "user_id",
        F.length(s).cast("int").alias("n_events"),
        s.rlike("v.*c.*p").alias("funnel_vcp"),
        s.rlike("e{2}").alias("double_error"),
    )
