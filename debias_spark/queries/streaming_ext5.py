"""Round-7 wave 2 (Z50): SALTED stream-static join — the manual skew
lever for streaming joins, where AQE's OptimizeSkewedJoin cannot help
(adaptive re-planning does not apply inside a micro-batch join whose
partitioning is pinned by streaming state).

Reference parity: none — the reference (SirHooke/debias-batch-processor)
has no streaming; north-star extension per SURVEY §2.H (H14-H16 family),
pairing join_aqe_skew_split (Z53, the engine-native batch lever) and
join_salted_hotkey (the manual batch lever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debias_spark.catalog import table
from debias_spark.registry import register

_NSALT = 8


@register(
    "stream_static_join_salted",
    "Z50",
    oracle="""
    WITH dim AS (
        SELECT event_type,
               CASE WHEN event_type IN ('click', 'view') THEN 'engagement'
                    WHEN event_type IN ('purchase', 'signup') THEN 'conversion'
                    ELSE 'ops' END AS category
        FROM events GROUP BY event_type
    )
    SELECT d.category,
           count(*) AS n,
           CAST(sum(e.event_id) AS BIGINT) AS id_checksum
    FROM events e JOIN dim d ON d.event_type = e.event_type
    GROUP BY d.category ORDER BY d.category
    """,
)
def stream_static_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join on a 5-value key (extreme skew: every stream
    row lands in one of five shuffle partitions), de-skewed by SALTING:
    the static dim explodes to (event_type, salt 0..7) — an 8x replica
    table, still tiny — and the stream derives salt = pmod(event_id, 8),
    so the join key (event_type, salt) spreads each hot key over 8
    tasks.  This is the streaming counterpart of Z53's AQE skew split:
    micro-batch joins cannot be re-planned adaptively, so the salt is
    the lever that survives at 100 TB (the dim replica factor trades a
    small static-side blowup for even task sizes; pick NSALT ~ the
    per-key row ratio / target task size).

    The shuffle_hash hint keeps the join on the SHUFFLED path — a
    broadcast of the 40-row dim would bypass the salted partitioning
    this key exists to exercise (at scale the dim side may be too big to
    broadcast, which is exactly when the salt matters).  Drained with
    availableNow into a complete-mode aggregate; the SQL oracle is the
    unsalted batch equivalent, proving the salt changes distribution and
    nothing else."""
    from debias_spark.streaming.incremental import run_available_now, stream_events

    ev = table(spark, sf_dir, "events")
    dim = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("_n"))
        .withColumn(
            "category",
            F.when(F.col("event_type").isin("click", "view"), "engagement")
            .when(F.col("event_type").isin("purchase", "signup"), "conversion")
            .otherwise("ops"),
        )
        .select("event_type", "category")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(_NSALT - 1))))
    )
    stream = stream_events(spark, sf_dir).withColumn(
        "salt", F.pmod(F.col("event_id"), F.lit(_NSALT)).cast("int")
    )
    joined = stream.join(dim.hint("shuffle_hash"), ["event_type", "salt"])
    agg = joined.groupBy("category").agg(
        F.count("*").alias("n"),
        F.sum("event_id").cast("long").alias("id_checksum"),
    )
    return run_available_now(agg, spark, output_mode="complete").orderBy("category")
