"""Round-9 wave 5 (MM11): shot-boundary detection over a sampled frame
stream — consecutive frame-histogram differencing, the standard first
pass of video segmentation, with the frame decode stubbed by the MM2
text-as-frames convention (the container has no video libs; the Spark
dataflow — frame explode, per-stream ordered differencing, per-asset
rollup — is the real, tested part, per the multimodal charter).

Reference parity: the reference has no media surface; this completes the
MM family's video side (MM2 samples frames, MM11 segments them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from debias_spark.catalog import table
from debias_spark.registry import register

_FRAME_W = 32  # chars per synthetic frame (the MM2 convention)
_SHOT_TH = 12  # histogram L1 distance at/over this = a shot boundary

# 4-bin character-class histogram per frame: spaces, vowels, digits, rest
_BINS_DUCK = """
    length(frame) - length(replace(frame, ' ', '')) AS b_space,
    length(frame) - length(regexp_replace(frame, '[aeiou]', '', 'g')) AS b_vowel,
    length(frame) - length(regexp_replace(frame, '[0-9]', '', 'g')) AS b_digit,
    CAST(length(frame) AS BIGINT) AS b_len"""
def _bins_spark():
    # built lazily: Column construction needs a live SparkContext, and
    # this module must import session-free (registry tooling, survey
    # generator) — module-level Columns crash any sessionless import
    return [
        (F.length("frame") - F.length(F.replace(F.col("frame"), F.lit(" ")))).alias("b_space"),
        (F.length("frame") - F.length(F.regexp_replace("frame", "[aeiou]", ""))).alias("b_vowel"),
        (F.length("frame") - F.length(F.regexp_replace("frame", "[0-9]", ""))).alias("b_digit"),
        F.length("frame").cast("long").alias("b_len"),
    ]

_L1 = (
    "abs(b_space - lag_space) + abs(b_vowel - lag_vowel)"
    " + abs(b_digit - lag_digit)"
    " + abs((b_len - b_space - b_vowel - b_digit)"
    "       - (lag_len - lag_space - lag_vowel - lag_digit))"
)


@register(
    "multimodal_shot_boundaries",
    "MM11",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, text, CAST(length(text) AS BIGINT) AS L
        FROM documents WHERE length(text) > 0
    ), mx AS (
        SELECT max(L) AS m FROM t
    ), dims AS (
        SELECT unnest(range(0, ((SELECT m FROM mx) + {_FRAME_W} - 1)
                               // {_FRAME_W})) AS i
    ), f AS (
        SELECT doc_id, CAST(i AS BIGINT) AS i,
               substr(text, CAST(i * {_FRAME_W} + 1 AS INT), {_FRAME_W}) AS frame
        FROM t JOIN dims ON i <= (L - 1) // {_FRAME_W}
    ), h AS (
        SELECT doc_id, i, {_BINS_DUCK}
        FROM f
    ), d AS (
        SELECT doc_id, i, b_space, b_vowel, b_digit, b_len,
               lag(b_space) OVER w AS lag_space,
               lag(b_vowel) OVER w AS lag_vowel,
               lag(b_digit) OVER w AS lag_digit,
               lag(b_len) OVER w AS lag_len
        FROM h WINDOW w AS (PARTITION BY doc_id ORDER BY i)
    ), diffs AS (
        SELECT doc_id,
               CASE WHEN lag_len IS NULL THEN NULL
                    ELSE CAST({_L1} AS BIGINT) END AS diff
        FROM d
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(1 + sum(CASE WHEN diff >= {_SHOT_TH} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_shots,
           CAST(max(diff) AS BIGINT) AS max_diff,
           CAST(sum(diff) * 100 // nullif(count(diff), 0) AS BIGINT)
               AS mean_diff_e2
    FROM diffs GROUP BY doc_id
    """,
)
def multimodal_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection: each asset's frame stream (fixed 32-char
    windows under the MM2 text-as-frames stub) reduces to a 4-bin
    character-class histogram per frame; consecutive frames compare by
    histogram L1 distance (the classic cut detector), a distance at or
    over the threshold opens a new shot, and the per-asset report gives
    frame count, shot count, peak and mean inter-frame change (e2
    integer).  With a real decoder the histogram becomes a color/HOG
    histogram per decoded frame and NOTHING else changes — the explode,
    the per-stream ordered lag window, and the rollup are the 100 TB
    dataflow being pinned.

    Scale shape: the frame explode is a fused generator; histograms are
    pure codegen length/regexp arithmetic (exact integers); the lag runs
    per-asset (no global window); one rollup shuffle on doc_id."""
    docs = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    f = docs.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.expr(f"(length(text) - 1) div {_FRAME_W}"))
        ).alias("i"),
        F.col("text"),
    ).select(
        "doc_id",
        F.col("i").cast("long").alias("i"),
        F.expr(f"substring(text, CAST(i * {_FRAME_W} + 1 AS INT), {_FRAME_W})").alias(
            "frame"
        ),
    )
    h = f.select("doc_id", "i", *_bins_spark())
    w = Window.partitionBy("doc_id").orderBy("i")
    d = h.select(
        "doc_id",
        "i",
        "b_space",
        "b_vowel",
        "b_digit",
        "b_len",
        F.lag("b_space").over(w).alias("lag_space"),
        F.lag("b_vowel").over(w).alias("lag_vowel"),
        F.lag("b_digit").over(w).alias("lag_digit"),
        F.lag("b_len").over(w).alias("lag_len"),
    ).select(
        "doc_id",
        F.when(F.col("lag_len").isNull(), F.lit(None).cast("long"))
        .otherwise(F.expr(_L1).cast("long"))
        .alias("diff"),
    )
    return d.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        (
            F.lit(1)
            + F.sum(F.when(F.col("diff") >= _SHOT_TH, 1).otherwise(0))
        ).cast("long").alias("n_shots"),
        F.max("diff").alias("max_diff"),
        F.expr("CAST(sum(diff) * 100 div nullif(count(diff), 0) AS BIGINT)").alias(
            "mean_diff_e2"
        ),
    )
