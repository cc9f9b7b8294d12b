"""Round-6 multimodal wave 2 (MM5): perceptual average-hash image
dedup through the real BMP decode path.

No reference citation: the reference (SirHooke/debias-batch-processor)
has no media surface; north-star extension per SURVEY §2.H.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StructField, StructType
from pyspark.sql.window import Window

from debias_spark.catalog import table
from debias_spark.registry import register

_PAYLOAD_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
)

# hash window: 4 wide x 3 tall — every synthesized image is >= 4x3
_HW, _HH = 4, 3


@register(
    "multimodal_image_avghash_buckets",
    "MM5",
    oracle=f"""
    WITH dims AS (
        SELECT doc_id,
               4 + doc_id % 13 AS w,
               3 + doc_id % 11 AS h
        FROM documents
    ), sums AS MATERIALIZED (
        SELECT doc_id, w, h,
               CAST(list_sum(flatten(list_transform(range(0, w), x ->
                    list_transform(range(0, h), y -> (3 * x + 5 * y) % 251)
               ))) AS BIGINT) AS sum_r
        FROM dims
    ), hashed AS MATERIALIZED (
        SELECT doc_id,
               CAST(list_sum(flatten(list_transform(range(0, {_HW}), x ->
                    list_transform(range(0, {_HH}), y ->
                        CASE WHEN ((3 * x + 5 * y) % 251) * w * h > sum_r
                             THEN 1::BIGINT << (y * {_HW} + x)
                             ELSE 0::BIGINT END)
               ))) AS BIGINT) AS ahash
        FROM sums
    )
    SELECT doc_id, ahash,
           count(*) OVER (PARTITION BY ahash) AS n_bucket
    FROM hashed
    """,
    bench=False,
)
def multimodal_image_avghash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash image dedup through REAL bytes: synthesize
    the Y30 BMP per document, decode the actual pixel array (row padding,
    BGR order, bottom-up storage all exercised), compute a 12-bit
    average-hash over the fixed top-left {_HW}x{_HH} window — bit set
    iff the pixel exceeds the image's mean red level — and bucket images
    by hash, the candidate-generation stage of every perceptual image
    dedup pipeline (identical/near-identical images collide; a verify
    stage would then compare within buckets, exactly the LSH
    band -> verify shape).

    Determinism: the mean comparison is spelled integer-exact
    (pixel * w * h > sum_r — no float division anywhere), so the hash,
    and therefore the buckets, replay exactly in SQL from the generation
    formulas.  A decoder bug in padding, channel order, or row direction
    flips hash bits and breaks the driver hash.

    Scale shape: decode + hash is embarrassingly-parallel mapInPandas
    over Arrow batches; the bucket size annotation is one window over
    the (hash) shuffle — at corpus scale the same plan feeds the
    within-bucket verify join."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from debias_spark.operators.media_codec import encode_bmp

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 4 + d % 13, 3 + d % 11
                payloads.append(
                    encode_bmp(
                        w, h,
                        lambda x, y: ((3 * x + 5 * y) % 251, (x * y) % 251, (x + 7 * y) % 251),
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from debias_spark.operators.media_codec import decode_bmp

        for pdf in batches:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                m = decode_bmp(bytes(payload), with_red_rows=True)
                w, h, sum_r = m["width"], m["height"], m["sum_r"]
                rows = m["red_rows"]
                ahash = 0
                for y in range(_HH):
                    for x in range(_HW):
                        if rows[y][x] * w * h > sum_r:
                            ahash |= 1 << (y * _HW + x)
                ids.append(int(doc_id))
                hashes.append(ahash)
            yield pd.DataFrame({"doc_id": ids, "ahash": hashes})

    docs = table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id").mapInPandas(gen, schema=_PAYLOAD_SCHEMA)
    hashed = payloads.mapInPandas(hash_batches, schema="doc_id long, ahash long")
    return hashed.select(
        "doc_id",
        "ahash",
        F.count("*").over(Window.partitionBy("ahash")).alias("n_bucket"),
    )


multimodal_image_avghash_buckets.__doc__ = (
    multimodal_image_avghash_buckets.__doc__
    .replace("{_HW}", str(_HW))
    .replace("{_HH}", str(_HH))
)
