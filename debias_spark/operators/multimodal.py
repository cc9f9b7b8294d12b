"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, feature extraction as Arrow-batched pandas UDFs.

The Spark-side plumbing is real and tested: binary payloads travel through
Arrow as Python ``bytes``, features come back columnar via mapInPandas, and
partitioning/batching behave exactly as they would with real media.  The
``decode=True`` path runs a REAL pure-stdlib decoder (media_codec.py:
uncompressed 24-bit BMP, PCM16 WAV); compressed formats (JPEG/MP4) would
need PIL/ffmpeg, absent from this container — a production deploy swaps
the decoder at the same hook.  The default path extracts deterministic
byte-level features without interpreting the payload.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fmt", StringType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("md5_8", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sum_r", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a media table: opaque binary payload + typed metadata struct.
    (Here the payload is the utf-8 text; with real media it's the image/audio
    bytes — the schema and plumbing are identical.)"""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("text/plain").alias("format"),
        F.octet_length(payload).alias("n_bytes"),
    )
    return df.withColumn("payload", payload).withColumn("meta", meta)


def extract_features(df: DataFrame, decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    decode=True runs the REAL pure-stdlib decoder (operators/media_codec.py:
    24-bit BMP and PCM16 WAV) per batch and returns typed media dimensions;
    a production pipeline would swap in PIL/ffmpeg at the same hook for the
    compressed formats.  decode=False extracts byte-level features without
    interpreting the payload.
    """
    if decode:

        def run_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from debias_spark.operators.media_codec import decode_media

            for pdf in batches:
                rows = {k.name: [] for k in DECODED_SCHEMA.fields}
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                    m = decode_media(bytes(payload))
                    rows["doc_id"].append(doc_id)
                    rows["media_format"].append(m["format"])
                    rows["width"].append(m.get("width"))
                    rows["height"].append(m.get("height"))
                    rows["sum_r"].append(m.get("sum_r"))
                    rows["sample_rate"].append(m.get("sample_rate"))
                    rows["n_samples"].append(m.get("n_samples"))
                yield pd.DataFrame(rows)

        return df.select("doc_id", "payload").mapInPandas(
            run_decode, schema=DECODED_SCHEMA
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": [m["format"] for m in pdf["meta"]],
                    "n_bytes": payloads.map(len),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else None),
                    "md5_8": payloads.map(lambda b: hashlib.md5(b).hexdigest()[:8]),
                }
            )

    return df.select("doc_id", "payload", "meta").mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_chars", LongType()),
        StructField("frame_md5_8", StringType()),
    ]
)


def sample_frames(df: DataFrame, n_frames: int = 3, decode: bool = False) -> DataFrame:
    """Frame sampling: each payload fans out to ``n_frames`` rows (the
    video-frame-extraction shape: 1 input row -> N feature rows through
    mapInPandas).  Frames here are equal character slices of the decoded
    payload; a real pipeline would seek keyframes with ffmpeg at the
    ``decode=True`` hook (stubbed in this container)."""

    def run(batches):
        if decode:
            raise NotImplementedError("real frame decode requires ffmpeg")
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_chars": [], "frame_md5_8": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                s = payload.decode("utf-8")
                if not s:
                    continue
                k = max((len(s) + n_frames - 1) // n_frames, 1)
                for i in range(n_frames):
                    frame = s[i * k : (i + 1) * k]
                    if not frame:
                        continue
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_chars"].append(len(frame))
                    out["frame_md5_8"].append(
                        hashlib.md5(frame.encode("utf-8")).hexdigest()[:8]
                    )
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(run, schema=FRAME_SCHEMA)
