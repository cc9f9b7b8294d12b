"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, feature extraction as Arrow-batched pandas UDFs.

The Spark-side plumbing is real and tested: binary payloads travel through
Arrow as Python ``bytes``, features come back columnar via mapInPandas, and
partitioning/batching behave exactly as they would with real media.  The
actual media DECODE step (PIL/ffmpeg/torchaudio) is stubbed — those
libraries aren't in this container — behind ``decode=True`` which raises
NotImplementedError; the default path extracts deterministic byte-level
features so every downstream stage is exercisable.
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

    decode=True is the hook where a real pipeline would run PIL/ffmpeg per
    batch (resize, frame-sample, spectrogram); stubbed in this container.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decode:
            raise NotImplementedError(
                "media decode requires PIL/ffmpeg (not in this container); "
                "byte-level features are the default path"
            )
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
