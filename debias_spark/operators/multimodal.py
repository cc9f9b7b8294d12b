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
