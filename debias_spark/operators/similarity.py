"""Similarity search over embedding columns (array<float>), Spark-first.

Brute-force cosine top-k is the exact baseline: probes (a bounded query
set) broadcast against the corpus, dot products via zip_with/aggregate —
all JVM-side, no Python.  Norms are precomputed per row BEFORE the join so
the O(probes x corpus) stage does one fused multiply-add pass per pair,
not three.

The scale path is LSH bucketing (random-hyperplane signs): each vector maps
to a bucket; probes only score candidates in their own bucket, cutting the
scored pairs by ~2^planes.  Hyperplanes are generated from a fixed seed so
the index is reproducible.  (An IVF variant is the same shape with k-means
centroids instead of hyperplanes.)
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    emb: DataFrame,
    probe_filter: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 4,
) -> DataFrame:
    """Exact cosine top-k: probes (rows matching probe_filter) vs the whole
    corpus.  Returns (query_id, cand_id, sim) with sim rounded and ties
    broken on cand_id, so the top-k set is deterministic."""
    base = emb.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("v"),
        l2_norm(F.col(vec_col)).alias("nrm"),
    )
    probes = emb.filter(probe_filter).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q"),
        l2_norm(F.col(vec_col)).alias("qn"),
    )
    scored = (
        F.broadcast(probes)
        .crossJoin(base)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(dot(F.col("q"), F.col("v")) / (F.col("qn") * F.col("nrm")), decimals).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "cand_id", "sim")
    )


def cosine_pairs_above(
    emb: DataFrame,
    probe_filter: Column,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: probe set vs corpus, keep
    pairs with rounded cosine >= threshold (threshold applied after rounding
    so the cut is reproducible across engines)."""
    base = emb.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("v"), l2_norm(F.col(vec_col)).alias("nrm")
    )
    probes = emb.filter(probe_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q"), l2_norm(F.col(vec_col)).alias("qn")
    )
    return (
        F.broadcast(probes)
        .crossJoin(base)
        .filter(F.col("query_id") < F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(dot(F.col("q"), F.col("v")) / (F.col("qn") * F.col("nrm")), decimals).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def hyperplanes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-LSH (fixed seed: the index
    is reproducible run-to-run and across executors)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit p = sign(v . plane_p)."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(c)) for c in plane])
        bit = (dot(vec_col, plane_col) > 0).cast("long")
        bucket = bucket.bitwiseOR(F.shiftleft(bit, p))
    return bucket


def ann_cosine_topk(
    emb: DataFrame,
    probe_filter: Column,
    k: int = 3,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only candidates in the probe's LSH bucket.
    With p planes the scored-pair count drops ~2^p vs brute force; recall is
    tunable via p (fewer planes = bigger buckets = higher recall)."""
    planes = hyperplanes(n_planes, dim)
    indexed = emb.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("v"),
        l2_norm(F.col(vec_col)).alias("nrm"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    probes = emb.filter(probe_filter).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q"),
        l2_norm(F.col(vec_col)).alias("qn"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        probes.join(indexed, "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(dot(F.col("q"), F.col("v")) / (F.col("qn") * F.col("nrm")), 4).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "cand_id", "sim")
    )
