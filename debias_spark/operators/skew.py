"""Skew-handling join utilities (SURVEY §6 / SCALE.md).

AQE's skew-join splitting handles most skew at runtime; explicit salting is
the library recipe for the pathological case — one join key holding a
double-digit percentage of the fact table — where even a split partition's
build side is hot.  The transform is semantics-preserving: results equal
the plain join exactly (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi join with the fact side salted across ``salt`` sub-keys.

    The fact side gets a deterministic pseudo-random salt (hash of its key
    and a row-unique column is unnecessary — spraying rows of the SAME hot
    key is the goal, so a per-row uniform salt is used); the dim side is
    replicated ``salt`` times.  The join key becomes (key, salt), splitting
    each hot key's rows across ``salt`` reducers.

    Cost: dim side inflates x salt — use only when dim is the small side
    and the fact key distribution is pathological.
    """
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    salted_dim = dim.withColumn("_salt", salts)
    cond = (salted_fact[fact_key] == salted_dim[dim_key]) & (
        salted_fact["_salt"] == salted_dim["_salt"]
    )
    return salted_fact.join(salted_dim, cond, how).drop("_salt")


def key_skew_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Skew diagnostic: row count of the hottest keys vs the mean — run this
    before deciding between AQE-only and explicit salting."""
    counts = df.groupBy(key).agg(F.count("*").alias("n"))
    total = counts.agg(
        F.sum("n").alias("total_rows"), F.count("*").alias("n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            key,
            "n",
            # centi-units integer via floor(x*100 + 0.5 + eps), not
            # round(x, 2): an integer ratio landing on an exact .xx5 tie
            # splits Spark (shortest-decimal HALF_UP) from DuckDB (binary
            # round) — the llm_ops13 flesch recipe.
            F.floor(
                F.col("n") * F.col("n_keys") / F.col("total_rows") * 100
                + F.lit(0.5 + 1e-9)
            )
            .cast("long")
            .alias("x_mean_centi"),
        )
        .orderBy(F.desc("n"), F.asc(key))
        .limit(top)
    )


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Scale-adaptive MAP-STAGE fan-out (guide §2: make partitioning
    scale-adaptive, not a constant tuned for local mode or the cluster).

    Small corpora arrive as single-row-group parquet files, so a scan
    yields ONE input partition and every pre-exchange map chain above it
    (char-gram md5 explodes, tokenization, shingle/signature builds, PQ
    encodes) runs on one core of the whole machine — byte-range splits
    cannot parallelize below a row-group boundary.  When the frame has
    fewer partitions than the session's default parallelism, ONE
    round-robin exchange of the narrow base rows spreads the map work
    across the executor; when the input is already split (any
    production-size table under the stock 128 MB maxPartitionBytes),
    the condition is false and NO exchange is added — the helper
    disappears from the plan at scale.

    Values are unaffected: repartition() is deterministic under retries
    (sortBeforeRepartition) and every caller aggregates or joins on
    keys independent of physical row placement.
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
