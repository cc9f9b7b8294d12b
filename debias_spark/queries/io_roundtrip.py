"""Round-4 source/sink wave (Z25-Z26): columnar-format roundtrips that
exercise the WRITE path as a first-class, driver-hash-checked operator.

Every other key reads the driver's parquet; these two write a real sink
(ORC, partitioned parquet) inside the repo's warehouse dir, read it back
through a fresh scan, and aggregate — the oracle computes the identical
aggregate straight from the source parquet, so a hash match proves the
sink+source path is lossless and the partition layout prunes correctly.

Reference parity: the reference's only sink is a JSON file
(call-debias.py:141,154 — covered by debias_spark/sources/json_io.py);
columnar sinks are north-star extensions per SURVEY §2.A4 rationale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debias_spark.catalog import table
from debias_spark.registry import register

_WAREHOUSE = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "spark-warehouse", "io_roundtrip")


def _sink_dir(sf_dir: str, name: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return os.path.join(_WAREHOUSE, f"{name}_{tag}")


_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"


@register(
    "sink_orc_roundtrip",
    "Z25",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum({_CENTS}) AS BIGINT) AS rev_cents
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink/source roundtrip: project orders to typed columns, write
    ORC (snappy), re-read through a fresh scan, and aggregate fulfilled
    orders per priority.  The oracle aggregates the source parquet
    directly — a hash match proves the ORC writer/reader preserves every
    value and type exactly.

    Scale shape: the write is one task per input partition (the
    parallel-writer path a real cluster uses — no coalesce(1)
    single-writer bottleneck); the read-back filter reaches the ORC scan
    as a pushed predicate (ORC carries min/max stride stats like
    parquet), and the aggregate is the standard partial+final pair.
    Write mode is overwrite, so the key is idempotent per (sf, format)
    sink dir."""
    src = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    out = _sink_dir(sf_dir, "orc_orders")
    src.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return (
        back.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("cents").alias("rev_cents"),
        )
    )


@register(
    "sink_partitioned_parquet_prune",
    "Z26",
    oracle="""
    SELECT l_linestatus,
           count(*) AS n_items,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem
    WHERE l_returnflag = 'R'
    GROUP BY l_linestatus
    """,
)
def sink_partitioned_parquet_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink + partition-pruned read-back: write
    lineitem partitioned BY l_returnflag (hive-style directory layout),
    read it back filtered to the returned-items partition, and aggregate
    per line status.  The oracle runs the same filtered aggregate on the
    source table; the hash match proves the partitioned layout loses no
    rows and the partition column round-trips from directory names.

    Scale shape: this is THE layout decision that makes a 100 TB table
    cheap to query — the read-back filter is a PartitionFilter (plan
    shows it), so Spark lists and scans ONE of the three flag
    directories and never opens the rest; partition pruning happens at
    planning, before any IO.  tests/test_io_roundtrip.py pins the
    pruned-scan plan shape.  The partition column is low-cardinality (3
    values) by design — partitioning by a high-cardinality key would
    produce a small-files explosion; that discipline is the point of
    choosing l_returnflag here."""
    src = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("long").alias("qty"),
    )
    out = _sink_dir(sf_dir, "part_lineitem")
    src.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.filter(F.col("l_returnflag") == "R")
        .groupBy("l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("qty").alias("total_qty"),
        )
    )
