"""SQL text interface.

The reference has no SQL surface at all (SURVEY §2.G); on Spark it is
free: register the catalog tables as views and hand the string to
spark.sql — full ANSI SQL with Catalyst planning, and the result is a
normal DataFrame that composes with every operator in this package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from debias_spark.catalog import register_views


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run ANSI SQL over the catalog tables (region nation customer
    supplier part orders lineitem events documents embeddings)."""
    register_views(spark, sf_dir)
    return spark.sql(query)
