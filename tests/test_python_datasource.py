"""Custom Python DataSource + UDTF tests (Spark 4 API surfaces)."""

from __future__ import annotations

from pyspark.sql import functions as F

from debias_spark.sources.synthetic import register


def test_synthetic_source_deterministic_and_partitioned(spark):
    register(spark)
    df = spark.read.format("synthetic_corpus").option("shards", 4).option(
        "rowspershard", 50
    ).load()
    assert df.count() == 200
    assert df.schema.simpleString() == "struct<doc_id:bigint,text:string,lang:string>"
    # deterministic: same options -> identical corpus
    df2 = spark.read.format("synthetic_corpus").option("shards", 4).option(
        "rowspershard", 50
    ).load()
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, df2.collect()))
    # partition planning: doc_ids are dense across shards
    ids = sorted(r.doc_id for r in df.select("doc_id").collect())
    assert ids == list(range(200))
    # generated corpus is usable by the engine's text operators
    n_langs = df.select("lang").distinct().count()
    assert n_langs == 5
    top = (
        df.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .count()
        .orderBy(F.desc("count"))
        .first()
    )
    assert top["count"] > 0
