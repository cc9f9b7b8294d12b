"""Additional property coverage: hypothesis sweep of the first-comma split
semantics against a pure-Python reference implementation, and partitioned
parquet sink round-trip with partition pruning evidence."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from debias_spark.catalog import table
from debias_spark.sources.text_corpus import split_record

# space (not \t\n) because the engines' trim() matches Python strip() only
# for plain spaces — and the reference corpus is line-oriented by contract,
# so embedded newlines cannot occur in a record anyway
_LINE = st.text(alphabet="abz019,  ", max_size=24)


def _ref_split(line: str) -> tuple[str, str]:
    """The reference's exact semantics (call-debias.py:92-96): split on the
    FIRST comma, strip both, no-comma -> empty remainder."""
    parts = line.split(",", 1)
    rec = parts[0].strip()
    rest = parts[1].strip() if len(parts) > 1 else ""
    return rec, rest


@settings(max_examples=12, deadline=None)
@given(lines=st.lists(_LINE, min_size=1, max_size=40))
def test_split_record_matches_python_reference(spark, lines):
    df = spark.createDataFrame([(l,) for l in lines], ["value"])
    got = [
        (r.record_num, r.literal_text)
        for r in split_record(df).select("record_num", "literal_text").collect()
    ]
    assert sorted(got) == sorted(_ref_split(l) for l in lines)


def test_partitioned_parquet_sink_prunes(spark, sf_dir, tmp_path):
    """The 100 TB layout claim, executed: a language-partitioned parquet
    sink round-trips and an equality filter becomes a PartitionFilter (whole
    directories skipped, not row-filtered)."""
    docs = table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_by_lang")
    docs.write.partitionBy("lang").mode("overwrite").parquet(out)

    back = spark.read.parquet(out).filter(F.col("lang") == "en")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters", 1)[1][:120]
    n_en = docs.filter(F.col("lang") == "en").count()
    assert back.count() == n_en
