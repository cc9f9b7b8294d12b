"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic-corpus generator.

Demonstrates the non-file source surface: partition planning happens in
``partitions()`` (one InputPartition per shard -> parallel generation
across executors), and each partition's ``read`` is a pure function of
(shard, rows_per_shard, seed) — so the same options always generate the
same corpus on any cluster size.  This is how you back-fill load-test
corpora at 100 TB without staging files.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_WORDS = (
    "the quick brown fox jumps over a lazy dog slow big small fast "
    "data table row scan hash merge join filter sort group window"
).split()
_LANGS = ("en", "de", "es", "fr", "zh")

SCHEMA_DDL = "doc_id bigint, text string, lang string"


class _Shard(InputPartition):
    def __init__(self, shard: int):
        self.shard = shard


def _gen_rows(seed: int, shard: int, n_rows: int):
    """THE generator recipe: pure function of (seed, shard, row) — a
    multiplicative hash drives word/language selection, no RNG state,
    reproducible anywhere.  Single definition shared by the batch reader
    and the stream reader so batch/stream/oracle can never drift apart."""
    base = seed * 1_000_003 + shard * 7919
    for r in range(n_rows):
        doc_id = shard * n_rows + r
        h = (base + r * 2_654_435_761) & 0x7FFFFFFF
        n_words = 5 + h % 8
        words = [_WORDS[(h // (i + 1)) % len(_WORDS)] for i in range(n_words)]
        yield (doc_id, " ".join(words), _LANGS[h % len(_LANGS)])


class SyntheticCorpusReader(DataSourceReader):
    def __init__(self, options):
        self.n_shards = int(options.get("shards", "4"))
        self.rows_per_shard = int(options.get("rowspershard", "100"))
        self.seed = int(options.get("seed", "42"))

    def partitions(self):
        return [_Shard(i) for i in range(self.n_shards)]

    def read(self, partition: _Shard):
        yield from _gen_rows(self.seed, partition.shard, self.rows_per_shard)


class SyntheticCorpusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_corpus"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticCorpusReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticCorpusDataSource)


class _SyntheticStreamReader(SimpleDataSourceStreamReader):
    """SimpleDataSourceStreamReader over the same generator: offset =
    completed micro-batch count; each micro-batch emits one shard's rows
    (pure function of (seed, batch, row) — identical recipe to the batch
    reader, so replays and the SQL oracle agree byte for byte)."""

    def __init__(self, options):
        self.n_batches = int(options.get("batches", "4"))
        self.rows_per_batch = int(options.get("rowsperbatch", "100"))
        self.seed = int(options.get("seed", "42"))

    def initialOffset(self):
        return {"batch": 0}

    def _rows(self, batch: int):
        # same _gen_rows recipe as the batch reader, plus the batch column
        for doc_id, text, lang in _gen_rows(self.seed, batch, self.rows_per_batch):
            yield (doc_id, text, lang, batch)

    def read(self, start):
        # the engine's prefetch cache copy.copy()s the returned iterator:
        # it must be a list-backed iterator, never a generator
        b = start["batch"]
        if b >= self.n_batches:
            return (iter([]), {"batch": b})
        return (iter(list(self._rows(b))), {"batch": b + 1})

    def readBetweenOffsets(self, start, end):
        rows = []
        for b in range(start["batch"], end["batch"]):
            rows.extend(self._rows(b))
        return iter(rows)


class SyntheticCorpusStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_corpus_stream"

    def schema(self) -> str:
        return SCHEMA_DDL + ", batch bigint"

    def simpleStreamReader(self, schema):
        return _SyntheticStreamReader(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(SyntheticCorpusStreamSource)
