from debias_spark.sources.text_corpus import SUPPORTED_LANGUAGES, read_corpus
from debias_spark.sources.json_io import (
    RESPONSE_SCHEMA,
    read_outputs,
    write_outputs_partitioned,
    write_outputs_per_file,
)

__all__ = [
    "SUPPORTED_LANGUAGES",
    "read_corpus",
    "RESPONSE_SCHEMA",
    "read_outputs",
    "write_outputs_partitioned",
    "write_outputs_per_file",
]
