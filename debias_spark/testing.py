"""Local replica of the driver's t2 oracle gate.

The driver runs each queries()[name] on Spark and oracle_sql()[name] on
DuckDB over the same parquet views, then compares row-count + schema +
order-insensitive value-hash (columns sorted by name).  This module does the
same comparison locally so mismatches surface at sf0.001 in pytest before
the driver sees them at sf0.01.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb
import pandas as pd

from debias_spark.catalog import TABLES

FLOAT_DECIMALS = 6


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        r = round(v, FLOAT_DECIMALS)
        return 0.0 if r == 0.0 else r  # collapse -0.0
    if isinstance(v, (datetime, date, pd.Timestamp)):
        return str(v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    return v


def normalize_frame(pdf: pd.DataFrame) -> list[tuple]:
    """Columns sorted by name, cells normalized, rows sorted — an
    order-insensitive canonical form."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


# Spark simpleString / DuckDB type -> comparable family, to catch e.g.
# Spark int vs DuckDB BIGINT schema drift before the driver does.
_SPARK_FAMILY = {
    "bigint": "i64", "int": "i32", "smallint": "i16", "double": "f64",
    "float": "f32", "string": "str", "boolean": "bool",
    "timestamp": "ts", "timestamp_ntz": "ts", "date": "date",
}
_DUCK_FAMILY = {
    "BIGINT": "i64", "INTEGER": "i32", "SMALLINT": "i16", "DOUBLE": "f64",
    "FLOAT": "f32", "VARCHAR": "str", "BOOLEAN": "bool",
    "TIMESTAMP": "ts", "TIMESTAMP_NS": "ts", "DATE": "date",
}


def _check_schema_families(spark_df, oracle_sql: str, con) -> None:
    stypes = {f.name.lower(): f.dataType.simpleString() for f in spark_df.schema.fields}
    dtypes = {r[0].lower(): r[1] for r in con.execute(f"DESCRIBE {oracle_sql}").fetchall()}
    for col, st in stypes.items():
        if col not in dtypes:
            continue  # column-set equality is asserted separately
        sf = _SPARK_FAMILY.get(st)
        df_ = _DUCK_FAMILY.get(dtypes[col].split("(")[0])
        if sf and df_ and sf != df_:
            raise AssertionError(
                f"schema family mismatch on {col!r}: spark={st} duckdb={dtypes[col]}"
            )


def compare_to_oracle(spark_df, oracle_sql: str, sf_dir: str) -> int:
    """Assert the Spark result matches the DuckDB oracle (raises
    AssertionError); returns the matched row count so callers recording
    per-key artifacts (tools/sim_driver.py --out) need no re-execution."""
    con = duck_connection(sf_dir)
    try:
        _check_schema_families(spark_df, oracle_sql, con)
        duck_pdf = con.execute(oracle_sql).fetchdf()
    finally:
        con.close()
    spark_pdf = spark_df.toPandas()

    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    assert s_cols == d_cols, f"column mismatch: spark={s_cols} duckdb={d_cols}"
    assert len(spark_pdf) == len(duck_pdf), (
        f"row-count mismatch: spark={len(spark_pdf)} duckdb={len(duck_pdf)}"
    )
    s_rows = normalize_frame(spark_pdf)
    d_rows = normalize_frame(duck_pdf)
    if s_rows != d_rows:
        diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:5]
        raise AssertionError(f"value mismatch; first diffs (spark, duckdb): {diffs}")
    return len(spark_pdf)
