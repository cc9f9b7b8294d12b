"""SQL text interface: the same query through spark.sql and through the
DataFrame API must agree (Catalyst plans both)."""

from __future__ import annotations

from debias_spark.registry import load_all_queries
from debias_spark.sql import run_sql


def test_sql_text_matches_dataframe_api(spark, sf_dir):
    sql_df = run_sql(
        spark,
        sf_dir,
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               CAST(floor(avg(l_quantity) * 10000 + 0.5 + 1e-9) AS BIGINT) AS avg_qty_e4,
               CAST(floor(avg(l_extendedprice) * 10000 + 0.5 + 1e-9) AS BIGINT) AS avg_price_e4,
               CAST(floor(avg(l_discount) * 10000 + 0.5 + 1e-9) AS BIGINT) AS avg_disc_e4,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP_NTZ '1998-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """,
    )
    api_df = load_all_queries()["tpch_q1_pricing_summary"].fn(spark, sf_dir)
    assert [tuple(r) for r in sql_df.collect()] == [tuple(r) for r in api_df.collect()]


def test_sql_interface_composes_with_views(spark, sf_dir):
    df = run_sql(
        spark,
        sf_dir,
        "SELECT lang, count(*) AS n FROM documents GROUP BY lang ORDER BY lang",
    )
    rows = df.collect()
    assert len(rows) >= 3 and all(r.n > 0 for r in rows)
