"""The raw-SQL entry-point branch variants must produce exactly the
DataFrame-API results. ``sql_fact_union`` is driver-checked in the catalog;
``sql_item_status`` left the 50-slot catalog in round 2 and is pinned here
instead.
"""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_sql_item_status_matches_dataframe_branch(spark):
    from etl_data_transformer_spark.catalog import branch_queries as BQ
    from etl_data_transformer_spark.catalog import branch_sql as BSQL

    sql_out = BSQL.q_sql_item_status(spark, SF_DIR)
    df_out = BQ.q_item_status(spark, SF_DIR)
    assert sql_out.columns == df_out.columns
    assert _rows(sql_out) == _rows(df_out)
