"""Spark-SQL dialect of the three fact-load branches (SURVEY.md §3.2 entry
point b: ``spark.sql`` over registered views — the engine writes no parser;
Spark's own parser/analyzer/Catalyst is the implementation).

These produce BIT-IDENTICAL results to the DataFrame builders in
``plans/branches.py`` (the driver hash-checks both against the same DuckDB
oracle), demonstrating that a user of the reference's SQL workload can run
SQL directly. Dialect differences from the DuckDB oracle twins in
``branch_queries.py``: ``sha2(x,256)`` vs ``sha256``, ``get_json_object``
vs ``json_extract_string``, ``date_format`` vs ``strftime``, ``STRING`` vs
``VARCHAR``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import register_views

LATEST_RATES_CTE = """
rates AS (
  SELECT c_nationkey AS nationkey,
         year(o_orderdate) AS cal_year,
         month(o_orderdate) AS cal_month,
         round(avg(o_totalprice) / 1000.0, 4) AS conversion_rate
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2, 3
),
latest_rates AS (
  SELECT nationkey, conversion_rate FROM (
    SELECT nationkey, conversion_rate,
           row_number() OVER (PARTITION BY nationkey
                              ORDER BY cal_year DESC, cal_month DESC) AS rn
    FROM rates
  ) WHERE rn = 1
)
"""

ITEM_STATUS_SQL = """
SELECT DISTINCT
  concat_ws('#', l_orderkey, l_linenumber, n_nationkey) AS fact_item_status_key,
  CASE WHEN n_regionkey IN (0,1) AND l_shipdate IS NOT NULL THEN l_shipdate
       ELSE o_orderdate END AS status_date_key,
  CAST(r_regionkey AS INT) AS region_key,
  concat_ws('#', l_linestatus, n_regionkey, n_nationkey) AS item_status_key,
  l_linestatus AS line_item_status,
  l_returnflag AS fulfiller_item_status,
  CAST(l_linenumber AS BIGINT) AS item_status_id,
  CAST(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END AS BIGINT) AS current_status,
  n_name AS brand_key,
  CAST(l_suppkey AS BIGINT) AS dc_code,
  CAST(l_orderkey AS BIGINT) AS trans_order_id,
  CAST(o_custkey AS BIGINT) AS user_key,
  CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS cart_id,
  CAST(l_partkey AS BIGINT) AS sku_base_id,
  coalesce(p_name, concat_ws('#', l_partkey, n_regionkey, n_nationkey)) AS product_key,
  l_quantity AS status_quantity,
  l_extendedprice AS status_applied_amount,
  round(l_extendedprice / conversion_rate, 4) AS status_applied_dollar_amount,
  round(l_discount * l_extendedprice, 4) AS status_applied_discount,
  round((l_discount * l_extendedprice) / conversion_rate, 4) AS status_applied_dollar_discount,
  CAST(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS BIGINT) AS cancel_reason_id,
  CAST(l_suppkey AS STRING) AS store_number,
  CAST(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END AS BIGINT) AS latest_status,
  l_shipdate AS cdc_ts,
  CAST(CASE WHEN n_nationkey = 7 THEN 5 ELSE 1 END AS BIGINT) AS channel_key
FROM (SELECT *, nullif(l_linenumber % 3, 0) AS l_seg FROM lineitem
      WHERE l_shipdate >= (SELECT max(l_shipdate) - INTERVAL 365 DAYS FROM lineitem)) a
JOIN (SELECT *, nullif(month(o_orderdate) % 3, 0) AS o_seg FROM orders) t
  ON a.l_orderkey = t.o_orderkey
 AND (a.l_seg IS NULL OR t.o_seg IS NULL OR a.l_seg = t.o_seg)
JOIN customer c ON t.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
JOIN latest_rates fx ON n.n_nationkey = fx.nationkey
LEFT JOIN part p ON a.l_partkey = p.p_partkey AND p.p_size < 26
"""

AGG_CHINA_SQL = """
SELECT DISTINCT
  sha2(concat_ws('#', event_id, user_id), 256) AS fact_item_status_key,
  record_updated_date AS status_date_key,
  CAST(cn_region AS INT) AS region_key,
  concat_ws('#', event_type, cn_region) AS item_status_key,
  event_type AS line_item_status,
  upper(event_type) AS fulfiller_item_status,
  CAST(user_id AS BIGINT) AS item_status_id,
  CAST(0 AS BIGINT) AS current_status,
  'china' AS brand_key,
  CAST(0 AS BIGINT) AS dc_code,
  CAST(0 AS BIGINT) AS trans_order_id,
  CAST(user_id AS BIGINT) AS user_key,
  CAST(0 AS BIGINT) AS cart_id,
  CAST(event_id AS BIGINT) AS sku_base_id,
  concat_ws('#', event_id, cn_region) AS product_key,
  value AS status_quantity,
  round(value * 100.0, 4) AS status_applied_amount,
  round(round(value * 100.0, 4) / conversion_rate, 4) AS status_applied_dollar_amount,
  0.0 AS status_applied_discount,
  0.0 AS status_applied_dollar_discount,
  CAST(0 AS BIGINT) AS cancel_reason_id,
  '0' AS store_number,
  CAST(0 AS BIGINT) AS latest_status,
  ts AS cdc_ts,
  CAST(CASE upper(event_type) WHEN 'PURCHASE' THEN 1 WHEN 'SIGNUP' THEN 3
       ELSE ch_key END AS BIGINT) AS channel_key
FROM (
  SELECT DISTINCT event_id, ts, user_id, event_type, value,
         date_trunc('day', ts) AS record_updated_date,
         CAST(get_json_object(props, '$.k') AS BIGINT) AS k
  FROM events
) src
LEFT JOIN (SELECT conversion_rate FROM latest_rates WHERE nationkey = 7) fx ON TRUE
LEFT JOIN (SELECT r_regionkey AS cn_region FROM region WHERE r_regionkey = 3) reg ON TRUE
LEFT JOIN (VALUES ('CLICK',2),('VIEW',3),('PURCHASE',4),('SIGNUP',6),('ERROR',7))
       AS ch(channel_name, ch_key) ON upper(src.event_type) = ch.channel_name
WHERE ts >= (SELECT max(ts) - INTERVAL 15 DAYS FROM events)
  AND event_type IN ('click','purchase','signup')
  AND k >= 10
"""

TOMFORD_SQL = """
SELECT DISTINCT
  concat_ws('#', o_orderkey, n_nationkey) AS fact_item_status_key,
  coalesce(CASE WHEN o_orderstatus <> 'O' THEN o_orderdate + INTERVAL 2 DAYS END,
           o_orderdate) AS status_date_key,
  CAST(r_regionkey AS INT) AS region_key,
  concat_ws('#', st_id, n_regionkey, n_nationkey) AS item_status_key,
  o_orderstatus AS line_item_status,
  o_orderstatus AS fulfiller_item_status,
  CAST(o_orderkey AS BIGINT) AS item_status_id,
  CAST(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS BIGINT) AS current_status,
  n_name AS brand_key,
  CAST(CASE WHEN n_regionkey = 0 AND upper(o_orderstatus) = 'F' THEN 210
            WHEN n_regionkey = 1 AND upper(o_orderstatus) = 'F' THEN 845
            ELSE NULL END AS BIGINT) AS dc_code,
  CAST(o_orderkey AS BIGINT) AS trans_order_id,
  CAST(o_custkey AS BIGINT) AS user_key,
  CAST(99999 AS BIGINT) AS cart_id,
  CAST(coalesce(p_partkey, o_orderkey % 200) AS BIGINT) AS sku_base_id,
  coalesce(p_name, concat_ws('#', o_orderkey % 200, n_nationkey)) AS product_key,
  1.0 AS status_quantity,
  o_totalprice AS status_applied_amount,
  round(o_totalprice / conversion_rate, 4) AS status_applied_dollar_amount,
  0.0 AS status_applied_discount,
  0.0 AS status_applied_dollar_discount,
  CAST(reason_id AS BIGINT) AS cancel_reason_id,
  '' AS store_number,
  CAST(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS BIGINT) AS latest_status,
  CAST(o_orderdate AS TIMESTAMP) AS cdc_ts,
  CAST(coalesce(st_id, 1) AS BIGINT) AS channel_key
FROM (SELECT * FROM orders
      WHERE o_orderdate >= (SELECT max(l_shipdate) - INTERVAL 365 DAYS FROM lineitem)) o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
JOIN latest_rates fx ON n.n_nationkey = fx.nationkey
LEFT JOIN (VALUES ('O',1),('F',2),('P',3)) AS ist(st_name, st_id)
       ON upper(o.o_orderstatus) = upper(ist.st_name)
LEFT JOIN part p ON (o.o_orderkey % 200) = p.p_partkey
LEFT JOIN (VALUES ('1-URGENT',11),('2-HIGH',12),('3-MEDIUM',13),('5-LOW',15))
       AS cr(reason_code, reason_id) ON o.o_orderpriority = cr.reason_code
"""


def _run(spark: SparkSession, sf_dir: str, body: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(f"WITH {LATEST_RATES_CTE} {body}")


def q_sql_item_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITEM_STATUS via the raw-SQL entry point — must hash-match the
    DataFrame build (same oracle as ``item_status``)."""
    return _run(spark, sf_dir, ITEM_STATUS_SQL)


def q_sql_fact_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full 3-branch UNION ALL via raw SQL (I:40-314 shape)."""
    body = (
        f"SELECT * FROM ({ITEM_STATUS_SQL}) "
        f"UNION ALL SELECT * FROM ({AGG_CHINA_SQL}) "
        f"UNION ALL SELECT * FROM ({TOMFORD_SQL})"
    )
    return _run(spark, sf_dir, body)
