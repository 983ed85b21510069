"""The incremental-fact-load branch queries + their DuckDB oracle twins
(SURVEY.md §3.2; plans/branches.py).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from ..operators.aggregates import scalar_max
from ..plans.branches import (
    agg_china_branch,
    derive_rates,
    item_status_branch,
    latest_rates,
    tomford_branch,
    union_branches,
)
from ..sources.readers import load_star

# Incremental watermarks (C3, I:10-20): high-water mark minus a lookback
# window, computed from the fact itself. Days chosen so a meaningful slice of
# each fixture passes the filter at every scale factor.
FACT_LOOKBACK_DAYS = 365
EVENTS_LOOKBACK_DAYS = 15


# (session, sf_dir, kind) → watermark. The fixture dirs are immutable, so
# the MAX-scan + collect (C3) runs once per session instead of once per
# query referencing the branch.
_OFFSET_CACHE: dict[tuple[int, str, str], dt.datetime] = {}


def fact_offset(spark: SparkSession, sf_dir: str) -> dt.datetime:
    key = (id(spark), sf_dir, "fact")
    if key not in _OFFSET_CACHE:
        li = load_star(spark, sf_dir, ("lineitem",))["lineitem"]
        _OFFSET_CACHE[key] = scalar_max(li, "l_shipdate") - dt.timedelta(days=FACT_LOOKBACK_DAYS)
    return _OFFSET_CACHE[key]


def events_offset(spark: SparkSession, sf_dir: str) -> dt.datetime:
    key = (id(spark), sf_dir, "events")
    if key not in _OFFSET_CACHE:
        ev = load_star(spark, sf_dir, ("events",))["events"]
        _OFFSET_CACHE[key] = scalar_max(ev, "ts") - dt.timedelta(days=EVENTS_LOOKBACK_DAYS)
    return _OFFSET_CACHE[key]


def q_latest_rate_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 window latest-per-group replacing the reference's years/months/
    latest CTE chain (I:42-58)."""
    star = load_star(spark, sf_dir, ("orders", "customer"))
    return latest_rates(derive_rates(star))


def q_item_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITEM_STATUS branch (I:60-112): null-tolerant join + broadcast dims +
    latest-rate window + 24-col CASE/SAFE_DIVIDE projection + DISTINCT."""
    star = load_star(spark, sf_dir, ("lineitem", "orders", "customer", "nation", "region", "part"))
    return item_status_branch(star, fact_offset(spark, sf_dir))


def q_agg_china(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AGG_CHINA branch (I:114-268): pre-join DISTINCT, const-pinned dims,
    UPPER-normalized dim join, CASE-with-dim-fallback, deterministic UUID."""
    star = load_star(spark, sf_dir, ("events", "orders", "customer", "region"))
    return agg_china_branch(spark, star, events_offset(spark, sf_dir))


def q_tomford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOMFORD_STATUS branch (I:271-308): IFNULL dates, literal columns,
    computed-key left joins, code→id lookups, casts."""
    star = load_star(spark, sf_dir, ("lineitem", "orders", "customer", "nation", "region", "part"))
    return tomford_branch(spark, star, fact_offset(spark, sf_dir))


def q_fact_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I:310-314 — the three branches unioned under the 24-col contract.

    The latest-rates subplan appears in all three branches as an IDENTICAL
    subtree, so Spark's exchange reuse computes it once already — measured
    faster than materializing it via localCheckpoint (5.6 s vs 7.2 s at
    sf0.1), so the branches stay self-contained at EXECUTION time. The
    lazy ``rates`` frame is built once and passed to all three (round 15):
    the union embeds the same logical subtree either way, but the
    driver-side construction (guide §4's py4j boundary) runs once instead
    of three times."""
    star = load_star(
        spark, sf_dir, ("lineitem", "orders", "customer", "nation", "region", "part", "events")
    )
    f_off = fact_offset(spark, sf_dir)
    fx = latest_rates(derive_rates(star))
    return union_branches(
        item_status_branch(star, f_off, rates=fx),
        agg_china_branch(spark, star, events_offset(spark, sf_dir), rates=fx),
        tomford_branch(spark, star, f_off, rates=fx),
    )


# ----------------------------------------------------------------------
# DuckDB oracle SQL
# ----------------------------------------------------------------------

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
  CAST(r_regionkey AS INTEGER) AS region_key,
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
  CAST(l_suppkey AS VARCHAR) AS store_number,
  CAST(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END AS BIGINT) AS latest_status,
  l_shipdate AS cdc_ts,
  CAST(CASE WHEN n_nationkey = 7 THEN 5 ELSE 1 END AS BIGINT) AS channel_key
FROM (SELECT *, nullif(l_linenumber % 3, 0) AS l_seg FROM lineitem
      WHERE l_shipdate >= (SELECT max(l_shipdate) - INTERVAL 365 DAY FROM lineitem)) a
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
  sha256(concat_ws('#', event_id, user_id)) AS fact_item_status_key,
  record_updated_date AS status_date_key,
  CAST(cn_region AS INTEGER) AS region_key,
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
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS record_updated_date,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
) src
LEFT JOIN (SELECT conversion_rate FROM latest_rates WHERE nationkey = 7) fx ON TRUE
LEFT JOIN (SELECT r_regionkey AS cn_region FROM region WHERE r_regionkey = 3) reg ON TRUE
LEFT JOIN (VALUES ('CLICK',2),('VIEW',3),('PURCHASE',4),('SIGNUP',6),('ERROR',7))
       AS ch(channel_name, ch_key) ON upper(src.event_type) = ch.channel_name
WHERE ts >= (SELECT max(ts) - INTERVAL 15 DAY FROM events)
  AND event_type IN ('click','purchase','signup')
  AND k >= 10
"""

TOMFORD_SQL = """
SELECT DISTINCT
  concat_ws('#', o_orderkey, n_nationkey) AS fact_item_status_key,
  coalesce(CASE WHEN o_orderstatus <> 'O' THEN o_orderdate + INTERVAL 2 DAY END,
           o_orderdate) AS status_date_key,
  CAST(r_regionkey AS INTEGER) AS region_key,
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
      WHERE o_orderdate >= (SELECT max(l_shipdate) - INTERVAL 365 DAY FROM lineitem)) o
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

BRANCH_ORACLES: dict[str, str] = {
    "latest_rate_per_nation": f"WITH {LATEST_RATES_CTE} SELECT * FROM latest_rates",
    "item_status": f"WITH {LATEST_RATES_CTE} {ITEM_STATUS_SQL}",
    "agg_china": f"WITH {LATEST_RATES_CTE} {AGG_CHINA_SQL}",
    "tomford": f"WITH {LATEST_RATES_CTE} {TOMFORD_SQL}",
    "fact_union": (
        f"WITH {LATEST_RATES_CTE} SELECT * FROM ({ITEM_STATUS_SQL}) "
        f"UNION ALL SELECT * FROM ({AGG_CHINA_SQL}) "
        f"UNION ALL SELECT * FROM ({TOMFORD_SQL})"
    ),
}

# The raw-SQL entry-point variant must match the SAME oracle.
BRANCH_ORACLES["sql_fact_union"] = BRANCH_ORACLES["fact_union"]
