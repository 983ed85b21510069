"""The three source branches of the incremental fact load, mapped to fixtures.

Mirrors ``Incremental_load_fact_item_status.sql`` branch-for-branch
(SURVEY.md §3.2, FIXTURES.md role mapping):

- ``item_status_branch``  ← ITEM_STATUS   (I:60-112): fact=lineitem,
  item=orders (null-tolerant multi-key join J3), config=customer⋈nation⋈region
  (broadcast J1), latest-forex (window §2.5 replacing I:42-58), product=part
  (left J4), 24-col projection with CASE/SAFE_DIVIDE/CONCAT, DISTINCT.
- ``agg_china_branch``    ← AGG_CHINA     (I:114-268): source=events with a
  pre-join DISTINCT (I:171-188), const-pinned forex + region dims (J5,
  I:232-248), UPPER-normalized channel dim join (J6, I:253-256), CASE channel
  mapping with dim fallback (I:217-229), deterministic UUID key (I:193,
  §7.4.1), literal columns (I:200-215).
- ``tomford_branch``      ← TOMFORD_STATUS (I:271-308): fact=orders, computed-
  key product left join (I:305), code→id lookup dims (J9, I:306), IFNULL
  status date (I:274), literal cart_id/store_number (I:288,297), CASEd
  dc_code (I:282-285), casts (I:280,296,298-299).

All three produce the same 24-column contract (``FACT_COLUMNS``) and are
combined with ``unionByName`` (I:310-314 — positional UNION ALL in the
reference, made name-checked here per SURVEY.md §7.4.7).

Scale notes: every dim side is broadcast; the only shuffles are the
lineitem⋄orders join (co-partitioned on orderkey) and the final DISTINCT.
The incremental predicate is a plain filter → Catalyst pushes it into the
parquet scan (partition pruning when the fact is date-partitioned).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import in_list
from ..operators.aggregates import latest_per_group
from ..operators.joins import broadcast_dim_join, const_pinned_dim_join, null_tolerant_join

# The 24-column output contract (reference I:61-95 produces 24 columns).
FACT_COLUMNS = [
    "fact_item_status_key",
    "status_date_key",
    "region_key",
    "item_status_key",
    "line_item_status",
    "fulfiller_item_status",
    "item_status_id",
    "current_status",
    "brand_key",
    "dc_code",
    "trans_order_id",
    "user_key",
    "cart_id",
    "sku_base_id",
    "product_key",
    "status_quantity",
    "status_applied_amount",
    "status_applied_dollar_amount",
    "status_applied_discount",
    "status_applied_dollar_discount",
    "cancel_reason_id",
    "store_number",
    "latest_status",
    "cdc_ts",
    "channel_key",
]


def _values_dim(spark: SparkSession, rows: list[tuple[str, int]], name_col: str, key_col: str) -> DataFrame:
    """Tiny literal (string, long) dim via ONE ``spark.sql`` VALUES call.
    ``createDataFrame`` cost ~0.15 s of schema inference + py4j round
    trips per build (round 15); the CAST matches its inferred LongType."""
    values = ",".join(f"('{n}',{k})" for n, k in rows)
    return spark.sql(
        f"SELECT col1 AS {name_col}, CAST(col2 AS BIGINT) AS {key_col} FROM VALUES {values}"
    )


def derive_rates(star: dict[str, DataFrame]) -> DataFrame:
    """Stand-in for ``dim_currency_forex_rate_tbl`` (I:45): a per-nation,
    per-(year, month) conversion rate derived deterministically from orders."""
    o, c = star["orders"], star["customer"]
    joined = broadcast_dim_join(o, c.select("c_custkey", "c_nationkey"), o["o_custkey"] == c["c_custkey"])
    return (
        joined.groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.year("o_orderdate").alias("cal_year"),
            F.month("o_orderdate").alias("cal_month"),
        )
        .agg(F.round(F.avg("o_totalprice") / 1000.0, 4).alias("conversion_rate"))
    )


def latest_rates(rates: DataFrame) -> DataFrame:
    """Latest rate per nation — the window replacement (§2.5) for the
    reference's years/months/latest CTE chain (I:42-58)."""
    return latest_per_group(
        rates,
        partition_by=["nationkey"],
        order_by=[F.col("cal_year").desc(), F.col("cal_month").desc()],
    ).select("nationkey", "conversion_rate")


def config_brand_region(star: dict[str, DataFrame]) -> DataFrame:
    """Stand-in for ``config_brand_region_tbl`` (I:97): nation ⋈ region."""
    n, r = star["nation"], star["region"]
    return broadcast_dim_join(n, r, n["n_regionkey"] == r["r_regionkey"])


def item_status_branch(
    star: dict[str, DataFrame],
    offset: dt.datetime,
    rates: DataFrame | None = None,
) -> DataFrame:
    """ITEM_STATUS (I:60-112) on fixtures. See module docstring."""
    li = star["lineitem"].filter(F.col("l_shipdate") >= F.lit(offset))  # P5, I:112
    o = star["orders"]

    # J3 (I:101-109): equi keys drive the hash join; null-tolerant residuals
    # on derived nullable columns reproduce the CASE-WHEN-NULL-THEN-1 shape.
    a = li.withColumn("l_seg", F.nullif(F.col("l_linenumber") % 3, F.lit(0)))
    t = o.withColumn("o_seg", F.nullif(F.month("o_orderdate") % 3, F.lit(0)))
    joined = null_tolerant_join(
        a,
        t,
        equi_keys=[("l_orderkey", "o_orderkey")],
        null_tolerant_pairs=[(a["l_seg"], t["o_seg"])],
    )

    c = star["customer"].select("c_custkey", "c_nationkey")
    joined = broadcast_dim_join(joined, c, joined["o_custkey"] == c["c_custkey"])  # J1
    rcb = config_brand_region(star)
    joined = broadcast_dim_join(joined, rcb, joined["c_nationkey"] == rcb["n_nationkey"])
    fx = rates if rates is not None else latest_rates(derive_rates(star))
    joined = broadcast_dim_join(joined, fx, joined["n_nationkey"] == fx["nationkey"])  # J2
    pt = star["part"].select("p_partkey", "p_name", "p_brand", "p_size")
    joined = joined.join(
        F.broadcast(pt),
        (joined["l_partkey"] == pt["p_partkey"]) & (pt["p_size"] < 26),
        "left",
    )  # J4 with misses → IFNULL fallback exercised

    # The 24-col projection as ONE selectExpr (round 15, verdict r14 item
    # 6): the Column-builder form issued ~150 py4j round trips per branch
    # (each F.*/Column op is a JVM call in classic mode), ~1.4-1.6 s of
    # pure driver-side construction per fact_union build — guide §4's
    # driver-boundary cost, paid before a single task runs. The SQL
    # strings parse JVM-side in one call and produce the IDENTICAL
    # expressions (CASE/concat_ws/try_divide; helpers' semantics inlined:
    # surrogate_key = concat_ws('#', CAST(.. AS STRING)..), safe_divide =
    # try_divide, ifnull = coalesce). Oracle hashes unchanged.
    out = joined.selectExpr(
        "concat_ws('#', CAST(l_orderkey AS STRING), CAST(l_linenumber AS STRING), CAST(n_nationkey AS STRING)) AS fact_item_status_key",
        # F2, I:63-67
        "CASE WHEN n_regionkey IN (0, 1) AND l_shipdate IS NOT NULL THEN l_shipdate ELSE o_orderdate END AS status_date_key",
        "CAST(r_regionkey AS INT) AS region_key",
        "concat_ws('#', CAST(l_linestatus AS STRING), CAST(n_regionkey AS STRING), CAST(n_nationkey AS STRING)) AS item_status_key",
        "l_linestatus AS line_item_status",
        "l_returnflag AS fulfiller_item_status",
        "CAST(l_linenumber AS BIGINT) AS item_status_id",
        "CAST(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END AS BIGINT) AS current_status",
        "n_name AS brand_key",
        "CAST(l_suppkey AS BIGINT) AS dc_code",
        "CAST(l_orderkey AS BIGINT) AS trans_order_id",
        "CAST(o_custkey AS BIGINT) AS user_key",
        "CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS cart_id",
        "CAST(l_partkey AS BIGINT) AS sku_base_id",
        # F3, I:80
        "coalesce(p_name, concat_ws('#', CAST(l_partkey AS STRING), CAST(n_regionkey AS STRING), CAST(n_nationkey AS STRING))) AS product_key",
        "l_quantity AS status_quantity",
        "l_extendedprice AS status_applied_amount",
        "round(try_divide(l_extendedprice, conversion_rate), 4) AS status_applied_dollar_amount",  # F4
        "round(l_discount * l_extendedprice, 4) AS status_applied_discount",
        "round(try_divide(l_discount * l_extendedprice, conversion_rate), 4) AS status_applied_dollar_discount",
        "CAST(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS BIGINT) AS cancel_reason_id",
        "CAST(l_suppkey AS STRING) AS store_number",  # F5, I:87
        "CAST(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END AS BIGINT) AS latest_status",
        "l_shipdate AS cdc_ts",
        "CAST(CASE WHEN n_nationkey = 7 THEN 5 ELSE 1 END AS BIGINT) AS channel_key",  # I:91-95
    )
    return out.distinct()  # A4, I:62


# J6 channel dim (I:254) — tiny literal dim, broadcast.
CHANNEL_DIM = [("CLICK", 2), ("VIEW", 3), ("PURCHASE", 4), ("SIGNUP", 6), ("ERROR", 7)]
# F2 explicit CASE mapping with dim fallback (I:217-229).
CHANNEL_CASE = {"PURCHASE": 1, "SIGNUP": 3}


def agg_china_branch(
    spark: SparkSession,
    star: dict[str, DataFrame],
    offset: dt.datetime,
    rates: DataFrame | None = None,
) -> DataFrame:
    """AGG_CHINA (I:114-268) on fixtures. See module docstring."""
    from ..sources.readers import spread

    # the JSON-parse + 7-col DISTINCT is the branch's CPU; spread the
    # single-row-group source so it isn't serialized on one core
    ev = spread(star["events"], key="event_id")
    # dedup_operation (I:171-188): DISTINCT over a projected noisy source,
    # incl. the day-floored record_updated_date (I:185).
    dedup = (
        ev.selectExpr(
            "event_id",
            "ts",
            "user_id",
            "event_type",
            "value",
            "date_trunc('day', ts) AS record_updated_date",
            # single-field extraction: measured vs from_json(schema) at
            # sf0.1 (min-of-3: 0.533s both) — identical, because Jackson
            # parses the document once either way; from_json only wins when
            # MULTIPLE fields are pulled from one parse. Revisit if more
            # props fields join the projection.
            "CAST(get_json_object(props, '$.k') AS BIGINT) AS k",
        )
        .distinct()
    )
    src = dedup.filter(
        (F.col("ts") >= F.lit(offset))
        & in_list("event_type", ["click", "purchase", "signup"])  # P6 (I:266-267)
        & (F.col("k") >= 10)
    )

    # J5 const-pinned dims (I:232-248): 1-row sides, broadcast.
    fx = rates if rates is not None else latest_rates(derive_rates(star))
    src = const_pinned_dim_join(src, fx, F.col("nationkey") == 7)  # 'CNY' analogue I:235
    reg = star["region"].select(F.col("r_regionkey").alias("cn_region"))
    src = const_pinned_dim_join(src, reg, F.col("cn_region") == 3)  # region_id = 7 analogue I:248

    # J6 (I:253-256): UPPER-normalized equi join against the channel dim.
    # VALUES via one spark.sql call: createDataFrame of the 5-row literal
    # dim cost ~0.15 s of schema-inference + py4j per build (round 15);
    # CAST AS BIGINT matches createDataFrame's inferred long.
    ch = _values_dim(spark, CHANNEL_DIM, "channel_name", "ch_key")
    src = src.join(F.broadcast(ch), F.upper(src["event_type"]) == ch["channel_name"], "left")

    # 24-col projection as ONE selectExpr — see item_status_branch's note.
    # CHANNEL_CASE inlined (PURCHASE→1, SIGNUP→3, else dim fallback);
    # deterministic_uuid = sha2(concat_ws('#', ..), 256); double literals
    # carry the D suffix (a bare SQL `0.0` parses as DECIMAL, F.lit(0.0)
    # is DOUBLE).
    out = src.selectExpr(
        "sha2(concat_ws('#', CAST(event_id AS STRING), CAST(user_id AS STRING)), 256) AS fact_item_status_key",  # I:193 + §7.4.1
        "record_updated_date AS status_date_key",  # I:194
        "CAST(cn_region AS INT) AS region_key",
        "concat_ws('#', CAST(event_type AS STRING), CAST(cn_region AS STRING)) AS item_status_key",  # I:196
        "event_type AS line_item_status",
        "upper(event_type) AS fulfiller_item_status",
        "CAST(user_id AS BIGINT) AS item_status_id",
        "CAST(0 AS BIGINT) AS current_status",  # P4 literals, I:200-215
        "'china' AS brand_key",
        "CAST(0 AS BIGINT) AS dc_code",
        "CAST(0 AS BIGINT) AS trans_order_id",
        "CAST(user_id AS BIGINT) AS user_key",
        "CAST(0 AS BIGINT) AS cart_id",
        "CAST(event_id AS BIGINT) AS sku_base_id",
        "concat_ws('#', CAST(event_id AS STRING), CAST(cn_region AS STRING)) AS product_key",
        "value AS status_quantity",
        "round(value * 100.0D, 4) AS status_applied_amount",
        "round(try_divide(round(value * 100.0D, 4), conversion_rate), 4) AS status_applied_dollar_amount",
        "CAST(0.0 AS DOUBLE) AS status_applied_discount",
        "CAST(0.0 AS DOUBLE) AS status_applied_dollar_discount",
        "CAST(0 AS BIGINT) AS cancel_reason_id",
        "'0' AS store_number",
        "CAST(0 AS BIGINT) AS latest_status",
        "ts AS cdc_ts",
        "CAST(CASE WHEN upper(event_type) = 'PURCHASE' THEN 1 WHEN upper(event_type) = 'SIGNUP' THEN 3 ELSE ch_key END AS BIGINT) AS channel_key",
    )
    return out.distinct()


# J9 code→id lookup (I:306): priority code → cancel reason id.
CANCEL_REASON_DIM = [("1-URGENT", 11), ("2-HIGH", 12), ("3-MEDIUM", 13), ("5-LOW", 15)]
# item-status dim for the J6-style name join (I:304).
ORDER_STATUS_DIM = [("O", 1), ("F", 2), ("P", 3)]


def tomford_branch(
    spark: SparkSession,
    star: dict[str, DataFrame],
    offset: dt.datetime,
    rates: DataFrame | None = None,
) -> DataFrame:
    """TOMFORD_STATUS (I:271-308) on fixtures. See module docstring."""
    o = star["orders"].filter(F.col("o_orderdate") >= F.lit(offset))  # I:307
    c = star["customer"].select("c_custkey", "c_nationkey")
    a = broadcast_dim_join(o, c, o["o_custkey"] == c["c_custkey"])
    rcb = config_brand_region(star)
    a = broadcast_dim_join(a, rcb, a["c_nationkey"] == rcb["n_nationkey"])  # J8 analogue I:302
    fx = rates if rates is not None else latest_rates(derive_rates(star))
    a = broadcast_dim_join(a, fx, a["n_nationkey"] == fx["nationkey"])  # I:303

    ist = _values_dim(spark, ORDER_STATUS_DIM, "st_name", "st_id")
    a = a.join(F.broadcast(ist), F.upper(a["o_orderstatus"]) == F.upper(ist["st_name"]), "left")  # I:304
    pt = star["part"].select("p_partkey", "p_name")
    a = a.join(F.broadcast(pt), (a["o_orderkey"] % 200) == pt["p_partkey"], "left")  # computed-key left join, I:305
    cr = _values_dim(spark, CANCEL_REASON_DIM, "reason_code", "reason_id")
    a = a.join(F.broadcast(cr), a["o_orderpriority"] == cr["reason_code"], "left")  # J9, I:306

    # 24-col projection as ONE selectExpr — see item_status_branch's note.
    # IFNULL status date (I:274): unfulfilled ('O') orders have no
    # fulfilment timestamp → fall back to the line-item timestamp.
    out = a.selectExpr(
        "concat_ws('#', CAST(o_orderkey AS STRING), CAST(n_nationkey AS STRING)) AS fact_item_status_key",  # I:273
        "coalesce(CASE WHEN o_orderstatus <> 'O' THEN o_orderdate + INTERVAL 2 DAYS END, o_orderdate) AS status_date_key",
        "CAST(r_regionkey AS INT) AS region_key",
        "concat_ws('#', CAST(st_id AS STRING), CAST(n_regionkey AS STRING), CAST(n_nationkey AS STRING)) AS item_status_key",  # I:276
        "o_orderstatus AS line_item_status",
        "o_orderstatus AS fulfiller_item_status",
        "CAST(o_orderkey AS BIGINT) AS item_status_id",
        "CAST(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS BIGINT) AS current_status",  # I:280 cast
        "n_name AS brand_key",
        # I:282-285
        "CAST(CASE WHEN n_regionkey = 0 AND upper(o_orderstatus) = 'F' THEN 210 WHEN n_regionkey = 1 AND upper(o_orderstatus) = 'F' THEN 845 ELSE NULL END AS BIGINT) AS dc_code",
        "CAST(o_orderkey AS BIGINT) AS trans_order_id",
        "CAST(o_custkey AS BIGINT) AS user_key",
        "CAST(99999 AS BIGINT) AS cart_id",  # I:288
        "CAST(coalesce(p_partkey, o_orderkey % 200) AS BIGINT) AS sku_base_id",
        "coalesce(p_name, concat_ws('#', CAST(o_orderkey % 200 AS STRING), CAST(n_nationkey AS STRING))) AS product_key",  # I:290
        "CAST(1.0 AS DOUBLE) AS status_quantity",
        "o_totalprice AS status_applied_amount",
        "round(try_divide(o_totalprice, conversion_rate), 4) AS status_applied_dollar_amount",  # I:293
        "CAST(0.0 AS DOUBLE) AS status_applied_discount",
        "CAST(0.0 AS DOUBLE) AS status_applied_dollar_discount",
        "CAST(reason_id AS BIGINT) AS cancel_reason_id",  # I:296 cast str-ish → int
        "'' AS store_number",  # I:297
        "CAST(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS BIGINT) AS latest_status",  # I:298
        "CAST(o_orderdate AS TIMESTAMP) AS cdc_ts",  # I:299 timestamp()
        "CAST(coalesce(st_id, 1) AS BIGINT) AS channel_key",
    )
    return out.distinct()


def union_branches(*branches: DataFrame) -> DataFrame:
    """I:310-314 — UNION ALL of the three branches, name-checked (§7.4.7)."""
    out = branches[0]
    for b in branches[1:]:
        missing = set(FACT_COLUMNS) - set(b.columns)
        if missing:
            raise ValueError(f"branch missing contract columns: {sorted(missing)}")
        out = out.unionByName(b.select(*FACT_COLUMNS))
    return out.select(*FACT_COLUMNS)
