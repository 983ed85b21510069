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

from ..functions.scalar import (
    case_map,
    deterministic_uuid,
    ifnull,
    in_list,
    safe_divide,
    surrogate_key,
)
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

    disc_amt = F.col("l_discount") * F.col("l_extendedprice")
    out = joined.select(
        surrogate_key("l_orderkey", "l_linenumber", "n_nationkey").alias("fact_item_status_key"),
        F.when(in_list("n_regionkey", [0, 1]) & F.col("l_shipdate").isNotNull(), F.col("l_shipdate"))
        .otherwise(F.col("o_orderdate"))
        .alias("status_date_key"),  # F2, I:63-67
        F.col("r_regionkey").cast("int").alias("region_key"),
        surrogate_key("l_linestatus", "n_regionkey", "n_nationkey").alias("item_status_key"),
        F.col("l_linestatus").alias("line_item_status"),
        F.col("l_returnflag").alias("fulfiller_item_status"),
        F.col("l_linenumber").cast("long").alias("item_status_id"),
        F.when(F.col("l_returnflag") == "N", 1).otherwise(0).cast("long").alias("current_status"),
        F.col("n_name").alias("brand_key"),
        F.col("l_suppkey").cast("long").alias("dc_code"),
        F.col("l_orderkey").cast("long").alias("trans_order_id"),
        F.col("o_custkey").cast("long").alias("user_key"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("long").alias("cart_id"),
        F.col("l_partkey").cast("long").alias("sku_base_id"),
        ifnull("p_name", surrogate_key("l_partkey", "n_regionkey", "n_nationkey")).alias("product_key"),  # F3, I:80
        F.col("l_quantity").alias("status_quantity"),
        F.col("l_extendedprice").alias("status_applied_amount"),
        F.round(safe_divide("l_extendedprice", "conversion_rate"), 4).alias("status_applied_dollar_amount"),  # F4
        F.round(disc_amt, 4).alias("status_applied_discount"),
        F.round(safe_divide(disc_amt, F.col("conversion_rate")), 4).alias("status_applied_dollar_discount"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).cast("long").alias("cancel_reason_id"),
        F.col("l_suppkey").cast("string").alias("store_number"),  # F5, I:87
        F.when(F.col("l_linestatus") == "O", 1).otherwise(0).cast("long").alias("latest_status"),
        F.col("l_shipdate").alias("cdc_ts"),
        F.when(F.col("n_nationkey") == 7, 5).otherwise(1).cast("long").alias("channel_key"),  # I:91-95
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
        ev.select(
            "event_id",
            "ts",
            "user_id",
            "event_type",
            "value",
            F.date_trunc("day", F.col("ts")).alias("record_updated_date"),
            # single-field extraction: measured vs from_json(schema) at
            # sf0.1 (min-of-3: 0.533s both) — identical, because Jackson
            # parses the document once either way; from_json only wins when
            # MULTIPLE fields are pulled from one parse. Revisit if more
            # props fields join the projection.
            F.get_json_object("props", "$.k").cast("long").alias("k"),
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
    ch = spark.createDataFrame(CHANNEL_DIM, ["channel_name", "ch_key"])
    src = src.join(F.broadcast(ch), F.upper(src["event_type"]) == ch["channel_name"], "left")

    amount = F.round(F.col("value") * 100.0, 4)
    out = src.select(
        deterministic_uuid("event_id", "user_id").alias("fact_item_status_key"),  # I:193 + §7.4.1
        F.col("record_updated_date").alias("status_date_key"),  # I:194
        F.col("cn_region").cast("int").alias("region_key"),
        surrogate_key("event_type", "cn_region").alias("item_status_key"),  # I:196
        F.col("event_type").alias("line_item_status"),
        F.upper("event_type").alias("fulfiller_item_status"),
        F.col("user_id").cast("long").alias("item_status_id"),
        F.lit(0).cast("long").alias("current_status"),  # P4 literals, I:200-215
        F.lit("china").alias("brand_key"),
        F.lit(0).cast("long").alias("dc_code"),
        F.lit(0).cast("long").alias("trans_order_id"),
        F.col("user_id").cast("long").alias("user_key"),
        F.lit(0).cast("long").alias("cart_id"),
        F.col("event_id").cast("long").alias("sku_base_id"),
        surrogate_key("event_id", "cn_region").alias("product_key"),
        F.col("value").alias("status_quantity"),
        amount.alias("status_applied_amount"),
        F.round(safe_divide(amount, F.col("conversion_rate")), 4).alias("status_applied_dollar_amount"),
        F.lit(0.0).alias("status_applied_discount"),
        F.lit(0.0).alias("status_applied_dollar_discount"),
        F.lit(0).cast("long").alias("cancel_reason_id"),
        F.lit("0").alias("store_number"),
        F.lit(0).cast("long").alias("latest_status"),
        F.col("ts").alias("cdc_ts"),
        case_map(F.upper("event_type"), CHANNEL_CASE, default=F.col("ch_key")).cast("long").alias("channel_key"),
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

    ist = spark.createDataFrame(ORDER_STATUS_DIM, ["st_name", "st_id"])
    a = a.join(F.broadcast(ist), F.upper(a["o_orderstatus"]) == F.upper(ist["st_name"]), "left")  # I:304
    pt = star["part"].select("p_partkey", "p_name")
    a = a.join(F.broadcast(pt), (a["o_orderkey"] % 200) == pt["p_partkey"], "left")  # computed-key left join, I:305
    cr = spark.createDataFrame(CANCEL_REASON_DIM, ["reason_code", "reason_id"])
    a = a.join(F.broadcast(cr), a["o_orderpriority"] == cr["reason_code"], "left")  # J9, I:306

    # IFNULL status date (I:274): unfulfilled ('O') orders have no
    # fulfilment timestamp → fall back to the line-item timestamp.
    fulfil_dt = F.when(F.col("o_orderstatus") != "O", F.col("o_orderdate") + F.expr("INTERVAL 2 DAYS"))
    out = a.select(
        surrogate_key("o_orderkey", "n_nationkey").alias("fact_item_status_key"),  # I:273
        ifnull(fulfil_dt, F.col("o_orderdate")).alias("status_date_key"),
        F.col("r_regionkey").cast("int").alias("region_key"),
        surrogate_key("st_id", "n_regionkey", "n_nationkey").alias("item_status_key"),  # I:276
        F.col("o_orderstatus").alias("line_item_status"),
        F.col("o_orderstatus").alias("fulfiller_item_status"),
        F.col("o_orderkey").cast("long").alias("item_status_id"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).cast("long").alias("current_status"),  # I:280 cast
        F.col("n_name").alias("brand_key"),
        F.when((F.col("n_regionkey") == 0) & (F.upper("o_orderstatus") == F.lit("F")), 210)
        .when((F.col("n_regionkey") == 1) & (F.upper("o_orderstatus") == F.lit("F")), 845)
        .otherwise(F.lit(None))
        .cast("long")
        .alias("dc_code"),  # I:282-285
        F.col("o_orderkey").cast("long").alias("trans_order_id"),
        F.col("o_custkey").cast("long").alias("user_key"),
        F.lit(99999).cast("long").alias("cart_id"),  # I:288
        ifnull(F.col("p_partkey"), F.col("o_orderkey") % 200).cast("long").alias("sku_base_id"),
        ifnull("p_name", surrogate_key(F.col("o_orderkey") % 200, "n_nationkey")).alias("product_key"),  # I:290
        F.lit(1.0).alias("status_quantity"),
        F.col("o_totalprice").alias("status_applied_amount"),
        F.round(safe_divide("o_totalprice", "conversion_rate"), 4).alias("status_applied_dollar_amount"),  # I:293
        F.lit(0.0).alias("status_applied_discount"),
        F.lit(0.0).alias("status_applied_dollar_discount"),
        F.col("reason_id").cast("long").alias("cancel_reason_id"),  # I:296 cast str-ish → int
        F.lit("").alias("store_number"),  # I:297
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).cast("long").alias("latest_status"),  # I:298
        F.col("o_orderdate").cast("timestamp").alias("cdc_ts"),  # I:299 timestamp()
        ifnull(F.col("st_id"), F.lit(1)).cast("long").alias("channel_key"),
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
