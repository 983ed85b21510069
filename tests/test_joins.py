"""Join operator tests incl. the null-tolerant join and plan-shape
assertions (SURVEY.md §2.3 J3, §4.2, §5.5)."""

from pyspark.sql import functions as F

from etl_data_transformer_spark.operators.joins import (
    broadcast_dim_join,
    const_pinned_dim_join,
    normalized_key_join,
    null_tolerant_join,
)


def test_null_tolerant_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, None), (2, 10), (3, 99)], "k int, region int"
    )
    right = spark.createDataFrame(
        [(1, 5), (2, 10), (3, None)], "k int, region int"
    )
    out = null_tolerant_join(
        left,
        right,
        equi_keys=[("k", "k")],
        null_tolerant_pairs=[(left["region"], right["region"])],
    )
    # k=1: left null → match; k=2: equal → match; k=3: right null → match
    assert out.count() == 3
    lf, rf = left.na.fill(0), right.na.fill(-1)
    strict = null_tolerant_join(
        lf, rf, equi_keys=[("k", "k")],
        null_tolerant_pairs=[(lf["region"], rf["region"])],
    )
    # no nulls anymore → only the equal pair survives
    assert strict.count() == 1


def test_null_tolerant_join_stays_hash_join(spark, star):
    """§4.2: the equi keys must keep the join a hash/merge join; the
    residuals must NOT degrade it to BroadcastNestedLoopJoin."""
    li, o = star["lineitem"], star["orders"]
    a = li.withColumn("l_seg", F.nullif(F.col("l_linenumber") % 3, F.lit(0)))
    t = o.withColumn("o_seg", F.nullif(F.month("o_orderdate") % 3, F.lit(0)))
    joined = null_tolerant_join(
        a, t, [("l_orderkey", "o_orderkey")], [(a["l_seg"], t["o_seg"])]
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert any(j in plan for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))


def test_broadcast_dim_join_is_broadcast(spark, star):
    li, o = star["lineitem"], star["orders"]
    out = broadcast_dim_join(li, o.select("o_orderkey"), li["l_orderkey"] == o["o_orderkey"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_const_pinned_dim_join(spark):
    fact = spark.createDataFrame([(1,), (2,)], ["id"])
    dim = spark.createDataFrame([(7, "CNY", 7.2), (8, "EUR", 0.9)], ["rid", "cur", "rate"])
    out = const_pinned_dim_join(fact, dim, F.col("cur") == "CNY")
    rows = out.collect()
    assert len(rows) == 2 and all(r["rate"] == 7.2 for r in rows)
    # pinned row absent → left join keeps fact rows with nulls
    out2 = const_pinned_dim_join(fact, dim, F.col("cur") == "JPY")
    assert out2.count() == 2 and out2.filter(F.col("rate").isNull()).count() == 2


def test_normalized_key_join(spark):
    left = spark.createDataFrame([("Shipped (3)",), ("pending",)], ["status"])
    dim = spark.createDataFrame([("SHIPPED ", 1)], ["code", "sid"])
    from etl_data_transformer_spark.functions.scalar import strip_digits_parens_key

    out = normalized_key_join(
        left, dim,
        lambda df: strip_digits_parens_key(df["status"]),
        lambda df: df["code"],
    )
    got = {r["status"]: r["sid"] for r in out.collect()}
    assert got == {"Shipped (3)": 1, "pending": None}


def test_filter_pushdown_reaches_scan(spark, star):
    """§4.2: incremental predicate must be pushed to the parquet scan."""
    li = star["lineitem"].filter(F.col("l_shipdate") >= "2000-01-01").select("l_orderkey")
    plan = li._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
