"""Scale-path join strategies: salted skew join (semantic equivalence) and
bucketed co-located join (plan has no exchange above the scans)."""

from pyspark.sql import functions as F

from etl_data_transformer_spark.operators.joins import salted_join
from etl_data_transformer_spark.sources.writers import write_bucketed


def test_salted_join_equals_plain_join(spark):
    # 90% of left rows share one hot key — the salting target
    left = spark.range(0, 2000).select(
        F.col("id").alias("uid"),
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 50).alias("k"),
    )
    right = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("payload")
    )
    plain = left.join(right, "k").select("uid", "k", "payload")
    salted = salted_join(left, right, on="k", left_unique="uid", salt_buckets=8).select(
        "uid", "k", "payload"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, 10), (2, 99)], "uid int, k int")
    right = spark.createDataFrame([(10, "a")], "k int, v string")
    out = salted_join(left, right, on="k", left_unique="uid", salt_buckets=4, how="left")
    got = {r["uid"]: r["v"] for r in out.collect()}
    assert got == {1: "a", 2: None}


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key: the equi join must plan with NO
    Exchange (the shuffle was paid at write time) — the co-located join
    contract that makes bucketing worth it at 100 TB."""
    a = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    write_bucketed(a, "bkt_a", ["k"], num_buckets=4, path=str(tmp_path / "bkt_a"))
    write_bucketed(b, "bkt_b", ["k"], num_buckets=4, path=str(tmp_path / "bkt_b"))
    try:
        joined = (
            spark.table("bkt_a")
            .hint("merge")  # force SortMergeJoin so broadcast doesn't mask bucketing
            .join(spark.table("bkt_b"), "k")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert joined.count() == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_aqe_splits_skewed_join(spark):
    """AQE skew-join handling (SURVEY.md §4.3): a hot key must be split at
    runtime (final adaptive plan marks the sort-merge join skew=true) —
    the engine's first line of defense before manual salting."""
    import pyspark.sql.functions as F

    confs = {
        # the shared test session runs AQE-off for per-query latency
        # (conftest round-15 note); this test is ABOUT adaptive execution,
        # so it opts back in (runtime-settable, save/restored below)
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 300_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 1000).alias("k"),
            F.col("id").alias("uid"),
        )
        right = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 7).alias("v"))
        # execute THIS DataFrame (count() spawns a different query execution
        # whose adaptive plan would not finalize joined's own)
        joined = left.hint("merge").join(right, "k").select("k")
        assert len(joined.collect()) == 300_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_injected_and_correct(spark):
    """With the widened gates, a selective large-large shuffled join gets a
    runtime bloom filter (might_contain on the probe side) and returns the
    same rows as the unfiltered plan."""
    from etl_data_transformer_spark.operators.joins import (
        runtime_filtered_join_confs,
        with_confs,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").filter(
        F.col("o_totalprice") > 200000
    )
    expected = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    confs = {
        **runtime_filtered_join_confs(),
        # force the shuffled-join shape the feature targets
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    with with_confs(spark, confs):
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan
        got = j.collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))


def test_with_confs_restores_previous_values(spark):
    from etl_data_transformer_spark.operators.joins import with_confs

    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    with with_confs(spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}):
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before
