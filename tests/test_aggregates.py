"""Aggregation/window operator tests (SURVEY.md §2.4-2.5)."""

from pyspark.sql import functions as F

from etl_data_transformer_spark.operators.aggregates import (
    dedup_full_rows,
    dup_count,
    group_max,
    latest_per_group,
    scalar_max,
)


def test_dup_count_and_dedup(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b"), (1, "a")], ["k", "v"])
    assert dup_count(df) == 2
    assert dedup_full_rows(df).count() == 2


def test_dup_count_empty(spark):
    df = spark.createDataFrame([], "k int, v string")
    assert dup_count(df) == 0


def test_dup_count_subset(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], ["k", "v"])
    assert dup_count(df, subset=["k"]) == 1
    assert dedup_full_rows(df, subset=["k"]).count() == 2


def test_scalar_max_and_empty_fallback(spark):
    df = spark.createDataFrame([(3,), (9,), (1,)], ["x"])
    assert scalar_max(df, "x") == 9
    empty = spark.createDataFrame([], "x int")
    assert scalar_max(empty, "x") is None  # the IFNULL fallback branch (I:17)


def test_latest_per_group(spark):
    rates = spark.createDataFrame(
        [("USD", 2023, 11, 1.0), ("USD", 2024, 1, 1.1), ("USD", 2024, 3, 1.2),
         ("EUR", 2024, 2, 0.9)],
        ["cur", "y", "m", "rate"],
    )
    latest = latest_per_group(rates, ["cur"], [F.col("y").desc(), F.col("m").desc()])
    got = {r["cur"]: r["rate"] for r in latest.collect()}
    assert got == {"USD": 1.2, "EUR": 0.9}


def test_group_max(spark):
    df = spark.createDataFrame([("a", 1), ("a", 5), ("b", 2)], ["k", "v"])
    got = {r["k"]: r["mx"] for r in group_max(df, ["k"], "v", "mx").collect()}
    assert got == {"a": 5, "b": 2}


def test_heavy_hitters_exact_vs_plain_groupby(spark, star):
    """Two-phase sketch+verify equals the plain GROUP BY ... HAVING answer."""
    from etl_data_transformer_spark.operators.aggregates import heavy_hitters

    tok = (
        star["documents"]
        .select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term"))
        .filter(F.length("term") > 0)
    )
    n = tok.count()
    expected = {
        (r["term"], r["cnt"])
        for r in tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 0.02 * n)
        .collect()
    }
    got = {(r["term"], r["cnt"]) for r in heavy_hitters(tok, "term", 0.02).collect()}
    assert got == expected and len(got) > 0


def test_heavy_hitters_empty_and_validation(spark):
    import pytest

    from etl_data_transformer_spark.operators.aggregates import heavy_hitters

    empty = spark.createDataFrame([], "term string")
    out = heavy_hitters(empty, "term", 0.1)
    assert out.columns == ["term", "cnt", "frequency"] and out.count() == 0
    with pytest.raises(ValueError):
        heavy_hitters(empty, "term", 0.0)
    with pytest.raises(ValueError):
        heavy_hitters(empty, "term", 1.0)


def test_profile_table_one_row_per_column(spark, star):
    from etl_data_transformer_spark.operators.aggregates import profile_table

    orders = star["orders"]
    prof = {r["column"]: r for r in profile_table(orders, approx_distinct=False).collect()}
    assert set(prof) == set(orders.columns)
    n = orders.count()
    assert all(r["n_rows"] == n for r in prof.values())
    exact_ck = orders.select("o_custkey").distinct().count()
    assert prof["o_custkey"]["n_distinct"] == exact_ck
    assert prof["o_orderstatus"]["null_frac"] == 0.0
    assert prof["o_totalprice"]["min_str"] is not None
    # approx path: within HLL envelope of exact
    aprof = {r["column"]: r for r in profile_table(orders).collect()}
    assert abs(aprof["o_custkey"]["n_distinct"] - exact_ck) <= exact_ck * 0.1


def test_profile_table_nulls_and_single_pass(spark):
    from etl_data_transformer_spark.operators.aggregates import profile_table

    df = spark.createDataFrame(
        [(1, None), (2, "x"), (None, "x")], "a int, b string"
    )
    prof = {r["column"]: r for r in profile_table(df, approx_distinct=False).collect()}
    assert prof["a"]["n_nulls"] == 1 and prof["b"]["n_nulls"] == 1
    assert abs(prof["a"]["null_frac"] - 1 / 3) < 1e-6
    assert prof["b"]["n_distinct"] == 1  # countDistinct ignores nulls
    # approx path: literally ONE Aggregate node (HLL is a plain aggregate);
    # exact path: Expand + two aggregates (multi-column DISTINCT rewrite),
    # still a single scan
    plan_a = profile_table(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan_a.count("Aggregate") == 1
    plan_e = profile_table(df, approx_distinct=False)._jdf.queryExecution().optimizedPlan().toString()
    assert plan_e.count("LogicalRDD") == 1  # one scan either way


def test_profile_table_map_column_both_modes(spark):
    """Round-5 advice: exact countDistinct rejects MapType — exact mode must
    emit NULL n_distinct for non-orderable columns (mirroring the min/max
    fallback) instead of failing analysis; approx mode still sketches it."""
    from pyspark.sql import functions as F

    from etl_data_transformer_spark.operators.aggregates import profile_table

    df = (
        spark.range(4)
        .withColumn("m", F.create_map(F.lit("k"), F.col("id")))
        .withColumn("s", F.col("id").cast("string"))
    )
    exact = {r["column"]: r for r in profile_table(df, approx_distinct=False).collect()}
    assert exact["m"]["n_distinct"] is None and exact["m"]["min_str"] is None
    assert exact["s"]["n_distinct"] == 4  # orderable columns unaffected
    approx = {r["column"]: r for r in profile_table(df).collect()}
    assert approx["m"]["n_distinct"] == 4  # HLL path handles maps


def test_heavy_hitters_null_and_profile_dotted_columns(spark):
    """Round-6 review: a NULL heavy hitter is reported (freqItems' sketch
    ignores NULL and isin never matches it); the profiler handles dotted
    column names via backtick quoting."""
    from etl_data_transformer_spark.operators.aggregates import (
        heavy_hitters,
        profile_table,
    )

    rows = [(None,)] * 50 + [("x",)] * 40 + [(f"r{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, "v string")
    got = {r["v"]: r["cnt"] for r in heavy_hitters(df, "v", support=0.2).collect()}
    assert got.get(None) == 50 and got.get("x") == 40

    dotted = spark.range(5).withColumnRenamed("id", "a.b")
    prof = {r["column"]: r for r in profile_table(dotted).collect()}
    assert prof["a.b"]["n_rows"] == 5 and prof["a.b"]["n_nulls"] == 0
    prof_exact = {r["column"]: r for r in profile_table(dotted, approx_distinct=False).collect()}
    assert prof_exact["a.b"]["n_distinct"] == 5


def test_hopping_agg_semantics(spark):
    """Hopping windows: every event lands in exactly duration/slide
    windows; a timestamp ON a slide tick belongs to the window starting
    there plus the prior hop; slide == duration degenerates to tumbling."""
    import datetime as dt

    from etl_data_transformer_spark.operators.window_ops import hopping_agg, tumbling_agg

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    df = spark.createDataFrame(
        [
            (base, "a", 1.0),                                # on the tick
            (base + dt.timedelta(minutes=29), "a", 2.0),     # same two windows
            (base + dt.timedelta(minutes=30), "a", 4.0),     # next hop
        ],
        "ts timestamp, event_type string, value double",
    )
    got = {
        r["window_start"]: (r["n_events"], r["sum_value"])
        for r in hopping_agg(df, "ts", "1 hour", "30 minutes").collect()
    }
    assert got == {
        base - dt.timedelta(minutes=30): (2, 3.0),  # [09:30, 10:30)
        base: (3, 7.0),                             # [10:00, 11:00)
        base + dt.timedelta(minutes=30): (1, 4.0),  # [10:30, 11:30)
    }
    # each event in exactly 2 windows
    assert sum(n for n, _ in got.values()) == 2 * df.count()
    # slide == duration == tumbling
    hop = {(r["window_start"], r["n_events"]) for r in hopping_agg(df, "ts", "1 hour", "1 hour").collect()}
    tum = {(r["window_start"], r["n_events"]) for r in tumbling_agg(df, "ts", "1 hour").collect()}
    assert hop == tum
