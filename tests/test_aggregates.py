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
