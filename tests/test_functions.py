"""Unit tests for the scalar expression library (SURVEY.md §2.7)."""

import datetime as dt

from pyspark.sql import functions as F

from etl_data_transformer_spark.functions.scalar import (
    case_map,
    day_floor_string,
    deterministic_uuid,
    ifnull,
    in_list,
    lookback,
    safe_divide,
    strip_digits_parens_key,
    surrogate_key,
    two_digit_year,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_surrogate_key_concat(spark):
    df = spark.createDataFrame([(1, "a", 7)], ["x", "y", "z"])
    row = df.select(surrogate_key("x", "y", "z").alias("k")).collect()[0]
    assert row["k"] == "1#a#7"


def test_surrogate_key_skips_nulls(spark):
    df = spark.createDataFrame([(1, None, 7)], "x int, y string, z int")
    row = df.select(surrogate_key("x", "y", "z").alias("k")).collect()[0]
    assert row["k"] == "1#7"  # concat_ws semantics: null parts skipped


def test_safe_divide_by_zero_is_null(spark):
    df = spark.createDataFrame([(10.0, 0.0), (10.0, 2.0)], ["a", "b"])
    out = [r["q"] for r in df.select(safe_divide("a", "b").alias("q")).collect()]
    assert out == [None, 5.0]


def test_ifnull(spark):
    df = spark.createDataFrame([(None, "fb"), ("x", "fb")], "a string, b string")
    out = [r["v"] for r in df.select(ifnull("a", F.col("b")).alias("v")).collect()]
    assert out == ["fb", "x"]


def test_case_map_with_default(spark):
    df = spark.createDataFrame([("ECOM",), ("TMALL",), ("OTHER",)], ["c"])
    out = [
        r["v"]
        for r in df.select(case_map("c", {"ECOM": 1, "TMALL": 4}, default=99).alias("v")).collect()
    ]
    assert out == [1, 4, 99]


def test_strip_digits_parens_key(spark):
    # the reference's double regexp_replace (I:260-262)
    df = spark.createDataFrame([("shipped (3)",), ("Returned12",)], ["s"])
    out = [r["v"] for r in df.select(strip_digits_parens_key("s").alias("v")).collect()]
    assert out == ["SHIPPED ", "RETURNED"]


def test_two_digit_year(spark):
    df = spark.createDataFrame([(dt.datetime(2026, 8, 13),)], ["d"])
    assert df.select(two_digit_year("d").alias("v")).collect()[0]["v"] == 26


def test_day_floor_string(spark):
    df = spark.createDataFrame([(dt.datetime(2024, 5, 6, 13, 14, 15),)], ["t"])
    assert df.select(day_floor_string("t").alias("v")).collect()[0]["v"] == "2024-05-06 00:00:00"


def test_lookback(spark):
    df = spark.createDataFrame([(dt.datetime(2024, 3, 10),)], ["t"])
    assert df.select(lookback("t", 9).alias("v")).collect()[0]["v"] == dt.datetime(2024, 3, 1)


def test_deterministic_uuid_stable(spark):
    df = spark.createDataFrame([(1, 2)], ["a", "b"])
    v1 = df.select(deterministic_uuid("a", "b").alias("v")).collect()[0]["v"]
    v2 = df.select(deterministic_uuid("a", "b").alias("v")).collect()[0]["v"]
    assert v1 == v2 and len(v1) == 64


def test_in_list(spark):
    df = spark.createDataFrame([(0,), (5,), (27,)], ["c"])
    out = [r["v"] for r in df.select(in_list("c", [0, 1, 27]).alias("v")).collect()]
    assert out == [True, False, True]
