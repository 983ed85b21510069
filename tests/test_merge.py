"""Row-level MERGE INTO semantics (plans/merge.py)."""

import pytest
from pyspark.sql import functions as F

from etl_data_transformer_spark.plans.merge import merge_into

SCHEMA = "k long, v string, n long"


def _write_target(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(path)


def _read(spark, path):
    return {
        (r["k"]): (r["v"], r["n"])
        for r in spark.read.parquet(path).collect()
    }


def test_merge_update_insert(spark, tmp_path):
    path = str(tmp_path / "t1")
    _write_target(spark, path, [(1, "a", 10), (2, "b", 20), (3, "c", 30)])
    src = spark.createDataFrame([(2, "B", 21), (4, "d", 40)], SCHEMA)
    res = merge_into(spark, path, src, ["k"])
    assert (res.updated, res.deleted, res.inserted, res.untouched) == (1, 0, 1, 2)
    assert _read(spark, path) == {
        1: ("a", 10), 2: ("B", 21), 3: ("c", 30), 4: ("d", 40)
    }


def test_merge_delete_matched_ignore_new(spark, tmp_path):
    path = str(tmp_path / "t2")
    _write_target(spark, path, [(1, "a", 10), (2, "b", 20)])
    src = spark.createDataFrame([(2, "x", 0), (9, "new", 1)], SCHEMA)
    res = merge_into(
        spark, path, src, ["k"], when_matched="delete", when_not_matched="ignore"
    )
    assert (res.updated, res.deleted, res.inserted, res.untouched) == (0, 1, 0, 1)
    assert _read(spark, path) == {1: ("a", 10)}


def test_merge_ignore_matched(spark, tmp_path):
    path = str(tmp_path / "t3")
    _write_target(spark, path, [(1, "a", 10)])
    src = spark.createDataFrame([(1, "CHANGED", 99), (2, "b", 20)], SCHEMA)
    res = merge_into(spark, path, src, ["k"], when_matched="ignore")
    assert (res.updated, res.inserted) == (0, 1)
    assert _read(spark, path) == {1: ("a", 10), 2: ("b", 20)}


def test_merge_rejects_duplicate_source_keys_and_schema_drift(spark, tmp_path):
    path = str(tmp_path / "t4")
    _write_target(spark, path, [(1, "a", 10)])
    dup = spark.createDataFrame([(2, "x", 1), (2, "y", 2)], SCHEMA)
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_into(spark, path, dup, ["k"])
    drift = spark.createDataFrame([(2, "x")], "k long, v string")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_into(spark, path, drift, ["k"])
    # target unchanged after the failed merges (atomicity)
    assert _read(spark, path) == {1: ("a", 10)}


def test_merge_composite_key(spark, tmp_path):
    path = str(tmp_path / "t5")
    _write_target(spark, path, [(1, "a", 10), (1, "b", 20)])
    # composite (k, v): only the (1, 'a') row updates
    src = spark.createDataFrame([(1, "a", 99)], SCHEMA)
    res = merge_into(spark, path, src, ["k", "v"])
    assert (res.updated, res.untouched) == (1, 1)
    got = spark.read.parquet(path).collect()
    assert {(r["k"], r["v"], r["n"]) for r in got} == {(1, "a", 99), (1, "b", 20)}
