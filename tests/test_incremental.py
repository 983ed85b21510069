"""Incremental delete-insert load e2e (SURVEY.md §2.8 C1-C5, §5.4):
FULL_LOAD then DELTA, asserting idempotence and audit contents."""

import datetime as dt

from pyspark.sql import functions as F

from etl_data_transformer_spark.plans.incremental import (
    AUDIT_COLUMNS,
    LoadParams,
    compute_watermark,
    run_incremental_load,
)


def _build_window(spark, base_rows):
    """Factory: build_window(watermark) over an in-memory 'source'."""

    def build(watermark):
        df = spark.createDataFrame(base_rows, "id long, v string, cdc_ts timestamp")
        return df.filter(F.col("cdc_ts") >= F.lit(watermark))

    return build


ROWS = [
    (1, "a", dt.datetime(2024, 1, 1)),
    (2, "b", dt.datetime(2024, 2, 1)),
    (3, "c", dt.datetime(2024, 3, 1)),
    (4, "d", dt.datetime(2024, 3, 15)),
]


def test_full_then_delta_idempotent(spark, tmp_path):
    target = str(tmp_path / "fact")
    audit = str(tmp_path / "audit")
    params_full = LoadParams(load_type="FULL_LOAD", delta_day_count=30)

    r1 = run_incremental_load(spark, _build_window(spark, ROWS), target, audit, params_full)
    assert r1.inserted_record_count == 4
    assert r1.total_rows == 4

    # DELTA right after FULL: the lookback window is deleted and re-inserted
    # from the same source → table must be unchanged (idempotence).
    params_delta = LoadParams(load_type="DELTA", delta_day_count=30)
    r2 = run_incremental_load(spark, _build_window(spark, ROWS), target, audit, params_delta)
    assert r2.total_rows == 4
    assert r2.deleted_record_count == r2.inserted_record_count
    got = sorted(r["id"] for r in spark.read.parquet(target).collect())
    assert got == [1, 2, 3, 4]

    # audit rows (C5): one per load with the reference's fields
    audit_df = spark.read.parquet(audit)
    assert audit_df.columns == AUDIT_COLUMNS
    assert audit_df.count() == 2
    by_type = {r["load_type"]: r for r in audit_df.collect()}
    assert by_type["FULL_LOAD"]["inserted_record_count"] == 4
    assert by_type["DELTA"]["deleted_record_count"] == r2.deleted_record_count


def test_delta_picks_up_new_and_changed_rows(spark, tmp_path):
    target = str(tmp_path / "fact")
    audit = str(tmp_path / "audit")
    run_incremental_load(
        spark, _build_window(spark, ROWS), target, audit, LoadParams(load_type="FULL_LOAD")
    )
    # source gains a new row and a changed row inside the lookback window
    changed = [
        (1, "a", dt.datetime(2024, 1, 1)),
        (2, "b", dt.datetime(2024, 2, 1)),
        (3, "c2", dt.datetime(2024, 3, 2)),  # changed (cdc bumped)
        (4, "d", dt.datetime(2024, 3, 15)),
        (5, "e", dt.datetime(2024, 3, 20)),  # new
    ]
    r = run_incremental_load(
        spark, _build_window(spark, changed), target, audit,
        LoadParams(load_type="DELTA", delta_day_count=30),
    )
    assert r.total_rows == 5
    got = {r_["id"]: r_["v"] for r_ in spark.read.parquet(target).collect()}
    assert got == {1: "a", 2: "b", 3: "c2", 4: "d", 5: "e"}


def test_delta_removes_rows_deleted_at_source(spark, tmp_path):
    """A partition fully deleted at the source must not survive the
    delete-insert (the stale-partition case dynamic overwrite misses)."""
    target = str(tmp_path / "fact")
    audit = str(tmp_path / "audit")
    run_incremental_load(
        spark, _build_window(spark, ROWS), target, audit, LoadParams(load_type="FULL_LOAD")
    )
    # row 4 (2024-03-15) disappears from the source entirely
    shrunk = [r for r in ROWS if r[0] != 4]
    r = run_incremental_load(
        spark, _build_window(spark, shrunk), target, audit,
        LoadParams(load_type="DELTA", delta_day_count=30),
    )
    assert r.total_rows == 3
    assert sorted(x["id"] for x in spark.read.parquet(target).collect()) == [1, 2, 3]


def test_watermark_fallback_when_target_missing(spark, tmp_path):
    params = LoadParams(load_type="DELTA", minimum_date=dt.datetime(2000, 1, 1))
    wm = compute_watermark(spark, str(tmp_path / "nope"), params)
    assert wm == dt.datetime(2000, 1, 1)  # the IFNULL branch (I:17)


# ---------------------------------------------------- manifest-backed path --


def test_manifest_full_then_delta_matches_plain_path(spark, tmp_path):
    """use_manifest=True produces the same table contents as the in-place
    dynamic-partition-overwrite path, through the manifest reader."""
    from etl_data_transformer_spark.sources import manifest as M

    plain = str(tmp_path / "plain")
    man = str(tmp_path / "man")
    audit = str(tmp_path / "audit")
    full = LoadParams(load_type="FULL_LOAD", delta_day_count=30)
    delta = LoadParams(load_type="DELTA", delta_day_count=30)

    changed = [*ROWS[:3], (4, "d2", dt.datetime(2024, 3, 20)), (5, "e", dt.datetime(2024, 3, 25))]
    for path, mflag in ((plain, False), (man, True)):
        run_incremental_load(spark, _build_window(spark, ROWS), path, audit, full, use_manifest=mflag)
        run_incremental_load(spark, _build_window(spark, changed), path, audit, delta, use_manifest=mflag)

    got_plain = sorted((r["id"], r["v"]) for r in spark.read.parquet(plain).collect())
    got_man = sorted((r["id"], r["v"]) for r in M.read_table(spark, man).collect())
    assert got_man == got_plain
    assert [i for i, _ in got_man] == [1, 2, 3, 4, 5]
    assert ("4", ) not in {(v,) for _, v in got_man} and ("d2") in {v for _, v in got_man}


def test_manifest_delta_drops_fully_deleted_partitions(spark, tmp_path):
    """A partition whose rows all vanished from the source window is dropped
    from the ownership map (the replaceWhere drop case)."""
    from etl_data_transformer_spark.sources import manifest as M

    target = str(tmp_path / "fact")
    audit = str(tmp_path / "audit")
    run_incremental_load(
        spark, _build_window(spark, ROWS), target, audit,
        LoadParams(load_type="FULL_LOAD", delta_day_count=30), use_manifest=True,
    )
    # source lost ids 3 and 4 (both inside the 30-day lookback from 2024-03-15)
    r = run_incremental_load(
        spark, _build_window(spark, ROWS[:2]), target, audit,
        LoadParams(load_type="DELTA", delta_day_count=30), use_manifest=True,
    )
    assert r.total_rows == 2
    got = sorted(row["id"] for row in M.read_table(spark, target).collect())
    assert got == [1, 2]


def test_manifest_mid_load_crash_preserves_previous_version(spark, tmp_path, monkeypatch):
    """Kill the load ANYWHERE between the new data-dir write and the pointer
    publish: the previous version stays fully readable and a re-run
    converges (round-2 verdict item 5 — mid-load kill)."""
    import os as _os

    from etl_data_transformer_spark.sources import manifest as M

    target = str(tmp_path / "fact")
    audit = str(tmp_path / "audit")
    full = LoadParams(load_type="FULL_LOAD", delta_day_count=30)
    delta = LoadParams(load_type="DELTA", delta_day_count=30)
    run_incremental_load(spark, _build_window(spark, ROWS), target, audit, full, use_manifest=True)
    v1 = M.current_version(target)

    # crash at the publish instant (after data + manifest writes)
    monkeypatch.setattr(
        _os, "replace", lambda s, d: (_ for _ in ()).throw(OSError("injected mid-load kill"))
    )
    changed = [*ROWS, (5, "e", dt.datetime(2024, 3, 25))]
    import pytest as _pytest

    with _pytest.raises(OSError, match="injected"):
        run_incremental_load(spark, _build_window(spark, changed), target, audit, delta, use_manifest=True)
    monkeypatch.undo()

    # old version intact — reader sees the pre-load table, not a torn window
    assert M.current_version(target) == v1
    assert sorted(r["id"] for r in M.read_table(spark, target).collect()) == [1, 2, 3, 4]

    # re-run converges; the orphaned crash dir is vacuumable
    r = run_incremental_load(spark, _build_window(spark, changed), target, audit, delta, use_manifest=True)
    assert r.total_rows == 5
    M.vacuum(target, grace_s=0)
    assert sorted(r["id"] for r in M.read_table(spark, target).collect()) == [1, 2, 3, 4, 5]
