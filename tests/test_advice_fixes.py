"""Regression tests for the round-1 ADVICE findings: as-of join payload
blending, static-mode partition overwrite truncation, sessionize Arrow-chunk
ordering, atomic-swap failure atomicity, NULL-key streaming upserts.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- as-of ----

def test_as_of_join_nullable_right_payload(spark):
    """The matched right row's payload must be taken as a unit: a NULL field
    must NOT be backfilled from an older right row, and the inner no-match
    test must not key on the first payload column alone."""
    from etl_data_transformer_spark.operators.temporal import as_of_join

    t = lambda d: dt.datetime(2024, 1, d)  # noqa: E731
    left = spark.createDataFrame([(1, t(10), "a")], "k int, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, t(1), 1.0, None), (1, t(5), None, "latest")],
        "k int, rts timestamp, rate double, src string",
    )
    out = as_of_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts", right_cols=["rate", "src"]
    ).collect()
    # inner keeps the row (a prior right row exists) even though the matched
    # row's FIRST payload column is NULL...
    assert len(out) == 1
    r = out[0]
    # ...and the whole payload comes from the t(5) row — no blending of
    # rate=1.0 from the older t(1) row into the NULL field.
    assert r["rate"] is None and r["src"] == "latest"


# ------------------------------------------- static-session delete-insert ----

def test_incremental_delta_on_static_overwrite_session(spark, tmp_path):
    """run_incremental_load must not rely on the session-level dynamic
    partitionOverwriteMode: on a session explicitly set to 'static', a DELTA
    load must still leave partitions outside the lookback window intact."""
    from etl_data_transformer_spark.plans.incremental import LoadParams, run_incremental_load

    ns = spark.newSession()
    ns.conf.set("spark.sql.sources.partitionOverwriteMode", "static")

    rows = [
        (1, "a", dt.datetime(2024, 1, 1)),
        (2, "b", dt.datetime(2024, 2, 1)),
        (3, "c", dt.datetime(2024, 3, 1)),
        (4, "d", dt.datetime(2024, 3, 15)),
    ]

    def build(watermark):
        df = ns.createDataFrame(rows, "id long, v string, cdc_ts timestamp")
        return df.filter(F.col("cdc_ts") >= F.lit(watermark))

    target = str(tmp_path / "fact")
    audit = str(tmp_path / "audit")
    run_incremental_load(ns, build, target, audit, LoadParams(load_type="FULL_LOAD", delta_day_count=30))
    run_incremental_load(ns, build, target, audit, LoadParams(load_type="DELTA", delta_day_count=30))
    got = sorted(r["id"] for r in ns.read.parquet(target).collect())
    # with static overwrite leaking through, the old partitions (ids 1, 2)
    # would have been truncated by the lookback rewrite
    assert got == [1, 2, 3, 4]


# ----------------------------------------------------- sessionize chunks ----

def test_stream_sessionize_spans_arrow_chunks(spark, tmp_path):
    """One key's batch data larger than arrow.maxRecordsPerBatch arrives as
    several (unordered) chunks; sessionization must sort ACROSS chunks, not
    within each, to match the batch twin."""
    from etl_data_transformer_spark.streaming.pipeline import run_available_now, stream_sessionize

    schema = "event_id long, user_id long, ts timestamp, value double"
    base = dt.datetime(2024, 1, 1)
    # 120 events 1 min apart (one session), written in REVERSE time order so
    # chunk-local sorting still sees out-of-order data across chunks; a far
    # future event closes the session so it is emitted in one drain.
    rows = [(i, 1, base + dt.timedelta(minutes=i), 1.0) for i in range(120)]
    rows = rows[::-1] + [(999, 1, base + dt.timedelta(days=1), 0.5)]
    src = str(tmp_path / "chunk_src")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(src)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        stream = spark.readStream.schema(schema).parquet(src)
        got = run_available_now(
            stream_sessionize(stream, gap_minutes=30), str(tmp_path / "chunk_ckpt"), "chunk_q"
        ).collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    # exactly ONE closed session containing all 120 events — chunk-local
    # sorting would split it into several false sessions
    assert len(got) == 1
    r = got[0]
    assert r["n_events"] == 120 and r["sum_value"] == 120.0
    assert r["sess_start"] == base and r["sess_end"] == base + dt.timedelta(minutes=119)


# ------------------------------------------------------- swap atomicity ----

def test_atomic_swap_restores_target_on_failure(spark, tmp_path, monkeypatch):
    """If the second rename of the swap fails, the original table must be
    restored from backup — not deleted with it."""
    import os

    from etl_data_transformer_spark.sources.writers import atomic_swap_write

    target = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "old")], "id long, v string").write.parquet(target)

    real_rename = os.rename
    calls = []

    def failing_rename(src, dst):
        calls.append((src, dst))
        if dst == target and ".staging-" in src:
            raise OSError("injected failure between the two renames")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", failing_rename)
    new_df = spark.createDataFrame([(2, "new")], "id long, v string")
    with pytest.raises(OSError, match="injected"):
        atomic_swap_write(new_df, target)
    monkeypatch.undo()

    # the original table survived, and no staging/backup litter remains
    assert [r["v"] for r in spark.read.parquet(target).collect()] == ["old"]
    leftovers = [d for d in os.listdir(tmp_path) if d.startswith((".staging-", ".backup-"))]
    assert leftovers == []


# ------------------------------------------------------- NULL-key upsert ----

def test_stream_upsert_null_keys_do_not_duplicate(spark, tmp_path):
    """NULL key values must upsert (null-safe anti join), not append a new
    copy every micro-batch."""
    from etl_data_transformer_spark.streaming.pipeline import stream_incremental_upsert

    schema = "k long, ts timestamp, v double"
    src = str(tmp_path / "nk_src")
    target = str(tmp_path / "nk_target")
    ckpt = str(tmp_path / "nk_ckpt")

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        stream_incremental_upsert(stream, target, ckpt, key_cols=["k"], cdc_column="ts")

    d1 = dt.datetime(2024, 1, 1, 10)
    spark.createDataFrame([(None, d1, 1.0), (7, d1, 7.0)], schema).write.mode("overwrite").parquet(src)
    drain()
    spark.createDataFrame([(None, d1 + dt.timedelta(hours=1), 2.0)], schema).write.mode(
        "append"
    ).parquet(src)
    drain()

    got = [(r["k"], r["v"]) for r in spark.read.parquet(target).collect()]
    # the NULL-key row was REPLACED (one copy, latest value), not duplicated
    assert len(got) == 2 and set(got) == {(None, 2.0), (7, 7.0)}


def test_read_table_scopes_nanos_conf(spark):
    """read_table must not leave nanosAsLong flipped on the caller's session
    (round-2 advice): the override is save/restored around the read, and the
    returned plan still executes afterwards (the conf is captured at read
    time)."""
    from etl_data_transformer_spark.sources import readers as R

    key = "spark.sql.legacy.parquet.nanosAsLong"
    prior = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "false")
        R._TABLE_CACHE.clear()  # force a fresh (non-memoized) read
        df = R.read_table(spark, "/root/testdata/sf0.001", "events")
        assert spark.conf.get(key) == "false"  # caller's setting untouched
        assert df.count() > 0  # plan executes with the conf restored
        # ts normalized to the session (LTZ) type regardless of whether the
        # fixture stores ns longs or native timestamp[us] (NTZ)
        assert dict(df.dtypes)["ts"] == "timestamp"
    finally:
        R._TABLE_CACHE.clear()
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)
