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


# ---- round-4 advice: minhash store lifecycle + streaming store integrity ----


def test_minhash_store_overwrite_rebuilds_with_new_params(spark, tmp_path):
    """mode='overwrite' is a legitimate rebuild: no validation against the
    old sidecar, and the sidecar is rewritten to the new params."""
    from etl_data_transformer_spark.operators import dedup as DD

    path = str(tmp_path / "store")
    docs = spark.createDataFrame(
        [(i, f"doc number {i} with some words") for i in range(6)], ["doc_id", "text"]
    )
    DD.write_minhash_store(
        DD.minhash_signature_store(docs, num_hashes=8, bands=4), path, num_hashes=8, bands=4
    )
    # rebuild with DIFFERENT banding — must not raise, must relabel
    DD.write_minhash_store(
        DD.minhash_signature_store(docs, num_hashes=12, bands=6),
        path,
        num_hashes=12,
        bands=6,
        mode="overwrite",
    )
    assert DD.read_minhash_store(spark, path, num_hashes=12, bands=6).count() > 0
    with pytest.raises(ValueError, match="parameter mismatch"):
        DD.read_minhash_store(spark, path, num_hashes=8, bands=4)


def test_minhash_store_sidecar_lands_before_first_data_write(spark, tmp_path):
    """A crash between sidecar and first data write must leave a LABELED
    (empty) store, not an unlabeled one a mismatched append would extend:
    the append path writes the sidecar first."""
    import os

    from pyspark.sql import functions as F

    from etl_data_transformer_spark.operators import dedup as DD

    path = str(tmp_path / "store")
    docs = spark.createDataFrame([(1, "some words here")], ["doc_id", "text"])
    store = DD.minhash_signature_store(docs).withColumn(
        "hs", F.raise_error(F.lit("simulated write crash"))
    )
    with pytest.raises(Exception, match="simulated write crash"):
        DD.write_minhash_store(store, path)
    assert os.path.exists(os.path.join(path, "_minhash_params.json"))
    # the labeled empty store rejects a mismatched later append
    with pytest.raises(ValueError, match="parameter mismatch"):
        DD.ensure_minhash_params_sidecar(path, shingle_n=5, num_hashes=12, bands=4)


def test_incremental_bucket_cap_counts_combined_corpus(spark):
    """include_batch_pairs=False changes pair GENERATION only: a bucket
    pushed over the cap by batch rows is dropped for the cross-corpus join
    too (round-4 advice — matches the docstring's combined-corpus cap)."""
    from etl_data_transformer_spark.operators import dedup as DD

    text = "alpha beta gamma delta epsilon zeta"
    store_docs = spark.createDataFrame([(i, text) for i in range(3)], ["doc_id", "text"])
    batch_docs = spark.createDataFrame([(i, text) for i in range(100, 104)], ["doc_id", "text"])
    store = DD.minhash_signature_store(store_docs)
    # store side alone: 3 members per bucket (under a cap of 5); batch adds
    # 4 more -> combined 7 (over the cap) -> every bucket dropped -> no pairs
    capped = DD.minhash_dedup_incremental(
        batch_docs, store, threshold=0.3, max_bucket_size=5, include_batch_pairs=False
    )
    assert capped.count() == 0
    # sanity: uncapped cross-corpus finds the 3x4 identical-text pairs
    uncapped = DD.minhash_dedup_incremental(
        batch_docs, store, threshold=0.3, include_batch_pairs=False
    )
    assert uncapped.count() == 12


def test_read_store_or_none_distinguishes_first_batch_from_corruption(spark, tmp_path):
    """Only path-not-found / no-data-yet map to 'first batch'; a corrupt
    file in an existing store raises so the micro-batch retries."""
    from etl_data_transformer_spark.streaming.pipeline import _read_store_or_none

    missing = str(tmp_path / "nope")
    assert _read_store_or_none(spark, missing) is None

    sidecar_only = tmp_path / "labeled_empty"
    sidecar_only.mkdir()
    (sidecar_only / "_minhash_params.json").write_text("{}")
    assert _read_store_or_none(spark, str(sidecar_only)) is None

    corrupt = tmp_path / "corrupt_store"
    corrupt.mkdir()
    (corrupt / "part-00000.parquet").write_bytes(b"this is not parquet")
    with pytest.raises(Exception):
        df = _read_store_or_none(spark, str(corrupt))
        if df is not None:  # schema inference may defer the failure to read time
            df.collect()


def test_stream_near_dedup_rejects_param_drift_against_existing_store(spark, tmp_path):
    """Restarting the stream with different banding params against an
    existing store must raise (sidecar validation inside foreachBatch), not
    silently yield zero store-side pairs."""
    from pyspark.sql import types as T

    from etl_data_transformer_spark.streaming.pipeline import stream_near_dedup

    src = tmp_path / "src"
    src.mkdir()
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")], "doc_id long, text string"
    )
    docs.write.mode("overwrite").parquet(str(src / "b0"))
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    store, pairs = str(tmp_path / "store"), str(tmp_path / "pairs")

    stream = spark.readStream.schema(schema).parquet(str(src / "b0"))
    stream_near_dedup(stream, store, pairs, str(tmp_path / "ck0"), num_hashes=8, bands=4)

    docs.write.mode("overwrite").parquet(str(src / "b1"))
    stream2 = spark.readStream.schema(schema).parquet(str(src / "b1"))
    with pytest.raises(Exception, match="parameter mismatch"):
        stream_near_dedup(stream2, store, pairs, str(tmp_path / "ck1"), num_hashes=12, bands=4)
