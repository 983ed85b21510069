"""Structured Streaming tests: the streamed tumbling agg must equal its
batch twin on the same input (SURVEY.md §2.9)."""

import pytest
from pyspark.sql import functions as F

from etl_data_transformer_spark.operators.window_ops import tumbling_agg
from etl_data_transformer_spark.sources.readers import read_table
from etl_data_transformer_spark.streaming import (
    read_event_stream,
    run_available_now,
    stream_tumbling_agg,
)
from etl_data_transformer_spark.streaming.pipeline import stream_sessionize

SF_DIR = "/root/testdata/sf0.001"


def _events_dir(spark, tmp_path):
    """Stage fixture events as a stream-source directory (normalizing the
    ns-timestamp column through the batch reader first)."""
    path = str(tmp_path / "events_src")
    read_table(spark, SF_DIR, "events").write.mode("overwrite").parquet(path)
    return path


def test_stream_equals_batch(spark, tmp_path):
    src = _events_dir(spark, tmp_path)
    batch_df = spark.read.parquet(src)
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in tumbling_agg(batch_df, group_extra=["event_type"]).collect()
    }

    stream = read_event_stream(spark, src)
    agg = stream_tumbling_agg(stream, group_extra=["event_type"])
    # complete mode: with AvailableNow the watermark never closes windows in
    # a single drain, so append would emit nothing — complete emits all state
    got_df = run_available_now(agg, str(tmp_path / "ckpt"), "stream_eq_batch", output_mode="complete")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in got_df.collect()
    }
    assert got == expected
    assert len(got) > 0


def test_stream_incremental_two_batches(spark, tmp_path):
    """New files arriving after the first drain are picked up incrementally
    (the streaming form of the C4 delta load)."""
    src = str(tmp_path / "src")
    ev = read_table(spark, SF_DIR, "events")
    first = ev.filter(F.col("event_id") < 500)
    second = ev.filter(F.col("event_id") >= 500)
    first.write.mode("overwrite").parquet(src)

    stream = read_event_stream(spark, src)
    agg = stream_tumbling_agg(stream, group_extra=["event_type"])
    ckpt = str(tmp_path / "ckpt2")
    got1 = run_available_now(agg, ckpt, "incr_a", output_mode="complete").count()

    second.write.mode("append").parquet(src)
    got2 = run_available_now(agg, ckpt, "incr_b", output_mode="complete").count()
    assert got2 >= got1
    full = tumbling_agg(ev, group_extra=["event_type"]).count()
    assert got2 == full


def test_stream_sessionize_closed_sessions(spark, tmp_path):
    """applyInPandasWithState sessionization: gap-closed sessions are emitted;
    the trailing open session per key stays in state (not emitted in one
    AvailableNow drain). Batch twin: operators/temporal.session_agg."""
    import datetime as dt

    def ts(minute):
        return dt.datetime(2024, 1, 1, minute // 60, minute % 60)

    rows = [
        # user 1: two sessions (gap 40 min > 30); second stays open
        (1, 1, ts(0), 1.0),
        (2, 1, ts(10), 2.0),
        (3, 1, ts(50), 3.0),
        # user 2: one open session only → nothing emitted
        (4, 2, ts(0), 4.0),
    ]
    src = str(tmp_path / "sess_src")
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    ).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("event_id long, user_id long, ts timestamp, value double").parquet(src)
    sessions = stream_sessionize(stream, gap_minutes=30)
    got = run_available_now(sessions, str(tmp_path / "sess_ckpt"), "sess_q").collect()

    assert len(got) == 1
    r = got[0]
    assert r["user_id"] == 1 and r["n_events"] == 2 and r["sum_value"] == 3.0
    assert r["sess_start"] == ts(0) and r["sess_end"] == ts(10)


def test_stream_incremental_append_exactly_once(spark, tmp_path):
    """Streaming C4 append: two drains over a growing source land every row
    exactly once in the partitioned target (checkpoint = high-water mark);
    re-running with no new data appends nothing."""
    from etl_data_transformer_spark.streaming.pipeline import stream_incremental_append

    src = str(tmp_path / "inc_src")
    target = str(tmp_path / "inc_target")
    ckpt = str(tmp_path / "inc_ckpt")
    ev = read_table(spark, SF_DIR, "events")
    first = ev.filter(F.col("event_id") < 500)
    second = ev.filter(F.col("event_id") >= 500)

    first.write.mode("overwrite").parquet(src)
    stream_incremental_append(read_event_stream(spark, src), target, ckpt)
    assert spark.read.parquet(target).count() == first.count()

    second.write.mode("append").parquet(src)
    stream_incremental_append(read_event_stream(spark, src), target, ckpt)
    got = spark.read.parquet(target)
    assert got.count() == ev.count()
    assert got.select("event_id").distinct().count() == ev.count()  # no dupes

    # idempotent re-run: nothing new to drain
    stream_incremental_append(read_event_stream(spark, src), target, ckpt)
    assert spark.read.parquet(target).count() == ev.count()
    # partitioned layout for pruning
    assert got.schema["cdc_date"].dataType.typeName() == "date"


def test_stream_sessionize_state_across_drains(spark, tmp_path):
    """Group state survives across AvailableNow drains: batch 2 events within
    the gap EXTEND the open session (still unemitted); an event past the gap
    CLOSES it and the completed session is emitted with batch-1+2 contents."""
    import datetime as dt

    def ts(minute):
        return dt.datetime(2024, 1, 1, minute // 60, minute % 60)

    schema = "event_id long, user_id long, ts timestamp, value double"
    src = str(tmp_path / "sess2_src")
    ckpt = str(tmp_path / "sess2_ckpt")

    out = str(tmp_path / "sess2_out")

    def drain():
        # file sink (memory sink cannot recover from a checkpoint)
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_sessionize(stream, gap_minutes=30)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).collect()

    spark.createDataFrame([(1, 1, ts(0), 1.0)], schema).write.mode("overwrite").parquet(src)
    assert drain() == []  # session still open in state

    # +10 min: extends the open session; +90 min: gap exceeded → closes it
    spark.createDataFrame(
        [(2, 1, ts(10), 2.0), (3, 1, ts(90), 5.0)], schema
    ).write.mode("append").parquet(src)
    got2 = drain()
    assert len(got2) == 1
    r = got2[0]
    # the closed session spans both drains' events (state carried over)
    assert r["n_events"] == 2 and r["sum_value"] == 3.0
    assert r["sess_start"] == ts(0) and r["sess_end"] == ts(10)


def test_stream_incremental_upsert(spark, tmp_path):
    """foreachBatch CDC upsert: later batches replace rows by key within the
    touched date partitions; new keys append; in-batch duplicates collapse to
    the latest version."""
    import datetime as dt

    from etl_data_transformer_spark.streaming.pipeline import stream_incremental_upsert

    schema = "k long, ts timestamp, v double"
    src = str(tmp_path / "ups_src")
    target = str(tmp_path / "ups_target")
    ckpt = str(tmp_path / "ups_ckpt")

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        stream_incremental_upsert(stream, target, ckpt, key_cols=["k"], cdc_column="ts")

    d1 = dt.datetime(2024, 1, 1, 10)
    d2 = dt.datetime(2024, 1, 2, 10)
    spark.createDataFrame([(1, d1, 1.0), (2, d1, 2.0)], schema).write.mode("overwrite").parquet(src)
    drain()
    assert {(r["k"], r["v"]) for r in spark.read.parquet(target).collect()} == {(1, 1.0), (2, 2.0)}

    # update k=1 (same partition date), add k=3 on a new date, and two
    # in-batch versions of k=4 (the later one must win)
    spark.createDataFrame(
        [
            (1, d1 + dt.timedelta(hours=1), 10.0),
            (3, d2, 3.0),
            (4, d2, 40.0),
            (4, d2 + dt.timedelta(minutes=5), 44.0),
        ],
        schema,
    ).write.mode("append").parquet(src)
    drain()
    got = {(r["k"], r["v"]) for r in spark.read.parquet(target).collect()}
    assert got == {(1, 10.0), (2, 2.0), (3, 3.0), (4, 44.0)}


def test_stream_incremental_upsert_read_failure_does_not_truncate(spark, tmp_path):
    """Round-5 verdict #1: a read failure on an EXISTING target must fail the
    micro-batch (so foreachBatch retries), never fall through to the
    first-batch create path — which, pre-fix, overwrote the whole table with
    just the current batch. Inject the failure with a corrupt parquet file
    dropped into a populated target."""
    import datetime as dt

    import pytest

    from etl_data_transformer_spark.streaming.pipeline import stream_incremental_upsert

    schema = "k long, ts timestamp, v double"
    src = str(tmp_path / "cor_src")
    target = tmp_path / "cor_target"
    ckpt = str(tmp_path / "cor_ckpt")

    d1 = dt.datetime(2024, 1, 1, 10)
    spark.createDataFrame([(1, d1, 1.0), (2, d1, 2.0)], schema).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    stream_incremental_upsert(stream, str(target), ckpt, key_cols=["k"], cdc_column="ts")
    before = {(r["k"], r["v"]) for r in spark.read.parquet(str(target)).collect()}
    assert before == {(1, 1.0), (2, 2.0)}

    # corrupt footer inside the existing target → the probe read must raise
    part = target / "cdc_date=2024-01-01"
    (part / "part-corrupt.parquet").write_bytes(b"PAR1 this is not a parquet file")
    spark.createDataFrame([(3, d1, 3.0)], schema).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(schema).parquet(src)
    with pytest.raises(Exception, match="(?i)footer|corrupt|parquet|not a"):
        stream_incremental_upsert(stream2, str(target), ckpt, key_cols=["k"], cdc_column="ts")

    # target survives: original rows intact once the injected file is removed
    (part / "part-corrupt.parquet").unlink()
    after = {(r["k"], r["v"]) for r in spark.read.parquet(str(target)).collect()}
    assert after == before


def test_sessionize_identical_under_rocksdb_state_store(spark, tmp_path):
    """The RocksDB state store (the cluster-scale spill path for streaming
    state) produces byte-identical sessionization results to the default
    HDFS-backed provider — only memory behavior differs."""
    import datetime as dt

    from etl_data_transformer_spark.streaming.pipeline import (
        ROCKSDB_PROVIDER,
        _STATE_STORE_KEY,
        use_rocksdb_state_store,
    )

    def ts(minute):
        return dt.datetime(2024, 1, 1, minute // 60, minute % 60)

    rows = [
        (1, 1, ts(0), 1.0),
        (2, 1, ts(10), 2.0),
        (3, 1, ts(50), 3.0),   # closes user 1's first session
        (4, 2, ts(0), 4.0),
        (5, 2, ts(20), 1.5),
        (6, 2, ts(60), 2.5),   # closes user 2's first session
    ]
    src = str(tmp_path / "rdb_src")
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    ).write.mode("overwrite").parquet(src)
    schema = "event_id long, user_id long, ts timestamp, value double"

    def drain(name):
        stream = spark.readStream.schema(schema).parquet(src)
        sessions = stream_sessionize(stream, gap_minutes=30)
        ckpt = str(tmp_path / f"{name}_ckpt")  # provider is checkpoint-sticky
        return sorted(
            tuple(r) for r in run_available_now(sessions, ckpt, name).collect()
        )

    prior = spark.conf.get(_STATE_STORE_KEY, None)
    try:
        default_out = drain("rdb_default")
        use_rocksdb_state_store(spark)
        assert spark.conf.get(_STATE_STORE_KEY) == ROCKSDB_PROVIDER
        rocksdb_out = drain("rdb_rocks")
    finally:
        if prior is None:
            use_rocksdb_state_store(spark, enabled=False)
        else:
            spark.conf.set(_STATE_STORE_KEY, prior)

    assert rocksdb_out == default_out
    assert len(rocksdb_out) == 2  # one closed session per user


def test_stream_exact_dedup_drops_in_window_duplicates(spark, tmp_path):
    """Streaming exact dedup: same normalized text arriving twice within the
    watermark window lands once; distinct texts all land."""
    import datetime as dt

    from etl_data_transformer_spark.streaming.pipeline import stream_exact_dedup

    t0 = dt.datetime(2024, 1, 1, 9, 0)
    rows = [
        (1, t0, "the same document"),
        (2, t0 + dt.timedelta(minutes=1), "The  same   document"),  # normalized dup
        (3, t0 + dt.timedelta(minutes=2), "a different document"),
    ]
    src = str(tmp_path / "dd_src")
    spark.createDataFrame(rows, "doc_id long, ts timestamp, text string").write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(src)
    out = stream_exact_dedup(stream, watermark="30 minutes")
    got = run_available_now(out, str(tmp_path / "dd_ckpt"), "dd_q").collect()
    ids = sorted(r["doc_id"] for r in got)
    # exactly ONE of the two normalized-dup rows survives (which one is
    # processing-order-dependent within a micro-batch), plus the distinct doc
    assert len(ids) == 2 and ids[1] == 3 and ids[0] in (1, 2)
    assert "fp" not in got[0].asDict()


def test_stream_exact_dedup_preserves_caller_fp_column(spark, tmp_path):
    import datetime as dt

    from etl_data_transformer_spark.streaming.pipeline import stream_exact_dedup

    t0 = dt.datetime(2024, 1, 1, 9, 0)
    src = str(tmp_path / "fp_src")
    spark.createDataFrame(
        [(1, t0, "doc one", "user-fp-1")], "doc_id long, ts timestamp, text string, fp string"
    ).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id long, ts timestamp, text string, fp string").parquet(src)
    out = stream_exact_dedup(stream)
    got = run_available_now(out, str(tmp_path / "fp_ckpt"), "fp_q").collect()
    assert got[0]["fp"] == "user-fp-1"  # caller's column intact


def test_stream_near_dedup_cross_batch_pairs_and_store(spark, tmp_path):
    """Streaming MinHash dedup: batch 2 must pair against batch 1 via the
    persisted signature store (never re-shingling batch 1's text), the
    store must accumulate signatures per batch, and an empty drain must
    change nothing. (A batch emitting zero pairs leaves the pairs table
    untouched by design — dynamic overwrite of an empty frame is a no-op,
    which is exactly what makes replays idempotent.)"""
    from etl_data_transformer_spark.streaming.pipeline import stream_near_dedup

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    pairs = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"
    base = "a very particular document about streaming dedup with many words"

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        stream_near_dedup(stream, store, pairs, ckpt, threshold=0.3)

    spark.createDataFrame(
        [
            (1, base),
            (2, base + " z"),  # in-batch near-dup of 1
            (5, "a completely different text about other things entirely"),
        ],
        schema,
    ).write.mode("overwrite").parquet(src)
    drain()
    p1 = {(r["id_a"], r["id_b"]) for r in spark.read.parquet(pairs).collect()}
    assert p1 == {(1, 2)}
    s1 = spark.read.parquet(store)
    assert s1.select("doc_id").distinct().count() == 3

    # batch 2: near-dups of doc 1 -> cross-batch pairs via the store, plus
    # an in-batch pair (6, 7)
    spark.createDataFrame([(6, base + " x"), (7, base + " x y")], schema).write.mode(
        "append"
    ).parquet(src)
    drain()
    got = {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(pairs).select("id_a", "id_b").collect()
    }
    for want in [(1, 2), (1, 6), (2, 6), (1, 7), (6, 7)]:
        assert want in got, f"missing pair {want}: {sorted(got)}"
    assert all(a < b for a, b in got)
    s2 = spark.read.parquet(store)
    assert s2.select("doc_id").distinct().count() == 5

    # no new files -> no new micro-batch -> outputs unchanged
    drain()
    assert {(r["id_a"], r["id_b"]) for r in spark.read.parquet(pairs).collect()} == got
    assert spark.read.parquet(store).select("doc_id").distinct().count() == 5


def test_compact_preserves_streaming_store_layout(spark, tmp_path):
    """Compacting a __batch_id-partitioned streaming signature store must
    keep the partition layout: a later micro-batch's dynamic partition
    overwrite and the next store read both still work (a flat rewrite used
    to corrupt partition discovery — round-5 review)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from etl_data_transformer_spark.operators.dedup import compact_minhash_store
    from etl_data_transformer_spark.streaming.pipeline import stream_near_dedup

    src = tmp_path / "src"
    src.mkdir()
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    store, pairs = str(tmp_path / "store"), str(tmp_path / "pairs")
    text = "the quick brown fox jumps over the lazy dog once more"

    b0 = spark.createDataFrame([(1, text), (2, "other words entirely here")], schema)
    b0.write.parquet(str(src / "b0"))
    stream_near_dedup(
        spark.readStream.schema(schema).parquet(str(src / "b0")),
        store, pairs, str(tmp_path / "ck0"), threshold=0.3,
    )
    assert "__batch_id" in spark.read.parquet(store).columns

    # doc 2 deleted from the corpus: compact its signatures away
    compact_minhash_store(spark, store, drop_ids=spark.createDataFrame([(2,)], ["doc_id"]))
    after = spark.read.parquet(store)
    assert "__batch_id" in after.columns  # layout preserved
    assert after.filter(F.col("doc_id") == 2).count() == 0

    # the stream continues against the compacted store: a near-dup of doc 1
    # is still caught, and the store read doesn't trip partition discovery
    b1 = spark.createDataFrame([(10, text + " x")], schema)
    b1.write.parquet(str(src / "b1"))
    stream_near_dedup(
        spark.readStream.schema(schema).parquet(str(src / "b1")),
        store, pairs, str(tmp_path / "ck1"), threshold=0.3,
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(pairs).select("id_a", "id_b").collect()
    }
    assert (1, 10) in got
    assert spark.read.parquet(store).filter(F.col("doc_id") == 10).count() > 0
    # round-5 advice (medium): ck1 restarts batch numbering at 0 — without
    # per-checkpoint namespacing its dynamic overwrite would have silently
    # replaced ck0's batch-0 store partition, deleting doc 1's signatures
    assert spark.read.parquet(store).filter(F.col("doc_id") == 1).count() > 0


def test_stream_new_checkpoint_preserves_prior_runs_store(spark, tmp_path):
    """Round-5 advice (medium): a stream restarted with a NEW checkpoint
    against an existing store restarts micro-batch numbering at 0; the
    store/pairs partitions are namespaced per checkpoint, so run 2's
    batch 0 must NOT overwrite run 1's batch-0 rows — and a third run must
    still find cross-run pairs against BOTH earlier runs' fingerprints."""
    from etl_data_transformer_spark.streaming.pipeline import stream_winnow_dedup

    src = tmp_path / "src"
    src.mkdir()
    schema = "doc_id long, text string"
    store, pairs = str(tmp_path / "store"), str(tmp_path / "pairs")
    base = "one shared verbatim passage that both documents quote at length"

    def run(sub, ck):
        stream_winnow_dedup(
            spark.readStream.schema(schema).parquet(str(src / sub)),
            store, pairs, str(tmp_path / ck), k=4, w=3, min_shared=1,
        )

    spark.createDataFrame([(1, base + " first")], schema).write.parquet(str(src / "r1"))
    run("r1", "ck1")
    spark.createDataFrame([(2, "totally unrelated words about nothing")], schema).write.parquet(
        str(src / "r2")
    )
    run("r2", "ck2")  # new checkpoint: its batch 0 must not clobber run 1's
    got_store = spark.read.parquet(store)
    assert got_store.filter(F.col("doc_id") == 1).count() > 0  # run 1 rows intact
    assert got_store.select("__batch_id").distinct().count() == 2  # distinct namespaces

    spark.createDataFrame([(3, base + " third")], schema).write.parquet(str(src / "r3"))
    run("r3", "ck3")
    got = {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(pairs).select("id_a", "id_b").collect()
    }
    assert (1, 3) in got  # cross-run overlap vs run 1 still detected


def test_stream_namespace_token_dies_with_checkpoint(spark, tmp_path):
    """Round-6 review: the namespace token lives INSIDE the checkpoint dir,
    so deleting the checkpoint to reprocess from scratch also discards the
    token — the restarted run gets a fresh namespace and cannot overwrite
    the earlier run's store partitions."""
    import shutil

    from etl_data_transformer_spark.streaming.pipeline import stream_winnow_dedup

    src = tmp_path / "src"
    src.mkdir()
    schema = "doc_id long, text string"
    store, pairs = str(tmp_path / "store"), str(tmp_path / "pairs")
    ckpt = tmp_path / "ck"

    spark.createDataFrame([(1, "alpha beta gamma delta epsilon zeta")], schema).write.parquet(
        str(src / "r1")
    )
    stream_winnow_dedup(
        spark.readStream.schema(schema).parquet(str(src / "r1")),
        store, pairs, str(ckpt), k=4, w=3,
    )
    assert (ckpt / "__store_ns").exists()  # token inside the checkpoint

    shutil.rmtree(ckpt)  # 'reprocess from scratch': checkpoint AND token gone
    spark.createDataFrame([(2, "totally different words here now")], schema).write.parquet(
        str(src / "r2")
    )
    stream_winnow_dedup(
        spark.readStream.schema(schema).parquet(str(src / "r2")),
        store, pairs, str(ckpt), k=4, w=3,
    )
    got = spark.read.parquet(store)
    # both runs' batch 0 landed — under DISTINCT namespaces, no overwrite
    assert got.filter(F.col("doc_id") == 1).count() > 0
    assert got.select("__batch_id").distinct().count() == 2


def test_stream_migrates_legacy_integer_batch_id_store(spark, tmp_path):
    """Round-6 review: a store written by the pre-namespace code has
    integer-valued __batch_id partitions; the first post-upgrade batch must
    migrate it (atomic rewrite into the inert 'legacy-' namespace for a
    fresh checkpoint) so later batch-id collisions/duplicates are
    impossible — and cross-store pairs against migrated rows still work."""
    from etl_data_transformer_spark.operators.dedup import (
        ensure_winnow_params_sidecar,
        winnow_store_rows,
    )
    from etl_data_transformer_spark.streaming.pipeline import stream_winnow_dedup

    src = tmp_path / "src"
    src.mkdir()
    schema = "doc_id long, text string"
    store, pairs = str(tmp_path / "store"), str(tmp_path / "pairs")
    base = "one shared verbatim passage that both documents quote at length"

    # simulate the pre-namespace layout: integer __batch_id partitions
    seed = spark.createDataFrame([(1, base + " legacy")], schema)
    ensure_winnow_params_sidecar(store, k=4, w=3)
    (
        winnow_store_rows(seed, "text", "doc_id", 4, 3)
        .withColumn("__batch_id", F.lit(0))
        .write.mode("append")
        .partitionBy("__batch_id")
        .parquet(store)
    )
    assert dict(spark.read.parquet(store).dtypes)["__batch_id"] != "string"

    spark.createDataFrame([(2, base + " streamed")], schema).write.parquet(str(src / "b1"))
    stream_winnow_dedup(
        spark.readStream.schema(schema).parquet(str(src / "b1")),
        store, pairs, str(tmp_path / "ck"), k=4, w=3, min_shared=1,
    )
    after = spark.read.parquet(store)
    assert dict(after.dtypes)["__batch_id"] == "string"  # migrated
    legacy_parts = {
        r["__batch_id"] for r in after.filter(F.col("doc_id") == 1).select("__batch_id").collect()
    }
    assert legacy_parts == {"legacy-000000"}  # fresh checkpoint -> inert ns
    got = {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(pairs).select("id_a", "id_b").collect()
    }
    assert (1, 2) in got  # overlap vs migrated rows found


def test_partitioned_store_convert_continuing_checkpoint_uses_run_ns(spark, tmp_path):
    """Unit check of the migration's other branch: when the driving
    checkpoint already has committed batches (same logical stream continuing
    across the upgrade), legacy integer ids map into the CURRENT run's
    namespace so a replayed in-flight batch overwrites its own partition."""
    from etl_data_transformer_spark.streaming.pipeline import (
        _partitioned_store_or_convert,
    )

    store = str(tmp_path / "store")
    spark.createDataFrame([(1, 10, 99)], "doc_id long, nf int, fp long").withColumn(
        "__batch_id", F.lit(5)
    ).write.partitionBy("__batch_id").parquet(store)
    ckpt = tmp_path / "ck"
    (ckpt / "commits").mkdir(parents=True)
    (ckpt / "commits" / "0").write_text("v1")

    out = _partitioned_store_or_convert(spark, store, "tok123", str(ckpt), None)
    vals = {r["__batch_id"] for r in out.select("__batch_id").collect()}
    assert vals == {"tok123-000005"}


def test_stream_append_converts_batch_seeded_flat_store(spark, tmp_path):
    """Round-5 advice (medium): a store seeded by the BATCH writer is
    unpartitioned; the first streaming append must convert it to the
    __batch_id-partitioned layout (atomically, sidecar preserved) instead
    of creating a mixed flat/partitioned directory — and pairs against the
    seeded fingerprints must be found."""
    from etl_data_transformer_spark.operators.dedup import (
        winnow_store_rows,
        write_winnow_store,
    )
    from etl_data_transformer_spark.streaming.pipeline import stream_winnow_dedup

    src = tmp_path / "src"
    src.mkdir()
    schema = "doc_id long, text string"
    store, pairs = str(tmp_path / "store"), str(tmp_path / "pairs")
    base = "a long quoted passage reused verbatim across the corpus documents"

    seed = spark.createDataFrame([(1, base + " seed")], schema)
    write_winnow_store(winnow_store_rows(seed, "text", "doc_id", 4, 3), store, k=4, w=3)
    assert "__batch_id" not in spark.read.parquet(store).columns  # flat seed

    spark.createDataFrame([(2, base + " streamed")], schema).write.parquet(str(src / "b1"))
    stream_winnow_dedup(
        spark.readStream.schema(schema).parquet(str(src / "b1")),
        store, pairs, str(tmp_path / "ck"), k=4, w=3, min_shared=1,
    )
    after = spark.read.parquet(store)
    assert "__batch_id" in after.columns  # converted, uniform layout
    assert after.filter(F.col("doc_id") == 1).count() > 0  # seed rows survive
    got = {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(pairs).select("id_a", "id_b").collect()
    }
    assert (1, 2) in got  # seed x stream overlap found through the store


def test_stream_interval_join_equals_batch(spark, tmp_path):
    """Inner stream-stream interval join (view -> purchase attribution
    within 2 hours per user) must emit exactly the batch join's pairs."""
    from etl_data_transformer_spark.streaming.pipeline import stream_interval_join

    src = _events_dir(spark, tmp_path)
    ev = spark.read.parquet(src)
    views_b = ev.filter(F.col("event_type") == "view")
    buys_b = ev.filter(F.col("event_type") == "purchase")
    expected = {
        (r["event_id"], r["r_event_id"])
        for r in views_b.join(
            buys_b.select([F.col(c).alias(f"r_{c}") for c in buys_b.columns]),
            (F.col("user_id") == F.col("r_user_id"))
            & (F.col("r_ts") > F.col("ts"))
            & (F.col("r_ts") <= F.col("ts") + F.expr("INTERVAL 2 hours")),
        ).collect()
    }
    assert expected  # fixture must actually produce attribution pairs

    stream = read_event_stream(spark, src)
    joined = stream_interval_join(
        stream.filter(F.col("event_type") == "view"),
        stream.filter(F.col("event_type") == "purchase"),
        upper="2 hours",
    )
    got_df = run_available_now(joined, str(tmp_path / "ckpt_ij"), "ij_eq_batch")
    got = {(r["event_id"], r["r_event_id"]) for r in got_df.collect()}
    assert got == expected


def test_stream_interval_join_state_across_drains(spark, tmp_path):
    """A purchase arriving in a LATER drain still joins to a view buffered
    in join state from the first drain (within the watermark horizon)."""
    from etl_data_transformer_spark.streaming.pipeline import stream_interval_join

    src = str(tmp_path / "src_ij2")
    ev = read_table(spark, SF_DIR, "events")
    views = ev.filter(F.col("event_type") == "view")
    buys = ev.filter(F.col("event_type") == "purchase")
    views.write.mode("overwrite").parquet(src)

    stream = read_event_stream(spark, src)
    joined = stream_interval_join(
        stream.filter(F.col("event_type") == "view"),
        stream.filter(F.col("event_type") == "purchase"),
        upper="2 hours",
        left_watermark="100 days",
        right_watermark="100 days",
    )
    ckpt = str(tmp_path / "ckpt_ij2")
    sink = str(tmp_path / "sink_ij2")

    def drain():
        # file sink: the memory sink cannot recover an append-mode
        # checkpoint across restarts, a parquet sink can
        q = (
            joined.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink)

    got1 = drain().count()
    assert got1 == 0  # no purchases yet

    buys.write.mode("append").parquet(src)
    pairs = {(r["event_id"], r["r_event_id"]) for r in drain().collect()}
    expected = {
        (r["event_id"], r["r_event_id"])
        for r in views.join(
            buys.select([F.col(c).alias(f"r_{c}") for c in buys.columns]),
            (F.col("user_id") == F.col("r_user_id"))
            & (F.col("r_ts") > F.col("ts"))
            & (F.col("r_ts") <= F.col("ts") + F.expr("INTERVAL 2 hours")),
        ).collect()
    }
    assert pairs == expected and len(pairs) > 0


def test_stream_dim_enrich_equals_batch(spark, tmp_path):
    """Stream-static broadcast enrichment matches the batch join. (Dim
    freshness is a documented caveat — the parquet file listing pins at
    DataFrame creation, so in-place dim updates need a query restart or a
    foreachBatch re-read; see stream_dim_enrich docstring.)"""
    from etl_data_transformer_spark.streaming.pipeline import stream_dim_enrich

    src = _events_dir(spark, tmp_path)
    dim_path = str(tmp_path / "dim")
    users = [(u, f"segment_{u % 3}") for u in range(1, 16)]
    spark.createDataFrame(users, "user_id long, segment string").write.mode(
        "overwrite"
    ).parquet(dim_path)

    batch = spark.read.parquet(src)
    expected = {
        (r["event_id"], r["segment"])
        for r in batch.join(spark.read.parquet(dim_path), "user_id", "left").collect()
    }
    stream = read_event_stream(spark, src)
    enriched = stream_dim_enrich(stream, spark.read.parquet(dim_path), "user_id")
    got_df = run_available_now(enriched, str(tmp_path / "ckpt_de"), "dim_enrich")
    got = {(r["event_id"], r["segment"]) for r in got_df.collect()}
    assert got == expected and len(got) > 0


def test_stream_winnow_dedup_cross_batch_pairs_and_store(spark, tmp_path):
    """Streaming winnowing overlap: batch 2 pairs against batch 1 through
    the persisted fingerprint store (batch 1's text never re-winnowed),
    the store accumulates rows per batch, and a (k, w) restart mismatch
    raises via the sidecar."""
    import pytest

    from etl_data_transformer_spark.streaming.pipeline import stream_winnow_dedup

    src = str(tmp_path / "src_w")
    store = str(tmp_path / "store_w")
    pairs = str(tmp_path / "pairs_w")
    ckpt = str(tmp_path / "ckpt_w")
    schema = "doc_id long, text string"
    shared = "an unmistakably distinctive shared passage for winnowing"

    def drain(k=8, w=4):
        stream = spark.readStream.schema(schema).parquet(src)
        stream_winnow_dedup(stream, store, pairs, ckpt, k=k, w=w, min_shared=1)

    spark.createDataFrame(
        [
            (1, "first doc: " + shared + " plus its own tail"),
            (2, "completely unrelated content with no overlap whatsoever"),
        ],
        schema,
    ).write.mode("overwrite").parquet(src)
    drain()
    assert spark.read.parquet(store).select("doc_id").distinct().count() == 2

    spark.createDataFrame(
        [(6, "second batch reuses " + shared + " inside new framing")], schema
    ).write.mode("append").parquet(src)
    drain()
    got = {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(pairs).select("id_a", "id_b").collect()
    }
    assert (1, 6) in got and not any(2 in p for p in got)
    assert spark.read.parquet(store).select("doc_id").distinct().count() == 3

    # restarting with different winnowing parameters must raise loudly
    spark.createDataFrame([(9, "more text arriving later")], schema).write.mode(
        "append"
    ).parquet(src)
    with pytest.raises(Exception, match="winnow store parameter mismatch"):
        drain(k=20, w=8)


def test_replayed_batch_rows_excluded_from_store_reads(spark, star):
    """Replay simulation: a store polluted with the current batch's own
    fingerprint rows (a crashed foreachBatch's partial write) must produce
    IDENTICAL pairs to a clean store — no double-counted shared counts, no
    containment > 1.0."""
    from etl_data_transformer_spark.operators import dedup as DD
    from etl_data_transformer_spark.streaming.pipeline import _drop_replayed_batch_rows

    d = star["documents"].filter(F.col("doc_id") < 160)
    old = d.filter(F.col("doc_id") < 100)
    batch = d.filter(F.col("doc_id") >= 100)
    clean_store = DD.winnow_store_rows(old, k=20, w=8)
    polluted = clean_store.unionByName(DD.winnow_store_rows(batch, k=20, w=8))
    healed = _drop_replayed_batch_rows(polluted, batch, "doc_id")
    want = {
        tuple(r)
        for r in DD.winnow_overlap_incremental(
            batch, clean_store, k=20, w=8, min_shared=1
        ).collect()
    }
    got = {
        tuple(r)
        for r in DD.winnow_overlap_incremental(
            batch, healed, k=20, w=8, min_shared=1
        ).collect()
    }
    assert got == want and len(got) > 0
    assert all(r[3] <= 1.0 for r in got)  # containment bounded
    # and WITHOUT the healing, the polluted store does inflate counts
    bad = DD.winnow_overlap_incremental(
        batch, polluted, k=20, w=8, min_shared=1
    ).collect()
    assert {tuple(r) for r in bad} != want


def test_stream_semantic_dedup_matches_incremental_batch(spark, tmp_path):
    """Streaming semantic dedup drains two micro-batches and its accumulated
    pairs equal the batch semantic_dedup_pairs over the combined corpus
    (every pair touches some batch, batches are processed in order); a
    batch-seeded list_id-partitioned store converts to the streaming layout
    and still pairs against the stream."""
    import random

    from etl_data_transformer_spark.operators import curation as C
    from etl_data_transformer_spark.operators.similarity import train_ivf_centroids
    from etl_data_transformer_spark.streaming.pipeline import stream_semantic_dedup

    rng = random.Random(3)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(40)]
    rows.append((100, list(rows[2][1])))   # batch-2 twin of batch-1's id 2
    rows.append((101, list(rows[30][1])))  # batch-2 twin of a batch-2 row
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = train_ivf_centroids(df.select(F.col("vec_id").alias("id"), "embedding"), n_lists=4)

    src = str(tmp_path / "src")
    store, pairs = str(tmp_path / "store"), str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ck")
    t = 0.5

    def drain():
        stream = spark.readStream.schema("vec_id long, embedding array<float>").parquet(src)
        stream_semantic_dedup(stream, store, pairs, ckpt, cents, threshold=t)

    b1 = df.filter(F.col("vec_id") < 25)
    b2 = df.filter(F.col("vec_id") >= 25)
    b1.write.mode("overwrite").parquet(src)
    drain()
    b2.write.mode("append").parquet(src)
    drain()

    expect = {
        (r["id_a"], r["id_b"])
        for r in C.semantic_dedup_pairs(df, cents, threshold=t).collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(pairs).select("id_a", "id_b").collect()
    }
    assert got == expect and (2, 100) in got and (30, 101) in got
    srows = spark.read.parquet(store)
    assert {"__batch_id", "list_id"} <= set(srows.columns)  # nested layout
    assert srows.select("id").distinct().count() == df.count()

    # replay-idempotence sanity: nothing new to drain -> outputs unchanged
    drain()
    assert {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(pairs).select("id_a", "id_b").collect()
    } == expect


def test_stream_semantic_dedup_converts_batch_seeded_store(spark, tmp_path):
    """A semantic store seeded by the BATCH writer (list_id-partitioned, no
    __batch_id) converts once to the streaming layout; pairs against the
    seeded vectors are found and the seed rows survive."""
    import random

    from etl_data_transformer_spark.operators import curation as C
    from etl_data_transformer_spark.operators.similarity import train_ivf_centroids
    from etl_data_transformer_spark.streaming.pipeline import stream_semantic_dedup

    rng = random.Random(5)
    base = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(20)]
    seed_df = spark.createDataFrame(base, "vec_id long, embedding array<float>")
    cents = train_ivf_centroids(
        seed_df.select(F.col("vec_id").alias("id"), "embedding"), n_lists=4
    )
    store = str(tmp_path / "store")
    C.write_semantic_store(C.semantic_store_rows(seed_df, cents), store, centroids=cents)
    assert "__batch_id" not in spark.read.parquet(store).columns

    src = str(tmp_path / "src")
    twin = spark.createDataFrame(
        [(100, list(base[4][1]))], "vec_id long, embedding array<float>"
    )
    twin.write.mode("overwrite").parquet(src)
    stream_semantic_dedup(
        spark.readStream.schema("vec_id long, embedding array<float>").parquet(src),
        store, str(tmp_path / "pairs"), str(tmp_path / "ck"), cents, threshold=0.95,
    )
    after = spark.read.parquet(store)
    assert {"__batch_id", "list_id"} <= set(after.columns)
    assert after.select("id").distinct().count() == 21  # seed + stream rows
    got = {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(str(tmp_path / "pairs")).select("id_a", "id_b").collect()
    }
    assert (4, 100) in got  # seed x stream twin found through the store


def test_semantic_store_streaming_layout_guards(spark, tmp_path):
    """Round-6 review: (a) a flat batch append onto a streaming-layout
    semantic store is rejected (it would corrupt partition discovery);
    (b) compacting a streaming store preserves the __batch_id/list_id
    nesting so the stream keeps working afterwards."""
    import random

    import pytest

    from etl_data_transformer_spark.operators import curation as C
    from etl_data_transformer_spark.operators.similarity import train_ivf_centroids
    from etl_data_transformer_spark.streaming.pipeline import stream_semantic_dedup

    rng = random.Random(9)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = train_ivf_centroids(df.select(F.col("vec_id").alias("id"), "embedding"), n_lists=4)
    src = str(tmp_path / "src")
    store, pairs = str(tmp_path / "store"), str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ck")

    df.filter(F.col("vec_id") < 10).write.mode("overwrite").parquet(src)
    stream_semantic_dedup(
        spark.readStream.schema("vec_id long, embedding array<float>").parquet(src),
        store, pairs, ckpt, cents, threshold=0.95,
    )
    assert "__batch_id" in spark.read.parquet(store).columns

    # (a) flat batch append refused
    extra = df.filter(F.col("vec_id") >= 10)
    with pytest.raises(ValueError, match="streaming .*layout|__batch_id"):
        C.write_semantic_store(C.semantic_store_rows(extra, cents), store, centroids=cents)

    # (b) compaction preserves the nested layout; the stream continues
    C.compact_semantic_store(
        spark, store, drop_ids=spark.createDataFrame([(0,)], ["vec_id"])
    )
    after = spark.read.parquet(store)
    assert {"__batch_id", "list_id"} <= set(after.columns)
    assert after.filter(F.col("id") == 0).count() == 0
    twin = spark.createDataFrame([(100, rows[4][1])], "vec_id long, embedding array<float>")
    twin.write.mode("append").parquet(src)
    stream_semantic_dedup(
        spark.readStream.schema("vec_id long, embedding array<float>").parquet(src),
        store, pairs, ckpt, cents, threshold=0.95,
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(pairs).select("id_a", "id_b").collect()
    }
    assert (4, 100) in got  # post-compaction stream still pairs vs the store


def test_stream_simhash_dedup_cross_batch_pairs_and_store(spark, tmp_path):
    """Streaming simhash near-dup: batch 2 pairs against batch 1 through the
    persisted raw-signature store (batch 1's text never re-hashed), the
    store accumulates (id, simhash64) rows per batch, and a replayed drain
    with no new data is a no-op."""
    from etl_data_transformer_spark.streaming.pipeline import stream_simhash_dedup

    src = str(tmp_path / "src_sh")
    store = str(tmp_path / "store_sh")
    pairs = str(tmp_path / "pairs_sh")
    ckpt = str(tmp_path / "ckpt_sh")
    schema = "doc_id long, text string"
    base = "a sufficiently long and distinctive document body about turbines"

    def drain(max_hamming=8):
        stream = spark.readStream.schema(schema).parquet(src)
        stream_simhash_dedup(stream, store, pairs, ckpt, max_hamming=max_hamming)

    spark.createDataFrame(
        [
            (1, base),
            (2, "completely different content regarding maritime chronometers"),
        ],
        schema,
    ).write.mode("overwrite").parquet(src)
    drain()
    assert spark.read.parquet(store).select("doc_id").distinct().count() == 2

    spark.createDataFrame([(6, base + " extra")], schema).write.mode("append").parquet(src)
    drain()
    got = {
        (r["id_a"], r["id_b"])
        for r in spark.read.parquet(pairs).select("id_a", "id_b").collect()
    }
    assert (1, 6) in got and not any(2 in p for p in got)
    assert spark.read.parquet(store).select("doc_id").distinct().count() == 3

    # pairs match the batch-mode incremental operator over the same split
    from etl_data_transformer_spark.operators import dedup as DD

    b1 = spark.createDataFrame([(1, base), (2, "completely different content regarding maritime chronometers")], schema)
    b2 = spark.createDataFrame([(6, base + " extra")], schema)
    want = {
        (r["id_a"], r["id_b"])
        for r in DD.simhash_near_dups_incremental(
            b2, DD.simhash_store_rows(b1), max_hamming=8
        ).collect()
    }
    assert {p for p in got if 6 in p} == want

    # no-new-data drain leaves both sinks unchanged
    n_pairs = spark.read.parquet(pairs).count()
    drain()
    assert spark.read.parquet(pairs).count() == n_pairs


def test_stream_ingest_composed_tiers_exactly_once(spark, tmp_path):
    """Streaming composed ingest: batch 2's docs dedup against batch 1's
    landed corpus through the persisted stores (exact + minhash + simhash),
    the landed sink holds each survivor exactly once with ALL its columns,
    stores hold only survivors' rows, and audit rows land per batch."""
    from etl_data_transformer_spark.streaming.pipeline import stream_ingest

    src = str(tmp_path / "src")
    landed = str(tmp_path / "landed")
    ex, mh, sh = (str(tmp_path / p) for p in ("ex", "mh", "sh"))
    audit = str(tmp_path / "audit")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string, source string"

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        stream_ingest(
            stream,
            landed,
            ckpt,
            exact_store=ex,
            minhash_store=mh,
            simhash_store=sh,
            minhash_threshold=0.3,
            simhash_max_hamming=10,
            audit_path=audit,
        )

    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today", "web"),
            (2, "the quick brown fox jumps over the lazy dog today", "web"),   # exact dup
            (3, "completely different content about maritime chronometers", "books"),
        ],
        schema,
    ).write.mode("overwrite").parquet(src)
    drain()
    got1 = spark.read.parquet(landed)
    assert sorted(r["doc_id"] for r in got1.collect()) == [1, 3]
    assert set(got1.columns) >= {"doc_id", "text", "source"}  # metadata kept

    spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog today", "web"),      # exact dup of landed 1
            (11, "the quick brown fox jumps over the lazy dog yesterday", "web"),  # near dup of landed 1
            (12, "an entirely novel new document about fresh things", "web"),
        ],
        schema,
    ).write.mode("append").parquet(src)
    drain()
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(landed).collect()
    ) == [1, 3, 12]

    # stores hold exactly the landed survivors
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(ex).select("doc_id").collect()
    ) == [1, 3, 12]
    # one audit row per non-empty batch, counts matching
    rows = spark.read.parquet(audit).orderBy("ingest_ts").collect()
    assert [r["n_landed"] for r in rows] == [2, 1]
    assert rows[1]["n_batch"] == 3 and rows[1]["n_after_exact"] == 2

    # no-new-data drain changes nothing (exactly-once)
    drain()
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(landed).collect()
    ) == [1, 3, 12]


@pytest.mark.parametrize("rocksdb", [False, True])
def test_stream_ingest_e2e_under_both_state_store_providers(spark, tmp_path, rocksdb):
    """Round-6 verdict item 8: the composed streaming ingest runs end-to-end
    with the RocksDB state store ENABLED, not just conf-gated — two batches
    through all three tiers, landed corpus and stores identical to the
    default provider's result (the foreachBatch body is stateless, so the
    provider may only change memory behavior, never output)."""
    from etl_data_transformer_spark.streaming.pipeline import (
        _STATE_STORE_KEY,
        ROCKSDB_PROVIDER,
        stream_ingest,
        use_rocksdb_state_store,
    )

    src = str(tmp_path / "src")
    landed = str(tmp_path / "landed")
    ex, mh, sh = (str(tmp_path / p) for p in ("ex", "mh", "sh"))
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"

    old = spark.conf.get(_STATE_STORE_KEY, None)
    try:
        use_rocksdb_state_store(spark, enabled=rocksdb)
        if rocksdb:
            assert spark.conf.get(_STATE_STORE_KEY) == ROCKSDB_PROVIDER

        def drain():
            stream = spark.readStream.schema(schema).parquet(src)
            stream_ingest(
                stream,
                landed,
                ckpt,
                exact_store=ex,
                minhash_store=mh,
                simhash_store=sh,
                minhash_threshold=0.3,
                simhash_max_hamming=10,
            )

        spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog today"),
                (2, "the quick brown fox jumps over the lazy dog today"),  # exact dup
                (3, "completely different content about maritime chronometers"),
            ],
            schema,
        ).write.mode("overwrite").parquet(src)
        drain()
        spark.createDataFrame(
            [
                (10, "the quick brown fox jumps over the lazy dog yesterday"),  # near dup of 1
                (11, "an entirely novel new document about fresh things"),
            ],
            schema,
        ).write.mode("append").parquet(src)
        drain()

        # provider-independent output contract
        assert sorted(
            r["doc_id"] for r in spark.read.parquet(landed).collect()
        ) == [1, 3, 11]
        assert sorted(
            r["doc_id"] for r in spark.read.parquet(ex).select("doc_id").collect()
        ) == [1, 3, 11]
    finally:
        if old is None:
            spark.conf.unset(_STATE_STORE_KEY)
        else:
            spark.conf.set(_STATE_STORE_KEY, old)


def test_stream_incremental_upsert_key_moves_partition(spark, tmp_path):
    """A key whose cdc date moves to a NEW partition must not leave its
    stale row behind in the old one (round-7 review): the touched set
    includes every target partition holding a batch key, and a partition
    fully emptied by the replacement is dropped."""
    import datetime as dt
    import os

    from etl_data_transformer_spark.streaming.pipeline import stream_incremental_upsert

    schema = "k long, ts timestamp, v double"
    src = str(tmp_path / "mv_src")
    target = str(tmp_path / "mv_target")
    ckpt = str(tmp_path / "mv_ckpt")

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        stream_incremental_upsert(stream, target, ckpt, key_cols=["k"], cdc_column="ts")

    d1 = dt.datetime(2024, 1, 1, 10)
    d2 = dt.datetime(2024, 1, 2, 10)
    spark.createDataFrame([(1, d1, 1.0), (2, d1, 2.0)], schema).write.mode("overwrite").parquet(src)
    drain()
    # k=2 moves to d2; k=1 stays put untouched
    spark.createDataFrame([(2, d2, 22.0)], schema).write.mode("append").parquet(src)
    drain()
    got = {(r["k"], r["v"], r["cdc_date"].isoformat()) for r in spark.read.parquet(target).collect()}
    assert got == {(1, 1.0, "2024-01-01"), (2, 22.0, "2024-01-02")}
    # now move k=1 too: the 2024-01-01 partition empties entirely and must
    # be dropped, not survive as a stale dir
    spark.createDataFrame([(1, d2, 11.0)], schema).write.mode("append").parquet(src)
    drain()
    got = {(r["k"], r["v"]) for r in spark.read.parquet(target).collect()}
    assert got == {(1, 11.0), (2, 22.0)}
    assert not os.path.isdir(os.path.join(target, "cdc_date=2024-01-01"))


def test_stream_incremental_upsert_null_partition_rows_survive(spark, tmp_path):
    """Existing NULL-cdc-date rows live in the null partition; a later batch
    touching that partition must carry the unreplaced ones through the
    dynamic overwrite instead of silently dropping them (round-7 review:
    isin() never matches NULL)."""
    import datetime as dt

    from etl_data_transformer_spark.streaming.pipeline import stream_incremental_upsert

    schema = "k long, ts timestamp, v double"
    src = str(tmp_path / "np_src")
    target = str(tmp_path / "np_target")
    ckpt = str(tmp_path / "np_ckpt")

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        stream_incremental_upsert(stream, target, ckpt, key_cols=["k"], cdc_column="ts")

    spark.createDataFrame([(1, None, 1.0), (2, None, 2.0)], schema).write.mode(
        "overwrite"
    ).parquet(src)
    drain()
    # batch with a NULL-ts row for a different key: rewrites the null
    # partition; k=1 must survive, k=2 is replaced
    spark.createDataFrame([(2, None, 22.0)], schema).write.mode("append").parquet(src)
    drain()
    got = {(r["k"], r["v"]) for r in spark.read.parquet(target).collect()}
    assert got == {(1, 1.0), (2, 22.0)}
    # and a dated batch must not disturb the null partition at all
    spark.createDataFrame([(3, dt.datetime(2024, 1, 5), 3.0)], schema).write.mode(
        "append"
    ).parquet(src)
    drain()
    got = {(r["k"], r["v"]) for r in spark.read.parquet(target).collect()}
    assert got == {(1, 1.0), (2, 22.0), (3, 3.0)}


def test_stream_sessionize_custom_key_column(spark, tmp_path):
    """The output schema follows key_col's name and type (round-7 review:
    the hardcoded 'user_id long' schema crashed string keys mid-query)."""
    import datetime as dt

    from etl_data_transformer_spark.streaming.pipeline import run_available_now, stream_sessionize

    schema = "event_id long, ts timestamp, device string, event_type string, value double"
    src = str(tmp_path / "sk_src")
    base = dt.datetime(2024, 3, 1, 12)
    rows = [
        (1, base, "a", "x", 1.0),
        (2, base + dt.timedelta(minutes=5), "a", "x", 2.0),
        # > gap later: closes the first session for device 'a'
        (3, base + dt.timedelta(hours=3), "a", "x", 4.0),
        (4, base + dt.timedelta(minutes=1), "b", "x", 8.0),
    ]
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out = run_available_now(
        stream_sessionize(stream, gap_minutes=30, key_col="device"),
        str(tmp_path / "sk_ckpt"),
        "sk_q",
    )
    assert "device" in out.columns and "user_id" not in out.columns
    closed = {(r["device"], r["n_events"], r["sum_value"]) for r in out.collect()}
    # only device a's first session closed within the drained data
    assert closed == {("a", 2, 3.0)}


def test_stream_near_dedup_heals_interrupted_store_swap(spark, tmp_path):
    """A hard crash between atomic_swap_write's two renames leaves the store
    path missing with a .backup sibling; the next micro-batch must RESTORE
    it before probing (round-7 review) — not take the first-batch path,
    miss every cross-batch pair, and strand the prior corpus's signatures
    in the backup dir."""
    import datetime as dt
    import os

    from etl_data_transformer_spark.streaming.pipeline import stream_near_dedup

    schema = "doc_id long, text string, ts timestamp"
    src = str(tmp_path / "heal_src")
    store = str(tmp_path / "heal_store")
    pairs = str(tmp_path / "heal_pairs")
    ckpt = str(tmp_path / "heal_ckpt")
    t0 = dt.datetime(2024, 2, 1)

    def drain():
        stream_near_dedup(
            spark.readStream.schema(schema).parquet(src), store, pairs, ckpt
        )

    spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog", t0)], schema
    ).write.mode("overwrite").parquet(src)
    drain()
    assert os.path.isdir(store)
    # simulate the crash window: target renamed away, backup left behind
    backup = os.path.join(
        os.path.dirname(store), f".backup-{os.path.basename(store)}-crashwindow"
    )
    os.rename(store, backup)
    assert not os.path.exists(store)
    # a duplicate of doc 1 arrives; without the heal the store probe
    # returns None, the batch takes the first-batch path, and the (1, 2)
    # cross-batch pair is silently lost
    spark.createDataFrame(
        [(2, "the quick brown fox jumps over the lazy dog", t0)], schema
    ).write.mode("append").parquet(src)
    drain()
    got = {(r["id_a"], r["id_b"]) for r in spark.read.parquet(pairs).collect()}
    assert (1, 2) in got


def test_stream_scd2_apply_matches_full_rebuild(spark, tmp_path):
    """Streaming SCD2 maintenance: two drained batches of a time-ordered CDC
    feed leave the dimension EQUAL to scd2_history over the full feed;
    a no-new-data drain changes nothing; a FRESH checkpoint against the
    maintained dimension (re-delivering the whole source) rejects loudly —
    checkpoint and sink state belong together."""
    import datetime as dt

    from etl_data_transformer_spark.operators.temporal import scd2_history
    from etl_data_transformer_spark.streaming.pipeline import stream_scd2_apply

    src = str(tmp_path / "scd2_src")
    dim = str(tmp_path / "scd2_dim")
    ckpt = str(tmp_path / "scd2_ckpt")
    schema = "user_id long, state string, ts timestamp, eid long"

    def drain(cp=ckpt):
        stream = spark.readStream.schema(schema).parquet(src)
        stream_scd2_apply(
            stream, dim, cp, ["user_id"], ["state"], "ts", ("eid",)
        )

    t = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    f1 = [(1, "A", t, 1), (1, "A", t + h, 2), (2, "X", t, 3)]
    f2 = [
        (1, "B", t + 3 * h, 4),   # change -> v2
        (1, "B", t + 4 * h, 5),   # merge
        (2, "X", t + 3 * h, 6),   # same state: open interval continues
        (9, "N", t + 3 * h, 7),   # unseen key
    ]
    spark.createDataFrame(f1, schema).write.mode("append").parquet(src)
    drain()
    spark.createDataFrame(f2, schema).write.mode("append").parquet(src)
    drain()

    def rows(df):
        return sorted(
            (r.user_id, repr(r.state), repr(r.valid_from), repr(r.valid_to),
             r.version, r.is_current)
            for r in df.collect()
        )

    want = scd2_history(
        spark.createDataFrame(f1 + f2, schema), ["user_id"], ["state"], "ts", ("eid",)
    )
    got = spark.read.parquet(dim).drop("__scd2_ns", "__scd2_batch_id")
    assert rows(got) == rows(want)

    # no-new-data drain: dimension byte-stable
    before = rows(spark.read.parquet(dim).drop("__scd2_ns", "__scd2_batch_id"))
    drain()
    assert rows(spark.read.parquet(dim).drop("__scd2_ns", "__scd2_batch_id")) == before

    # fresh checkpoint re-delivers EVERYTHING; the earliest observations now
    # predate the dimension's current versions, and the apply-side validator
    # rejects the batch instead of silently rewriting history — pair a fresh
    # checkpoint with a fresh dim_path
    import pytest
    from pyspark.errors import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="predate"):
        drain(cp=str(tmp_path / "scd2_ckpt2"))
    assert rows(spark.read.parquet(dim).drop("__scd2_ns", "__scd2_batch_id")) == before


def test_stream_passage_dedup_two_batches(spark, tmp_path):
    """Streaming passage dedup: batch 2's doc repeating batch 1's landed
    passage is cleaned through the count store; batch-internal repeats
    clean within their batch; unique prose survives; counts accumulate;
    a no-new-data drain changes nothing."""
    from etl_data_transformer_spark.operators import curation as C
    from etl_data_transformer_spark.streaming.pipeline import stream_passage_dedup

    src = str(tmp_path / "pd_src")
    store = str(tmp_path / "pd_store")
    cleaned = str(tmp_path / "pd_clean")
    ckpt = str(tmp_path / "pd_ckpt")
    schema = "doc_id long, text string"

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        stream_passage_dedup(stream, store, cleaned, ckpt, window=3)

    boiler = "alpha beta gamma"
    b1 = [
        (1, f"one {boiler} tail"),
        (2, f"two {boiler} more"),   # shares the window with doc 1 in-batch
        (3, "unique first batch text"),
    ]
    spark.createDataFrame(b1, schema).write.mode("append").parquet(src)
    drain()
    got1 = {r.doc_id: r for r in spark.read.parquet(cleaned).collect()}
    assert got1[1].clean_text == "one tail" and got1[2].clean_text == "two more"
    assert got1[3].n_removed == 0

    b2 = [
        (10, f"ten {boiler} closing"),          # repeats LANDED passage -> store hit
        (11, "genuinely novel second batch words"),
    ]
    spark.createDataFrame(b2, schema).write.mode("append").parquet(src)
    drain()
    got2 = {r.doc_id: r for r in spark.read.parquet(cleaned).collect()}
    assert got2[10].clean_text == "ten closing" and got2[10].n_removed == 3
    assert got2[11].n_removed == 0
    # equals the batch-mode incremental over the same split
    inc = {
        r.doc_id: r.clean_text
        for r in C.dedup_passages_incremental(
            spark.createDataFrame(b2, schema),
            C.passage_count_store(spark.createDataFrame(b1, schema), window=3),
            window=3,
        ).collect()
    }
    assert {k: got2[k].clean_text for k in (10, 11)} == inc
    # counts accumulated across both batches: the boiler window holds 3
    counts = {r.h: r.c for r in spark.read.parquet(store).groupBy("h").sum("c")
              .withColumnRenamed("sum(c)", "c").collect()}
    assert max(counts.values()) == 3
    # no-new-data drain: sinks unchanged
    n_clean = spark.read.parquet(cleaned).count()
    drain()
    assert spark.read.parquet(cleaned).count() == n_clean


def test_stream_ingest_passage_tier_cross_batch_mask(spark, tmp_path):
    """Round-9: the streaming composed ingest's passage-REWRITE tier —
    batch-1 survivors land with in-batch duplicated passages masked;
    a batch-2 document repeating a batch-1 passage ONCE is masked purely
    via the persisted count store; audit rows carry masked-token counts;
    a no-new-data drain changes nothing."""
    from etl_data_transformer_spark.streaming.pipeline import stream_ingest

    src = str(tmp_path / "src")
    landed = str(tmp_path / "landed")
    ex, pg = str(tmp_path / "ex"), str(tmp_path / "pg")
    audit = str(tmp_path / "audit")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        stream_ingest(
            stream,
            landed,
            ckpt,
            exact_store=ex,
            audit_path=audit,
            passage_store=pg,
            passage_window=3,
        )

    spark.createDataFrame(
        [
            (1, "alpha beta gamma delta unique one tail"),
            (2, "prefix alpha beta gamma delta other two"),
            (3, "totally fresh content nothing repeated here"),
        ],
        schema,
    ).write.mode("overwrite").parquet(src)
    drain()
    got1 = {r["doc_id"]: r["text"] for r in spark.read.parquet(landed).collect()}
    assert got1[1] == "unique one tail"
    assert got1[2] == "prefix other two"
    assert got1[3] == "totally fresh content nothing repeated here"

    spark.createDataFrame(
        [
            (10, "intro alpha beta gamma delta closing words"),
            (11, "clean batch two document with fresh text"),
        ],
        schema,
    ).write.mode("append").parquet(src)
    drain()
    got2 = {r["doc_id"]: r["text"] for r in spark.read.parquet(landed).collect()}
    # the cross-batch mask: doc 10's passage occurs once in batch 2 — only
    # the store's counts (batch 1's original text) push it over min_count
    assert got2[10] == "intro closing words"
    assert got2[11] == "clean batch two document with fresh text"

    rows = spark.read.parquet(audit).orderBy("ingest_ts").collect()
    assert [r["passage_tokens_removed"] for r in rows] == [8, 4]
    assert [r["passage_docs_touched"] for r in rows] == [2, 1]

    # count store: one partition per batch, counts summed over partitions
    store = spark.read.parquet(pg)
    assert store.select("__batch_id").distinct().count() == 2
    totals = {r["h"]: r["c"] for r in store.groupBy("h").agg(F.sum("c").alias("c")).collect()}

    # no-new-data drain is a no-op everywhere
    drain()
    assert {r["doc_id"]: r["text"] for r in spark.read.parquet(landed).collect()} == got2
    assert {
        r["h"]: r["c"]
        for r in spark.read.parquet(pg).groupBy("h").agg(F.sum("c").alias("c")).collect()
    } == totals


def test_stream_ingest_rejects_schema_drifted_audit(spark, tmp_path):
    """Round-9 review: a streaming audit store whose column set drifted
    (pre-upgrade rows without the passage columns) must fail the batch
    loudly instead of appending wider rows that schema inference then
    nondeterministically drops."""
    from etl_data_transformer_spark.plans.ingest import IngestReport, ingest_audit_row
    from etl_data_transformer_spark.streaming.pipeline import stream_ingest

    src = str(tmp_path / "src")
    audit = str(tmp_path / "audit")
    # simulate a pre-round-9 streaming audit store: partitioned layout,
    # narrower column set
    ingest_audit_row(spark, IngestReport(1, 1, None, None, 1, None, None)).drop(
        "passage_tokens_removed", "passage_docs_touched"
    ).withColumn("__batch_id", F.lit("old-000000")).write.partitionBy(
        "__batch_id"
    ).parquet(audit)
    spark.createDataFrame([(1, "text one")], "doc_id long, text string").write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    with pytest.raises(Exception, match="columns"):
        stream_ingest(
            stream,
            str(tmp_path / "landed"),
            str(tmp_path / "ckpt"),
            exact_store=str(tmp_path / "ex"),
            audit_path=audit,
        )


def test_stream_ingest_decon_combined_mask(spark, tmp_path):
    """Round-9: decon_store in the STREAMING composed ingest — eval windows
    mask unconditionally in the same rewrite as the count-store dedup, the
    read-only eval store survives drains untouched, and a replayed
    no-new-data drain is a no-op."""
    from etl_data_transformer_spark.operators.curation import (
        passage_count_store,
        write_passage_store,
    )
    from etl_data_transformer_spark.streaming.pipeline import stream_ingest

    src = str(tmp_path / "src")
    landed = str(tmp_path / "landed")
    ex, pg, ev = str(tmp_path / "ex"), str(tmp_path / "pg"), str(tmp_path / "ev")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"

    ev_df = spark.createDataFrame([(0, "secret eval passage xyz")], schema)
    write_passage_store(
        passage_count_store(ev_df, window=3), ev, window=3, mode="overwrite"
    )
    ev_rows = spark.read.parquet(ev).count()

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        stream_ingest(
            stream,
            landed,
            ckpt,
            exact_store=ex,
            passage_store=pg,
            passage_window=3,
            decon_store=ev,
        )

    spark.createDataFrame(
        [
            (1, "alpha beta gamma delta unique one tail"),
            (2, "prefix alpha beta gamma delta other two"),
            (3, "intro secret eval passage xyz end"),
        ],
        schema,
    ).write.mode("overwrite").parquet(src)
    drain()
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(landed).collect()}
    assert got[1] == "unique one tail"  # >= min_count dedup mask
    assert got[2] == "prefix other two"
    assert got[3] == "intro end"  # single-occurrence eval mask

    # cross-batch count mass still accumulates alongside the decon mask
    spark.createDataFrame(
        [(10, "intro alpha beta gamma delta closing words")], schema
    ).write.mode("append").parquet(src)
    drain()
    got2 = {r["doc_id"]: r["text"] for r in spark.read.parquet(landed).collect()}
    assert got2[10] == "intro closing words"

    # the eval store is read-only: exactly the seeded rows after two drains
    assert spark.read.parquet(ev).count() == ev_rows
    drain()  # no-new-data drain: nothing changes
    assert {r["doc_id"]: r["text"] for r in spark.read.parquet(landed).collect()} == got2


def test_stream_nb_counts_equals_batch_retrain(spark, tmp_path):
    """Round-9 streaming NB maintenance: two drained micro-batches of
    labeled docs land per-__batch_id count partitions; the model derived
    from the store equals a full nb_train over everything streamed; a
    no-new-data drain changes nothing."""
    from etl_data_transformer_spark.functions import text as TX
    from etl_data_transformer_spark.streaming.pipeline import stream_nb_counts

    src, store, ckpt = (str(tmp_path / p) for p in ("src", "nb", "ckpt"))
    schema = "doc_id long, text string, label int"

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        stream_nb_counts(stream, store, ckpt, label_col="label")

    b1 = [(1, "good clean prose flows nicely", 1), (2, "spam spam buy now click", 0)]
    b2 = [(3, "good well written text here", 1), (4, "click buy spam junk junk", 0)]
    spark.createDataFrame(b1, schema).write.mode("overwrite").parquet(src)
    drain()
    spark.createDataFrame(b2, schema).write.mode("append").parquet(src)
    drain()

    def model_key(m):
        return (
            {r["t"]: r["w_micros"] for r in m.weights.collect()},
            m.bias_micros,
            m.default_micros,
        )

    full = TX.nb_train(
        spark.createDataFrame(b1 + b2, schema), "label"
    )
    got = TX.nb_model_from_counts(TX.read_nb_store(spark, store))
    assert model_key(got) == model_key(full)

    rows_before = spark.read.parquet(store).count()
    drain()  # no-new-data: no-op
    assert spark.read.parquet(store).count() == rows_before
    # streaming layout refuses compaction while partitions are live
    import pytest

    with pytest.raises(ValueError, match="streaming"):
        TX.compact_nb_store(spark, store)


def test_stream_passage_dedup_with_decon_store(spark, tmp_path):
    """Round-9: the standalone streaming passage-dedup twin accepts the
    same decon_store hook as the composed runners — a single-occurrence
    eval passage masks alongside the >= min_count count mask, in one
    rewrite per batch."""
    from etl_data_transformer_spark.operators.curation import (
        passage_count_store,
        write_passage_store,
    )
    from etl_data_transformer_spark.streaming.pipeline import stream_passage_dedup

    src, store, cleaned, ckpt, ev = (
        str(tmp_path / p) for p in ("src", "pg", "cleaned", "ckpt", "ev")
    )
    schema = "doc_id long, text string"
    ev_df = spark.createDataFrame([(0, "secret eval passage xyz")], schema)
    write_passage_store(
        passage_count_store(ev_df, window=3), ev, window=3, mode="overwrite"
    )

    spark.createDataFrame(
        [
            (1, "alpha beta gamma delta unique one tail"),
            (2, "prefix alpha beta gamma delta other two"),
            (3, "intro secret eval passage xyz end"),
        ],
        schema,
    ).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    stream_passage_dedup(stream, store, cleaned, ckpt, window=3, decon_store=ev)
    got = {r["doc_id"]: r["clean_text"] for r in spark.read.parquet(cleaned).collect()}
    assert got[1] == "unique one tail"  # in-batch >= min_count mask
    assert got[2] == "prefix other two"
    assert got[3] == "intro end"  # single-occurrence eval mask


def test_stream_ingest_quality_gate(spark, tmp_path):
    """Round-9: the NB quality gate in the STREAMING composed ingest —
    below-threshold docs never land, the audit partition carries
    n_quality_dropped with the raw batch size, and a no-new-data drain
    is a no-op."""
    from etl_data_transformer_spark.functions import text as TX
    from etl_data_transformer_spark.streaming.pipeline import stream_ingest

    src, landed, ex, nb, audit, ckpt = (
        str(tmp_path / p) for p in ("src", "landed", "ex", "nb", "audit", "ckpt")
    )
    train = spark.createDataFrame(
        [
            (1, "good clean prose flows nicely", 1),
            (2, "good well written text here", 1),
            (3, "spam spam buy now click", 0),
            (4, "click buy spam junk junk", 0),
        ],
        "doc_id long, text string, label int",
    )
    TX.write_nb_store(TX.nb_count_rows(train, "label"), nb, mode="overwrite")

    schema = "doc_id long, text string"

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        stream_ingest(
            stream,
            landed,
            ckpt,
            exact_store=ex,
            audit_path=audit,
            nb_store=nb,
            nb_threshold_micros=0,
        )

    spark.createDataFrame(
        [(1, "good prose written nicely"), (2, "buy spam click junk")], schema
    ).write.mode("overwrite").parquet(src)
    drain()
    assert [r["doc_id"] for r in spark.read.parquet(landed).collect()] == [1]
    rows = spark.read.parquet(audit).collect()
    assert [(r["n_batch"], r["n_quality_dropped"], r["n_landed"]) for r in rows] == [
        (2, 1, 1)
    ]
    drain()  # no-new-data: nothing changes
    assert spark.read.parquet(landed).count() == 1


def test_stream_nb_counts_multiclass(spark, tmp_path):
    """Round-9: the streaming NB maintainer's multiclass mode — the
    derived model equals a full multiclass retrain over everything
    streamed."""
    from etl_data_transformer_spark.functions import text as TX
    from etl_data_transformer_spark.streaming.pipeline import stream_nb_counts

    src, store, ckpt = (str(tmp_path / p) for p in ("src", "nbm", "ckpt"))
    schema = "doc_id long, text string, lang string"

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        stream_nb_counts(stream, store, ckpt, label_col="lang", multiclass=True)

    b1 = [(1, "le chat noir dort bien", "fr"), (3, "the black cat sleeps well", "en")]
    b2 = [(2, "le chien noir mange bien", "fr"), (4, "the black dog eats well", "en")]
    spark.createDataFrame(b1, schema).write.mode("overwrite").parquet(src)
    drain()
    spark.createDataFrame(b2, schema).write.mode("append").parquet(src)
    drain()

    full = TX.nb_train_multiclass(spark.createDataFrame(b1 + b2, schema), "lang")
    got = TX.nb_multi_model_from_counts(TX.read_nb_multi_store(spark, store))
    assert {
        (r["label"], r["t"]): r["lp_micros"] for r in got.weights.collect()
    } == {(r["label"], r["t"]): r["lp_micros"] for r in full.weights.collect()}
    assert {
        r["label"]: (r["prior_micros"], r["default_micros"])
        for r in got.labels.collect()
    } == {
        r["label"]: (r["prior_micros"], r["default_micros"])
        for r in full.labels.collect()
    }

    # the live streaming layout refuses compaction (round-9 review: the
    # binary guard was pinned, the multiclass one was not)
    import pytest

    with pytest.raises(ValueError, match="streaming"):
        TX.compact_nb_multi_store(spark, store)


def test_stream_hopping_equals_batch(spark, tmp_path):
    """Round-9 §2.9: the hopping twin — stream_tumbling_agg(slide=...) over
    a drained stream equals operators/window_ops.hopping_agg on the same
    data."""
    from etl_data_transformer_spark.operators.window_ops import hopping_agg
    from etl_data_transformer_spark.streaming.pipeline import stream_tumbling_agg

    src = _events_dir(spark, tmp_path)
    batch_df = spark.read.parquet(src)
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in hopping_agg(batch_df, slide="30 minutes", group_extra=["event_type"]).collect()
    }
    stream = read_event_stream(spark, src)
    agg = stream_tumbling_agg(stream, group_extra=["event_type"], slide="30 minutes")
    got_df = run_available_now(
        agg, str(tmp_path / "ckpt"), "stream_hop_eq_batch", output_mode="complete"
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in got_df.collect()
    }
    assert got == expected
    # overlap factor 2: total hopping event-slots = 2x the row count
    assert sum(n for n, _ in got.values()) == 2 * batch_df.count()


def test_stream_ingest_all_tiers_composed(spark, tmp_path):
    """Full composition pin for the STREAMING runner (the batch/txn twin
    lives in test_ingest.py): NB gate + exact + MinHash + passage rewrite
    + eval decon in one drain — gated docs contribute no window mass, the
    near-dup loser drops, survivors land with both masks, and the landed
    corpus matches the batch runner's on the same data."""
    from etl_data_transformer_spark.functions import text as TX
    from etl_data_transformer_spark.operators.curation import (
        passage_count_store,
        write_passage_store,
    )
    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest
    from etl_data_transformer_spark.streaming.pipeline import stream_ingest

    paths = {p: str(tmp_path / p) for p in (
        "src", "landed", "ex", "mh", "pg", "ev", "nb", "audit", "ckpt",
        "b_ex", "b_mh", "b_pg", "b_landed",
    )}
    train = spark.createDataFrame(
        [
            (1, "good clean prose flows nicely", 1),
            (2, "good well written text here", 1),
            (3, "spam spam buy now click", 0),
            (4, "click buy spam junk junk", 0),
        ],
        "doc_id long, text string, label int",
    )
    TX.write_nb_store(TX.nb_count_rows(train, "label"), paths["nb"], mode="overwrite")
    ev_df = spark.createDataFrame([(0, "secret eval passage xyz")], "doc_id long, text string")
    write_passage_store(passage_count_store(ev_df, window=3), paths["ev"], window=3, mode="overwrite")

    b = spark.createDataFrame(
        [
            (1, "good alpha beta gamma delta unique one tail"),
            (2, "good prefix alpha beta gamma delta other two"),
            (3, "good alpha beta gamma delta unique one tail yesterday"),
            (4, "good intro secret eval passage xyz end"),
            (5, "spam junk alpha beta gamma delta click buy"),
        ],
        "doc_id long, text string",
    )
    b.write.mode("overwrite").parquet(paths["src"])
    kw_common = dict(
        minhash_threshold=0.3,
        shingle_n=2,
        passage_window=3,
        decon_store=paths["ev"],
        nb_store=paths["nb"],
        nb_threshold_micros=0,
    )
    stream = spark.readStream.schema("doc_id long, text string").parquet(paths["src"])
    stream_ingest(
        stream,
        paths["landed"],
        paths["ckpt"],
        exact_store=paths["ex"],
        minhash_store=paths["mh"],
        passage_store=paths["pg"],
        audit_path=paths["audit"],
        **kw_common,
    )
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(paths["landed"]).collect()}
    assert got == {
        1: "good unique one tail",
        2: "good prefix other two",
        4: "good intro end",
    }
    audit = spark.read.parquet(paths["audit"]).collect()
    assert [(r["n_batch"], r["n_quality_dropped"], r["n_landed"]) for r in audit] == [
        (5, 1, 3)
    ]
    # batch-runner parity on identical inputs
    run_incremental_ingest(
        b,
        exact_store=paths["b_ex"],
        minhash_store=paths["b_mh"],
        passage_store=paths["b_pg"],
        survivors_path=paths["b_landed"],
        **kw_common,
    )
    assert {
        r["doc_id"]: r["text"] for r in spark.read.parquet(paths["b_landed"]).collect()
    } == got


def test_stream_ingest_entropy_gate(spark, tmp_path):
    """Round-9: the char-entropy pre-gate in the STREAMING composed ingest
    — spam drops before the NB gate with both counts audited per batch,
    identically to the batch runners."""
    from etl_data_transformer_spark.functions import text as TX
    from etl_data_transformer_spark.streaming.pipeline import stream_ingest

    src, landed, ex, nb, audit, ckpt = (
        str(tmp_path / p) for p in ("src", "landed", "ex", "nb", "audit", "ckpt")
    )
    train = spark.createDataFrame(
        [
            (1, "good clean prose flows nicely", 1),
            (2, "good well written text here", 1),
            (3, "spam spam buy now click", 0),
            (4, "click buy spam junk junk", 0),
        ],
        "doc_id long, text string, label int",
    )
    TX.write_nb_store(TX.nb_count_rows(train, "label"), nb, mode="overwrite")

    schema = "doc_id long, text string"
    spark.createDataFrame(
        [
            (1, "good prose written nicely"),
            (2, "cccccccccccccccccccc"),  # entropy floor
            (3, "buy spam click junk"),  # NB gate, from the gated base
        ],
        schema,
    ).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    stream_ingest(
        stream,
        landed,
        ckpt,
        exact_store=ex,
        audit_path=audit,
        nb_store=nb,
        nb_threshold_micros=0,
        min_entropy_microbits=500_000,
    )
    assert [r["doc_id"] for r in spark.read.parquet(landed).collect()] == [1]
    rows = spark.read.parquet(audit).collect()
    assert [
        (r["n_batch"], r["n_entropy_dropped"], r["n_quality_dropped"], r["n_landed"])
        for r in rows
    ] == [(3, 1, 1, 1)]


def test_stream_stats_rows_equals_batch_profile_and_live_alpha(spark, tmp_path):
    """Round-12 streaming twin of the dataset-card stats store: two
    drained micro-batches land per-__batch_id partial rows; the merged
    profile equals corpus_stats over everything streamed; a replayed
    drain changes nothing; and the mixture α-weights derive live from
    the growing profile."""
    from etl_data_transformer_spark.operators.curation import (
        temperature_weights,
        temperature_weights_from_stats,
    )
    from etl_data_transformer_spark.plans.quality import (
        corpus_stats,
        read_corpus_stats,
    )
    from etl_data_transformer_spark.streaming.pipeline import stream_stats_rows

    src, store, ckpt = (str(tmp_path / p) for p in ("src", "stats", "ckpt"))
    schema = "doc_id long, lang string, source string, text string"

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        stream_stats_rows(stream, store, ckpt)

    b1 = [
        (1, "en", "web", "one two three four"),
        (2, "en", "web", "five six"),
        (3, "de", "books", "sieben acht neun"),
    ]
    b2 = [
        (4, "en", "web", "more english words arrive here now"),
        (5, "de", "books", "zehn elf"),
        (6, "fr", "web", "un deux trois"),
    ]
    spark.createDataFrame(b1, schema).write.mode("overwrite").parquet(src)
    drain()
    mid = {
        (r.lang, r.source): (r.n_docs, r.tok_sum, r.max_tokens)
        for r in read_corpus_stats(spark, store).collect()
    }
    assert mid[("en", "web")] == (2, 6, 4)

    spark.createDataFrame(b2, schema).write.mode("append").parquet(src)
    drain()

    def key(df):
        return sorted(map(tuple, df.collect()))

    full = corpus_stats(spark.createDataFrame(b1 + b2, schema))
    assert key(read_corpus_stats(spark, store)) == key(full)

    # replay drain: no new data, nothing changes
    rows_before = spark.read.parquet(store).count()
    drain()
    assert spark.read.parquet(store).count() == rows_before

    # α-weights derive LIVE from the merged store profile — identical to
    # weights over the batch-computed masses
    live = temperature_weights_from_stats(read_corpus_stats(spark, store))
    masses = {
        r["source"]: float(r["m"])
        for r in full.groupBy("source")
        .agg(F.sum("tok_sum").alias("m"))
        .collect()
    }
    assert live == temperature_weights(masses)
    assert abs(sum(live.values()) - 1.0) < 1e-9 and set(live) == {"web", "books"}


def test_stream_url_keeper_parity_with_batch_and_replay(spark, tmp_path):
    """Round-12 streaming twin of the URL keeper tier: two drained
    micro-batches classify exactly like the batch url_keeper_ingest
    sequence (merged keeper view, landed new docs, CDC update rows), and
    a replayed drain changes nothing."""
    from etl_data_transformer_spark.operators.domains import (
        url_keeper_ingest,
        url_keeper_merge,
    )
    from etl_data_transformer_spark.streaming.pipeline import stream_url_keeper

    src, store, landed, updates, ckpt = (
        str(tmp_path / p) for p in ("src", "keeper", "landed", "updates", "ckpt")
    )
    schema = "doc_id long, url string, text string"

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        stream_url_keeper(
            stream, store, ckpt, survivors_path=landed, updates_path=updates
        )

    b1 = [
        (1, "https://a.example.com/p1", "original content one here"),
        (2, "https://a.example.com/p2?utm_source=x", "original content two here"),
    ]
    b2 = [
        (10, "https://a.example.com/p1?fbclid=z", "original content one here"),
        (11, "https://a.example.com/p2", "revised content two entirely"),
        (12, "https://a.example.com/p3", "a brand new page altogether"),
    ]
    spark.createDataFrame(b1, schema).write.mode("overwrite").parquet(src)
    drain()
    spark.createDataFrame(b2, schema).write.mode("append").parquet(src)
    drain()

    # batch control: the same two batches through url_keeper_ingest
    bstore = str(tmp_path / "keeper_batch")
    new1, _, _ = url_keeper_ingest(spark.createDataFrame(b1, schema), bstore)
    new2, upd2, _ = url_keeper_ingest(spark.createDataFrame(b2, schema), bstore)

    def merged(path):
        return {
            (r.canonical_url, r.keeper_id, r.fp)
            for r in url_keeper_merge(
                spark.read.parquet(path).drop("__batch_id")
            ).collect()
        }

    assert merged(store) == merged(bstore)
    stream_landed = sorted(
        r.doc_id for r in spark.read.parquet(landed).collect()
    )
    assert stream_landed == sorted(
        r.doc_id for r in new1.unionByName(new2).collect()
    ) == [1, 2, 12]
    cdc = spark.read.parquet(updates).collect()
    assert [(r.keeper_id, r.doc_id, r.text) for r in cdc] == [
        (2, 11, "revised content two entirely")
    ]

    # replayed drain: no new data -> nothing changes anywhere
    counts = tuple(spark.read.parquet(p).count() for p in (store, landed, updates))
    drain()
    assert counts == tuple(
        spark.read.parquet(p).count() for p in (store, landed, updates)
    )


def test_stream_jaccard_dedup_twin_of_batch_incremental(spark, tmp_path):
    """Round-13 verdict item 3 (the last store without a streaming twin):
    streaming prefix-Jaccard pairs equal the batch-incremental operator's
    over the same batch split, the store accumulates __batch_id-
    partitioned gramsets/postings under a frozen census, a no-new-data
    drain is a no-op, and the drift telemetry records per batch."""
    import json
    import os

    from etl_data_transformer_spark.operators import dedup as DD
    from etl_data_transformer_spark.streaming.pipeline import stream_jaccard_dedup

    src = str(tmp_path / "src_jc")
    store = str(tmp_path / "store_jc")
    pairs = str(tmp_path / "pairs_jc")
    ckpt = str(tmp_path / "ckpt_jc")
    schema = "doc_id long, text string"
    b1_rows = [
        (1, "the quick brown fox jumps over the lazy dog in the morning"),
        (2, "an entirely different body of text about maritime chronometers"),
        (3, "the quick brown fox jumps over the lazy dog in the evening"),
    ]
    b2_rows = [
        (11, "the quick brown fox jumps over the lazy dog in the morning light"),
        (12, "unrelated third subject matter concerning alpine railway gauges"),
    ]

    def drain():
        stream = spark.readStream.schema(schema).parquet(src)
        stream_jaccard_dedup(stream, store, pairs, ckpt, threshold=0.5)

    spark.createDataFrame(b1_rows, schema).write.mode("overwrite").parquet(src)
    drain()
    assert "__batch_id" in spark.read.parquet(os.path.join(store, "postings")).columns
    assert "__batch_id" in spark.read.parquet(os.path.join(store, "gramsets")).columns
    census1 = {r.g: r.df for r in spark.read.parquet(os.path.join(store, "census")).collect()}

    spark.createDataFrame(b2_rows, schema).write.mode("append").parquet(src)
    drain()
    # census FROZEN: batch 2 never rewrites it
    assert {
        r.g: r.df for r in spark.read.parquet(os.path.join(store, "census")).collect()
    } == census1

    got = {
        (r.id_a, r.id_b, r.n_inter, r.n_a, r.n_b)
        for r in spark.read.parquet(pairs).collect()
    }

    # twin equivalence: batch-mode store build + incremental join over the
    # same split produces the identical exact pair rows
    bstore = str(tmp_path / "batch_store_jc")
    DD.write_jaccard_store(
        spark.createDataFrame(b1_rows, schema), bstore, threshold=0.5
    )
    want_b1 = {
        (r.id_a, r.id_b, r.n_inter, r.n_a, r.n_b)
        for r in DD.jaccard_join_prefix(
            spark.createDataFrame(b1_rows, schema), threshold=0.5
        ).collect()
    }
    want_b2 = {
        (r.id_a, r.id_b, r.n_inter, r.n_a, r.n_b)
        for r in DD.jaccard_join_incremental(
            spark.createDataFrame(b2_rows, schema), bstore, append=True
        ).collect()
    }
    assert got == want_b1 | want_b2
    assert (1, 3) in {(a, b) for a, b, *_ in got}  # in-batch pair
    assert (1, 11) in {(a, b) for a, b, *_ in got}  # cross-batch pair

    # drift telemetry: one entry per non-empty batch, baseline seeded
    mass = json.load(open(os.path.join(store, "_jaccard_mass.json")))
    assert len(mass["batches"]) == 2
    drift = DD.jaccard_store_drift(store)
    assert drift["last_cand_per_doc"] is not None

    # no-new-data drain: both sinks unchanged
    n_pairs = spark.read.parquet(pairs).count()
    n_postings = spark.read.parquet(os.path.join(store, "postings")).count()
    drain()
    assert spark.read.parquet(pairs).count() == n_pairs
    assert spark.read.parquet(os.path.join(store, "postings")).count() == n_postings

    # restart with mismatched parameters must raise, not join nothing
    spark.createDataFrame([(21, "one more row")], schema).write.mode("append").parquet(src)
    # surfaces wrapped by awaitTermination (StreamingQueryException)
    with pytest.raises(Exception, match="parameter mismatch"):
        stream_jaccard_dedup(
            spark.readStream.schema(schema).parquet(src),
            store, pairs, ckpt, threshold=0.9,
        )


def test_stream_jaccard_dedup_seeds_from_flat_corpus_store(spark, tmp_path):
    """A stream pointed at a write_jaccard_store corpus build converts the
    flat postings/gramsets to a seed partition on first contact (census
    and pruning-baseline reused) and pairs new docs against the seeded
    corpus without re-shingling it."""
    import os

    from etl_data_transformer_spark.operators import dedup as DD
    from etl_data_transformer_spark.streaming.pipeline import stream_jaccard_dedup

    schema = "doc_id long, text string"
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog in the morning"),
            (2, "an entirely different body of text about maritime chronometers"),
        ],
        schema,
    )
    store = str(tmp_path / "seeded_store")
    DD.write_jaccard_store(corpus, store, threshold=0.5)

    src = str(tmp_path / "src")
    pairs = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(11, "the quick brown fox jumps over the lazy dog in the morning light")],
        schema,
    ).write.mode("overwrite").parquet(src)
    stream_jaccard_dedup(
        spark.readStream.schema(schema).parquet(src),
        store, pairs, ckpt, threshold=0.5,
    )
    postings = spark.read.parquet(os.path.join(store, "postings"))
    assert "__batch_id" in postings.columns
    assert postings.filter(F.col("__batch_id") == "seed").count() > 0
    got = {(r.id_a, r.id_b) for r in spark.read.parquet(pairs).collect()}
    assert got == {(1, 11)}


def test_stream_ingest_url_keeper_tier(spark, tmp_path):
    """Round-13: the canonical-URL keeper tier reachable from the composed
    STREAMING runner — same-content re-crawls drop, changed-content
    re-crawls become CDC rows in their own sink with the stable
    keeper_id, new URLs land, tier-dropped docs keep their URL
    un-tracked, and the audit rows carry n_url_updates."""
    import os

    from etl_data_transformer_spark.operators.domains import url_keeper_merge
    from etl_data_transformer_spark.streaming.pipeline import stream_ingest

    src = str(tmp_path / "src")
    landed = str(tmp_path / "landed")
    ex = str(tmp_path / "ex")
    uk = str(tmp_path / "uk")
    upd = str(tmp_path / "upd")
    audit = str(tmp_path / "audit")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, url string, text string"

    def drain():
        stream_ingest(
            spark.readStream.schema(schema).parquet(src),
            landed,
            ckpt,
            exact_store=ex,
            url_col="url",
            url_keeper_store=uk,
            url_updates_path=upd,
            audit_path=audit,
        )

    spark.createDataFrame(
        [
            (1, "https://www.example.com/p?utm_source=x", "alpha content"),
            (2, "https://example.com/p/", "beta content"),  # in-batch alias of 1
            (3, "https://example.com/q", "gamma content"),
        ],
        schema,
    ).write.mode("overwrite").parquet(src)
    drain()
    assert sorted(
        r.doc_id for r in spark.read.parquet(landed).collect()
    ) == [1, 3]

    spark.createDataFrame(
        [
            (11, "https://example.com/p", "alpha content"),  # same-content re-crawl
            (12, "https://example.com/q#frag", "gamma REVISED"),  # changed content
            (13, "https://example.com/r", "delta content"),  # new URL, survives
            (14, "https://example.com/s", "alpha content"),  # new URL, exact-dup DROPPED
            (15, "not a url", "epsilon content"),  # no URL identity
        ],
        schema,
    ).write.mode("append").parquet(src)
    drain()

    assert sorted(
        r.doc_id for r in spark.read.parquet(landed).collect()
    ) == [1, 3, 13, 15]  # 11 alias, 12 routed to CDC, 14 exact-dropped
    updates = spark.read.parquet(upd).collect()
    assert [(r.keeper_id, r.text) for r in updates] == [(3, "gamma REVISED")]
    merged = {
        r.canonical_url: (r.keeper_id, r.fp is not None)
        for r in url_keeper_merge(
            spark.read.parquet(uk).drop("__batch_id")
        ).collect()
    }
    assert merged["https://example.com/p"][0] == 1
    assert merged["https://example.com/q"][0] == 3  # keeper_id STABLE
    assert merged["https://example.com/r"][0] == 13
    # doc 14 was dropped by the exact tier -> its URL stays un-tracked
    assert "https://example.com/s" not in merged
    audits = (
        spark.read.parquet(audit).orderBy("ingest_ts").collect()
    )
    assert [r.n_url_updates for r in audits] == [0, 1]
    assert audits[1].n_url_alias_dropped == 1  # doc 11

    # no-new-data drain: all sinks unchanged
    counts = [
        spark.read.parquet(p).count() for p in (landed, upd, uk, audit)
    ]
    drain()
    assert [
        spark.read.parquet(p).count() for p in (landed, upd, uk, audit)
    ] == counts
    # flat batch append onto the streaming keeper store refuses
    from etl_data_transformer_spark.operators.domains import (
        read_or_seed_url_keeper,
    )

    with pytest.raises(ValueError, match="streaming"):
        read_or_seed_url_keeper(spark, uk)
    assert os.path.exists(os.path.join(uk, "_url_keeper_params.json"))


def test_stream_jaccard_compaction_preserves_streaming_layout(spark, tmp_path):
    """Round-13 review find: compacting a STREAMING jaccard store must
    keep the __batch_id partition layout — a flat rebuild would leave the
    partition column as a plain data column, the next drain would
    misdetect the layout and its dynamic overwrite would interleave
    partition dirs with flat files. After compaction the stream continues
    and still pairs new docs against the compacted corpus."""
    import os

    from etl_data_transformer_spark.operators import dedup as DD
    from etl_data_transformer_spark.streaming.pipeline import stream_jaccard_dedup

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    pairs = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"

    def drain():
        stream_jaccard_dedup(
            spark.readStream.schema(schema).parquet(src),
            store, pairs, ckpt, threshold=0.5,
        )

    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog in the morning"),
            (2, "an entirely different body of text about maritime chronometers"),
        ],
        schema,
    ).write.mode("overwrite").parquet(src)
    drain()
    spark.createDataFrame(
        [(11, "the quick brown fox jumps over the lazy dog in the evening")],
        schema,
    ).write.mode("append").parquet(src)
    drain()

    DD.compact_jaccard_store(spark, store)
    posts = spark.read.parquet(os.path.join(store, "postings"))
    gsets = spark.read.parquet(os.path.join(store, "gramsets"))
    assert "__batch_id" in posts.columns and "__batch_id" in gsets.columns
    # genuinely PARTITIONED (directory layout), not a plain data column
    assert any(
        e.startswith("__batch_id=")
        for e in os.listdir(os.path.join(store, "postings"))
    )
    assert gsets.count() == 3  # deduped, all docs retained

    spark.createDataFrame(
        [(21, "the quick brown fox jumps over the lazy dog in the morning too")],
        schema,
    ).write.mode("append").parquet(src)
    drain()
    got = {(r.id_a, r.id_b) for r in spark.read.parquet(pairs).collect()}
    assert (1, 21) in got  # post-compaction stream pairs vs compacted corpus
    assert (1, 11) in got  # pre-compaction pair history intact


def test_stream_url_keeper_compaction_preserves_streaming_layout(spark, tmp_path):
    """Round-13 review find (the jaccard compaction's sibling): compacting
    a streaming keeper store keeps the __batch_id partition layout so the
    stream's dynamic partition overwrites keep working afterwards, and
    the merged view survives the rewrite."""
    import os

    from etl_data_transformer_spark.operators.domains import (
        compact_url_keeper_store,
        url_keeper_merge,
    )
    from etl_data_transformer_spark.streaming.pipeline import stream_url_keeper

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    surv = str(tmp_path / "surv")
    upd = str(tmp_path / "upd")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, url string, text string"

    def drain():
        stream_url_keeper(
            spark.readStream.schema(schema).parquet(src),
            store, ckpt, survivors_path=surv, updates_path=upd,
        )

    spark.createDataFrame(
        [
            (1, "https://example.com/p", "alpha"),
            (2, "https://example.com/q", "gamma"),
        ],
        schema,
    ).write.mode("overwrite").parquet(src)
    drain()
    spark.createDataFrame(
        [(11, "https://example.com/q", "gamma REVISED")], schema
    ).write.mode("append").parquet(src)
    drain()
    before = {
        r.canonical_url: (r.keeper_id, r.batch_seq)
        for r in url_keeper_merge(
            spark.read.parquet(store).drop("__batch_id")
        ).collect()
    }

    compact_url_keeper_store(spark, store)
    rows = spark.read.parquet(store)
    assert "__batch_id" in rows.columns
    assert any(e.startswith("__batch_id=") for e in os.listdir(store))
    assert rows.count() == 2  # one row per canonical
    assert {
        r.canonical_url: (r.keeper_id, r.batch_seq)
        for r in url_keeper_merge(rows.drop("__batch_id")).collect()
    } == before

    # the stream continues against the compacted store: a same-content
    # re-crawl of the updated page drops as an alias (fp advanced)
    spark.createDataFrame(
        [(21, "https://example.com/q", "gamma REVISED")], schema
    ).write.mode("append").parquet(src)
    drain()
    merged = {
        r.canonical_url: r.keeper_id
        for r in url_keeper_merge(
            spark.read.parquet(store).drop("__batch_id")
        ).collect()
    }
    assert merged["https://example.com/q"] == 2  # keeper unchanged: alias drop


def test_stream_ingest_jaccard_tier(spark, tmp_path):
    """Round-14: the exact prefix-Jaccard tier reachable from the composed
    STREAMING runner — in-batch pairs drop the higher id in drain 1,
    cross-batch pairs drop against the persisted __batch_id-partitioned
    store in drain 2, the landed corpus matches the batch runner on the
    same batches, a no-new-data drain moves nothing, and the audit rows
    carry the tier's counts."""
    import os

    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest
    from etl_data_transformer_spark.streaming.pipeline import stream_ingest

    src = str(tmp_path / "src")
    landed = str(tmp_path / "landed")
    ex = str(tmp_path / "ex")
    jc = str(tmp_path / "jc")
    audit = str(tmp_path / "audit")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"

    def drain():
        stream_ingest(
            spark.readStream.schema(schema).parquet(src),
            landed,
            ckpt,
            exact_store=ex,
            jaccard_store=jc,
            jaccard_n=1,
            jaccard_threshold=0.6,
            audit_path=audit,
        )

    b1 = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zeta"),      # J(1,2)=4/6 — in-batch near-dup
        (3, "uno dos tres cuatro cinco"),
    ]
    spark.createDataFrame(b1, schema).write.mode("overwrite").parquet(src)
    drain()
    assert sorted(r.doc_id for r in spark.read.parquet(landed).collect()) == [1, 3]

    b2 = [
        (10, "alpha beta gamma delta theta"),    # J(10, landed 1)=4/6 — cross-batch
        (11, "uno dos tres cuatro nueve"),       # J(11, landed 3)=4/6 — cross-batch
        (12, "completely different words here now"),
    ]
    spark.createDataFrame(b2, schema).write.mode("append").parquet(src)
    drain()
    assert sorted(r.doc_id for r in spark.read.parquet(landed).collect()) == [1, 3, 12]

    # the store is __batch_id-partitioned with survivor rows only, and the
    # frozen census exists once
    sets = spark.read.parquet(os.path.join(jc, "gramsets"))
    assert "__batch_id" in sets.columns
    assert sorted(r.doc_id for r in sets.collect()) == [1, 3, 12]
    posts = spark.read.parquet(os.path.join(jc, "postings"))
    assert {r.doc_id for r in posts.select("doc_id").distinct().collect()} == {1, 3, 12}
    assert spark.read.parquet(os.path.join(jc, "census")).count() > 0

    audits = spark.read.parquet(audit).orderBy("ingest_ts").collect()
    assert [r.jaccard_pairs for r in audits] == [1, 2]
    assert [r.n_after_jaccard for r in audits] == [2, 1]

    # no-new-data drain: every sink unchanged
    counts = [spark.read.parquet(p).count() for p in (landed, audit)] + [
        sets.count(),
        posts.count(),
    ]
    drain()
    assert [
        spark.read.parquet(p).count() for p in (landed, audit)
    ] + [
        spark.read.parquet(os.path.join(jc, "gramsets")).count(),
        spark.read.parquet(os.path.join(jc, "postings")).count(),
    ] == counts

    # batch-runner parity on identical batches
    b_ex = str(tmp_path / "b_ex")
    b_jc = str(tmp_path / "b_jc")
    b_landed = str(tmp_path / "b_landed")
    for rows in (b1, b2):
        run_incremental_ingest(
            spark.createDataFrame(rows, schema),
            exact_store=b_ex,
            jaccard_store=b_jc,
            jaccard_n=1,
            jaccard_threshold=0.6,
            survivors_path=b_landed,
        )
    assert sorted(
        r.doc_id for r in spark.read.parquet(b_landed).collect()
    ) == sorted(r.doc_id for r in spark.read.parquet(landed).collect())
