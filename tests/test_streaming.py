"""Structured Streaming tests: the streamed tumbling agg must equal its
batch twin on the same input (SURVEY.md §2.9)."""

from pyspark.sql import functions as F

from etl_data_transformer_spark.operators.window_ops import tumbling_agg
from etl_data_transformer_spark.sources.readers import read_table
from etl_data_transformer_spark.streaming import (
    read_event_stream,
    run_available_now,
    stream_tumbling_agg,
)

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
