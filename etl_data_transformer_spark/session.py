"""SparkSession factory tuned for the engine.

The reference (``/root/reference``) delegates execution wholly to BigQuery /
pandas; here the equivalent "engine setup" is a Catalyst/AQE-tuned session.
Defaults are chosen for a 100 TB-class deployment and scale down to
``local[*]`` for tests:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- dynamic partition overwrite (the delete-insert incremental pattern of
  ``Incremental_load_fact_item_status.sql:29-34`` becomes a partition-level
  overwrite instead of a full-table copy)
- Arrow transfer for the pandas-UDF slow path
- UTC session timezone so timestamp semantics are stable across engines
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "etl_data_transformer_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    On a real cluster ``master`` comes from the environment; locally we run
    ``local[$SPARK_GRAFT_CPUS]``. All settings below are safe on both.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # some fixture tables carry parquet TIMESTAMP(NANOS) which the Spark
        # reader rejects; read them as long and convert in the reader layer
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    builder = builder.master(master or f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
