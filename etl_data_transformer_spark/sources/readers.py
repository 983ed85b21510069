"""Sources: CSV / Parquet / fixture-table readers (SURVEY.md §2.1 S1, S3, S8).

Mirrors the reference's two source styles:
- inferred-schema CSV read (``csv_to_parquet_transformer.py:3-4``)
- named warehouse-table scans (``Incremental_load_fact_item_status.sql:20,96,...``)

Parameterized addressing (Jinja ``{{params.*}}`` in the reference, S8) is
plain Python here: paths/names are function arguments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_csv(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """CSV scan with header; schema inference when none is declared (S1)."""
    reader = spark.read.option("header", True)
    if schema is not None:
        return reader.schema(schema).csv(path)
    return reader.option("inferSchema", True).csv(path)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Warehouse-style named table scan over the fixture directory (S3).

    Parquet TIMESTAMP(NANOS) columns (not supported by the Spark reader) come
    in as nanosecond longs via ``spark.sql.legacy.parquet.nanosAsLong`` and
    are converted to microsecond timestamps here.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division: float division loses precision at ns-since-epoch
        # magnitudes (~1.7e18 exceeds double's 53-bit mantissa)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_star(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = FIXTURE_TABLES) -> dict[str, DataFrame]:
    """Load every fixture table lazily; nothing is scanned until an action."""
    return {name: read_table(spark, sf_dir, name) for name in tables}


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = FIXTURE_TABLES) -> None:
    """Register each fixture table as a temp view for the SQL entry point."""
    for name in tables:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)
