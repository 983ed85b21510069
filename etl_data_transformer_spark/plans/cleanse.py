"""Cleanse pipeline — Spark-native equivalent of the reference's pandas batch
cleanse (``csv_to_parquet_transformer.py:1-18``, SURVEY.md §3.3 / §7.1 Slice A).

read → lowercase column names (P1, T:6) → null imputation (P2, T:7) →
duplicate count + dedup (A4/A5, T:9-15) → Parquet write (S2, T:17-18),
returning a metrics report instead of printing (T:12).

Lazy plan, two actions (dup-count aggregation + write). At 100 TB the dedup
is a hash shuffle on all columns; for key-subset dedup pass ``subset`` so the
shuffle key stays narrow.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..operators.aggregates import dedup_full_rows, dup_count
from ..sources.readers import read_csv
from ..sources.writers import write_parquet


@dataclass
class CleanseReport:
    """The duplicate report the reference prints (T:10-15), as data."""

    input_rows: int
    duplicate_rows: int
    output_rows: int
    out_path: str


def normalize_columns(df: DataFrame) -> DataFrame:
    """P1 (T:6): lowercase every column name."""
    return df.toDF(*[c.lower() for c in df.columns])


def impute_nulls(df: DataFrame, numeric_value: float = 0, string_value: str | None = None) -> DataFrame:
    """P2 (T:7): ``fillna(0)``.

    Intentional deviation (SURVEY.md §7.4.2): pandas ``fillna(0)`` stuffs int
    0 into string columns; Spark fills numerics with ``numeric_value`` and,
    only when ``string_value`` is given, strings with that.
    """
    out = df.na.fill(numeric_value)
    if string_value is not None:
        out = out.na.fill(string_value)
    return out


def cleanse(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    input_format: str = "csv",
    string_fill: str | None = None,
    subset: list[str] | None = None,
) -> CleanseReport:
    """Full cleanse pipeline (T:1-18). Returns the metrics report."""
    if input_format == "csv":
        df = read_csv(spark, in_path)
    else:
        df = spark.read.format(input_format).load(in_path)
    df = normalize_columns(df)
    df = impute_nulls(df, string_value=string_fill)
    dups = dup_count(df, subset=subset)
    deduped = dedup_full_rows(df, subset=subset)
    write_parquet(deduped, out_path)
    out_rows = spark.read.parquet(out_path).count()
    return CleanseReport(
        input_rows=out_rows + dups,
        duplicate_rows=dups,
        output_rows=out_rows,
        out_path=out_path,
    )
