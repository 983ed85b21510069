"""Aggregation + window operators (SURVEY.md §2.4-§2.5, A1-A6).

At scale all of these are single-shuffle hash aggregations with map-side
partial aggregation (Spark does partial+final automatically); the
latest-per-group pattern replaces the reference's three-group-by/three-join
hand-rolled argmax (``I:42-58``, ``I:116-162``) with one window ranking —
one shuffle on the partition key instead of three.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    keep_rank_col: bool = False,
) -> DataFrame:
    """§2.5 — latest row per group via ``row_number() = 1``.

    Semantically equal to the reference's years/months/latest CTE chain
    (``I:42-58``) on unique (group, order) combinations, with 1 shuffle
    instead of 3.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    ranked = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return ranked if keep_rank_col else ranked.drop("__rn")


def scalar_max(df: DataFrame, col: str):
    """A3 — ungrouped MAX collected to a driver scalar (watermark read,
    ``I:11-20``). One action; NULL when the table is empty."""
    return df.agg(F.max(col).alias("v")).collect()[0]["v"]


def dup_count(df: DataFrame, subset: Sequence[str] | None = None) -> int:
    """A5 — number of duplicate rows, as ``df.duplicated().sum()`` counts them
    (``csv_to_parquet_transformer.py:9-12``): total rows minus distinct rows.

    Single aggregation over a grouped count — no second full scan.
    """
    keys = list(subset) if subset else df.columns
    counts = df.groupBy(*keys).count()
    row = counts.agg(
        F.coalesce(F.sum(F.col("count") - F.lit(1)), F.lit(0)).alias("dups")
    ).collect()[0]
    return int(row["dups"])


def dedup_full_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """A4 — ``SELECT DISTINCT`` / ``drop_duplicates`` (``I:62,171-192``,
    ``csv_to_parquet_transformer.py:13``)."""
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


def group_max(df: DataFrame, group_cols: Sequence[str], max_col: str, alias: str) -> DataFrame:
    """A1/A2 — ``SELECT max(x) ... GROUP BY k`` (``I:44-50``)."""
    return df.groupBy(*group_cols).agg(F.max(max_col).alias(alias))


def heavy_hitters(df: DataFrame, col: str, support: float = 0.01) -> DataFrame:
    """Exact heavy hitters (items with count > ``support`` × N) in two
    phases: a one-pass Misra-Gries candidate sweep (``df.stat.freqItems`` —
    per-partition summaries of ≤ 1/support entries merged on the driver, NO
    shuffle, guaranteed SUPERSET of the true heavy hitters), then an exact
    count restricted to candidate rows. Returns (item, cnt, frequency).

    The scale point: a plain ``GROUP BY col HAVING count > support*N``
    shuffles the ENTIRE key universe (every distinct token of a 100 TB
    corpus) to find the handful of frequent ones; this shape shuffles only
    rows matching ≤ 1/support candidate values. The result is EXACT —
    false candidates are removed by the exact counts, true heavy hitters
    cannot be missed (sketch guarantee) — so a plain SQL oracle verifies it
    row-for-row.

    The three actions (count, sketch, verify) run off one persisted scan of
    the input lineage — q_heavy_hitter_terms' tokenize+explode would
    otherwise re-execute per action (review finding); the small result is
    eagerly localCheckpoint'ed so the cache can be released before return.
    """
    # mirror freqItems' real lower bound — below it the JVM raises an
    # opaque IllegalArgumentException deep in the sketch
    if not (1e-4 <= support < 1.0):
        raise ValueError("support must be in [1e-4, 1)")
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        n = df.count()
        cands = df.stat.freqItems([col], support).collect()[0][0]
        if n == 0 or not cands:
            return (
                df.select(col)
                .limit(0)
                .withColumn("cnt", F.lit(0).cast("long"))
                .withColumn("frequency", F.lit(0.0))
            )
        return (
            df.filter(F.col(col).isin(list(cands)))
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") > support * n)
            .withColumn("frequency", F.round(F.col("cnt") / F.lit(n), 6))
            .localCheckpoint(eager=True)  # materialize off the cache now
        )
    finally:
        df.unpersist()
