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
        # NULL handling (round-6 review): freqItems' sketch doesn't track
        # NULL and isin() never matches it, so a NULL heavy hitter was
        # silently dropped even at 50% frequency. Count nulls explicitly
        # against the cached scan and union the NULL row when it qualifies.
        null_cnt = df.filter(F.col(col).isNull()).count()
        if n == 0 or (not cands and null_cnt <= support * n):
            return (
                df.select(col)
                .limit(0)
                .withColumn("cnt", F.lit(0).cast("long"))
                .withColumn("frequency", F.lit(0.0))
            )
        out = (
            df.filter(F.col(col).isin([c for c in cands if c is not None]))
            .groupBy(col)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") > support * n)
        )
        if null_cnt > support * n:
            spark = df.sparkSession
            null_row = spark.createDataFrame(
                [(null_cnt,)], f"cnt long"
            ).withColumn(col, F.lit(None).cast(dict(df.dtypes)[col])).select(col, "cnt")
            out = out.unionByName(null_row)
        return (
            out.withColumn("frequency", F.round(F.col("cnt") / F.lit(n), 6))
            .localCheckpoint(eager=True)  # materialize off the cache now
        )
    finally:
        df.unpersist()


def profile_table(df: DataFrame, approx_distinct: bool = True) -> DataFrame:
    """Generic column profiler: ONE aggregation pass over the whole table
    producing one row per column — (column, dtype, n_rows, n_nulls,
    null_frac, n_distinct, min_str, max_str). The schema-drift /
    data-quality sweep run after every load at scale.

    All per-column statistics are expressions in a SINGLE ``agg`` (Spark
    computes them in one partial+final aggregate — one scan, no per-column
    jobs); the wide one-row result is unpivoted driver-side via a
    stack-style select. ``approx_distinct=True`` (default) uses the HLL
    sketch — mergeable and O(1) memory, the 100 TB tier, and the whole
    profile stays literally ONE Aggregate node; False gives exact
    ``count(distinct)`` per column, which Spark rewrites into an
    Expand + two-aggregate plan (multi-column DISTINCT) — still a single
    scan, but each row fans out once per column. min/max are
    cast to string so heterogeneous column types fit one output schema
    (NULL for types without ordering, e.g. maps).
    """
    from pyspark.sql import types as T

    def orderable(dt) -> bool:
        return not isinstance(dt, (T.MapType,))

    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in df.schema.fields:
        c = f.name
        qc = f"`{c}`"  # backtick-quoted: dotted names otherwise parse as
        # nested-field access and the profiler crashes on raw CSV/JSON
        # loads with names like "a.b" (round-6 review)
        aggs.append(F.sum(F.col(qc).isNull().cast("long")).alias(f"__nulls_{c}"))
        if approx_distinct:
            aggs.append(F.approx_count_distinct(qc).alias(f"__nd_{c}"))
        elif orderable(f.dataType):
            aggs.append(F.countDistinct(qc).alias(f"__nd_{c}"))
        else:
            # exact countDistinct rejects map types (no ordering/equality
            # for hashing groups) — NULL n_distinct, same fallback as
            # min/max (round-5 advice)
            aggs.append(F.lit(None).cast("long").alias(f"__nd_{c}"))
        if orderable(f.dataType):
            aggs.append(F.min(qc).cast("string").alias(f"__min_{c}"))
            aggs.append(F.max(qc).cast("string").alias(f"__max_{c}"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"__min_{c}"))
            aggs.append(F.lit(None).cast("string").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(f.name).alias("column"),
            F.lit(f.dataType.simpleString()).alias("dtype"),
            F.col("__n").alias("n_rows"),
            F.col(f"`__nulls_{f.name}`").alias("n_nulls"),
            F.round(
                F.try_divide(F.col(f"`__nulls_{f.name}`"), F.col("__n")), 6
            ).alias("null_frac"),
            F.col(f"`__nd_{f.name}`").alias("n_distinct"),
            F.col(f"`__min_{f.name}`").alias("min_str"),
            F.col(f"`__max_{f.name}`").alias("max_str"),
        )
        for f in df.schema.fields
    ]
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")
