"""Incremental (CDC-style delete-insert) load runtime.

Spark-native redesign of ``Incremental_load_fact_item_status.sql`` (SURVEY.md
§2.8 C1-C5, §3.1, §4.3):

reference (BigQuery script)                 → this engine (Spark)
------------------------------------------- ---------------------------------
DECLARE/SET script vars (I:2-8)             → ``LoadParams`` dataclass
watermark scalar subquery + fallback (I:10-20) → ``compute_watermark``
snapshot COPY + TRUNCATE/DELETE (I:23-34)   → partition-level delete-insert:
                                              the fact is parquet partitioned
                                              by ``cdc_date``; only lookback
                                              partitions are rewritten
                                              (dynamic partition overwrite)
INSERT the rebuilt window (I:40-314)        → append of the 3-branch union
COPY back + DROP staging (I:321-328)        → atomic staging-dir swap
                                              (``atomic_swap_write``) for the
                                              FULL_LOAD path
audit proc call (I:331-341)                 → ``write_audit`` row append

Why this is the 100 TB design: BigQuery needs the full-table COPY because its
DML can't cheaply rewrite a time window; a date-partitioned parquet/Delta
table *can* — ``partitionOverwriteMode=dynamic`` rewrites only the lookback
partitions, so the cost of a DELTA load is proportional to the lookback
window, not the table size.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregates import scalar_max
from ..sources import manifest as manifest_store
from ..sources.writers import atomic_swap_write

AUDIT_COLUMNS = [
    "dag_name",
    "target_table",
    "load_start_ts",
    "table_type",
    "load_type",
    "inserted_record_count",
    "deleted_record_count",
    "checksum_expr",
    "load_end_ts",
]


@dataclass
class LoadParams:
    """Script variables (I:2-8) + Jinja params (S8) as plain Python config."""

    load_type: str = "DELTA"  # or FULL_LOAD (I:29)
    delta_day_count: int = 60  # lookback window (I:17)
    minimum_date: dt.datetime = field(default_factory=lambda: dt.datetime(1970, 1, 1))
    dag_name: str = "incremental_fact_load"
    target_table: str = "fact_item_status"
    cdc_column: str = "cdc_ts"


@dataclass
class LoadResult:
    """Row-count metrics the reference captures via @@row_count (I:37,317)."""

    load_type: str
    watermark: dt.datetime
    deleted_record_count: int
    inserted_record_count: int
    total_rows: int


def compute_watermark(
    spark: SparkSession,
    target_path: str,
    params: LoadParams,
    use_manifest: bool = False,
) -> dt.datetime:
    """C3 (I:10-20): MAX(cdc) minus lookback, falling back to minimum_date
    when the target is empty/missing (the IFNULL branch, I:17)."""
    if params.load_type == "FULL_LOAD":
        return params.minimum_date
    # only a genuinely-absent target falls back to minimum_date: a blind
    # except here silently turned ANY read failure (corrupt footer,
    # permissions, transient FS error) on a healthy multi-year table into
    # a watermark of 1970 — i.e. a full-history delete-insert — instead of
    # failing the run (the same footgun class as round-5's
    # stream_incremental_upsert finding)
    if use_manifest:
        if manifest_store.current_version(target_path) is None:
            return params.minimum_date
        target = manifest_store.read_table(spark, target_path)
    else:
        from ..sources.readers import read_parquet_or_none

        target = read_parquet_or_none(spark, target_path)
        if target is None:
            return params.minimum_date
    hwm = scalar_max(target, params.cdc_column)
    if hwm is None:
        return params.minimum_date
    return hwm - dt.timedelta(days=params.delta_day_count)


def run_incremental_load(
    spark: SparkSession,
    build_window: "callable",
    target_path: str,
    audit_path: str,
    params: LoadParams,
    use_manifest: bool = False,
) -> LoadResult:
    """C4 — the delete-insert incremental load (I:23-40, I:321-328).

    ``build_window(watermark) -> DataFrame`` rebuilds the fact rows with
    ``cdc_ts >= watermark`` (the reference's 3-branch INSERT, I:40-314).
    The returned frame must contain ``params.cdc_column``.

    ``use_manifest=True`` publishes through the manifest store instead of
    in-place dynamic partition overwrite: the lookback partitions are
    written to a new immutable version directory and
    ``commit_replace_partitions`` swaps their ownership in ONE atomic
    pointer replace — a crash at any point mid-load leaves the previous
    version fully readable (no torn window between the overwrite and the
    fully-deleted-partition cleanup, which the in-place path tolerates),
    and no checkpoint barrier is needed because the plan never reads the
    files it is replacing. Same cost profile: ∝ lookback window.
    """
    start_ts = dt.datetime.now(dt.timezone.utc)
    watermark = compute_watermark(spark, target_path, params, use_manifest=use_manifest)

    rebuilt = build_window(watermark).withColumn(
        "cdc_date", F.to_date(F.col(params.cdc_column))
    )
    # @@row_count capture (I:37,317): persist so count + write don't
    # recompute the 3-branch union twice (SURVEY.md §7.4.5).
    rebuilt = rebuilt.persist()
    try:
        inserted = rebuilt.count()

        deleted = 0
        if use_manifest:
            base_version = manifest_store.current_version(target_path)
            target_exists = base_version is not None
        else:
            target_exists = os.path.isdir(target_path)
        if params.load_type == "FULL_LOAD" or not target_exists:
            # TRUNCATE path (I:30) / first load: whole table replaced atomically.
            if use_manifest:
                if target_exists:
                    deleted = manifest_store.read_table(spark, target_path).count()
                manifest_store.commit_write(
                    rebuilt, target_path, mode="overwrite", partition_by=["cdc_date"]
                )
            else:
                if target_exists:
                    deleted = spark.read.parquet(target_path).count()
                atomic_swap_write(rebuilt, target_path, partition_by=["cdc_date"])
        elif use_manifest:
            old = manifest_store.read_table(spark, target_path)
            wm_date = watermark.date()
            # the cdc_date conjunct is implied by cdc_ts >= watermark but is
            # what actually PRUNES: without it this count lists and scans
            # every partition of the table each run, breaking the module's
            # cost ∝ lookback-window contract (round-6 review)
            deleted = old.filter(
                (F.col("cdc_date") >= F.lit(wm_date))
                & (F.col(params.cdc_column) >= F.lit(watermark))
            ).count()
            kept_in_window = old.filter(
                (F.col("cdc_date") >= F.lit(wm_date))
                & (F.col(params.cdc_column) < F.lit(watermark))
            )
            out = kept_in_window.unionByName(rebuilt)
            # partitions in the rewrite window that `out` doesn't re-populate are
            # fully-deleted; the commit derives the written set from the data dir
            # it just wrote, so `out` is evaluated exactly once (in the write)
            old_dates = {
                r["cdc_date"]
                for r in old.filter(F.col("cdc_date") >= F.lit(wm_date)).select("cdc_date").distinct().collect()
            }
            # expected_base pins the CAS to the version THIS load read: a
            # commit landing between our read_table and the publish would
            # otherwise pass the commit's own fresh CAS while our rewrite
            # (derived from the stale snapshot) silently drops its rows
            manifest_store.commit_replace_partitions(
                out,
                target_path,
                partition_by="cdc_date",
                drop_unless_written={f"cdc_date={d.isoformat()}" for d in old_dates},
                expected_base=base_version,
            )
        else:
            old = spark.read.parquet(target_path)
            wm_date = watermark.date()
            deleted = old.filter(
                (F.col("cdc_date") >= F.lit(wm_date))
                & (F.col(params.cdc_column) >= F.lit(watermark))
            ).count()
            # DELETE + INSERT (I:32-34, I:40) as a dynamic partition overwrite of
            # the lookback partitions only: each touched partition is rewritten
            # as its kept (< watermark) rows plus the rebuilt window. Cost ∝
            # lookback window, not table size — this is why the reference's
            # full-table COPY trick (I:23-26) is unnecessary on Spark.
            kept_in_window = old.filter(
                (F.col("cdc_date") >= F.lit(wm_date))
                & (F.col(params.cdc_column) < F.lit(watermark))
            )
            # materialize before overwriting: the plan reads the same files the
            # write replaces (a table format with replaceWhere commits this as
            # metadata instead and needs no checkpoint)
            out = kept_in_window.unionByName(rebuilt).localCheckpoint(eager=True)
            old_dates = {
                r["cdc_date"]
                for r in old.filter(F.col("cdc_date") >= F.lit(wm_date)).select("cdc_date").distinct().collect()
            }
            # dynamic overwrite set PER-WRITE, not via the session conf: with
            # Spark's default 'static' mode this statement would truncate every
            # partition outside the lookback window for callers whose session
            # doesn't carry spark.sql.sources.partitionOverwriteMode.
            out.write.option("partitionOverwriteMode", "dynamic").mode("overwrite").partitionBy(
                "cdc_date"
            ).parquet(target_path)
            # Dynamic overwrite leaves a partition untouched when the new data
            # has no rows for it — drop partitions that were fully deleted and
            # not re-inserted (Delta's replaceWhere does this as one metadata
            # commit; this is the plain-parquet emulation).
            written_dates = {r["cdc_date"] for r in out.select("cdc_date").distinct().collect()}
            for d in old_dates - written_dates:
                shutil.rmtree(f"{target_path}/cdc_date={d.isoformat()}", ignore_errors=True)
    finally:
        # unpersist on EVERY exit — the expected-retryable ConcurrentWriteError
        # would otherwise leak the cached window for the session lifetime,
        # once per retry (round-6 review)
        rebuilt.unpersist()

    if use_manifest:
        total = manifest_store.read_table(spark, target_path).count()
    else:
        total = spark.read.parquet(target_path).count()
    write_audit(
        spark,
        audit_path,
        params,
        start_ts=start_ts,
        inserted=inserted,
        deleted=deleted,
    )
    return LoadResult(
        load_type=params.load_type,
        watermark=watermark,
        deleted_record_count=deleted,
        inserted_record_count=inserted,
        total_rows=total,
    )


def write_audit(
    spark: SparkSession,
    audit_path: str,
    params: LoadParams,
    start_ts: dt.datetime,
    inserted: int,
    deleted: int,
) -> None:
    """C5 (I:331-341): one audit row with the same fields the reference's
    ``proc_elc_audit_insert`` receives."""
    row = [
        (
            params.dag_name,
            params.target_table,
            start_ts.replace(tzinfo=None),
            "DW_FACT",
            params.load_type,
            inserted,
            deleted,
            "CONCAT(item_status_key, line_item_status, latest_status, trans_order_id, cart_id)",
            dt.datetime.now(dt.timezone.utc).replace(tzinfo=None),
        )
    ]
    spark.createDataFrame(row, AUDIT_COLUMNS).write.mode("append").parquet(audit_path)
