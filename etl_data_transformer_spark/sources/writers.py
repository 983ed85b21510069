"""Sinks: Parquet write, append, staged atomic swap (SURVEY.md §2.1 S2, S4-S7).

The reference's zero-copy snapshot + swap (``Incremental_load_fact_item_status
.sql:23-26,321-324``, BigQuery ``CREATE OR REPLACE ... COPY``) has no plain-
Parquet equivalent; we emulate with a staging directory + atomic rename. At
100 TB the production answer is a table format (Delta/Iceberg) where the swap
is a metadata commit — the API here is shaped so that swap-in-place is a
single function to replace.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """Parquet sink (S2). Partitioning keys enable partition pruning at scale."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def append_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Table append (S4): ``INSERT INTO ... SELECT`` equivalent."""
    write_parquet(df, path, mode="append", partition_by=partition_by)


def atomic_swap_write(
    df: DataFrame,
    target_dir: str,
    partition_by: list[str] | None = None,
    finalize_staging=None,
    write_staging=None,
) -> None:
    """Write ``df`` to a staging dir, then atomically swap it into place (S5).

    Emulates BigQuery's ``CREATE OR REPLACE TABLE ... COPY`` swap: readers see
    either the old or the new table, never a partial write. Single-filesystem
    rename is atomic; on object stores use a table format instead. The two
    renames still leave a brief target-missing window for concurrent openers
    — ``sources/manifest.py`` (manifest + atomic pointer replace, the
    Delta/Iceberg shape) removes it and is preferred for new tables.

    The in-process ``except`` below restores the backup on any raised
    failure, but a HARD crash (SIGKILL/OOM-kill/power loss) between the two
    renames leaves the target missing with the only copy stranded in the
    backup dir (round-7 review) — the backup is therefore named after the
    target so ``recover_interrupted_swap(target_dir)`` can heal it on the
    next startup (the in-flight write is simply lost; the caller reruns
    it). The same recovery-before-writers discipline as
    ``manifest.recover_multi_commits``.

    ``finalize_staging(staging_dir)``: optional hook run after the data
    write but BEFORE the swap — sidecars/metadata dropped here become
    visible atomically with the data (no labeled-without-data or
    data-without-label crash window).

    ``write_staging(df, staging_dir)``: optional replacement for the plain
    parquet staging write, for layouts ``df.write.parquet`` cannot produce
    (e.g. a bucketed store rewritten through ``saveAsTable`` — the swap
    and recovery discipline stays identical, only the file writer
    changes).
    """
    # writer-side heal FIRST (round-9 review: three callsites had each
    # forgotten their own recover call — hoisting it here removes the
    # stranded-backup class for every swap writer). Safe under the repo's
    # SINGLE-WRITER-per-target store contract (every store docstring pins
    # it); two concurrent writers on one target were never supported — the
    # heal makes that misuse fail faster, not slower. Readers must NOT
    # heal (a reader-side rename races the writer's swap window); they
    # fail loudly instead.
    recover_interrupted_swap(target_dir)
    parent = os.path.dirname(os.path.abspath(target_dir))
    os.makedirs(parent, exist_ok=True)
    base = os.path.basename(os.path.abspath(target_dir))
    staging = os.path.join(parent, f".staging-{uuid.uuid4().hex}")
    backup = os.path.join(parent, f".backup-{base}-{uuid.uuid4().hex}")
    if write_staging is not None:
        write_staging(df, staging)
    else:
        write_parquet(df, staging, mode="overwrite", partition_by=partition_by)
    if finalize_staging is not None:
        finalize_staging(staging)
    try:
        if os.path.exists(target_dir):
            os.rename(target_dir, backup)
        os.rename(staging, target_dir)
    except BaseException:
        # failure-atomicity: if the swap died between the two renames the
        # target is missing while the original sits in backup — restore it
        # before cleanup, otherwise the finally below would delete the only
        # surviving copy of the table.
        if not os.path.exists(target_dir) and os.path.exists(backup):
            os.rename(backup, target_dir)
        raise
    finally:
        if os.path.exists(backup):
            shutil.rmtree(backup, ignore_errors=True)
        if os.path.exists(staging):
            shutil.rmtree(staging, ignore_errors=True)


def recover_interrupted_swap(target_dir: str) -> bool:
    """Heal a hard-crashed ``atomic_swap_write`` (run before admitting
    writers): if the target is MISSING but a ``.backup-<name>-*`` sibling
    survives, restore the newest backup — the table reappears at its path
    with its pre-swap contents and the interrupted write is simply lost
    (rerun it). If the target exists, surviving backups are crash litter
    from after the second rename; remove them. Returns True iff a restore
    happened. Backups predating the name-tagged scheme (bare
    ``.backup-<uuid>``) are not associated with any target and are left
    alone."""
    target = os.path.abspath(target_dir)
    parent, base = os.path.dirname(target), os.path.basename(target)
    if not os.path.isdir(parent):
        return False
    backups = sorted(
        (os.path.join(parent, d) for d in os.listdir(parent)
         if d.startswith(f".backup-{base}-")),
        key=os.path.getmtime,
    )
    if os.path.exists(target):
        for b in backups:
            shutil.rmtree(b, ignore_errors=True)
        return False
    if not backups:
        return False
    os.rename(backups[-1], target)
    for b in backups[:-1]:
        shutil.rmtree(b, ignore_errors=True)
    return True


def drop_table(path: str) -> None:
    """Drop (S7): remove the table directory."""
    shutil.rmtree(path, ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed catalog table: pre-shuffled on ``bucket_cols`` at write time
    so later equi joins / aggregations on those columns need NO exchange —
    the co-located-join strategy for repeatedly-joined 100 TB facts (pay the
    shuffle once at load, never at query). Sorted within buckets so
    SortMergeJoin also skips its sort.

    Bucketing metadata lives in the session catalog (``saveAsTable``) —
    plain ``.parquet(path)`` writes cannot carry it.
    """
    writer = (
        df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    partition_by: list[str] | None = None,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Data-skipping layout: globally range-partition on ``sort_cols`` and
    sort within each output file, so every parquet file (and row group)
    covers a NARROW, mostly-disjoint min/max range of the sort key. Range
    scans then prune at the footer level: a predicate on the sort key
    touches ~1/N of the files instead of all of them — at 100 TB the
    difference between reading the whole table and reading one key range
    (this is the plain-parquet form of what Delta OPTIMIZE ZORDER /
    clustering keys do).

    ``repartitionByRange`` samples the key distribution, so files are
    near-equal-sized even on skewed keys. For multi-dimensional locality
    sort on ``functions.scalar.zorder_key(...)`` instead of a column list.
    """
    out = df.repartitionByRange(*([num_files] if num_files else []), *sort_cols)
    # with partition_by, the V1 file writer requires its output ordered by
    # the partition columns and inserts its OWN (sort_cols-oblivious) sort
    # when the incoming ordering doesn't lead with them — which would undo
    # the data-skipping layout inside each partition directory (round-5
    # advice). Leading the within-partition sort with partition_by keeps
    # the writer's requirement already satisfied, so the sort_cols order
    # survives into the files.
    out = out.sortWithinPartitions(*(partition_by or []), *sort_cols)
    out.write.mode(mode).partitionBy(*(partition_by or [])).parquet(path)


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "",
    format: str = "parquet",
) -> None:
    """Training-export sink: the corpus as ``n_shards`` Parquet
    directories (``shard=K/``), rows inside each shard laid out in the
    deterministic md5 pseudo-shuffle order of
    ``operators/curation.assign_shards`` — the final "globally shuffled,
    resumable, rerun-identical" layout a training loader consumes.

    Scale shape: ONE shuffle (repartition on the shard key) + a
    within-partition sort that spills instead of ever collecting; no
    global sort, no driver involvement. ``repartition(n, "shard")`` can
    MERGE two shard values into one task (murmur3 collisions) but never
    splits one shard across tasks, so each ``shard=K/`` directory is
    exactly one file whose row order IS the shuffle order — the
    shard-first sort keeps the dynamic-partition writer on a single open
    file. Rerunning with the same seed rewrites identical shard contents.

    ``format="jsonl"`` (round 10) writes each shard as a JSON-lines file
    instead — the format most training loaders stream natively — through
    the SAME one-shuffle layout and the same staged atomic swap; line
    order inside each shard file is the identical md5 pseudo-shuffle
    (pinned in pytest against the parquet layout row-for-row). Parquet
    stays the default: JSONL trades types and compression for loader
    compatibility.
    """
    from ..operators.curation import assign_shards

    if format not in ("parquet", "jsonl"):
        raise ValueError(f"format must be 'parquet' or 'jsonl': got {format!r}")
    out = (
        assign_shards(df, n_shards, id_col, seed)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shuffle_key", id_col)
        .drop("shuffle_key")
    )
    # staged + swapped, not written in place: a crash mid-export must never
    # leave a half-written shard set where a training loader (or a rerun
    # diff) can see it — same discipline as every store rebuild here
    if format == "jsonl":
        atomic_swap_write(
            out,
            path,
            write_staging=lambda d, staging: d.write.partitionBy("shard").json(staging),
        )
    else:
        atomic_swap_write(out, path, partition_by=["shard"])
