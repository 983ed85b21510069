"""Manifest-pointer table commits: atomic multi-file publish on plain
parquet (SURVEY.md §2.1 S5 — the scale-correct form of the staging-dir swap).

``atomic_swap_write`` emulates the reference's zero-copy snapshot + swap
(``Incremental_load_fact_item_status.sql:23-26,321-324``) with two directory
renames, which leaves a window where the target is missing. This module
removes that window the way Delta/Iceberg do: data files are immutable and
written to versioned directories, a manifest file lists the directories that
make up a table version, and ONE atomic pointer replace (``os.replace`` of
``_CURRENT``) publishes the commit. Readers resolve ``_CURRENT`` → manifest
→ data directories; they see the previous version or the new one, never a
torn table, no matter where a writer crashes.

Layout:

    table_dir/
      _CURRENT                  # pointer: name of the live manifest (atomic)
      _manifest/<version>.json  # {"version", "dirs": [...], "ts"}
      data/<version>/...        # immutable parquet per commit

Single-writer per table (the reference's model); concurrent writers would
need a compare-and-swap on the pointer (object-store conditional put /
rename-if-absent), which is exactly where Delta's commit protocol picks up.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_CURRENT = "_CURRENT"
_MANIFEST_DIR = "_manifest"
_DATA_DIR = "data"


def _manifest_path(table_dir: str, version: str) -> str:
    return os.path.join(table_dir, _MANIFEST_DIR, f"{version}.json")


def _read_current(table_dir: str) -> dict | None:
    pointer = os.path.join(table_dir, _CURRENT)
    if not os.path.exists(pointer):
        return None
    with open(pointer, encoding="utf-8") as f:
        version = f.read().strip()
    with open(_manifest_path(table_dir, version), encoding="utf-8") as f:
        return json.load(f)


def commit_write(
    df: DataFrame,
    table_dir: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> str:
    """Commit ``df`` as a new table version; returns the version id.

    ``mode='overwrite'`` makes the new data directory the whole table;
    ``'append'`` adds it to the previous version's directory list (snapshot-
    isolated append: concurrent readers keep the old manifest). The publish
    point is the single ``os.replace`` of the pointer file — everything
    before it is invisible to readers, so a crash anywhere leaves the
    previous version fully intact.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"unsupported mode: {mode}")
    version = uuid.uuid4().hex
    os.makedirs(os.path.join(table_dir, _MANIFEST_DIR), exist_ok=True)
    data_dir = os.path.join(table_dir, _DATA_DIR, version)

    writer = df.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(data_dir)

    prev = _read_current(table_dir) if mode == "append" else None
    dirs = ([*prev["dirs"]] if prev else []) + [os.path.join(_DATA_DIR, version)]
    manifest = {
        "version": version,
        "dirs": dirs,
        "ts": dt.datetime.now(dt.timezone.utc).isoformat(),
    }
    with open(_manifest_path(table_dir, version), "w", encoding="utf-8") as f:
        f.write(json.dumps(manifest))

    # the commit: atomic pointer replace (same-filesystem, POSIX-atomic)
    tmp_pointer = os.path.join(table_dir, f".{_CURRENT}.{version}.tmp")
    with open(tmp_pointer, "w", encoding="utf-8") as f:
        f.write(version)
    os.replace(tmp_pointer, os.path.join(table_dir, _CURRENT))
    return version


def read_table(spark: SparkSession, table_dir: str) -> DataFrame:
    """Read the live version: pointer → manifest → parquet over its dirs."""
    manifest = _read_current(table_dir)
    if manifest is None:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    paths = [os.path.join(table_dir, d) for d in manifest["dirs"]]
    return spark.read.parquet(*paths)


def current_version(table_dir: str) -> str | None:
    m = _read_current(table_dir)
    return m["version"] if m else None


def vacuum(table_dir: str) -> list[str]:
    """Delete data/manifest files unreferenced by the live version (run only
    when no reader can still hold an old manifest — Delta's retention-window
    caveat applies). Returns the removed data directories."""
    manifest = _read_current(table_dir)
    if manifest is None:
        return []
    live_dirs = {os.path.basename(d) for d in manifest["dirs"]}
    removed = []
    data_root = os.path.join(table_dir, _DATA_DIR)
    for d in os.listdir(data_root) if os.path.isdir(data_root) else []:
        if d not in live_dirs:
            shutil.rmtree(os.path.join(data_root, d), ignore_errors=True)
            removed.append(d)
    for m in os.listdir(os.path.join(table_dir, _MANIFEST_DIR)):
        if m.removesuffix(".json") != manifest["version"]:
            os.remove(os.path.join(table_dir, _MANIFEST_DIR, m))
    return removed
