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
      _manifest/<version>.json  # {"version", "dirs": [...], "ts", ...}
      data/<version>/...        # immutable parquet per commit

For tables committed with a single-level ``partition_by``, the manifest also
records which version directories own each partition
(``"partitions": {"cdc_date=2024-01-02": ["data/<v>", ...], ...}``), which
enables ``commit_replace_partitions`` — the Delta ``replaceWhere`` shape: a
commit that atomically swaps ONLY the touched partitions' ownership to a new
data directory, leaving every other partition's bytes untouched. That makes
an incremental delete-insert load cost ∝ lookback window while keeping the
all-or-nothing pointer publish (no torn table mid-load, ever).

Concurrent writers are guarded by a compare-and-swap publish: commits
serialize on an ``fcntl.flock`` lock file (kernel-released on writer death —
no staleness adjudication; an object store would use a conditional-put lease
with TTL) and an ``append``
whose base version moved since it was read fails cleanly with
``ConcurrentWriteError`` instead of silently dropping the other writer's
rows — the lost-update check Delta's commit protocol performs. Manifests
also record the data schema and partition columns so an ``append`` with a
drifted schema or different partitioning fails at COMMIT time, not at some
later read; ``allow_schema_evolution=True`` relaxes that to ADDITIVE drift
(new columns null-fill on read, Delta's mergeSchema contract — type changes
and drops always reject). ``read_version``/``list_versions`` give time
travel over retained manifests and ``compact`` is the OPTIMIZE analog
(also normalizes an evolved table back to one homogeneous schema).
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
_COMMIT_LOCK = "_COMMIT_LOCK"
# vacuum spares orphans younger than this: a live writer stages its data
# directory BEFORE taking the commit lock, so age is the only signal
# separating an in-flight commit's files from a crashed one's
_VACUUM_GRACE_S = 300.0


class ConcurrentWriteError(RuntimeError):
    """Another writer committed between this append's base-version read and
    its publish (lost-update conflict), or holds the commit lock."""


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


def _schema_fields(df: DataFrame) -> list[list[str]]:
    """(name, dataType) pairs — the append-compatibility contract."""
    return [[f.name, f.dataType.simpleString()] for f in df.schema.fields]


def _acquire_lock(table_dir: str) -> int:
    """Commit lock via ``fcntl.flock(LOCK_EX | LOCK_NB)`` on a lock file:
    the kernel releases it automatically when the holder's process dies, so
    there is NO staleness window to adjudicate — the earlier mtime-based
    stale-breaking schemes all had a stat-vs-steal race that could admit
    two writers. A held lock raises ``ConcurrentWriteError`` immediately
    (commits are milliseconds; callers retry at their level). On an object
    store this maps to a conditional-put lease with TTL. Returns the open
    fd; release with ``_release_lock``."""
    import fcntl

    lock = os.path.join(table_dir, _COMMIT_LOCK)
    fd = os.open(lock, os.O_CREAT | os.O_WRONLY)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except BlockingIOError:
        os.close(fd)
        raise ConcurrentWriteError(
            f"commit lock held by another writer on {table_dir}"
        ) from None
    except OSError:
        # NOT a concurrency conflict: ENOLCK / EIO etc. (e.g. a filesystem
        # without lock support) — retrying "until the other writer
        # finishes" would loop forever, so let the real error surface
        os.close(fd)
        raise
    os.write(fd, f"pid={os.getpid()}".encode())
    return fd


def _release_lock(fd: int) -> None:
    import fcntl

    fcntl.flock(fd, fcntl.LOCK_UN)
    os.close(fd)


def _check_compat(
    prev: dict,
    table_dir: str,
    fields: list,
    part_by: list,
    what: str,
    allow_evolution: bool = False,
) -> list:
    """Schema/partitioning drift fails at COMMIT time, not at a later read.
    Older manifests (pre-schema) skip the check rather than reject.

    With ``allow_evolution``, ADDITIVE drift is accepted: the new data may
    add columns, but every existing column must keep its name and type
    (type changes and drops still reject — they'd corrupt old data on
    read). Returns the schema to record: the widened union under
    evolution, else the unchanged table schema.

    Schema comparison is by NAME -> TYPE mapping, not list order: parquet
    reads assemble columns by name, and an evolved table's read-back column
    order depends on which (uuid-named) version directory sorts first — an
    order-sensitive compare would flake on semantically identical frames.
    The partitioning check runs unconditionally (evolution never relaxes
    it: drifting partition columns silently corrupts the ownership map)."""
    # partitioning first — no schema-drift path may bypass it
    if prev.get("partition_by") is not None and prev["partition_by"] != part_by:
        raise ValueError(
            f"{what} partitioning mismatch for {table_dir}: "
            f"table uses {prev['partition_by']}, {what} uses {part_by}"
        )
    if prev.get("schema") is None:
        return fields
    old_types = {n: t for n, t in prev["schema"]}
    new_types = {n: t for n, t in fields}
    if old_types == new_types:
        return prev["schema"]
    changed = [n for n, t in old_types.items() if n in new_types and new_types[n] != t]
    dropped = [n for n in old_types if n not in new_types]
    if not allow_evolution:
        raise ValueError(
            f"{what} schema mismatch for {table_dir}: "
            f"table has {prev['schema']}, {what} brings {fields}"
        )
    if changed or dropped:
        raise ValueError(
            f"{what} schema evolution on {table_dir} only supports "
            f"ADDING columns; changed={changed} dropped={dropped}"
        )
    # widened schema: old columns in their order, new ones appended
    return [*prev["schema"], *[[n, t] for n, t in fields if n not in old_types]]


def _write_data_dir(df: DataFrame, data_dir: str, part_by: list[str]) -> list[str]:
    """Write the immutable version directory; returns its partition subdirs
    (single-level layouts only — the mapping that powers partition swaps)."""
    writer = df.write.mode("errorifexists")
    if part_by:
        writer = writer.partitionBy(*part_by)
    writer.parquet(data_dir)
    if len(part_by) == 1:
        return sorted(d for d in os.listdir(data_dir) if "=" in d)
    return []


def _publish(
    table_dir: str,
    version: str,
    build_manifest: "callable",
    expected_base: str | None,
    check_base: bool,
) -> None:
    """The commit: serialize on the lock, CAS-check the base version, write
    the manifest, atomically replace the pointer. ``build_manifest(latest)``
    receives the manifest read UNDER the lock; append/replace closures may
    still use their pre-lock base (the CAS guarantees it equals ``latest``),
    but the parent link must come from ``latest`` so an un-CAS'd overwrite
    racing another commit records the true predecessor, keeping every
    published version on the time-travel chain."""
    lock_fd = _acquire_lock(table_dir)
    try:
        latest = _read_current(table_dir)
        if check_base and (latest["version"] if latest else None) != expected_base:
            raise ConcurrentWriteError(
                f"base version moved on {table_dir}: read {expected_base}, "
                f"now {latest['version'] if latest else None}"
            )
        _write_manifest_file(table_dir, version, build_manifest(latest))
        _flip_pointer(table_dir, version)
    finally:
        _release_lock(lock_fd)


def _write_manifest_file(table_dir: str, version: str, manifest: dict) -> None:
    """tmp + os.replace, mirroring the pointer publish: a crash mid-write
    must never leave a truncated <version>.json that breaks
    list_versions()/read_version() until vacuum's grace window expires."""
    mpath = _manifest_path(table_dir, version)
    tmp_manifest = f"{mpath}.tmp"
    try:
        with open(tmp_manifest, "w", encoding="utf-8") as f:
            f.write(json.dumps(manifest))
        os.replace(tmp_manifest, mpath)
    except BaseException:
        if os.path.exists(tmp_manifest):
            os.unlink(tmp_manifest)
        raise


def _flip_pointer(table_dir: str, version: str) -> None:
    """Atomic pointer replace (same-filesystem, POSIX-atomic); unlink the
    tmp pointer on any failure so aborted commits don't accumulate
    `._CURRENT.*.tmp` litter."""
    tmp_pointer = os.path.join(table_dir, f".{_CURRENT}.{version}.tmp")
    try:
        with open(tmp_pointer, "w", encoding="utf-8") as f:
            f.write(version)
        os.replace(tmp_pointer, os.path.join(table_dir, _CURRENT))
    except BaseException:
        if os.path.exists(tmp_pointer):
            os.unlink(tmp_pointer)
        raise


_UNSET = object()


def commit_write(
    df: DataFrame,
    table_dir: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    allow_schema_evolution: bool = False,
    expected_base: "str | None | object" = _UNSET,
) -> str:
    """Commit ``df`` as a new table version; returns the version id.

    ``mode='overwrite'`` makes the new data directory the whole table;
    ``'append'`` adds it to the previous version's directory list (snapshot-
    isolated append: concurrent readers keep the old manifest). The publish
    point is the single ``os.replace`` of the pointer file — everything
    before it is invisible to readers, so a crash anywhere leaves the
    previous version fully intact.

    Appends validate schema + partition-column compatibility against the
    base version (drift fails HERE, not at a later read) and re-check under
    the commit lock that the base version hasn't moved — a conflicting
    concurrent commit raises ``ConcurrentWriteError`` and leaves the table
    untouched (the orphaned data directory is ``vacuum``-able).

    ``expected_base`` (internal; used by ``compact``): force the CAS check
    even in overwrite mode, against the given version. An overwrite whose
    CONTENT derives from a read of the live table (compaction) is a lost
    update if another commit lands between that read and this publish —
    plain overwrites, whose content is caller-supplied, intentionally skip
    the check.
    """
    prep = _prepare_commit(
        df, table_dir, mode, partition_by, allow_schema_evolution, expected_base
    )
    _publish(
        table_dir,
        prep.version,
        prep.build_manifest,
        expected_base=prep.expected_base,
        check_base=prep.check_base,
    )
    return prep.version


class _PreparedCommit:
    """A staged (data written, unpublished) commit: everything ``_publish``
    or ``multi_commit`` needs to make it visible."""

    __slots__ = ("table_dir", "version", "build_manifest", "expected_base", "check_base")

    def __init__(self, table_dir, version, build_manifest, expected_base, check_base):
        self.table_dir = table_dir
        self.version = version
        self.build_manifest = build_manifest
        self.expected_base = expected_base
        self.check_base = check_base


def _prepare_commit(
    df: DataFrame,
    table_dir: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    allow_schema_evolution: bool = False,
    expected_base: "str | None | object" = _UNSET,
) -> _PreparedCommit:
    """The pre-publish phase of ``commit_write``: validate compatibility,
    write the immutable data directory, and close over the manifest builder.
    Nothing staged here is visible to readers until ``_publish`` (or
    ``multi_commit``'s journaled pointer flip) runs."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"unsupported mode: {mode}")
    version = uuid.uuid4().hex
    os.makedirs(os.path.join(table_dir, _MANIFEST_DIR), exist_ok=True)
    data_dir = os.path.join(table_dir, _DATA_DIR, version)

    fields = _schema_fields(df)
    part_by = list(partition_by) if partition_by else []
    prev = _read_current(table_dir) if mode == "append" else None
    record_schema = fields
    evolved = bool(prev and prev.get("schema_evolved"))
    if prev is not None:
        record_schema = _check_compat(
            prev, table_dir, fields, part_by, "append", allow_schema_evolution
        )
        # heterogeneous-dirs flag: set iff this append ADDED columns (name
        # sets differ — column order alone is irrelevant to by-name reads)
        if prev.get("schema") is not None:
            evolved = evolved or {n for n, _ in fields} != {n for n, _ in prev["schema"]}
        else:
            # pre-schema manifest: the existing dirs' schema is unknown, so
            # drift cannot be validated at commit time — conservatively mark
            # the table evolved so reads mergeSchema across dirs (a true
            # type conflict then fails LOUDLY at read instead of resolving
            # from whichever footer gets sampled; round-6 review)
            evolved = True

    new_subdirs = _write_data_dir(df, data_dir, part_by)
    rel_dir = os.path.join(_DATA_DIR, version)

    def build_manifest(latest: dict | None) -> dict:
        dirs = ([*prev["dirs"]] if prev else []) + [rel_dir]
        manifest = {
            "version": version,
            "parent": latest["version"] if latest else None,
            "dirs": dirs,
            "schema": record_schema,
            "partition_by": part_by,
            "ts": dt.datetime.now(dt.timezone.utc).isoformat(),
        }
        if evolved:
            # version dirs now have heterogeneous (additively-compatible)
            # parquet schemas; readers must merge instead of sampling one
            manifest["schema_evolved"] = True
        # single-level partitioned tables ALWAYS carry the ownership map —
        # including when this commit wrote zero rows (new_subdirs empty), so
        # an empty CDC-window append can't silently demote the table to the
        # wholesale-dirs layout and resurrect replaced partitions
        if len(part_by) == 1:
            if prev is not None and prev.get("partitions") is None and prev.get("dirs"):
                # pre-partition-map manifest (legacy layout): build the map
                # from the existing version dirs by listing their partition
                # subdirs — starting the map from {} would make every
                # pre-existing row invisible to _read_manifest_df, which
                # reads ONLY map-owned paths once a map exists (round-6
                # review; commit_replace_partitions rejects this case, the
                # append path can migrate it losslessly)
                parts = {}
                for d in prev["dirs"]:
                    full = os.path.join(table_dir, d)
                    if os.path.isdir(full):
                        for sub in sorted(x for x in os.listdir(full) if "=" in x):
                            parts.setdefault(sub, []).append(d)
            else:
                parts = (
                    {k: list(v) for k, v in prev.get("partitions", {}).items()}
                    if prev
                    else {}
                )
            for p in new_subdirs:
                parts[p] = [*parts.get(p, []), rel_dir]
            manifest["partitions"] = parts
        return manifest

    if expected_base is _UNSET:
        publish_expected = prev["version"] if prev else None
        publish_check = mode == "append"
    else:
        publish_expected, publish_check = expected_base, True
    return _PreparedCommit(table_dir, version, build_manifest, publish_expected, publish_check)


_TXN_PREFIX = "txn_"


def multi_commit(writes: list[dict], txn_dir: str) -> dict[str, str]:
    """Atomically publish commits to N manifest tables — the multi-table
    transaction the composed ingest needs (landed corpus + dedup stores +
    audit move together or not at all; round-6 verdict item 6).

    ``writes``: one dict per table with the ``commit_write`` keywords —
    ``{"df", "table_dir", "mode"?, "partition_by"?,
    "allow_schema_evolution"?, "expected_base"?}``. Returns
    ``{table_dir: version}``.

    Protocol (two-phase, write-ahead journaled):

    1. **prepare** — every table's immutable data directory is written and
       its manifest builder staged; nothing is reader-visible. A failure
       here aborts with zero tables changed (orphans are ``vacuum``-able).
    2. **lock + validate** — all commit locks are taken in sorted
       table_dir order (no deadlock between concurrent multi-writers);
       every table's CAS base is re-checked and every manifest file
       written, still unpublished. Any conflict aborts the WHOLE
       transaction before any pointer moves.
    3. **journal** — one atomic write of ``txn_dir/txn_<id>.json`` listing
       ``(table_dir, version, parent)`` per table. THIS is the commit
       point: before it, a crash publishes nothing; after it, the
       transaction is redoable.
    4. **flip** — each table's ``_CURRENT`` pointer is replaced (each flip
       individually atomic); the journal is then deleted.

    A crash between 3 and the end leaves some pointers old — run
    ``recover_multi_commits(txn_dir)`` (idempotent roll-forward) BEFORE
    admitting new writers, the same recovery-first discipline a Delta
    deployment applies to its log. Readers of any SINGLE table are never
    torn (each pointer flip is atomic); cross-table consistency during the
    crash window is exactly what the journal + recovery close."""
    if not writes:
        raise ValueError("multi_commit needs at least one write")
    dirs = [w["table_dir"] for w in writes]
    if len(set(dirs)) != len(dirs):
        raise ValueError(f"duplicate table_dir in multi_commit: {dirs}")
    preps = [
        _prepare_commit(
            w["df"],
            w["table_dir"],
            w.get("mode", "overwrite"),
            w.get("partition_by"),
            w.get("allow_schema_evolution", False),
            w.get("expected_base", _UNSET),
        )
        for w in writes
    ]
    preps.sort(key=lambda p: p.table_dir)
    os.makedirs(txn_dir, exist_ok=True)

    locks: list[int] = []
    try:
        for p in preps:
            locks.append(_acquire_lock(p.table_dir))
        entries = []
        for p in preps:
            latest = _read_current(p.table_dir)
            latest_v = latest["version"] if latest else None
            if p.check_base and latest_v != p.expected_base:
                raise ConcurrentWriteError(
                    f"base version moved on {p.table_dir}: read "
                    f"{p.expected_base}, now {latest_v}"
                )
            _write_manifest_file(p.table_dir, p.version, p.build_manifest(latest))
            entries.append(
                {"table_dir": p.table_dir, "version": p.version, "parent": latest_v}
            )

        # the commit point: one atomic journal write
        txn_path = os.path.join(txn_dir, f"{_TXN_PREFIX}{uuid.uuid4().hex}.json")
        tmp = f"{txn_path}.tmp"
        try:
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(json.dumps({"tables": entries}))
            os.replace(tmp, txn_path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

        for p in preps:
            _flip_pointer(p.table_dir, p.version)
        os.unlink(txn_path)
    finally:
        for fd in locks:
            _release_lock(fd)
    return {p.table_dir: p.version for p in preps}


def recover_multi_commits(txn_dir: str) -> list[str]:
    """Roll forward interrupted ``multi_commit`` transactions (idempotent;
    run before admitting new writers). For every journaled table: pointer
    already at the transaction's version → done; still at the recorded
    parent → flip it (the manifest file was durably written before the
    journal). Any OTHER current version means a writer committed during
    the crash window in violation of the recovery-first discipline — that
    transaction cannot be rolled forward consistently, so it raises with
    the journal left in place for inspection. Returns the table_dirs whose
    pointers were flipped."""
    if not os.path.isdir(txn_dir):
        return []
    healed: list[str] = []
    for name in sorted(os.listdir(txn_dir)):
        if not (name.startswith(_TXN_PREFIX) and name.endswith(".json")):
            continue
        path = os.path.join(txn_dir, name)
        with open(path, encoding="utf-8") as f:
            txn = json.load(f)
        flips = []
        for e in txn["tables"]:
            cur = current_version(e["table_dir"])
            if cur == e["version"]:
                continue
            if cur != e["parent"]:
                raise ConcurrentWriteError(
                    f"cannot recover {path}: {e['table_dir']} is at {cur}, "
                    f"expected {e['parent']} (pre-flip) or {e['version']} "
                    "(flipped) — a writer committed during the crash window"
                )
            flips.append(e)
        for e in flips:
            lock_fd = _acquire_lock(e["table_dir"])
            try:
                _flip_pointer(e["table_dir"], e["version"])
            finally:
                _release_lock(lock_fd)
            healed.append(e["table_dir"])
        os.unlink(path)
    return healed


def commit_replace_partitions(
    df: DataFrame,
    table_dir: str,
    partition_by: str,
    drop_unless_written: set[str] | None = None,
    expected_base: "str | None | object" = _UNSET,
) -> str:
    """Delta ``replaceWhere``-shaped commit: atomically make ``df``'s rows
    the ONLY contents of the partitions it touches, leaving all other
    partitions' bytes untouched. ``drop_unless_written`` names subdirs
    (e.g. ``{"cdc_date=2024-01-02"}``) that are REMOVED from the table if
    ``df`` produced no rows for them — the caller passes every partition
    in its rewrite window, and whichever ones the new data doesn't re-
    populate are the fully-deleted case; the actually-written set is taken
    from the committed data directory, so the caller never has to
    pre-compute (and pre-evaluate) ``df``'s partition values. The
    delete-insert incremental load's publish: cost ∝ touched partitions,
    never table size, and the swap is one pointer replace — a crash
    mid-load leaves the previous version fully readable. First commit on
    an empty table behaves like ``overwrite``. Conflicting concurrent
    commits raise ``ConcurrentWriteError``.

    ``expected_base``: the version the CALLER's table snapshot came from.
    A replace whose content derives from reading the live table (the
    delete-insert load: kept-rows ∪ rebuilt window) is a lost update if
    another commit lands between that read and this publish — pinning the
    CAS to the version actually read closes the window (the same shape
    ``commit_write`` grew ``expected_base`` for, round-6 review). Without
    it the CAS only covers the interval from this function's own manifest
    read."""
    version = uuid.uuid4().hex
    os.makedirs(os.path.join(table_dir, _MANIFEST_DIR), exist_ok=True)
    data_dir = os.path.join(table_dir, _DATA_DIR, version)

    fields = _schema_fields(df)
    part_by = [partition_by]
    prev = _read_current(table_dir)
    record_schema = fields
    if prev is not None:
        record_schema = _check_compat(
            prev, table_dir, fields, part_by, "replace-partitions"
        )
        if prev.get("partitions") is None:
            raise ValueError(
                f"{table_dir} was not committed with a single-level "
                "partition_by — no partition ownership map to swap against"
            )

    new_subdirs = _write_data_dir(df, data_dir, part_by)
    rel_dir = os.path.join(_DATA_DIR, version)

    def build_manifest(latest: dict | None) -> dict:
        parts: dict[str, list[str]] = (
            {k: list(v) for k, v in prev.get("partitions", {}).items()} if prev else {}
        )
        for p in new_subdirs:
            parts[p] = [rel_dir]  # replaced: the new dir is the sole owner
        for p in (drop_unless_written or set()) - set(new_subdirs):
            parts.pop(p, None)
        dirs = sorted({d for owners in parts.values() for d in owners})
        manifest = {
            "version": version,
            "parent": latest["version"] if latest else None,
            "dirs": dirs,
            "partitions": parts,
            "schema": record_schema,
            "partition_by": part_by,
            "ts": dt.datetime.now(dt.timezone.utc).isoformat(),
        }
        if prev and prev.get("schema_evolved"):
            manifest["schema_evolved"] = True  # older dirs still heterogeneous
        return manifest

    _publish(
        table_dir,
        version,
        build_manifest,
        expected_base=(
            (prev["version"] if prev else None)
            if expected_base is _UNSET
            else expected_base
        ),
        check_base=True,
    )
    return version


def read_table(spark: SparkSession, table_dir: str) -> DataFrame:
    """Read the live version: pointer → manifest → parquet over its dirs.

    Tables with a partition-ownership map read each version directory
    restricted to the partitions it still owns (after a
    ``commit_replace_partitions`` a directory may own only a subset of the
    partitions it physically contains); ``basePath`` recovers the partition
    column. Plain dir-list tables read their dirs wholesale."""
    manifest = _read_current(table_dir)
    if manifest is None:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    return _read_manifest_df(spark, table_dir, manifest)


def _read_manifest_df(spark: SparkSession, table_dir: str, manifest: dict) -> DataFrame:
    parts = manifest.get("partitions")
    evolved = bool(manifest.get("schema_evolved"))
    if parts is not None and not parts:  # every partition dropped
        ddl = ", ".join(f"`{n}` {t}" for n, t in manifest["schema"])
        return spark.createDataFrame([], ddl)
    if parts:
        by_dir: dict[str, list[str]] = {}
        for p, owners in parts.items():
            for d in owners:
                by_dir.setdefault(d, []).append(p)
        frames = [
            spark.read.option("basePath", os.path.join(table_dir, d)).parquet(
                *[os.path.join(table_dir, d, p) for p in sorted(ps)]
            )
            for d, ps in sorted(by_dir.items())
        ]
        out = frames[0]
        for f in frames[1:]:
            # evolved tables have additively-drifted dir schemas; missing
            # columns null-fill (the Delta/Iceberg read contract)
            out = out.unionByName(f, allowMissingColumns=evolved)
        return _canonical_order(out, manifest)
    paths = [os.path.join(table_dir, d) for d in manifest["dirs"]]
    reader = spark.read
    if evolved:
        reader = reader.option("mergeSchema", True)
    return _canonical_order(reader.parquet(*paths), manifest)


def _canonical_order(df: DataFrame, manifest: dict) -> DataFrame:
    """Project to the manifest's recorded column order: physical order
    otherwise depends on which uuid-named version dir sorts/reads first,
    which would make read-back column order nondeterministic on evolved or
    multi-dir tables."""
    schema = manifest.get("schema")
    if schema and {n for n, _ in schema} == set(df.columns):
        return df.select(*[n for n, _ in schema])
    return df


def current_version(table_dir: str) -> str | None:
    m = _read_current(table_dir)
    return m["version"] if m else None


def _committed_chain(table_dir: str) -> set | None:
    """Version ids reachable from ``_CURRENT`` via the ``parent`` links —
    the set of versions that were actually PUBLISHED. A crash between the
    manifest-file write and the pointer replace leaves an orphan
    ``<version>.json`` that was never visible to any reader; walking the
    chain excludes it (round-6 review). Returns None when the table
    predates parent links (legacy manifests: no chain to walk — every
    retained manifest is then presented, as before)."""
    current = _read_current(table_dir)
    if current is None or "parent" not in current:
        return None
    chain, node = set(), current
    while node is not None and node["version"] not in chain:
        chain.add(node["version"])
        parent = node.get("parent")
        if parent is None:
            break
        try:
            with open(_manifest_path(table_dir, parent), encoding="utf-8") as f:
                node = json.load(f)
        except FileNotFoundError:
            break  # vacuumed past this point
    return chain


def list_versions(table_dir: str) -> list[dict]:
    """Retained COMMITTED manifests, oldest first by commit timestamp
    (time-travel index; retention is governed by ``vacuum``). Orphan
    manifests from a crash before the pointer publish are excluded via the
    parent chain; manifests predating parent links are all included."""
    mdir = os.path.join(table_dir, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    chain = _committed_chain(table_dir)
    out = []
    for m in os.listdir(mdir):
        if m.endswith(".json"):
            with open(os.path.join(mdir, m), encoding="utf-8") as f:
                mf = json.load(f)
            if chain is None or mf["version"] in chain or "parent" not in mf:
                out.append(mf)
    return sorted(out, key=lambda x: x["ts"])


def read_version(spark: SparkSession, table_dir: str, version: str) -> DataFrame:
    """Time travel: read a specific retained version (manifests are immutable
    until ``vacuum`` removes the unreferenced ones). Versions that never
    published (crash-orphaned manifests off the parent chain) raise — they
    were never any reader's table state."""
    with open(_manifest_path(table_dir, version), encoding="utf-8") as f:
        manifest = json.load(f)
    chain = _committed_chain(table_dir)
    if chain is not None and "parent" in manifest and manifest["version"] not in chain:
        raise FileNotFoundError(
            f"version {version} of {table_dir} was never published "
            "(crash-orphaned commit); it is not part of the table history"
        )
    return _read_manifest_df(spark, table_dir, manifest)


def compact(spark: SparkSession, table_dir: str, target_partitions: int | None = None) -> str:
    """OPTIMIZE-style small-file compaction: rewrite the live version as one
    new version with consolidated files, committed atomically (readers see
    old or compacted, never both). Many small appends / incremental loads
    accumulate files per partition; at scale the file count — not the byte
    count — dominates scan planning time. Partitioned tables keep their
    layout (one rewrite job, same partition columns); ``target_partitions``
    coalesces unpartitioned tables (default: shuffle-partitions setting).

    Content-preserving by contract, so the publish CAS-checks against the
    version read here: a commit landing in between raises
    ``ConcurrentWriteError`` (retry the compaction) instead of being
    silently discarded — the lost-update Delta's OPTIMIZE also guards.
    """
    manifest = _read_current(table_dir)
    if manifest is None:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    df = _read_manifest_df(spark, table_dir, manifest)
    part_by = manifest.get("partition_by") or []
    if not part_by:
        df = df.coalesce(
            target_partitions
            or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        )
    return commit_write(
        df,
        table_dir,
        mode="overwrite",
        partition_by=part_by or None,
        expected_base=manifest["version"],
    )


def vacuum(table_dir: str, grace_s: float = _VACUUM_GRACE_S) -> list[str]:
    """Delete data/manifest files unreferenced by the live version (run only
    when no reader can still hold an old manifest — Delta's retention-window
    caveat applies). Returns the removed data directories.

    Concurrent-writer safety: runs under the commit lock (no publish can
    happen mid-vacuum), and additionally skips anything younger than
    ``grace_s`` — a live writer stages its data directory BEFORE taking the
    lock, so age is the only signal separating an in-flight commit's files
    from a crashed one's orphans (the same retention-window reasoning Delta
    applies). Pass ``grace_s=0`` only in single-writer tests. A table
    directory with no committed version (or that does not exist) is a
    no-op."""
    import time

    if _read_current(table_dir) is None:
        return []
    lock_fd = _acquire_lock(table_dir)
    try:
        manifest = _read_current(table_dir)
        if manifest is None:
            return []
        now = time.time()

        def old_enough(path: str) -> bool:
            try:
                return now - os.path.getmtime(path) > grace_s
            except OSError:
                return False

        live_dirs = {os.path.basename(d) for d in manifest["dirs"]}
        removed = []
        data_root = os.path.join(table_dir, _DATA_DIR)
        for d in os.listdir(data_root) if os.path.isdir(data_root) else []:
            p = os.path.join(data_root, d)
            if d not in live_dirs and old_enough(p):
                shutil.rmtree(p, ignore_errors=True)
                removed.append(d)
        for m in os.listdir(os.path.join(table_dir, _MANIFEST_DIR)):
            p = os.path.join(table_dir, _MANIFEST_DIR, m)
            if m.removesuffix(".json") != manifest["version"] and old_enough(p):
                os.remove(p)
        # stale tmp pointers from writers that crashed mid-publish
        for f in os.listdir(table_dir):
            if f.startswith(f".{_CURRENT}.") and f.endswith(".tmp") and old_enough(
                os.path.join(table_dir, f)
            ):
                os.remove(os.path.join(table_dir, f))
        return removed
    finally:
        _release_lock(lock_fd)
