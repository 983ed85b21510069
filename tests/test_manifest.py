"""Manifest-pointer commit: crash-injection atomicity, snapshot-isolated
append, vacuum (round-1 verdict item 6)."""

from __future__ import annotations

import os

import pytest

from etl_data_transformer_spark.sources import manifest as M


def _write(spark, table, rows, mode="overwrite"):
    df = spark.createDataFrame(rows, "id long, v string")
    return M.commit_write(df, table, mode=mode)


def test_commit_overwrite_and_read(spark, tmp_path):
    table = str(tmp_path / "t")
    v1 = _write(spark, table, [(1, "a")])
    assert M.current_version(table) == v1
    assert [r["v"] for r in M.read_table(spark, table).collect()] == ["a"]
    v2 = _write(spark, table, [(2, "b"), (3, "c")])
    assert M.current_version(table) == v2
    assert sorted(r["v"] for r in M.read_table(spark, table).collect()) == ["b", "c"]


def test_append_is_snapshot_isolated(spark, tmp_path):
    table = str(tmp_path / "t")
    _write(spark, table, [(1, "a")])
    # a reader resolved BEFORE the append keeps its manifest's file list
    old_df = M.read_table(spark, table)
    _write(spark, table, [(2, "b")], mode="append")
    assert sorted(r["v"] for r in M.read_table(spark, table).collect()) == ["a", "b"]
    assert [r["v"] for r in old_df.collect()] == ["a"]  # old snapshot intact


@pytest.mark.parametrize("crash_at", ["data", "manifest", "pointer"])
def test_crash_before_publish_preserves_old_version(spark, tmp_path, monkeypatch, crash_at):
    """A writer dying at ANY point before the pointer replace leaves the
    previous version fully readable; the pointer replace itself is atomic."""
    table = str(tmp_path / "t")
    v1 = _write(spark, table, [(1, "a")])

    if crash_at == "data":
        # die mid data write: break the parquet writer
        monkeypatch.setattr(
            "pyspark.sql.readwriter.DataFrameWriter.parquet",
            lambda self, path: (_ for _ in ()).throw(OSError("injected data-write crash")),
        )
    elif crash_at == "manifest":
        real_open = open

        def failing_open(path, *a, **kw):
            if isinstance(path, str) and M._MANIFEST_DIR in path and path.endswith(".json.tmp") and "w" in (a[0] if a else kw.get("mode", "r")):
                raise OSError("injected manifest-write crash")
            return real_open(path, *a, **kw)

        monkeypatch.setattr("builtins.open", failing_open)
    else:
        monkeypatch.setattr(os, "replace", lambda s, d: (_ for _ in ()).throw(OSError("injected pointer crash")))

    with pytest.raises(OSError, match="injected"):
        _write(spark, table, [(9, "torn")])
    monkeypatch.undo()

    # old version still live and readable — no torn state visible
    assert M.current_version(table) == v1
    assert [r["v"] for r in M.read_table(spark, table).collect()] == ["a"]
    # and the table recovers: a fresh commit publishes normally
    _write(spark, table, [(2, "b")])
    assert [r["v"] for r in M.read_table(spark, table).collect()] == ["b"]


def test_vacuum_removes_only_unreferenced(spark, tmp_path):
    table = str(tmp_path / "t")
    v1 = _write(spark, table, [(1, "a")])
    v2 = _write(spark, table, [(2, "b")])
    v3 = _write(spark, table, [(3, "c")], mode="append")  # references v2's dir too
    removed = M.vacuum(table, grace_s=0)
    assert removed == [v1]
    assert sorted(r["v"] for r in M.read_table(spark, table).collect()) == ["b", "c"]
    assert set(os.listdir(os.path.join(table, "data"))) == {v2, v3}


def test_append_schema_mismatch_fails_at_commit(spark, tmp_path):
    """Schema drift surfaces at append COMMIT time, not at a later read
    (round-2 advice: manifests record schema + partition columns)."""
    table = str(tmp_path / "t")
    _write(spark, table, [(1, "a")])
    drifted = spark.createDataFrame([(2.5, "b")], "id double, v string")
    with pytest.raises(ValueError, match="schema mismatch"):
        M.commit_write(drifted, table, mode="append")
    # table untouched by the failed append
    assert [r["v"] for r in M.read_table(spark, table).collect()] == ["a"]


def test_append_partitioning_mismatch_fails_at_commit(spark, tmp_path):
    table = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    M.commit_write(df, table, partition_by=["v"])
    with pytest.raises(ValueError, match="partitioning mismatch"):
        M.commit_write(df, table, mode="append")  # no partition_by


def test_concurrent_append_conflict_fails_cleanly(spark, tmp_path, monkeypatch):
    """Two-writer race: a commit that lands between an append's base-version
    read and its publish makes the append fail with ConcurrentWriteError —
    the competing writer's rows are never silently dropped."""
    table = str(tmp_path / "t")
    _write(spark, table, [(1, "a")])
    real_acquire = M._acquire_lock
    state = {"raced": False}

    def racing_acquire(td):
        if not state["raced"]:  # competing writer lands first, exactly once
            state["raced"] = True
            other = spark.createDataFrame([(99, "z")], "id long, v string")
            M.commit_write(other, td, mode="overwrite")
        return real_acquire(td)

    monkeypatch.setattr(M, "_acquire_lock", racing_acquire)
    with pytest.raises(M.ConcurrentWriteError, match="base version moved"):
        _write(spark, table, [(2, "b")], mode="append")
    monkeypatch.undo()
    # the competing overwrite is the live version, intact
    assert [r["v"] for r in M.read_table(spark, table).collect()] == ["z"]


def test_commit_lock_blocks_while_held_and_frees_on_release(spark, tmp_path):
    """flock-based commit lock: held -> ConcurrentWriteError; released (the
    kernel does this automatically when a holder dies) -> next commit
    proceeds. A leftover lock FILE alone never blocks (no flock on it)."""
    table = str(tmp_path / "t")
    _write(spark, table, [(1, "a")])
    fd = M._acquire_lock(table)  # a live writer holds the flock
    with pytest.raises(M.ConcurrentWriteError, match="lock held"):
        _write(spark, table, [(2, "b")])
    M._release_lock(fd)  # holder finished/died: kernel releases
    _write(spark, table, [(2, "b")])
    assert [r["v"] for r in M.read_table(spark, table).collect()] == ["b"]
    # an orphaned lock file without a live flock does not block
    assert os.path.exists(os.path.join(table, M._COMMIT_LOCK))
    _write(spark, table, [(3, "c")], mode="append")


def test_vacuum_missing_table_dir_is_noop(spark, tmp_path):
    assert M.vacuum(str(tmp_path / "never_created")) == []


def test_failed_publish_leaves_no_tmp_pointer(spark, tmp_path, monkeypatch):
    table = str(tmp_path / "t")
    _write(spark, table, [(1, "a")])
    monkeypatch.setattr(
        os, "replace", lambda s, d: (_ for _ in ()).throw(OSError("injected"))
    )
    with pytest.raises(OSError, match="injected"):
        _write(spark, table, [(2, "b")])
    monkeypatch.undo()
    assert not [f for f in os.listdir(table) if f.endswith(".tmp")]


def test_vacuum_removes_stale_tmp_pointers(spark, tmp_path):
    table = str(tmp_path / "t")
    _write(spark, table, [(1, "a")])
    stale = os.path.join(table, f".{M._CURRENT}.deadbeef.tmp")
    with open(stale, "w", encoding="utf-8") as f:
        f.write("deadbeef")
    M.vacuum(table, grace_s=0)
    assert not os.path.exists(stale)


def test_empty_append_keeps_partition_ownership_map(spark, tmp_path):
    """A zero-row commit on a partitioned table must not demote it to the
    wholesale-dirs layout (which would resurrect replaced partitions)."""
    table = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "p1"), (2, "p2")], "id long, pt string"
    )
    M.commit_write(df, table, partition_by=["pt"])
    repl = spark.createDataFrame([(9, "p1")], "id long, pt string")
    M.commit_replace_partitions(repl, table, partition_by="pt")
    empty = spark.createDataFrame([], "id long, pt string")
    M.commit_write(empty, table, mode="append", partition_by=["pt"])
    got = sorted((r["id"], r["pt"]) for r in M.read_table(spark, table).collect())
    assert got == [(2, "p2"), (9, "p1")]  # replace survived the empty append
    # and the table still supports partition swaps
    M.commit_replace_partitions(
        spark.createDataFrame([(5, "p2")], "id long, pt string"), table, partition_by="pt"
    )
    got = sorted((r["id"], r["pt"]) for r in M.read_table(spark, table).collect())
    assert got == [(5, "p2"), (9, "p1")]


def test_vacuum_grace_window_spares_young_orphans(spark, tmp_path):
    """vacuum must not delete a just-staged data dir (an in-flight writer
    stages BEFORE locking) — only orphans older than the grace window go."""
    table = str(tmp_path / "t")
    _write(spark, table, [(1, "a")])
    _write(spark, table, [(2, "b")])  # first version now orphaned
    assert M.vacuum(table) == []  # default grace: young orphan spared
    assert M.vacuum(table, grace_s=0) != []  # explicit zero grace removes it


def test_time_travel_reads_retained_versions(spark, tmp_path):
    table = str(tmp_path / "t")
    v1 = _write(spark, table, [(1, "a")])
    v2 = _write(spark, table, [(2, "b")], mode="append")
    assert [m["version"] for m in M.list_versions(table)] == [v1, v2]
    assert [r["v"] for r in M.read_version(spark, table, v1).collect()] == ["a"]
    assert sorted(r["v"] for r in M.read_version(spark, table, v2).collect()) == ["a", "b"]


def test_compact_consolidates_appends(spark, tmp_path):
    import glob

    table = str(tmp_path / "t")
    for i in range(4):  # four tiny appends -> four data dirs
        _write(spark, table, [(i, f"v{i}")], mode="append" if i else "overwrite")
    before = len(glob.glob(os.path.join(table, "data", "*", "*.parquet")))
    M.compact(spark, table, target_partitions=1)
    got = sorted(r["id"] for r in M.read_table(spark, table).collect())
    assert got == [0, 1, 2, 3]  # same rows
    M.vacuum(table, grace_s=0)
    after = len(glob.glob(os.path.join(table, "data", "*", "*.parquet")))
    assert after < before and after == 1  # one consolidated file


def test_compact_preserves_partition_layout(spark, tmp_path):
    table = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "p1"), (2, "p2")], "id long, pt string")
    M.commit_write(df, table, partition_by=["pt"])
    M.commit_write(
        spark.createDataFrame([(3, "p1")], "id long, pt string"),
        table, mode="append", partition_by=["pt"],
    )
    M.compact(spark, table)
    got = sorted((r["id"], r["pt"]) for r in M.read_table(spark, table).collect())
    assert got == [(1, "p1"), (2, "p2"), (3, "p1")]
    # still partition-swappable after compaction
    M.commit_replace_partitions(
        spark.createDataFrame([(9, "p2")], "id long, pt string"), table, partition_by="pt"
    )
    got = sorted((r["id"], r["pt"]) for r in M.read_table(spark, table).collect())
    assert got == [(1, "p1"), (3, "p1"), (9, "p2")]


def test_schema_evolution_additive_append(spark, tmp_path):
    """allow_schema_evolution=True accepts column ADDS: old rows null-fill
    the new column on read; type changes and drops still reject."""
    table = str(tmp_path / "t")
    _write(spark, table, [(1, "a")])
    wider = spark.createDataFrame([(2, "b", 9.5)], "id long, v string, score double")
    # rejected by default
    with pytest.raises(ValueError, match="schema mismatch"):
        M.commit_write(wider, table, mode="append")
    M.commit_write(wider, table, mode="append", allow_schema_evolution=True)
    got = {r["id"]: (r["v"], r["score"]) for r in M.read_table(spark, table).collect()}
    assert got == {1: ("a", None), 2: ("b", 9.5)}
    # a later same-width append keeps working and still merges
    M.commit_write(
        spark.createDataFrame([(3, "c", 1.0)], "id long, v string, score double"),
        table, mode="append", allow_schema_evolution=True,
    )
    assert M.read_table(spark, table).count() == 3
    # type change / drop always reject, even under evolution
    changed = spark.createDataFrame([(4.0, "d", 1.0)], "id double, v string, score double")
    with pytest.raises(ValueError, match="only supports ADDING"):
        M.commit_write(changed, table, mode="append", allow_schema_evolution=True)
    narrower = spark.createDataFrame([(5, 2.0)], "id long, score double")
    with pytest.raises(ValueError, match="only supports ADDING"):
        M.commit_write(narrower, table, mode="append", allow_schema_evolution=True)


def test_schema_evolution_partitioned_and_compact_normalizes(spark, tmp_path):
    table = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "p1")], "id long, pt string")
    M.commit_write(df, table, partition_by=["pt"])
    wider = spark.createDataFrame([(2, "p2", "en")], "id long, pt string, lang string")
    M.commit_write(wider, table, mode="append", partition_by=["pt"], allow_schema_evolution=True)
    got = {r["id"]: r["lang"] for r in M.read_table(spark, table).collect()}
    assert got == {1: None, 2: "en"}
    # compaction rewrites everything at the widened schema: flag resets
    M.compact(spark, table)
    assert M._read_current(table).get("schema_evolved") is None
    got = {r["id"]: r["lang"] for r in M.read_table(spark, table).collect()}
    assert got == {1: None, 2: "en"}


def test_commit_lock_is_cross_process(spark, tmp_path):
    """The flock is a real inter-process lock: a subprocess holding it makes
    this process's commit fail with ConcurrentWriteError; when the holder
    process EXITS (even without releasing), the kernel frees the lock."""
    import subprocess
    import sys
    import time

    table = str(tmp_path / "t")
    _write(spark, table, [(1, "a")])
    holder = subprocess.Popen(
        [
            sys.executable,
            "-c",
            (
                "import fcntl, os, sys, time\n"
                f"fd = os.open({os.path.join(table, M._COMMIT_LOCK)!r}, os.O_CREAT | os.O_WRONLY)\n"
                "fcntl.flock(fd, fcntl.LOCK_EX)\n"
                "print('locked', flush=True)\n"
                "time.sleep(30)\n"
            ),
        ],
        stdout=subprocess.PIPE,
        text=True,
    )
    try:
        assert holder.stdout.readline().strip() == "locked"
        with pytest.raises(M.ConcurrentWriteError, match="lock held"):
            _write(spark, table, [(2, "b")])
    finally:
        holder.kill()
        holder.wait()
    # holder died without unlocking: kernel released the flock
    deadline = time.time() + 10
    while True:
        try:
            _write(spark, table, [(2, "b")])
            break
        except M.ConcurrentWriteError:
            if time.time() > deadline:
                raise
            time.sleep(0.2)
    assert [r["v"] for r in M.read_table(spark, table).collect()] == ["b"]


def test_compact_conflict_detection(spark, tmp_path, monkeypatch):
    """Lost-update guard (round-3 advice, medium): a commit landing between
    compact's read of the live manifest and its publish raises
    ConcurrentWriteError instead of being silently discarded by the
    compacted overwrite — the conflict detection Delta's OPTIMIZE does."""
    table = str(tmp_path / "t")
    _write(spark, table, [(1, "a")])
    _write(spark, table, [(2, "b")], mode="append")
    real_acquire = M._acquire_lock
    state = {"raced": False}

    def racing_acquire(td):
        if not state["raced"]:  # append lands after compact read, pre-publish
            state["raced"] = True
            other = spark.createDataFrame([(99, "z")], "id long, v string")
            M.commit_write(other, td, mode="append")
        return real_acquire(td)

    monkeypatch.setattr(M, "_acquire_lock", racing_acquire)
    with pytest.raises(M.ConcurrentWriteError, match="base version moved"):
        M.compact(spark, table, target_partitions=1)
    monkeypatch.undo()
    # the racing append's rows survive; retrying the compaction succeeds
    assert sorted(r["v"] for r in M.read_table(spark, table).collect()) == ["a", "b", "z"]
    M.compact(spark, table, target_partitions=1)
    assert sorted(r["v"] for r in M.read_table(spark, table).collect()) == ["a", "b", "z"]


def test_plain_overwrite_still_skips_base_check(spark, tmp_path, monkeypatch):
    """Caller-supplied overwrites are last-writer-wins by design: only
    compact (content derived from a read) opts into the CAS check."""
    table = str(tmp_path / "t")
    _write(spark, table, [(1, "a")])
    real_acquire = M._acquire_lock
    state = {"raced": False}

    def racing_acquire(td):
        if not state["raced"]:
            state["raced"] = True
            other = spark.createDataFrame([(99, "z")], "id long, v string")
            M.commit_write(other, td, mode="overwrite")
        return real_acquire(td)

    monkeypatch.setattr(M, "_acquire_lock", racing_acquire)
    _write(spark, table, [(2, "b")])  # no ConcurrentWriteError
    monkeypatch.undo()
    assert [r["v"] for r in M.read_table(spark, table).collect()] == ["b"]


def test_manifest_json_write_is_atomic(spark, tmp_path, monkeypatch):
    """Round-3 advice (low): per-version manifest JSON goes through
    tmp + os.replace like the pointer, so a crash mid-write can't leave a
    truncated <version>.json that breaks list_versions()."""
    table = str(tmp_path / "t")
    _write(spark, table, [(1, "a")])
    real_open = open

    def torn_open(path, *a, **kw):
        if isinstance(path, str) and path.endswith(".json.tmp"):
            raise OSError("injected torn manifest write")
        return real_open(path, *a, **kw)

    monkeypatch.setattr("builtins.open", torn_open)
    with pytest.raises(OSError, match="injected torn"):
        _write(spark, table, [(2, "b")])
    monkeypatch.undo()
    # every retained manifest still parses; no tmp litter outlives the crash
    versions = M.list_versions(table)
    assert [v["version"] for v in versions] == [M.current_version(table)]
    mdir = os.path.join(table, M._MANIFEST_DIR)
    assert all(not f.endswith(".tmp") for f in os.listdir(mdir))


def test_concurrent_append_race_one_winner_loser_retries(spark, tmp_path):
    """Round-5 verdict item 8: two writers committing appends simultaneously
    from the SAME base version — exactly one must win (lock + base-version
    CAS), the loser must fail with ConcurrentWriteError WITHOUT corrupting
    the pointer, and a clean retry must then land its rows on top of the
    winner's version."""
    import threading

    table = str(tmp_path / "t")
    base = _write(spark, table, [(0, "base")])

    barrier = threading.Barrier(2)
    results: dict[str, object] = {}

    def worker(tag):
        df = spark.createDataFrame([(ord(tag), tag)], "id long, v string")
        barrier.wait()
        try:
            results[tag] = M.commit_write(df, table, mode="append")
        except M.ConcurrentWriteError as e:
            results[tag] = e

    threads = [threading.Thread(target=worker, args=(t,)) for t in ("a", "b")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    wins = [t for t, r in results.items() if isinstance(r, str)]
    losses = [t for t, r in results.items() if isinstance(r, M.ConcurrentWriteError)]
    assert len(wins) == 1 and len(losses) == 1, results
    winner, loser = wins[0], losses[0]

    # pointer and table intact: base + winner's row, nothing from the loser
    assert M.current_version(table) == results[winner]
    got = sorted(r["v"] for r in M.read_table(spark, table).collect())
    assert got == sorted(["base", winner])
    # every recorded manifest parses and the chain is consistent
    versions = [m["version"] for m in M.list_versions(table)]
    assert results[winner] in versions and base in versions

    # the loser retries cleanly against the moved base and lands on top
    df = spark.createDataFrame([(ord(loser), loser)], "id long, v string")
    v3 = M.commit_write(df, table, mode="append")
    assert M.current_version(table) == v3
    got = sorted(r["v"] for r in M.read_table(spark, table).collect())
    assert got == sorted(["base", winner, loser])
    # the loser's orphaned first-attempt data dir is vacuum-able, not live
    live = set(M.list_versions(table)[-1]["dirs"])
    assert len(live) == 3


def test_replace_partitions_expected_base_pins_reader_snapshot(spark, tmp_path):
    """Round-6 review: a replace whose content derives from a table read
    must CAS against the version READ, not against whatever is current at
    publish time — otherwise a commit landing in between is silently
    dropped by the rewrite."""
    import pytest

    from etl_data_transformer_spark.sources import manifest as M

    t = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "k long, pt string")
    M.commit_write(df, t, partition_by=["pt"])
    base = M.current_version(t)

    # an interleaving append moves the table past the reader's snapshot
    M.commit_write(
        spark.createDataFrame([(2, "a")], "k long, pt string"),
        t,
        mode="append",
        partition_by=["pt"],
    )
    with pytest.raises(M.ConcurrentWriteError, match="base version moved"):
        M.commit_replace_partitions(
            spark.createDataFrame([(9, "a")], "k long, pt string"),
            t,
            partition_by="pt",
            expected_base=base,
        )
    # pinning to the LIVE version succeeds
    M.commit_replace_partitions(
        spark.createDataFrame([(9, "a")], "k long, pt string"),
        t,
        partition_by="pt",
        expected_base=M.current_version(t),
    )
    assert {r["k"] for r in M.read_table(spark, t).collect()} == {9}


def test_append_migrates_legacy_manifest_without_partition_map(spark, tmp_path):
    """An append onto a manifest predating the partition-ownership map (and
    the schema record) must rebuild the map from the existing dirs — not
    silently hide every pre-existing row — and mark the table evolved so
    reads merge schemas."""
    import json
    import os

    from etl_data_transformer_spark.sources import manifest as M

    t = str(tmp_path / "t")
    M.commit_write(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, pt string"),
        t,
        partition_by=["pt"],
    )
    # simulate the legacy layout: strip the map + schema from the manifest
    cur = M._read_current(t)
    for key in ("partitions", "schema"):
        cur.pop(key, None)
    with open(M._manifest_path(t, cur["version"]), "w", encoding="utf-8") as f:
        json.dump(cur, f)

    M.commit_write(
        spark.createDataFrame([(3, "c")], "k long, pt string"),
        t,
        mode="append",
        partition_by=["pt"],
    )
    got = {r["k"] for r in M.read_table(spark, t).collect()}
    assert got == {1, 2, 3}  # pre-map rows still visible
    assert M._read_current(t).get("schema_evolved") is True


def test_orphan_version_excluded_from_time_travel(spark, tmp_path):
    """A manifest written but never pointer-published (crash window) must
    not appear in list_versions or be readable as table history."""
    import json
    import os

    import pytest

    from etl_data_transformer_spark.sources import manifest as M

    t = str(tmp_path / "t")
    M.commit_write(spark.createDataFrame([(1,)], "k long"), t)
    v2 = M.commit_write(
        spark.createDataFrame([(2,)], "k long"), t, mode="append"
    )
    orphan = {
        "version": "deadbeef",
        "parent": v2,
        "dirs": [],
        "schema": [["k", "bigint"]],
        "partition_by": [],
        "ts": "2999-01-01T00:00:00+00:00",
    }
    with open(M._manifest_path(t, "deadbeef"), "w", encoding="utf-8") as f:
        json.dump(orphan, f)

    versions = [m["version"] for m in M.list_versions(t)]
    assert "deadbeef" not in versions and v2 in versions and len(versions) == 2
    with pytest.raises(FileNotFoundError, match="never published"):
        M.read_version(spark, t, "deadbeef")


def test_lock_io_errors_are_not_concurrency_conflicts(spark, tmp_path, monkeypatch):
    """ENOLCK (filesystem without lock support) must surface as the real
    OSError, not masquerade as a retryable 'held by another writer'."""
    import errno

    import fcntl
    import pytest

    from etl_data_transformer_spark.sources import manifest as M

    def broken_flock(fd, op):
        raise OSError(errno.ENOLCK, "No locks available")

    monkeypatch.setattr(fcntl, "flock", broken_flock)
    with pytest.raises(OSError, match="No locks available"):
        M.commit_write(spark.createDataFrame([(1,)], "k long"), str(tmp_path / "t"))


def test_compute_watermark_corrupt_target_fails_loudly(spark, tmp_path):
    """Round-6 review: a read failure on an EXISTING target must fail the
    run, not silently degrade the watermark to 1970 (= full-history
    delete-insert)."""
    import os

    import pytest

    from etl_data_transformer_spark.plans.incremental import (
        LoadParams,
        compute_watermark,
    )

    target = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, __import__("datetime").datetime(2024, 1, 1))], "k long, cdc_ts timestamp"
    ).write.parquet(target)
    params = LoadParams(load_type="DELTA_LOAD")
    assert compute_watermark(spark, target, params).year == 2023  # 60d lookback

    for f in os.listdir(target):
        if f.endswith(".parquet"):
            with open(os.path.join(target, f), "wb") as fh:
                fh.write(b"junk")
    with pytest.raises(Exception, match="[Pp]arquet|FOOTER|footer"):
        compute_watermark(spark, target, params)
    # a genuinely absent target still falls back
    assert (
        compute_watermark(spark, str(tmp_path / "missing"), params)
        == params.minimum_date
    )


def test_multi_commit_publishes_all_tables(spark, tmp_path):
    """Happy path: one transaction lands an overwrite + an append across two
    tables; both pointers flip, the journal is gone, versions read back."""
    corpus, store = str(tmp_path / "corpus"), str(tmp_path / "store")
    txn = str(tmp_path / "_txn")
    base = _write(spark, store, [(1, "sig-a")])
    got = M.multi_commit(
        [
            {
                "df": spark.createDataFrame([(10, "doc")], "id long, v string"),
                "table_dir": corpus,
            },
            {
                "df": spark.createDataFrame([(2, "sig-b")], "id long, v string"),
                "table_dir": store,
                "mode": "append",
                "expected_base": base,
            },
        ],
        txn,
    )
    assert set(got) == {corpus, store}
    assert M.current_version(corpus) == got[corpus]
    assert M.current_version(store) == got[store]
    assert sorted(r["v"] for r in M.read_table(spark, store).collect()) == [
        "sig-a",
        "sig-b",
    ]
    assert [r["v"] for r in M.read_table(spark, corpus).collect()] == ["doc"]
    assert os.listdir(txn) == []  # journal consumed
    assert M.recover_multi_commits(txn) == []  # nothing pending


def test_multi_commit_cas_conflict_aborts_whole_txn(spark, tmp_path):
    """A lost-update conflict on ANY table aborts the transaction before a
    single pointer moves — no torn cross-table state, no journal left."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    txn = str(tmp_path / "_txn")
    va = _write(spark, a, [(1, "a1")])
    vb = _write(spark, b, [(1, "b1")])
    vb2 = _write(spark, b, [(2, "b2")], mode="append")  # b moved past vb
    with pytest.raises(M.ConcurrentWriteError, match="base version moved"):
        M.multi_commit(
            [
                {
                    "df": spark.createDataFrame([(9, "a2")], "id long, v string"),
                    "table_dir": a,
                    "mode": "append",
                    "expected_base": va,
                },
                {
                    "df": spark.createDataFrame([(9, "b3")], "id long, v string"),
                    "table_dir": b,
                    "mode": "append",
                    "expected_base": vb,  # stale: vb2 landed since
                },
            ],
            txn,
        )
    assert M.current_version(a) == va  # untouched despite its own CAS passing
    assert M.current_version(b) == vb2
    assert not os.path.isdir(txn) or os.listdir(txn) == []


def test_multi_commit_crash_between_flips_recovers(spark, tmp_path, monkeypatch):
    """THE crash-injection gate (round-6 verdict item 6): kill the writer
    after the journal + first pointer flip, before the second. The torn
    window is observable (corpus new, store old); recover_multi_commits
    rolls the store forward, deletes the journal, and is idempotent."""
    corpus, store = str(tmp_path / "corpus"), str(tmp_path / "store")
    txn = str(tmp_path / "_txn")
    v_corpus0 = _write(spark, corpus, [(1, "old-doc")])
    v_store0 = _write(spark, store, [(1, "old-sig")])

    real_flip = M._flip_pointer
    flips = {"n": 0}

    def crash_on_second(table_dir, version):
        flips["n"] += 1
        if flips["n"] == 2:
            raise RuntimeError("injected crash between pointer flips")
        real_flip(table_dir, version)

    monkeypatch.setattr(M, "_flip_pointer", crash_on_second)
    with pytest.raises(RuntimeError, match="injected crash"):
        M.multi_commit(
            [
                {
                    "df": spark.createDataFrame([(2, "new-doc")], "id long, v string"),
                    "table_dir": corpus,
                },
                {
                    "df": spark.createDataFrame([(2, "new-sig")], "id long, v string"),
                    "table_dir": store,
                },
            ],
            txn,
        )
    monkeypatch.setattr(M, "_flip_pointer", real_flip)

    # torn: sorted(table_dir) order flips corpus first → corpus new, store old
    assert M.current_version(corpus) != v_corpus0
    assert M.current_version(store) == v_store0
    assert len(os.listdir(txn)) == 1  # journal survived the crash

    healed = M.recover_multi_commits(txn)
    assert healed == [store]
    assert M.current_version(store) != v_store0
    assert [r["v"] for r in M.read_table(spark, store).collect()] == ["new-sig"]
    assert [r["v"] for r in M.read_table(spark, corpus).collect()] == ["new-doc"]
    assert os.listdir(txn) == []
    assert M.recover_multi_commits(txn) == []  # idempotent


def test_recover_multi_commits_rejects_diverged_table(spark, tmp_path, monkeypatch):
    """If a writer committed to a journaled table during the crash window
    (recovery-first discipline broken), roll-forward would clobber it —
    recovery must raise and leave the journal for inspection."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    txn = str(tmp_path / "_txn")
    _write(spark, a, [(1, "a1")])
    _write(spark, b, [(1, "b1")])

    real_flip = M._flip_pointer
    flips = {"n": 0}

    def crash_on_second(table_dir, version):
        flips["n"] += 1
        if flips["n"] == 2:
            raise RuntimeError("injected crash")
        real_flip(table_dir, version)

    monkeypatch.setattr(M, "_flip_pointer", crash_on_second)
    with pytest.raises(RuntimeError, match="injected crash"):
        M.multi_commit(
            [
                {"df": spark.createDataFrame([(2, "a2")], "id long, v string"), "table_dir": a},
                {"df": spark.createDataFrame([(2, "b2")], "id long, v string"), "table_dir": b},
            ],
            txn,
        )
    monkeypatch.setattr(M, "_flip_pointer", real_flip)

    # discipline violation: an independent commit lands on the un-flipped b
    _write(spark, b, [(3, "b-interloper")])
    with pytest.raises(M.ConcurrentWriteError, match="crash window"):
        M.recover_multi_commits(txn)
    assert len(os.listdir(txn)) == 1  # journal kept for inspection
