"""Composed incremental ingest (plans/ingest.py): exact → MinHash → SimHash
tiers against persisted stores, survivors landed, stores grown by survivor
rows only."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_data_transformer_spark.operators import dedup as DD
from etl_data_transformer_spark.plans.ingest import run_incremental_ingest


def _paths(tmp_path):
    return {k: str(tmp_path / k) for k in ("ex", "mh", "sh", "landed")}


def test_ingest_two_batches_tiers_and_stores(spark, tmp_path):
    p = _paths(tmp_path)
    kw = dict(
        exact_store=p["ex"],
        minhash_store=p["mh"],
        simhash_store=p["sh"],
        minhash_threshold=0.3,
        simhash_max_hamming=10,
        survivors_path=p["landed"],
        audit_path=str(tmp_path / "audit"),
    )
    b1 = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely different content about maritime chronometers"),
            (3, "the quick brown fox jumps over the lazy dog today"),      # exact dup of 1
            (4, "the quick brown fox jumps over the lazy dog yesterday"),  # near dup of 1
        ],
        "doc_id long, text string",
    )
    r1 = run_incremental_ingest(b1, **kw)
    assert (r1.n_batch, r1.n_after_exact, r1.n_landed) == (4, 3, 2)
    assert r1.minhash_pairs >= 1  # (1, 4) caught by the near tier

    b2 = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog today"),  # exact dup of landed 1
            (11, "the quick brown fox leaps over the lazy dog today"),  # near dup of landed 1
            (12, "an entirely novel new document about fresh things"),
            (13, "an entirely novel new document about fresh thingz"),  # near dup of in-batch 12
        ],
        "doc_id long, text string",
    )
    r2 = run_incremental_ingest(b2, **kw)
    assert r2.n_batch == 4 and r2.n_after_exact == 3  # 10 dropped by the store fp
    assert r2.n_landed == 1  # 11 and 13 dropped by near tiers

    landed = spark.read.parquet(p["landed"])
    assert sorted(r["doc_id"] for r in landed.collect()) == [1, 2, 12]

    # stores hold exactly the landed survivors' rows
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(p["ex"]).select("doc_id").collect()
    ) == [1, 2, 12]
    assert set(
        r["doc_id"] for r in spark.read.parquet(p["sh"]).select("doc_id").distinct().collect()
    ) == {1, 2, 12}

    # landed corpus has no surviving exact or near pair (the point)
    assert DD.exact_dup_groups(landed).count() == 0
    assert DD.simhash_near_dups(landed, max_hamming=10).count() == 0

    # one audit row per batch, counts mirroring the reports
    audit = spark.read.parquet(str(tmp_path / "audit")).orderBy("ingest_ts").collect()
    assert [r["n_landed"] for r in audit] == [2, 1]
    assert audit[0]["n_batch"] == 4 and audit[1]["n_after_exact"] == 3

    # empty batch is a no-op with a zeroed report
    r3 = run_incremental_ingest(
        spark.createDataFrame([], "doc_id long, text string"), **kw
    )
    assert (r3.n_batch, r3.n_landed) == (0, 0)
    assert spark.read.parquet(p["ex"]).count() == 3


def test_ingest_exact_only_and_store_corruption_propagates(spark, tmp_path):
    import pytest

    p = _paths(tmp_path)
    b = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma delta")],
        "doc_id long, text string",
    )
    r = run_incremental_ingest(b, exact_store=p["ex"])
    assert (r.n_batch, r.n_after_exact, r.n_landed) == (3, 2, 2)
    assert r.n_after_minhash is None and r.simhash_pairs is None

    # a corrupt EXISTING store must fail the batch, not silently degrade
    # to batch-only dedup (the _read_store_or_none discipline)
    for f in os.listdir(p["ex"]):
        if f.endswith(".parquet"):
            with open(os.path.join(p["ex"], f), "wb") as fh:
                fh.write(b"not a parquet file")
    with pytest.raises(Exception, match="[Pp]arquet|FOOTER|footer"):
        run_incremental_ingest(
            spark.createDataFrame([(9, "epsilon")], "doc_id long, text string"),
            exact_store=p["ex"],
        )


def test_ingest_drop_policy_store_partner_wins_regardless_of_id_order(spark, tmp_path):
    """The loser rule must not assume batch ids sort above store ids: a
    batch doc near-matching a landed doc is dropped even when its id is
    SMALLER than the landed doc's."""
    p = _paths(tmp_path)
    kw = dict(
        exact_store=p["ex"],
        minhash_store=p["mh"],
        minhash_threshold=0.3,
    )
    first = spark.createDataFrame(
        [(1000, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    assert run_incremental_ingest(first, **kw).n_landed == 1
    second = spark.createDataFrame(
        [(5, "the quick brown fox jumps over the lazy dog yesterday")],
        "doc_id long, text string",
    )
    r = run_incremental_ingest(second, **kw)
    assert r.minhash_pairs == 1 and r.n_landed == 0  # 5 loses to landed 1000


def test_ingest_review_fixes(spark, tmp_path):
    """Round-6 review regressions: metadata columns survive into the landed
    output; a rerun after a crashed partial store append recomputes the
    SAME survivors (replay healing) instead of exact-dropping the whole
    batch; empty batches still write their audit row; capped runs report
    their oversized-bucket audit; sidecar mismatches and streaming-layout
    stores fail BEFORE any sink commits."""
    import pytest

    p = _paths(tmp_path)
    audit = str(tmp_path / "audit")
    b1 = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today", "web", 0.9),
            (2, "the quick brown fox jumps over the lazy dog today", "web", 0.2),
        ],
        "doc_id long, text string, source string, quality double",
    )
    kw = dict(exact_store=p["ex"], survivors_path=p["landed"], audit_path=audit)
    r = run_incremental_ingest(b1, **kw)
    assert r.n_landed == 1
    landed = spark.read.parquet(p["landed"])
    assert set(landed.columns) == {"doc_id", "text", "source", "quality"}  # metadata kept
    assert landed.first()["source"] == "web"

    # replay healing: simulate a crashed prior attempt that appended the
    # NEXT batch's fingerprints before dying — the rerun must not see its
    # own rows in the store and drop everything
    b2 = spark.createDataFrame(
        [(10, "a genuinely new document", "web", 0.5)],
        "doc_id long, text string, source string, quality double",
    )
    DD.write_exact_store(DD.exact_fingerprint_store(b2), p["ex"])  # partial crash artifact
    r2 = run_incremental_ingest(b2, **kw)
    assert r2.n_landed == 1  # healed, not exact-dropped

    # empty batch: zeroed report AND an audit row
    n_audit = spark.read.parquet(audit).count()
    run_incremental_ingest(b2.limit(0), **kw)
    assert spark.read.parquet(audit).count() == n_audit + 1

    # capped run reports its oversized-bucket audit
    boiler = spark.createDataFrame(
        [
            (100 + i, f"same exact boilerplate text repeated everywhere ok {i}")
            for i in range(30)
        ],
        "doc_id long, text string",
    )
    r3 = run_incremental_ingest(
        boiler,
        exact_store=str(tmp_path / "ex2"),
        minhash_store=str(tmp_path / "mh2"),
        simhash_store=str(tmp_path / "sh2"),
        max_bucket_size=5,
    )
    assert r3.minhash_capped_buckets > 0 and r3.simhash_capped_buckets > 0
    assert r3.minhash_pairs == 0  # the degenerate bucket was capped away

    # sidecar mismatch fails up front, before ANY sink: landed output and
    # exact store are untouched by the failed run
    n_landed_rows = spark.read.parquet(p["landed"]).count()
    n_ex_rows = spark.read.parquet(p["ex"]).count()
    DD.write_minhash_store(
        DD.minhash_signature_store(b1, num_hashes=8, bands=4), str(tmp_path / "mh3"),
        num_hashes=8, bands=4,
    )
    with pytest.raises(ValueError, match="parameter mismatch"):
        run_incremental_ingest(
            spark.createDataFrame([(50, "x y z", "w", 0.1)], b1.schema),
            exact_store=p["ex"],
            minhash_store=str(tmp_path / "mh3"),  # built with 8/4, caller uses 12/4
            survivors_path=p["landed"],
        )
    assert spark.read.parquet(p["landed"]).count() == n_landed_rows
    assert spark.read.parquet(p["ex"]).count() == n_ex_rows

    # streaming-layout store rejected up front
    stream_store = str(tmp_path / "stream_ex")
    DD.exact_fingerprint_store(b1).withColumn("__batch_id", F.lit("t-0")).write.partitionBy(
        "__batch_id"
    ).parquet(stream_store)
    with pytest.raises(ValueError, match="streaming"):
        run_incremental_ingest(b2, exact_store=stream_store)


def test_audit_layout_and_schema_guards(spark, tmp_path):
    """Round-6 review: batch audit appends reject streaming-layout and
    schema-drifted audit tables; the cross-doc line-removal plan reuses one
    explode exchange for both census and probe sides."""
    import pytest

    from etl_data_transformer_spark.plans.ingest import (
        IngestReport,
        ingest_audit_row,
        write_ingest_audit,
    )

    rep = IngestReport(1, 1, None, None, 1, None, None)
    # streaming-layout audit dir rejects a flat batch append
    stream_audit = str(tmp_path / "stream_audit")
    ingest_audit_row(spark, rep).withColumn("__batch_id", F.lit("t-0")).write.partitionBy(
        "__batch_id"
    ).parquet(stream_audit)
    with pytest.raises(ValueError, match="streaming"):
        write_ingest_audit(spark, stream_audit, rep)

    # column drift rejects instead of mixing schemas
    drifted = str(tmp_path / "drifted_audit")
    ingest_audit_row(spark, rep).drop("simhash_capped_buckets").write.parquet(drifted)
    with pytest.raises(ValueError, match="columns"):
        write_ingest_audit(spark, drifted, rep)

    # a matching existing table appends fine
    ok = str(tmp_path / "ok_audit")
    write_ingest_audit(spark, ok, rep)
    write_ingest_audit(spark, ok, rep)
    assert spark.read.parquet(ok).count() == 2


def test_stream_ingest_rejects_flat_audit_table(spark, tmp_path):
    import pytest

    from etl_data_transformer_spark.plans.ingest import IngestReport, write_ingest_audit
    from etl_data_transformer_spark.streaming.pipeline import stream_ingest

    src = str(tmp_path / "src")
    audit = str(tmp_path / "audit")
    write_ingest_audit(spark, audit, IngestReport(1, 1, None, None, 1, None, None))
    spark.createDataFrame([(1, "text one")], "doc_id long, text string").write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    with pytest.raises(Exception, match="flat"):
        stream_ingest(
            stream,
            str(tmp_path / "landed"),
            str(tmp_path / "ckpt"),
            exact_store=str(tmp_path / "ex"),
            audit_path=audit,
        )


def test_boilerplate_materialized_lines_equivalent(spark):
    """materialize_lines=True (one localCheckpoint'd explode feeding both
    the census and the probe) returns exactly the two-scan default's
    output — the knob for expensive upstream subplans."""
    from etl_data_transformer_spark.operators.curation import drop_boilerplate_lines

    df = spark.createDataFrame(
        [(i, f"unique {i}\nshared footer line here") for i in range(20)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, drop_boilerplate_lines(df, min_docs=5).collect()))
    b = sorted(
        map(
            tuple,
            drop_boilerplate_lines(df, min_docs=5, materialize_lines=True).collect(),
        )
    )
    assert a == b and len(a) == 20


def test_ingest_crash_between_sinks_rerun_heals(spark, tmp_path, monkeypatch):
    """Round-6 verdict item 6 (crash-injection): kill the ingest between the
    corpus commit and a store commit; rerunning the SAME batch must converge
    every sink to exactly-once state — survivors landed once, each store
    holding exactly the landed ids, no ghost or duplicate rows. A rerun of a
    FULLY successful batch is likewise a sink no-op."""
    import pytest

    from etl_data_transformer_spark.plans import ingest as ING

    p = _paths(tmp_path)
    kw = dict(
        exact_store=p["ex"],
        minhash_store=p["mh"],
        simhash_store=p["sh"],
        survivors_path=p["landed"],
        audit_path=str(tmp_path / "audit"),
    )
    batch = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely different content about maritime chronometers"),
            (3, "the quick brown fox jumps over the lazy dog today"),  # exact dup of 1
        ],
        "doc_id long, text string",
    )

    # crash AFTER survivors + exact store committed, BEFORE the minhash
    # store commit (the torn multi-sink state the verdict describes)
    real_write_minhash = DD.write_minhash_store

    def _boom(*a, **k):
        raise RuntimeError("injected crash between sink commits")

    monkeypatch.setattr(DD, "write_minhash_store", _boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        run_incremental_ingest(batch, **kw)
    monkeypatch.setattr(DD, "write_minhash_store", real_write_minhash)

    # torn state: corpus + exact store ahead, minhash/simhash stores absent
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(p["landed"]).collect()
    ) == [1, 2]
    assert spark.read.parquet(p["ex"]).count() == 2
    assert not os.path.exists(os.path.join(p["mh"], "_SUCCESS"))

    # documented recovery: rerun the same batch
    r = run_incremental_ingest(batch, **kw)
    assert r.n_landed == 2

    landed = spark.read.parquet(p["landed"])
    assert sorted(r["doc_id"] for r in landed.collect()) == [1, 2]  # no dup append
    assert spark.read.parquet(p["ex"]).count() == 2  # exact store healed, not doubled
    assert sorted(
        r["doc_id"]
        for r in spark.read.parquet(p["mh"]).select("doc_id").distinct().collect()
    ) == [1, 2]
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(p["sh"]).collect()
    ) == [1, 2]

    # rerunning the fully successful batch is a sink no-op everywhere
    counts = {k: spark.read.parquet(p[k]).count() for k in p}
    r2 = run_incremental_ingest(batch, **kw)
    assert r2.n_landed == 2
    assert {k: spark.read.parquet(p[k]).count() for k in p} == counts


def test_stream_ingest_flat_audit_fails_before_any_sink(spark, tmp_path):
    """The flat-audit-layout guard runs BEFORE any sink commits (round-7
    review): the failed batch must leave no landed corpus and no store
    partitions behind."""
    import os

    import pytest

    from etl_data_transformer_spark.plans.ingest import IngestReport, write_ingest_audit
    from etl_data_transformer_spark.streaming.pipeline import stream_ingest

    src = str(tmp_path / "src")
    audit = str(tmp_path / "audit")
    landed = str(tmp_path / "landed")
    ex = str(tmp_path / "ex")
    write_ingest_audit(spark, audit, IngestReport(1, 1, None, None, 1, None, None))
    spark.createDataFrame([(1, "text one")], "doc_id long, text string").write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    with pytest.raises(Exception, match="flat"):
        stream_ingest(
            stream,
            landed,
            str(tmp_path / "ckpt"),
            exact_store=ex,
            audit_path=audit,
        )
    assert not os.path.isdir(landed)
    # the exact store dir may hold only its sidecar (written-or-validated
    # up front by design) but no data partitions
    if os.path.isdir(ex):
        assert all(e.startswith("_") for e in os.listdir(ex))


def test_stream_ingest_empty_batch_writes_zero_audit_row(spark, tmp_path):
    """An empty micro-batch writes an all-zero audit row (the batch
    runner's never-silent contract) so audit consumers can tell an empty
    ingest from one that never ran (round-7 review)."""
    from etl_data_transformer_spark.streaming.pipeline import stream_ingest

    schema = "doc_id long, text string"
    src = str(tmp_path / "src")
    audit = str(tmp_path / "audit")
    # an empty parquet source -> one empty micro-batch under AvailableNow
    spark.createDataFrame([], schema).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    stream_ingest(
        stream,
        str(tmp_path / "landed"),
        str(tmp_path / "ckpt"),
        exact_store=str(tmp_path / "ex"),
        audit_path=audit,
    )
    rows = spark.read.parquet(audit).collect()
    assert len(rows) == 1 and rows[0]["n_batch"] == 0 and rows[0]["n_landed"] == 0


# ------------------------------------------------- atomic (manifest) mode ----


def _txn_kw(tmp_path):
    return dict(
        corpus_table=str(tmp_path / "corpus"),
        exact_table=str(tmp_path / "ex"),
        minhash_table=str(tmp_path / "mh"),
        simhash_table=str(tmp_path / "sh"),
        audit_table=str(tmp_path / "audit"),
        txn_dir=str(tmp_path / "_txns"),
        minhash_threshold=0.3,
        simhash_max_hamming=10,
    )


def _b1(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely different content about maritime chronometers"),
            (3, "the quick brown fox jumps over the lazy dog today"),      # exact dup of 1
            (4, "the quick brown fox jumps over the lazy dog yesterday"),  # near dup of 1
        ],
        "doc_id long, text string",
    )


def _b2(spark):
    return spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog today"),  # exact dup of landed 1
            (11, "the quick brown fox leaps over the lazy dog today"),  # near dup of landed 1
            (12, "an entirely novel new document about fresh things"),
        ],
        "doc_id long, text string",
    )


def test_ingest_txn_two_batches_matches_parquet_mode(spark, tmp_path):
    """The atomic mode lands the same survivors / store rows / audit counts
    as the plain-parquet runner on the same two batches (tier body is
    shared; only the publication protocol differs)."""
    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest_txn
    from etl_data_transformer_spark.sources import manifest as MF

    kw = _txn_kw(tmp_path)
    r1 = run_incremental_ingest_txn(_b1(spark), **kw)
    assert (r1.n_batch, r1.n_after_exact, r1.n_landed) == (4, 3, 2)
    r2 = run_incremental_ingest_txn(_b2(spark), **kw)
    assert (r2.n_batch, r2.n_after_exact, r2.n_landed) == (3, 2, 1)

    corpus = MF.read_table(spark, kw["corpus_table"])
    assert sorted(r["doc_id"] for r in corpus.collect()) == [1, 2, 12]
    assert sorted(
        r["doc_id"] for r in MF.read_table(spark, kw["exact_table"]).collect()
    ) == [1, 2, 12]
    assert {
        r["doc_id"]
        for r in MF.read_table(spark, kw["simhash_table"]).select("doc_id").collect()
    } == {1, 2, 12}
    audit = MF.read_table(spark, kw["audit_table"]).orderBy("ingest_ts").collect()
    assert [r["n_landed"] for r in audit] == [2, 1]
    # no leftover journal: both transactions completed
    assert not [
        f for f in os.listdir(kw["txn_dir"]) if f.startswith("txn_")
    ]

    # empty batch: zeroed report, one audit row, no data movement
    r3 = run_incremental_ingest_txn(
        spark.createDataFrame([], "doc_id long, text string"), **kw
    )
    assert (r3.n_batch, r3.n_landed) == (0, 0)
    assert MF.read_table(spark, kw["corpus_table"]).count() == 3
    assert MF.read_table(spark, kw["audit_table"]).count() == 3


def test_ingest_txn_crash_before_journal_publishes_nothing(spark, tmp_path, monkeypatch):
    """Kill the transaction in phase 2 (manifest files staged, journal not
    yet written): NO table publishes — the corpus cannot run ahead of its
    stores — and the rerun lands everything exactly once."""
    import pytest

    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest_txn
    from etl_data_transformer_spark.sources import manifest as MF

    kw = _txn_kw(tmp_path)
    run_incremental_ingest_txn(_b1(spark), **kw)

    real = MF._write_manifest_file
    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        if calls["n"] == 3:  # die mid-validate, some manifests staged
            raise RuntimeError("injected crash before journal")
        return real(*a, **k)

    monkeypatch.setattr(MF, "_write_manifest_file", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        run_incremental_ingest_txn(_b2(spark), **kw)
    monkeypatch.setattr(MF, "_write_manifest_file", real)

    # nothing from batch 2 is visible anywhere
    assert sorted(
        r["doc_id"] for r in MF.read_table(spark, kw["corpus_table"]).collect()
    ) == [1, 2]
    assert sorted(
        r["doc_id"] for r in MF.read_table(spark, kw["exact_table"]).collect()
    ) == [1, 2]
    assert MF.read_table(spark, kw["audit_table"]).count() == 1

    # rerun: same survivors, landed exactly once
    r2 = run_incremental_ingest_txn(_b2(spark), **kw)
    assert r2.n_landed == 1
    assert sorted(
        r["doc_id"] for r in MF.read_table(spark, kw["corpus_table"]).collect()
    ) == [1, 2, 12]


def test_ingest_txn_crash_between_journal_and_flip_recovers(spark, tmp_path, monkeypatch):
    """Kill the transaction AFTER the journal write, BEFORE any pointer
    flip: the journal makes it redoable — the next run's recovery-first
    pass rolls every table forward, and the rerun's guards then append
    nothing (idempotent convergence)."""
    import pytest

    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest_txn
    from etl_data_transformer_spark.sources import manifest as MF

    kw = _txn_kw(tmp_path)
    run_incremental_ingest_txn(_b1(spark), **kw)

    real_flip = MF._flip_pointer

    def boom(*a, **k):
        raise RuntimeError("injected crash before flip")

    monkeypatch.setattr(MF, "_flip_pointer", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        run_incremental_ingest_txn(_b2(spark), **kw)
    monkeypatch.setattr(MF, "_flip_pointer", real_flip)

    # the journal survived the crash; pointers are stale (batch 2 invisible)
    assert [f for f in os.listdir(kw["txn_dir"]) if f.startswith("txn_")]
    assert sorted(
        r["doc_id"] for r in MF.read_table(spark, kw["corpus_table"]).collect()
    ) == [1, 2]

    # explicit recovery heals every table to the journaled versions
    healed = MF.recover_multi_commits(kw["txn_dir"])
    assert len(healed) == 5
    assert sorted(
        r["doc_id"] for r in MF.read_table(spark, kw["corpus_table"]).collect()
    ) == [1, 2, 12]
    assert sorted(
        r["doc_id"] for r in MF.read_table(spark, kw["exact_table"]).collect()
    ) == [1, 2, 12]
    assert MF.read_table(spark, kw["audit_table"]).count() == 2

    # rerunning the recovered batch appends NO data anywhere (one more
    # audit row — log semantics), and store rows stay unique per id
    r2 = run_incremental_ingest_txn(_b2(spark), **kw)
    assert r2.n_landed == 1
    assert sorted(
        r["doc_id"] for r in MF.read_table(spark, kw["corpus_table"]).collect()
    ) == [1, 2, 12]
    ex = MF.read_table(spark, kw["exact_table"])
    assert ex.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    assert MF.read_table(spark, kw["audit_table"]).count() == 3


def test_ingest_txn_recovery_first_heals_implicitly(spark, tmp_path, monkeypatch):
    """The rerun itself (not an explicit recover call) heals a journaled
    half-flipped transaction: run_incremental_ingest_txn recovers before
    reading any table, so the rerun sees the COMMITTED state."""
    import pytest

    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest_txn
    from etl_data_transformer_spark.sources import manifest as MF

    kw = _txn_kw(tmp_path)
    real_flip = MF._flip_pointer
    flips = {"n": 0}

    def boom(*a, **k):
        flips["n"] += 1
        if flips["n"] == 2:  # first table flipped, rest stale: TORN state
            raise RuntimeError("injected crash mid-flip")
        return real_flip(*a, **k)

    monkeypatch.setattr(MF, "_flip_pointer", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        run_incremental_ingest_txn(_b1(spark), **kw)
    monkeypatch.setattr(MF, "_flip_pointer", real_flip)

    # rerun: recovery-first rolls the torn transaction forward, then the
    # healed reads + guards make the rerun a data no-op
    r = run_incremental_ingest_txn(_b1(spark), **kw)
    assert r.n_batch == 4 and r.n_landed == 2
    assert sorted(
        r["doc_id"] for r in MF.read_table(spark, kw["corpus_table"]).collect()
    ) == [1, 2]
    ex = MF.read_table(spark, kw["exact_table"])
    assert ex.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    assert not [f for f in os.listdir(kw["txn_dir"]) if f.startswith("txn_")]

# ------------------------------------------- passage-REWRITE tier (round-9) --


def test_ingest_passage_tier_two_batches_cross_batch_mask(spark, tmp_path):
    """The composed ingest's opt-in rewrite stage: batch-1 survivors land
    with their in-batch duplicated passages masked; a batch-2 document
    repeating a batch-1 passage ONCE is masked purely via the persisted
    count store (cross-batch mass); the audit rows carry the masked-token
    counts; a rerun of a completed batch changes nothing (fingerprint
    partition overwrite + own-partition-excluded read)."""
    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest

    kw = dict(
        exact_store=str(tmp_path / "ex"),
        survivors_path=str(tmp_path / "landed"),
        audit_path=str(tmp_path / "audit"),
        passage_store=str(tmp_path / "pg"),
        passage_window=3,
    )
    b1 = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta unique one tail"),
            (2, "prefix alpha beta gamma delta other two"),
            (3, "totally fresh content nothing repeated here"),
        ],
        "doc_id long, text string",
    )
    r1 = run_incremental_ingest(b1, **kw)
    assert (r1.n_batch, r1.n_landed) == (3, 3)  # rewrite never drops docs
    assert (r1.passage_tokens_removed, r1.passage_docs_touched) == (8, 2)
    landed = {r["doc_id"]: r["text"] for r in spark.read.parquet(kw["survivors_path"]).collect()}
    assert landed[1] == "unique one tail"
    assert landed[2] == "prefix other two"
    assert landed[3] == "totally fresh content nothing repeated here"

    b2 = spark.createDataFrame(
        [
            (10, "intro alpha beta gamma delta closing words"),
            (11, "clean batch two document with fresh text"),
        ],
        "doc_id long, text string",
    )
    r2 = run_incremental_ingest(b2, **kw)
    # doc 10's passage occurs ONCE in batch 2 — only the store's counts
    # (from batch 1's ORIGINAL text) push it over min_count
    assert (r2.passage_tokens_removed, r2.passage_docs_touched) == (4, 1)
    landed = {r["doc_id"]: r["text"] for r in spark.read.parquet(kw["survivors_path"]).collect()}
    assert landed[10] == "intro closing words"
    assert landed[11] == "clean batch two document with fresh text"

    # audit rows carry the new columns
    audit = spark.read.parquet(kw["audit_path"]).orderBy("ingest_ts").collect()
    assert [r["passage_tokens_removed"] for r in audit] == [8, 4]
    assert [r["passage_docs_touched"] for r in audit] == [2, 1]

    # count store: one fingerprint partition per batch, counts summed on read
    store = spark.read.parquet(kw["passage_store"])
    assert store.select("__batch_id").distinct().count() == 2
    total_before = {r["h"]: r["c"] for r in store.groupBy("h").agg(F.sum("c").alias("c")).collect()}

    # rerun of the COMPLETED batch 2: corpus append empties (id anti-join),
    # the count partition overwrites with identical rows, the mask (own
    # partition excluded on read) reproduces the same stats
    r2b = run_incremental_ingest(b2, **kw)
    assert (r2b.passage_tokens_removed, r2b.passage_docs_touched) == (4, 1)
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(kw["survivors_path"]).collect()
    ) == [1, 2, 3, 10, 11]
    store2 = spark.read.parquet(kw["passage_store"])
    total_after = {r["h"]: r["c"] for r in store2.groupBy("h").agg(F.sum("c").alias("c")).collect()}
    assert total_after == total_before


def test_ingest_passage_tier_counts_exclude_dropped_docs(spark, tmp_path):
    """Dropped whole-doc duplicates must not contribute window mass: an
    exact dup pair contributes its windows ONCE (the survivor's), so a
    later single occurrence of the same passage is NOT masked (count
    store holds 1, batch adds 1, threshold 2 needs both)."""
    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest

    kw = dict(
        exact_store=str(tmp_path / "ex"),
        survivors_path=str(tmp_path / "landed"),
        passage_store=str(tmp_path / "pg"),
        passage_window=4,
    )
    b1 = spark.createDataFrame(
        [
            (1, "shared passage alpha beta unique closing"),
            (2, "shared passage alpha beta unique closing"),  # exact dup: dropped
        ],
        "doc_id long, text string",
    )
    r1 = run_incremental_ingest(b1, **kw)
    assert r1.n_landed == 1
    assert r1.passage_tokens_removed == 0  # survivor's windows are unique now

    b2 = spark.createDataFrame(
        [(10, "prefix shared passage alpha beta and more")],
        "doc_id long, text string",
    )
    r2 = run_incremental_ingest(b2, **kw)
    # store holds 1 occurrence of 'shared passage alpha beta'; batch adds
    # 1 -> total 2 -> masked in doc 10 (but doc 1 landed un-rewritten:
    # forward-only contract)
    assert r2.passage_tokens_removed > 0
    landed = {r["doc_id"]: r["text"] for r in spark.read.parquet(kw["survivors_path"]).collect()}
    assert "shared passage alpha beta" not in landed[10]
    assert landed[1] == "shared passage alpha beta unique closing"


def test_ingest_txn_passage_tier_atomic_and_crash(spark, tmp_path, monkeypatch):
    """TXN mode with the passage tier: corpus + stores + passage counts +
    audit flip through ONE journal; a crash before any flip publishes
    nothing new; recovery rolls all SIX tables forward; the rerun's
    guarded count append lands nothing (totals stable, one __fp per
    batch)."""
    import pytest

    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest_txn
    from etl_data_transformer_spark.sources import manifest as MF

    kw = _txn_kw(tmp_path)
    kw["passage_table"] = str(tmp_path / "pg")
    kw["passage_window"] = 3

    pb1 = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta unique one tail"),
            (2, "prefix alpha beta gamma delta other two"),
        ],
        "doc_id long, text string",
    )
    pb2 = spark.createDataFrame(
        [(10, "intro alpha beta gamma delta closing words")],
        "doc_id long, text string",
    )
    r1 = run_incremental_ingest_txn(pb1, **kw)
    assert (r1.passage_tokens_removed, r1.passage_docs_touched) == (8, 2)
    corpus = {r["doc_id"]: r["text"] for r in MF.read_table(spark, kw["corpus_table"]).collect()}
    assert corpus[1] == "unique one tail" and corpus[2] == "prefix other two"
    counts1 = {
        r["h"]: r["c"]
        for r in MF.read_table(spark, kw["passage_table"])
        .groupBy("h").agg(F.sum("c").alias("c")).collect()
    }

    # crash batch 2 after the journal, before any flip
    real_flip = MF._flip_pointer

    def boom(*a, **k):
        raise RuntimeError("injected crash before flip")

    monkeypatch.setattr(MF, "_flip_pointer", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        run_incremental_ingest_txn(pb2, **kw)
    monkeypatch.setattr(MF, "_flip_pointer", real_flip)

    # torn state invisible: corpus AND passage counts still at batch 1
    assert MF.read_table(spark, kw["corpus_table"]).count() == 2
    assert {
        r["h"]: r["c"]
        for r in MF.read_table(spark, kw["passage_table"])
        .groupBy("h").agg(F.sum("c").alias("c")).collect()
    } == counts1

    # rerun: recovery-first rolls ALL tables forward (6 sinks journaled),
    # then the guards land nothing twice
    r2 = run_incremental_ingest_txn(pb2, **kw)
    assert (r2.passage_tokens_removed, r2.passage_docs_touched) == (4, 1)
    corpus = {r["doc_id"]: r["text"] for r in MF.read_table(spark, kw["corpus_table"]).collect()}
    assert corpus[10] == "intro closing words"
    pg = MF.read_table(spark, kw["passage_table"])
    # exactly one fingerprint per batch — the committed-rerun guard kept
    # the recovered append from doubling
    assert pg.select("__fp").distinct().count() == 2

    # rerun of the now-committed batch 2 once more: data no-op everywhere
    totals = {
        r["h"]: r["c"] for r in pg.groupBy("h").agg(F.sum("c").alias("c")).collect()
    }
    r2c = run_incremental_ingest_txn(pb2, **kw)
    assert (r2c.passage_tokens_removed, r2c.passage_docs_touched) == (4, 1)
    assert {
        r["h"]: r["c"]
        for r in MF.read_table(spark, kw["passage_table"])
        .groupBy("h").agg(F.sum("c").alias("c")).collect()
    } == totals
    assert MF.read_table(spark, kw["corpus_table"]).count() == 3


def test_ingest_minhash_tier_through_bucketed_store(spark, tmp_path):
    """Round-9 review: the composed ingest must accept — and append back
    in kind to — a bucketed MinHash store. Same two batches as the flat
    e2e; identical drops; the store keeps its bucketed layout (catalog
    read carries the bucket spec)."""
    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest

    mh = str(tmp_path / "mh_bucketed")
    # seed the store in the bucketed layout (empty-but-labeled: sidecar
    # only) by writing batch 0 rows explicitly
    seed = spark.createDataFrame(
        [(500, "seed corpus document alpha beta gamma")], "doc_id long, text string"
    )
    DD.write_minhash_store(
        DD.minhash_signature_store(seed), mh, mode="overwrite", bucket_by_band=True,
        num_buckets=4,
    )
    kw = dict(
        exact_store=str(tmp_path / "ex"),
        minhash_store=mh,
        minhash_threshold=0.3,
        survivors_path=str(tmp_path / "landed"),
    )
    b1 = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog yesterday"),  # near dup of 1
            (3, "totally different content here entirely"),
        ],
        "doc_id long, text string",
    )
    r1 = run_incremental_ingest(b1, **kw)
    assert r1.n_landed == 2 and r1.minhash_pairs >= 1
    b2 = spark.createDataFrame(
        [(10, "the quick brown fox leaps over the lazy dog today")],  # near dup of landed 1
        "doc_id long, text string",
    )
    r2 = run_incremental_ingest(b2, **kw)
    assert r2.n_landed == 0  # dropped via the BUCKETED store's signatures
    # the store stayed bucketed and holds seed + landed survivors
    assert DD.minhash_store_bucket_spec(mh) == ("sig", 4)
    ids = {r["doc_id"] for r in DD.read_minhash_store(spark, mh).select("doc_id").collect()}
    assert ids == {500, 1, 3}


def test_ingest_txn_rejects_bucketed_minhash_table(spark, tmp_path):
    import pytest

    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest_txn

    mh = str(tmp_path / "mh_b")
    DD.write_minhash_store(
        DD.minhash_signature_store(
            spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
        ),
        mh,
        mode="overwrite",
        bucket_by_band=True,
    )
    with pytest.raises(ValueError, match="BUCKETED"):
        run_incremental_ingest_txn(
            spark.createDataFrame([(2, "x y z w")], "doc_id long, text string"),
            corpus_table=str(tmp_path / "corpus"),
            exact_table=str(tmp_path / "ex"),
            minhash_table=mh,
            txn_dir=str(tmp_path / "_txns"),
        )


def test_ingest_passage_tier_null_id_survivor_not_dropped(spark, tmp_path):
    """Round-9 review: a NULL-id survivor cannot join the id-keyed mask
    pipeline — it must still LAND (original text) instead of silently
    vanishing from the rewrite join."""
    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest

    kw = dict(
        exact_store=str(tmp_path / "ex"),
        survivors_path=str(tmp_path / "landed"),
        passage_store=str(tmp_path / "pg"),
        passage_window=3,
    )
    b = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta unique one"),
            (2, "prefix alpha beta gamma delta two"),
            (None, "null id document passes through untouched"),
        ],
        "doc_id long, text string",
    )
    r = run_incremental_ingest(b, **kw)
    assert r.n_landed == 3
    landed = spark.read.parquet(kw["survivors_path"]).collect()
    assert len(landed) == 3
    by_id = {r["doc_id"]: r["text"] for r in landed}
    assert by_id[None] == "null id document passes through untouched"
    assert by_id[1] == "unique one"  # masking still works for keyed docs


# ------------------------------- eval decontamination in the ingest (round-9) --


def _eval_store(spark, path, texts, window):
    """Build a flat eval-corpus window store the decon tier reads."""
    from etl_data_transformer_spark.operators.curation import (
        passage_count_store,
        write_passage_store,
    )

    ev = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    write_passage_store(
        passage_count_store(ev, window=window), path, window=window, mode="overwrite"
    )


def test_ingest_decon_only_rewrite(spark, tmp_path):
    """decon_store WITHOUT passage_store: a single eval occurrence masks
    (no >= min_count threshold), untouched docs pass through canonicalized,
    the audit counters cover the mask, and the output equals calling
    decontaminate_passages directly."""
    from etl_data_transformer_spark.operators.curation import decontaminate_passages
    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest

    ev_path = str(tmp_path / "eval_pg")
    _eval_store(spark, ev_path, ["leaked benchmark question answer"], window=3)
    kw = dict(
        exact_store=str(tmp_path / "ex"),
        survivors_path=str(tmp_path / "landed"),
        audit_path=str(tmp_path / "audit"),
        decon_store=ev_path,
        passage_window=3,
    )
    b = spark.createDataFrame(
        [
            (1, "intro leaked benchmark question answer outro"),
            (2, "clean document totally unrelated prose here"),
        ],
        "doc_id long, text string",
    )
    r = run_incremental_ingest(b, **kw)
    assert (r.n_batch, r.n_landed) == (2, 2)
    assert (r.passage_tokens_removed, r.passage_docs_touched) == (4, 1)
    landed = {x["doc_id"]: x["text"] for x in spark.read.parquet(kw["survivors_path"]).collect()}
    assert landed[1] == "intro outro"
    assert landed[2] == "clean document totally unrelated prose here"
    # audit row carries the combined-mask counters even without the dedup tier
    audit = spark.read.parquet(kw["audit_path"]).collect()
    assert [x["passage_tokens_removed"] for x in audit] == [4]
    # equals the standalone operator over the same store
    store = spark.read.parquet(ev_path)
    direct = {
        x["doc_id"]: x["clean_text"]
        for x in decontaminate_passages(b, store=store, window=3).collect()
    }
    assert direct == landed
    # rerun of the completed batch: landed set unchanged (id anti-join guard)
    r2 = run_incremental_ingest(b, **kw)
    assert (r2.passage_tokens_removed, r2.passage_docs_touched) == (4, 1)
    assert sorted(
        x["doc_id"] for x in spark.read.parquet(kw["survivors_path"]).collect()
    ) == [1, 2]


def test_ingest_combined_dedup_and_decon_mask(spark, tmp_path):
    """passage_store + decon_store together: ONE rewrite masks both the
    >= min_count duplicated passages AND single-occurrence eval windows;
    the count store still grows (cross-batch dedup keeps working); a
    window-length mismatch between the eval store and passage_window fails
    before any sink."""
    import pytest

    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest

    ev_path = str(tmp_path / "eval_pg")
    _eval_store(spark, ev_path, ["secret eval passage xyz"], window=3)
    kw = dict(
        exact_store=str(tmp_path / "ex"),
        survivors_path=str(tmp_path / "landed"),
        passage_store=str(tmp_path / "pg"),
        decon_store=ev_path,
        passage_window=3,
    )
    b1 = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta unique one tail"),
            (2, "prefix alpha beta gamma delta other two"),
            (3, "intro secret eval passage xyz end"),
        ],
        "doc_id long, text string",
    )
    r1 = run_incremental_ingest(b1, **kw)
    # 8 tokens from the in-batch duplicated passage + 4 from the eval leak
    assert (r1.passage_tokens_removed, r1.passage_docs_touched) == (12, 3)
    landed = {x["doc_id"]: x["text"] for x in spark.read.parquet(kw["survivors_path"]).collect()}
    assert landed[1] == "unique one tail"
    assert landed[2] == "prefix other two"
    assert landed[3] == "intro end"

    # cross-batch dedup mass still accumulates alongside the decon mask
    b2 = spark.createDataFrame(
        [(10, "intro alpha beta gamma delta closing words")],
        "doc_id long, text string",
    )
    r2 = run_incremental_ingest(b2, **kw)
    assert (r2.passage_tokens_removed, r2.passage_docs_touched) == (4, 1)
    landed = {x["doc_id"]: x["text"] for x in spark.read.parquet(kw["survivors_path"]).collect()}
    assert landed[10] == "intro closing words"

    # eval store built with a different window: fails up front, nothing lands
    bad_ev = str(tmp_path / "eval_pg5")
    _eval_store(spark, bad_ev, ["secret eval passage xyz"], window=5)
    kw_bad = dict(kw, decon_store=bad_ev, survivors_path=str(tmp_path / "landed2"))
    with pytest.raises(ValueError, match="window"):
        run_incremental_ingest(
            spark.createDataFrame([(20, "w x y z")], "doc_id long, text string"),
            **kw_bad,
        )
    assert not os.path.exists(str(tmp_path / "landed2"))


def test_ingest_txn_decon_combined_matches_parquet_mode(spark, tmp_path):
    """TXN mode with decon_store (+ passage tier): the landed corpus equals
    the parquet runner's on the same batches, the eval store stays a
    read-only plain-parquet input outside the journal, and a rerun of the
    committed batch appends nothing."""
    from etl_data_transformer_spark.plans.ingest import (
        run_incremental_ingest,
        run_incremental_ingest_txn,
    )
    from etl_data_transformer_spark.sources import manifest as MF

    ev_path = str(tmp_path / "eval_pg")
    _eval_store(spark, ev_path, ["secret eval passage xyz"], window=3)
    b1 = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta unique one tail"),
            (2, "prefix alpha beta gamma delta other two"),
            (3, "intro secret eval passage xyz end"),
        ],
        "doc_id long, text string",
    )
    kw_txn = dict(
        corpus_table=str(tmp_path / "corpus"),
        exact_table=str(tmp_path / "tx_ex"),
        passage_table=str(tmp_path / "tx_pg"),
        decon_store=ev_path,
        passage_window=3,
        txn_dir=str(tmp_path / "_txns"),
    )
    r = run_incremental_ingest_txn(b1, **kw_txn)
    assert (r.passage_tokens_removed, r.passage_docs_touched) == (12, 3)
    got_txn = {
        x["doc_id"]: x["text"] for x in MF.read_table(spark, kw_txn["corpus_table"]).collect()
    }
    run_incremental_ingest(
        b1,
        exact_store=str(tmp_path / "pq_ex"),
        survivors_path=str(tmp_path / "pq_landed"),
        passage_store=str(tmp_path / "pq_pg"),
        decon_store=ev_path,
        passage_window=3,
    )
    got_pq = {
        x["doc_id"]: x["text"]
        for x in spark.read.parquet(str(tmp_path / "pq_landed")).collect()
    }
    assert got_txn == got_pq
    # the eval store was never written to: still exactly the seeded rows
    # (flat layout, no _manifests dir — it never joined the transaction)
    assert not os.path.exists(os.path.join(ev_path, "_manifests"))
    seeded = spark.read.parquet(ev_path).count()
    r2 = run_incremental_ingest_txn(b1, **kw_txn)
    assert (r2.passage_tokens_removed, r2.passage_docs_touched) == (12, 3)
    assert {
        x["doc_id"]: x["text"] for x in MF.read_table(spark, kw_txn["corpus_table"]).collect()
    } == got_txn
    assert spark.read.parquet(ev_path).count() == seeded


# --------------------------------------- NB quality gate in the ingest (round-9) --


def _quality_store(spark, path):
    """Train a tiny separable quality model and persist its count store."""
    from etl_data_transformer_spark.functions import text as TX

    train = spark.createDataFrame(
        [
            (1, "good clean prose flows nicely", 1),
            (2, "good well written text here", 1),
            (3, "spam spam buy now click", 0),
            (4, "click buy spam junk junk", 0),
        ],
        "doc_id long, text string, label int",
    )
    TX.write_nb_store(TX.nb_count_rows(train, "label"), path, mode="overwrite")


def test_ingest_quality_gate_drops_low_quality(spark, tmp_path):
    """nb_store gates the batch BEFORE any tier: below-threshold docs
    never land or index, zero-token docs drop, NULL-id docs pass ungated,
    the audit row carries n_quality_dropped with n_batch still the RAW
    input size, and a rerun is idempotent."""
    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest

    nb = str(tmp_path / "nb")
    _quality_store(spark, nb)
    kw = dict(
        exact_store=str(tmp_path / "ex"),
        survivors_path=str(tmp_path / "landed"),
        audit_path=str(tmp_path / "audit"),
        nb_store=nb,
        nb_threshold_micros=0,
    )
    b = spark.createDataFrame(
        [
            (1, "good prose written nicely"),
            (2, "buy spam click junk"),
            (3, "   "),  # zero tokens: no score row -> dropped
            (None, "spam spam spam"),  # NULL id: passes the gate ungated
        ],
        "doc_id long, text string",
    )
    r = run_incremental_ingest(b, **kw)
    assert (r.n_batch, r.n_quality_dropped, r.n_landed) == (4, 2, 2)
    landed = spark.read.parquet(kw["survivors_path"]).collect()
    assert sorted((x["doc_id"] is None, x["doc_id"]) for x in landed) == [
        (False, 1),
        (True, None),
    ]
    audit = spark.read.parquet(kw["audit_path"]).collect()
    assert [x["n_quality_dropped"] for x in audit] == [2]
    assert [x["n_batch"] for x in audit] == [4]
    # exact store indexed only the gated survivor (NULL-id rows carry no fp key loss)
    fps = spark.read.parquet(kw["exact_store"])
    assert fps.filter("doc_id = 2").count() == 0
    # rerun: same gate outcome, no double-landing. (The NULL-id doc is
    # reported n_landed=1 on the rerun: NULL ids cannot ride the id-keyed
    # replay heal, so the exact tier dedups it against its own landed
    # fingerprint — the pre-existing NULL-id wrinkle, not a gate effect.)
    r2 = run_incremental_ingest(b, **kw)
    assert r2.n_quality_dropped == 2
    assert spark.read.parquet(kw["survivors_path"]).count() == 2


def test_ingest_txn_quality_gate_and_all_dropped_batch(spark, tmp_path):
    """TXN mode: the gate composes with the journaled flip (the model
    store stays a read-only plain path outside the journal); a batch the
    gate fully rejects lands NOTHING but still audits."""
    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest_txn
    from etl_data_transformer_spark.sources import manifest as MF

    nb = str(tmp_path / "nb")
    _quality_store(spark, nb)
    kw = dict(
        corpus_table=str(tmp_path / "corpus"),
        exact_table=str(tmp_path / "ex"),
        audit_table=str(tmp_path / "audit"),
        txn_dir=str(tmp_path / "_txns"),
        nb_store=nb,
        nb_threshold_micros=0,
    )
    b1 = spark.createDataFrame(
        [(1, "good prose written nicely"), (2, "buy spam click junk")],
        "doc_id long, text string",
    )
    r1 = run_incremental_ingest_txn(b1, **kw)
    assert (r1.n_batch, r1.n_quality_dropped, r1.n_landed) == (2, 1, 1)
    assert [x["doc_id"] for x in MF.read_table(spark, kw["corpus_table"]).collect()] == [1]

    b2 = spark.createDataFrame(
        [(10, "spam junk click buy"), (11, "junk spam spam now")],
        "doc_id long, text string",
    )
    r2 = run_incremental_ingest_txn(b2, **kw)
    assert (r2.n_batch, r2.n_quality_dropped, r2.n_landed) == (2, 2, 0)
    assert MF.read_table(spark, kw["corpus_table"]).count() == 1
    audit = MF.read_table(spark, kw["audit_table"])
    assert sorted(x["n_quality_dropped"] for x in audit.collect()) == [1, 2]
    # the model store never joined the transaction
    import os

    assert not os.path.exists(os.path.join(nb, "_manifests"))


def test_ingest_all_tiers_composed_batch_equals_txn(spark, tmp_path):
    """Full composition pin: quality gate + exact + MinHash + SimHash +
    passage rewrite + eval decontamination in ONE run — the gate drops
    junk before any tier sees it (no window mass, no store rows), dedup
    drops a near-dup, survivors land rewritten with both masks applied,
    and the txn runner produces the identical corpus."""
    from etl_data_transformer_spark.plans.ingest import (
        run_incremental_ingest,
        run_incremental_ingest_txn,
    )
    from etl_data_transformer_spark.sources import manifest as MF

    nb = str(tmp_path / "nb")
    _quality_store(spark, nb)
    ev = str(tmp_path / "ev")
    _eval_store(spark, ev, ["secret eval passage xyz"], window=3)

    b = spark.createDataFrame(
        [
            # two docs sharing a duplicated passage (>= min_count mask)
            (1, "good alpha beta gamma delta unique one tail"),
            (2, "good prefix alpha beta gamma delta other two"),
            # near-dup of doc 1 (minhash tier drops it; higher id loses)
            (3, "good alpha beta gamma delta unique one tail yesterday"),
            # carries the eval-leaked passage (decon mask)
            (4, "good intro secret eval passage xyz end"),
            # junk: the NB gate drops it BEFORE any tier — its copy of the
            # shared passage must not add window mass
            (5, "spam junk alpha beta gamma delta click buy"),
        ],
        "doc_id long, text string",
    )
    kw_common = dict(
        minhash_threshold=0.3,
        shingle_n=2,
        passage_window=3,
        decon_store=ev,
        nb_store=nb,
        nb_threshold_micros=0,
    )
    r = run_incremental_ingest(
        b,
        exact_store=str(tmp_path / "ex"),
        minhash_store=str(tmp_path / "mh"),
        simhash_store=str(tmp_path / "sh"),
        survivors_path=str(tmp_path / "landed"),
        passage_store=str(tmp_path / "pg"),
        **kw_common,
    )
    assert r.n_batch == 5
    assert r.n_quality_dropped == 1  # doc 5
    assert r.n_landed == 3  # doc 3 lost to the near-dup tier
    landed = {x["doc_id"]: x["text"] for x in spark.read.parquet(str(tmp_path / "landed")).collect()}
    assert set(landed) == {1, 2, 4}
    # the shared passage was masked by in-batch counts (docs 1+2), the
    # eval passage unconditionally; doc 5's copy added no mass (gated out)
    assert landed[1] == "good unique one tail"
    assert landed[2] == "good prefix other two"
    assert landed[4] == "good intro end"
    # gated/dropped docs never reached the stores
    assert spark.read.parquet(str(tmp_path / "ex")).filter("doc_id in (3, 5)").count() == 0

    r2 = run_incremental_ingest_txn(
        b,
        corpus_table=str(tmp_path / "corpus"),
        exact_table=str(tmp_path / "tx_ex"),
        minhash_table=str(tmp_path / "tx_mh"),
        simhash_table=str(tmp_path / "tx_sh"),
        passage_table=str(tmp_path / "tx_pg"),
        txn_dir=str(tmp_path / "_txns"),
        **kw_common,
    )
    assert (r2.n_quality_dropped, r2.n_landed) == (r.n_quality_dropped, r.n_landed)
    assert {
        x["doc_id"]: x["text"] for x in MF.read_table(spark, str(tmp_path / "corpus")).collect()
    } == landed


def test_ingest_entropy_gate_drops_spam_before_everything(spark, tmp_path):
    """Round-9 entropy pre-gate: repeated-character spam (and NULL text,
    entropy 0) drops under the floor BEFORE the NB gate or any tier — the
    NB drop count is measured from the entropy-gated base, the audit row
    carries both counts with n_batch still the RAW size, the dropped docs
    never index, and a rerun is idempotent."""
    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest

    nb = str(tmp_path / "nb")
    _quality_store(spark, nb)
    kw = dict(
        exact_store=str(tmp_path / "ex"),
        survivors_path=str(tmp_path / "landed"),
        audit_path=str(tmp_path / "audit"),
        nb_store=nb,
        nb_threshold_micros=0,
        min_entropy_microbits=500_000,
    )
    b = spark.createDataFrame(
        [
            (1, "good prose written nicely"),
            (2, "aaaaaaaaaaaaaaaaaaaaaaaaaaaa"),  # entropy 0: floor drops it
            (3, None),  # NULL text: entropy 0, drops under any positive floor
            (4, "buy spam click junk"),  # survives the floor, NB drops it
        ],
        "doc_id long, text string",
    )
    r = run_incremental_ingest(b, **kw)
    assert (r.n_batch, r.n_entropy_dropped, r.n_quality_dropped, r.n_landed) == (
        4,
        2,
        1,
        1,
    )
    assert [x["doc_id"] for x in spark.read.parquet(kw["survivors_path"]).collect()] == [1]
    audit = spark.read.parquet(kw["audit_path"]).collect()
    assert [(x["n_batch"], x["n_entropy_dropped"], x["n_quality_dropped"]) for x in audit] == [
        (4, 2, 1)
    ]
    assert spark.read.parquet(kw["exact_store"]).filter("doc_id in (2, 3, 4)").count() == 0
    r2 = run_incremental_ingest(b, **kw)
    assert (r2.n_entropy_dropped, r2.n_quality_dropped) == (2, 1)
    assert spark.read.parquet(kw["survivors_path"]).count() == 1
    # entropy-only mode (no NB store): the knob works standalone
    kw2 = dict(
        exact_store=str(tmp_path / "ex2"),
        survivors_path=str(tmp_path / "landed2"),
        audit_path=str(tmp_path / "audit2"),
        min_entropy_microbits=500_000,
    )
    r3 = run_incremental_ingest(b, **kw2)
    assert (r3.n_entropy_dropped, r3.n_quality_dropped, r3.n_landed) == (2, None, 2)
    a2 = spark.read.parquet(kw2["audit_path"]).collect()
    assert [(x["n_entropy_dropped"], x["n_quality_dropped"]) for x in a2] == [(2, None)]


def test_ingest_txn_entropy_gate(spark, tmp_path):
    """TXN mode: the entropy floor composes with the journaled flip
    identically to the parquet runner (same counts, same corpus)."""
    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest_txn
    from etl_data_transformer_spark.sources import manifest as MF

    kw = dict(
        corpus_table=str(tmp_path / "corpus"),
        exact_table=str(tmp_path / "ex"),
        audit_table=str(tmp_path / "audit"),
        txn_dir=str(tmp_path / "_txns"),
        min_entropy_microbits=500_000,
    )
    b = spark.createDataFrame(
        [(1, "good prose written nicely"), (2, "bbbbbbbbbbbbbb")],
        "doc_id long, text string",
    )
    r = run_incremental_ingest_txn(b, **kw)
    assert (r.n_batch, r.n_entropy_dropped, r.n_landed) == (2, 1, 1)
    assert [x["doc_id"] for x in MF.read_table(spark, kw["corpus_table"]).collect()] == [1]
    audit = MF.read_table(spark, kw["audit_table"]).collect()
    assert [(x["n_entropy_dropped"], x["n_quality_dropped"]) for x in audit] == [(1, None)]


def test_migrate_batch_audit_table(spark, tmp_path):
    """Round-9 review: widening the audit schema must not strand old
    tables — the migration helper adds the missing columns as NULL through
    the crash-safe swap, after which appends pass validation; unknown
    columns refuse to auto-migrate; a second run is a no-op."""
    import pytest
    from pyspark.sql import functions as F

    from etl_data_transformer_spark.plans.ingest import (
        IngestReport,
        ingest_audit_row,
        migrate_batch_audit_table,
        run_incremental_ingest,
    )

    audit = str(tmp_path / "audit")
    # simulate a pre-entropy-era table: current row minus the new column
    ingest_audit_row(spark, IngestReport(1, 1, None, None, 1, None, None)).drop(
        "n_entropy_dropped"
    ).write.parquet(audit)
    kw = dict(exact_store=str(tmp_path / "ex"), audit_path=audit)
    b = spark.createDataFrame([(1, "fresh text")], "doc_id long, text string")
    with pytest.raises(ValueError, match="migrate_batch_audit_table"):
        run_incremental_ingest(b, **kw)
    assert migrate_batch_audit_table(spark, audit) == ["n_entropy_dropped"]
    assert migrate_batch_audit_table(spark, audit) == []  # idempotent no-op
    old = spark.read.parquet(audit).collect()
    assert [r["n_entropy_dropped"] for r in old] == [None]  # tier-not-run encoding
    r = run_incremental_ingest(b, **kw)  # append now passes validation
    assert r.n_landed == 1
    assert spark.read.parquet(audit).count() == 2
    # streaming layout: the __batch_id partitioning survives migration
    s_audit = str(tmp_path / "s_audit")
    ingest_audit_row(spark, IngestReport(2, 2, None, None, 2, None, None)).drop(
        "n_entropy_dropped"
    ).withColumn("__batch_id", F.lit(0)).write.partitionBy("__batch_id").parquet(s_audit)
    assert migrate_batch_audit_table(spark, s_audit) == ["n_entropy_dropped"]
    got = spark.read.parquet(s_audit).collect()
    assert [(r["__batch_id"], r["n_entropy_dropped"]) for r in got] == [(0, None)]
    # unknown columns cannot be auto-migrated
    bad = str(tmp_path / "bad")
    spark.createDataFrame([(1,)], "mystery long").write.parquet(bad)
    with pytest.raises(ValueError, match="mystery"):
        migrate_batch_audit_table(spark, bad)


def test_ingest_txn_rejects_bucketed_exact_table(spark, tmp_path):
    """The txn runner reads stores through the manifest's own file listing,
    which cannot carry bucket metadata — a bucketed exact store must fail
    with the purpose-built layout error, not a parameter-mismatch
    misdiagnosis (round-9 review)."""
    import pytest

    from etl_data_transformer_spark.operators import dedup as DD
    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest_txn

    ex = str(tmp_path / "ex")
    corpus = spark.createDataFrame([(1, "doc one")], "doc_id long, text string")
    DD.write_exact_store(
        DD.exact_fingerprint_store(corpus), ex, mode="overwrite", bucket_by_fp=True
    )
    b = spark.createDataFrame([(2, "doc two")], "doc_id long, text string")
    with pytest.raises(ValueError, match="BUCKETED layout"):
        run_incremental_ingest_txn(
            b,
            corpus_table=str(tmp_path / "corpus"),
            exact_table=ex,
            txn_dir=str(tmp_path / "_txns"),
        )


# ----------------------- frozen corpus-relative threshold (round-10, item 6) --


def test_freeze_nb_threshold_two_batch_e2e(spark, tmp_path):
    """The frozen-threshold scored cut composed into the ingest: derive the
    threshold ONCE from a landed corpus under the NB store's model, apply
    it to two batches — gating is threshold-stable (the same doc content
    passes/drops identically in both batches), both audit rows record the
    applied nb_threshold_micros, and the sidecar round-trips."""
    from etl_data_transformer_spark.functions import text as TX
    from etl_data_transformer_spark.plans.ingest import (
        freeze_nb_threshold,
        read_nb_threshold,
        run_incremental_ingest,
    )

    nb = str(tmp_path / "nb")
    _quality_store(spark, nb)
    # landed corpus: 4 good docs + 1 spam; the top-40% percentile target
    # lands STRICTLY inside the good cluster, so the frozen threshold is a
    # positive good-cluster score regardless of approx-rank fuzz
    corpus = spark.createDataFrame(
        [
            (100, "good clean prose flows nicely"),
            (101, "well written good text here"),
            (102, "good text written nicely here"),
            (103, "clean good prose written well"),
            (104, "junk spam buy click spam"),
        ],
        "doc_id long, text string",
    )
    side = str(tmp_path / "thr.json")
    thr = freeze_nb_threshold(corpus, nb, 0.4, out_path=side)
    assert read_nb_threshold(side) == thr
    assert thr > 0  # inside the good cluster under this model

    kw = dict(
        exact_store=str(tmp_path / "ex"),
        survivors_path=str(tmp_path / "landed"),
        audit_path=str(tmp_path / "audit"),
        nb_store=nb,
        nb_threshold_micros=read_nb_threshold(side),
    )
    # batch docs score far OUTSIDE the corpus clusters (double the token
    # mass), so pass/drop vs the frozen in-cluster threshold is unambiguous
    b1 = spark.createDataFrame(
        [
            (1, "good good clean clean prose prose nicely nicely written written"),
            (2, "spam spam junk junk click click buy buy"),
        ],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [
            (3, "good good clean clean written written nicely nicely text text"),
            (4, "junk junk spam spam buy buy click click"),
        ],
        "doc_id long, text string",
    )
    r1 = run_incremental_ingest(b1, **kw)
    r2 = run_incremental_ingest(b2, **kw)
    # threshold-stable gating: the spam doc drops in BOTH batches
    assert (r1.n_quality_dropped, r2.n_quality_dropped) == (1, 1)
    assert (r1.nb_threshold_micros, r2.nb_threshold_micros) == (thr, thr)
    landed = {x["doc_id"] for x in spark.read.parquet(kw["survivors_path"]).collect()}
    assert landed == {1, 3}
    audit = spark.read.parquet(kw["audit_path"]).collect()
    assert sorted(x["nb_threshold_micros"] for x in audit) == [thr, thr]

    # contract guards
    import pytest

    with pytest.raises(ValueError, match="top_frac"):
        freeze_nb_threshold(corpus, nb, 0.0)
    empty = spark.createDataFrame([(9, "   ")], "doc_id long, text string")
    with pytest.raises(ValueError, match="no scoreable"):
        freeze_nb_threshold(empty, nb, 0.5)


def test_freeze_nb_threshold_txn_parity(spark, tmp_path):
    """The txn runner records the same applied-threshold audit column
    through its journaled manifest sink."""
    from etl_data_transformer_spark.plans.ingest import (
        freeze_nb_threshold,
        run_incremental_ingest_txn,
    )
    from etl_data_transformer_spark.sources import manifest as MF

    nb = str(tmp_path / "nb")
    _quality_store(spark, nb)
    corpus = spark.createDataFrame(
        [
            (100, "good clean prose flows nicely"),
            (101, "well written good text here"),
            (102, "spam click buy junk now"),
        ],
        "doc_id long, text string",
    )
    thr = freeze_nb_threshold(corpus, nb, 0.34)
    b = spark.createDataFrame(
        [
            (1, "good good clean clean prose prose nicely nicely"),
            (2, "spam spam junk junk click click buy buy"),
        ],
        "doc_id long, text string",
    )
    r = run_incremental_ingest_txn(
        b,
        corpus_table=str(tmp_path / "landed"),
        exact_table=str(tmp_path / "ex"),
        audit_table=str(tmp_path / "audit"),
        txn_dir=str(tmp_path / "txn"),
        nb_store=nb,
        nb_threshold_micros=thr,
    )
    assert r.nb_threshold_micros == thr
    audit = MF.read_table(spark, str(tmp_path / "audit")).collect()
    assert [x["nb_threshold_micros"] for x in audit] == [thr]


def test_audit_migration_adds_threshold_column(spark, tmp_path):
    """A pre-round-10 audit table (without nb_threshold_micros) migrates
    in place: the new column lands NULL and subsequent appends work."""
    from etl_data_transformer_spark.plans.ingest import (
        IngestReport,
        ingest_audit_row,
        migrate_batch_audit_table,
        validate_batch_audit_layout,
        write_ingest_audit,
    )

    path = str(tmp_path / "audit")
    # simulate the old schema by dropping the new column
    old = ingest_audit_row(spark, IngestReport(1, 1, None, None, 1, None, None)).drop(
        "nb_threshold_micros"
    )
    old.write.parquet(path)
    import pytest

    with pytest.raises(ValueError, match="migrate_batch_audit_table"):
        validate_batch_audit_layout(spark, path)
    added = migrate_batch_audit_table(spark, path)
    assert added == ["nb_threshold_micros"]
    validate_batch_audit_layout(spark, path)
    write_ingest_audit(
        spark, path, IngestReport(2, 2, None, None, 2, None, None, nb_threshold_micros=7)
    )
    rows = spark.read.parquet(path).collect()
    got = sorted((x["nb_threshold_micros"] for x in rows), key=lambda v: (v is not None, v or 0))
    assert got == [None, 7]


def test_ingest_with_split_minhash_store_matches_flat(spark, tmp_path):
    """The batch runner routes a split-layout minhash store (round 12)
    end-to-end: reports/landed/stores match a flat-store control run, the
    append-back lands in the split layout, and a rerun is idempotent."""
    from etl_data_transformer_spark.operators import dedup as DD

    def run_both(layout_dir, seed_split):
        ex = str(tmp_path / f"{layout_dir}_ex")
        mh = str(tmp_path / f"{layout_dir}_mh")
        landed = str(tmp_path / f"{layout_dir}_landed")
        if seed_split:
            # seed the split layout: empty store, split sidecar
            DD.write_minhash_store(
                DD.minhash_signature_store(
                    spark.createDataFrame([], "doc_id long, text string")
                ),
                mh,
                mode="overwrite",
                layout="split",
            )
        kw = dict(
            exact_store=ex,
            minhash_store=mh,
            minhash_threshold=0.3,
            survivors_path=landed,
        )
        b1 = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog today"),
                (2, "completely different content about maritime chronometers"),
                (4, "the quick brown fox jumps over the lazy dog yesterday"),
            ],
            "doc_id long, text string",
        )
        b2 = spark.createDataFrame(
            [
                (11, "the quick brown fox leaps over the lazy dog today"),
                (12, "an entirely novel new document about fresh things"),
                (13, "an entirely novel new document about fresh thingz"),
            ],
            "doc_id long, text string",
        )
        r1 = run_incremental_ingest(b1, **kw)
        r2 = run_incremental_ingest(b2, **kw)
        # rerun of batch 2 must be a no-op (heal + idempotent sinks)
        r2b = run_incremental_ingest(b2, **kw)
        landed_ids = sorted(
            r["doc_id"] for r in spark.read.parquet(landed).collect()
        )
        return (r1.n_landed, r2.n_landed, r2b.n_landed, landed_ids, mh)

    flat = run_both("flat", seed_split=False)
    split = run_both("split", seed_split=True)
    assert flat[:4] == split[:4], (flat, split)
    assert DD.minhash_store_layout(split[4]) == "split"
    assert DD.minhash_store_layout(flat[4]) == "flat"
    slim, sets = DD.read_minhash_store_split(spark, split[4])
    assert sorted(r["doc_id"] for r in sets.collect()) == flat[3]
    # one sig row per (landed doc, band), no duplicate appends
    assert slim.count() == len(flat[3]) * 4


def test_ingest_url_keeper_tier_cross_batch_recrawls(spark, tmp_path):
    """Round-12 keeper tier through the batch runner: same-content
    re-crawls drop as aliases, changed-content re-crawls CDC-update the
    keeper document in place (never re-landing as near-dup work), new
    URLs land; reruns are idempotent and the audit carries the counts."""
    from etl_data_transformer_spark.operators.domains import url_keeper_merge

    ex = str(tmp_path / "ex")
    keeper = str(tmp_path / "keeper")
    landed_p = str(tmp_path / "landed")
    audit_p = str(tmp_path / "audit")
    kw = dict(
        exact_store=ex,
        survivors_path=landed_p,
        audit_path=audit_p,
        url_col="url",
        url_keeper_store=keeper,
    )
    b1 = spark.createDataFrame(
        [
            (1, "https://a.example.com/p1", "original content one here"),
            (2, "https://a.example.com/p2?utm_source=x", "original content two here"),
        ],
        "doc_id long, url string, text string",
    )
    r1 = run_incremental_ingest(b1, **kw)
    assert (r1.n_landed, r1.n_url_updates, r1.n_url_alias_dropped) == (2, 0, 0)

    b2 = spark.createDataFrame(
        [
            (10, "https://a.example.com/p1?fbclid=z", "original content one here"),
            (11, "https://a.example.com/p2", "revised content two entirely"),
            (12, "https://a.example.com/p3", "a brand new page altogether"),
        ],
        "doc_id long, url string, text string",
    )
    r2 = run_incremental_ingest(b2, **kw)
    assert (r2.n_landed, r2.n_url_updates, r2.n_url_alias_dropped) == (1, 1, 1)

    landed = spark.read.parquet(landed_p)
    assert sorted(r.doc_id for r in landed.collect()) == [1, 2, 12]
    assert landed.filter("doc_id = 2").collect()[0].text == "revised content two entirely"

    merged = {
        r.canonical_url: r.keeper_id
        for r in url_keeper_merge(spark.read.parquet(keeper)).collect()
    }
    assert merged == {
        "https://a.example.com/p1": 1,
        "https://a.example.com/p2": 2,
        "https://a.example.com/p3": 12,
    }

    # rerun of batch 2: everything already known — nothing re-lands,
    # nothing re-updates, the corpus is unchanged
    r2b = run_incremental_ingest(b2, **kw)
    assert (r2b.n_landed, r2b.n_url_updates) == (0, 0)
    after = spark.read.parquet(landed_p)
    assert sorted(r.doc_id for r in after.collect()) == [1, 2, 12]
    assert after.filter("doc_id = 2").collect()[0].text == "revised content two entirely"

    audit = spark.read.parquet(audit_p).orderBy("ingest_ts").collect()
    assert [r.n_url_updates for r in audit] == [0, 1, 0]

    # misconfiguration rejects up front
    import pytest

    with pytest.raises(ValueError, match="url_keeper_store requires"):
        run_incremental_ingest(b1, exact_store=ex, url_keeper_store=keeper)


def _jc_b1(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta zeta"),      # J(1,2)=4/6 — jaccard near-dup of 1
            (3, "uno dos tres cuatro cinco"),
        ],
        "doc_id long, text string",
    )


def _jc_b2(spark):
    return spark.createDataFrame(
        [
            (10, "alpha beta gamma delta theta"),    # J(10, landed 1)=4/6 — cross-batch
            (11, "uno dos tres cuatro nueve"),       # J(11, landed 3)=4/6 — cross-batch
            (12, "completely different words here now"),
        ],
        "doc_id long, text string",
    )


def test_ingest_jaccard_tier_two_batches(spark, tmp_path):
    """Round-14: the exact prefix-Jaccard tier through the batch runner —
    in-batch pairs drop the higher id, cross-batch pairs drop against the
    persisted store (unigram token sets here: J=4/6 >= 0.6), the store
    grows by survivor rows only, reruns are idempotent, and the audit
    carries the tier's counts."""
    ex = str(tmp_path / "ex")
    jc = str(tmp_path / "jc")
    landed_p = str(tmp_path / "landed")
    audit_p = str(tmp_path / "audit")
    kw = dict(
        exact_store=ex,
        jaccard_store=jc,
        jaccard_n=1,
        jaccard_threshold=0.6,
        survivors_path=landed_p,
        audit_path=audit_p,
    )
    r1 = run_incremental_ingest(_jc_b1(spark), **kw)
    assert (r1.n_batch, r1.n_after_exact, r1.n_after_jaccard, r1.n_landed) == (3, 3, 2, 2)
    assert r1.jaccard_pairs == 1  # (1, 2)
    assert r1.n_after_minhash is None  # other near tiers off
    assert sorted(
        r.doc_id for r in spark.read.parquet(landed_p).collect()
    ) == [1, 3]

    r2 = run_incremental_ingest(_jc_b2(spark), **kw)
    assert (r2.n_after_jaccard, r2.n_landed) == (1, 1)
    assert r2.jaccard_pairs == 2  # (1,10) and (3,11), both vs the store
    assert sorted(
        r.doc_id for r in spark.read.parquet(landed_p).collect()
    ) == [1, 3, 12]

    # store holds exactly the landed survivors' rows, once each
    sets = spark.read.parquet(os.path.join(jc, "gramsets"))
    assert sorted(r.doc_id for r in sets.collect()) == [1, 3, 12]
    posts = spark.read.parquet(os.path.join(jc, "postings"))
    assert set(r.doc_id for r in posts.select("doc_id").distinct().collect()) == {1, 3, 12}
    # the frozen census exists and covers batch-1 grams
    assert spark.read.parquet(os.path.join(jc, "census")).count() > 0

    # equivalence with the stand-alone incremental join on a fresh probe:
    # the composed tier and jaccard_join_incremental share the core, so a
    # read-only screen of a near-dup of landed 12 finds exactly that pair
    probe = spark.createDataFrame(
        [(90, "completely different words here instead")],
        "doc_id long, text string",
    )
    got = DD.jaccard_join_incremental(
        probe, jc, id_col="doc_id", append=False
    ).collect()
    assert [(r.id_a, r.id_b) for r in got] == [(12, 90)]

    # rerun of the committed batch 2: the heals make it recompute the
    # identical survivors (report n_landed = 1), and the idempotent-append
    # guards land no new corpus rows and no duplicate store rows
    r2b = run_incremental_ingest(_jc_b2(spark), **kw)
    assert r2b.n_landed == 1
    assert sorted(
        r.doc_id for r in spark.read.parquet(landed_p).collect()
    ) == [1, 3, 12]
    sets2 = spark.read.parquet(os.path.join(jc, "gramsets"))
    assert sets2.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0

    audit = spark.read.parquet(audit_p).orderBy("ingest_ts").collect()
    assert [r.jaccard_pairs for r in audit] == [1, 2, 2]
    assert [r.n_after_jaccard for r in audit] == [2, 1, 1]

    # a streaming-layout store rejects the batch runner up front
    import pytest

    stream_store = str(tmp_path / "jc_stream")
    DD.ensure_jaccard_params_sidecar(stream_store, n=1, threshold=0.6)
    sets.withColumn("__batch_id", F.lit("s-000000")).write.partitionBy(
        "__batch_id"
    ).parquet(os.path.join(stream_store, "gramsets"))
    with pytest.raises(ValueError, match="streaming"):
        run_incremental_ingest(
            _jc_b1(spark),
            exact_store=str(tmp_path / "ex2"),
            jaccard_store=stream_store,
            jaccard_n=1,
            jaccard_threshold=0.6,
        )


def test_ingest_txn_jaccard_tier_atomic_and_crash(spark, tmp_path, monkeypatch):
    """Round-14: the Jaccard tier inside the journaled transaction — same
    survivors as the parquet runner, census/gramsets/postings live as
    manifest sub-tables committing atomically with the corpus, a crash
    before the pointer flips publishes nothing inconsistent, and the
    recovered rerun appends no data."""
    import pytest

    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest_txn
    from etl_data_transformer_spark.sources import manifest as MF

    kw = dict(
        corpus_table=str(tmp_path / "corpus"),
        exact_table=str(tmp_path / "ex"),
        jaccard_table=str(tmp_path / "jc"),
        jaccard_n=1,
        jaccard_threshold=0.6,
        audit_table=str(tmp_path / "audit"),
        txn_dir=str(tmp_path / "_txns"),
    )
    r1 = run_incremental_ingest_txn(_jc_b1(spark), **kw)
    assert (r1.n_after_jaccard, r1.jaccard_pairs, r1.n_landed) == (2, 1, 2)
    # crash batch 2 after the journal write, before any pointer flip
    real_flip = MF._flip_pointer

    def boom(*a, **k):
        raise RuntimeError("injected crash before flip")

    monkeypatch.setattr(MF, "_flip_pointer", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        run_incremental_ingest_txn(_jc_b2(spark), **kw)
    monkeypatch.setattr(MF, "_flip_pointer", real_flip)
    # nothing from batch 2 is visible — corpus and index agree
    assert sorted(
        r.doc_id for r in MF.read_table(spark, kw["corpus_table"]).collect()
    ) == [1, 3]
    assert sorted(
        r.doc_id
        for r in MF.read_table(
            spark, os.path.join(kw["jaccard_table"], "gramsets")
        ).collect()
    ) == [1, 3]
    # the rerun heals the journal forward, then appends nothing new
    r2 = run_incremental_ingest_txn(_jc_b2(spark), **kw)
    assert (r2.n_after_jaccard, r2.jaccard_pairs, r2.n_landed) == (1, 2, 1)
    assert sorted(
        r.doc_id for r in MF.read_table(spark, kw["corpus_table"]).collect()
    ) == [1, 3, 12]
    posts = MF.read_table(spark, os.path.join(kw["jaccard_table"], "postings"))
    assert set(r.doc_id for r in posts.select("doc_id").distinct().collect()) == {1, 3, 12}
    r2b = run_incremental_ingest_txn(_jc_b2(spark), **kw)
    assert r2b.n_landed == 1  # recomputed identically; guards append nothing
    assert MF.read_table(spark, kw["corpus_table"]).count() == 3
    sets = MF.read_table(spark, os.path.join(kw["jaccard_table"], "gramsets"))
    assert sets.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    # parquet-runner parity on the same two batches
    run_incremental_ingest(
        _jc_b1(spark),
        exact_store=str(tmp_path / "p_ex"),
        jaccard_store=str(tmp_path / "p_jc"),
        jaccard_n=1,
        jaccard_threshold=0.6,
        survivors_path=str(tmp_path / "p_landed"),
    )
    run_incremental_ingest(
        _jc_b2(spark),
        exact_store=str(tmp_path / "p_ex"),
        jaccard_store=str(tmp_path / "p_jc"),
        jaccard_n=1,
        jaccard_threshold=0.6,
        survivors_path=str(tmp_path / "p_landed"),
    )
    assert sorted(
        r.doc_id for r in spark.read.parquet(str(tmp_path / "p_landed")).collect()
    ) == sorted(
        r.doc_id for r in MF.read_table(spark, kw["corpus_table"]).collect()
    )
