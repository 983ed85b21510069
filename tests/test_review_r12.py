"""Regression tests for the round-12 in-round review findings: NULL-safe
keeper fp compare, streaming-layout guards on the new stores, split-store
id-column inference, legacy Jaccard-mass baseline seeding, gated keeper
CDC updates, and the exact-store refresh for applied updates.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_data_transformer_spark.operators import dedup as DD


# --------------------------- NULL-safe keeper change test -------------------


def test_url_keeper_null_text_recrawl_is_an_update_not_an_alias(spark, tmp_path):
    from etl_data_transformer_spark.operators.domains import url_keeper_ingest

    store = str(tmp_path / "keeper")
    b1 = spark.createDataFrame(
        [(1, "https://a.example.com/p1", None)],
        "doc_id long, url string, text string",
    )
    url_keeper_ingest(b1, store)
    # real content arrives for the NULL-text keeper: must be an UPDATE
    b2 = spark.createDataFrame(
        [(2, "https://a.example.com/p1", "real content finally")],
        "doc_id long, url string, text string",
    )
    new2, upd2, dropped2 = url_keeper_ingest(b2, store)
    assert new2.count() == 0 and dropped2 == 0
    ups = upd2.collect()
    assert len(ups) == 1 and ups[0].keeper_id == 1
    # and the reverse (content -> NULL) is also a change, not a swallow
    b3 = spark.createDataFrame(
        [(3, "https://a.example.com/p1", None)],
        "doc_id long, url string, text string",
    )
    _, upd3, _ = url_keeper_ingest(b3, store)
    assert upd3.count() == 1


# --------------------------- streaming-layout guards ------------------------


def test_stats_store_rejects_flat_append_and_compaction_on_streaming_layout(
    spark, tmp_path
):
    from etl_data_transformer_spark.plans.quality import (
        compact_stats_store,
        write_stats_store,
    )
    from etl_data_transformer_spark.streaming.pipeline import stream_stats_rows

    src, store, ckpt = (str(tmp_path / p) for p in ("src", "stats", "ckpt"))
    schema = "doc_id long, lang string, source string, text string"
    spark.createDataFrame(
        [(1, "en", "web", "one two")], schema
    ).write.parquet(src)
    stream_stats_rows(spark.readStream.schema(schema).parquet(src), store, ckpt)
    batch = spark.createDataFrame([(2, "en", "web", "three")], schema)
    with pytest.raises(ValueError, match="streaming"):
        write_stats_store(batch, store)
    with pytest.raises(ValueError, match="streaming"):
        compact_stats_store(spark, store)


def test_url_keeper_batch_paths_reject_streaming_layout(spark, tmp_path):
    from etl_data_transformer_spark.operators.domains import (
        url_keeper_ingest,
        url_keeper_rows,
        write_url_keeper_store,
    )
    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest
    from etl_data_transformer_spark.streaming.pipeline import stream_url_keeper

    src, store, landed, updates, ckpt = (
        str(tmp_path / p) for p in ("src", "keeper", "landed", "updates", "ckpt")
    )
    schema = "doc_id long, url string, text string"
    spark.createDataFrame(
        [(1, "https://a.example.com/p1", "content one")], schema
    ).write.parquet(src)
    stream_url_keeper(
        spark.readStream.schema(schema).parquet(src),
        store,
        ckpt,
        survivors_path=landed,
        updates_path=updates,
    )
    batch = spark.createDataFrame(
        [(2, "https://a.example.com/p2", "content two")], schema
    )
    with pytest.raises(ValueError, match="streaming"):
        url_keeper_ingest(batch, store)
    with pytest.raises(ValueError, match="streaming"):
        write_url_keeper_store(url_keeper_rows(batch, batch_seq=9), store)
    with pytest.raises(ValueError, match="streaming"):
        run_incremental_ingest(
            batch,
            exact_store=str(tmp_path / "ex"),
            survivors_path=str(tmp_path / "landed2"),
            url_col="url",
            url_keeper_store=store,
        )


# --------------------------- split store id-column inference ----------------


def test_minhash_split_store_preserves_custom_id_column(spark, tmp_path):
    rows = [
        (i, f"passage text number {i} about subject {i % 4} tok{i * 3}")
        for i in range(30)
    ]
    corpus = spark.createDataFrame(rows, ["passage_id", "text"])
    sig = DD.minhash_signature_store(corpus, "text", "passage_id")
    ps = str(tmp_path / "mh_pid")
    DD.write_minhash_store(sig, ps, mode="overwrite", layout="split")
    slim, sets = DD.read_minhash_store_split(spark, ps)
    assert slim.columns == ["passage_id", "sig"]
    assert sets.columns == ["passage_id", "hs"]

    batch = spark.createDataFrame(
        [(100, rows[0][1] + " x"), (101, "entirely new text body")],
        ["passage_id", "text"],
    )
    got = sorted(
        map(
            tuple,
            DD.minhash_dedup_incremental(
                batch, slim, text_col="text", id_col="passage_id",
                threshold=0.3, store_sets=sets,
            ).collect(),
        )
    )
    flat = str(tmp_path / "mh_pid_flat")
    DD.write_minhash_store(sig, flat, mode="overwrite")
    legacy = sorted(
        map(
            tuple,
            DD.minhash_dedup_incremental(
                batch,
                spark.read.parquet(flat).select("passage_id", "hs", "sig"),
                text_col="text",
                id_col="passage_id",
                threshold=0.3,
            ).collect(),
        )
    )
    assert got == legacy and got

    # flat -> split migration with a custom id column
    DD.compact_minhash_store(
        spark, flat, live_ids=corpus.select("passage_id"),
        id_col="passage_id", to_layout="split",
    )
    slim2, sets2 = DD.read_minhash_store_split(spark, flat)
    assert slim2.columns == ["passage_id", "sig"]
    migrated = sorted(
        map(
            tuple,
            DD.minhash_dedup_incremental(
                batch, slim2, text_col="text", id_col="passage_id",
                threshold=0.3, store_sets=sets2,
            ).collect(),
        )
    )
    assert migrated == got


# --------------------------- legacy mass-baseline seeding -------------------


def test_jaccard_legacy_store_first_append_seeds_baseline_not_zero(
    spark, tmp_path
):
    docs = spark.createDataFrame(
        [(i, f"alpha{i} beta{i} gamma{i} delta{i}") for i in range(20)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "jstore")
    DD.write_jaccard_store(docs, path, n=2, threshold=0.6)
    # simulate a pre-round-12 store: no mass sidecar
    os.remove(os.path.join(path, DD._JACCARD_MASS_SIDECAR))
    batch = spark.createDataFrame(
        [(500, "omega zeta eta theta iota kappa")], "doc_id long, text string"
    )
    DD.jaccard_join_incremental(batch, path)
    d = DD.jaccard_store_drift(path, factor=4.0)
    # the baseline was seeded from the CURRENT store postings (not the
    # spurious 0.0 that flagged drift on the first tracked batch) — a
    # healthy store's prefix self-join mass may legitimately be ~0 (hot
    # grams stay out of prefixes), so the pin is: seeded, and NO
    # recommendation for an ordinary batch
    assert d["build_cand_per_doc"] is not None
    assert d["recommend_compact"] is False, d
    assert DD.maybe_compact_jaccard_store(spark, path) is False
    # record_mass=False skips the telemetry pass entirely
    batch2 = spark.createDataFrame(
        [(501, "mu nu xi omicron pi rho")], "doc_id long, text string"
    )
    before = DD.jaccard_store_drift(path)
    DD.jaccard_join_incremental(batch2, path, record_mass=False)
    assert DD.jaccard_store_drift(path) == before


# --------------------------- gated keeper CDC updates -----------------------


def test_ingest_keeper_updates_respect_quality_gates_and_refresh_exact_store(
    spark, tmp_path
):
    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest

    ex = str(tmp_path / "ex")
    keeper = str(tmp_path / "keeper")
    landed_p = str(tmp_path / "landed")
    kw = dict(
        exact_store=ex,
        survivors_path=landed_p,
        url_col="url",
        url_keeper_store=keeper,
        min_entropy_microbits=1_500_000,  # junk floor
    )
    b1 = spark.createDataFrame(
        [(1, "https://a.example.com/p1", "a varied sentence with many distinct words here")],
        "doc_id long, url string, text string",
    )
    r1 = run_incremental_ingest(b1, **kw)
    assert r1.n_landed == 1

    # junk re-crawl: low-entropy text must NOT overwrite the good content,
    # and the keeper fp must NOT advance (honest retry semantics)
    junk = spark.createDataFrame(
        [(10, "https://a.example.com/p1", "aaaa aaaa aaaa aaaa aaaa")],
        "doc_id long, url string, text string",
    )
    r2 = run_incremental_ingest(junk, **kw)
    assert r2.n_url_updates == 0 and r2.n_entropy_dropped == 1
    text = spark.read.parquet(landed_p).collect()[0].text
    assert text.startswith("a varied sentence")
    # fp did not advance: the junk re-crawl classifies as CHANGED again
    r2b = run_incremental_ingest(junk, **kw)
    assert r2b.n_entropy_dropped == 1 and r2b.n_url_updates == 0

    # a GOOD re-crawl applies, and the exact store learns the new content:
    # a later batch doc with the same new text drops as an exact dup
    good = spark.createDataFrame(
        [(11, "https://a.example.com/p1", "completely revised article body with fresh words")],
        "doc_id long, url string, text string",
    )
    r3 = run_incremental_ingest(good, **kw)
    assert r3.n_url_updates == 1
    assert spark.read.parquet(landed_p).collect()[0].text.startswith(
        "completely revised"
    )
    copycat = spark.createDataFrame(
        [(20, "https://b.example.org/other", "completely revised article body with fresh words")],
        "doc_id long, url string, text string",
    )
    r4 = run_incremental_ingest(copycat, **kw)
    assert r4.n_landed == 0 and r4.n_after_exact == 0
