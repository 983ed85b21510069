"""Regression tests for the round-11 ADVICE findings: Jaccard-store
compaction must not resurrect half-appended batches, NULL text must count
zero tokens in the domain/corpus profiles, and domain_gate's strict mode
must drop unattributable rows under allowlist semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

# ---------------------- compaction vs half-appended batches -----------------


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_compact_jaccard_store_drops_half_appended_gramsets(spark, tmp_path):
    """A batch that crashed between the gramsets and postings appends (and
    was never rerun) stays un-indexed by design. Compaction rebuilds
    postings from the gramsets — it must NOT finalize that half-appended
    seam, or later batches report pairs against docs whose ingest never
    completed."""
    from etl_data_transformer_spark.operators.dedup import (
        _jaccard_gram_rows,
        _jaccard_gramsets,
        compact_jaccard_store,
        jaccard_join_incremental,
        write_jaccard_store,
    )

    base = _mk_docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
        ],
    )
    path = str(tmp_path / "jstore")
    write_jaccard_store(base, path, n=2, threshold=0.5)

    # simulate the crash seam: gramsets appended, postings never landed
    ghost = _mk_docs(spark, [(99, "alpha beta gamma delta epsilon zeta")])
    _jaccard_gramsets(
        _jaccard_gram_rows(ghost, "text", "doc_id", 2, "shingles"), "doc_id"
    ).write.mode("append").parquet(os.path.join(path, "gramsets"))

    compact_jaccard_store(spark, path)

    # the ghost id is gone from BOTH sub-stores — not resurrected
    sets = spark.read.parquet(os.path.join(path, "gramsets"))
    postings = spark.read.parquet(os.path.join(path, "postings"))
    assert sets.filter(F.col("doc_id") == 99).count() == 0
    assert postings.filter(F.col("doc_id") == 99).count() == 0
    # landed docs survive compaction intact
    assert sorted(r.doc_id for r in sets.select("doc_id").collect()) == [1, 2]

    # a near-identical later batch matches doc 1, never the ghost
    batch = _mk_docs(spark, [(50, "alpha beta gamma delta epsilon eta")])
    pairs = jaccard_join_incremental(batch, path, append=False).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 50)}


# ------------------------------------------- NULL-text token counting -------


def test_domain_stats_null_text_counts_zero_tokens(spark):
    from etl_data_transformer_spark.operators.domains import domain_stats

    df = spark.createDataFrame(
        [
            ("https://a.example.com/x", "three tokens here"),
            ("https://a.example.com/y", None),
        ],
        "url string, text string",
    )
    row = domain_stats(df).collect()[0]
    assert row.n_docs == 2
    assert row.tok_sum == 3  # NULL text contributes 0, never -1
    assert row.char_sum == len("three tokens here")


def test_corpus_stats_null_text_counts_zero_tokens(spark):
    from etl_data_transformer_spark.plans.quality import corpus_stats

    df = spark.createDataFrame(
        [("en", "web", "two tokens"), ("en", "web", None)],
        "lang string, source string, text string",
    )
    row = corpus_stats(df).collect()[0]
    assert row.n_docs == 2
    assert row.tok_sum == 2
    assert row.max_tokens == 2  # not -1 for the NULL row


# ------------------------------------------- strict domain gate -------------


def test_domain_gate_strict_drops_unattributable_rows(spark):
    from etl_data_transformer_spark.operators.domains import domain_gate

    df = spark.createDataFrame(
        [
            (1, "https://good.example.com/page"),
            (2, "https://other.org/page"),
            (3, None),
            (4, "not a url at all"),
        ],
        "doc_id long, url string",
    )
    # default: NULL/non-URL rows pass ungated even under an allowlist
    lax = domain_gate(df, allowlist=["example.com"])
    assert sorted(r.doc_id for r in lax.collect()) == [1, 3, 4]
    # strict: allowlist semantics — everything unattributable drops
    strict = domain_gate(df, allowlist=["example.com"], strict=True)
    assert sorted(r.doc_id for r in strict.collect()) == [1]
    # strict also applies to pure-blocklist runs (drop what can't be vetted)
    strict_bl = domain_gate(df, blocklist=["other.org"], strict=True)
    assert sorted(r.doc_id for r in strict_bl.collect()) == [1]


def test_runner_strict_domain_gate_drops_unattributable_rows(spark, tmp_path):
    """The strict allowlist mode is reachable from the composed runner:
    NULL/non-URL rows drop instead of bypassing the strictest gate."""
    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest

    batch = spark.createDataFrame(
        [
            (1, "https://good.example.com/p", "kept content here"),
            (2, None, "unattributable row"),
            (3, "not a url", "junk row"),
        ],
        "doc_id long, url string, text string",
    )
    landed = str(tmp_path / "landed")
    r = run_incremental_ingest(
        batch,
        exact_store=str(tmp_path / "ex"),
        survivors_path=landed,
        url_col="url",
        domain_allowlist=["example.com"],
        strict_domain_gate=True,
    )
    assert r.n_domain_dropped == 2 and r.n_landed == 1
    assert [x.doc_id for x in spark.read.parquet(landed).collect()] == [1]
