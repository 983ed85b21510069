"""Regression tests for the round-9 ADVICE findings: NB-store
heal-before-probe ordering, empty-index search schema id-type fidelity,
first-append-to-empty-seeded-index inference crash, and the
top_fraction_per_group reserved working columns.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

# ------------------------------------------- NB store heal-before-probe ----


def test_nb_store_append_heals_before_layout_probe(spark, tmp_path):
    """A crashed swap sidelines the store in a `.backup-*` sibling; the
    streaming-layout guard must probe AFTER the heal, or a flat append
    silently lands unpartitioned files inside the restored
    __batch_id-partitioned store (mixed-layout corruption)."""
    from etl_data_transformer_spark.functions.text import (
        _NB_BINARY_FAMILY,
        _nb_store_ensure,
        nb_count_rows,
        write_nb_store,
    )

    df = spark.createDataFrame(
        [("good text here", 1), ("spam spam spam", 0)], "text string, label int"
    )
    path = str(tmp_path / "nb_store")
    # hand-build a STREAMING-layout store (__batch_id partitions), sidecar'd
    nb_count_rows(df, "label").withColumn("__batch_id", F.lit(0)).write.partitionBy(
        "__batch_id"
    ).parquet(path)
    _nb_store_ensure(path, _NB_BINARY_FAMILY)
    # simulate the hard-crashed swap: target missing, newest backup survives
    os.rename(path, str(tmp_path / ".backup-nb_store-deadbeef"))
    assert not os.path.exists(path)
    with pytest.raises(ValueError, match="streaming"):
        write_nb_store(nb_count_rows(df, "label"), path, mode="append")
    # the heal restored the partitioned store intact — and NO flat data
    # file was appended next to the partition dirs
    assert os.path.isdir(path)
    stray = [
        f for f in os.listdir(path) if f.endswith(".parquet") and not f.startswith(".")
    ]
    assert stray == []
    assert "__batch_id" in spark.read.parquet(path).columns


# ------------------------------------- empty-index search schema fidelity ----


def test_sparse_search_empty_index_preserves_string_id_type(spark, tmp_path):
    """The empty-index early return must carry the CALLER's id type (a
    string-id corpus must not come back as `long`), for both schemes."""
    from etl_data_transformer_spark.operators.similarity import (
        build_tfidf_index,
        sparse_topk_search,
    )

    empty = spark.createDataFrame([], "doc_id string, text string")
    idx = str(tmp_path / "idx")
    build_tfidf_index(empty, idx)
    queries = spark.createDataFrame([("q1", "hello world")], "doc_id string, text string")
    for scheme in ("cosine", "bm25"):
        out = sparse_topk_search(queries, spark, idx, k=3, scheme=scheme)
        assert out.count() == 0
        assert out.schema["doc_id"].dataType.simpleString() == "string"
        assert out.schema["neighbor_id"].dataType.simpleString() == "string"


# ----------------------------------- first append to an empty-seeded index ----


def test_append_to_empty_seeded_index_does_not_crash(spark, tmp_path):
    """An index built over an empty corpus has partitioned tables with no
    data files; the first append must not die with UNABLE_TO_INFER_SCHEMA
    on the disjointness probe (schema-pinned norms read)."""
    from etl_data_transformer_spark.operators.similarity import (
        append_tfidf_index,
        build_tfidf_index,
        sparse_topk_search,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    idx = str(tmp_path / "idx")
    build_tfidf_index(empty, idx)
    batch = spark.createDataFrame([(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string")
    append_tfidf_index(batch, idx)  # must not raise
    # frozen-empty idf means the appended postings are empty; search stays
    # gracefully empty (dl_rows==0 in the frozen sidecar)
    out = sparse_topk_search(
        spark.createDataFrame([(9, "alpha")], "doc_id long, text string"), spark, idx
    )
    assert out.count() == 0


def test_append_disjointness_still_rejects_cross_batch_reemission(spark, tmp_path):
    """The norms-based (∝ docs, schema-pinned) disjointness check keeps the
    contract: re-emitting an already-indexed id from a DIFFERENT batch
    raises; a same-id-set rerun still heals by replacement."""
    from etl_data_transformer_spark.operators.similarity import (
        append_tfidf_index,
        build_tfidf_index,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta gamma delta")], "doc_id long, text string"
    )
    idx = str(tmp_path / "idx")
    build_tfidf_index(corpus, idx)
    batch = spark.createDataFrame([(3, "alpha delta")], "doc_id long, text string")
    append_tfidf_index(batch, idx)
    # same id from a different batch (different id set) → raise
    clash = spark.createDataFrame([(3, "changed text"), (4, "new")], "doc_id long, text string")
    with pytest.raises(ValueError, match="already indexed"):
        append_tfidf_index(clash, idx)
    # id colliding with the BUILD partition → raise too
    clash2 = spark.createDataFrame([(1, "changed")], "doc_id long, text string")
    with pytest.raises(ValueError, match="already indexed"):
        append_tfidf_index(clash2, idx)
    # exact same id set = replay → replaces its own partition, no raise
    append_tfidf_index(batch, idx)


# ------------------------------------ top_fraction reserved working columns ----


def test_top_fraction_rejects_reserved_working_columns(spark):
    from etl_data_transformer_spark.operators.curation import top_fraction_per_group

    df = spark.createDataFrame([(1, 0.5, 7)], "doc_id long, score double, __rn int")
    with pytest.raises(ValueError, match="__rn"):
        top_fraction_per_group(df, "score", 0.5)
    df2 = spark.createDataFrame([(1, 0.5, 7)], "doc_id long, score double, __n int")
    with pytest.raises(ValueError, match="__n"):
        top_fraction_per_group(df2, "score", 0.5)
