"""Similarity-search tiers: brute force (exact), LSH + IVF (approximate —
asserted by recall against the exact answer)."""

from pyspark.sql import functions as F

from etl_data_transformer_spark.operators import similarity as SIM


def _crafted(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.9, 0.1, 0.0]),
        (4, [0.0, 0.0, 0.0, 1.0]),
    ]
    return spark.createDataFrame(rows, "id long, embedding array<float>")


def test_brute_force_topk_exact(spark):
    df = _crafted(spark)
    q = df.filter(F.col("id") == 0)
    out = SIM.brute_force_topk(q, df, k=2).collect()
    got = {r["rank"]: r["neighbor_id"] for r in out}
    assert got[1] == 1  # most-similar first
    assert len(out) == 2


def test_lsh_topk_recall_on_fixtures(spark, star):
    emb = star["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
    q = emb.filter(F.col("id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.brute_force_topk(q, emb, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.lsh_topk(q, emb, k=5, num_hash_tables=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9  # high recall at this tiny scale (full bucket overlap)


def test_ivf_topk_shape_and_recall(spark, star):
    emb = star["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
    q = emb.filter(F.col("id") < 5)
    out = SIM.ivf_topk(q, emb, k=5, n_lists=4).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(per_q) == {0, 1, 2, 3, 4}
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in SIM.brute_force_topk(q, emb, k=5).collect()
    }
    approx = {(r["query_id"], r["neighbor_id"]) for r in out}
    # a coarse 4-list quantizer on random vectors still recovers a fair share
    assert len(exact & approx) / len(exact) >= 0.3


def test_train_ivf_centroids_empty_corpus_raises(spark):
    import pytest

    empty = spark.createDataFrame([], "id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        SIM.train_ivf_centroids(empty)
