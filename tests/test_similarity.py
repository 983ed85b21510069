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


def test_ivf_persisted_index_matches_direct_topk(spark, star, tmp_path):
    """ivf_search over a written-and-reloaded partitioned index must equal
    ivf_topk with the same centroids — persistence changes storage, never
    the answer."""
    emb = star["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
    q = emb.filter(F.col("id") < 5)
    cents, assignments = SIM.ivf_index(emb, n_lists=8)
    path = str(tmp_path / "ivf_index")
    assignments.write.partitionBy("list_id").parquet(path)
    index = spark.read.parquet(path)

    direct = sorted(map(tuple, SIM.ivf_topk(q, emb, k=5, n_probes=3, centroids=cents).collect()))
    stored = sorted(map(tuple, SIM.ivf_search(q, index, cents, k=5, n_probes=3).collect()))
    assert direct == stored and len(stored) > 0


def test_ivf_search_prunes_unprobed_partitions(spark, star, tmp_path):
    """The probed-list filter must reach the partitioned scan as a
    PartitionFilter (unprobed lists never read — the IVF scale property)."""
    emb = star["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
    q = emb.filter(F.col("id") == 0)
    cents, assignments = SIM.ivf_index(emb, n_lists=8)
    path = str(tmp_path / "ivf_index")
    assignments.write.partitionBy("list_id").parquet(path)
    index = spark.read.parquet(path)

    out = SIM.ivf_search(q, index, cents, k=3, n_probes=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan = next(ln for ln in plan.splitlines() if "FileScan parquet" in ln and "list_id" in ln)
    assert "PartitionFilters" in scan and "list_id" in scan.split("PartitionFilters")[1][:120]


def test_ivf_assign_incremental_append(spark, star, tmp_path):
    """New vectors assigned against frozen centroids and appended to the
    index become searchable — no retraining, no rewrite of existing rows."""
    emb = star["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
    cents, assignments = SIM.ivf_index(emb, n_lists=8)
    path = str(tmp_path / "ivf_index")
    assignments.write.partitionBy("list_id").parquet(path)

    # plant a near-copy of vector 0 under a fresh id and append it
    v0 = emb.filter(F.col("id") == 0).collect()[0]["embedding"]
    planted = spark.createDataFrame(
        [(99999, [float(x) + 1e-4 for x in v0])], "id long, embedding array<float>"
    )
    SIM.ivf_assign(planted, cents).write.mode("append").partitionBy("list_id").parquet(path)

    index = spark.read.parquet(path)
    q = emb.filter(F.col("id") == 0)
    got = {r["neighbor_id"]: r["rank"] for r in SIM.ivf_search(q, index, cents, k=3).collect()}
    assert got.get(99999) == 1  # the planted near-copy is the top neighbor


def test_ivf_quantized_rerank_matches_full_precision(spark, star, tmp_path):
    """The int8-coarse + full-precision-rerank path must return EXACTLY the
    full-precision search result on the fixture (rerank_k wide enough that
    quantization error cannot evict a true top-k candidate), through a
    written-and-reloaded quantized index."""
    emb = star["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
    q = emb.filter(F.col("id") < 10)
    cents, assignments = SIM.ivf_index(emb, n_lists=8, quantize=True)
    path = str(tmp_path / "ivf_q_index")
    assignments.write.mode("overwrite").partitionBy("list_id").parquet(path)
    index = spark.read.parquet(path)
    assert {"codes", "scale"} <= set(index.columns)
    # codes stored as tinyint: the 4x-smaller coarse column the probe reads
    assert dict(index.dtypes)["codes"] == "array<tinyint>"

    full = sorted(map(tuple, SIM.ivf_search(q, index, cents, k=5, n_probes=3).collect()))
    rq = SIM.ivf_search(
        q, index, cents, k=5, n_probes=3, rerank_quantized=True, rerank_k=20
    )
    reranked = sorted(map(tuple, rq.collect()))
    assert reranked == full

    # the IO contract, phase by phase (the coarse phase materializes via
    # localCheckpoint inside ivf_search, so its scan isn't in rq's plan):
    # 1. coarse subplan reads codes WITHOUT the embedding column under the
    #    list_id partition filter (the ~4x probed-IO cut)
    probes = SIM._ivf_probes_expr(q, cents, 3)
    pruned = index.filter(F.col("list_id").isin([1, 2, 3]))
    coarse_plan = (
        SIM._ivf_coarse_candidates(probes, pruned, 20, True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    coarse = [ln for ln in coarse_plan.splitlines() if "FileScan" in ln and "list_id" in ln]
    assert coarse and all("embedding" not in ln.split("ReadSchema")[-1] for ln in coarse)
    assert all("list_id" in ln.split("PartitionFilters")[1].split("PushedFilters")[0] for ln in coarse)
    # 2. the full plan (join path — the coarse scan is no longer hidden
    #    behind a checkpoint) splits its index scans cleanly: coarse scans
    #    read codes WITHOUT embedding, the rerank scan reads embedding
    #    WITHOUT codes, and no scan carries a driver-materialized
    #    candidate In(...) predicate — the round-9 contract after the isin
    #    branch's deletion (candidates arrive by join; see SCALING.md)
    plan = rq._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "FileScan" in ln and "list_id" in ln]
    rerank = [ln for ln in scans if "embedding" in ln.split("ReadSchema")[-1]]
    coarse2 = [ln for ln in scans if "codes" in ln.split("ReadSchema")[-1]]
    assert rerank and all("codes" not in ln.split("ReadSchema")[-1] for ln in rerank)
    assert coarse2 and all("embedding" not in ln.split("ReadSchema")[-1] for ln in coarse2)
    assert all(
        "In(" not in ln.split("PushedFilters")[-1].split("ReadSchema")[0] for ln in scans
    )


def test_ivf_quantized_rerank_guards(spark, star):
    import pytest

    emb = star["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
    q = emb.filter(F.col("id") < 3)
    cents, plain = SIM.ivf_index(emb, n_lists=4)  # no codes column
    with pytest.raises(ValueError, match="quantize=True"):
        SIM.ivf_search(q, plain, cents, k=3, rerank_quantized=True)
    cents2, quant = SIM.ivf_index(emb, n_lists=4, quantize=True)
    with pytest.raises(ValueError, match="must be >= k"):
        SIM.ivf_search(q, quant, cents2, k=5, rerank_quantized=True, rerank_k=2)


def test_ivf_assign_arrow_matches_expr_path(spark, star):
    """The Arrow-matmul assignment (the many-lists scale path) must agree
    with the JVM-expression path on every fixture vector, including through
    quantize=True, and ivf_search over either index returns the same top-k."""
    emb = star["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
    cents = SIM.train_ivf_centroids(emb, n_lists=8)
    expr = {r["id"]: r["list_id"] for r in SIM.ivf_assign(emb, cents, arrow=False).collect()}
    arrow = {r["id"]: r["list_id"] for r in SIM.ivf_assign(emb, cents, arrow=True).collect()}
    assert expr == arrow and len(expr) > 0

    qa = SIM.ivf_assign(emb, cents, quantize=True, arrow=True)
    assert {"codes", "scale"} <= set(qa.columns)
    q = emb.filter(F.col("id") < 5)
    a = sorted(map(tuple, SIM.ivf_search(q, SIM.ivf_assign(emb, cents, arrow=False), cents, k=3).collect()))
    b = sorted(map(tuple, SIM.ivf_search(q, SIM.ivf_assign(emb, cents, arrow=True), cents, k=3).collect()))
    assert a == b


def test_ivf_search_arrow_probes_match_expr_path(spark, star):
    """Round-5 verdict #4: query-side probe selection has the same Arrow
    BLAS path as assignment. Pin (a) the per-query probed list SETS and
    their rank ORDER identical between paths, (b) the final top-k identical,
    (c) the auto-switch: no Python node below 32 lists, mapInPandas at >=32."""
    emb = star["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
    cents = SIM.train_ivf_centroids(emb, n_lists=8)
    index = SIM.ivf_assign(emb, cents, arrow=False)
    q = emb.filter(F.col("id") < 10)

    # (a) probe SETS identical between the Arrow and expression paths at
    # every prefix length 1..4 — set equality at each nested prefix pins
    # the rank ORDER too (the rank-p probe is the lone element added going
    # from prefix p-1 to p), and n_probes=1 must equal the assignment list
    n_q = q.count()
    for npb in (1, 2, 3, 4):
        a = {
            (r["query_id"], r["list_id"])
            for r in SIM._ivf_probes_arrow(q, cents, npb).collect()
        }
        e = {
            (r["query_id"], r["list_id"])
            for r in SIM._ivf_probes_expr(q, cents, npb).collect()
        }
        assert a == e and len(a) == n_q * npb, npb
    own_list = {r["id"]: r["list_id"] for r in index.filter(F.col("id") < 10).collect()}
    one_probe = {
        r["query_id"]: r["list_id"]
        for r in SIM._ivf_probes_arrow(q, cents, 1).collect()
    }
    assert one_probe == own_list

    # (b) full search results identical under both modes
    for npb in (1, 3, 8):
        a = sorted(map(tuple, SIM.ivf_search(q, index, cents, k=4, n_probes=npb, arrow=False).collect()))
        b = sorted(map(tuple, SIM.ivf_search(q, index, cents, k=4, n_probes=npb, arrow=True).collect()))
        assert a == b and len(a) > 0

    # quantized rerank path through Arrow probes too
    qidx = SIM.ivf_assign(emb, cents, quantize=True, arrow=False)
    a = sorted(map(tuple, SIM.ivf_search(q, qidx, cents, k=3, rerank_quantized=True, arrow=False).collect()))
    b = sorted(map(tuple, SIM.ivf_search(q, qidx, cents, k=3, rerank_quantized=True, arrow=True).collect()))
    assert a == b

    # (c) auto-switch both sides: 8 lists -> no Python node in the search
    # plan; >=32 lists -> the probe mapInPandas engages (checked on the
    # CHECKPOINTED probe frame's own plan — after the eager localCheckpoint
    # the search plan reads scanned blocks, not the Python node itself)
    plan_few = SIM.ivf_search(q, index, cents, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan_few and "MapInPandas" not in plan_few
    import numpy as np

    rng = np.random.default_rng(7)
    many_cents = [[float(v) for v in rng.normal(size=64)] for _ in range(40)]
    probes_plan = (
        SIM._ivf_probes_arrow(q, many_cents, 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in probes_plan or "Python" in probes_plan
    many_index = SIM.ivf_assign(emb, many_cents)
    got_many = SIM.ivf_search(q, many_index, many_cents, k=3)  # arrow=None -> auto
    assert got_many.count() > 0  # end-to-end through the auto Arrow path


def test_ivf_assign_auto_picks_arrow_at_many_lists(spark):
    """arrow=None auto-selects: expression path below 32 lists (no Python
    in the plan), Arrow path at >= 32 (ArrowEvalPython/mapInPandas node)."""
    rows = [(i, [float(i % 7), float(i % 5), 1.0, 0.0]) for i in range(64)]
    df = spark.createDataFrame(rows, "id long, embedding array<float>")
    few = [[float(j), 1.0, 0.0, 0.0] for j in range(4)]
    many = [[float(j % 9), float(j % 4), 1.0, 0.0] for j in range(40)]
    plan_few = SIM.ivf_assign(df, few)._jdf.queryExecution().executedPlan().toString()
    plan_many = SIM.ivf_assign(df, many)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan_few
    assert "Python" in plan_many or "MapInPandas" in plan_many


def test_ivf_over_matryoshka_truncated_embeddings(spark, star):
    """The truncation and IVF levers COMPOSE: an IVF search over
    16-of-64-dim matryoshka-truncated embeddings still recalls a useful
    share of the FULL-precision exact top-5 per query — the 4x index
    storage/probe-IO saving with bounded recall cost the docstrings claim."""
    from etl_data_transformer_spark.functions.vector import matryoshka_truncate
    from etl_data_transformer_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    e = star["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
    trunc = e.select("id", matryoshka_truncate("embedding", 16).alias("embedding"))
    q_full = e.filter(F.col("id") < 10)
    q_trunc = trunc.filter(F.col("id") < 10)
    exact = brute_force_topk(q_full, e, k=5)
    approx = ivf_topk(q_trunc, trunc, k=5, n_lists=8, n_probes=4)
    hits = (
        exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    got = {r["query_id"]: r["n_hits"] for r in hits.collect()}
    # RANDOM (non-MRL) fixture vectors: a 16-of-64 prefix carries ~sqrt(1/4)
    # of the similarity signal, so per-query top-5 recall is genuinely weak
    # here (measured 6/50, deterministic under the seeded k-means) — but
    # chance is 10 queries x 5 slots x 5/2000 ~ 0.125 expected hits, so >= 4
    # is ~30x above chance: the composed pipeline works end-to-end and
    # retains real signal. MRL-trained embeddings are the production case.
    assert sum(got.values()) >= 4, got


def test_ivf_delete_removes_vectors_and_preserves_layout(spark, star, tmp_path):
    """Deleted vectors disappear from search results; survivors' results
    equal an index rebuilt without them; the partitioned layout (and its
    PartitionFilters pruning) survives the rewrite."""
    emb = star["embeddings"].select(F.col("vec_id").alias("id"), "embedding")
    q = emb.filter(F.col("id") < 5)
    cents, assignments = SIM.ivf_index(emb, n_lists=8)
    path = str(tmp_path / "ivf_del")
    assignments.write.partitionBy("list_id").parquet(path)

    drop = emb.filter((F.col("id") >= 100) & (F.col("id") < 300)).select("id")
    SIM.ivf_delete(spark, path, drop)
    index = spark.read.parquet(path)
    assert index.filter((F.col("id") >= 100) & (F.col("id") < 300)).count() == 0

    got = SIM.ivf_search(q, index, cents, k=5, n_probes=3)
    dropped = {r["id"] for r in drop.collect()}
    assert not any(r["neighbor_id"] in dropped for r in got.collect())
    # equivalence with an index built from the surviving corpus only
    survivors = emb.filter((F.col("id") < 100) | (F.col("id") >= 300))
    rebuilt = SIM.ivf_assign(survivors, cents)
    want = sorted(map(tuple, SIM.ivf_search(q, rebuilt, cents, k=5, n_probes=3).collect()))
    assert sorted(map(tuple, got.collect())) == want
    # layout: partition pruning still applies after the rewrite
    out = SIM.ivf_search(q.limit(1), index, cents, k=3, n_probes=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan = next(ln for ln in plan.splitlines() if "FileScan parquet" in ln and "list_id" in ln)
    assert "PartitionFilters" in scan


def test_sparse_cosine_topk_semantics(spark):
    """Hand-checkable corpus: identical docs rank 1.0 first, partial
    overlaps order by cosine, stop-terms above max_df drop out of BOTH the
    join and the norms (pairs sharing only stop-terms vanish), rnk is
    contiguous and bounded by k."""
    from etl_data_transformer_spark.operators.similarity import sparse_cosine_topk

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma"),  # identical to 1 -> cosine exactly 1.0
            (3, "alpha beta delta"),  # 2/3 overlap with 1 and 2
            (4, "zeta eta theta"),  # disjoint -> no rows with 1-3
            (5, "zeta eta iota"),
        ],
        "doc_id long, text string",
    )
    out = sparse_cosine_topk(docs, k=3).collect()
    got = {(r["doc_id"], r["neighbor_id"]): (r["rnk"], r["cos_sim"]) for r in out}
    assert got[(1, 2)] == (1, 1.0) and got[(2, 1)] == (1, 1.0)
    assert got[(1, 3)][0] == 2 and 0 < got[(1, 3)][1] < 1
    assert (1, 4) not in got and (4, 1) not in got
    assert got[(4, 5)][0] == 1
    by_doc = {}
    for (d, _n), (rnk, _c) in got.items():
        by_doc.setdefault(d, []).append(rnk)
    for d, rnks in by_doc.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1)), d
        assert len(rnks) <= 3

    # a universal stop term must not rescue disjoint docs into the output
    stopped = spark.createDataFrame(
        [(i, f"the unique{i} word{i}") for i in range(1, 5)],
        "doc_id long, text string",
    )
    none_shared = sparse_cosine_topk(stopped, k=3, max_df=3).collect()
    assert none_shared == []  # 'the' (df=4 > 3) was the only shared term
    # without the cap the same corpus DOES pair through 'the'
    assert sparse_cosine_topk(stopped, k=3).count() > 0


def test_tfidf_index_frozen_vocab_and_sidecar(spark, tmp_path):
    """Persisted-index contract: queries weight under the FROZEN idf (a
    query made only of terms unseen at build time matches nothing, no
    error), identical queries rank their corpus twin first, and an
    algorithm-version mismatch in the sidecar rejects the searcher."""
    import json
    import os

    import pytest as _pytest

    from etl_data_transformer_spark.operators.similarity import (
        build_tfidf_index,
        sparse_topk_search,
    )

    corpus = spark.createDataFrame(
        [(100, "alpha beta gamma"), (101, "alpha beta delta"), (102, "zeta eta theta")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_tfidf_index(corpus, idx)
    queries = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "totally unseen vocabulary")],
        "doc_id long, text string",
    )
    out = sparse_topk_search(queries, spark, idx, k=2).collect()
    got = {(r["doc_id"], r["rnk"]): (r["neighbor_id"], r["cos_sim"]) for r in out}
    assert got[(1, 1)] == (100, 1.0)  # exact twin ranks first at cosine 1
    assert got[(1, 2)][0] == 101
    assert not any(d == 2 for d, _ in got)  # unseen-vocab query: no rows, no error
    # rerun-deterministic
    again = {(r["doc_id"], r["rnk"]): (r["neighbor_id"], r["cos_sim"])
             for r in sparse_topk_search(queries, spark, idx, k=2).collect()}
    assert again == got
    # sidecar algo drift rejects
    sc = os.path.join(idx, "_tfidf_params.json")
    p = json.load(open(sc))
    p["algo"] = "tfidf-other-v9"
    json.dump(p, open(sc, "w"))
    with _pytest.raises(ValueError, match="rebuild the index"):
        sparse_topk_search(queries, spark, idx, k=2)


def test_bm25_search_semantics(spark, tmp_path):
    """Okapi BM25 over the frozen index: term saturation (doubling tc far
    from doubles the score), document-length normalization (same tc in a
    longer doc scores LOWER), query-term frequency multiplies linearly,
    integer-only output, and unknown schemes reject."""
    import pytest as _pytest

    from etl_data_transformer_spark.operators.similarity import (
        build_tfidf_index,
        sparse_topk_search,
    )

    corpus = spark.createDataFrame(
        [
            (100, "target filler1 filler2 filler3"),  # tc(target)=1, dl=4
            (101, "target target filler4 filler5"),  # tc=2, same dl
            (102, "target " + " ".join(f"pad{i}" for i in range(20))),  # tc=1, long
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_tfidf_index(corpus, idx)
    q1 = spark.createDataFrame([(1, "target")], "doc_id long, text string")
    out = {r["neighbor_id"]: (r["rnk"], r["score_milli"])
           for r in sparse_topk_search(q1, spark, idx, k=3, scheme="bm25").collect()}
    assert set(out) == {100, 101, 102}
    s100, s101, s102 = out[100][1], out[101][1], out[102][1]
    assert isinstance(s100, int)
    assert s101 > s100  # more occurrences score higher...
    assert s101 < 2 * s100  # ...but k1 saturation keeps it sub-linear
    assert s102 < s100  # same tc in a longer doc scores lower (b)
    assert out[101][0] == 1  # ranking follows the scores
    # qtf multiplies the contribution linearly (inside the per-triple
    # rounding, so the doubled score may differ from 2x by one milli)
    q2 = spark.createDataFrame([(2, "target target")], "doc_id long, text string")
    out2 = {r["neighbor_id"]: r["score_milli"]
            for r in sparse_topk_search(q2, spark, idx, k=3, scheme="bm25").collect()}
    assert abs(out2[100] - 2 * s100) <= 1
    with _pytest.raises(ValueError, match="unknown scheme"):
        sparse_topk_search(q1, spark, idx, scheme="tfidf")


def test_tfidf_index_append_replace_semantics(spark, tmp_path):
    """Incremental append (round-9 v3): appended docs become searchable
    under the frozen statistics; a replayed append REPLACES its own
    __batch partition (identical counts, identical scores); a simulated
    partial crash — a truncated own-partition — is replaced wholesale, so
    no doc can survive with a truncated vector; BM25 scores of
    already-indexed docs do NOT shift when a short doc is appended (the
    frozen avgdl); an id re-emitted from a DIFFERENT batch raises; NULL
    ids raise; algorithm drift rejects."""
    import json
    import os

    import pytest as _pytest

    from etl_data_transformer_spark.operators.similarity import (
        append_tfidf_index,
        build_tfidf_index,
        sparse_topk_search,
    )

    corpus = spark.createDataFrame(
        [(100 + i, f"alpha beta common{i % 3} word{i}") for i in range(6)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_tfidf_index(corpus, idx)
    q = spark.createDataFrame([(1, "alpha beta common0")], "doc_id long, text string")
    bm25_before = {
        r["neighbor_id"]: r["score_milli"]
        for r in sparse_topk_search(q, spark, idx, k=20, scheme="bm25").collect()
    }

    batch = spark.createDataFrame(
        [(200, "alpha beta common0 fresh"), (201, "alpha unseen thing")],
        "doc_id long, text string",
    )
    append_tfidf_index(batch, idx)
    out = {r["neighbor_id"]: r["cos_sim"]
           for r in sparse_topk_search(q, spark, idx, k=20).collect()}
    assert 200 in out and 201 in out  # appended docs are searchable
    w_rows = spark.read.parquet(os.path.join(idx, "weights")).count()
    n_rows = spark.read.parquet(os.path.join(idx, "norms")).count()
    # replay: the batch's partition is REPLACED — identical counts/scores
    append_tfidf_index(batch, idx)
    assert spark.read.parquet(os.path.join(idx, "weights")).count() == w_rows
    assert spark.read.parquet(os.path.join(idx, "norms")).count() == n_rows
    again = {r["neighbor_id"]: r["cos_sim"]
             for r in sparse_topk_search(q, spark, idx, k=20).collect()}
    assert again == out
    # frozen avgdl: appending a (short) doc must not shift the BM25 scores
    # of previously indexed documents
    bm25_after = {
        r["neighbor_id"]: r["score_milli"]
        for r in sparse_topk_search(q, spark, idx, k=20, scheme="bm25").collect()
    }
    for n, sc in bm25_before.items():
        assert bm25_after[n] == sc, n

    # simulated partial crash: truncate the batch's own partition to one
    # row, rerun — the partition is replaced wholesale, nothing truncated
    # survives
    wdir = os.path.join(idx, "weights")
    parts = [d for d in os.listdir(wdir) if d.startswith("__batch=") and "build" not in d]
    assert len(parts) == 1
    own = os.path.join(wdir, parts[0])
    truncated = spark.read.parquet(own).limit(1).collect()
    spark.createDataFrame(
        truncated, spark.read.parquet(own).schema
    ).write.mode("overwrite").parquet(own)
    append_tfidf_index(batch, idx)  # rerun heals by replacement
    assert spark.read.parquet(os.path.join(idx, "weights")).count() == w_rows
    healed = {r["neighbor_id"]: r["cos_sim"]
              for r in sparse_topk_search(q, spark, idx, k=20).collect()}
    assert healed == out

    # an id re-emitted from a DIFFERENT batch is a contract violation
    clash = spark.createDataFrame(
        [(200, "changed text for an already indexed id"), (300, "brand new")],
        "doc_id long, text string",
    )
    with _pytest.raises(ValueError, match="already indexed"):
        append_tfidf_index(clash, idx)
    # NULL ids raise lazily
    nulls = spark.createDataFrame([(None, "alpha")], "doc_id long, text string")
    with _pytest.raises(Exception, match="NULL doc_id"):
        append_tfidf_index(nulls, idx)
    # duplicate ids WITHIN a batch raise (they would merge counts and can
    # XOR-cancel the fingerprint into a partition collision)
    dups = spark.createDataFrame(
        [(500, "text a"), (500, "text b")], "doc_id long, text string"
    )
    with _pytest.raises(ValueError, match="duplicate doc_id"):
        append_tfidf_index(dups, idx)
    # drift rejects
    sc = os.path.join(idx, "_tfidf_params.json")
    pjson = json.load(open(sc)); pjson["algo"] = "tfidf-other"
    json.dump(pjson, open(sc, "w"))
    with _pytest.raises(ValueError, match="rebuild the index"):
        append_tfidf_index(batch, idx)


def test_tfidf_index_empty_corpus_builds_and_searches_empty(spark, tmp_path):
    """An index whose every term exceeds max_df (or an empty corpus) must
    BUILD cleanly under the v3 partitioned layout (schema-pinned staged
    read-backs) and SEARCH as the graceful empty under both schemes —
    never UNABLE_TO_INFER_SCHEMA."""
    from etl_data_transformer_spark.operators.similarity import (
        build_tfidf_index,
        sparse_topk_search,
    )

    corpus = spark.createDataFrame(
        [(i, "the the common words") for i in range(5)], "doc_id long, text string"
    )
    idx = str(tmp_path / "idx")
    build_tfidf_index(corpus, idx, max_df=1)  # every term df=5 > 1 -> all capped
    q = spark.createDataFrame([(1, "the common")], "doc_id long, text string")
    assert sparse_topk_search(q, spark, idx, k=3).collect() == []
    assert sparse_topk_search(q, spark, idx, k=3, scheme="bm25").collect() == []
