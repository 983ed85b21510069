"""PII redaction, contamination detection, sequence packing
(operators/curation.py — the training-data curation surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_data_transformer_spark.operators import curation as C


def test_redact_pii_all_classes(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at alice.smith+x@example.co.uk today"),
            (2, "card 4111 1111 1111 1111 expires soon"),
            (3, "call +1-555-123-4567 or 030 1234 5678"),
            (4, "host at 192.168.10.1 went down"),
            (5, "nothing sensitive here"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["text"] for r in C.redact_documents(df).collect()}
    assert got[1] == "mail me at <EMAIL> today"
    assert got[2] == "card <CARD> expires soon"
    assert "<PHONE>" in got[3] and "555" not in got[3] and "1234" not in got[3]
    assert got[4] == "host at <IP> went down"
    assert got[5] == "nothing sensitive here"


def test_redact_pii_is_single_codegen_projection(spark):
    df = spark.createDataFrame([(1, "a@b.co")], "id long, text string")
    plan = C.redact_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: pure projection
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_contamination_check_flags_planted_overlap(spark):
    # benchmark doc planted verbatim inside corpus doc 1; doc 2 is clean
    bench_text = "the quick brown fox jumps over the lazy dog near the river bank today"
    corpus = spark.createDataFrame(
        [
            (1, f"intro words then {bench_text} and some closing words here"),
            (2, "an entirely different document about spark shuffle partitions "
                "and adaptive query execution behavior at scale"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in C.contamination_check(corpus, bench, n=8, threshold=0.1).collect()}
    assert got[1]["contaminated"] and got[1]["n_hits"] > 0
    assert not got[2]["contaminated"] and got[2]["n_hits"] == 0
    assert 0.0 < got[1]["contamination"] <= 1.0


def test_contamination_check_broadcasts_benchmark(spark):
    corpus = spark.createDataFrame([(1, "a b c d e f g h i j")], "doc_id long, text string")
    bench = spark.createDataFrame([(9, "a b c d e f g h")], "doc_id long, text string")
    plan = (
        C.contamination_check(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan  # semi-join against the broadcast eval set
    assert "BroadcastNestedLoopJoin" not in plan


def test_pack_sequences_respects_budget_and_covers_all_docs(spark):
    docs = [(i, " ".join(["tok"] * n)) for i, n in enumerate([50, 60, 70, 100, 10, 90, 40])]
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(2)
    bins = C.pack_sequences(df, max_tokens=100).collect()
    # every bin within budget
    assert all(r["n_tokens"] <= 100 for r in bins)
    # every doc packed exactly once
    packed = sorted(d for r in bins for d in r["doc_ids"])
    assert packed == list(range(7))
    # bin token counts are the sum of their members' counts
    by_id = dict(enumerate([50, 60, 70, 100, 10, 90, 40]))
    for r in bins:
        assert r["n_tokens"] == sum(by_id[d] for d in r["doc_ids"])
        assert r["n_docs"] == len(r["doc_ids"])


def test_pack_sequences_oversized_doc_gets_own_bin(spark):
    df = spark.createDataFrame(
        [(1, " ".join(["t"] * 500)), (2, "a b")], "doc_id long, text string"
    ).coalesce(1)
    bins = {tuple(r["doc_ids"]): r for r in C.pack_sequences(df, max_tokens=100).collect()}
    assert (1,) in bins and bins[(1,)]["n_tokens"] == 500  # own bin, untruncated
    assert (2,) in bins


def test_redact_pii_ip_with_three_digit_octets_not_phone(spark):
    df = spark.createDataFrame([(1, "host 192.168.100.200 down")], "id long, text string")
    got = C.redact_documents(df).collect()[0]["text"]
    assert got == "host <IP> down"


def test_redact_pii_leaves_comma_grouped_numbers_alone(spark):
    """Regression: the phone separator class must be literal space/dot/dash,
    not the [ -.] character RANGE (which matched ',', '(', '*', ... and
    falsely redacted large comma-grouped numbers)."""
    df = spark.createDataFrame(
        [(1, "total=1,234,567,890 units"), (2, "call +1 555 123 4567 now")],
        "id long, text string",
    )
    got = {r["id"]: r["text"] for r in C.redact_documents(df).collect()}
    assert got[1] == "total=1,234,567,890 units"
    assert got[2] == "call <PHONE> now"


def test_stratified_cap_keeps_best_per_group(spark):
    rows = [(i, "big" if i < 10 else "small", float(i)) for i in range(13)]
    df = spark.createDataFrame(rows, "doc_id long, source string, q double")
    out = C.stratified_cap(df, key_col="source", cap_n=3, order_col="q").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    # big group capped to its 3 HIGHEST-q members; small group untouched
    assert sorted(by_src["big"]) == [7, 8, 9]
    assert sorted(by_src["small"]) == [10, 11, 12]


def test_stratified_cap_hash_mode_is_deterministic(spark):
    rows = [(i, "s") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = sorted(r["doc_id"] for r in C.stratified_cap(df, cap_n=10).collect())
    b = sorted(r["doc_id"] for r in C.stratified_cap(df.repartition(7), cap_n=10).collect())
    assert a == b and len(a) == 10  # partitioning-independent selection


def test_stratified_cap_two_phase_equals_single_window(spark):
    """The pre-cap phase must never change the result: two-phase == the
    single-window plan on a skewed frame (one group = 80% of rows), in both
    order_col and hash modes, across repartitionings."""
    rows = [(i, "hot" if i % 5 != 0 else f"cold{i % 3}", float(i % 17)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string, q double").repartition(8)
    for kwargs in ({"order_col": "q"}, {}):
        one = sorted(
            (r["source"], r["doc_id"])
            for r in C.stratified_cap(df, cap_n=7, two_phase=False, **kwargs).collect()
        )
        two = sorted(
            (r["source"], r["doc_id"])
            for r in C.stratified_cap(df, cap_n=7, two_phase=True, **kwargs).collect()
        )
        two_repart = sorted(
            (r["source"], r["doc_id"])
            for r in C.stratified_cap(df.repartition(3), cap_n=7, two_phase=True, **kwargs).collect()
        )
        assert one == two == two_repart and len(one) == 7 * 4  # hot + cold0..2


def test_stratified_cap_plan_has_partial_group_limit(spark):
    """The straggler defense the docstring claims: Catalyst must plan a
    Partial WindowGroupLimit BEFORE the exchange (map-side top-k per group),
    so a hot group's reducer receives at most cap_n × n_map_partitions rows,
    never the whole group. Checked in both order modes."""
    rows = [(i, "hot", float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, q double").repartition(10)
    for kwargs in ({"order_col": "q"}, {}):
        out = C.stratified_cap(df, cap_n=5, **kwargs)
        plan = out._jdf.queryExecution().executedPlan().toString()
        partial = plan.find("WindowGroupLimit")
        assert partial != -1 and "Partial" in plan, plan
        # Partial group-limit sits below (after, in toString order) the
        # exchange: the map side prunes before anything shuffles
        assert "Exchange" in plan[:plan.rfind("WindowGroupLimit")], plan
    assert C.stratified_cap(df, cap_n=5, order_col="q").count() == 5


def test_stratified_cap_two_phase_plan_has_two_windows(spark):
    """two_phase=True adds the explicit (key, partition-id) pre-cap window."""
    rows = [(i, "hot", float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, q double").repartition(10)
    pre = C.stratified_cap(df, cap_n=5, order_col="q", two_phase=True)
    assert pre.count() == 5  # final contract
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window(") >= 2 or plan.count("Window ") >= 2 or plan.count("Window") >= 2


def test_hyperplane_lsh_finds_identical_and_near_vectors(spark):
    base = [1.0, 0.5, -0.3, 0.8]
    near = [1.01, 0.49, -0.31, 0.79]          # tiny angle
    far = [-1.0, 0.5, 0.3, -0.8]              # large angle
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, far)],
        "vec_id long, embedding array<float>",
    )
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in C.hyperplane_lsh_pairs(df, n_bits=16, max_hamming=2).collect()}
    assert pairs.get((1, 2)) == 0            # identical vectors: hamming 0
    assert (1, 3) in pairs and (2, 3) in pairs  # near vector found
    assert (1, 4) not in pairs and (3, 4) not in pairs  # far vector blocked out


def test_lm_quality_filter_drops_gibberish(spark):
    """Percentile-thresholded LM filter: gibberish lands below the corpus
    quantile and is dropped; natural text survives; blank docs (unscoreable)
    always drop; an empty corpus returns empty instead of crashing."""
    from etl_data_transformer_spark.operators.curation import lm_quality_filter

    common = "the quick brown fox jumps over the lazy dog and then some more"
    # 38 natural + 2 gibberish (5% noise): the p10 cutoff sits at the natural
    # score, strictly above both gibberish scores
    rows = [(i, common) for i in range(38)]
    rows += [(100, "zxqv jkwpl mnbtr qqoxz vvklm"), (101, "qqq zzz xxx vvv kkk www"), (102, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r["doc_id"] for r in lm_quality_filter(df, keep_fraction=0.9).collect()}
    assert 100 not in kept and 101 not in kept and 102 not in kept
    assert set(range(38)) <= kept

    bi = {r["doc_id"] for r in lm_quality_filter(df, keep_fraction=0.9, use_bigram=True).collect()}
    assert 100 not in bi and set(range(38)) <= bi

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert lm_quality_filter(empty).collect() == []


def test_pack_sequences_colocate_by_length_invariants(spark):
    """Length co-location changes partitioning, never the packing contract:
    exactly-once coverage, budget respected, token sums exact."""
    from etl_data_transformer_spark.operators.curation import pack_sequences

    sizes = [5, 90, 7, 88, 3, 95, 11, 80, 2, 99] * 4
    docs = [(i, " ".join(["w"] * n)) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(6)
    bins = pack_sequences(df, max_tokens=100, colocate_by_length=True).collect()
    packed = sorted(d for r in bins for d in r["doc_ids"])
    assert packed == list(range(len(sizes)))
    by_id = dict(enumerate(sizes))
    for r in bins:
        assert r["n_tokens"] == sum(by_id[d] for d in r["doc_ids"])
        if len(r["doc_ids"]) > 1:
            assert r["n_tokens"] <= 100
    assert len({r["bin_id"] for r in bins}) == len(bins)


def test_semantic_dedup_drops_planted_near_dup_and_keeps_invariants(spark):
    """SemDeDup shape: a planted duplicate vector loses to its lower-id
    twin; survivors have no in-cluster pair above threshold; every drop is
    justified; selection is partitioning-independent."""
    import random

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(40)]
    rows.append((100, list(rows[3][1])))               # exact twin of id 3
    near = [v + 0.001 for v in rows[5][1]]
    rows.append((101, near))                           # near twin of id 5
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    kept = {r["vec_id"] for r in C.semantic_dedup(df, threshold=0.95, n_clusters=4).collect()}
    assert 3 in kept and 100 not in kept
    assert 5 in kept and 101 not in kept

    kept_repart = {
        r["vec_id"]
        for r in C.semantic_dedup(df.repartition(5), threshold=0.95, n_clusters=4).collect()
    }
    assert kept == kept_repart

    # invariants at a threshold loose enough to force chains
    from etl_data_transformer_spark.operators.similarity import train_ivf_centroids

    cents = train_ivf_centroids(
        df.select(F.col("vec_id").alias("id"), "embedding"), n_lists=4
    )
    pairs = C.semantic_dedup_pairs(df, cents, threshold=0.5)
    survivors = C.semantic_dedup(df, threshold=0.5, centroids=cents).select("vec_id")
    surviving_pairs = (
        pairs.join(survivors.withColumnRenamed("vec_id", "id_a"), "id_a", "left_semi")
        .join(survivors.withColumnRenamed("vec_id", "id_b"), "id_b", "left_semi")
    )
    assert surviving_pairs.count() == 0
    dropped = df.select("vec_id").join(survivors, "vec_id", "left_anti")
    justified = dropped.join(
        pairs.select(F.col("id_b").alias("vec_id")).distinct(), "vec_id", "left_semi"
    )
    assert dropped.count() == justified.count()


def test_semantic_dedup_cluster_cap_bounds_pairs(spark):
    """max_cluster_size drops degenerate clusters from pair generation (the
    O(B^2) guard), and the capped run still returns a frame."""
    rows = [(i, [1.0, 0.0, 0.0, float(i) * 1e-4]) for i in range(30)]  # one hot cluster
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from etl_data_transformer_spark.operators.similarity import train_ivf_centroids

    cents = train_ivf_centroids(df.select(F.col("vec_id").alias("id"), "embedding"), n_lists=2)
    capped = C.semantic_dedup_pairs(df, cents, threshold=0.5, max_cluster_size=10)
    uncapped = C.semantic_dedup_pairs(df, cents, threshold=0.5)
    assert capped.count() == 0 and uncapped.count() > 0  # hot cluster excluded
    assert C.semantic_dedup(df, threshold=0.5, centroids=cents, max_cluster_size=10).count() == 30


def test_leakage_safe_split_never_straddles_and_is_deterministic(spark):
    """Near-dup pairs land on ONE side of the split (whole clusters move
    together, including chained a-b, b-c components), assignment is
    exhaustive and exactly-once, and stable across repartitioning."""
    import pytest

    text_a = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(i, f"unique document number {i} with its own words {i * 7}") for i in range(60)]
    rows += [(100, text_a), (101, text_a + " x"), (102, text_a + " x y")]  # chain
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from etl_data_transformer_spark.operators.dedup import ngram_jaccard_exact

    pairs = ngram_jaccard_exact(df, n=3, threshold=0.6)
    out = C.leakage_safe_split(df, pairs, test_fraction=0.3)
    got = {r["doc_id"]: (r["split"], r["cluster_id"]) for r in out.collect()}
    assert len(got) == 63  # exactly once each
    # the chained trio shares a cluster and a side
    assert got[100] == got[101] == got[102]
    # no pair straddles
    for r in pairs.collect():
        assert got[r["id_a"]][0] == got[r["id_b"]][0]
    # both sides populated at this corpus size
    sides = {s for s, _ in got.values()}
    assert sides == {"train", "test"}

    again = {
        r["doc_id"]: (r["split"], r["cluster_id"])
        for r in C.leakage_safe_split(df.repartition(7), pairs, test_fraction=0.3).collect()
    }
    assert got == again

    with pytest.raises(ValueError, match="test_fraction"):
        C.leakage_safe_split(df, pairs, test_fraction=1.5)


def test_contamination_shuffled_bench_equals_broadcast(spark, star):
    """broadcast_bench=False (the huge-eval-set path) returns identical
    counts to the broadcast plan, through its two-tier coarse-bucket
    pre-filter — including a tiny bucket space that forces bucket
    collisions (false positives must not change counts)."""
    from etl_data_transformer_spark.operators.curation import contamination_check

    d = star["documents"].filter(F.col("doc_id") < 120)
    bench = d.filter(F.col("doc_id") < 30)
    corpus = d.filter(F.col("doc_id") >= 30)
    a = contamination_check(corpus, bench, n=8, threshold=0.1).collect()
    for bits in (20, 4):
        b = contamination_check(
            corpus, bench, n=8, threshold=0.1, broadcast_bench=False, bucket_bits=bits
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b)), bits
    shuffled = contamination_check(
        corpus, bench, n=8, threshold=0.1, broadcast_bench=False
    )
    plan = shuffled._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LeftSemi") == 2  # coarse broadcast tier + exact tier


def test_runtime_filter_does_not_reach_through_explode(spark, star):
    """Documented limitation pinning the reason contamination_check
    hand-rolls its bucket tier: InjectRuntimeFilter cannot trace a join key
    derived through a Generate (explode), so no might_contain appears even
    with the widened gates."""
    from etl_data_transformer_spark.operators.joins import (
        runtime_filtered_join_confs,
        with_confs,
    )
    from etl_data_transformer_spark.functions.text import shingles

    d = star["documents"].filter(F.col("doc_id") < 120)
    ex = lambda df: df.select(  # noqa: E731
        "doc_id", F.explode(shingles("text", 8)).alias("s")
    ).select("doc_id", F.xxhash64("s").alias("h"))
    confs = {
        **runtime_filtered_join_confs(),
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    with with_confs(spark, confs):
        j = ex(d.filter(F.col("doc_id") >= 30)).join(
            ex(d.filter(F.col("doc_id") < 30)), "h", "left_semi"
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" not in plan


def _semantic_fixture(spark, n=60, dim=8, seed=11):
    import random

    rng = random.Random(seed)
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(n)]
    # planted cross-batch near-dups: later ids are twins of early ids
    rows.append((200, list(rows[3][1])))                 # twin of 3 (batch 2)
    rows.append((201, [v + 0.001 for v in rows[7][1]]))  # near twin of 7 (batch 2)
    rows.append((202, list(rows[52][1])))                # twin of a batch-2 row
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dedup_incremental_equals_batch_over_combined(spark):
    """Sequential incremental runs (store grows by the FULL batch after each)
    keep exactly the batch semantic_dedup survivors over the combined corpus
    with the same frozen centroids — including chained cross-batch drops."""
    from etl_data_transformer_spark.operators.similarity import train_ivf_centroids

    df = _semantic_fixture(spark)
    cents = train_ivf_centroids(df.select(F.col("vec_id").alias("id"), "embedding"), n_lists=4)
    b1 = df.filter(F.col("vec_id") < 50)
    b2 = df.filter(F.col("vec_id") >= 50)

    expect = {r["vec_id"] for r in C.semantic_dedup(df, threshold=0.95, centroids=cents).collect()}

    s1 = C.semantic_dedup_incremental(b1, C.semantic_store_rows(b1.limit(0), cents), cents, 0.95)
    store = C.semantic_store_rows(b1, cents)
    s2 = C.semantic_dedup_incremental(b2, store, cents, 0.95)
    got = {r["vec_id"] for r in s1.collect()} | {r["vec_id"] for r in s2.collect()}
    assert got == expect
    assert 200 not in got and 201 not in got and 202 not in got  # planted dups dropped


def test_semantic_pairs_incremental_touch_batch_only(spark):
    """Incremental pairs = combined-corpus pairs restricted to pairs with at
    least one new side (store-internal pairs never re-emitted), and
    include_batch_pairs=False keeps only the cross tier."""
    from etl_data_transformer_spark.operators.similarity import train_ivf_centroids

    df = _semantic_fixture(spark)
    cents = train_ivf_centroids(df.select(F.col("vec_id").alias("id"), "embedding"), n_lists=4)
    b1 = df.filter(F.col("vec_id") < 50)
    b2 = df.filter(F.col("vec_id") >= 50)
    t = 0.5  # loose threshold: plenty of pairs on the gaussian fixture

    all_pairs = {
        (r["id_a"], r["id_b"]) for r in C.semantic_dedup_pairs(df, cents, threshold=t).collect()
    }
    new_ids = {r["vec_id"] for r in b2.collect()}
    expect = {(a, b) for a, b in all_pairs if a in new_ids or b in new_ids}
    store = C.semantic_store_rows(b1, cents)
    got = {
        (r["id_a"], r["id_b"])
        for r in C.semantic_dedup_pairs_incremental(b2, store, cents, threshold=t).collect()
    }
    assert got == expect and got  # non-empty, exact restriction
    cross = {
        (r["id_a"], r["id_b"])
        for r in C.semantic_dedup_pairs_incremental(
            b2, store, cents, threshold=t, include_batch_pairs=False
        ).collect()
    }
    assert cross == {(a, b) for a, b in expect if (a in new_ids) != (b in new_ids)}


def test_semantic_store_lifecycle_and_compaction(spark, tmp_path):
    """Store write/append validates the centroid sidecar (mismatch raises);
    compaction preserves layout + sidecar, and an incremental run against
    the compacted store equals one against a store rebuilt from the
    surviving corpus."""
    import pytest

    from etl_data_transformer_spark.operators.similarity import train_ivf_centroids

    df = _semantic_fixture(spark)
    cents = train_ivf_centroids(df.select(F.col("vec_id").alias("id"), "embedding"), n_lists=4)
    b1 = df.filter(F.col("vec_id") < 50)
    b2 = df.filter(F.col("vec_id") >= 50)
    path = str(tmp_path / "sem_store")

    C.write_semantic_store(C.semantic_store_rows(b1, cents), path, centroids=cents)
    got_cents, rows = C.read_semantic_store(spark, path)
    assert got_cents == cents and rows.count() == b1.count()
    assert "list_id" in rows.columns

    other = [[c + 1.0 for c in row] for row in cents]
    with pytest.raises(ValueError, match="centroid mismatch"):
        C.write_semantic_store(C.semantic_store_rows(b2, cents), path, centroids=other)

    # drop some store vectors, compact, compare vs rebuilt store
    drop = spark.createDataFrame([(3,), (7,)], ["vec_id"])
    C.compact_semantic_store(spark, path, drop_ids=drop)
    _, after = C.read_semantic_store(spark, path)
    assert after.filter(F.col("id").isin(3, 7)).count() == 0
    survivors_b1 = b1.join(drop, "vec_id", "left_anti")
    rebuilt = C.semantic_store_rows(survivors_b1, cents)
    inc_compacted = {
        r["vec_id"] for r in C.semantic_dedup_incremental(b2, after, cents, 0.95).collect()
    }
    inc_rebuilt = {
        r["vec_id"] for r in C.semantic_dedup_incremental(b2, rebuilt, cents, 0.95).collect()
    }
    assert inc_compacted == inc_rebuilt
    # with 3 and 7 gone their planted twins now survive
    assert 200 in inc_compacted and 201 in inc_compacted


def test_semantic_incremental_prunes_untouched_cluster_partitions(spark, tmp_path):
    """The batch's touched-cluster filter must reach the persisted store's
    partitioned scan as a PartitionFilter — untouched clusters are never
    read (the property that keeps per-batch cost ∝ touched clusters)."""
    from etl_data_transformer_spark.operators.similarity import train_ivf_centroids

    df = _semantic_fixture(spark)
    cents = train_ivf_centroids(df.select(F.col("vec_id").alias("id"), "embedding"), n_lists=4)
    path = str(tmp_path / "sem_store")
    C.write_semantic_store(
        C.semantic_store_rows(df.filter(F.col("vec_id") < 50), cents), path, centroids=cents
    )
    _, store = C.read_semantic_store(spark, path)

    batch = df.filter(F.col("vec_id") == 200)  # one vector -> one cluster
    pairs = C.semantic_dedup_pairs_incremental(batch, store, cents, threshold=0.95)
    pairs.collect()
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    scan = next(
        ln for ln in plan.splitlines() if "FileScan parquet" in ln and "list_id" in ln
    )
    assert "PartitionFilters" in scan
    assert "list_id" in scan.split("PartitionFilters")[1][:120]


def _mixture_fixture(spark, seed=7):
    """Skewed domains + zero-token docs + a domain to exhaust + a domain
    outside the weights."""
    import random

    rng = random.Random(seed)
    rows = []
    did = 0
    for d, n, lo, hi in (
        ("web", 120, 5, 40),     # big, will be budget-bounded
        ("code", 40, 10, 20),    # medium
        ("books", 6, 3, 8),      # tiny → exhausted
        ("junk", 30, 5, 10),     # not in weights → dropped
    ):
        for _ in range(n):
            k = rng.randint(lo, hi)
            text = " ".join(f"w{rng.randint(0, 999)}" for _ in range(k))
            rows.append((did, d, text))
            did += 1
    rows.append((did, "web", ""))        # zero-token doc (trim->split gives [''], size 1)
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_mixture_sampler_bucketed_equals_window(spark):
    """The scale-safe two-phase sampler == the one-window reference, on a
    corpus exercising keep-all / boundary / drop buckets per domain
    (bucket_hex_digits=1 → 16 buckets over ~120 docs)."""
    df = _mixture_fixture(spark)
    weights = {"web": 6.0, "code": 3.0, "books": 1.0}
    for budget in (0, 500, 1500, 10**6):
        fast = C.sample_token_mixture(
            df, weights, budget, bucket_hex_digits=1
        )
        ref = C.sample_token_mixture_window(df, weights, budget)
        got = sorted(r["doc_id"] for r in fast.collect())
        want = sorted(r["doc_id"] for r in ref.collect())
        assert got == want, f"budget={budget}"
    # huge budget keeps every weighted-domain doc, drops unweighted domains
    all_kept = C.sample_token_mixture(df, weights, 10**6, bucket_hex_digits=1)
    assert all_kept.count() == df.filter(F.col("source") != "junk").count()
    assert all_kept.filter(F.col("source") == "junk").count() == 0


def test_mixture_sampler_partitioning_invariant_and_targets(spark):
    """Selection is independent of input partitioning, fills each domain to
    its target within one doc of overshoot, and keeps exhausted domains
    whole."""
    df = _mixture_fixture(spark)
    weights = {"web": 6.0, "code": 3.0, "books": 1.0}
    budget = 1500
    targets = C.mixture_targets(weights, budget)
    assert targets == {"web": 900, "code": 450, "books": 150}

    a = sorted(r["doc_id"] for r in C.sample_token_mixture(df, weights, budget).collect())
    b = sorted(
        r["doc_id"]
        for r in C.sample_token_mixture(df.repartition(13, "text"), weights, budget).collect()
    )
    assert a == b and len(a) > 0

    rep = {
        r["source"]: r
        for r in C.mixture_report(
            C.sample_token_mixture(df, weights, budget), weights, budget
        ).collect()
    }
    tok = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    max_doc = {
        r["source"]: r["m"]
        for r in df.groupBy("source").agg(F.max(tok).alias("m")).collect()
    }
    avail = {
        r["source"]: r["s"]
        for r in df.groupBy("source").agg(F.sum(tok).alias("s")).collect()
    }
    for d, t in targets.items():
        sel = rep[d]["selected_tokens"]
        if avail[d] <= t:          # exhausted: kept whole
            assert sel == avail[d]
        else:                      # filled: target <= selected < target + max doc
            assert t <= sel < t + max_doc[d]


def test_mixture_sampler_validation_and_edge_cases(spark):
    import pytest

    df = _mixture_fixture(spark)
    with pytest.raises(ValueError, match="non-empty"):
        C.mixture_targets({}, 100)
    with pytest.raises(ValueError, match=">= 0"):
        C.mixture_targets({"a": -1.0}, 100)
    with pytest.raises(ValueError, match="> 0"):
        C.mixture_targets({"a": 0.0}, 100)
    with pytest.raises(ValueError, match="token_budget"):
        C.mixture_targets({"a": 1.0}, -5)

    # zero-weight domain contributes nothing but doesn't break the others
    got = C.sample_token_mixture(
        df, {"web": 1.0, "books": 0.0}, 300, bucket_hex_digits=1
    )
    assert got.filter(F.col("source") == "books").count() == 0
    assert got.filter(F.col("source") == "web").count() > 0
    # weights naming only absent domains → empty result, schema preserved
    empty = C.sample_token_mixture(df, {"nope": 1.0}, 300)
    assert empty.count() == 0 and empty.columns == df.columns


def test_mixture_sampler_null_text_and_int_domain(spark):
    """Review regressions: (a) null text is a zero-cost keep IDENTICALLY in
    the bucketed and window formulations (an un-coalesced NULL survived
    keep-all buckets but failed `before < target`); (b) a non-string domain
    column works in the scale path (driver frames use the input's type, not
    a DDL string schema)."""
    rows = [(i, i % 3, "word " * (i % 7 + 1)) for i in range(60)]
    rows += [(100, 0, None), (101, 1, None)]   # null text docs
    df = spark.createDataFrame(rows, "doc_id long, dom int, text string")
    weights = {0: 2.0, 1: 1.0}
    for budget in (0, 40, 10**6):
        fast = sorted(
            r["doc_id"]
            for r in C.sample_token_mixture(
                df, weights, budget, domain_col="dom", bucket_hex_digits=1
            ).collect()
        )
        ref = sorted(
            r["doc_id"]
            for r in C.sample_token_mixture_window(
                df, weights, budget, domain_col="dom"
            ).collect()
        )
        assert fast == ref, f"budget={budget}"
    # null-text docs of weighted domains survive a huge budget at zero cost
    big = C.sample_token_mixture(
        df, weights, 10**6, domain_col="dom", bucket_hex_digits=1
    )
    assert {100, 101} <= {r["doc_id"] for r in big.collect()}


def test_simhash_incremental_rejects_oversized_max_hamming(spark):
    """max_hamming >= 64 must raise (as in hamming_band_pairs), not silently
    produce zero-width bands that cross-join everything."""
    import pytest

    from etl_data_transformer_spark.operators import dedup as DD

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    store = DD.simhash_store_rows(df)
    with pytest.raises(ValueError, match="more bands than bits"):
        DD.simhash_near_dups_incremental(df, store, max_hamming=64)


def test_mixture_ordered_bucketed_equals_window(spark):
    """Quality-ordered fill: the value-range-bucketed scale path == the
    one-window reference across budgets, on a corpus with duplicate order
    values (tie-break by hash), null order values (fill last), negative
    values (best-first via negation), and a degenerate all-equal domain."""
    import random

    rng = random.Random(3)
    rows = []
    did = 0
    for d, n in (("web", 80), ("code", 30)):
        for _ in range(n):
            k = rng.randint(3, 25)
            q = rng.choice([0.1, 0.25, 0.25, 0.5, 0.8, 0.93])  # dup values
            rows.append((did, d, " ".join(f"t{rng.randint(0,99)}" for _ in range(k)), q))
            did += 1
    rows.append((900, "web", "null quality doc one", None))
    rows.append((901, "web", "null quality doc two", None))
    for _ in range(10):  # degenerate domain: every order value identical
        rows.append((did + 1000, "flat", "same same same", 0.5))
        did += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, text string, q double")
    neg = df.withColumn("neg_q", -F.col("q"))  # best-first
    weights = {"web": 2.0, "code": 1.0, "flat": 1.0}
    for budget in (0, 120, 400, 10**6):
        fast = sorted(
            r["doc_id"]
            for r in C.sample_token_mixture_ordered(
                neg, weights, budget, "neg_q", n_buckets=8
            ).collect()
        )
        ref = sorted(
            r["doc_id"]
            for r in C.sample_token_mixture_window(
                neg, weights, budget, order_col="neg_q"
            ).collect()
        )
        assert fast == ref, f"budget={budget}"
    # best-first actually prefers high q: selected web docs' mean q beats the
    # domain mean at a tight budget
    sel = C.sample_token_mixture_ordered(neg, weights, 120, "neg_q", n_buckets=8)
    sel_q = [r["q"] for r in sel.filter("source='web'").collect() if r["q"] is not None]
    all_q = [r["q"] for r in df.filter("source='web'").collect() if r["q"] is not None]
    assert sel_q and sum(sel_q) / len(sel_q) > sum(all_q) / len(all_q)
    # null-order docs only appear when the budget outlasts every ranked doc
    assert not {900, 901} & {r["doc_id"] for r in sel.collect()}
    huge = C.sample_token_mixture_ordered(neg, weights, 10**6, "neg_q", n_buckets=8)
    assert {900, 901} <= {r["doc_id"] for r in huge.collect()}


def test_drop_boilerplate_lines_semantics(spark):
    """The ubiquitous footer disappears from every doc; per-doc unique and
    sub-threshold-frequency lines stay; short lines (incl. empty) are never
    treated as boilerplate; docs of pure boilerplate come back empty with
    all metadata columns intact."""
    footer = "standard legal footer all rights reserved"
    rows = []
    for i in range(10):
        rows.append((i, f"unique content line {i}\n{footer}\n\nok", "web"))
    rows.append((100, f"shared pair line\n{footer}", "web"))      # pair line: 2 docs only
    rows.append((101, f"shared pair line\n{footer}", "web"))
    rows.append((102, footer, "web"))                             # pure boilerplate
    rows.append((103, None, "web"))                               # null text
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r for r in C.drop_boilerplate_lines(df, min_docs=5).collect()}

    assert out[0]["clean_text"] == "unique content line 0\n\nok"  # footer gone, '' + 'ok' kept
    assert out[0]["n_lines_in"] == 4 and out[0]["n_lines_out"] == 3
    assert out[100]["clean_text"] == "shared pair line"           # 2 < min_docs: kept
    assert out[102]["clean_text"] == "" and out[102]["n_lines_out"] == 0
    assert out[103]["clean_text"] == ""                           # null text → empty
    assert out[5]["source"] == "web"                              # metadata preserved


def test_connected_components_edge_endpoints_outside_nodes(spark):
    """The reviewer's hand trace: nodes={0,9}, edges={(9,0),(9,77)} — the
    old label-sum convergence faked a fixpoint after one round (77's new
    row offset 9's decrease), splitting one component. 9 and 0 must share
    a cluster, and connectivity THROUGH an absent doc must still link
    present docs."""
    from etl_data_transformer_spark.operators.graph import connected_components

    nodes = spark.createDataFrame([(0,), (9,)], "id long")
    edges = spark.createDataFrame([(9, 0), (9, 77)], "src long, dst long")
    got = {r["id"]: r["cluster_id"] for r in connected_components(nodes, edges).collect()}
    assert got == {0: 0, 9: 0}  # one cluster, 77 not emitted

    # transitive link through a filtered-out doc: 1 - 50 - 2 with 50 absent
    nodes2 = spark.createDataFrame([(1,), (2,)], "id long")
    edges2 = spark.createDataFrame([(1, 50), (50, 2)], "src long, dst long")
    got2 = {r["id"]: r["cluster_id"] for r in connected_components(nodes2, edges2).collect()}
    assert got2 == {1: 1, 2: 1}


def test_connected_components_string_ids_and_nonconvergence(spark):
    """String ids cluster by lexicographic min (the old long-cast produced
    all-NULL output); exhausting max_iter raises instead of returning a
    partially-propagated split."""
    import pytest

    from etl_data_transformer_spark.operators.graph import connected_components

    nodes = spark.createDataFrame([("b",), ("a",), ("c",), ("z",)], "id string")
    edges = spark.createDataFrame([("b", "a"), ("b", "c")], "src string, dst string")
    got = {r["id"]: r["cluster_id"] for r in connected_components(nodes, edges).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "z": "z"}

    # a 7-node chain has diameter 6: max_iter=2 cannot converge
    chain_nodes = spark.createDataFrame([(i,) for i in range(7)], "id long")
    chain_edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain_nodes, chain_edges, max_iter=2)
    full = connected_components(chain_nodes, chain_edges, max_iter=10)
    assert {r["cluster_id"] for r in full.collect()} == {0}


def test_pack_sequences_null_text_and_bounded_open_bins(spark):
    """Round-7 review: a null-text document must pack as 0 tokens instead of
    killing the job with a NaN cast, and the bounded open-bin window must
    preserve every invariant (budget respected, all docs covered exactly
    once) even when the doc count far exceeds the window."""
    import etl_data_transformer_spark.operators.curation as C

    rows = [(0, None)] + [(i, "tok " * 60) for i in range(1, 301)]  # 60 tokens each
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bins = C.pack_sequences(df, max_tokens=100).collect()
    packed = sorted(d for b in bins for d in b["doc_ids"])
    assert packed == list(range(301))  # every doc exactly once, null included
    assert all(b["n_tokens"] <= 100 for b in bins)
    # 60-token docs can't pair up under 100: one bin per doc, far more bins
    # than the open window — the window must not drop or double-pack any
    assert len(bins) >= 300


def test_hyperplane_null_embedding_rows(spark):
    """Round-7 review: a null embedding in the FIRST row must not crash the
    dimension probe, and the empty-frame fallback must type ids from the
    input column."""
    import etl_data_transformer_spark.operators.curation as C

    df = spark.createDataFrame(
        [(0, None), (1, [1.0, 0.0, 0.0, 0.0]), (2, [1.0, 0.001, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    pairs = C.hyperplane_lsh_pairs(df, n_bits=8, max_hamming=1)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got  # the near-identical real vectors still pair

    empty_str = spark.createDataFrame([], "vec_id string, embedding array<float>")
    out = C.hyperplane_lsh_pairs(empty_str, n_bits=8)
    assert dict(out.dtypes)["id_a"] == "string"  # typed from input, not long
    assert out.count() == 0


def test_ordered_mixture_nan_order_values(spark):
    """Round-7 review: NaN order values must route to the null bucket (the
    census keeps its multi-bucket classification) and the selection must
    still equal the one-window reference, NaN-last like nulls."""
    import etl_data_transformer_spark.operators.curation as C

    rows = [(i, "w " * 10, "web", float(i)) for i in range(40)]
    rows.append((100, "w " * 10, "web", float("nan")))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string, q double")
    got = C.sample_token_mixture_ordered(
        df, {"web": 1.0}, token_budget=100, order_col="q", n_buckets=8
    )
    want = C.sample_token_mixture_window(
        df, {"web": 1.0}, token_budget=100, order_col="q"
    )
    assert sorted(r["doc_id"] for r in got.collect()) == sorted(
        r["doc_id"] for r in want.collect()
    )
    # best-10-by-q fills the budget; the NaN doc must not be selected
    assert sorted(r["doc_id"] for r in got.collect()) == list(range(10))


def test_semantic_dedup_pairs_block_decomposition_equivalent(spark):
    """The block-pair GEMM tiles (tiny block_size -> multi-block diagonal
    and cross tiles) return exactly the single-tile path's pairs, with no
    self-pairs under any collect_list ordering (round-7 review: the
    positional triangle was replaced by an id-value one)."""
    import random

    rng = random.Random(5)
    rows = []
    for i in range(60):
        base = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((i, base))
        if i % 7 == 0:  # plant a near-dup
            rows.append((1000 + i, [x * 1.001 for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    from etl_data_transformer_spark.operators.similarity import train_ivf_centroids

    cents = train_ivf_centroids(
        df.selectExpr("vec_id as id", "embedding"), n_lists=4, seed=42
    )
    for bs in (5, 16):
        blocked = {
            (r["id_a"], r["id_b"], r["cosine_sim"])
            for r in C.semantic_dedup_pairs(
                df, cents, threshold=0.9, block_size=bs, engine="blocks"
            ).collect()
        }
        mono = {
            (r["id_a"], r["id_b"], r["cosine_sim"])
            for r in C.semantic_dedup_pairs(
                df, cents, threshold=0.9, block_size=10**9, engine="blocks"
            ).collect()
        }
        assert blocked == mono, bs
        assert all(a < b for a, b, _ in blocked)
        assert len(blocked) >= 9  # the planted near-dups are found
    # engine equivalence (round-8: census-gated dispatch): grouped ==
    # blocks == auto (which picks grouped at this scale), and bad names
    # reject
    grouped = {
        (r["id_a"], r["id_b"], r["cosine_sim"])
        for r in C.semantic_dedup_pairs(df, cents, threshold=0.9, engine="grouped").collect()
    }
    auto = {
        (r["id_a"], r["id_b"], r["cosine_sim"])
        for r in C.semantic_dedup_pairs(df, cents, threshold=0.9, engine="auto").collect()
    }
    assert grouped == auto == mono
    with pytest.raises(ValueError, match="unknown engine"):
        C.semantic_dedup_pairs(df, cents, engine="bogus")


def test_semantic_pairs_engine_dispatch_plans(spark):
    """The census gate picks the right physical shape: 'grouped' plans a
    FlatMapGroupsInPandas with NO localCheckpoint scan of a materialized
    assignment, 'blocks' plans the packed tile mapInPandas; 'auto' at tiny
    scale resolves to the grouped shape (Σ n² « _GEMM_MIN_WORK)."""
    df = spark.createDataFrame(
        [(i, [float(i % 3), 1.0]) for i in range(20)], "vec_id long, embedding array<double>"
    )
    from etl_data_transformer_spark.operators.similarity import train_ivf_centroids

    cents = train_ivf_centroids(df.selectExpr("vec_id as id", "embedding"), n_lists=2, seed=1)
    grouped_plan = (
        C.semantic_dedup_pairs(df, cents, engine="grouped")
        ._jdf.queryExecution().executedPlan().toString()
    )
    auto_plan = (
        C.semantic_dedup_pairs(df, cents, engine="auto")
        ._jdf.queryExecution().executedPlan().toString()
    )
    blocks_plan = (
        C.semantic_dedup_pairs(df, cents, engine="blocks")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "FlatMapGroupsInPandas" in grouped_plan
    assert "FlatMapGroupsInPandas" in auto_plan  # auto -> grouped here
    assert "MapInPandas" in blocks_plan
    assert "FlatMapGroupsInPandas" not in blocks_plan


def test_dedup_passages_semantics(spark):
    """ExactSubstr corners: cross-doc repeats removed from EVERY occurrence,
    overlapping duplicated windows merge into one excised span, within-doc
    repetition triggers at min_count=2, short docs pass through
    canonicalized, and a fully-duplicated doc empties."""
    boiler = "alpha beta gamma delta"  # 4 tokens; window=4 -> one window
    rows = [
        (1, f"unique one {boiler} tail1"),
        (2, f"unique two {boiler} tail2"),
        (3, f"{boiler} {boiler} solo3"),       # within-doc repeat
        (4, "tiny doc"),                        # < window: untouched
        (5, boiler),                            # exactly the window: empties
        (6, "entirely unique content here six"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in C.dedup_passages(df, window=4).collect()}
    assert got[1].clean_text == "unique one tail1" and got[1].n_removed == 4
    assert got[2].clean_text == "unique two tail2" and got[2].n_removed == 4
    # doc 3: both boiler occurrences covered (positions 0..7), solo3 kept
    assert got[3].clean_text == "solo3" and got[3].n_removed == 8
    assert got[4].clean_text == "tiny doc" and got[4].n_removed == 0
    assert got[5].clean_text == "" and got[5].n_removed == 4
    assert got[6].n_removed == 0
    # n_tokens audits the pre-removal count
    assert got[3].n_tokens == 9


def test_dedup_passages_overlap_merge_and_min_count(spark):
    # overlapping duplicated windows: 'a b c d e' shared by docs 1 and 2
    # with window=3 yields windows at 0,1,2 — the union covers all 5 tokens
    rows = [(1, "a b c d e x1"), (2, "a b c d e x2"), (3, "c d e only here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in C.dedup_passages(df, window=3).collect()}
    assert got[1].clean_text == "x1" and got[1].n_removed == 5
    assert got[2].clean_text == "x2"
    # doc 3 shares the 'c d e' window (3 occurrences) -> masked there too
    assert got[3].clean_text == "only here" and got[3].n_removed == 3
    # min_count=4: nothing reaches 4 occurrences, all docs intact
    # (canonical whitespace aside)
    got4 = {r.doc_id: r for r in C.dedup_passages(df, window=3, min_count=4).collect()}
    assert all(r.n_removed == 0 for r in got4.values())
    assert got4[1].clean_text == "a b c d e x1"


def test_dedup_passages_canonicalizes_whitespace(spark):
    df = spark.createDataFrame([(1, "  spaced   out\ttokens \n here ")], "doc_id long, text string")
    r = C.dedup_passages(df, window=10).collect()[0]
    assert r.clean_text == "spaced out tokens here" and r.n_tokens == 4


def test_dedup_passages_incremental_equals_full_restricted(spark, tmp_path):
    """The incremental contract: cleaning a batch against the landed
    corpus's count store equals the FULL recompute over landed ∪ batch,
    restricted to batch rows — including windows that only cross the
    threshold because of the batch, and within-batch duplicates."""
    landed = spark.createDataFrame(
        [
            (1, "shared passage alpha beta gamma one"),
            (2, "totally unique landed content here"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "prefix shared passage alpha beta gamma suffix"),  # store hit
            (11, "batch only repeat phrase x y"),
            (12, "batch only repeat phrase x z"),  # within-batch dup window
            (13, "clean and unrepeated text entirely"),
        ],
        "doc_id long, text string",
    )
    W = 3
    store = C.passage_count_store(landed, window=W)
    inc = {r.doc_id: r for r in C.dedup_passages_incremental(batch, store, window=W).collect()}
    full = {
        r.doc_id: r
        for r in C.dedup_passages(landed.unionByName(batch), window=W).collect()
        if r.doc_id >= 10
    }
    assert {k: (v.clean_text, v.n_removed) for k, v in inc.items()} == {
        k: (v.clean_text, v.n_removed) for k, v in full.items()
    }
    # the store hit actually masked something
    assert inc[10].n_removed > 0
    # first batch (no store) = plain in-batch dedup
    first = {r.doc_id: r for r in C.dedup_passages_incremental(batch, None, window=W).collect()}
    alone = {r.doc_id: r for r in C.dedup_passages(batch, window=W).collect()}
    assert {k: v.clean_text for k, v in first.items()} == {
        k: v.clean_text for k, v in alone.items()
    }


def test_passage_store_lifecycle_and_sidecar(spark, tmp_path):
    import pytest

    landed = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d x y")], "doc_id long, text string"
    )
    path = str(tmp_path / "pstore")
    C.write_passage_store(C.passage_count_store(landed, window=3), path, window=3)
    got = {r.h: r.c for r in C.read_passage_store(spark, path, window=3).collect()}
    assert sum(got.values()) == 8 and max(got.values()) == 2  # 'a b c'/'b c d' shared
    # appended per-batch rows SUM on read
    more = spark.createDataFrame([(3, "a b c only")], "doc_id long, text string")
    C.write_passage_store(C.passage_count_store(more, window=3), path, window=3)
    got2 = {r.h: r.c for r in C.read_passage_store(spark, path, window=3).collect()}
    assert max(got2.values()) == 3
    # window mismatch rejects loudly
    with pytest.raises(ValueError, match="passage-count"):
        C.read_passage_store(spark, path, window=5)


def test_compact_passage_store(spark, tmp_path):
    import os

    import pytest

    path = str(tmp_path / "cstore")
    for i in range(3):  # three appended batches sharing windows
        b = spark.createDataFrame([(i * 10, "w1 w2 w3 tail" + str(i))], "doc_id long, text string")
        C.write_passage_store(C.passage_count_store(b, window=3), path, window=3)
    n_before = spark.read.parquet(path).count()
    summed = {r.h: r.c for r in C.read_passage_store(spark, path, window=3).collect()}
    C.compact_passage_store(spark, path, window=3)
    after_rows = spark.read.parquet(path).collect()
    # one row per hash, totals preserved, sidecar survives the swap
    assert len(after_rows) == len(summed) < n_before
    assert {r.h: r.c for r in after_rows} == summed
    assert {r.h: r.c for r in C.read_passage_store(spark, path, window=3).collect()} == summed
    assert os.path.exists(os.path.join(path, "_passage_params.json"))
    # streaming layout rejects
    stream_like = spark.createDataFrame([(1, 2, "a")], "h long, c long, __batch_id string")
    p2 = str(tmp_path / "cstream")
    stream_like.write.partitionBy("__batch_id").parquet(p2)
    C.ensure_passage_params_sidecar(p2, window=3)
    with pytest.raises(ValueError, match="streaming"):
        C.compact_passage_store(spark, p2, window=3)


def test_dedup_passages_null_text_yields_zero_counts(spark):
    """Round-8 review: NULL text must audit as (clean_text='', 0 tokens,
    0 removed), not NULL-propagating counts that vanish from sums."""
    df = spark.createDataFrame(
        [(1, None), (2, "real words here")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in C.dedup_passages(df, window=2).collect()}
    assert (got[1].clean_text, got[1].n_tokens, got[1].n_removed) == ("", 0, 0)
    assert got[2].n_tokens == 3


def test_write_passage_store_rejects_streaming_layout_append(spark, tmp_path):
    import pytest

    p = str(tmp_path / "pstream2")
    spark.createDataFrame([(1, 2, "ns-000000")], "h long, c long, __batch_id string").write.partitionBy(
        "__batch_id"
    ).parquet(p)
    C.ensure_passage_params_sidecar(p, window=3)
    batch = spark.createDataFrame([(9, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="streaming"):
        C.write_passage_store(C.passage_count_store(batch, window=3), p, window=3)


def test_dedup_passages_plan_shape(spark):
    """Pin the docstring's scale claims (round-9 touched-only rebuild):
    the census + removed-position distinct run inside the eager
    localCheckpoint job, so the FINAL plan is a Union whose only Generate
    (the token posexplode) sits behind a LeftSemi against the touched doc
    ids — untouched documents never pass through an explode or a
    token-level shuffle, they take the pure array_join projection branch.
    Remaining shuffles are the touched-doc rebuild plus tiny
    touched-id distincts over the checkpointed removed frame. No Python
    UDFs anywhere, no nested-loop or cartesian joins."""
    # parquet source: broadcast-vs-SMJ picks need size statistics a local
    # relation doesn't carry
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        C.dedup_passages(df, window=10)._jdf.queryExecution().executedPlan().toString()
    )
    n_broadcast = plan.count("BroadcastExchange")
    n_shuffle = plan.count("Exchange") - n_broadcast
    assert n_shuffle <= 4, plan[:3000]
    assert "Union" in plan
    # exactly ONE Generate survives in the final plan, and it is fed by
    # the touched-doc LeftSemi — the untouched branch is explode-free
    assert plan.count("Generate") == 1, plan[:3000]
    gen_idx = plan.index("Generate")
    semi_after_gen = plan.find("LeftSemi", gen_idx)
    assert semi_after_gen != -1, plan[gen_idx : gen_idx + 2000]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" not in plan and "Cartesian" not in plan


def test_dedup_passages_touched_only_equivalence(spark):
    """Round-9 rebuild-restriction equivalence: the touched-docs-only
    implementation must equal an independent pure-Python ExactSubstr
    reference on a mixed corpus — duplicated passages (cross- and
    within-doc), fully-duplicated docs, untouched docs, short docs, a
    NULL, and messy whitespace."""
    rows = [
        (1, "alpha beta gamma delta epsilon shared tail one"),
        (2, "prefix alpha beta gamma delta epsilon shared end"),
        (3, "completely unique content without any repeats at all"),
        (4, "short doc"),
        (5, "alpha beta gamma delta epsilon shared"),  # nothing but dup mass
        (6, None),
        (7, "  spaced   alpha beta gamma delta epsilon shared\t x "),
        (8, "inner rep rep rep rep inner rep rep rep rep done"),  # within-doc
    ]
    W = 4
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in C.dedup_passages(df, window=W).collect()}

    # independent reference: union of positions covered by any window whose
    # exact token sequence occurs >= 2 times corpus-wide
    from collections import Counter

    toks = {i: (t or "").split() for i, t in rows}
    census = Counter(
        tuple(ts[s : s + W])
        for ts in toks.values()
        for s in range(len(ts) - W + 1)
    )
    for i, ts in toks.items():
        rem = set()
        for s in range(len(ts) - W + 1):
            if census[tuple(ts[s : s + W])] >= 2:
                rem.update(range(s, s + W))
        clean = " ".join(t for p, t in enumerate(ts) if p not in rem)
        r = got[i]
        assert (r.clean_text, r.n_tokens, r.n_removed) == (
            clean,
            len(ts),
            len(rem),
        ), (i, r)


def test_decontaminate_passages_semantics(spark):
    """A SINGLE eval occurrence masks (unlike dedup_passages' >=2 census);
    batch-internal duplicates NOT in the eval set are untouched; the
    store form equals the eval_df form; exactly-one-input enforced."""
    import pytest

    train = spark.createDataFrame(
        [
            (1, "leaked bench question alpha beta unique tail one"),
            (2, "inner rep rep rep inner rep rep rep done"),  # in-batch dup, not in eval
            (3, "completely clean training document here"),
            (4, "prefix leaked bench question alpha beta suffix"),
        ],
        "doc_id long, text string",
    )
    hold = spark.createDataFrame(
        [(100, "the eval set contains leaked bench question alpha beta exactly once")],
        "doc_id long, text string",
    )
    W = 5
    got = {
        r.doc_id: r
        for r in C.decontaminate_passages(train, hold, window=W).collect()
    }
    # docs 1 and 4 share the 5-token eval window 'leaked bench question
    # alpha beta' -> masked in both; union-of-covered-positions semantics
    assert got[1].n_removed == 5 and got[1].clean_text == "unique tail one"
    assert got[4].n_removed == 5 and got[4].clean_text == "prefix suffix"
    # in-batch repetition is NOT contamination
    assert got[2].n_removed == 0
    assert got[3].n_removed == 0

    # store form: screen against a persisted eval count store (counts
    # ignored, membership is the signal)
    store = C.passage_count_store(hold, window=W)
    got_store = {
        r.doc_id: r
        for r in C.decontaminate_passages(train, store=store, window=W).collect()
    }
    assert {k: (v.clean_text, v.n_removed) for k, v in got.items()} == {
        k: (v.clean_text, v.n_removed) for k, v in got_store.items()
    }

    with pytest.raises(ValueError, match="exactly one"):
        C.decontaminate_passages(train, hold, store=store, window=W)
    with pytest.raises(ValueError, match="exactly one"):
        C.decontaminate_passages(train, window=W)


def test_decontaminate_passages_eval_schema_and_short_docs(spark):
    """Eval corpora with different column names map via eval_text_col /
    eval_id_col; short docs pass through canonicalized."""
    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "tiny  doc")],
        "doc_id long, text string",
    )
    hold = spark.createDataFrame(
        [("q1", "alpha beta gamma delta epsilon among other things")],
        "qid string, body string",
    )
    got = {
        r.doc_id: r
        for r in C.decontaminate_passages(
            train, hold, window=5, eval_text_col="body", eval_id_col="qid"
        ).collect()
    }
    assert got[1].n_removed == 5 and got[1].clean_text == "zeta"
    assert got[2].clean_text == "tiny doc" and got[2].n_removed == 0


def test_dedup_passages_incremental_extra_dup_equals_decon(spark):
    """The extra_dup hook (round-9 composed-ingest decontamination): with a
    threshold no in-batch count reaches, dedup_passages_incremental masking
    ONLY via extra_dup equals decontaminate_passages over the same eval
    set; with the normal threshold the combined mask equals the UNION of
    the two standalone masks (per-token: covered-by-either rule)."""
    import etl_data_transformer_spark.operators.curation as C
    from etl_data_transformer_spark.operators.curation import _passage_windows

    W = 3
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta unique one tail"),
            (2, "prefix alpha beta gamma delta other two"),
            (3, "intro secret eval passage xyz end"),
        ],
        "doc_id long, text string",
    )
    hold = spark.createDataFrame(
        [(0, "secret eval passage xyz")], "doc_id long, text string"
    )
    _, ewins = _passage_windows(hold, W, "text", "doc_id")
    eval_h = ewins.select("h").distinct()

    # decon-only equivalence: threshold 10**9 silences the count mask
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in C.dedup_passages_incremental(
            train, None, window=W, min_count=10**9, extra_dup=eval_h
        ).collect()
    }
    want = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in C.decontaminate_passages(train, hold, window=W).collect()
    }
    assert got == want

    # combined mask = union of the standalone masks
    combined = {
        r["doc_id"]: r["clean_text"]
        for r in C.dedup_passages_incremental(
            train, None, window=W, min_count=2, extra_dup=eval_h
        ).collect()
    }
    assert combined[1] == "unique one tail"
    assert combined[2] == "prefix other two"
    assert combined[3] == "intro end"


def test_top_fraction_per_group_semantics(spark):
    """Exact rank pruning: ceil(n*frac) rows kept per group even through
    ties at the cut (deterministic id ASC tie-break); by=None ranks the
    whole corpus; frac=1.0 keeps everything; bad frac raises."""
    import pytest

    from etl_data_transformer_spark.operators.curation import top_fraction_per_group

    df = spark.createDataFrame(
        [
            # group a: scores 5,5,5,1 -> keep ceil(4*0.5)=2: ids 1,2 (tie-break)
            (1, "a", 5), (2, "a", 5), (3, "a", 5), (4, "a", 1),
            # group b: 3 rows -> keep ceil(3*0.5)=2 by score
            (10, "b", 9), (11, "b", 7), (12, "b", 8),
        ],
        "doc_id long, grp string, s long",
    )
    kept = {
        r["doc_id"]
        for r in top_fraction_per_group(df, "s", 0.5, by="grp").collect()
    }
    assert kept == {1, 2, 10, 12}
    # corpus-wide: keep ceil(7*0.25)=2 -> ids 10 (9), 12 (8)
    kept_all = {
        r["doc_id"] for r in top_fraction_per_group(df, "s", 0.25).collect()
    }
    assert kept_all == {10, 12}
    assert top_fraction_per_group(df, "s", 1.0, by="grp").count() == 7
    with pytest.raises(ValueError, match="frac"):
        top_fraction_per_group(df, "s", 0.0)
    with pytest.raises(ValueError, match="frac"):
        top_fraction_per_group(df, "s", 1.5)


def test_top_fraction_approx_equivalence(spark):
    """The approx form's kept set is row-for-row IDENTICAL to the exact
    window form — including tie runs straddling the cut, all-tied groups
    (the degenerate band=group case), NULL scores, singleton groups, and
    corpus-wide (by=None) mode."""
    import random

    from etl_data_transformer_spark.operators.curation import (
        top_fraction_approx,
        top_fraction_per_group,
    )

    rng = random.Random(42)
    rows = []
    did = 0
    # tie-heavy: group "t" draws from only 3 score values; group "c" is
    # ALL one value; group "u" uniform; group "n" has NULLs; "s" singleton
    for grp, n, scores in (
        ("t", 200, lambda: rng.choice([1, 2, 3])),
        ("c", 150, lambda: 7),
        ("u", 300, lambda: rng.randint(0, 10**6)),
        ("n", 100, lambda: rng.choice([None, 5, 9])),
        ("s", 1, lambda: 4),
    ):
        for _ in range(n):
            did += 1
            rows.append((did, grp, scores()))
    df = spark.createDataFrame(rows, "doc_id long, grp string, s long")
    for frac in (0.07, 0.25, 0.5, 1.0):
        for by in ("grp", None):
            exact = {
                r["doc_id"]
                for r in top_fraction_per_group(df, "s", frac, by=by).collect()
            }
            approx = [
                r["doc_id"]
                for r in top_fraction_approx(df, "s", frac, by=by).collect()
            ]
            assert len(approx) == len(set(approx)), (frac, by, "dup rows")
            assert set(approx) == exact, (frac, by)


def test_top_fraction_approx_plan_has_no_full_sort_window(spark):
    """The 100 TB contract: every Window in the approx plan ranks only a
    FILTERED band/fallback subset — never the raw input. (The exact form's
    plan, by contrast, windows over the unfiltered scan.)"""
    from etl_data_transformer_spark.operators.curation import (
        top_fraction_approx,
        top_fraction_per_group,
    )

    df = spark.range(10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("s")
    )
    plan = (
        top_fraction_approx(df, "s", 0.25, by=None)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    lines = plan.splitlines()
    win_idx = [i for i, ln in enumerate(lines) if "Window" in ln]
    assert win_idx, "approx plan lost its band window"

    def _depth(ln: str) -> int:
        p = max(ln.find("+- "), ln.find(":- "))
        return p if p != -1 else -(10**6)  # root outranks everything

    for i in win_idx:
        # the window's FULL subtree (all lines strictly deeper in the
        # toString tree) must carry the band bracket / fallback flag —
        # Catalyst may realize it as a Filter node, a join condition, or
        # a filter pushed to the broadcast (right) child, so walk the
        # whole subtree by tree-prefix depth, not just to the first leaf
        d = _depth(lines[i])
        sub = []
        for ln in lines[i + 1 :]:
            if _depth(ln) <= d:
                break
            sub.append(ln)
        seg = "\n".join(sub)
        assert any(m in seg for m in ("__vhi", "__vlo", "__ok")), (
            f"window at plan line {i} ranks the raw input:\n{plan[:4000]}"
        )
    # and the exact form at by=None really is the single-partition shape
    # this variant exists to avoid (the contrast pins the test's meaning)
    exact_plan = (
        top_fraction_per_group(df, "s", 0.25, by=None)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" in exact_plan


def test_top_fraction_approx_guards(spark):
    import pytest

    from etl_data_transformer_spark.operators.curation import top_fraction_approx

    df = spark.createDataFrame([(1, 0.5)], "doc_id long, s double")
    with pytest.raises(ValueError, match="frac"):
        top_fraction_approx(df, "s", 0.0)
    with pytest.raises(ValueError, match="accuracy"):
        top_fraction_approx(df, "s", 0.5, accuracy=10)
    clash = spark.createDataFrame([(1, 0.5, 2)], "doc_id long, s double, __vhi int")
    with pytest.raises(ValueError, match="__vhi"):
        top_fraction_approx(clash, "s", 0.5)


def test_temperature_weights_properties():
    """Round-11 alpha-sampling rule: alpha=1 keeps natural proportions,
    alpha=0 is uniform over non-empty domains, intermediate alphas flatten
    monotonically (the small domain's share rises as alpha falls), weights
    always sum to 1, and the composition with mixture_targets budgets
    tokens accordingly."""
    import pytest

    from etl_data_transformer_spark.operators.curation import (
        mixture_targets,
        temperature_weights,
    )

    sizes = {"en": 900.0, "de": 90.0, "yo": 10.0}
    w1 = temperature_weights(sizes, alpha=1.0)
    assert w1["en"] == pytest.approx(0.9) and w1["yo"] == pytest.approx(0.01)
    w0 = temperature_weights(sizes, alpha=0.0)
    assert all(v == pytest.approx(1 / 3) for v in w0.values())
    w3 = temperature_weights(sizes, alpha=0.3)
    assert sum(w3.values()) == pytest.approx(1.0)
    assert w1["yo"] < w3["yo"] < w0["yo"]          # small domain rises
    assert w0["en"] < w3["en"] < w1["en"]          # big domain falls
    # zero-mass domains get zero weight at any alpha (nothing to sample)
    wz = temperature_weights({"en": 100.0, "empty": 0.0}, alpha=0.0)
    assert wz["empty"] == 0.0 and wz["en"] == 1.0
    t = mixture_targets(temperature_weights(sizes, alpha=0.3), 1_000_000)
    assert sum(t.values()) <= 1_000_000 and t["en"] > t["de"] > t["yo"] > 0
    with pytest.raises(ValueError, match="alpha"):
        temperature_weights(sizes, alpha=-1)
    with pytest.raises(ValueError, match="positive mass"):
        temperature_weights({"a": 0.0})


def test_connected_components_alternating_equivalence_and_long_path(spark):
    """Round-14 (verdict r13 item 7): the large-star/small-star
    alternation must produce the SAME min-label clusters as the default
    propagation shape — including on a path graph LONGER than the
    default's max_iter, which the propagation form refuses (its rounds
    scale with component diameter; the alternation's scale with log n)."""
    import random

    import pytest as _pytest

    from etl_data_transformer_spark.operators.graph import connected_components

    # random graph with several components: both algorithms converge,
    # labels must match exactly
    rng = random.Random(7)
    n = 120
    edges = set()
    for _ in range(150):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    edf = spark.createDataFrame(sorted(edges), ["src", "dst"])
    base = {
        r["id"]: r["cluster_id"]
        for r in connected_components(nodes, edf, max_iter=50).collect()
    }
    alt = {
        r["id"]: r["cluster_id"]
        for r in connected_components(
            nodes, edf, algorithm="alternating"
        ).collect()
    }
    assert alt == base

    # a 60-node path: diameter 59 > the default max_iter=25 -> the
    # propagation shape refuses (documented), the alternation resolves
    # the whole chain to cluster 0 in O(log n) rounds
    chain_nodes = spark.createDataFrame([(i,) for i in range(60)], ["id"])
    chain_edges = spark.createDataFrame(
        [(i, i + 1) for i in range(59)], ["src", "dst"]
    )
    with _pytest.raises(RuntimeError, match="alternating"):
        connected_components(chain_nodes, chain_edges)
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(
            chain_nodes, chain_edges, algorithm="alternating", max_iter=15
        ).collect()
    }
    assert got == {i: 0 for i in range(60)}

    # string ids and isolated nodes work identically in both shapes
    snodes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("z",)], ["id"]
    )
    sedges = spark.createDataFrame([("b", "a"), ("c", "b")], ["src", "dst"])
    for algo in ("label-propagation", "alternating"):
        got_s = {
            r["id"]: r["cluster_id"]
            for r in connected_components(
                snodes, sedges, algorithm=algo
            ).collect()
        }
        assert got_s == {"a": "a", "b": "a", "c": "a", "z": "z"}

    # unknown algorithm rejects
    with _pytest.raises(ValueError, match="algorithm"):
        connected_components(snodes, sedges, algorithm="bogus")
