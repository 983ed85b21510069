"""Dedup operator tests: exact, MinHash LSH, SimHash, embedding near-dup."""

from pyspark.sql import functions as F

from etl_data_transformer_spark.operators import dedup as DD

BASE = "the quick brown fox jumps over the lazy dog again and again ok"
NEAR = "the quick brown fox jumps over the lazy dog again and again yes"
FAR = "completely different text about spark shuffle partitions and joins"


def test_exact_dedup_keeps_lowest_id(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other")], ["doc_id", "text"]
    )
    kept = sorted(r["doc_id"] for r in DD.exact_dedup(df).collect())
    assert kept == [1, 3]  # 2 is a normalized duplicate of 1


def test_exact_dup_groups(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "A  b"), (3, "c")], ["doc_id", "text"]
    )
    groups = DD.exact_dup_groups(df).collect()
    assert len(groups) == 1
    assert groups[0]["n_copies"] == 2 and groups[0]["keeper_id"] == 1


def test_minhash_finds_near_dup(spark):
    df = spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, FAR)], ["doc_id", "text"]
    )
    pairs = DD.minhash_dedup(df, threshold=0.5).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    assert all(r["jaccard_sim"] > 0.5 for r in pairs)


def test_minhash_deterministic(spark):
    df = spark.createDataFrame([(1, BASE), (2, NEAR)], ["doc_id", "text"])
    a = DD.minhash_lsh_candidates(df).collect()
    b = DD.minhash_lsh_candidates(df).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_simhash_identical_and_near(spark):
    df = spark.createDataFrame(
        [(1, BASE), (2, BASE), (3, NEAR), (4, FAR)], ["doc_id", "text"]
    )
    hashes = {r["doc_id"]: r["simhash64"] for r in DD.simhash(df).collect()}
    assert hashes[1] == hashes[2]  # identical text → identical simhash
    ham_near = bin((hashes[1] ^ hashes[3]) & (2**64 - 1)).count("1")
    ham_far = bin((hashes[1] ^ hashes[4]) & (2**64 - 1)).count("1")
    assert ham_near < ham_far  # near-dup closer in Hamming space


def test_simhash_near_dups_pairs(spark):
    df = spark.createDataFrame(
        [(1, BASE), (2, BASE), (3, FAR)], ["doc_id", "text"]
    )
    pairs = {(r["id_a"], r["id_b"]) for r in DD.simhash_near_dups(df, max_hamming=3).collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs


def test_embedding_near_dups(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),  # near-dup of 1
        (3, [0.0, 1.0, 0.0]),  # orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r["id_a"], r["id_b"]) for r in DD.embedding_near_dups(df, threshold=0.95).collect()}
    assert pairs == {(1, 2)}


def test_ngram_jaccard_pairs(spark):
    df = spark.createDataFrame([(1, BASE), (2, NEAR), (3, FAR)], ["doc_id", "text"])
    pairs = DD.ngram_jaccard_pairs(df, threshold=0.3).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


def test_connected_components_chain_and_singleton(spark):
    from etl_data_transformer_spark.operators.graph import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(6)], ["id"])
    # chain 0-1-2, pair 3-4, singleton 5
    edges = spark.createDataFrame([(1, 2), (0, 1), (3, 4)], ["src", "dst"])
    got = {r["id"]: r["cluster_id"] for r in connected_components(nodes, edges).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}
