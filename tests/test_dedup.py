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


# ---------------------------------------------------------------------------
# Pigeonhole multi-band Hamming blocking (round-3 verdict items 1-3)
# ---------------------------------------------------------------------------

def _brute_hamming_pairs(sig_by_id: dict[int, int], max_hamming: int) -> set[tuple[int, int]]:
    ids = sorted(sig_by_id)
    return {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin((sig_by_id[a] ^ sig_by_id[b]) & (2**64 - 1)).count("1") <= max_hamming
    }


def test_hamming_band_pairs_exact_recall(spark):
    """The pigeonhole guarantee: blocked pairs == ALL pairs within
    max_hamming, on an adversarial signature set where differing bits land
    in every band position (the case round-3 prefix blocking lost ~58% of)."""
    import random

    rng = random.Random(7)
    sigs = {i: rng.getrandbits(63) for i in range(40)}
    # plant near-dups whose differing bits fall in LOW bits (outside the old
    # top-16 prefix block), HIGH bits, and straddling band boundaries
    sigs[100] = sigs[0] ^ 0b111                      # low 3 bits
    sigs[101] = sigs[1] ^ (0b101 << 61)              # high bits
    sigs[102] = sigs[2] ^ (1 << 15) ^ (1 << 16) ^ (1 << 47)  # across slices
    signed = {i: (v - 2**64 if v >= 2**63 else v) for i, v in sigs.items()}
    df = spark.createDataFrame(list(signed.items()), "doc_id long, sig long")
    for h in (1, 3):
        got = {
            (r["id_a"], r["id_b"])
            for r in DD.hamming_band_pairs(df, "doc_id", "sig", n_bits=64, max_hamming=h).collect()
        }
        assert got == _brute_hamming_pairs(sigs, h)


def test_hamming_band_pairs_reports_true_distance(spark):
    df = spark.createDataFrame([(1, 0), (2, 0b1011)], "doc_id long, sig long")
    rows = DD.hamming_band_pairs(df, "doc_id", "sig", n_bits=64, max_hamming=3).collect()
    assert len(rows) == 1 and rows[0]["hamming"] == 3


def test_hamming_band_pairs_rejects_impossible_banding(spark):
    import pytest

    df = spark.createDataFrame([(1, 0)], "doc_id long, sig long")
    with pytest.raises(ValueError):
        DD.hamming_band_pairs(df, "doc_id", "sig", n_bits=4, max_hamming=7)


def test_simhash_near_dups_blocked_equals_unblocked(spark):
    """simhash_near_dups (banded join) == brute-force N^2 over the same
    simhash values — the property the CORRECTNESS query asserts at sf0.01."""
    texts = [(i, f"doc number {i} with shared boilerplate text and again") for i in range(30)]
    texts += [(1000 + i, texts[i][1]) for i in range(5)]  # exact dups
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    sig_by_id = {r["doc_id"]: r["simhash64"] for r in DD.simhash(df).collect()}
    got = {
        (r["id_a"], r["id_b"])
        for r in DD.simhash_near_dups(df, max_hamming=6).collect()
    }
    assert got == _brute_hamming_pairs(sig_by_id, 6)


def test_oversized_buckets_audit_matches_cap(spark):
    """A degenerate corpus (every doc identical) lands all docs in one bucket
    per band; the audit reports each, and the capped join returns no pairs
    while the uncapped join returns all N^2/2."""
    df = spark.createDataFrame([(i, 42) for i in range(50)], "doc_id long, sig long")
    uncapped = DD.hamming_band_pairs(df, "doc_id", "sig", n_bits=64, max_hamming=3)
    assert uncapped.count() == 50 * 49 // 2
    capped = DD.hamming_band_pairs(df, "doc_id", "sig", n_bits=64, max_hamming=3, max_bucket_size=10)
    assert capped.count() == 0
    audit = DD.oversized_buckets(df, "sig", n_bits=64, max_hamming=3, max_bucket_size=10).collect()
    assert len(audit) == 4 and all(r["n_members"] == 50 for r in audit)


def test_minhash_hot_bucket_cap_bounds_degenerate_corpus(spark):
    """1k identical docs: uncapped minhash banding would self-join ~500k
    pairs on one bucket key; the cap excludes the bucket entirely (bounded
    work) and the audit surfaces it (no silent truncation)."""
    df = spark.createDataFrame(
        [(i, "same exact boilerplate text repeated everywhere ok") for i in range(1000)],
        ["doc_id", "text"],
    )
    capped = DD.minhash_dedup(df, threshold=0.5, max_bucket_size=100)
    assert capped.count() == 0
    audit = DD.minhash_oversized_buckets(df, max_bucket_size=100).collect()
    assert len(audit) == 4 and all(r["n_members"] == 1000 for r in audit)
    cand = DD.minhash_lsh_candidates(df.limit(20), max_bucket_size=5)
    assert cand.count() == 0  # cap applies on the candidates path too


def test_minhash_cap_no_op_on_normal_corpus(spark):
    """On a non-degenerate corpus the cap changes nothing: same pairs with
    and without it (the CORRECTNESS query's oracle-hash stability)."""
    rows = [(i, f"document {i} about topic {i % 7} with words {i * 3} and {i * 5}") for i in range(60)]
    rows += [(200, rows[0][1] + " x"), (201, rows[1][1] + " y")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    plain = sorted(map(tuple, DD.minhash_dedup(df, threshold=0.3).collect()))
    capped = sorted(map(tuple, DD.minhash_dedup(df, threshold=0.3, max_bucket_size=50).collect()))
    assert plain == capped and len(plain) > 0


def test_ngram_jaccard_exact_rejects_nonpositive_threshold(spark):
    """The gram equi-join can't emit zero-overlap pairs, so threshold<=0
    would silently under-return vs the all-pairs oracle definition."""
    import pytest

    df = spark.createDataFrame([(1, "abcdef"), (2, "uvwxyz")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="threshold must be > 0"):
        DD.ngram_jaccard_exact(df, threshold=0.0)


def test_minhash_incremental_equals_full_corpus_restriction(spark):
    """The incremental batch dedup must equal the full-corpus run restricted
    to pairs touching the batch — the store join changes the compute shape
    (no corpus re-shingling), never the answer."""
    old_rows = [
        (i, f"old document {i} about subject {i % 5} with tokens {i * 7} and {i * 11}")
        for i in range(40)
    ]
    new_rows = [
        (100, old_rows[3][1] + " x"),          # near-dup of an old doc
        (101, "an entirely novel new document about fresh things"),
        (102, "an entirely novel new document about fresh things zz"),  # near-dup of 101
        (103, old_rows[3][1] + " x"),          # exact dup of new 100 AND near old 3
    ]
    old = spark.createDataFrame(old_rows, ["doc_id", "text"])
    new = spark.createDataFrame(new_rows, ["doc_id", "text"])

    store = DD.minhash_signature_store(old)
    inc = sorted(map(tuple, DD.minhash_dedup_incremental(new, store, threshold=0.3).collect()))

    full = DD.minhash_dedup(old.unionByName(new), threshold=0.3).collect()
    new_ids = {r[0] for r in new_rows}
    expected = sorted(tuple(r) for r in full if r["id_a"] in new_ids or r["id_b"] in new_ids)

    assert inc == expected and len(inc) >= 3  # 100-3, 103-3, 100-103, 101-102
    old_only = [(a, b) for a, b, _ in inc if a not in new_ids and b not in new_ids]
    assert old_only == []  # old-vs-old pairs never re-emitted


def test_minhash_incremental_empty_batch_and_cap(spark):
    old = spark.createDataFrame(
        [(i, "same exact boilerplate text repeated everywhere ok") for i in range(200)],
        ["doc_id", "text"],
    )
    store = DD.minhash_signature_store(old)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert DD.minhash_dedup_incremental(empty, store).collect() == []
    # a degenerate store bucket is capped over the COMBINED corpus: the new
    # doc matches 200 boilerplate rows without a cap, none with it
    new = spark.createDataFrame(
        [(900, "same exact boilerplate text repeated everywhere ok")], ["doc_id", "text"]
    )
    uncapped = DD.minhash_dedup_incremental(new, store, threshold=0.5)
    assert uncapped.count() == 200
    capped = DD.minhash_dedup_incremental(new, store, threshold=0.5, max_bucket_size=100)
    assert capped.count() == 0


def test_minhash_incremental_cross_corpus_mode(spark):
    """include_batch_pairs=False: only batch-vs-store pairs (the near-dup
    decontamination screen) — batch-internal near-dups are excluded."""
    bench = spark.createDataFrame(
        [(1, "the held out evaluation question about widgets and sprockets")],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            (10, "the held out evaluation question about widgets and sprockets z"),
            (11, "the held out evaluation question about widgets and sprockets z y"),
            (12, "completely unrelated training document"),
        ],
        ["doc_id", "text"],
    )
    store = DD.minhash_signature_store(bench)
    cross = {
        (r["id_a"], r["id_b"])
        for r in DD.minhash_dedup_incremental(
            batch, store, threshold=0.3, include_batch_pairs=False
        ).collect()
    }
    assert cross == {(1, 10), (1, 11)}  # contaminated docs flagged, 10-11 pair excluded


def test_minhash_store_params_sidecar_roundtrip_and_mismatch(spark, tmp_path):
    """The store sidecar closes the silent-mismatch footgun: a reader (or
    appender) with different banding params raises instead of matching
    nothing."""
    import pytest

    path = str(tmp_path / "sig_store")
    docs = spark.createDataFrame(
        [(i, f"doc number {i} with some words") for i in range(10)], ["doc_id", "text"]
    )
    store = DD.minhash_signature_store(docs, num_hashes=8, bands=4)
    DD.write_minhash_store(store, path, num_hashes=8, bands=4)

    loaded = DD.read_minhash_store(spark, path, num_hashes=8, bands=4)
    assert loaded.count() == store.count()
    new = spark.createDataFrame([(99, "doc number 3 with some words x")], ["doc_id", "text"])
    pairs = DD.minhash_dedup_incremental(new, loaded, threshold=0.3, num_hashes=8, bands=4)
    assert pairs.count() >= 1  # near-dup of doc 3 found through the store

    with pytest.raises(ValueError, match="parameter mismatch"):
        DD.read_minhash_store(spark, path, num_hashes=12, bands=4)
    with pytest.raises(ValueError, match="parameter mismatch"):
        DD.write_minhash_store(store, path, num_hashes=12, bands=6)


def test_compact_minhash_store_preserves_incremental_pairs(spark, tmp_path):
    """Store compaction (drop signatures of deleted/deduped docs) must not
    change any surviving pair: an incremental run against the compacted
    store == the same run against a store rebuilt from the surviving
    corpus; the sidecar survives the swap."""
    import pytest

    path = str(tmp_path / "sig_store")
    texts = {
        0: "alpha beta gamma delta epsilon zeta eta theta",
        1: "alpha beta gamma delta epsilon zeta eta theta",   # dup of 0 -> deduped away
        2: "one two three four five six seven eight nine",
        3: "totally different content with other words here",
    }
    corpus = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    DD.write_minhash_store(DD.minhash_signature_store(corpus), path)

    # doc 1 lost the dedup: compact it out of the store
    dropped = spark.createDataFrame([(1,)], ["doc_id"])
    DD.compact_minhash_store(spark, path, drop_ids=dropped)

    compacted = DD.read_minhash_store(spark, path)  # sidecar still validates
    assert compacted.filter(F.col("doc_id") == 1).count() == 0
    assert compacted.select("doc_id").distinct().count() == 3

    batch = spark.createDataFrame(
        [(100, texts[0] + " x"), (101, texts[2])], ["doc_id", "text"]
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in DD.minhash_dedup_incremental(batch, compacted, threshold=0.3).collect()
    }
    rebuilt = DD.minhash_signature_store(corpus.filter(F.col("doc_id") != 1))
    want = {
        (r["id_a"], r["id_b"])
        for r in DD.minhash_dedup_incremental(batch, rebuilt, threshold=0.3).collect()
    }
    assert got == want and (0, 100) in got and (2, 101) in got and (1, 100) not in got

    # live_ids mode is the complement; exactly-one-selector contract enforced
    DD.compact_minhash_store(spark, path, live_ids=corpus.select("doc_id"))
    with pytest.raises(ValueError, match="exactly one"):
        DD.compact_minhash_store(spark, path)


# ------------------------------------------------------- winnowing ----


def test_winnow_arrow_equals_expression_path(spark, star):
    """The vectorized numpy path and the pure-expression path are the same
    integer fold over codepoints — values must be bit-identical."""
    docs = star["documents"].filter(F.col("doc_id") < 60)
    fast = DD.winnow_fingerprints(docs, k=8, w=4, arrow=True)
    slow = DD.winnow_fingerprints(docs, k=8, w=4, arrow=False)
    a = {r["doc_id"]: (r["n_grams"], list(r["fingerprints"])) for r in fast.collect()}
    b = {r["doc_id"]: (r["n_grams"], list(r["fingerprints"])) for r in slow.collect()}
    assert a == b and len(a) == 60


def test_winnow_guarantee_shared_substring(spark):
    """Winnowing guarantee: any shared substring of length >= k + w - 1
    yields at least one shared fingerprint (here k=8, w=4 → 11 chars)."""
    shared = "xqzjvkwpyfmg"  # 12 distinctive chars >= k + w - 1
    df = spark.createDataFrame(
        [
            (1, "aaaa bbbb " + shared + " cccc dddd"),
            (2, "totally different preamble " + shared + " and suffix here"),
            (3, "no overlap with anything else at all in this one row"),
        ],
        ["doc_id", "text"],
    )
    pairs = DD.winnow_overlap_pairs(df, k=8, w=4, min_shared=1).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in ids
    assert not any(3 in p for p in ids)


def test_winnow_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "tiny"), (3, None), (4, "exactly8")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in DD.winnow_fingerprints(df, k=8, w=4).collect()}
    assert list(rows[1]["fingerprints"]) == [] and rows[1]["n_grams"] == 0
    assert list(rows[2]["fingerprints"]) == []
    assert list(rows[3]["fingerprints"]) == []
    # one gram but fewer than w windows → no fingerprint selected
    assert rows[4]["n_grams"] == 1 and list(rows[4]["fingerprints"]) == []


def test_winnow_hot_fingerprint_cap(spark):
    """A fingerprint shared by every doc is dropped by the cap; pairs from
    rarer fingerprints survive."""
    boiler = "this boilerplate footer appears everywhere verbatim"
    rare = "zzz unique collision segment qqq"
    rows = [(i, f"doc number {i} body " + boiler) for i in range(10)]
    rows += [(100, "A " + rare + " tail-a"), (101, "B " + rare + " tail-b")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = DD.winnow_overlap_pairs(df, k=8, w=4, min_shared=1, max_bucket_size=4)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in got
    # the 10 boilerplate docs share only hot (dropped) fingerprints beyond
    # their distinct "doc number i" prefixes — far fewer pairs than 45
    uncapped = DD.winnow_overlap_pairs(df, k=8, w=4, min_shared=1)
    assert len(got) < uncapped.count()


def test_winnow_overlap_reuses_fingerprint_exchange(spark, star):
    """The self-join must hang both sides off ONE repartition("fp") exchange
    (ReusedExchange in the executed plan) — otherwise the whole fingerprint
    map stage runs once per side."""
    docs = star["documents"].filter(F.col("doc_id") < 100)
    df = DD.winnow_overlap_pairs(docs, k=20, w=8, min_shared=1)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


def test_winnow_incremental_equals_full_corpus_restriction(spark, star):
    """Incremental run (batch vs stored fingerprints) == full-corpus
    winnow_overlap_pairs restricted to pairs touching the batch."""
    d = star["documents"].filter(F.col("doc_id") < 200)
    old = d.filter(F.col("doc_id") < 120)
    new = d.filter(F.col("doc_id") >= 120)
    full = DD.winnow_overlap_pairs(d, k=20, w=8, min_shared=1)
    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    expected = {
        (r["id_a"], r["id_b"], r["shared"], r["containment"])
        for r in full.collect()
        if r["id_a"] in new_ids or r["id_b"] in new_ids
    }
    store = DD.winnow_store_rows(old, k=20, w=8)
    got = {
        (r["id_a"], r["id_b"], r["shared"], r["containment"])
        for r in DD.winnow_overlap_incremental(
            new, store, k=20, w=8, min_shared=1
        ).collect()
    }
    assert got == expected and len(got) > 0


def test_winnow_incremental_cross_corpus_only(spark, star):
    """include_batch_pairs=False keeps only batch-vs-store pairs."""
    d = star["documents"].filter(F.col("doc_id") < 200)
    old = d.filter(F.col("doc_id") < 120)
    new = d.filter(F.col("doc_id") >= 120)
    store = DD.winnow_store_rows(old, k=20, w=8)
    got = DD.winnow_overlap_incremental(
        new, store, k=20, w=8, min_shared=1, include_batch_pairs=False
    ).collect()
    assert len(got) > 0
    for r in got:
        assert (r["id_a"] < 120) != (r["id_b"] < 120)  # exactly one side old


def test_winnow_store_roundtrip_and_param_mismatch(spark, star, tmp_path):
    import pytest

    d = star["documents"].filter(F.col("doc_id") < 60)
    path = str(tmp_path / "wstore")
    DD.write_winnow_store(DD.winnow_store_rows(d, k=20, w=8), path, k=20, w=8)
    back = DD.read_winnow_store(spark, path, k=20, w=8)
    assert back.count() == DD.winnow_store_rows(d, k=20, w=8).count()
    with pytest.raises(ValueError, match="winnow store parameter mismatch"):
        DD.read_winnow_store(spark, path, k=8, w=4)
    with pytest.raises(ValueError, match="winnow store parameter mismatch"):
        DD.write_winnow_store(DD.winnow_store_rows(d, k=8, w=4), path, k=8, w=4)
    # overwrite = legitimate rebuild with new params
    DD.write_winnow_store(
        DD.winnow_store_rows(d, k=8, w=4), path, k=8, w=4, mode="overwrite"
    )
    assert DD.read_winnow_store(spark, path, k=8, w=4).count() > 0


def test_compact_winnow_store_preserves_incremental_pairs(spark, star, tmp_path):
    """Post-compaction incremental run == run against a store rebuilt from
    the surviving corpus (dead rows never affected surviving pairs)."""
    import pytest

    d = star["documents"].filter(F.col("doc_id") < 160)
    old = d.filter(F.col("doc_id") < 100)
    survivors = old.filter(F.col("doc_id") % 3 != 0)
    batch = d.filter(F.col("doc_id") >= 100)
    path = str(tmp_path / "wstore_c")
    DD.write_winnow_store(DD.winnow_store_rows(old, k=20, w=8), path, k=20, w=8)
    DD.compact_winnow_store(
        spark, path, drop_ids=old.filter(F.col("doc_id") % 3 == 0).select("doc_id"),
        k=20, w=8,
    )
    compacted = DD.read_winnow_store(spark, path, k=20, w=8)
    got = {
        tuple(r)
        for r in DD.winnow_overlap_incremental(
            batch, compacted, k=20, w=8, min_shared=1
        ).collect()
    }
    rebuilt = DD.winnow_store_rows(survivors, k=20, w=8)
    want = {
        tuple(r)
        for r in DD.winnow_overlap_incremental(
            batch, rebuilt, k=20, w=8, min_shared=1
        ).collect()
    }
    assert got == want and len(got) > 0
    # exactly-one-of validation
    with pytest.raises(ValueError, match="exactly one"):
        DD.compact_winnow_store(spark, path, k=20, w=8)


def test_batch_store_writers_reject_streaming_layout(spark, tmp_path):
    """Round-6 review parity: write_minhash_store / write_winnow_store
    appends onto a __batch_id-partitioned (streaming) store raise instead
    of writing flat files into the partitioned directory; overwrite (the
    documented rebuild) still works."""
    import pytest

    from etl_data_transformer_spark.operators.dedup import (
        minhash_signature_store,
        winnow_store_rows,
        write_minhash_store,
        write_winnow_store,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    for rows, writer, sidecar in (
        (minhash_signature_store(docs), write_minhash_store, "_minhash_params.json"),
        (winnow_store_rows(docs, k=4, w=3), write_winnow_store, "_winnow_params.json"),
    ):
        path = str(tmp_path / sidecar.replace(".json", "_store"))
        # simulate the streaming sink layout
        rows.withColumn("__batch_id", F.lit("tok-000000")).write.partitionBy(
            "__batch_id"
        ).parquet(path)
        if "winnow" in sidecar:
            with pytest.raises(ValueError, match="streaming"):
                writer(rows, path, k=4, w=3)
            writer(rows, path, k=4, w=3, mode="overwrite")  # rebuild allowed
        else:
            with pytest.raises(ValueError, match="streaming"):
                writer(rows, path)
            writer(rows, path, mode="overwrite")
        assert "__batch_id" not in spark.read.parquet(path).columns  # rebuilt flat


def test_exact_dedup_incremental_equals_batch_over_combined(spark, tmp_path):
    """Sequential incremental exact dedup (fingerprint store grows by the
    FULL batch after each run) keeps exactly the batch exact_dedup survivors
    over the combined corpus — including cross-batch and in-batch dups —
    and the store lifecycle (sidecar, append, overwrite rebuild) works."""
    from etl_data_transformer_spark.operators.dedup import (
        exact_dedup,
        exact_dedup_incremental,
        exact_fingerprint_store,
        write_exact_store,
    )

    rows = [
        (1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta"),   # 3 dups 1
        (10, "epsilon"), (11, "gamma delta"), (12, "epsilon"),       # 11 dups 2 (cross), 12 dups 10 (in-batch)
        (13, "zeta eta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    b1 = df.filter(F.col("doc_id") < 10)
    b2 = df.filter(F.col("doc_id") >= 10)
    expect = {r["doc_id"] for r in exact_dedup(df).collect()}

    path = str(tmp_path / "exact_store")
    write_exact_store(exact_fingerprint_store(b1.limit(0)), path)  # labeled empty store
    s1 = exact_dedup_incremental(b1, spark.read.parquet(path))
    write_exact_store(exact_fingerprint_store(b1), path)
    s2 = exact_dedup_incremental(b2, spark.read.parquet(path))
    got = {r["doc_id"] for r in s1.collect()} | {r["doc_id"] for r in s2.collect()}
    assert got == expect == {1, 2, 10, 13}

    # overwrite rebuild replaces the store atomically
    write_exact_store(exact_fingerprint_store(b2), path, mode="overwrite")
    assert spark.read.parquet(path).count() == b2.count()


def test_simhash_incremental_equals_full_corpus_restriction(spark):
    """Incremental simhash pairs == full-corpus simhash_near_dups(old ∪ new)
    restricted to pairs touching the batch — the store join (8-byte
    signatures, no text re-hash) changes the compute shape, never the
    answer. Pigeonhole recall must survive the batch/store split."""
    old_rows = [
        (i, f"old document {i} about subject {i % 5} with tokens {i * 7} and {i * 11}")
        for i in range(40)
    ]
    new_rows = [
        (100, old_rows[3][1] + " x"),          # near-dup of an old doc
        (101, "an entirely novel new document about fresh things"),
        (102, "an entirely novel new document about fresh things zz"),  # near 101
        (103, old_rows[3][1] + " x"),          # exact dup of new 100 AND near old 3
    ]
    old = spark.createDataFrame(old_rows, ["doc_id", "text"])
    new = spark.createDataFrame(new_rows, ["doc_id", "text"])

    store = DD.simhash_store_rows(old)
    inc = sorted(
        map(tuple, DD.simhash_near_dups_incremental(new, store, max_hamming=12).collect())
    )
    full = DD.simhash_near_dups(old.unionByName(new), max_hamming=12).collect()
    new_ids = {r[0] for r in new_rows}
    expected = sorted(tuple(r) for r in full if r["id_a"] in new_ids or r["id_b"] in new_ids)

    assert inc == expected and len(inc) >= 2  # at least 100-103 (d=0), 101-102
    assert (100, 103, 0) in inc  # identical text → identical signature
    old_only = [(a, b) for a, b, _ in inc if a not in new_ids and b not in new_ids]
    assert old_only == []  # old-vs-old pairs never re-emitted


def test_simhash_incremental_cap_and_cross_corpus_mode(spark, tmp_path):
    """Combined-corpus hot-bucket census + include_batch_pairs=False
    decontamination tier + store lifecycle (sidecar roundtrip, streaming
    reject, overwrite rebuild)."""
    import pytest
    from pyspark.sql import functions as F

    boiler = "same exact boilerplate text repeated everywhere ok"
    old = spark.createDataFrame(
        [(i, boiler) for i in range(200)], ["doc_id", "text"]
    )
    path = str(tmp_path / "simhash_store")
    DD.write_simhash_store(DD.simhash_store_rows(old), path)
    store = DD.read_simhash_store(spark, path)

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert DD.simhash_near_dups_incremental(empty, store).collect() == []

    new = spark.createDataFrame([(900, boiler)], ["doc_id", "text"])
    # identical docs: every band bucket holds all 201 rows → capped run drops them
    assert DD.simhash_near_dups_incremental(new, store).count() == 200
    assert (
        DD.simhash_near_dups_incremental(new, store, max_bucket_size=100).count() == 0
    )

    # cross-corpus decontamination: batch-internal pair (900, 901) excluded
    batch2 = spark.createDataFrame([(900, boiler), (901, boiler)], ["doc_id", "text"])
    cross = DD.simhash_near_dups_incremental(
        batch2, store, include_batch_pairs=False
    )
    got = {(r["id_a"], r["id_b"]) for r in cross.collect()}
    assert len(got) == 400 and (900, 901) not in got

    # appending onto a streaming-layout store is rejected; overwrite rebuilds
    stream_path = str(tmp_path / "stream_store")
    DD.simhash_store_rows(old).withColumn("__batch_id", F.lit("t-0")).write.partitionBy(
        "__batch_id"
    ).parquet(stream_path)
    with pytest.raises(ValueError, match="streaming"):
        DD.write_simhash_store(DD.simhash_store_rows(new), stream_path)
    DD.write_simhash_store(DD.simhash_store_rows(new), stream_path, mode="overwrite")
    assert spark.read.parquet(stream_path).count() == 1


def test_compact_simhash_store_preserves_incremental_pairs(spark, tmp_path):
    """Post-compaction incremental run == run against a store rebuilt from
    the surviving corpus; sidecar survives the atomic swap."""
    import os

    docs = spark.createDataFrame(
        [(i, f"document {i} on topic {i % 4} tokens {i * 3}") for i in range(30)],
        ["doc_id", "text"],
    )
    survivors = docs.filter("doc_id % 3 != 0")
    path = str(tmp_path / "sh_store")
    DD.write_simhash_store(DD.simhash_store_rows(docs), path)
    DD.compact_simhash_store(spark, path, live_ids=survivors.select("doc_id"))
    assert os.path.exists(os.path.join(path, "_simhash_params.json"))

    rebuilt = DD.simhash_store_rows(survivors)
    new = spark.createDataFrame(
        [(500, "document 7 on topic 3 tokens 21 z")], ["doc_id", "text"]
    )
    via_compacted = sorted(
        map(
            tuple,
            DD.simhash_near_dups_incremental(
                new, DD.read_simhash_store(spark, path), max_hamming=16
            ).collect(),
        )
    )
    via_rebuilt = sorted(
        map(
            tuple,
            DD.simhash_near_dups_incremental(new, rebuilt, max_hamming=16).collect(),
        )
    )
    assert via_compacted == via_rebuilt and len(via_compacted) >= 1


def test_simhash_signatures_bit_identical_to_fold(spark):
    """The codegen'd explode aggregation must produce EXACTLY the fold's
    values (stores built by either path interoperate under the same
    _SIMHASH_ALGO label) — including empty / whitespace-only / null text
    (signature 0L) and duplicate tokens (counted per occurrence)."""
    rows = [
        (1, "alpha beta gamma alpha alpha"),     # duplicate tokens
        (2, ""),                                  # empty
        (3, "   "),                               # whitespace only
        (4, None),                                # null
        (5, "единственный token с unicode 字"),
        (6, "x"),
        (7, "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fold = {
        r["doc_id"]: r["simhash64"]
        for r in DD.simhash(df).select("doc_id", "simhash64").collect()
    }
    grouped = {
        r["doc_id"]: r["simhash64"] for r in DD.simhash_signatures(df).collect()
    }
    assert grouped == fold
    assert fold[2] == fold[3] == fold[4] == 0


def test_hamming_band_pairs_reuses_signature_exchange(spark):
    """Both self-join sides must hang off ONE repartition exchange so the
    upstream signature computation runs once (ReusedExchange), mirroring
    the winnow_overlap_pairs plan discipline. The shared test session runs
    AQE-off for per-query latency (conftest round-15 note), but this test
    asserts the PRODUCTION plan property — AQE's stage-level exchange
    reuse — so it opts back in (runtime-settable, restored below)."""
    saved = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        docs = spark.createDataFrame(
            [(i, f"some document number {i} with shared words") for i in range(50)],
            "doc_id long, text string",
        )
        pairs = DD.simhash_near_dups(docs, max_hamming=8)
        pairs.collect()  # finalize AQE
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "ReusedExchange" in plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", saved)


def test_hamming_tile_engine_matches_sql_engine(spark):
    """The vectorized tile engine (forced via engine='tile' with a tiny
    block size so multi-block diagonal AND cross tiles are exercised)
    returns exactly the SQL band join's pairs — including the canonical-
    band uniqueness and the id-value triangle that replaced the positional
    one (round-7 review)."""
    import random

    rng = random.Random(11)
    sigs = {i: rng.getrandbits(63) for i in range(60)}
    sigs[100] = sigs[0] ^ 0b111
    sigs[101] = sigs[1] ^ (0b101 << 61)
    sigs[102] = sigs[2] ^ (1 << 15) ^ (1 << 16) ^ (1 << 47)
    signed = {i: (v - 2**64 if v >= 2**63 else v) for i, v in sigs.items()}
    df = spark.createDataFrame(list(signed.items()), "doc_id long, sig long")
    for h in (3, 8):
        for bs in (4, 16):
            tile = {
                (r["id_a"], r["id_b"], r["hamming"])
                for r in DD.hamming_band_pairs(
                    df, "doc_id", "sig", n_bits=64, max_hamming=h,
                    engine="tile", block_size=bs,
                ).collect()
            }
            sql = {
                (r["id_a"], r["id_b"], r["hamming"])
                for r in DD.hamming_band_pairs(
                    df, "doc_id", "sig", n_bits=64, max_hamming=h, engine="sql"
                ).collect()
            }
            assert tile == sql, (h, bs)
            # no self-pairs, every pair ordered
            assert all(a < b for a, b, _ in tile)


def test_hamming_tile_engine_string_ids(spark):
    """Tile output schema and values follow a non-long id column (round-7
    review: the hardcoded 'id_a long' schema broke string ids)."""
    import random

    rng = random.Random(3)
    rows = [(f"doc-{i:03d}", rng.getrandbits(63) - 2**62) for i in range(30)]
    rows.append(("doc-999", rows[0][1] ^ 0b11))
    df = spark.createDataFrame(rows, "doc_id string, sig long")
    tile = {
        (r["id_a"], r["id_b"])
        for r in DD.hamming_band_pairs(
            df, "doc_id", "sig", n_bits=64, max_hamming=3, engine="tile", block_size=8
        ).collect()
    }
    sql = {
        (r["id_a"], r["id_b"])
        for r in DD.hamming_band_pairs(
            df, "doc_id", "sig", n_bits=64, max_hamming=3, engine="sql"
        ).collect()
    }
    assert tile == sql and ("doc-000", "doc-999") in tile


def test_hamming_tile_engine_rejects_capped(spark):
    import pytest

    df = spark.createDataFrame([(1, 5)], "doc_id long, sig long")
    with pytest.raises(ValueError, match="tile"):
        DD.hamming_band_pairs(
            df, "doc_id", "sig", n_bits=64, max_hamming=3,
            engine="tile", max_bucket_size=10,
        )


def test_minhash_bucketed_store_lifecycle_and_no_store_side_exchange(spark, tmp_path):
    """Round-9 bucketed store layout: write(bucket_by_band=True) →
    read auto-detects from the sidecar and routes through the catalog
    entry → incremental pairs equal the flat store's → append extends the
    buckets → flat append rejects → compaction preserves the bucketed
    layout. Plan pin (broadcasts disabled to expose the shuffle shape):
    the candidate join over the BUCKETED store carries exactly ONE shuffle
    exchange (the batch side, into the store's bucket layout) while the
    flat control carries two — the store-side exchange is gone."""
    from etl_data_transformer_spark.operators.joins import with_confs

    pb = str(tmp_path / "mh_bucketed")
    pf = str(tmp_path / "mh_flat")
    corpus = spark.createDataFrame(
        [(i, f"tok{i} alpha beta gamma delta epsilon shared body {i % 7}") for i in range(200)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(1000 + i, f"tok{i} alpha beta gamma delta epsilon shared body {i % 7}") for i in range(20)]
        + [(2000, "wholly unique text never matching anything at all")],
        "doc_id long, text string",
    )
    rows = DD.minhash_signature_store(corpus)
    DD.write_minhash_store(rows, pb, mode="overwrite", bucket_by_band=True, num_buckets=8)
    DD.write_minhash_store(rows, pf, mode="overwrite")
    store_b = DD.read_minhash_store(spark, pb)
    store_f = DD.read_minhash_store(spark, pf)

    got_b = sorted(map(tuple, DD.minhash_dedup_incremental(batch, store_b, threshold=0.3).collect()))
    got_f = sorted(map(tuple, DD.minhash_dedup_incremental(batch, store_f, threshold=0.3).collect()))
    assert got_b == got_f and got_b

    # the targeted plan pin: bare candidate join, broadcasts off
    def _join_shuffles(store):
        a = DD.minhash_signature_store(batch).select(
            F.col("doc_id").alias("id_n"), "sig"
        )
        j = a.join(store.select(F.col("doc_id").alias("id_o"), "sig"), "sig")
        plan = j._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange") - plan.count("BroadcastExchange"), plan

    with with_confs(spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}):
        n_b, plan_b = _join_shuffles(store_b)
        n_f, _ = _join_shuffles(store_f)
    assert "Bucketed: true" in plan_b, plan_b[:2000]
    # the batch side's signature groupBy is an inherent exchange on BOTH
    # plans; the flat store adds one more (its side of the SMJ) that the
    # bucketed store does not — exactly one exchange difference, and the
    # store-scan subtree itself is exchange-free (nothing between the
    # bucketed FileScan and its join input)
    assert n_b == n_f - 1, (n_b, n_f, plan_b[:3000])
    scan_idx = plan_b.index("Bucketed: true")
    assert "Exchange" not in plan_b[plan_b.rindex("FileScan", 0, scan_idx) : scan_idx]

    # append extends the bucketed store; a FLAT append rejects loudly
    extra = spark.createDataFrame(
        [(5000, "fresh appended doc text entirely new stuff")], "doc_id long, text string"
    )
    DD.write_minhash_store(
        DD.minhash_signature_store(extra), pb, bucket_by_band=True, num_buckets=8
    )
    assert DD.read_minhash_store(spark, pb).count() == rows.count() + 4
    import pytest

    with pytest.raises(ValueError, match="mismatch"):
        DD.write_minhash_store(DD.minhash_signature_store(extra), pb)
    # bucket-spec drift rejects too
    with pytest.raises(ValueError, match="mismatch"):
        DD.write_minhash_store(
            DD.minhash_signature_store(extra), pb, bucket_by_band=True, num_buckets=16
        )

    # compaction preserves the layout (sidecar + bucketed files + catalog)
    DD.compact_minhash_store(spark, pb, live_ids=corpus.filter("doc_id < 100").select("doc_id"))
    store_c = DD.read_minhash_store(spark, pb)
    assert store_c.select("doc_id").distinct().count() == 100
    with with_confs(spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}):
        n_c, plan_c = _join_shuffles(store_c)
    assert n_c == n_b and "Bucketed: true" in plan_c


def test_minhash_bucketed_store_survives_fresh_catalog(spark, tmp_path):
    """The in-memory catalog forgets tables across sessions; the reader
    must re-register the bucketed entry from the sidecar + files alone
    (simulated by dropping the entry)."""
    from etl_data_transformer_spark.operators.dedup import _bucketed_store_table

    p = str(tmp_path / "mh_b2")
    corpus = spark.createDataFrame(
        [(i, f"alpha beta gamma tok{i} delta") for i in range(50)], "doc_id long, text string"
    )
    DD.write_minhash_store(
        DD.minhash_signature_store(corpus), p, mode="overwrite", bucket_by_band=True, num_buckets=4
    )
    spark.sql(f"DROP TABLE IF EXISTS `{_bucketed_store_table(p)}`")
    store = DD.read_minhash_store(spark, p)
    assert store.count() == 200
    # a bare scan legitimately drops the bucket layout (auto bucketed-scan
    # optimization); a sig-join must surface it
    from etl_data_transformer_spark.operators.joins import with_confs

    probe = spark.createDataFrame([("0,1,2,3",)], "sig string")
    with with_confs(spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}):
        plan = (
            probe.join(store, "sig")
            ._jdf.queryExecution().executedPlan().toString()
        )
    assert "Bucketed: true" in plan, plan[:1500]
    # append through a fresh catalog entry too
    spark.sql(f"DROP TABLE IF EXISTS `{_bucketed_store_table(p)}`")
    DD.write_minhash_store(
        DD.minhash_signature_store(
            spark.createDataFrame([(99999, "zeta eta theta iota kappa")], "doc_id long, text string")
        ),
        p,
        bucket_by_band=True,
        num_buckets=4,
    )
    assert DD.read_minhash_store(spark, p).count() == 204


def test_exact_bucketed_store_lifecycle_and_no_store_side_exchange(spark, tmp_path):
    """Round-9 bucketed exact store (the MinHash layout's sibling):
    write(bucket_by_fp=True) → read auto-detects and routes through the
    catalog entry → incremental survivors equal the flat store's → append
    extends the buckets → flat append and bucket-count drift reject →
    plan pin: the anti-join over the BUCKETED store carries one fewer
    shuffle than the flat control, and the store-scan subtree is
    exchange-free."""
    import pytest

    from etl_data_transformer_spark.operators.joins import with_confs

    pb = str(tmp_path / "ex_bucketed")
    pf = str(tmp_path / "ex_flat")
    corpus = spark.createDataFrame(
        [(i, f"corpus doc body {i}") for i in range(200)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(1000, "corpus doc body 7"), (1001, "wholly new doc"), (1002, "wholly new doc")],
        "doc_id long, text string",
    )
    rows = DD.exact_fingerprint_store(corpus)
    DD.write_exact_store(rows, pb, mode="overwrite", bucket_by_fp=True, num_buckets=8)
    DD.write_exact_store(rows, pf, mode="overwrite")
    store_b = DD.read_exact_store(spark, pb)
    store_f = DD.read_exact_store(spark, pf)
    got_b = sorted(r["doc_id"] for r in DD.exact_dedup_incremental(batch, store_b).collect())
    got_f = sorted(r["doc_id"] for r in DD.exact_dedup_incremental(batch, store_f).collect())
    assert got_b == got_f == [1001]  # 1000 dups the corpus, 1002 loses in-batch

    def _join_shuffles(store):
        hashed = batch.select("doc_id", DD.fingerprint("text").alias("fp"))
        j = hashed.join(store.select("fp"), "fp", "left_anti")
        plan = j._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange") - plan.count("BroadcastExchange"), plan

    with with_confs(spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}):
        n_b, plan_b = _join_shuffles(store_b)
        n_f, _ = _join_shuffles(store_f)
    assert "Bucketed: true" in plan_b, plan_b[:2000]
    assert n_b == n_f - 1, (n_b, n_f, plan_b[:3000])
    scan_idx = plan_b.index("Bucketed: true")
    assert "Exchange" not in plan_b[plan_b.rindex("FileScan", 0, scan_idx) : scan_idx]

    # append extends the buckets; flat append and spec drift reject
    extra = spark.createDataFrame([(5000, "appended doc")], "doc_id long, text string")
    DD.write_exact_store(DD.exact_fingerprint_store(extra), pb, bucket_by_fp=True, num_buckets=8)
    assert DD.read_exact_store(spark, pb).count() == 201
    with pytest.raises(ValueError, match="mismatch"):
        DD.write_exact_store(DD.exact_fingerprint_store(extra), pb)
    with pytest.raises(ValueError, match="mismatch"):
        DD.write_exact_store(
            DD.exact_fingerprint_store(extra), pb, bucket_by_fp=True, num_buckets=16
        )

    # the composed ingest discovers the layout from the sidecar alone and
    # appends back bucketed (one fewer exchange stays true after the run)
    from etl_data_transformer_spark.plans.ingest import run_incremental_ingest

    r = run_incremental_ingest(batch, exact_store=pb)
    assert (r.n_batch, r.n_landed) == (3, 1)
    assert DD.read_exact_store(spark, pb).count() == 202
    assert DD.exact_store_bucket_spec(pb) == ("fp", 8)
    with with_confs(spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}):
        n_after, plan_after = _join_shuffles(DD.read_exact_store(spark, pb))
    assert n_after == n_b and "Bucketed: true" in plan_after


def test_exact_bucketed_store_survives_fresh_catalog(spark, tmp_path):
    """The in-memory catalog forgets tables across sessions; the exact
    reader must re-register the bucketed entry from sidecar + files."""
    p = str(tmp_path / "ex_b")
    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], "doc_id long, text string"
    )
    DD.write_exact_store(
        DD.exact_fingerprint_store(corpus), p, mode="overwrite", bucket_by_fp=True, num_buckets=4
    )
    from etl_data_transformer_spark.operators.dedup import _bucketed_store_table

    spark.sql(f"DROP TABLE IF EXISTS `{_bucketed_store_table(p)}`")  # simulate fresh session
    store = DD.read_exact_store(spark, p)
    assert store.count() == 50
    plan = store.select("fp")._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan or "FileScan" in plan


# --------------------- prefix-filtered exact Jaccard join (round 10) --------


def test_jaccard_join_prefix_equals_all_pairs(spark):
    """The AllPairs prefix filter must be lossless: pair-for-pair equality
    with an unpruned python-set mirror (the same distinct-3-gram sets and
    integer threshold cut) on a tie/template-heavy fixture; the rotated
    oracle re-proves it against DuckDB's all-pairs SQL at sf0.01."""
    from etl_data_transformer_spark.operators.dedup import jaccard_join_prefix

    rows = [
        (1, "the quick brown fox jumps"),
        (2, "the quick brown fox jumped"),   # near-dup of 1
        (3, "the quick brown fox jumps"),    # exact dup of 1
        (4, "completely different content"),
        (5, "completely different contents"),  # near-dup of 4
        (6, "xy"),                            # below n: no grams
        (7, "aaaaaaaaaa"),                    # one distinct gram
        (8, "aaaaaaaaab"),                    # shares 'aaa' with 7
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    import itertools
    from fractions import Fraction

    def char_grams(s):
        return {s[i : i + 3] for i in range(len(s) - 2)} if len(s) >= 3 else set()

    def word_shingles(s):
        toks = s.split()
        if not toks:
            return set()
        return {" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 3, 0) + 1)}

    for feature, mirror in (("chars", char_grams), ("shingles", word_shingles)):
        gs = {i: mirror(txt) for i, txt in rows}
        for t in (0.3, 0.6, 0.9, 1.0):
            got = {
                (r["id_a"], r["id_b"]): (r["n_inter"], r["n_a"], r["n_b"])
                for r in jaccard_join_prefix(df, threshold=t, feature=feature).collect()
            }
            fr = Fraction(t).limit_denominator(10**9)
            want = {}
            for a, b in itertools.combinations(sorted(gs), 2):
                i = len(gs[a] & gs[b])
                na, nb = len(gs[a]), len(gs[b])
                if na and nb and i > 0 and i * fr.denominator >= fr.numerator * (na + nb - i):
                    want[(a, b)] = (i, na, nb)
            assert got == want, (feature, t)


def test_jaccard_join_prefix_guards_and_plan(spark):
    import pytest

    from etl_data_transformer_spark.operators.dedup import jaccard_join_prefix

    df = spark.createDataFrame([(1, "abcdef")], "doc_id long, text string")
    for bad in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError, match="threshold"):
            jaccard_join_prefix(df, threshold=bad)
    with pytest.raises(ValueError, match="feature"):
        jaccard_join_prefix(df, feature="bytes")
    # scale-shape pin: no BroadcastNestedLoopJoin anywhere (every join is
    # an equi-join on gram / id), and the candidate join explodes only the
    # PREFIX slice of each doc's sorted gram array (round-11 packed form:
    # __plen is the prefix length the slice reads)
    big = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document text number "), F.col("id").cast("string")).alias("text"),
    )
    plan = (
        jaccard_join_prefix(big, threshold=0.7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "slice(" in plan and "__plen" in plan


def test_corpus_stats_semantics(spark):
    from etl_data_transformer_spark.plans.quality import corpus_stats

    df = spark.createDataFrame(
        [
            (1, "one two three", "en", "web"),
            (2, "four five", "en", "web"),
            (3, "", "en", "books"),
            (4, None, "fr", "web"),
            (5, "  padded  ", "fr", "web"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    got = {
        (r["lang"], r["source"]): (r["n_docs"], r["tok_sum"], r["char_sum"], r["max_tokens"])
        for r in corpus_stats(df).collect()
    }
    assert got[("en", "web")] == (2, 5, 22, 3)
    assert got[("en", "books")] == (1, 0, 0, 0)
    # NULL text: 0 tokens, 0 chars; the padded doc counts 1 token, 10 chars
    assert got[("fr", "web")] == (2, 1, 10, 1)


def test_jaccard_store_incremental_equals_full_corpus_restriction(spark, tmp_path):
    """Round-11 store equivalence (verdict r10 item 6): sequential ingest
    through the persisted prefix-Jaccard store == one-shot
    jaccard_join_prefix over the combined corpus restricted to
    batch-touching pairs — including pairs whose grams the FROZEN census
    never saw (batch-only vocabulary must order at df=0 without losing
    completeness)."""
    from etl_data_transformer_spark.operators.dedup import (
        jaccard_join_incremental,
        jaccard_join_prefix,
        write_jaccard_store,
    )

    corpus_rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different content about old machines"),
    ]
    batch_rows = [
        (10, "the quick brown fox jumps over the lazy dog"),   # dup of 1
        (11, "entirely novel vocabulary the census never saw"),
        (12, "entirely novel vocabulary the census never sawed"),  # near-dup of 11
        (13, "completely different content about old machinery"),  # near-dup of 3
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    store = str(tmp_path / "jstore")
    for t in (0.3, 0.6):
        write_jaccard_store(corpus, store + str(t), threshold=t)
        got = {
            (r["id_a"], r["id_b"]): (r["n_inter"], r["n_a"], r["n_b"])
            for r in jaccard_join_incremental(batch, store + str(t)).collect()
        }
        batch_ids = {r[0] for r in batch_rows}
        full = jaccard_join_prefix(corpus.unionByName(batch), threshold=t)
        want = {
            (r["id_a"], r["id_b"]): (r["n_inter"], r["n_a"], r["n_b"])
            for r in full.collect()
            if r["id_a"] in batch_ids or r["id_b"] in batch_ids
        }
        assert got == want, t
        assert (10, 11) not in got and got, t  # sanity: non-pairs absent, pairs present


def test_jaccard_store_append_then_second_batch_and_compaction(spark, tmp_path):
    """Appends make earlier batches part of the corpus for later ones, and
    compaction (re-census + posting rebuild) changes NO pair results while
    refreshing the frozen order."""
    from etl_data_transformer_spark.operators.dedup import (
        compact_jaccard_store,
        jaccard_join_incremental,
        jaccard_join_prefix,
        write_jaccard_store,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    b1 = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zetas")], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(20, "alpha beta gamma delta epsilon zetas")], "doc_id long, text string"
    )
    store = str(tmp_path / "jstore")
    write_jaccard_store(corpus, store, threshold=0.5)
    r1 = {(r["id_a"], r["id_b"]) for r in jaccard_join_incremental(b1, store).collect()}
    assert r1 == {(1, 10)}
    # b1 landed via append: b2 must pair with BOTH 1 and 10
    r2 = {(r["id_a"], r["id_b"]) for r in jaccard_join_incremental(b2, store).collect()}
    assert r2 == {(1, 20), (10, 20)}
    # compaction: same pairs for a third identical batch, before == after
    b3 = spark.createDataFrame(
        [(30, "alpha beta gamma delta epsilon zetas")], "doc_id long, text string"
    )
    before = {
        (r["id_a"], r["id_b"])
        for r in jaccard_join_incremental(b3, store, append=False).collect()
    }
    compact_jaccard_store(spark, store)
    after = {
        (r["id_a"], r["id_b"])
        for r in jaccard_join_incremental(b3, store, append=False).collect()
    }
    assert before == after == {(1, 30), (10, 30), (20, 30)}
    # full-corpus ground truth at the end
    allr = jaccard_join_prefix(
        spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta"),
             (10, "alpha beta gamma delta epsilon zetas"),
             (20, "alpha beta gamma delta epsilon zetas"),
             (30, "alpha beta gamma delta epsilon zetas")],
            "doc_id long, text string",
        ),
        threshold=0.5,
    )
    assert {(r["id_a"], r["id_b"]) for r in allr.collect()} == {
        (1, 10), (1, 20), (1, 30), (10, 20), (10, 30), (20, 30)
    }


def test_jaccard_store_guards(spark, tmp_path):
    """Threshold below the build threshold rejects (persisted prefixes
    would be incomplete); higher thresholds run; cross-corpus mode drops
    batch-internal pairs; read-only mode leaves the store untouched."""
    import pytest

    from etl_data_transformer_spark.operators.dedup import (
        jaccard_join_incremental,
        write_jaccard_store,
    )

    corpus = spark.createDataFrame(
        [(1, "one two three four five six")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(10, "one two three four five sixes"),
         (11, "one two three four five sixes")],
        "doc_id long, text string",
    )
    store = str(tmp_path / "jstore")
    write_jaccard_store(corpus, store, threshold=0.6)
    with pytest.raises(ValueError, match="below the store's build threshold"):
        jaccard_join_incremental(batch, store, threshold=0.3)
    n_postings = spark.read.parquet(store + "/postings").count()
    got = {
        (r["id_a"], r["id_b"])
        for r in jaccard_join_incremental(
            batch, store, threshold=0.9, include_batch_pairs=False, append=False
        ).collect()
    }
    assert got == set()  # J(1,10) < 0.9; (10,11) excluded by cross-corpus mode
    assert spark.read.parquet(store + "/postings").count() == n_postings  # read-only


def test_jaccard_prefix_no_int32_overflow_on_fine_thresholds(spark, tmp_path):
    """Round-11 review: a threshold like 0.333333 carries a ~1e6 numerator
    through Fraction.limit_denominator, so `__sz * num` wraps int32 once a
    doc has >= ~6.4k distinct shingles — the packed rewrite must keep the
    size arithmetic in longs (the window count(*) it replaced was long).
    Two identical 7k-distinct-shingle docs MUST pair at any threshold."""
    from etl_data_transformer_spark.operators.dedup import (
        jaccard_join_incremental,
        jaccard_join_prefix,
        write_jaccard_store,
    )

    text = " ".join(f"w{i}" for i in range(7000))
    df = spark.createDataFrame([(1, text), (2, text)], "doc_id long, text string")
    got = jaccard_join_prefix(df, threshold=0.333333).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(1, 2)]
    assert got[0]["n_a"] == got[0]["n_b"] == got[0]["n_inter"]
    store = str(tmp_path / "jstore")
    write_jaccard_store(
        spark.createDataFrame([(1, text)], "doc_id long, text string"),
        store,
        threshold=0.333333,
    )
    inc = jaccard_join_incremental(
        spark.createDataFrame([(2, text)], "doc_id long, text string"),
        store,
        append=False,
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in inc] == [(1, 2)]


# ------------------------- verify-split store layout (round 12) ------------


def _split_corpus(spark):
    rows = [
        (i, f"old document {i} about subject {i % 5} with tokens {i * 7} and {i * 11}")
        for i in range(40)
    ]
    return rows, spark.createDataFrame(rows, ["doc_id", "text"])


def _split_batch(spark, rows):
    new_rows = [
        (100, rows[3][1] + " x"),
        (101, "an entirely novel new document about fresh things"),
        (102, "an entirely novel new document about fresh things zz"),
        (103, rows[3][1] + " x"),
    ]
    return new_rows, spark.createDataFrame(new_rows, ["doc_id", "text"])


def test_minhash_split_store_write_read_incremental_equivalence(spark, tmp_path):
    """The split (sigs/ + hashsets/) layout must be result-invisible:
    the split-path incremental run equals the legacy carried-hs run equals
    the full-corpus restriction, and the compat view reconstructs the v1
    row set exactly."""
    rows, old = _split_corpus(spark)
    new_rows, new = _split_batch(spark, rows)
    ps = str(tmp_path / "mh_split")
    pf = str(tmp_path / "mh_flat")
    sig_rows = DD.minhash_signature_store(old)
    DD.write_minhash_store(sig_rows, ps, mode="overwrite", layout="split")
    DD.write_minhash_store(sig_rows, pf, mode="overwrite")

    assert DD.minhash_store_layout(ps) == "split"
    assert DD.minhash_store_layout(pf) == "flat"

    slim, sets = DD.read_minhash_store_split(spark, ps)
    assert slim.columns == ["doc_id", "sig"] and sets.columns == ["doc_id", "hs"]
    assert sets.count() == sets.select("doc_id").distinct().count()

    got = sorted(
        map(
            tuple,
            DD.minhash_dedup_incremental(
                new, slim, threshold=0.3, store_sets=sets
            ).collect(),
        )
    )
    legacy = sorted(
        map(
            tuple,
            DD.minhash_dedup_incremental(
                new, DD.read_minhash_store(spark, pf), threshold=0.3
            ).collect(),
        )
    )
    full = DD.minhash_dedup(old.unionByName(new), threshold=0.3).collect()
    new_ids = {r[0] for r in new_rows}
    expected = sorted(
        tuple(r) for r in full if r["id_a"] in new_ids or r["id_b"] in new_ids
    )
    assert got == legacy == expected and len(got) >= 3

    # the compat view reconstructs the flat row set exactly
    compat = {
        (r["doc_id"], tuple(sorted(r["hs"])), r["sig"])
        for r in DD.read_minhash_store(spark, ps).collect()
    }
    flat = {
        (r["doc_id"], tuple(sorted(r["hs"])), r["sig"])
        for r in DD.read_minhash_store(spark, pf).collect()
    }
    assert compat == flat

    # the cap and cross-corpus modes route through the split path too
    capped = sorted(
        map(
            tuple,
            DD.minhash_dedup_incremental(
                new, slim, threshold=0.3, store_sets=sets, max_bucket_size=1000
            ).collect(),
        )
    )
    assert capped == expected
    cross = DD.minhash_dedup_incremental(
        new, slim, threshold=0.3, store_sets=sets, include_batch_pairs=False
    ).collect()
    assert all(
        (r["id_a"] in new_ids) != (r["id_b"] in new_ids) for r in cross
    )


def test_minhash_split_store_append_and_param_guard(spark, tmp_path):
    """Split appends extend both sub-tables (hashsets first); a flat
    append onto a split store — and any parameter drift — rejects."""
    import pytest

    rows, old = _split_corpus(spark)
    ps = str(tmp_path / "mh_split_app")
    DD.write_minhash_store(
        DD.minhash_signature_store(old), ps, mode="overwrite", layout="split"
    )
    extra = spark.createDataFrame(
        [(500, "fresh appended doc text entirely new stuff")], ["doc_id", "text"]
    )
    DD.write_minhash_store(DD.minhash_signature_store(extra), ps, layout="split")
    slim, sets = DD.read_minhash_store_split(spark, ps)
    assert slim.filter(F.col("doc_id") == 500).count() == 4  # one row per band
    assert sets.filter(F.col("doc_id") == 500).count() == 1
    with pytest.raises(ValueError, match="mismatch"):
        DD.write_minhash_store(DD.minhash_signature_store(extra), ps)  # flat append
    with pytest.raises(ValueError, match="mismatch"):
        DD.write_minhash_store(
            DD.minhash_signature_store(extra), ps, layout="split", bands=6, num_hashes=12
        )


def test_compact_minhash_store_migrates_layouts(spark, tmp_path):
    """compact(to_layout='split') migrates a v1 flat store in place
    (sidecar versioned, pairs identical); to_layout='flat' round-trips."""
    rows, old = _split_corpus(spark)
    new_rows, new = _split_batch(spark, rows)
    p = str(tmp_path / "mh_migrate")
    DD.write_minhash_store(DD.minhash_signature_store(old), p, mode="overwrite")
    live = old.select("doc_id")

    before = sorted(
        map(
            tuple,
            DD.minhash_dedup_incremental(
                new, DD.read_minhash_store(spark, p), threshold=0.3
            ).collect(),
        )
    )
    DD.compact_minhash_store(spark, p, live_ids=live, to_layout="split")
    assert DD.minhash_store_layout(p) == "split"
    slim, sets = DD.read_minhash_store_split(spark, p)
    after = sorted(
        map(
            tuple,
            DD.minhash_dedup_incremental(
                new, slim, threshold=0.3, store_sets=sets
            ).collect(),
        )
    )
    assert after == before and after

    # migrate back: flat rows reconstruct exactly
    DD.compact_minhash_store(spark, p, live_ids=live, to_layout="flat")
    assert DD.minhash_store_layout(p) == "flat"
    back = sorted(
        map(
            tuple,
            DD.minhash_dedup_incremental(
                new, DD.read_minhash_store(spark, p), threshold=0.3
            ).collect(),
        )
    )
    assert back == before


def test_minhash_split_compaction_prunes_half_appended_seam(spark, tmp_path):
    """A split append that crashed after hashsets but before sigs leaves
    the batch un-indexed by design; compaction prunes the orphaned
    hashset rows instead of carrying them forever."""
    import os

    rows, old = _split_corpus(spark)
    p = str(tmp_path / "mh_seam")
    DD.write_minhash_store(
        DD.minhash_signature_store(old), p, mode="overwrite", layout="split"
    )
    ghost = spark.createDataFrame([(999, rows[0][1])], ["doc_id", "text"])
    DD.minhash_signature_store(ghost).dropDuplicates(["doc_id"]).select(
        "doc_id", "hs"
    ).write.mode("append").parquet(os.path.join(p, "hashsets"))

    DD.compact_minhash_store(spark, p, live_ids=old.select("doc_id").union(
        spark.createDataFrame([(999,)], ["doc_id"])
    ))
    slim, sets = DD.read_minhash_store_split(spark, p)
    assert sets.filter(F.col("doc_id") == 999).count() == 0
    assert slim.filter(F.col("doc_id") == 999).count() == 0
    assert sets.count() == 40


def test_minhash_split_bucketed_store_both_joins_exchange_free(spark, tmp_path):
    """Split + bucketed: sigs bucket on sig (candidate join) AND hashsets
    bucket on doc_id (verify join) — both store-side scans join with no
    store-side Exchange; pairs equal the flat store's."""
    from etl_data_transformer_spark.operators.joins import with_confs

    rows, old = _split_corpus(spark)
    new_rows, new = _split_batch(spark, rows)
    pb = str(tmp_path / "mh_split_b")
    pf = str(tmp_path / "mh_flat_b")
    sig_rows = DD.minhash_signature_store(old)
    DD.write_minhash_store(
        sig_rows, pb, mode="overwrite", layout="split", bucket_by_band=True, num_buckets=4
    )
    DD.write_minhash_store(sig_rows, pf, mode="overwrite")
    slim, sets = DD.read_minhash_store_split(spark, pb)

    got = sorted(
        map(
            tuple,
            DD.minhash_dedup_incremental(
                new, slim, threshold=0.3, store_sets=sets
            ).collect(),
        )
    )
    legacy = sorted(
        map(
            tuple,
            DD.minhash_dedup_incremental(
                new, DD.read_minhash_store(spark, pf), threshold=0.3
            ).collect(),
        )
    )
    assert got == legacy and got

    def _store_scan_exchange_free(join_df, col):
        plan = join_df._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan[:2000]
        scan_idx = plan.index("Bucketed: true")
        return "Exchange" not in plan[plan.rindex("FileScan", 0, scan_idx) : scan_idx]

    with with_confs(spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}):
        a = DD.minhash_signature_store(new).select(F.col("doc_id").alias("id_n"), "sig")
        cand_join = a.join(slim.select(F.col("doc_id").alias("id_o"), "sig"), "sig")
        assert _store_scan_exchange_free(cand_join, "sig")
        cand = spark.createDataFrame([(3, 100)], ["doc_id", "id_b"])
        verify_join = sets.join(cand, "doc_id")
        assert _store_scan_exchange_free(verify_join, "doc_id")

    # split-bucketed append extends both catalog tables
    extra = spark.createDataFrame([(700, rows[1][1] + " y")], ["doc_id", "text"])
    DD.write_minhash_store(
        DD.minhash_signature_store(extra), pb, layout="split", bucket_by_band=True, num_buckets=4
    )
    slim2, sets2 = DD.read_minhash_store_split(spark, pb)
    assert slim2.filter(F.col("doc_id") == 700).count() == 4
    assert sets2.filter(F.col("doc_id") == 700).count() == 1


# ---------------- Jaccard-store candidate-mass drift (round 12) -------------


def test_jaccard_store_drift_detection_and_compaction_restores_mass(
    spark, tmp_path
):
    """Round-11 verdict item 7: a vocabulary-shifted batch stream makes
    the frozen census under-prune (unseen-hot grams rank df=0 → stay in
    prefixes → candidate mass per batch doc grows). The mass sidecar must
    DETECT the drift, maybe_compact must trigger the re-census, and the
    post-compaction mass must collapse while pair results stay identical."""
    import shutil

    from etl_data_transformer_spark.operators.dedup import (
        jaccard_join_incremental,
        jaccard_store_drift,
        maybe_compact_jaccard_store,
        write_jaccard_store,
    )

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    base = docs(
        [
            (i, f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}")
            for i in range(30)
        ]
    )
    path = str(tmp_path / "jstore")
    write_jaccard_store(base, path, n=2, threshold=0.7)
    d0 = jaccard_store_drift(path)
    assert d0["recommend_compact"] is False and d0["last_cand_per_doc"] is None

    # three batches of a SHIFTED vocabulary sharing hot shingles the
    # census has never seen
    def shifted(batch_no):
        return docs(
            [
                (
                    1000 * batch_no + j,
                    f"breaking news update today item{batch_no}x{j} "
                    f"unique{batch_no}y{j} tail{batch_no}z{j}",
                )
                for j in range(15)
            ]
        )

    ratios = []
    for b in (1, 2, 3):
        jaccard_join_incremental(shifted(b), path)
        ratios.append(jaccard_store_drift(path)["ratio"])
    assert ratios == sorted(ratios)  # drift grows monotonically here
    assert jaccard_store_drift(path, factor=4.0)["recommend_compact"]

    # identical probe against a drifted copy vs the compacted store:
    # pairs identical (exactness), candidate mass collapses
    drifted = str(tmp_path / "jstore_drifted")
    shutil.copytree(path, drifted)
    assert maybe_compact_jaccard_store(spark, path, factor=4.0) is True
    assert jaccard_store_drift(path)["last_cand_per_doc"] is None  # history reset

    probe = shifted(9)
    pairs_drifted = sorted(
        map(tuple, jaccard_join_incremental(probe, drifted).collect())
    )
    pairs_compact = sorted(
        map(tuple, jaccard_join_incremental(probe, path).collect())
    )
    assert pairs_drifted == pairs_compact

    m_drifted = jaccard_store_drift(drifted)["last_cand_per_doc"]
    m_compact = jaccard_store_drift(path)["last_cand_per_doc"]
    assert m_compact < m_drifted / 3, (m_compact, m_drifted)
    # a second maybe_compact right after is a no-op unless drift returns
    assert maybe_compact_jaccard_store(spark, path, factor=4.0) in (False, True)
