"""LLM-training-data pipeline queries (SURVEY.md §2.10; BASELINE.json north
star): dedup, similarity search, text analysis, multimodal plumbing — over
the ``documents`` / ``embeddings`` fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators import dedup as DD
from ..operators import multimodal as MM
from ..operators import similarity as SIM
from ..sources.readers import load_star


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_star(spark, sf_dir, ("documents",))["documents"]


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_star(spark, sf_dir, ("embeddings",))["embeddings"]


# ---------------------------------------------------------------- dedup ----

def q_contamination_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: docs with id < 50 play the eval set,
    the rest are the corpus; per corpus doc, the fraction of its word
    8-gram shingles found anywhere in the eval set (hashed-shingle
    semi-join against the broadcast benchmark — never N×N). Replaced
    ``doc_fingerprint`` in the 50-slot catalog: the fingerprint expression
    stays oracle-covered through ``exact_dedup_groups`` (same
    sha256-over-normalized-text)."""
    from ..operators.curation import contamination_check

    d = _docs(spark, sf_dir)
    bench = d.filter(F.col("doc_id") < 50)
    corpus = d.filter(F.col("doc_id") >= 50)
    return contamination_check(corpus, bench, n=8, threshold=0.1)


def q_exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy: per content group, copies + keeper id."""
    d = _docs(spark, sf_dir)
    return (
        d.withColumn("fp", TX.fingerprint("text"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper_id"))
    )


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs verified by exact shingle-hash
    Jaccard. Oracle-checked against DuckDB's exact all-pairs word-shingle
    Jaccard: the verify step makes the output = {pairs with J >= t} ∩
    {LSH candidates}, and on the fixtures every true pair sits at J >= 0.9
    (measured: nothing between 0.2 and 0.9), where the seeded banding's
    candidate recall is 1.0 — so the verified LSH output equals the exact
    all-pairs answer. Jaccard over xxhash64-hashed shingles equals Jaccard
    over the shingle strings barring 64-bit collisions."""
    return DD.minhash_dedup(_docs(spark, sf_dir), threshold=0.3).orderBy("id_a", "id_b")


def q_simhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash accuracy gate — the driver-checkable form of the simhash
    operator (the seeded xxhash64 bit-fold has no SQL twin, so this uses
    the same recall-row pattern as ``ann_lsh_recall``): one row per exact
    char-3-gram-Jaccard >= 0.6 near-dup pair on the capped corpus,
    asserting the UNBLOCKED 64-bit simhash Hamming distance <= 26. Truth
    pairs measure hamming 6-23 on the fixtures while unrelated pairs
    center at 32±4 (binomial n=64), so all-pairs-pass under a broken hash
    is a ~1e-180 coincidence — a statistically strong implementation
    check. The blocked production path (``simhash_near_dups``, top-16-bit
    band) stays pytest-covered (tests/test_dedup.py)."""
    d = _docs(spark, sf_dir).filter((F.col("doc_id") < 100) & (F.length("text") >= 3))
    truth = DD.ngram_jaccard_exact(d, n=3, threshold=0.6).select("id_a", "id_b")
    hashed = DD.simhash(d).select("doc_id", "simhash64")
    a = hashed.select(F.col("doc_id").alias("id_a"), F.col("simhash64").alias("h_a"))
    b = hashed.select(F.col("doc_id").alias("id_b"), F.col("simhash64").alias("h_b"))
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        truth.join(F.broadcast(a), "id_a")
        .join(F.broadcast(b), "id_b")
        .select("id_a", "id_b", (ham <= F.lit(26)).alias("sim_found"))
    )


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine-threshold near-dup pairs over embeddings (restricted id range
    keeps the N² candidate set bounded at larger SFs)."""
    e = _emb(spark, sf_dir).filter(F.col("vec_id") < 250)
    return DD.embedding_near_dups(e, threshold=0.4).select("id_a", "id_b")


# ----------------------------------------------------------- similarity ----

def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 10 query vectors against the full corpus."""
    e = _emb(spark, sf_dir).select(F.col("vec_id").alias("id"), "embedding")
    q = e.filter(F.col("id") < 10)
    return SIM.brute_force_topk(q, e, k=5)


def _ann_recall(approx: DataFrame, exact: DataFrame, k: int, min_hits: int) -> DataFrame:
    """Per-query recall@k assertion of an ANN path against the exact top-k:
    (query_id, k, recall_ok). The oracle is the constant expectation — the
    driver-checkable form of 'recall >= min_hits/k for every query vector'
    (round-1 verdict item 5)."""
    hits = (
        exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        exact.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.lit(k).alias("k"),
            (F.coalesce("n_hits", F.lit(0)) >= F.lit(min_hits)).alias("recall_ok"),
        )
    )


def q_ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib BucketedRandomProjectionLSH top-5, asserted to recall >= 3/5 of
    the exact top-5 per query vector (measured: 4/5 minimum on the
    fixtures). The LSH path is the 100 TB candidate generator; the exact
    side here is the bounded 10-query brute force."""
    e = _emb(spark, sf_dir).select(F.col("vec_id").alias("id"), "embedding")
    q = e.filter(F.col("id") < 10)
    return _ann_recall(SIM.lsh_topk(q, e, k=5), SIM.brute_force_topk(q, e, k=5), k=5, min_hits=3)


def q_ann_ivf_quantized_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality gate for the int8-coarse + full-precision-rerank IVF path
    (round-4 verdict item 5): for every (query, rank) slot of the top-5,
    assert the quantized-rerank search returns the SAME neighbor as the
    full-precision search over the same quantized index (rerank_k=20 is
    wide enough on the fixtures that int8 coarse error cannot evict a true
    top-5 candidate). Oracle: the constant-true expectation over
    queries × ranks."""
    e = _emb(spark, sf_dir).select(F.col("vec_id").alias("id"), "embedding")
    q = e.filter(F.col("id") < 10)
    cents = SIM.train_ivf_centroids(e, n_lists=8)
    index = SIM.ivf_assign(e, cents, quantize=True)
    full = SIM.ivf_search(q, index, cents, k=5, n_probes=4)
    rer = SIM.ivf_search(
        q, index, cents, k=5, n_probes=4, rerank_quantized=True, rerank_k=20
    )
    return (
        full.withColumnRenamed("neighbor_id", "n_full")
        .join(rer.withColumnRenamed("neighbor_id", "n_rerank"), ["query_id", "rank"], "full")
        .select(
            "query_id",
            "rank",
            (F.col("n_full") == F.col("n_rerank")).alias("match"),
        )
    )


def q_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (trained k-means centroids, 4-of-8 probes), asserted to
    recall >= 1/5 of the exact top-5 per query vector (measured: 3/5
    minimum on the fixtures — embeddings are near-isotropic, the worst case
    for coarse quantization)."""
    e = _emb(spark, sf_dir).select(F.col("vec_id").alias("id"), "embedding")
    q = e.filter(F.col("id") < 10)
    return _ann_recall(SIM.ivf_topk(q, e, k=5, n_probes=4), SIM.brute_force_topk(q, e, k=5), k=5, min_hits=1)


# ----------------------------------------------------------- text stats ----

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/char counts (whitespace + BPE-ish) + punct ratio."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        TX.char_count("text").alias("n_chars_calc"),
        TX.token_count("text").alias("n_tokens"),
        TX.bpe_token_count("text").alias("n_bpe_tokens"),
        TX.punct_ratio("text").alias("punct_ratio"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language-ID heuristic vs the labeled lang column."""
    d = _docs(spark, sf_dir)
    return d.select("doc_id", "lang", TX.lang_id("text").alias("lang_pred"))


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score per doc + aggregate per source."""
    d = _docs(spark, sf_dir)
    return (
        d.select("source", TX.quality_score("text").alias("q"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("q"), 4).alias("avg_quality"),
            F.round(F.min("q"), 6).alias("min_quality"),
            F.round(F.max("q"), 6).alias("max_quality"),
        )
    )


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-pipeline chunking: split each document into 50-token windows with
    10-token overlap (stride 40) — the context-window prep step. Pure JVM
    array ops; chunk count ∝ doc length, so the explode parallelizes by
    document."""
    size, stride = 50, 40
    d = _docs(spark, sf_dir)
    # token array projected before the chunk lambda (no CSE inside
    # higher-order functions — capturing the split re-tokenizes per chunk)
    d = d.select("doc_id", TX.tokens("text").alias("__tk"))
    toks = F.col("__tk")
    n_chunks = F.ceil(F.greatest(F.size(toks) - (size - stride), F.lit(1)) / F.lit(stride)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("idx"),
            F.concat_ws(" ", F.slice(toks, i * stride + 1, size)).alias("txt"),
        ),
    )
    return (
        d.select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.idx").alias("chunk_idx"),
            F.size(TX.tokens(F.col("c.txt"))).alias("n_tokens"),
            F.col("c.txt").alias("chunk_text"),
        )
    )


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document: explode→tf, join document length and
    document frequency, rank per doc. Three shuffles (tf groupBy, df groupBy,
    per-doc window) — all on narrow keys; the df side is a broadcast-sized
    term dictionary at any corpus size with a bounded vocabulary."""
    d = _docs(spark, sf_dir)
    tok = d.select("doc_id", F.explode(TX.tokens(F.lower("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tc"))
    dl = tf.groupBy("doc_id").agg(F.sum("tc").alias("n_toks"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("docs_with"))
    n_docs = dl.count()
    score = F.round(
        (F.col("tc") / F.col("n_toks").cast("double"))
        * F.log(F.lit(float(n_docs)) / F.col("docs_with")),
        8,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(score.desc(), F.col("term").asc())
    return (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df_), "term")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "rnk")
    )


def q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of embeddings (the 4× storage lever at
    corpus scale): per-vector scale, first 3 codes, reconstruction RMSE."""
    from ..functions.vector import quant_rmse, quant_scale, quantize_int8

    e = _emb(spark, sf_dir).filter(F.col("vec_id") < 100)
    # scale PROJECTED before the quantize/rmse lambdas capture it: the
    # array_max-over-transform expression re-evaluates per element inside
    # a higher-order function (no CSE — the round-10 pmi_pairs lesson),
    # turning O(dim) quantization into O(dim²)
    e = e.select("vec_id", "embedding", quant_scale("embedding").alias("s"))
    out = e.select(
        "vec_id",
        "s",
        quantize_int8("embedding", F.col("s")).alias("codes"),
        quant_rmse("embedding", F.col("s")).alias("err"),
    ).filter(F.col("s") > 0)
    # q_head is serialized to a CSV string: the driver's canonicalizer
    # (pandas sort_values) cannot hash raw array cells (round-1 red row).
    return out.select(
        "vec_id",
        F.round("s", 6).alias("scale"),
        F.concat_ws(",", F.transform(F.slice("codes", 1, 3), lambda x: x.cast("string"))).alias("q_head"),
        F.round("err", 6).alias("rmse"),
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → clusters via iterative min-label connected
    components (operators/graph.py). Edges are the exact n-gram Jaccard
    pairs (oracle-able, unlike the seeded MinHash pairs); the oracle is a
    DuckDB recursive CTE computing the same min-reachable-id — deterministic
    regardless of algorithm."""
    from ..operators.graph import dedup_clusters as _clusters

    d = _docs(spark, sf_dir).filter((F.col("doc_id") < 100) & (F.length("text") >= 3))
    pairs = DD.ngram_jaccard_exact(d, n=3, threshold=0.6)
    return _clusters(d, pairs)


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/20 train/test split: hash the id (md5, engine-
    portable) and threshold the hex prefix. Unlike ``randomSplit`` this is
    stable across partitioning, retries, and engines — the property a
    reproducible training pipeline needs. Returns per-(split, source)
    counts."""
    d = _docs(spark, sf_dir)
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "cd", "train"
    ).otherwise("test")
    return (
        d.select(split.alias("split"), "source")
        .groupBy("split", "source")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed pretraining-data curation: language allow-list → quality
    threshold → exact dedup (keep lowest id per fingerprint) → per-language
    survivor stats with token budget. One declarative plan: Catalyst fuses
    the filters into the scan and the dedup is a single window shuffle."""
    d = _docs(spark, sf_dir)
    kept = (
        d.filter(F.col("lang").isin("en", "de", "fr"))
        .withColumn("q", TX.quality_score("text"))
        .filter(F.col("q") >= 0.5)
        .withColumn("fp", TX.fingerprint("text"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("fp").orderBy(F.col("doc_id").asc())
    survivors = kept.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    # Quality is aggregated as an integer micro-sum, not round(avg(q), 4):
    # q is a 6-decimal-rounded double, so avg(q) sits systematically at
    # round-half midpoints where Spark and DuckDB tie-break differently
    # (round-1 hash mismatch). Note the round-2 driver mismatch on this
    # query was a different bug entirely: the oracle's bare sum(BIGINT)
    # returns HUGEINT, which pandas materializes as float64 ("3510.0" vs
    # Spark's "3510") — every integer sum in an oracle must CAST to BIGINT.
    return (
        survivors.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(TX.token_count("text")).alias("total_tokens"),
            F.round(F.sum("q") * 1000000, 0).cast("long").alias("q_sum_micros"),
        )
    )


def q_simhash_blocked_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked-path exactness gate for the pigeonhole Hamming join (round-3
    verdict item 1): over EVERY pair of the capped corpus, assert that the
    banded ``hamming_band_pairs`` join finds the pair IFF the unblocked
    all-pairs Hamming distance is within the threshold. The pigeonhole
    construction (h+1 disjoint bands) guarantees this equivalence — unlike
    the round-3 prefix block, whose recall was probabilistic. Oracle: the
    constant-true expectation over the same pair universe."""
    h = 8
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 100)
    hashed = DD.simhash(d).select("doc_id", "simhash64")
    blocked = (
        DD.hamming_band_pairs(hashed, "doc_id", "simhash64", n_bits=64, max_hamming=h)
        .select("id_a", "id_b")
        .withColumn("__found", F.lit(1))
    )
    a = hashed.select(F.col("doc_id").alias("id_a"), F.col("simhash64").alias("h_a"))
    b = hashed.select(F.col("doc_id").alias("id_b"), F.col("simhash64").alias("h_b"))
    unblocked = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))) <= h
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .join(F.broadcast(blocked), ["id_a", "id_b"], "left")
        .select(
            "id_a",
            "id_b",
            (F.col("__found").isNotNull() == unblocked).alias("blocked_eq_unblocked"),
        )
    )


def q_hyperplane_blocked_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same blocked==unblocked equivalence gate for the hyperplane-LSH
    Hamming join over embedding signatures (round-3 verdict item 2): the
    16-bit sign signature's banded join must equal the all-pairs Hamming
    scan on every pair of the capped corpus."""
    from ..operators.curation import hyperplane_lsh_pairs, hyperplane_signatures

    h = 2
    e = _emb(spark, sf_dir).filter(F.col("vec_id") < 150)
    signed = hyperplane_signatures(e, n_bits=16)
    blocked = (
        hyperplane_lsh_pairs(e, n_bits=16, max_hamming=h)
        .select("id_a", "id_b")
        .withColumn("__found", F.lit(1))
    )
    a = signed.select(F.col("vec_id").alias("id_a"), F.col("s").alias("s_a"))
    b = signed.select(F.col("vec_id").alias("id_b"), F.col("s").alias("s_b"))
    unblocked = F.bit_count(F.col("s_a").bitwiseXOR(F.col("s_b"))) <= h
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .join(F.broadcast(blocked), ["id_a", "id_b"], "left")
        .select(
            "id_a",
            "id_b",
            (F.col("__found").isNotNull() == unblocked).alias("blocked_eq_unblocked"),
        )
    )


def q_stratified_cap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source cap keeping the LONGEST documents (domain balancing with a
    quality-ordered keep rule): at most 15 docs per source, ordered by char
    length desc with the doc id as deterministic tie-break."""
    from ..operators.curation import stratified_cap

    d = _docs(spark, sf_dir).withColumn("n_chars_calc", F.length("text"))
    return stratified_cap(d, key_col="source", cap_n=15, order_col="n_chars_calc").select(
        "doc_id", "source", "n_chars_calc"
    )


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram LM quality scores in engine-exact integer micro-nats
    (per-token log-prob rounded per vocabulary entry BEFORE the
    order-independent integer sum — the COVERAGE.md float-audit pattern)."""
    return TX.unigram_logprob_scores(_docs(spark, sf_dir), quantize_micros=True)


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional bigram LM scores, engine-exact micro-nats (pytest-oracle
    row — outside the 50-slot driver contract, hash-checked by
    tests/test_rotated_oracle.py)."""
    return TX.bigram_logprob_scores(_docs(spark, sf_dir), quantize_micros=True)


def q_semantic_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invariant gate for SemDeDup-style semantic dedup over the embeddings
    table (seeded k-means clusters → in-cluster cosine drops): (1) zero
    surviving same-cluster pairs at or above the threshold, (2) every
    dropped vector is justified by an in-cluster lower-id neighbor at or
    above it. Both are computed from the operator's own outputs against
    its pair candidates — a broken drop rule breaks one of them. Oracle:
    the constant expectation (one row)."""
    from ..operators.curation import semantic_dedup, semantic_dedup_pairs
    from ..operators.similarity import train_ivf_centroids

    thr = 0.4  # fixture embeddings are near-isotropic; 0.4 yields real drops
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    cents = train_ivf_centroids(
        e.select(F.col("vec_id").alias("id"), "embedding"), n_lists=8
    )
    pairs = semantic_dedup_pairs(e, cents, threshold=thr)
    survivors = semantic_dedup(e, threshold=thr, centroids=cents).select("vec_id")
    surviving_pairs = (
        pairs.join(survivors.withColumnRenamed("vec_id", "id_a"), "id_a", "left_semi")
        .join(survivors.withColumnRenamed("vec_id", "id_b"), "id_b", "left_semi")
    )
    dropped = e.select("vec_id").join(survivors, "vec_id", "left_anti")
    justified = dropped.join(
        pairs.select(F.col("id_b").alias("vec_id")).distinct(), "vec_id", "left_semi"
    )
    n_viol = surviving_pairs.count()  # driver scalars: bounded gate outputs
    ok = dropped.count() == justified.count()
    return spark.range(1).select(
        F.lit(n_viol).cast("long").alias("n_survivor_violations"),
        F.lit(ok).alias("drops_justified"),
    )


def q_leakage_safe_split_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invariant gate for the near-dup-aware split: over the capped corpus,
    ZERO exact char-3-gram near-dup pairs (J >= 0.6) straddle the
    train/test boundary, every document is assigned exactly once, and both
    splits are non-empty. Oracle: the constant expectation (one row)."""
    from ..operators.curation import leakage_safe_split

    d = _docs(spark, sf_dir).filter((F.col("doc_id") < 200) & (F.length("text") >= 3))
    pairs = DD.ngram_jaccard_exact(d, n=3, threshold=0.6)
    out = leakage_safe_split(d, pairs, test_fraction=0.2)
    sides = out.select("doc_id", "split")
    straddling = (
        pairs.join(sides.withColumnRenamed("doc_id", "id_a").withColumnRenamed("split", "s_a"), "id_a")
        .join(sides.withColumnRenamed("doc_id", "id_b").withColumnRenamed("split", "s_b"), "id_b")
        .filter(F.col("s_a") != F.col("s_b"))
        .count()
    )
    n_docs, n_assigned = d.count(), sides.count()
    n_test = sides.filter(F.col("split") == "test").count()
    return spark.range(1).select(
        F.lit(straddling).cast("long").alias("n_straddling_pairs"),
        F.lit(n_assigned == n_docs).alias("all_assigned_once"),
        F.lit(0 < n_test < n_docs).alias("both_sides_nonempty"),
    )


def q_winnow_overlap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint overlap pairs (MOSS-style boilerplate /
    plagiarism detection): char-20-gram Karp-Rabin hashes, window-8 minima
    selected, pairs sharing >= 3 fingerprints with the containment estimate.
    k=20 keeps fingerprints discriminative on the template-generated
    fixture (k=8 matched half of all pairs through shared vocabulary).
    The rolling hash is pure codepoint arithmetic, so the DuckDB oracle
    reproduces every fingerprint bit-exact with list comprehensions."""
    d = _docs(spark, sf_dir)
    return DD.winnow_overlap_pairs(d, k=20, w=8, min_shared=3)


def q_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-table pipeline: build the deterministic dense-id vocabulary
    (two-phase distributed id assignment — no single-reducer window, no RDD
    zipWithIndex), encode every document as its token-id sequence, emit the
    exploded (doc_id, pos, token_id) rows. min_count=300 sits near the
    fixture's median token count, so roughly half the vocabulary drops and
    the OOV path is genuinely exercised (the template corpus has no hapax
    tokens — min count 12)."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    vocab = TX.build_vocab(d, min_count=300)
    enc = TX.encode_docs(d, vocab)
    return enc.select(
        "doc_id", F.posexplode("token_ids").alias("pos", "token_id")
    )


def q_dedup_passages_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-8 ExactSubstr-style passage dedup: every 10-token window whose
    exact sequence occurs >= 2 times across the capped corpus is masked
    out of every document (union of covered positions; kept tokens
    re-joined with single spaces). The oracle classifies windows by their
    RAW token string where the Spark side uses xxhash64 — identical
    outcomes absent a 64-bit collision. Pure codegen: window explode is
    the shingle pattern, the dup census one narrow shuffle."""
    from ..operators.curation import dedup_passages

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    return dedup_passages(d, window=10, min_count=2)


def q_decontaminate_passages_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-9 passage-level benchmark decontamination: docs < 200 are the
    training slice, docs 200-299 the 'evaluation corpus'; every 10-token
    window the two share (the fixture's template corpus repeats passages
    across docs) is masked out of the TRAINING docs — a single eval
    occurrence masks, unlike ``dedup_passages_docs``' >= 2 census. The
    oracle classifies windows by raw token string where the Spark side
    uses xxhash64 — identical outcomes absent a 64-bit collision."""
    from ..operators.curation import decontaminate_passages

    d = _docs(spark, sf_dir)
    train = d.filter(F.col("doc_id") < 200)
    holdout = d.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 300))
    return decontaminate_passages(train, holdout, window=10)


def q_dedup_lines_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition removal over a synthetic repeated-line
    payload (built deterministically from each doc's text: prefix, repeated
    boilerplate, prefix again): repeated lines drop, first-occurrence order
    is preserved."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    prefix = F.substring("text", 1, 30)
    synth = F.concat_ws(
        "\n", prefix, F.lit("boilerplate footer"), prefix, F.lit("boilerplate footer"), F.substring("text", 31, 30)
    )
    # materialize synth + cleaned once — dedup_lines is O(lines²) per doc,
    # so inlining it twice in one projection would double the work
    return (
        d.select("doc_id", synth.alias("__synth"))
        .select("doc_id", "__synth", TX.dedup_lines(F.col("__synth")).alias("cleaned"))
        .select(
            "doc_id",
            "cleaned",
            F.size(F.split(F.col("__synth"), r"\n")).alias("n_lines_in"),
            F.size(F.split("cleaned", r"\n")).alias("n_lines_out"),
        )
    )


def q_top_ngram_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signal: per doc, the fraction of word
    2-grams taken by the most frequent 2-gram (loop-spam detector)."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    return d.select("doc_id", TX.top_ngram_fraction("text", 2).alias("top2_frac"))


def q_heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy-hitter terms over the corpus vocabulary: Misra-Gries
    candidate sweep (no shuffle) + exact count verify — the result equals a
    plain GROUP BY ... HAVING, which is exactly what the oracle runs."""
    from ..operators.aggregates import heavy_hitters

    tok = (
        _docs(spark, sf_dir)
        .select(F.explode(TX.tokens(F.lower(F.col("text")))).alias("term"))
        .filter(F.length("term") > 0)
    )
    return heavy_hitters(tok, "term", support=0.02)


def q_redact_pii_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over a per-doc synthetic payload (deterministic email /
    IP / card / phone built from the doc id) concatenated with a real text
    prefix — exercises every pattern in the chain plus pass-through of
    ordinary prose, all inside one codegen'd projection."""
    from ..operators.curation import redact_pii

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    synth = F.concat_ws(
        " ",
        F.lit("contact"),
        F.concat(F.lit("user"), F.col("doc_id").cast("string"), F.lit("@example.com")),
        F.lit("ip 10.0.0.1 card 4111 1111 1111 1111 tel +1 555-123-4567 end"),
        F.substring("text", 1, 40),
    )
    return d.select("doc_id", redact_pii(synth).alias("redacted"))


# ----------------------------------------------------------- multimodal ----

def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: docs → opaque payloads → Arrow-batched
    mapInPandas 'decode' (stubbed deterministically) → feature rows."""
    # NOT spread: fan-out to 32 partitions spawns 32 Python workers whose
    # startup dwarfs the (trivial) per-row decode at this corpus size —
    # measured 4 s → 16 s. One Arrow-batched worker streams 5 k rows fine.
    media = MM.documents_as_media(_docs(spark, sf_dir))
    feats = MM.featurize(media, feature_dim=4)
    return feats.select(
        "media_id",
        "n_bytes",
        F.col("feature")[0].alias("f_len"),
        F.col("feature")[1].alias("f_first"),
        F.col("feature")[2].alias("f_last"),
        F.col("feature")[3].alias("f_mod"),
    )


# ------------------------------------------------------ sequence packing ----

def q_sequence_packing_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invariant gate for greedy sequence packing (round-5 verdict item 7):
    over the packed output of the documents table at a 64-token budget,
    (1) every document lands in exactly one pack (assignment count ==
    distinct count == corpus size), (2) token mass is conserved (sum of
    pack sizes == sum of per-doc whitespace token counts), (3) no
    MULTI-doc pack exceeds the budget, and (4) oversize documents are
    quarantined into single-doc packs whose count matches the corpus'
    oversize-doc count. The oracle recomputes (1), (2), (4) from the raw
    documents table in DuckDB; (3) is the constant expectation 0."""
    from ..operators.curation import pack_sequences

    budget = 64
    d = _docs(spark, sf_dir)
    packed = pack_sequences(d, max_tokens=budget)
    # the two grains (per-bin stats, exploded per-doc distinct) combine via
    # unionByName + a max-ignores-nulls fold — NOT a 1-row crossJoin, which
    # Catalyst plans as a BNLJ and would land this query on the plan
    # audit's red-flag list next to the documented oracle tiers
    bin_stats = packed.agg(
        F.sum("n_docs").cast("long").alias("n_docs_assigned"),
        F.sum("n_tokens").cast("long").alias("total_tokens_packed"),
        F.sum(((F.col("n_tokens") > budget) & (F.col("n_docs") > 1)).cast("long"))
        .cast("long")
        .alias("n_multi_doc_over_budget"),
        F.sum((F.col("n_tokens") > budget).cast("long")).cast("long").alias("n_oversize_bins"),
        F.lit(None).cast("long").alias("n_docs_distinct"),
    )
    doc_stats = (
        packed.select(F.explode("doc_ids").alias("doc_id"))
        .agg(F.count_distinct("doc_id").cast("long").alias("n_docs_distinct"))
        .select(
            F.lit(None).cast("long").alias("n_docs_assigned"),
            F.lit(None).cast("long").alias("total_tokens_packed"),
            F.lit(None).cast("long").alias("n_multi_doc_over_budget"),
            F.lit(None).cast("long").alias("n_oversize_bins"),
            "n_docs_distinct",
        )
    )
    merged = bin_stats.unionByName(doc_stats)
    return merged.agg(*[F.max(c).alias(c) for c in merged.columns])


def q_semantic_incremental_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equivalence gate for incremental semantic dedup (round 6): split the
    embeddings table at the median id into a landed corpus and an ingest
    batch, run the batch through ``semantic_dedup_incremental`` against the
    corpus' store rows, and assert its survivors are EXACTLY the batch's
    share of a full ``semantic_dedup`` over the combined corpus with the
    same frozen centroids — and that the gate is non-vacuous (some batch
    vectors are actually dropped at the threshold). Oracle: the constant
    expectation (one row)."""
    from ..operators.curation import (
        semantic_dedup,
        semantic_dedup_incremental,
        semantic_store_rows,
    )
    from ..operators.similarity import train_ivf_centroids

    thr = 0.4  # same near-isotropic-fixture threshold as semantic_dedup_gate
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    n = e.count()
    corpus = e.filter(F.col("vec_id") < n // 2)
    batch = e.filter(F.col("vec_id") >= n // 2)
    cents = train_ivf_centroids(
        e.select(F.col("vec_id").alias("id"), "embedding"), n_lists=8
    )
    store = semantic_store_rows(corpus, cents)
    inc = {
        r["vec_id"]
        for r in semantic_dedup_incremental(batch, store, cents, threshold=thr).collect()
    }
    combined = semantic_dedup(e, threshold=thr, centroids=cents)
    batch_share = {
        r["vec_id"] for r in combined.filter(F.col("vec_id") >= n // 2).collect()
    }
    n_batch = batch.count()
    return spark.range(1).select(
        F.lit(inc == batch_share).alias("matches_combined_batch_dedup"),
        F.lit(len(inc) < n_batch).alias("batch_drops_nonvacuous"),
        F.lit(len(inc) > 0).alias("survivors_nonempty"),
    )


def q_mixture_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixture sample of ``documents``: weights
    src0:3 / src1:1 / src2:1 over a 2000-token budget → per-domain targets
    1200/400/400, filled in md5-hash order (``curation.sample_token_mixture``
    — the scale-safe two-phase path). The DuckDB oracle re-derives the
    identical selection as a plain window cumulative sum, so every surviving
    (doc_id, source, n_toks) row hash-matches."""
    from ..operators.curation import _mixture_tok, sample_token_mixture

    d = _docs(spark, sf_dir)
    sampled = sample_token_mixture(
        d, {"src0": 3.0, "src1": 1.0, "src2": 1.0}, 2000
    )
    return sampled.select(
        "doc_id", "source", _mixture_tok(None, "text").alias("n_toks")
    )


def q_mixture_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ordered mixture sample: same three-domain weights/budget as
    ``mixture_sample_docs`` but each domain takes its LONGEST documents
    first (order by ``-n_chars``; md5 tie-break) — exercising
    ``sample_token_mixture_ordered``'s value-range-bucketed fill. The
    DuckDB oracle is the straight window ordered the same way."""
    from ..operators.curation import _mixture_tok, sample_token_mixture_ordered

    d = _docs(spark, sf_dir).withColumn("neg_chars", -F.col("n_chars"))
    sampled = sample_token_mixture_ordered(
        d, {"src0": 3.0, "src1": 1.0, "src2": 1.0}, 2000, "neg_chars"
    )
    return sampled.select(
        "doc_id", "source", _mixture_tok(None, "text").alias("n_toks")
    )


def q_boilerplate_lines_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate line removal (CCNet-style): multi-line
    docs are synthesized from the fixtures (same trick as
    ``dedup_lines_docs``) with a legal-footer line planted in every doc
    and a per-doc unique line; ``curation.drop_boilerplate_lines`` must
    strip exactly the ubiquitous footer from every document."""
    from ..operators.curation import drop_boilerplate_lines

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    synth = d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.substring("text", 1, 30),
            F.lit("standard legal footer all rights reserved"),
            F.substring("text", 31, 30),
            F.concat(F.lit("unique line of doc "), F.col("doc_id").cast("string")),
        ).alias("synth"),
    )
    out = drop_boilerplate_lines(
        synth, text_col="synth", id_col="doc_id", min_docs=10
    )
    return out.select(
        "doc_id",
        F.col("clean_text"),
        F.col("n_lines_in").cast("int").alias("n_lines_in"),
        F.col("n_lines_out").cast("int").alias("n_lines_out"),
    )


def q_nb_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-9 binary Naive Bayes classifier (the fastText-style
    quality/language gate of CCNet-class pipelines, closed-form): train on
    the documents corpus with label = (lang = 'en'), score the SAME corpus
    — (doc_id, n_tokens, score_micros) in engine-exact integer micro-nats
    (per-token-type quantization before any sum, the LM scorers' float
    audit), so the full train + score round-trips the DuckDB oracle
    hash-exactly."""
    d = _docs(spark, sf_dir)
    labeled = d.withColumn("__is_en", (F.col("lang") == "en").cast("int"))
    model = TX.nb_train(labeled, "__is_en")
    return TX.nb_score(d, model)


def q_nb_lang_multiclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-9 multiclass Naive Bayes language-ID: train on the documents
    corpus with its own ``lang`` labels (5 classes), classify the same
    corpus — (doc_id, n_tokens, pred_label, score_micros) with integer
    micro-nat scores and an ascending-label tie-break, hash-exact against
    the DuckDB oracle's full train + argmax recompute."""
    d = _docs(spark, sf_dir)
    model = TX.nb_train_multiclass(d, "lang")
    return TX.nb_classify(d, model)


def q_top_fraction_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-9 exact top-fraction pruning: keep the top 25% of documents
    per language by token count — rank semantics with the (score DESC,
    id ASC) tie-break, so the kept set is engine-exact even through the
    fixture's heavy token-count ties. Round 10: routed through
    ``top_fraction_approx`` — ``lang`` is exactly the few-groups shape
    whose exact-window form serializes each group through one reducer at
    scale; the approx form keeps the IDENTICAL kept-set contract (the
    oracle still re-ranks bit-exact) while sorting only the boundary
    band."""
    from ..operators.curation import top_fraction_approx

    d = _docs(spark, sf_dir)
    toks = F.filter(TX.tokens(F.col("text")), lambda t: F.length(t) > 0)
    scored = d.select(
        "doc_id", "lang", F.size(toks).cast("long").alias("n_tokens")
    )
    return top_fraction_approx(scored, "n_tokens", 0.25, by="lang")


def q_hopping_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-9 §2.9: hopping (sliding) window aggregation — 1-hour windows
    hopping every 30 minutes per event_type; each event lands in exactly 2
    overlapping windows (the smoothing twin of ``tumbling_events``)."""
    from ..operators.window_ops import hopping_agg
    from ..sources.readers import load_star

    ev = load_star(spark, sf_dir, ("events",))["events"]
    return hopping_agg(ev, "ts", "1 hour", "30 minutes", group_extra=["event_type"])


def q_normalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-9 ingest-front text canonicalization: NFC normalization +
    control/format-char strip over the documents corpus. The fixture text
    is ASCII so both engines see a fixpoint — the hash compare pins the
    no-op contract (normalization must never perturb already-canonical
    text); the unicode-active cases are pinned against Python's
    unicodedata ground truth in ``tests/test_text.py``."""
    d = _docs(spark, sf_dir)
    from ..functions.text import normalize_text

    return normalize_text(d.select("doc_id", "text"), "text")


def q_entropy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-9 character-diversity quality signal: Shannon char entropy in
    engine-exact integer micro-bits plus the distinct-codepoint count, per
    document. Map-only / zero-shuffle (higher-order functions over the text
    column, whole-stage codegen); the DuckDB twin quantizes each
    ``-p*log2(p)`` term identically before summing, so the value hash is
    exact. The low-entropy tail (repeated-char spam) is what a quality
    pipeline drops."""
    d = _docs(spark, sf_dir)
    from ..functions.text import char_entropy_microbits, distinct_char_count

    return d.select(
        "doc_id",
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long").alias("n_chars_calc"),
        distinct_char_count("text").alias("distinct_chars"),
        char_entropy_microbits("text").alias("entropy_microbits"),
    )


def q_shard_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-9 training-export sharding contract: every document's shard
    assignment (md5-fold mod 8 — deterministic, map-only) and its position
    in the shard's md5 pseudo-shuffle order (exactly the on-disk row order
    ``sources/writers.write_shards`` produces). The DuckDB twin recomputes
    the identical hex fold and window, so the hash compare pins both the
    assignment and the full shuffle permutation."""
    from ..operators.curation import shard_manifest

    return shard_manifest(_docs(spark, sf_dir), 8)


def q_sparse_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-9 sparse-vector similarity: TF-IDF cosine top-5 neighbors per
    document through the inverted-index join (df-capped at 100 — the
    stop-term cap is part of the contract, applied identically in the
    DuckDB twin). Integer-quantized IDF keeps every sum exact; the final
    cosine uses only IEEE-exact ops, so the hash compare pins the full
    neighbor ranking."""
    from ..operators.similarity import sparse_cosine_topk

    return sparse_cosine_topk(_docs(spark, sf_dir), k=5, max_df=100)


_SPARSE_IDX_BUILT: set = set()  # (process-lifetime) fixture dirs already indexed


def _sparse_idx(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process per fixture dir) the shared TF-IDF index the
    sparse catalog rows search: corpus slice doc_id >= 100, df cap 100.
    LAZY and memoized (round-9 review: a module-import mkdtemp leaked one
    dir per run unbounded, and the cosine + BM25 rows each rebuilt the
    identical index per bench rep). The root is a per-UID 0700 directory —
    not a predictable world-shared /tmp name another user could occupy or
    plant a backup under; fixtures are immutable, so reuse is sound."""
    import hashlib
    import os
    import stat
    import tempfile

    from ..operators.similarity import build_tfidf_index

    root = os.path.join(tempfile.gettempdir(), f"spark_graft_idx_{os.getuid()}")
    os.makedirs(root, mode=0o700, exist_ok=True)
    st = os.stat(root)
    if st.st_uid != os.getuid() or stat.S_IMODE(st.st_mode) & 0o077:
        # the per-uid name is occupied by someone else (or loosely
        # permissioned): fall back to a fresh private dir for this process
        root = tempfile.mkdtemp(prefix="spark_graft_idx_")
    idx = os.path.join(
        root, "idx_" + hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    )
    if idx not in _SPARSE_IDX_BUILT:
        d = _docs(spark, sf_dir)
        build_tfidf_index(d.filter(F.col("doc_id") >= 100), idx, max_df=100)
        _SPARSE_IDX_BUILT.add(idx)
    return idx


def q_sparse_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-9 persisted sparse search e2e: build the TF-IDF index over the
    corpus slice (doc_id >= 100, df-capped at 100), then search the query
    slice (doc_id < 100) against it — queries weighted under the index's
    FROZEN idf, ranked by the engine-exact integer cosine. The DuckDB twin
    recomputes the identical frozen pipeline inline, so the hash pins the
    build→persist→search round-trip, not just the math."""
    from ..operators.similarity import sparse_topk_search

    d = _docs(spark, sf_dir)
    idx = _sparse_idx(spark, sf_dir)
    return sparse_topk_search(d.filter(F.col("doc_id") < 100), spark, idx, k=5)


def q_bm25_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-9 BM25 ranked retrieval over the persisted sparse index:
    query slice (doc_id < 100) against the corpus slice (>= 100), k1=1.2 /
    b=0.75, top-5. Every (query-term, doc) contribution quantizes to a
    BIGINT before summing, so the output score_milli carries NO float —
    the DuckDB twin recomputes the identical frozen pipeline with the same
    operation order and explicit DOUBLE constants."""
    from ..operators.similarity import sparse_topk_search

    d = _docs(spark, sf_dir)
    idx = _sparse_idx(spark, sf_dir)
    return sparse_topk_search(d.filter(F.col("doc_id") < 100), spark, idx, k=5, scheme="bm25")


def q_jaccard_join_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-10 prefix-filtered EXACT Jaccard join (AllPairs/PPJoin): word
    3-shingle set similarity at J >= 0.6 over the full fixture corpus —
    the feature with the skewed document-frequency universe prefix
    filtering needs (the fixture's char-3-gram universe is 377 grams
    total, where NO exact algorithm can prune). The DuckDB
    oracle recomputes ALL pairs (the unpruned quadratic form), so the
    hash compare IS the prefix lemma's completeness proof at driver
    strength: one dropped candidate = one missing row = mismatch. Output
    is pure BIGINTs (intersection + both set sizes; the threshold cut is
    exact integer arithmetic)."""
    from ..operators.dedup import jaccard_join_prefix

    # NO corpus cap: the prefix-filtered side is the scale path (no N² in
    # the plan); the all-pairs cost lives in the ORACLE, bounded at
    # fixture scale like every exact-truth side here
    return jaccard_join_prefix(_docs(spark, sf_dir), threshold=0.6)


def q_corpus_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-10 dataset-card profile: per-(lang, source) docs / token mass
    / char mass / largest doc — the exact-integer summary mixture weights
    and cap policies are derived from."""
    from ..plans.quality import corpus_stats

    return corpus_stats(_docs(spark, sf_dir))


def q_pmi_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-10 PMI collocation pairs: unordered token pairs co-occurring
    within 5 positions across the corpus, min_count=5, PMI quantized to
    integer milli-nats — counts are exact BIGINTs from one groupBy, so
    the DuckDB recompute is hash-exact."""
    return TX.pmi_pairs(_docs(spark, sf_dir), window=5, min_count=5)


def q_top_fraction_corpus_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-10 corpus-wide scored cut: keep the top 10% of ALL documents
    by token count through ``top_fraction_approx``'s by=None mode — the
    exact shape whose one-window exact form serializes the whole corpus
    through a single reducer. The kept set stays EXACT (ceil(n*frac),
    (score DESC, id ASC) tie-break), so DuckDB re-ranks bit-exact."""
    from ..operators.curation import top_fraction_approx

    d = _docs(spark, sf_dir)
    toks = F.filter(TX.tokens(F.col("text")), lambda t: F.length(t) > 0)
    scored = d.select("doc_id", F.size(toks).cast("long").alias("n_tokens"))
    return top_fraction_approx(scored, "n_tokens", 0.1, by=None)


def q_bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-11 driver-strength BPE row (round-10 verdict item 1): apply
    the FROZEN merge table (``catalog.fixtures_bpe.BPE_MERGES``, trained
    once at sf0.001 — determinism pinned by ``tests/test_bpe_oracle.py``)
    to every document. The DuckDB oracle replays the same table with a
    recursive CTE over merge ranks, so the value-hash checks the merge
    replay itself end-to-end — this was the only catalog family with no
    DuckDB hash anywhere. Pieces ship space-joined (symbols never contain
    whitespace) so the compare stays on scalar columns."""
    from .fixtures_bpe import BPE_MERGES

    enc = TX.bpe_encode(_docs(spark, sf_dir), BPE_MERGES)
    return enc.select(
        "doc_id",
        F.concat_ws(" ", "pieces").alias("pieces_str"),
        F.col("n_pieces"),
    )


def _url_mod(n_docs: int) -> int:
    """The corpus-scaled modulus for ``_synthetic_url``: ~n/4, rounded
    down to a multiple of 140 (lcm of the source cycle 20 and the suffix
    arm 7 — see the alias-class argument in ``_synthetic_url``), floored
    at 140. The SQL twin is ``oracles._URL_MOD_SQL``."""
    return 140 * max((n_docs // 4) // 140, 1)


def _synthetic_url(mod: int) -> "F.Column":
    """The deterministic (source, doc_id)->URL derivation shared by the
    domain-tier queries (the fixtures carry no URL column) — deliberately
    messy so canonicalization has work to do: mixed case, www., multipart
    suffix arm, default port, path key with a trailing-slash variant,
    unsorted query with tracking params, fragment. ONE copy on the Spark
    side (here) and one on the SQL side (oracles._URL_DERIVE_SQL): the two
    must stay in lockstep or the domain-tier hash rows diverge.

    ``mod`` is the path/id-key modulus — callers pass ``_url_mod(n_docs)``
    (the oracle derives the same value via a scalar count(*) subquery),
    so the distinct-canonical count GROWS ~n/4 with the corpus instead of
    saturating at a fixed toy space (round-14, verdict r13 item 4: the
    old ``doc_id % 50`` capped the driver rows at ~200 canonicals at
    every SF). The modulus is a multiple of 140 = lcm(source cycle 20,
    suffix arm 7), so the ~4 ids sharing a key (i, i+mod, i+2·mod,
    i+3·mod) also share source and suffix arm — i.e. the SAME canonical
    — while still differing across the case/www/port/slash/fragment/
    tracking arms, all of which canonicalization must strip for the
    class to collapse. Two of the four ids land in each half of the id
    range, which keeps the keeper query's cross-median re-crawl
    structure."""
    did = F.col("doc_id")
    k = (did % int(mod)).cast("string")
    return F.concat(
        F.lit("HTTPS://"),
        F.when(did % 11 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.when(did % 2 == 0, F.upper("source")).otherwise(F.col("source")),
        F.when(did % 7 == 0, F.lit(".Example.CO.UK")).otherwise(F.lit(".Example.COM")),
        F.when(did % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/d/"), k,
        F.when(did % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=feed&z=9&id="), k, F.lit("&a=1"),
        F.when(did % 5 == 0, F.lit("#sec2")).otherwise(F.lit("")),
    )


def q_domain_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-11 domain-tier driver row (round-10 verdict item 7): derive a
    deterministic URL for every document (the fixture tables carry no URL
    column, so both sides synthesize the SAME one from (source, doc_id) —
    deliberately messy: mixed case, www., default port, trailing slash,
    unsorted query with tracking params, fragment), then profile the
    corpus per host via ``operators.domains.domain_stats``. The value-hash
    therefore checks host extraction, registered-domain (incl. the
    co.uk multipart branch via the doc_id%7 arm) AND full URL
    canonicalization (n_urls counts distinct canonical forms — the
    corpus-scaled path key makes aliases collapse across port/slash/
    fragment/tracking variants while the canonical count grows ~n/4
    with the corpus; see ``_synthetic_url``)."""
    from ..operators.domains import domain_stats

    d = _docs(spark, sf_dir)
    return domain_stats(
        d.withColumn("url", _synthetic_url(_url_mod(d.count())))
    )


def q_url_keeper_merge_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-12 rotated row for the canonical-URL keeper store's MERGE
    view: split ``documents`` at the median id into two sequential ingest
    batches (the corpus-scaled path key gives every batch-1 canonical a
    batch-2 re-crawl — ids i and i+2·mod share a key across the median,
    see ``_synthetic_url``), run batch 2 through ``url_keeper_gate`` against
    batch 1's keeper rows, and return the merged last-writer view. The
    DuckDB twin replays the whole contract relationally: keeper_id = the
    FIRST batch's lowest id per canonical (stable across updates), fp =
    the latest batch's representative content fingerprint. The value-hash
    therefore checks alias collapse, keeper stability and CDC fp
    advancement in one row set."""
    from ..operators.domains import url_keeper_gate, url_keeper_merge, url_keeper_rows

    d = _docs(spark, sf_dir)
    n = d.count()
    d = d.withColumn("url", _synthetic_url(_url_mod(n)))
    b1 = d.filter(F.col("doc_id") < n // 2)
    b2 = d.filter(F.col("doc_id") >= n // 2)
    rows1 = url_keeper_rows(b1, batch_seq=1)
    _new, _upd, append2, _dropped = url_keeper_gate(b2, rows1, batch_seq=2)
    return url_keeper_merge(rows1.unionByName(append2)).select(
        "canonical_url", "keeper_id", "fp"
    )


def q_url_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-11 rotated row for URL-canonical exact dedup: the same
    deterministic URL derivation as ``domain_stats_docs`` (aliases across
    case/www/port/slash/fragment/tracking variants), grouped by canonical
    form — (canonical_url, n_copies, keeper_id), the exact_dedup_groups
    contract on URL identity. The DuckDB twin re-derives and re-canonicalizes
    from scratch, so the hash checks alias collapse end to end."""
    from ..operators.domains import url_dedup_groups

    d = _docs(spark, sf_dir)
    return url_dedup_groups(
        d.withColumn("url", _synthetic_url(_url_mod(d.count())))
    )
