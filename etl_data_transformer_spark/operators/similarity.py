"""Similarity search over embedding columns (SURVEY.md §2.10).

Three tiers, trading recall for scale:

1. ``brute_force_topk`` — exact cosine top-k via crossJoin + window. O(Q·N);
   the correctness oracle. Fine when the query side is small (it is
   broadcast), never for N×N at 100 TB.
2. ``lsh_topk`` — MLlib ``BucketedRandomProjectionLSH`` approximate join:
   hash both sides into buckets, join within buckets only. The 100 TB path
   for N×N-ish workloads.
3. ``ivf_topk`` — IVF-style coarse quantization: assign every vector to its
   nearest of k random-projection centroids (deterministic, seeded), search
   only the probe-closest partitions. A pure-DataFrame scale path with no
   MLlib dependency.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine, dot


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "neighbor_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query side against the
    corpus, rank per query by similarity (ties broken by neighbor id).

    ``queries``/``corpus``: (id, embedding) frames; returns
    (query_id, neighbor_id, rank).
    """
    # NOTE on a tried-and-rejected optimization: pre-normalizing both sides
    # so the per-pair work is one dot (not dot + two norms) measured SLOWER
    # at sf0.1 — without a barrier Catalyst collapses the normalize into the
    # join (re-evaluated per pair), and with an exchange barrier the shuffle
    # overhead exceeds the saved interpreted work (1.09s -> 1.36s). Revisit
    # only if the bounded Q·N here ever grows past ~10^6 pairs.
    q = queries.select(F.col("id").alias(query_id), F.col("embedding").alias("q_emb"))
    c = corpus.select(F.col("id").alias(corpus_id), F.col("embedding").alias("c_emb"))
    pairs = c.join(F.broadcast(q), F.lit(True), "inner")
    if exclude_self:
        pairs = pairs.filter(F.col(query_id) != F.col(corpus_id))
    scored = pairs.select(
        query_id,
        corpus_id,
        cosine("q_emb", "c_emb").alias("sim"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("sim").desc(), F.col(corpus_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "rank")
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k via MLlib BucketedRandomProjectionLSH (the 100 TB
    path: candidate generation is a bucket equi join, not a cross join).

    Euclidean-distance LSH; on unit-normalized vectors Euclidean ranking ==
    cosine ranking (d² = 2 - 2·cos). Normalization is the shared
    ``vector.unit_normalize`` (hoisted norm, zero-norm vectors stay zeros
    instead of producing NULL elements that crash ``array_to_vector``).
    ``exclude_self`` drops id-equal pairs — turn OFF when query and corpus
    id spaces are unrelated but overlap (a coinciding id would otherwise
    silently delete a genuine neighbor; round-6 review)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.linalg import VectorUDT  # noqa: F401 — documents the dependency

    from ..functions.vector import unit_normalize

    def prep(df: DataFrame, id_alias: str) -> DataFrame:
        return df.select(
            F.col("id").alias(id_alias),
            array_to_vector(unit_normalize("embedding")).alias("features"),
        )

    qdf = prep(queries, "query_id")
    cdf = prep(corpus, "neighbor_id")
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(cdf)
    joined = model.approxSimilarityJoin(qdf, cdf, float("inf"), distCol="dist")
    flat = joined.select(
        F.col("datasetA.query_id").alias("query_id"),
        F.col("datasetB.neighbor_id").alias("neighbor_id"),
        F.col("dist"),
    )
    if exclude_self:
        flat = flat.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("neighbor_id").asc())
    return (
        flat.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_lists: int = 8,
    sample_cap: int = 4096,
    n_iters: int = 12,
    seed: int = 42,
) -> list[list[float]]:
    """Train IVF coarse centroids: deterministic corpus sample to the driver,
    Lloyd's k-means in numpy, centroids returned for broadcast as literals.

    This is the standard IVF shape at scale (FAISS-style): training runs on a
    bounded sample driver-side (or a parameter server), only the *assignment*
    is distributed. The sample is selected by a hash of the id — stable
    across partitioning and retries, unlike ``DataFrame.sample``.
    """
    import numpy as np

    n = corpus.count()
    step = max(1, n // sample_cap)
    sampled = (
        corpus.filter(F.pmod(F.xxhash64(F.col("id")), F.lit(step)) == 0)
        .select("id", "embedding", F.xxhash64(F.col("id")).alias("__h"))
        # order by the HASH for the truncating limit: ordering by id kept
        # only the lowest ids once the filter passed > sample_cap rows,
        # systematically excluding recent (high-id) vectors from training
        # (round-6 review); the hash order is deterministic AND unbiased,
        # and stable for bit-identical kmeans (id tiebreak)
        .orderBy("__h", "id")
        .limit(sample_cap)
        .collect()
    )
    if not sampled:
        raise ValueError(
            "train_ivf_centroids: corpus is empty (or fully filtered out) — "
            "cannot train coarse centroids on zero vectors"
        )
    x = np.array([r["embedding"] for r in sampled], dtype=np.float64)
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)]
    for _ in range(n_iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(len(cents)):
            m = x[assign == j]
            if len(m):
                cents[j] = m.mean(axis=0)
    return [[float(v) for v in c] for c in cents]


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_lists: int = 8,
    n_probes: int = 3,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF ANN: bucket corpus by nearest trained centroid (L2); each query
    probes its ``n_probes`` closest lists (multi-probe recovers recall on
    weakly-clustered data). Assignment and probe selection are the SHARED
    ``ivf_assign`` / ``_ivf_probes_*`` kernels, so this one-shot form
    inherits the >= 32-list Arrow BLAS auto-switch (it previously inlined
    a third copy of the interpreted fold that never got the fast path —
    round-6 review). ``exclude_self`` as in ``lsh_topk``."""
    if centroids is None:
        centroids = train_ivf_centroids(corpus, n_lists=n_lists, seed=seed)

    c = ivf_assign(corpus, centroids).select(
        F.col("id").alias("neighbor_id"),
        F.col("embedding").alias("neighbor_id_emb"),
        F.col("list_id").cast("long").alias("list_id"),
    )
    use_arrow = len(centroids) >= 32
    q = (_ivf_probes_arrow if use_arrow else _ivf_probes_expr)(
        queries, centroids, n_probes
    )
    pairs = q.join(c, "list_id")
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine("query_id_emb", "neighbor_id_emb").alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: list[list[float]],
    id_col: str = "id",
    quantize: bool = False,
    arrow: bool | None = None,
) -> DataFrame:
    """(id, embedding, list_id): nearest-centroid assignment of each vector —
    the build (and INCREMENTAL append) step of a persisted IVF index. New
    ingest batches are assigned against the frozen centroids and appended;
    no retraining, no touching existing index rows.

    Two execution paths for the argmin-over-centroids:

    - **JVM expressions** (``arrow=False``): one interpreted
      ``aggregate``/``zip_with`` fold per centroid — no Python workers, but
      cost grows with ``n_lists × dim`` per row.
    - **Arrow matmul** (``arrow=True``): ``mapInPandas`` with ONE BLAS
      matmul per Arrow batch (``argmin(|c|² − 2·X·Cᵀ)`` — the FAISS coarse
      scoring shape). Measured 9.8s → 2.0s on 20k × 64-dim vectors at 80
      lists; real IVF deployments run thousands of lists, where the
      interpreted-fold path is not viable.

    ``arrow=None`` (default) auto-selects the matmul at ``>= 32`` lists
    (the measured crossover region — below it the Python-worker startup
    outweighs the fold savings). Float caveat: the two paths order
    distances with different roundings, so a vector near-exactly
    equidistant from two centroids may assign differently — harmless for
    an approximate index; pinned identical on the fixtures by
    ``tests/test_similarity.py``. Embeddings must be non-null.

    ``quantize=True`` additionally stores symmetric-int8 ``codes``
    (tinyint array — 4x smaller than the float32 embedding) and the
    per-vector dequantization ``scale``: the coarse-scoring columns for
    ``ivf_search(rerank_quantized=True)``. Parquet column pruning then lets
    the probe scan read ONLY (id, codes, list_id) — the ~4x probed-IO cut
    at corpus scale — while the full ``embedding`` column is fetched just
    for the re-ranked candidates. Quantization always runs as JVM
    expressions (one rounding semantics, both paths)."""
    from ..functions.vector import quant_scale, quantize_int8

    if arrow is None:
        arrow = len(centroids) >= 32

    if arrow:
        assigned = _ivf_assign_arrow(vectors, centroids, id_col)
    else:
        def neg_d2(c: list[float]) -> Column:
            return F.aggregate(
                F.zip_with("embedding", F.array(*[F.lit(v) for v in c]), lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
                F.lit(0.0),
                lambda acc, v: acc - v,
            )

        arr = F.array(*[neg_d2(c) for c in centroids])
        assigned = vectors.select(
            F.col(id_col).alias("id"),
            F.col("embedding"),
            F.array_position(arr, F.array_max(arr)).alias("list_id"),
        )
    if not quantize:
        return assigned
    # scale PROJECTED before the quantize lambda captures it (no CSE in
    # higher-order functions: the expression form re-ran the
    # array_max-over-transform scale per element — O(dim²)/row)
    withscale = assigned.select(
        "id", "embedding", "list_id", quant_scale("embedding").alias("scale")
    )
    return withscale.select(
        "id",
        "embedding",
        "list_id",
        F.transform(
            quantize_int8("embedding", F.col("scale")), lambda x: x.cast("tinyint")
        ).alias("codes"),
        "scale",
    )


def _arrow_centroid_ranker(centroids: list[list[float]]):
    """The shared FAISS-style coarse-scoring kernel behind BOTH Arrow IVF
    paths (assignment = top-1, probe selection = top-p): returns
    ``rank(embedding_series, p) -> int64 ndarray (n, p)`` of 1-based
    centroid ids, nearest first. One BLAS matmul per Arrow batch scores
    every centroid (rank by ``|x-c|² == |c|² - 2·x·c``, ``|x|²`` is
    row-constant); the stable argsort keeps the tie-break of the JVM
    expression paths (equal distances → lower centroid index first)."""
    import numpy as np

    cents = np.array(centroids, dtype=np.float64)
    cent_norms = (cents * cents).sum(axis=1)

    def rank(emb_series, p: int):
        x = np.stack(emb_series.to_numpy()).astype(np.float64)
        d = cent_norms[None, :] - 2.0 * (x @ cents.T)
        return np.argsort(d, axis=1, kind="stable")[:, :p] + 1

    return rank


def _ivf_assign_arrow(vectors: DataFrame, centroids: list[list[float]], id_col: str) -> DataFrame:
    """Arrow-batched nearest-centroid assignment — the top-1 case of the
    shared ``_arrow_centroid_ranker`` kernel. argmin ties break on the
    first (lowest) centroid index — the same rule as the JVM path's
    ``array_position`` of the first max."""
    id_type = dict(vectors.dtypes)[id_col]
    emb_type = dict(vectors.dtypes)["embedding"]
    schema = f"id {id_type}, embedding {emb_type}, list_id long"
    rank = _arrow_centroid_ranker(centroids)

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "id": pdf[id_col] if id_col in pdf.columns else pdf["id"],
                    "embedding": pdf["embedding"],
                    "list_id": rank(pdf["embedding"], 1).reshape(-1),
                }
            )

    return vectors.select(F.col(id_col).alias(id_col), "embedding").mapInPandas(
        assign, schema=schema
    )


def _ivf_probes_expr(
    queries: DataFrame, centroids: list[list[float]], n_probes: int
) -> DataFrame:
    """JVM-expression top-``n_probes`` probe selection (the few-lists tier):
    one interpreted ``aggregate``/``zip_with`` fold per centroid per query
    row, ranked with a comparator ``array_sort`` (TimSort — stable, so
    equal distances keep the lower centroid index first, matching the
    Arrow path's stable argsort). Explodes to one row per (query, probe)."""

    def neg_d2(c: list[float]) -> Column:
        return F.aggregate(
            F.zip_with(
                "embedding",
                F.array(*[F.lit(v) for v in c]),
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc - v,
        )

    arr = F.array(*[neg_d2(c) for c in centroids])
    zipped = F.arrays_zip(
        arr.alias("s"),
        F.sequence(F.lit(1), F.lit(len(centroids))).cast("array<long>").alias("i"),
    )
    by_score_desc = F.array_sort(
        zipped,
        lambda l, r: F.when(l["s"] > r["s"], -1).when(l["s"] < r["s"], 1).otherwise(0),
    )
    probes = F.transform(F.slice(by_score_desc, 1, n_probes), lambda x: x["i"])
    return queries.select(
        F.col("id").alias("query_id"),
        F.col("embedding").alias("query_id_emb"),
        F.explode(probes).alias("list_id"),
    )


def _ivf_probes_arrow(
    queries: DataFrame, centroids: list[list[float]], n_probes: int
) -> DataFrame:
    """Arrow-batched top-``n_probes`` probe selection — the top-p case of
    the shared ``_arrow_centroid_ranker`` kernel. The query-side twin of
    ``_ivf_assign_arrow`` — round-5 verdict #4: SCALING.md measured the
    interpreted per-centroid fold "not viable" at thousands of lists for
    assignment, and probe selection is the identical shape run per query
    row."""
    id_type = dict(queries.dtypes)["id"]
    emb_type = dict(queries.dtypes)["embedding"]
    schema = f"query_id {id_type}, query_id_emb {emb_type}, list_id long"
    rank = _arrow_centroid_ranker(centroids)
    p = min(n_probes, len(centroids))

    def probes(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            top = rank(pdf["embedding"], p)
            yield pd.DataFrame(
                {
                    "query_id": pdf["id"].to_numpy().repeat(p),
                    "query_id_emb": pdf["embedding"].to_numpy().repeat(p),
                    "list_id": top.reshape(-1),
                }
            )

    return queries.select("id", "embedding").mapInPandas(probes, schema=schema)


def ivf_index(
    corpus: DataFrame,
    n_lists: int = 8,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    quantize: bool = False,
) -> tuple[list[list[float]], DataFrame]:
    """Build a PERSISTABLE IVF index: (centroids, assignments). Persist the
    assignments with ``.write.partitionBy("list_id").parquet(path)`` (and
    the centroids as a small JSON sidecar) — ``ivf_search`` then reads ONLY
    the probed list partitions, which is the property that makes IVF the
    100 TB tier: search cost scales with probed lists, not corpus size.
    ``ivf_topk`` trains per call; this is its amortized form for a corpus
    that outlives a single query batch."""
    if centroids is None:
        centroids = train_ivf_centroids(corpus, n_lists=n_lists, seed=seed)
    return centroids, ivf_assign(corpus, centroids, quantize=quantize)


def _ivf_coarse_candidates(
    q: DataFrame, pruned: DataFrame, n_cand: int, exclude_self: bool
) -> DataFrame:
    """Phase 1 of the quantized search: coarse-score every probed-list
    vector by cosine against its int8 ``codes`` (scale-invariant, so the
    per-vector scale cancels) and keep the top ``n_cand`` per query.
    Reads ONLY (id, codes, list_id) — the embedding column never appears
    in this subplan (plan-asserted in ``tests/test_similarity.py``). The
    window shuffles (query_id, neighbor_id, qsim) only — carrying the
    query embedding per coarse row would move embedding-width bytes for
    EVERY candidate and undo the IO savings (round-5 review)."""
    coarse_c = pruned.select(
        F.col("id").alias("neighbor_id"),
        F.col("codes").alias("neighbor_codes"),
        F.col("list_id").cast("long").alias("list_id"),
    )
    coarse_pairs = q.join(coarse_c, "list_id")
    if exclude_self:
        coarse_pairs = coarse_pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    wq = Window.partitionBy("query_id").orderBy(
        F.col("qsim").desc(), F.col("neighbor_id").asc()
    )
    return (
        coarse_pairs.select(
            "query_id",
            "neighbor_id",
            cosine("query_id_emb", "neighbor_codes").alias("qsim"),
        )
        .withColumn("qrank", F.row_number().over(wq))
        .filter(F.col("qrank") <= n_cand)
        .select("query_id", "neighbor_id")
    )


def ivf_search(
    queries: DataFrame,
    index: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    n_probes: int = 3,
    rerank_quantized: bool = False,
    rerank_k: int | None = None,
    arrow: bool | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k search against a persisted IVF index (``ivf_index`` /
    ``ivf_assign`` output, any storage): each query probes its ``n_probes``
    closest lists; the union of probed list ids (bounded by ``n_lists``, a
    driver-side scalar set) is pushed as a STATIC filter on the index's
    ``list_id`` partition column, so a partitioned index scan prunes every
    unprobed list before reading a byte. Output matches ``ivf_topk``:
    (query_id, neighbor_id, rank).

    ``rerank_quantized=True`` (requires an index built with
    ``quantize=True``) splits scoring into the FAISS-style two phases:

    1. **coarse** — score every probed-list vector by cosine against its
       int8 ``codes`` (cosine is scale-invariant, so the stored per-vector
       ``scale`` cancels and the codes array scores directly); keep the
       top ``rerank_k`` (default ``4*k``) candidates per query. The probed
       scan reads only (id, codes, list_id) — parquet column pruning cuts
       probed-partition IO ~4x at corpus scale.
    2. **rerank** — full-precision scoring of the surviving candidates
       only. The candidate frame is JOINED into the index scan — nothing
       touches the driver — and the query embeddings arrive by a plain
       shuffled join. An alternative driver-side ``isin`` candidate push
       (collect the ids, push an ``In`` predicate into the parquet
       reader for row-group pruning) was carried through rounds 6-8
       behind a size gate and DELETED in round 9: the round-8 crossover
       sweep found the join 1.1-1.9× faster at every warm batch size from
       20 to 20k queries, and the round-9 cold-store measurement closed
       the one scenario the branch was retained for — against a COLD
       (page-cache-dropped) id-sorted 600k-vector store, forced isin
       still lost to the join (5.9 vs 5.4 s; SCALING.md). The probed-list
       partition filter already prunes the scan to the lists that matter,
       which leaves the In-predicate nothing to win.

    Probe selection auto-switches (``arrow=None``) to the Arrow BLAS matmul
    at ``>= 32`` lists — the same crossover as ``ivf_assign`` — so a
    million-query sweep against a thousands-of-lists index never runs the
    interpreted per-centroid fold per query row. ``tests/test_similarity.py``
    pins Arrow probes == expression probes on the fixture, plus rerank ==
    full-precision ranking and store==direct equivalence."""
    if arrow is None:
        arrow = len(centroids) >= 32

    q = (_ivf_probes_arrow if arrow else _ivf_probes_expr)(queries, centroids, n_probes)
    if arrow:
        # the probe frame is consumed twice (driver-side probed-list collect
        # + the list_id join); an eager localCheckpoint materializes the
        # mapInPandas ONCE so the BLAS matmul and the Arrow round-trip of
        # every query embedding don't run twice (round-6 review). The
        # expression path stays lazy: its recompute is JVM-only and cheap
        # next to a checkpoint of the exploded frame.
        q = q.localCheckpoint(eager=True)
    probed = sorted({r["list_id"] for r in q.select("list_id").distinct().collect()})
    pruned = index.filter(F.col("list_id").isin(probed))
    if rerank_quantized:
        if "codes" not in index.columns:
            raise ValueError(
                "rerank_quantized requires an index built with quantize=True "
                "(missing 'codes' column)"
            )
        n_cand = rerank_k if rerank_k is not None else 4 * k
        if n_cand < k:
            raise ValueError(f"rerank_k={n_cand} must be >= k={k}")
        cands = _ivf_coarse_candidates(q, pruned, n_cand, exclude_self)
        q_emb = queries.select(
            F.col("id").alias("query_id"), F.col("embedding").alias("query_id_emb")
        )
        # phase 2: nothing touches the driver — the candidate frame joins
        # the index scan (runtime bloom filter eligible: inner probe side,
        # key traceable to the scan) and query embeddings arrive by a
        # shuffled join (see the docstring for the deleted isin branch)
        full = pruned.select(
            F.col("id").alias("neighbor_id"),
            F.col("embedding").alias("neighbor_id_emb"),
        )
        scored = (
            cands.join(full, "neighbor_id")
            .join(q_emb, "query_id")
            .select(
                "query_id",
                "neighbor_id",
                cosine("query_id_emb", "neighbor_id_emb").alias("sim"),
            )
        )
    else:
        c = pruned.select(
            F.col("id").alias("neighbor_id"),
            F.col("embedding").alias("neighbor_id_emb"),
            F.col("list_id").cast("long").alias("list_id"),
        )
        pairs = q.join(c, "list_id")
        if exclude_self:
            pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
        scored = pairs.select(
            "query_id",
            "neighbor_id",
            cosine("query_id_emb", "neighbor_id_emb").alias("sim"),
        )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_delete(spark, index_path: str, drop_ids: DataFrame, id_col: str = "id") -> None:
    """Remove vectors from a persisted ``list_id``-partitioned IVF index —
    the delete leg of the index lifecycle (build → append via ``ivf_assign``
    → search → delete): left-anti join the dropped ids, rewrite through the
    atomic staging swap PRESERVING the ``list_id`` partition layout, so
    probed-partition pruning and later appends keep working and a reader
    always sees the old or the compacted index, never a partial one.

    At corpus scale the rewrite touches every list; a deletion-heavy
    deployment would keep a small tombstone set (broadcast anti-join at
    search time) and fold it in at the next scheduled compaction — this
    function IS that compaction step.
    """
    from ..sources.writers import atomic_swap_write

    index = spark.read.parquet(index_path)
    kept = index.join(drop_ids.select(id_col).distinct(), id_col, "left_anti")
    atomic_swap_write(kept, index_path, partition_by=["list_id"])


def _tok(text_col: str) -> Column:
    """The sparse family's ONE tokenization (lowercase whitespace split —
    the same expression the tfidf/logprob oracles mirror); every TF-IDF
    site goes through here so the batch top-k, the index build and the
    searcher can never drift."""
    from ..functions.text import tokens

    return tokens(F.lower(text_col))


def _term_freqs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term, tc): per-document term counts over ``_tok``."""
    return (
        df.select(id_col, F.explode(_tok(text_col)).alias("term"))
        .filter(F.length("term") > 0)
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tc"))
    )


def _idf_milli(dfr: DataFrame, n_docs: int) -> DataFrame:
    """(term, docs_with, idf_milli): the engine-exact integer IDF — ln
    quantized to milli-nats (+1000 smooth), the ONE formula both the batch
    top-k and the persisted index use (and the DuckDB twins mirror)."""
    return dfr.select(
        "term",
        "docs_with",
        F.round(
            F.lit(1000.0)
            * F.log((F.lit(float(n_docs)) + 1.0) / (F.col("docs_with") + 1.0))
            + 1000.0,
            0,
        )
        .cast("long")
        .alias("idf_milli"),
    )


def _weights_from_tf(tf: DataFrame, idf: DataFrame, id_col: str, include_tc: bool = False) -> DataFrame:
    """(id, term[, tc], wq) from an already-computed tf frame — the ONE
    weighted-postings expression (callers with a pinned/spilled tf reuse
    it without re-tokenizing)."""
    cols = [id_col, "term"] + (["tc"] if include_tc else [])
    return tf.join(F.broadcast(idf), "term").select(
        *cols, (F.col("tc") * F.col("idf_milli")).alias("wq")
    )


def _tfidf_weights(df: DataFrame, idf: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term, wq): integer TF-IDF weights under a FROZEN idf table —
    terms absent from ``idf`` contribute nothing (the frozen-vocabulary
    rule every persisted-model op here shares: NB default weights, IVF
    centroids). The weighting expression itself lives in
    ``_weights_from_tf`` (shared with the tc-carrying index writers) so
    no site can drift."""
    return _weights_from_tf(_term_freqs(df, text_col, id_col), idf, id_col)


def _cosine_rank(dots: DataFrame, qn: DataFrame, cn: DataFrame, id_col: str, k: int) -> DataFrame:
    """Rank (id, neighbor_id, dot) by the engine-exact integer cosine
    ``dot / (sqrt(na) * sqrt(nb))`` — correctly-rounded IEEE ops over
    identical BIGINTs, bit-identical across engines — and keep top-k per
    id with the (cos DESC, neighbor ASC) tie-break."""
    cos = (
        dots.join(qn.select(F.col(id_col).alias("__q"), F.col("nq").alias("na")), "__q")
        .join(cn.select(F.col(id_col).alias("neighbor_id"), F.col("nq").alias("nb")), "neighbor_id")
        .select(
            F.col("__q").alias(id_col),
            "neighbor_id",
            (
                F.col("dot")
                / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double")))
            ).alias("cos"),
        )
    )
    win = Window.partitionBy(id_col).orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        cos.withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= k)
        .select(
            id_col,
            "neighbor_id",
            F.col("rnk").cast("long").alias("rnk"),
            F.round("cos", 6).alias("cos_sim"),
        )
    )


def sparse_cosine_topk(
    df: DataFrame,
    k: int = 5,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sparse (TF-IDF) cosine top-k neighbors via an INVERTED-INDEX join —
    the IR-style similarity path next to the dense ANN family: documents
    meet only where they share a term, so the join cost is ``Σ_t df(t)²``
    over the vocabulary, not N². ``max_df`` drops stop-terms above a
    document-frequency cap BEFORE the join — the standard inverted-index
    trick (same hot-bucket discipline as the banded dedup joins: a term in
    every doc contributes nothing to cosine ordering but quadratic join
    mass); cosine is then exact over the kept term space, identically on
    both engines.

    Engine-exact contract: ln-based IDF is quantized to integer MILLI-nats
    per term (+1000 smooth), weights ``tc * idf_milli`` are exact BIGINTs,
    dot products and norms are exact BIGINT sums, and the final
    ``dot / (sqrt(na) * sqrt(nb))`` uses only correctly-rounded IEEE ops —
    bit-identical across engines from identical integers (int64 range
    bounds: weights ≤ ~1e6 for tc ≤ ~150, so per-pair sums stay far under
    2^63 at any realistic vocabulary; gigantic tc would need a smaller
    quantization scale).

    Scale shape: three narrow-key shuffles (tf groupBy, pair groupBy, the
    per-doc top-k window) — the (term) self-join hangs both sides off ONE
    repartition exchange, and the df dictionary broadcasts at any corpus
    size with a bounded vocabulary."""
    tf = _term_freqs(df, text_col, id_col)
    dfr = tf.groupBy("term").agg(F.count(F.lit(1)).alias("docs_with"))
    if max_df is not None:
        dfr = dfr.filter(F.col("docs_with") <= max_df)
    n_docs = df.count()  # bounded census: one scalar for the IDF constant
    idf = _idf_milli(dfr, n_docs)
    w = _tfidf_weights(df, idf, text_col, id_col).repartition("term")
    # ONE exchange feeds both self-join sides
    nrm = w.groupBy(id_col).agg(F.sum(F.col("wq") * F.col("wq")).alias("nq"))
    a = w.select(F.col(id_col).alias("__q"), "term", F.col("wq").alias("wa"))
    b = w.select(F.col(id_col).alias("__b"), "term", F.col("wq").alias("wb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("__q") != F.col("__b"))
        .groupBy("__q", F.col("__b").alias("neighbor_id"))
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    return _cosine_rank(dots, nrm, nrm, id_col, k)


# v2: the postings gained raw tc and the norms gained dl for BM25.
# v3: postings/norms carry a __batch partition (build + each append own
# one — crash replays REPLACE their partition instead of anti-joining),
# and the sidecar freezes dl_sum/dl_rows so BM25's average length never
# shifts under appends. An older index lacks all of it, so the version
# bump makes the sidecar guard say "rebuild the index" instead of
# crashing mid-search on missing columns (round-9 review).
_TFIDF_ALGO = "tfidf-millinat-v3"


def build_tfidf_index(
    df: DataFrame,
    path: str,
    *,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Persist a sparse TF-IDF search index over the corpus: an ``idf/``
    table (term, docs_with, idf_milli — FROZEN at build time, the same
    freeze-at-train contract as NB models and IVF centroids), a
    ``weights/`` posting table (doc_id, term, wq) and a ``norms/`` table
    (doc_id, nq), plus a ``_tfidf_params`` sidecar pinning the algorithm
    and quantization so a drifted searcher rejects instead of silently
    mis-ranking. ``max_df`` bakes the stop-term cap into the index.

    The whole index STAGES and atomically SWAPS as one unit (round-9
    review: three sequential in-place overwrites left a crash window
    where a still-valid sidecar covered mixed-generation idf/postings —
    the silent-misrank failure every other store here already guards
    against). The swap itself is the shared ``atomic_swap_write`` (its
    ``write_staging``/``finalize_staging`` hooks — one crash-recovery
    implementation in the repo, not two), which also heals a previously
    crashed swap before writing. The build tokenizes ONCE (the tf frame is
    pinned and feeds the idf census, the postings write and the dl
    aggregation); norms derive from the staged postings.
    """
    import json
    import os

    from ..sources.writers import atomic_swap_write

    spark = df.sparkSession
    n_docs = df.count()

    dl_totals: dict = {}

    def _stage(_df, staging: str) -> None:
        import shutil

        from ..sources.writers import write_parquet

        # ONE tokenize pass, OUT OF CORE: tf spills to a staging parquet
        # and every consumer (idf census, postings, dl) reads it back —
        # an in-memory localCheckpoint of the corpus-scale tf frame
        # OOM-killed the 1M-doc build (round-9 measurement), while the
        # un-pinned form paid three full tokenize scans
        tf_tmp = os.path.join(staging, "_tf_tmp")
        write_parquet(_term_freqs(_df, text_col, id_col), tf_tmp)
        tf = spark.read.parquet(tf_tmp)
        dfr = tf.groupBy("term").agg(F.count(F.lit(1)).alias("docs_with"))
        if max_df is not None:
            dfr = dfr.filter(F.col("docs_with") <= max_df)
        write_parquet(_idf_milli(dfr, n_docs), os.path.join(staging, "idf"))
        idf = spark.read.parquet(os.path.join(staging, "idf"))
        # postings carry raw tc next to the cosine weight so BM25 search
        # (which needs tc and idf separately) reads the same table; the
        # build owns the "build" __batch partition (appends each own
        # theirs — the crash-replay unit)
        w_df = _weights_from_tf(tf, idf, id_col, include_tc=True).withColumn(
            "__batch", F.lit("build")
        )
        write_parquet(w_df, os.path.join(staging, "weights"), partition_by=["__batch"])
        # schema-pinned read-back: an EMPTY partitioned write lands only
        # _SUCCESS, and a schemaless read of it raises UNABLE_TO_INFER_SCHEMA
        # (round-9 review — the empty corpus / all-terms-capped build)
        w = spark.read.schema(w_df.schema).parquet(os.path.join(staging, "weights"))
        # dl = FULL token mass (pre-cap): BM25's length normalization uses
        # the document's real length, not the capped-vocabulary slice
        dl = tf.groupBy(id_col).agg(F.sum("tc").alias("dl"))
        n_df = (
            w.groupBy(id_col)
            .agg(F.sum(F.col("wq") * F.col("wq")).alias("nq"))
            .join(dl, id_col)
            .withColumn("__batch", F.lit("build"))
        )
        write_parquet(n_df, os.path.join(staging, "norms"), partition_by=["__batch"])
        # freeze BM25's average length AT BUILD TIME (round-9 review:
        # deriving it live from norms let every append silently shift the
        # scores of already-indexed documents)
        row = (
            spark.read.schema(n_df.schema)
            .parquet(os.path.join(staging, "norms"))
            .agg(F.sum("dl").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()[0]
        )
        dl_totals["dl_sum"] = int(row["s"] or 0)
        dl_totals["dl_rows"] = int(row["n"])
        shutil.rmtree(tf_tmp, ignore_errors=True)

    def _sidecar(staging: str) -> None:
        tmp = os.path.join(staging, "_tfidf_params.json.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(
                {
                    "algo": _TFIDF_ALGO,
                    "n_docs": n_docs,
                    "max_df": max_df,
                    "dl_sum": dl_totals["dl_sum"],
                    "dl_rows": dl_totals["dl_rows"],
                },
                f,
            )
        os.replace(tmp, os.path.join(staging, "_tfidf_params.json"))

    atomic_swap_write(df, path, write_staging=_stage, finalize_staging=_sidecar)


def sparse_topk_search(
    queries: DataFrame,
    spark,
    path: str,
    k: int = 5,
    *,
    scheme: str = "cosine",
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k corpus neighbors for each query document against a persisted
    ``build_tfidf_index``: queries are weighted under the index's FROZEN
    idf (unseen terms contribute nothing — exactly what a full rebuild
    over corpus∪queries would NOT do; the equivalence contract is "same
    ranking as weighting the queries at build time", pinned in pytest),
    joined to the posting table on ``term``, and ranked by the same
    engine-exact integer cosine as ``sparse_cosine_topk``.

    ``scheme="bm25"`` ranks by Okapi BM25 instead (the production
    retrieval scorer: term saturation via ``k1``, document-length
    normalization via ``b`` against the corpus average length frozen in
    the index): each (query-term, doc) contribution —
    ``qtf * idf_milli * tc*(k1+1) / (tc + k1*(1-b+b*dl/avgdl))`` — is
    quantized to an integer BEFORE summing (the engine-exact pattern), so
    the output ``score_milli`` is a BIGINT with no float in the hash at
    all; returns (id, neighbor_id, rnk, score_milli).

    Scale shape: cost ∝ query batch's posting mass × per-term df — the
    corpus is touched bytes-per-matching-posting, never re-tokenized
    (the daily-ingest amortization every store here exists for)."""
    import json
    import os

    # cheap argument validation BEFORE any I/O (a bad scheme on a crashed
    # index must report the caller's bug, not FileNotFoundError)
    if scheme not in ("cosine", "bm25"):
        raise ValueError(f"unknown scheme: {scheme!r} (cosine | bm25)")
    # NO reader-side heal: a reader renaming a .backup sibling back into
    # place races a concurrent build's swap window and can destroy the
    # just-staged index (round-9 review). A crashed swap is healed by the
    # next build (atomic_swap_write heals first) or an explicit
    # sources.writers.recover_interrupted_swap call; until then this read
    # fails loudly on the missing sidecar.
    with open(os.path.join(path, "_tfidf_params.json"), encoding="utf-8") as f:
        params = json.load(f)
    if params.get("algo") != _TFIDF_ALGO:
        raise ValueError(
            f"tfidf index at {path} built with {params.get('algo')!r}, "
            f"searcher expects {_TFIDF_ALGO!r} — rebuild the index"
        )
    if not params.get("dl_rows"):
        # empty index (empty corpus, or every term above max_df): the
        # partitioned empty tables carry no data files and cannot even be
        # schema-inferred — return the graceful empty BEFORE reading them.
        # The id DDL derives from the CALLER's id column (string-id
        # corpora keep their type, matching the non-empty path's schema —
        # the compression_ratio_micros id-preservation contract).
        id_ddl = queries.schema[id_col].dataType.simpleString()
        return queries.sparkSession.createDataFrame(
            [],
            f"{id_col} {id_ddl}, neighbor_id {id_ddl}, rnk long, "
            + ("score_milli long" if scheme == "bm25" else "cos_sim double"),
        )
    idf = spark.read.parquet(os.path.join(path, "idf"))
    corpus_w = spark.read.parquet(os.path.join(path, "weights"))
    corpus_n = spark.read.parquet(os.path.join(path, "norms"))
    if scheme == "bm25":
        return _bm25_rank(
            queries, idf, corpus_w, corpus_n, params, k, k1, b, text_col, id_col
        )
    qw = _tfidf_weights(queries, idf, text_col, id_col)
    qn = qw.groupBy(id_col).agg(F.sum(F.col("wq") * F.col("wq")).alias("nq"))
    dots = (
        qw.select(F.col(id_col).alias("__q"), "term", F.col("wq").alias("wa"))
        .join(
            corpus_w.select(F.col(id_col).alias("__b"), "term", F.col("wq").alias("wb")),
            "term",
        )
        .groupBy("__q", F.col("__b").alias("neighbor_id"))
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    return _cosine_rank(dots, qn, corpus_n, id_col, k)


def _bm25_rank(
    queries: DataFrame,
    idf: DataFrame,
    corpus_w: DataFrame,
    corpus_n: DataFrame,
    params: dict,
    k: int,
    k1: float,
    b: float,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Okapi BM25 top-k over the frozen index (see ``sparse_topk_search``).
    ``avgdl`` derives from the SIDECAR's exact integer (dl_sum, dl_rows)
    pair frozen at build time — appends never shift already-indexed
    documents' scores (round-9 review), and both engines compute the
    identical double from identical integers; every per-triple score
    quantizes to BIGINT before the sum. One narrow-key join on term + one
    (query, doc) groupBy + the top-k window — the same shuffles as the
    cosine path."""
    # dl_rows > 0 guaranteed: sparse_topk_search returns the graceful
    # empty before reaching here on an empty index
    avgdl = float(params["dl_sum"]) / float(params["dl_rows"])  # identical-integer division
    qtf = _term_freqs(queries, text_col, id_col).join(F.broadcast(idf), "term").select(
        F.col(id_col).alias("__q"), "term", F.col("tc").alias("qtf"), "idf_milli"
    )
    posts = corpus_w.select(
        F.col(id_col).alias("neighbor_id"), "term", F.col("tc").alias("ctc")
    ).join(corpus_n.select(F.col(id_col).alias("neighbor_id"), "dl"), "neighbor_id")
    contrib = qtf.join(posts, "term").select(
        "__q",
        "neighbor_id",
        F.round(
            F.col("qtf")
            * F.col("idf_milli")
            * (F.col("ctc") * F.lit(k1 + 1.0))
            / (
                F.col("ctc")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
            ),
            0,
        )
        .cast("long")
        .alias("sc"),
    )
    scored = contrib.groupBy("__q", "neighbor_id").agg(F.sum("sc").alias("score_milli"))
    win = Window.partitionBy("__q").orderBy(
        F.col("score_milli").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("__q").alias(id_col),
            "neighbor_id",
            F.col("rnk").cast("long").alias("rnk"),
            F.col("score_milli").cast("long").alias("score_milli"),
        )
    )


def append_tfidf_index(
    new_docs: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Incremental leg of the index lifecycle (build → APPEND → search):
    weight a new document batch under the index's FROZEN statistics and
    land its postings and norms — idf/df AND the BM25 average length stay
    frozen (the NB/IVF freeze-at-train contract; a periodic
    ``build_tfidf_index`` rebuild refreshes them). Cost ∝ the batch plus
    one map-only, column-pruned id scan of the landed NORMS table — one
    row per landed DOC, not per posting (round-9 verdict item 3: the
    posting-id scan made a 5k append ~1/5 of a full rebuild; the norms
    scan with the batch broadcast is ~1/10 and grows only with the doc
    count); the corpus text is never re-read.

    Crash-REPLACE idempotence, not anti-join skipping (round-9 review:
    postings feed SUMS, and a parquet job commit is per-FILE — a crash
    could land a subset of one doc's postings, which a doc-id anti-join
    would then treat as complete forever): each batch owns a
    ``__batch=<id-set fingerprint>`` partition in both tables, written
    with dynamic partition overwrite, so a RERUN of the batch replaces
    its own partition wholesale and no partial state survives it. (A
    crashed batch that is simply ABANDONED leaves its truncated partition
    behind — rerun or rebuild; no reader mutates the store.) The
    fingerprint is ID-SET derived (the ingest ``_batch_fingerprint``):
    a batch with the same id set is BY DESIGN treated as a replay of the
    original, so changing a document's text under an unchanged id set is
    out of contract (rebuild) — while re-emitting an already-indexed id
    from a DIFFERENT batch raises (silently skipping it would leave the
    index stale with no signal). Duplicate ids WITHIN a batch raise too
    (they would merge two documents' counts and can cancel the XOR
    fingerprint into a collision); NULL ids raise lazily. Single-writer,
    like every store here."""
    import json
    import os

    from ..sources.writers import recover_interrupted_swap

    # writer discipline: heal a crashed BUILD swap before touching files
    recover_interrupted_swap(path)
    sidecar = os.path.join(path, "_tfidf_params.json")
    if not os.path.exists(sidecar):
        raise ValueError(
            f"no tfidf index at {path} — run build_tfidf_index first"
        )
    with open(sidecar, encoding="utf-8") as f:
        params = json.load(f)
    if params.get("algo") != _TFIDF_ALGO:
        raise ValueError(
            f"tfidf index at {path} built with {params.get('algo')!r}, "
            f"appender expects {_TFIDF_ALGO!r} — rebuild the index"
        )
    spark = new_docs.sparkSession
    wpath, npath = os.path.join(path, "weights"), os.path.join(path, "norms")
    guarded = F.when(
        F.col(id_col).isNull(),
        F.raise_error(F.lit(f"append_tfidf_index: NULL {id_col} cannot be indexed")),
    ).otherwise(F.col(id_col))
    batch = new_docs.withColumn(id_col, guarded)
    # ONE agg pass over the batch computes the duplicate-id census AND the
    # id-set fingerprint (the ingest `_batch_fingerprint` expression —
    # bit_xor of per-id xxhash64; same-id-set reruns land in, and replace,
    # the same partition). Within-batch duplicate ids would merge two
    # documents' term counts into one corrupt vector AND cancel in the
    # XOR fingerprint (h^h = 0), letting the batch collide with a landed
    # partition — reject up front.
    dup_row = batch.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(id_col).alias("d"),
        F.expr(f"bit_xor(xxhash64(`{id_col}`))").alias("__fp"),
    ).collect()[0]
    if dup_row["n"] != dup_row["d"]:
        raise ValueError(
            f"append_tfidf_index: {dup_row['n'] - dup_row['d']} duplicate "
            f"{id_col} value(s) within the batch — ids must be unique"
        )
    fp = f"{(dup_row['__fp'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}"
    # disjointness contract check vs every OTHER partition — against the
    # NORMS table (ONE row per landed doc, column-pruned to the id), not
    # the postings (round-9 measurement: scanning every landed posting id
    # made a 5k-doc append cost ~1/5 of a full rebuild at 1M docs; norms
    # make the check ∝ landed DOCS, and the semi-join side is the batch).
    # Schema-PINNED read: an index built over an empty corpus has
    # partitioned tables with no data files, so an inferred read of it
    # raises UNABLE_TO_INFER_SCHEMA on the very first append (round-9
    # advice) — the pin turns that into the correct empty frame. Own-
    # partition rows can only be a crashed prior attempt of THIS batch
    # and are about to be replaced.
    id_ddl = batch.schema[id_col].dataType.simpleString()
    norms_schema = f"{id_col} {id_ddl}, nq long, dl long, __batch string"
    others = (
        spark.read.schema(norms_schema)
        .parquet(npath)
        .filter(F.col("__batch") != fp)
        .select(id_col)
    )
    # batch side BROADCAST, landed side streamed: one map-only pass over
    # the norms ids, no shuffle of the (much larger) landed doc set
    n_dup = others.join(
        F.broadcast(batch.select(id_col)), id_col, "left_semi"
    ).count()
    if n_dup:
        raise ValueError(
            f"append_tfidf_index: {n_dup} batch id(s) already indexed at "
            f"{path} under a different batch — ids must be disjoint "
            "(re-emitting a changed document requires a rebuild; a silent "
            "skip would leave the index stale with no signal)"
        )
    # idf/ may itself be empty-partitioned (empty-corpus build) — pin
    idf = spark.read.schema("term string, docs_with bigint, idf_milli long").parquet(
        os.path.join(path, "idf")
    )
    # tf has exactly ONE consumer (the postings write), so no pin is
    # needed: dl — the FULL pre-cap token mass — computes map-only from
    # the text (size of the filtered token array == sum(tc), the build's
    # definition), which dropped the eager batch checkpoint from the
    # append's critical path
    w_df = _weights_from_tf(
        _term_freqs(batch, text_col, id_col), idf, id_col, include_tc=True
    ).withColumn("__batch", F.lit(fp))
    (
        w_df.write.option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .partitionBy("__batch")
        .parquet(wpath)
    )
    dl = batch.select(
        F.col(id_col),
        F.size(
            F.filter(_tok(text_col), lambda t: F.length(t) > 0)
        )
        .cast("long")
        .alias("dl"),
    )
    (
        spark.read.schema(w_df.schema)
        .parquet(wpath)
        .filter(F.col("__batch") == fp)
        .groupBy(id_col)
        .agg(F.sum(F.col("wq") * F.col("wq")).alias("nq"))
        .join(dl, id_col)
        .withColumn("__batch", F.lit(fp))
        .write.option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .partitionBy("__batch")
        .parquet(npath)
    )
