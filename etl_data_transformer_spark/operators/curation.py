"""Corpus-curation operators beyond dedup: PII redaction, benchmark
contamination detection, and sequence packing (SURVEY.md §2.10 — the
training-data-pipeline surface; no analog in the reference, which stops at
full-row DISTINCT).

All three are designed for the 100 TB shape:

- ``redact_pii`` is a chain of JVM ``regexp_replace`` calls — one codegen'd
  projection, no Python, no shuffle.
- ``contamination_check`` never cross-joins: the corpus explodes to hashed
  shingles (one row per doc×shingle), the benchmark's shingle set is tiny
  and broadcast, and the overlap count is a map-side-combinable groupBy on
  the doc id.
- ``pack_sequences`` is partition-local greedy first-fit via
  ``mapInPandas`` (Arrow-batched): packing is inherently sequential, so the
  parallel unit is the partition — the standard trade (each executor packs
  its slice; bins never span partitions).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

# ordered: more-specific patterns first so e.g. an email isn't half-eaten by
# the phone pattern's digit runs; IP before PHONE because the phone pattern's
# dot-separated digit groups would otherwise consume IPv4s with 3-digit
# octets (192.168.100.200)
_PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d(?:[ -]?\d){12,15}\b", "<CARD>"),
    # NB: separator class is [ .-] (literal space/dot/dash, dash LAST) —
    # [ -.] is a character RANGE 0x20-0x2E that also matches , ( ) * + %,
    # falsely redacting comma-grouped numbers like 1,234,567,890
    (r"\+?\d{1,3}[ .-]?\(?\d{2,4}\)?[ .-]?\d{3,4}[ .-]?\d{3,4}\b", "<PHONE>"),
]


def redact_pii(col, patterns: list[tuple[str, str]] | None = None):
    """Expression: replace emails / card-like digit runs / phone numbers /
    IPv4 addresses with placeholder tokens. A chained ``regexp_replace`` —
    stays inside one whole-stage-codegen projection."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, token in patterns or _PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


def redact_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Apply ``redact_pii`` in place over ``text_col``."""
    return df.withColumn(text_col, redact_pii(text_col))


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    threshold: float = 0.1,
    broadcast_bench: bool = True,
    bucket_bits: int = 20,
) -> DataFrame:
    """Benchmark-contamination detection: for each corpus document, the
    fraction of its word ``n``-gram shingles that appear anywhere in the
    ``benchmark`` frame's ``text_col`` (the eval set). Returns
    (id, n_shingles, n_hits, contamination, contaminated).

    Scale shape: shingles are hashed to longs (xxhash64) on both sides, the
    benchmark side is distinct-ed and broadcast (eval sets are tiny next to
    a training corpus), and the join is a hash semi-join per exploded
    shingle followed by a map-side-combinable count — never an N×N compare,
    never a Python UDF. For a benchmark too big to broadcast, pass
    ``broadcast_bench=False``: hit counting becomes a two-tier filter — a
    broadcast semi-join against the benchmark's COARSE bucket set
    (``h mod 2^bucket_bits``: at most ``2^bucket_bits`` longs, broadcastable
    when the full shingle set is not — a one-hash block bloom built
    entirely from DataFrame ops), which drops non-matching corpus shingle
    rows map-side BEFORE any shuffle, then the exact shuffled semi join on
    the full hash over the survivors. Bucket false positives only pass
    extra rows to the exact join — counts unchanged (equivalence
    pytest-pinned). Catalyst's InjectRuntimeFilter would inject this bloom
    automatically for plain-column join keys
    (``joins.runtime_filtered_join_confs``) but cannot trace lineage
    through the shingle explode — verified in ``tests/test_curation_ops.py``,
    hence the hand-rolled tier. The price: zero-hit documents need a
    separate per-doc census, so the corpus is shingled twice (the census
    shuffle itself is one narrow row per document, map-side combined).
    """
    # tokens PROJECTED before the shingle lambda (shingles_from_tokens —
    # no CSE inside higher-order lambdas; identical shingle values)
    from ..functions.text import filtered_tokens, shingles_from_tokens

    hs = F.transform(
        shingles_from_tokens(F.col("__tk"), n), lambda s: F.xxhash64(s)
    )
    corpus_sh = (
        corpus.select(F.col(id_col), filtered_tokens(F.col(text_col)).alias("__tk"))
        .select(F.col(id_col), hs.alias("hs"))
        .filter(F.size("hs") > 0)
        .select(id_col, F.size("hs").alias("n_shingles"), F.explode("hs").alias("h"))
    )
    bench_sh = (
        benchmark.select(filtered_tokens(F.col(text_col)).alias("__tk"))
        .select(F.explode(hs).alias("h"))
        .distinct()
    )
    # single pass over the exploded corpus (the expensive side): left join
    # against the broadcast benchmark set and count hits conditionally —
    # zero-hit docs keep their row via the groupBy, so no second
    # corpus-shingling branch for the base set
    if broadcast_bench:
        out = (
            corpus_sh.join(
                F.broadcast(bench_sh.withColumn("__hit", F.lit(1))), "h", "left"
            )
            .groupBy(id_col, "n_shingles")
            .agg(F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias("n_hits"))
        )
    else:
        base = corpus_sh.select(id_col, "n_shingles").distinct()
        n_buckets = F.lit(1 << bucket_bits)
        buckets = bench_sh.select(F.pmod(F.col("h"), n_buckets).alias("__bkt")).distinct()
        pre = corpus_sh.withColumn("__bkt", F.pmod(F.col("h"), n_buckets)).join(
            F.broadcast(buckets), "__bkt", "left_semi"
        )
        hits = (
            pre.join(bench_sh, "h", "left_semi")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        )
        out = base.join(hits, id_col, "left").withColumn(
            "n_hits", F.coalesce("n_hits", F.lit(0)).cast("long")
        )
    out = out.withColumn(
        "contamination", F.round(F.col("n_hits") / F.col("n_shingles"), 6)
    )
    return out.select(
        id_col,
        "n_shingles",
        "n_hits",
        "contamination",
        (F.col("contamination") >= threshold).alias("contaminated"),
    )


PACKED_SCHEMA = "bin_id long, doc_ids array<long>, n_docs int, n_tokens long"
# first-fit scans at most this many open bins per doc (see pack_sequences)
_PACK_OPEN_BINS = 64


def pack_sequences(
    df: DataFrame,
    max_tokens: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    colocate_by_length: bool = False,
) -> DataFrame:
    """Greedy first-fit packing of documents into training sequences of at
    most ``max_tokens`` whitespace tokens: returns one row per packed bin
    (bin_id, doc_ids, n_docs, n_tokens). Documents longer than
    ``max_tokens`` get a bin of their own (truncation is the trainer's
    call, not the packer's).

    Packing is order-sequential, so it runs partition-local inside
    ``mapInPandas`` (Arrow batches; only id + token count cross into
    Python — never the text). Bins are deterministic per partition (sorted
    by id); bin_id is globally unique via the partition id in the high
    bits. ``colocate_by_length`` range-partitions on the token count first
    so similar-length docs share partitions — tighter bins at the price of
    one extra shuffle (of (id, count) pairs only, never text).

    The first-fit scan is over a BOUNDED window of open bins (the oldest
    open bin closes when the window exceeds ``_PACK_OPEN_BINS``): pure
    first-fit keeps every bin open forever, which is O(docs × bins) of
    pure-Python probes per partition — quadratic when most docs don't
    co-pack (round-7 review). The window keeps it O(docs × window) with
    near-identical packing density; every budget/conservation invariant
    is unchanged (pytest + the ``sequence_packing_gate`` oracle recompute
    them from the raw table). Null/absent text counts as 0 tokens (same
    coalesce discipline as ``_mixture_tok`` — a null-text doc must not
    kill the job).
    """
    import pandas as pd

    counts = df.select(
        F.col(id_col), F.coalesce(F.size(tokens(text_col)), F.lit(0)).alias("n_tok")
    )
    if colocate_by_length:
        counts = counts.repartitionByRange(F.col("n_tok"), F.col(id_col))

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        closed: list[list] = []  # [doc_ids, token_sum]
        open_bins: list[list] = []
        rows = []
        for pdf in batches:
            rows.append(pdf)
        if not rows:
            return
        allr = pd.concat(rows).sort_values(id_col)
        for doc_id, n_tok in zip(allr[id_col], allr["n_tok"]):
            n_tok = int(n_tok)
            for b in open_bins:
                if b[1] + n_tok <= max_tokens:
                    b[0].append(int(doc_id))
                    b[1] += n_tok
                    break
            else:
                open_bins.append([[int(doc_id)], n_tok])
                if len(open_bins) > _PACK_OPEN_BINS:
                    closed.append(open_bins.pop(0))
        bins = closed + open_bins
        yield pd.DataFrame(
            {
                "bin_id": [(pid << 32) | i for i in range(len(bins))],
                "doc_ids": [b[0] for b in bins],
                "n_docs": [len(b[0]) for b in bins],
                "n_tokens": [b[1] for b in bins],
            }
        )

    return counts.mapInPandas(pack, schema=PACKED_SCHEMA)


def lm_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_fraction: float = 0.9,
    use_bigram: bool = False,
) -> DataFrame:
    """Percentile-thresholded statistical-LM quality filter — the shape of
    published perplexity filtering: score every document by its corpus-LM
    mean log-prob (unigram, or conditional bigram with ``use_bigram``),
    find the score at the (1 - keep_fraction) quantile, and keep documents
    at or above it. Adaptive by construction: the threshold tracks the
    corpus rather than a hand-tuned constant.

    Scale shape: scoring is the two-shuffle broadcast-vocab plan of the
    scorer; the cutoff is ONE driver-side scalar via ``approxQuantile``
    (no row data collected); the keep step is a left-semi join on ids.
    Documents the scorer yields no row for (no tokens / no bigrams) score
    as unscoreable and are DROPPED — at pretraining scale an empty or
    sub-two-token document is noise, not signal.

    The scores frame is persisted for the take/quantile/filter sequence
    (round-4 advice: unpersisted, the corpus was re-tokenized and
    re-aggregated three times), then released once the keep-ids frame is
    materialized from it via an EAGER ``localCheckpoint`` — unlike a
    ``persist`` (which the CacheManager pins until an explicit unpersist,
    leaking one cache entry per call; round-5 review), checkpoint blocks
    are released by the ContextCleaner as soon as the returned DataFrame
    becomes unreachable, so repeated filter calls in one long session
    don't accumulate dead storage."""
    from pyspark import StorageLevel

    from ..functions.text import bigram_logprob_scores, unigram_logprob_scores

    scorer = bigram_logprob_scores if use_bigram else unigram_logprob_scores
    scores = scorer(df, text_col=text_col, id_col=id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        if not scores.take(1):
            return df.limit(0)
        cutoff = scores.approxQuantile("mean_logprob", [1.0 - keep_fraction], 0.0001)[0]
        # eager: ids materialize off the cached scores BEFORE the unpersist
        keep = (
            scores.filter(F.col("mean_logprob") >= cutoff)
            .select(id_col)
            .localCheckpoint(eager=True)
        )
    finally:
        scores.unpersist()
    return df.join(keep, id_col, "left_semi")


def stratified_cap(
    df: DataFrame,
    key_col: str = "source",
    cap_n: int = 1000,
    order_col: str | None = None,
    id_col: str = "doc_id",
    two_phase: bool = False,
) -> DataFrame:
    """Per-group cap — the domain-balancing step of a pretraining mix: keep
    at most ``cap_n`` rows per ``key_col`` value. Deterministic selection:
    highest ``order_col`` first when given (e.g. a quality score, so the cap
    keeps the BEST documents), else a per-row hash (stable uniform sample,
    independent of partitioning/retries — unlike ``sample()``).

    Hot-group shape (one domain = half the corpus): a naive reading of the
    plan says the window puts the ENTIRE hot group on one reducer and sorts
    it there. On Spark >= 3.5 that is NOT what executes: Catalyst rewrites
    a ``row_number() <= k`` filter into ``WindowGroupLimit`` with a
    **Partial** stage BEFORE the shuffle — every map task locally sorts its
    slice and emits at most ``cap_n`` rows per group, so the reducer
    receives at most ``cap_n × n_map_partitions`` rows for the hot group,
    never the group itself (plan pinned by
    ``tests/test_curation_ops.py::test_stratified_cap_plan_has_partial_group_limit``;
    measured on a 12M-row hot group in ``tools/bench_stratified.py`` —
    single-window ≈ manual two-phase, i.e. no straggler left to eliminate).

    ``two_phase=True`` adds an explicit intermediate cap windowed on
    ``(key_col, input partition id)`` before the final window. Identical
    result (any global top-``cap_n`` row of a group is in the top-``cap_n``
    of every subset containing it — equivalence pinned by
    ``tests/test_curation_ops.py``); one extra shuffle of survivors. Worth
    it ONLY at extreme map fan-in (100k+ scan tasks), where the native
    bound ``cap_n × n_map_partitions`` could itself overwhelm the final
    reducer — the extra phase re-bounds it at ``cap_n ×
    shuffle_partitions``. At ordinary parallelism it's pure overhead;
    default off.
    """
    from pyspark.sql import Window

    rank_by = (
        F.col(order_col).desc() if order_col else F.xxhash64(F.col(id_col)).asc()
    )
    w = Window.partitionBy(key_col).orderBy(rank_by, F.col(id_col).asc())
    if two_phase:
        # partition id captured BEFORE the window's shuffle: it reflects the
        # input split, giving the pre-cap window (key, pid) keys that spread
        # a hot group across reducers
        pre = Window.partitionBy(key_col, "__pid").orderBy(rank_by, F.col(id_col).asc())
        df = (
            df.withColumn("__pid", F.spark_partition_id())
            .withColumn("__prn", F.row_number().over(pre))
            .filter(F.col("__prn") <= cap_n)
            .drop("__pid", "__prn")
        )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap_n)
        .drop("__rn")
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    test_fraction: float = 0.2,
    salt: str = "split",
) -> DataFrame:
    """Near-dup-aware train/test split: a plain per-document hash split
    (``q_train_test_split``) puts two near-identical documents on OPPOSITE
    sides of the boundary — the train→test contamination published evals
    warn about. Here the unit of assignment is the near-dup CLUSTER:
    resolve ``pairs`` (id_a, id_b near-dup edges, e.g. ``minhash_dedup`` /
    ``semantic_dedup_pairs`` output) into connected components
    (``graph.dedup_clusters``), hash the cluster's canonical id, and send
    the WHOLE cluster to one side — no edge can straddle the split by
    construction (pinned by ``tests/test_curation_ops.py`` and the
    ``leakage_safe_split_gate`` catalog row).

    Scale shape: component resolution is the bounded min-label propagation
    (rounds ∝ cluster diameter — near-dup clusters are shallow); the split
    decision is a pure function of (salt, cluster_id) via md5, so it is
    deterministic across partitioning, retries, and engines, and documents
    added later join the side their cluster already lives on. Returns
    ``df`` + (cluster_id, split)."""
    from .graph import dedup_clusters

    if not 0.0 < test_fraction < 1.0:
        raise ValueError(f"test_fraction must be in (0, 1), got {test_fraction}")
    clusters = dedup_clusters(df, pairs, id_col=id_col)
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col("cluster_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    split = F.when(bucket < F.lit(int(test_fraction * 2**32)), "test").otherwise("train")
    return df.join(clusters, id_col).withColumn("split", split)


def semantic_dedup_pairs(
    vectors: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    max_cluster_size: int | None = None,
    block_size: int = 1024,
    engine: str = "auto",
) -> DataFrame:
    """In-cluster cosine near-dup pairs — the candidate step of
    ``semantic_dedup``. Each vector is assigned to its nearest frozen
    centroid (``similarity.ivf_assign``: pure codegen'd expressions) and
    pairs are generated within the cluster only — the pairwise cosine work
    is bounded by the largest cluster, never the corpus (the SemDeDup
    trade: pairs straddling a cluster boundary are accepted misses;
    tighten with more clusters). ``max_cluster_size`` drops degenerate
    clusters via the same narrow count + broadcast anti-join as the banded
    dedups (audit by counting assignments per ``list_id``). Returns
    (id_a, id_b, cosine_sim) with id_a < id_b. Requires the embedding
    column to be named ``embedding`` (``ivf_assign``'s contract).

    Engine dispatch (mirrors ``dedup.hamming_band_pairs``' census gate —
    round-7 verdict item 1): ``'grouped'`` runs ONE dense BLAS matmul per
    cluster via ``applyInPandas`` — cheapest when the whole corpus fits a
    few tasks (no census, no block join, no packing); ``'blocks'`` hashes
    each cluster into ~``block_size``-vector blocks, packs each block
    one-per-row (ids array + flattened embedding matrix) and makes every
    ordered block pair (incl. the diagonal) one GEMM tile task —
    parallelism Σ_c B_c(B_c+1)/2 instead of n_clusters, which un-straggles
    skewed clusters (7–14 s → ~2.5 s at sf1) but pays a census + block
    join + eager materialization that LOSE at small scale (~1.5 s grouped
    vs ~2.4 s blocks at sf0.1). ``'auto'`` reads Σ_c n_c² (the exact
    pairwise-cosine work) from a narrow driver census and picks grouped
    below ``_GEMM_MIN_WORK``, blocks above.

    Tried and rejected earlier: an interpreted ``zip_with`` cosine per
    joined pair (5.8 s at sf0.1) and the posexplode → (list_id, position)
    equi-join → groupBy-sum shape (5.1 s — the join materializes
    pairs × dim rows). Grouped's per-task memory bound is the largest
    cluster's (B_c × B_c) similarity matrix (cap with
    ``max_cluster_size``); blocks' is the (≤block_size × ≤block_size)
    tile. Zero-norm vectors never pair (cosine undefined)."""
    from .dedup import _drop_hot_buckets
    from .similarity import ivf_assign

    if engine not in ("auto", "blocks", "grouped"):
        raise ValueError(f"unknown engine {engine!r} (auto|blocks|grouped)")
    if engine == "auto":
        # cheap pre-gate: Σ_c n_c² ≤ N², so a corpus whose FULL pairwise
        # work is under the threshold can never need tiles — decide from a
        # columnless count and skip the materialization + census entirely
        # (the census path alone cost ~0.6 s at sf0.1, pushing the grouped
        # 1.5 s to 2.1 s)
        n = vectors.count()
        if n * n < _GEMM_MIN_WORK:
            engine = "grouped"
    assigned = ivf_assign(vectors, centroids, id_col=id_col)
    if engine != "grouped" or max_cluster_size is not None:
        # materialize the assignment ONCE: the work census, the block
        # join, and the packed self-join are independent consumers, and an
        # unmaterialized frame would re-run the Arrow argmin-over-centroids
        # matmul per consumer (same fix as semantic_dedup_pairs_incremental,
        # round-6 review). The grouped engine has a single consumer and
        # skips the pass — EXCEPT when a cluster cap is set:
        # _drop_hot_buckets consumes the assignment twice (bucket census +
        # anti-join), so the grouped path must materialize too or the
        # argmin matmul re-runs (round-8 advice)
        assigned = assigned.localCheckpoint(eager=True)
    if max_cluster_size is not None:
        assigned = _drop_hot_buckets(assigned, ["list_id"], max_cluster_size)
    id_type = dict(assigned.dtypes)["id"]
    schema = f"id_a {id_type}, id_b {id_type}, cosine_sim double"

    if engine == "auto":
        work = (
            assigned.groupBy("list_id")
            .agg(F.count(F.lit(1)).alias("__n"))
            .agg(F.sum(F.col("__n") * F.col("__n")).alias("__w"))
            .collect()[0]["__w"]
        )
        engine = "grouped" if (work is None or work < _GEMM_MIN_WORK) else "blocks"
    if engine == "grouped":
        return _semantic_pairs_grouped(assigned, threshold, schema)
    return _semantic_pairs_blocks(assigned, threshold, schema, block_size)


# below this pairwise-cosine work (Σ cluster², from semantic_dedup_pairs'
# auto census) the one-task-per-cluster GEMM beats the block tiles' census
# + block-join + packing overhead — measured Σ n_c²: sf0.1 = 0.5M (grouped
# 1.5 s vs blocks 2.7 s) vs the 10× distinct fixture = 143M (grouped
# 7–14 s straggler vs blocks ~2.5 s); see SCALING.md
_GEMM_MIN_WORK = 50_000_000


def _semantic_pairs_grouped(assigned: DataFrame, threshold: float, schema: str) -> DataFrame:
    """One dense BLAS matmul per cluster (the standard SemDeDup shape)."""
    import numpy as np
    import pandas as pd

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []})
        x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        ids = pdf["id"].to_numpy()
        norms = np.linalg.norm(x, axis=1)
        live = norms > 0.0
        x, ids, norms = x[live], ids[live], norms[live]
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []})
        sim = (x @ x.T) / (norms[:, None] * norms[None, :])
        iu = np.triu_indices(len(ids), k=1)
        s = np.round(sim[iu], 6)
        keep = s >= threshold
        ia, ib = ids[iu[0][keep]], ids[iu[1][keep]]
        return pd.DataFrame(
            {
                "id_a": np.minimum(ia, ib),
                "id_b": np.maximum(ia, ib),
                "cosine_sim": s[keep],
            }
        )

    return (
        assigned.select("id", "list_id", "embedding")
        .groupBy("list_id")
        .applyInPandas(per_cluster, schema=schema)
    )


def _semantic_pairs_blocks(
    assigned: DataFrame, threshold: float, schema: str, block_size: int
) -> DataFrame:
    """Block-pair GEMM tiles over a materialized assignment frame."""
    import numpy as np
    import pandas as pd

    # narrow cluster census → per-cluster block count ceil(n/block_size);
    # block membership is a deterministic id hash, so the decomposition is
    # partitioning-independent
    sizes = assigned.groupBy("list_id").agg(F.count(F.lit(1)).alias("__n"))
    blocked = assigned.join(F.broadcast(sizes), "list_id").withColumn(
        "blk",
        F.pmod(
            F.xxhash64("id"),
            F.ceil(F.col("__n") / F.lit(block_size)).cast("long"),
        ).cast("int"),
    )
    # pack each block as one row: ids + the flattened row-major embedding
    # matrix (reshaped in numpy without per-element Python)
    rows = F.collect_list(F.struct(F.col("id"), F.col("embedding"))).alias("__rows")
    packed = (
        blocked.groupBy("list_id", "blk")
        .agg(rows)
        .select(
            "list_id",
            "blk",
            F.transform("__rows", lambda r: r["id"]).alias("ids"),
            F.flatten(F.transform("__rows", lambda r: r["embedding"])).alias("flat"),
        )
    )
    a = packed.select(
        "list_id",
        F.col("blk").alias("blk_a"),
        F.col("ids").alias("ids_a"),
        F.col("flat").alias("flat_a"),
    )
    b = packed.select(
        "list_id",
        F.col("blk").alias("blk_b"),
        F.col("ids").alias("ids_b"),
        F.col("flat").alias("flat_b"),
    )
    tiles = (
        a.join(b, "list_id")
        .filter(F.col("blk_a") <= F.col("blk_b"))
        .repartition(F.col("list_id"), F.col("blk_a"), F.col("blk_b"))
    )

    def gemm_tiles(batches):
        for pdf in batches:
            outs = []
            for ids_a, flat_a, blk_a, ids_b, flat_b, blk_b in zip(
                pdf["ids_a"], pdf["flat_a"], pdf["blk_a"], pdf["ids_b"], pdf["flat_b"], pdf["blk_b"]
            ):
                ia = np.asarray(ids_a)
                ib = np.asarray(ids_b)
                xa = np.asarray(flat_a, dtype=np.float64).reshape(len(ia), -1)
                xb = np.asarray(flat_b, dtype=np.float64).reshape(len(ib), -1)
                na = np.linalg.norm(xa, axis=1)
                nb = np.linalg.norm(xb, axis=1)
                la, lb = na > 0.0, nb > 0.0
                ia, xa, na = ia[la], xa[la], na[la]
                ib, xb, nb = ib[lb], xb[lb], nb[lb]
                if len(ia) == 0 or len(ib) == 0:
                    continue
                sim = np.round((xa @ xb.T) / (na[:, None] * nb[None, :]), 6)
                mask = sim >= threshold
                if blk_a == blk_b:
                    # id-VALUE upper triangle, not a positional one: the
                    # two sides are independent evaluations of the packed
                    # collect_list and nothing guarantees their element
                    # orders agree — comparing id values keeps each
                    # unordered pair exactly once and drops the self-pair
                    # under ANY permutation (review round-7)
                    mask &= ia[:, None] < ib[None, :]
                ra, rb = np.nonzero(mask)
                pa, pb, ps = ia[ra], ib[rb], sim[ra, rb]
                if len(pa):
                    outs.append(
                        pd.DataFrame(
                            {
                                "id_a": np.minimum(pa, pb),
                                "id_b": np.maximum(pa, pb),
                                "cosine_sim": ps,
                            }
                        )
                    )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return tiles.mapInPandas(gemm_tiles, schema=schema)


def semantic_dedup(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 8,
    id_col: str = "vec_id",
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    max_cluster_size: int | None = None,
    engine: str = "auto",
) -> DataFrame:
    """SemDeDup-shaped semantic deduplication (Abbas et al. 2023, public):
    cluster the embedding space with seeded k-means (bounded driver-side
    sample — ``similarity.train_ivf_centroids``), then within each cluster
    drop every vector that has a LOWER-id neighbor at cosine >=
    ``threshold``. Near-duplicate semantic content (paraphrases, template
    clones) collapses to one representative per duplicate set; the keep
    rule is deterministic (lowest id wins) and partitioning-independent.

    Two invariants follow from the rule (pinned by
    ``tests/test_curation_ops.py`` and the ``semantic_dedup_gate`` catalog
    row): no two SURVIVORS in the same cluster are within ``threshold`` of
    each other (if x < y survived with cos >= t, y had a lower-id neighbor
    — contradiction), and every dropped vector has an in-cluster lower-id
    neighbor at >= ``threshold`` (which may itself be dropped — the
    chained case collapses a,b,c to a even when cos(a,c) < t, the standard
    transitive-collapse behavior of keep-first dedup).

    Scale shape: one narrow shuffle on the cluster id; pairwise cosine is
    per-cluster (cap degenerate clusters with ``max_cluster_size``); the
    drop set is ids-only. Returns the surviving rows of ``vectors``.
    """
    from .similarity import train_ivf_centroids

    if centroids is None:
        centroids = train_ivf_centroids(
            vectors.select(F.col(id_col).alias("id"), "embedding"),
            n_lists=n_clusters,
            seed=seed,
        )
    pairs = semantic_dedup_pairs(
        vectors,
        centroids,
        threshold=threshold,
        id_col=id_col,
        max_cluster_size=max_cluster_size,
        engine=engine,
    )
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return vectors.join(dropped, id_col, "left_anti")


# ------------------------------------------------- incremental semantic ----
#
# The persisted-store lifecycle for SemDeDup-style dedup, completing the
# incremental family (exact: content-hash store via exact_dedup; MinHash:
# dedup.minhash_*_store; winnowing: dedup.winnow_*_store): the landed
# corpus is never re-assigned or re-scored — only each ingest batch is,
# against frozen centroids, and its cosine comparisons run only inside the
# clusters the batch actually touches (partition-pruned store read).


def semantic_store_rows(
    vectors: DataFrame, centroids: list[list[float]], id_col: str = "vec_id"
) -> DataFrame:
    """(id, embedding, list_id): the persisted store form for incremental
    semantic dedup — exactly ``similarity.ivf_assign``'s output against the
    store's FROZEN centroids (assignment is deterministic, so stored and
    freshly-computed rows are interchangeable — the property every
    incremental-dedup store here rests on)."""
    from .similarity import ivf_assign

    return ivf_assign(vectors, centroids, id_col=id_col)


def write_semantic_store(
    store_df: DataFrame,
    path: str,
    *,
    centroids: list[list[float]],
    mode: str = "append",
) -> None:
    """Persist ``semantic_store_rows`` partitioned by ``list_id`` (the IVF
    index layout — incremental runs read ONLY the batch-touched cluster
    partitions) with a ``_semantic_params`` JSON sidecar recording the
    frozen centroids. Appends validate the sidecar first: rows assigned
    under different centroids belong to different cluster geometries, and
    a silent mix would miss in-cluster neighbors nondeterministically.
    ``mode='overwrite'`` is a rebuild — staging-dir atomic swap with the
    new sidecar written into staging before the swap (same ordering
    discipline as ``dedup.write_minhash_store``).

    Appending onto a STREAMING-layout store (``stream_semantic_dedup``
    nests ``list_id`` under ``__batch_id``) is rejected: a flat
    ``list_id``-partitioned append next to the nested dirs would break
    partition discovery for every later read (round-6 review). A
    streaming store grows through its stream; batch backfills go through
    ``mode='overwrite'`` or their own store."""
    from ..sources.writers import atomic_swap_write

    if mode == "overwrite":
        atomic_swap_write(
            store_df,
            path,
            partition_by=["list_id"],
            finalize_staging=lambda staging: _write_semantic_sidecar(staging, centroids),
        )
        return
    existing = _store_columns_or_none(store_df.sparkSession, path)
    if existing is not None and "__batch_id" in existing:
        raise ValueError(
            f"semantic store at {path} has the streaming (__batch_id) layout; "
            "a flat batch append would corrupt partition discovery — append "
            "through stream_semantic_dedup or rebuild with mode='overwrite'"
        )
    ensure_semantic_params_sidecar(path, centroids=centroids)
    store_df.write.mode(mode).partitionBy("list_id").parquet(path)


def _store_columns_or_none(spark, path: str) -> list[str] | None:
    """Column names of an existing parquet store, ``None`` if absent/empty
    (delegates to the canonical ``sources.readers.read_parquet_or_none``)."""
    from ..sources.readers import read_parquet_or_none

    df = read_parquet_or_none(spark, path)
    return None if df is None else df.columns


def _write_semantic_sidecar(path: str, centroids: list[list[float]]) -> None:
    import os

    from .dedup import _write_params_sidecar

    _write_params_sidecar(
        os.path.join(path, "_semantic_params.json"), {"centroids": centroids}
    )


def ensure_semantic_params_sidecar(path: str, *, centroids: list[list[float]]) -> None:
    """Write-or-validate the ``_semantic_params`` sidecar — the single entry
    point every semantic-store writer calls before its first data write,
    mirroring ``dedup.ensure_minhash_params_sidecar``. Validation is exact
    float equality: JSON round-trips Python floats losslessly, and the
    centroids either ARE the store's frozen ones or they are not."""
    import json
    import os

    from ..sources.writers import recover_interrupted_swap

    # heal a hard-crashed atomic_swap_write FIRST: in the window between
    # its two renames the store dir is missing (its contents — including
    # this sidecar — sit in a .backup sibling), and recreating the dir
    # with a fresh sidecar here would make the later recovery pass treat
    # the backup as post-swap litter and DELETE it (round-7 review).
    recover_interrupted_swap(path)
    sidecar = os.path.join(path, "_semantic_params.json")
    if os.path.exists(sidecar):
        with open(sidecar, encoding="utf-8") as f:
            stored = json.load(f)["centroids"]
        if stored != [list(map(float, c)) for c in centroids]:
            raise ValueError(
                f"semantic store centroid mismatch at {path}: rows were "
                "assigned under different frozen centroids — rebuild the "
                "store (mode='overwrite') to retrain"
            )
        return
    os.makedirs(path, exist_ok=True)
    _write_semantic_sidecar(path, centroids)


def read_semantic_store(spark, path: str) -> tuple[list[list[float]], DataFrame]:
    """(centroids, rows) of a persisted semantic store — the centroids come
    from the sidecar, so callers can't accidentally pair the rows with a
    retrained geometry."""
    import json
    import os

    from ..sources.writers import recover_interrupted_swap

    # heal a hard-crashed atomic_swap_write FIRST: in the window between
    # its two renames the store dir is missing (its contents — including
    # this sidecar — sit in a .backup sibling), and recreating the dir
    # with a fresh sidecar here would make the later recovery pass treat
    # the backup as post-swap litter and DELETE it (round-7 review).
    recover_interrupted_swap(path)
    sidecar = os.path.join(path, "_semantic_params.json")
    with open(sidecar, encoding="utf-8") as f:
        centroids = json.load(f)["centroids"]
    return centroids, spark.read.parquet(path)


def semantic_dedup_pairs_incremental(
    new_vectors: DataFrame,
    store: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    max_cluster_size: int | None = None,
    include_batch_pairs: bool = True,
    new_assigned: DataFrame | None = None,
) -> DataFrame:
    """In-cluster cosine pairs for an INCREMENTAL ingest batch: every pair
    at cosine >= ``threshold`` where at least one side is new — exactly
    ``semantic_dedup_pairs(old ∪ new)`` restricted to pairs touching the
    batch (equivalence pinned by ``tests/test_curation_ops.py``), but the
    landed corpus is never re-assigned: its (id, embedding, list_id) store
    rows join in as-is, and only the partitions of clusters the batch
    touches are read at all (the probed-cluster set is a driver-side
    scalar list bounded by n_clusters — a ``list_id``-partitioned store
    prunes every other partition). Ids must be disjoint between batch and
    store.

    Per-cluster work is ONE rectangular BLAS matmul (batch rows x combined
    rows) — cost per batch ∝ |batch| x touched-cluster sizes, never
    store². ``max_cluster_size`` caps clusters by their COMBINED size
    (same census semantics as ``dedup.minhash_dedup_incremental``).
    ``include_batch_pairs=False`` keeps only batch-vs-store pairs — the
    semantic tier of benchmark decontamination (store the eval set's
    embeddings once, screen every batch against them). Returns
    (id_a, id_b, cosine_sim) with id_a < id_b.

    The batch assignment is consumed twice (the driver-side touched-cluster
    collect, then the per-cluster job) so it materializes ONCE via an eager
    ``localCheckpoint`` instead of re-running the Arrow matmul per consumer
    (round-6 review). Callers that already hold the batch's
    ``semantic_store_rows`` frame MATERIALIZED (e.g. ``stream_semantic_dedup``,
    which writes those rows to the store anyway) pass it as ``new_assigned``
    and the assignment runs exactly once per batch overall."""
    import numpy as np
    import pandas as pd

    from .dedup import _drop_hot_buckets
    from .similarity import ivf_assign

    if new_assigned is None:
        new_assigned = ivf_assign(new_vectors, centroids, id_col=id_col).localCheckpoint(
            eager=True
        )
    assigned_new = new_assigned.withColumn("is_new", F.lit(True))
    touched = [
        r["list_id"] for r in assigned_new.select("list_id").distinct().collect()
    ]
    old = (
        store.filter(F.col("list_id").isin(touched))
        .select("id", "embedding", "list_id")
        .withColumn("is_new", F.lit(False))
    )
    combined = assigned_new.select("id", "embedding", "list_id", "is_new").unionByName(old)
    if max_cluster_size is not None:
        combined = _drop_hot_buckets(combined, ["list_id"], max_cluster_size)
    id_type = dict(assigned_new.dtypes)["id"]
    schema = f"id_a {id_type}, id_b {id_type}, cosine_sim double"
    empty = pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []})

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        new_mask = pdf["is_new"].to_numpy()
        if not new_mask.any() or len(pdf) < 2:
            return empty
        x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        ids = pdf["id"].to_numpy()
        norms = np.linalg.norm(x, axis=1)
        live = norms > 0.0
        x, ids, norms, new_mask = x[live], ids[live], norms[live], new_mask[live]
        ni = np.flatnonzero(new_mask)
        if len(ids) < 2 or not len(ni):
            return empty
        sim = (x[ni] @ x.T) / (norms[ni, None] * norms[None, :])
        s = np.round(sim, 6)
        rows_i, cols_j = np.nonzero(s >= threshold)
        a_idx, b_idx = ni[rows_i], cols_j
        # each qualifying pair exactly once: batch-vs-old always from the
        # batch row; batch-vs-batch only from the lower-index side
        if include_batch_pairs:
            keep = (~new_mask[b_idx]) | (a_idx < b_idx)
        else:
            keep = ~new_mask[b_idx]
        a_idx, b_idx = a_idx[keep], b_idx[keep]
        ia, ib = ids[a_idx], ids[b_idx]
        return pd.DataFrame(
            {
                "id_a": np.minimum(ia, ib),
                "id_b": np.maximum(ia, ib),
                "cosine_sim": s[rows_i[keep], cols_j[keep]],
            }
        )

    return combined.groupBy("list_id").applyInPandas(per_cluster, schema=schema)


def semantic_dedup_incremental(
    new_vectors: DataFrame,
    store: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    max_cluster_size: int | None = None,
) -> DataFrame:
    """Surviving rows of an ingest batch under the store's keep-lowest-id
    rule: a new vector is dropped iff it has an in-cluster neighbor at
    cosine >= ``threshold`` with a LOWER id — in the store or in the batch.
    With batch ids above all store ids (the natural monotonic-ingest
    shape), running batches through this sequentially (appending
    ``semantic_store_rows`` of the FULL batch after each run, so later
    chained near-dups still resolve to the original representative) yields
    exactly the batch ``semantic_dedup`` survivors over the combined corpus
    with the same frozen centroids — pinned by
    ``tests/test_curation_ops.py``. Old rows a new lower-id vector would
    retroactively displace are (by the same rule) never displaced: ids
    encode arrival, first arrival wins."""
    pairs = semantic_dedup_pairs_incremental(
        new_vectors,
        store,
        centroids,
        threshold=threshold,
        id_col=id_col,
        max_cluster_size=max_cluster_size,
    )
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return new_vectors.join(dropped, id_col, "left_anti")


def compact_semantic_store(
    spark,
    path: str,
    *,
    live_ids: DataFrame | None = None,
    drop_ids: DataFrame | None = None,
    id_col: str = "vec_id",
) -> None:
    """Bound semantic-store growth: rewrite keeping only live vectors'
    rows (``live_ids`` left-semi / ``drop_ids`` left-anti — exactly one),
    through the staging atomic swap with the sidecar re-created in staging
    and the store's partition layout preserved — ``list_id`` for a batch
    store, ``__batch_id``/``list_id`` for a streaming one (round-6 review:
    a flat-to-``list_id`` rewrite of a streaming store would leave the next
    micro-batch's ``__batch_id`` write in a mixed layout Spark cannot
    read) — so probed-cluster pruning and later appends keep working.
    Assignments are deterministic per vector, so dropping rows never
    changes surviving pairs: an incremental run against the compacted
    store equals one against a store rebuilt from the surviving corpus
    (pinned by ``tests/test_curation_ops.py``)."""
    from ..sources.writers import atomic_swap_write

    if (live_ids is None) == (drop_ids is None):
        raise ValueError("pass exactly one of live_ids / drop_ids")
    centroids, store = read_semantic_store(spark, path)
    ids = (live_ids if live_ids is not None else drop_ids).select(
        F.col(id_col).alias("id")
    ).distinct()
    how = "left_semi" if live_ids is not None else "left_anti"
    kept = store.join(ids, "id", how)
    part_by = (
        ["__batch_id", "list_id"] if "__batch_id" in store.columns else ["list_id"]
    )
    atomic_swap_write(
        kept,
        path,
        partition_by=part_by,
        finalize_staging=lambda staging: _write_semantic_sidecar(staging, centroids),
    )


def hyperplane_lsh_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_bits: int = 16,
    max_hamming: int = 2,
    seed: int = 42,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Cosine near-dup candidate pairs via random-hyperplane LSH (the
    SimHash-for-embeddings construction): project each vector onto
    ``n_bits`` seeded random hyperplanes, pack the sign bits into a long,
    and keep pairs within ``max_hamming`` sign flips. P[bit differs] =
    angle/pi, so small Hamming distance tracks high cosine similarity.
    Pure DataFrame ops — signatures are one codegen'd projection; the
    Hamming-threshold self-join is pigeonhole multi-band
    (``dedup.hamming_band_pairs``): ``max_hamming + 1`` disjoint signature
    bands, so every pair within ``max_hamming`` shares at least one band
    bucket — EXACT recall of the Hamming predicate, never N×N. (Replaces
    the round-3 high-bit prefix block, whose recall was only
    probabilistic.) ``max_bucket_size`` caps degenerate buckets at corpus
    scale (audit with ``dedup.oversized_buckets``). Complements
    ``similarity.lsh_topk`` (MLlib, Euclidean) with a dependency-free
    cosine variant. Note the usual LSH caveat is UPSTREAM of the join: the
    signature itself is a lossy sketch of cosine similarity; the blocking
    no longer loses any pair the signature admits.
    """
    from .dedup import hamming_band_pairs

    signed = hyperplane_signatures(df, id_col=id_col, emb_col=emb_col, n_bits=n_bits, seed=seed)
    if signed is None:
        # empty-frame schema must match the non-empty path, which types
        # id_a/id_b from the INPUT id column (round-7 review: a hardcoded
        # long here changed the output schema with emptiness)
        id_type = df.schema[id_col].dataType.simpleString()
        return df.sparkSession.createDataFrame(
            [], f"id_a {id_type}, id_b {id_type}, hamming int"
        )
    return hamming_band_pairs(
        signed, id_col, "s", n_bits=n_bits, max_hamming=max_hamming, max_bucket_size=max_bucket_size
    )


def hyperplane_signatures(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_bits: int = 16,
    seed: int = 42,
) -> DataFrame | None:
    """(id, s): the ``n_bits``-bit random-hyperplane sign signature used by
    ``hyperplane_lsh_pairs`` — exposed so callers can compare the blocked
    join against an unblocked all-pairs Hamming scan (the recall gate in
    the catalog). One codegen'd projection; returns ``None`` on a frame
    with no non-null embedding (no dimension to probe). The dimension
    probe skips null embeddings (round-7 review: a null FIRST row made
    ``dim`` None and crashed the driver); null-embedding ROWS themselves
    sign to an all-zero signature (dot of null is null → every ``when``
    falls to 0), the same every-null-in-one-bucket behavior the banded
    joins already cap via ``max_bucket_size``."""
    import random as _random

    rng = _random.Random(seed)
    dim_probe = (
        df.filter(F.col(emb_col).isNotNull()).select(F.size(emb_col).alias("d")).first()
    )
    if dim_probe is None:
        return None
    dim = dim_probe["d"]
    planes = [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]

    bits = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                F.col(emb_col),
                F.array(*[F.lit(v) for v in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits = bits.bitwiseOR(F.shiftleft(F.when(proj >= 0, 1).otherwise(0).cast("long"), b))
    return df.select(F.col(id_col), bits.alias("s"))


# --------------------------------------------------------------------------
# Deterministic domain-mixture sampling to a token budget — the "data
# mixing" step of a training pipeline: given target domain weights (e.g.
# web 60 / code 25 / books 15) and a total token budget, select documents
# so each domain contributes (up to availability) its weighted share.
# --------------------------------------------------------------------------


def mixture_targets(weights: dict[str, float], token_budget: int) -> dict[str, int]:
    """Per-domain token targets: floor(budget * w / sum(w)). Fractions of a
    token are dropped rather than redistributed — targets are reproducible
    from (weights, budget) alone, which the sampling guarantee below
    depends on."""
    if token_budget < 0:
        raise ValueError(f"token_budget must be >= 0 (got {token_budget})")
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for w in weights.values()):
        raise ValueError(f"weights must be >= 0 (got {weights})")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("sum of weights must be > 0")
    return {d: int(token_budget * w / total) for d, w in weights.items()}


def temperature_weights(
    sizes: dict[str, float], alpha: float = 0.3
) -> dict[str, float]:
    """Temperature-flattened mixture weights from raw per-domain masses:
    ``w_d ∝ n_d^alpha``, normalized to sum 1 — the standard multilingual /
    multi-source sampling rule (Conneau & Lample, NeurIPS 2019 §3.1;
    alpha=0.3 is the published XLM default; alpha=1 keeps natural
    proportions, alpha=0 gives the uniform mixture). Feed the raw masses
    straight from ``plans/quality.corpus_stats`` (or the incremental
    ``read_corpus_stats``) ``tok_sum`` column and pass the result to
    ``mixture_targets`` — the full rebalance-to-budget pipeline is
    stats → temperature_weights → mixture_targets → sample_token_mixture.

    Driver-side arithmetic over the (small) per-domain stats dict — the
    corpus-scale work already happened in the ONE stats groupBy."""
    if not sizes:
        raise ValueError("sizes must be non-empty")
    if any(n < 0 for n in sizes.values()):
        raise ValueError(f"sizes must be >= 0 (got {sizes})")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0 (got {alpha})")
    powered = {d: float(n) ** alpha if n > 0 else 0.0 for d, n in sizes.items()}
    total = sum(powered.values())
    if total <= 0:
        raise ValueError("at least one domain must have positive mass")
    return {d: p / total for d, p in powered.items()}


def _mixture_hash(id_col: str, salt: str):
    """Engine-portable deterministic shuffle key: md5 of (salt || id). The
    same expression DuckDB evaluates identically (the ``train_test_split``
    portability trick), so the selection is reproducible across engines,
    partitionings, and retries — unlike ``sample()``/``randomSplit``."""
    return F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))


def _mixture_tok(token_col: str | None, text_col: str):
    """Per-doc token count for the mixture fill: the shared
    ``functions/text.token_count`` whitespace expression (or a caller
    column), null-coalesced to 0 so a null-text/null-count doc is a
    zero-cost keep wherever it falls in hash order — identically in the
    bucketed path, the window reference, the audit report, and the DuckDB
    oracle (an un-coalesced NULL would silently diverge: NULL survives a
    keep-all bucket but fails the ``before < target`` comparison)."""
    from ..functions.text import token_count

    c = F.col(token_col) if token_col else token_count(text_col)
    return F.coalesce(c.cast("long"), F.lit(0).cast("long"))


def _mixture_target_expr(targets: dict, domain_col: str):
    """CASE chain mapping the domain column to its token target."""
    expr = None
    for d, t in targets.items():
        cond = F.col(domain_col) == d
        expr = F.when(cond, F.lit(t)) if expr is None else expr.when(cond, F.lit(t))
    return expr


def temperature_weights_from_stats(
    stats: DataFrame,
    alpha: float = 0.3,
    domain_col: str = "source",
    mass_col: str = "tok_sum",
) -> dict[str, float]:
    """α-weights straight from a (live) dataset-card profile (round 12):
    sum the profile's ``mass_col`` per ``domain_col`` (works on any
    ``corpus_stats`` / ``read_corpus_stats`` grouping that CONTAINS the
    domain column) and temperature-flatten. With the streaming stats
    store (``streaming.pipeline.stream_stats_rows``) this makes the
    mixture pipeline's rebalance derive from the profile as it grows —
    stats → temperature_weights → mixture_targets → sample, no corpus
    re-scan. Driver-side dict over domain-count-many rows (bounded by
    construction, like every mixture target)."""
    rows = (
        stats.groupBy(domain_col)
        .agg(F.sum(mass_col).alias("__mass"))
        .collect()
    )
    return temperature_weights(
        {r[domain_col]: float(r["__mass"] or 0.0) for r in rows}, alpha
    )


def sample_token_mixture(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    domain_col: str = "source",
    token_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
    bucket_hex_digits: int = 3,
) -> DataFrame:
    """Deterministic mixture sampler: keep, per domain, the docs that come
    first in md5-hash order until the domain's token target is reached.

    SELECTION RULE (exact, order-free): doc x of domain d survives iff the
    total tokens of d-docs STRICTLY BEFORE x in (md5(salt||id), id) order is
    < target_d — i.e. each domain takes docs in a deterministic pseudo-random
    order until its budget fills; the doc that crosses the boundary is kept
    (overshoot ≤ one document), and a domain with fewer tokens than its
    target is kept whole. Domains absent from ``weights`` are dropped.
    Because the hash order is data-independent, adding unrelated documents
    never flips a selected doc except through the budget itself.

    SCALE SHAPE — no whole-domain window: a naive cumulative-sum window
    partitioned by domain puts each domain's ENTIRE doc set through one
    reducer (the hot-partition failure mode at 100 TB). Instead:

    1. map-side-combinable census: token sums per (domain, hash-prefix
       bucket) — 16^``bucket_hex_digits`` (default 4096) buckets/domain,
       a bounded driver collect like ``build_vocab``'s offset table;
    2. driver prefix-sum over each domain's ordered buckets classifies
       every bucket as keep-all / drop-all / THE boundary bucket;
    3. only the single boundary bucket per domain (~1/4096 of the domain)
       runs the exact cumulative-sum window, with the census prefix as its
       token offset.

    Equivalence with the one-window formulation is pytest-pinned, and the
    ``mixture_sample_docs`` oracle re-derives the selection as a plain
    DuckDB window. Returns the surviving rows (original columns).
    """
    targets = mixture_targets(weights, token_budget)
    base = (
        df.filter(F.col(domain_col).isin(list(targets)))
        .withColumn("__tok", _mixture_tok(token_col, text_col))
        .withColumn("__h", _mixture_hash(id_col, salt))
        .withColumn("__bkt", F.substring("__h", 1, bucket_hex_digits))
    )
    from pyspark.sql.types import StringType

    return _bucketed_fill(
        df,
        base,
        targets,
        domain_col,
        StringType(),
        [F.col("__h").asc(), F.col(id_col).asc()],
    )


def _bucketed_fill(
    df: DataFrame,
    base: DataFrame,
    targets: dict,
    domain_col: str,
    bucket_dtype,
    order_cols: list,
) -> DataFrame:
    """Shared two-phase fill: ``base`` carries ``__tok`` (null-free token
    counts) and ``__bkt`` (a bucket key MONOTONE in the intended per-domain
    order, whose within-bucket refinement is ``order_cols``). Census per
    (domain, bucket) → driver prefix-sum classifies keep-all / boundary /
    drop → only boundary buckets run the exact cumulative-sum window.
    Selection rule: a doc survives iff the domain's tokens strictly before
    it (bucket order, then ``order_cols``) < target."""
    spark = df.sparkSession
    census = (
        base.groupBy(domain_col, "__bkt")
        .agg(F.sum("__tok").alias("__btok"))
        .collect()
    )
    by_domain: dict = {}
    for r in census:
        by_domain.setdefault(r[domain_col], []).append((r["__bkt"], r["__btok"]))

    keep_all: list[tuple] = []       # (domain, bucket)
    boundary: list[tuple] = []       # (domain, bucket, token offset)
    for d, buckets in by_domain.items():
        target, cum = targets[d], 0
        for bkt, btok in sorted(buckets):
            if cum >= target:
                break  # this and later buckets: every doc's prefix >= target
            if cum + btok < target:
                keep_all.append((d, bkt))
            else:
                # the one bucket whose docs straddle the target (also covers
                # cum+btok == target: a trailing zero-token doc there has
                # prefix == target and must drop — window decides)
                boundary.append((d, bkt, cum))
            cum += btok

    out_cols = df.columns
    if not keep_all and not boundary:
        return df.filter(F.lit(False)).select(*out_cols)

    # typed schemas from the input (not DDL strings): domain_col may be
    # non-string (int domain ids) or a non-identifier name
    from pyspark.sql.types import LongType, StructField, StructType

    domain_field = StructField(domain_col, df.schema[domain_col].dataType)
    bucket_field = StructField("__bkt", bucket_dtype)
    parts = []
    if keep_all:
        ka = spark.createDataFrame(
            keep_all, schema=StructType([domain_field, bucket_field])
        )
        parts.append(base.join(F.broadcast(ka), [domain_col, "__bkt"], "left_semi"))
    if boundary:
        from pyspark.sql import Window

        bd = spark.createDataFrame(
            boundary,
            schema=StructType([domain_field, bucket_field, StructField("__off", LongType())]),
        )
        w = (
            Window.partitionBy(domain_col, "__bkt")
            .orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        target_expr = _mixture_target_expr(targets, domain_col)
        prefix = F.sum("__tok").over(w) - F.col("__tok") + F.col("__off")
        parts.append(
            base.join(F.broadcast(bd), [domain_col, "__bkt"])
            .withColumn("__before", prefix)
            .filter(F.col("__before") < target_expr)
        )
    out = parts[0] if len(parts) == 1 else parts[0].select(*out_cols).unionByName(
        parts[1].select(*out_cols)
    )
    return out.select(*out_cols)


def sample_token_mixture_ordered(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    order_col: str,
    domain_col: str = "source",
    token_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
    n_buckets: int = 4096,
) -> DataFrame:
    """Quality-ordered mixture fill: like ``sample_token_mixture`` but each
    domain takes docs in ASCENDING ``order_col`` order (negate the column
    for best-first, e.g. ``-quality``) until its token target fills — the
    curation shape "keep each domain's best documents up to its weighted
    share". Ties (equal ``order_col``) break by the same md5 hash then id,
    so the selection stays deterministic and engine-portable; null order
    values sort LAST (selected only if budget remains after every ranked
    doc).

    Same two-phase scale discipline as the hash-ordered fill, with the
    hash-prefix bucket replaced by a VALUE-RANGE bucket: one narrow
    min/max aggregate fixes the global range, docs bucket by
    ``floor((v - lo) / span * n_buckets)`` (monotone in the fill order, so
    the census prefix-sum classification is exact), and only each domain's
    boundary bucket runs a window. A heavily skewed order column degrades
    gracefully — a fat boundary bucket just means a bigger window, never a
    wrong answer (equivalence with the one-window reference is
    pytest-pinned; degenerate all-equal order values collapse to a single
    boundary bucket = the reference formulation itself)."""
    targets = mixture_targets(weights, token_budget)
    pre = (
        df.filter(F.col(domain_col).isin(list(targets)))
        .withColumn("__tok", _mixture_tok(token_col, text_col))
        .withColumn("__h", _mixture_hash(id_col, salt))
        .withColumn("__ok", F.col(order_col).cast("double"))
    )
    # NaN order values route to the null bucket, and the range aggregate
    # skips them: Spark's max() treats NaN as the largest double, so one
    # NaN (e.g. 0/0 from a degenerate doc) made hi=NaN -> span=NaN and
    # silently collapsed EVERY row into one boundary bucket — correct
    # output, but the whole domain then ran the single window the bucket
    # census exists to avoid (round-7 review). NaN sorts after every real
    # value and before nulls in asc_nulls_last order, so sharing the null
    # bucket keeps the census prefix-sum classification exact.
    not_nan = ~F.isnan("__ok") & F.col("__ok").isNotNull()
    clean = F.when(not_nan, F.col("__ok"))
    r = pre.agg(F.min(clean).alias("lo"), F.max(clean).alias("hi")).first()
    lo, hi = (r["lo"], r["hi"]) if r is not None else (None, None)
    if lo is None or hi is None or lo == hi:
        bucket = F.when(~not_nan, F.lit(n_buckets)).otherwise(F.lit(0))
    else:
        span = hi - lo
        bucket = F.when(~not_nan, F.lit(n_buckets)).otherwise(
            F.least(
                F.lit(n_buckets - 1),
                F.floor((F.col("__ok") - F.lit(lo)) / F.lit(span) * n_buckets),
            )
        )
    base = pre.withColumn("__bkt", bucket.cast("int"))
    from pyspark.sql.types import IntegerType

    return _bucketed_fill(
        df,
        base,
        targets,
        domain_col,
        IntegerType(),
        [F.col("__ok").asc_nulls_last(), F.col("__h").asc(), F.col(id_col).asc()],
    )


def sample_token_mixture_window(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    domain_col: str = "source",
    token_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
    order_col: str | None = None,
) -> DataFrame:
    """One-window reference formulation of ``sample_token_mixture`` (and,
    with ``order_col``, of ``sample_token_mixture_ordered``): whole domain
    through a single cumulative-sum window — the equivalence oracle for
    tests and small-corpus runs; NOT the scale path (hot domain = hot
    partition)."""
    from pyspark.sql import Window

    targets = mixture_targets(weights, token_budget)
    target_expr = _mixture_target_expr(targets, domain_col)
    order = [_mixture_hash(id_col, salt).asc(), F.col(id_col).asc()]
    if order_col is not None:
        order = [F.col(order_col).cast("double").asc_nulls_last()] + order
    w = (
        Window.partitionBy(domain_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out_cols = df.columns
    return (
        df.filter(F.col(domain_col).isin(list(targets)))
        .withColumn("__tok", _mixture_tok(token_col, text_col))
        .withColumn("__before", F.sum("__tok").over(w) - F.col("__tok"))
        .filter(F.col("__before") < target_expr)
        .select(*out_cols)
    )


def mixture_report(
    sampled: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    domain_col: str = "source",
    token_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Audit twin of ``sample_token_mixture`` (the same discipline as the
    capped-join audits): per-domain (target_tokens, selected_tokens,
    selected_docs). ``selected_tokens`` < target means the domain was
    EXHAUSTED (kept whole but couldn't fill its share) — the signal to
    re-weight or up-sample; > target is the ≤ 1-doc overshoot."""
    targets = mixture_targets(weights, token_budget)
    target_expr = _mixture_target_expr(targets, domain_col)
    return (
        sampled.groupBy(domain_col)
        .agg(
            F.sum(_mixture_tok(token_col, text_col)).alias("selected_tokens"),
            F.count(F.lit(1)).alias("selected_docs"),
        )
        .withColumn("target_tokens", target_expr)
        .select(domain_col, "target_tokens", "selected_tokens", "selected_docs")
    )


def drop_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 5,
    min_line_chars: int = 4,
    clean_col: str = "clean_text",
    materialize_lines: bool = False,
) -> DataFrame:
    """CCNet-style cross-document line dedup: a line occurring in >=
    ``min_docs`` DISTINCT documents is boilerplate (navigation, cookie
    banners, legal footers — the dominant web-corpus noise after
    whole-document dedup) and is removed from EVERY document. Complements
    ``functions/text.dedup_lines`` (intra-document repetition).

    Scale shape: posexplode lines (map) → distinct-doc census per line
    (map-side-combinable aggregate on line keys) → anti-join the census's
    boilerplate set back (AQE broadcasts it when small — the usual case:
    only lines crossing the threshold survive the census filter) →
    per-doc reassembly in original line order via one groupBy. Two key
    shuffles total, nothing driver-side, no N×N. The census and the
    anti-join probe each run the split+explode map once (they prune to
    different columns, so no exchange is shareable between them — a cheap
    re-scan by design); ``materialize_lines=True`` instead materializes
    the exploded lines once (``localCheckpoint``) and feeds both from
    storage — worth it when the input is itself an expensive subplan
    rather than a parquet scan.

    Lines shorter than ``min_line_chars`` after trimming are never treated
    as boilerplate (empty lines and one-word connectors are legitimately
    ubiquitous). Returns every input row (all columns) plus ``clean_col``
    — documents whose every line was boilerplate get '' — and
    ``n_lines_in`` / ``n_lines_out`` counts for the removal audit.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "pos", "line"
        ),
    )
    if materialize_lines:
        lines = lines.localCheckpoint(eager=True)
    # the distinct-doc count is written as distinct -> count rather than
    # countDistinct: both aggregates' ClusteredDistribution is satisfied by
    # the existing hashpartitioning(line) (subset rule), so the census adds
    # no exchange of its own — countDistinct's internal distinct-aggregate
    # path demands a (line, doc_id) exchange and breaks the reuse
    boiler = (
        lines.filter(F.length(F.trim("line")) >= min_line_chars)
        .select("line", id_col)
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("line")
    )
    kept = lines.join(boiler, "line", "left_anti")
    assembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))), lambda s: s.line
            ),
            "\n",
        ).alias(clean_col),
        F.count(F.lit(1)).alias("n_lines_out"),
    )
    return (
        df.withColumn(
            "n_lines_in",
            F.size(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")),
        )
        .join(assembled, id_col, "left")
        .withColumn(clean_col, F.coalesce(F.col(clean_col), F.lit("")))
        .withColumn("n_lines_out", F.coalesce("n_lines_out", F.lit(0)).cast("long"))
    )


def dedup_passages(
    df: DataFrame,
    window: int = 10,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-corpus duplicated-PASSAGE removal (the ExactSubstr discipline
    of Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better", public): any run of ``window`` consecutive whitespace tokens
    whose exact sequence occurs >= ``min_count`` times across the corpus
    (cross-doc or within-doc) is masked out of EVERY document — boilerplate
    paragraphs, license blocks, and templated passages vanish while the
    surrounding unique prose survives. Complements the whole-doc tiers
    (exact/MinHash/SimHash drop documents; this rewrites them), winnowing
    (which DETECTS overlap; this removes it) and line-level boilerplate
    (``dedup_lines`` needs newline structure; this does not).

    Semantics (pinned by the ``dedup_passages_docs`` rotated oracle):
    tokens are the ``\\s+`` split; a token is removed iff SOME duplicated
    window covers it (the union of covered positions, so overlapping
    duplicated windows merge into one excised span); the cleaned text is
    the kept tokens joined by single spaces (canonical whitespace — same
    normalization the tokenization implies). Docs shorter than ``window``
    tokens have no windows and pass through (canonicalized). Removal is
    symmetric — every occurrence goes, including the first: at >=
    ``min_count`` occurrences the passage is template mass, not content
    (keep-one-occurrence variants need a global argmin per window chain,
    which buys little for training corpora).

    Scale shape: pure codegen end-to-end (PLANS.md: rowwise-py 0). The
    window explode reuses the codegen shingle pattern (posexplode over a
    sequence, slice + concat_ws + xxhash64 — no interpreted lambda); the
    duplicate census is ONE narrow (hash, count) shuffle with map-side
    combine; marked positions explode only DUPLICATED windows (bounded by
    dup occurrences x window, not corpus x window) and are materialized
    once (localCheckpoint — they are small by construction). Only TOUCHED
    documents (those that lost >= 1 position) enter the token-level
    posexplode → anti-join → doc_id-partitioned sort_array rebuild;
    untouched docs — the overwhelming majority at production dup rates —
    get the byte-identical canonical output via a pure explode-free
    projection (``array_join`` over the token array). Token mass therefore
    never shuffles for untouched docs; the shuffles that remain are the
    narrow census, the small removed-position distinct, and the
    touched-doc rebuild. Nothing quadratic."""
    base, wins = _passage_windows(df, window, text_col, id_col)
    dup = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= min_count)
        .select("h")
    )
    return _passage_clean(base, wins, dup, window, id_col)


def _passage_windows(df, window, text_col, id_col):
    """(base = (id, __t tokens, __n), wins = (id, pos, h)) — the codegen
    window explode shared by the full and incremental passage dedups.
    Positions are 0-based over the token array."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit(""))
    # NULL text → empty token array, not NULL-propagating counts (round-8
    # review: audit sums must see 0, matching drop_boilerplate_lines'
    # null-doc discipline)
    base = df.select(
        F.col(id_col), F.coalesce(toks, F.array().cast("array<string>")).alias("__t")
    ).withColumn("__n", F.size("__t"))
    # NB: sequence(0, -1) DESCENDS in Spark — docs shorter than the window
    # must take the empty-array branch, not a negative stop
    starts = F.when(
        F.col("__n") >= window, F.sequence(F.lit(0), F.col("__n") - window)
    ).otherwise(F.array().cast("array<int>"))
    wins = base.select(
        id_col,
        F.posexplode(
            F.transform(
                starts,
                lambda i: F.xxhash64(F.concat_ws(" ", F.slice("__t", i + 1, window))),
            )
        ).alias("pos", "h"),
    )
    return base, wins


def _passage_clean(base, wins, dup, window, id_col):
    """Mask every token covered by a window whose hash is in ``dup`` and
    rebuild (id, clean_text, n_tokens, n_removed).

    Only documents that actually LOST a position enter the token-level
    posexplode → anti-join → collect_list rebuild; every untouched
    document (the overwhelming majority at production dup rates) takes a
    pure projection — ``array_join(__t, ' ')`` is byte-identical to the
    rebuild's join-by-single-space over all-kept tokens, and costs no
    explode and no shuffle. ``removed`` (bounded by duplicate occurrences
    × window, never corpus size) is localCheckpointed once and feeds the
    touched-doc semi-join, the position anti-join, and the per-doc removal
    counts from storage. This deletes the two corpus-wide token-level
    shuffles the round-8 audit flagged: token mass now only shuffles for
    touched docs."""
    removed = (
        wins.join(dup, "h", "left_semi")
        .select(id_col, F.explode(F.sequence("pos", F.col("pos") + window - 1)).alias("p"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    touched = removed.select(id_col).distinct()
    touched_base = base.join(touched, id_col, "left_semi")
    tokens = touched_base.select(
        id_col, F.posexplode("__t").alias("p", "tok")
    )
    kept = tokens.join(removed, [id_col, "p"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "tok"))), lambda s: s["tok"]
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("__kept"),
    )
    # touched docs whose every token was removed still get a row: left-join
    # from the touched doc list
    touched_out = (
        touched_base.select(id_col, F.col("__n").alias("n_tokens"))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("n_tokens") - F.coalesce("__kept", F.lit(0))).cast("long").alias(
                "n_removed"
            ),
        )
    )
    untouched_out = base.join(touched, id_col, "left_anti").select(
        id_col,
        F.array_join("__t", " ").alias("clean_text"),
        F.col("__n").cast("long").alias("n_tokens"),
        F.lit(0).cast("long").alias("n_removed"),
    )
    return touched_out.unionByName(untouched_out)


_PASSAGE_PARAMS_ALGO = "xxhash64-ws-tokens-v1"


def passage_count_store(
    df: DataFrame, window: int = 10, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(h, c): the persisted store form for incremental passage dedup — one
    row per distinct window hash in the landed corpus with its occurrence
    count. Counts are additive, so per-batch stores APPEND and readers sum
    (the same merge-on-read the banded stores use for membership); nothing
    ever re-tokenizes landed text."""
    _, wins = _passage_windows(df, window, text_col, id_col)
    return wins.groupBy("h").agg(F.count(F.lit(1)).alias("c"))


def write_passage_store(
    store_df: DataFrame, path: str, *, window: int = 10, mode: str = "append"
) -> None:
    """Persist ``passage_count_store`` rows with a ``_passage_params``
    sidecar pinning the window length — appending counts built with a
    different window would silently corrupt the thresholding. Same
    lifecycle discipline as the other dedup stores (atomic rebuild on
    overwrite, sidecar-before-data on append)."""
    import os

    from ..sources.writers import atomic_swap_write
    from .dedup import _write_params_sidecar

    params = {"window": window, "algo": _PASSAGE_PARAMS_ALGO}
    if mode == "overwrite":
        atomic_swap_write(
            store_df,
            path,
            finalize_staging=lambda staging: _write_params_sidecar(
                os.path.join(staging, "_passage_params.json"), params
            ),
        )
        return
    from .dedup import _reject_streaming_layout_append

    _reject_streaming_layout_append(store_df, path, "passage-count")
    ensure_passage_params_sidecar(path, window=window)
    store_df.write.mode(mode).parquet(path)


def ensure_passage_params_sidecar(path: str, *, window: int = 10) -> None:
    """Write-or-validate the ``_passage_params`` sidecar (see
    ``write_passage_store``)."""
    import os

    from ..sources.writers import recover_interrupted_swap
    from .dedup import _validate_store_params, _write_params_sidecar

    recover_interrupted_swap(path)
    params = {"window": window, "algo": _PASSAGE_PARAMS_ALGO}
    sidecar = os.path.join(path, "_passage_params.json")
    if os.path.exists(sidecar):
        _validate_store_params(sidecar, params, label="passage-count")
        return
    os.makedirs(path, exist_ok=True)
    _write_params_sidecar(sidecar, params)


def read_passage_store(spark, path: str, *, window: int = 10) -> DataFrame:
    """Load a passage-count store, validating the window sidecar and
    summing per-batch appended rows into one count per hash."""
    ensure_passage_params_sidecar(path, window=window)
    return (
        spark.read.parquet(path)
        .groupBy("h")
        .agg(F.sum("c").alias("c"))
    )


def dedup_passages_incremental(
    new_df: DataFrame,
    store: DataFrame | None,
    window: int = 10,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    windows: "tuple[DataFrame, DataFrame] | None" = None,
    extra_dup: DataFrame | None = None,
) -> DataFrame:
    """Passage-dedup an INCREMENTAL ingest batch against the landed
    corpus's window-count store: a batch token is masked iff some covering
    window's TOTAL count (store + batch) reaches ``min_count`` — exactly
    ``dedup_passages(landed ∪ batch)`` RESTRICTED to the batch's rows
    (equivalence pinned in ``tests/test_curation_ops.py``; the restriction
    is exact because a batch doc's masking depends only on total window
    counts, never on which documents hold them). Landed documents are NOT
    retro-cleaned when a batch pushes a window over the threshold — the
    same forward-only contract as every incremental tier here (re-run
    ``dedup_passages`` over the corpus for a retroactive pass); callers
    append ``passage_count_store(batch)`` after landing so later batches
    see the new mass.

    Scale shape: batch-side window explode + ONE narrow (h, c) join
    against the store — bytes per distinct landed window, never landed
    text. ``store=None`` is the first batch (pure in-batch dedup).
    Callers that already hold the batch's ``_passage_windows`` frames
    MATERIALIZED (the streaming twin, which also derives the store's
    count rows from them) pass them as ``windows`` so the tokenize +
    explode + hash pipeline runs once per batch overall — the same
    single-compute discipline as ``minhash_dedup_incremental``'s
    ``new_banded``.

    ``extra_dup`` (a frame with an ``h`` window-hash column) adds windows
    masked UNCONDITIONALLY, regardless of counts — the composed ingest
    passes an eval corpus's window set here so benchmark decontamination
    (``decontaminate_passages`` semantics, single-occurrence threshold)
    and the >= min_count dedup run as ONE combined mask over one window
    explode and one rebuild."""
    base, wins = (
        windows if windows is not None else _passage_windows(new_df, window, text_col, id_col)
    )
    batch_counts = wins.groupBy("h").agg(F.count(F.lit(1)).alias("__bc"))
    if store is None:
        total = batch_counts.select("h", F.col("__bc").alias("__tc"))
    else:
        total = (
            batch_counts.join(store.select("h", F.col("c").alias("__sc")), "h", "left")
            .select(
                "h",
                (F.col("__bc") + F.coalesce(F.col("__sc"), F.lit(0))).alias("__tc"),
            )
        )
    dup = total.filter(F.col("__tc") >= min_count).select("h")
    if extra_dup is not None:
        dup = dup.unionByName(extra_dup.select("h")).distinct()
    return _passage_clean(base, wins, dup, window, id_col)


def decontaminate_passages(
    df: DataFrame,
    eval_df: DataFrame | None = None,
    *,
    store: DataFrame | None = None,
    window: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    eval_id_col: str | None = None,
    windows: "tuple[DataFrame, DataFrame] | None" = None,
) -> DataFrame:
    """Passage-level benchmark DECONTAMINATION (the ExactSubstr discipline
    of Lee et al. 2022 applied to eval leakage): mask every run of
    ``window`` consecutive tokens that appears ANYWHERE in the evaluation
    corpus out of every training document — a single eval occurrence
    masks, unlike ``dedup_passages``' >= min_count threshold, because one
    leaked benchmark passage is already contamination. Completes the
    decontamination family: ``contamination_check`` DETECTS documents with
    n-gram overlap (drop-or-flag tier); this one REWRITES them, keeping
    the un-leaked prose (the Lee et al. recommendation for high-value
    documents that merely quote a benchmark).

    Pass the eval corpus directly (``eval_df`` [+ ``eval_text_col`` /
    ``eval_id_col`` when its schema differs]) or, for the recurring-ingest
    shape, a persisted ``passage_count_store`` of the eval corpus
    (``store``) — build it once with ``write_passage_store``, screen every
    training batch against it, and nothing ever re-tokenizes the eval set
    (counts are ignored: membership is the contamination signal). Exactly
    one of the two must be given.

    Output schema matches ``dedup_passages``: (id, clean_text, n_tokens,
    n_removed), canonical single-space whitespace, short docs pass through
    canonicalized. Scale shape is ``dedup_passages``' minus the census:
    the eval window set replaces the >= min_count census (typically small
    enough to broadcast into the semi-join), and the round-9 touched-only
    rebuild applies — training docs with no leaked passage (the
    overwhelming majority) take the explode-free projection branch."""
    if (eval_df is None) == (store is None):
        raise ValueError("pass exactly one of eval_df / store")
    # callers holding materialized _passage_windows frames (the composed
    # ingest's decon-only mode) pass them as ``windows`` — same
    # single-compute discipline as dedup_passages_incremental
    base, wins = (
        windows if windows is not None else _passage_windows(df, window, text_col, id_col)
    )
    if eval_df is not None:
        _, ewins = _passage_windows(
            eval_df, window, eval_text_col or text_col, eval_id_col or id_col
        )
        dup = ewins.select("h").distinct()
    else:
        dup = store.select("h").distinct()
    return _passage_clean(base, wins, dup, window, id_col)


def compact_passage_store(spark, path: str, *, window: int = 10) -> None:
    """Bound passage-store growth: every batch appends its own (h, c) rows,
    so after N batches a hash held by all of them costs N rows that every
    read re-sums. Compaction group-sums the store into ONE row per hash and
    rewrites it through ``atomic_swap_write`` with the ``_passage_params``
    sidecar staged before the swap — readers see the old or the compacted
    store, never a partial one (the same lifecycle as
    ``dedup.compact_minhash_store``).

    STREAMING (``__batch_id``-partitioned) stores REJECT compaction: counts
    merged across batch partitions would double with a replayed batch's own
    partition overwrite (the replay-heal contract of
    ``stream_passage_dedup`` reads counts by excluding its own partition,
    which only works while each batch's rows stay in that batch's
    partition). Stop the stream and rebuild flat if compaction is needed.
    Counts only ever grow under the forward-only contract — there is no
    drop_ids variant because the store is keyed by window hash, not
    document."""
    from ..sources.writers import atomic_swap_write
    from .dedup import _write_params_sidecar

    from ..sources.readers import read_parquet_or_none

    ensure_passage_params_sidecar(path, window=window)
    store = read_parquet_or_none(spark, path)
    if store is None:
        return  # sidecar-only / first-batch store: nothing to compact
    if "__batch_id" in store.columns:
        raise ValueError(
            f"passage store at {path} has the streaming (__batch_id) layout; "
            "compacting it would break replayed-batch idempotence — stop the "
            "stream and rebuild the store flat first"
        )
    import os

    merged = store.groupBy("h").agg(F.sum("c").alias("c"))
    atomic_swap_write(
        merged,
        path,
        finalize_staging=lambda staging: _write_params_sidecar(
            os.path.join(staging, "_passage_params.json"),
            {"window": window, "algo": _PASSAGE_PARAMS_ALGO},
        ),
    )


def top_fraction_per_group(
    df: DataFrame,
    score_col: str,
    frac: float,
    by: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the top ``frac`` of rows by ``score_col`` within each ``by``
    group (corpus-wide when ``by`` is None) — the published
    keep-top-X%-by-classifier-score pruning step (FineWeb-Edu's scored
    cut; pairs naturally with ``functions/text.nb_score`` or
    ``lm_quality_filter``'s scores). EXACT rank semantics, not a quantile
    threshold: rows are ranked (score DESC, id ASC — the deterministic
    tie-break that keeps results engine-exact), each group keeps
    ``ceil(n_group * frac)`` rows, so the kept count is exact even when
    the cut falls inside a run of tied scores.

    Scale shape: one window over (group, score) — a single shuffle on the
    group key with a per-group sort. At 100 TB with few groups prefer the
    two-pass approximate variant (per-group ``percentile_approx``
    threshold + a broadcast join, the ``approx_percentile_prices``
    family) — exact ranking is worth its sort when the cut must be
    reproducible row-for-row, the property the oracle checks."""
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1]: got {frac}")
    for reserved in ("__rn", "__n"):
        if reserved in df.columns:
            raise ValueError(
                f"top_fraction_per_group uses a `{reserved}` working column "
                "but the input already has one — rename it first (it would "
                "be silently clobbered and dropped from the output; the "
                "assign_shards reserved-name contract)"
            )
    from fractions import Fraction

    from pyspark.sql import Window

    # exact integer arithmetic for the keep count (round-9 review): a
    # float ceil(n * frac) over-keeps one row whenever n*frac lands just
    # above its true value in binary (100 * 0.07 = 7.000000000000001 →
    # ceil 8). limit_denominator recovers the intended decimal ratio from
    # the float literal; rn <= ceil(n·num/den) ⇔ (rn-1)·den < n·num, all
    # in longs.
    num, den = _keep_frac_terms(frac, Fraction)
    part = Window.partitionBy(by) if by is not None else Window.partitionBy()
    w = part.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(part))
        .filter((F.col("__rn") - 1) * F.lit(den) < F.col("__n") * F.lit(num))
        .drop("__rn", "__n")
    )


def _keep_frac_terms(frac: float, Fraction) -> tuple[int, int]:
    """(num, den) such that the exact keep count is ``ceil(n*num/den)`` in
    pure longs — the ONE keep-count arithmetic both top-fraction forms
    share (a float ``ceil(n*frac)`` over-keeps on binary artifacts like
    100*0.07 = 7.000000000000001)."""
    r = Fraction(float(frac)).limit_denominator(10**9)
    return r.numerator, r.denominator


def top_fraction_approx(
    df: DataFrame,
    score_col: str,
    frac: float,
    by: str | None = None,
    id_col: str = "doc_id",
    accuracy: int = 10_000,
) -> DataFrame:
    """``top_fraction_per_group`` with the SAME exact-kept-set contract but
    the 100 TB plan shape (round-9 verdict item 2): the exact form's one
    window serializes each group's FULL sort through a single reducer —
    fatal when ``by`` is None or has few groups (languages, domains). This
    form never sorts more than the boundary BAND of a group:

    1. **Probe pass** — per group: exact ``n`` and two
       ``percentile_approx`` probes at ``1-frac ∓ 4/accuracy`` (constant
       fractions, so one map-side-combined agg) bracketing the cutoff
       value; keep count ``k = ceil(n·frac)`` in exact long arithmetic.
    2. **Census pass** — broadcast the per-group (v_lo, v_hi); exactly
       count ``a = |score > v_hi|`` and ``m = |v_lo ≤ score ≤ v_hi|``.
    3. **Cut pass** — where ``a ≤ k ≤ a+m`` (the sketch kept its rank
       guarantee): keep every row above the band outright and rank ONLY
       the band (~``4n/accuracy`` rows + value ties at the probes) by the
       exact form's (score DESC, id ASC) tie-break, keeping ``k-a``.
       Groups where the bracket failed (possible only on sketch-guarantee
       violation, all-NULL scores, or ``k`` exceeding the non-null count)
       fall back to the exact window FOR THOSE GROUPS ONLY — correctness
       never rests on the sketch, it only sizes the sorted set.

    The kept set is row-for-row IDENTICAL to ``top_fraction_per_group``
    (equivalence property-tested on tie-heavy fixtures): above-band rows
    are exactly the rows outranking every band row; a boundary tie run
    lands wholly inside the band (v_lo = v_hi = the tied value) where the
    id ASC tie-break resolves it. Inherent limit: a group whose scores
    are ALL one value degenerates to band = group — exact tie-breaking
    among T tied rows requires ranking T rows in any scheme.

    Scale shape: two map-side-combined agg scans (probe, census) + the
    three cut branches' filter scans, per-group metadata pinned
    (lazy ``localCheckpoint`` — one row per group; reuse is also a
    CORRECTNESS requirement, see the inline note) and broadcast, and a
    window over only the band. No full-group sort on any reducer at any
    group count — the plan-shape test pins every window input to the
    band/fallback bracket. Honest bound: the BAND itself still ranks
    one task per group (corpus-wide = one task), sized ``~4n/accuracy``
    plus value ties at the probes — ~400 rows per million at the default
    ``accuracy=10_000``; raise ``accuracy`` to shrink it (the sketch
    costs O(accuracy·log n) memory), and a value tie-run at the cut
    inherently needs its whole run ranked in one place."""
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1]: got {frac}")
    if accuracy < 100:
        raise ValueError(f"accuracy must be >= 100: got {accuracy}")
    work = ("__n", "__nn", "__k", "__vlo", "__vhi", "__a", "__m", "__ok", "__rn")
    for reserved in work:
        if reserved in df.columns:
            raise ValueError(
                f"top_fraction_approx uses a `{reserved}` working column "
                "but the input already has one — rename it first"
            )
    from fractions import Fraction

    from pyspark.sql import Window

    num, den = _keep_frac_terms(frac, Fraction)
    eps = 1.0 / accuracy
    margin = 4.0 * eps + 1e-9  # ±2ε GK rank error per probe + ceil slack
    f_lo = max(0.0, 1.0 - frac - margin)
    f_hi = min(1.0, 1.0 - frac + margin)
    gcols = [by] if by is not None else []
    score = F.col(score_col)

    stats = df.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.count(score).alias("__nn"),  # non-NULL scores (NULLs sort last)
        F.percentile_approx(score, [f_lo, f_hi], accuracy).alias("__pr"),
    )
    # per-group metadata (one row per group) is PINNED, not recomputed:
    # the census counts and the cut filter must see the SAME probe values
    # — percentile_approx's sketch can legally return different bracket
    # values under a different partition merge order, and a v_hi that
    # drifts between the two passes breaks the exact-count case analysis
    thr = stats.select(
        *gcols,
        F.expr(f"(__n * {num} + {den - 1}) DIV {den}").alias("__k"),
        "__nn",
        F.element_at("__pr", 1).alias("__vlo"),
        F.element_at("__pr", 2).alias("__vhi"),
    ).localCheckpoint(eager=False)
    joined = (
        df.join(F.broadcast(thr), gcols) if gcols else df.crossJoin(F.broadcast(thr))
    )
    counts = joined.groupBy(*gcols).agg(
        F.sum(F.when(score > F.col("__vhi"), 1).otherwise(0)).cast("long").alias("__a"),
        F.sum(
            F.when((score >= F.col("__vlo")) & (score <= F.col("__vhi")), 1).otherwise(0)
        )
        .cast("long")
        .alias("__m"),
    )
    meta = thr.join(counts, gcols) if gcols else thr.crossJoin(counts)
    # the bracket holds iff the exact top-k set splits into {above band}
    # ∪ {top (k-a) of band}; NULL scores are never in a/m, so a k that
    # reaches into NULLs (k > __nn) also routes to the exact fallback
    meta = meta.withColumn(
        "__ok",
        F.col("__vlo").isNotNull()
        & (F.col("__a") <= F.col("__k"))
        & (F.col("__a") + F.col("__m") >= F.col("__k"))
        & (F.col("__k") <= F.col("__nn")),
    ).localCheckpoint(eager=False)
    tagged = (
        df.join(F.broadcast(meta), gcols) if gcols else df.crossJoin(F.broadcast(meta))
    )
    out_cols = [F.col(c) for c in df.columns]
    sure = tagged.filter(F.col("__ok") & (score > F.col("__vhi"))).select(*out_cols)
    part = Window.partitionBy(by) if by is not None else Window.partitionBy()
    w = part.orderBy(score.desc(), F.col(id_col).asc())
    band = (
        tagged.filter(
            F.col("__ok") & (score >= F.col("__vlo")) & (score <= F.col("__vhi"))
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("__k") - F.col("__a"))
        .select(*out_cols)
    )
    # sketch-failure fallback: whole affected groups re-cut by the exact
    # window (none in practice — the property suite hunts for one)
    bad = tagged.filter(~F.col("__ok")).select(*out_cols)
    exact_bad = top_fraction_per_group(bad, score_col, frac, by=by, id_col=id_col)
    return sure.unionByName(band).unionByName(exact_bad)


def _md5_fold64(col: Column, chars: int = 8) -> Column:
    """Fold the first ``chars`` hex digits of ``md5(col)`` into a BIGINT —
    the cross-engine deterministic hash (Spark ``md5`` == DuckDB ``md5``
    byte-for-byte; the ascii fold avoids engine-specific hex-parse
    builtins). Pure codegen: aggregate over a tiny per-row char array."""
    hx = F.substring(F.md5(col), 1, chars)
    digits = F.regexp_extract_all(hx, F.lit("(?s)."), F.lit(0))
    return F.aggregate(
        digits,
        F.lit(0).cast("long"),
        lambda acc, ch: acc * 16
        + F.when(F.ascii(ch) <= 57, F.ascii(ch) - 48).otherwise(F.ascii(ch) - 87).cast("long"),
    )


def assign_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Deterministic training-export sharding: every row gets a ``shard``
    in [0, n_shards) and a ``shuffle_key`` (the full md5 hex) whose order
    within the shard is the deterministic global pseudo-shuffle training
    ingestion wants (adjacent source documents land far apart; reruns and
    engines agree byte-for-byte, unlike ``rand()`` or partition-dependent
    ``monotonically_increasing_id``).

    Scale shape: map-only, zero shuffle — assignment is
    ``fold64(md5(id || seed)) % n_shards`` on each row independently.
    Hash-mod balance is statistical (±O(sqrt(n/shards))); exact balance
    would need a global sort (``ntile``), a scale-killer this op
    deliberately avoids. ``seed`` re-deals the whole shuffle for a new
    epoch without touching the data (salt-PREFIX md5, the module's one
    shuffle-key convention — ``_mixture_hash``). Ids must be non-NULL
    (lazy ``raise_error`` guard) and unique — the corpus contract every
    dedup tier upstream already enforces — or the within-shard order of
    the colliding rows would not be rerun-deterministic.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1: got {n_shards}")
    for reserved in ("shard", "shuffle_key"):
        if reserved in df.columns:
            raise ValueError(
                f"assign_shards writes a `{reserved}` column but the input "
                "already has one — rename it first (silently clobbering a "
                "data column would corrupt the export)"
            )
    # the module's one shuffle-key convention (salt-prefix md5, shared with
    # the mixture samplers / train_test_split DuckDB twins — round-9
    # review); ids must be NON-NULL and unique for the permutation to be
    # deterministic, and the lazy raise_error guard costs no extra job
    ident = F.col(id_col).cast("string")
    keyed = F.when(
        F.col(id_col).isNull(),
        F.raise_error(
            F.lit(f"assign_shards: NULL {id_col} cannot be deterministically sharded")
        ),
    ).otherwise(F.concat(F.lit(seed), ident))
    return df.withColumn("shuffle_key", F.md5(keyed)).withColumn(
        "shard", F.pmod(_md5_fold64(keyed), F.lit(n_shards)).cast("int")
    )


def shard_manifest(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """(id, shard, pos_in_shard) — the queryable contract of
    ``assign_shards``: position is ``row_number`` over (shard ORDER BY
    shuffle_key, id), i.e. exactly the order ``write_shards`` lays rows
    out on disk. One shuffle on the shard key + a per-shard sort; the
    DuckDB oracle recomputes the identical md5 fold and window."""
    d = assign_shards(df.select(id_col), n_shards, id_col, seed)
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy(F.col("shuffle_key").asc(), F.col(id_col).asc())
    return d.select(
        id_col,
        F.col("shard").cast("long").alias("shard"),
        F.row_number().over(w).cast("long").alias("pos_in_shard"),
    )
