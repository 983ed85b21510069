"""Deduplication operators for training-data pipelines (SURVEY.md §2.10).

Builds up from the reference's full-row DISTINCT (A4,
``csv_to_parquet_transformer.py:13``, ``I:171``) to the near-dup family a
100 TB corpus needs:

- ``exact_dedup``            — sha256 content hash → keep first per group.
  One shuffle on a 32-byte key regardless of document size.
- ``minhash_lsh_candidates`` — shingle → xxhash64 per shingle (ONCE) →
  k affine rehashes → b bands → bucket equi-join. All JVM-side built-ins;
  candidate generation never cross-joins.
- ``minhash_dedup``          — candidates verified by exact shingle-hash
  Jaccard (long arrays, not strings — same set semantics modulo 64-bit
  collisions, ~10× cheaper to shuffle and intersect).
- ``simhash``                — 64-bit simhash as one codegen'd SQL fold
  (token-hash array → per-bit majority via aggregate+zip_with). No Python
  in the path.
- ``ngram_jaccard_pairs``    — exact n-gram Jaccard on candidate pairs.
- ``ngram_jaccard_exact``    — exact char-n-gram Jaccard, all pairs (oracle).
- ``embedding_near_dups``    — cosine-threshold pairs over embeddings.

Performance shape (measured at sf0.1, 5k docs, 260k shingles): signatures
are computed by explode → row-wise ``xxhash64`` → groupBy(collect_set + k
mins) — every step whole-stage codegen'd with map-side partial mins
(0.8 s), where the previous nested ``transform``/``array_min`` formulation
ran interpreted one-thread-per-row (3.1 s). The groupBy's exchange also
materializes (hs, mh) once, so banding and both verify-join sides reuse the
same shuffle output instead of re-shingling (round-1's 12× recompute bug).
"""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint, kgram_hashes, winnow_select

# Mersenne prime 2^31-1: affine minhash permutations (a*h+b) mod P stay
# within long range (a,b < P → product < 2^62) — ANSI-overflow-safe.
_P = 2_147_483_647
_rng = random.Random(42)
_AFFINE = [(_rng.randrange(1, _P), _rng.randrange(0, _P)) for _ in range(64)]


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact near-O(n) dedup: hash the normalized content, keep the lowest id
    per hash. Shuffles 32-byte keys, not documents."""
    w = Window.partitionBy("fp").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("fp", fingerprint(text_col))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "fp")
    )


def exact_fingerprint_store(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, fp): the persisted store form for incremental exact dedup — one
    32-byte sha256 fingerprint per landed document. Fingerprints are
    deterministic, so stored and freshly-computed rows are interchangeable
    (the shared property of every incremental-dedup store here: MinHash
    signatures, winnow fingerprints, semantic assignments)."""
    return df.select(id_col, fingerprint(text_col).alias("fp"))


def write_exact_store(
    store_df: DataFrame,
    path: str,
    *,
    mode: str = "append",
    bucket_by_fp: bool = False,
    num_buckets: int = 32,
) -> None:
    """Persist ``exact_fingerprint_store`` rows with an ``_exact_params``
    sidecar recording the fingerprint algorithm version — exact dedup has
    no tunable parameters, but pinning the algorithm keeps a future hash
    change from silently matching nothing against an old store (the same
    footgun the banded stores' sidecars close). Same lifecycle discipline
    as ``write_minhash_store``: overwrite = atomic rebuild with the label
    swapped in with the data; append = sidecar validated/written before
    the first data write, streaming-layout stores rejected.

    ``bucket_by_fp=True`` writes the BUCKETED layout (round-9, the same
    shuffle-free store side the MinHash store got in round 8's follow-up):
    rows land pre-hashed into ``num_buckets`` buckets on ``fp``, so every
    later ``exact_dedup_incremental`` anti-join reads the store with NO
    Exchange — only the (small) batch side shuffles. The bucket spec lives
    in the sidecar; flat appends to a bucketed store (and vice versa, and
    bucket-count drift) reject loudly. ``read_exact_store`` auto-detects
    the layout and re-registers the catalog entry in fresh sessions."""
    import os

    from ..sources.writers import atomic_swap_write

    params: dict = {"algo": _EXACT_FP_ALGO}
    if bucket_by_fp:
        params["bucket_by"] = "fp"
        params["num_buckets"] = num_buckets
    if mode == "overwrite":
        if bucket_by_fp:
            spark = store_df.sparkSession
            spark.sql(f"DROP TABLE IF EXISTS `{_bucketed_store_table(path)}`")
            atomic_swap_write(
                store_df,
                path,
                finalize_staging=lambda staging: _write_params_sidecar(
                    os.path.join(staging, "_exact_params.json"), params
                ),
                write_staging=_bucketed_staging_writer("fp", num_buckets),
            )
            _register_bucketed_store(spark, path, "fp", num_buckets)
            return
        atomic_swap_write(
            store_df,
            path,
            finalize_staging=lambda staging: _write_params_sidecar(
                os.path.join(staging, "_exact_params.json"), params
            ),
        )
        return
    _reject_streaming_layout_append(store_df, path, "exact-fingerprint")
    ensure_exact_params_sidecar(path, bucket_by_fp=bucket_by_fp, num_buckets=num_buckets)
    if bucket_by_fp:
        spark = store_df.sparkSession
        table = _bucketed_store_table(path)
        writer = (
            store_df.write.mode(mode).bucketBy(num_buckets, "fp").sortBy("fp").format("parquet")
        )
        if spark.catalog.tableExists(table):
            writer.saveAsTable(table)
        else:
            from ..sources.readers import read_parquet_or_none

            if read_parquet_or_none(spark, path) is not None:
                _register_bucketed_store(spark, path, "fp", num_buckets)
                writer.saveAsTable(table)
            else:
                writer.option("path", path).saveAsTable(table)
        return
    store_df.write.mode(mode).parquet(path)


_EXACT_FP_ALGO = "sha256-normalized-v1"


def ensure_exact_params_sidecar(
    path: str, *, bucket_by_fp: bool = False, num_buckets: int = 32
) -> None:
    """Write-or-validate the ``_exact_params`` sidecar (see
    ``write_exact_store``). The bucket spec joins the strict compare: a
    flat caller against a bucketed store (or drifted bucket count)
    rejects — mixing bucket-suffixed and plain file names corrupts the
    bucketed read."""
    import os

    from ..sources.writers import recover_interrupted_swap

    # heal a hard-crashed atomic_swap_write FIRST: in the window between
    # its two renames the store dir is missing (its contents — including
    # this sidecar — sit in a .backup sibling), and recreating the dir
    # with a fresh sidecar here would make the later recovery pass treat
    # the backup as post-swap litter and DELETE it (round-7 review).
    recover_interrupted_swap(path)
    params: dict = {"algo": _EXACT_FP_ALGO}
    if bucket_by_fp:
        params["bucket_by"] = "fp"
        params["num_buckets"] = num_buckets
    sidecar = os.path.join(path, "_exact_params.json")
    if os.path.exists(sidecar):
        _validate_store_params(sidecar, params, label="exact-fingerprint")
        return
    os.makedirs(path, exist_ok=True)
    _write_params_sidecar(sidecar, params)


def exact_store_bucket_spec(path: str) -> "tuple[str, int] | None":
    """(bucket_col, num_buckets) for a store written with
    ``bucket_by_fp=True``, else ``None`` — the same layout-discovery hook
    ``minhash_store_bucket_spec`` gives the composed ingest runners."""
    import json
    import os

    sidecar = os.path.join(path, "_exact_params.json")
    if not os.path.exists(sidecar):
        return None
    with open(sidecar, encoding="utf-8") as f:
        stored = json.load(f)
    if "bucket_by" in stored:
        return stored["bucket_by"], stored["num_buckets"]
    return None


def read_exact_store(spark, path: str) -> DataFrame:
    """Load a persisted exact-fingerprint store, validating the algorithm
    sidecar; a bucketed store reads through its catalog entry
    (re-registered in fresh sessions), so the incremental anti-join skips
    the store-side Exchange."""
    import os

    sidecar = os.path.join(path, "_exact_params.json")
    if os.path.exists(sidecar):
        _validate_store_params(
            sidecar,
            {"algo": _EXACT_FP_ALGO},
            label="exact-fingerprint",
            ignore_keys=_BUCKET_KEYS,
        )
        spec = exact_store_bucket_spec(path)
        if spec is not None:
            table = _register_bucketed_store(spark, path, spec[0], spec[1])
            return spark.table(table)
    return spark.read.parquet(path)


def exact_dedup_incremental(
    new_df: DataFrame,
    store: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Surviving rows of an INCREMENTAL ingest batch under exact dedup:
    a new document survives iff its content fingerprint appears nowhere in
    the landed corpus (the store's (id, fp) rows — the corpus text is never
    re-hashed) and it is the lowest-id holder of that fingerprint within
    the batch. With batch ids above all store ids, running batches through
    this sequentially (appending ``exact_fingerprint_store`` of the FULL
    batch after each run) keeps exactly the ``exact_dedup`` survivors of
    the combined corpus — pinned by ``tests/test_dedup.py``. Ids must be
    disjoint between batch and store.

    Scale shape: the batch is hashed once; the store side joins
    fingerprints only (32-byte keys, never text) via a left-anti join that
    Catalyst can runtime-filter; in-batch dedup is the same window
    ``exact_dedup`` uses, over batch-sized input."""
    hashed = new_df.withColumn("fp", fingerprint(text_col))
    fresh = hashed.join(store.select("fp"), "fp", "left_anti")
    w = Window.partitionBy("fp").orderBy(F.col(id_col).asc())
    return (
        fresh.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "fp")
    )


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Duplicate-group report: (fingerprint, n_copies, keeper_id) for groups
    with more than one member."""
    return (
        df.withColumn("fp", fingerprint(text_col))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min(id_col).alias("keeper_id"))
        .filter(F.col("n_copies") > 1)
    )


def _signatures(df: DataFrame, text_col: str, id_col: str, shingle_n: int, num_hashes: int) -> DataFrame:
    """(id, hs, mh): per-doc distinct shingle-hash set + k-minhash signature.

    Shape matters here — this stage was 3.1 s of the 3.9 s sf0.1 pipeline
    when written as nested higher-order array functions (``transform`` +
    ``array_min`` are INTERPRETED expressions, one thread per row), and is
    0.8 s as explode → row-wise ``xxhash64`` → groupBy with 1 ``collect_set``
    + k ``min`` aggregates: every operator in that chain is whole-stage
    codegen'd and the mins combine map-side. The minhash value is unchanged:
    min over shingles of (a_i * (h mod P) + b_i) mod P, long arithmetic
    (``min`` is duplicate-insensitive, so explode needs no distinct).

    The input is spread BEFORE the explode so the shingle compute runs on
    all cores even from a single-partition parquet scan; ``spread`` is a
    no-op when the scan is already parallel (cluster-scale inputs)."""
    from ..sources.readers import spread

    # Shingles are built EXPLODED with plain codegen expressions (explode
    # the start indices, slice+concat per row) rather than exploding
    # ``functions.text.shingles``'s array: that array comes from a
    # higher-order ``transform`` lambda, which Spark evaluates INTERPRETED
    # per element (~5 s of the sf1 pipeline; this shape measures ~2 s).
    # Duplicate shingles now emit multiple rows — harmless, since ``min``
    # is duplicate-insensitive and ``collect_set`` dedups ``hs``; the
    # shingle VALUES (incl. the whitespace-only guard and the single
    # partial shingle of 1..n-1-token docs) match ``shingles()`` exactly.
    from ..functions.text import tokens

    toks = tokens(F.col(text_col))
    idx = F.when(
        F.length(F.regexp_replace(F.col(text_col), r"\s", "")) == 0,
        F.array().cast("array<int>"),
    ).otherwise(F.sequence(F.lit(0), F.greatest(F.size(toks) - shingle_n, F.lit(0))))
    ex = (
        spread(df.select(F.col(id_col), F.col(text_col)), key=id_col)
        .select(F.col(id_col), toks.alias("__toks"), F.explode(idx).alias("__i"))
        .select(
            F.col(id_col),
            F.xxhash64(
                F.concat_ws(" ", F.slice("__toks", F.col("__i") + 1, F.lit(shingle_n)))
            ).alias("h"),
        )
    )
    return _pack_signature_sets(ex, id_col, num_hashes)


def _pack_signature_sets(ex: DataFrame, id_col: str, num_hashes: int) -> DataFrame:
    """(id, hs, mh) from exploded (id, h) shingle-hash rows via
    repartition(id) → sortWithinPartitions(id, h) → one vectorized Arrow
    kernel — replacing ``groupBy(collect_set + k min)``.

    The collect_set forced the whole aggregate onto ObjectHashAggregateExec:
    millions of per-doc set buffers in the agg hash map measured 105 s of
    task time against 59 s of CPU at the sf1 bench tier (1.8× memory-stall
    dilation; OPTIMIZATION_r14 minhash probe) — guide §5's
    hash-vs-sort-operator trade. Here the rows shuffle 16 B wide (``hm``
    no longer rides the exchange — §2.3), a codegen sort groups them, and
    the kernel walks each Arrow batch once in numpy: adjacent-duplicate
    mask (sorted ⇒ per-doc distinct), segment boundaries, and the k affine
    mins via ``minimum.reduceat`` (exact int64 arithmetic: a·hm < 2^62).
    Values are IDENTICAL to the aggregate form — ``hs`` is the same
    distinct set (ascending order; every consumer is order-insensitive:
    array_intersect/union sizes, store hash compares sort first) and
    ``mh[i] = min((a_i·pmod(h,P)+b_i) % P)`` unchanged. Docs with zero
    shingle rows produce no row, exactly as groupBy over explode did.
    Batches split mid-doc carry the open tail group into the next batch,
    so group fragmentation at Arrow-batch boundaries cannot split a doc."""
    import numpy as np

    id_type = dict(ex.dtypes)[id_col]
    A = np.array([a for a, _ in _AFFINE[:num_hashes]], dtype=np.int64)
    B = np.array([b for _, b in _AFFINE[:num_hashes]], dtype=np.int64)

    def pack(batches):
        def emit(pdf):
            ids = pdf[id_col].to_numpy()
            hs = pdf["h"].to_numpy(dtype=np.int64, copy=False)
            keep = np.empty(len(ids), dtype=bool)
            keep[0] = True
            np.not_equal(hs[1:], hs[:-1], out=keep[1:])
            keep[1:] |= ids[1:] != ids[:-1]
            idd, hd = ids[keep], hs[keep]
            starts = np.concatenate(([0], np.flatnonzero(idd[1:] != idd[:-1]) + 1))
            hm = np.mod(hd, _P)
            mins = np.empty((len(starts), num_hashes), dtype=np.int64)
            for i in range(num_hashes):
                mins[:, i] = np.minimum.reduceat((A[i] * hm + B[i]) % _P, starts)
            bounds = np.append(starts, len(idd))
            return pd.DataFrame(
                {
                    id_col: idd[starts],
                    "hs": [hd[s:e] for s, e in zip(bounds[:-1], bounds[1:])],
                    "mh": list(mins),
                }
            )

        pend = None
        for pdf in batches:
            if pend is not None and len(pend):
                pdf = pd.concat([pend, pdf], ignore_index=True)
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            cut = int(np.searchsorted(ids, ids[-1], side="left"))
            pend = pdf.iloc[cut:]
            if cut:
                yield emit(pdf.iloc[:cut])
        if pend is not None and len(pend):
            yield emit(pend)

    return (
        ex.repartition(id_col)
        .sortWithinPartitions(id_col, "h")
        .mapInPandas(pack, schema=f"{id_col} {id_type}, hs array<bigint>, mh array<bigint>")
    )


def _lsh_candidates(
    sigs: DataFrame,
    id_col: str,
    num_hashes: int,
    bands: int,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Band the minhash signature and self-join on (band, signature) buckets
    — explode to ``bands`` rows per doc, never an N×N cross join.
    ``max_bucket_size`` drops degenerate buckets (see ``minhash_dedup``)."""
    rows_per_band = num_hashes // bands
    banded = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(",", *[F.col("mh")[b * rows_per_band + r] for r in range(rows_per_band)]).alias("sig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig"))
    if max_bucket_size is not None:
        banded = _drop_hot_buckets(banded, ["band", "sig"], max_bucket_size)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH candidate pairs: docs sharing any (band_idx, band_signature)
    bucket. rows_per_band = num_hashes / bands."""
    return _lsh_candidates(
        _signatures(df, text_col, id_col, shingle_n, num_hashes),
        id_col,
        num_hashes,
        bands,
        max_bucket_size=max_bucket_size,
    )


def jaccard(a_col, b_col):
    """Exact Jaccard over two array columns."""
    inter = F.size(F.array_intersect(a_col, b_col))
    union = F.size(F.array_union(a_col, b_col))
    return F.try_divide(inter, union)


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    max_bucket_size: int | None = None,
    banded: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs: LSH candidates verified by exact shingle-hash Jaccard
    ≥ threshold. Returns (id_a, id_b, jaccard_sim).

    VERIFY-SPLIT shape (round 12, closing the measured round-11 deferral):
    the band self-join carries only slim (id, sig) rows — the shingle-hash
    set no longer rides the join ``bands``-fold — and the distinct
    candidate pairs join BACK to a one-row-per-doc (id, hs) set table for
    exact verification (``jaccard_join_prefix``'s verify-by-id template).
    Both the band rows and the set table project out of the SAME
    ``_signatures`` aggregate, so the corpus is still shingled once and
    the extra verify joins read a ReusedExchange; shuffled band mass drops
    from ``bands × (sig + hs)`` to ``bands × sig`` per doc, and hs moves
    only ``O(candidates)`` times. Measured same-session at the sf1 bench
    tier: ≈4.6 → ≈3.0 s warm (SCALING.md round-12 row).

    ``max_bucket_size`` caps degenerate band buckets (round-3 verdict item
    3): at corpus scale a non-discriminative band signature (boilerplate /
    near-empty docs) puts millions of docs in ONE (band, sig) bucket and the
    self-join goes O(B²) on a single key — AQE skew-split subdivides the
    partition but cannot reduce the pair count. Oversized buckets are
    non-discriminative by definition (their members collide on a weak
    signal); standard pipelines drop them and let the remaining bands catch
    real near-dups. The drop is a narrow count-agg + broadcast anti-join on
    the bucket key only (the carried hs arrays never shuffle for it), and is
    NEVER silent: audit with ``minhash_oversized_buckets`` on the same
    parameters.

    ``banded`` lets a caller that ALSO needs the signature rows (e.g. the
    ingest runner's cap audit + store sink) pass a precomputed — ideally
    materialized — ``minhash_signature_store(df, ...)`` frame instead of
    paying the shingling stage twice (round-7 review); its per-band hs
    copies are collapsed to the one-row-per-doc set table here."""
    if banded is None:
        # materialize the signature aggregate ONCE: the slim band rows and
        # the verify-side set table are two consumers, and re-running the
        # collect_set aggregate per consumer costs more than the verify
        # split saves (measured: exchange reuse dedupes the shuffle but
        # not the heavy aggregate above it)
        sigs = _signatures(df, text_col, id_col, shingle_n, num_hashes).localCheckpoint(
            eager=True
        )
        slim = sigs.select(
            id_col, F.explode(_banded_sig_array(num_hashes, bands)).alias("sig")
        )
        sets = sigs.select(id_col, "hs")
    else:
        slim = banded.select(id_col, "sig")
        sets = banded.dropDuplicates([id_col]).select(id_col, "hs")
    if max_bucket_size is not None:
        slim = _drop_hot_buckets(slim, ["sig"], max_bucket_size)
    a = slim.select(F.col(id_col).alias("id_a"), "sig")
    b = slim.select(F.col(id_col).alias("id_b"), "sig")
    cand = (
        a.join(b, "sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _verify_pairs_by_id(cand, sets, id_col, threshold)


def _banded_sig_array(num_hashes: int, bands: int):
    """Array of band-prefixed band-signature strings over the ``mh``
    column — the single definition of the store's ``sig`` encoding
    (band index prefixed so bands never cross-match)."""
    rows_per_band = num_hashes // bands
    return F.array(
        *[
            F.concat_ws(
                ",",
                F.lit(b),
                *[F.col("mh")[b * rows_per_band + r] for r in range(rows_per_band)],
            )
            for b in range(bands)
        ]
    )


def _verify_pairs_by_id(
    cand: DataFrame, sets: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of distinct (id_a, id_b) candidates
    against a one-row-per-doc (id, hs) set table — the verify-by-id shape
    shared by ``minhash_dedup``, its incremental split path, and
    ``jaccard_join_prefix``: shuffled hs mass is O(candidates), never
    candidates × bands."""
    return (
        cand.join(
            sets.select(F.col(id_col).alias("id_a"), F.col("hs").alias("hs_a")),
            "id_a",
        )
        .join(
            sets.select(F.col(id_col).alias("id_b"), F.col("hs").alias("hs_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("hs_a"), F.col("hs_b")), 6).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )


def minhash_signature_store(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """(id, hs, sig): the banded MinHash signature rows ``minhash_dedup``
    joins on — one row per (document, band), ``sig`` prefixed with the band
    index so bands never cross-match. Exposed as the PERSISTED form for
    incremental corpus growth: append each ingest batch's store to a
    signature table (bucketed by ``sig`` for a shuffle-free candidate join)
    and new batches dedup against the whole corpus WITHOUT re-shingling it
    (``minhash_dedup_incremental``). Signatures are deterministic (seeded
    affine family), so stored and freshly-computed rows are interchangeable.
    """
    sigs = _signatures(df, text_col, id_col, shingle_n, num_hashes)
    return sigs.select(
        id_col,
        "hs",
        F.explode(_banded_sig_array(num_hashes, bands)).alias("sig"),
    )


def _bucketed_store_table(path: str) -> str:
    """Deterministic catalog name for a bucketed store at ``path`` — the
    in-memory catalog loses entries across sessions, so the name must be
    re-derivable from the path alone (``_register_bucketed_store``
    re-creates the entry over the surviving files)."""
    import hashlib
    import os

    return "mh_store_" + hashlib.sha1(os.path.abspath(path).encode()).hexdigest()[:12]


def _register_bucketed_store(spark, path: str, bucket_col: str, num_buckets: int) -> str:
    """Ensure the catalog entry for a bucketed store exists (idempotent;
    re-creates it in a fresh session over the files a previous session's
    bucketed ``saveAsTable`` wrote — bucket file naming is stable, so the
    CLUSTERED BY DDL over the existing LOCATION is faithful)."""
    import os

    table = _bucketed_store_table(path)
    if not spark.catalog.tableExists(table):
        schema = spark.read.parquet(path).schema
        cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
        spark.sql(
            f"CREATE TABLE `{table}` ({cols}) USING parquet "
            f"CLUSTERED BY (`{bucket_col}`) SORTED BY (`{bucket_col}`) "
            f"INTO {num_buckets} BUCKETS "
            f"LOCATION '{os.path.abspath(path)}'"
        )
    return table


def _bucketed_staging_writer(bucket_col: str, num_buckets: int):
    """``atomic_swap_write`` staging hook producing BUCKETED files: the
    only writer that emits bucket-suffixed file names is ``saveAsTable``,
    so stage through a throwaway external table entry (dropping an
    external table keeps its files)."""
    import uuid as _uuid

    def write(df, staging):
        tmp = f"mh_store_stg_{_uuid.uuid4().hex[:12]}"
        (
            df.write.mode("overwrite")
            .bucketBy(num_buckets, bucket_col)
            .sortBy(bucket_col)
            .option("path", staging)
            .format("parquet")
            .saveAsTable(tmp)
        )
        df.sparkSession.sql(f"DROP TABLE `{tmp}`")

    return write


def write_minhash_store(
    store_df: DataFrame,
    path: str,
    *,
    shingle_n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    mode: str = "append",
    bucket_by_band: bool = False,
    num_buckets: int = 32,
    layout: str = "flat",
) -> None:
    """Persist a ``minhash_signature_store`` frame with a ``_minhash_params``
    JSON sidecar recording (shingle_n, num_hashes, bands). Appending to an
    existing store validates the sidecar first — signatures from different
    banding parameters never equi-match, so a silent mix would make every
    later incremental run return zero store-side pairs (the footgun
    ``read_minhash_store`` exists to close). Local-fs sidecar, matching
    ``sources/manifest.py`` conventions; on an object store this becomes a
    small conditional put.

    Ordering (round-4 advice + round-5 review): ``mode='overwrite'`` is a
    legitimate REBUILD with possibly new parameters — no validation, and
    the rebuild goes through a staging-dir atomic swap with the NEW sidecar
    written into staging before the swap, so data and label become visible
    together (a plain in-place overwrite had a crash window that left
    unlabeled data a later mismatched append would silently mislabel and
    extend). The append path writes the sidecar BEFORE the first data
    write, so a crash between the two leaves a labeled-but-empty store
    (harmless: later appends validate against it) rather than an unlabeled
    store a mismatched append would silently extend.

    ``bucket_by_band=True`` writes the BUCKETED layout (round-9, the
    shuffle-free store-side join the incremental docstring promises): rows
    land pre-hashed into ``num_buckets`` buckets on ``sig`` via a catalog
    table entry over ``path``, so every later
    ``minhash_dedup_incremental`` join reads the store with NO Exchange —
    only the (small) batch side shuffles. The bucket spec is recorded in
    the sidecar: flat appends to a bucketed store (and vice versa) reject
    loudly, because mixing bucket-suffixed and plain file names corrupts
    the bucketed read. ``read_minhash_store`` auto-detects the layout from
    the sidecar and re-registers the catalog entry in fresh sessions.

    ``layout="split"`` writes the VERIFY-SPLIT layout (round 12, closing
    the round-11 deferral): ``path/sigs/`` holds slim (doc_id, sig) band
    rows and ``path/hashsets/`` one (doc_id, hs) row per document, so the
    incremental candidate join never moves the hash sets ``bands``-fold —
    they join back only for the O(candidates) verify step
    (``minhash_dedup_incremental(store_sets=...)`` /
    ``read_minhash_store_split``). With ``bucket_by_band=True`` the sigs
    table buckets on ``sig`` AND the hashsets table buckets on ``doc_id``,
    making BOTH store-side joins exchange-free. The sidecar records
    ``layout: split`` — flat and split stores never silently mix (the
    param validators reject), and ``compact_minhash_store(to_layout=...)``
    migrates v1 flat stores in place. Split appends land hashsets BEFORE
    sigs: a crash between the two leaves the batch un-indexed (never a
    candidate missing its verify row), the same seam discipline as the
    Jaccard store's gramsets-before-postings; rerun the batch, or let
    compaction prune the orphaned hashset rows."""
    import os

    from ..sources.writers import atomic_swap_write

    if layout not in ("flat", "split"):
        raise ValueError(f"layout must be 'flat' or 'split': got {layout!r}")
    params = {"shingle_n": shingle_n, "num_hashes": num_hashes, "bands": bands}
    if bucket_by_band:
        params["bucket_by"] = "sig"
        params["num_buckets"] = num_buckets
    if layout == "split":
        params["layout"] = "split"
        _write_minhash_store_split(
            store_df, path, params=params, mode=mode,
            bucket_by_band=bucket_by_band, num_buckets=num_buckets,
        )
        return
    if mode == "overwrite":
        if bucket_by_band:
            spark = store_df.sparkSession
            spark.sql(f"DROP TABLE IF EXISTS `{_bucketed_store_table(path)}`")
            atomic_swap_write(
                store_df,
                path,
                finalize_staging=lambda staging: _write_params_sidecar(
                    os.path.join(staging, "_minhash_params.json"), params
                ),
                write_staging=_bucketed_staging_writer("sig", num_buckets),
            )
            _register_bucketed_store(spark, path, "sig", num_buckets)
            return
        atomic_swap_write(
            store_df,
            path,
            finalize_staging=lambda staging: _write_params_sidecar(
                os.path.join(staging, "_minhash_params.json"), params
            ),
        )
        return
    _reject_streaming_layout_append(store_df, path, "minhash")
    ensure_minhash_params_sidecar(
        path,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
        bands=bands,
        bucket_by_band=bucket_by_band,
        num_buckets=num_buckets,
    )
    if bucket_by_band:
        spark = store_df.sparkSession
        table = _bucketed_store_table(path)
        writer = (
            store_df.write.mode(mode)
            .bucketBy(num_buckets, "sig")
            .sortBy("sig")
            .format("parquet")
        )
        if spark.catalog.tableExists(table):
            writer.saveAsTable(table)
        else:
            from ..sources.readers import read_parquet_or_none

            if read_parquet_or_none(spark, path) is not None:
                # fresh session over an existing bucketed store: re-create
                # the catalog entry, then append through it
                _register_bucketed_store(spark, path, "sig", num_buckets)
                writer.saveAsTable(table)
            else:
                writer.option("path", path).saveAsTable(table)
        return
    store_df.write.mode(mode).parquet(path)


def _write_minhash_store_split(
    store_df: DataFrame,
    path: str,
    *,
    params: dict,
    mode: str,
    bucket_by_band: bool,
    num_buckets: int,
) -> None:
    """Split-layout writer body: derive the slim sig table and the
    one-row-per-doc hashset table from a ``minhash_signature_store`` frame
    (materialized once — two derived writes would otherwise re-run the
    signature aggregate) and land them under ``path/sigs`` and
    ``path/hashsets``. Overwrite goes through one atomic swap (both
    sub-tables + sidecar become visible together); append writes hashsets
    FIRST (see ``write_minhash_store``'s seam note)."""
    import os

    from ..sources.writers import atomic_swap_write

    # the id column is whatever the store frame carries besides (hs, sig)
    # — same inference as _compact_store (round-12 review: hardcoding
    # doc_id broke split migration of stores keyed on e.g. passage_id)
    id_col = [c for c in store_df.columns if c not in ("hs", "sig")][0]
    store_df = store_df.localCheckpoint(eager=True)
    sigs = store_df.select(id_col, "sig")
    sets = store_df.dropDuplicates([id_col]).select(id_col, "hs")
    spark = store_df.sparkSession

    if mode == "overwrite":
        if bucket_by_band:
            for sub in ("sigs", "hashsets"):
                spark.sql(
                    f"DROP TABLE IF EXISTS `{_bucketed_store_table(os.path.join(path, sub))}`"
                )

        def _write(unused_df, staging):
            if bucket_by_band:
                _bucketed_staging_writer(id_col, num_buckets)(
                    sets, os.path.join(staging, "hashsets")
                )
                _bucketed_staging_writer("sig", num_buckets)(
                    sigs, os.path.join(staging, "sigs")
                )
            else:
                sets.write.parquet(os.path.join(staging, "hashsets"))
                sigs.write.parquet(os.path.join(staging, "sigs"))

        atomic_swap_write(
            store_df,
            path,
            write_staging=_write,
            finalize_staging=lambda staging: _write_params_sidecar(
                os.path.join(staging, "_minhash_params.json"), params
            ),
        )
        if bucket_by_band:
            _register_bucketed_store(
                spark, os.path.join(path, "sigs"), "sig", num_buckets
            )
            _register_bucketed_store(
                spark, os.path.join(path, "hashsets"), id_col, num_buckets
            )
        return

    # append: validate-or-create the sidecar first, then hashsets, then sigs
    from ..sources.writers import recover_interrupted_swap

    recover_interrupted_swap(path)
    sidecar = os.path.join(path, "_minhash_params.json")
    if os.path.exists(sidecar):
        _validate_store_params(sidecar, params)
    else:
        os.makedirs(path, exist_ok=True)
        _write_params_sidecar(sidecar, params)
    if bucket_by_band:
        for sub, col, frame in (
            ("hashsets", id_col, sets),
            ("sigs", "sig", sigs),
        ):
            sub_path = os.path.join(path, sub)
            table = _bucketed_store_table(sub_path)
            writer = (
                frame.write.mode("append")
                .bucketBy(num_buckets, col)
                .sortBy(col)
                .format("parquet")
            )
            if spark.catalog.tableExists(table):
                writer.saveAsTable(table)
            else:
                from ..sources.readers import read_parquet_or_none

                if read_parquet_or_none(spark, sub_path) is not None:
                    _register_bucketed_store(spark, sub_path, col, num_buckets)
                    writer.saveAsTable(table)
                else:
                    writer.option("path", sub_path).saveAsTable(table)
        return
    sets.write.mode("append").parquet(os.path.join(path, "hashsets"))
    sigs.write.mode("append").parquet(os.path.join(path, "sigs"))


def minhash_store_layout(path: str) -> str:
    """``"flat"`` (v1: (id, hs, sig) rows) or ``"split"`` (v2:
    ``sigs/`` + ``hashsets/`` sub-tables) from the sidecar — absent
    sidecar or absent key means v1, so every pre-round-12 store reads
    unchanged."""
    import json
    import os

    sidecar = os.path.join(path, "_minhash_params.json")
    if not os.path.exists(sidecar):
        return "flat"
    with open(sidecar, encoding="utf-8") as f:
        return json.load(f).get("layout", "flat")


def read_minhash_store_split(
    spark,
    path: str,
    *,
    shingle_n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> "tuple[DataFrame, DataFrame]":
    """(slim, sets) for a store at ``path``, layout-agnostic: slim is the
    (doc_id, sig) band rows the candidate join consumes, sets the
    one-row-per-doc (doc_id, hs) verify table. A split store reads its two
    sub-tables natively (through their bucketed catalog entries when the
    sidecar carries a bucket spec); a v1 flat store derives both views
    from its (id, hs, sig) rows — read-compat, the migration is optional.
    Parameter validation matches ``read_minhash_store``. The set table is
    deduplicated per id on read (the Jaccard store's heal discipline): a
    crashed split append that is rerun re-appends its hashset rows, and
    the dup copies must stay result-neutral until compaction prunes them."""
    import os

    sidecar = os.path.join(path, "_minhash_params.json")
    if os.path.exists(sidecar):
        _validate_store_params(
            sidecar,
            {"shingle_n": shingle_n, "num_hashes": num_hashes, "bands": bands},
            ignore_keys=_BUCKET_KEYS + _LAYOUT_KEYS,
        )
    if minhash_store_layout(path) == "split":
        # infer the id column from the files (whatever sits beside sig/hs
        # — the split writer preserves the source frame's id column)
        id_col = [
            c
            for c in spark.read.parquet(os.path.join(path, "sigs")).columns
            if c != "sig"
        ][0]
        spec = minhash_store_bucket_spec(path)
        if spec is not None:
            n = spec[1]
            slim = spark.table(
                _register_bucketed_store(spark, os.path.join(path, "sigs"), "sig", n)
            ).select(id_col, "sig")
            sets = spark.table(
                _register_bucketed_store(
                    spark, os.path.join(path, "hashsets"), id_col, n
                )
            ).select(id_col, "hs")
        else:
            slim = spark.read.parquet(os.path.join(path, "sigs")).select(
                id_col, "sig"
            )
            sets = spark.read.parquet(os.path.join(path, "hashsets")).select(
                id_col, "hs"
            )
        return slim, sets.dropDuplicates([id_col])
    # flat v1 store: derive both views, inferring the id column (the v1
    # reader keeps its own doc_id contract for its own callers)
    spec = minhash_store_bucket_spec(path)
    if spec is not None:
        flat = spark.table(_register_bucketed_store(spark, path, spec[0], spec[1]))
    else:
        flat = spark.read.parquet(path)
    id_col = [
        c for c in flat.columns if c not in ("hs", "sig", "__batch_id")
    ][0]
    return (
        flat.select(id_col, "sig"),
        flat.dropDuplicates([id_col]).select(id_col, "hs"),
    )


def _reject_streaming_layout_append(store_df: DataFrame, path: str, what: str) -> None:
    """A flat batch append onto a STREAMING-layout store (__batch_id
    partitions from the stream_*_dedup foreachBatch sinks) would write
    un-partitioned files next to the partition dirs — a mixed layout Spark
    cannot read (round-6 review, found first on the semantic twin). A
    streaming store grows through its stream; batch backfills rebuild with
    mode='overwrite' or use their own store."""
    from ..sources.readers import read_parquet_or_none

    existing = read_parquet_or_none(store_df.sparkSession, path)
    if existing is None:
        return
    if "__batch_id" in existing.columns:
        raise ValueError(
            f"{what} store at {path} has the streaming (__batch_id) layout; "
            "a flat batch append would corrupt partition discovery — append "
            "through the streaming twin or rebuild with mode='overwrite'"
        )



def ensure_minhash_params_sidecar(
    path: str,
    *,
    shingle_n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    bucket_by_band: bool = False,
    num_buckets: int = 32,
) -> None:
    """Write-or-validate the ``_minhash_params`` sidecar for a store at
    ``path``: creates it (before any data lands — see ``write_minhash_store``
    ordering note) when missing, validates it when present. The single
    entry point every store writer — batch or streaming — calls first, so a
    store can never be extended with signatures from different banding
    parameters."""
    import os

    from ..sources.writers import recover_interrupted_swap

    # heal a hard-crashed atomic_swap_write FIRST: in the window between
    # its two renames the store dir is missing (its contents — including
    # this sidecar — sit in a .backup sibling), and recreating the dir
    # with a fresh sidecar here would make the later recovery pass treat
    # the backup as post-swap litter and DELETE it (round-7 review).
    recover_interrupted_swap(path)
    params = {"shingle_n": shingle_n, "num_hashes": num_hashes, "bands": bands}
    if bucket_by_band:
        params["bucket_by"] = "sig"
        params["num_buckets"] = num_buckets
    sidecar = os.path.join(path, "_minhash_params.json")
    if os.path.exists(sidecar):
        _validate_store_params(sidecar, params)
        return
    os.makedirs(path, exist_ok=True)
    _write_params_sidecar(sidecar, params)


def _write_params_sidecar(sidecar: str, params: dict) -> None:
    import json
    import os

    tmp = f"{sidecar}.tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(params, f)
    os.replace(tmp, sidecar)


def read_minhash_store(
    spark,
    path: str,
    *,
    shingle_n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """Load a persisted signature store, validating that it was built with
    the SAME banding parameters the caller is about to use — a mismatch
    raises instead of silently matching nothing. The store's physical
    layout is the SIDECAR's business, not the caller's: a bucketed store
    (``write_minhash_store(bucket_by_band=True)``) reads through its
    catalog entry — re-registered here in fresh sessions — so the scan
    carries the bucket spec and the incremental join skips the store-side
    Exchange. A SPLIT store (round 12) returns the joined compat view —
    (doc_id, hs, sig) reconstructed from its two sub-tables — so every
    v1 caller keeps working; split-aware callers should use
    ``read_minhash_store_split`` instead (no reconstruction join, and the
    verify path never moves hs per band)."""
    import os

    sidecar = os.path.join(path, "_minhash_params.json")
    if os.path.exists(sidecar):
        _validate_store_params(
            sidecar,
            {"shingle_n": shingle_n, "num_hashes": num_hashes, "bands": bands},
            ignore_keys=_BUCKET_KEYS + _LAYOUT_KEYS,
        )
        if minhash_store_layout(path) == "split":
            slim, sets = read_minhash_store_split(
                spark, path, shingle_n=shingle_n, num_hashes=num_hashes, bands=bands
            )
            key = [c for c in slim.columns if c != "sig"][0]
            return sets.join(slim, key).select(key, "hs", "sig")
        spec = minhash_store_bucket_spec(path)
        if spec is not None:
            table = _register_bucketed_store(spark, path, spec[0], spec[1])
            return spark.table(table).select("doc_id", "hs", "sig")
    return spark.read.parquet(path).select("doc_id", "hs", "sig")


_BUCKET_KEYS = ("bucket_by", "num_buckets")
_LAYOUT_KEYS = ("layout",)


def minhash_store_bucket_spec(path: str) -> "tuple[str, int] | None":
    """(bucket_col, num_buckets) for a store written with
    ``bucket_by_band=True``, else ``None`` — how layout-agnostic callers
    (the composed ingest runners) discover which writer/reader shape a
    store needs without carrying the layout in their own signatures."""
    import json
    import os

    sidecar = os.path.join(path, "_minhash_params.json")
    if not os.path.exists(sidecar):
        return None
    with open(sidecar, encoding="utf-8") as f:
        stored = json.load(f)
    if "bucket_by" in stored:
        return stored["bucket_by"], stored["num_buckets"]
    return None


def _validate_store_params(
    sidecar: str,
    expected: dict,
    label: str = "minhash",
    ignore_keys: "tuple[str, ...]" = (),
) -> None:
    """The ONE store-parameter check (round-9 consolidation — the compare
    and its message had drifted into three inline copies): strict dict
    equality by default; ``ignore_keys`` lets layout-agnostic readers
    accept sidecars carrying extra LAYOUT keys (the bucket spec) while
    still rejecting semantic-parameter drift."""
    import json

    with open(sidecar, encoding="utf-8") as f:
        stored = json.load(f)
    comparable = {k: v for k, v in stored.items() if k not in ignore_keys}
    if comparable != expected:
        raise ValueError(
            f"{label} store parameter mismatch: store built with {comparable}, "
            f"caller using {expected} — signatures from different "
            "parameters never match; rebuild the store or align the caller"
        )


def compact_minhash_store(
    spark,
    path: str,
    *,
    live_ids: DataFrame | None = None,
    drop_ids: DataFrame | None = None,
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    to_layout: str | None = None,
) -> None:
    """Bound signature-store growth (round-4 verdict item 4): the
    incremental-dedup lifecycle appends every batch's signatures forever,
    including rows for documents later deleted or removed as duplicates —
    dead rows that every future batch still joins against. Compaction
    rewrites the store keeping only live documents' rows:

    - ``live_ids``: keep rows whose ``id_col`` appears (left-semi join) —
      the natural call is the deduped corpus' id column.
    - ``drop_ids``: remove rows whose ``id_col`` appears (left-anti join) —
      the natural call is the dedup output's losing side.

    Exactly one must be given. The rewrite goes through
    ``sources/writers.atomic_swap_write`` with the ``_minhash_params``
    sidecar dropped into the staging dir before the swap, so readers see
    the old or the compacted store — never a partial or unlabeled one —
    and a crash leaves the original intact. The store's column set and
    partition layout are PRESERVED: a streaming store
    (``stream_near_dedup``) is ``__batch_id``-partitioned, and the
    compacted rewrite keeps that partitioning so later micro-batches'
    dynamic partition overwrites land in a consistent directory structure
    (a flat rewrite would make the next ``spark.read.parquet`` fail
    partition discovery). Signatures are per-document and deterministic,
    so dropping rows never changes surviving pairs: an incremental run
    against the compacted store returns exactly the pairs of a store
    rebuilt from the surviving corpus (pinned by ``tests/test_dedup.py``).

    Single-writer by design (the daily-ingest owner); for concurrent
    writers route the store through ``sources/manifest.commit_write`` /
    ``compact``, whose manifest-pointer CAS detects lost updates.

    ``to_layout`` (round 12) additionally MIGRATES the store's physical
    layout during the rewrite: ``"split"`` converts a v1 flat store to the
    verify-split ``sigs/`` + ``hashsets/`` layout (preserving a bucket
    spec — sigs bucket on ``sig``, hashsets on ``doc_id``), ``"flat"``
    converts back; ``None`` keeps the current layout. Migration piggybacks
    on compaction because both already rewrite every surviving row through
    the same atomic swap. Split compaction also prunes hashset rows with
    no sig row — the half-appended seam a crashed never-rerun batch leaves
    (the Jaccard store's round-11 rule; sound because a fully-appended doc
    always has ``bands`` sig rows). Pair results are identical across
    layouts (pinned by ``tests/test_dedup.py``)."""
    params = {"shingle_n": shingle_n, "num_hashes": num_hashes, "bands": bands}
    current = minhash_store_layout(path)
    target = to_layout or current
    if target not in ("flat", "split"):
        raise ValueError(f"to_layout must be 'flat' or 'split': got {to_layout!r}")
    if current == "flat" and target == "flat":
        _compact_store(
            spark,
            path,
            live_ids=live_ids,
            drop_ids=drop_ids,
            id_col=id_col,
            params=params,
            sidecar_name="_minhash_params.json",
            label="minhash",
        )
        return
    _compact_minhash_layout_aware(
        spark,
        path,
        live_ids=live_ids,
        drop_ids=drop_ids,
        id_col=id_col,
        params=params,
        current=current,
        target=target,
    )


def _compact_minhash_layout_aware(
    spark,
    path: str,
    *,
    live_ids: DataFrame | None,
    drop_ids: DataFrame | None,
    id_col: str,
    params: dict,
    current: str,
    target: str,
) -> None:
    """Compaction body for any (current, target) layout pair involving
    the split layout: filter the slim and set tables independently (no
    reconstruction join needed to compact), prune orphaned hashset rows,
    and rewrite through one atomic swap with the sidecar's ``layout`` key
    matching the target."""
    import os

    from ..sources.writers import atomic_swap_write

    if (live_ids is None) == (drop_ids is None):
        raise ValueError("pass exactly one of live_ids / drop_ids")
    sidecar = os.path.join(path, "_minhash_params.json")
    _validate_store_params(
        sidecar, params, label="minhash", ignore_keys=_BUCKET_KEYS + _LAYOUT_KEYS
    )
    if current == "flat" and "__batch_id" in spark.read.parquet(path).columns:
        raise ValueError(
            "a streaming (__batch_id-partitioned) minhash store cannot "
            "migrate to the split layout — its micro-batch sink appends the "
            "flat (id, hs, sig) rows; compact it in place instead"
        )
    spec = minhash_store_bucket_spec(path)
    full_params = dict(params)
    if spec is not None:
        full_params.update({"bucket_by": spec[0], "num_buckets": spec[1]})
    if target == "split":
        full_params["layout"] = "split"

    slim, sets = read_minhash_store_split(
        spark,
        path,
        shingle_n=params["shingle_n"],
        num_hashes=params["num_hashes"],
        bands=params["bands"],
    )
    keep = (
        (lambda t: t.join(live_ids.select(id_col).distinct(), id_col, "left_semi"))
        if live_ids is not None
        else (lambda t: t.join(drop_ids.select(id_col).distinct(), id_col, "left_anti"))
    )
    slim = keep(slim).localCheckpoint(eager=True)
    # dedupe rerun-appended copies and prune the half-appended seam:
    # a doc with hashset rows but no sig rows was never fully indexed
    sets = (
        keep(sets)
        .dropDuplicates([id_col])
        .join(slim.select(id_col).distinct(), id_col, "left_semi")
        .localCheckpoint(eager=True)
    )

    if target == "split" and spec is not None:
        for sub in ("sigs", "hashsets"):
            spark.sql(
                f"DROP TABLE IF EXISTS `{_bucketed_store_table(os.path.join(path, sub))}`"
            )
    if current != target or spec is not None:
        # the flat store's catalog entry (if any) dies with the migration
        spark.sql(f"DROP TABLE IF EXISTS `{_bucketed_store_table(path)}`")

    def _write(unused_df, staging):
        if target == "split":
            if spec is not None:
                _bucketed_staging_writer(id_col, spec[1])(
                    sets, os.path.join(staging, "hashsets")
                )
                _bucketed_staging_writer("sig", spec[1])(
                    slim, os.path.join(staging, "sigs")
                )
            else:
                sets.write.parquet(os.path.join(staging, "hashsets"))
                slim.write.parquet(os.path.join(staging, "sigs"))
        else:
            flat = sets.join(slim, id_col).select(id_col, "hs", "sig")
            if spec is not None:
                _bucketed_staging_writer(spec[0], spec[1])(flat, staging)
            else:
                flat.write.parquet(staging)

    atomic_swap_write(
        slim,
        path,
        write_staging=_write,
        finalize_staging=lambda staging: _write_params_sidecar(
            os.path.join(staging, "_minhash_params.json"), full_params
        ),
    )
    if spec is not None:
        if target == "split":
            _register_bucketed_store(spark, os.path.join(path, "sigs"), "sig", spec[1])
            _register_bucketed_store(
                spark, os.path.join(path, "hashsets"), id_col, spec[1]
            )
        else:
            _register_bucketed_store(spark, path, spec[0], spec[1])


def minhash_dedup_incremental(
    new_df: DataFrame,
    store: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    max_bucket_size: int | None = None,
    include_batch_pairs: bool = True,
    new_banded: DataFrame | None = None,
    store_sets: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs for an INCREMENTAL ingest batch: every pair with
    Jaccard >= ``threshold`` where at least one side is a new document —
    exactly ``minhash_dedup(old ∪ new)`` restricted to pairs touching the
    batch (equivalence pinned by ``tests/test_dedup.py``), but the existing
    corpus is never re-shingled: only its (id, hs, sig) signature rows
    (``minhash_signature_store``, persisted per batch) join in. The daily
    shape at 100 TB: batch-size shingling + one equi-join against a store
    that — written with ``write_minhash_store(bucket_by_band=True)`` — is
    bucketed by ``sig``, making the candidate join shuffle-free on the
    store side (round-9; the split cross/self join below keeps the
    bucketed scan out of any union, and ``read_minhash_store`` routes the
    scan through the catalog entry that carries the bucket spec). Ids must
    be disjoint between batch and store.

    Returns (id_a, id_b, jaccard_sim) with id_a < id_b. ``max_bucket_size``
    caps degenerate buckets over the COMBINED corpus (same semantics as a
    capped full-corpus run); callers should append
    ``minhash_signature_store(new_df)`` to the store after the run.

    The store MUST have been built with the same (``shingle_n``,
    ``num_hashes``, ``bands``) as this call: band signatures from different
    parameters never equi-match, which silently yields zero store-side
    pairs. Persist the parameters alongside the store and validate at read
    time (they're not recoverable from the sig strings alone).

    ``include_batch_pairs=False`` drops batch-internal pairs, turning this
    into a pure CROSS-corpus near-dup join (batch vs store only) — the
    near-dup tier of benchmark decontamination: store the eval set's
    signatures once, screen every ingest batch against them (complements
    ``curation.contamination_check``'s n-gram-overlap tier).
    ``new_banded`` accepts a precomputed ``minhash_signature_store(new_df)``
    so callers needing those rows anyway (cap audit, store sink) don't pay
    the shingling twice (round-7 review).

    ``store_sets`` switches on the VERIFY-SPLIT path (round 12): ``store``
    is consumed as slim (id, sig) band rows only and ``store_sets`` as the
    one-row-per-doc (id, hs) verify table — the shapes
    ``read_minhash_store_split`` returns for either layout. The candidate
    join then never moves the store's hash sets ``bands``-fold (and on a
    split-bucketed store neither side of the store exchanges at all:
    sigs bucketed by ``sig`` feed the candidate join, hashsets bucketed by
    ``doc_id`` feed the verify join). Pair results are IDENTICAL to the
    legacy carried-hs path (pinned by ``tests/test_dedup.py``), which
    remains the default for v1 (id, hs, sig) store frames.
    """
    if new_banded is None:
        new_banded = minhash_signature_store(
            new_df, text_col, id_col, shingle_n, num_hashes, bands
        )
    if store_sets is not None:
        return _minhash_incremental_split(
            new_banded,
            store.select(id_col, "sig"),
            store_sets.select(id_col, "hs"),
            id_col,
            threshold,
            max_bucket_size,
            include_batch_pairs,
        )
    store_banded = store.select(id_col, "hs", "sig")
    combined = store_banded.unionByName(new_banded)
    # the bucket cap always counts over the combined corpus (round-4
    # advice: a bucket pushed over the cap by batch rows is degenerate for
    # the batch-vs-store join too, and the capped-full-corpus equivalence
    # demands one census)
    if max_bucket_size is not None:
        hot = (
            combined.groupBy("sig")
            .agg(F.count(F.lit(1)).alias("__bn"))
            .filter(F.col("__bn") > max_bucket_size)
            .select("sig")
        )
        new_banded = new_banded.join(F.broadcast(hot), ["sig"], "left_anti")
        store_banded = store_banded.join(F.broadcast(hot), ["sig"], "left_anti")
    a = new_banded.select(F.col(id_col).alias("id_n"), F.col("hs").alias("hs_n"), "sig")
    # the cross (new-vs-store) and self (new-vs-new) joins run SEPARATELY
    # rather than joining `a` against store ∪ batch (round-9): a union
    # erases the store scan's bucketing, while the split keeps a BUCKETED
    # store's side exchange-free — only the batch side shuffles into the
    # store's bucket layout. Pair semantics are identical (the union of
    # the two joins is exactly the old single join's row set, and the
    # dropDuplicates runs over the union as before).
    b_store = store_banded.select(
        F.col(id_col).alias("id_o"), F.col("hs").alias("hs_o"), "sig"
    )
    cand = a.join(b_store, "sig")
    if include_batch_pairs:
        b_new = new_banded.select(
            F.col(id_col).alias("id_o"), F.col("hs").alias("hs_o"), "sig"
        )
        cand = cand.unionByName(a.join(b_new, "sig"))
    # keep each qualifying pair exactly once: new-vs-old always (the old id
    # can't appear on the new side), new-vs-new only in id order
    pairs = (
        cand.filter(F.col("id_n") != F.col("id_o"))
        .withColumn("id_a", F.least("id_n", "id_o"))
        .withColumn("id_b", F.greatest("id_n", "id_o"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("hs_n"), F.col("hs_o")), 6).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )


def _minhash_incremental_split(
    new_banded: DataFrame,
    store_slim: DataFrame,
    store_sets: DataFrame,
    id_col: str,
    threshold: float,
    max_bucket_size: int | None,
    include_batch_pairs: bool,
) -> DataFrame:
    """Verify-split body of ``minhash_dedup_incremental``: slim sig-only
    candidate joins (cross + optional self, split so a bucketed store scan
    never unions into an exchange), one distinct over the normalized pair,
    then exact verification against the one-row-per-doc set tables via
    ``_verify_pairs_by_id``. The bucket cap censuses the COMBINED slim
    rows, same semantics as the legacy path."""
    new_banded = new_banded.localCheckpoint(eager=True)
    new_slim = new_banded.select(id_col, "sig")
    new_sets = new_banded.dropDuplicates([id_col]).select(id_col, "hs")
    if max_bucket_size is not None:
        hot = (
            store_slim.unionByName(new_slim)
            .groupBy("sig")
            .agg(F.count(F.lit(1)).alias("__bn"))
            .filter(F.col("__bn") > max_bucket_size)
            .select("sig")
        )
        new_slim = new_slim.join(F.broadcast(hot), ["sig"], "left_anti")
        store_slim = store_slim.join(F.broadcast(hot), ["sig"], "left_anti")
    a = new_slim.select(F.col(id_col).alias("id_n"), "sig")
    cand = a.join(store_slim.select(F.col(id_col).alias("id_o"), "sig"), "sig")
    if include_batch_pairs:
        cand = cand.unionByName(
            a.join(new_slim.select(F.col(id_col).alias("id_o"), "sig"), "sig")
        )
    pairs = (
        cand.filter(F.col("id_n") != F.col("id_o"))
        .select(
            F.least("id_n", "id_o").alias("id_a"),
            F.greatest("id_n", "id_o").alias("id_b"),
        )
        .distinct()
    )
    return _verify_pairs_by_id(pairs, store_sets.unionByName(new_sets), id_col, threshold)


def minhash_oversized_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Audit twin of ``minhash_dedup``'s bucket cap: (band, sig, n_members)
    for every bucket the cap would exclude. Log alongside any capped run —
    a capped dedup without its audit is a silent-truncation bug."""
    rows_per_band = num_hashes // bands
    sigs = _signatures(df, text_col, id_col, shingle_n, num_hashes)
    banded = sigs.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(",", *[F.col("mh")[b * rows_per_band + r] for r in range(rows_per_band)]).alias("sig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk")
    )
    return (
        banded.groupBy(F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > max_bucket_size)
    )


def _simhash_sql(text_col: str) -> str:
    """64-bit SimHash as one codegen'd SQL expression: whitespace tokens →
    xxhash64 per token → per-bit ±1 majority (as a 64-slot counter array
    folded in ONE pass over the tokens) → pack sign bits into a long.
    Replaces a pandas-UDF implementation that did the 64-bit loop per token
    in Python (~160M interpreter ops at sf0.1 — 10s → sub-second)."""
    toks = f"split(trim({text_col}), '\\\\s+')"
    hl = f"transform({toks}, t -> xxhash64(t))"
    ones = (
        f"aggregate({hl}, array_repeat(0L, 64), "
        "(acc, h) -> zip_with(acc, sequence(0, 63), (a, b) -> a + (shiftright(h, b) & 1)))"
    )
    packed = (
        f"aggregate(zip_with({ones}, sequence(0, 63), "
        f"(c, b) -> if(2 * c > size({toks}), shiftleft(1L, b), 0L)), 0L, (s, x) -> s + x)"
    )
    return f"coalesce(if(length(trim(coalesce({text_col}, ''))) = 0, 0L, {packed}), 0L)"


def simhash(df: DataFrame, text_col: str = "text", distribute: bool = True) -> DataFrame:
    """Attach a 64-bit simhash column (``simhash64``). JVM-side fold — see
    ``_simhash_sql``.

    ``distribute=True`` spreads the input first so the (interpreted,
    CPU-heavy) fold runs on all cores even when the source is a single
    small parquet partition; a no-op when the input is already well
    partitioned (cluster-scale scans).

    This is the ATTACH form (keeps every input column, no shuffle). The
    dedup/store pipelines use ``simhash_signatures`` instead — the same
    values via explode + codegen'd aggregation, which at corpus scale
    beats this interpreted higher-order fold the same way the minhash
    ``_signatures`` explode rewrite did."""
    if distribute:
        from ..sources.readers import spread

        df = spread(df)
    return df.withColumn("simhash64", F.expr(_simhash_sql(text_col)))


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash64) as explode → row-wise ``xxhash64`` → groupBy with 64
    conditional-sum aggregates — BIT-IDENTICAL to ``simhash``'s fold
    (equivalence pytest-pinned, so stores built by either path
    interoperate under the same ``_SIMHASH_ALGO`` label), but every step
    is whole-stage codegen'd with map-side partial sums, where the
    ``aggregate``/``zip_with`` fold is an INTERPRETED expression evaluated
    one thread per row (the same trade that took minhash signatures from
    3.1 s to 0.8 s and winnowing to Arrow). Empty/whitespace/null text maps
    to signature 0L exactly as the fold's guard does."""
    from ..sources.readers import spread

    base = spread(df.select(F.col(id_col), F.col(text_col)), key=id_col)
    txt = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    empty = base.filter(F.length(txt) == 0).select(
        F.col(id_col), F.lit(0).cast("long").alias("simhash64")
    )
    ex = (
        base.filter(F.length(txt) > 0)
        .select(F.col(id_col), F.explode(F.split(txt, r"\s+")).alias("__t"))
        .select(F.col(id_col), F.xxhash64("__t").alias("__h"))
    )
    # bit-b one-counts, TWO per aggregate: bits 2i and 2i+1 share one long
    # accumulator in 32-bit lanes (low lane = bit 2i, high lane = bit
    # 2i+1), halving the 64 sums to 32 — measured 3× faster than the
    # 65-aggregate shape at sf1 (the hash-agg update loop is linear in
    # aggregate count). Lanes can't overflow below 2^31 tokens per doc,
    # the same bound the unpacked long sums had. shiftright is arithmetic,
    # but & 1 keeps only the low bit so sign extension is harmless — the
    # unpacked counts are bit-identical to the fold's.
    lanes = [
        F.sum(
            F.shiftright("__h", 2 * i).bitwiseAND(F.lit(1))
            + F.shiftleft(F.shiftright("__h", 2 * i + 1).bitwiseAND(F.lit(1)), 32)
        ).alias(f"__p{i}")
        for i in range(32)
    ]
    agg = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n"), *lanes)
    packed = None
    for b in range(64):
        ones_b = (
            F.col(f"__p{b // 2}").bitwiseAND(F.lit((1 << 32) - 1).cast("long"))
            if b % 2 == 0
            else F.shiftrightunsigned(F.col(f"__p{b // 2}"), 32)
        )
        bit = F.when(
            2 * ones_b > F.col("__n"),
            F.shiftleft(F.lit(1).cast("long"), b),
        ).otherwise(F.lit(0).cast("long"))
        packed = bit if packed is None else packed + bit
    return agg.select(F.col(id_col), packed.alias("simhash64")).unionByName(empty)


def band_slices(n_bits: int, n_bands: int) -> list[tuple[int, int]]:
    """Split ``n_bits`` into ``n_bands`` contiguous (offset, width) slices,
    widths differing by at most one."""
    base, rem = divmod(n_bits, n_bands)
    slices, offset = [], 0
    for i in range(n_bands):
        width = base + (1 if i < rem else 0)
        slices.append((offset, width))
        offset += width
    return slices


def _hamming_bands_expr(sig_col: str, n_bits: int, n_bands: int):
    """Array of (band, bv) structs: the signature's ``n_bands`` disjoint bit
    slices. ``.bitwiseAND`` — Python ``&`` on Columns is boolean AND."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col(sig_col), off)
                .bitwiseAND(F.lit((1 << width) - 1).cast("long"))
                .alias("bv"),
            )
            for i, (off, width) in enumerate(band_slices(n_bits, n_bands))
        ]
    )


def _drop_hot_buckets(banded: DataFrame, keys: list[str], max_bucket_size: int) -> DataFrame:
    """Remove rows in bucket groups (``keys``) larger than
    ``max_bucket_size``: narrow count aggregate (map-side combinable, keys
    only) → broadcast left-anti join. Cheaper than a window at scale — the
    full rows never shuffle, and the oversized-bucket list is tiny by
    construction (each entry represents > max_bucket_size docs)."""
    hot = (
        banded.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__bn"))
        .filter(F.col("__bn") > max_bucket_size)
        .select(*keys)
    )
    return banded.join(F.broadcast(hot), keys, "left_anti")


def _hamming_tile_pairs(
    banded: DataFrame,
    n_bits: int,
    n_bands: int,
    max_hamming: int,
    block_size: int = 2048,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Vectorized tile engine for the uncapped pigeonhole Hamming join.

    The row-based band self-join streams every candidate through the
    sort-merge join's buffered-row inner loop at ~200 ns/candidate; at
    loose thresholds (narrow bands → weak blocking) that iteration IS the
    query (2.1e9 candidates ≈ 14 s at sf1). Here each (band, bv) bucket's
    rows are hashed into blocks of ~``block_size`` signatures, each block
    is PACKED into one row (ids + sigs arrays), and every ordered block
    pair becomes one numpy tile task: one ``bitwise_xor.outer``, a 16-bit
    LUT popcount, the Hamming filter, then the canonical-first-band filter
    (pair uniqueness without any pair shuffle — same rule as the SQL
    shape). Candidate volume is unchanged; the per-candidate cost drops to
    a few vectorized ops.

    Input: (__id, __sig, band, bv) — callers should pass an already
    MATERIALIZED frame (``hamming_band_pairs`` localCheckpoints it): the
    census, the block join, and the packed self-join are independent
    consumers, and an unmaterialized signature subtree would recompute per
    consumer. Output (id_a, id_b, hamming) typed from the input id column,
    id_a < id_b, each qualifying pair exactly once."""
    import numpy as np

    id_type = dict(banded.dtypes)["__id"]
    slices = band_slices(n_bits, n_bands)
    # ``sizes`` lets the auto path pass its (materialized) census instead
    # of re-aggregating the banded rows a second time (round 15, verdict
    # r14 item 7: the census and this bucket-size dictionary are the SAME
    # aggregate — fuse them)
    if sizes is None:
        sizes = banded.groupBy("band", "bv").agg(F.count(F.lit(1)).alias("__n"))
    blocked = banded.join(F.broadcast(sizes), ["band", "bv"]).withColumn(
        "blk",
        F.pmod(
            F.xxhash64("__id"), F.ceil(F.col("__n") / F.lit(block_size)).cast("long")
        ).cast("int"),
    )
    packed = (
        blocked.groupBy("band", "bv", "blk")
        .agg(F.collect_list(F.struct("__id", "__sig")).alias("__rows"))
        .select(
            "band",
            "bv",
            "blk",
            F.transform("__rows", lambda r: r["__id"]).alias("ids"),
            F.transform("__rows", lambda r: r["__sig"]).alias("sigs"),
        )
    )
    a = packed.select(
        "band",
        "bv",
        F.col("blk").alias("blk_a"),
        F.col("ids").alias("ids_a"),
        F.col("sigs").alias("sigs_a"),
    )
    b = packed.select(
        "band",
        "bv",
        F.col("blk").alias("blk_b"),
        F.col("ids").alias("ids_b"),
        F.col("sigs").alias("sigs_b"),
    )
    # 4x-parallelism tile fan-out (round 14): hashing ~1000 tile rows into
    # the default 32 shuffle partitions left only ~25 non-empty — 7 idle
    # cores plus stragglers under the Python-heavy tile tasks. Finer
    # explicit partitioning (4 tasks/core) packs the uneven tiles evenly;
    # tile tasks are pure compute, so smaller tasks cost nothing extra
    # (workers are reused). On a cluster defaultParallelism scales with
    # executors, so the fan-out stays proportional.
    n_tile_parts = 4 * banded.sparkSession.sparkContext.defaultParallelism
    tiles = (
        a.join(b, ["band", "bv"])
        .filter(F.col("blk_a") <= F.col("blk_b"))
        .repartition(n_tile_parts, F.col("band"), F.col("bv"), F.col("blk_a"), F.col("blk_b"))
    )

    def popcount_tiles(batches):
        lut = np.zeros(65536, dtype=np.uint8)
        idx = np.arange(65536)
        for i in range(16):
            lut += ((idx >> i) & 1).astype(np.uint8)
        # ROW-CHUNKED tile sweep (round 14): the full-tile form materialized
        # a block_size^2 x 8B xor matrix (~33 MB) plus four LUT-gather
        # temporaries per tile — every byte streamed through DRAM, and with
        # ~25 concurrent tile tasks the engine was memory-BANDWIDTH-bound,
        # not compute-bound: the identical workload cost 85 s on one core
        # but 331 task-seconds across 25 (4x dilation; probe in
        # OPTIMIZATION_r14.md). Sweeping the a-side in 128-row strips keeps
        # each strip's xor (~2 MB) and its gather temporaries cache-resident,
        # and the popcount accumulates in uint8 (max 4x16 = 64, no
        # overflow) instead of int16, halving the widest temporary.
        # Measured on the REAL sf1 tile set (1008 tiles, 2.8e9 pairs):
        # 331 -> 90 task-seconds, wall 15.6 -> 4.6 s at 25-way parallelism;
        # single-thread 85 -> 66 s, identical 39,307,446 output pairs.
        chunk = 128
        for pdf in batches:
            outs = []
            for band, ids_a, sigs_a, blk_a, ids_b, sigs_b, blk_b in zip(
                pdf["band"],
                pdf["ids_a"],
                pdf["sigs_a"],
                pdf["blk_a"],
                pdf["ids_b"],
                pdf["sigs_b"],
                pdf["blk_b"],
            ):
                ia = np.asarray(ids_a)
                sa = np.asarray(sigs_a, dtype=np.int64)
                ib = np.asarray(ids_b)
                sb = np.asarray(sigs_b, dtype=np.int64)
                diag = blk_a == blk_b
                for r0 in range(0, len(sa), chunk):
                    sa_c = sa[r0 : r0 + chunk]
                    xor = sa_c[:, None] ^ sb[None, :]
                    # four strided 16-bit LUT gathers + in-place adds (the
                    # reshape-to-3D + sum(axis=2) form measured 2.3x slower;
                    # numpy 1.26 has no hardware bitwise_count)
                    u = xor.view(np.uint16)
                    ham = lut[u[:, 0::4]]
                    ham += lut[u[:, 1::4]]
                    ham += lut[u[:, 2::4]]
                    ham += lut[u[:, 3::4]]
                    mask = ham <= max_hamming
                    if diag:
                        # id-VALUE upper triangle, not a positional one: the
                        # two sides are independent evaluations of the packed
                        # collect_list, and nothing guarantees their element
                        # orders agree (exchange reuse is a physical-plan
                        # accident, not a semantic) — comparing the id values
                        # keeps each unordered pair exactly once and drops the
                        # self-pair under ANY permutation (review round-7)
                        mask &= ia[r0 : r0 + chunk, None] < ib[None, :]
                    ra, rb = np.nonzero(mask)
                    if not len(ra):
                        continue
                    x = xor[ra, rb]
                    first_band = np.full(len(ra), -1, dtype=np.int16)
                    for k, (off, width) in enumerate(slices):
                        hit = (first_band < 0) & (((x >> off) & ((1 << width) - 1)) == 0)
                        first_band[hit] = k
                    keep = first_band == band
                    if not keep.any():
                        continue
                    pa, pb = ia[r0 : r0 + chunk][ra[keep]], ib[rb[keep]]
                    outs.append(
                        pd.DataFrame(
                            {
                                "id_a": np.minimum(pa, pb),
                                "id_b": np.maximum(pa, pb),
                                "hamming": ham[ra[keep], rb[keep]].astype(np.int32),
                            }
                        )
                    )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return tiles.mapInPandas(
        popcount_tiles, schema=f"id_a {id_type}, id_b {id_type}, hamming int"
    )


def hamming_band_pairs(
    sigs: DataFrame,
    id_col: str,
    sig_col: str,
    n_bits: int,
    max_hamming: int,
    max_bucket_size: int | None = None,
    engine: str = "auto",
    block_size: int = 2048,
) -> DataFrame:
    """EXACT Hamming-threshold self-join via pigeonhole multi-band blocking:
    split the ``n_bits`` signature into ``max_hamming + 1`` disjoint bands —
    a pair differing in at most ``max_hamming`` bits cannot differ in every
    band, so it shares at least one (band_idx, band_value) bucket. Equi-join
    per band (as one exploded join, not ``max_hamming+1`` plan copies),
    verify the full Hamming distance, dedup the pair ids. 100% recall by
    construction — unlike prefix blocking, whose recall is only
    probabilistic (round-3 verdict items 1-2).

    Join volume is bounded by ≤ (max_hamming+1)× the per-band bucket joins;
    ``max_bucket_size`` (when set) drops degenerate buckets — e.g. the
    all-zero high band of boilerplate-heavy corpora — whose members are
    non-discriminative and whose self-join alone would go O(B²) on one key
    (AQE splits partitions but cannot reduce the pair count). Dropped
    buckets are surfaced via ``oversized_buckets`` on the same frame, never
    silently: callers that cap should log that audit.

    Returns (id_a, id_b, hamming) with id_a < id_b.
    """
    n_bands = max_hamming + 1
    if n_bands > n_bits:
        raise ValueError(f"max_hamming={max_hamming} needs more bands than bits ({n_bits})")
    # no explicit repartition: the self-join's two shuffle exchanges (and
    # the hot-bucket census's) have IDENTICAL deterministic subtrees, so
    # Spark's ReuseExchange collapses them and the signature computation
    # runs once (plan-asserted). This requires ``sigs`` to be
    # DETERMINISTIC — a nondeterministic subtree (e.g. the attach-form
    # ``simhash``'s random spread) defeats reuse and recomputes per side;
    # ``simhash_near_dups`` passes the deterministic ``simhash_signatures``
    # for exactly this reason (interleaved A/B at 50k docs: 3.3 s vs 5.1 s
    # for fold-without-reuse; an explicit repartition would only add a
    # third exchange, measured +0.4 s — SCALING.md).
    banded = sigs.select(
        F.col(id_col).alias("__id"),
        F.col(sig_col).alias("__sig"),
        F.explode(_hamming_bands_expr(sig_col, n_bits, n_bands)).alias("bk"),
    ).select("__id", "__sig", F.col("bk.band").alias("band"), F.col("bk.bv").alias("bv"))
    if max_bucket_size is not None:
        banded = _drop_hot_buckets(banded, ["band", "bv"], max_bucket_size)
    # engine dispatch: the vectorized tile engine wins when candidate
    # volume (Σ bucket²) is large — narrow bands / loose thresholds — by
    # evaluating the same candidates at a few numpy ops each instead of
    # ~200 ns of SMJ buffered-row iteration; below that it LOSES to the
    # pure-JVM join (Python round-trips + packing overhead: measured 2×
    # slower at sf0.1, 2× faster at sf1). engine='auto' therefore
    # MATERIALIZES the banded rows (narrow id+sig+band rows; also needed
    # so the census, block join, and self-join don't each recompute the
    # signature subtree) and reads the actual candidate count from a
    # driver census before choosing. Both engines rely on the
    # canonical-first-band rule for pair uniqueness, so tiles only apply
    # when no bucket cap dropped rows; the capped path keeps the
    # row-based join + dropDuplicates.
    if engine not in ("auto", "tile", "sql"):
        raise ValueError(f"unknown engine {engine!r} (auto|tile|sql)")
    if engine == "tile" and max_bucket_size is not None:
        raise ValueError("engine='tile' requires max_bucket_size=None (canonical-band rule)")
    if max_bucket_size is None and engine in ("auto", "tile"):
        if engine == "auto":
            banded = banded.localCheckpoint(eager=True)
            # ONE bucket census serves both decisions (round 15, verdict
            # r14 item 7): the driver-side Σbucket² engine choice AND the
            # tile engine's per-bucket size dictionary. Materializing it
            # means the final tile job's broadcast side reads these few
            # rows instead of re-aggregating the 17×N banded rows — one
            # full pass over ``banded`` gone from the stage chain.
            sizes = (
                banded.groupBy("band", "bv")
                .agg(F.count(F.lit(1)).alias("__n"))
                .localCheckpoint(eager=True)
            )
            n_cand = (
                sizes.agg(F.sum(F.col("__n") * F.col("__n")).alias("__c"))
                .collect()[0]["__c"]
            )
            if n_cand is None or n_cand < _TILE_MIN_CANDIDATES:
                return _hamming_sql_pairs(banded, n_bits, n_bands, max_hamming, capped=False)
            return _hamming_tile_pairs(
                banded, n_bits, n_bands, max_hamming, block_size, sizes=sizes
            )
        return _hamming_tile_pairs(banded, n_bits, n_bands, max_hamming, block_size)
    return _hamming_sql_pairs(
        banded, n_bits, n_bands, max_hamming, capped=max_bucket_size is not None
    )


# below this candidate count (Σ bucket², from hamming_band_pairs' auto
# census) the pure-JVM row join beats the tile engine's Python round-trips
# and packing overhead — crossover measured between sf0.1 (~21M, SQL 2×
# faster) and sf1 (~2.1B, tiles 2× faster)
_TILE_MIN_CANDIDATES = 200_000_000


def _hamming_sql_pairs(
    banded: DataFrame, n_bits: int, n_bands: int, max_hamming: int, capped: bool
) -> DataFrame:
    """Row-based band self-join over (__id, __sig, band, bv) rows."""
    a = banded.select(F.col("__id").alias("id_a"), F.col("__sig").alias("h_a"), "band", "bv")
    b = banded.select(F.col("__id").alias("id_b"), F.col("__sig").alias("h_b"), "band", "bv")
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("int")
    joined = (
        a.join(b, ["band", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("band", "id_a", "id_b", "h_a", "h_b")
    )
    if not capped:
        # Canonical-band dedup: a qualifying pair collides in EVERY band
        # where its slices agree (avg >1 at loose thresholds — measured
        # 2.09e9 candidates → 2.7e8 surviving band-rows for 3.9e7 unique
        # pairs at sf1/max_hamming=16), so the naive shape shuffles the
        # whole survivor set into dropDuplicates. Instead keep each pair
        # only in its FIRST matching band — a codegen CASE over the XOR's
        # band slices, evaluated join-side — and pairs are unique by
        # construction: no pair shuffle, no dedup exchange (measured 28.7 s
        # → ~19 s at sf1). Only valid when no bucket cap drops rows: a
        # capped hot bucket could BE the first matching band, and this
        # filter would then discard the pair's surviving later-band row,
        # so the capped path keeps the dropDuplicates shape.
        xor = F.col("h_a").bitwiseXOR(F.col("h_b"))
        first_band = F.lit(None).cast("int")
        for i, (off, width) in reversed(list(enumerate(band_slices(n_bits, n_bands)))):
            slice_zero = (
                F.shiftrightunsigned(xor, off).bitwiseAND(F.lit((1 << width) - 1).cast("long"))
                == 0
            )
            first_band = F.when(slice_zero, F.lit(i)).otherwise(first_band)
        # hamming first in the conjunction: bit_count+compare is ~4 ops and
        # kills ~87% of joined rows (loose thresholds), so the 17-branch
        # CASE runs on the survivors only (codegen And short-circuits
        # left-to-right).
        return (
            joined.filter((hamming <= max_hamming) & (F.col("band") == first_band))
            .select("id_a", "id_b", hamming.alias("hamming"))
        )
    return (
        joined.select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def oversized_buckets(
    sigs: DataFrame,
    sig_col: str,
    n_bits: int,
    max_hamming: int,
    max_bucket_size: int,
) -> DataFrame:
    """Audit twin of ``hamming_band_pairs``'s bucket cap: the (band, bv,
    n_members) buckets the cap excludes. Run/log this alongside a capped
    join — the cap must never be a silent truncation."""
    return (
        sigs.select(F.explode(_hamming_bands_expr(sig_col, n_bits, max_hamming + 1)).alias("bk"))
        .groupBy(F.col("bk.band").alias("band"), F.col("bk.bv").alias("bv"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > max_bucket_size)
    )


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance ≤ ``max_hamming``.

    Blocking is pigeonhole multi-band (``hamming_band_pairs``): the 64-bit
    simhash splits into ``max_hamming + 1`` bands and any qualifying pair
    shares at least one band bucket — EXACTLY the unblocked answer, never
    N×N. (Replaces the round-3 top-16-bit prefix block, which silently lost
    ~58% of hamming-3 pairs: C(48,3)/C(64,3) recall under uniform bit
    positions.) ``max_bucket_size`` caps degenerate buckets at corpus scale;
    audit the exclusions with ``oversized_buckets`` when set. ``sigs``
    accepts a precomputed ``simhash_signatures(df)`` frame (callers that
    also audit or persist the signatures skip the recompute)."""
    hashed = sigs if sigs is not None else simhash_signatures(df, text_col, id_col)
    return hamming_band_pairs(
        hashed, id_col, "simhash64", n_bits=64, max_hamming=max_hamming, max_bucket_size=max_bucket_size
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard over LSH candidates (wrapper with a looser
    threshold than minhash_dedup)."""
    return minhash_dedup(df, text_col, id_col, threshold=threshold, shingle_n=n)


def ngram_jaccard_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact character-n-gram Jaccard over ALL pairs — the correctness oracle
    for the LSH candidate path. O(N²) in the worst case: bound the input
    (the catalog caps it at 100 docs); at corpus scale use
    ``minhash_dedup`` and verify samples against this.

    Shape: explode the distinct gram sets and equi-join on the gram STRING
    (not a hash — this function is the exact oracle), count matches per
    pair, and derive |union| = |A| + |B| - |A∩B|. Every step is codegen'd
    with map-side combine, measured 1.4× the nested-loop+array_intersect
    formulation it replaced — and pairs sharing no gram never materialize.
    That shape only emits pairs with at least one shared gram, so
    ``threshold`` must be positive (at threshold<=0 the all-pairs
    formulation would also return zero-overlap pairs; this one can't)."""
    from ..functions.text import char_ngrams

    if threshold <= 0:
        raise ValueError(
            f"threshold must be > 0 (got {threshold}): the gram equi-join "
            "never materializes pairs with empty intersection"
        )

    g = (
        df.filter(F.length(text_col) >= n)
        .select(F.col(id_col), F.explode(char_ngrams(text_col, n)).alias("g"))
    )
    sizes = g.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    a = g.select(F.col(id_col).alias("id_a"), "g")
    b = g.select(F.col(id_col).alias("id_b"), "g")
    inter = (
        a.join(b, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n_grams").alias("__na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_grams").alias("__nb"))
    sim = F.round(F.col("__i") / (F.col("__na") + F.col("__nb") - F.col("__i")), 4)
    return (
        inter.join(F.broadcast(na), "id_a")
        .join(F.broadcast(nb), "id_b")
        .select("id_a", "id_b", sim.alias(f"jaccard_{n}gram"))
        .filter(F.col(f"jaccard_{n}gram") >= threshold)
    )


def _jaccard_gram_rows(
    df: DataFrame, text_col: str, id_col: str, n: int, feature: str
) -> DataFrame:
    """(id, g) rows — each document's DISTINCT gram set, exploded. Shared
    by the one-shot prefix join and the store lifecycle so batch and store
    sides can never disagree on the feature definition."""
    from ..functions.text import char_ngrams

    if feature == "shingles":
        # token array MATERIALIZED behind a projection before the shingle
        # lambda touches it (shingles_from_tokens: no CSE inside
        # higher-order lambdas — capturing the split expression
        # re-tokenizes per position; measured 6.5x on this explode)
        from ..functions.text import filtered_tokens, shingles_from_tokens

        tk = df.select(
            F.col(id_col), filtered_tokens(F.col(text_col)).alias("__tk")
        )
        return tk.select(
            F.col(id_col),
            F.explode(shingles_from_tokens(F.col("__tk"), n)).alias("g"),
        ).filter(F.length("g") > 0)
    if feature == "chars":
        return df.select(
            F.col(id_col), F.explode(char_ngrams(F.col(text_col), n)).alias("g")
        ).filter(F.length("g") > 0)
    raise ValueError(f"feature must be 'shingles' or 'chars': got {feature!r}")


def jaccard_join_prefix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
    feature: str = "shingles",
) -> DataFrame:
    """EXACT set-Jaccard similarity join at/above ``threshold``
    WITHOUT the all-pairs posting join — AllPairs/PPJoin prefix filtering
    (Bayardo, Ma & Srikant, WWW 2007): order each document's distinct gram
    set by ascending document frequency (rarest first, gram string as the
    tie-break), emit only the first ``|d| - ceil(t·|d|) + 1`` grams as
    candidate postings, and verify candidates exactly. The prefix lemma
    guarantees completeness — any pair with ``J ≥ t`` has intersection
    ``i ≥ t·|union| ≥ t·|x|`` on both sides, so its globally-smallest
    common gram must sit inside BOTH prefixes (were it in x's suffix of
    size ``ceil(t·|x|)-1``, all common grams would be too, capping
    ``i < t·|x|`` — contradiction). The result is therefore IDENTICAL to
    ``ngram_jaccard_exact``'s all-pairs form (the driver oracle recomputes
    all pairs and hash-compares), while the candidate join never touches
    hot grams: 'the'-class grams order LAST and stay out of prefixes, so
    the quadratic hot-bucket mass the banded joins cap away never
    materializes here at all.

    Engine-exact output: (id_a, id_b, n_inter, n_a, n_b) — pure BIGINTs
    (the Jaccard cut is integer arithmetic, ``i·den ≥ num·(|a|+|b|-i)``
    with the threshold as an exact fraction), no float in the hash.

    ``feature`` picks the set elements: ``"shingles"`` (default — distinct
    word ``n``-gram strings, the MinHash family's feature) or ``"chars"``
    (distinct character ``n``-grams). The choice is a PRUNING-POWER
    decision, not a correctness one: prefix filtering needs document-
    frequency SKEW, and a tiny saturated universe has none — measured on
    the synthetic fixture, the char-3-gram universe is 377 grams total
    (every gram in ~25% of docs; prefix join mass 150M at 5k docs), while
    the word-shingle universe is large and skewed, which is exactly where
    the prefix filter earns its keep (SCALING.md round-10 row). Pick
    char-grams only for short-string/typo matching where the dense
    universe is inherent.

    Scale shape: one gram-frequency census (joined WITHOUT a broadcast
    hint — AQE broadcasts small dictionaries at runtime; a word-shingle
    universe grows with the corpus and must be allowed to shuffle), then
    ONE groupBy on the doc id packs each doc's (df, gram) pairs and sorts
    the array (struct order = rarest-first, the same total order the
    row_number window gave) — the prefix slice explodes out of the packed
    row, and the verify-side gram-set table PROJECTS out of the same rows,
    so the old window exchange and the separate collect_set aggregation
    are gone (round 11: 8.2 s → 6.5 s at the sf1 bench tier). The
    prefix-posting self-join hangs off one reused exchange with the PPJoin
    positional filter pruning candidate rows in place, and verification
    runs ``array_intersect`` over the one-row-per-doc set table — shuffled
    mass ∝ candidates, not candidates × set size (the explode-join verify
    measured 10× slower on template-heavy data). A size filter
    (``min ≥ t·max``, implied by ``J ≥ t``) prunes candidates before
    anything else."""
    from fractions import Fraction

    if threshold <= 0 or threshold > 1:
        raise ValueError(
            f"threshold must be in (0, 1] (got {threshold}): the prefix "
            "scheme is defined by ceil(t*|d|) and an empty-intersection "
            "pair never materializes"
        )
    r = Fraction(float(threshold)).limit_denominator(10**9)
    num, den = r.numerator, r.denominator
    # spread before gram generation (round 14): the tokenize + shingle
    # explode is the per-doc CPU hot spot and runs TWICE (the df census and
    # the packed groupBy are separate consumers of the gram subtree, by
    # design — see the no-checkpoint note below); on a narrow local scan
    # both passes serialized onto scan-width tasks (measured at the sf1
    # bench tier: 2 x ~13 s of map work on 10 of 32 cores). Hash-spreading
    # the doc rows first runs both passes at full parallelism; a no-op on
    # cluster-scale scans (spread()'s width check). decorrelate is
    # REQUIRED: spreading BY id_col would satisfy the packed groupBy's
    # distribution, eliding the exchange that is also the plan's
    # ReuseExchange node — measured, every packed consumer then recomputed
    # the pack from raw text (query CPU ~2x).
    from ..sources.readers import spread

    df = spread(df, key=id_col, decorrelate=True)
    g = _jaccard_gram_rows(df, text_col, id_col, n, feature)
    dfreq = g.groupBy("g").agg(F.count(F.lit(1)).alias("__df"))
    # NO broadcast hint on the df dictionary: a char-gram universe is
    # alphabet-bounded but a word-shingle universe grows with the corpus —
    # AQE broadcasts it at runtime when it is actually small and
    # sort-merges when it is not (the 100 TB-safe default)
    #
    # Packed single-groupBy posting construction (round 11): collect each
    # doc's (df, g) pairs once and sort the ARRAY (struct order = df asc,
    # g asc — the identical rarest-first order the row_number window
    # produced), then slice the prefix and explode only it. One shuffle on
    # the id replaces the old three full-posting-mass exchanges (df join →
    # window sort for __rn/__sz → separate collect_set groupBy for the
    # verify table, which now projects out of the SAME packed rows).
    # Measured at the sf1 bench tier: see SCALING.md round-11 note.
    packed = (
        g.join(dfreq, "g")
        .groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list(F.struct(F.col("__df"), F.col("g")))).alias(
                "__sorted"
            )
        )
        .withColumn("__gs", F.expr("transform(__sorted, x -> x.g)"))
        # LONG, not F.size's int: the threshold fraction's num/den can be
        # ~1e9 (limit_denominator), so `__sz * num` must not wrap int32 —
        # the window count(*) this replaced was long (review round 11)
        .withColumn("__sz", F.size("__gs").cast("long"))
        # prefix length: sz - ceil(t*sz) + 1, all in longs
        .withColumn(
            "__plen",
            F.col("__sz") - F.expr(f"(__sz * {num} + {den - 1}) DIV {den}") + 1,
        )
    )
    # no checkpoint: pa/pb/sets are three consumers of the SAME packed
    # subtree, and its exchanges dedupe via ReusedExchange (the g subtree
    # is deterministic — same rule as hamming_band_pairs' reuse note)
    prefix = packed.select(
        F.col(id_col),
        F.col("__sz"),
        F.posexplode(F.expr("slice(__gs, 1, __plen)")).alias("__pos", "g"),
    ).withColumn("__rn", F.col("__pos") + 1)
    pa = prefix.select(
        F.col(id_col).alias("id_a"), "g",
        F.col("__sz").alias("__na"), F.col("__rn").alias("__ra"),
    )
    pb = prefix.select(
        F.col(id_col).alias("id_b"), "g",
        F.col("__sz").alias("__nb"), F.col("__rn").alias("__rb"),
    )
    # PPJoin positional filter (Xiao et al., VLDB 2008): at the pair's
    # globally-smallest common gram — positions (ra, rb) in the df-sorted
    # sets — overlap ≤ 1 + min(|a|-ra, |b|-rb); a true pair needs overlap
    # ≥ α = ceil(t/(1+t)·(|a|+|b|)), so a row failing the bound at that
    # gram can be dropped (the pair's OTHER meeting rows can only be
    # later; any-surviving-row semantics keep exactness via the distinct)
    alpha = F.expr(f"((__na + __nb) * {num} + {num + den - 1}) DIV {num + den}")
    cand = (
        pa.join(pb, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        # J >= t implies min >= t*max: prune before anything else
        .filter(
            F.least("__na", "__nb") * F.lit(den)
            >= F.greatest("__na", "__nb") * F.lit(num)
        )
        .filter(
            F.lit(1) + F.least(F.col("__na") - F.col("__ra"), F.col("__nb") - F.col("__rb"))
            >= alpha
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # verify via per-doc gram ARRAYS + array_intersect (in-JVM hash
    # intersect per candidate row) — the explode-join formulation
    # shuffled |candidates| × |gram set| rows and was 10× this on the
    # template-heavy fixture; here the shuffled mass is |candidates| plus
    # two joins against the one-row-per-doc set table, projected straight
    # out of the packed rows (no second gram aggregation)
    sets = packed.select(
        F.col(id_col), F.col("__gs"), F.col("__sz").alias("__n")
    )
    verified = (
        cand.join(
            sets.select(
                F.col(id_col).alias("id_a"),
                F.col("__gs").alias("__ga"),
                F.col("__n").alias("__na"),
            ),
            "id_a",
        )
        .join(
            sets.select(
                F.col(id_col).alias("id_b"),
                F.col("__gs").alias("__gb"),
                F.col("__n").alias("__nb"),
            ),
            "id_b",
        )
        .withColumn("__i", F.size(F.array_intersect("__ga", "__gb")).cast("long"))
        .filter(
            F.col("__i") * F.lit(den)
            >= F.lit(num) * (F.col("__na") + F.col("__nb") - F.col("__i"))
        )
    )
    return verified.select(
        "id_a",
        "id_b",
        F.col("__i").cast("long").alias("n_inter"),
        F.col("__na").cast("long").alias("n_a"),
        F.col("__nb").cast("long").alias("n_b"),
    )


# --------------------------- prefix-Jaccard store (round 11, verdict r10
# item 6): the persisted + incremental form of jaccard_join_prefix, the
# same store discipline as the MinHash/SimHash/passage tiers. Layout:
#   path/gramsets/  (doc_id, gs array<string>, n_grams)  — verify side
#   path/postings/  (doc_id, g, sz, rn)                  — prefix postings
#   path/census/    (g, df)                              — FROZEN gram dfs
#   path/_jaccard_params.json                            — sidecar
#
# Correctness under the frozen census: the prefix lemma and the PPJoin
# positional bound hold for ANY single total order over grams shared by
# every document — document frequency is only the best PRUNER, not a
# correctness input. The census is therefore frozen at build time and
# every batch orders its grams by it (grams the census has never seen
# take df=0 — they sort FIRST, i.e. are conservatively treated as
# rarest, which can only lengthen prefixes, never break completeness;
# ties break on the gram string as always). Pairs are exact regardless
# of drift; what drifts is pruning power — as post-freeze grams become
# genuinely hot their frozen rank under-prunes — and compact_jaccard_store
# re-censuses and rebuilds every posting to restore it (the gram sets are
# in the store, so the rebuild never touches document text).
#
# The sidecar freezes the BUILD threshold too: prefix length grows as the
# threshold falls, so a store built at t supports any query/batch run at
# threshold >= t (its postings are supersets of the tighter prefixes) and
# must reject a lower one.

_JACCARD_STORE_ALGO = "jaccard-prefix-store-v1"


def _jaccard_fraction(threshold: float) -> tuple[int, int]:
    from fractions import Fraction

    if threshold <= 0 or threshold > 1:
        raise ValueError(f"threshold must be in (0, 1]: got {threshold}")
    r = Fraction(float(threshold)).limit_denominator(10**9)
    return r.numerator, r.denominator


def _jaccard_store_params(n: int, feature: str, num: int, den: int) -> dict:
    return {
        "algo": _JACCARD_STORE_ALGO,
        "n": int(n),
        "feature": feature,
        "threshold_num": int(num),
        "threshold_den": int(den),
    }


def _jaccard_prefix_postings(
    g: DataFrame, census: DataFrame, id_col: str, num: int, den: int
) -> DataFrame:
    """Prefix postings (id, g, sz, rn) under the census order (df asc,
    gram asc; unseen grams df=0). The same packed single-groupBy shape as
    ``jaccard_join_prefix`` (sort the per-doc (df, g) array, explode only
    the prefix slice — one exchange, no window); the census join is
    unhinted — AQE broadcasts it while it is small."""
    packed = (
        g.join(census.select("g", F.col("df").alias("__df")), "g", "left")
        .withColumn("__df", F.coalesce(F.col("__df"), F.lit(0)))
        .groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list(F.struct(F.col("__df"), F.col("g")))).alias(
                "__sorted"
            )
        )
        # long __sz: `__sz * num` with a ~1e9 num must not wrap int32
        .withColumn("__sz", F.size("__sorted").cast("long"))
        .withColumn(
            "__plen",
            F.col("__sz") - F.expr(f"(__sz * {num} + {den - 1}) DIV {den}") + 1,
        )
    )
    return packed.select(
        F.col(id_col),
        F.col("__sz").alias("sz"),
        F.posexplode(F.expr("slice(transform(__sorted, x -> x.g), 1, __plen)")).alias(
            "__pos", "g"
        ),
    ).select(id_col, "g", "sz", (F.col("__pos") + 1).cast("long").alias("rn"))


def _jaccard_gramsets(g: DataFrame, id_col: str) -> DataFrame:
    return g.groupBy(id_col).agg(
        F.collect_set("g").alias("gs"), F.count(F.lit(1)).alias("n_grams")
    )


def ensure_jaccard_params_sidecar(
    path: str,
    *,
    n: int = 3,
    feature: str = "shingles",
    threshold: float = 0.6,
) -> None:
    """Write-or-validate the ``_jaccard_params`` sidecar (the
    ``ensure_minhash_params_sidecar`` discipline: heal a crashed swap
    first, create before any data, validate on every later touch)."""
    import os

    from ..sources.writers import recover_interrupted_swap

    recover_interrupted_swap(path)
    num, den = _jaccard_fraction(threshold)
    params = _jaccard_store_params(n, feature, num, den)
    sidecar = os.path.join(path, "_jaccard_params.json")
    if os.path.exists(sidecar):
        _validate_store_params(sidecar, params, label="jaccard")
        return
    os.makedirs(path, exist_ok=True)
    _write_params_sidecar(sidecar, params)


def _read_jaccard_params(path: str) -> dict:
    import json
    import os

    sidecar = os.path.join(path, "_jaccard_params.json")
    if not os.path.exists(sidecar):
        raise ValueError(
            f"jaccard store at {path} has no _jaccard_params sidecar — "
            "build it with write_jaccard_store"
        )
    with open(sidecar, encoding="utf-8") as f:
        return json.load(f)


# ---- candidate-mass drift tracking (round 12, verdict r11 item 7).
# The frozen census never breaks EXACTNESS — but as post-freeze grams
# become genuinely hot, their frozen df=0 rank keeps them inside
# prefixes and the candidate join's row mass grows. The mass sidecar
# records the store's build-time self-join candidate mass per doc
# (sum over prefix grams of C(c_g, 2) / n_docs — the exact pre-filter
# row count of the prefix self-join) and each incremental batch's
# measured (cross + batch-self) candidate mass per batch doc, so drift
# is DETECTED rather than discovered as a slow batch:
# ``jaccard_store_drift`` compares the latest batch against the build
# ratio and ``maybe_compact_jaccard_store`` re-censuses when it exceeds
# the factor. The per-batch histograms aggregate over scans the
# incremental join already performs (store postings are its join input),
# so recording adds no new asymptotic cost.

_JACCARD_MASS_SIDECAR = "_jaccard_mass.json"


def _jaccard_build_cand_per_doc(postings: DataFrame, id_col: str) -> float:
    n = postings.select(id_col).distinct().count()
    row = (
        postings.groupBy("g")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("m"))
        .collect()[0]
    )
    return float(row["m"] or 0.0) / max(n, 1)


def _write_jaccard_mass(dirpath: str, build_cand_per_doc: float) -> None:
    import json
    import os

    tmp = os.path.join(dirpath, _JACCARD_MASS_SIDECAR + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(
            {
                "build_cand_per_doc": (
                    None if build_cand_per_doc is None else float(build_cand_per_doc)
                ),
                "batches": [],
            },
            f,
        )
    os.replace(tmp, os.path.join(dirpath, _JACCARD_MASS_SIDECAR))


def _append_jaccard_mass(path: str, n_docs: int, cand_per_doc: float) -> None:
    import json
    import os

    sidecar = os.path.join(path, _JACCARD_MASS_SIDECAR)
    if not os.path.exists(sidecar):
        # no baseline known — record batches but never recommend until a
        # build/compaction (or the caller's store-postings seed) sets one
        _write_jaccard_mass(path, None)
    with open(sidecar, encoding="utf-8") as f:
        mass = json.load(f)
    mass["batches"].append(
        {"n_docs": int(n_docs), "cand_per_doc": round(float(cand_per_doc), 3)}
    )
    tmp = sidecar + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(mass, f)
    os.replace(tmp, sidecar)


def jaccard_store_drift(path: str, factor: float = 4.0) -> dict:
    """Census-drift report for a prefix-Jaccard store: the build-time
    candidate mass per doc, the latest batch's measured mass per batch
    doc, their ratio, and whether it exceeds ``factor`` (→ recommend
    ``compact_jaccard_store``). A store with no recorded batches (or a
    pre-round-12 store) reports ratio 0 and no recommendation."""
    import json
    import os

    sidecar = os.path.join(path, _JACCARD_MASS_SIDECAR)
    if not os.path.exists(sidecar):
        return {
            "build_cand_per_doc": None,
            "last_cand_per_doc": None,
            "ratio": 0.0,
            "recommend_compact": False,
        }
    with open(sidecar, encoding="utf-8") as f:
        mass = json.load(f)
    build_raw = mass.get("build_cand_per_doc")
    batches = mass.get("batches", [])
    last = float(batches[-1]["cand_per_doc"]) if batches else None
    # no recorded baseline (legacy store whose first append predates the
    # caller-side store-postings seed) -> never recommend; floor a real
    # baseline at 1 candidate/doc so a near-empty build ratio cannot make
    # the very first real batch scream 'drift'
    if build_raw is None or last is None:
        ratio = 0.0
    else:
        ratio = last / max(float(build_raw), 1.0)
    return {
        "build_cand_per_doc": build_raw,
        "last_cand_per_doc": last,
        "ratio": round(ratio, 3),
        "recommend_compact": ratio > factor,
    }


def maybe_compact_jaccard_store(spark, path: str, factor: float = 4.0) -> bool:
    """Compact-on-drift: re-census + rebuild when the latest batch's
    candidate mass per doc exceeds ``factor`` × the build-time ratio
    (results are identical before and after — the census is a pruner, not
    a correctness input). Returns whether compaction ran."""
    if not jaccard_store_drift(path, factor)["recommend_compact"]:
        return False
    compact_jaccard_store(spark, path)
    return True


def write_jaccard_store(
    df: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
    feature: str = "shingles",
) -> None:
    """Build (or REBUILD) the prefix-Jaccard store from a corpus: census
    the gram document frequencies, write gramsets + prefix postings +
    census + sidecar, all made visible together through one
    ``atomic_swap_write`` (the three sub-frames land in staging — a
    reader never sees postings without their census)."""
    import os

    from ..sources.writers import atomic_swap_write

    num, den = _jaccard_fraction(threshold)
    g = _jaccard_gram_rows(df, text_col, id_col, n, feature).localCheckpoint(
        eager=True
    )
    census = g.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("df"))

    def _write(unused_df, staging):
        census.write.parquet(os.path.join(staging, "census"))
        frozen = unused_df.sparkSession.read.parquet(os.path.join(staging, "census"))
        _jaccard_prefix_postings(g, frozen, id_col, num, den).write.parquet(
            os.path.join(staging, "postings")
        )
        _jaccard_gramsets(g, id_col).write.parquet(os.path.join(staging, "gramsets"))

    def _finalize(staging):
        _write_params_sidecar(
            os.path.join(staging, "_jaccard_params.json"),
            _jaccard_store_params(n, feature, num, den),
        )
        # build-time candidate-mass baseline for the drift heuristic
        _write_jaccard_mass(
            staging,
            _jaccard_build_cand_per_doc(
                df.sparkSession.read.parquet(os.path.join(staging, "postings")),
                id_col,
            ),
        )

    atomic_swap_write(df, path, write_staging=_write, finalize_staging=_finalize)


def _jaccard_pairs_core(
    g_new: DataFrame,
    census: DataFrame,
    store_postings: DataFrame | None,
    store_sets: DataFrame | None,
    *,
    id_col: str,
    num: int,
    den: int,
    bnum: int,
    bden: int,
    include_batch_pairs: bool,
    materialize: bool,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The incremental prefix-Jaccard join body shared by the batch form
    (``jaccard_join_incremental``) and the streaming twin
    (``streaming.pipeline.stream_jaccard_dedup``): order the batch's
    grams under the FROZEN census, prefix-join the batch postings against
    the persisted postings (plus the batch self-join), verify candidates
    against the persisted gramsets — exactness does not depend on the
    census (it is a pruner). ``None`` stores take the first-batch path
    (empty store sides — the batch self-join IS the whole join). Returns
    ``(verified_pairs, new_postings, new_sets)``; ``materialize`` eagerly
    checkpoints the new rows when the caller will both join and land
    them."""
    new_postings = _jaccard_prefix_postings(g_new, census, id_col, bnum, bden)
    if materialize:
        new_postings = new_postings.localCheckpoint(eager=True)
    new_sets = _jaccard_gramsets(g_new, id_col)
    if materialize:
        new_sets = new_sets.localCheckpoint(eager=True)
    if store_postings is None:
        store_postings = new_postings.limit(0)
    if store_sets is None:
        store_sets = new_sets.limit(0)

    pa = new_postings.select(
        F.col(id_col).alias("id_x"), "g",
        F.col("sz").alias("__nx"), F.col("rn").alias("__rx"),
    )
    sides = store_postings
    if include_batch_pairs:
        sides = sides.unionByName(new_postings)
    pb = sides.select(
        F.col(id_col).alias("id_y"), "g",
        F.col("sz").alias("__ny"), F.col("rn").alias("__ry"),
    )
    alpha = F.expr(f"((__nx + __ny) * {num} + {num + den - 1}) DIV {num + den}")
    cand = (
        pa.join(pb, "g")
        .filter(F.col("id_x") != F.col("id_y"))
        .filter(
            F.least("__nx", "__ny") * F.lit(den)
            >= F.greatest("__nx", "__ny") * F.lit(num)
        )
        .filter(
            F.lit(1) + F.least(F.col("__nx") - F.col("__rx"), F.col("__ny") - F.col("__ry"))
            >= alpha
        )
        .select(
            F.least("id_x", "id_y").alias("id_a"),
            F.greatest("id_x", "id_y").alias("id_b"),
        )
        .distinct()
    )
    all_sets = store_sets.unionByName(new_sets)
    verified = (
        cand.join(
            all_sets.select(
                F.col(id_col).alias("id_a"),
                F.col("gs").alias("__ga"),
                F.col("n_grams").alias("__na"),
            ),
            "id_a",
        )
        .join(
            all_sets.select(
                F.col(id_col).alias("id_b"),
                F.col("gs").alias("__gb"),
                F.col("n_grams").alias("__nb"),
            ),
            "id_b",
        )
        .withColumn("__i", F.size(F.array_intersect("__ga", "__gb")).cast("long"))
        .filter(
            F.col("__i") * F.lit(den)
            >= F.lit(num) * (F.col("__na") + F.col("__nb") - F.col("__i"))
        )
        .select(
            "id_a",
            "id_b",
            F.col("__i").cast("long").alias("n_inter"),
            F.col("__na").cast("long").alias("n_a"),
            F.col("__nb").cast("long").alias("n_b"),
        )
    )
    return verified, new_postings, new_sets


def _record_jaccard_batch_mass(
    path: str,
    new_postings: DataFrame,
    store_postings: DataFrame,
    new_sets: DataFrame,
    include_batch_pairs: bool,
) -> None:
    """Append this batch's candidate mass per doc to the drift sidecar
    (exact pre-filter row count of the candidate join: cross = Σ_g b_g·c_g
    against the store, self = Σ_g C(b_g, 2)). Seeds an absent baseline
    from the CURRENT store postings (legacy store — an absent/zero
    baseline must not flag spurious drift on the first tracked batch).
    Shared by the batch incremental join and the streaming twin."""
    import os

    id_col = [c for c in new_sets.columns if c not in ("gs", "n_grams")][0]
    if not os.path.exists(os.path.join(path, _JACCARD_MASS_SIDECAR)):
        _write_jaccard_mass(
            path, _jaccard_build_cand_per_doc(store_postings, id_col)
        )
    bh = new_postings.groupBy("g").agg(F.count(F.lit(1)).alias("__b"))
    cross = (
        bh.join(
            store_postings.groupBy("g").agg(F.count(F.lit(1)).alias("__c")), "g"
        )
        .agg(F.sum(F.col("__b") * F.col("__c")).alias("m"))
        .collect()[0]["m"]
        or 0.0
    )
    self_m = (
        bh.agg(F.sum(F.col("__b") * (F.col("__b") - 1) / 2).alias("m"))
        .collect()[0]["m"]
        or 0.0
    ) if include_batch_pairs else 0.0
    n_docs = new_sets.count()
    _append_jaccard_mass(
        path, n_docs, (float(cross) + float(self_m)) / max(n_docs, 1)
    )


def jaccard_join_incremental(
    new_df: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float | None = None,
    include_batch_pairs: bool = True,
    append: bool = True,
    record_mass: bool = True,
) -> DataFrame:
    """Exact Jaccard pairs (J >= threshold) TOUCHING an ingest batch —
    ``jaccard_join_prefix(store_corpus ∪ batch)`` restricted to pairs with
    a batch side (equivalence pinned by ``tests/test_dedup.py``), but the
    landed corpus is never re-shingled: the batch's grams order under the
    store's FROZEN census, its prefixes join the PERSISTED postings (plus
    the batch self-join), and verification reads the persisted gramsets.
    Batch cost: batch shingling + candidate joins — the daily shape.

    ``threshold`` defaults to the store's build threshold and must be >=
    it (prefixes shorten as t rises, so the stored postings stay complete;
    a lower t would need longer store prefixes than were persisted and
    rejects loudly). Ids must be disjoint from the store's ids.
    ``append=True`` (default) lands the batch's gramsets + postings into
    the store afterwards — computed once, reused for the sinks; pass
    False for a read-only screen (e.g. decontamination).
    ``include_batch_pairs=False`` drops batch-internal pairs (pure
    batch-vs-corpus screen). Returns (id_a, id_b, n_inter, n_a, n_b),
    engine-exact BIGINTs like the one-shot form.

    Crash recovery (round-11 review) = RERUN THE SAME BATCH, the store
    family's standard discipline: store reads HEAL a crashed prior
    attempt's rows away (any store row with a batch id can only be such
    an append — ids are contractually disjoint — so the rerun recomputes
    identical pairs), re-appended duplicate rows are result-neutral
    (candidate pairs go through a distinct; the verify side reads
    gramsets deduplicated per id; compaction prunes the copies), and the
    two appends land gramsets BEFORE postings so the mid-crash window
    leaves the batch invisible to future candidates rather than
    candidate-without-verify-row. A batch that crashes between the
    appends and is never rerun stays un-indexed — the same documented
    seam as the batch ingest runner's ordered sinks; use the rerun."""
    import os

    spark = new_df.sparkSession
    params = _read_jaccard_params(path)
    n, feature = int(params["n"]), params["feature"]
    bnum, bden = int(params["threshold_num"]), int(params["threshold_den"])
    if threshold is None:
        num, den = bnum, bden
    else:
        num, den = _jaccard_fraction(threshold)
        # t >= t_build  <=>  num/den >= bnum/bden
        if num * bden < bnum * den:
            raise ValueError(
                f"threshold {num}/{den} is below the store's build threshold "
                f"{bnum}/{bden} — the persisted prefixes would be incomplete; "
                "rebuild the store at the lower threshold"
            )
    census = spark.read.parquet(os.path.join(path, "census"))
    # heal-on-read: a store row with a batch id is a crashed prior
    # attempt's append (ids are contractually disjoint) — exclude it so a
    # rerun recomputes identical pairs; dedupe gramsets per id so a
    # rerun's duplicate append cannot fan out the verify join
    bids = new_df.select(F.col(id_col)).distinct()
    store_postings = spark.read.parquet(os.path.join(path, "postings")).join(
        F.broadcast(bids), id_col, "left_anti"
    )
    store_sets = (
        spark.read.parquet(os.path.join(path, "gramsets"))
        .join(F.broadcast(bids), id_col, "left_anti")
        .dropDuplicates([id_col])
    )

    g_new = _jaccard_gram_rows(new_df, text_col, id_col, n, feature).localCheckpoint(
        eager=True
    )
    verified, new_postings, new_sets = _jaccard_pairs_core(
        g_new,
        census,
        store_postings,
        store_sets,
        id_col=id_col,
        num=num,
        den=den,
        bnum=bnum,
        bden=bden,
        include_batch_pairs=include_batch_pairs,
        materialize=append,
    )
    if append:
        verified = verified.localCheckpoint(eager=True)
        # gramsets FIRST (see the crash-recovery docstring note)
        new_sets.write.mode("append").parquet(os.path.join(path, "gramsets"))
        new_postings.write.mode("append").parquet(os.path.join(path, "postings"))
        if record_mass:
            # record this batch's candidate mass per doc for the drift
            # heuristic (exact pre-filter row count of the candidate join:
            # cross = Σ_g b_g·c_g against the store, self = Σ_g C(b_g, 2)).
            # The store-side histogram re-aggregates the postings the join
            # just read — one extra store-side pass per batch; pass
            # record_mass=False on latency-critical paths and sample the
            # drift check out of band instead.
            _record_jaccard_batch_mass(
                path, new_postings, store_postings, new_sets, include_batch_pairs
            )
    return verified


def compact_jaccard_store(spark, path: str) -> None:
    """Re-census and rebuild the prefix-Jaccard store from its own
    gramsets (no document text needed): restores optimal pruning after
    census drift (see the store header note) and compacts the
    append-accumulated small files, through one atomic swap. Pair results
    are identical before and after (the order is a pruner, not a
    correctness input) — pinned by ``tests/test_dedup.py``.

    A STREAMING store (round 13: ``stream_jaccard_dedup``'s
    ``__batch_id``-partitioned sub-tables) keeps its partition layout
    through the rebuild — deduped gramsets retain their origin batch
    attribution and the rebuilt postings join it back per doc, so later
    micro-batch partition overwrites keep working (the discipline the
    other streaming store compactions already follow). Without this the
    partition column would survive as a plain DATA column, the next
    stream contact would misdetect the flat rebuild as the current
    partitioned layout, and its dynamic overwrite would interleave
    partition dirs with flat files — an unreadable mix. All rebuilt
    postings are computed under the ONE fresh census, so prefix
    completeness holds store-wide; a pre-compaction batch replayed
    afterwards recomputes under that same (current) census and
    overwrites its partition with identical rows."""
    import os

    from ..sources.writers import atomic_swap_write

    params = _read_jaccard_params(path)
    num, den = int(params["threshold_num"]), int(params["threshold_den"])
    sets = spark.read.parquet(os.path.join(path, "gramsets"))
    streaming = "__batch_id" in sets.columns
    id_col = [
        c for c in sets.columns if c not in ("gs", "n_grams", "__batch_id")
    ][0]
    # prune crashed-rerun duplicate appends along with the small files.
    # Also drop gramset rows whose id has NO posting row (round-11
    # advice): a batch that crashed between the gramsets and postings
    # appends and was never rerun is deliberately un-indexed — rebuilding
    # postings from ALL gramsets would resurrect it into the candidate
    # index even though its ingest never completed. Sound: every
    # fully-appended doc has >=1 posting (gramset rows only exist for
    # docs with >=1 gram, and plen >= 1), so this only removes the
    # half-appended seam, never a landed doc.
    posting_ids = (
        spark.read.parquet(os.path.join(path, "postings"))
        .select(id_col)
        .distinct()
    )
    sets = (
        sets.dropDuplicates([id_col])
        .join(posting_ids, id_col, "left_semi")
        .localCheckpoint(eager=True)
    )
    g = sets.select(F.col(id_col), F.explode("gs").alias("g"))
    census = g.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("df"))

    def _write(unused_df, staging):
        census.write.parquet(os.path.join(staging, "census"))
        frozen = spark.read.parquet(os.path.join(staging, "census"))
        posts = _jaccard_prefix_postings(g, frozen, id_col, num, den)
        if streaming:
            posts = posts.join(sets.select(id_col, "__batch_id"), id_col)
            posts.write.partitionBy("__batch_id").parquet(
                os.path.join(staging, "postings")
            )
            sets.write.partitionBy("__batch_id").parquet(
                os.path.join(staging, "gramsets")
            )
        else:
            posts.write.parquet(os.path.join(staging, "postings"))
            sets.write.parquet(os.path.join(staging, "gramsets"))

    def _finalize(staging):
        _write_params_sidecar(os.path.join(staging, "_jaccard_params.json"), params)
        # fresh census = fresh drift baseline, batch history reset
        _write_jaccard_mass(
            staging,
            _jaccard_build_cand_per_doc(
                spark.read.parquet(os.path.join(staging, "postings")), id_col
            ),
        )

    atomic_swap_write(sets, path, write_staging=_write, finalize_staging=_finalize)


def embedding_near_dups(df: DataFrame, id_col: str = "vec_id", threshold: float = 0.95) -> DataFrame:
    """Cosine-threshold near-dup pairs over an embedding column. Brute-force
    N² within the given frame — pre-filter or bucket (LSH / IVF /
    ``curation.hyperplane_lsh_pairs``) at scale.

    Shape: posexplode each vector to (id, pos, value), equi-join on the
    position, and groupBy-sum the products — every step codegen'd with
    map-side combine, measured 1.6× the nested-loop + interpreted-fold
    cosine it replaced (bit-identical output). Norms are one narrow
    aggregate, broadcast back."""
    ex = df.select(
        F.col(id_col).alias("id"), F.posexplode("embedding").alias("p", "v")
    ).select("id", "p", F.col("v").cast("double").alias("v"))
    norms = ex.groupBy("id").agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm"))
    a = ex.select(F.col("id").alias("id_a"), "p", F.col("v").alias("va"))
    b = ex.select(F.col("id").alias("id_b"), "p", F.col("v").alias("vb"))
    dots = (
        a.join(b, "p")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("__dot"))
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("nrm").alias("__na"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("nrm").alias("__nb"))
    sim = F.round(F.try_divide(F.col("__dot"), F.col("__na") * F.col("__nb")), 6)
    return (
        dots.join(F.broadcast(na), "id_a")
        .join(F.broadcast(nb), "id_b")
        .select("id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def _winnow_arrow_udf(k: int, w: int):
    """Arrow-batched winnowing: utf-32 decode vectorizes codepoint
    extraction, the Karp-Rabin fold is ``k`` numpy passes over the whole
    gram vector ((H*B + c) % M stays < 2^35 — int64-safe), and window
    minima come from a strided sliding view. Bit-identical to the
    expression path (pure integer arithmetic on codepoints), measured
    ~2000× faster per document than the interpreted higher-order fold."""
    import numpy as np

    from ..functions.text import WINNOW_BASE, WINNOW_MOD

    @F.pandas_udf("array<long>")
    def fps(texts: pd.Series) -> pd.Series:
        # Whole-batch vectorization: the per-doc loop paid ~80 µs/doc of
        # numpy small-array overhead (k passes over ~300-elem vectors).
        # Concatenate the batch's codepoints once, roll the hash globally
        # (k passes over the whole batch), and mask out windows that
        # straddle document boundaries — values at valid positions only
        # involve in-document codepoints, so they are bit-identical to the
        # per-doc fold.
        vals = texts.fillna("")
        ndocs = len(vals)
        lens = vals.str.len().to_numpy(dtype=np.int64)
        empty = pd.Series([[]] * ndocs, index=texts.index)
        total = int(lens.sum())
        if ndocs == 0 or total < k:
            return empty
        codes = np.frombuffer(
            "".join(vals.tolist()).encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
        nh = total - k + 1
        h = np.zeros(nh, dtype=np.int64)
        for j in range(k):
            h = (h * WINNOW_BASE + codes[j : j + nh]) % WINNOW_MOD
        if nh < w:
            return empty
        wmin = np.lib.stride_tricks.sliding_window_view(h, w).min(axis=1)
        # doc i's grams start at char offset g_i and number n_i = len_i-k+1;
        # its valid window starts are [g_i, g_i + n_i - w] (none if n_i < w)
        g = np.concatenate(([0], np.cumsum(lens)))[:-1]
        n_grams = np.maximum(lens - k + 1, 0)
        c = np.maximum(n_grams - w + 1, 0)
        doc_label = np.repeat(np.arange(ndocs), c)
        # grouped arange: for each doc, g_i + 0..c_i-1
        offs = np.concatenate(([0], np.cumsum(c)))
        win_starts = np.arange(offs[-1]) - np.repeat(offs[:-1], c) + np.repeat(g, c)
        mins = wmin[win_starts]
        # per-doc unique (ascending, matching np.unique): lexsort by
        # (doc, value), drop adjacent duplicates within a doc
        order = np.lexsort((mins, doc_label))
        sv, sd = mins[order], doc_label[order]
        keep = np.ones(len(sv), dtype=bool)
        keep[1:] = (sd[1:] != sd[:-1]) | (sv[1:] != sv[:-1])
        uv, ud = sv[keep], sd[keep]
        counts = np.bincount(ud, minlength=ndocs)
        return pd.Series(
            np.split(uv, np.cumsum(counts)[:-1]), index=texts.index
        )

    return fps


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    arrow: bool = True,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
    2003 — the MOSS algorithm): normalized char k-gram Karp-Rabin hashes,
    window-of-``w`` minima selected, distinct + sorted per doc. Returns
    (id_col, n_grams, fingerprints array<long>).

    Map-only at any scale — no shuffle either way. Normalization always
    runs ONCE as a materialized Spark column (inlining it would re-run the
    regex per gram-char inside nested lambdas). ``arrow=True`` (default)
    computes the rolling hash + sliding minima in vectorized numpy over
    Arrow batches; ``arrow=False`` keeps the pure-expression build
    (``kgram_hashes``/``winnow_select``) — bit-identical values (both are
    the same integer fold over codepoints; equivalence pytest-pinned), but
    the interpreted higher-order fold costs ~20 ms per 300-char doc vs
    ~10 µs vectorized.
    """
    from ..functions.text import normalize_for_fingerprint
    from ..sources.readers import spread

    base = spread(df, key=id_col).withColumn(
        "__wt", normalize_for_fingerprint(F.col(text_col))
    )
    n_grams = F.greatest(F.length("__wt") - F.lit(k - 1), F.lit(0)).alias("n_grams")
    if arrow:
        return base.select(
            F.col(id_col), n_grams, _winnow_arrow_udf(k, w)(F.col("__wt")).alias("fingerprints")
        )
    return (
        base.withColumn("__kg", kgram_hashes(F.col("__wt"), k))
        .select(
            F.col(id_col),
            F.size("__kg").alias("n_grams"),
            winnow_select(F.col("__kg"), w).alias("fingerprints"),
        )
    )


def winnow_overlap_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_bucket_size: int | None = None,
    arrow: bool = True,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints, with
    the containment estimate ``shared / min(|fp_a|, |fp_b|)`` — the
    boilerplate/plagiarism overlap detector. By the winnowing guarantee a
    shared substring of length >= k + w - 1 always yields a shared selected
    hash, so long verbatim overlaps cannot be missed.

    Scale shape: fingerprint sets are a map-only pass
    (``winnow_fingerprints``); pairs come from an equi-join on the
    fingerprint VALUE (never N×N). The exploded rows are repartitioned on
    ``fp`` ONCE before aliasing — both self-join sides (and the hot-bucket
    count) then hang off the SAME Exchange subtree, which Spark's
    ReuseExchange collapses so fingerprints are computed exactly once (the
    naive aliased self-join re-ran the whole map stage per side — plan
    asserted in tests). ``max_bucket_size`` drops degenerate fingerprints
    shared by more than that many docs (the same narrow-count + broadcast
    anti-join as the MinHash hot-bucket cap) — ubiquitous boilerplate grams
    would otherwise square into the join.
    Returns (id_a, id_b, shared, containment).
    """
    # PRE-PARTITIONED pair count (round 15, verdict r14 item 5): the old
    # shape ran ``groupBy(id_a, id_b, nf_a, nf_b).count()`` directly on
    # the join output, which fused a NO-REDUCTION partial hash aggregate
    # into the join stage — a pair repeats only when two of its shared
    # fps hash to the same partition, so the partial map absorbed ~all
    # 33M joined rows (sf1 tier) for nothing: 133 s stage CPU with
    # 676 MiB memory-spill, and the fast path DEPENDED on the 8 g local
    # heap forcing the sort-based agg fallback (a 16 g heap measured 3×
    # the CPU — guide §5's hash-vs-sort trade). The explicit
    # ``repartition(id_a, id_b)`` first satisfies the aggregation's
    # distribution, so the planner elides the aggregate's own exchange
    # (§2.4) and BOTH agg passes run AFTER the shuffle on co-located
    # rows: the join stage streams rows straight into the exchange (no
    # agg map, no spill), and the post-shuffle partial map fully reduces
    # over only its partition's ~2.3M/N keys — small, spill-free,
    # heap-independent. Alternatives measured on the checkpointed join
    # output (same session, warm noop sink): 4-key direct groupBy 11.6 s
    # vs this 6.9-8.0 s; a repartition+sort+Arrow run-length kernel lost
    # badly (Spark's sort + the Arrow boundary cost ~340 s of task time
    # on 33M rows). Values identical: same keys, same count, same
    # round/least/divide containment arithmetic.
    fps = winnow_fingerprints(df, text_col, id_col, k, w, arrow=arrow)
    ex = fps.select(
        F.col(id_col).alias("id"),
        F.size("fingerprints").alias("nf"),
        F.explode("fingerprints").alias("fp"),
    ).repartition("fp")
    if max_bucket_size is not None:
        ex = _drop_hot_buckets(ex, ["fp"], max_bucket_size)
    a = ex.select(F.col("id").alias("id_a"), F.col("nf").alias("nf_a"), "fp")
    b = ex.select(F.col("id").alias("id_b"), F.col("nf").alias("nf_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .repartition("id_a", "id_b")
        .groupBy("id_a", "id_b", "nf_a", "nf_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
        .select(
            "id_a",
            "id_b",
            "shared",
            F.round(
                F.col("shared").cast("double") / F.least("nf_a", "nf_b"), 6
            ).alias("containment"),
        )
    )


def winnow_store_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    arrow: bool = True,
) -> DataFrame:
    """(id, nf, fp) exploded winnowing-fingerprint rows — the persisted
    store form ``winnow_overlap_incremental`` joins against. Fingerprints
    are deterministic, so stored and freshly-computed rows are
    interchangeable (the same property the MinHash store lifecycle rests
    on)."""
    fps = winnow_fingerprints(df, text_col, id_col, k, w, arrow=arrow)
    return fps.select(
        F.col(id_col),
        F.size("fingerprints").alias("nf"),
        F.explode("fingerprints").alias("fp"),
    )


def write_winnow_store(store_df: DataFrame, path: str, *, k: int = 8, w: int = 4, mode: str = "append") -> None:
    """Persist winnow-store rows with a ``_winnow_params`` sidecar — same
    lifecycle discipline as ``write_minhash_store``: overwrite = atomic
    rebuild with the new label swapped in with the data; append = sidecar
    validated/written BEFORE the first data write (fingerprints from a
    different (k, w) share no values, so a silent mix yields zero
    store-side pairs)."""
    import os

    from ..sources.writers import atomic_swap_write

    params = {"k": k, "w": w}
    if mode == "overwrite":
        atomic_swap_write(
            store_df,
            path,
            finalize_staging=lambda staging: _write_params_sidecar(
                os.path.join(staging, "_winnow_params.json"), params
            ),
        )
        return
    _reject_streaming_layout_append(store_df, path, "winnow")
    ensure_winnow_params_sidecar(path, k=k, w=w)
    store_df.write.mode(mode).parquet(path)


def ensure_winnow_params_sidecar(path: str, *, k: int = 8, w: int = 4) -> None:
    """Write-or-validate the ``_winnow_params`` sidecar — the single entry
    point every winnow-store writer (batch or streaming) calls before its
    first data write, mirroring ``ensure_minhash_params_sidecar``."""
    import os

    params = {"k": k, "w": w}
    sidecar = os.path.join(path, "_winnow_params.json")
    if os.path.exists(sidecar):
        _validate_store_params(sidecar, params, label="winnow")
        return
    os.makedirs(path, exist_ok=True)
    _write_params_sidecar(sidecar, params)


def read_winnow_store(
    spark, path: str, *, k: int = 8, w: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Load a persisted winnow store, validating (k, w) against the sidecar
    — a mismatch raises instead of silently matching nothing."""
    import os

    sidecar = os.path.join(path, "_winnow_params.json")
    if os.path.exists(sidecar):
        _validate_store_params(sidecar, {"k": k, "w": w}, label="winnow")
    return spark.read.parquet(path).select(id_col, "nf", "fp")


def winnow_overlap_incremental(
    new_df: DataFrame,
    store: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_bucket_size: int | None = None,
    include_batch_pairs: bool = True,
) -> DataFrame:
    """Winnowing-overlap pairs for an INCREMENTAL ingest batch: every pair
    sharing >= ``min_shared`` fingerprints where at least one side is a new
    document — exactly ``winnow_overlap_pairs(old ∪ new)`` restricted to
    pairs touching the batch (equivalence pinned in ``tests/test_dedup.py``),
    but the existing corpus is never re-fingerprinted: only its (id, nf, fp)
    store rows join in. Ids must be disjoint between batch and store.

    ``include_batch_pairs=False`` keeps only batch-vs-store pairs — the
    verbatim-overlap tier of benchmark decontamination (store the eval
    set's fingerprints once, screen every ingest batch). The hot-fp cap
    counts over the COMBINED corpus regardless (same census discipline as
    ``minhash_dedup_incremental``). Returns
    (id_a, id_b, shared, containment).
    """
    new_rows = winnow_store_rows(new_df, text_col, id_col, k, w).withColumn(
        "__new", F.lit(1)
    )
    store_rows = store.select(F.col(id_col), "nf", "fp").withColumn("__new", F.lit(0))
    # one repartition("fp") that EVERY consumer (hot-fp census, both join
    # sides) hangs off, so the batch fingerprint map stage and the store
    # scan run once (ReusedExchange — the same restructure that took
    # winnow_overlap_pairs from 3.9 s to 2.4 s; without it the Arrow UDF
    # executes once per consumer)
    combined = store_rows.unionByName(new_rows).repartition("fp")
    if max_bucket_size is not None:
        hot = (
            combined.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("__bn"))
            .filter(F.col("__bn") > max_bucket_size)
            .select("fp")
        )
        combined = combined.join(F.broadcast(hot), ["fp"], "left_anti")
    other = combined if include_batch_pairs else combined.filter(F.col("__new") == 0)
    a = combined.filter(F.col("__new") == 1).select(
        F.col(id_col).alias("id_n"), F.col("nf").alias("nf_n"), "fp"
    )
    b = other.select(
        F.col(id_col).alias("id_o"), F.col("nf").alias("nf_o"), "fp", F.col("__new").alias("__new_o")
    )
    # count each shared fp exactly once per pair: batch-vs-store pairs only
    # appear as (new, old); batch-vs-batch pairs appear in both orders, so
    # keep them in id order only
    pairs = (
        a.join(b, "fp")
        .filter((F.col("__new_o") == 0) | (F.col("id_n") < F.col("id_o")))
        .filter(F.col("id_n") != F.col("id_o"))
        .withColumn("id_a", F.least("id_n", "id_o"))
        .withColumn("id_b", F.greatest("id_n", "id_o"))
        .groupBy("id_a", "id_b", "nf_n", "nf_o")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return pairs.select(
        "id_a",
        "id_b",
        "shared",
        F.round(F.col("shared").cast("double") / F.least("nf_n", "nf_o"), 6).alias(
            "containment"
        ),
    )


def compact_winnow_store(
    spark,
    path: str,
    *,
    live_ids: DataFrame | None = None,
    drop_ids: DataFrame | None = None,
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
) -> None:
    """Bound winnow-store growth — the ``compact_minhash_store`` twin for
    the fingerprint store: drop rows of documents later deleted/deduped
    (``drop_ids`` anti-join) or keep only surviving documents
    (``live_ids`` semi-join; exactly one must be given), rewriting through
    the atomic staging swap with the ``_winnow_params`` sidecar placed in
    staging before the swap. Fingerprints are per-document and
    deterministic, so dropping rows never changes surviving pairs
    (pinned by ``tests/test_dedup.py``). A streaming store's
    ``__batch_id`` partition layout is preserved so later micro-batch
    overwrites keep landing consistently."""
    _compact_store(
        spark,
        path,
        live_ids=live_ids,
        drop_ids=drop_ids,
        id_col=id_col,
        params={"k": k, "w": w},
        sidecar_name="_winnow_params.json",
        label="winnow",
    )


# --------------------------------------------------------------------------
# Incremental SimHash: persisted signature store + batch-vs-store pairs.
# Completes the incremental family (exact / minhash / winnow / semantic all
# have stores). Unlike the MinHash store, the rows carry the RAW 64-bit
# signature and pigeonhole banding happens at query time — so one store
# serves ANY max_hamming, and the sidecar pins only the hash algorithm
# (a token-hash change would silently match nothing against an old store).
# --------------------------------------------------------------------------

_SIMHASH_ALGO = "xxhash64-token-majority-v1"


def simhash_store_rows(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash64): the persisted store form for incremental simhash
    near-dup detection — 8 bytes per landed document. Uses the attach-form
    fold: standalone (no self-join to feed) it is the faster path at every
    measured size (0.36 s vs 0.42 s even at 50k docs — the grouped
    ``simhash_signatures`` wins only where exchange reuse amortizes it,
    i.e. inside ``simhash_near_dups``; round-6 review). Both paths are
    bit-identical, so stores built by either interoperate."""
    return simhash(df, text_col).select(id_col, "simhash64")


def write_simhash_store(store_df: DataFrame, path: str, *, mode: str = "append") -> None:
    """Persist ``simhash_store_rows`` with a ``_simhash_params`` sidecar —
    same lifecycle discipline as ``write_minhash_store``: overwrite =
    atomic rebuild with the label swapped in with the data; append =
    sidecar validated/written before the first data write,
    streaming-layout stores rejected."""
    import os

    from ..sources.writers import atomic_swap_write

    params = {"algo": _SIMHASH_ALGO, "n_bits": 64}
    if mode == "overwrite":
        atomic_swap_write(
            store_df,
            path,
            finalize_staging=lambda staging: _write_params_sidecar(
                os.path.join(staging, "_simhash_params.json"), params
            ),
        )
        return
    _reject_streaming_layout_append(store_df, path, "simhash")
    ensure_simhash_params_sidecar(path)
    store_df.write.mode(mode).parquet(path)


def ensure_simhash_params_sidecar(path: str) -> None:
    """Write-or-validate the ``_simhash_params`` sidecar (see
    ``write_simhash_store``)."""
    import os

    from ..sources.writers import recover_interrupted_swap

    # heal a hard-crashed atomic_swap_write FIRST: in the window between
    # its two renames the store dir is missing (its contents — including
    # this sidecar — sit in a .backup sibling), and recreating the dir
    # with a fresh sidecar here would make the later recovery pass treat
    # the backup as post-swap litter and DELETE it (round-7 review).
    recover_interrupted_swap(path)
    params = {"algo": _SIMHASH_ALGO, "n_bits": 64}
    sidecar = os.path.join(path, "_simhash_params.json")
    if os.path.exists(sidecar):
        _validate_store_params(sidecar, params, label="simhash")
        return
    os.makedirs(path, exist_ok=True)
    _write_params_sidecar(sidecar, params)


def read_simhash_store(spark, path: str, *, id_col: str = "doc_id") -> DataFrame:
    """Load a persisted simhash store, validating the algorithm sidecar —
    a hash-algorithm mismatch raises instead of silently matching nothing."""
    import os

    sidecar = os.path.join(path, "_simhash_params.json")
    if os.path.exists(sidecar):
        _validate_store_params(
            sidecar, {"algo": _SIMHASH_ALGO, "n_bits": 64}, label="simhash"
        )
    return spark.read.parquet(path).select(id_col, "simhash64")


def simhash_near_dups_incremental(
    new_df: DataFrame,
    store: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
    include_batch_pairs: bool = True,
    new_sigs: DataFrame | None = None,
) -> DataFrame:
    """Simhash near-dup pairs for an INCREMENTAL ingest batch: every pair
    with Hamming distance <= ``max_hamming`` where at least one side is a
    new document — exactly ``simhash_near_dups(old ∪ new)`` restricted to
    pairs touching the batch (equivalence pinned by ``tests/test_dedup.py``),
    but the existing corpus is never re-hashed: only its (id, simhash64)
    store rows join in, and banding those is a projection over 8-byte
    signatures, not a pass over text. Ids must be disjoint between batch
    and store.

    Pigeonhole recall is preserved: batch and store rows are banded by the
    SAME ``max_hamming + 1`` disjoint slices, so any qualifying pair shares
    at least one (band, value) bucket whichever side each doc is on. The
    hot-bucket cap counts over the COMBINED corpus (same census discipline
    as ``minhash_dedup_incremental``); ``include_batch_pairs=False`` keeps
    only batch-vs-store pairs — the simhash tier of benchmark
    decontamination. Returns (id_a, id_b, hamming) with id_a < id_b.
    """
    n_bands = max_hamming + 1
    if n_bands > 64:
        # same guard as hamming_band_pairs: 65+ bands over 64 bits would
        # give zero-width slices whose bv=0 buckets cross-join everything
        raise ValueError(f"max_hamming={max_hamming} needs more bands than bits (64)")
    # batch signatures use the ATTACH-form fold, and there is deliberately
    # NO repartition here — the opposite of hamming_band_pairs, by
    # measurement (SCALING.md): the store side is already a cheap 8-byte
    # signature scan (nothing expensive to reuse), the a-side's
    # __new == 1 filter constant-folds the store branch of the union away
    # (so the store is scanned once either way), and a repartition would
    # shuffle store+batch band rows an extra time for no reuse benefit
    # (measured 2x slower at a 49.5k-row store). The fold recomputing per
    # side costs only |batch|.
    new_rows = (
        new_sigs.select(id_col, "simhash64")
        if new_sigs is not None
        else simhash(new_df, text_col).select(id_col, "simhash64")
    ).withColumn("__new", F.lit(1))
    store_rows = store.select(F.col(id_col), "simhash64").withColumn("__new", F.lit(0))
    banded = (
        store_rows.unionByName(new_rows)
        .select(
            F.col(id_col).alias("__id"),
            F.col("simhash64").alias("__sig"),
            "__new",
            F.explode(_hamming_bands_expr("simhash64", 64, n_bands)).alias("bk"),
        )
        .select("__id", "__sig", "__new", F.col("bk.band").alias("band"), F.col("bk.bv").alias("bv"))
    )
    if max_bucket_size is not None:
        banded = _drop_hot_buckets(banded, ["band", "bv"], max_bucket_size)
    a = banded.filter(F.col("__new") == 1).select(
        F.col("__id").alias("id_n"), F.col("__sig").alias("h_n"), "band", "bv"
    )
    other = banded if include_batch_pairs else banded.filter(F.col("__new") == 0)
    b = other.select(
        F.col("__id").alias("id_o"),
        F.col("__sig").alias("h_o"),
        "band",
        "bv",
        F.col("__new").alias("__new_o"),
    )
    hamming = F.bit_count(F.col("h_n").bitwiseXOR(F.col("h_o"))).cast("int")
    # keep each qualifying pair exactly once: new-vs-old always appears as
    # (new, old); new-vs-new appears in both orders, so keep id order only
    return (
        a.join(b, ["band", "bv"])
        .filter((F.col("__new_o") == 0) | (F.col("id_n") < F.col("id_o")))
        .filter(F.col("id_n") != F.col("id_o"))
        .select(
            F.least("id_n", "id_o").alias("id_a"),
            F.greatest("id_n", "id_o").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def _compact_store(
    spark,
    path: str,
    *,
    live_ids: DataFrame | None,
    drop_ids: DataFrame | None,
    id_col: str,
    params: dict,
    sidecar_name: str,
    label: str,
) -> None:
    """Shared store-compaction body (minhash / winnow / simhash): validate
    the params sidecar, semi-join (``live_ids``) or anti-join (``drop_ids``)
    the store rows, and rewrite through the atomic staging swap with the
    sidecar placed in staging BEFORE the swap — readers see the old or the
    compacted store, never a partial or unlabeled one. A streaming store's
    ``__batch_id`` partition layout is preserved so later micro-batch
    overwrites keep landing consistently. Store rows are per-document and
    deterministic in every tier, so dropping rows never changes surviving
    pairs (pinned per tier in ``tests/test_dedup.py``)."""
    import json
    import os

    from ..sources.writers import atomic_swap_write

    if (live_ids is None) == (drop_ids is None):
        raise ValueError("pass exactly one of live_ids / drop_ids")
    sidecar = os.path.join(path, sidecar_name)
    bucket_by = bucket_n = None
    full_params = dict(params)
    if os.path.exists(sidecar):
        # a BUCKETED store (minhash round-9 layout) records its bucket
        # spec in the sidecar; the base parameters must still match, and
        # the compacted rewrite preserves the bucketed layout so later
        # incremental joins keep their shuffle-free store side
        _validate_store_params(sidecar, params, label=label, ignore_keys=_BUCKET_KEYS)
        if sidecar_name == "_minhash_params.json":
            spec = minhash_store_bucket_spec(path)
            if spec is not None:
                bucket_by, bucket_n = spec
                full_params.update({"bucket_by": bucket_by, "num_buckets": bucket_n})
    store = spark.read.parquet(path)
    if live_ids is not None:
        kept = store.join(live_ids.select(id_col).distinct(), id_col, "left_semi")
    else:
        kept = store.join(drop_ids.select(id_col).distinct(), id_col, "left_anti")
    atomic_swap_write(
        kept,
        path,
        partition_by=["__batch_id"] if "__batch_id" in store.columns else None,
        finalize_staging=lambda staging: _write_params_sidecar(
            os.path.join(staging, sidecar_name), full_params
        ),
        write_staging=(
            _bucketed_staging_writer(bucket_by, bucket_n)
            if bucket_by is not None
            else None
        ),
    )
    if bucket_by is not None:
        # the catalog entry's files changed under it; drop + re-register so
        # the next read sees the compacted buckets (refresh alone would do,
        # but the entry may not exist in this session at all)
        spark.sql(f"DROP TABLE IF EXISTS `{_bucketed_store_table(path)}`")
        _register_bucketed_store(spark, path, bucket_by, bucket_n)


def compact_simhash_store(
    spark,
    path: str,
    *,
    live_ids: DataFrame | None = None,
    drop_ids: DataFrame | None = None,
    id_col: str = "doc_id",
) -> None:
    """Bound simhash-store growth — the ``compact_minhash_store`` twin for
    the raw-signature store (see ``_compact_store`` for the shared
    lifecycle guarantees)."""
    _compact_store(
        spark,
        path,
        live_ids=live_ids,
        drop_ids=drop_ids,
        id_col=id_col,
        params={"algo": _SIMHASH_ALGO, "n_bits": 64},
        sidecar_name="_simhash_params.json",
        label="simhash",
    )
