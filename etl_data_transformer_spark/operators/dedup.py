"""Deduplication operators for training-data pipelines (SURVEY.md §2.10).

Builds up from the reference's full-row DISTINCT (A4,
``csv_to_parquet_transformer.py:13``, ``I:171``) to the near-dup family a
100 TB corpus needs:

- ``exact_dedup``            — sha256 content hash → keep first per group.
  One shuffle on a 32-byte key regardless of document size.
- ``minhash_lsh_candidates`` — shingle → k minhashes → b bands → bucket
  equi-join. All JVM-side built-ins; candidate generation never cross-joins.
- ``minhash_dedup``          — candidates verified by exact shingle Jaccard.
- ``simhash``                — 64-bit simhash via an Arrow-batched pandas UDF
  (the documented slow path: 64 per-bit majority sums aren't expressible as
  a sane codegen expression).
- ``ngram_jaccard_pairs``    — exact n-gram Jaccard on candidate pairs.
- ``embedding_near_dups``    — cosine-threshold pairs over embeddings.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions.text import fingerprint, shingles
from ..functions.vector import cosine


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


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Duplicate-group report: (fingerprint, n_copies, keeper_id) for groups
    with more than one member."""
    return (
        df.withColumn("fp", fingerprint(text_col))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min(id_col).alias("keeper_id"))
        .filter(F.col("n_copies") > 1)
    )


def _minhashes(shingle_col, num_hashes: int):
    """k minhash values: min over shingles of xxhash64(seed_i ++ shingle).
    Seeded by prefixing the hash input — deterministic, JVM-side."""
    return F.array(
        *[
            F.array_min(F.transform(shingle_col, lambda s, i=i: F.xxhash64(F.concat(F.lit(f"seed{i}:"), s))))
            for i in range(num_hashes)
        ]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """LSH candidate pairs: docs sharing any (band_idx, band_signature)
    bucket. rows_per_band = num_hashes / bands.

    Scale shape: explode to ``bands`` rows per doc, shuffle on the band
    signature, self-join within buckets only — never an N×N cross join.
    """
    rows_per_band = num_hashes // bands
    sigs = (
        df.select(id_col, shingles(text_col, shingle_n).alias("sh"))
        .filter(F.size("sh") > 0)
        .withColumn("mh", _minhashes(F.col("sh"), num_hashes))
    )
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
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
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
) -> DataFrame:
    """Near-dup pairs: LSH candidates verified by exact shingle Jaccard ≥
    threshold. Returns (id_a, id_b, jaccard_sim)."""
    cands = minhash_lsh_candidates(df, text_col, id_col, shingle_n, num_hashes, bands)
    sh = df.select(F.col(id_col), shingles(text_col, shingle_n).alias("sh"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard_sim"))
        .filter(F.col("jaccard_sim") >= threshold)
    )


@pandas_udf(T.LongType())
def _simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens, md5-based (deterministic across
    processes — no PYTHONHASHSEED dependence). Arrow-batched slow path."""
    import hashlib

    out = []
    for t in texts:
        if not t:
            out.append(0)
            continue
        acc = [0] * 64
        for tok in t.split():
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            for bit in range(64):
                acc[bit] += 1 if (h >> bit) & 1 else -1
        v = 0
        for bit in range(64):
            if acc[bit] > 0:
                v |= 1 << bit
        # wrap to signed 64-bit for LongType
        out.append(v - (1 << 64) if v >= (1 << 63) else v)
    return pd.Series(out)


def simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a 64-bit simhash column (``simhash64``)."""
    return df.withColumn("simhash64", _simhash64(F.col(text_col)))


def simhash_near_dups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance, blocked on the top 16 bits
    (near-dups almost always share the high band; avoids N×N)."""
    hashed = simhash(df, text_col).select(id_col, "simhash64")
    blocked = hashed.withColumn("block", F.shiftrightunsigned("simhash64", 48))
    a = blocked.select(F.col(id_col).alias("id_a"), F.col("simhash64").alias("h_a"), "block")
    b = blocked.select(F.col(id_col).alias("id_b"), F.col("simhash64").alias("h_b"), "block")
    pairs = a.join(b, "block").filter(F.col("id_a") < F.col("id_b"))
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return pairs.select("id_a", "id_b", hamming.alias("hamming")).filter(F.col("hamming") <= max_hamming)


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
    for the LSH candidate path. O(N²): bound the input (the catalog caps it
    at 100 docs); at corpus scale use ``minhash_dedup`` and verify samples
    against this."""
    from ..functions.text import char_ngrams

    g = df.filter(F.length(text_col) >= n).select(F.col(id_col), char_ngrams(text_col, n).alias("g"))
    a = g.select(F.col(id_col).alias("id_a"), F.col("g").alias("g_a"))
    b = g.select(F.col(id_col).alias("id_b"), F.col("g").alias("g_b"))
    sim = F.round(jaccard(F.col("g_a"), F.col("g_b")), 4)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias(f"jaccard_{n}gram"))
        .filter(F.col(f"jaccard_{n}gram") >= threshold)
    )


def embedding_near_dups(df: DataFrame, id_col: str = "vec_id", threshold: float = 0.95) -> DataFrame:
    """Cosine-threshold near-dup pairs over an embedding column. Brute-force
    N² within the given frame — pre-filter or bucket (LSH/IVF) at scale."""
    a = df.select(F.col(id_col).alias("id_a"), F.col("embedding").alias("e_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col("embedding").alias("e_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.select("id_a", "id_b", F.round(cosine("e_a", "e_b"), 6).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )
