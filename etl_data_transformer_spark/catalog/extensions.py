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

def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint per document (sha256 over normalized text)."""
    return _docs(spark, sf_dir).select("doc_id", TX.fingerprint("text").alias("fp"))


def q_exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy: per content group, copies + keeper id."""
    d = _docs(spark, sf_dir)
    return (
        d.withColumn("fp", TX.fingerprint("text"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper_id"))
    )


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs verified by shingle Jaccard.
    Non-SQL (seeded xxhash64 banding) → rows-only check."""
    return DD.minhash_dedup(_docs(spark, sf_dir), threshold=0.3).orderBy("id_a", "id_b")


def q_simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document (Arrow-batched pandas UDF slow path).
    Non-SQL → rows-only check."""
    return DD.simhash(_docs(spark, sf_dir)).select("doc_id", "simhash64")


def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-distance near-dup pairs, blocked on the high band.
    Non-SQL → rows-only check."""
    return DD.simhash_near_dups(_docs(spark, sf_dir), max_hamming=16)


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


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via BucketedRandomProjectionLSH (MLlib scale path).
    Non-SQL → rows-only check."""
    e = _emb(spark, sf_dir).select(F.col("vec_id").alias("id"), "embedding")
    q = e.filter(F.col("id") < 10)
    return SIM.lsh_topk(q, e, k=5)


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style bucketed ANN (pure-DataFrame scale path).
    Non-SQL (seeded projections) → rows-only check."""
    e = _emb(spark, sf_dir).select(F.col("vec_id").alias("id"), "embedding")
    q = e.filter(F.col("id") < 10)
    return SIM.ivf_topk(q, e, k=5)


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
