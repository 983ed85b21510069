"""Composed incremental ingest — one call runs a new document batch through
every persisted dedup-store tier (exact fingerprints → MinHash near-dup →
SimHash near-dup), drops the batch's losers, appends the SURVIVORS' rows to
each store, and reports per-tier counts. This is the daily shape at 100 TB:
each tier joins the batch against signature stores (bytes per landed doc),
the corpus text is never re-read, and the pipeline is a composition of the
already-equivalence-pinned incremental operators
(``operators/dedup.exact_dedup_incremental`` /
``minhash_dedup_incremental`` / ``simhash_near_dups_incremental``).

Extends the reference's single-shot DISTINCT cleanse
(``csv_to_parquet_transformer.py:13``) to the recurring-ingest lifecycle its
SQL job implies (``Incremental_load_fact_item_status.sql:23-34``'s
delete-insert window, re-expressed as store-backed dedup).

Drop policy (greedy lowest-id-wins, the same convention as
``exact_dedup``): a batch document is dropped when any dedup pair partners
it with a STORE document (the landed corpus always wins) or with a
LOWER-id batch document. The rule is evaluated distributed from the pair
list — no assumption that batch ids sort above store ids. Chained batch
pairs resolve greedily (b dropped for pairing with a, even if a is itself
dropped for pairing with a store doc); use
``operators/graph.connected_components`` downstream when cluster-exact
resolution matters.

Durability: stores are appended AFTER all tiers compute (survivors are
pinned first via ``localCheckpoint``), and the optional survivors sink is
written before any store append, so a crash mid-append leaves the
survivors output consistent and the rerun-able unit is the whole batch.
Single-writer by design (the ingest owner); idempotent re-runs need the
streaming twins (``streaming/pipeline.stream_*_dedup``), whose
batch-partitioned sinks exist for exactly that.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class IngestReport:
    """Per-tier audit of one ingest batch (the same never-silent discipline
    as the capped-join audits): input size, survivor count after each
    enabled tier, and the near-dup pair volumes that drove the drops."""

    n_batch: int
    n_after_exact: int
    n_after_minhash: int | None
    n_after_simhash: int | None
    n_landed: int
    minhash_pairs: int | None
    simhash_pairs: int | None


def _near_losers(pairs: DataFrame, survivors: DataFrame, id_col: str) -> DataFrame:
    """Distinct batch ids dropped by a pair list: a doc loses when its
    partner is a store doc (not in ``survivors``) or a lower-id batch doc.
    Evaluated with joins (no driver-side id set), so the batch can be
    arbitrarily large and ids need no global ordering."""
    sides = pairs.select(F.col("id_a").alias("doc"), F.col("id_b").alias("partner")).unionByName(
        pairs.select(F.col("id_b").alias("doc"), F.col("id_a").alias("partner"))
    )
    bids = survivors.select(F.col(id_col).alias("doc")).distinct()
    batch_sides = sides.join(bids, "doc", "left_semi")
    partner_in_batch = survivors.select(
        F.col(id_col).alias("partner"), F.lit(1).alias("__pb")
    ).distinct()
    return (
        batch_sides.join(partner_in_batch, "partner", "left")
        .filter(F.col("__pb").isNull() | (F.col("partner") < F.col("doc")))
        .select(F.col("doc").alias(id_col))
        .distinct()
    )


def run_incremental_ingest(
    batch: DataFrame,
    *,
    exact_store: str,
    minhash_store: str | None = None,
    simhash_store: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    minhash_threshold: float = 0.8,
    shingle_n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    simhash_max_hamming: int = 3,
    max_bucket_size: int | None = None,
    survivors_path: str | None = None,
    audit_path: str | None = None,
) -> IngestReport:
    """Run one ingest batch through the enabled dedup tiers (exact is
    mandatory — it is the cheapest and catches byte-duplicates the banded
    tiers would also flag; MinHash/SimHash tiers activate when their store
    path is given). Batch ids must be disjoint from every store's ids (the
    shared incremental-dedup contract). Absent/empty stores take the
    first-batch path (full-batch dedup) — any OTHER store-read failure
    propagates rather than silently degrading to batch-only dedup (the
    ``_read_store_or_none`` discipline)."""
    from ..operators import dedup as DD
    from ..sources.writers import append_parquet
    from ..streaming.pipeline import _read_store_or_none

    spark = batch.sparkSession
    batch = batch.select(id_col, text_col)
    n_batch = batch.count()
    if n_batch == 0:
        return IngestReport(
            0,
            0,
            0 if minhash_store else None,
            0 if simhash_store else None,
            0,
            0 if minhash_store else None,
            0 if simhash_store else None,
        )

    # tier 1: exact fingerprints (store absent → plain in-batch exact dedup)
    ex_store = _read_store_or_none(spark, exact_store)
    if ex_store is None:
        survivors = DD.exact_dedup(batch, text_col, id_col)
    else:
        survivors = DD.exact_dedup_incremental(
            batch, ex_store.select(id_col, "fp"), text_col, id_col
        )
    survivors = survivors.localCheckpoint(eager=True)
    n_after_exact = survivors.count()

    # tier 2: MinHash near-dup
    n_after_minhash = mh_pairs_n = None
    if minhash_store is not None:
        mh_kw = dict(
            text_col=text_col,
            id_col=id_col,
            threshold=minhash_threshold,
            shingle_n=shingle_n,
            num_hashes=num_hashes,
            bands=bands,
            max_bucket_size=max_bucket_size,
        )
        mh_store = _read_store_or_none(spark, minhash_store)
        if mh_store is None:
            pairs = DD.minhash_dedup(survivors, **mh_kw)
        else:
            pairs = DD.minhash_dedup_incremental(
                survivors, mh_store.select(id_col, "hs", "sig"), **mh_kw
            )
        pairs = pairs.localCheckpoint(eager=True)
        mh_pairs_n = pairs.count()
        if mh_pairs_n:
            survivors = survivors.join(
                _near_losers(pairs, survivors, id_col), id_col, "left_anti"
            ).localCheckpoint(eager=True)
        n_after_minhash = survivors.count()

    # tier 3: SimHash near-dup
    n_after_simhash = sh_pairs_n = None
    if simhash_store is not None:
        sh_store = _read_store_or_none(spark, simhash_store)
        if sh_store is None:
            pairs = DD.simhash_near_dups(
                survivors, text_col, id_col, simhash_max_hamming, max_bucket_size
            )
        else:
            pairs = DD.simhash_near_dups_incremental(
                survivors,
                sh_store.select(id_col, "simhash64"),
                text_col,
                id_col,
                simhash_max_hamming,
                max_bucket_size,
            )
        pairs = pairs.localCheckpoint(eager=True)
        sh_pairs_n = pairs.count()
        if sh_pairs_n:
            survivors = survivors.join(
                _near_losers(pairs, survivors, id_col), id_col, "left_anti"
            ).localCheckpoint(eager=True)
        n_after_simhash = survivors.count()

    n_landed = survivors.count()

    # sinks: survivors first, then each store's rows FOR THE SURVIVORS —
    # future batches dedup against the kept corpus (a dropped exact dup
    # shares its keeper's fingerprint anyway; a dropped near-dup's
    # signature is intentionally not retained)
    if survivors_path is not None:
        append_parquet(survivors, survivors_path)
    DD.write_exact_store(
        DD.exact_fingerprint_store(survivors, text_col, id_col), exact_store
    )
    if minhash_store is not None:
        DD.write_minhash_store(
            DD.minhash_signature_store(survivors, text_col, id_col, shingle_n, num_hashes, bands),
            minhash_store,
            shingle_n=shingle_n,
            num_hashes=num_hashes,
            bands=bands,
        )
    if simhash_store is not None:
        DD.write_simhash_store(
            DD.simhash_store_rows(survivors, text_col, id_col), simhash_store
        )

    report = IngestReport(
        n_batch,
        n_after_exact,
        n_after_minhash,
        n_after_simhash,
        n_landed,
        mh_pairs_n,
        sh_pairs_n,
    )
    if audit_path is not None:
        write_ingest_audit(spark, audit_path, report)
    return report


def write_ingest_audit(spark, audit_path: str, report: IngestReport) -> None:
    """Append one audit row per ingest batch — the same never-silent
    lifecycle record as ``plans/incremental.write_audit`` (C5, the
    reference's ``proc_elc_audit_insert``, I:331-341), carrying the
    per-tier counts so dedup aggressiveness is reviewable over time."""
    import datetime as dt

    row = [
        (
            report.n_batch,
            report.n_after_exact,
            report.n_after_minhash,
            report.n_after_simhash,
            report.n_landed,
            report.minhash_pairs,
            report.simhash_pairs,
            dt.datetime.now(dt.timezone.utc).replace(tzinfo=None),
        )
    ]
    cols = (
        "n_batch long, n_after_exact long, n_after_minhash long, "
        "n_after_simhash long, n_landed long, minhash_pairs long, "
        "simhash_pairs long, ingest_ts timestamp"
    )
    spark.createDataFrame(row, cols).write.mode("append").parquet(audit_path)
