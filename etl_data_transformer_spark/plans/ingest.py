"""Composed incremental ingest — one call runs a new document batch through
every persisted dedup-store tier (exact fingerprints → MinHash near-dup →
SimHash near-dup, plus the opt-in passage-REWRITE tier that masks
duplicated passages out of the survivors before they land), drops the
batch's losers, appends the SURVIVORS' rows to each store, and reports
per-tier counts. This is the daily shape at 100 TB: each tier joins the
batch against signature stores (bytes per landed doc), the corpus text is
never re-read, and the pipeline is a composition of the
already-equivalence-pinned incremental operators
(``operators/dedup.exact_dedup_incremental`` /
``minhash_dedup_incremental`` / ``simhash_near_dups_incremental`` /
``curation.dedup_passages_incremental``).

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
pinned first via ``localCheckpoint``). Store reads HEAL partial prior
attempts: any store row whose id is in the current batch can only be a
crashed earlier run's append (ids are contractually disjoint), and is
excluded (``_drop_replayed_batch_rows``) — so a rerun recomputes the SAME
survivors, and re-appending duplicates store rows is result-neutral
(every tier's join semantics are duplicate-insensitive; compaction prunes
them). The one non-idempotent sink is ``survivors_path``: a rerun after a
crash between its write and the last store append double-appends there —
callers needing exactly-once landed output use the streaming twins
(``streaming/pipeline.stream_*_dedup``), whose batch-partitioned sinks
exist for exactly that — or ``run_incremental_ingest_txn``, which
publishes all five sinks through one journaled ``manifest.multi_commit``
(no torn state at all). Store sidecars and layouts are validated UP FRONT
(before any tier computes or sink writes), so a parameter mismatch or a
streaming-layout store fails the batch cleanly rather than after partial
appends. Single-writer by design (the ingest owner).
"""

from __future__ import annotations

from collections.abc import Sequence  # noqa: F401 (signature annotations)
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
    # oversized-bucket audits (None unless the tier ran WITH a cap): the
    # number of degenerate buckets the cap excluded over the combined
    # batch+store corpus — a capped run must never be silent
    minhash_capped_buckets: int | None = None
    simhash_capped_buckets: int | None = None
    # passage-REWRITE tier audit (None unless the tier ran): total tokens
    # masked out of the landed survivors and how many documents were
    # touched — the "how much template mass did this batch carry" signal
    passage_tokens_removed: int | None = None
    passage_docs_touched: int | None = None
    # quality-gate tier audit (None unless the tier ran): documents the
    # NB-model gate dropped BEFORE any dedup tier saw them
    n_quality_dropped: int | None = None
    # entropy pre-gate audit (None unless the gate ran): documents the
    # map-only char-entropy floor dropped before even the NB gate scored
    n_entropy_dropped: int | None = None
    # the NB-gate threshold ACTUALLY APPLIED to this batch (None unless
    # the gate ran) — with the frozen-threshold mode (round-9 verdict
    # item 6: the FineWeb top-fraction cut can't run per-batch, so the
    # corpus-relative threshold is derived periodically and applied as a
    # per-batch constant) the audit trail shows which frozen value gated
    # each batch, so a threshold refresh is visible in the table
    nb_threshold_micros: int | None = None
    # domain-tier audit (round 11, None unless the tier ran): documents
    # dropped by the registered-domain blocklist/allowlist gate, and
    # in-batch canonical-URL aliases collapsed before the content tiers
    # (with a keeper store, round 12, this also counts cross-batch
    # same-content re-crawls)
    n_domain_dropped: int | None = None
    n_url_alias_dropped: int | None = None
    # canonical-URL keeper tier (round 12, None unless url_keeper_store
    # ran): re-crawls with CHANGED content routed to a CDC update of the
    # keeper document instead of the content dedup tiers
    n_url_updates: int | None = None
    # exact prefix-Jaccard tier (round 14, None unless jaccard_store /
    # jaccard_table ran): survivor count after the tier and the exact
    # J >= t pair volume that drove the drops — the last, most precise
    # near-dup tier, so it runs on the fewest documents
    n_after_jaccard: int | None = None
    jaccard_pairs: int | None = None


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


def _batch_fingerprint(batch: DataFrame, id_col: str) -> str:
    """Deterministic, order-independent 64-bit fingerprint of a batch's id
    set (``bit_xor`` of per-id xxhash64 — ids are unique within a batch, so
    XOR never cancels). The passage count store is keyed by window HASH,
    not doc id, so the id-anti-join idempotence the other stores use can't
    apply; the fingerprint names each batch's count rows instead, giving a
    rerun something to overwrite (plain mode) or exclude on read (both
    modes) — the same role ``__batch_id`` plays for the streaming twins,
    derived from content because the batch runner has no checkpoint."""
    v = batch.select(
        F.expr(f"bit_xor(xxhash64(`{id_col}`))").alias("__fp")
    ).collect()[0]["__fp"]
    return f"{(v or 0) & 0xFFFFFFFFFFFFFFFF:016x}"


def _passage_stage(
    survivors: DataFrame,
    counts: DataFrame | None,
    *,
    window: int,
    min_count: int,
    text_col: str,
    id_col: str,
    decon: DataFrame | None = None,
    dedup: bool = True,
) -> tuple[DataFrame, DataFrame, int, int]:
    """The opt-in passage-REWRITE stage shared by the ingest runners: mask
    every duplicated passage in the whole-doc-dedup SURVIVORS against the
    landed corpus's window-count store (``counts``, None = first batch),
    replacing ``text_col`` with the cleaned text while every other batch
    column passes through. Runs AFTER survivor selection — dropped
    documents never contribute window mass, exactly as if the corpus had
    only ever contained the kept docs. Returns ``(rewritten survivors,
    materialized wins frame, tokens_removed, docs_touched)``; callers
    derive the store's (h, c) count rows from the returned wins so the
    tokenize + window explode runs once per batch (the
    ``stream_passage_dedup`` single-compute discipline). Counts are taken
    from the survivors' ORIGINAL text — future duplicates arrive
    un-rewritten, so the store must index the observed form (the same
    reason the signature stores fingerprint pre-rewrite text).

    ``decon`` (an eval corpus's window-hash set, ``h`` column) adds
    benchmark DECONTAMINATION to the same rewrite: those windows mask
    UNCONDITIONALLY (single eval occurrence = contamination, the
    ``decontaminate_passages`` rule) while the count store keeps its
    >= min_count threshold — one combined mask, one window explode, one
    rebuild. ``dedup=False`` is the decon-only mode (no count store):
    the stage becomes ``decontaminate_passages`` over the shared
    materialized windows."""
    from ..operators.curation import (
        _passage_windows,
        decontaminate_passages,
        dedup_passages_incremental,
    )

    base, wins = _passage_windows(survivors, window, text_col, id_col)
    base = base.localCheckpoint(eager=True)
    wins = wins.localCheckpoint(eager=True)
    if dedup:
        cleaned = dedup_passages_incremental(
            survivors,
            counts,
            window,
            min_count,
            text_col,
            id_col,
            windows=(base, wins),
            extra_dup=decon,
        )
    else:
        cleaned = decontaminate_passages(
            survivors,
            store=decon,
            window=window,
            text_col=text_col,
            id_col=id_col,
            windows=(base, wins),
        )
    cleaned = cleaned.localCheckpoint(eager=True)
    stats = cleaned.agg(
        F.sum("n_removed").alias("__rm"),
        F.sum((F.col("n_removed") > 0).cast("long")).alias("__tch"),
    ).collect()[0]
    rewritten = (
        survivors.drop(text_col)
        .join(cleaned.select(id_col, F.col("clean_text").alias(text_col)), id_col)
        .select(*survivors.columns)
    )
    # a NULL-id survivor cannot participate in id-keyed masking (every
    # id-equi-join in the mask pipeline skips NULL keys) — without this
    # branch the inner rewrite join would silently DROP it, making the
    # rewrite tier the only tier that loses documents. It passes through
    # with its ORIGINAL text instead (round-9 review).
    null_ids = survivors.filter(F.col(id_col).isNull())
    rewritten = rewritten.unionByName(null_ids.select(*survivors.columns))
    return rewritten, wins, int(stats["__rm"] or 0), int(stats["__tch"] or 0)


def _quality_gate(
    batch: DataFrame,
    nb_store: str,
    threshold_micros: int,
    text_col: str,
    id_col: str,
    n_batch: int,
) -> tuple[DataFrame, int]:
    """The NB quality gate shared by all three ingest runners (round-9
    review: one implementation, not three copies): score the batch
    against the persisted count store's model and keep only documents at
    or above ``threshold_micros``. Zero-token docs drop (no score row);
    NULL-id docs pass ungated (they cannot ride the id-keyed score join —
    the rewrite tier's pass-through rule). Returns the gated batch,
    eagerly checkpointed (it feeds every heal, tier and sink downstream),
    plus the dropped count. Deterministic given a frozen model store, so
    reruns recompute identical survivors."""
    from ..functions.text import nb_model_from_counts, nb_score, read_nb_store

    model = nb_model_from_counts(read_nb_store(batch.sparkSession, nb_store))
    keep = (
        nb_score(batch, model, text_col, id_col)
        .filter(F.col("score_micros") >= F.lit(int(threshold_micros)))
        .select(id_col)
    )
    gated = (
        batch.filter(F.col(id_col).isNotNull())
        .join(keep, id_col, "left_semi")
        .unionByName(batch.filter(F.col(id_col).isNull()))
    ).localCheckpoint(eager=True)
    return gated, n_batch - gated.count()


def _entropy_gate(
    batch: DataFrame,
    min_microbits: int,
    text_col: str,
    n_batch: int,
) -> tuple[DataFrame, int]:
    """Char-entropy floor shared by the three runners (round-9): drop
    documents whose Shannon character entropy
    (``functions/text.char_entropy_microbits``, engine-exact integer
    micro-bits) is below the floor — repeated-character/boilerplate spam.
    The CHEAPEST gate runs first: map-only, no store read, no join, no
    shuffle — a single codegen projection — so spam never costs an NB
    scoring job or a dedup tier. NULL text has entropy 0 and drops under
    any positive floor. Deterministic, so reruns recompute identical
    survivors. Returns the gated batch, eagerly checkpointed (it feeds
    every heal, tier and sink downstream), plus the dropped count."""
    from ..functions.text import char_entropy_microbits

    gated = batch.filter(
        char_entropy_microbits(F.col(text_col)) >= F.lit(int(min_microbits))
    ).localCheckpoint(eager=True)
    return gated, n_batch - gated.count()


def _domain_gate(
    batch: DataFrame,
    url_col: str,
    blocklist,
    allowlist,
    url_dedup_aliases: bool,
    id_col: str,
    n_batch: int,
    strict: bool = False,
) -> tuple[DataFrame, int, int]:
    """Domain/URL gate shared by the three runners (round 11, verdict
    item 7): registered-domain blocklist/allowlist filtering
    (``operators.domains.domain_gate`` — a pure IN predicate for literal
    lists, broadcast anti/semi joins for DataFrame lists), then optional
    IN-BATCH canonical-URL alias collapse (``operators.domains.url_dedup``
    semantics: lowest id per canonical URL wins) so tracking-param /
    default-port / fragment aliases of the same page never reach the
    content tiers. Runs FIRST — for literal lists it is even cheaper than
    the entropy floor (the predicate pushes into the scan). Cross-batch
    same-URL re-crawls are NOT this gate's business: they belong to the
    canonical-URL keeper tier (round 12, ``url_keeper_store`` — alias
    drop for identical bytes, CDC update-in-place for changed bytes),
    which runs right after this gate when enabled. Unless ``strict``
    (round 12 — the allowlist semantics where unattributable rows must
    DROP), NULL and non-URL-shaped urls pass UNGATED
    and UNCOLLAPSED (the operators' shared pass-through rule — malformed
    strings have no domain to gate on and no URL identity to collapse;
    round-11 review). Both steps delegate to the ``operators.domains``
    functions, so the keeper/pass-through policy has one source of truth.
    Deterministic, so reruns recompute identical survivors. Returns the
    gated batch (eagerly checkpointed), the gate's dropped count, and the
    alias count."""
    from ..operators.domains import domain_gate, url_dedup

    n_dropped = 0
    out = batch
    if (isinstance(blocklist, DataFrame) or len(blocklist)) or allowlist is not None:
        out = domain_gate(
            out, url_col, blocklist=blocklist, allowlist=allowlist, strict=strict
        ).localCheckpoint(eager=True)
        n_dropped = n_batch - out.count()
    n_aliases = 0
    if url_dedup_aliases:
        out = url_dedup(out, url_col, id_col).drop("canonical_url").localCheckpoint(
            eager=True
        )
        n_aliases = n_batch - n_dropped - out.count()
    return out, n_dropped, n_aliases


_NB_THRESHOLD_ALGO = "nb-threshold-approx-pct-v1"


def freeze_nb_threshold(
    corpus: DataFrame,
    nb_store: str,
    top_frac: float,
    *,
    out_path: str | None = None,
    accuracy: int = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """Derive the FROZEN corpus-relative NB-gate threshold (round-9 verdict
    item 6): the FineWeb-style "keep the top ``top_frac`` by classifier
    score" cut cannot run per-batch — each batch's score distribution
    drifts, and a per-batch percentile would gate unstably. Instead, score
    the LANDED corpus (or any representative sample) under the persisted
    NB store's model and freeze the ``1 - top_frac`` approximate percentile
    of ``score_micros`` as an integer threshold; every subsequent batch
    applies it as a plain ``nb_threshold_micros`` constant (the runners'
    existing ``>= threshold`` gate), so per-batch gating is deterministic
    and the kept fraction tracks ``top_frac`` over the corpus the
    threshold was derived from (±1/``accuracy`` rank error + ties — the
    ``approx_percentile_prices`` contract; the gate is a quality heuristic,
    not an exact cut — ``operators/curation.top_fraction_*`` is the exact
    family). Re-derive periodically (e.g. alongside the NB store's
    retrain/compact cadence) — the audit table records the threshold each
    batch ACTUALLY used (``nb_threshold_micros`` column), so a refresh is
    visible in the trail.

    Scale shape: one scoring pass over the corpus (token explode +
    broadcast weight join + per-doc sum) into ONE sketch aggregate — no
    sort, no window. ``out_path`` persists a JSON sidecar
    (atomic tmp+rename; ``read_nb_threshold`` validates the algo tag) so
    the frozen value survives the deriving session."""
    if not 0.0 < top_frac <= 1.0:
        raise ValueError(f"top_frac must be in (0, 1]: got {top_frac}")
    from ..functions.text import nb_model_from_counts, nb_score, read_nb_store

    model = nb_model_from_counts(read_nb_store(corpus.sparkSession, nb_store))
    row = (
        nb_score(corpus, model, text_col, id_col)
        .agg(
            F.percentile_approx(
                "score_micros", F.lit(1.0 - float(top_frac)), F.lit(int(accuracy))
            ).alias("t"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    if not row["n"] or row["t"] is None:
        raise ValueError(
            "freeze_nb_threshold: corpus has no scoreable (non-empty-token) "
            "documents — a threshold derived from nothing would gate on noise"
        )
    thr = int(row["t"])
    if out_path is not None:
        import json
        import os

        payload = {
            "algo": _NB_THRESHOLD_ALGO,
            "threshold_micros": thr,
            "top_frac": float(top_frac),
            "accuracy": int(accuracy),
            "scored_rows": int(row["n"]),
        }
        tmp = f"{out_path}.tmp"
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(payload, f)
        os.replace(tmp, out_path)
    return thr


def read_nb_threshold(path: str) -> int:
    """Read back a ``freeze_nb_threshold`` sidecar — validates the algo tag
    so a drifted writer's file rejects instead of silently mis-gating."""
    import json

    with open(path, encoding="utf-8") as f:
        payload = json.load(f)
    if payload.get("algo") != _NB_THRESHOLD_ALGO:
        raise ValueError(
            f"threshold sidecar at {path} written by {payload.get('algo')!r}, "
            f"reader expects {_NB_THRESHOLD_ALGO!r} — re-derive it"
        )
    return int(payload["threshold_micros"])


_PASSAGE_INGEST_NS = "ingest"


def _ingest_passage_counts(spark, path: str, fp: str, window: int) -> DataFrame | None:
    """Validated, replay-healed merge-on-read view of the batch runner's
    passage count store. The store uses the streaming twins' partitioned
    layout with the batch FINGERPRINT as the partition value
    (``__batch_id=ingest-<fp>``): a rerun of a crashed batch overwrites
    exactly its own partition, and this read EXCLUDES that partition —
    which can only hold the crashed attempt's partial counts — so the
    rerun recomputes the identical mask (the ``stream_passage_dedup``
    replay-heal, content-addressed instead of checkpoint-numbered). A
    flat store seeded by ``write_passage_store`` converts one-time to the
    partitioned layout under ``__batch_id='seed'``."""
    import os

    from ..operators.curation import _PASSAGE_PARAMS_ALGO, ensure_passage_params_sidecar
    from ..operators.dedup import _write_params_sidecar
    from ..streaming.pipeline import _partitioned_store_or_convert

    ensure_passage_params_sidecar(path, window=window)
    store = _partitioned_store_or_convert(
        spark,
        path,
        _PASSAGE_INGEST_NS,
        os.path.join(path, "__no_checkpoint"),
        lambda staging: _write_params_sidecar(
            os.path.join(staging, "_passage_params.json"),
            {"window": window, "algo": _PASSAGE_PARAMS_ALGO},
        ),
    )
    if store is None:
        return None
    return (
        store.filter(F.col("__batch_id") != F.lit(f"{_PASSAGE_INGEST_NS}-{fp}"))
        .groupBy("h")
        .agg(F.sum("c").alias("c"))
    )


def _except_already_landed(rows: DataFrame, path: str, id_col: str) -> DataFrame:
    """Idempotent-append guard: drop rows whose id the sink already holds,
    so a rerun of a crashed batch re-appends ONLY what the crashed attempt
    missed. Ids across batches are contractually disjoint (the shared
    incremental-dedup precondition), so any overlap can only be this
    batch's own prior partial write. ``None``-returning first-batch states
    (absent path / sidecar-only store) append everything; genuine read
    failures on an existing sink propagate (``_read_store_or_none``
    discipline — a blind fallback here would double-append on an FS blip)."""
    from ..streaming.pipeline import _read_store_or_none

    existing = _read_store_or_none(rows.sparkSession, path)
    if existing is None:
        return rows
    return rows.join(existing.select(id_col).distinct(), id_col, "left_anti")


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
    passage_store: str | None = None,
    passage_window: int = 10,
    passage_min_count: int = 2,
    decon_store: str | None = None,
    nb_store: str | None = None,
    nb_threshold_micros: int = 0,
    min_entropy_microbits: int | None = None,
    url_col: str | None = None,
    domain_blocklist: "Sequence[str] | DataFrame" = (),
    domain_allowlist: "Sequence[str] | DataFrame | None" = None,
    collapse_url_aliases: bool = False,
    strict_domain_gate: bool = False,
    url_keeper_store: str | None = None,
    jaccard_store: str | None = None,
    jaccard_threshold: float = 0.6,
    jaccard_n: int = 3,
    jaccard_feature: str = "shingles",
) -> IngestReport:
    """Run one ingest batch through the enabled dedup tiers (exact is
    mandatory — it is the cheapest and catches byte-duplicates the banded
    tiers would also flag; MinHash/SimHash/prefix-Jaccard tiers activate
    when their store path is given). Batch ids must be disjoint from every store's ids (the
    shared incremental-dedup contract); every batch column survives into
    the landed output. Absent/empty stores take the first-batch path
    (full-batch dedup) — any OTHER store-read failure propagates rather
    than silently degrading to batch-only dedup (the
    ``_read_store_or_none`` discipline). Store sidecars validate and
    streaming layouts reject BEFORE any tier computes (round-6 review: a
    read-time parameter mismatch must not surface only after earlier
    sinks committed).

    ``passage_store`` additionally enables the document-REWRITING tier
    after survivor selection (round-9): surviving documents have every
    passage duplicated >= ``passage_min_count`` times across the landed
    corpus + batch masked out (``dedup_passages_incremental``) before
    landing, and the batch's window counts land in the store so later
    batches see the new mass. The count store uses the partitioned layout
    keyed by the batch's content fingerprint — its overwrite is idempotent
    per batch and reads heal a crashed attempt's partial partition, so the
    tier adds NO new non-idempotent seam beyond the documented
    ``survivors_path`` one. The signature stores keep indexing the
    survivors' PRE-rewrite text (future duplicates arrive un-rewritten).

    ``decon_store`` (a flat eval-corpus ``passage_count_store`` built once
    with ``write_passage_store``) additionally masks every window that
    appears ANYWHERE in the eval set — benchmark decontamination
    (``decontaminate_passages`` semantics, single occurrence masks) folded
    into the SAME rewrite pass: one window explode, one rebuild, whether
    or not the dedup tier (``passage_store``) is also enabled. The eval
    store is a read-only INPUT (never appended), must share
    ``passage_window`` (sidecar-validated — the masks ride one explode),
    and the audit's ``passage_tokens_removed`` / ``passage_docs_touched``
    cover the COMBINED mask.

    ``nb_store`` (a persisted binary-NB count store — ``write_nb_store``
    or the ``stream_nb_counts`` twin, maintained on labeled data OUTSIDE
    this pipeline) enables the QUALITY GATE: every batch document scoring
    below ``nb_threshold_micros`` under the store's model is dropped
    BEFORE any dedup tier — dropped docs never land, never index, never
    contribute passage mass (the CCNet/FineWeb classifier-gate position:
    filter first, dedup the keepers). Zero-token documents drop (they
    have no scoreable content); NULL-id documents pass the gate ungated
    (they cannot ride the id-keyed score join — same pass-through rule as
    the rewrite tier). The gate is read-only and deterministic given the
    store, so reruns recompute identical survivors — retraining the model
    between a crash and its rerun is the one way to break that, the same
    freeze-during-recovery caveat as every cross-batch contract here. The
    audit row carries ``n_quality_dropped``.

    ``min_entropy_microbits`` enables the char-entropy pre-gate
    (``_entropy_gate``): the map-only floor runs BEFORE the NB gate and
    every tier, so repeated-character spam never costs a scoring job or a
    shingle pass; the audit row carries ``n_entropy_dropped``.

    ``url_col`` (round 11) enables the DOMAIN TIER (``_domain_gate``),
    running before even the entropy floor: ``domain_blocklist`` /
    ``domain_allowlist`` gate on the registered domain (literal lists
    compile to a scan-pushed IN predicate; DataFrame lists run as
    broadcast anti/semi joins), and ``collapse_url_aliases=True``
    additionally collapses IN-BATCH canonical-URL aliases (tracking
    params / default ports / fragments stripped — lowest id wins) so the
    same page crawled under different URLs reaches the content tiers
    once. NULL urls pass ungated; the audit row carries
    ``n_domain_dropped`` / ``n_url_alias_dropped``. Cross-batch same-URL
    re-crawls are deliberately left to the content stores (see
    ``_domain_gate``).

    ``jaccard_store`` (round 14 — the last store family reachable from
    the composed runners) enables the EXACT prefix-Jaccard tier after
    SimHash: ``jaccard_join_incremental`` semantics against the
    persisted ``{census,postings,gramsets}`` store, run AT the store's
    build threshold (``jaccard_threshold`` seeds the sidecar on first
    contact and must match it afterwards — a different threshold wants a
    different store, because the persisted prefixes are complete only at
    the build threshold and above, and running looser would silently
    under-pair). A first batch freezes the census from its OWN gated
    grams (atomic swap — the census is a pruner, never a correctness
    input). Survivor gramsets land before postings (an id with postings
    is fully indexed; the gramsets-only seam heals on rerun, the same
    split-append discipline as the minhash split layout), and each
    batch's candidate mass records into the drift sidecar so
    ``jaccard_store_drift`` / ``maybe_compact_jaccard_store`` watch the
    frozen census exactly as with stand-alone stores. The audit row
    carries ``n_after_jaccard`` / ``jaccard_pairs``."""
    from ..operators import dedup as DD
    from ..operators.curation import read_passage_store
    from ..sources.writers import append_parquet
    from ..streaming.pipeline import _drop_replayed_batch_rows, _read_store_or_none

    spark = batch.sparkSession
    n_batch = batch.count()
    mh_on = minhash_store is not None
    sh_on = simhash_store is not None
    pg_on = passage_store is not None
    dc_on = decon_store is not None
    rw_on = pg_on or dc_on  # the rewrite stage runs for either mask source
    q_on = nb_store is not None
    e_on = min_entropy_microbits is not None
    d_on = url_col is not None
    uk_on = url_keeper_store is not None
    jc_on = jaccard_store is not None
    if uk_on and (not d_on or survivors_path is None):
        raise ValueError(
            "url_keeper_store requires url_col (the URL identity to key on) "
            "and survivors_path (the landed corpus the CDC updates rewrite)"
        )
    if n_batch == 0:
        report = IngestReport(
            0,
            0,
            0 if mh_on else None,
            0 if sh_on else None,
            0,
            0 if mh_on else None,
            0 if sh_on else None,
            n_after_jaccard=0 if jc_on else None,
            jaccard_pairs=0 if jc_on else None,
            passage_tokens_removed=0 if rw_on else None,
            passage_docs_touched=0 if rw_on else None,
            n_quality_dropped=0 if q_on else None,
            n_entropy_dropped=0 if e_on else None,
            nb_threshold_micros=int(nb_threshold_micros) if q_on else None,
            n_domain_dropped=0 if d_on else None,
            n_url_alias_dropped=0 if d_on and collapse_url_aliases else None,
            n_url_updates=0 if uk_on else None,
        )
        if audit_path is not None:
            write_ingest_audit(spark, audit_path, report)
        return report

    # read + validate every enabled sink UP FRONT (incl. the audit table's
    # layout/schema): mismatches and streaming (__batch_id) layouts fail
    # here, before any compute or sink; rows from a crashed prior attempt
    # of THIS batch are healed away so a rerun recomputes identical
    # survivors
    if audit_path is not None:
        validate_batch_audit_layout(spark, audit_path)

    def _load(path, ensure, cols):
        ensure()
        store = _read_store_or_none(spark, path)
        if store is None:
            return None
        if "__batch_id" in store.columns:
            raise ValueError(
                f"store at {path} has the streaming (__batch_id) layout; "
                "batch ingest appends would corrupt it — run the stream "
                "twin, or rebuild the store flat with mode='overwrite'"
            )
        return _drop_replayed_batch_rows(store, batch, id_col).select(*cols)

    # layout-agnostic exact handling (round-9, mirroring the minhash
    # discovery below): a store written with write_exact_store(
    # bucket_by_fp=True) carries its bucket spec in the sidecar — validate
    # with the spec included, read through the catalog entry so the
    # incremental anti-join keeps its exchange-free store side, and append
    # back in the SAME layout below
    # heal a hard-crashed atomic overwrite BEFORE reading any bucket spec
    # (round-9 review: the sidecar sits in the .backup sibling during the
    # crash window, so a pre-recovery spec read would mis-detect the store
    # as flat and fail the rerun with a spurious parameter mismatch)
    from ..sources.writers import recover_interrupted_swap

    recover_interrupted_swap(exact_store)
    ex_bucket = DD.exact_store_bucket_spec(exact_store)
    ex_store = _load(
        exact_store,
        lambda: DD.ensure_exact_params_sidecar(
            exact_store,
            bucket_by_fp=ex_bucket is not None,
            num_buckets=ex_bucket[1] if ex_bucket else 32,
        ),
        [id_col, "fp"],
    )
    if ex_store is not None and ex_bucket is not None:
        ex_store = _drop_replayed_batch_rows(
            DD.read_exact_store(spark, exact_store), batch, id_col
        ).select(id_col, "fp")
    # layout-agnostic minhash handling (round-9 review): a store written
    # with write_minhash_store(bucket_by_band=True) carries its bucket
    # spec in the sidecar — discover it, validate with the spec included,
    # read through the catalog entry so the incremental join keeps its
    # exchange-free store side, and append back in the SAME layout below
    if mh_on:
        recover_interrupted_swap(minhash_store)
    mh_bucket = DD.minhash_store_bucket_spec(minhash_store) if mh_on else None
    # a store migrated with compact_minhash_store(to_layout="split")
    # (round 12) reads/joins/appends through its two sub-tables — the
    # candidate join consumes slim (id, sig) rows, the verify step joins
    # the one-row-per-doc hashsets; a first batch against an ABSENT store
    # still seeds the flat layout (migrate explicitly when wanted)
    mh_layout = DD.minhash_store_layout(minhash_store) if mh_on else "flat"
    mh_store_sets = None
    if mh_on and mh_layout == "split":
        mh_slim, mh_sets = DD.read_minhash_store_split(
            spark, minhash_store, shingle_n=shingle_n, num_hashes=num_hashes, bands=bands
        )
        mh_store = _drop_replayed_batch_rows(mh_slim, batch, id_col).select(
            id_col, "sig"
        )
        mh_store_sets = _drop_replayed_batch_rows(mh_sets, batch, id_col).select(
            id_col, "hs"
        )
    else:
        mh_store = (
            _load(
                minhash_store,
                lambda: DD.ensure_minhash_params_sidecar(
                    minhash_store,
                    shingle_n=shingle_n,
                    num_hashes=num_hashes,
                    bands=bands,
                    bucket_by_band=mh_bucket is not None,
                    num_buckets=mh_bucket[1] if mh_bucket else 32,
                ),
                [id_col, "hs", "sig"],
            )
            if mh_on
            else None
        )
        if mh_store is not None and mh_bucket is not None:
            bucketed = DD.read_minhash_store(
                spark, minhash_store, shingle_n=shingle_n, num_hashes=num_hashes, bands=bands
            )
            mh_store = _drop_replayed_batch_rows(bucketed, batch, id_col).select(
                id_col, "hs", "sig"
            )
    sh_store = (
        _load(
            simhash_store,
            lambda: DD.ensure_simhash_params_sidecar(simhash_store),
            [id_col, "simhash64"],
        )
        if sh_on
        else None
    )
    # prefix-Jaccard store (round 14): sidecar written-or-validated, then
    # the three sub-tables read with the same discipline as the keyed
    # stores — streaming (__batch_id) layouts reject, rows carrying batch
    # ids heal away (a crashed prior attempt's append), gramsets dedupe
    # per id. The census is FROZEN: absent store → None here, and the
    # first batch's own grams freeze it at sink time.
    jc_census = jc_postings_store = jc_sets_store = None
    jc_num = jc_den = None
    if jc_on:
        import os as _os

        recover_interrupted_swap(jaccard_store)
        recover_interrupted_swap(_os.path.join(jaccard_store, "census"))
        DD.ensure_jaccard_params_sidecar(
            jaccard_store,
            n=jaccard_n,
            feature=jaccard_feature,
            threshold=jaccard_threshold,
        )
        jc_params = DD._read_jaccard_params(jaccard_store)
        jc_num = int(jc_params["threshold_num"])
        jc_den = int(jc_params["threshold_den"])
        jc_census = _read_store_or_none(
            spark, _os.path.join(jaccard_store, "census")
        )
        jc_postings_store = _read_store_or_none(
            spark, _os.path.join(jaccard_store, "postings")
        )
        jc_sets_store = _read_store_or_none(
            spark, _os.path.join(jaccard_store, "gramsets")
        )
        for sub in (jc_postings_store, jc_sets_store):
            if sub is not None and "__batch_id" in sub.columns:
                raise ValueError(
                    f"jaccard store at {jaccard_store} has the streaming "
                    "(__batch_id) layout; batch ingest appends would corrupt "
                    "it — run stream_ingest, or rebuild the store flat"
                )
        if jc_postings_store is not None:
            jc_postings_store = _drop_replayed_batch_rows(
                jc_postings_store, batch, id_col
            ).select(id_col, "g", "sz", "rn")
        if jc_sets_store is not None:
            jc_sets_store = (
                _drop_replayed_batch_rows(jc_sets_store, batch, id_col)
                .dropDuplicates([id_col])
                .select(id_col, "gs", "n_grams")
            )
    # passage sidecar validation BEFORE the gate computes (the healed
    # count view itself needs the GATED batch's fingerprint, built below)
    if pg_on:
        from ..operators.curation import ensure_passage_params_sidecar

        ensure_passage_params_sidecar(passage_store, window=passage_window)
    # eval decon store: read-only, sidecar-validated against passage_window
    # (read_passage_store's group-by-h doubles as the distinct window set)
    decon_h = (
        read_passage_store(spark, decon_store, window=passage_window).select("h")
        if dc_on
        else None
    )

    # quality gate AFTER every sink validation (round-9 review: a doomed
    # misconfigured run must fail before the gate's scoring job spends
    # compute — matching the txn runner's ordering). Everything downstream
    # — the passage fingerprint, every tier, every sink — sees only the
    # gated batch; the store heals above joined against the RAW batch,
    # a superset of any prior attempt's gated appends, which heals the
    # same rows.
    # domain tier first (round 11) — for literal lists the gate is a
    # scan-pushed predicate, cheaper than even the entropy projection
    n_domain_dropped = 0 if d_on else None
    n_url_alias_dropped = 0 if d_on and collapse_url_aliases else None
    if d_on:
        batch, n_domain_dropped, n_url_alias_dropped = _domain_gate(
            batch, url_col, domain_blocklist, domain_allowlist,
            collapse_url_aliases, id_col, n_batch,
            strict=strict_domain_gate,
        )
        if not collapse_url_aliases:
            n_url_alias_dropped = None
    # canonical-URL keeper gate (round 12): classify the batch against the
    # persisted cross-batch URL identity BEFORE the content tiers — a
    # same-content re-crawl drops as an alias, a changed-content re-crawl
    # routes to a CDC update of the keeper document (applied after the
    # batch lands; keeper rows append LAST, the commit point)
    n_url_updates = 0 if uk_on else None
    uk_updates = uk_append = None
    if uk_on:
        from ..operators.domains import read_or_seed_url_keeper, url_keeper_gate

        uk_existing, uk_seq = read_or_seed_url_keeper(spark, url_keeper_store)
        batch, uk_updates, uk_append, n_uk_dropped = url_keeper_gate(
            batch, uk_existing, url_col, id_col, text_col, batch_seq=uk_seq
        )
        batch = batch.localCheckpoint(eager=True)
        uk_updates = uk_updates.localCheckpoint(eager=True)
        uk_append = uk_append.localCheckpoint(eager=True)
        n_url_updates = uk_updates.count()
        if d_on:
            n_url_alias_dropped = (n_url_alias_dropped or 0) + n_uk_dropped
        else:
            n_url_alias_dropped = n_uk_dropped
    n_remaining = (
        n_batch
        - (n_domain_dropped or 0)
        - (n_url_alias_dropped or 0)
        - (n_url_updates or 0)
    )
    # entropy floor next — the cheapest compute gate (one codegen
    # projection) runs before the NB scoring job sees the batch
    n_entropy_dropped = 0 if e_on else None
    if e_on:
        batch, n_entropy_dropped = _entropy_gate(
            batch, min_entropy_microbits, text_col, n_remaining
        )
    n_quality_dropped = 0 if q_on else None
    if q_on:
        batch, n_quality_dropped = _quality_gate(
            batch, nb_store, nb_threshold_micros, text_col, id_col,
            n_remaining - (n_entropy_dropped or 0),
        )
    # keeper CDC updates must clear the SAME quality gates as new docs
    # (round-12 review: a junk re-crawl — boilerplate, error pages — must
    # not overwrite good landed content). A gate-dropped update does NOT
    # advance the keeper fp, so future re-crawls honestly re-classify as
    # changed until acceptable content arrives; its drop counts into the
    # gate's own audit column.
    if uk_on and n_url_updates:
        kept = uk_updates
        if e_on:
            kept, d_e = _entropy_gate(
                kept, min_entropy_microbits, text_col, n_url_updates
            )
            n_entropy_dropped = (n_entropy_dropped or 0) + d_e
        if q_on:
            kept, d_q = _quality_gate(
                kept, nb_store, nb_threshold_micros, text_col, id_col,
                kept.count() if e_on else n_url_updates,
            )
            n_quality_dropped = (n_quality_dropped or 0) + d_q
        if e_on or q_on:
            kept = kept.localCheckpoint(eager=True)
            n_kept = kept.count()
            if n_kept != n_url_updates:
                # keeper ids of updates are landed-corpus ids, disjoint
                # from the batch ids on the new-doc append rows — the
                # anti-join removes only the dropped updates' fp advances
                dropped_upd = uk_updates.join(
                    kept.select("keeper_id"), "keeper_id", "left_anti"
                ).select("keeper_id").distinct()
                uk_append = uk_append.join(
                    dropped_upd, "keeper_id", "left_anti"
                ).localCheckpoint(eager=True)
                uk_updates = kept
                n_url_updates = n_kept

    # passage store: convert layout + build the healed merge-on-read count
    # view keyed by the gated batch's content fingerprint
    pg_fp = _batch_fingerprint(batch, id_col) if pg_on else None
    pg_counts = (
        _ingest_passage_counts(spark, passage_store, pg_fp, passage_window)
        if pg_on
        else None
    )

    # first jaccard batch: freeze the census from the GATED batch's own
    # grams (a superset of the tier-4 input — the census is a pruner, so
    # any df ordering is exact; the swap at sink time makes it durable)
    jc_census_new = False
    if jc_on and jc_census is None:
        jc_census_new = True
        jc_census = (
            DD._jaccard_gram_rows(batch, text_col, id_col, jaccard_n, jaccard_feature)
            .groupBy("g")
            .agg(F.count(F.lit(1)).cast("long").alias("df"))
            .localCheckpoint(eager=True)
        )

    survivors, report, jc_art = _run_tiers(
        batch,
        ex_store,
        mh_store,
        sh_store,
        mh_store_sets=mh_store_sets,
        mh_on=mh_on,
        sh_on=sh_on,
        text_col=text_col,
        id_col=id_col,
        minhash_threshold=minhash_threshold,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
        bands=bands,
        simhash_max_hamming=simhash_max_hamming,
        max_bucket_size=max_bucket_size,
        n_batch=n_batch,
        jc_on=jc_on,
        jc_census=jc_census,
        jc_store_postings=jc_postings_store,
        jc_store_sets=jc_sets_store,
        jc_n=jaccard_n,
        jc_feature=jaccard_feature,
        jc_num=jc_num if jc_on else 3,
        jc_den=jc_den if jc_on else 5,
    )
    if q_on or e_on or d_on or uk_on:
        from dataclasses import replace as _replace

        report = _replace(
            report,
            n_quality_dropped=n_quality_dropped,
            n_entropy_dropped=n_entropy_dropped,
            nb_threshold_micros=int(nb_threshold_micros) if q_on else None,
            n_domain_dropped=n_domain_dropped,
            n_url_alias_dropped=n_url_alias_dropped,
            n_url_updates=n_url_updates,
        )

    # sinks: survivors first, then each store's rows FOR THE SURVIVORS —
    # future batches dedup against the kept corpus (a dropped exact dup
    # shares its keeper's fingerprint anyway; a dropped near-dup's
    # signature is intentionally not retained).
    #
    # Every sink append is IDEMPOTENT PER BATCH (round-6 verdict item 6):
    # the rows are anti-joined against the sink's existing ids before the
    # append, so the documented recovery for a crash anywhere in this
    # block is simply "rerun the same batch" — the store READS above
    # already heal (_drop_replayed_batch_rows recomputes identical
    # survivors), and the healed appends then land exactly the rows the
    # crashed attempt missed, converging every sink to exactly-once state
    # (crash-injection pytest in tests/test_ingest.py). The heal costs one
    # column-pruned id scan per sink; the store sinks were scanned this
    # run anyway, the landed corpus pays one extra id-column read. Sink
    # ORDER still matters for a crash that is never rerun: survivors land
    # first, so an unrepaired crash leaves the stores BEHIND the corpus —
    # future batches may land a near-dup of an unindexed doc (duplicates,
    # later dedup-able) rather than ghost store entries dropping documents
    # that never landed (silent data loss). The audit sink is a log, not
    # keyed state: a rerun after a crash between the last store and the
    # audit write appends a second row for the batch (both attempts are
    # real events; consumers aggregate by batch fingerprint).
    land_df = survivors
    pg_wins = None
    if rw_on:
        from dataclasses import replace

        land_df, pg_wins, pg_removed, pg_touched = _passage_stage(
            survivors,
            pg_counts,
            window=passage_window,
            min_count=passage_min_count,
            text_col=text_col,
            id_col=id_col,
            decon=decon_h,
            dedup=pg_on,
        )
        report = replace(
            report,
            passage_tokens_removed=pg_removed,
            passage_docs_touched=pg_touched,
        )
    if survivors_path is not None:
        append_parquet(
            _except_already_landed(land_df, survivors_path, id_col), survivors_path
        )
    DD.write_exact_store(
        _except_already_landed(
            DD.exact_fingerprint_store(survivors, text_col, id_col), exact_store, id_col
        ),
        exact_store,
        bucket_by_fp=ex_bucket is not None,
        num_buckets=ex_bucket[1] if ex_bucket else 32,
    )
    if minhash_store is not None:
        mh_rows = DD.minhash_signature_store(
            survivors, text_col, id_col, shingle_n, num_hashes, bands
        )
        if mh_layout == "split":
            # heal key = the SIGS table (split appends land hashsets first,
            # sigs last): an id already in sigs is fully landed and skips;
            # an id with only hashset rows is the crashed seam — the rerun
            # re-appends it whole (the dup hashset copies are read-deduped
            # and compaction prunes them)
            slim_all, _ = DD.read_minhash_store_split(
                spark, minhash_store,
                shingle_n=shingle_n, num_hashes=num_hashes, bands=bands,
            )
            mh_rows = mh_rows.join(
                slim_all.select(id_col).distinct(), id_col, "left_anti"
            )
        else:
            mh_rows = _except_already_landed(mh_rows, minhash_store, id_col)
        DD.write_minhash_store(
            mh_rows,
            minhash_store,
            shingle_n=shingle_n,
            num_hashes=num_hashes,
            bands=bands,
            bucket_by_band=mh_bucket is not None,
            num_buckets=mh_bucket[1] if mh_bucket else 32,
            layout=mh_layout,
        )
    if simhash_store is not None:
        DD.write_simhash_store(
            _except_already_landed(
                DD.simhash_store_rows(survivors, text_col, id_col), simhash_store, id_col
            ),
            simhash_store,
        )
    if jc_on:
        import os as _os

        from ..sources.writers import atomic_swap_write as _swap

        if jc_census_new:
            # durable AFTER the tier used the in-memory frame — a crash
            # here leaves no store contact; a crash after leaves census
            # only, which the next run reads as the frozen pruner
            _swap(jc_census, _os.path.join(jaccard_store, "census"))
        jc_postings_new, jc_sets_new = jc_art
        surv_ids = survivors.select(id_col).distinct()
        sets_rows = jc_sets_new.join(surv_ids, id_col, "left_semi")
        post_rows = jc_postings_new.join(surv_ids, id_col, "left_semi")
        # both appends guard on the POSTINGS ids (the last-appended
        # sub-table, mirroring the minhash split layout's sigs-last heal):
        # an id with postings is fully indexed and skips; a gramsets-only
        # id is the crashed seam — the rerun re-appends it whole, and the
        # read-side per-id dedupe + compaction absorb the duplicate copy
        posts_path = _os.path.join(jaccard_store, "postings")
        landed_posts = _read_store_or_none(spark, posts_path)
        if landed_posts is not None:
            pids = landed_posts.select(id_col).distinct()
            sets_rows = sets_rows.join(pids, id_col, "left_anti")
            post_rows = post_rows.join(pids, id_col, "left_anti")
        sets_rows.write.mode("append").parquet(
            _os.path.join(jaccard_store, "gramsets")
        )
        post_rows.write.mode("append").parquet(posts_path)
        # drift telemetry over the frames the candidate join actually
        # consumed (full tier input, healed store side) — the same
        # recording the stand-alone incremental join and stream twin do
        DD._record_jaccard_batch_mass(
            jaccard_store,
            jc_postings_new,
            jc_postings_store
            if jc_postings_store is not None
            else jc_postings_new.limit(0),
            jc_sets_new,
            True,
        )
    if pg_on:
        # idempotent by construction: the dynamic overwrite replaces only
        # this batch's own fingerprint partition, so a rerun rewrites the
        # identical count rows instead of double-appending (the store is
        # hash-keyed — the id anti-join the other sinks use can't apply)
        (
            pg_wins.groupBy("h")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn("__batch_id", F.lit(f"{_PASSAGE_INGEST_NS}-{pg_fp}"))
            .write.option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .partitionBy("__batch_id")
            .parquet(passage_store)
        )

    if uk_on:
        # canonical-URL keeper tier commit (round 12, ordered LAST): apply
        # the CDC updates to the landed corpus in place, then append the
        # keeper rows — restricted to canonicals whose keeper actually
        # LANDED (a batch doc dropped by a content tier keeps its URL
        # un-tracked; a future re-crawl re-runs content dedup, which is
        # correct, just less pruned). Keeper rows are the commit point: a
        # crash before this append makes the rerun re-classify and re-do
        # exactly the un-committed work (the sigs-last seam discipline).
        from ..operators.domains import apply_url_updates, write_url_keeper_store
        from ..sources.writers import atomic_swap_write

        if n_url_updates:
            corpus = spark.read.parquet(survivors_path)
            atomic_swap_write(
                apply_url_updates(corpus, uk_updates, id_col, (text_col,)),
                survivors_path,
            )
            # refresh the exact store with the updated keepers' NEW
            # content fingerprints, so future copies of the new text drop
            # as exact dups (round-12 review). Old-fp rows stay: a stale
            # re-crawl of the superseded text also drops — the
            # conservative direction. Near-dup signatures are NOT
            # refreshed by design: stale minhash/simhash/jaccard rows can only
            # cause extra conservative drops of near-dups of superseded
            # text, never corruption (rerun-duplicate fp rows are
            # likewise harmless — the exact tier tests fp EXISTENCE).
            DD.write_exact_store(
                DD.exact_fingerprint_store(
                    uk_updates.select(
                        F.col("keeper_id").alias(id_col), F.col(text_col)
                    ),
                    text_col,
                    id_col,
                ),
                exact_store,
                bucket_by_fp=ex_bucket is not None,
                num_buckets=ex_bucket[1] if ex_bucket else 32,
            )
        landed_ids = (
            spark.read.parquet(survivors_path)
            .select(F.col(id_col).alias("keeper_id"))
            .distinct()
        )
        write_url_keeper_store(
            uk_append.join(landed_ids, "keeper_id", "left_semi"), url_keeper_store
        )

    if audit_path is not None:
        write_ingest_audit(spark, audit_path, report)
    return report


def _run_tiers(
    batch: DataFrame,
    ex_store: DataFrame | None,
    mh_store: DataFrame | None,
    sh_store: DataFrame | None,
    *,
    mh_store_sets: DataFrame | None = None,
    mh_on: bool,
    sh_on: bool,
    text_col: str,
    id_col: str,
    minhash_threshold: float,
    shingle_n: int,
    num_hashes: int,
    bands: int,
    simhash_max_hamming: int,
    max_bucket_size: int | None,
    n_batch: int,
    jc_on: bool = False,
    jc_census: DataFrame | None = None,
    jc_store_postings: DataFrame | None = None,
    jc_store_sets: DataFrame | None = None,
    jc_n: int = 3,
    jc_feature: str = "shingles",
    jc_num: int = 3,
    jc_den: int = 5,
) -> tuple[DataFrame, IngestReport, tuple[DataFrame, DataFrame] | None]:
    """The shared tier body (batch runner + streaming twin): exact →
    MinHash → SimHash → exact prefix-Jaccard over an already-validated,
    already-healed view of each store (``None`` = first batch for that
    tier). Returns the surviving rows (all input columns), the per-tier
    report, and — when the Jaccard tier ran — its ``(new_postings,
    new_sets)`` rows for the WHOLE tier input (computed under the frozen
    ``jc_census``, eagerly materialized), so the caller's sink stage can
    land the final survivors' rows without re-shingling. The Jaccard tier
    runs LAST: it is the exact (verification-complete) and most expensive
    tier, so it sees the fewest documents."""
    from ..operators import dedup as DD

    # tier 1: exact fingerprints (store absent → plain in-batch exact dedup)
    if ex_store is None:
        survivors = DD.exact_dedup(batch, text_col, id_col)
    else:
        survivors = DD.exact_dedup_incremental(batch, ex_store, text_col, id_col)
    survivors = survivors.localCheckpoint(eager=True)
    n_after_exact = survivors.count()

    # tier 2: MinHash near-dup
    n_after_minhash = mh_pairs_n = mh_capped = None
    if mh_on:
        mh_kw = dict(
            text_col=text_col,
            id_col=id_col,
            threshold=minhash_threshold,
            shingle_n=shingle_n,
            num_hashes=num_hashes,
            bands=bands,
            max_bucket_size=max_bucket_size,
        )
        # a capped run needs the batch's signature rows twice (the dedup
        # join AND the cap-audit census) — compute them ONCE, materialized,
        # instead of re-running the shingling stage per consumer (round-7
        # review)
        new_rows = (
            DD.minhash_signature_store(
                survivors, text_col, id_col, shingle_n, num_hashes, bands
            ).localCheckpoint(eager=True)
            if max_bucket_size is not None
            else None
        )
        if mh_store is None:
            pairs = DD.minhash_dedup(survivors, **mh_kw, banded=new_rows)
        else:
            pairs = DD.minhash_dedup_incremental(
                survivors,
                mh_store,
                **mh_kw,
                new_banded=new_rows,
                store_sets=mh_store_sets,
            )
        if max_bucket_size is not None:
            # cap-audit twin (never a silent cap): degenerate band buckets
            # over the COMBINED batch+store corpus, same census as the cap
            sigs = new_rows.select("sig")
            if mh_store is not None:
                sigs = sigs.unionByName(mh_store.select("sig"))
            mh_capped = (
                sigs.groupBy("sig")
                .agg(F.count(F.lit(1)).alias("__bn"))
                .filter(F.col("__bn") > max_bucket_size)
                .count()
            )
        pairs = pairs.localCheckpoint(eager=True)
        mh_pairs_n = pairs.count()
        if mh_pairs_n:
            survivors = survivors.join(
                _near_losers(pairs, survivors, id_col), id_col, "left_anti"
            ).localCheckpoint(eager=True)
        n_after_minhash = survivors.count()

    # tier 3: SimHash near-dup
    n_after_simhash = sh_pairs_n = sh_capped = None
    if sh_on:
        # same single-compute discipline as the minhash tier: capped runs
        # share one materialized signature frame between the dedup join and
        # the cap audit
        new_sigs = (
            DD.simhash_store_rows(survivors, text_col, id_col).localCheckpoint(eager=True)
            if max_bucket_size is not None
            else None
        )
        if sh_store is None:
            pairs = DD.simhash_near_dups(
                survivors, text_col, id_col, simhash_max_hamming, max_bucket_size,
                sigs=new_sigs,
            )
        else:
            pairs = DD.simhash_near_dups_incremental(
                survivors,
                sh_store,
                text_col,
                id_col,
                simhash_max_hamming,
                max_bucket_size,
                new_sigs=new_sigs,
            )
        if max_bucket_size is not None:
            sigs = new_sigs
            if sh_store is not None:
                sigs = sigs.unionByName(sh_store)
            # the canonical census helper, not an inline re-implementation
            # that could drift from the cap actually applied (round-7
            # review)
            sh_capped = DD.oversized_buckets(
                sigs, "simhash64", 64, simhash_max_hamming, max_bucket_size
            ).count()
        pairs = pairs.localCheckpoint(eager=True)
        sh_pairs_n = pairs.count()
        if sh_pairs_n:
            survivors = survivors.join(
                _near_losers(pairs, survivors, id_col), id_col, "left_anti"
            ).localCheckpoint(eager=True)
        n_after_simhash = survivors.count()

    # tier 4: exact prefix-Jaccard (round 14 — the last store family
    # reachable from the composed runners). The batch's grams order under
    # the caller-provided FROZEN census (first batch: the caller froze it
    # from this batch's own grams — a pruner, never a correctness input),
    # prefixes join the persisted postings plus the batch self-join, and
    # candidates verify against the persisted gramsets — exact J >= t,
    # same drop policy as the banded tiers.
    n_after_jaccard = jc_pairs_n = None
    jc_art = None
    if jc_on:
        g_new = DD._jaccard_gram_rows(
            survivors, text_col, id_col, jc_n, jc_feature
        ).localCheckpoint(eager=True)
        pairs, jc_postings, jc_sets = DD._jaccard_pairs_core(
            g_new,
            jc_census,
            jc_store_postings,
            jc_store_sets,
            id_col=id_col,
            num=jc_num,
            den=jc_den,
            bnum=jc_num,
            bden=jc_den,
            include_batch_pairs=True,
            materialize=True,
        )
        pairs = pairs.localCheckpoint(eager=True)
        jc_pairs_n = pairs.count()
        if jc_pairs_n:
            survivors = survivors.join(
                _near_losers(pairs, survivors, id_col), id_col, "left_anti"
            ).localCheckpoint(eager=True)
        n_after_jaccard = survivors.count()
        jc_art = (jc_postings, jc_sets)

    report = IngestReport(
        n_batch,
        n_after_exact,
        n_after_minhash,
        n_after_simhash,
        survivors.count(),
        mh_pairs_n,
        sh_pairs_n,
        mh_capped,
        sh_capped,
        n_after_jaccard=n_after_jaccard,
        jaccard_pairs=jc_pairs_n,
    )
    return survivors, report, jc_art


def ingest_audit_row(spark, report: IngestReport) -> DataFrame:
    """One audit row for an ingest batch — the same never-silent lifecycle
    record as ``plans/incremental.write_audit`` (C5, the reference's
    ``proc_elc_audit_insert``, I:331-341), carrying the per-tier counts so
    dedup aggressiveness is reviewable over time. Shared by the batch
    append (``write_ingest_audit``) and the streaming twin's idempotent
    batch-partitioned sink."""
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
            report.minhash_capped_buckets,
            report.simhash_capped_buckets,
            report.passage_tokens_removed,
            report.passage_docs_touched,
            report.n_quality_dropped,
            report.n_entropy_dropped,
            report.nb_threshold_micros,
            report.n_domain_dropped,
            report.n_url_alias_dropped,
            report.n_url_updates,
            report.n_after_jaccard,
            report.jaccard_pairs,
            dt.datetime.now(dt.timezone.utc).replace(tzinfo=None),
        )
    ]
    return spark.createDataFrame(row, _AUDIT_COLS_DDL)


_AUDIT_COLS_DDL = (
    "n_batch long, n_after_exact long, n_after_minhash long, "
    "n_after_simhash long, n_landed long, minhash_pairs long, "
    "simhash_pairs long, minhash_capped_buckets long, "
    "simhash_capped_buckets long, passage_tokens_removed long, "
    "passage_docs_touched long, n_quality_dropped long, "
    "n_entropy_dropped long, nb_threshold_micros long, "
    "n_domain_dropped long, n_url_alias_dropped long, n_url_updates long, "
    "n_after_jaccard long, jaccard_pairs long, ingest_ts timestamp"
)
_AUDIT_COL_NAMES = {c.strip().split()[0] for c in _AUDIT_COLS_DDL.split(",")}


def validate_batch_audit_layout(spark, audit_path: str) -> None:
    """Layout/schema guards for the batch audit table (round-6 review),
    callable UP FRONT — ``run_incremental_ingest`` validates before any
    sink commits (round-7 review: failing only inside the end-of-run
    ``write_ingest_audit`` meant the mismatch surfaced after the corpus
    and store appends had already landed). A streaming-layout audit dir
    (``__batch_id`` partitions from ``stream_ingest``) rejects a flat
    append — the mixed layout would break partition discovery — and a
    column-set drift between the existing table and the current row
    schema raises instead of leaving mixed-schema parquet whose capped
    columns appear or vanish per read."""
    from ..streaming.pipeline import _read_store_or_none

    existing = _read_store_or_none(spark, audit_path)
    if existing is None:
        return
    if "__batch_id" in existing.columns:
        raise ValueError(
            f"audit table at {audit_path} has the streaming (__batch_id) "
            "layout; route this pipeline's audit through stream_ingest, "
            "or use a separate audit path for batch runs"
        )
    if set(existing.columns) != _AUDIT_COL_NAMES:
        raise ValueError(
            f"audit table at {audit_path} has columns "
            f"{sorted(existing.columns)} but the current audit row has "
            f"{sorted(_AUDIT_COL_NAMES)} — run "
            "plans.ingest.migrate_batch_audit_table(spark, audit_path) "
            "(one-time rewrite) rather than mixing schemas"
        )


def write_ingest_audit(spark, audit_path: str, report: IngestReport) -> None:
    """Append ``ingest_audit_row`` to the audit table (batch runner path),
    re-running ``validate_batch_audit_layout`` for direct callers."""
    validate_batch_audit_layout(spark, audit_path)
    ingest_audit_row(spark, report).write.mode("append").parquet(audit_path)


def migrate_batch_audit_table(spark, audit_path: str) -> list[str]:
    """One-time audit-table migration to the current ``_AUDIT_COLS_DDL``
    column set (round-9 review: widening the audit row — e.g. the
    ``n_entropy_dropped`` column — must not strand every pre-existing
    table behind the schema-drift guard with only a hand-rewrite as the
    way out, even for callers who never enable the new feature). Missing
    CURRENT columns are added as NULL (the "tier did not run" encoding
    every report field already uses); UNKNOWN existing columns raise —
    this helper cannot invent meaning for them. Both layouts are handled:
    the flat batch table rewrites through the crash-safe
    ``atomic_swap_write``, the streaming table keeps its ``__batch_id``
    partitioning. Returns the list of columns added (empty = no-op)."""
    from ..sources.writers import atomic_swap_write
    from ..streaming.pipeline import _read_store_or_none

    existing = _read_store_or_none(spark, audit_path)
    if existing is None:
        return []
    part = [c for c in ("__batch_id",) if c in existing.columns]
    have = set(existing.columns) - set(part)
    unknown = sorted(have - _AUDIT_COL_NAMES)
    if unknown:
        raise ValueError(
            f"audit table at {audit_path} has columns {unknown} the current "
            "audit schema does not know — they cannot be auto-migrated"
        )
    ddl = {
        c.strip().split()[0]: c.strip().split()[1] for c in _AUDIT_COLS_DDL.split(",")
    }
    missing = [c for c in ddl if c not in have]
    if not missing:
        return []
    out = existing
    for c in missing:
        out = out.withColumn(c, F.lit(None).cast(ddl[c]))
    # column order: the current DDL order, partitions last (their values
    # live in the directory layout either way)
    out = out.select(*[c for c in ddl], *part)
    # localCheckpoint before the swap: the plan reads the very directory
    # the swap replaces
    out = out.localCheckpoint(eager=True)
    atomic_swap_write(out, audit_path, partition_by=part or None)
    return missing


# ----------------------------------------------- atomic (manifest) mode ----


def _read_manifest_table_or_none(spark, table_dir: str) -> DataFrame | None:
    from ..sources import manifest as MF

    if MF.current_version(table_dir) is None:
        return None
    return MF.read_table(spark, table_dir)


def run_incremental_ingest_txn(
    batch: DataFrame,
    *,
    corpus_table: str,
    exact_table: str,
    txn_dir: str,
    minhash_table: str | None = None,
    simhash_table: str | None = None,
    audit_table: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    minhash_threshold: float = 0.8,
    shingle_n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    simhash_max_hamming: int = 3,
    max_bucket_size: int | None = None,
    passage_table: str | None = None,
    passage_window: int = 10,
    passage_min_count: int = 2,
    decon_store: str | None = None,
    nb_store: str | None = None,
    nb_threshold_micros: int = 0,
    min_entropy_microbits: int | None = None,
    url_col: str | None = None,
    domain_blocklist: "Sequence[str] | DataFrame" = (),
    domain_allowlist: "Sequence[str] | DataFrame | None" = None,
    collapse_url_aliases: bool = False,
    strict_domain_gate: bool = False,
    url_keeper_table: str | None = None,
    jaccard_table: str | None = None,
    jaccard_threshold: float = 0.6,
    jaccard_n: int = 3,
    jaccard_feature: str = "shingles",
) -> IngestReport:
    """``run_incremental_ingest`` with ATOMIC publication (round-7 verdict
    item 4): every sink is a ``sources/manifest`` table and the landed
    corpus + enabled dedup stores + audit flip together through ONE
    journaled ``multi_commit`` — the all-or-nothing alternative to the
    batch runner's ordered idempotent appends. A crash anywhere before the
    journal write publishes NOTHING (rerun recomputes and lands everything
    exactly once); a crash after it is healed by the recovery-first call
    below, after which the rerun's anti-join guards find every row already
    landed and the transaction appends nothing. There is no torn state in
    between — the corpus can never run ahead of its stores, which is the
    seam the plain-parquet mode documents and tolerates.

    Same tier semantics, drop policy, validation-up-front and audit
    contract as ``run_incremental_ingest`` (the tier body is shared);
    batch ids must be disjoint from landed ids. Reruns of an already-
    committed batch append a second audit row (both attempts are real
    events — the same log semantics as the batch runner). Store parameter
    sidecars live in the manifest table dir alongside ``_manifests/``.
    Single-writer per pipeline, like the batch runner; concurrent writers
    on the SAME tables are detected by ``multi_commit``'s CAS and fail the
    whole transaction.

    ``passage_table`` enables the passage-REWRITE tier (round-9): the
    cleaned survivors land in the corpus and the batch's (h, c, __fp)
    window-count rows join the SAME journaled transaction — corpus and
    count store can never tear. The count rows carry the batch's content
    fingerprint: the masking read EXCLUDES own-fingerprint rows (so a
    rerun of a committed batch recomputes the identical mask), and the
    rows appended are derived from the corpus-guarded survivor set — on a
    committed rerun that set is empty, so the counts append nothing,
    mirroring the id-anti-join guards of the keyed stores.

    ``decon_store`` composes benchmark decontamination into the same
    rewrite exactly as in ``run_incremental_ingest``: the eval window
    store is a READ-ONLY input (a flat ``write_passage_store`` parquet
    path, NOT a manifest table — it never joins the transaction because
    nothing is ever written to it), masking is unconditional for eval
    windows, and the audit counters cover the combined mask.

    ``nb_store`` / ``nb_threshold_micros`` enable the same read-only NB
    QUALITY GATE as the parquet runner (flat ``write_nb_store`` path,
    outside the journal): below-threshold docs drop before any tier, and
    the audit row carries ``n_quality_dropped``; ``min_entropy_microbits``
    enables the map-only char-entropy pre-gate before it
    (``n_entropy_dropped``), exactly as in the parquet runner.

    ``url_keeper_table`` (round 13, closing the round-12 boundary) brings
    the canonical-URL keeper tier into the transaction: the keeper rows
    live in a MANIFEST table whose rows carry the batch's content
    fingerprint ``__fp`` (the passage-count-store mechanism — changed-
    content keeper rows are keyed by the EXISTING keeper_id, not a batch
    id, so the id heal cannot attribute them), reads exclude own-``__fp``
    rows so a committed rerun re-classifies the batch IDENTICALLY, and the
    keeper append joins the same journaled commit as every other sink —
    the corpus can never run ahead of its URL identity. Changed-content
    re-crawls route to a CDC update: the corpus write becomes an atomic
    OVERWRITE (existing rows with the keepers' text replaced, plus the
    guarded new rows) inside the same transaction, and the exact table
    gains the updated keepers' NEW fingerprints (guarded on (id, fp), so
    a rerun appends nothing). One documented recompute seam: a rerun of a
    committed batch sees the refreshed exact fps, so a batch doc whose
    text equals an update's new text counts as an exact dup on the rerun
    — the guarded appends make the DATA state identical either way, only
    the second audit row's tier counts can differ (same contract as the
    rerun audit note above).

    ``jaccard_table`` (round 14) brings the exact prefix-Jaccard tier
    into the transaction: the store's three sub-frames live as MANIFEST
    tables at ``jaccard_table/{census,postings,gramsets}`` (the params
    sidecar at the table root, as with every store), the tier runs at the
    store's build threshold exactly as in the parquet runner, and the
    survivor gramsets + postings join the SAME journaled commit as every
    other sink — the corpus can never run ahead of the index. A first
    batch's census (frozen from its own gated grams) commits in the same
    journal; committed reruns find every posting id present and append
    nothing. The drift-mass sidecar records AFTER the commit (telemetry,
    not data — a failed transaction records nothing)."""
    from ..operators import dedup as DD
    from ..operators.curation import read_passage_store
    from ..sources import manifest as MF

    spark = batch.sparkSession
    # recovery-first discipline: roll forward any transaction a previous
    # run journaled but did not finish flipping, BEFORE reading any table
    MF.recover_multi_commits(txn_dir)

    n_batch = batch.count()
    mh_on = minhash_table is not None
    sh_on = simhash_table is not None
    pg_on = passage_table is not None
    dc_on = decon_store is not None
    rw_on = pg_on or dc_on
    q_on = nb_store is not None
    e_on = min_entropy_microbits is not None
    d_on = url_col is not None
    uk_on = url_keeper_table is not None
    jc_on = jaccard_table is not None
    if uk_on and url_col is None:
        raise ValueError(
            "url_keeper_table requires url_col (the URL identity to key on) "
            "— pass url_col even when no domain lists are configured"
        )

    # validate every enabled store's parameter sidecar up front (same
    # helpers as the parquet mode — the sidecar is a plain file next to
    # the table's _manifests dir)
    # heal crashed store overwrites BEFORE the spec probes (same ordering
    # fix as the parquet runner: a sidecar stranded in a .backup sibling
    # would misdetect the layout and fail with the wrong diagnosis)
    from ..sources.writers import recover_interrupted_swap as _heal

    _heal(exact_table)
    if mh_on:
        _heal(minhash_table)
    if DD.exact_store_bucket_spec(exact_table) is not None:
        raise ValueError(
            f"exact table at {exact_table} has the BUCKETED layout — "
            "manifest tables read through the manifest's own file "
            "listing, which cannot carry bucket metadata; the bucketed "
            "store belongs to the plain-parquet runner "
            "(run_incremental_ingest)"
        )
    DD.ensure_exact_params_sidecar(exact_table)
    if mh_on:
        if DD.minhash_store_bucket_spec(minhash_table) is not None:
            raise ValueError(
                f"minhash table at {minhash_table} has the BUCKETED layout — "
                "manifest tables read through the manifest's own file "
                "listing, which cannot carry bucket metadata; the bucketed "
                "store belongs to the plain-parquet runner "
                "(run_incremental_ingest)"
            )
        DD.ensure_minhash_params_sidecar(
            minhash_table, shingle_n=shingle_n, num_hashes=num_hashes, bands=bands
        )
    if sh_on:
        DD.ensure_simhash_params_sidecar(simhash_table)
    if jc_on:
        DD.ensure_jaccard_params_sidecar(
            jaccard_table,
            n=jaccard_n,
            feature=jaccard_feature,
            threshold=jaccard_threshold,
        )
    if pg_on:
        from ..operators.curation import ensure_passage_params_sidecar

        ensure_passage_params_sidecar(passage_table, window=passage_window)
    if uk_on:
        from ..operators.domains import ensure_url_keeper_table_sidecar

        ensure_url_keeper_table_sidecar(url_keeper_table)
    # eval decon store: read-only input, sidecar-validated up front with
    # the transactional sinks (a window mismatch must fail before compute)
    decon_h = (
        read_passage_store(spark, decon_store, window=passage_window).select("h")
        if dc_on
        else None
    )

    if n_batch == 0:
        report = IngestReport(
            0,
            0,
            0 if mh_on else None,
            0 if sh_on else None,
            0,
            0 if mh_on else None,
            0 if sh_on else None,
            n_after_jaccard=0 if jc_on else None,
            jaccard_pairs=0 if jc_on else None,
            passage_tokens_removed=0 if rw_on else None,
            passage_docs_touched=0 if rw_on else None,
            n_quality_dropped=0 if q_on else None,
            n_entropy_dropped=0 if e_on else None,
            nb_threshold_micros=int(nb_threshold_micros) if q_on else None,
            n_domain_dropped=0 if d_on else None,
            n_url_alias_dropped=0
            if d_on and (collapse_url_aliases or uk_on)
            else None,
            n_url_updates=0 if uk_on else None,
        )
        if audit_table is not None:
            MF.multi_commit(
                [{"df": ingest_audit_row(spark, report), "table_dir": audit_table,
                  "mode": "append"}],
                txn_dir,
            )
        return report

    # gates (every sidecar above already validated — a doomed run fails
    # before any gate spends compute): the domain tier first, then the
    # map-only entropy floor, then the NB scoring join; gated-out docs
    # are invisible to every heal, tier and sink below
    n_domain_dropped = 0 if d_on else None
    n_url_alias_dropped = 0 if d_on and collapse_url_aliases else None
    if d_on:
        batch, n_domain_dropped, n_url_alias_dropped = _domain_gate(
            batch, url_col, domain_blocklist, domain_allowlist,
            collapse_url_aliases, id_col, n_batch,
            strict=strict_domain_gate,
        )
        if not collapse_url_aliases:
            n_url_alias_dropped = None
    # canonical-URL keeper gate (round 13): same tier position as the
    # batch runner — classify against the manifest keeper table BEFORE the
    # content tiers. Reads exclude own-__fp rows (the batch content
    # fingerprint), so a rerun of a committed batch recomputes the
    # IDENTICAL classification; the append (tagged with that __fp) and the
    # CDC corpus overwrite join the journaled commit below.
    n_url_updates = 0 if uk_on else None
    uk_updates = uk_append = raw_uk = uk_fp = None
    if uk_on:
        from ..operators.domains import _URL_KEEPER_SCHEMA, url_keeper_gate

        uk_fp = _batch_fingerprint(batch, id_col)
        raw_uk = _read_manifest_table_or_none(spark, url_keeper_table)
        if raw_uk is not None:
            uk_existing = raw_uk.filter(F.col("__fp") != F.lit(uk_fp)).drop(
                "__fp"
            )
            uk_seq = (
                uk_existing.agg(F.max("batch_seq")).collect()[0][0] or 0
            ) + 1
        else:
            uk_existing = spark.createDataFrame([], _URL_KEEPER_SCHEMA)
            uk_seq = 1
        batch, uk_updates, uk_append, n_uk_dropped = url_keeper_gate(
            batch, uk_existing, url_col, id_col, text_col, batch_seq=uk_seq
        )
        batch = batch.localCheckpoint(eager=True)
        uk_updates = uk_updates.localCheckpoint(eager=True)
        uk_append = uk_append.localCheckpoint(eager=True)
        n_url_updates = uk_updates.count()
        n_url_alias_dropped = (n_url_alias_dropped or 0) + n_uk_dropped
    n_remaining = (
        n_batch
        - (n_domain_dropped or 0)
        - (n_url_alias_dropped or 0)
        - (n_url_updates or 0)
    )
    n_entropy_dropped = 0 if e_on else None
    if e_on:
        batch, n_entropy_dropped = _entropy_gate(
            batch, min_entropy_microbits, text_col, n_remaining
        )
    n_quality_dropped = 0 if q_on else None
    if q_on:
        batch, n_quality_dropped = _quality_gate(
            batch, nb_store, nb_threshold_micros, text_col, id_col,
            n_remaining - (n_entropy_dropped or 0),
        )

    # store views: raw manifest reads, healed of any rows carrying THIS
    # batch's ids (after recovery those can only come from a fully
    # committed prior attempt — the heal makes the rerun recompute
    # identical survivors, and the append guards below then land nothing)
    from ..streaming.pipeline import _drop_replayed_batch_rows

    raw_exact = _read_manifest_table_or_none(spark, exact_table)
    raw_mh = _read_manifest_table_or_none(spark, minhash_table) if mh_on else None
    raw_sh = _read_manifest_table_or_none(spark, simhash_table) if sh_on else None
    pg_fp = _batch_fingerprint(batch, id_col) if pg_on else None
    raw_pg = _read_manifest_table_or_none(spark, passage_table) if pg_on else None
    # own-fingerprint rows can only come from a fully committed prior
    # attempt of THIS batch (multi_commit is all-or-nothing) — excluding
    # them makes the rerun's mask identical to the first attempt's
    pg_counts = (
        raw_pg.filter(F.col("__fp") != F.lit(pg_fp))
        .groupBy("h")
        .agg(F.sum("c").alias("c"))
        if raw_pg is not None
        else None
    )
    ex_store = (
        _drop_replayed_batch_rows(raw_exact, batch, id_col).select(id_col, "fp")
        if raw_exact is not None
        else None
    )
    mh_store = (
        _drop_replayed_batch_rows(raw_mh, batch, id_col).select(id_col, "hs", "sig")
        if raw_mh is not None
        else None
    )
    sh_store = (
        _drop_replayed_batch_rows(raw_sh, batch, id_col).select(id_col, "simhash64")
        if raw_sh is not None
        else None
    )
    # prefix-Jaccard store views (round 14): the three sub-frames are
    # manifest tables under jaccard_table/; same heal discipline as the
    # other store views (after recovery, batch-id rows can only come from
    # a fully committed prior attempt)
    jc_census = raw_jc_posts = jc_postings_store = jc_sets_store = None
    jc_num = jc_den = None
    jc_census_new = False
    if jc_on:
        import os as _os

        jc_params = DD._read_jaccard_params(jaccard_table)
        jc_num = int(jc_params["threshold_num"])
        jc_den = int(jc_params["threshold_den"])
        jc_census = _read_manifest_table_or_none(
            spark, _os.path.join(jaccard_table, "census")
        )
        raw_jc_posts = _read_manifest_table_or_none(
            spark, _os.path.join(jaccard_table, "postings")
        )
        raw_jc_sets = _read_manifest_table_or_none(
            spark, _os.path.join(jaccard_table, "gramsets")
        )
        if raw_jc_posts is not None:
            jc_postings_store = _drop_replayed_batch_rows(
                raw_jc_posts, batch, id_col
            ).select(id_col, "g", "sz", "rn")
        if raw_jc_sets is not None:
            jc_sets_store = (
                _drop_replayed_batch_rows(raw_jc_sets, batch, id_col)
                .dropDuplicates([id_col])
                .select(id_col, "gs", "n_grams")
            )
        if jc_census is None:
            # first batch: freeze the census from the gated batch's own
            # grams; it commits in the SAME journal as every other sink
            jc_census_new = True
            jc_census = (
                DD._jaccard_gram_rows(
                    batch, text_col, id_col, jaccard_n, jaccard_feature
                )
                .groupBy("g")
                .agg(F.count(F.lit(1)).cast("long").alias("df"))
                .localCheckpoint(eager=True)
            )

    survivors, report, jc_art = _run_tiers(
        batch,
        ex_store,
        mh_store,
        sh_store,
        mh_on=mh_on,
        sh_on=sh_on,
        text_col=text_col,
        id_col=id_col,
        minhash_threshold=minhash_threshold,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
        bands=bands,
        simhash_max_hamming=simhash_max_hamming,
        max_bucket_size=max_bucket_size,
        n_batch=n_batch,
        jc_on=jc_on,
        jc_census=jc_census,
        jc_store_postings=jc_postings_store,
        jc_store_sets=jc_sets_store,
        jc_n=jaccard_n,
        jc_feature=jaccard_feature,
        jc_num=jc_num if jc_on else 3,
        jc_den=jc_den if jc_on else 5,
    )
    if q_on or e_on or d_on or uk_on:
        from dataclasses import replace as _replace

        report = _replace(
            report,
            n_quality_dropped=n_quality_dropped,
            n_entropy_dropped=n_entropy_dropped,
            nb_threshold_micros=int(nb_threshold_micros) if q_on else None,
            n_domain_dropped=n_domain_dropped,
            n_url_alias_dropped=n_url_alias_dropped,
            n_url_updates=n_url_updates,
        )

    land_df = survivors
    pg_wins = None
    if rw_on:
        from dataclasses import replace

        land_df, pg_wins, pg_removed, pg_touched = _passage_stage(
            survivors,
            pg_counts,
            window=passage_window,
            min_count=passage_min_count,
            text_col=text_col,
            id_col=id_col,
            decon=decon_h,
            dedup=pg_on,
        )
        report = replace(
            report,
            passage_tokens_removed=pg_removed,
            passage_docs_touched=pg_touched,
        )

    def _guard(rows: DataFrame, raw: DataFrame | None) -> DataFrame:
        # after a fully committed prior attempt every row is already
        # landed — the anti-join empties the append so the rerun's
        # transaction is a no-op on data (only the audit log grows)
        if raw is None:
            return rows
        return rows.join(raw.select(id_col).distinct(), id_col, "left_anti")

    raw_corpus = _read_manifest_table_or_none(spark, corpus_table)
    # CDC re-crawl updates (keeper tier): the corpus write becomes an
    # atomic OVERWRITE — every existing row with the updated keepers'
    # text replaced, plus the guarded new rows — inside the SAME journal,
    # so readers flip from old corpus to updated+landed in one pointer
    # move. Idempotent: a committed rerun recomputes identical updates
    # (own-__fp heal) and rewrites the same bytes.
    if uk_on and n_url_updates:
        from ..operators.domains import apply_url_updates

        if raw_corpus is None:
            raise ValueError(
                f"keeper table {url_keeper_table} routed {n_url_updates} "
                f"CDC updates but corpus table {corpus_table} does not "
                "exist — the keeper table belongs to a different pipeline"
            )
        corpus_df = apply_url_updates(
            raw_corpus, uk_updates, id_col, (text_col,)
        ).unionByName(_guard(land_df, raw_corpus))
        corpus_write = {
            "df": corpus_df,
            "table_dir": corpus_table,
            "mode": "overwrite",
        }
    else:
        corpus_write = {
            "df": _guard(land_df, raw_corpus),
            "table_dir": corpus_table,
            "mode": "append",
        }
    exact_rows = _guard(
        DD.exact_fingerprint_store(survivors, text_col, id_col), raw_exact
    )
    if uk_on and n_url_updates:
        # refresh the exact table with the updated keepers' NEW content
        # fingerprints (future copies of the new text drop as exact dups
        # — round-12 review). Guarded on (id, fp): the ids already exist
        # under their OLD fps, so the id guard can't apply, and on a
        # committed rerun the (id, new-fp) rows are present and the
        # anti-join empties the refresh.
        refresh = DD.exact_fingerprint_store(
            uk_updates.select(
                F.col("keeper_id").alias(id_col), F.col(text_col)
            ),
            text_col,
            id_col,
        )
        if raw_exact is not None:
            refresh = refresh.join(
                raw_exact.select(id_col, "fp"), [id_col, "fp"], "left_anti"
            )
        exact_rows = exact_rows.unionByName(refresh)
    writes = [
        corpus_write,
        {"df": exact_rows, "table_dir": exact_table, "mode": "append"},
    ]
    if mh_on:
        writes.append(
            {
                "df": _guard(
                    DD.minhash_signature_store(
                        survivors, text_col, id_col, shingle_n, num_hashes, bands
                    ),
                    raw_mh,
                ),
                "table_dir": minhash_table,
                "mode": "append",
            }
        )
    if sh_on:
        writes.append(
            {
                "df": _guard(DD.simhash_store_rows(survivors, text_col, id_col), raw_sh),
                "table_dir": simhash_table,
                "mode": "append",
            }
        )
    if jc_on:
        import os as _os

        jc_postings_new, jc_sets_new = jc_art
        surv_ids = survivors.select(id_col).distinct()
        # guard against the POSTINGS table's ids (multi_commit is
        # all-or-nothing, so postings-present == fully indexed; on a
        # committed rerun both appends empty)
        jc_sets_rows = jc_sets_new.join(surv_ids, id_col, "left_semi")
        jc_post_rows = jc_postings_new.join(surv_ids, id_col, "left_semi")
        if raw_jc_posts is not None:
            jc_pids = raw_jc_posts.select(id_col).distinct()
            jc_sets_rows = jc_sets_rows.join(jc_pids, id_col, "left_anti")
            jc_post_rows = jc_post_rows.join(jc_pids, id_col, "left_anti")
        if jc_census_new:
            writes.append(
                {
                    "df": jc_census,
                    "table_dir": _os.path.join(jaccard_table, "census"),
                    "mode": "append",
                }
            )
        writes.append(
            {
                "df": jc_sets_rows,
                "table_dir": _os.path.join(jaccard_table, "gramsets"),
                "mode": "append",
            }
        )
        writes.append(
            {
                "df": jc_post_rows,
                "table_dir": _os.path.join(jaccard_table, "postings"),
                "mode": "append",
            }
        )
    if pg_on:
        # count rows derived from the corpus-GUARDED survivor ids: on a
        # committed rerun that set is empty (ids across batches are
        # disjoint, so the guard is all-or-nothing per batch) and the
        # append lands nothing — the hash-keyed store's analogue of the
        # keyed stores' id anti-join
        new_ids = _guard(survivors.select(id_col), raw_corpus).distinct()
        writes.append(
            {
                "df": (
                    pg_wins.join(new_ids, id_col, "left_semi")
                    .groupBy("h")
                    .agg(F.count(F.lit(1)).alias("c"))
                    .withColumn("__fp", F.lit(pg_fp))
                ),
                "table_dir": passage_table,
                "mode": "append",
            }
        )
    if uk_on:
        # keeper rows restricted to canonicals whose keeper exists in the
        # FINAL corpus (existing rows for changed-content updates, this
        # transaction's guarded landings for new canonicals — a batch doc
        # dropped by a content tier keeps its URL un-tracked, same policy
        # as the batch runner). Tagged with the batch __fp so reads can
        # heal and a committed rerun's append is emptied by the
        # own-__fp-exists guard (the passage table's analogue).
        already_committed = (
            raw_uk is not None
            and raw_uk.filter(F.col("__fp") == F.lit(uk_fp)).limit(1).count()
            > 0
        )
        landed_ids = _guard(land_df, raw_corpus).select(
            F.col(id_col).alias("keeper_id")
        )
        if raw_corpus is not None:
            landed_ids = landed_ids.unionByName(
                raw_corpus.select(F.col(id_col).alias("keeper_id"))
            )
        uk_rows = uk_append.join(
            landed_ids.distinct(), "keeper_id", "left_semi"
        ).withColumn("__fp", F.lit(uk_fp))
        if already_committed:
            uk_rows = uk_rows.limit(0)
        writes.append(
            {"df": uk_rows, "table_dir": url_keeper_table, "mode": "append"}
        )
    if audit_table is not None:
        writes.append(
            {"df": ingest_audit_row(spark, report), "table_dir": audit_table,
             "mode": "append"}
        )
    MF.multi_commit(writes, txn_dir)
    if jc_on:
        # drift telemetry AFTER the commit (a failed transaction records
        # nothing); duplicate entries on a committed rerun are telemetry,
        # not data — the drift ratio reads only the last entry
        jc_postings_new, _jc_sets_new = jc_art
        DD._record_jaccard_batch_mass(
            jaccard_table,
            jc_postings_new,
            jc_postings_store
            if jc_postings_store is not None
            else jc_postings_new.limit(0),
            _jc_sets_new,
            True,
        )
    return report
