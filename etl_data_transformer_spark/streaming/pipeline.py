"""Structured Streaming surface (SURVEY.md §2.9).

The reference is batch-only — its ``v_delta_offset`` is a batch high-water
mark, not a streaming watermark. This module is the upgrade path SURVEY.md
§1.1 names: the same event transformations expressed as an incremental
stream with real watermarking.

- ``stream_tumbling_agg``: readStream → withWatermark → window agg. The
  batch twin is ``operators/window_ops.tumbling_agg`` — same output schema.
- ``stream_sessionize``: custom stateful operator via
  ``applyInPandasWithState`` — per-user session aggregation with an
  inactivity gap; closed sessions are emitted, the open session per key
  lives in state until a later batch (or timeout) closes it. The batch twin
  is ``operators/temporal.session_agg`` (gaps-and-islands).
- ``run_available_now``: drain all available input once (Trigger.AvailableNow)
  — deterministic batch-like execution used by tests and backfills.

Scale notes: state size is bounded by the watermark horizon; shuffle
partitions for streaming stateful ops follow ``spark.sql.shuffle.partitions``
at the first run (state is partition-count-sticky — size it before prod).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, src_dir: str, schema: T.StructType = EVENTS_SCHEMA) -> DataFrame:
    """File-source stream over a directory of parquet event files."""
    return spark.readStream.schema(schema).parquet(src_dir)


def stream_tumbling_agg(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    watermark: str = "2 hours",
    group_extra: list[str] | None = None,
    slide: str | None = None,
) -> DataFrame:
    """Watermarked tumbling-window aggregate; late rows beyond ``watermark``
    are dropped and state for closed windows is evicted. ``slide`` turns it
    into the HOPPING twin (``operators/window_ops.hopping_agg``): each event
    lands in every duration/slide window covering it, and the engine keeps
    duration/slide times the window state until the watermark closes them."""
    win = (
        F.window(F.col(ts_col), duration, slide)
        if slide is not None
        else F.window(F.col(ts_col), duration)
    )
    keys = [win.alias("w")] + [F.col(c) for c in (group_extra or [])]
    out = (
        events.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        *[F.col(c) for c in (group_extra or [])],
        "n_events",
        "sum_value",
    )


# the DEFAULT-key output shape (kept for consumers/tests that pin it);
# stream_sessionize derives the actual schema from its key_col at runtime
SESSION_OUTPUT_SCHEMA = (
    "user_id long, sess_start timestamp, sess_end timestamp, n_events long, sum_value double"
)
# state: open-session accumulator, timestamps as epoch micros
SESSION_STATE_SCHEMA = "sess_start long, last_ts long, n_events long, sum_value double"


def stream_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    close_on_timeout: bool = False,
) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    per-key sessions with an inactivity gap.

    Sessions closed by a gap WITHIN the arriving data are emitted
    immediately; the trailing open session is carried in group state and
    closed by a later batch (or, with ``close_on_timeout=True``, by a
    processing-time timeout). State per key is one 4-field tuple — bounded
    regardless of stream length.

    ``close_on_timeout`` is for long-running live streams only: a
    processing-time timeout makes the engine schedule continuous empty
    micro-batches to service timers, so a Trigger.AvailableNow drain (tests,
    backfills) would never terminate — leave it False there.

    This is the Python slow path by design (the point is the state API);
    the batch equivalent (``operators/temporal.session_agg``) is pure
    Catalyst and should be preferred for backfills.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    # output schema follows the caller's key column (name AND type):
    # SESSION_OUTPUT_SCHEMA hardcoded 'user_id long', so any renamed or
    # non-long key either crashed the Arrow conversion mid-query or
    # silently mislabeled the output column (round-7 review)
    key_type = events.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, sess_start timestamp, sess_end timestamp, "
        "n_events long, sum_value double"
    )

    def fn(key, pdf_iter, state):
        def emit(rows):
            return pd.DataFrame(
                {
                    key_col: [key[0]] * len(rows),
                    "sess_start": [pd.Timestamp(s, unit="us") for s, _, _, _ in rows],
                    "sess_end": [pd.Timestamp(l, unit="us") for _, l, _, _ in rows],
                    "n_events": [n for _, _, n, _ in rows],
                    "sum_value": [round(v, 4) for _, _, _, v in rows],
                }
            )

        if state.hasTimedOut:
            s, l, n, v = state.get
            state.remove()
            yield emit([(s, l, n, v)])
            return

        s = l = None
        n, v = 0, 0.0
        if state.exists:
            s, l, n, v = state.get
        closed: list[tuple] = []
        # Concatenate ALL Arrow chunks before sorting: a key's batch data
        # spans multiple chunks once it exceeds arrow.maxRecordsPerBatch
        # (default 10k rows), and sorting each chunk independently would
        # process events out of time order — splitting sessions differently
        # from the batch twin. Memory is bounded by the same assumption the
        # state tuple already makes (one key's batch fits in memory).
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(ts_col)
            for ts, val in zip(pdf[ts_col], pdf[value_col]):
                t = int(pd.Timestamp(ts).value // 1_000)  # ns → us
                if s is None:
                    s = l = t
                    n, v = 1, float(val)
                elif t - l > gap_us:
                    closed.append((s, l, n, v))
                    s = l = t
                    n, v = 1, float(val)
                else:
                    l = max(l, t)
                    n += 1
                    v += float(val)
        if s is not None:
            state.update((s, l, n, v))
            if close_on_timeout:
                state.setTimeoutDuration(gap_minutes * 60 * 1000)
        yield emit(closed)

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout if close_on_timeout else GroupStateTimeout.NoTimeout
        ),
    )


def stream_incremental_append(
    stream_df: DataFrame,
    target_path: str,
    checkpoint_dir: str,
    cdc_column: str = "ts",
    partition_col: str = "cdc_date",
) -> None:
    """The C4 incremental append as a streaming sink: new source files flow
    into the date-partitioned fact exactly once (offsets + sink metadata in
    the checkpoint), replacing the batch watermark bookkeeping
    (``Incremental_load_fact_item_status.sql:10-20``) entirely — the
    checkpoint IS the high-water mark.

    Each ``Trigger.AvailableNow`` invocation drains whatever arrived since
    the last run; re-running after a partial failure never duplicates rows
    (file-sink transactional log). Partitioned by ``partition_col`` so batch
    readers get partition pruning on the same layout the batch loader
    (plans/incremental.py) writes.
    """
    out = stream_df.withColumn(partition_col, F.to_date(F.col(cdc_column)))
    q = (
        out.writeStream.format("parquet")
        .option("path", target_path)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy(partition_col)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_incremental_upsert(
    stream_df: DataFrame,
    target_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    cdc_column: str = "ts",
    partition_col: str = "cdc_date",
) -> None:
    """The FULL streaming form of the reference's delete-insert (C4,
    ``Incremental_load_fact_item_status.sql:23-40``): each micro-batch
    UPSERTS by ``key_cols`` — rows already in the target with a matching key
    are replaced, new keys append.

    ``foreachBatch`` + dynamic partition overwrite: the rewritten set is
    the batch's date partitions plus every target partition holding a
    batch key (so a key whose cdc date moves never leaves a stale row
    behind; a partition fully emptied by the replacement is dropped).
    Rewrite cost per batch ∝ touched partitions; locating stale keys adds
    one broadcast semi-join scan of the target per batch — the price of
    true key-upsert semantics over plain parquet (a table format does the
    same scan against its file statistics). Batch-local dedup keeps the
    LAST row per key by ``cdc_column`` (CDC ordering).
    """
    from pyspark.sql import Window

    def upsert(batch_df: DataFrame, batch_id: int) -> None:  # noqa: ARG001
        spark = batch_df.sparkSession
        batch = batch_df.withColumn(partition_col, F.to_date(F.col(cdc_column)))
        w = Window.partitionBy(*key_cols).orderBy(F.col(cdc_column).desc())
        batch = (
            batch.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
        ).persist()
        try:
            if batch.isEmpty():
                return
            # First-batch probe via the same AnalysisException gating as
            # _read_store_or_none (round-5 verdict #1): ONLY a genuinely
            # absent/empty target takes the create path. A transient read
            # failure on an EXISTING table (corrupt footer, permissions, FS
            # blip) must propagate so foreachBatch retries — the old blind
            # `except Exception` here fell through to a STATIC overwrite
            # that replaced the whole table with one micro-batch.
            old = _read_store_or_none(spark, target_path)
            if old is None:
                # dynamic mode even on create: harmless on an empty path,
                # and keeps the write mode identical across batches so a
                # replay of batch 0 against its own partial output can
                # never static-truncate partitions it didn't touch.
                batch.write.option("partitionOverwriteMode", "dynamic").mode(
                    "overwrite"
                ).partitionBy(partition_col).parquet(target_path)
                return
            bkeys = batch.select(*key_cols).distinct()
            # the touched set is the batch's own date partitions PLUS every
            # target partition holding a batch key: a key whose cdc date
            # moved would otherwise leave its stale row behind in an
            # unrewritten partition — permanent duplicates per key, while
            # the contract promises unconditional key replacement (round-7
            # review). Locating those partitions costs one semi-join scan
            # of the target per batch (map-side, broadcast keys, no wide
            # shuffle) — the price of key-upsert semantics over plain
            # parquet; date-stable workloads pay only the scan.
            cond_old = [old[k].eqNullSafe(bkeys[k]) for k in key_cols]
            key_parts = {
                r[partition_col]
                for r in old.join(F.broadcast(bkeys), cond_old, "left_semi")
                .select(partition_col)
                .distinct()
                .collect()
            }
            dates = {r[partition_col] for r in batch.select(partition_col).distinct().collect()}
            parts = dates | key_parts
            # NULL-safe partition membership: isin never matches NULL, and
            # a NULL cdc date lands in the null partition — matching it
            # explicitly keeps existing null-partition rows in the rewrite
            # instead of silently dropping them (round-7 review).
            non_null = [d for d in parts if d is not None]
            part_match = F.col(partition_col).isin(non_null) if non_null else F.lit(False)
            if None in parts:
                part_match = part_match | F.col(partition_col).isNull()
            touched = old.filter(part_match)
            # null-safe anti join: plain equality never matches NULL key
            # values, so NULL-key rows would both survive the anti join AND
            # re-append from the batch — duplicating every micro-batch.
            cond = [touched[k].eqNullSafe(bkeys[k]) for k in key_cols]
            kept = touched.join(F.broadcast(bkeys), cond, "left_anti")
            out = kept.unionByName(batch).localCheckpoint(eager=True)
            # dynamic overwrite set PER-WRITE: with Spark's default 'static'
            # mode this overwrite would truncate the ENTIRE table for any
            # caller whose session doesn't carry the conf (driver contract —
            # never rely on session-build-time settings).
            out.write.option("partitionOverwriteMode", "dynamic").mode("overwrite").partitionBy(
                partition_col
            ).parquet(target_path)
            # dynamic overwrite leaves a partition untouched when `out` has
            # no rows for it: a stale-key partition fully emptied by the
            # anti join must be dropped explicitly (same plain-parquet
            # emulation of replaceWhere as plans/incremental.py).
            import shutil

            written = {r[partition_col] for r in out.select(partition_col).distinct().collect()}
            for d in parts - written:
                sub = (
                    f"{partition_col}=__HIVE_DEFAULT_PARTITION__"
                    if d is None
                    else f"{partition_col}={d.isoformat() if hasattr(d, 'isoformat') else d}"
                )
                shutil.rmtree(f"{target_path}/{sub}", ignore_errors=True)
        finally:
            batch.unpersist()

    q = (
        stream_df.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup for document ingestion — the streaming twin of
    ``operators/dedup.exact_dedup``: fingerprint the normalized content
    (sha256) and keep one arrival per fingerprint.

    Keeps ONE arrival per fingerprint (processing order within a
    micro-batch is not data order — callers needing deterministic keeper
    selection do a batch ``exact_dedup`` downstream).
    ``dropDuplicatesWithinWatermark`` bounds the dedup state by the
    watermark horizon: a duplicate arriving within the window is dropped,
    state for expired fingerprints is evicted — the property that keeps
    state finite on an unbounded 100 TB ingest (a plain
    ``dropDuplicates`` on a stream grows state forever). Exactness is
    therefore windowed by design; cross-window dups are the batch
    compaction job's business (``exact_dedup`` over the landed table).
    """
    from ..functions.text import fingerprint

    # collision-safe internal column: a caller's own "fp" column survives
    return (
        docs.withColumn("__fp_dedup", fingerprint(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp_dedup"])
        .drop("__fp_dedup")
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    left_watermark: str = "1 hour",
    right_watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: each left event matched to right events
    of the same key whose timestamp falls in the HALF-OPEN interval
    ``(left_ts + lower, left_ts + upper]`` — the same boundary semantics as
    the bounded batch ``operators/temporal.range_join`` (its streaming
    twin; the strict lower bound means a right event at exactly
    ``left_ts + lower`` does NOT match on either engine — equivalence is
    pytest-pinned boundary-for-boundary). E.g. view→purchase attribution
    within an attribution window.

    Both sides are watermarked and the join condition carries an explicit
    event-time range — the two things Spark requires to EVICT join state:
    a left row can stop waiting once the right watermark passes
    ``left_ts + upper``, so state stays bounded by
    ``watermark + upper`` regardless of stream length (an equi-join without
    the time bound would buffer both streams forever).

    Right-side columns are prefixed ``r_`` (both inputs are event streams
    with overlapping schemas). ``how='inner'`` emits matches eagerly —
    available-now drains see them immediately; outer variants
    ('leftOuter'/'rightOuter'/'fullOuter') only emit the null-padded
    unmatched rows once the watermark closes them, which a single
    AvailableNow drain never reaches — use inner for backfill-style runs.
    """
    r = right.select([F.col(c).alias(f"r_{c}") for c in right.columns])
    lw = left.withWatermark(left_ts, left_watermark)
    rw = r.withWatermark(f"r_{right_ts}", right_watermark)
    cond = (
        (lw[key_col] == rw[f"r_{key_col}"])
        & (rw[f"r_{right_ts}"] > lw[left_ts] + F.expr(f"INTERVAL {lower}"))
        & (rw[f"r_{right_ts}"] <= lw[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, how)


def stream_dim_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension enrichment — the streaming twin of
    ``operators/joins.broadcast_dim_join`` (J1/J2/J8): join each
    micro-batch against a STATIC dimension. Stateless (no watermark, no
    join state), broadcast so the stream side never shuffles. Left join
    keeps unmatched facts, same as the batch branches.

    Dim freshness caveat: a parquet-path dim pins its FILE LISTING when
    the DataFrame is created — an in-place overwrite between micro-batches
    is NOT picked up (and deleting the old files fails the next batch).
    To refresh the dim across a long-running stream, restart the query
    with a re-created dim DataFrame, route the join through
    ``foreachBatch`` re-reading the path per batch, or use a table format
    whose snapshot resolves at scan time (Delta/Iceberg)."""
    return stream.join(F.broadcast(dim), on, how)


def stream_near_dedup(
    stream_docs: DataFrame,
    store_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    max_bucket_size: int | None = None,
) -> None:
    """Streaming NEAR-dup detection over a document ingest stream — the
    streaming twin of ``operators/dedup.minhash_dedup_incremental``. Each
    micro-batch:

    1. joins against the PERSISTED signature store at ``store_path`` (the
       landed corpus is never re-shingled — only the batch is),
    2. writes its near-dup pairs (id_a, id_b, jaccard_sim) to
       ``pairs_path``, and
    3. appends its own banded signatures to the store,

    so state grows with corpus SIGNATURES (ids + minhash bands), not text —
    the property that keeps a 100 TB ingest feasible. Unlike the
    watermark-bounded ``stream_exact_dedup``, near-dup detection is
    against the FULL corpus history: the store is a table, not stream
    state, so no window bound is needed.

    ``foreachBatch`` side effects are at-least-once on retry; both sinks
    are made idempotent by partitioning on the micro-batch id and
    overwriting only that partition (dynamic partitionOverwriteMode, set
    per-write) — a replayed batch rewrites its own partition instead of
    appending duplicates.

    Store integrity (round-4 advice): the first-batch case is detected
    EXPLICITLY (``AnalysisException`` whose condition is path-not-found /
    no-schema) — any other read failure on an existing store (corrupt
    footer, permissions, transient FS error) propagates so the micro-batch
    retries, instead of silently degrading to batch-only dedup and dropping
    every cross-batch pair. Each batch also write-or-validates the
    ``_minhash_params`` sidecar (``ensure_minhash_params_sidecar``), so
    restarting the stream with different (shingle_n, num_hashes, bands)
    against an existing store raises instead of matching nothing.
    """
    from ..operators.dedup import (
        ensure_minhash_params_sidecar,
        minhash_dedup,
        minhash_dedup_incremental,
        minhash_signature_store,
    )

    kw = dict(
        text_col=text_col,
        id_col=id_col,
        threshold=threshold,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
        bands=bands,
        max_bucket_size=max_bucket_size,
    )

    ns = _stream_store_namespace(checkpoint_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        import os

        from ..operators.dedup import _write_params_sidecar

        spark = batch_df.sparkSession
        batch = batch_df.select(id_col, text_col).persist()
        try:
            if batch.isEmpty():
                return
            ensure_minhash_params_sidecar(
                store_path, shingle_n=shingle_n, num_hashes=num_hashes, bands=bands
            )
            store = _partitioned_store_or_convert(
                spark,
                store_path,
                ns,
                checkpoint_dir,
                lambda staging: _write_params_sidecar(
                    os.path.join(staging, "_minhash_params.json"),
                    {"shingle_n": shingle_n, "num_hashes": num_hashes, "bands": bands},
                ),
            )
            if store is None:
                pairs = minhash_dedup(batch, **kw)
            else:
                store = _drop_replayed_batch_rows(store, batch, id_col).select(
                    id_col, "hs", "sig"
                )
                pairs = minhash_dedup_incremental(batch, store, **kw)
            _overwrite_batch_partition(pairs, pairs_path, ns, batch_id)
            sigs = minhash_signature_store(
                batch, text_col, id_col, shingle_n, num_hashes, bands
            )
            _overwrite_batch_partition(sigs, store_path, ns, batch_id)
        finally:
            batch.unpersist()

    q = (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_winnow_dedup(
    stream_docs: DataFrame,
    store_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_bucket_size: int | None = None,
) -> None:
    """Streaming VERBATIM-overlap detection over a document ingest stream —
    the streaming twin of ``operators/dedup.winnow_overlap_incremental``
    (as ``stream_near_dedup`` is for MinHash). Each micro-batch winnows
    ONLY its own documents, joins their fingerprints against the persisted
    store at ``store_path``, writes overlap pairs
    (id_a, id_b, shared, containment) to ``pairs_path``, and appends its
    own (id, nf, fp) rows to the store. State grows with fingerprints
    (~2/(w+1) longs per gram), never text.

    Same durability discipline as ``stream_near_dedup``: idempotent
    ``__batch_id``-partitioned sinks (a replayed batch overwrites its own
    partition), explicit first-batch detection (real store-read failures
    propagate and retry), and the ``_winnow_params`` sidecar
    written-or-validated before any data so a restart with different
    (k, w) raises instead of matching nothing.
    """
    from ..operators.dedup import (
        ensure_winnow_params_sidecar,
        winnow_overlap_incremental,
        winnow_overlap_pairs,
        winnow_store_rows,
    )

    ns = _stream_store_namespace(checkpoint_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        import os

        from ..operators.dedup import _write_params_sidecar

        spark = batch_df.sparkSession
        batch = batch_df.select(id_col, text_col).persist()
        try:
            if batch.isEmpty():
                return
            ensure_winnow_params_sidecar(store_path, k=k, w=w)
            store = _partitioned_store_or_convert(
                spark,
                store_path,
                ns,
                checkpoint_dir,
                lambda staging: _write_params_sidecar(
                    os.path.join(staging, "_winnow_params.json"), {"k": k, "w": w}
                ),
            )
            if store is None:
                pairs = winnow_overlap_pairs(
                    batch, text_col, id_col, k, w, min_shared, max_bucket_size
                )
            else:
                pairs = winnow_overlap_incremental(
                    batch,
                    _drop_replayed_batch_rows(store, batch, id_col).select(
                        id_col, "nf", "fp"
                    ),
                    text_col,
                    id_col,
                    k,
                    w,
                    min_shared,
                    max_bucket_size,
                )
            _overwrite_batch_partition(pairs, pairs_path, ns, batch_id)
            rows = winnow_store_rows(batch, text_col, id_col, k, w)
            _overwrite_batch_partition(rows, store_path, ns, batch_id)
        finally:
            batch.unpersist()

    q = (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_passage_dedup(
    stream_docs: DataFrame,
    store_path: str,
    cleaned_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 10,
    min_count: int = 2,
    decon_store: str | None = None,
) -> None:
    """Streaming ExactSubstr passage dedup — the streaming twin of
    ``operators/curation.dedup_passages_incremental``, completing the
    streaming dedup family's document-REWRITING tier (exact/MinHash/
    SimHash/winnow/semantic drop or pair documents; this one cleans
    them). Each micro-batch masks its own documents' tokens against the
    persisted window-count store PLUS in-batch counts, writes the cleaned
    (id, clean_text, n_tokens, n_removed) rows to ``cleaned_path``, and
    appends its own (h, c) count rows to the store — counts are additive,
    so the store read is a group-sum over all landed partitions and
    nothing re-tokenizes landed text. Forward-only like the batch tier:
    landed documents are not retro-cleaned when later mass pushes a
    window over the threshold.

    Durability: the usual idempotent ``__batch_id``-partitioned sinks —
    with one twist. The count store is keyed by window HASH, not doc id,
    so replay healing cannot drop-by-id; instead the store read EXCLUDES
    the current (namespace, batch_id) partition, which can only hold a
    crashed earlier attempt of this very batch — the replay then
    recomputes identical counts and its dynamic overwrite replaces the
    partial partition. ``_passage_params`` sidecar written-or-validated
    before any data (a restart with a different window raises instead of
    mis-thresholding).

    ``decon_store`` (a flat eval-corpus ``passage_count_store``) folds
    benchmark decontamination into the same per-batch rewrite, exactly as
    in the composed ingest runners: eval windows mask unconditionally, the
    store is a READ-ONLY input (never written — no replay seam) and must
    share ``window`` (sidecar-validated before any sink)."""
    from ..operators.curation import (
        _passage_windows,
        dedup_passages_incremental,
        ensure_passage_params_sidecar,
        read_passage_store,
    )

    ns = _stream_store_namespace(checkpoint_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        import os

        from ..operators.curation import _PASSAGE_PARAMS_ALGO
        from ..operators.dedup import _write_params_sidecar

        spark = batch_df.sparkSession
        batch = batch_df.select(id_col, text_col).persist()
        try:
            if batch.isEmpty():
                return
            ensure_passage_params_sidecar(store_path, window=window)
            store = _partitioned_store_or_convert(
                spark,
                store_path,
                ns,
                checkpoint_dir,
                lambda staging: _write_params_sidecar(
                    os.path.join(staging, "_passage_params.json"),
                    {"window": window, "algo": _PASSAGE_PARAMS_ALGO},
                ),
            )
            counts = None
            if store is not None:
                counts = (
                    store.filter(F.col("__batch_id") != F.lit(f"{ns}-{batch_id:06d}"))
                    .groupBy("h")
                    .agg(F.sum("c").alias("c"))
                )
            # compute the batch's tokenize + window explode ONCE: the mask
            # and the store's count rows are both derived from the
            # materialized wins frame, and base is materialized alongside
            # it — _passage_clean consumes base from multiple branches
            # (touched rebuild, untouched projection, doc lists), each of
            # which would otherwise re-run the regex tokenize over the
            # persisted batch (round-8 advice)
            decon_h = (
                read_passage_store(spark, decon_store, window=window).select("h")
                if decon_store is not None
                else None
            )
            base, wins = _passage_windows(batch, window, text_col, id_col)
            base = base.localCheckpoint(eager=True)
            wins = wins.localCheckpoint(eager=True)
            cleaned = dedup_passages_incremental(
                batch, counts, window, min_count, text_col, id_col,
                windows=(base, wins), extra_dup=decon_h,
            )
            _overwrite_batch_partition(cleaned, cleaned_path, ns, batch_id)
            _overwrite_batch_partition(
                wins.groupBy("h").agg(F.count(F.lit(1)).alias("c")),
                store_path,
                ns,
                batch_id,
            )
        finally:
            batch.unpersist()

    q = (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_nb_counts(
    stream_docs: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    *,
    label_col: str,
    text_col: str = "text",
    multiclass: bool = False,
) -> None:
    """Streaming maintenance of the binary Naive Bayes classifier's count
    store — the streaming twin of ``functions/text.write_nb_store``: each
    labeled micro-batch's ``nb_count_rows`` (per-token per-class counts +
    the NULL-token document-prior row) land in the batch's OWN
    ``__batch_id`` partition, so a replayed batch overwrites its earlier
    (possibly partial) rows instead of double-counting. Because every
    model input is additive, ``nb_model_from_counts(read_nb_store(...))``
    at ANY point yields exactly the full retrain over every landed batch
    — classifier refresh without ever re-tokenizing landed text, the
    same amortization contract as the dedup signature stores. A flat
    ``write_nb_store`` seed converts to the partitioned layout on first
    use. The ``_nb_params`` sidecar is written-or-validated before any
    data (a restart under a different tokenizer raises instead of
    corrupting weights). ``multiclass=True`` maintains the MULTICLASS
    store instead (``nb_multi_count_rows`` rows, the multi sidecar algo,
    ``nb_multi_model_from_counts(read_nb_multi_store(...))`` to derive) —
    the two layouts reject each other through the sidecar."""
    from ..functions.text import (
        _NB_MULTI_PARAMS_ALGO,
        _NB_PARAMS_ALGO,
        ensure_nb_multi_params_sidecar,
        ensure_nb_params_sidecar,
        nb_count_rows,
        nb_multi_count_rows,
    )

    ns = _stream_store_namespace(checkpoint_dir)
    algo = _NB_MULTI_PARAMS_ALGO if multiclass else _NB_PARAMS_ALGO
    ensure = ensure_nb_multi_params_sidecar if multiclass else ensure_nb_params_sidecar
    rows_fn = nb_multi_count_rows if multiclass else nb_count_rows

    def process(batch_df: DataFrame, batch_id: int) -> None:
        import os

        from ..operators.dedup import _write_params_sidecar

        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        ensure(store_path)
        _partitioned_store_or_convert(
            spark,
            store_path,
            ns,
            checkpoint_dir,
            lambda staging: _write_params_sidecar(
                os.path.join(staging, "_nb_params.json"), {"algo": algo}
            ),
        )
        _overwrite_batch_partition(
            rows_fn(batch_df, label_col, text_col), store_path, ns, batch_id
        )

    q = (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_stats_rows(
    stream_docs: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    *,
    group_cols: tuple = ("lang", "source"),
    text_col: str = "text",
) -> None:
    """Streaming maintenance of the dataset-card stats store — the
    streaming twin of ``plans/quality.write_stats_store`` (round 12,
    closing the one additive-counter store without one): each
    micro-batch's PARTIAL ``corpus_stats`` rows land in the batch's OWN
    ``__batch_id`` partition, so a replayed batch overwrites its earlier
    (possibly partial) rows instead of double-counting. Every column is
    merge-able (counts/sums add, max_tokens maxes), so
    ``read_corpus_stats`` at ANY point equals the full-corpus profile
    over every landed batch — and the mixture pipeline's α-weights derive
    LIVE from it (``operators.curation.temperature_weights_from_stats``),
    no corpus re-scan. A flat ``write_stats_store`` seed converts to the
    partitioned layout on first use; the ``_stats_params`` sidecar
    (group-cols pin) is written-or-validated before any data."""
    from ..plans.quality import (
        _stats_params,
        corpus_stats,
        ensure_stats_params_sidecar,
    )

    ns = _stream_store_namespace(checkpoint_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        import os

        from ..operators.dedup import _write_params_sidecar

        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        ensure_stats_params_sidecar(store_path, group_cols)
        _partitioned_store_or_convert(
            spark,
            store_path,
            ns,
            checkpoint_dir,
            lambda staging: _write_params_sidecar(
                os.path.join(staging, "_stats_params.json"),
                _stats_params(group_cols),
            ),
        )
        _overwrite_batch_partition(
            corpus_stats(batch_df, group_cols, text_col), store_path, ns, batch_id
        )

    q = (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_url_keeper(
    stream_docs: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    *,
    survivors_path: str,
    updates_path: str,
    url_col: str = "url",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Streaming twin of the canonical-URL keeper tier (round 12 —
    completing the house pattern: every store has batch, incremental and
    streaming forms). Each micro-batch gates against the merged keeper
    view: genuinely new URLs land in the batch's own ``__batch_id``
    partition of ``survivors_path``; changed-content re-crawls become CDC
    rows in ``updates_path`` (the batch columns + the stable
    ``keeper_id`` — a stream cannot rewrite the landed corpus in place,
    so consumers apply them downstream, the standard CDC-stream
    contract); same-content re-crawls and in-batch aliases drop. Keeper
    rows land LAST in their own store partition — the commit point, and
    the replay heal: a replayed micro-batch excludes its own partition
    from the gate view, recomputes the identical classification at the
    identical ``batch_seq`` (max surviving seq + 1), and dynamically
    overwrites all three of its partitions instead of duplicating. A
    flat batch-written keeper store converts to the partitioned layout
    on first use (sidecar validated before any data)."""
    from ..operators.domains import (
        _URL_KEEPER_ALGO,
        ensure_url_keeper_sidecar,
        url_keeper_gate,
    )

    ns = _stream_store_namespace(checkpoint_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        import os

        from ..operators.dedup import _write_params_sidecar

        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        ensure_url_keeper_sidecar(store_path)
        _partitioned_store_or_convert(
            spark,
            store_path,
            ns,
            checkpoint_dir,
            lambda staging: _write_params_sidecar(
                os.path.join(staging, "_url_keeper_params.json"),
                {"algo": _URL_KEEPER_ALGO},
            ),
        )
        from ..operators.domains import read_or_seed_url_keeper

        me = f"{ns}-{batch_id:06d}"
        # heal: a replayed batch must not gate against its own crashed
        # prior attempt's keeper rows (its partition is excluded)
        existing, seq = read_or_seed_url_keeper(
            spark,
            store_path,
            exclude_batch_partition=me,
            allow_streaming_layout=True,
        )
        new_docs, updates, append_rows, _ = url_keeper_gate(
            batch_df, existing, url_col, id_col, text_col, batch_seq=seq
        )
        # survivors and CDC updates first, keeper rows LAST (commit point)
        _overwrite_batch_partition(new_docs, survivors_path, ns, batch_id)
        _overwrite_batch_partition(updates, updates_path, ns, batch_id)
        _overwrite_batch_partition(append_rows, store_path, ns, batch_id)

    q = (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_simhash_dedup(
    stream_docs: DataFrame,
    store_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> None:
    """Streaming SimHash near-dup detection — the streaming twin of
    ``operators/dedup.simhash_near_dups_incremental`` (as
    ``stream_near_dedup`` is for MinHash). Each micro-batch simhashes ONLY
    its own documents, pigeonhole-bands them against the persisted raw
    64-bit signature store at ``store_path``, writes Hamming pairs
    (id_a, id_b, hamming) to ``pairs_path``, and appends its own
    (id, simhash64) rows to the store — 8 bytes of state per landed
    document, the leanest store of the family.

    Same durability discipline as the other streaming dedup twins:
    idempotent ``__batch_id``-partitioned sinks (a replayed batch
    overwrites its own partition), explicit first-batch detection (real
    store-read failures propagate and retry rather than truncating), and
    the ``_simhash_params`` algorithm sidecar written-or-validated before
    any data so a restart against a store built by a different token-hash
    version raises instead of matching nothing. ``max_hamming`` is a
    query-time parameter (banding derives from it per batch), so the SAME
    store serves streams with different thresholds.
    """
    from ..operators.dedup import (
        _SIMHASH_ALGO,
        ensure_simhash_params_sidecar,
        simhash_near_dups,
        simhash_near_dups_incremental,
        simhash_store_rows,
    )

    ns = _stream_store_namespace(checkpoint_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        import os

        from ..operators.dedup import _write_params_sidecar

        spark = batch_df.sparkSession
        batch = batch_df.select(id_col, text_col).persist()
        try:
            if batch.isEmpty():
                return
            ensure_simhash_params_sidecar(store_path)
            store = _partitioned_store_or_convert(
                spark,
                store_path,
                ns,
                checkpoint_dir,
                lambda staging: _write_params_sidecar(
                    os.path.join(staging, "_simhash_params.json"),
                    {"algo": _SIMHASH_ALGO, "n_bits": 64},
                ),
            )
            if store is None:
                pairs = simhash_near_dups(
                    batch, text_col, id_col, max_hamming, max_bucket_size
                )
            else:
                pairs = simhash_near_dups_incremental(
                    batch,
                    _drop_replayed_batch_rows(store, batch, id_col).select(
                        id_col, "simhash64"
                    ),
                    text_col,
                    id_col,
                    max_hamming,
                    max_bucket_size,
                )
            _overwrite_batch_partition(pairs, pairs_path, ns, batch_id)
            rows = simhash_store_rows(batch, text_col, id_col)
            _overwrite_batch_partition(rows, store_path, ns, batch_id)
        finally:
            batch.unpersist()

    q = (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_jaccard_dedup(
    stream_docs: DataFrame,
    store_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
    feature: str = "shingles",
    include_batch_pairs: bool = True,
    record_mass: bool = True,
) -> None:
    """Streaming EXACT prefix-Jaccard near-dup detection — the streaming
    twin of ``operators/dedup.jaccard_join_incremental`` (round-12 verdict
    item 3: the last incremental store without one). Each micro-batch
    shingles ONLY its own documents, orders them under the store's FROZEN
    census, prefix-joins the persisted postings (plus the batch
    self-join), verifies candidates against the persisted gramsets, writes
    exact pairs (id_a, id_b, n_inter, n_a, n_b) to ``pairs_path``, and
    lands its own gramsets + postings into the store's two sub-tables.

    Store layout: ``store_path/{census,postings,gramsets}`` — the same
    three sub-tables as the batch store, with postings and gramsets
    ``__batch_id``-partitioned (a replayed batch overwrites exactly its
    own partitions) and the census FROZEN: written once from the first
    batch's grams (atomic swap), or reused from a ``write_jaccard_store``
    corpus build whose flat sub-tables convert to a ``seed`` partition on
    first contact. The census is a PRUNER, never a correctness input, so
    a first-batch census stays exact forever — it only prunes less as the
    vocabulary drifts, which is exactly what the mass telemetry watches:
    ``record_mass`` appends each batch's candidate mass per doc to the
    ``_jaccard_mass.json`` sidecar (baseline seeded from the store
    postings at first record), so ``jaccard_store_drift`` /
    ``maybe_compact_jaccard_store`` work unchanged on a streaming store.
    (A replayed batch can append a duplicate telemetry entry — telemetry,
    not data; the drift ratio reads only the LAST entry.)

    Same durability discipline as the other streaming dedup twins:
    ``__batch_id``-partitioned idempotent sinks, the id-anti-join replay
    heal (batch and store ids are contractually disjoint), gramsets land
    BEFORE postings so a mid-crash batch is un-indexed rather than
    candidate-without-verify-row, and the ``_jaccard_params`` sidecar is
    written-or-validated before any data so a restart with different
    (n, feature, threshold) raises instead of joining nothing. Compaction
    (``compact_jaccard_store``) preserves the ``__batch_id`` layout on a
    streaming store (re-censused postings keep their docs' origin batch
    attribution), so the stream continues across a compaction — pinned by
    ``tests/test_streaming.py``."""
    from ..operators.dedup import (
        _jaccard_gram_rows,
        _jaccard_pairs_core,
        _read_jaccard_params,
        _record_jaccard_batch_mass,
        ensure_jaccard_params_sidecar,
    )

    ns = _stream_store_namespace(checkpoint_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        import os

        from ..sources.writers import atomic_swap_write

        spark = batch_df.sparkSession
        batch = batch_df.select(id_col, text_col).persist()
        try:
            if batch.isEmpty():
                return
            ensure_jaccard_params_sidecar(
                store_path, n=n, feature=feature, threshold=threshold
            )
            params = _read_jaccard_params(store_path)
            pn, pfeature = int(params["n"]), params["feature"]
            bnum = int(params["threshold_num"])
            bden = int(params["threshold_den"])
            noop = lambda staging: None  # noqa: E731 — sidecars live at store root
            store_postings = _partitioned_store_or_convert(
                spark, os.path.join(store_path, "postings"), ns, checkpoint_dir, noop
            )
            store_sets = _partitioned_store_or_convert(
                spark, os.path.join(store_path, "gramsets"), ns, checkpoint_dir, noop
            )
            g_new = _jaccard_gram_rows(
                batch, text_col, id_col, pn, pfeature
            ).localCheckpoint(eager=True)
            # the census swap below targets the SUB-path, so heal it there
            # (the sidecar ensure only heals swaps at the store root)
            from ..sources.writers import recover_interrupted_swap

            recover_interrupted_swap(os.path.join(store_path, "census"))
            census = _read_store_or_none(spark, os.path.join(store_path, "census"))
            if census is None:
                # first batch: freeze ITS census (atomic swap — a replay
                # recomputes the identical frame, a crashed partial write
                # heals). Exactness never depends on which batch froze it.
                atomic_swap_write(
                    g_new.groupBy("g").agg(
                        F.count(F.lit(1)).cast("long").alias("df")
                    ),
                    os.path.join(store_path, "census"),
                )
                census = spark.read.parquet(os.path.join(store_path, "census"))
            if store_postings is not None:
                store_postings = _drop_replayed_batch_rows(
                    store_postings, batch, id_col
                ).select(id_col, "g", "sz", "rn")
            if store_sets is not None:
                store_sets = (
                    _drop_replayed_batch_rows(store_sets, batch, id_col)
                    .dropDuplicates([id_col])
                    .select(id_col, "gs", "n_grams")
                )
            verified, new_postings, new_sets = _jaccard_pairs_core(
                g_new,
                census,
                store_postings,
                store_sets,
                id_col=id_col,
                num=bnum,
                den=bden,
                bnum=bnum,
                bden=bden,
                include_batch_pairs=include_batch_pairs,
                materialize=True,
            )
            _overwrite_batch_partition(verified, pairs_path, ns, batch_id)
            # gramsets FIRST (the batch form's append-order discipline)
            _overwrite_batch_partition(
                new_sets, os.path.join(store_path, "gramsets"), ns, batch_id
            )
            _overwrite_batch_partition(
                new_postings, os.path.join(store_path, "postings"), ns, batch_id
            )
            if record_mass:
                _record_jaccard_batch_mass(
                    store_path,
                    new_postings,
                    store_postings
                    if store_postings is not None
                    else new_postings.limit(0),
                    new_sets,
                    include_batch_pairs,
                )
        finally:
            batch.unpersist()

    q = (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_ingest(
    stream_docs: DataFrame,
    landed_path: str,
    checkpoint_dir: str,
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
    audit_path: str | None = None,
    passage_store: str | None = None,
    passage_window: int = 10,
    passage_min_count: int = 2,
    decon_store: str | None = None,
    nb_store: str | None = None,
    nb_threshold_micros: int = 0,
    min_entropy_microbits: int | None = None,
    url_col: str | None = None,
    domain_blocklist=(),
    domain_allowlist=None,
    collapse_url_aliases: bool = False,
    strict_domain_gate: bool = False,
    url_keeper_store: str | None = None,
    url_updates_path: str | None = None,
    jaccard_store: str | None = None,
    jaccard_threshold: float = 0.6,
    jaccard_n: int = 3,
    jaccard_feature: str = "shingles",
) -> None:
    """Streaming twin of ``plans/ingest.run_incremental_ingest`` — the
    EXACTLY-ONCE landed corpus the batch runner's docstring defers to.
    Each micro-batch runs the shared tier body (exact → MinHash → SimHash
    vs the persisted stores; ``plans/ingest._run_tiers``) and writes every
    sink — the landed survivors (ALL batch columns), each store's
    survivor rows, and the per-batch audit row — through the idempotent
    ``__batch_id``-partitioned overwrite, so a replayed batch replaces its
    own partitions instead of double-landing documents (the duplication
    the batch runner's append-only ``survivors_path`` cannot avoid).
    Sidecars are written-or-validated before any data; replayed store rows
    are healed on read; a corrupt store read fails the batch and retries.

    Cluster-deployment posture: the pipeline composes with the round-5
    state knobs — call ``use_rocksdb_state_store(spark)`` before the first
    run to put any stateful stage's working state off-heap with
    incremental checkpointing (this pipeline's ``foreachBatch`` body is
    itself stateless, so the provider choice changes memory behavior, not
    results — parametrized e2e pytest runs the full ingest under BOTH
    providers), and pair the landed corpus with ``session_agg_native`` /
    ``stream_sessionize`` consumers for downstream stateful aggregation.
    The provider is read at query start and is checkpoint-sticky: set it
    before the first run, never flip it on an existing checkpoint.

    ``passage_store`` enables the passage-REWRITE tier (round-9, matching
    the batch/txn runners): survivors land with corpus-duplicated
    passages masked against the persisted window-count store, and the
    batch's (h, c) count rows land in their own ``__batch_id`` partition
    — the replay heal is the stream's native one (the count read excludes
    the current batch's partition, exactly as ``stream_passage_dedup``).

    ``decon_store`` (a flat eval-corpus ``passage_count_store``) folds
    benchmark decontamination into the same rewrite, exactly as in the
    batch/txn runners: eval windows mask unconditionally, the store is a
    READ-ONLY input shared across batches (never written, so it has no
    replay seam), and it must share ``passage_window``.

    ``nb_store`` / ``nb_threshold_micros`` enable the NB QUALITY GATE
    exactly as in the batch/txn runners (read-only flat ``write_nb_store``
    path; below-threshold and zero-token docs drop before any tier,
    NULL-id docs pass ungated; ``n_quality_dropped`` in the audit row).
    ``min_entropy_microbits`` enables the map-only char-entropy pre-gate
    before it (``n_entropy_dropped``), exactly as in the batch/txn
    runners. Deterministic replay requires the model store frozen while a
    batch may replay — retrain between drains, not during one.

    ``url_col`` / ``domain_blocklist`` / ``domain_allowlist`` /
    ``collapse_url_aliases`` enable the round-11 DOMAIN TIER exactly as in
    the batch/txn runners (``plans/ingest._domain_gate``): registered-
    domain gating plus in-batch canonical-URL alias collapse, before every
    other gate; ``n_domain_dropped`` / ``n_url_alias_dropped`` in the
    audit row. The gate is deterministic, so batch replays recompute
    identical survivors (freeze DataFrame block/allow lists while a batch
    may replay, same rule as the NB store).

    ``url_keeper_store`` + ``url_updates_path`` (round 13 — the keeper
    tier now reachable from ALL THREE composed runners) enable the
    canonical-URL keeper gate right after the domain tier, with
    ``stream_url_keeper``'s mechanics folded in: the batch classifies
    against the merged keeper view (own ``__batch_id`` partition
    excluded — the replay heal), same-content re-crawls and in-batch
    aliases drop into ``n_url_alias_dropped``, changed-content re-crawls
    land as CDC rows in their own ``__batch_id`` partition of
    ``url_updates_path`` (batch columns + the stable ``keeper_id``; a
    stream cannot rewrite other batches' landed partitions in place, so
    consumers apply them downstream — the standard CDC-stream contract;
    ``n_url_updates`` in the audit row), and the batch's keeper rows land
    LAST in the store partition, restricted to keepers that actually
    exist (new canonicals that survived the content tiers keep their
    rows; a tier-dropped doc keeps its URL un-tracked, same policy as the
    batch runner). Both paths must be given together, with ``url_col``.

    ``jaccard_store`` (round 14 — the tier now reachable from ALL THREE
    composed runners) enables the exact prefix-Jaccard tier after
    SimHash, with ``stream_jaccard_dedup``'s store mechanics folded in:
    the ``{postings,gramsets}`` sub-tables are ``__batch_id``-partitioned
    idempotent sinks (survivor rows only, gramsets landed before
    postings), the census freezes from the first batch's gated grams
    (atomic swap; a ``write_jaccard_store`` corpus seed converts on first
    contact), the tier runs at the store's build threshold, and the
    drift-mass sidecar records per batch. ``compact_jaccard_store``
    preserves the streaming layout, so the stream continues across a
    compaction. The audit row carries ``n_after_jaccard`` /
    ``jaccard_pairs``."""
    from ..operators.dedup import (
        _SIMHASH_ALGO,
        _write_params_sidecar,
        ensure_exact_params_sidecar,
        ensure_minhash_params_sidecar,
        ensure_simhash_params_sidecar,
        exact_fingerprint_store,
        minhash_signature_store,
        simhash_store_rows,
    )
    from ..operators.dedup import _EXACT_FP_ALGO
    from ..plans.ingest import _run_tiers, ingest_audit_row

    ns = _stream_store_namespace(checkpoint_dir)
    mh_on = minhash_store is not None
    sh_on = simhash_store is not None
    pg_on = passage_store is not None
    dc_on = decon_store is not None
    rw_on = pg_on or dc_on
    q_on = nb_store is not None
    e_on = min_entropy_microbits is not None
    d_on = url_col is not None
    uk_on = url_keeper_store is not None
    jc_on = jaccard_store is not None
    if uk_on and (url_col is None or url_updates_path is None):
        raise ValueError(
            "url_keeper_store requires url_col (the URL identity to key "
            "on) AND url_updates_path (a stream cannot rewrite landed "
            "partitions in place — CDC updates need their own sink)"
        )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        import os

        spark = batch_df.sparkSession
        batch = batch_df.persist()
        raw_persisted = batch  # the gate may rebind `batch`; unpersist THIS
        try:
            if audit_path is not None:
                # validate the audit layout BEFORE any sink commits (the
                # module's validate-before-any-data rule): a FLAT audit
                # table (batch-runner appends) must not gain __batch_id
                # partition dirs beside its plain files — and failing
                # after the corpus/store writes would wedge the stream
                # with uncommitted-but-visible batch rows (round-7 review)
                existing_audit = _read_store_or_none(spark, audit_path)
                if existing_audit is not None and "__batch_id" not in existing_audit.columns:
                    raise ValueError(
                        f"audit table at {audit_path} has the flat (batch-"
                        "runner) layout; use a separate audit path for the "
                        "stream, or migrate the table to the streaming layout"
                    )
                if existing_audit is not None:
                    # column-set drift check, mirroring the batch runner's
                    # validate_batch_audit_layout (round-9 review): without
                    # it an upgraded stream appends wider rows next to old
                    # partitions and plain reads nondeterministically drop
                    # the new columns depending on which file seeds schema
                    # inference
                    from ..plans.ingest import _AUDIT_COL_NAMES

                    have = set(existing_audit.columns) - {"__batch_id"}
                    if have != _AUDIT_COL_NAMES:
                        raise ValueError(
                            f"audit table at {audit_path} has columns "
                            f"{sorted(have)} but the current audit row has "
                            f"{sorted(_AUDIT_COL_NAMES)} — run plans.ingest."
                            "migrate_batch_audit_table(spark, audit_path) "
                            "(one-time rewrite) rather than mixing schemas"
                        )
            if batch.isEmpty():
                if audit_path is not None:
                    # same never-silent discipline as the batch runner: an
                    # empty ingest writes an all-zero audit row (through
                    # the idempotent batch partition), so audit consumers
                    # can tell an empty batch from a batch that never ran
                    from ..plans.ingest import IngestReport

                    zero = IngestReport(
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
                    _overwrite_batch_partition(
                        ingest_audit_row(spark, zero), audit_path, ns, batch_id
                    )
                return

            n_batch_raw = batch.count()

            def load(path, ensure, sidecar, params, cols):
                ensure()
                store = _partitioned_store_or_convert(
                    spark,
                    path,
                    ns,
                    checkpoint_dir,
                    lambda staging: _write_params_sidecar(
                        os.path.join(staging, sidecar), params
                    ),
                )
                if store is None:
                    return None
                return _drop_replayed_batch_rows(store, batch, id_col).select(*cols)

            ex = load(
                exact_store,
                lambda: ensure_exact_params_sidecar(exact_store),
                "_exact_params.json",
                {"algo": _EXACT_FP_ALGO},
                [id_col, "fp"],
            )
            mh = (
                load(
                    minhash_store,
                    lambda: ensure_minhash_params_sidecar(
                        minhash_store,
                        shingle_n=shingle_n,
                        num_hashes=num_hashes,
                        bands=bands,
                    ),
                    "_minhash_params.json",
                    {"shingle_n": shingle_n, "num_hashes": num_hashes, "bands": bands},
                    [id_col, "hs", "sig"],
                )
                if mh_on
                else None
            )
            sh = (
                load(
                    simhash_store,
                    lambda: ensure_simhash_params_sidecar(simhash_store),
                    "_simhash_params.json",
                    {"algo": _SIMHASH_ALGO, "n_bits": 64},
                    [id_col, "simhash64"],
                )
                if sh_on
                else None
            )
            # prefix-Jaccard store (round 14): sidecar at the store root,
            # the two row sub-tables batch-partitioned (a write_jaccard
            # _store corpus seed converts on first contact), rows healed
            # against the RAW batch; the frozen census resolves after the
            # gates (first batch freezes it from the GATED grams)
            jc_postings_store = jc_sets_store = None
            jc_num = jc_den = None
            if jc_on:
                from ..operators.dedup import (
                    _read_jaccard_params,
                    ensure_jaccard_params_sidecar,
                )

                ensure_jaccard_params_sidecar(
                    jaccard_store,
                    n=jaccard_n,
                    feature=jaccard_feature,
                    threshold=jaccard_threshold,
                )
                jc_params = _read_jaccard_params(jaccard_store)
                jc_num = int(jc_params["threshold_num"])
                jc_den = int(jc_params["threshold_den"])
                noop = lambda staging: None  # noqa: E731 — sidecar at root
                jc_postings_store = _partitioned_store_or_convert(
                    spark,
                    os.path.join(jaccard_store, "postings"),
                    ns,
                    checkpoint_dir,
                    noop,
                )
                jc_sets_store = _partitioned_store_or_convert(
                    spark,
                    os.path.join(jaccard_store, "gramsets"),
                    ns,
                    checkpoint_dir,
                    noop,
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
            pg_counts = None
            if pg_on:
                from ..operators.curation import (
                    _PASSAGE_PARAMS_ALGO,
                    ensure_passage_params_sidecar,
                )

                ensure_passage_params_sidecar(passage_store, window=passage_window)
                pg_store = _partitioned_store_or_convert(
                    spark,
                    passage_store,
                    ns,
                    checkpoint_dir,
                    lambda staging: _write_params_sidecar(
                        os.path.join(staging, "_passage_params.json"),
                        {"window": passage_window, "algo": _PASSAGE_PARAMS_ALGO},
                    ),
                )
                if pg_store is not None:
                    # replay heal: exclude this batch's own partition — it
                    # can only hold a crashed earlier attempt's counts
                    # (hash-keyed store; the id heal can't apply), exactly
                    # as stream_passage_dedup
                    pg_counts = (
                        pg_store.filter(
                            F.col("__batch_id") != F.lit(f"{ns}-{batch_id:06d}")
                        )
                        .groupBy("h")
                        .agg(F.sum("c").alias("c"))
                    )
            decon_h = None
            if dc_on:
                # read-only eval window store; sidecar-validated before any
                # sink commits (the validate-before-any-data rule)
                from ..operators.curation import read_passage_store

                decon_h = read_passage_store(
                    spark, decon_store, window=passage_window
                ).select("h")

            # quality gate AFTER every store validation (shared helper —
            # identical semantics and failure ordering across the
            # batch/txn/stream runners): a misconfigured sink fails the
            # batch before the scoring job spends compute. The heals above
            # joined against the RAW batch — a superset of any prior
            # attempt's gated appends, so they heal the same rows.
            n_domain_dropped = 0 if d_on else None
            n_url_alias_dropped = 0 if d_on and collapse_url_aliases else None
            if d_on:
                from ..plans.ingest import _domain_gate

                batch, n_domain_dropped, n_url_alias_dropped = _domain_gate(
                    batch, url_col, domain_blocklist, domain_allowlist,
                    collapse_url_aliases, id_col, n_batch_raw,
                    strict=strict_domain_gate,
                )
                if not collapse_url_aliases:
                    n_url_alias_dropped = None
            # canonical-URL keeper gate (round 13): the same tier position
            # as the batch/txn runners, with stream_url_keeper's replay
            # mechanics — gate against the merged view excluding this
            # batch's own partition, CDC updates to their own sink, keeper
            # rows landed LAST below
            n_url_updates = 0 if uk_on else None
            uk_updates = uk_append = uk_batch_ids = None
            if uk_on:
                from ..operators.domains import (
                    _URL_KEEPER_ALGO,
                    ensure_url_keeper_sidecar,
                    read_or_seed_url_keeper,
                    url_keeper_gate,
                )

                ensure_url_keeper_sidecar(url_keeper_store)
                _partitioned_store_or_convert(
                    spark,
                    url_keeper_store,
                    ns,
                    checkpoint_dir,
                    lambda staging: _write_params_sidecar(
                        os.path.join(staging, "_url_keeper_params.json"),
                        {"algo": _URL_KEEPER_ALGO},
                    ),
                )
                uk_existing, uk_seq = read_or_seed_url_keeper(
                    spark,
                    url_keeper_store,
                    exclude_batch_partition=f"{ns}-{batch_id:06d}",
                    allow_streaming_layout=True,
                )
                batch, uk_updates, uk_append, n_uk_dropped = url_keeper_gate(
                    batch, uk_existing, url_col, id_col, text_col,
                    batch_seq=uk_seq,
                )
                batch = batch.localCheckpoint(eager=True)
                uk_updates = uk_updates.localCheckpoint(eager=True)
                uk_append = uk_append.localCheckpoint(eager=True)
                uk_batch_ids = (
                    batch.select(F.col(id_col).alias("keeper_id"))
                    .distinct()
                    .localCheckpoint(eager=True)
                )
                n_url_updates = uk_updates.count()
                n_url_alias_dropped = (n_url_alias_dropped or 0) + n_uk_dropped
            n_remaining = (
                n_batch_raw
                - (n_domain_dropped or 0)
                - (n_url_alias_dropped or 0)
                - (n_url_updates or 0)
            )
            n_entropy_dropped = 0 if e_on else None
            if e_on:
                from ..plans.ingest import _entropy_gate

                batch, n_entropy_dropped = _entropy_gate(
                    batch, min_entropy_microbits, text_col, n_remaining
                )
            n_quality_dropped = 0 if q_on else None
            if q_on:
                from ..plans.ingest import _quality_gate

                batch, n_quality_dropped = _quality_gate(
                    batch, nb_store, nb_threshold_micros, text_col, id_col,
                    n_remaining - (n_entropy_dropped or 0),
                )

            jc_census = None
            if jc_on:
                from ..operators.dedup import _jaccard_gram_rows
                from ..sources.writers import (
                    atomic_swap_write,
                    recover_interrupted_swap,
                )

                # the census swap targets the SUB-path, so heal it there
                # (the sidecar ensure only heals swaps at the store root)
                recover_interrupted_swap(os.path.join(jaccard_store, "census"))
                jc_census = _read_store_or_none(
                    spark, os.path.join(jaccard_store, "census")
                )
                if jc_census is None:
                    # first batch: freeze ITS gated grams' census (atomic
                    # swap — a replay recomputes the identical frame);
                    # exactness never depends on which batch froze it
                    atomic_swap_write(
                        _jaccard_gram_rows(
                            batch, text_col, id_col, jaccard_n, jaccard_feature
                        )
                        .groupBy("g")
                        .agg(F.count(F.lit(1)).cast("long").alias("df")),
                        os.path.join(jaccard_store, "census"),
                    )
                    jc_census = spark.read.parquet(
                        os.path.join(jaccard_store, "census")
                    )

            survivors, report, jc_art = _run_tiers(
                batch,
                ex,
                mh,
                sh,
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
                n_batch=n_batch_raw,
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
            if rw_on:
                from dataclasses import replace

                from ..plans.ingest import _passage_stage

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
                if pg_on:
                    _overwrite_batch_partition(
                        pg_wins.groupBy("h").agg(F.count(F.lit(1)).alias("c")),
                        passage_store,
                        ns,
                        batch_id,
                    )
            _overwrite_batch_partition(land_df, landed_path, ns, batch_id)
            _overwrite_batch_partition(
                exact_fingerprint_store(survivors, text_col, id_col),
                exact_store,
                ns,
                batch_id,
            )
            if mh_on:
                _overwrite_batch_partition(
                    minhash_signature_store(
                        survivors, text_col, id_col, shingle_n, num_hashes, bands
                    ),
                    minhash_store,
                    ns,
                    batch_id,
                )
            if sh_on:
                _overwrite_batch_partition(
                    simhash_store_rows(survivors, text_col, id_col),
                    simhash_store,
                    ns,
                    batch_id,
                )
            if jc_on:
                from ..operators.dedup import _record_jaccard_batch_mass

                jc_postings_new, jc_sets_new = jc_art
                surv_ids = survivors.select(id_col).distinct()
                # survivor rows only, gramsets landed before postings —
                # the partition overwrite is the replay heal, so no id
                # guard is needed (a replayed batch replaces its own
                # partitions with identical rows)
                _overwrite_batch_partition(
                    jc_sets_new.join(surv_ids, id_col, "left_semi"),
                    os.path.join(jaccard_store, "gramsets"),
                    ns,
                    batch_id,
                )
                _overwrite_batch_partition(
                    jc_postings_new.join(surv_ids, id_col, "left_semi"),
                    os.path.join(jaccard_store, "postings"),
                    ns,
                    batch_id,
                )
                _record_jaccard_batch_mass(
                    jaccard_store,
                    jc_postings_new,
                    jc_postings_store
                    if jc_postings_store is not None
                    else jc_postings_new.limit(0),
                    jc_sets_new,
                    True,
                )
            if uk_on:
                _overwrite_batch_partition(
                    uk_updates, url_updates_path, ns, batch_id
                )
                # keeper rows restricted to keepers that EXIST: a new
                # canonical's keeper row lands only if its doc survived
                # the content tiers (batch-side semi-join against the
                # landed frame); changed-content rows keep the existing
                # (already-landed) keeper_id and pass through. Landed
                # LAST — the commit point, as in every keeper runner.
                land_ids = (
                    land_df.select(F.col(id_col).alias("keeper_id")).distinct()
                )
                uk_rows = (
                    uk_append.join(uk_batch_ids, "keeper_id", "left_semi")
                    .join(land_ids, "keeper_id", "left_semi")
                    .unionByName(
                        uk_append.join(uk_batch_ids, "keeper_id", "left_anti")
                    )
                )
                _overwrite_batch_partition(
                    uk_rows, url_keeper_store, ns, batch_id
                )
            if audit_path is not None:
                # layout already validated at the top of process(), before
                # any sink committed
                _overwrite_batch_partition(
                    ingest_audit_row(spark, report), audit_path, ns, batch_id
                )
        finally:
            raw_persisted.unpersist()

    q = (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_semantic_dedup(
    stream_vectors: DataFrame,
    store_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    max_cluster_size: int | None = None,
) -> None:
    """Streaming SEMANTIC near-dup detection over an embedding ingest
    stream — the streaming twin of ``operators/curation.
    semantic_dedup_incremental`` (as ``stream_near_dedup`` is for MinHash
    and ``stream_winnow_dedup`` for winnowing, completing the streaming
    dedup family). Each micro-batch assigns ONLY its own vectors to the
    frozen ``centroids``, emits in-cluster cosine pairs
    (id_a, id_b, cosine_sim) touching the batch — against the persisted
    store AND batch-internal — to ``pairs_path``, and appends its own
    (id, embedding, list_id) rows to the store. Per-batch cost ∝ |batch| x
    touched-cluster sizes, never store²; the store read prunes to the
    touched clusters' partitions (``list_id`` nests under ``__batch_id``
    in the sink layout).

    Same durability discipline as the other streaming dedups: idempotent
    per-checkpoint-namespaced ``__batch_id`` sinks, explicit first-batch
    detection (real store-read failures propagate and retry), batch-seeded
    ``list_id``-partitioned stores converted once to the streaming layout,
    and the ``_semantic_params`` centroid sidecar written-or-validated
    before any data so a restart with retrained centroids raises instead
    of mixing cluster geometries."""
    from ..operators.curation import (
        _write_semantic_sidecar,
        ensure_semantic_params_sidecar,
        semantic_dedup_pairs_incremental,
        semantic_store_rows,
    )

    ns = _stream_store_namespace(checkpoint_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.select(id_col, "embedding").persist()
        try:
            if batch.isEmpty():
                return
            ensure_semantic_params_sidecar(store_path, centroids=centroids)
            store = _partitioned_store_or_convert(
                spark,
                store_path,
                ns,
                checkpoint_dir,
                lambda staging: _write_semantic_sidecar(staging, centroids),
                extra_partition_cols=("list_id",),
            )
            # assign the batch ONCE (round-6 review: these rows feed the
            # touched-cluster collect, the pair job, AND the store write —
            # without the materialization each consumer re-runs the matmul)
            rows = semantic_store_rows(batch, centroids, id_col=id_col).localCheckpoint(
                eager=True
            )
            if store is None:
                base = rows.limit(0).select("id", "embedding", "list_id")
            else:
                base = store.join(
                    batch.select(F.col(id_col).alias("id")).distinct(), "id", "left_anti"
                ).select("id", "embedding", "list_id")
            pairs = semantic_dedup_pairs_incremental(
                batch,
                base,
                centroids,
                threshold=threshold,
                id_col=id_col,
                max_cluster_size=max_cluster_size,
                new_assigned=rows,
            )
            _overwrite_batch_partition(pairs, pairs_path, ns, batch_id)
            _overwrite_batch_partition(
                rows, store_path, ns, batch_id, extra_partition_cols=("list_id",)
            )
        finally:
            batch.unpersist()

    q = (
        stream_vectors.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_scd2_apply(
    stream_df: DataFrame,
    dim_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    state_cols: list[str],
    ts_col: str = "ts",
    tiebreak_cols: tuple = (),
) -> None:
    """Streaming twin of ``operators/temporal.scd2_apply`` (round 8): a CDC
    observation stream continuously maintains a type-2 dimension at
    ``dim_path``. The first micro-batch builds the dimension with
    ``scd2_history``; every later batch runs the incremental apply — close
    changed keys' current versions, open new ones, pass closed history and
    untouched keys through — so per-batch cost ∝ batch + touched keys,
    never the accumulated dimension (the whole point of the batch
    operator, kept live here).

    Exactly-once: the dimension is a single keyed artifact, not an
    append log, so the ``__batch_id``-partition idempotent-sink pattern of
    the dedup twins does not apply. Instead every swap embeds the writing
    (namespace, batch_id) as constant metadata columns, and a REPLAYED
    batch (same checkpoint namespace, batch_id <= stored) is skipped
    before any work — the one-atomic-artifact equivalent of a
    transactional sink's txn-id check. A crash before the swap leaves the
    old dimension intact and the replay applies cleanly; a crash DURING
    the swap's rename window is healed by ``recover_interrupted_swap``
    at the next batch. Batches must respect the ordered-feed contract of
    ``scd2_apply`` (each key's new observations at-or-after its prior
    ones — micro-batch order gives this for any time-ordered CDC feed).
    Checkpoint and dimension belong TOGETHER (the standard Structured
    Streaming sink contract): starting a FRESH checkpoint against an
    already-maintained dimension re-delivers the whole source, whose
    early observations now predate the dimension's current versions —
    the apply-side validation rejects that loudly (pytest-pinned) instead
    of silently rewriting history; pair a fresh checkpoint with a fresh
    ``dim_path``."""
    from ..operators.temporal import scd2_apply, scd2_history
    from ..sources.writers import atomic_swap_write, recover_interrupted_swap

    ns = _stream_store_namespace(checkpoint_dir)
    meta = ("__scd2_ns", "__scd2_batch_id")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.persist()
        try:
            if batch.isEmpty():
                return
            recover_interrupted_swap(dim_path)
            dim = _read_store_or_none(spark, dim_path)
            if dim is not None and set(meta) <= set(dim.columns):
                head = dim.select(*meta).limit(1).collect()
                if head and head[0][0] == ns and head[0][1] >= batch_id:
                    return  # replay of an already-swapped batch
                dim = dim.drop(*meta)
            if dim is None:
                out = scd2_history(batch, key_cols, state_cols, ts_col, tiebreak_cols)
            else:
                out = scd2_apply(dim, batch, key_cols, state_cols, ts_col, tiebreak_cols)
            atomic_swap_write(
                out.withColumn(meta[0], F.lit(ns)).withColumn(meta[1], F.lit(batch_id)),
                dim_path,
            )
        finally:
            batch.unpersist()

    q = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _stream_store_namespace(checkpoint_dir: str) -> str:
    """Stable per-CHECKPOINT token namespacing the ``__batch_id`` partition
    values of foreachBatch store/pairs sinks (round-5 advice, medium):
    micro-batch numbering restarts at 0 whenever a stream is started with a
    NEW checkpoint, and an un-namespaced dynamic overwrite of
    ``__batch_id=0`` would silently replace a PREVIOUS run's partition —
    deleting store rows for unrelated documents. The token is persisted in
    a sidecar file NEXT TO the checkpoint dir, so:

    - restart from the SAME checkpoint → same token → a replayed batch
      still overwrites exactly its own partition (idempotent), and
    - a NEW checkpoint → fresh token → its batch 0 lands in a new
      partition; earlier runs' rows are never touched.

    The token lives INSIDE the checkpoint dir (round-6 review): its
    lifetime must equal the checkpoint's. A sibling file would decouple
    them — ``rm -rf`` of the checkpoint to reprocess would leave the stale
    token behind and the restarted batch 0 would overwrite the earlier
    run's partitions again; conversely a lost sibling while the checkpoint
    survives would re-token a replay into duplicates. Spark's checkpoint
    layout reads only its known entries (offsets/commits/metadata/state),
    so the extra file is inert. Local-filesystem file ops, matching the
    params-sidecar discipline of ``operators/dedup.py``; on an object
    store, route the store through a table format instead (see
    ``sources/manifest.py``)."""
    import os
    import uuid

    marker = os.path.join(os.path.abspath(checkpoint_dir), "__store_ns")
    if os.path.exists(marker):
        with open(marker, encoding="utf-8") as f:
            return f.read().strip()
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    tmp = f"{marker}.tmp-{uuid.uuid4().hex}"
    token = uuid.uuid4().hex[:12]
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(token)
    try:
        os.link(tmp, marker)  # atomic no-clobber publish
    except FileExistsError:
        with open(marker, encoding="utf-8") as f:
            token = f.read().strip()
    finally:
        os.unlink(tmp)
    return token


def _partitioned_store_or_convert(
    spark: SparkSession,
    store_path: str,
    ns: str,
    checkpoint_dir: str,
    finalize_staging,
    extra_partition_cols: tuple[str, ...] = (),
) -> DataFrame | None:
    """Read a streaming store, converting non-current layouts first; each
    conversion is a one-time atomic rewrite (sidecar re-created in staging
    via ``finalize_staging``):

    - **flat batch-seeded store** (round-5 advice, medium): ``write_*_store``
      writes unpartitioned parquet, and a ``__batch_id``-partitioned
      streaming append on top would create a mixed flat/partitioned
      directory Spark cannot read consistently → rewritten under a single
      ``__batch_id='seed'`` partition.
    - **legacy pre-namespace store** (round-6 review): integer-valued
      ``__batch_id`` partitions written before per-checkpoint namespacing.
      Left in place, a replayed in-flight batch N would write
      ``{ns}-N`` while its partial ``__batch_id=N`` partition survives —
      permanent duplicate store rows. If the driving checkpoint has
      committed batches (the same logical stream continuing across the
      upgrade), legacy ids map into THIS run's namespace so the replay's
      dynamic overwrite targets exactly its own partition again; a fresh
      checkpoint adopting an old store maps them into the inert
      ``legacy-`` namespace instead (preserved, never collided with)."""
    import os

    from ..sources.writers import atomic_swap_write, recover_interrupted_swap

    # heal a hard crash landed between atomic_swap_write's two renames
    # BEFORE probing: in that window the store path is missing and the
    # probe would legitimately return None — the next batch would then
    # take the first-batch path against a populated-but-sidelined store
    # (silently dropping every cross-batch pair) and the overwrite would
    # strand the prior corpus in the .backup dir permanently (round-7
    # review: writers.recover_interrupted_swap existed for exactly this
    # but only tests invoked it).
    recover_interrupted_swap(store_path)
    store = _read_store_or_none(spark, store_path)
    if store is None:
        return None
    if "__batch_id" not in store.columns:
        converted = store.withColumn("__batch_id", F.lit("seed"))
    elif dict(store.dtypes)["__batch_id"] != "string":
        commits = os.path.join(checkpoint_dir, "commits")
        continuing = os.path.isdir(commits) and any(
            not e.startswith(".") for e in os.listdir(commits)
        )
        prefix = ns if continuing else "legacy"
        # format_string, not lpad: lpad TRUNCATES ids past 6 digits
        converted = store.withColumn(
            "__batch_id", F.format_string(f"{prefix}-%06d", F.col("__batch_id"))
        )
    else:
        return store
    atomic_swap_write(
        converted,
        store_path,
        partition_by=["__batch_id", *extra_partition_cols],
        finalize_staging=finalize_staging,
    )
    return spark.read.parquet(store_path)


def _read_store_or_none(spark: SparkSession, path: str):
    """Alias of the canonical absent-store probe (round-7 consolidation —
    the condition list lives in ONE place now): ``None`` only for the
    legitimate first-batch states; any failure on an existing store
    propagates so ``foreachBatch`` retries instead of silently treating a
    populated store as empty (which would drop all cross-batch pairs)."""
    from ..sources.readers import read_parquet_or_none

    return read_parquet_or_none(spark, path)


def _drop_replayed_batch_rows(store: DataFrame, batch: DataFrame, id_col: str) -> DataFrame:
    """foreachBatch replay idempotence (round-5 review finding): a batch
    that crashed after writing its store partition but before the
    checkpoint commit is re-run — without this exclusion it would read its
    OWN rows back from the store and double/triple-count in-batch pairs
    (winnow containment > 1.0). Batch and store ids are contractually
    disjoint (the incremental-dedup precondition), so any store row whose
    id is in the current batch can only be the replay's own partial write —
    dropping them makes the recompute identical to the first attempt, and
    the partition overwrite then rewrites the same bytes. (Excluding by
    ``__batch_id`` instead would misfire when a NEW checkpoint restarts
    batch numbering against an existing store.)"""
    return store.join(batch.select(id_col).distinct(), id_col, "left_anti")


def _overwrite_batch_partition(
    df: DataFrame,
    path: str,
    ns: str,
    batch_id: int,
    extra_partition_cols: tuple[str, ...] = (),
) -> None:
    """Idempotent micro-batch sink: write under a __batch_id partition and
    dynamically overwrite ONLY it, so a replayed foreachBatch invocation
    replaces its earlier (possibly partial) output instead of duplicating.
    The partition value is namespaced by the per-checkpoint token
    (``_stream_store_namespace``) so a NEW checkpoint's restarted batch
    numbering can never overwrite a previous run's partitions.
    ``extra_partition_cols`` nest additional partition levels UNDER the
    batch id (e.g. the semantic store's ``list_id``, so probed-cluster
    partition pruning survives streaming ingestion) — the dynamic
    overwrite still replaces only this batch's own subtree."""
    (
        df.withColumn("__batch_id", F.lit(f"{ns}-{batch_id:06d}"))
        .write.option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .partitionBy("__batch_id", *extra_partition_cols)
        .parquet(path)
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_STATE_STORE_KEY = "spark.sql.streaming.stateStore.providerClass"


def use_rocksdb_state_store(spark: SparkSession, enabled: bool = True) -> None:
    """Conf-gate the RocksDB state store for stateful streaming queries.

    The default (HDFS-backed in-memory provider) keeps every key's state on
    the executor heap — fine at test scale, but a cluster-scale
    sessionization (hundreds of millions of open sessions) needs state that
    spills: RocksDB keeps working state off-heap/on-disk with incremental
    checkpointing. Results are provider-independent (pinned by
    ``tests/test_streaming.py``); only memory behavior changes. The provider
    is read at QUERY START and is checkpoint-sticky — set it before the
    first run of a query, and don't flip it on an existing checkpoint.
    ``enabled=False`` restores Spark's default provider.
    """
    if enabled:
        spark.conf.set(_STATE_STORE_KEY, ROCKSDB_PROVIDER)
    else:
        spark.conf.unset(_STATE_STORE_KEY)


def run_available_now(
    stream_df: DataFrame,
    checkpoint_dir: str,
    query_name: str = "stream_test",
    output_mode: str = "append",
) -> DataFrame:
    """Drain all currently-available input (Trigger.AvailableNow) into an
    in-memory sink and return the result as a DataFrame."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)
