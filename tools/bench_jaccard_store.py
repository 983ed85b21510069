"""Scaling evidence for the incremental prefix-Jaccard store (round 11):
build the store at sf0.1 (~5k docs) and at the 10x sf1 fixture (~50k
docs), then run the SAME batch against both — the 100 TB claim is that
batch cost tracks the batch's candidate mass, not the store size (the
store side joins persisted postings; the corpus is never re-shingled).

Usage: python tools/bench_jaccard_store.py
Writes timings to stdout; summarize in SCALING.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO_ROOT = os.environ.get(
    "SPARK_GRAFT_REPO_ROOT",
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
)
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from etl_data_transformer_spark.operators.dedup import (  # noqa: E402
    jaccard_join_incremental,
    jaccard_store_drift,
    maybe_compact_jaccard_store,
    write_jaccard_store,
)
from etl_data_transformer_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1/documents.parquet"
SF1 = os.path.join(REPO_ROOT, ".scratch/sf1_distinct/documents.parquet")
SCRATCH = os.path.join(REPO_ROOT, ".scratch/jaccard_store_bench")


def main() -> None:
    spark = get_spark("jaccard-store-bench")
    shutil.rmtree(SCRATCH, ignore_errors=True)
    batch = (
        spark.read.parquet(SF01)
        .limit(500)
        .select((F.col("doc_id") + 100_000_000).alias("doc_id"), "text")
        .localCheckpoint(eager=True)
    )
    for tier, src in (("sf0.1", SF01), ("sf1", SF1)):
        corpus = spark.read.parquet(src)
        n = corpus.count()
        store = os.path.join(SCRATCH, tier)
        t0 = time.time()
        write_jaccard_store(corpus, store, threshold=0.6)
        t_build = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            pairs = jaccard_join_incremental(batch, store, append=False).count()
            times.append(round(time.time() - t0, 2))
        print(
            f"{tier}: corpus={n} build={t_build:.1f}s "
            f"batch(500 docs)x3={times} pairs={pairs}"
        )

    # ---- drifted case (round 12): a vocabulary-shifted batch stream
    # against the sf0.1 store — the frozen census keeps the unseen-hot
    # grams in prefixes, so batch wall-clock and candidate mass climb;
    # the drift heuristic detects it and compact-on-drift restores both.
    store = os.path.join(SCRATCH, "sf0.1")
    shifted_base = (
        spark.read.parquet(SF01)
        .limit(400)
        .select(
            (F.col("doc_id") + 200_000_000).alias("doc_id"),
            F.concat(
                F.lit("breaking news update today exclusive report "), F.col("text")
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    for b in range(3):
        batch = shifted_base.select(
            (F.col("doc_id") + b * 1_000_000).alias("doc_id"), "text"
        )
        t0 = time.time()
        n_pairs = jaccard_join_incremental(batch, store).count()
        d = jaccard_store_drift(store)
        print(
            f"drift batch {b}: {time.time() - t0:.2f}s pairs={n_pairs} "
            f"cand/doc={d['last_cand_per_doc']} ratio={d['ratio']} "
            f"recommend={d['recommend_compact']}"
        )
    t0 = time.time()
    compacted = maybe_compact_jaccard_store(spark, store, factor=4.0)
    print(f"maybe_compact: ran={compacted} in {time.time() - t0:.1f}s")
    probe = shifted_base.select(
        (F.col("doc_id") + 9_000_000).alias("doc_id"), "text"
    )
    t0 = time.time()
    n_pairs = jaccard_join_incremental(probe, store).count()
    d = jaccard_store_drift(store)
    print(
        f"post-compact probe: {time.time() - t0:.2f}s pairs={n_pairs} "
        f"cand/doc={d['last_cand_per_doc']}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
