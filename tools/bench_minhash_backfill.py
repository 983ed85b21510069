"""Bucketed-vs-flat MinHash store at a BACKFILL batch size (round-9
verdict item 8): the round-9 table measured the daily 5k batch and a 100k
batch; the bucketed layout's claimed win (the deleted store-side shuffle)
grows with batch size, because only a batch big enough to leave broadcast
territory forces the store through an exchange at all. This measures a
500k-doc backfill (2M signature rows) against the 1M-doc store (4M rows)
for both layouts, asserting identical pair outputs.

Usage: python tools/bench_minhash_backfill.py [--batch-docs 500000]
Prints one JSON line; paste the table into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.environ.get(
    "SPARK_GRAFT_REPO_ROOT",
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
)
sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))

from pyspark.sql import functions as F  # noqa: E402

from bench_incremental_scale import BATCH_ID_BASE, MH, SCRATCH, SRC_DOCS, scale_docs  # noqa: E402
from etl_data_transformer_spark.operators import dedup as DD  # noqa: E402
from etl_data_transformer_spark.session import get_spark  # noqa: E402


def main() -> None:
    batch_docs = 500_000
    argv = sys.argv[1:]
    if "--batch-docs" in argv:
        batch_docs = int(argv[argv.index("--batch-docs") + 1])
    spark = get_spark("bench_minhash_backfill")

    corpus_dir = f"{SCRATCH}/docs_x200"
    if not os.path.isdir(corpus_dir):
        print(f"# generating 200x docs corpus -> {corpus_dir}", file=sys.stderr)
        scale_docs(spark, 200, corpus_dir)
    corpus = spark.read.parquet(corpus_dir)

    # backfill batch: N× the 5k fixture, each replica in its own token
    # namespace ("bq<i>") with ids above every corpus id
    src = spark.read.parquet(SRC_DOCS)
    stride = src.agg(F.max("doc_id")).collect()[0][0] + 1
    factor = max(1, batch_docs // 5000)
    reps = []
    for i in range(factor):
        reps.append(
            src.withColumn("doc_id", F.col("doc_id") + F.lit(BATCH_ID_BASE + i * stride))
            .withColumn("text", F.regexp_replace("text", r"(\S+)", rf"$1bq{i}"))
        )
    batch = reps[0]
    for r in reps[1:]:
        batch = batch.unionByName(r)
    bpath = f"{SCRATCH}/mh_backfill_batch"
    batch.repartition(32).write.mode("overwrite").parquet(bpath)
    batch = spark.read.parquet(bpath)
    n_batch = batch.count()

    res: dict = {"corpus_rows": corpus.count(), "batch_rows": n_batch}
    sig = DD.minhash_signature_store(
        corpus, "text", "doc_id", MH["shingle_n"], MH["num_hashes"], MH["bands"]
    )
    pair_counts = {}
    for label, bucketed in (("flat", False), ("bucketed", True)):
        store_path = f"{SCRATCH}/mh_store_{label}"
        if not os.path.isdir(store_path):
            t0 = time.time()
            DD.write_minhash_store(
                sig, store_path, mode="overwrite", bucket_by_band=bucketed, **MH
            )
            res[f"{label}_build_s"] = round(time.time() - t0, 2)
        store = DD.read_minhash_store(spark, store_path, **MH)
        walls = []
        for _ in range(3):
            t0 = time.time()
            n_pairs = DD.minhash_dedup_incremental(
                batch, store, threshold=0.8, **MH
            ).count()
            walls.append(round(time.time() - t0, 2))
        pair_counts[label] = n_pairs
        res[label] = {"walls_s": walls, "min_s": min(walls), "pairs": n_pairs}
    assert pair_counts["flat"] == pair_counts["bucketed"], pair_counts
    print(json.dumps(res))


if __name__ == "__main__":
    main()
