"""TF-IDF index lifecycle at the 1M-doc tier (SCALING.md evidence; the
round-9 numbers re-measured after round 10 made the append's disjointness
check ∝ landed DOCS — a schema-pinned, column-pruned norms read — instead
of scanning every landed posting id).

Corpus: the documents-only distinct-replica scaling from
``bench_incremental_scale.scale_docs`` (bijective token remap per replica,
so document frequencies stay flat as the corpus grows). Batch: 5k docs in
their own token/id namespace. Searches run WARM (second run timed) —
the first run pays one-time reader setup.

Usage: python tools/bench_tfidf_lifecycle.py [--factor 200]
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

from bench_incremental_scale import BATCH_ID_BASE, SCRATCH, SRC_DOCS, scale_docs  # noqa: E402
from etl_data_transformer_spark.operators.similarity import (  # noqa: E402
    append_tfidf_index,
    build_tfidf_index,
    sparse_topk_search,
)
from etl_data_transformer_spark.session import get_spark  # noqa: E402


def main() -> None:
    factor = 200
    argv = sys.argv[1:]
    if "--factor" in argv:
        factor = int(argv[argv.index("--factor") + 1])
    spark = get_spark("bench_tfidf_lifecycle")

    corpus_dir = f"{SCRATCH}/docs_x{factor}"
    if not os.path.isdir(corpus_dir):
        print(f"# generating {factor}x docs corpus -> {corpus_dir}", file=sys.stderr)
        scale_docs(spark, factor, corpus_dir)
    corpus = spark.read.parquet(corpus_dir)
    n_corpus = corpus.count()

    idx = f"{SCRATCH}/tfidf_x{factor}"
    t0 = time.time()
    build_tfidf_index(corpus, idx, max_df=10_000)
    build_s = round(time.time() - t0, 2)

    batch = (
        spark.read.parquet(SRC_DOCS)
        .withColumn("doc_id", F.col("doc_id") + F.lit(BATCH_ID_BASE))
        .withColumn("text", F.regexp_replace("text", r"(\S+)", r"$1bq"))
        .localCheckpoint(eager=True)
    )
    n_batch = batch.count()
    t0 = time.time()
    append_tfidf_index(batch, idx)
    append_s = round(time.time() - t0, 2)

    queries = spark.read.parquet(SRC_DOCS).limit(100).localCheckpoint(eager=True)
    search = {}
    for scheme in ("cosine", "bm25"):
        sparse_topk_search(queries, spark, idx, k=5, scheme=scheme).count()  # warm
        t0 = time.time()
        sparse_topk_search(queries, spark, idx, k=5, scheme=scheme).count()
        search[scheme] = round(time.time() - t0, 2)

    print(
        json.dumps(
            {
                "corpus_rows": n_corpus,
                "batch_rows": n_batch,
                "build_s": build_s,
                "append_s": append_s,
                "search_100q_s": search,
            }
        )
    )


if __name__ == "__main__":
    main()
