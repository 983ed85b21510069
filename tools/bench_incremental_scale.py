"""Incremental-store scaling evidence (round-7 verdict item 5): wall-clock
of the three ``*_incremental`` dedup operators with a FIXED 5k-document
batch against persisted stores built from corpora of 50k / 200k / 1M
documents.

The claim under test is the incremental family's core design point: a
batch costs its own shingling/hashing plus a narrow join against the
store's signature rows — the landed corpus text is NEVER re-read, so
growing the corpus 20x should grow batch wall-clock far less than 20x
(the join side is (id, sig) rows, bytes per landed doc).

Corpora are documents-only scaled fixtures (same bijective token remap as
``scale_fixtures.py --distinct``, so no shingle collides across replicas);
the batch replica uses its own token namespace ("bq" suffix) and ids
shifted above every corpus id. Store builds are timed too, as context —
they are the one-off cost the incremental path amortizes away.

Usage: python tools/bench_incremental_scale.py [--tiers 10,40,200]
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

from pyspark.sql import functions as F  # noqa: E402

from etl_data_transformer_spark.session import get_spark  # noqa: E402

SRC_DOCS = "/root/testdata/sf0.1/documents.parquet"  # 5k docs
SCRATCH = os.path.join(REPO_ROOT, ".scratch")
BATCH_ID_BASE = 10**9  # above every scaled corpus id

MH = dict(shingle_n=3, num_hashes=12, bands=4)
SH_MAX_HAMMING = 3  # the production threshold (SCALING.md guidance)


def scale_docs(spark, factor: int, out: str) -> None:
    """Documents-only N× distinct replica (same remap as scale_fixtures)."""
    df = spark.read.parquet(SRC_DOCS)
    stride = df.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = []
    for i in range(factor):
        r = df.withColumn("doc_id", F.col("doc_id") + F.lit(i * stride))
        if i > 0:
            r = r.withColumn("text", F.regexp_replace("text", r"(\S+)", rf"$1r{i}"))
        reps.append(r)
    scaled = reps[0]
    for r in reps[1:]:
        scaled = scaled.unionByName(r)
    scaled.repartition(32).write.mode("overwrite").parquet(out)


def build_stores(spark, corpus_dir: str, store_root: str) -> float:
    """Persist exact + minhash + simhash stores for a corpus; returns the
    build wall (context: the one-off cost the incremental path amortizes)."""
    from etl_data_transformer_spark.operators import dedup as DD

    corpus = spark.read.parquet(corpus_dir)
    t0 = time.time()
    DD.write_exact_store(
        DD.exact_fingerprint_store(corpus), f"{store_root}/exact", mode="overwrite"
    )
    DD.write_minhash_store(
        DD.minhash_signature_store(
            corpus, "text", "doc_id", MH["shingle_n"], MH["num_hashes"], MH["bands"]
        ),
        f"{store_root}/minhash",
        mode="overwrite",
        **MH,
    )
    DD.write_simhash_store(
        DD.simhash_store_rows(corpus, "text", "doc_id"),
        f"{store_root}/simhash",
        mode="overwrite",
    )
    return time.time() - t0


def main() -> None:
    tiers = [10, 40, 200]
    argv = sys.argv[1:]
    if "--tiers" in argv:
        tiers = [int(x) for x in argv[argv.index("--tiers") + 1].split(",")]
    spark = get_spark("bench_incremental_scale")
    from etl_data_transformer_spark.operators import dedup as DD

    # the fixed batch: 5k docs in their own token/id namespace
    batch = (
        spark.read.parquet(SRC_DOCS)
        .withColumn("doc_id", F.col("doc_id") + F.lit(BATCH_ID_BASE))
        .withColumn("text", F.regexp_replace("text", r"(\S+)", r"$1bq"))
        .localCheckpoint(eager=True)
    )
    n_batch = batch.count()

    out: dict[str, dict] = {}
    for f in tiers:
        corpus_dir = f"{SCRATCH}/docs_x{f}"
        store_root = f"{SCRATCH}/incstore_x{f}"
        if not os.path.isdir(corpus_dir):
            print(f"# generating {f}x docs corpus -> {corpus_dir}", file=sys.stderr)
            scale_docs(spark, f, corpus_dir)
        build_s = None
        if not os.path.isdir(f"{store_root}/simhash"):
            print(f"# building stores -> {store_root}", file=sys.stderr)
            build_s = round(build_stores(spark, corpus_dir, store_root), 3)

        ex_store = spark.read.parquet(f"{store_root}/exact")
        mh_store = DD.read_minhash_store(spark, f"{store_root}/minhash", **MH)
        sh_store = DD.read_simhash_store(spark, f"{store_root}/simhash")
        n_store = ex_store.count()

        row: dict = {"corpus_rows": n_store, "store_build_sec": build_s}
        ops = {
            "exact_incremental": lambda: DD.exact_dedup_incremental(
                batch, ex_store
            ).count(),
            "minhash_incremental": lambda: DD.minhash_dedup_incremental(
                batch, mh_store, threshold=0.8, **MH
            ).count(),
            "simhash_incremental": lambda: DD.simhash_near_dups_incremental(
                batch, sh_store, max_hamming=SH_MAX_HAMMING
            ).count(),
        }
        for op, fn in ops.items():
            best, res = float("inf"), 0
            for _ in range(3):
                t0 = time.time()
                res = fn()
                best = min(best, time.time() - t0)
            row[op] = {"sec": round(best, 3), "out_rows": res}
            print(f"# x{f} {op}: {row[op]}", file=sys.stderr)
        out[f"x{f}"] = row

    print(json.dumps({"metric": "incremental_store_scaling", "n_batch": n_batch, "tiers": out}))


if __name__ == "__main__":
    main()
