"""Query-side IVF probe-selection micro-bench (round-5 verdict item 4).

``ivf_assign`` already auto-switches its argmin-over-centroids to an Arrow
BLAS matmul at >= 32 lists (measured 9.8s -> 2.0s at 80 lists on the
build side). ``ivf_search``'s probe selection is the IDENTICAL shape run
per query row — top-``n_probes`` instead of argmin — and round 5 left it
on the interpreted ``aggregate``/``zip_with`` fold. This measures both
paths end-to-end through ``ivf_search`` on a large query batch at 80
lists (result sets asserted identical), the evidence behind the same
auto-switch now applied in ``_ivf_probes_arrow``.

Rounds 7-8 carried an isin-vs-join candidate-push comparison here; the
round-9 cold-store measurement (SCALING.md) closed the last scenario the
isin branch was retained for and the branch was deleted — this tool now
times only the surviving join-path quantized rerank.

Usage: python tools/bench_ivf_probes.py [n_queries] [n_lists]
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

from etl_data_transformer_spark.operators import similarity as SIM  # noqa: E402
from etl_data_transformer_spark.session import get_spark  # noqa: E402


def _timed(fn, reps: int = 3):
    best, n = float("inf"), 0
    for _ in range(reps):
        t0 = time.time()
        n = fn()
        best = min(best, time.time() - t0)
    return round(best, 3), n


def main() -> None:
    n_queries = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_lists = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    spark = get_spark("bench_ivf_probes")

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select(
        F.col("vec_id").alias("id"), "embedding"
    )
    cents = SIM.train_ivf_centroids(emb, n_lists=n_lists)
    index = SIM.ivf_assign(emb, cents).localCheckpoint(eager=True)
    # large query batch: the corpus replicated to n_queries rows with fresh ids
    n_emb = emb.count()
    reps_needed = (n_queries + n_emb - 1) // n_emb
    q = (
        emb.crossJoin(spark.range(reps_needed).withColumnRenamed("id", "rep"))
        .withColumn("id", F.col("id") + F.col("rep") * (2 * n_emb))
        .drop("rep")
        .limit(n_queries)
        .localCheckpoint(eager=True)
    )

    out = {"n_queries": n_queries, "n_lists": n_lists, "n_corpus": n_emb}
    res = {}
    for label, arrow in (("expr_fold", False), ("arrow_matmul", True)):
        t, n = _timed(
            lambda a=arrow: SIM.ivf_search(q, index, cents, k=5, n_probes=4, arrow=a).count()
        )
        out[label] = {"sec": t, "rows": n}
        res[label] = n
    assert res["expr_fold"] == res["arrow_matmul"], res
    out["speedup"] = round(out["expr_fold"]["sec"] / out["arrow_matmul"]["sec"], 2)

    # quantized rerank at the same large-Q batch (candidate set =
    # n_queries * rerank_k rows). The isin-vs-join comparison this tool
    # carried in rounds 7-8 is retired with the branch: the join lost
    # nowhere (warm sweep here, cold id-sorted store in round 9 —
    # SCALING.md), so ivf_search now has only the join path.
    qindex = SIM.ivf_assign(emb, cents, quantize=True).localCheckpoint(eager=True)
    t, n = _timed(
        lambda: SIM.ivf_search(
            q, qindex, cents, k=5, n_probes=4, rerank_quantized=True
        ).count()
    )
    out["rerank_join"] = {"sec": t, "rows": n}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
