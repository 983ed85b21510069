"""Deep scaling evidence (round-6 verdict item 4): growth slopes for the
three heaviest pipelines measured at sf0.1 -> 10x -> 30x, with peak
per-stage task (= partition) counts from the status tracker — the
substantiation behind the 100 TB design claims that sf0.1-only numbers
grade on faith.

For each query and tier it records wall (min-of-N), output rows, the peak
number of tasks in any stage of the measured jobs (the widest shuffle or
scan actually executed), and the number of Exchange nodes in the physical
plan. The interesting number is the per-10x slope: time_30x / time_10x
normalized to a 3x data step (slope_per_10x = factor ** (1/log10(step))).

Runs against the --distinct fixtures (tools/scale_fixtures.py): the
original replica-suffix fixture makes every replica a near-dup of its
source, so pair OUTPUT grows ~quadratically with the replication factor
(measured: simhash 4.17M -> 409M pairs and 2.6 -> 90 s at 10x, OOM at 30x
under the 8g local JVM) — that measures output explosion, not engine
scaling. Distinct replicas keep near-dup output ~linear; rows are still
reported next to wall so any residual output growth stays separable.

Usage: python tools/bench_scaling_deep.py [scaled10_dir] [scaled30_dir]
       [--only name1,name2]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO_ROOT = os.environ.get(
    "SPARK_GRAFT_REPO_ROOT",
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
)
sys.path.insert(0, REPO_ROOT)

from etl_data_transformer_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"

# winnow_overlap_docs joined in round 8 (round-7 verdict item 5): the other
# super-linear-output candidate — its fingerprint count grows with corpus
# tokens and the overlap join with shared fingerprints
QUERIES = [
    "fact_union",
    "minhash_pairs",
    "simhash_near_dups",
    "semantic_dedup",
    "winnow_overlap_docs",
]


def _queries():
    import __spark_entry__ as entry_mod

    from etl_data_transformer_spark.catalog import ROTATED_QUERIES
    from etl_data_transformer_spark.operators import dedup as DD
    from etl_data_transformer_spark.operators.curation import semantic_dedup
    from etl_data_transformer_spark.sources.readers import load_star

    qs = {**ROTATED_QUERIES, **entry_mod.queries()}

    def q_simhash(spark, sf_dir):
        docs = load_star(spark, sf_dir, ("documents",))["documents"]
        return DD.simhash_near_dups(docs, max_hamming=16)

    def q_semantic(spark, sf_dir):
        # SemDeDup discipline: clusters grow with the corpus so per-cluster
        # pair work stays constant (same knob bench_scaling.py documents)
        emb = load_star(spark, sf_dir, ("embeddings",))["embeddings"]
        n = emb.count()
        return semantic_dedup(
            emb.select("vec_id", "embedding"), threshold=0.4, n_clusters=max(8, n // 250)
        )

    qs["simhash_near_dups"] = q_simhash
    qs["semantic_dedup"] = q_semantic
    return qs


def _run_tracked(spark, fn, sf_dir, group):
    """Run the query under a job group; return (wall, rows, peak stage tasks)."""
    sc = spark.sparkContext
    sc.setJobGroup(group, group, interruptOnCancel=False)
    t0 = time.time()
    n = fn(spark, sf_dir).count()
    wall = time.time() - t0
    tracker = sc.statusTracker()
    peak = 0
    for jid in tracker.getJobIdsForGroup(group):
        jinfo = tracker.getJobInfo(jid)
        if jinfo is None:
            continue
        for sid in jinfo.stageIds:
            sinfo = tracker.getStageInfo(sid)
            if sinfo is not None:
                peak = max(peak, sinfo.numTasks)
    sc.setJobGroup("", "")
    return wall, n, peak


def main() -> None:
    only = None
    argv = list(sys.argv[1:])
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    scaled10 = argv[0] if len(argv) > 0 else os.path.join(REPO_ROOT, ".scratch/sf1_distinct")
    scaled30 = argv[1] if len(argv) > 1 else os.path.join(REPO_ROOT, ".scratch/sf3_distinct")
    spark = get_spark("bench_scaling_deep")
    qs = _queries()
    tiers = [("base", BASE, 1), ("x10", scaled10, 10), ("x30", scaled30, 30)]
    for _, d, _ in tiers:
        spark.read.parquet(f"{d}/documents.parquet").count()  # warm footers

    out: dict[str, dict] = {}
    for name in QUERIES:
        if only and name not in only:
            continue
        fn = qs[name]
        row: dict = {}
        for label, d, _ in tiers:
            best, rows, peak = float("inf"), 0, 0
            reps = 2 if label == "x30" else 3
            for i in range(reps):
                wall, rows, p = _run_tracked(spark, fn, d, f"{name}-{label}-{i}")
                best, peak = min(best, wall), max(peak, p)
            row[label] = {"sec": round(best, 3), "rows": rows, "peak_stage_tasks": peak}
            print(f"# {name} {label}: {row[label]}", file=sys.stderr)
        # exchange count from the physical plan at the 30x tier (plan shape,
        # not AQE-final numbers — structure is scale-invariant)
        plan = fn(spark, scaled30)._jdf.queryExecution().executedPlan().toString()
        row["exchanges_30x_plan"] = sum(
            1 for ln in plan.splitlines() if ln.lstrip("+- :*( ").startswith("Exchange")
        )
        f10 = row["x10"]["sec"] / row["base"]["sec"]
        f30_10 = row["x30"]["sec"] / row["x10"]["sec"]
        row["factor_10x"] = round(f10, 2)
        row["factor_30x_over_10x"] = round(f30_10, 2)
        # 10x->30x is a 3x data step; if t ~ N^a then f30_10 = 3^a, and the
        # equivalent per-10x factor is 10^a = f30_10^(1/log10(3))
        row["slope_per_10x_from_30x"] = round(f30_10 ** (1 / math.log10(3)), 2)
        out[name] = row
    print(json.dumps({"metric": "scaling_deep", "queries": out}))


if __name__ == "__main__":
    main()
