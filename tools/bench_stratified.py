"""Hot-group straggler stress for ``curation.stratified_cap`` (round-4
verdict item 1). The feared shape: a per-group cap windowed on the group
key lands an entire group on ONE reducer — with one domain holding half
the corpus, a single-task sort of half the data.

Measured finding (recorded in SCALING.md): on Spark >= 3.5 the straggler
does not exist — Catalyst rewrites ``row_number() <= k`` into
``WindowGroupLimit`` with a Partial stage BEFORE the exchange, so each map
task emits at most ``cap_n`` rows per group and the hot reducer receives
``cap_n × n_map_partitions`` rows, not the group. On a 24M-row frame with
a ~12M-row hot domain (4x-replicated skew-fixture lineitem, 20 domains),
the single-window plan matches or beats a hand-written two-phase cap
(which re-derives the same bound at the cost of an extra shuffle — kept as
``two_phase=True`` for extreme map fan-in where cap_n × maps itself
overwhelms one reducer).

Measures single-window vs two-phase on the skewed AND uniform scaled dirs
(min-of-3 each, counts asserted equal — the plans must select the same
number of rows). Usage: python tools/bench_stratified.py [skew_dir]
[uniform_dir]
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

from etl_data_transformer_spark.operators.curation import stratified_cap  # noqa: E402
from etl_data_transformer_spark.session import get_spark  # noqa: E402


def _timed(fn, reps: int = 3):
    best, n = float("inf"), 0
    for _ in range(reps):
        t0 = time.time()
        n = fn()
        best = min(best, time.time() - t0)
    return round(best, 3), n


def main() -> None:
    skew_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO_ROOT, ".scratch/sf1_scaled_skew")
    base_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO_ROOT, ".scratch/sf1_scaled")
    spark = get_spark("bench_stratified")
    for d in (base_dir, skew_dir):
        spark.read.parquet(f"{d}/lineitem.parquet").count()  # warm cache

    def capped_count(d: str, two_phase: bool) -> int:
        # model the pretraining-domain shape: ~20 group values. On the skew
        # dir the hot l_orderkey (remapped to 0 by scale_fixtures --skew)
        # holds ~half of the 6M rows, so "domain src0-of-20" inherits that
        # half — the motivating "one domain = half the corpus" case. On the
        # uniform dir the same expression yields 20 even ~300k-row domains.
        li = (
            spark.read.parquet(f"{d}/lineitem.parquet")
            .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice")
            # 4x replication → 24M rows, hot domain ~12M: big enough that a
            # single-reducer sort of the hot group dominates wall-clock
            .withColumn("__rep", F.explode(F.sequence(F.lit(1), F.lit(4))))
            .withColumn("domain", F.concat(F.lit("src"), F.pmod("l_orderkey", F.lit(20))))
            .withColumn(
                "__rid",
                F.xxhash64(
                    F.concat_ws(",", "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "__rep")
                ),
            )
        )
        out = stratified_cap(
            li,
            key_col="domain",
            cap_n=1000,
            order_col="l_extendedprice",
            id_col="__rid",
            two_phase=two_phase,
        )
        return out.count()

    result: dict[str, dict] = {}
    for d, label in ((base_dir, "uniform"), (skew_dir, "skew")):
        single, n1 = _timed(lambda: capped_count(d, two_phase=False))
        two, n2 = _timed(lambda: capped_count(d, two_phase=True))
        assert n1 == n2, f"{label}: plans select different row counts ({n1} vs {n2})"
        result[label] = {"single_window": single, "two_phase": two, "rows": n1}
        print(f"# {label}: {result[label]}", file=sys.stderr)

    print(json.dumps({"metric": "stratified_cap_hot_group", "plans": result}))


if __name__ == "__main__":
    main()
