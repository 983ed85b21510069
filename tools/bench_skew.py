"""Skewed-key join stress (round-3 verdict item 4): measure the hot-key
lineitem ⋈ orders join (6M ⋈ 1.5M rows at the 10× fixture) under four
strategies, plus the headline ``item_status`` pipeline on the same skewed
data.

The fixture (tools/scale_fixtures.py --skew) remaps ~HALF of
``lineitem.l_orderkey`` to ONE hot order (and half of ``orders.o_custkey``
to one hot customer). The join measurements force a SHUFFLED hash join
(autoBroadcastJoinThreshold=-1) because that's the regime where skew hurts —
one reducer owns ~3M probe rows:

1. ``shuffle``   — shuffled join, AQE skew handling OFF (the baseline hurt)
2. ``aqe_skew``  — shuffled join, AQE skewJoin ON (runtime partition split)
3. ``salted``    — operators.joins.salted_join (deterministic salt, right
                   side replicated; the portable fix when AQE can't engage)
4. ``broadcast`` — what the engine would pick if the right side fits:
                   broadcast join, skew-immune by construction

``item_status`` runs last, unmodified, on the skewed dir: its dims are
broadcast throughout (plans/branches.py), so the hot keys must NOT slow it
down materially — that's the design claim under test.

Usage: python tools/bench_skew.py [skew_dir] [uniform_dir]
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

from etl_data_transformer_spark.operators.joins import salted_join  # noqa: E402
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
    spark = get_spark("bench_skew")
    # warm footers + page cache so the first timed strategy isn't charged
    # for cold reads (min-of-3 can't fix a systematically cold first table)
    for d in (base_dir, skew_dir):
        for t in ("lineitem", "orders"):
            spark.read.parquet(f"{d}/{t}.parquet").count()

    def join_count(d: str, strategy: str) -> int:
        li = spark.read.parquet(f"{d}/lineitem.parquet")
        orders = spark.read.parquet(f"{d}/orders.parquet")
        if strategy == "broadcast":
            j = li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        elif strategy == "salted":
            j = salted_join(
                li.withColumnRenamed("l_orderkey", "k"),
                orders.withColumnRenamed("o_orderkey", "k"),
                on="k",
                # salt source just needs determinism + spread (not
                # uniqueness): l_partkey is high-cardinality even on the
                # hot-key rows, where the orderkey itself is constant.
                # 8 buckets: enough to split the hot reducer 8-way while
                # only replicating the build side 8x — salting's cost IS
                # the build replication, so buckets stay minimal
                left_unique="l_partkey",
                salt_buckets=8,
            )
        else:
            j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        # aggregate payload columns from BOTH sides: column pruning must not
        # strip the shuffle down to the (constant, hyper-compressible) hot
        # key alone — AQE's skew detection works on compressed shuffle BYTES,
        # and a key-only hot partition compresses below any sane threshold
        # (measured: the split never engaged until payload rode along)
        row0 = j.agg(
            F.count("o_totalprice").alias("n"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) + F.col("o_totalprice")).alias("s"),
        ).collect()[0]
        return row0["n"]

    out: dict[str, dict] = {}
    conf = spark.conf
    for d, label in ((base_dir, "uniform"), (skew_dir, "skew")):
        row: dict[str, float] = {}
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        row["shuffle"], n = _timed(lambda: join_count(d, "shuffle"))
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # the fixture's hot partition (~3M rows, tens of MB) sits under the
        # 256 MB default threshold — tune down so the split actually
        # engages, exactly what an operator would do on a real cluster
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4MB")
        row["aqe_skew"], n2 = _timed(lambda: join_count(d, "shuffle"))
        row["salted"], n3 = _timed(lambda: join_count(d, "salted"))
        conf.unset("spark.sql.autoBroadcastJoinThreshold")
        conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        row["broadcast"], n4 = _timed(lambda: join_count(d, "broadcast"))
        assert n == n2 == n3 == n4, f"strategy row counts diverge: {n} {n2} {n3} {n4}"
        row["rows"] = n
        out[label] = row
        print(f"# {label}: {row}", file=sys.stderr)

    # the headline pipeline, untouched, on both dirs: broadcast dims make it
    # skew-immune — the claim under test
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    for d, label in ((base_dir, "uniform"), (skew_dir, "skew")):
        t, n = _timed(lambda: qs["item_status"](spark, d).count())
        out[label]["item_status"] = t
        out[label]["item_status_rows"] = n
        print(f"# item_status {label}: {t}s ({n} rows)", file=sys.stderr)

    print(json.dumps({"metric": "skew_join_stress", "strategies": out}))


if __name__ == "__main__":
    main()
