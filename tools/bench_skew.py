"""Skewed-key join stress (round-3 verdict item 4): measure the hot-key
orders ⋈ customer join on the skewed 10× fixture under four strategies, plus
the headline ``item_status`` pipeline on the same skewed data.

The fixture (tools/scale_fixtures.py --skew) remaps HALF of the 1.5M-row
``orders.o_custkey`` to ONE customer. The join measurements force a SHUFFLED
hash join (autoBroadcastJoinThreshold=-1) because that's the regime where
skew hurts — one reducer owns half the probe side:

1. ``shuffle``       — shuffled join, AQE skew handling OFF (the baseline hurt)
2. ``aqe_skew``      — shuffled join, AQE skewJoin ON (runtime partition split)
3. ``salted``        — operators.joins.salted_join (deterministic salt,
                       right side replicated; the pre-AQE portable fix)
4. ``broadcast``     — the engine's actual default for this dim size:
                       broadcast join, skew-immune by construction

``item_status`` runs last, unmodified, on the skewed dir: its dims are
broadcast throughout (plans/branches.py), so the hot key must NOT slow it
down — that's the design claim under test.

Usage: python tools/bench_skew.py [skew_dir] [uniform_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

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
    skew_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1_scaled_skew"
    base_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1_scaled"
    spark = get_spark("bench_skew")

    def join_count(d: str, strategy: str) -> int:
        orders = spark.read.parquet(f"{d}/orders.parquet")
        customer = spark.read.parquet(f"{d}/customer.parquet")
        if strategy == "broadcast":
            j = orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        elif strategy == "salted":
            j = salted_join(
                orders.withColumnRenamed("o_custkey", "k"),
                customer.withColumnRenamed("c_custkey", "k"),
                on="k",
                left_unique="o_orderkey",
                salt_buckets=32,
            )
        else:
            j = orders.join(customer, orders.o_custkey == customer.c_custkey)
        # aggregate a customer-side column so the join can't be pruned away
        return j.agg(F.count("c_acctbal")).collect()[0][0]

    out: dict[str, dict] = {}
    conf = spark.conf
    for d, label in ((base_dir, "uniform"), (skew_dir, "skew")):
        row: dict[str, float] = {}
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        row["shuffle"], n = _timed(lambda: join_count(d, "shuffle"))
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # the fixture's hot partition (~24 MB of 1.5M rows) sits under the
        # 256 MB default threshold — tune down so the split actually engages,
        # exactly what an operator would do on a real cluster
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
