"""Generate an N×-scaled copy of a fixture directory for SCALING runs.

The driver ships sf{0.001,0.01,0.1} only; the 100 TB story needs evidence
that per-query wall-clock grows sublinearly with data (fixed job overhead
amortizes, scans/shuffles parallelize). This derives a larger PERF-ONLY
dataset from sf0.1 by unioning key-shifted replicas of the fact tables
(orders, lineitem, events, documents, embeddings) while keeping dimensions
fixed — the realistic shape: facts grow, dims don't. Document text gets a
per-replica suffix token so dedup/similarity workloads don't degenerate
into 10× exact copies.

PERF ONLY: correctness is always checked against the driver's own fixtures
(tools/check_oracle.py); this data never feeds an oracle comparison.

``--skew`` additionally writes ``<out_dir>_skew``: the same scaled fixture
set but with HALF of ``orders.o_custkey`` remapped to one hot customer AND
half of ``lineitem.l_orderkey`` remapped to one hot order (single keys
owning ~50% of the 1.5M/6M-row fact sides) — the skewed-join stress fixture
for tools/bench_skew.py (round-3 verdict item 4). Unmodified tables are
symlinked from the scaled dir, not copied.

Usage: python tools/scale_fixtures.py [factor] [src_dir] [out_dir] [--skew]
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.environ.get(
    "SPARK_GRAFT_REPO_ROOT",
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
)
sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from etl_data_transformer_spark.session import get_spark  # noqa: E402

DIM_TABLES = ["region", "nation", "customer", "supplier", "part"]
# fact table -> columns to shift by replica * (max+1) so keys stay unique
SHIFT = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def scale_fixture_dir(spark, factor: int, src: str, out: str, distinct: bool = False) -> None:
    """Write the N×-scaled fixture set (facts key-shifted + text-perturbed,
    dims copied) — importable so bench.py can self-provision its sf1 tier.

    ``distinct=False`` (the original mode) appends a per-replica suffix
    token to document text, which makes every replica a NEAR-DUP of its
    source — near-dup/semantic pair output then grows ~quadratically with
    the replication factor (measured: simhash pairs 4.17M -> 409M at 10x),
    which measures output explosion, not engine scaling, and OOMs the
    near-dup tiers at 30x. ``distinct=True`` is the engine-scaling mode:
    replica documents get EVERY token suffixed (bijective token remap — no
    shingle/feature collides across replicas, intra-replica near-dup
    structure preserved), and replica embeddings are regenerated as
    deterministic pseudo-random vectors keyed by the shifted vec_id — so
    dedup/ANN output grows ~linearly and wall-clock measures compute."""
    os.makedirs(out, exist_ok=True)

    for t in DIM_TABLES:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(f"# {t}: copied (dim)")

    # one stride per KEY FAMILY, not per table: lineitem.l_orderkey must use
    # orders' stride or replica lineitems would point at wrong/absent orders
    order_stride = (
        spark.read.parquet(f"{src}/orders.parquet").agg(F.max("o_orderkey")).collect()[0][0] + 1
    )
    shared = {"o_orderkey": order_stride, "l_orderkey": order_stride}
    for t, keys in SHIFT.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        strides = {
            k: shared[k] if k in shared else df.agg(F.max(k)).collect()[0][0] + 1
            for k in keys
        }
        reps = []
        for i in range(factor):
            r = df
            for k in keys:
                r = r.withColumn(k, F.col(k) + F.lit(i * strides[k]))
            if t == "documents" and i > 0:
                if distinct:
                    # bijective per-replica token remap: no shingle/simhash
                    # feature collides across replicas, intra-replica
                    # near-dup structure preserved
                    r = r.withColumn(
                        "text", F.regexp_replace("text", r"(\S+)", rf"$1r{i}")
                    )
                else:
                    # perturb text so near-dup workloads see near-dups, not copies
                    r = r.withColumn(
                        "text", F.concat_ws(" ", F.col("text"), F.lit(f"rep{i}"))
                    )
            if t == "embeddings" and i > 0 and distinct:
                # deterministic pseudo-random replacement keyed by the
                # (already replica-shifted) vec_id: replicas occupy their
                # own regions of embedding space instead of being exact
                # copies of the base corpus
                dim = len(df.first()["embedding"])
                r = r.withColumn(
                    "embedding",
                    F.expr(
                        f"transform(sequence(0, {dim - 1}), "
                        "j -> cast(pmod(xxhash64(vec_id * 131071 + j), 1999) "
                        "as float) / 1000.0 - 1.0)"
                    ),
                )
            reps.append(r)
        scaled = reps[0]
        for r in reps[1:]:
            scaled = scaled.unionByName(r)
        scaled.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(f"# {t}: x{factor} -> {out}")


def main() -> None:
    flags = {"--skew", "--distinct"}
    args = [a for a in sys.argv[1:] if a not in flags]
    skew = "--skew" in sys.argv[1:]
    distinct = "--distinct" in sys.argv[1:]
    factor = int(args[0]) if len(args) > 0 else 10
    src = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    out = args[2] if len(args) > 2 else os.path.join(REPO_ROOT, ".scratch/sf1_scaled")
    spark = get_spark("scale_fixtures")
    scale_fixture_dir(spark, factor, src, out, distinct=distinct)

    if skew:
        out_skew = f"{out.rstrip('/')}_skew"
        os.makedirs(out_skew, exist_ok=True)
        orders = spark.read.parquet(f"{out}/orders.parquet")
        hot_cust = (
            orders.groupBy("o_custkey").count().orderBy(F.desc("count"), "o_custkey").first()["o_custkey"]
        )
        # deterministic half of the orders (by orderkey parity) point at one
        # customer: a single join key owning ~50% of the fact side
        skewed_orders = orders.withColumn(
            "o_custkey",
            F.when(F.pmod("o_orderkey", F.lit(2)) == 0, F.lit(hot_cust)).otherwise(F.col("o_custkey")),
        )
        for skew_table in ("orders", "lineitem"):
            # a prior run may have symlinked this table; writing through the
            # link would clobber the clean scaled copy
            p = f"{out_skew}/{skew_table}.parquet"
            if os.path.islink(p):
                os.unlink(p)
        skewed_orders.write.mode("overwrite").parquet(f"{out_skew}/orders.parquet")
        # and half of the (6M-row) lineitem points at one hot ORDER — the
        # N:1 fan stays 1 (the hot order exists, so inner-join row counts
        # are preserved), but one reducer owns ~3M probe rows in a shuffled
        # orderkey join. Parity on (orderkey, linenumber) keeps it
        # deterministic and roughly half.
        lineitem = spark.read.parquet(f"{out}/lineitem.parquet")
        hot_order = lineitem.agg(F.min("l_orderkey")).collect()[0][0]
        skewed_li = lineitem.withColumn(
            "l_orderkey",
            F.when(
                F.pmod(F.col("l_orderkey") + F.col("l_linenumber"), F.lit(2)) == 0,
                F.lit(hot_order),
            ).otherwise(F.col("l_orderkey")),
        )
        skewed_li.write.mode("overwrite").parquet(f"{out_skew}/lineitem.parquet")
        for t in DIM_TABLES + [x for x in SHIFT if x != "orders"]:
            if t == "lineitem":
                continue
            dst = f"{out_skew}/{t}.parquet"
            if not os.path.lexists(dst):
                os.symlink(os.path.abspath(f"{out}/{t}.parquet"), dst)
        print(f"# orders: hot o_custkey={hot_cust} on 50% of rows -> {out_skew}")
        print(f"# lineitem: hot l_orderkey={hot_order} on ~50% of rows -> {out_skew}")
    print("done")


if __name__ == "__main__":
    main()
