"""Prefix-filtered exact Jaccard join vs the unpruned gram join (round-10
SCALING.md evidence): the AllPairs/PPJoin pruning earns its keep exactly
where real corpora hurt — shared BOILERPLATE. Every doc gets a common
suffix sentence appended, making ~10 shingles with df = N; the unpruned
join's mass on those shingles is N² while the prefix filter orders them
LAST (df-descending exclusion) so they never enter the candidate join.

Usage: python tools/bench_jaccard_join.py [--factors 1,10]
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

from etl_data_transformer_spark.functions.text import (  # noqa: E402
    filtered_tokens,
    shingles_from_tokens,
)
from etl_data_transformer_spark.operators.dedup import jaccard_join_prefix  # noqa: E402
from etl_data_transformer_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1/documents.parquet"
BOILER = " subscribe to our newsletter for daily updates and follow us on every platform"


def mk(spark, factor: int):
    src = spark.read.parquet(SRC)
    stride = 10**7
    reps = []
    for i in range(factor):
        r = src.withColumn("doc_id", F.col("doc_id") + F.lit(i * stride))
        if i:
            r = r.withColumn("text", F.regexp_replace("text", r"(\S+)", rf"$1x{i}"))
        reps.append(r)
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return (
        out.withColumn("text", F.concat(F.col("text"), F.lit(BOILER)))
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )


def unpruned(d, num: int, den: int):
    # projected token array, same as the prefix path — the control must
    # not pay the higher-order re-tokenization the operator avoids, or
    # the comparison would overstate the pruning win
    tk = d.select("doc_id", filtered_tokens(F.col("text")).alias("__tk"))
    g = tk.select(
        "doc_id", F.explode(shingles_from_tokens(F.col("__tk"), 3)).alias("g")
    ).filter(F.length("g") > 0)
    sz = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = g.select(F.col("doc_id").alias("id_a"), "g")
    b = g.select(F.col("doc_id").alias("id_b"), "g")
    inter = (
        a.join(b, "g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    na = sz.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    nb = sz.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .filter(F.col("i") * den >= num * (F.col("na") + F.col("nb") - F.col("i")))
    )


def main() -> None:
    factors = [1, 10]
    argv = sys.argv[1:]
    if "--factors" in argv:
        factors = [int(x) for x in argv[argv.index("--factors") + 1].split(",")]
    spark = get_spark("bench_jaccard_join")
    res = {}
    for f in factors:
        d = mk(spark, f)
        n_docs = d.count()
        t0 = time.time()
        np_ = jaccard_join_prefix(d, threshold=0.8).count()
        wp = round(time.time() - t0, 2)
        row = {"docs": n_docs, "prefix_s": wp, "pairs": np_}
        if n_docs <= 10_000:  # the unpruned control is quadratic on df=N shingles
            t0 = time.time()
            nu = unpruned(d, 4, 5).count()
            row["unpruned_s"] = round(time.time() - t0, 2)
            assert nu == np_, (nu, np_)
        res[f"x{f}"] = row
    print(json.dumps(res))


if __name__ == "__main__":
    main()
