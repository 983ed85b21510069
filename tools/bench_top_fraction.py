"""Top-fraction scaling evidence (round-9 verdict item 2): wall-clock of
the exact-window form vs the two-pass approx form at the 1M-doc tier,
CORPUS-WIDE (by=None — the shape where the exact form serializes the
whole corpus's sort through one reducer) and few-group (5 groups).

The scored frame is the 1M-doc corpus shape reduced to what the operator
touches: (doc_id, grp, score) with a long-tailed integer score carrying
heavy ties (score = fold of md5(doc_id) mod 10k → ~100 ties per value at
1M rows), so the boundary band really exercises the tie handling. Both
forms are run to a count() + a checksum of kept ids, asserted EQUAL —
the measurement doubles as a 1M-row equivalence check.

Usage: python tools/bench_top_fraction.py [--rows 1000000]
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

from etl_data_transformer_spark.operators.curation import (  # noqa: E402
    top_fraction_approx,
    top_fraction_per_group,
)
from etl_data_transformer_spark.session import get_spark  # noqa: E402


def scored_frame(spark, rows: int):
    # deterministic long-tailed score with heavy ties; 5 groups
    return (
        spark.range(rows)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("g"), (F.col("id") % 5).cast("string")).alias("grp"),
            (F.abs(F.hash(F.col("id"))) % 10_000).cast("long").alias("s"),
        )
        .repartition(32)
    )


def run(df, fn, **kw):
    t0 = time.monotonic()
    out = fn(df, "s", 0.25, **kw)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("doc_id")).alias("chk")
    ).collect()[0]
    return time.monotonic() - t0, int(agg["n"]), int(agg["chk"])


def main() -> None:
    rows = 1_000_000
    if "--rows" in sys.argv:
        rows = int(sys.argv[sys.argv.index("--rows") + 1])
    spark = get_spark()
    df = scored_frame(spark, rows)
    df.write.mode("overwrite").parquet(os.path.join(REPO_ROOT, ".scratch/topfrac_scored"))
    df = spark.read.parquet(os.path.join(REPO_ROOT, ".scratch/topfrac_scored"))
    df.count()  # warm

    res = {}
    for label, by in (("corpus_wide", None), ("few_group", "grp")):
        we, ne, ce = run(df, top_fraction_per_group, by=by)
        wa, na, ca = run(df, top_fraction_approx, by=by)
        assert (ne, ce) == (na, ca), (label, ne, ce, na, ca)
        res[label] = {"exact_s": round(we, 2), "approx_s": round(wa, 2), "kept": ne}
    print(json.dumps({"rows": rows, **res}))


if __name__ == "__main__":
    main()
