"""Capture ``explain("formatted")`` for every catalog + bench-only query.

Writes ``plans/r14/<query>_<tag>.txt`` (override the directory with
``$SPARK_GRAFT_PLANS_DIR``; tag = before/after) so plan-shape
claims in OPTIMIZATION_r14.md are checkable without running Spark. Runs each
query's own DataFrame to completion first so the AQE final plan (with
codegen ids and runtime join strategies) is what gets captured, then prints
the formatted explain (initial + final trees + details).

Usage: python tools/capture_plans.py <tag> [sf_dir] [only_query ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO_ROOT = os.environ.get(
    "SPARK_GRAFT_REPO_ROOT",
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
)
sys.path.insert(0, REPO_ROOT)

from etl_data_transformer_spark.session import get_spark  # noqa: E402


def bench_extra_queries() -> dict:
    """The bench-only headline rows bench.py synthesizes (kept in sync)."""
    from pyspark.sql import functions as F

    from etl_data_transformer_spark.functions import text as TX
    from etl_data_transformer_spark.operators import dedup as DD
    from etl_data_transformer_spark.operators.curation import (
        decontaminate_passages,
        dedup_passages,
        hyperplane_lsh_pairs,
        semantic_dedup,
    )
    from etl_data_transformer_spark.sources.readers import load_star

    def _docs(spark, sf_dir):
        return load_star(spark, sf_dir, ("documents",))["documents"]

    def _emb(spark, sf_dir):
        return load_star(spark, sf_dir, ("embeddings",))["embeddings"]

    return {
        "hyperplane_pairs": lambda s, d: hyperplane_lsh_pairs(
            _emb(s, d), n_bits=16, max_hamming=2
        ),
        "bpe_train_encode": lambda s, d: TX.bpe_encode(
            _docs(s, d), TX.bpe_train(_docs(s, d), num_merges=100, max_words=20_000)
        ),
        "ngram_jaccard": lambda s, d: DD.ngram_jaccard_exact(
            _docs(s, d).filter(F.col("doc_id") < 100), n=3, threshold=0.6
        ),
        "simhash_near_dups": lambda s, d: DD.simhash_near_dups(
            _docs(s, d), max_hamming=16
        ),
        "semantic_dedup": lambda s, d: semantic_dedup(
            _emb(s, d), threshold=0.4, n_clusters=8
        ),
        "dedup_passages": lambda s, d: dedup_passages(_docs(s, d), window=10).filter(
            F.col("n_removed") + F.length("clean_text") >= 0
        ),
        "decon_passages": lambda s, d: decontaminate_passages(
            _docs(s, d).filter(F.col("doc_id") >= 500),
            _docs(s, d).filter(F.col("doc_id") < 500),
            window=10,
        ).filter(F.col("n_removed") + F.length("clean_text") >= 0),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    only = set(sys.argv[3:])

    import __spark_entry__ as entry_mod

    from etl_data_transformer_spark.catalog import ROTATED_QUERIES

    qs = {**ROTATED_QUERIES, **entry_mod.queries()}
    for name, fn in bench_extra_queries().items():
        qs.setdefault(name, fn)

    out_dir = os.environ.get("SPARK_GRAFT_PLANS_DIR") or os.path.join(REPO_ROOT, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    failures = []
    for name in sorted(qs):
        if only and name not in only:
            continue
        try:
            spark.sparkContext.setJobDescription(f"plan:{name}")
            df = qs[name](spark, sf_dir)
            df.collect()  # finalize the AQE plan
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(f"# query: {name}  sf_dir: {sf_dir}  tag: {tag}\n")
                f.write(buf.getvalue())
            print(f"ok {name}")
        except Exception as e:  # noqa: BLE001 — capture all, report at end
            failures.append((name, str(e)[:200]))
            print(f"FAIL {name}: {e}")
        finally:
            spark.sparkContext.setJobDescription(None)
    if failures:
        print(f"{len(failures)} failures: {[n for n, _ in failures]}")
        sys.exit(1)
    print("all plans captured")


if __name__ == "__main__":
    main()
