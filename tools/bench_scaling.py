"""Scaling evidence (round-2 verdict item 6): min-of-3 per query at sf0.1
and at the 10x key-shifted copy (tools/scale_fixtures.py), printing the
wall-clock growth factor. A factor well under 10 on the scan/shuffle-bound
queries is the measurement behind "fixed job overhead amortizes; the plan
scales" — the local[32] proxy for the 1000-executor claim.

Usage: python tools/bench_scaling.py [scaled_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from etl_data_transformer_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"

# scan/shuffle-bound queries whose work grows with the data (capped-corpus
# gates like simhash_recall/dedup_clusters are scale-invariant by design
# and would only measure their cap)
QUERIES = [
    "pricing_summary",      # full lineitem scan + 4-key agg
    "item_status",          # 3-branch broadcast-join pipeline
    "fact_union",           # widest plan: 3 branches + distinct
    "topk_orders_per_nation",  # join + window top-k
    "session_agg_events",   # per-user window shuffle over events
    "tumbling_events",      # time-bucket agg over events
    "exact_dedup_groups",   # full-corpus fingerprint groupBy
    "minhash_pairs",        # full-corpus MinHash LSH banding
    "ann_bruteforce",       # 10 queries x full embedding corpus
    "tfidf_top_terms",      # two groupBys + per-doc window
    "semantic_dedup",       # cluster-blocked cosine dedup (clusters ∝ corpus)
    "winnow_overlap_docs",  # map-only fingerprints + fp equi-join
    "mixture_sample_docs",  # token-mixture sampling: bucket census + boundary window
]


def _semantic_dedup_query(spark, sf_dir: str):
    """SemDeDup production path with its documented scaling discipline:
    n_clusters grows with the corpus so per-cluster pair work stays
    constant (the knob that keeps the in-cluster O(B²) bounded). The row
    count probe is parquet metadata — negligible next to the dedup."""
    from etl_data_transformer_spark.operators.curation import semantic_dedup
    from etl_data_transformer_spark.sources.readers import load_star

    emb = load_star(spark, sf_dir, ("embeddings",))["embeddings"]
    n = emb.count()
    return semantic_dedup(
        emb.select("vec_id", "embedding"),
        threshold=0.4,
        n_clusters=max(8, n // 250),
    )


def main() -> None:
    scaled = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1_scaled"
    import __spark_entry__ as entry_mod

    from etl_data_transformer_spark.catalog import ROTATED_QUERIES

    # include queries rotated out of the driver contract (round 4) so the
    # scaling series stays comparable round-over-round
    qs = {**ROTATED_QUERIES, **entry_mod.queries()}
    qs["semantic_dedup"] = _semantic_dedup_query
    spark = get_spark("bench_scaling")
    for d in (BASE, scaled):
        spark.read.parquet(f"{d}/lineitem.parquet").count()  # warm footers

    out: dict[str, dict] = {}
    for name in QUERIES:
        fn = qs[name]
        row = {}
        for label, d in (("base", BASE), ("scaled", scaled)):
            best, n = float("inf"), 0
            for _ in range(3):
                t0 = time.time()
                n = fn(spark, d).count()
                best = min(best, time.time() - t0)
            row[label] = round(best, 3)
            row[f"{label}_rows"] = n
        row["factor"] = round(row["scaled"] / row["base"], 2)
        out[name] = row
        print(
            f"# {name}: {row['base']}s -> {row['scaled']}s "
            f"(x{row['factor']}, rows {row['base_rows']} -> {row['scaled_rows']})",
            file=sys.stderr,
        )
    print(json.dumps({"metric": "scaling_10x", "queries": out}))


if __name__ == "__main__":
    main()
