"""Scaling evidence (round-2 verdict item 6): min-of-3 per query at sf0.1
and at the 10x key-shifted copy (tools/scale_fixtures.py), printing the
wall-clock growth factor. A factor well under 10 on the scan/shuffle-bound
queries is the measurement behind "fixed job overhead amortizes; the plan
scales" — the local[32] proxy for the 1000-executor claim.

Usage: python tools/bench_scaling.py [scaled_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

# repo root derived from this tool's own location (round-13 advice: the
# hardcoded /root/repo broke any other checkout), overridable for odd
# layouts via SPARK_GRAFT_REPO_ROOT
REPO_ROOT = os.environ.get(
    "SPARK_GRAFT_REPO_ROOT",
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
)
sys.path.insert(0, REPO_ROOT)

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
    "domain_stats_docs",    # full-PSL per-host rollup (probes per DISTINCT host, r13)
]


def _store_scenarios(spark, scaled: str) -> dict:
    """Round-13 (verdict r12 item 8): 10× growth rows for the STORE-backed
    incremental operators — the claim under test is that a FIXED-SIZE
    batch costs the same against a 10× store (cost ∝ batch, not store).
    Stores build once per scale into .scratch/scaling_stores (delete the
    dir to force a rebuild); the probe batch is a deterministic 2,000-doc
    re-crawl slice (ids offset, half the texts changed)."""
    import os

    from pyspark.sql import functions as F

    from etl_data_transformer_spark.catalog import extensions as EXT
    from etl_data_transformer_spark.operators import dedup as DD
    from etl_data_transformer_spark.operators import domains as DOM

    scratch = os.path.join(REPO_ROOT, ".scratch", "scaling_stores")
    out: dict[str, dict] = {"keeper_gate": {}, "minhash_split_incremental": {}}
    for label, d in (("base", BASE), ("scaled", scaled)):
        # per-doc UNIQUE urls — the store-growth WORST case (the
        # catalog's _synthetic_url scales ~n/4 canonicals with 3-4
        # aliases each since round 14; this scenario keeps one canonical
        # per document so store rows ∝ corpus exactly); ~997 hosts
        docs = EXT._docs(spark, d).withColumn(
            "url",
            F.concat(
                F.lit("https://h"),
                (F.col("doc_id") % 997).cast("string"),
                F.lit(".example.com/d/"),
                F.col("doc_id").cast("string"),
            ),
        )
        probe = (
            docs.orderBy("doc_id")
            .limit(2000)
            .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
            .withColumn(
                "text",
                F.when(
                    F.col("doc_id") % 2 == 0, F.concat(F.col("text"), F.lit(" v2"))
                ).otherwise(F.col("text")),
            )
            .localCheckpoint(eager=True)
        )

        # --- canonical-URL keeper gate: classify 2k re-crawls against the
        # full-corpus keeper store (merge view pruned to batch canonicals)
        kpath = os.path.join(scratch, f"keeper_{label}")
        if not os.path.isdir(kpath):
            DOM.write_url_keeper_store(
                DOM.url_keeper_rows(docs), kpath, mode="overwrite"
            )
        best, counts = float("inf"), None
        for _ in range(3):
            t0 = time.time()
            rows, seq = DOM.read_or_seed_url_keeper(spark, kpath)
            new_docs, updates, appends, n_alias = DOM.url_keeper_gate(
                probe, rows, batch_seq=seq
            )
            n_app = appends.count()
            best = min(best, time.time() - t0)
            counts = (updates.count(), n_alias, n_app)
        out["keeper_gate"][label] = {
            "sec": round(best, 3),
            "store_rows": spark.read.parquet(kpath).count(),
            "updates": counts[0],
            "aliases": counts[1],
        }

        # --- verify-split MinHash store: 2k-batch incremental near-dup
        # join against the full-corpus split store
        mpath = os.path.join(scratch, f"mh_split_{label}")
        if not os.path.isdir(mpath):
            DD.write_minhash_store(
                DD.minhash_signature_store(docs),
                mpath,
                mode="overwrite",
                layout="split",
            )
        best, n_pairs = float("inf"), 0
        for _ in range(3):
            t0 = time.time()
            slim, sets = DD.read_minhash_store_split(spark, mpath)
            n_pairs = DD.minhash_dedup_incremental(
                probe,
                slim.select("doc_id", "sig"),
                threshold=0.6,
                store_sets=sets.select("doc_id", "hs"),
            ).count()
            best = min(best, time.time() - t0)
        out["minhash_split_incremental"][label] = {
            "sec": round(best, 3),
            "store_docs": sets.count(),
            "pairs": n_pairs,
        }
    for name, row in out.items():
        factor = round(row["scaled"]["sec"] / max(row["base"]["sec"], 1e-9), 2)
        row["factor"] = factor
        print(
            f"# store {name}: {row['base']['sec']}s -> {row['scaled']['sec']}s "
            f"(x{factor} for a 10x store, fixed 2k batch)",
            file=sys.stderr,
        )
    return out


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
    scaled = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO_ROOT, ".scratch", "sf1_scaled")
    )
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
    stores = _store_scenarios(spark, scaled)
    print(json.dumps({"metric": "scaling_10x", "queries": out, "stores": stores}))


if __name__ == "__main__":
    main()
