"""Plan-shape assertions over the ENTIRE query catalog (SURVEY.md §4.2, §5.5).

A BroadcastNestedLoopJoin in an unbounded operator means a join lost its
equi-keys (the §4.2 failure mode) and would be O(n²) at scale. The only
queries allowed to nested-loop are the deliberately input-bounded exact-N²
oracles and constant-pinned 1-row dim joins.
"""

import pytest

from etl_data_transformer_spark.catalog import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# Intentionally bounded cross/NLJ shapes:
#   *_near_dups / ann_bruteforce / ngram_jaccard — exact N² correctness
#     oracles over capped inputs (the scale path is LSH/IVF/banding)
#   agg_china / fact_union — const-pinned 1-row dim joins (J5, I:232-248)
NLJ_ALLOWED = {
    "embedding_near_dups",
    "ann_bruteforce",
    "ann_lsh_recall",  # embeds the bounded brute-force exact side
    "ann_ivf_recall",  # embeds the bounded brute-force exact side
    "dedup_clusters",  # built on the ngram_jaccard bounded-N² edge set
    "simhash_recall",  # same bounded-N² exact truth side (capped corpus)
    # blocked==unblocked equivalence gates: the UNBLOCKED all-pairs side is
    # a deliberate bounded N² broadcast scan (the very thing the blocked
    # production path avoids); corpus capped at 100/150 ids
    "simhash_blocked_recall",
    "hyperplane_blocked_recall",
    "agg_china",
    "fact_union",
    # K-row label-frame broadcast cross join (K = number of classes, 5
    # here): the scorer's per-doc label fan-out is a deliberate bounded
    # cross product against a census-sized frame — the same
    # const-pinned-dim class as agg_china (the trainer's former V×K grid
    # cross join was deleted in round 10; weights are observed-pair sparse)
    "nb_lang_multiclass",
    "sql_fact_union",  # same const-pinned dims via the raw-SQL entry point
    "range_join_events",  # bucketed equi-join + bound filter; tiny residual
    # corpus-wide (by=None) two-pass approx scored cut: the global
    # threshold/boundary-band frames are 1-row (or band-sized) build sides
    # cross-joined against the docs — the same const-pinned class as
    # agg_china; promoted to a driver slot in round 12, which put it under
    # this parametrize for the first time
    "top_fraction_corpus_docs",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_unbounded_nested_loop_join(spark, name):
    plan = QUERIES[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    if name in NLJ_ALLOWED:
        pytest.skip("bounded N² / const-pinned join by design")
    assert "BroadcastNestedLoopJoin" not in plan, f"{name} degraded to NLJ:\n{plan[:2000]}"


def test_item_status_uses_hash_join(spark):
    """The null-tolerant join (J3) must keep its equi-keys → a hash or
    sort-merge join, never a nested loop (SURVEY.md §4.2)."""
    plan = QUERIES["item_status"](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
    assert "BroadcastNestedLoopJoin" not in plan


def test_dims_are_broadcast(spark):
    """Small dims must broadcast in the flagship branch."""
    plan = QUERIES["item_status"](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_range_join_is_hash_join(spark):
    """The bucketed range join must plan a hash join on (key, bucket), not a
    pure-inequality nested loop. (range_join_events rotated back out of
    the driver's 50 slots in round 12 — the plan pin does NOT rotate with
    it; it reads the rotated catalog.)"""
    from etl_data_transformer_spark.catalog import ROTATED_QUERIES

    plan = (
        ROTATED_QUERIES["range_join_events"](spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or ("BroadcastHashJoin" in plan)
