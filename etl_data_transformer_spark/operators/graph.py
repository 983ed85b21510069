"""Graph operators: connected components for near-dup cluster resolution.

Near-dup detection (MinHash / SimHash / n-gram Jaccard) produces PAIRS; the
curation step needs CLUSTERS — each document assigned the minimum reachable
doc id as its canonical keeper. Components are computed by iterative
min-label propagation, the Spark-idiomatic fixpoint shape (the same loop
Pregel/GraphFrames runs):

- each iteration is one join + one aggregation (label := min over self and
  neighbors) — O(E) shuffled work, converging in O(component diameter)
  rounds;
- ``localCheckpoint`` per round truncates the lineage so the plan doesn't
  grow with iterations (the classic iterative-algorithm failure mode);
- convergence is an exact changed-label count per round (a self-join on the
  stable id set). The earlier label-SUM check was subtly wrong twice over
  (round-6 review): an edge endpoint absent from ``nodes`` ADDS a label
  row mid-loop, letting a sum coincidence fake a fixpoint with a split
  cluster; and non-numeric ids cast to NULL made the sum None on both
  sides, "converging" instantly with all-NULL output. Labels now keep the
  id's own type (strings work), the seed set is nodes ∪ edge endpoints
  (stable row count, and connectivity THROUGH a filtered-out doc still
  links its neighbors), and exhausting ``max_iter`` without convergence
  RAISES instead of returning partially-propagated clusters.

Near-dup blocking bounds component diameter in practice (dup clusters are
dense), so rounds stay in the low single digits at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(id, cluster_id) with cluster_id = min id reachable over the
    undirected edge set (ids compare in their own type's order — longs
    numerically, strings lexicographically). Deterministic regardless of
    iteration order. One row per ``nodes`` id; edge endpoints missing from
    ``nodes`` participate in propagation (connectivity through them is
    preserved) but are not emitted. Raises ``RuntimeError`` if ``max_iter``
    rounds don't converge — a silent partial result would split clusters."""
    sym = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).unionByName(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    )
    sym = sym.localCheckpoint(eager=False)
    node_ids = nodes.select(F.col(id_col).alias("id"))
    all_ids = (
        node_ids.unionByName(sym.select(F.col("src").alias("id")))
        .distinct()
    )
    labels = all_ids.select("id", F.col("id").alias("lbl")).localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        prop = sym.join(labels, sym["src"] == labels["id"]).select(
            F.col("dst").alias("id"), F.col("lbl")
        )
        new_labels = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("p"), "id")
            .filter(F.col("n.lbl") != F.col("p.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter exceeds max_iter) — raise max_iter"
        )
    return (
        labels.join(node_ids.distinct(), "id", "left_semi")
        .select(F.col("id"), F.col("lbl").alias("cluster_id"))
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Resolve near-dup pairs (id_a, id_b) into clusters: every doc mapped
    to its cluster's canonical keeper (the minimum doc id). Docs in no pair
    are their own cluster."""
    nodes = docs.select(F.col(id_col).alias("id"))
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    return connected_components(nodes, edges).select(
        F.col("id").alias(id_col), "cluster_id"
    )
