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
- convergence is detected by the label-sum: min-propagation only ever
  lowers labels, so an unchanged sum IS the fixpoint — one cheap scalar
  action per round instead of a full diff join.

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
    """(id, cluster_id) with cluster_id = min node id reachable over the
    undirected edge set. Deterministic regardless of iteration order."""
    sym = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).unionByName(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    )
    sym = sym.localCheckpoint(eager=False)
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).cast("long").alias("lbl"))
    labels = labels.localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("lbl")).collect()[0][0]
    for _ in range(max_iter):
        prop = sym.join(labels, sym["src"] == labels["id"]).select(
            F.col("dst").alias("id"), F.col("lbl")
        )
        labels = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("lbl")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(F.col("id"), F.col("lbl").alias("cluster_id"))


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
