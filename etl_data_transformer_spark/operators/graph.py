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
    algorithm: str = "label-propagation",
) -> DataFrame:
    """(id, cluster_id) with cluster_id = min id reachable over the
    undirected edge set (ids compare in their own type's order — longs
    numerically, strings lexicographically). Deterministic regardless of
    iteration order. One row per ``nodes`` id; edge endpoints missing from
    ``nodes`` participate in propagation (connectivity through them is
    preserved) but are not emitted. Raises ``RuntimeError`` if ``max_iter``
    rounds don't converge — a silent partial result would split clusters.

    ``algorithm`` (round 14, verdict r13 item 7):

    - ``"label-propagation"`` (default): one join + aggregation per
      round, O(E) shuffled work, converging in O(component DIAMETER)
      rounds — the right shape for near-dup clusters, whose blocking
      keeps diameters in the low single digits. A chain-shaped component
      longer than ``max_iter`` refuses (by design — see the raise).
    - ``"alternating"``: the large-star / small-star alternation
      (Kiveris et al., "Connected Components in MapReduce and Beyond",
      SoCC'14): each round rewires every node's strictly-larger
      neighbors to its neighborhood minimum (large-star), then collapses
      each node's smaller neighbors onto their minimum (small-star).
      Converges in O(log n) rounds REGARDLESS of diameter — the
      escape hatch for path-shaped graphs (e.g. chained similarity
      edges) the default shape refuses; same min-label result, pinned
      by an equivalence pytest including a path longer than the
      default's ``max_iter``."""
    if algorithm not in ("label-propagation", "alternating"):
        raise ValueError(
            f"algorithm must be 'label-propagation' or 'alternating': "
            f"got {algorithm!r}"
        )
    sym = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).unionByName(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    )
    sym = sym.localCheckpoint(eager=False)
    node_ids = nodes.select(F.col(id_col).alias("id"))
    all_ids = (
        node_ids.unionByName(sym.select(F.col("src").alias("id")))
        .distinct()
    )
    if algorithm == "alternating":
        labels = _alternating_labels(sym, all_ids, max_iter)
    else:
        labels = _propagation_labels(sym, all_ids, max_iter)
    return (
        labels.join(node_ids.distinct(), "id", "left_semi")
        .select(F.col("id"), F.col("lbl").alias("cluster_id"))
    )


def _propagation_labels(sym: DataFrame, all_ids: DataFrame, max_iter: int) -> DataFrame:
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
            "(component diameter exceeds max_iter) — raise max_iter, or "
            "use algorithm='alternating' (O(log n) rounds regardless of "
            "diameter)"
        )
    return labels


def _alternating_labels(sym: DataFrame, all_ids: DataFrame, max_iter: int) -> DataFrame:
    """Large-star / small-star fixpoint over canonical (hi, lo) edge
    pairs; at convergence the edge set is a union of stars, each rooted
    at its component's minimum id, read off as the labels. Same
    per-round hygiene as the propagation shape: ``localCheckpoint``
    truncates lineage, convergence is an exact edge-set equality (count
    + anti-join — both sides are distinct sets), and exhausting
    ``max_iter`` raises rather than returning split clusters."""
    d = (
        sym.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("hi"),
            F.least("src", "dst").alias("lo"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_prev = d.count()
    converged = n_prev == 0  # no edges: every node is its own star
    for _ in range(max_iter):
        if converged:
            break
        # large-star: every strictly-larger neighbor of u rewires to
        # m(u) = min(neighborhood(u) ∪ {u})
        s = d.select(F.col("hi").alias("src"), F.col("lo").alias("dst")).unionByName(
            d.select(F.col("lo").alias("src"), F.col("hi").alias("dst"))
        )
        mins = s.groupBy("src").agg(F.min("dst").alias("mn"))
        ls = (
            s.join(mins, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(
                F.col("dst").alias("hi"),
                F.least("src", "mn").alias("lo"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        # small-star: every smaller neighbor of u (and u itself)
        # collapses onto min(smaller-neighbors(u))
        mins2 = ls.groupBy("hi").agg(F.min("lo").alias("m"))
        new_d = (
            ls.join(mins2, "hi")
            .filter(F.col("lo") != F.col("m"))
            .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
            .unionByName(mins2.select(F.col("hi"), F.col("m").alias("lo")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_new = new_d.count()
        if n_new == n_prev:
            changed = (
                new_d.join(d, ["hi", "lo"], "left_anti").limit(1).count()
            )
            converged = changed == 0
        d, n_prev = new_d, n_new
    if not converged:
        raise RuntimeError(
            f"connected_components(algorithm='alternating') did not "
            f"converge in {max_iter} rounds — raise max_iter"
        )
    # at the star fixpoint every non-root appears as hi with its root as
    # lo (min defensively); roots appear only as lo and label themselves
    lbl = d.groupBy("hi").agg(F.min("lo").alias("__root"))
    return all_ids.join(
        lbl.select(F.col("hi").alias("id"), "__root"), "id", "left"
    ).select("id", F.coalesce("__root", F.col("id")).alias("lbl"))


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
