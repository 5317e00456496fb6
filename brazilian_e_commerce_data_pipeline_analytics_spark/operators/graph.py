"""Iterative graph operators: connected components over pair relations.

The reference pipeline has no graph stage, but a dedup pipeline is
incomplete without one: near-dup detection (llm/dedup.py) emits PAIRS,
and the keep/drop decision needs per-document CLUSTER ids (each document
mapped to one canonical representative of its transitive duplicate
group). This module closes that gap with a pure-DataFrame iterative
min-label propagation — no GraphFrames dependency, no RDDs.

Scale notes (100 TB design):
- Each round is one shuffle join (edges x labels) + one shuffle agg,
  both on the node id — AQE handles skewed hub nodes. Label state is
  2 longs per node, tiny next to the edge relation.
- ``localCheckpoint`` after every round truncates lineage; without it
  the plan doubles per iteration and Catalyst analysis time explodes
  after ~10 rounds.
- Simple neighbor propagation converges in O(graph diameter) rounds.
  Near-duplicate clusters are dense and shallow (diameter 2-4 in
  practice), so this beats the O(log^2 n) large-star/small-star
  alternation (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SoCC'14) on constant factors; for adversarial long-chain
  graphs raise ``max_iters`` or switch to that alternation.
- Convergence probe is a scalar ``sum(label)`` per round: labels only
  ever decrease, so an unchanged sum means a fixed point — no
  join-based row comparison needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iters: int = 25,
) -> DataFrame:
    """(node, label) with label = min node id in the connected component.

    ``edges`` is treated as undirected; nodes appearing only as ``dst``
    are handled by symmetrizing. Nodes with no edges are absent from the
    result (callers map them to themselves, see ``canonical_docs``).
    Deterministic: min() over ids, no task-order dependence.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.localCheckpoint(eager=True)

    # seed with min(node, direct neighbors) — the first propagation
    # round folded into initialization for free
    labels = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.least(F.min("a"), F.min("b")).alias("label"))
        .localCheckpoint(eager=True)
    )

    # Convergence probe: labels only ever DECREASE (min of a set that
    # includes the old label), so any change strictly lowers
    # sum(label) — one scalar aggregate per round on the checkpointed
    # relation, cheaper than the old join-and-compare-rows check.
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iters):
        neighbor_min = sym.join(
            labels.withColumnRenamed("node", "b"), "b"
        ).select(F.col("a").alias("node"), "label")
        labels = (
            labels.unionByName(neighbor_min)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        new_sum = labels.agg(F.sum("label")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels


def canonical_docs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    pair_a: str,
    pair_b: str,
    max_iters: int = 25,
) -> DataFrame:
    """Per-document canonical assignment from a near-dup pair relation.

    Returns (id_col, canonical_id, cluster_size): ``canonical_id`` is the
    min doc id of the transitive duplicate cluster (documents in no pair
    are their own singleton cluster), ``cluster_size`` counts the
    cluster's members. Downstream keep/drop: keep ``id_col ==
    canonical_id``, drop the rest.
    """
    comp = connected_components(pairs, pair_a, pair_b, max_iters=max_iters)
    with_label = docs.select(F.col(id_col)).join(
        comp.withColumnRenamed("node", id_col), id_col, "left"
    )
    assigned = with_label.select(
        F.col(id_col),
        F.coalesce(F.col("label"), F.col(id_col)).alias("canonical_id"),
    )
    sizes = assigned.groupBy("canonical_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return assigned.join(sizes, "canonical_id").select(
        id_col, "canonical_id", "cluster_size"
    )
