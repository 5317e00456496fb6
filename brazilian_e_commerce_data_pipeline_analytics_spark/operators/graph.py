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
- Convergence test is ``isEmpty()`` on the changed-label set: a
  short-circuit job that stops at the first changed row.
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

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iters):
        neighbor_min = sym.join(
            labels.withColumnRenamed("node", "b"), "b"
        ).select(F.col("a").alias("node"), "label")
        new_labels = (
            labels.unionByName(neighbor_min)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.withColumnRenamed("label", "new_label")
            .join(labels, "node")
            .filter(F.col("new_label") != F.col("label"))
        )
        done = changed.isEmpty()
        labels = new_labels
        if done:
            break
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
