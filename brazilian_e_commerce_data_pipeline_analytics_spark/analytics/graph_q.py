"""Iterative graph analytics over the mined co-purchase graph.

q128 runs PageRank on the support>=2 co-purchase edge set (the same
mined graph as q123's triangles; reference analog: the product-affinity
reporting family in ``spark_jobs/reporting.py`` stops at pair counts —
this is the centrality step after it).

Iterative algorithms are where naive DataFrame code falls over at
scale, so the shape here is deliberate:

* The JOIN-SIDE relations (symmetric edges, out-degrees, per-edge
  1/deg weights) are computed ONCE and cached — each power iteration
  re-reads them instead of re-mining the graph from lineitem.
* Each iteration is one shuffle: join rank vector to weighted edges on
  src (both sides hash-partitioned on the join key), aggregate
  contributions by dst with map-side combine.  The rank vector is
  node-sized, never edge-sized.
* The iteration count is FIXED and unrolled (3), so the logical plan
  stays shallow.  For deep iteration at 100 TB, truncate lineage every
  few rounds with ``df.localCheckpoint()`` — same pattern as the
  alternating large-star/small-star loop in ``operators/graph.py``,
  which carries the convergence-probe precedent.
* Scalars (N, teleport mass) ride along as broadcast 1-row relations;
  no ``.collect()`` anywhere.

Numerics: every per-element operation (1/deg, r*w, 0.15/N + 0.85*s) is
an exactly-rounded IEEE op on identical inputs in both engines; only
the SUM accumulation order differs, giving ~1-ulp skew that the final
ROUND(..., 8) absorbs.  The symmetric edge set guarantees every node
has in- and out-degree >= 1, so there is no dangling-mass term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_DAMP = 0.85
_TELE = 0.15
_ITERS = 3

_GRAPH_CTES = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
ed AS (SELECT pa AS src, pb AS dst FROM e UNION ALL SELECT pb, pa FROM e),
deg AS (SELECT src, COUNT(*) AS deg FROM ed GROUP BY src),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
w AS (SELECT ed.src, ed.dst, 1.0 / deg.deg AS invdeg FROM ed JOIN deg USING (src)),
r0 AS (SELECT src AS node, 1.0 / n.n AS pr FROM deg CROSS JOIN n)
"""

_ITER_SQL = """
r{i} AS (
  SELECT w.dst AS node, {tele} / n.n + {damp} * SUM(r{prev}.pr * w.invdeg) AS pr
  FROM w JOIN r{prev} ON r{prev}.node = w.src CROSS JOIN n
  GROUP BY w.dst, n.n
)"""

_Q128_ORACLE = (
    _GRAPH_CTES
    + ","
    + ",".join(
        _ITER_SQL.format(i=i, prev=i - 1, tele=_TELE, damp=_DAMP)
        for i in range(1, _ITERS + 1)
    )
    + f"""
SELECT r{_ITERS}.node AS part_id, CAST(deg.deg AS BIGINT) AS degree,
       ROUND(r{_ITERS}.pr, 8) AS pagerank
FROM r{_ITERS} JOIN deg ON deg.src = r{_ITERS}.node
"""
)


@register("q128_pagerank_copurchase", oracle=_Q128_ORACLE, tags=("graph", "iterative"))
def q128_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
        .select("pa", "pb")
    )
    ed = (
        e.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .unionAll(e.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
        .cache()
    )
    deg = ed.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).cache()
    w = (
        ed.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("invdeg"))
        .cache()
    )
    nb = deg.agg(F.count(F.lit(1)).cast("double").alias("n"))
    r = (
        deg.select(F.col("src").alias("node"))
        .crossJoin(F.broadcast(nb))
        .select("node", (F.lit(1.0) / F.col("n")).alias("pr"))
    )
    for _ in range(_ITERS):
        r = (
            w.join(r, w["src"] == r["node"])
            .groupBy(w["dst"])
            .agg(F.sum(F.col("pr") * F.col("invdeg")).alias("s"))
            .crossJoin(F.broadcast(nb))
            .select(
                F.col("dst").alias("node"),
                (F.lit(_TELE) / F.col("n") + F.lit(_DAMP) * F.col("s")).alias("pr"),
            )
        )
    return (
        r.join(deg, r["node"] == deg["src"])
        .select(
            F.col("node").alias("part_id"),
            F.col("deg").alias("degree"),
            F.round("pr", 8).alias("pagerank"),
        )
    )


# ---------------------------------------------------------------------------
# q258: connected components via STAR alternation under the driver gate.
# Label propagation (q82/q136's engine) converges in O(diameter)
# rounds — fatal on long-chain graphs; the large-star/small-star
# alternation (Kiveris et al., "Connected Components in MapReduce and
# Beyond") converges in O(log^2 n) rounds of the same equi-join shape.
# tests/test_operators.py pins the round bound on a 1000-node path;
# this registers the algorithm's OUTPUT under the hash gate on the
# q194-style sparse co-purchase slice (partkey%20=0, orderkey%7=0 —
# 14 components over 62 nodes at sf0.01, genuinely non-vacuous —
# small enough that DuckDB's recursive closure replays it exactly).
# Both algorithms must produce identical labels; the oracle is
# algorithm-free (min reachable id), so a green row certifies either.
# ---------------------------------------------------------------------------

_Q258_ORACLE = """
WITH RECURSIVE
pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_partkey % 20 = 0 AND b.l_partkey % 20 = 0
    AND a.l_orderkey % 7 = 0
),
edges AS (
  SELECT src, dst FROM pairs
  UNION
  SELECT dst, src FROM pairs
),
walk(node, reach) AS (
  SELECT src AS node, src AS reach FROM edges
  UNION
  SELECT w.node, e.dst FROM walk w JOIN edges e ON e.src = w.reach
),
labels AS (
  SELECT node, LEAST(node, MIN(reach)) AS label FROM walk GROUP BY node
)
SELECT label AS component_id,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       MIN(node) AS min_part,
       MAX(node) AS max_part
FROM labels
GROUP BY label
"""


@register("q258_star_components", oracle=_Q258_ORACLE, tags=("graph", "cc", "star"))
def q258_star_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_partkey") % 20 == 0) & (F.col("l_orderkey") % 7 == 0)
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    comp = connected_components(pairs, "src", "dst", algorithm="star")
    return comp.groupBy(F.col("label").alias("component_id")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("node").alias("min_part"),
        F.max("node").alias("max_part"),
    )
