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


# ---------------------------------------------------------------------------
# q317: triangle counting + global clustering coefficient — the third
# graph operator (q128 PageRank, q258/q82 connected components): how
# clustered the co-purchase graph is, the structural metric behind
# community detection and recommendation-quality audits. Edges = the
# q258-style sparsified co-purchase slice (parts sharing an order),
# undirected, deduplicated as src < dst.
#
# Scale: the naive triangle join explodes on hubs (a degree-d node
# contributes d^2 wedge candidates). The standard distributed fix
# (Suri & Vassilvitskii 2011's MR triangle counting) ORIENTS each edge
# from the lower-(degree, id) endpoint to the higher one — every
# triangle is counted exactly once at its lowest-ranked vertex, and
# wedge generation is bounded by sum(d+^2) where d+ <= sqrt(2m), i.e.
# O(m^1.5) total instead of sum(d^2) on raw degrees. The builder
# implements the oriented form; the ORACLE replays the simple
# a<b<c three-way join (same count, no scalability needed in DuckDB)
# — the equality of the two IS the orientation argument's correctness.
# n_wedges = sum(d*(d-1)/2) over unoriented degrees (integer exact);
# clustering coefficient = 3*triangles/wedges, round6.
# ---------------------------------------------------------------------------

_Q317_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem
  WHERE l_partkey % 10 = 0 AND l_orderkey % 3 = 0
),
e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT node, COUNT(*) AS d FROM (
    SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e
  ) GROUP BY 1
),
tri AS (
  SELECT COUNT(*) AS t
  FROM e ab
  JOIN e ac ON ab.src = ac.src AND ab.dst < ac.dst
  JOIN e bc ON bc.src = ab.dst AND bc.dst = ac.dst
)
SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
       CAST((SELECT SUM(d * (d - 1) // 2) FROM deg) AS BIGINT) AS n_wedges,
       CAST((SELECT t FROM tri) AS BIGINT) AS n_triangles,
       round(3.0 * (SELECT t FROM tri)
             / (SELECT SUM(d * (d - 1) // 2) FROM deg), 6) AS clustering_coeff
"""


@register(
    "q317_triangle_count",
    oracle=_Q317_ORACLE,
    tags=("graph", "triangles", "clustering"),
)
def q317_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_partkey") % 10 == 0) & (F.col("l_orderkey") % 3 == 0)
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("dst"))
    e = (
        a.join(b, "l_orderkey")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
        .cache()  # feeds degrees, orientation, and the closing join
    )
    deg = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient each edge low-(degree, id) -> high-(degree, id): every
    # triangle is generated exactly once, wedge fan-out bounded by the
    # oriented out-degree (<= sqrt(2m)) instead of the raw degree
    da = deg.select(F.col("node").alias("src"), F.col("d").alias("__ds"))
    db = deg.select(F.col("node").alias("dst"), F.col("d").alias("__dd"))
    ed = e.join(da, "src").join(db, "dst")
    fwd = (F.col("__ds") < F.col("__dd")) | (
        (F.col("__ds") == F.col("__dd")) & (F.col("src") < F.col("dst"))
    )
    oriented = ed.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("lo"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("hi"),
        F.when(fwd, F.col("__ds")).otherwise(F.col("__dd")).alias("__dlo"),
        F.when(fwd, F.col("__dd")).otherwise(F.col("__ds")).alias("__dhi"),
    )
    o1 = oriented.select("lo", F.col("hi").alias("v"), F.col("__dhi").alias("__dv"))
    o2 = oriented.select("lo", F.col("hi").alias("w"), F.col("__dhi").alias("__dw"))
    # wedges at the lowest-ranked vertex; (v, w) ordered by the SAME
    # rank so each wedge is generated once
    wedges = o1.join(o2, "lo").filter(
        (F.col("__dv") < F.col("__dw"))
        | ((F.col("__dv") == F.col("__dw")) & (F.col("v") < F.col("w")))
    )
    closing = oriented.select(F.col("lo").alias("v"), F.col("hi").alias("w"))
    tri = wedges.join(closing, ["v", "w"], "left_semi")
    n_tri = tri.agg(F.count(F.lit(1)).alias("t"))
    n_wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).alias("nw"),
        F.count(F.lit(1)).alias("nn"),
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("ne"))
    return (
        n_wedges.crossJoin(n_edges)
        .crossJoin(n_tri)
        .select(
            F.col("nn").cast("bigint").alias("n_nodes"),
            F.col("ne").cast("bigint").alias("n_edges"),
            F.col("nw").cast("bigint").alias("n_wedges"),
            F.col("t").cast("bigint").alias("n_triangles"),
            F.round(F.lit(3.0) * F.col("t") / F.col("nw"), 6).alias(
                "clustering_coeff"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q321: entity resolution (record linkage) — the pipeline that turns
# q84's fuzzy PAIRS into canonical ENTITIES: block -> match ->
# transitive closure -> canonical record, the standard dedup shape for
# catalogs/profiles/vendors. Listings = every part row under a
# deterministic per-row corruption (p_partkey % 3: char-3 deletion /
# verbatim / first-char case flip — replayable in SQL, the codecs-
# fixture discipline), so each true entity surfaces as up to 3 spelling
# variants hubbed on the verbatim form.
#
# Matching: candidate pairs only WITHIN a blocking key (first two
# lowercased chars — stable under both corruptions), edge iff
# levenshtein <= 1. The threshold is chosen from measured corpus
# geometry: distinct true names are pairwise >= 3 apart (probed at all
# three SFs), variants sit exactly 1 from their origin, so cross-entity
# edges are impossible (3 - 1 = 2 > 1) — the blocking+threshold choice
# IS the precision argument. Clustering: the min-label connected-
# components operator (q82/q258's); singleton variants map to
# themselves (canonical_docs' rule). Canonical name = min(label);
# inventory carries variant and listing counts.
#
# Scale: pairs are generated per block (never |names|^2 across blocks),
# the name-level graph is tiny relative to listings (cluster over the
# DISTINCT spellings, join listings back by name), CC is the
# O(diameter) propagate variant — ER clusters are stars, diameter 2.
# The CC operator's convergence probe sums labels, so nodes must be
# numeric AND sum-safe (60-bit hash ids overflow the probe's BIGINT
# sum under ANSI): each name's id is its MIN listing_id — small,
# dense, deterministic. The canonical name is min(name) within each
# cluster, so the label domain never leaks into the output and the
# string-label oracle agrees without replaying the ids.
# ---------------------------------------------------------------------------

_Q321_VARIANT_DUCK = """
CASE p_partkey % 3
  WHEN 0 THEN substr(p_name, 1, 2) || substr(p_name, 4)
  WHEN 1 THEN p_name
  ELSE upper(substr(p_name, 1, 1)) || substr(p_name, 2)
END
"""

_Q321_ORACLE = f"""
WITH RECURSIVE
listings AS (
  SELECT p_partkey AS listing_id, {_Q321_VARIANT_DUCK} AS name
  FROM part
),
names AS (SELECT DISTINCT name FROM listings),
pairs AS (
  SELECT a.name AS src, b.name AS dst
  FROM names a JOIN names b
    ON lower(substr(a.name, 1, 2)) = lower(substr(b.name, 1, 2))
   AND a.name < b.name
  WHERE levenshtein(a.name, b.name) <= 1
),
edges AS (
  SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs
),
walk(node, reach) AS (
  SELECT src AS node, src AS reach FROM edges
  UNION
  SELECT w.node, e.dst FROM walk w JOIN edges e ON e.src = w.reach
),
cc AS (
  SELECT node, LEAST(node, MIN(reach)) AS label FROM walk GROUP BY node
),
labeled AS (
  SELECT n.name, COALESCE(cc.label, n.name) AS entity
  FROM names n LEFT JOIN cc ON cc.node = n.name
)
SELECT MIN(l.name) AS canonical_name,
       CAST(COUNT(DISTINCT l.name) AS BIGINT) AS n_variants,
       CAST(COUNT(*) AS BIGINT) AS n_listings,
       MIN(li.listing_id) AS min_listing
FROM labeled l JOIN listings li ON li.name = l.name
GROUP BY l.entity
"""


@register(
    "q321_entity_resolution",
    oracle=_Q321_ORACLE,
    tags=("graph", "dedup", "entity-resolution", "fuzzy"),
)
def q321_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components

    variant = F.expr(
        """
        CASE p_partkey % 3
          WHEN 0 THEN concat(substring(p_name, 1, 2), substring(p_name, 4))
          WHEN 1 THEN p_name
          ELSE concat(upper(substring(p_name, 1, 1)), substring(p_name, 2))
        END
        """
    )
    listings = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("listing_id"), variant.alias("name")
    )
    names = listings.groupBy("name").agg(F.min("listing_id").alias("nid"))
    a = names.select(F.col("name").alias("name_a"), F.col("nid").alias("nid_a"))
    b = names.select(F.col("name").alias("name_b"), F.col("nid").alias("nid_b"))
    edges = (
        a.join(
            b,
            (
                F.lower(F.substring("name_a", 1, 2))
                == F.lower(F.substring("name_b", 1, 2))
            )
            & (F.col("name_a") < F.col("name_b")),
        )
        .filter(F.levenshtein("name_a", "name_b") <= 1)
        .select("nid_a", "nid_b")
    )
    cc = connected_components(edges, "nid_a", "nid_b")
    labeled = names.join(cc, names["nid"] == cc["node"], "left").select(
        "name", F.coalesce(F.col("label"), F.col("nid")).alias("entity")
    )
    return (
        listings.join(labeled, "name")
        .groupBy("entity")
        .agg(
            F.min("name").alias("canonical_name"),
            F.countDistinct("name").alias("n_variants"),
            F.count(F.lit(1)).alias("n_listings"),
            F.min("listing_id").alias("min_listing"),
        )
        .drop("entity")
        .select("canonical_name", "n_variants", "n_listings", "min_listing")
    )
