"""Registered near-dup queries over ``documents``.

``q45`` is exact and oracle-checked; ``q46``/``q47`` are the LSH scale
paths (hash functions are engine-specific, so the driver records the
weaker rows-only check — tests/test_dedup.py pins their semantics against
the exact variant instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.graph import canonical_docs
from ..registry import register
from .dedup import minhash_near_dups, shingle_pairs_exact, simhash_near_dups

_Q45_ORACLE = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, len(t) - 2),
           i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
         )) AS shingles
  FROM toks
  WHERE len(t) >= 3
),
ex AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM sh
),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM ex GROUP BY 1
),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM ex a
  JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a,
       doc_b,
       n_common,
       sa.n_sh + sb.n_sh - n_common AS n_union,
       n_common / (sa.n_sh + sb.n_sh - n_common) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.05
"""


@register("q45_ngram_jaccard_pairs", oracle=_Q45_ORACLE, tags=("dedup", "llm"))
def q45_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return shingle_pairs_exact(d, "doc_id", "text", n=3, threshold=0.05)


@register("q46_minhash_lsh_pairs", oracle=None, tags=("dedup", "lsh", "llm"))
def q46_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return minhash_near_dups(d, "doc_id", "text", n=3, k=32, bands=8, threshold=0.05)


@register("q47_simhash_pairs", oracle=None, tags=("dedup", "simhash", "llm"))
def q47_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return simhash_near_dups(d, "doc_id", "text", max_hamming=8)


# ---------------------------------------------------------------------------
# q68: SimHash with a VALUE-level oracle. q47's production SimHash hashes
# tokens with xxhash64 (JVM-only), so it gets a rows-only check; this
# twin derives 60-bit token values from an md5 prefix — replayable in
# any SQL engine — and DuckDB recomputes all 60 bit votes exactly.
# 60 bits (15 hex chars) keeps the value inside BIGINT on both sides.
# ---------------------------------------------------------------------------

_N_BITS = 60
_DUCK_TOKVAL = "CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)"
_DUCK_BITS = " || ".join(
    f"(CASE WHEN SUM(CASE WHEN (v >> {b}) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
    "THEN '1' ELSE '0' END)"
    for b in range(_N_BITS - 1, -1, -1)
)

_Q68_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {_DUCK_TOKVAL} AS v
  FROM (
    SELECT doc_id, unnest(list_distinct(regexp_extract_all(text, '\\S+'))) AS t
    FROM documents
  )
)
SELECT doc_id, {_DUCK_BITS} AS sh
FROM tok
GROUP BY doc_id
"""


@register("q68_simhash_portable", oracle=_Q68_ORACLE, tags=("dedup", "simhash", "llm"))
def q68_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0))
    tok_val = F.conv(F.substring(F.md5("__tok"), 1, 15), 16, 10).cast("bigint")
    exploded = d.select("doc_id", F.explode(toks).alias("__tok")).withColumn(
        "__v", tok_val
    )
    votes = exploded.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("__v"), b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{b}")
            for b in range(_N_BITS)
        ]
    )
    bits = [
        F.when(F.col(f"b{b}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for b in range(_N_BITS - 1, -1, -1)
    ]
    return votes.select("doc_id", F.concat(*bits).alias("sh"))


# ---------------------------------------------------------------------------
# q81: df-capped exact Jaccard — the corpus-scale configuration of q45.
# Shingles appearing in more than max_df documents are dropped from PAIR
# GENERATION (per-doc sizes still count them), so every reported score is
# a conservative lower bound. Physically this takes the per-shingle
# doc-list plan (one shuffle of the exploded relation; pair arrays
# bounded by the cap) instead of q45's self-join — see llm/dedup.py.
# ---------------------------------------------------------------------------

_Q81_ORACLE = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, len(t) - 2),
           i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
         )) AS shingles
  FROM toks
  WHERE len(t) >= 3
),
ex AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM sh
),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM ex GROUP BY 1
),
qualified AS (
  SELECT shingle FROM ex GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 20
),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM ex a
  JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  WHERE a.shingle IN (SELECT shingle FROM qualified)
  GROUP BY 1, 2
)
SELECT doc_a,
       doc_b,
       n_common,
       sa.n_sh + sb.n_sh - n_common AS n_union,
       n_common / (sa.n_sh + sb.n_sh - n_common) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.05
"""


@register("q81_ngram_jaccard_capped", oracle=_Q81_ORACLE, tags=("dedup", "llm", "scale-knob"))
def q81_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return shingle_pairs_exact(d, "doc_id", "text", n=3, threshold=0.05, max_df=20)


# ---------------------------------------------------------------------------
# q82: duplicate-cluster assignment — the stage AFTER pair detection.
# Near-dup pairs (exact Jaccard >= 0.4) become an undirected graph;
# iterative min-label propagation (operators/graph.py) assigns every
# document the min doc_id of its transitive duplicate cluster, singletons
# map to themselves. This is the keep/drop decision of a corpus dedup
# pipeline: keep doc_id == canonical_id. Oracle replays the transitive
# closure with a recursive CTE — exact, including singleton handling.
# ---------------------------------------------------------------------------

_Q82_ORACLE = """
WITH RECURSIVE
toks AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, len(t) - 2),
           i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
         )) AS shingles
  FROM toks
  WHERE len(t) >= 3
),
ex AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM sh
),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM ex GROUP BY 1
),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM ex a
  JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.4
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
walk(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT w.a, e.b FROM walk w JOIN edges e ON w.b = e.a
),
comp AS (
  SELECT a AS node, LEAST(a, MIN(b)) AS label FROM walk GROUP BY a
),
assigned AS (
  SELECT d.doc_id, COALESCE(c.label, d.doc_id) AS canonical_id
  FROM documents d
  LEFT JOIN comp c ON c.node = d.doc_id
)
SELECT a.doc_id, a.canonical_id, s.cluster_size
FROM assigned a
JOIN (
  SELECT canonical_id, COUNT(*) AS cluster_size FROM assigned GROUP BY 1
) s USING (canonical_id)
"""


@register("q82_dup_clusters", oracle=_Q82_ORACLE, tags=("dedup", "graph", "llm"))
def q82_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = shingle_pairs_exact(d, "doc_id", "text", n=3, threshold=0.4)
    return canonical_docs(d, pairs, "doc_id", "doc_a", "doc_b")
