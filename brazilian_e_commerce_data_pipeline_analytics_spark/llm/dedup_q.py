"""Registered near-dup queries over ``documents``.

``q45`` is exact and oracle-checked; ``q46``/``q47`` are the LSH scale
paths (hash functions are engine-specific, so the driver records the
weaker rows-only check — tests/test_dedup.py pins their semantics against
the exact variant instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
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
