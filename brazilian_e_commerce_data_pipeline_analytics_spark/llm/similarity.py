"""Embedding similarity search over array<float> columns.

Built-in higher-order functions only (``zip_with`` + ``aggregate`` fold):
the dot product runs as JVM codegen per row — no Python, no UDF. Floats
are widened to double *before* multiplying so the arithmetic matches what
any double-precision oracle computes; scores are rounded to 6 decimals to
absorb sub-ulp accumulation-order differences across engines.

Scale paths:
- ``knn_bruteforce``: broadcast the (small) query set, stream the corpus
  once, per-partition top-k via the rank window on the query key. Exact;
  O(|corpus| x |queries|).
- ``random_hyperplane_ann``: deterministic sign-LSH bucketing (integer-
  arithmetic hyperplanes, so an SQL oracle can replay them bit-for-bit);
  queries only compare within their bucket — O(|corpus| x |queries| / 2^p)
  at the usual LSH recall tradeoff.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right double fold of the elementwise product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, digits: int = 6) -> Column:
    """Cosine similarity rounded to ``digits`` decimals."""
    return F.round(dot(a, b) / (l2_norm(a) * l2_norm(b)), digits)


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, score, rank), self-matches excluded,
    deterministic order (score desc, neighbor_id asc).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def similar_pairs_within(
    df: DataFrame,
    block_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
) -> DataFrame:
    """All pairs within a blocking key whose cosine >= threshold.

    Embedding near-dup detection with deterministic blocking; the block
    self-join shuffles on the block key only.
    """
    x = df.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id_a"),
        as_double(F.col(vec_col)).alias("v_a"),
    )
    y = df.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id_b"),
        as_double(F.col(vec_col)).alias("v_b"),
    )
    return (
        x.join(y, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("score", cosine(F.col("v_a"), F.col("v_b")))
        .filter(F.col("score") >= threshold)
        .select(F.col("block"), F.col("id_a"), F.col("id_b"), F.col("score"))
    )


# --- deterministic sign-LSH -------------------------------------------------

_HP_MULT = 2654435761  # Knuth multiplicative-hash constant


def hyperplane_component(j: Column, p: int) -> Column:
    """w^(p)_j in [-1, 1): pure integer arithmetic, identical in any SQL
    engine — ((j*73 + p*1371) * 2654435761) % 2000 / 1000 - 1."""
    base = (j.cast("bigint") * 73 + F.lit(p * 1371)) * F.lit(_HP_MULT)
    return (base % 2000) / F.lit(1000.0) - F.lit(1.0)


def lsh_bucket(vec_d: Column, n_planes: int = 4) -> Column:
    """Sign-LSH bucket id in [0, 2^n_planes): bit p = [dot(v, w^p) > 0]."""
    bucket = F.lit(0)
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec_d,
                F.transform(
                    F.sequence(F.lit(0), F.size(vec_d) - 1),
                    lambda j: hyperplane_component(j, p),
                ),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(2**p)).otherwise(F.lit(0))
    return bucket


def ann_bucketed(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_planes: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    Deterministic by construction (integer hyperplanes), so its *exact*
    output — bucket assignment included — is reproducible by an SQL
    oracle; recall vs brute force is the usual sign-LSH tradeoff.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("c_vec")
    ).withColumn("bucket", lsh_bucket(F.col("c_vec"), n_planes))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("q_vec")
    ).withColumn("bucket", lsh_bucket(F.col("q_vec"), n_planes))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "bucket", "neighbor_id", "score", "rank")
    )
