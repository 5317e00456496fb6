"""Near-duplicate detection operators for document corpora.

Three scales of the same problem:

- ``shingle_pairs_exact``: exact n-gram Jaccard over candidate pairs found
  by an inverted-index join on shared shingles. The prefilter is LOSSLESS
  (any pair with Jaccard > 0 shares >= 1 shingle) so the result is exact —
  and fully SQL-expressible, which gives us a DuckDB oracle. Cost is
  bounded by sum over shingles of (docs-per-shingle choose 2); fine while
  shingle frequencies are modest.
- ``minhash_signatures`` / ``lsh_candidate_pairs``: MinHash + banded LSH.
  The scale path: candidate generation cost is (docs x bands), independent
  of pairwise counts; candidates are then verified with exact Jaccard.
  Hash = xxhash64(shingle, seed) — JVM built-in, whole-stage codegen, no
  Python. Subsamples nothing; recall is probabilistic in the usual
  banded-LSH way.
- ``simhash64``: 64-bit SimHash from per-token xxhash64 bit votes;
  near-dups are pairs at small Hamming distance, banded on 16-bit chunks
  (any pair with distance <= 3 shares at least one of 4 chunks exactly).

All are built-in-expression plans (arrays + lambdas), no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _shingles_from_tokens(toks: Column, n: int) -> Column:
    sh = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(sh)


def word_shingles(text_col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (array<string>).

    Documents shorter than ``n`` tokens yield an empty array.

    NOTE: this inline form evaluates the tokenizing regexp three times
    per row (Catalyst does not CSE across lambda scopes) — fine for
    one-off use; hot paths should go through :func:`with_shingles`.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return _shingles_from_tokens(F.regexp_extract_all(c, F.lit(r"\S+"), 0), n)


def with_shingles(
    df: DataFrame, text_col: str, n: int = 3, out: str = "__sh"
) -> DataFrame:
    """``df`` plus a shingle-array column, tokenizing ONCE per row.

    The token array gets its own projection; CollapseProject keeps a
    non-cheap expression referenced 3x from being inlined, so the
    regexp runs once instead of three times (measured ~7x faster on the
    documents table than the inline form).
    """
    toks = F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0)
    return (
        df.withColumn("__toks", toks)
        .withColumn(out, _shingles_from_tokens(F.col("__toks"), n))
        .drop("__toks")
    )


def exploded_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) rows — the inverted-index relation.

    Deliberately the INLINE shingle expression: Generate fuses with its
    generator, and measured cold+warm this beats pre-materializing the
    array column 2.5x (the opposite tradeoff from minhash_signatures,
    which reuses the array k times and wants :func:`with_shingles`).
    """
    return df.select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("shingle")
    )


def shingle_pairs_exact(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.05,
    max_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs via shared-shingle join.

    |A ∩ B| falls out of the join's group count; |A| and |B| come from the
    per-doc shingle counts; union = |A| + |B| - |A ∩ B|. Every quantity is
    an integer, so the Jaccard division is bit-identical across engines.

    ``max_df`` is the corpus-scale knob: the join cost is
    sum_over_shingles(df_s choose 2), quadratic in the hottest shingle's
    document frequency. Capping drops shingles with df > max_df from the
    JOIN side only (per-doc sizes still count them), which makes the
    computed intersection a lower bound — pairs can only be missed, never
    over-scored, and only pairs whose entire overlap is stop-shingles are
    affected. Default None = exact.
    """
    # The self-join shuffle DOMINATES this plan, so keep its rows as
    # narrow as possible: (id, shingle) only. The tempting "fusion" —
    # carrying the per-doc size alongside every exploded row so the join
    # yields n_a/n_b inline — removes two joins and a groupBy but widens
    # BOTH shuffle sides by 8 bytes/row, and measured 50% SLOWER at
    # sf0.1 (8.0s vs 5.4s). The sizes relation is one row per doc and
    # joins back cheaply (AQE broadcasts it whenever it fits). Same
    # logic holds at cluster scale: never widen the dominant shuffle to
    # save two cheap post-aggregation joins.
    ex = exploded_shingles(df, id_col, text_col, n).cache()
    # cached: referenced twice (doc_a and doc_b side) — recomputing the
    # tokenize+shingle subplan per side measures ~3x slower at sf0.1
    sizes = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh")).cache()
    join_ex = ex
    if max_df is not None:
        # per-doc sizes still count capped shingles (sizes is built from
        # the uncapped ex), so capping only ever LOWERS the computed
        # intersection
        keep = (
            ex.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_df)
            .select("shingle")
        )
        join_ex = ex.join(F.broadcast(keep), "shingle")
    a = join_ex.alias("a")
    b = join_ex.alias("b")
    common = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    # sizes is one row per DOC — small relative to the pair relation but
    # unbounded at corpus scale, so no forced broadcast; AQE picks
    # broadcast when it fits and falls back to shuffle join when not
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_common"))
        .withColumn("jaccard", F.col("n_common") / F.col("n_union"))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "n_union", "jaccard")
    )


def _signatures_from_shingle_arrays(
    sh: DataFrame, id_col: str, shingles_col: str, k: int
) -> DataFrame:
    """(id, signature array<bigint>) from a (id, shingle-array) relation.

    Explode + one groupBy with k ``min(...)`` aggs: map-side partial
    aggregation reduces the shuffle to docs x k longs (never the shingle
    strings), and measured 3x faster than computing the same hashes with
    nested array transforms inside a projection.

    Each shingle STRING is hashed exactly once (xxhash64 over the bytes);
    the k permutations re-hash the resulting 8-byte value with seed s —
    O(1) per permutation instead of O(len(shingle)), measured ~2x faster
    at k=32 with the same uniformity (xxhash64 of a uniform long stays
    uniform).
    """
    ex = sh.select(F.col(id_col), F.explode(shingles_col).alias("__shingle")).select(
        F.col(id_col), F.xxhash64("__shingle").alias("__h0")
    )
    aggs = [F.min(F.xxhash64("__h0", F.lit(s))).alias(f"__h{s}") for s in range(k)]
    return (
        ex.groupBy(id_col)
        .agg(*aggs)
        .select(
            F.col(id_col),
            F.array(*[f"__h{s}" for s in range(k)]).alias("signature"),
        )
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, k: int = 32
) -> DataFrame:
    """k-permutation MinHash signature per document (array<bigint>).

    h_s(doc) = min over shingles of xxhash64(shingle, s). Documents with
    no shingles are dropped (no meaningful signature).
    """
    sh = with_shingles(df, text_col, n).filter(F.size("__sh") > 0)
    return _signatures_from_shingle_arrays(sh, id_col, "__sh", k)


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, bands: int = 8, rows: int = 4
) -> DataFrame:
    """Banded-LSH candidate pairs: equal signature slice in >= 1 band.

    Emits distinct (doc_a < doc_b) pairs. Shuffle cost: docs x bands rows
    keyed by (band, band-hash) — the scalable alternative to the quadratic
    shared-shingle join when shingle frequencies are high.
    """
    banded = signatures.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(F.slice(F.col("signature"), b * rows + 1, rows)).alias(
                        "bucket"
                    ),
                ),
            )
        ).alias("bb"),
    ).select(F.col(id_col), F.col("bb.band"), F.col("bb.bucket"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


def minhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.05,
) -> DataFrame:
    """LSH candidates verified with exact Jaccard on their shingle sets.

    Output schema matches :func:`shingle_pairs_exact`; on corpora where
    banded LSH reaches the pairs at all, the verified output is a subset
    of the exact result (equal when recall is 1).
    """
    rows = k // bands
    # cache the shingle ARRAYS once; signatures and the exact-verify
    # joins both derive from them without recomputing the tokenizing
    sh = (
        with_shingles(df, text_col, n)
        .filter(F.size("__sh") > 0)
        .select(F.col(id_col), F.col("__sh").alias("shingles"))
        .cache()
    )
    sigs = _signatures_from_shingle_arrays(sh, id_col, "shingles", k)
    cands = lsh_candidate_pairs(sigs, id_col, bands, rows)
    sh_a = sh.select(F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a"))
    sh_b = sh.select(F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b"))
    return (
        cands.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn("n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "n_union", F.size("sh_a") + F.size("sh_b") - F.col("n_common")
        )
        .withColumn("jaccard", F.col("n_common") / F.col("n_union"))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "n_union", "jaccard")
    )


def simhash64_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, sh) with a 64-bit SimHash as a 64-char bit string (MSB first).

    Shaped for scale: explode distinct tokens, hash each once with
    xxhash64, then ONE hash aggregation computes all 64 bit votes
    (sum of +-1 per bit) — vectorized JVM aggregation, no nested array
    folds, one shuffle on the doc id. A bit-string output avoids signed-64
    arithmetic pitfalls and makes Hamming distance a character comparison.
    """
    c = F.col(text_col) if isinstance(text_col, str) else F.col(text_col)
    toks = F.array_distinct(F.regexp_extract_all(c, F.lit(r"\S+"), 0))
    tok_hash = df.select(
        F.col(id_col), F.explode(toks).alias("__tok")
    ).withColumn("__h", F.xxhash64("__tok"))
    votes = tok_hash.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    bits = [
        F.when(F.col(f"b{b}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for b in range(63, -1, -1)
    ]
    return votes.select(F.col(id_col), F.concat(*bits).alias("sh"))


def simhash_near_dups(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 8
) -> DataFrame:
    """Pairs with SimHash Hamming distance <= ``max_hamming``, banded on
    four 16-bit chunks (lossless for distance <= 3; heuristic above)."""
    hashed = simhash64_table(df, id_col, text_col)
    chunks = hashed.select(
        F.col(id_col),
        F.col("sh"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda i: F.struct(
                    i.alias("chunk_id"),
                    F.substring(F.col("sh"), i * 16 + 1, 16).alias("chunk"),
                ),
            )
        ).alias("cc"),
    ).select(F.col(id_col), F.col("sh"), F.col("cc.chunk_id"), F.col("cc.chunk"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.size(
        F.filter(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: F.substring(F.col("sh_a"), i, F.lit(1))
            != F.substring(F.col("sh_b"), i, F.lit(1)),
        )
    )
    return (
        cands.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
