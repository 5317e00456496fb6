"""Semantic invariants for the sketch-family queries (q125/q126/q127)
beyond the oracle parity gate: partitioning-independence (the defining
property of a correct sketch-then-verify design) and distributional
sanity of the weighted sample.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from brazilian_e_commerce_data_pipeline_analytics_spark.llm.sketch_q import (
    _HH_K,
    _hh_candidates,
    q125_heavy_hitters,
    q126_weighted_sample,
    q127_tfidf_top_terms,
)

from .conftest import SF_SMALL


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_heavy_hitters_exact_and_partition_independent(spark):
    """q125's output must equal the plain exact computation and be
    invariant to how the candidate pass chunks the data."""
    from brazilian_e_commerce_data_pipeline_analytics_spark.catalog import load_table
    from brazilian_e_commerce_data_pipeline_analytics_spark.llm.text import tokens

    d = load_table(spark, SF_SMALL, "documents")
    toks = d.select(F.explode(tokens("text")).alias("token"))
    exact = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(toks.agg(F.count(F.lit(1)).alias("nt")))
        .filter(F.col("n") * _HH_K > F.col("nt"))
    )
    expected = {(r["token"], r["n"]) for r in exact.collect()}
    assert expected, "threshold must be non-vacuous at sf0.001"

    got = {(r["token"], r["n_occurrences"]) for r in q125_heavy_hitters(spark, SF_SMALL).collect()}
    assert got == expected

    # candidate stage on a pathological chunking (many tiny batches via
    # high partition count) still yields a superset of the true HH set
    cand = (
        toks.repartition(37)
        .mapInPandas(_hh_candidates, schema="token string")
        .distinct()
    )
    cand_set = {r["token"] for r in cand.collect()}
    assert {t for t, _ in expected} <= cand_set


def test_weighted_sample_deterministic_and_biased(spark):
    out1 = _rows(q126_weighted_sample(spark, SF_SMALL))
    out2 = _rows(q126_weighted_sample(spark, SF_SMALL))
    assert out1 == out2
    assert len(out1) == 100

    from brazilian_e_commerce_data_pipeline_analytics_spark.catalog import load_table

    d = load_table(spark, SF_SMALL, "documents")
    corpus_avg = d.agg(F.avg("n_chars")).first()[0]
    sample_avg = (
        q126_weighted_sample(spark, SF_SMALL).agg(F.avg("n_chars")).first()[0]
    )
    # weight = n_chars, so long documents must be overrepresented
    assert sample_avg > corpus_avg


def test_tfidf_topk_shape_and_ordering(spark):
    out = q127_tfidf_top_terms(spark, SF_SMALL)
    pdf = out.toPandas()
    per_doc = pdf.groupby("doc_id")
    assert (per_doc["rank"].max() <= 3).all()
    # rank 1 row carries the max tfidf of its document
    top = per_doc.apply(
        lambda g: g.loc[g["rank"].idxmin(), "tfidf"] == g["tfidf"].max(),
        include_groups=False,
    )
    assert top.all()
    # a term appearing in every document is down-weighted below a term
    # with the same tf but smaller df wherever both occur
    assert (pdf[pdf["rank"] == 1]["tfidf"] > 0).all()
