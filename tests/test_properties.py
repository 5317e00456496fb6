"""Property-based checks (SURVEY.md §5): algebraic invariants that must
hold for ANY input, run over hypothesis-generated micro-tables. Example
counts are kept small — each example is a real Spark job."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from brazilian_e_commerce_data_pipeline_analytics_spark.operators.dedup import key_dedup
from brazilian_e_commerce_data_pipeline_analytics_spark.operators.skew import salted_agg

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # key
        st.integers(min_value=0, max_value=50),  # tiebreaker / spreader
        st.integers(min_value=-100, max_value=100),  # value
    ),
    min_size=1,
    max_size=30,
)


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_key_dedup_idempotent_and_deterministic(spark, rows):
    df = spark.createDataFrame([Row(k=k, t=t, v=v) for k, t, v in rows])
    once = key_dedup(df, keys=["k"], order_by=["t", "v"])
    twice = key_dedup(once, keys=["k"], order_by=["t", "v"])
    got = sorted((r["k"], r["t"], r["v"]) for r in once.collect())
    assert got == sorted((r["k"], r["t"], r["v"]) for r in twice.collect())
    # one row per key, and it is the minimum under the (t, v) total order
    expected = {}
    for k, t, v in rows:
        if k not in expected or (t, v) < expected[k]:
            expected[k] = (t, v)
    assert got == sorted((k, t, v) for k, (t, v) in expected.items())


@given(rows=rows_strategy, n_salts=st.sampled_from([1, 2, 7]))
@settings(**SETTINGS)
def test_salted_agg_equals_plain_agg(spark, rows, n_salts):
    df = spark.createDataFrame([Row(k=k, rid=t, v=v) for k, t, v in rows])
    plain = {
        (r["k"]): (r["s"], r["n"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["k"]): (r["s"], r["n"], r["mn"], r["mx"])
        for r in salted_agg(
            df,
            keys=["k"],
            aggs={
                "s": ("v", "sum"),
                "n": ("v", "count"),
                "mn": ("v", "min"),
                "mx": ("v", "max"),
            },
            spreader=["rid"],
            n_salts=n_salts,
        ).collect()
    }
    assert salted == plain


@given(rows=rows_strategy, cut=st.integers(min_value=-100, max_value=100))
@settings(**SETTINGS)
def test_filter_monotonicity(spark, rows, cut):
    """Tightening a predicate can only shrink the result; the tighter
    result is a subset of the looser one."""
    df = spark.createDataFrame([Row(k=k, t=t, v=v) for k, t, v in rows])
    loose = {tuple(r) for r in df.filter(F.col("v") >= cut).collect()}
    tight = {tuple(r) for r in df.filter(F.col("v") >= cut + 10).collect()}
    assert tight <= loose


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_setop_partition_identity(spark, rows):
    """distinct(a) == (a EXCEPT b) ∪ (a INTERSECT b) for any b ⊆ rows."""
    a = spark.createDataFrame([Row(k=k, t=t, v=v) for k, t, v in rows])
    b = a.filter(F.col("v") % 2 == 0)
    lhs = {tuple(r) for r in a.distinct().collect()}
    rhs = {tuple(r) for r in a.exceptAll(b).union(a.intersect(b)).distinct().collect()}
    assert lhs == rhs


asof_left = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20)), min_size=1, max_size=12
)
asof_right = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20), st.integers(0, 9)),
    min_size=0,
    max_size=12,
)


@given(lrows=asof_left, rrows=asof_right)
@settings(**SETTINGS)
def test_asof_join_matches_python_oracle(spark, lrows, rrows):
    from brazilian_e_commerce_data_pipeline_analytics_spark.operators.asof import asof_join

    # unique left ids so rows are comparable
    left = spark.createDataFrame(
        [Row(k=k, t=t, lid=i) for i, (k, t) in enumerate(lrows)]
    )
    if rrows:
        right = spark.createDataFrame([Row(k=k, t=t, p=p) for k, t, p in rrows])
    else:
        right = spark.createDataFrame([], "k int, t int, p int")
    got = {
        r["lid"]: r["p"]
        for r in asof_join(left, right, ["k"], "t", "t", ["p"]).collect()
    }
    for i, (k, t) in enumerate(lrows):
        cands = [(rt, p) for rk, rt, p in rrows if rk == k and rt <= t]
        expected = max(cands)[1] if cands else None  # ties -> max payload
        assert got[i] == expected, (i, k, t, cands)


join_big = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=20
)
join_small = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 9)), min_size=0, max_size=8
)


@given(
    brows=join_big,
    srows=join_small,
    n_salts=st.sampled_from([1, 3, 8]),
    how=st.sampled_from(["inner", "left", "left_semi", "left_anti"]),
)
@settings(**SETTINGS)
def test_salted_join_equals_plain_join(spark, brows, srows, n_salts, how):
    """salted_join is a pure physical rewrite: its multiset of output
    rows equals the plain join's for every allowed join type, any key
    distribution (incl. keys present on only one side), and any salt
    count."""
    from collections import Counter

    from brazilian_e_commerce_data_pipeline_analytics_spark.operators.skew import salted_join

    big = spark.createDataFrame([Row(k=k, rid=t) for k, t in brows])
    if srows:
        small = spark.createDataFrame([Row(k=k, p=p) for k, p in srows])
    else:
        small = spark.createDataFrame([], "k int, p int")
    plain = Counter(tuple(r) for r in big.join(small, on=["k"], how=how).collect())
    salted = Counter(
        tuple(r)
        for r in salted_join(
            big, small, on=["k"], spreader=["rid"], n_salts=n_salts, how=how
        ).collect()
    )
    assert salted == plain


edge_strategy = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=25
)


@given(edges=edge_strategy)
@settings(**SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    """Min-label propagation agrees with a driver-side union-find on any
    graph shape hypothesis produces (self-loops, parallel edges, cycles)."""
    from brazilian_e_commerce_data_pipeline_analytics_spark.operators.graph import connected_components

    df = spark.createDataFrame([Row(a=a, b=b) for a, b in edges])
    got = {
        r["node"]: r["label"] for r in connected_components(df, "a", "b").collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps: dict[int, int] = {}
    for node in parent:
        root = find(node)
        comps[root] = min(comps.get(root, node), node)
    expected = {node: comps[find(node)] for node in parent}
    assert got == expected
    # the star alternation must agree with propagation on every graph
    star = {
        r["node"]: r["label"]
        for r in connected_components(df, "a", "b", algorithm="star").collect()
    }
    assert star == expected


@given(
    n_toks=st.lists(st.integers(min_value=0, max_value=130), min_size=1, max_size=8)
)
@settings(**SETTINGS)
def test_doc_chunks_match_python_oracle(spark, n_toks):
    """q87's chunk layout (window 50 / stride 25) equals a plain-Python
    chunker for any document lengths, including 0 and sub-window docs."""
    import hashlib

    import brazilian_e_commerce_data_pipeline_analytics_spark.llm.text_q as tq

    docs = [(i, " ".join(f"w{i}x{j}" for j in range(n))) for i, n in enumerate(n_toks)]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in docs], "doc_id long, text string"
    )
    orig = tq.load_table
    tq.load_table = lambda s, sd, n: df
    try:
        got = sorted(
            (r["doc_id"], r["chunk_idx"], r["start_tok"], r["n_tok"], r["chunk_md5"])
            for r in tq.q87_doc_chunks(spark, "ignored").collect()
        )
    finally:
        tq.load_table = orig
    expect = []
    for i, text in docs:
        toks = text.split()
        for ci, start in enumerate(range(0, len(toks), 25)):
            chunk = toks[start : start + 50]
            expect.append(
                (i, ci, start + 1, len(chunk),
                 hashlib.md5(" ".join(chunk).encode()).hexdigest())
            )
    assert got == sorted(expect)


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_salted_join_equals_plain_join(spark, rows):
    """salted_join is a physical rewrite: for ANY input (including hot
    keys, missing keys, duplicate dim rows avoided by construction) its
    output equals the plain equi-join."""
    from brazilian_e_commerce_data_pipeline_analytics_spark.operators.skew import salted_join

    big = spark.createDataFrame([Row(k=k, t=t, v=v) for k, t, v in rows])
    dim = spark.createDataFrame(
        [Row(k=k, name=f"n{k}") for k in {0, 1, 2, 3}]
    )
    for how in ("inner", "left", "left_semi", "left_anti"):
        plain = big.join(dim, on=["k"], how=how)
        salted = salted_join(big, dim, on=["k"], spreader=["t", "v"], n_salts=4, how=how)
        assert sorted(map(str, salted.collect())) == sorted(map(str, plain.collect())), how


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_two_pass_median_equals_sorted_middle(spark, rows):
    """q117's bin-refinement algebra: for ANY values and ANY bin width,
    the picked middle ranks equal the sorted-middle median."""
    import statistics

    from pyspark.sql.window import Window

    df = spark.createDataFrame([Row(g=k % 2, price=float(v)) for k, _, v in rows])
    binw = 7.0
    binned = df.withColumn("bin", F.floor(F.col("price") / binw))
    hist = binned.groupBy("g", "bin").agg(F.count(F.lit(1)).alias("cnt"))
    wb = Window.partitionBy("g").orderBy("bin")
    cum = hist.withColumn(
        "cum_below",
        F.coalesce(F.sum("cnt").over(wb.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)),
    ).withColumn(
        "n", F.sum("cnt").over(wb.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    )
    lo_rank = F.floor((F.col("n") + 1) / 2)
    hi_rank = F.floor((F.col("n") + 2) / 2)
    cand = cum.filter(
        (F.col("cum_below") < hi_rank) & (F.col("cum_below") + F.col("cnt") >= lo_rank)
    ).select("g", "bin", "cum_below", "n")
    sliced = binned.join(cand, ["g", "bin"])
    wr = Window.partitionBy("g", "bin").orderBy("price")
    picked = sliced.withColumn("rk", F.col("cum_below") + F.row_number().over(wr)).filter(
        (F.col("rk") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rk") == F.floor((F.col("n") + 2) / 2))
    )
    got = {
        r["g"]: r["m"]
        for r in picked.groupBy("g").agg(F.avg("price").alias("m")).collect()
    }
    by_g: dict[int, list[float]] = {}
    for k, _, v in rows:
        by_g.setdefault(k % 2, []).append(float(v))
    for g, vals in by_g.items():
        assert abs(got[g] - statistics.median(vals)) < 1e-9, (g, sorted(vals), got[g])


# ---------------------------------------------------------------------------
# Round-3 session-2 machinery: Morton codes, media codecs, BPE greedy.
# ---------------------------------------------------------------------------


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4095),
            st.integers(min_value=0, max_value=4095),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=30, deadline=None)
def test_zorder_interleave_is_bijective(pts):
    """q147's Morton formula is a true bijection on 12+12 bits: the
    de-interleave recovers (x, y) exactly for any coordinates."""

    def z(x, y):
        out = 0
        for i in range(12):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    def unz(v):
        x = y = 0
        for i in range(12):
            x |= ((v >> (2 * i)) & 1) << i
            y |= ((v >> (2 * i + 1)) & 1) << i
        return x, y

    for x, y in pts:
        assert unz(z(x, y)) == (x, y)


@given(mid=st.integers(min_value=0, max_value=100000))
@settings(max_examples=50, deadline=None)
def test_codec_roundtrips_match_direct_computation(mid):
    """encode->decode for WAV and BMP reproduces features computed
    straight from the synthesis formulas, for ANY media id."""
    import numpy as np

    from brazilian_e_commerce_data_pipeline_analytics_spark.llm.codecs import (
        bmp_channel,
        bmp_dims,
        decode_bmp,
        decode_wav,
        encode_bmp,
        encode_wav,
        wav_n_samples,
        wav_samples,
    )

    w = decode_wav(encode_wav(mid))
    n = wav_n_samples(mid)
    s = wav_samples(mid, n).astype(np.int64)
    assert w["n_samples"] == n
    assert w["peak"] == int(np.abs(s).max())
    assert abs(w["rms"] - float(np.sqrt(np.sum(s * s) / n))) < 1e-12

    b = decode_bmp(encode_bmp(mid))
    bw, bh = bmp_dims(mid)
    assert (b["width"], b["height"]) == (bw, bh)
    exp_r = sum(
        bmp_channel(mid, x, y, 2) for x in range(bw) for y in range(bh)
    ) / (bw * bh)
    assert abs(b["mean_r"] - exp_r) < 1e-12


def _py_bpe(words: dict, iters: int):
    """Pure-Python greedy BPE reference: weighted pair counts, argmax
    with (count desc, left, right) tie-break, left-to-right
    non-overlapping merge application."""
    syms = {w: list(w) for w in words}
    merges = []
    for _ in range(iters):
        counts = {}
        for w, cnt in words.items():
            ss = syms[w]
            for a, b in zip(ss, ss[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + cnt
        if not counts:
            break
        (l, r), pc = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, pc))
        for w in syms:
            ss, out, i = syms[w], [], 0
            while i < len(ss):
                if i + 1 < len(ss) and ss[i] == l and ss[i + 1] == r:
                    out.append(ss[i] + ss[i + 1])
                    i += 2
                else:
                    out.append(ss[i])
                    i += 1
            syms[w] = out
    return merges


@given(
    words=st.lists(
        st.tuples(
            st.text(alphabet="ab", min_size=1, max_size=6),
            st.integers(min_value=1, max_value=4),
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bpe_merges_match_python_reference(spark, words):
    """The relational greedy merge (gaps-and-islands run parity) equals
    classic left-to-right BPE for arbitrary tiny corpora — including
    overlapping-run words like 'aaaa' ('ab' alphabet maximizes them)."""
    import brazilian_e_commerce_data_pipeline_analytics_spark.llm.curation_q as cq

    corpus = {}
    for w, c in words:
        corpus[w] = corpus.get(w, 0) + c
    text = " ".join(w for w, c in corpus.items() for _ in range(c))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    expected = _py_bpe(corpus, cq._BPE_ITERS)

    orig = cq.load_table
    try:
        cq.load_table = lambda _s, _sf, _n: df  # type: ignore[assignment]
        got = [
            (r["left_sym"], r["right_sym"], r["pair_count"])
            for r in sorted(
                cq.q141_bpe_merges(spark, "unused").collect(),
                key=lambda r: r["it"],
            )
        ]
    finally:
        cq.load_table = orig
    assert got == expected


@given(
    obs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=11),  # hour slot
            st.integers(min_value=1, max_value=9),   # value
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_forward_fill_matches_python_reference(spark, obs):
    """last(ignorenulls) over a dense spine == a Python forward-fill
    scan, for any sparse observation pattern (leading gaps stay None)."""
    from pyspark.sql.window import Window

    slots = sorted(dict(obs).items())
    df = spark.createDataFrame(
        [(h, float(v)) for h, v in slots], "h int, v double"
    )
    spine = spark.range(12).select(F.col("id").cast("int").alias("h"))
    joined = spine.join(df, "h", "left")
    w = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    got = {
        r["h"]: r["f"]
        for r in joined.select(
            "h", F.last("v", ignorenulls=True).over(w).alias("f")
        ).collect()
    }
    exp, carry = {}, None
    lookup = dict(slots)
    for h in range(12):
        if h in lookup:
            carry = float(lookup[h])
        exp[h] = carry
    assert got == exp


# ---------------------------------------------------------------------------
# q180's bucket-expansion rewrite: for ANY set of (user, time) events,
# the bucketed equi-join must count exactly the brute-force pairs —
# each qualifying pair once (the build row's bucket is covered by
# exactly one of the probe's two expanded buckets), none dropped at
# bucket boundaries, none double-counted.
# ---------------------------------------------------------------------------

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),       # user
        st.integers(min_value=0, max_value=500),     # time (units)
    ),
    min_size=1,
    max_size=25,
)


@given(evs=events_strategy)
@settings(**SETTINGS)
def test_bucket_expansion_join_equals_bruteforce(spark, evs):
    w = 60
    df = spark.createDataFrame(
        [Row(user_id=u, tus=t) for u, t in evs]
    )
    build = df.select(
        "user_id", F.col("tus").alias("btus"), F.floor(F.col("tus") / w).alias("bk")
    )
    probe = df.select(
        "user_id",
        "tus",
        F.explode(
            F.array(F.floor(F.col("tus") / w) - 1, F.floor(F.col("tus") / w))
        ).alias("bk"),
    )
    got = (
        probe.join(build, ["user_id", "bk"])
        .filter((F.col("tus") - F.col("btus") > 0) & (F.col("tus") - F.col("btus") <= w))
        .count()
    )
    brute = sum(
        1
        for (ua, ta) in evs
        for (ub, tb) in evs
        if ua == ub and 0 < ta - tb <= w
    )
    assert got == brute


# ---------------------------------------------------------------------------
# q187's Lloyd step: the Spark assignment/update pipeline must agree
# with a plain-Python reference on ANY integer vector set — argmin with
# cell-id tie-break, integer-exact centroid sums, two iterations.
# ---------------------------------------------------------------------------

vecs_strategy = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),  # tiny 2-d int vectors
    min_size=3,
    max_size=12,
)


@given(vs=vecs_strategy)
@settings(**SETTINGS)
def test_kmeans_lloyd_matches_python_reference(spark, vs):
    from brazilian_e_commerce_data_pipeline_analytics_spark.llm.similarity_q import (
        _km_assign,
        _km_update,
    )

    k = min(2, len(vs))
    v = spark.createDataFrame(
        [Row(vec_id=i, q=[float(a), float(b)]) for i, (a, b) in enumerate(vs)]
    )
    c0 = v.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cell"), F.col("q").alias("c")
    )
    a1 = _km_assign(v, c0)
    c1 = _km_update(a1)
    a2 = _km_assign(v, c1)
    got = {r["vec_id"]: r["cell"] for r in a2.collect()}

    # reference in plain Python (same tie-break: min (dist, cell))
    def assign(points, cents):
        out = {}
        for i, p in points.items():
            out[i] = min(
                ((sum((a - b) ** 2 for a, b in zip(p, c)), cid) for cid, c in cents.items())
            )[1]
        return out

    pts = {i: (float(a), float(b)) for i, (a, b) in enumerate(vs)}
    cents0 = {i: pts[i] for i in range(k)}
    ref_a1 = assign(pts, cents0)
    cents1 = {}
    for cid in set(ref_a1.values()):
        members = [pts[i] for i, c in ref_a1.items() if c == cid]
        n = len(members)
        cents1[cid] = tuple(sum(m[d] for m in members) / n for d in range(2))
    ref_a2 = assign(pts, cents1)
    assert got == ref_a2


# ---------------------------------------------------------------------------
# q198's weighted-MinHash reduction: for ANY two sets with ANY positive
# integer per-element weights, the PLAIN Jaccard of the expanded
# universes (element#1..element#w replicas) must equal the weighted
# Jaccard Σmin(w)/Σmax(w) — the identity that licenses running
# unweighted MinHash over the expansion. Pure-Python check (the
# identity is set algebra, not Spark).
# ---------------------------------------------------------------------------

wsets_strategy = st.tuples(
    st.dictionaries(st.integers(0, 9), st.integers(1, 4), min_size=1, max_size=8),
    st.dictionaries(st.integers(0, 9), st.integers(1, 4), min_size=1, max_size=8),
)


@given(ab=wsets_strategy)
@settings(max_examples=200, deadline=None)
def test_weighted_jaccard_equals_expanded_jaccard(ab):
    wa, wb = ab
    exp_a = {(e, r) for e, w in wa.items() for r in range(1, w + 1)}
    exp_b = {(e, r) for e, w in wb.items() for r in range(1, w + 1)}
    plain = len(exp_a & exp_b) / len(exp_a | exp_b)
    keys = set(wa) | set(wb)
    num = sum(min(wa.get(e, 0), wb.get(e, 0)) for e in keys)
    den = sum(max(wa.get(e, 0), wb.get(e, 0)) for e in keys)
    assert plain == num / den
    # q198's doc-independent weights are the min==max special case:
    # common elements contribute w to BOTH numerator terms
    common = {e: wa[e] for e in set(wa) & set(wb) if wa[e] == wb.get(e)}
    if common and all(wa.get(e) == wb.get(e) for e in set(wa) & set(wb)):
        assert num == sum(common.values())


# ---------------------------------------------------------------------------
# q209's AMS mergeability + correctness-in-expectation: counters from
# disjoint shards must sum to the global counters for ANY token stream
# and ANY ±1 sign function, and each Z_j must equal Σ_v f_v·s_j(v)
# (the estimator identity). Pure-Python — pins the algebra the Spark
# map-side combine relies on.
# ---------------------------------------------------------------------------

stream_strategy = st.lists(st.integers(0, 7), min_size=1, max_size=40)


@given(stream=stream_strategy, cut=st.integers(0, 40), salt=st.integers(0, 1000))
@settings(max_examples=200, deadline=None)
def test_ams_counters_merge_and_match_frequency_form(stream, cut, salt):
    import hashlib

    def sign(v, j):
        h = int.from_bytes(
            hashlib.md5(f"{v}:{salt}".encode()).digest()[:8], "big"
        )
        return 1 if (h >> j) & 1 else -1

    J = 4
    cut = min(cut, len(stream))
    shard1, shard2 = stream[:cut], stream[cut:]
    for j in range(J):
        z1 = sum(sign(v, j) for v in shard1)
        z2 = sum(sign(v, j) for v in shard2)
        z_global = sum(sign(v, j) for v in stream)
        assert z1 + z2 == z_global
        freqs = {v: stream.count(v) for v in set(stream)}
        assert z_global == sum(f * sign(v, j) for v, f in freqs.items())


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1000),     # order key part
            st.integers(min_value=-100, max_value=100),   # value
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],                          # total order
    ),
    k=st.sampled_from([1, 2, 4, 7]),
    n_parts=st.sampled_from([1, 3, 8]),
)
@settings(**SETTINGS)
def test_distributed_rank_ntile_pctrank_match_windows(spark, rows, k, n_parts):
    """For ANY table under a total order, the two-level distributed
    operators must be value-identical to the single-task window
    functions: row_number, ntile(k), percent_rank, cume_dist — at every
    partition count (boundary placement must never matter)."""
    from pyspark.sql.window import Window

    from brazilian_e_commerce_data_pipeline_analytics_spark.operators.windows import (
        cume_dist_expr,
        distributed_rank,
        ntile_expr,
        percent_rank_expr,
    )

    df = spark.createDataFrame([Row(key=a, v=b) for a, b in rows]).repartition(5)
    w = Window.orderBy("key")
    exp = {
        r["key"]: (r["rn"], r["t"], r["pr"], r["cd"])
        for r in df.select(
            "key",
            F.row_number().over(w).alias("rn"),
            F.ntile(k).over(w).alias("t"),
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        ).collect()
    }
    ranked = distributed_rank(df, ["key"], out="rn", total_out="nn", n_parts=n_parts)
    got = {
        r["key"]: (r["rn"], r["t"], r["pr"], r["cd"])
        for r in ranked.select(
            "key",
            "rn",
            ntile_expr(F.col("rn"), F.col("nn"), k).alias("t"),
            percent_rank_expr(F.col("rn"), F.col("nn")).alias("pr"),
            cume_dist_expr(F.col("rn"), F.col("nn")).alias("cd"),
        ).collect()
    }
    assert got == exp


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1000),     # order key
            st.integers(min_value=-50, max_value=50),     # value A
            st.integers(min_value=0, max_value=9),        # value B
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    n_parts=st.sampled_from([1, 3, 8]),
    exclusive=st.booleans(),
)
@settings(**SETTINGS)
def test_distributed_cumsums_match_window_sums(spark, rows, n_parts, exclusive):
    """Multi-column two-level prefix sums == the global window, inclusive
    AND exclusive, at every partition count — including negative values
    (retraction-free: the operator only ever adds)."""
    from pyspark.sql.window import Window

    from brazilian_e_commerce_data_pipeline_analytics_spark.operators.windows import distributed_cumsums

    df = spark.createDataFrame([Row(key=a, va=b, vb=c) for a, b, c in rows]).repartition(4)
    hi = -1 if exclusive else 0
    w = Window.orderBy("key").rowsBetween(Window.unboundedPreceding, hi)
    exp = {
        r["key"]: (r["ca"] or 0, r["cb"] or 0)
        for r in df.select(
            "key",
            F.coalesce(F.sum("va").over(w), F.lit(0)).alias("ca"),
            F.coalesce(F.sum("vb").over(w), F.lit(0)).alias("cb"),
        ).collect()
    }
    got = {
        r["key"]: (r["ca"], r["cb"])
        for r in distributed_cumsums(
            df, "key", [("va", "ca"), ("vb", "cb")],
            exclusive=exclusive, n_parts=n_parts,
        ).collect()
    }
    assert got == exp


vec_strategy = st.lists(
    st.lists(
        st.floats(
            min_value=-100.0,
            max_value=100.0,
            allow_nan=False,
            allow_infinity=False,
            width=32,
        ),
        min_size=2,
        max_size=8,
    ),
    min_size=1,
    max_size=6,
)


@given(vecs=vec_strategy)
@settings(**SETTINGS)
def test_int8_quantization_error_bound(spark, vecs):
    """q266's round trip, as an algebraic invariant for ANY vector: with
    scale = max|x| and codes floor(x*127/scale), every code lies in
    [-128, 127] and every reconstruction error is < scale/127 (one
    quantization step — floor's worst case), for arbitrary float32
    inputs, not just the fixture embeddings."""
    rows = [
        Row(i=i, v=[float(x) for x in vec])
        for i, vec in enumerate(vecs)
        if any(x != 0.0 for x in vec)
    ]
    if not rows:
        return
    df = spark.createDataFrame(rows, "i int, v array<double>")
    scale = F.array_max(F.transform(F.col("v"), F.abs))
    codes = F.transform(
        F.col("v"), lambda x: F.floor(x * F.lit(127.0) / F.col("scale"))
    )
    out = (
        df.withColumn("scale", scale)
        .withColumn("codes", codes)
        .withColumn(
            "errs",
            F.zip_with(
                F.col("v"),
                F.col("codes"),
                lambda x, c: F.abs(x - c * F.col("scale") / F.lit(127.0)),
            ),
        )
        .select("i", "scale", "codes", "errs")
        .collect()
    )
    for r in out:
        step = r["scale"] / 127.0
        assert all(-128 <= c <= 127 for c in r["codes"]), r
        assert all(e < step + 1e-12 for e in r["errs"]), r
