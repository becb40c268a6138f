"""Fuzzy linkage (operators/linkage.py) and mergeable distinct sketches
(operators/sketches.py).

Linkage: the blocked join must equal the brute-force edit-distance join
(lossless blocking) on data satisfying the length bound; the df-cap is a
documented recall trade, and too-short strings fail loudly.

Sketches: KMV exactness below k, the merge identity
sketch(A) (+) sketch(B) == sketch(A u B), bounded estimator error above
k, and the HLL production path's error bound vs exact.
"""

import pytest
from pyspark.sql import functions as F

from etl_wrap_spark.operators.linkage import fuzzy_join
from etl_wrap_spark.operators.sketches import (
    distinct_counts_kmv,
    hll_estimate,
    hll_sketches,
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)

NAMES = [
    "crimson anchor", "crimson anchors", "crimsn anchor", "golden bolt",
    "golden colt", "silver widget", "silver widgets", "slver widget",
    "bronze gear", "bronze bear", "copper spring", "copper sprint",
]


@pytest.fixture(scope="module")
def names_df(spark):
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(NAMES)], "lid INT, lname STRING"
    )


def _brute_pairs(max_dist):
    # reference: O(n^2) Levenshtein in pure Python
    def lev(a, b):
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[n]

    return {
        (i, j, lev(a, b))
        for i, a in enumerate(NAMES)
        for j, b in enumerate(NAMES)
        if lev(a, b) <= max_dist
    }


@pytest.mark.parametrize("max_dist", [1, 2])
@pytest.mark.parametrize("block", ["prefix", "all"])
def test_fuzzy_join_matches_brute_force(spark, names_df, max_dist, block):
    right = names_df.select(
        F.col("lid").alias("rid"), F.col("lname").alias("rname")
    )
    got = {
        (r.lid, r.rid, r.dist)
        for r in fuzzy_join(
            names_df, right, "lid", "lname", "rid", "rname",
            max_dist=max_dist, q=2, block=block,
        ).collect()
    }
    assert got == _brute_pairs(max_dist)


def test_fuzzy_join_short_string_raises(spark):
    df = spark.createDataFrame([(1, "ab")], "lid INT, lname STRING")
    right = df.select(F.col("lid").alias("rid"), F.col("lname").alias("rname"))
    with pytest.raises(Exception, match="lossless-blocking"):
        fuzzy_join(df, right, "lid", "lname", "rid", "rname",
                   max_dist=2, q=3).collect()


def test_fuzzy_join_max_df_caps_hot_grams(spark, names_df):
    # with every gram capped away, blocking yields no candidates -> the
    # documented recall trade in its extreme; verify never resurrects
    # pairs blocking dropped.
    right = names_df.select(
        F.col("lid").alias("rid"), F.col("lname").alias("rname")
    )
    got = fuzzy_join(
        names_df, right, "lid", "lname", "rid", "rname",
        max_dist=1, q=2, block="all", max_df=0,
    ).count()
    assert got == 0


# ------------------------------------------------------------- sketches


def test_kmv_exact_below_k(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 5).alias("g"), (F.col("id") % 700).alias("v")
    )
    got = {
        (r.g, r.n_distinct)
        for r in distinct_counts_kmv(df, ["g"], "v", k=1024).collect()
    }
    # ids 0..4999 cover every (id%5, id%700) residue pair: each group
    # sees all 700 values -> 140 distinct v per group (700/5 stride).
    exact = {
        (r.g, r.n)
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert got == exact


def test_kmv_merge_identity(spark):
    # sketch(A) (+) sketch(B) == sketch(A u B), including when both are
    # full (k smaller than either cardinality)
    k = 64
    a = spark.range(0, 2000).select(F.lit("x").alias("g"), F.col("id").alias("v"))
    b = spark.range(1500, 3500).select(F.lit("x").alias("g"), F.col("id").alias("v"))
    sa = kmv_sketch(a, ["g"], "v", k=k).collect()[0]["kmv"]
    sb = kmv_sketch(b, ["g"], "v", k=k).collect()[0]["kmv"]
    su = kmv_sketch(a.union(b), ["g"], "v", k=k).collect()[0]["kmv"]
    merged = (
        spark.createDataFrame([(sa, sb)], "kmv_a ARRAY<BIGINT>, kmv_b ARRAY<BIGINT>")
        .select(kmv_merge("kmv_a", "kmv_b", k).alias("m"))
        .collect()[0]["m"]
    )
    assert merged == su


def test_kmv_estimator_error_above_k(spark):
    # 50_000 distinct, k=256 -> relative error concentrated ~1/sqrt(k-2)
    # (~6.3%); assert a generous 4-sigma bound, deterministic hash so
    # this never flakes.
    n, k = 50_000, 256
    df = spark.range(0, n).select(F.lit("x").alias("g"), F.col("id").alias("v"))
    est = (
        kmv_sketch(df, ["g"], "v", k=k)
        .select(kmv_estimate("kmv", k).alias("e"))
        .collect()[0]["e"]
    )
    assert abs(est - n) / n < 4 / (k - 2) ** 0.5


def test_hll_error_bound(spark):
    n = 30_000
    df = spark.range(0, n).select(F.lit("x").alias("g"), F.col("id").alias("v"))
    est = (
        hll_sketches(df, ["g"], "v", lg_k=12)
        .select(hll_estimate("hll").alias("e"))
        .collect()[0]["e"]
    )
    # DataSketches HLL lg_k=12 RSE ~= 1.04/sqrt(2^12) ~= 1.6%; allow 4x
    assert abs(est - n) / n < 0.065


# --------------------------------------------------- bigram LM scoring


def test_bigram_lm_reference_mode(spark):
    from etl_wrap_spark.operators.text import bigram_lm_scores

    ref = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "the dog sat")],
        "doc_id LONG, text STRING",
    )
    # LM from ref: P(cat|the)=2/3, P(dog|the)=1/3, P(sat|cat)=1/2, ...
    docs = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zebra quark flux")],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r for r in bigram_lm_scores(docs, "doc_id", "text", lm_df=ref).collect()}
    # doc 10: floor(10000*2/3) + floor(10000*1/2) = 6666 + 5000
    assert out[10].sum_p_bp == 11666 and out[10].n_bigrams == 2
    # doc 11: every bigram unseen in the reference -> 0
    assert out[11].sum_p_bp == 0 and out[11].lm_score_bp == 0


def test_bigram_lm_self_mode_singleton_context(spark):
    from etl_wrap_spark.operators.text import bigram_lm_scores

    docs = spark.createDataFrame(
        [(1, "p q r")], "doc_id LONG, text STRING"
    )
    # documented self-LM caveat: singleton contexts score P=1 (10000 bp)
    row = bigram_lm_scores(docs, "doc_id", "text").collect()[0]
    assert row.lm_score_bp == 10000


def test_chunking_coverage_and_overlap(spark):
    from etl_wrap_spark.operators.text import chunk_documents

    text = " ".join(f"w{i}" for i in range(150))
    df = spark.createDataFrame([(1, text), (2, "a b c")], "doc_id LONG, text STRING")
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=64, overlap=8).collect()
    d1 = sorted((r.chunk_idx, r.start_token, r.n_tokens) for r in out if r.doc_id == 1)
    # 150 tokens, stride 56: starts 1, 57, 113 -> last covers through 150
    assert d1 == [(0, 1, 64), (1, 57, 64), (2, 113, 38)]
    # consecutive chunks overlap by exactly 8 tokens
    chunks = {r.chunk_idx: r.chunk_text.split(" ") for r in out if r.doc_id == 1}
    assert chunks[0][-8:] == chunks[1][:8]
    # short doc -> exactly one whole-doc chunk
    d2 = [r for r in out if r.doc_id == 2]
    assert len(d2) == 1 and d2[0].chunk_text == "a b c" and d2[0].n_tokens == 3


# --------------------------------------------------- BPE induction


def _ref_bpe(words_freq, n_merges, min_pair_freq=2):
    """Reference pure-Python BPE with the module's tie-breaking."""
    vocab = [(list(w), f) for w, f in words_freq.items()]
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, f in vocab:
            for x, y in zip(syms, syms[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        a, b = best[0]
        merges.append((a, b))

        def merge(syms):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b); i += 2
                else:
                    out.append(syms[i]); i += 1
            return out

        vocab = [(merge(s), f) for s, f in vocab]
    return merges


def test_learn_bpe_matches_reference(spark):
    from etl_wrap_spark.operators.tokenizer import apply_bpe, learn_bpe

    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "low new slow snow",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    freqs = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    want = _ref_bpe(freqs, 8)
    got = learn_bpe(df, "text", n_merges=8)
    assert got == want and len(got) == 8

    scored = {r.doc_id: r for r in apply_bpe(df, "doc_id", "text", got).collect()}
    # merges compress: tokens per doc strictly below char count
    for i, t in enumerate(texts):
        chars = sum(len(w) for w in t.split())
        assert scored[i].n_chars == chars and scored[i].n_tokens < chars


def test_learn_bpe_min_freq_stops_early(spark):
    from etl_wrap_spark.operators.tokenizer import learn_bpe

    df = spark.createDataFrame([(1, "ab cd ef")], "doc_id LONG, text STRING")
    # every adjacent pair occurs once -> below min_pair_freq=2 -> no merges
    assert learn_bpe(df, "text", n_merges=5) == []
