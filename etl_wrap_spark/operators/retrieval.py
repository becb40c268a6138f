"""Lexical retrieval — the BM25 side of a RAG/search pipeline, next to
the vector side (operators/similarity.py) and the chunker
(operators/text.py:chunk_documents).

The index is a TABLE, not a service: ``bm25_index`` distills the corpus
into (term, doc, tf) postings plus per-doc lengths and per-term
document frequencies — all integers, one shuffle each, persistable as
parquet and incrementally appendable (new batches re-aggregate only
their own terms; df/avgdl refresh is a cheap re-aggregation of the
postings). ``bm25_search`` scores a query BATCH against the index with
one postings join — work scales with the posting lists of the query's
terms, never with corpus size.

Scoring uses the standard Okapi BM25 with Robertson-Sparck-Jones idf
ln((N - df + 0.5)/(df + 0.5) + 1). The float math means scores are not
engine-portable (libm ln differs in final ulps across engines), so the
catalog oracle (q135) checks the INTEGER surface exactly (tf, df,
doc-length postings) and pytest pins the scorer against an independent
pure-Python BM25 on the same corpus; ranking ties break by doc id.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_wrap_spark.operators.text import tokens

K1 = 1.2
B = 0.75


def _terms(col) -> "F.Column":
    return F.filter(
        F.transform(tokens(col), lambda t: F.lower(F.regexp_replace(t, r"[^\w]", ""))),
        lambda t: F.length(t) >= 2,
    )


def bm25_index(df: DataFrame, id_col: str, text_col: str):
    """(postings, doclens) — the persistable lexical index.

    postings: (term, id, tf); doclens: (id, dl). Document frequency and
    corpus stats derive from the postings on demand (one sketch-sized
    aggregation), so appending a batch never rescans old text."""
    from etl_wrap_spark.session import ensure_min_parallelism

    df = ensure_min_parallelism(df)
    toks = df.select(F.col(id_col).alias("id"), F.explode(_terms(text_col)).alias("term"))
    postings = toks.groupBy("term", "id").agg(F.count(F.lit(1)).alias("tf"))
    doclens = toks.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    return postings, doclens


def bm25_search(
    postings: DataFrame,
    doclens: DataFrame,
    queries: DataFrame,
    qid_col: str,
    qtext_col: str,
    k: int = 10,
) -> DataFrame:
    """Top-k BM25 hits per query → (qid, rank, id, score).

    Plan: query terms (deduped, broadcast — query batches are small by
    contract) join the postings on term, gather per-(query, doc) tf
    sums with idf/length normalization, and a rank window cuts top-k.
    Corpus stats (N, avgdl) are a 1-row broadcast aggregate."""
    stats = doclens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    qterms = (
        queries.select(F.col(qid_col).alias("qid"), F.explode(_terms(qtext_col)).alias("term"))
        .distinct()
    )
    dfreq = postings.groupBy("term").agg(F.count_distinct("id").alias("df"))
    scored = (
        postings.join(F.broadcast(qterms), on="term")
        .join(F.broadcast(dfreq), on="term")
        .join(doclens, on="id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (K1 + 1))
            / (F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("qid", "id")
        .agg(F.sum("contrib").alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def bm25_reference(corpus: dict, query: str, k: int = 10) -> list[tuple]:
    """Independent pure-Python BM25 over {id: text} — the pytest ground
    truth for bm25_search (same tokenizer, same constants)."""
    import re

    def toks(s):
        return [w for w in (re.sub(r"[^\w]", "", t).lower() for t in s.split()) if len(w) >= 2]

    docs = {i: toks(t) for i, t in corpus.items()}
    n = len(docs)
    avgdl = sum(len(d) for d in docs.values()) / n
    qts = set(toks(query))
    scores = {}
    for i, d in docs.items():
        s = 0.0
        for t in qts:
            tf = d.count(t)
            if not tf:
                continue
            df_t = sum(1 for dd in docs.values() if t in dd)
            idf = math.log((n - df_t + 0.5) / (df_t + 0.5) + 1.0)
            s += idf * (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * len(d) / avgdl))
        if s > 0:
            scores[i] = s
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "id",
    rank_col: str = "rank",
    k: int = 60,
    scale: int = 100_000_000,
    top: int | None = None,
) -> DataFrame:
    """Reciprocal Rank Fusion of any number of rankers →
    (id, rrf_score, rank) — the standard hybrid-search combiner
    (lexical BM25 + vector ANN, or any heterogeneous rankers) that
    needs NO score calibration because it consumes only ranks.

    Exact integer form of RRF(d) = Σ_r 1/(k + rank_r(d)): each
    contribution is ``scale div (k + rank)`` so the fused score is a
    bigint — deterministic on every engine (float 1/(k+rank) sums
    would be order-dependent). With scale 1e8 and k=60 the integer
    truncation distinguishes ranks far beyond any practical depth.
    Documents absent from a ranker simply contribute nothing (the RRF
    convention). Ties break by id.

    BOUNDED-INPUT CONTRACT: the final ranking runs an unpartitioned
    row_number window over the fused candidate set, so each input
    ranking MUST already be top-k-truncated (ranker count × k rows
    total — sketch-sized). Build rankings with ``orderBy(...).limit(k)``
    then rank the survivors (TakeOrderedAndProject — see
    q136_rrf_fusion); passing a corpus-grain ranking turns the fusion
    into a single-partition global sort."""
    contribs = None
    for r in rankings:
        c = r.select(
            F.col(id_col).alias("id"), F.col(rank_col).alias("__r")
        ).select(
            "id",
            F.expr(f"cast({scale} as bigint) div ({k} + __r)").alias("__c"),
        )
        contribs = c if contribs is None else contribs.unionByName(c)
    fused = contribs.groupBy("id").agg(F.sum("__c").alias("rrf_score"))
    w = Window.orderBy(F.col("rrf_score").desc(), F.col("id"))
    out = fused.withColumn("rank", F.row_number().over(w))
    return out.where(F.col("rank") <= top) if top else out


def positional_postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(term, id, pos) positional postings — the phrase/proximity-search
    index (plain bm25_index postings can only answer bag-of-words).
    One explode with the token's 1-based position; same persistence
    story as bm25_index."""
    from etl_wrap_spark.session import ensure_min_parallelism

    df = ensure_min_parallelism(df)
    # positions are 1-based indexes into the NORMALIZED term sequence
    # (_terms drops sub-2-char tokens, the stopword-removal convention:
    # words separated only by dropped tokens count as adjacent)
    with_pos = F.transform(
        _terms(text_col), lambda t, i: F.struct(t.alias("term"), (i + 1).alias("pos"))
    )
    return df.select(
        F.col(id_col).alias("id"), F.explode(with_pos).alias("p")
    ).select("id", "p.term", "p.pos")


def phrase_search(postings_pos: DataFrame, phrase: list[str]) -> DataFrame:
    """Documents containing ``phrase`` as CONSECUTIVE terms →
    (id, n_matches): the i-th word's postings join the (i+1)-th's on
    (id, pos+1), chained — work scales with the rarest word's posting
    list (Catalyst reorders the equi-joins; put the rarest first for
    explicit control). Position arithmetic is exact, so the whole
    operator is oracle-checkable."""
    if not phrase:
        raise ValueError("empty phrase")
    cur = postings_pos.where(F.col("term") == phrase[0]).select(
        "id", F.col("pos").alias("p0")
    )
    for i, word in enumerate(phrase[1:], start=1):
        nxt = postings_pos.where(F.col("term") == word).select(
            "id", F.col("pos").alias(f"p{i}")
        )
        cur = cur.join(
            nxt,
            on=[
                cur["id"] == nxt["id"],
                nxt[f"p{i}"] == cur[f"p{i-1}"] + 1,
            ],
        ).drop(nxt["id"])
    return cur.groupBy("id").agg(F.count(F.lit(1)).cast("bigint").alias("n_matches"))


# --------------------------------------------------------------- MMR rerank
def mmr_rerank(
    cands: DataFrame,
    query_col: str,
    id_col: str,
    rel_col: str,
    code_col: str,
    k: int,
    lam: tuple[int, int] = (1, 2),
    code_bits: int = 60,
) -> DataFrame:
    """Maximal-Marginal-Relevance diversification (Carbonell & Goldstein
    1998) of a per-query candidate set → (query, pick_no, id, mmr_score).

    Greedy: pick_i = argmax over remaining candidates of
        num*rel - (den-num)*maxsim_to_selected      (λ = num/den)
    with maxsim of the empty set defined 0 (pick 1 is pure relevance)
    and ties broken by id. Similarity between candidates is the exact
    integer SimHash kernel  sim(a,b) = bits - 2*popcount(a XOR b)  over
    ``code_col`` (e.g. dedup.simhash_signatures), so every score is
    int64 and the whole greedy trace is engine-portable — an unrolled
    SQL oracle reproduces it step for step.

    BOUNDED-INPUT CONTRACT (same as rrf_fuse): ``cands`` is a per-query
    top-N candidate frame (N ≲ 10^3, the rerank window of a retrieval
    stack), never a corpus-grain frame. The greedy loop is inherently
    sequential in k but independent across queries: applyInPandas
    groups by query, so 100 TB of queries parallelize per-query while
    each group stays a small in-memory problem."""
    import pandas as pd

    num, den = lam
    if not (0 <= num <= den and den > 0):
        raise ValueError(f"lambda must satisfy 0 <= num <= den, den > 0, got {lam}")
    # Derive the query/id field types from the INPUT schema (round-5
    # ADVICE: hardcoded string/bigint broke integer group columns, e.g.
    # a cluster id passed through kcenter_select). rel/code stay int64
    # by the integer-kernel contract.
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    in_fields = {f.name: f for f in cands.schema.fields}
    out_schema = StructType(
        [
            StructField(query_col, in_fields[query_col].dataType),
            StructField("pick_no", IntegerType()),
            StructField(id_col, in_fields[id_col].dataType),
            StructField("mmr_score", LongType()),
        ]
    )

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].tolist()  # natural dtype; output type mirrors input
        rel = pdf[rel_col].astype("int64").tolist()
        code = pdf[code_col].astype("int64").tolist()
        order = sorted(range(len(ids)), key=lambda i: ids[i])
        remaining = list(order)
        picked: list[int] = []
        rows = []
        qval = pdf[query_col].iloc[0]
        for step in range(1, min(k, len(ids)) + 1):
            best, best_score = None, None
            for i in remaining:
                maxsim = max(
                    (code_bits - 2 * int(code[i] ^ code[j]).bit_count() for j in picked),
                    default=0,
                )
                score = num * rel[i] - (den - num) * maxsim
                if best is None or score > best_score or (score == best_score and ids[i] < ids[best]):
                    best, best_score = i, score
            picked.append(best)
            remaining.remove(best)
            rows.append((qval, step, ids[best], best_score))
        return pd.DataFrame(rows, columns=[query_col, "pick_no", id_col, "mmr_score"])

    return cands.groupBy(query_col).applyInPandas(_greedy, schema=out_schema)


# ------------------------------------------------------- multi-vector maxsim
def token_code_expr(tok: Column | str, bits: int = 16) -> Column:
    """Deterministic ±1 sign-vector for a token, packed as a ``bits``-wide
    integer code: bit j = md5-hash parity of ``token#j``. Dot products
    between two tokens' implied ±1 vectors reduce to
    bits - 2*popcount(a XOR b) — exact int64, no floats anywhere."""
    from etl_wrap_spark.operators.text import hash60

    c = F.col(tok) if isinstance(tok, str) else tok
    acc = F.lit(0).cast("bigint")
    for j in range(bits):
        bit = hash60(F.concat(c, F.lit(f"#{j}"))) % 2
        acc = acc + bit * F.lit(1 << j).cast("bigint")
    return acc


def token_code_sql(tok: str, bits: int = 16) -> str:
    """Oracle-side mirror of token_code_expr."""
    return " + ".join(
        f"(CAST('0x' || substr(md5({tok} || '#{j}'), 1, 15) AS BIGINT) % 2) "
        f"* CAST({1 << j} AS BIGINT)"
        for j in range(bits)
    )


def maxsim_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    queries: list[tuple[str, str]],
    k: int = 5,
    bits: int = 16,
) -> DataFrame:
    """ColBERT-style late-interaction retrieval → (qid, rank, id, score):
    score(q, d) = Σ_{t∈q} max_{u∈d} ⟨v_t, v_u⟩ over per-TOKEN vectors,
    here the deterministic ±1 hash projections of token_code_expr, so
    the maxsim kernel is the exact integer bits - 2*popcount(xor).

    Plan shape: the query token table (|queries| × |q-tokens| rows) is
    BROADCAST against the corpus token table — the expensive frame is
    corpus-token-grain (linear in corpus size, never |Q|×|C| document
    pairs); the max and the sum are two map-side-combining aggregations
    on (qid, qtok, doc) then (qid, doc); the final top-k is a
    qid-partitioned rank window. At 100 TB the corpus token-code table
    is the persistable index (one bigint per distinct token per doc) —
    queries never rescan text."""
    from etl_wrap_spark.session import ensure_min_parallelism

    spark = docs.sparkSession
    docs = ensure_min_parallelism(docs)
    occ = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens(text_col))).alias("dt"),
    )
    # codes are computed on the VOCABULARY-grain distinct-token table
    # (16 md5 calls per distinct token, not per occurrence) and joined
    # back — the dictionary join a persisted code index would also use.
    # Vocabulary is broadcastable to ~10^7 terms; past that, drop the
    # hint and let the join shuffle on the token key.
    vocab = occ.select("dt").distinct().withColumn(
        "dcode", token_code_expr("dt", bits)
    )
    dtok = occ.join(F.broadcast(vocab), "dt")
    q = spark.createDataFrame(queries, "qid string, qtext string")
    qtok = q.select(
        "qid", F.explode(F.array_distinct(tokens("qtext"))).alias("qt")
    ).withColumn("qcode", token_code_expr("qt", bits))
    simmed = dtok.join(F.broadcast(qtok)).select(
        "qid", "qt", "id",
        (F.lit(bits) - 2 * F.bit_count(F.col("qcode").bitwiseXOR(F.col("dcode"))))
        .cast("bigint").alias("sim"),
    )
    per_qtok = simmed.groupBy("qid", "qt", "id").agg(F.max("sim").alias("best"))
    per_doc = per_qtok.groupBy("qid", "id").agg(F.sum("best").cast("bigint").alias("score"))
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("id"))
    return per_doc.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def kcenter_select(
    cands: DataFrame,
    group_col: str,
    id_col: str,
    code_col: str,
    k: int,
    code_bits: int = 60,
) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985 farthest-point
    traversal) → (group, pick_no, id, mmr_score): per group, k exemplars
    chosen so each new pick is the candidate FARTHEST (least similar
    under the integer SimHash kernel) from everything already picked —
    the diversity-only limit of MMR (λ = 0), the standard cheap coreset
    for training-data pruning ("keep k maximally-diverse examples per
    bucket"). Seed pick is the smallest id (scores all tie at 0);
    mmr_score of later picks is -(max similarity to the picked set), so
    HIGHER = farther = better coverage.

    Same bounded-per-group contract and applyInPandas shape as
    mmr_rerank; the whole trace is int64 and oracle-replayable."""
    zero = cands.withColumn("__rel0", F.lit(0).cast("bigint"))
    return mmr_rerank(
        zero, group_col, id_col, "__rel0", code_col,
        k=k, lam=(0, 1), code_bits=code_bits,
    )


def ndcg_discounts_fp(k: int, scale: int = 10**6) -> list[int]:
    """Binary-relevance nDCG discount table in fixed-point:
    floor(scale / log2(rank+1)) for rank 1..k. Pre-flooring the
    IRRATIONAL constants to integers is what makes the downstream
    metric engine-portable — DCG becomes a SUM OF INTEGERS (order-free,
    exactly associative), instead of a float sum whose value depends on
    Spark's nondeterministic row order. Both the Column expression and
    the oracle SQL embed the SAME integers, generated here."""
    import math

    return [int(scale / math.log2(r + 1)) for r in range(1, k + 1)]


def ranking_metrics(
    ranked: DataFrame,
    gold: DataFrame,
    query_col: str = "qid",
    doc_col: str = "cid",
    rank_col: str = "rank",
    k: int = 10,
    mrr_scale: int = 10**6,
) -> DataFrame:
    """Offline retrieval evaluation → per query (query, n_gold,
    hits_at_k, recall_at_k_bp, mrr_fp, ndcg_bp) — the recall@k / MRR@k /
    nDCG@k readout every retrieval change ships with (the ANN recall
    audits in SCALING.md computed these ad hoc; this is the first-class
    form).

    - ``recall_at_k_bp`` = floor(10000 · |top-k ∩ gold| / min(|gold|, k))
      — basis points, capped-recall normalization so a query with more
      gold docs than k can still score 10000.
    - ``mrr_fp`` = floor(mrr_scale / first rank of any gold doc in the
      list), 0 when no gold doc appears — reciprocal rank in fixed-
      point, summable/averagable downstream in exact integers.
    - ``ndcg_bp`` = floor(10000 · DCG_fp / IDCG_fp) with binary gains
      and the PRE-FLOORED integer discount table (ndcg_discounts_fp):
      DCG_fp sums the discount integers at the hit ranks — a bigint
      sum, order-free — and IDCG_fp is the table's prefix sum at
      min(|gold|, k). 10000 = a perfectly-ordered list.

    Everything is integer arithmetic on positive operands (`div` ≡
    DuckDB `//`), so the readout is engine-portable bit-for-bit —
    the repo's oracle-gating rule for metrics that drive decisions.

    Plan: the ranked list is |Q|·k rows by construction and gold is
    |Q|·|gold/query|; both group to query grain after one equi-join on
    (query, doc) — map-side combinable, no window, never corpus-sized.
    Queries with NO gold entry are absent from the output (nothing to
    measure); queries whose gold docs all miss the list report
    hits_at_k = 0, recall 0, mrr_fp = 0, ndcg_bp = 0.
    """
    if k < 1:
        raise ValueError("k >= 1 required")
    d_fp = ndcg_discounts_fp(k)
    idcg = [0]
    for v in d_fp:
        idcg.append(idcg[-1] + v)
    d_arr = "array(" + ", ".join(f"{v}L" for v in d_fp) + ")"
    idcg_arr = "array(" + ", ".join(f"{v}L" for v in idcg[1:]) + ")"
    r = ranked.where(F.col(rank_col) <= k).select(
        F.col(query_col).alias("__q"), F.col(doc_col).alias("__d"), F.col(rank_col).alias("__r")
    )
    g = gold.select(
        F.col(query_col).alias("__q"), F.col(doc_col).alias("__d")
    ).distinct()
    ng = g.groupBy("__q").agg(F.count(F.lit(1)).alias("n_gold"))
    hits = r.join(g, ["__q", "__d"]).groupBy("__q").agg(
        F.count(F.lit(1)).alias("__hits"),
        F.min("__r").alias("__first"),
        F.sum(F.expr(f"element_at({d_arr}, cast(__r as int))")).alias("__dcg_fp"),
    )
    return (
        ng.join(hits, "__q", "left")
        .select(
            F.col("__q").alias(query_col),
            "n_gold",
            F.coalesce("__hits", F.lit(0)).cast("bigint").alias("hits_at_k"),
            F.expr(
                f"(10000 * coalesce(__hits, 0)) div least(n_gold, {k})"
            ).cast("bigint").alias("recall_at_k_bp"),
            F.coalesce(
                F.expr(f"{mrr_scale} div __first"), F.lit(0)
            ).cast("bigint").alias("mrr_fp"),
            F.expr(
                f"(10000 * coalesce(__dcg_fp, 0)) div "
                f"element_at({idcg_arr}, cast(least(n_gold, {k}) as int))"
            ).cast("bigint").alias("ndcg_bp"),
        )
    )
