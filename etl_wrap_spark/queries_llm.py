"""Oracle-checked queries for the LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) over the
documents/embeddings tables.

Oracle strategy: hashes are md5-derived (portable), float reductions are
explicit left-associated term chains (IEEE-exact across engines), and
set arithmetic stays in integers — so DuckDB reproduces the distributed
results bit-for-bit. Large SQL (60-bit SimHash, 64-dim dot products) is
*generated* from the same constants the Column expressions use.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_wrap_spark.catalog import register
from etl_wrap_spark.operators import dedup, multimodal, similarity, text
from etl_wrap_spark.session import load_tables

_TOKS = "string_split_regex(trim(text), '\\s+')"
_SW = ", ".join(f"'{s}'" for s in text.STOPWORDS_EN)


# ------------------------------------------------------------ text analysis
@register(
    "q20_text_stats",
    oracle=f"""
    WITH d AS (
      SELECT source, {_TOKS} AS t, length(text) AS nchars FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(t)) AS BIGINT) AS total_tokens,
           CAST(SUM(nchars) AS BIGINT) AS total_chars,
           CAST(SUM(len(list_filter(t, x -> x IN ({_SW})))) AS BIGINT) AS stop_hits,
           CAST(SUM(CASE WHEN len(t) < 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_short
    FROM d GROUP BY source ORDER BY source
    """,
)
def q20_text_stats(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["documents"])
    return (
        t["documents"]
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(text.token_count("text")).alias("total_tokens"),
            F.sum(text.char_count("text")).alias("total_chars"),
            F.sum(text.stopword_hits("text")).alias("stop_hits"),
            F.sum(F.when(text.token_count("text") < 50, 1).otherwise(0)).alias("n_short"),
        )
        .orderBy("source")
    )


_LANG_SCORE_SQL = {
    lg: f"len(list_filter({_TOKS}, x -> x IN ({', '.join(repr(m) for m in ms)})))"
    for lg, ms in text.LANG_MARKERS.items()
}
_PRED_SQL = f"""
    CASE WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
         WHEN greatest({_LANG_SCORE_SQL['en']}, {_LANG_SCORE_SQL['de']}, {_LANG_SCORE_SQL['fr']}, {_LANG_SCORE_SQL['es']}) = 0 THEN 'und'
         WHEN {_LANG_SCORE_SQL['en']} = greatest({_LANG_SCORE_SQL['en']}, {_LANG_SCORE_SQL['de']}, {_LANG_SCORE_SQL['fr']}, {_LANG_SCORE_SQL['es']}) THEN 'en'
         WHEN {_LANG_SCORE_SQL['de']} = greatest({_LANG_SCORE_SQL['en']}, {_LANG_SCORE_SQL['de']}, {_LANG_SCORE_SQL['fr']}, {_LANG_SCORE_SQL['es']}) THEN 'de'
         WHEN {_LANG_SCORE_SQL['fr']} = greatest({_LANG_SCORE_SQL['en']}, {_LANG_SCORE_SQL['de']}, {_LANG_SCORE_SQL['fr']}, {_LANG_SCORE_SQL['es']}) THEN 'fr'
         ELSE 'es' END
"""


@register(
    "q21_doc_quality",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, {_TOKS} AS t FROM documents WHERE doc_id % 7 = 0
    )
    SELECT doc_id,
           len(t) AS n_tokens,
           CAST(floor(10000 * len(list_distinct(t)) / len(t)) AS BIGINT) AS distinct_bp,
           CAST(floor(10000 * len(list_filter(t, x -> x IN ({_SW}))) / len(t)) AS BIGINT) AS stop_bp,
           concat_ws(',',
             CASE WHEN len(t) < 20 THEN 'too_short' END,
             CASE WHEN len(t) > 10000 THEN 'too_long' END,
             CASE WHEN CAST(floor(10000 * len(list_distinct(t)) / len(t)) AS BIGINT) < 5000 THEN 'low_diversity' END,
             CASE WHEN len(list_filter(t, x -> x IN ({_SW}))) = 0 THEN 'no_stopwords' END
           ) AS flags,
           {_PRED_SQL} AS pred_lang
    FROM d ORDER BY doc_id
    """,
)
def q21_doc_quality(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["documents"])
    toks = text.tokens("text")
    n = F.size(toks)
    distinct_bp = F.floor(F.lit(10000) * F.size(F.array_distinct(toks)) / n).cast("bigint")
    return (
        t["documents"]
        .where(F.col("doc_id") % 7 == 0)
        .select(
            "doc_id",
            text.token_count("text").alias("n_tokens"),
            distinct_bp.alias("distinct_bp"),
            text.stopword_ratio_pct("text").alias("stop_bp"),
            text.quality_flags("text").alias("flags"),
            text.lang_id("text").alias("pred_lang"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------- exact dedup
@register(
    "q22_exact_dedup",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 2 = 0
    ), fp AS (
      SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
      FROM corpus
    )
    SELECT fingerprint, COUNT(*) AS n_copies, MIN(doc_id) AS canonical_id
    FROM fp GROUP BY fingerprint HAVING COUNT(*) > 1
    ORDER BY canonical_id
    """,
)
def q22_exact_dedup(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["documents"])
    docs = t["documents"].select("doc_id", "text")
    corpus = docs.unionByName(
        docs.where(F.col("doc_id") % 2 == 0).select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    return dedup.exact_duplicates(corpus, "doc_id", "text").orderBy("canonical_id")


# ----------------------------------------------- n-gram Jaccard shared oracle
_JACCARD_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, greatest(len(t) - 2, 1)),
                                          i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS s
      FROM toks
    ), ex AS (
      SELECT doc_id, unnest(s) AS shingle FROM sh
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), sized AS (
      SELECT id_a, id_b, inter,
             sa.n + sb.n - inter AS uni
      FROM inter
      JOIN (SELECT doc_id, len(s) AS n FROM sh) sa ON sa.doc_id = id_a
      JOIN (SELECT doc_id, len(s) AS n FROM sh) sb ON sb.doc_id = id_b
    )
    SELECT id_a, id_b, inter, uni FROM sized
    WHERE 2 * inter >= uni
    ORDER BY id_a, id_b
"""


# ------------------------------------------------------------- MinHash-LSH
@register("q23_minhash_lsh_neardup", oracle=_JACCARD_ORACLE)
def q23_minhash_lsh_neardup(spark, sf_dir):
    """LSH banding (16 bands x 2 rows over 32 MinHashes) generates the
    candidates; exact Jaccard verifies. The oracle computes ground truth
    directly — the planted near-dups sit at J>=0.98 with the next pair
    below 0.14, so band-recall is 1 - 1e-22 at the J>=0.5 cut."""
    t = load_tables(spark, sf_dir, ["documents"])
    pairs = dedup.near_dup_pairs_minhash(t["documents"], "doc_id", "text", n=3, num=2, den=1)
    return pairs.select(
        F.col("id_a"), F.col("id_b"), F.col("inter"), F.col("uni")
    ).orderBy("id_a", "id_b")


# ------------------------------------------------------------------ SimHash
def _simhash_oracle() -> str:
    sums = ",\n             ".join(
        f"SUM(((h >> {j}) & 1) * 2 - 1) AS s{j}" for j in range(dedup.SIMHASH_BITS)
    )
    recon = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(dedup.SIMHASH_BITS)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct({_TOKS})) AS tok
      FROM documents WHERE doc_id % 5 = 0
    ), h AS (
      SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM toks
    ), s AS (
      SELECT doc_id,
             {sums}
      FROM h GROUP BY doc_id
    )
    SELECT doc_id, {recon} AS simhash FROM s ORDER BY doc_id
    """


@register("q25_simhash", oracle=_simhash_oracle())
def q25_simhash(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["documents"])
    docs = t["documents"].where(F.col("doc_id") % 5 == 0)
    return dedup.simhash_signatures(docs, "doc_id", "text").orderBy("doc_id")


# ------------------------------------------------------- ANN: brute force
def _ann_oracle(bucketed: bool) -> str:
    dot = similarity.dot_sql("qv", "cv")
    nq = similarity.dot_sql("qv", "qv")
    nc = similarity.dot_sql("cv", "cv")
    bucket_join = ""
    if bucketed:
        bq = similarity.bucket_sql("qv")
        bc = similarity.bucket_sql("cv")
        bucket_join = f"WHERE {bq} = {bc}"
    return f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qv, label AS ql FROM embeddings WHERE vec_id % 50 = 0
    ), c AS (
      SELECT vec_id AS cid, embedding AS cv, label AS cl FROM embeddings WHERE vec_id % 50 <> 0
    ), scored AS (
      SELECT qid, cid,
             ({dot}) / (sqrt({nq}) * sqrt({nc})) AS cos,
             CASE WHEN ql = cl THEN 1 ELSE 0 END AS same_label
      FROM q, c {bucket_join}
    ), ranked AS (
      SELECT qid, cid, same_label,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rank
      FROM scored
    )
    SELECT qid, rank, cid, same_label FROM ranked WHERE rank <= 3 ORDER BY qid, rank
    """


@register("q26_ann_bruteforce", oracle=_ann_oracle(bucketed=False))
def q26_ann_bruteforce(spark, sf_dir):
    """Exact top-k through the PRODUCTION ANN route (round-5 verdict
    #6): ivf_topk(nprobe=None) probes every IVF cell, so the result is
    row-for-row the brute-force ground truth — the oracle is unchanged —
    but the plan is the cell equi-join production shape. The ad-hoc
    brute_force_topk API is baseline=True-gated and used only by
    ground-truth harnesses."""
    t = load_tables(spark, sf_dir, ["embeddings"])
    e = t["embeddings"]
    q = e.where(F.col("vec_id") % 50 == 0)
    c = e.where(F.col("vec_id") % 50 != 0)
    topk = similarity.ivf_topk(q, c, "vec_id", "vec_id", "embedding", k=3, nprobe=None)
    ql = F.broadcast(q.select(F.col("vec_id").alias("qid"), F.col("label").alias("ql")))
    cl = c.select(F.col("vec_id").alias("cid"), F.col("label").alias("cl"))
    return (
        topk.join(ql, on="qid")
        .join(cl, on="cid")
        .select("qid", "rank", "cid", F.when(F.col("ql") == F.col("cl"), 1).otherwise(0).alias("same_label"))
        .orderBy("qid", "rank")
    )


@register("q27_ann_signlsh", oracle=_ann_oracle(bucketed=True))
def q27_ann_signlsh(spark, sf_dir):
    """Scale path: only same-bucket (sign-LSH) pairs are scored. The
    oracle replicates the identical bucketing, so this checks the
    bucketed algorithm exactly (not its recall vs brute force)."""
    t = load_tables(spark, sf_dir, ["embeddings"])
    e = t["embeddings"]
    q = e.where(F.col("vec_id") % 50 == 0)
    c = e.where(F.col("vec_id") % 50 != 0)
    topk = similarity.signlsh_topk(q, c, "vec_id", "vec_id", "embedding", k=3)
    ql = F.broadcast(q.select(F.col("vec_id").alias("qid"), F.col("label").alias("ql")))
    cl = c.select(F.col("vec_id").alias("cid"), F.col("label").alias("cl"))
    return (
        topk.join(ql, on="qid")
        .join(cl, on="cid")
        .select("qid", "rank", "cid", F.when(F.col("ql") == F.col("cl"), 1).otherwise(0).alias("same_label"))
        .orderBy("qid", "rank")
    )


# -------------------------------------------------------- multimodal plumbing
@register(
    "q28_multimodal_plumbing",
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(CAST(text AS BLOB)) AS content_length,
           sha256(text) AS sha256,
           CAST((octet_length(CAST(text AS BLOB)) // 1000) // 10 + 1 AS BIGINT) AS n_frames,
           16 AS feature_dim
    FROM documents WHERE doc_id % 11 = 0 ORDER BY media_id
    """,
)
def q28_multimodal_plumbing(spark, sf_dir):
    """Binary-column pipeline: text → binary blob → typed media frame →
    Arrow-batched mapInPandas decode (deterministic stub) + frame-sample
    explode. Verifies schema, metadata derivation, and batch plumbing."""
    t = load_tables(spark, sf_dir, ["documents"])
    docs = t["documents"].where(F.col("doc_id") % 11 == 0)
    media = multimodal.media_frame_from_binary(
        docs.select("doc_id", F.encode("text", "UTF-8").alias("blob")), "doc_id", "blob", "image"
    )
    feats = multimodal.with_decoded_features(media, fake=True)
    frames = multimodal.frame_sample_plan(media).groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames")
    )
    return (
        feats.join(frames, on="media_id")
        .select(
            "media_id",
            "content_length",
            "sha256",
            F.col("n_frames").cast("bigint").alias("n_frames"),
            F.size("feature").alias("feature_dim"),
        )
        .orderBy("media_id")
    )


# ------------------------------------------- embedding-cosine near-dups
def _neardup_oracle() -> str:
    dot = similarity.dot_sql("va", "vb")
    na = similarity.dot_sql("va", "va")
    nb = similarity.dot_sql("vb", "vb")
    bkt_a = similarity.bucket_sql("va")
    bkt_b = similarity.bucket_sql("vb")
    return f"""
    WITH e AS (SELECT vec_id, embedding FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE {bkt_a.replace('embedding', 'a.embedding')} = {bkt_b.replace('embedding', 'b.embedding')}
      AND (({dot}) / (sqrt({na}) * sqrt({nb}))) * 10000 >= 4000
    """.replace("va[", "a.embedding[").replace("vb[", "b.embedding[")


@register("q32_embedding_neardup", oracle=_neardup_oracle() + " ORDER BY id_a, id_b")
def q32_embedding_neardup(spark, sf_dir):
    """Embedding-cosine high-similarity pairs (cos >= 0.40 — the synthetic
    corpus has no true near-dups; max pair cosine is 0.51), sign-LSH bucketed;
    the oracle replicates the identical buckets + fixed-fold cosine, so
    both engines agree bit-for-bit."""
    t = load_tables(spark, sf_dir, ["embeddings"])
    pairs = similarity.embedding_near_dups(t["embeddings"], "vec_id", "embedding", min_cos_bp=4000)
    return pairs.orderBy("id_a", "id_b")


# ----------------------------------------- rolling (min-hash) fingerprint
@register(
    "q52_rolling_fingerprint",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id % 13 = 0
    )
    SELECT doc_id,
           list_aggregate(
             list_transform(generate_series(1, greatest(len(t) - 7, 1)),
                            i -> CAST('0x' || substr(md5(array_to_string(list_slice(t, i, i + 7), ' ')), 1, 15) AS BIGINT)),
             'min') AS fp
    FROM toks ORDER BY doc_id
    """,
)
def q52_rolling_fingerprint(spark, sf_dir):
    """Content-defined fingerprint (min 60-bit hash over 8-gram
    shingles) — robust to local edits, unlike whole-text md5 (q22)."""
    t = load_tables(spark, sf_dir, ["documents"])
    return (
        t["documents"]
        .where(F.col("doc_id") % 13 == 0)
        .select("doc_id", text.rolling_fingerprint("text", ngram=8).alias("fp"))
        .orderBy("doc_id")
    )


# ------------------------------------------------- vocabulary term stats
@register(
    "q39_term_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    )
    SELECT term,
           COUNT(DISTINCT doc_id) AS df,
           COUNT(*) AS tf_total
    FROM toks
    GROUP BY term
    HAVING COUNT(DISTINCT doc_id) >= 5
    ORDER BY df DESC, tf_total DESC, term
    """,
)
def q39_term_stats(spark, sf_dir):
    """Corpus vocabulary statistics (document frequency + total term
    frequency) — the exact-integer core of TF-IDF (the idf log factor is
    a trivial projection left to callers: cross-engine log() differs in
    ulps, so the checked surface stays integral)."""
    t = load_tables(spark, sf_dir, ["documents"])
    toks = t["documents"].select("doc_id", F.explode(text.tokens("text")).alias("term"))
    return (
        toks.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"), F.count(F.lit(1)).alias("tf_total"))
        .where(F.col("df") >= 5)
        .orderBy(F.col("df").desc(), F.col("tf_total").desc(), "term")
    )


# ----------------------------------- corpus cleaning (composed pipeline)
_QUALITY_SQL = f"""
      SELECT doc_id, source, text, {_TOKS} AS t FROM documents
    ), q AS (
      SELECT doc_id, source, text, len(t) AS n_tokens FROM d0
      WHERE len(t) >= 20 AND len(t) <= 10000
        AND floor(10000 * len(list_distinct(t)) / len(t)) >= 5000
        AND len(list_filter(t, x -> x IN ({_SW}))) > 0
"""


@register(
    "q42_corpus_clean",
    oracle=f"""
    WITH d0 AS ({_QUALITY_SQL}
    ), toks AS (
      SELECT doc_id, {_TOKS.replace('text', 'text')} AS t FROM q
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, greatest(len(t) - 2, 1)),
                                          i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS s
      FROM toks
    ), ex AS (
      SELECT doc_id, unnest(s) AS shingle FROM sh
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN (SELECT doc_id, len(s) AS n FROM sh) sa ON sa.doc_id = id_a
      JOIN (SELECT doc_id, len(s) AS n FROM sh) sb ON sb.doc_id = id_b
      WHERE 2 * inter >= sa.n + sb.n - inter
    ), removed AS (
      SELECT DISTINCT id_b AS doc_id FROM pairs
    )
    SELECT q.source,
           COUNT(*) AS n_docs,
           CAST(SUM(q.n_tokens) AS BIGINT) AS total_tokens
    FROM q LEFT JOIN removed USING (doc_id)
    WHERE removed.doc_id IS NULL
    GROUP BY q.source ORDER BY q.source
    """,
)
def q42_corpus_clean(spark, sf_dir):
    """The composed training-data pipeline: structural quality filter →
    MinHash-LSH near-dup removal (keep the lower doc_id of each pair) →
    survivor statistics per source. Each stage is the oracle-checked
    operator from q21/q23 — this asserts their COMPOSITION."""
    t = load_tables(spark, sf_dir, ["documents"])
    from etl_wrap_spark.session import ensure_min_parallelism

    docs = ensure_min_parallelism(t["documents"]).where(
        text.quality_flags("text") == ""
    ).select(
        "doc_id", "source", "text", text.token_count("text").alias("n_tokens")
    )
    pairs = dedup.near_dup_pairs_minhash(docs, "doc_id", "text", n=3, num=2, den=1)
    removed = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    # the dropped-id set is pair-count-sized but statistics-opaque
    # (derived through the LSH cascade) — hint it broadcast or the
    # anti-join degrades to sort-merge
    kept = docs.join(F.broadcast(removed), on="doc_id", how="left_anti")
    return (
        kept.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("total_tokens"))
        .orderBy("source")
    )


# ------------------------------- df-capped inverted-index Jaccard (scale guard)
@register(
    "q43_jaccard_df_capped",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, greatest(len(t) - 2, 1)),
                                          i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS s
      FROM toks
    ), ex AS (
      SELECT doc_id, unnest(s) AS shingle FROM sh
    ), kept AS (
      SELECT shingle FROM ex GROUP BY shingle HAVING COUNT(DISTINCT doc_id) <= 50
    ), exk AS (
      SELECT ex.doc_id, ex.shingle FROM ex JOIN kept USING (shingle)
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM exk a JOIN exk b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), sized AS (
      SELECT id_a, id_b, inter, sa.n + sb.n - inter AS uni
      FROM inter
      JOIN (SELECT doc_id, len(s) AS n FROM sh) sa ON sa.doc_id = id_a
      JOIN (SELECT doc_id, len(s) AS n FROM sh) sb ON sb.doc_id = id_b
    )
    SELECT id_a, id_b, inter, uni FROM sized
    WHERE 2 * inter >= uni
    ORDER BY id_a, id_b
    """,
)
def q43_jaccard_df_capped(spark, sf_dir):
    """The documented quadratic-blowup guard for exact n-gram Jaccard:
    shingles occurring in more than 50 documents are dropped BEFORE
    pairing (intersection counts then undercount by exactly those
    boilerplate shingles — the oracle asserts that precise semantics,
    union sizes stay uncapped). On the planted near-dups (J>=0.98 over
    mostly unique shingles) the capped result equals the exact one."""
    t = load_tables(spark, sf_dir, ["documents"])
    pairs = dedup.exact_jaccard_pairs(t["documents"], "doc_id", "text", n=3, max_df=50)
    return pairs.where(2 * F.col("inter") >= F.col("uni")).select(
        "id_a", "id_b", "inter", "uni"
    ).orderBy("id_a", "id_b")


# ------------------------------------ deterministic train/val/test split
_SPLIT_BUCKET_SQL = "CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000"


@register(
    "q44_train_val_test_split",
    oracle=f"""
    SELECT CASE WHEN {_SPLIT_BUCKET_SQL} < 8000 THEN 'train'
                WHEN {_SPLIT_BUCKET_SQL} < 9000 THEN 'val'
                ELSE 'test' END AS split,
           lang,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY split, lang ORDER BY split, lang
    """,
)
def q44_train_val_test_split(spark, sf_dir):
    """Reproducible 80/10/10 split by salted hash — identical assignment
    on every run/engine (never rand())."""
    from etl_wrap_spark.operators.sampling import assign_split

    t = load_tables(spark, sf_dir, ["documents"])
    return (
        assign_split(t["documents"], "doc_id")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "lang")
    )


# ------------------------------------------- exact stratified sampling
@register(
    "q45_stratified_sample",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY CAST('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT), doc_id
             ) AS rk
      FROM documents
    )
    SELECT lang, doc_id, rk FROM ranked WHERE rk <= 5 ORDER BY lang, rk
    """,
)
def q45_stratified_sample(spark, sf_dir):
    from etl_wrap_spark.operators.sampling import stratified_sample
    from etl_wrap_spark.operators.text import hash60

    t = load_tables(spark, sf_dir, ["documents"])
    sampled = stratified_sample(t["documents"], "lang", "doc_id", k=5)
    h = hash60(F.concat(F.lit("sample:"), F.col("doc_id").cast("string")))
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy(h, F.col("doc_id"))
    return sampled.select("lang", "doc_id", F.row_number().over(w).alias("rk")).orderBy("lang", "rk")


# ------------------------------------------------ token-budget packing
@register(
    "q46_sequence_packing",
    oracle="""
    WITH sized AS (
      SELECT doc_id, source, len(string_split_regex(trim(text), '\\s+')) AS n_tokens
      FROM documents
    ), binned AS (
      SELECT source, doc_id, n_tokens,
             CAST(floor(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000.0) AS INT) AS bin
      FROM sized
    )
    SELECT source, bin, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM binned GROUP BY source, bin ORDER BY source, bin
    """,
)
def q46_sequence_packing(spark, sf_dir):
    """Token-budget sequence packing (2000-token bins per source) via
    exclusive-prefix-sum window algebra — the batch-shaping step before
    training, with exact integer semantics on both engines."""
    from etl_wrap_spark.operators.sampling import pack_sequences

    t = load_tables(spark, sf_dir, ["documents"])
    sized = t["documents"].select("doc_id", "source", text.token_count("text").alias("n_tokens"))
    binned = pack_sequences(sized, "source", "doc_id", "n_tokens", bin_capacity=2000)
    return (
        binned.groupBy("source", "bin")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("bin_tokens"))
        .orderBy("source", "bin")
    )


# ------------------------------------------------------------ PII scrubbing
def _pii_oracle() -> str:
    def q(p: str) -> str:
        return p.replace("'", "''")

    # mirror pii_hits: count each pattern on the string with all PRIOR
    # patterns replaced by their tokens (exactly what redact_pii sees)
    stripped = "dirty"
    hit_terms = []
    redacted = "dirty"
    for pat, token in text.PII_PATTERNS:
        hit_terms.append(f"len(regexp_extract_all({stripped}, '{q(pat)}'))")
        stripped = f"regexp_replace({stripped}, '{q(pat)}', '{token}', 'g')"
        redacted = f"regexp_replace({redacted}, '{q(pat)}', '{token}', 'g')"
    hits = " + ".join(hit_terms)
    return f"""
    WITH d AS (
      SELECT source,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com from 10.1.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS dirty
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM({hits}) AS BIGINT) AS pii_hits,
           CAST(SUM(CASE WHEN {redacted} LIKE '%@%' THEN 1 ELSE 0 END) AS BIGINT) AS leaked
    FROM d GROUP BY source ORDER BY source
    """


@register("q51_pii_redaction", oracle=_pii_oracle())
def q51_pii_redaction(spark, sf_dir):
    """Training-data PII scrubbing: deterministic email+IP injection,
    typed-token redaction, and a leakage assertion (no '@' survives).
    Identical RE2-safe regexes run on both engines."""
    t = load_tables(spark, sf_dir, ["documents"])
    dirty = F.concat(
        F.col("text"), F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.1."), (F.col("doc_id") % 256).cast("string"), F.lit(".7"),
    )
    d = t["documents"].select("source", dirty.alias("dirty"))
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(text.pii_hits("dirty")).alias("pii_hits"),
            F.sum(F.when(text.redact_pii("dirty").contains("@"), 1).otherwise(0)).alias("leaked"),
        )
        .orderBy("source")
    )
