"""Text analysis operators: tokenization, counting, quality scoring,
language ID, fingerprinting (SURVEY §7.1 M9).

All pure Column expressions — they run inside the scan projection with
whole-stage codegen, so a quality-filter pass over 100 TB of documents
is a single scan with no Python in the hot path.

Determinism contract: every function here has an exactly-equivalent
ANSI-SQL form (used by the oracle checks in queries_llm.py); hashes are
md5-derived so independent engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of trimmed text → array<string>."""
    return F.split(F.trim(_c(col)), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def char_count(col: Column | str) -> Column:
    return F.length(_c(col))


# GPT-2-style pre-tokenizer, reduced to an RE2-safe form (no lookaround,
# no unicode property classes — both Spark's Java regex and DuckDB's RE2
# run it identically): contraction suffixes, space-prefixed letter runs,
# digit runs, punctuation runs, residual whitespace.
BPE_SPLIT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9']+|\s+"


def bpe_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count under the BPE pre-tokenizer split — the
    budgeting unit of a training pipeline (context-window packing, cost
    estimates). Whitespace-only matches are not tokens and are excluded;
    a pure whole-word count is `token_count`."""
    c = _c(col)
    pieces = F.regexp_extract_all(c, F.lit(BPE_SPLIT_PATTERN), F.lit(0))
    return F.size(F.filter(pieces, lambda p: p.rlike(r"\S")))


def avg_token_len(col: Column | str) -> Column:
    """Mean token length as an exact decimal (sum of lengths / count)."""
    t = tokens(col)
    total = F.aggregate(t, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x))
    return (total.cast("decimal(18,6)") / F.size(t)).cast("decimal(18,6)")


# A small English stopword core; callers pass their own lists for other
# languages. Kept tiny and explicit so the oracle SQL can embed it.
STOPWORDS_EN = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def stopword_hits(col: Column | str, stopwords=STOPWORDS_EN) -> Column:
    """Number of tokens that are stopwords (multiset count)."""
    t = tokens(col)
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(t, lambda x: F.array_contains(sw, x)))


def stopword_ratio_pct(col: Column | str, stopwords=STOPWORDS_EN) -> Column:
    """Stopword ratio in basis points (integer 0..10000) — exact integer
    arithmetic so distributed results hash identically to any oracle."""
    return F.floor(F.lit(10000) * stopword_hits(col, stopwords) / token_count(col)).cast("bigint")


def quality_flags(col: Column | str, min_tokens: int = 20, max_tokens: int = 10000) -> Column:
    """Document quality classification (C4/Gopher-style structural rules,
    reduced to what's decidable on opaque text): too-short, too-long,
    low lexical diversity (<50% distinct tokens), no-stopword."""
    t = tokens(col)
    n = F.size(t)
    distinct_ratio_bp = F.floor(F.lit(10000) * F.size(F.array_distinct(t)) / n).cast("bigint")
    return F.concat_ws(
        ",",
        F.when(n < min_tokens, F.lit("too_short")),
        F.when(n > max_tokens, F.lit("too_long")),
        F.when(distinct_ratio_bp < 5000, F.lit("low_diversity")),
        F.when(stopword_hits(col) == 0, F.lit("no_stopwords")),
    )


# --------------------------------------------------------------- language ID
# Marker-token profiles (high-frequency function words) + a CJK character
# test. This is the classic cheap n-gram/stopword heuristic: score each
# language by marker hits, argmax with a fixed priority tiebreak.
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "fr": ("le", "la", "les", "et", "est", "une", "que", "pour"),
    "es": ("el", "los", "las", "es", "una", "que", "por", "para"),
}
_LANG_ORDER = ("en", "de", "fr", "es")


def lang_scores(col: Column | str) -> dict[str, Column]:
    t = tokens(col)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        mk = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(t, lambda x: F.array_contains(mk, x)))
    return out


def lang_id(col: Column | str) -> Column:
    """Predicted language: 'zh' if CJK characters present, else argmax of
    marker-token hits (priority order en>de>fr>es on ties); 'und' when no
    marker hits at all."""
    c = _c(col)
    scores = lang_scores(col)
    best = F.greatest(*[scores[lg] for lg in _LANG_ORDER])
    pred = F.lit("und")
    for lg in reversed(_LANG_ORDER):  # earlier languages win ties
        pred = F.when(scores[lg] == best, F.lit(lg)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    return F.when(c.rlike("[\\u4e00-\\u9fff]"), F.lit("zh")).otherwise(pred)


# ----------------------------------------------- repetition / Gopher signals
# Structural repetition heuristics in the style of the Gopher/MassiveText
# quality rules: machine-generated and boilerplate text repeats itself at
# the line and n-gram level. All ratios are exact integer basis points so
# any engine reproduces them bit-for-bit.


def lines(col: Column | str) -> Column:
    return F.split(_c(col), "\n")


def dup_line_fraction_bp(col: Column | str) -> Column:
    """Fraction of lines that are repeats of an earlier line, in basis
    points: 10000 * (n_lines - n_distinct_lines) / n_lines."""
    ln = lines(col)
    n = F.size(ln)
    return F.floor(F.lit(10000) * (n - F.size(F.array_distinct(ln))) / n).cast("bigint")


def bullet_line_fraction_bp(col: Column | str) -> Column:
    """Share of lines starting with a bullet marker ('- ', '* ')."""
    ln = lines(col)
    hits = F.size(
        F.filter(ln, lambda l: l.startswith("- ") | l.startswith("* "))
    )
    return F.floor(F.lit(10000) * hits / F.size(ln)).cast("bigint")


def ellipsis_line_fraction_bp(col: Column | str) -> Column:
    """Share of lines ending in '...' (truncated/teaser content)."""
    ln = lines(col)
    hits = F.size(F.filter(ln, lambda l: l.endswith("...")))
    return F.floor(F.lit(10000) * hits / F.size(ln)).cast("bigint")


def symbol_ratio_bp(col: Column | str) -> Column:
    """Symbol-to-word ratio ('#' and '...' occurrences per token) in
    basis points — high values mark markup/log debris."""
    c = _c(col)
    hits = F.size(F.regexp_extract_all(c, F.lit(r"#|\.\.\."), F.lit(0)))
    return F.floor(F.lit(10000) * hits / token_count(col)).cast("bigint")


def gopher_flags(
    col: Column | str,
    max_symbol_bp: int = 1000,
    max_dup_line_bp: int = 3000,
    max_bullet_bp: int = 9000,
    max_ellipsis_bp: int = 3000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
) -> Column:
    """Comma-joined structural quality flags (Gopher-rule thresholds):
    repetitive_lines, high_symbol_ratio, bullet_heavy, ellipsis_heavy,
    odd_word_length. Empty string = passes all rules. Complements
    quality_flags (length/diversity/stopwords) — together they form the
    standard pre-training structural filter bank."""
    mean_len_ok = avg_token_len(col).between(min_mean_word_len, max_mean_word_len)
    return F.concat_ws(
        ",",
        F.when(dup_line_fraction_bp(col) > max_dup_line_bp, F.lit("repetitive_lines")),
        F.when(symbol_ratio_bp(col) > max_symbol_bp, F.lit("high_symbol_ratio")),
        F.when(bullet_line_fraction_bp(col) > max_bullet_bp, F.lit("bullet_heavy")),
        F.when(ellipsis_line_fraction_bp(col) > max_ellipsis_bp, F.lit("ellipsis_heavy")),
        F.when(~mean_len_ok, F.lit("odd_word_length")),
    )


def top_ngram_coverage(df, id_col: str, text_col: str, n: int = 2):
    """Most-repeated token n-gram per document → (id, top_ngram, reps,
    coverage_bp) where coverage_bp = floor(10000 * reps * n / tokens) —
    the Gopher "fraction of text in the most common n-gram" signal.

    Explode + count + min-of-struct argmax: one shuffle on (id, gram)
    with map-side combine, then one on id; ties break to the
    lexicographically smallest gram so results are engine-exact.

    The token array is BOUND to a column before the per-element gram
    transform: a lambda body that references the tokenization expression
    tree directly would re-run the regex split once per array element
    (O(tokens²) per document — higher-order functions are interpreted
    per-element with no subexpression hoisting).
    """
    toks = df.select(F.col(id_col), tokens(text_col).alias("__t"))
    t = F.col("__t")
    cnt = F.size(t)
    idx = F.sequence(F.lit(1), F.greatest(cnt - (n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, n)))
    ex = toks.select(F.col(id_col), cnt.alias("__n"), F.explode(grams).alias("gram"))
    counted = ex.groupBy(id_col, "__n", "gram").agg(F.count(F.lit(1)).alias("reps"))
    best = (
        counted.select(
            F.col(id_col),
            F.col("__n"),
            F.struct((-F.col("reps")).alias("nr"), F.col("gram").alias("g")).alias("s"),
        )
        .groupBy(id_col, "__n")
        .agg(F.min("s").alias("b"))
    )
    return best.select(
        F.col(id_col),
        F.col("b.g").alias("top_ngram"),
        (-F.col("b.nr")).alias("reps"),
        F.floor(F.lit(10000) * (-F.col("b.nr")) * n / F.col("__n")).cast("bigint").alias("coverage_bp"),
    )


def alpha_terms(col: Column | str, min_len: int = 3) -> Column:
    """Lowercase alphabetic terms of length >= ``min_len`` →
    array<string>. The split regex ``[^a-z]+`` is RE2-safe so oracle SQL
    can use the literally identical pattern
    (``string_split_regex(lower(x), '[^a-z]+')``)."""
    return F.filter(
        F.split(F.lower(_c(col)), "[^a-z]+"), lambda t: F.length(t) >= min_len
    )


def tfidf_top_terms(df, id_col: str, text_col: str, top_k: int = 3, min_len: int = 3):
    """Per-document keyword extraction: top-k terms by an exact-integer
    tf-idf surrogate ``score_bp = tf * 1_000_000 div df`` (term frequency
    weighted by inverse document frequency; integer floor-division keeps
    the ranking bit-identical across engines — no float ``log`` whose
    libm rounding could differ).

    Plan at scale: explode → (doc, term) count with map-side combine,
    then document frequency as a COUNT window over the term partition —
    the tf frame is distinct per (doc, term), so the window count IS
    the df, and the term hash-exchange it needs replaces the previous
    separate vocabulary aggregate + shuffle join back (one exchange
    where there were two + a join; the exact_jaccard max_df cap uses
    the same collapse, measured 7.5→4.4 s there) — then a per-doc
    ranking window. No all-pairs stage; every shuffle is on a keyed
    aggregate. Ties break to the lexicographically smallest term so
    top-k is engine-exact.

    Reference parity: keyword/term weighting is the IR complement of
    Wrap-style term statistics (see q39); the reference has no tf-idf —
    this is part of the training-data curation layer.
    """
    ex = df.select(
        F.col(id_col), F.explode(alpha_terms(text_col, min_len)).alias("term")
    )
    tf = ex.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    scored = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    ).withColumn(
        "score_bp", F.expr("CAST(tf * 1000000 DIV df AS BIGINT)")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_bp").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_k)
        .select(F.col(id_col), "term", "tf", "df", "score_bp")
    )


def bigram_collocations(df, text_col: str, min_count: int = 5, min_len: int = 3):
    """Corpus-level collocation mining: token bigrams ranked by an
    exact-integer lift score ``lift_bp = n_ab * n_tokens * 10_000 div
    (n_a * n_b)`` — the argument of PMI (PMI = log lift), kept in integer
    arithmetic so both engines agree bit-for-bit. ``min_count`` floors
    the bigram support (PMI is noise-dominated at low counts).

    Plan at scale: three keyed aggregations (bigram counts, unigram
    counts, corpus total — the total is a 1-row aggregate broadcast into
    the join), then two shuffle joins on the unigram key. Note: at
    extreme corpus sizes the ``n_ab * n_tokens * 10_000`` product can
    exceed int64 (~9.2e18) — upgrade to DECIMAL(38,0) intermediates when
    n_tokens * max(n_ab) * 1e4 approaches that bound.

    Bigrams come from zipping the term array against its own 1-shifted
    slice — a constant number of evaluations of the tokenization
    expression per row. (The earlier form indexed the array inside a
    per-element lambda, which re-ran the regex split once per element:
    O(tokens²) per document, measured 3.4× slower on the sf0.1 corpus.)
    """
    toks = df.select(alpha_terms(text_col, min_len).alias("__t"))
    t = F.col("__t")
    nshift = F.greatest(F.size(t) - 1, F.lit(0))
    grams = F.arrays_zip(
        F.slice(t, 1, nshift).alias("a"), F.slice(t, 2, nshift).alias("b")
    )
    pairs = toks.select(F.explode(grams).alias("g")).select("g.a", "g.b")
    uni = (
        toks.select(F.explode(t).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = uni.agg(F.sum("n").cast("bigint").alias("n_tokens"))
    ab = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
    return (
        ab.where(F.col("n_ab") >= min_count)
        .join(uni.withColumnRenamed("term", "a").withColumnRenamed("n", "n_a"), "a")
        .join(uni.withColumnRenamed("term", "b").withColumnRenamed("n", "n_b"), "b")
        .crossJoin(F.broadcast(total))
        .select(
            "a",
            "b",
            "n_ab",
            "n_a",
            "n_b",
            F.expr("CAST(n_ab * n_tokens * 10000 DIV (n_a * n_b) AS BIGINT)").alias(
                "lift_bp"
            ),
        )
    )


# ------------------------------------------------------------- fingerprints
def normalize_text(col: Column | str) -> Column:
    """Canonical form for exact-dup detection: lowercase, collapse
    whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def fingerprint_md5(col: Column | str) -> Column:
    """Exact-dup fingerprint: md5 hex of the normalized text."""
    return F.md5(normalize_text(col))


def hash60(col: Column | str) -> Column:
    """Deterministic 60-bit integer hash (first 15 hex chars of md5) —
    portable across engines (DuckDB: CAST('0x'||substr(md5(x),1,15) AS
    BIGINT))."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 15), 16, 10).cast("bigint")


def rolling_fingerprint(col: Column | str, ngram: int = 8) -> Column:
    """Content-defined document fingerprint: minimum 60-bit hash over the
    token `ngram`-shingles (a 1-hash MinHash — robust to local edits,
    unlike whole-text md5).

    The token array is let-bound through a 1-element outer transform
    (``transform(array(tokens), t -> ...)``): the tokenization runs once
    as the outer transform's argument, and the inner per-shingle lambda
    references the bound lambda VARIABLE ``t`` — not the expression tree,
    which would re-split the text once per shingle (O(tokens²))."""

    def _min_shingle_hash(t: Column) -> Column:
        idx = F.sequence(F.lit(0), F.greatest(F.size(t) - ngram, F.lit(0)))
        hashes = F.transform(
            idx,
            lambda i: F.conv(
                F.substring(F.md5(F.concat_ws(" ", F.slice(t, i + 1, ngram))), 1, 15), 16, 10
            ).cast("bigint"),
        )
        return F.array_min(hashes)

    return F.element_at(F.transform(F.array(tokens(col)), _min_shingle_hash), 1)


# ------------------------------------------------ corpus bigram LM scoring
def _bigram_frame(df, id_col: str, text_col: str):
    """(id, a, b) token-bigram frame via zip-against-shifted-slice —
    constant tokenization evaluations per row (the q73 lesson)."""
    t = F.col("__t")
    nshift = F.greatest(F.size(t) - 1, F.lit(0))
    grams = F.arrays_zip(
        F.slice(t, 1, nshift).alias("a"), F.slice(t, 2, nshift).alias("b")
    )
    return (
        df.select(F.col(id_col), tokens(text_col).alias("__t"))
        .select(id_col, F.explode(grams).alias("g"))
        .select(id_col, "g.a", "g.b")
    )


def bigram_lm_scores(df, id_col: str, text_col: str, lm_df=None):
    """Per-document fluency scoring against a corpus bigram LM — the
    KenLM-perplexity-filter pattern (CCNet keeps documents whose LM
    score clears a corpus-relative bar) in pure DataFrame algebra.

    The LM: P(b|a) = n_ab / n_a over ``lm_df`` (a REFERENCE corpus —
    the production shape: train on curated text, score the crawl;
    bigrams unseen in the reference score 0, the integer analogue of
    the OOV penalty). ``lm_df=None`` self-scores against ``df`` —
    oracle-friendly, but note the self-LM caveat: a token seen once
    has a single successor, so P = 1 for its transition; self-mode
    therefore rewards repeated-or-singleton contexts rather than
    penalizing novelty, and corpus-relative FILTERING should use a
    reference LM.

    Per document: the mean transition probability of its bigrams in
    exact integer basis points — per-bigram
    ``floor(10000 * n_ab / n_a)`` summed per doc, then floor-averaged —
    so both engines agree bit-for-bit (a float log-prob sum would be
    order-dependent; monotone transforms preserve the filter ranking).

    Plan at scale: one (a,b) aggregation for the LM (vocabulary-sized
    state), a derived n_a aggregation, then the doc bigram frame joins
    the LM on its (a,b) shuffle key. Keyed aggregation + shuffle joins
    only; no driver ops.

    → (id, n_bigrams, sum_p_bp, lm_score_bp) for docs with >= 1 bigram.
    """
    doc_big = _bigram_frame(df, id_col, text_col)
    lm_big = doc_big if lm_df is None else _bigram_frame(lm_df, id_col, text_col)
    lm = lm_big.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n_ab"))
    na = lm.groupBy("a").agg(F.sum("n_ab").alias("n_a"))
    scored = (
        doc_big.join(lm, ["a", "b"], "left")
        .join(na, "a", "left")
        .select(
            F.col(id_col),
            F.coalesce(
                F.expr("CAST(10000 * n_ab DIV n_a AS BIGINT)"), F.lit(0).cast("bigint")
            ).alias("p_bp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("p_bp").cast("bigint").alias("sum_p_bp"),
        F.expr("CAST(sum(p_bp) DIV count(1) AS BIGINT)").alias("lm_score_bp"),
    )


def chunk_documents(
    df,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    overlap: int = 8,
):
    """Sliding-window document chunking — the retrieval/embedding
    pipeline's splitter: fixed token windows with overlap so no span is
    ever cut without context on one side.

    Chunk k covers tokens [1 + k*stride, ... + chunk_tokens) with
    stride = chunk_tokens - overlap; the last chunk starts at the final
    stride multiple that still leaves unseen tokens (every token is in
    >= 1 chunk, short docs yield exactly one). Pure array arithmetic —
    one tokenization per row, starts from an integer sequence, chunk
    text by slice — so a 100 TB corpus chunks map-only with no shuffle
    and no UDF.

    → (id, chunk_idx, start_token, n_tokens, chunk_text)
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    t = F.col("__t")
    n = F.size(t)
    # number of ADDITIONAL chunks past the first: ceil((n - C) / stride)
    # with nonnegative operands (floor == truncate, engine-agnostic)
    extra = F.when(
        n <= chunk_tokens, F.lit(0)
    ).otherwise((n - chunk_tokens + stride - 1).cast("bigint") / stride).cast("bigint")
    starts = F.sequence(F.lit(1).cast("bigint"), 1 + extra * stride, F.lit(stride).cast("bigint"))
    exploded = (
        df.select(F.col(id_col), tokens(text_col).alias("__t"))
        .select(id_col, "__t", F.posexplode(starts).alias("chunk_idx", "start_token"))
    )
    return exploded.select(
        id_col,
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        "start_token",
        F.least(F.lit(chunk_tokens).cast("bigint"), F.size("__t") - F.col("start_token") + 1)
        .alias("n_tokens"),
        F.concat_ws(" ", F.slice("__t", F.col("start_token").cast("int"), chunk_tokens))
        .alias("chunk_text"),
    )


# ------------------------------------------------- web-text cleanup (markup)
# RE2-safe tag pattern + the entity set worth decoding without a full
# HTML parser. Both are cross-engine exact: Spark and DuckDB run the
# same regex / replace chain, so cleanup is oracle-checkable.
MARKUP_TAG_PATTERN = r"<[^>]*>"
HTML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # LAST: else &amp;lt; would double-decode
)


def strip_markup(col: Column | str) -> Column:
    """HTML/markup removal for scraped corpora: drop tags, decode the
    common entities, collapse the whitespace the tags leave behind.
    A regex strip (not a DOM parse) is the standard pre-training
    trade-off: script/style CONTENT survives only as text, which the
    quality filters downstream are responsible for flagging."""
    c = F.regexp_replace(_c(col), MARKUP_TAG_PATTERN, " ")
    for ent, rep in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def markup_tag_count(col: Column | str) -> Column:
    """Number of markup tags in the raw text (a scrape-quality signal:
    high tag density marks navigation/chrome-heavy pages)."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(MARKUP_TAG_PATTERN), F.lit(0)))


# ------------------------------------------- mojibake (double-encode) repair
# UTF-8 bytes re-decoded as Latin-1/cp1252: the most common corruption in
# web corpora. The repair map covers the high-frequency German/French
# letters and cp1252 punctuation; chained literal replace() (no regex)
# is bit-identical across engines. Order matters only in that longer
# sequences must precede their prefixes (none collide here).
MOJIBAKE_MAP = (
    ('Ã¤', 'ä'),
    ('Ã¶', 'ö'),
    ('Ã¼', 'ü'),
    ('Ã„', 'Ä'),
    ('Ã–', 'Ö'),
    ('Ãœ', 'Ü'),
    ('ÃŸ', 'ß'),
    ('Ã©', 'é'),
    ('Ã¨', 'è'),
    ('Ã§', 'ç'),
    ('â€™', '’'),
    ('â€œ', '“'),
    ('â€“', '–'),
    ('â€”', '—'),
)


def repair_mojibake(col: Column | str) -> Column:
    """Undo the UTF-8-as-Latin-1 double-decode for the mapped sequences."""
    c = _c(col)
    for bad, good in MOJIBAKE_MAP:
        c = F.replace(c, F.lit(bad), F.lit(good))
    return c


def mojibake_hits(col: Column | str) -> Column:
    """How many mapped mojibake sequences the text contains — the
    corpus-health metric that decides whether a source needs re-ingestion
    with the correct encoding instead of string repair."""
    c = _c(col)
    total = F.lit(0)
    for bad, _ in MOJIBAKE_MAP:
        total = total + F.size(F.split(c, F.lit(bad), -1)) - 1
    return total.cast("bigint")


# ------------------------------------------------------------ PII scrubbing
# RE2-safe patterns (no lookaround/backrefs) so the oracle SQL uses the
# literally identical regex. Deliberately conservative: training-data
# scrubbing favors recall on well-formed identifiers over NLP-grade PII
# detection (which needs models, not regexes).
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\+?\d{1,3}[- ]\d{3,4}[- ]\d{3,4}([- ]\d{3,4})?", "[PHONE]"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
)


def redact_pii(col: Column | str) -> Column:
    """Replace email / phone-shaped / IPv4-shaped substrings with typed
    placeholder tokens, in a fixed pattern order (emails first so their
    digits can't be half-eaten by the phone rule)."""
    c = _c(col)
    for pattern, token in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


def pii_hits(col: Column | str) -> Column:
    """Number of PII substrings that redact_pii replaces.

    Counts each pattern on the string with prior patterns already
    replaced by their placeholder TOKENS (not stripped): deleting a
    match can splice adjacent digit runs into phone/IP shapes that
    redaction would never touch, so stripping over- or under-counts."""
    c = _c(col)
    total = F.lit(0)
    for pattern, token in PII_PATTERNS:
        total = total + F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))
        c = F.regexp_replace(c, pattern, token)
    return total


def normalize_unicode_df(
    df, text_col: str, form: str = "NFC", out_col: str = "text_nfc"
):
    """Unicode normalization (NFC/NFKC/NFD/NFKD) — the canonicalization
    step a multilingual curation pipeline runs before hashing/dedup
    (the same logical text arrives composed AND decomposed from
    different sources; un-normalized corpora silently miss exact-dup
    and shingle matches on every accented word).

    Spark SQL has no normalizer, so this is an Arrow mapInPandas pass
    over ``unicodedata.normalize`` — batch-vectorized Python on the
    one column, everything else untouched. NFC output is oracle-checked
    against DuckDB's utf8proc ``nfc_normalize`` (q139); both implement
    the same Unicode standard."""
    import pandas as pd  # noqa: F401 (executor-side)

    fields = df.schema.fields
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in fields)
    schema += f", `{out_col}` string"

    def _norm(batches):
        import unicodedata

        for pdf in batches:
            pdf[out_col] = [
                unicodedata.normalize(form, t) if t is not None else None
                for t in pdf[text_col]
            ]
            yield pdf

    return df.mapInPandas(_norm, schema=schema)


def _py_fold_accents(t):
    """Reference fold: unicodedata NFD + drop combining marks (Mn)."""
    import unicodedata

    if t is None:
        return None
    return "".join(
        ch
        for ch in unicodedata.normalize("NFD", t)
        if unicodedata.category(ch) != "Mn"
    )


def _arrow_nfd_strip_ok() -> bool:
    """True when THIS process's pyarrow build reproduces the unicodedata
    NFD + strip-Mn fold exactly on a probe set. Memoized per process:
    pyarrow's utf8_normalize has shipped builds where the `form` option
    is ignored (this container's 16.1 always emits canonical-decomposed),
    which is harmless for the NFD consumer here but means the kernel must
    be PROVEN, not assumed. Round-9 ADVICE: called from INSIDE the
    mapInArrow closure (see fold_accents_df) so the probe runs on the
    executor worker's pyarrow, not the driver's."""
    global _ARROW_FOLD_OK
    if _ARROW_FOLD_OK is None:
        try:
            import pyarrow as pa
            import pyarrow.compute as pc

            probes = [
                "Mühleisen café ño", "Ångström", "ẛ̣", "가각", "ﬁﬂ",
                "ẹ́", "plain ascii", "",
            ]
            got = pc.replace_substring_regex(
                pc.utf8_normalize(pa.array(probes), form="NFD"),
                pattern=r"\p{Mn}", replacement="",
            ).to_pylist()
            _ARROW_FOLD_OK = got == [_py_fold_accents(t) for t in probes]
        except Exception:
            _ARROW_FOLD_OK = False
    return _ARROW_FOLD_OK


_ARROW_FOLD_OK: bool | None = None


def fold_accents_df(df, text_col: str, out_col: str = "text_folded",
                    use_arrow: bool | None = None):
    """Accent folding (é→e, ü→u, ñ→n): NFD-decompose then drop
    combining marks — the aggressive sibling of NFC normalization
    (normalize_unicode_df) for search/matching pipelines where
    'Mühleisen' must hit 'Muhleisen'. One Arrow mapInArrow pass running
    pyarrow's C++ utf8proc kernels (NFD + RE2 \\p{Mn} strip) — ~10-50x
    the per-row Python loop — with the kernel-vs-unicodedata parity
    probe executed IN THE WORKER and memoized per worker process
    (round-9 ADVICE: a driver-side probe can pass while a heterogeneous
    executor pyarrow build diverges); on mismatch that worker falls back
    to the unicodedata loop. Both paths oracle-checked against DuckDB's
    utf8proc strip_accents (q154).

    ``use_arrow``: None (default) probes per worker; False pins the
    unicodedata loop (pickled into the closure by value — the only way
    a test on the driver can force the fallback path in the workers);
    True pins the Arrow kernel (parity tests only — it skips the probe
    the default exists to run)."""
    fields = df.schema.fields
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in fields)
    schema += f", `{out_col}` string"

    def _fold(batches):
        import pyarrow as pa

        for rb in batches:
            col = rb.column(rb.schema.get_field_index(text_col))
            if _arrow_nfd_strip_ok() if use_arrow is None else use_arrow:
                import pyarrow.compute as pc

                folded = pc.replace_substring_regex(
                    pc.utf8_normalize(col, form="NFD"),
                    pattern=r"\p{Mn}", replacement="",
                )
            else:
                folded = pa.array(
                    [_py_fold_accents(t) for t in col.to_pylist()],
                    type=pa.string(),
                )
            yield pa.RecordBatch.from_arrays(
                [*rb.columns, folded], names=[*rb.schema.names, out_col]
            )

    return df.mapInArrow(_fold, schema=schema)


def canonical_url(col: Column | str) -> Column:
    """URL canonicalization for crawl dedup — the normalization under
    which 'HTTP://Example.com:80/a?b=2&a=1#frag' and
    'http://example.com/a?a=1&b=2' are the SAME page:

    - scheme and host lowercase; default ports (:80 http, :443 https)
      stripped; empty path → '/';
    - fragment dropped (never sent to the server);
    - query parameters SORTED (order is almost never semantic; sorting
      collapses permuted trackers to one key) and empty query dropped.

    Pure Column expressions (regex splits + array sort + concat), so
    the exact same canonical form is computable by any engine — URL
    keys can feed exact_duplicates/connected components directly."""
    u = F.regexp_replace(_c(col), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.substring(hostport, 1, F.length(hostport) - F.lit(3)),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.substring(hostport, 1, F.length(hostport) - F.lit(4)),
    ).otherwise(hostport)
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    sorted_q = F.concat_ws(
        "&", F.array_sort(F.filter(F.split(query, "&"), lambda p: p != ""))
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )


def cluster_label_terms(
    df,
    cluster_col: str,
    text_col: str,
    top_k: int = 5,
    min_len: int = 3,
    min_count: int = 2,
):
    """Cluster labeling by distinctive terms (class-based tf-idf, the
    BERTopic/c-TF-IDF readout): for each cluster, the top-k terms by the
    exact-integer lift of the term's rate inside the cluster over its
    corpus rate:

        lift_bp = ctf * total_tokens * 10000 div (cluster_tokens * cf)

    (ctf = term count in cluster, cf = corpus count). All integers —
    no float log, so rankings are engine-exact; ties break to the
    lexicographically smallest term. ``min_count`` floors ctf (rate
    ratios are noise at singleton support).

    Plan at scale: explode → (cluster, term) counts with map-side
    combine, a vocabulary-grain corpus aggregate, two broadcast-able
    joins (corpus totals are 1-row / vocabulary-grain), and a
    cluster-partitioned rank window. Same shuffle discipline as
    tfidf_top_terms; the output is cluster-grain · k.

    Overflow: ctf·total_tokens·10⁴ exceeds int64 when corpus tokens
    approach ~10¹⁴/ctf — upgrade the product to DECIMAL(38,0) past
    ~10¹² total tokens (the bigram_collocations bound note applies).
    """
    ex = df.select(
        F.col(cluster_col).alias("cluster"),
        F.explode(alpha_terms(text_col, min_len)).alias("term"),
    )
    ctf = ex.groupBy("cluster", "term").agg(F.count(F.lit(1)).alias("ctf"))
    ctot = ex.groupBy("cluster").agg(F.count(F.lit(1)).alias("cluster_tokens"))
    cf = ctf.groupBy("term").agg(F.sum("ctf").alias("cf"))
    total = ex.agg(F.count(F.lit(1)).alias("total_tokens"))
    scored = (
        ctf.where(F.col("ctf") >= min_count)
        .join(ctot, "cluster")
        .join(cf, "term")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "lift_bp",
            F.expr("(ctf * total_tokens * 10000) div (cluster_tokens * cf)").cast("bigint"),
        )
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("lift_bp").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_k)
        .select(
            "cluster", "term",
            F.col("ctf").cast("bigint").alias("ctf"),
            F.col("cf").cast("bigint").alias("cf"),
            "lift_bp",
        )
    )


def readability_profile(df, id_col: str, text_col: str):
    """Flesch reading-ease per document in exact MILLI-points →
    (id, words, sentences, syllables, flesch_milli):

        flesch_milli = 206835 - (1015·words) div sentences
                              - (84600·syllables) div words

    (the classic 206.835 − 1.015·w/s − 84.6·syl/w, every constant
    scaled ×1000 and both rate terms floor-divided — no float division,
    so the score is engine-exact). Sentences = [.!?]+ runs (floored at
    1 for fragment/heading rows); syllables = [aeiouy]+ vowel groups
    per word, floored at 1 per word — the standard cheap heuristic
    (±1 syllable on silent-e words; fine for corpus-level filtering,
    not for grading essays).

    One scan, all per-row Column expressions + a doc-grain aggregate;
    the quality-filter sibling of quality_flags/gopher signals (low
    flesch = dense legalese/boilerplate; very high = fragment soup)."""
    t = tokens(text_col)
    words = F.size(t)
    sentences = F.greatest(
        F.size(F.regexp_extract_all(F.trim(_c(text_col)), F.lit("[.!?]+"), 0)),
        F.lit(1),
    )
    syl = F.aggregate(
        F.transform(
            t,
            lambda w: F.greatest(
                F.size(F.regexp_extract_all(F.lower(w), F.lit("[aeiouy]+"), 0)),
                F.lit(1),
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    d = df.select(
        F.col(id_col),
        words.cast("bigint").alias("words"),
        sentences.cast("bigint").alias("sentences"),
        syl.alias("syllables"),
    ).where(F.col("words") > 0)
    return d.select(
        id_col, "words", "sentences", "syllables",
        (
            F.lit(206835)
            - F.expr("(1015 * words) div sentences")
            - F.expr("(84600 * syllables) div words")
        ).cast("bigint").alias("flesch_milli"),
    )


# second-level labels under which a country-code registrar sells names
# (simplified public-suffix heuristic — the full PSL is a data file; this
# covers the dominant patterns for crawl-scale rollups)
SECOND_LEVEL_LABELS = ("co", "com", "net", "org", "ac", "gov", "edu")


def registered_domain(host: Column | str) -> Column:
    """Registered (pay-level) domain of a hostname: the last two labels,
    or the last THREE when the second-to-last label is a registrar
    second-level label (``example.co.uk`` → ``example.co.uk``, not
    ``co.uk``). Simplified public-suffix heuristic — swap in the full
    PSL table (a broadcast join on the suffix) when exactness matters;
    the crawl-curation rollup (per-site quotas, host dedup, spam-domain
    screens) keys on this."""
    h = F.lower(_c(host))
    labels = F.split(h, r"\.")
    n = F.size(labels)
    second = F.element_at(labels, -2)
    take3 = (n >= 3) & second.isin(*SECOND_LEVEL_LABELS)
    return F.when(
        n <= 2, h
    ).when(
        take3, F.concat_ws(".", F.element_at(labels, -3), F.element_at(labels, -2), F.element_at(labels, -1))
    ).otherwise(F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1)))


# Bundled public-suffix-list EXCERPT in the publicsuffix.org rule format
# (exact rules, `*.` wildcard rules, `!` exception rules). This is a
# test/demo snippet, NOT the full list — production deployments pass the
# ~9k-rule file from https://publicsuffix.org/list/ (the format below is
# exactly its non-comment line format, so the download drops straight in).
PSL_SNIPPET = (
    "com", "net", "org", "io", "uk", "au", "jp", "ck",
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "github.io",          # private-section suffix: user sites are registrable
    "*.ck",               # every 2-label .ck suffix is public ...
    "!www.ck",            # ... except www.ck, which is itself registrable
)


def registered_domain_psl(
    df,
    host_col: str,
    psl_rules=PSL_SNIPPET,
    out_col: str = "registered_domain",
):
    """EXACT registered (pay-level) domain via the public suffix list —
    the upgrade the `registered_domain` heuristic's docstring promises
    (that 2/3-label rule misses multi-label suffixes like
    ``s3.amazonaws.com`` and wildcard/exception TLD policies).

    Implements the publicsuffix.org algorithm: among all rules matching
    a label-suffix of the host, an exception rule (``!www.ck``) wins
    outright (its public suffix is the rule minus its leftmost label),
    else the LONGEST match wins, where ``*.ck`` matches any suffix with
    exactly one extra label; the default rule ``*`` (bare TLD) applies
    when nothing matches. The registered domain is the public suffix
    plus one preceding label — NULL when the host IS a public suffix
    (``co.uk`` has no registrant), matching the reference algorithm.

    Scale shape: rules are a BROADCAST table (the full PSL is ~9k rows);
    hosts are reduced to DISTINCT values first (the function depends on
    the host alone), each exploded into its ≤ label-count suffix
    candidates, matched against the broadcast, and the per-host winner
    is joined back host-keyed — no row ids, no corpus-sized explode:
    candidate volume is O(distinct hosts × labels-per-host).
    """
    spark = df.sparkSession
    rows = []
    for raw in psl_rules:
        r = raw.strip().lower()
        if not r or r.startswith("//"):
            continue
        is_exc = r.startswith("!")
        is_wild = r.startswith("*.")
        anchor = r[1:] if is_exc else (r[2:] if is_wild else r)
        rows.append((anchor, anchor.count(".") + 1, is_wild, is_exc))
    rules = spark.createDataFrame(
        rows, "anchor string, anchor_n int, is_wild boolean, is_exc boolean"
    )

    h = F.lower(F.col(host_col))
    hosts = df.select(h.alias("__h")).where(F.col("__h").isNotNull()).distinct()
    lab = F.split(F.col("__h"), r"\.")
    n = F.size(lab)
    # candidate label-suffixes: i = 1..n labels from the right
    cand = hosts.select(
        "__h",
        n.alias("__n"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.struct(
                    i.alias("clen"),
                    F.concat_ws(
                        ".", F.slice(lab, F.size(lab) - i + 1, i)
                    ).alias("suffix"),
                ),
            )
        ).alias("__c"),
    ).select("__h", "__n", F.col("__c.clen").alias("__clen"), F.col("__c.suffix").alias("__sfx"))
    m = cand.join(F.broadcast(rules), cand["__sfx"] == rules["anchor"], "left")
    resolved = (
        m.groupBy("__h", "__n")
        .agg(
            F.max(F.when(F.col("is_exc"), F.col("anchor_n") - 1)).alias("__exc"),
            F.max(
                F.when(
                    F.col("is_wild") & (F.col("__n") > F.col("__clen")),
                    F.col("__clen") + 1,
                )
            ).alias("__wild"),
            F.max(
                F.when(
                    ~F.col("is_wild") & ~F.col("is_exc") & F.col("anchor").isNotNull(),
                    F.col("__clen"),
                )
            ).alias("__exact"),
        )
        .select(
            "__h",
            "__n",
            F.coalesce(
                F.col("__exc"),
                F.greatest(
                    F.coalesce(F.col("__wild"), F.lit(1)),
                    F.coalesce(F.col("__exact"), F.lit(1)),
                ),
            ).alias("__plen"),
        )
    )
    lab2 = F.split(F.col("__h"), r"\.")
    reg = resolved.select(
        "__h",
        F.when(
            F.col("__n") > F.col("__plen"),
            F.concat_ws(
                ".",
                F.slice(lab2, F.col("__n") - F.col("__plen"), F.col("__plen") + 1),
            ),
        ).alias(out_col),
    )
    return df.join(reg, F.lower(F.col(host_col)) == reg["__h"], "left").drop("__h")
