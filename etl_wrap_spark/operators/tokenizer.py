"""BPE tokenizer induction at corpus scale — learn the merge table a
training pipeline needs BEFORE it can budget tokens, pack sequences, or
train a model on its own corpus (text.py:bpe_token_count applies a
GPT-2-style PRE-tokenizer; this module learns the merges themselves).

The scale shape that makes this tractable: BPE statistics live on the
WORD VOCABULARY, not the corpus.  One corpus-scale aggregation builds
(word, freq); every merge round then operates on the vocab table —
pair counts are a vocab-sized explode weighted by freq, the argmax is
a 1-row driver probe, and the merge rewrite is an Arrow-batched pandas
pass over vocab rows (tens of thousands of rows regardless of corpus
bytes).  100 TB of text and 1 GB of text run the SAME per-round work
after the first aggregation.

Determinism: ties on pair count break lexicographically, so the merge
sequence is a pure function of the corpus — pinned by pytest against a
reference pure-Python BPE.  Not SQL-expressible (iterative argmax) →
no DuckDB oracle; covered by equivalence tests instead.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_wrap_spark.operators.text import tokens


def word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) — the one corpus-scale pass."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_word(syms: list, a: str, b: str) -> list:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def learn_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 50,
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus → ordered merge
    list.  Stops early when no pair reaches ``min_pair_freq``.

    Per round: adjacent-pair counts from the vocab (explode of
    zip-with-shifted-slice, weighted by word freq), deterministic
    argmax (count desc, pair asc), then the vocab's symbol arrays are
    rewritten in one Arrow pass with the winning pair merged.  The
    vocab frame is localCheckpointed per round (iterative-lineage
    discipline of connected_components)."""
    vocab = word_vocab(df, text_col).select(
        F.split(F.col("word"), "").alias("syms"), "freq"
    ).localCheckpoint(eager=False)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        s = F.col("syms")
        nshift = F.greatest(F.size(s) - 1, F.lit(0))
        grams = F.arrays_zip(
            F.slice(s, 1, nshift).alias("a"), F.slice(s, 2, nshift).alias("b")
        )
        top = (
            vocab.select(F.explode(grams).alias("g"), "freq")
            .groupBy(F.col("g.a").alias("a"), F.col("g.b").alias("b"))
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_pair_freq:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))

        def rewrite(batches, a=a, b=b):
            for pdf in batches:
                pdf = pdf.copy()
                pdf["syms"] = [_merge_word(list(x), a, b) for x in pdf["syms"]]
                yield pdf

        vocab = vocab.mapInPandas(
            rewrite, schema="syms ARRAY<STRING>, freq BIGINT"
        ).localCheckpoint(eager=False)
    return merges


def apply_bpe(
    df: DataFrame, id_col: str, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """Tokenize every document with a learned merge list →
    (id, n_tokens, n_chars): the corpus-scale scoring pass — one Arrow
    map with the merge table broadcast in the closure, no shuffle."""
    merge_list = list(merges)

    def score(batches):
        for pdf in batches:
            n_toks, n_chars = [], []
            for text in pdf["__text"]:
                total = 0
                chars = 0
                for w in str(text).split():
                    syms = list(w)
                    chars += len(syms)
                    for a, b in merge_list:
                        if len(syms) < 2:
                            break
                        syms = _merge_word(syms, a, b)
                    total += len(syms)
                n_toks.append(total)
                n_chars.append(chars)
            yield pd.DataFrame(
                {"__id": pdf["__id"], "n_tokens": n_toks, "n_chars": n_chars}
            )

    out = df.select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__text")
    ).mapInPandas(score, schema="__id LONG, n_tokens BIGINT, n_chars BIGINT")
    return out.withColumnRenamed("__id", id_col)
