"""Fuzzy record linkage — edit-distance join without the cross product.

The entity-resolution operator a curation pipeline needs to reconcile
dirty string keys (vendor names, titles, near-identical URLs) against a
reference table.  A naive edit-distance join is O(|L|x|R|) string
comparisons — the classic scale-killer.  This module does the standard
two-stage blocked join instead:

1. **q-gram blocking** (inverted index): each side explodes into its
   set of character q-grams; candidates are pairs sharing at least one
   q-gram — one shuffle on the gram key, never a cross product.  The
   count-filter bound makes this LOSSLESS: strings s, t with
   ``levenshtein(s,t) <= d`` share at least
   ``min(|s|,|t|) - q + 1 - q*d`` q-grams (each edit destroys at most q
   grams), so requiring >= 1 shared gram misses nothing whenever every
   string has ``len >= q + q*d`` — enforced at runtime with
   ``assert_true`` so a too-short string fails loudly instead of
   silently losing recall.
2. **exact verify**: candidates are scored with Spark's built-in
   ``levenshtein(l, r, threshold)`` (JVM-side, early-exit banded DP) and
   kept when the distance is within ``max_dist``.

At 100 TB: the gram index is linear in total characters; hot grams (stop
grams like ``"er"``) can square a bucket, so ``max_df`` drops grams more
frequent than the cap from the BLOCKING index only — same df-cap
discipline as operators/dedup.py, opt-in because it trades recall (a
pair linked ONLY by capped grams is lost; pairs also sharing a rare gram
survive).  Verification cost is bounded by candidate count, not corpus
size.

No reference analogue (Wrap.pm has exact keyed lookups only —
Wrap/DB.pm readFromDBHash); this is the approximate counterpart of
operators/lookup.py, catalog-checked as q91 against a DuckDB
``levenshtein`` cross join on the same slice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def qgrams(col: Column, q: int) -> Column:
    """Distinct character q-grams of a string as an array column.

    Strings shorter than ``q`` yield themselves as the single gram so
    they still participate in blocking.
    """
    n = F.greatest(F.length(col) - q + 1, F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(col, i, q))
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    max_dist: int = 1,
    q: int = 2,
    block: str = "prefix",
    max_df: int | None = None,
    dist_col: str = "dist",
    collapse_duplicates: bool = True,
) -> DataFrame:
    """Blocked edit-distance join.

    Returns ``(left_id, right_id, dist_col)`` for every pair with
    ``levenshtein(left_col, right_col) <= max_dist`` — callers join
    payloads back on their own unique ids (ids are required rather than
    synthesized: ``monotonically_increasing_id`` is not stable across
    the two plan branches blocking needs).

    ``block="prefix"`` (default) is the Ed-Join LOSSLESS prefix filter:
    each string indexes only its ``q*max_dist + 1`` globally-RAREST
    grams (one shared df table over both sides fixes the total order;
    ties break on the gram).  An edit destroys at most ``q`` grams, so
    two strings within ``max_dist`` cannot disagree on all of either
    prefix — every true pair still collides, while hot grams
    (boilerplate-heavy vocabularies) fall out of every prefix and the
    candidate volume stays near-linear.  Measured on the planted
    1e5-doc title corpus: the df-CAP blocking collapsed to recall 0.0
    (every gram hot, index emptied); prefix blocking keeps recall 1.0
    with bounded candidates — the df-cap's recall trade inverts into a
    guarantee.
    ``block="all"`` indexes every gram (the round-1 shape) and accepts
    ``max_df`` to drop hot grams with the documented recall cost; the
    verify stage is exact in every mode.

    ``collapse_duplicates`` (default True) runs blocking + verify on
    the DISTINCT VALUES of each side and expands id membership after:
    the result is row-for-row identical, but duplicate-heavy inputs pay
    levenshtein once per value PAIR instead of once per row pair. The
    round-5 synthetic-sf1 probe measured the difference: 10k rows over
    64 distinct names produce 1.66M output pairs (the output itself is
    quadratic in clone multiplicity — no algorithm can beat that), yet
    verify collapses from 1.66M edit-distance evaluations to ≤64², and
    the expansion is a plain hash join. On near-unique inputs the two
    extra distincts are noise.

    Lossless requires every string ``len >= q + q*max_dist``
    (enforced loudly at runtime).
    """
    if q < 1 or max_dist < 0:
        raise ValueError("q >= 1 and max_dist >= 0 required")
    if left_id == right_id:
        raise ValueError("left_id and right_id must differ (alias one side first)")
    if block not in ("prefix", "all"):
        raise ValueError("block must be 'prefix' or 'all'")
    min_len = q + q * max_dist

    def _prep(df: DataFrame, id_c: str, val_c: str, out_id: str, out_val: str) -> DataFrame:
        guarded = F.when(
            F.length(F.col(val_c)) >= min_len, F.col(val_c)
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"fuzzy_join: string shorter than q+q*max_dist={min_len}"
                        " breaks the lossless-blocking bound; lower q: "
                    ),
                    F.col(val_c),
                )
            )
        )
        return df.select(F.col(id_c).alias(out_id), guarded.alias(out_val))

    if collapse_duplicates:
        # value-class linkage: each side's distinct value string is its
        # own class id; block+verify once per value pair, then expand
        # row membership with two hash joins
        lv = left.select(F.col(left_col).alias("__clv")).distinct()
        rv = right.select(F.col(right_col).alias("__crv")).distinct()
        vpairs = fuzzy_join(
            lv, rv, "__clv", "__clv", "__crv", "__crv",
            max_dist=max_dist, q=q, block=block, max_df=max_df,
            dist_col="__cd", collapse_duplicates=False,
        )
        return (
            vpairs
            .join(left.select(F.col(left_id), F.col(left_col).alias("__clv")), "__clv")
            .join(right.select(F.col(right_id), F.col(right_col).alias("__crv")), "__crv")
            .select(left_id, right_id, F.col("__cd").alias(dist_col))
        )

    l_keys = _prep(left, left_id, left_col, "__lid", "__lval")
    r_keys = _prep(right, right_id, right_col, "__rid", "__rval")

    l_ix = l_keys.select("__lid", F.explode(qgrams(F.col("__lval"), q)).alias("__gram"))
    r_ix = r_keys.select("__rid", F.explode(qgrams(F.col("__rval"), q)).alias("__gram"))

    if block == "prefix":
        # one df table over BOTH sides fixes the global rarity order the
        # prefix guarantee needs; per string keep the q*d+1 rarest grams
        plen = q * max_dist + 1
        dfreq = (
            l_ix.select("__gram")
            .unionAll(r_ix.select("__gram"))
            .groupBy("__gram")
            .agg(F.count(F.lit(1)).alias("__df"))
        )

        def _prefix(ix: DataFrame, id_c: str) -> DataFrame:
            w = Window.partitionBy(id_c).orderBy("__df", "__gram")
            return (
                ix.join(dfreq, "__gram")
                .withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") <= plen)
                .select(id_c, "__gram")
            )

        l_ix, r_ix = _prefix(l_ix, "__lid"), _prefix(r_ix, "__rid")
    elif max_df is not None:
        hot = (
            l_ix.groupBy("__gram")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") > max_df)
            .select("__gram")
        )
        r_hot = (
            r_ix.groupBy("__gram")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") > max_df)
            .select("__gram")
        )
        # the hot-gram sets are tiny by construction -> broadcast anti-join
        l_ix = l_ix.join(F.broadcast(hot), "__gram", "left_anti")
        r_ix = r_ix.join(F.broadcast(r_hot), "__gram", "left_anti")

    cand = l_ix.join(r_ix, "__gram").select("__lid", "__rid").distinct()
    return (
        cand.join(l_keys, "__lid")
        .join(r_keys, "__rid")
        .withColumn("__d", F.levenshtein(F.col("__lval"), F.col("__rval"), max_dist))
        .where(F.col("__d") >= 0)  # levenshtein(threshold) returns -1 above it
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            F.col("__d").alias(dist_col),
        )
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    window: int = 2,
    rank_partitions: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995) →
    candidate pairs (id_a, id_b, key_a, key_b, rank_dist): rows whose
    positions in the global (key, id) sort order differ by at most
    ``window``.

    The complementary blocking strategy to fuzzy_join's q-gram index:
    q-grams catch typos anywhere in the string but need the strings to
    overlap in grams; the sorted window catches records that agree on a
    sort-key PREFIX (same vendor, same title stem, adjacent sizes) even
    when their tails differ completely. Production linkage runs both
    and unions the candidate sets.

    The global rank is computed DISTRIBUTED exactly like
    sampling.shard_balanced: range-repartition on (key, id), local
    row_numbers, broadcast prefix-offset join over partition counts —
    no single-partition window anywhere (the offsets window is
    partition-count grain). Pair generation explodes each row to its
    ``window`` forward offsets and joins on rank+d = rank — one shuffle
    join on a bigint, output exactly window*N pairs (minus the tail),
    never quadratic. ``window`` is a small constant by contract (2-10);
    the candidate count is window-linear regardless of key skew."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    slim = df.select(F.col(id_col), F.col(key_col))
    nparts = rank_partitions or slim.sparkSession.sparkContext.defaultParallelism
    parted = slim.repartitionByRange(nparts, F.col(key_col), F.col(id_col))
    with_pid = parted.withColumn("__pid", F.spark_partition_id())
    wl = Window.partitionBy("__pid").orderBy(F.col(key_col), F.col(id_col))
    local = with_pid.withColumn("__lrn", F.row_number().over(wl))
    sizes = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    wo = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.withColumn(
        "__off", F.coalesce(F.sum("__n").over(wo), F.lit(0))
    ).select("__pid", "__off")
    ranked = local.join(F.broadcast(offsets), "__pid").select(
        F.col(id_col), F.col(key_col),
        (F.col("__off") + F.col("__lrn")).cast("bigint").alias("__rank"),
    )
    left = ranked.select(
        F.col(id_col).alias("id_a"), F.col(key_col).alias("key_a"),
        F.col("__rank").alias("__ra"),
        F.explode(F.array(*[F.lit(d) for d in range(1, window + 1)])).alias("rank_dist"),
    )
    right = ranked.select(
        F.col(id_col).alias("id_b"), F.col(key_col).alias("key_b"),
        F.col("__rank").alias("__rb"),
    )
    return (
        left.join(right, left["__ra"] + left["rank_dist"] == right["__rb"])
        .select("id_a", "id_b", "key_a", "key_b", F.col("rank_dist").cast("bigint").alias("rank_dist"))
    )
