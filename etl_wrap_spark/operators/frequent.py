"""Heavy hitters / frequent items — the corpus-vocabulary operator a
training pipeline runs before building tokenizers, stopword lists, and
df-caps.

Two paths, one contract:

- ``frequent_items``: EXACT top-k by count — one groupBy with map-side
  combine, then a deterministic top-k (count desc, item asc). Fully
  SQL-expressible, so it is the oracle-checked path (catalog q85). At
  100 TB the aggregation state is vocabulary-sized, which for token-like
  items is bounded and fine.
- ``frequent_items_sketch_df``: Misra-Gries summaries per partition
  (optionally per GROUP) merged DISTRIBUTED — the partial summaries are
  sketch-sized rows that merge with an ordinary SUM groupBy plus a
  window shrink, so no step ever holds data-sized state and the driver
  is never involved. Bounded memory (k counters per partition/group)
  for UNBOUNDED key domains (URLs, n-grams, user ids) where the exact
  aggregation's state would not fit. The merged sketch has the classic
  guarantee (Agarwal et al., "Mergeable Summaries"): every item with
  true count > N/k is present, and each reported count is an
  UNDERestimate by at most N/k. Deterministic for a given partitioning
  but not engine-portable → pytest pins the guarantee against exact
  counts instead of a SQL oracle. ``frequent_items_sketch`` is the
  collected list form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def frequent_items(df: DataFrame, col: str | Column, k: int = 20) -> DataFrame:
    """Exact top-k items by count → (item, n), ties to the smaller item.

    orderBy+limit compiles to TakeOrderedAndProject (a per-partition
    heap + driver merge of k rows), never a global sort materialization.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        df.select(c.alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("item").asc())
        .limit(k)
    )


def frequent_items_sketch_df(
    df: DataFrame,
    col: str | Column,
    k: int = 20,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Distributed Misra-Gries heavy hitters → DataFrame of
    (*group_by, item, cnt_lb), counts are LOWER bounds.

    Fully distributed merge (Agarwal et al., "Mergeable Summaries"):

    1. one mapInPandas pass computes a k-counter MG summary per
       partition (per group when ``group_by`` is set) — executor state
       is groups×k counters per task, never data-sized;
    2. summaries merge by a plain SUM groupBy over at most
       partitions×groups×k rows — a sketch-sized shuffle, not a
       data-sized one;
    3. the merged summary shrinks back to k counters per group by
       subtracting the (k+1)-th largest count (a window over sketch
       rows), which preserves the MG bound: total undercount ≤ N/k,
       every item with true count > N/k survives.

    No driver-side state at any step — the result is a DataFrame that
    can feed joins/sinks directly; ``.collect()`` it only if you want
    the classic list form (see ``frequent_items_sketch``).
    """
    from pyspark.sql.window import Window

    name = col if isinstance(col, str) else "item"
    gb = list(group_by or [])
    src = df.select(
        *gb, (F.col(col) if isinstance(col, str) else col).alias(name)
    )

    kk = k
    item_type = dict(src.dtypes)[name]

    def _mg_partition(iterator):
        import pandas as pd

        # one MG summary per group key (() for the ungrouped case)
        summaries: dict = {}
        for pdf in iterator:
            keys = (
                list(zip(*(pdf[g] for g in gb))) if gb else [()] * len(pdf)
            )
            for gkey, v in zip(keys, pdf[name]):
                counters = summaries.setdefault(gkey, {})
                if v in counters:
                    counters[v] += 1
                elif len(counters) < kk:
                    counters[v] = 1
                else:
                    # decrement-all: O(1) amortized via dict rebuild
                    summaries[gkey] = {
                        key: c - 1 for key, c in counters.items() if c > 1
                    }
        for gkey, counters in summaries.items():
            if counters:
                out = {g: [gv] * len(counters) for g, gv in zip(gb, gkey)}
                out["item"] = list(counters)
                out["cnt_lb"] = list(counters.values())
                yield pd.DataFrame(out)

    gb_schema = "".join(
        f"{g} {t}, " for g, t in src.dtypes if g in gb
    )
    partials = src.mapInPandas(
        _mg_partition, schema=f"{gb_schema}item {item_type}, cnt_lb long"
    )
    return mg_merge_shrink(partials, k, group_by=gb)


def mg_merge_shrink(
    partials: DataFrame,
    k: int,
    group_by: list[str] | None = None,
    item_col: str = "item",
    cnt_col: str = "cnt_lb",
) -> DataFrame:
    """Merge Misra-Gries partial summaries → one k-counter summary per
    group: SUM counts per (group, item), then subtract the (k+1)-th
    largest merged count from every counter and drop non-positive ones
    — the MERGE operation of Agarwal et al., "Mergeable Summaries"
    (§MG): the subtraction IS the Misra-Gries decrement in merged form,
    and the result keeps the classic bound (every item with true count
    > N/(k+1) survives; undercount ≤ N/(k+1)).

    Public as its own operator (round-10, the q220-oracle decrement
    ask): the production shape is per-shard / per-day summaries built
    independently (possibly exact when a shard's distinct-item count
    fits in k) and merged later. Deterministic whenever the input
    partials are — exact per-shard counts make the whole pipeline
    engine-replayable even though the shrink genuinely fires, which is
    what lets q221 oracle-check the decrement regime that q220's exact
    regime (k > distinct items) never reaches.

    Plan: one sketch-sized SUM shuffle + one window over sketch rows —
    never data-sized, no driver state. Ties at the k/k+1 boundary cut
    deterministically (count desc, item asc)."""
    from pyspark.sql.window import Window

    gb = list(group_by or [])
    merged = partials.groupBy(*gb, item_col).agg(F.sum(cnt_col).alias(cnt_col))
    # shrink to k counters per group: subtract the (k+1)-th largest count
    w = Window.partitionBy(*[F.col(g) for g in gb]) if gb else Window.partitionBy(F.lit(1))
    ranked = merged.withColumn(
        "__rk", F.row_number().over(w.orderBy(F.col(cnt_col).desc(), F.col(item_col).asc()))
    )
    cut = ranked.withColumn(
        "__cut",
        F.max(F.when(F.col("__rk") == k + 1, F.col(cnt_col))).over(w),
    )
    return (
        cut.withColumn(cnt_col, F.col(cnt_col) - F.coalesce(F.col("__cut"), F.lit(0)))
        .where((F.col("__rk") <= k) & (F.col(cnt_col) > 0))
        .drop("__rk", "__cut")
    )


def frequent_items_sketch(df: DataFrame, col: str | Column, k: int = 20) -> list[tuple]:
    """Misra-Gries heavy hitters → [(item, lower_bound_count), ...].

    Classic list form of ``frequent_items_sketch_df`` (which see): the
    merge is fully distributed; only the final ≤k sketch rows are
    collected. Items with true count > N/k are guaranteed present;
    counts are lower bounds."""
    rows = frequent_items_sketch_df(df, col, k=k).collect()
    return sorted(
        ((r["item"], r["cnt_lb"]) for r in rows), key=lambda ic: (-ic[1], str(ic[0]))
    )
