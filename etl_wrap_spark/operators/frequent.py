"""Heavy hitters / frequent items — the corpus-vocabulary operator a
training pipeline runs before building tokenizers, stopword lists, and
df-caps.

Two paths, one contract:

- ``frequent_items``: EXACT top-k by count — one groupBy with map-side
  combine, then a deterministic top-k (count desc, item asc). Fully
  SQL-expressible, so it is the oracle-checked path (catalog q85). At
  100 TB the aggregation state is vocabulary-sized, which for token-like
  items is bounded and fine.
- ``frequent_items_sketch``: Misra-Gries summaries per partition merged
  on the driver — bounded memory (k counters per partition) for
  UNBOUNDED key domains (URLs, n-grams, user ids) where the exact
  aggregation's state would not fit. The merged sketch has the classic
  guarantee: every item with true count > N/k is present, and each
  reported count is an UNDERestimate by at most N/k. Deterministic for
  a given partitioning but not engine-portable → pytest pins the
  guarantee against exact counts instead of a SQL oracle.
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


def frequent_items_sketch(df: DataFrame, col: str | Column, k: int = 20) -> list[tuple]:
    """Misra-Gries heavy hitters → [(item, lower_bound_count), ...].

    Per-partition MG summaries (k counters) are computed in one
    mapInPandas pass and merged driver-side: merging MG summaries and
    decrementing back to k counters preserves the error bound, with
    total error <= P * N_p/k summed over partitions <= N/k. The driver
    holds partitions x k counters — scale by k, never by data volume.

    Returns a plain Python list (the sketch IS driver-sized by
    construction); counts are lower bounds. Items with true count >
    N/(k+1) are guaranteed present.
    """
    name = col if isinstance(col, str) else "item"
    src = df.select((F.col(col) if isinstance(col, str) else col).alias(name))

    kk = k

    def _mg_partition(iterator):
        import pandas as pd

        counters: dict = {}
        for pdf in iterator:
            for v in pdf[name]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < kk:
                    counters[v] = 1
                else:
                    # decrement-all: O(1) amortized via dict rebuild
                    counters = {key: c - 1 for key, c in counters.items() if c > 1}
        if counters:
            yield pd.DataFrame({"item": list(counters), "cnt": list(counters.values())})

    parts = src.mapInPandas(
        _mg_partition, schema=f"item {dict(src.dtypes)[name]}, cnt long"
    ).collect()

    merged: dict = {}
    for r in parts:
        merged[r["item"]] = merged.get(r["item"], 0) + r["cnt"]
    # shrink back to k counters (subtract the (k+1)-th largest count)
    if len(merged) > kk:
        cut = sorted(merged.values(), reverse=True)[kk]
        merged = {i: c - cut for i, c in merged.items() if c > cut}
    return sorted(merged.items(), key=lambda ic: (-ic[1], str(ic[0])))
