"""Incremental JOIN-view maintenance — the materialized-view companion
of operators/incremental_agg.py, for the non-aggregate half of the
problem: keeping ``A JOIN B`` current under CDC deltas WITHOUT re-running
the fact-fact join.

The algebra (DBToaster/DBSP bilinear delta rule, signed multiplicities):

    d(A JOIN B) = dA JOIN B  +  A JOIN dB  +  dA JOIN dB

Every relation is represented as a weighted bag — one row per distinct
tuple with an integer multiplicity ``_w`` (deletes carry -1, join
products multiply weights).  The maintained view is the collapsed sum;
tuples whose multiplicity reaches zero drop out.  Exactness is
integer arithmetic end to end — no approximation, pinned by the oracle
(q113) against a from-scratch recompute of the post-delta join.

The 100 TB shape: the two big terms join a (small) delta against a
(big) base on the join key — broadcast or delta-keyed shuffle, never a
rescan of the standing view; the delta-delta term is tiny.  The bases
A and B are the source tables a pipeline already has; what this module
avoids is the full A-JOIN-B recompute (the petabyte shuffle), exactly
as incremental_agg avoids the fact-history rescan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

W = "_w"


def _weighted(df: DataFrame, op_col: str | None = None) -> DataFrame:
    """Collapse a frame into weighted-bag form: one row per distinct
    tuple with integer multiplicity ``_w`` (op_col 'delete' rows count
    -1; absent op_col means every row is a +1 insert)."""
    cols = [c for c in df.columns if c != op_col]
    sign = (
        F.when(F.col(op_col) == "delete", F.lit(-1)).otherwise(F.lit(1))
        if op_col
        else F.lit(1)
    )
    return df.groupBy(*cols).agg(F.sum(sign).cast("bigint").alias(W))


def _wjoin(a: DataFrame, b: DataFrame, on: Sequence[str]) -> DataFrame:
    """Weighted natural join: multiplicities multiply."""
    aw = a.withColumnRenamed(W, "__wa")
    bw = b.withColumnRenamed(W, "__wb")
    return (
        aw.join(bw, on=list(on))
        .withColumn(W, (F.col("__wa") * F.col("__wb")).cast("bigint"))
        .drop("__wa", "__wb")
    )


def _collapse(*parts: DataFrame) -> DataFrame:
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    cols = [c for c in out.columns if c != W]
    return (
        out.groupBy(*cols)
        .agg(F.sum(W).cast("bigint").alias(W))
        .where(F.col(W) != 0)
    )


def join_view(a: DataFrame, b: DataFrame, on: Sequence[str]) -> DataFrame:
    """Materialize the weighted join view (the state to persist)."""
    return _wjoin(_weighted(a), _weighted(b), on)


def merge_join_delta(
    view: DataFrame,
    a_old: DataFrame,
    b_old: DataFrame,
    da: DataFrame | None,
    db: DataFrame | None,
    on: Sequence[str],
    op_col: str = "_op",
) -> DataFrame:
    """New view state from (old view, old bases, CDC deltas).

    ``da``/``db`` carry their table's columns plus ``op_col`` in
    {'insert','delete'} (an update is its delete+insert pair — the
    CDC encoding snapshot_diff emits); pass None for a side with no
    changes.  The old bases are only ever joined against the (small)
    delta of the OTHER side — the standing view is never recomputed and
    never rescanned at join grain.
    """
    parts = [view]
    wa_old = _weighted(a_old)
    wb_old = _weighted(b_old)
    wda = _weighted(da, op_col) if da is not None else None
    wdb = _weighted(db, op_col) if db is not None else None
    if wda is not None:
        parts.append(_wjoin(wda, wb_old, on))
    if wdb is not None:
        parts.append(_wjoin(wa_old, wdb, on))
    if wda is not None and wdb is not None:
        parts.append(_wjoin(wda, wdb, on))
    return _collapse(*parts)


# --------------------------------------------------- hierarchy flatten


def flatten_hierarchy(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_iter: int = 40,
    small_graph_limit: int = 1 << 17,
) -> DataFrame:
    """(node, root, depth) for a forest given (child, parent) edges —
    the org-chart / BOM-explosion operator relational engines express
    as a recursive CTE and Spark must iterate.

    POINTER DOUBLING, not per-level walking: each round joins every
    node's current ancestor pointer onto that ancestor's own pointer,
    squaring the jump length (1, 2, 4, ...), so a depth-D hierarchy
    converges in ceil(log2 D) + 1 rounds instead of D — the same
    O(log) discipline as connected_components_star, and the difference
    between 14 rounds and 10,000 on a deep bill-of-materials. Each
    round is one self-join on the ancestor key + localCheckpoint
    (truncates the exponentially growing lineage); the convergence
    probe is a scalar count.

    Roots are nodes that never appear as a child, or whose parent is
    NULL/self; cycles would never converge and raise after max_iter.
    """
    ptr = (
        edges.where(
            F.col(parent_col).isNotNull() & (F.col(child_col) != F.col(parent_col))
        )
        .select(
            F.col(child_col).alias("node"),
            F.col(parent_col).alias("anc"),
            F.lit(1).cast("bigint").alias("depth"),
            F.lit(False).alias("done"),
        )
        .localCheckpoint(eager=False)
    )
    # Small-forest fast path (round 8, the ancestor_closure discipline):
    # memoized parent-chain walk on the driver when the pinned pointer
    # table is tiny and each child has one parent; cycles or DAGs fall
    # through to the doubling loop (which raises / min-resolves them).
    # small_graph_limit=0 disables the fast path (the graph.py adaptive
    # convention — round-8 ADVICE), so parity tests can force the
    # distributed doubling loop. The size probe is a plain map-side
    # count, the collect runs only when proven small, and the
    # (node, root, depth) result
    # re-enters Spark through the Arrow createDataFrame path, not a
    # row-pickled LocalRelation (round-10: list-of-tuples upload
    # measured 3-4x the pandas route to execute).
    from etl_wrap_spark.operators.graph import (
        _arrow_numpy_cols,
        _driver_headroom_ok,
        _local_result_df,
    )

    cols = None
    if small_graph_limit > 0 and _driver_headroom_ok() and (
        ptr.count() <= small_graph_limit
    ):
        # map-side count probe; rows move only when the forest is small.
        # Arrow-direct collect (round 12, the C5 helper): no pandas block
        # construction, and the null guard is the Arrow null_count — a
        # NULL routes distributed instead of NaN-widening the id dtype.
        np_cols, n_rows, has_null = _arrow_numpy_cols(ptr.select("node", "anc"))
        if not has_null:
            cols = np_cols if n_rows else {"node": [], "anc": []}
    if cols is not None:
        from pyspark.sql import types as T

        kids = list(cols["node"]) if not hasattr(cols["node"], "tolist") else cols["node"].tolist()
        pars = list(cols["anc"]) if not hasattr(cols["anc"], "tolist") else cols["anc"].tolist()
        if len(set(kids)) == len(kids):
            parent = dict(zip(kids, pars))
            memo: dict = {}  # node -> (root, depth-to-root)
            n_nodes = len(parent)
            ok = True
            for k in kids:
                chain = []
                x = k
                while x in parent and x not in memo:
                    chain.append(x)
                    x = parent[x]
                    if len(chain) > n_nodes:
                        ok = False
                        break
                if not ok:
                    break
                root, base = memo.get(x, (x, 0))
                for i, c in enumerate(reversed(chain), 1):
                    memo[c] = (root, base + i)
            if ok:
                id_type = ptr.schema[0].dataType
                schema = T.StructType(
                    [
                        T.StructField("node", id_type),
                        T.StructField("root", id_type),
                        T.StructField("depth", T.LongType()),
                    ]
                )
                # single-Arrow-batch re-entry (graph._local_result_df):
                # one batch/task instead of 32 pickled-row slices
                return _local_result_df(
                    edges.sparkSession,
                    {
                        "node": kids,
                        "root": [memo[k][0] for k in kids],
                        "depth": [memo[k][1] for k in kids],
                    },
                    schema,
                )
    # ancestors that are roots (no incoming pointer) terminate the jump
    for _ in range(max_iter):
        hop = ptr.select(
            F.col("node").alias("__a"),
            F.col("anc").alias("__anc2"),
            F.col("depth").alias("__d2"),
        )
        nxt = (
            ptr.join(hop, ptr["anc"] == hop["__a"], "left")
            .select(
                "node",
                F.coalesce("__anc2", "anc").alias("anc"),
                (F.col("depth") + F.coalesce("__d2", F.lit(0))).alias("depth"),
                F.col("__anc2").isNull().alias("done"),
            )
            .localCheckpoint(eager=False)
        )
        ptr = nxt
        if ptr.where(~F.col("done")).count() == 0:
            break
    else:
        raise RuntimeError(
            f"hierarchy did not converge in {max_iter} doubling rounds "
            "(cycle, or depth > 2^max_iter)"
        )
    return ptr.select("node", F.col("anc").alias("root"), "depth")


def ancestor_closure(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_iter: int = 40,
    small_graph_limit: int = 1 << 17,
    known_small: bool = False,
) -> DataFrame:
    """ALL (node, anc, dist) ancestor pairs of a forest — the full
    transitive closure flatten_hierarchy's (node, root) projection
    skips, feeding hierarchical rollups (every node aggregated into
    every enclosing subtree).

    Computed by REPEATED SQUARING: P₀ = edges (dist 1);
    P_{k+1} = P_k ∪ (P_k ∘ P_k) joining each pair's ancestor onto that
    ancestor's own pairs and adding distances — path lengths double
    per round, so depth-D converges in ceil(log₂ D) rounds of one
    self-join + dedup each. The closure's SIZE (Σ depths) is the
    inherent output cost; rounds are the only driver-visible state
    (a scalar count probe, the connected_components discipline).

    Small-forest fast path (round 8, the CC/PageRank adaptive
    discipline): when the pinned edge list is tiny AND each child has
    exactly ONE parent (a true forest — multi-parent DAGs keep the
    distributed min-dist squaring), the PARENT MAP is collected and
    broadcast, and the chain walk runs EXECUTOR-SIDE over the pinned
    edges via mapInPandas — the closure rows (Σ depths, potentially ≫
    the edge count) are never materialized on the driver nor pickled
    into a LocalRelation (round-10: the re-upload plan cost 3.3 s to
    execute at 41k rows where the broadcast walk is one ordinary job).
    Guarded by an output budget (Σ depths ≤ 2^22 — depth is computed
    O(N) first, so a pathological deep chain routes distributed
    without generating anything). The size probe is a plain map-side
    count (limit-based probes lose both ways — measured in
    graph._pinned_small_edges); the Arrow collect runs only in the
    proven-small case.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    p = (
        edges.select(
            F.col(child_col).alias("node"),
            F.col(parent_col).alias("anc"),
            F.lit(1).cast("bigint").alias("dist"),
        )
        .where(F.col("node") != F.col("anc"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    from etl_wrap_spark.operators.graph import _driver_headroom_ok

    n_prev = None
    pdf = None
    # small_graph_limit=0 disables the fast path (graph.py convention —
    # round-8 ADVICE) so tests can pin fast == distributed directly.
    # Capped-count probe: rows move only when the forest is small.
    # known_small=True is a CALLER ASSERTION that the edge list is
    # statically bounded (e.g. q132's `c_custkey <= 4095` filter): the
    # probe job is then redundant — the one scheduled job it saves is
    # ~40% of such a query's total build+execute cost at bench scale
    # (round-10 verdict ask #7). The headroom gate still applies, and
    # the post-collect len() enforces the limit anyway (an over-limit
    # collect falls through to the distributed squaring; the assertion
    # being wrong costs one oversized collect, never a wrong result).
    if small_graph_limit > 0 and _driver_headroom_ok() and (
        known_small or p.count() <= small_graph_limit
    ):
        # Arrow-direct collect (round 12): same §4 pattern as the graph
        # fast paths — no pandas coercion, NULLs route distributed via
        # the Arrow null_count instead of NaN-widening the id columns
        from etl_wrap_spark.operators.graph import _arrow_numpy_cols

        np_cols, n_prev, has_null = _arrow_numpy_cols(p.select("node", "anc"))
        if not has_null and n_prev <= small_graph_limit:
            pdf = np_cols if n_prev else {"node": [], "anc": []}
    if pdf is not None:
        kids = pdf["node"].tolist() if hasattr(pdf["node"], "tolist") else list(pdf["node"])
        pars = pdf["anc"].tolist() if hasattr(pdf["anc"], "tolist") else list(pdf["anc"])
        if len(set(kids)) == len(kids):  # forest: one parent per child
            parent = dict(zip(kids, pars))
            depth: dict = {}

            def _depth(x, _n=len(parent)):
                chain = []
                while x in parent and x not in depth:
                    chain.append(x)
                    x = parent[x]
                    if len(chain) > _n:  # cycle — let the squaring raise
                        return None
                base = depth.get(x, 0)
                for i, c in enumerate(reversed(chain), 1):
                    depth[c] = base + i
                return depth.get(chain[0]) if chain else base

            ok = all(_depth(k) is not None for k in kids)
            if ok and sum(depth.get(k, 0) for k in kids) <= (1 << 22):
                b_parent = edges.sparkSession.sparkContext.broadcast(parent)
                id_type = p.schema[0].dataType
                schema = T.StructType(
                    [
                        T.StructField("node", id_type),
                        T.StructField("anc", id_type),
                        T.StructField("dist", T.LongType()),
                    ]
                )

                def _walk(batches):
                    import pandas as pd

                    par = b_parent.value
                    for bdf in batches:
                        nodes, ancs, dists = [], [], []
                        for k, a in zip(bdf["node"], bdf["anc"]):
                            d = 1
                            while True:
                                nodes.append(k)
                                ancs.append(a)
                                dists.append(d)
                                nxt = par.get(a)
                                if nxt is None:
                                    break
                                a = nxt
                                d += 1
                        yield pd.DataFrame(
                            {"node": nodes, "anc": ancs, "dist": dists}
                        )

                return p.select("node", "anc").mapInPandas(_walk, schema)
    if n_prev is None:
        n_prev = p.count()
    for _ in range(max_iter):
        hop = (
            p.alias("x")
            .join(p.alias("y"), F.col("x.anc") == F.col("y.node"))
            .select(
                F.col("x.node").alias("node"),
                F.col("y.anc").alias("anc"),
                (F.col("x.dist") + F.col("y.dist")).alias("dist"),
            )
        )
        p = (
            p.unionByName(hop)
            .groupBy("node", "anc")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
        n = p.count()
        if n == n_prev:
            return p
        n_prev = n
    raise RuntimeError(
        f"ancestor_closure did not converge in {max_iter} rounds — "
        "cycle in the 'hierarchy'? (2^40-deep forests do not occur)"
    )
