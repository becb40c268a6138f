"""Link-graph centrality — the crawl-curation signal a web-scale
training pipeline computes over its domain/host graph (Common-Crawl-
style corpora rank hosts by centrality before sampling; the reference
has no graph surface, so this extends the engine the same way the
dedup connected-components family does).

``pagerank_fixedpoint`` is PageRank in FIXED-POINT integer arithmetic:
every rank is a scaled bigint and every step uses integer
multiply/floor-divide only, so the result is bit-identical on any
engine — an independent SQL oracle can replay it exactly, which a
float implementation can never guarantee (float sums are
order-dependent across partitionings). Precision: with scale 1e12 the
per-division truncation error is < 1 part in 1e9 per edge — far below
any ranking-relevant difference — and mass only ever LEAKS (floor), it
never inflates.

Scale shape per iteration: one join of the rank frame onto edges
(shuffle on src — or broadcast when the rank frame is small), one
aggregation on dst, one left join back onto nodes. O(E) work per
round, K rounds; the same per-round localCheckpoint discipline as
connected_components (dedup.py) keeps lineage flat for large K.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12


def pagerank_fixedpoint(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    scale: int = PR_SCALE,
    damping_num: int = 85,
    damping_den: int = 100,
    checkpoint_every: int = 8,
) -> DataFrame:
    """K-iteration PageRank → (node, rank_fp) with rank_fp a scaled
    bigint (sum ≈ ``scale``; floor-truncation leaks only downward).

    r_0(v)   = scale // N
    r_k+1(v) = (scale·(den−num)) // (den·N)
             + Σ_{(u,v)∈E} (r_k(u)·num) // (den·outdeg(u))

    Dangling nodes (no out-edges) simply leak their mass — the
    standard simplification; document or add self-loops upstream if
    mass conservation matters. The node count is the one scalar driver
    probe (a count, not data).
    """
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank_fp", F.lit(0).cast("bigint"))
    base = (scale * (damping_den - damping_num)) // (damping_den * n_nodes)
    e = edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
    deg = e.groupBy(F.col("__src").alias("__dn")).agg(
        F.count(F.lit(1)).alias("__deg")
    )
    r = nodes.withColumn("rank_fp", F.lit(scale // n_nodes).cast("bigint"))
    for i in range(iterations):
        contrib = (
            e.join(r.withColumnRenamed("node", "__src"), on="__src")
            .join(deg, F.col("__src") == F.col("__dn"))
            .select(
                F.col("__dst").alias("node"),
                F.expr(f"(rank_fp * {damping_num}) div ({damping_den} * __deg)").alias(
                    "__c"
                ),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__contrib"))
        )
        r = nodes.join(contrib, on="node", how="left").select(
            "node",
            (F.lit(base) + F.coalesce(F.col("__contrib"), F.lit(0)))
            .cast("bigint")
            .alias("rank_fp"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            r = r.localCheckpoint(eager=True)
    return r
