"""Scale probe for the graph family added after PageRank:
triangle_counts, bfs_hops, kcore_peel — two data decades each.

Graphs are derived from the TPC-H-ish tables exactly as the catalog
queries derive them:

- co-purchase part graph (parts sharing an order; q156/q158) at
  sf0.01 vs sf0.1 — ~10x the edges;
- customer↔supplier trade graph (q157/q129) at the same two decades.

What each family must show at 10x edges:

- triangles: wall tracks the ORIENTED wedge count, and the probe
  measures that count directly against the naive Σ deg² wedge count —
  the degree-orientation's hub-proofing is a measured ratio, not a
  claim;
- BFS: per-round frontier sizes (the cost driver) and total wall —
  frontier-adjacency-bounded, so wall follows |E| not |V|·rounds;
- k-core: per-round surviving-edge counts and wall — O(E)/round.

Usage: python tools/graph_scale_probe.py [sf_dir ...]
(default /root/testdata/sf0.01 /root/testdata/sf0.1)
Emits one JSON line per measurement, appended to
/tmp/graph_scale_probe.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_wrap_spark.operators.graph import (
    bfs_hops,
    canonical_undirected,
    degrees,
    kcore_peel,
    triangle_counts,
)
from etl_wrap_spark.session import get_session, load_tables


def copurchase_edges(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["lineitem"])
    li = (
        t["lineitem"]
        .where(F.col("l_partkey") % 10 == 0)
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))


def trade_edges(spark, sf_dir):
    t = load_tables(spark, sf_dir, ["lineitem", "orders"])
    pairs = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_custkey").alias("a"), (F.col("l_suppkey") + 1000000).alias("b")
        )
        .distinct()
    )
    return pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )


def probe_triangles(spark, sf_dir) -> dict:
    edges = copurchase_edges(spark, sf_dir)
    und = canonical_undirected(edges).localCheckpoint(eager=True)
    n_edges = und.count()
    deg = degrees(und)
    # naive wedge count (what an un-oriented enumeration would join)
    naive = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).alias("w")
    ).collect()[0]["w"]
    # oriented wedge count = Σ outdeg·(outdeg-1)/2 under the (deg,id) order
    dl = deg.select(F.col("node").alias("lo"), F.col("deg").alias("__dl"))
    dh = deg.select(F.col("node").alias("hi"), F.col("deg").alias("__dh"))
    ranked = und.join(dl, "lo").join(dh, "hi")
    lo_first = (F.col("__dl") < F.col("__dh")) | (
        (F.col("__dl") == F.col("__dh")) & (F.col("lo") < F.col("hi"))
    )
    oriented_src = ranked.select(
        F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("u")
    )
    odeg = oriented_src.groupBy("u").agg(F.count(F.lit(1)).alias("od"))
    oriented = odeg.agg(
        F.sum(F.col("od") * (F.col("od") - 1) / 2).alias("w")
    ).collect()[0]["w"]
    t0 = time.time()
    out = triangle_counts(edges)
    n_nodes, n_tris = out.agg(
        F.count(F.lit(1)), F.sum("triangles") / 3
    ).collect()[0]
    wall = time.time() - t0
    return {
        "probe": "triangles",
        "sf_dir": sf_dir,
        "edges": n_edges,
        "naive_wedges": int(naive),
        "oriented_wedges": int(oriented),
        "wedge_ratio": round(naive / max(oriented, 1), 2),
        "tri_nodes": n_nodes,
        "triangles": int(n_tris),
        "wall_s": round(wall, 2),
    }


def probe_bfs(spark, sf_dir) -> dict:
    edges = trade_edges(spark, sf_dir).localCheckpoint(eager=True)
    n_edges = edges.count()
    t = load_tables(spark, sf_dir, ["customer"])
    sources = t["customer"].where(F.col("c_nationkey") == 7).select(
        F.col("c_custkey").alias("node")
    )
    t0 = time.time()
    out = bfs_hops(edges, sources, max_hops=3)
    per_hop = {
        int(r["hops"]): r["n"]
        for r in out.groupBy("hops").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    wall = time.time() - t0
    return {
        "probe": "bfs",
        "sf_dir": sf_dir,
        "edges": n_edges,
        "frontier_sizes": per_hop,
        "wall_s": round(wall, 2),
    }


def probe_kcore(spark, sf_dir) -> dict:
    edges = copurchase_edges(spark, sf_dir)
    t0 = time.time()
    out = kcore_peel(edges, k=4, rounds=3)
    survivors, max_deg = out.agg(F.count(F.lit(1)), F.max("deg")).collect()[0]
    wall = time.time() - t0
    return {
        "probe": "kcore",
        "sf_dir": sf_dir,
        "survivors": survivors,
        "max_deg": int(max_deg) if max_deg is not None else 0,
        "wall_s": round(wall, 2),
    }


def probe_lpa(spark, sf_dir) -> dict:
    from etl_wrap_spark.operators.graph import label_propagation

    edges = copurchase_edges(spark, sf_dir)
    t0 = time.time()
    out = label_propagation(edges, rounds=2)
    n_nodes, n_comms = out.agg(
        F.count(F.lit(1)), F.countDistinct("label")
    ).collect()[0]
    wall = time.time() - t0
    return {
        "probe": "lpa",
        "sf_dir": sf_dir,
        "nodes": n_nodes,
        "communities": n_comms,
        "wall_s": round(wall, 2),
    }


def probe_ppr(spark, sf_dir) -> dict:
    from etl_wrap_spark.operators.graph import pagerank_fixedpoint

    edges = trade_edges(spark, sf_dir)
    t = load_tables(spark, sf_dir, ["customer"])
    seeds = t["customer"].where(F.col("c_nationkey") == 7).select(
        F.col("c_custkey").alias("node")
    )
    t0 = time.time()
    out = pagerank_fixedpoint(edges, iterations=3, seeds=seeds)
    reached = out.where(F.col("rank_fp") > 0).count()
    wall = time.time() - t0
    return {
        "probe": "ppr",
        "sf_dir": sf_dir,
        "reached": reached,
        "wall_s": round(wall, 2),
    }


def main(sf_dirs):
    spark = get_session()
    results = []
    for sf_dir in sf_dirs:
        for fn in (probe_triangles, probe_bfs, probe_kcore, probe_lpa, probe_ppr):
            r = fn(spark, sf_dir)
            results.append(r)
            line = json.dumps(r)
            print(line)
            with open("/tmp/graph_scale_probe.jsonl", "a") as f:
                f.write(line + "\n")
    return results


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    main(dirs)
