"""Scale probe for the round-4 additions: exact-substring span dedup
(duplicate_spans / remove_duplicate_spans) on the planted synthetic
corpora, and fixed-point PageRank on the trade graph at two data
decades.

Spans: the planted corpora (make_doc_corpus.py) carry exact-copy pairs
and shared boilerplate lines, so duplicated windows are guaranteed;
what the probe checks at each decade is (a) wall growth vs corpus
growth (the window groupBy is the one data-sized shuffle — near-linear
expected), (b) duplicated-token fraction stability (planted structure
is proportional), (c) removal round-trip wall.

PageRank: derived customer<->supplier edges at sf0.01 and sf0.1 (~50k
vs ~500k distinct edges) — per-iteration wall should track |E|
near-linearly; the rank frame stays node-sized throughout.

Usage: python tools/span_graph_scale_probe.py [N ...] (default 10000 100000)
Emits one JSON line per measurement (appended to
/tmp/span_graph_scale_probe.jsonl).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_wrap_spark.operators import dedup
from etl_wrap_spark.operators.graph import pagerank_fixedpoint
from etl_wrap_spark.session import get_session, load_tables


def probe_spans(spark, n_docs: int) -> dict:
    from tools.make_doc_corpus import make_corpus

    out_dir = f"/tmp/doccorpus_{n_docs}"
    if not os.path.exists(f"{out_dir}/documents.parquet/_SUCCESS"):
        make_corpus(spark, n_docs, out_dir)
    docs = spark.read.parquet(f"{out_dir}/documents.parquet")

    t0 = time.time()
    spans = dedup.duplicate_spans(docs, "doc_id", "text", window=15)
    agg = spans.agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
        F.countDistinct("doc_id").alias("docs_with_spans"),
    ).collect()[0]
    t_spans = time.time() - t0

    total_tokens = docs.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
    ).collect()[0][0]

    t0 = time.time()
    cleaned = dedup.remove_duplicate_spans(docs, spans, "doc_id", "text")
    kept_tokens = cleaned.select(
        F.sum(
            F.when(F.col("clean_text") == "", 0).otherwise(
                F.size(F.split("clean_text", r"\s+"))
            )
        )
    ).collect()[0][0]
    t_remove = time.time() - t0

    return {
        "probe": "duplicate_spans",
        "n_docs": n_docs,
        "wall_spans_s": round(t_spans, 2),
        "wall_remove_s": round(t_remove, 2),
        "n_spans": agg["n_spans"],
        "docs_with_spans": agg["docs_with_spans"],
        "dup_token_fraction": round(agg["dup_tokens"] / total_tokens, 4),
    }


def probe_pagerank(spark, sf_dir: str, iterations: int = 5) -> dict:
    t = load_tables(spark, sf_dir, ["lineitem", "orders"])
    pairs = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("a"), (F.col("l_suppkey") + 1000000).alias("b"))
        .distinct()
    )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).localCheckpoint(eager=True)  # isolate edge-derivation cost from the PR loop
    n_edges = edges.count()
    t0 = time.time()
    r = pagerank_fixedpoint(edges, iterations=iterations)
    top = r.orderBy(F.col("rank_fp").desc()).limit(1).collect()[0]
    wall = time.time() - t0
    return {
        "probe": "pagerank",
        "sf_dir": sf_dir,
        "n_edges": n_edges,
        "iterations": iterations,
        "wall_s": round(wall, 2),
        "wall_per_iter_s": round(wall / iterations, 2),
        "top_node": top["node"],
    }


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [10_000, 100_000]
    spark = get_session()
    results = []
    for n in sizes:
        results.append(probe_spans(spark, n))
        print(json.dumps(results[-1]), flush=True)
    for sf_dir in ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
        results.append(probe_pagerank(spark, sf_dir))
        print(json.dumps(results[-1]), flush=True)
    with open("/tmp/span_graph_scale_probe.jsonl", "a") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
