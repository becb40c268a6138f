"""Third-decade ANN probe: 1e6 vectors — the scale the round-4
continuation measured as IMPRACTICAL through interpreted HOF dot
expressions (SCALING.md "what the attempt measured") and that
ivf_assign_blas (one GEMM per Arrow batch against the broadcast
centroid matrix) was designed to unlock.

Measures at N=1e6 (iso vectors, the no-structure worst case):
- BLAS corpus assignment wall (the formerly-impossible step) and its
  agreement with the expression path on a sample;
- amortized IVF query batches (assignment persisted once) — wall +
  recall@10 vs brute-force truth on 20 deterministic queries;
- brute-force truth wall for the 20-query batch (the exact baseline).

Usage: python tools/ann_third_decade_probe.py [N]   (default 1_000_000)
Appends one JSON line to /tmp/ann_scale_probe.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_wrap_spark.operators import similarity as sim
from etl_wrap_spark.session import get_session
from tools.ann_scale_probe import ensure_vectors, recall, topk_sets


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_session("ann-third-decade")
    spark.sparkContext.setLogLevel("ERROR")
    k = 10
    out = {"n_vectors": n, "kind": "iso", "k": k, "n_queries": 20}

    t0 = time.time()
    corpus = spark.read.parquet(ensure_vectors(spark, n, "iso"))
    out["gen_or_load_wall_s"] = round(time.time() - t0, 2)

    stride = n // 20
    queries = corpus.where(F.col("vec_id") % stride == 0).localCheckpoint(eager=True)

    n_cells = sim.auto_n_cells(corpus)
    out["n_cells"] = n_cells
    cent = sim.ivf_centroids_deterministic(corpus, "vec_id", "embedding", n_cells)

    # the formerly-impossible step: corpus assignment at 1e6 x n_cells
    t0 = time.time()
    assigned = sim.ivf_assign_blas(corpus, "vec_id", "embedding", cent).localCheckpoint(
        eager=True
    )
    out["blas_assign_wall_s"] = round(time.time() - t0, 2)
    out["assigned_rows"] = assigned.count()

    # spot-agreement with the expression path on a 1e3-row sample
    sample = corpus.where(F.col("vec_id") % (n // 1000) == 3)
    expr_cells = {
        r["vec_id"]: r["cell"]
        for r in sim.ivf_assign(sample, "vec_id", "embedding", cent)
        .select("vec_id", "cell")
        .collect()
    }
    blas_cells = {
        r["vec_id"]: r["cell"]
        for r in sim.ivf_assign_blas(sample, "vec_id", "embedding", cent)
        .select("vec_id", "cell")
        .collect()
    }
    agree = sum(1 for i in expr_cells if expr_cells[i] == blas_cells.get(i))
    out["assign_agreement"] = f"{agree}/{len(expr_cells)}"

    t0 = time.time()
    truth = topk_sets(
        sim.brute_force_topk(queries, corpus, "vec_id", "vec_id", "embedding", k, baseline=True)
    )
    out["brute_force_wall_s"] = round(time.time() - t0, 2)

    for nprobe in (4, 16):
        t0 = time.time()
        got = topk_sets(
            sim.ivf_topk(
                queries, corpus, "vec_id", "vec_id", "embedding", k,
                nprobe=nprobe, centroids=cent, assigned=assigned,
            )
        )
        out[f"ivf_amortized_nprobe{nprobe}"] = {
            "wall_s": round(time.time() - t0, 2),
            "recall_at_10": recall(got, truth),
        }

    print(json.dumps(out), flush=True)
    with open("/tmp/ann_scale_probe.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
