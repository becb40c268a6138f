"""ANN-family scale probe: IVF / sign-LSH / IVF-PQ against brute-force
ground truth on synthetic vector corpora 1e4 → 1e5 (one to two decades
beyond the 500-vector embeddings table) — the similarity-side
counterpart of dedup_scale_probe.py.

Vectors are a pure function of vec_id (per-id seeded numpy normals,
unit-normalized, 64-dim to match the operators' DIM) generated
distributedly via mapInPandas; 100 deterministic query ids per size.
Measured per method: wall (warm session) and recall@10 vs the exact
brute-force top-k.

Usage: python tools/ann_scale_probe.py [N ...]   (default 10000 100000)
Appends one JSON line per size to /tmp/ann_scale_probe.jsonl.
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

DIM = 64


def ensure_vectors(spark, n: int, kind: str) -> str:
    """kind='iso': isotropic normals (IVF's worst case — no structure
    to exploit); kind='clustered': 256-component Gaussian mixture
    (realistic embedding geometry — neighbors share a component)."""
    out = f"/tmp/veccorpus_{kind}_{n}/vectors.parquet"
    if os.path.isdir(out):
        return out

    def gen(batches):
        import numpy as np
        import pandas as pd

        centers = {
            c: np.random.RandomState(900_000 + c).standard_normal(DIM)
            for c in range(256)
        }
        for pdf in batches:
            vecs = []
            for vid in pdf["id"]:
                rng = np.random.RandomState((int(vid) * 2654435761) % (2**31))
                v = rng.standard_normal(DIM)
                if kind == "clustered":
                    v = centers[int(vid) % 256] + 0.35 * v
                v = v.astype("float32")
                v /= np.linalg.norm(v)
                vecs.append([float(x) for x in v])
            yield pd.DataFrame({"vec_id": pdf["id"], "embedding": vecs})

    spark.range(0, n, numPartitions=32).mapInPandas(
        gen, schema="vec_id LONG, embedding ARRAY<FLOAT>"
    ).write.mode("overwrite").parquet(out)
    return out


def topk_sets(df, id_q="qid", id_c="cid"):
    out: dict[int, set] = {}
    for r in df.collect():
        out.setdefault(r[id_q], set()).add(r[id_c])
    return out


def recall(got: dict, truth: dict) -> float:
    hit = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    tot = sum(len(t) for t in truth.values())
    return round(hit / tot, 4) if tot else 0.0


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [10_000, 100_000]
    spark = get_session("ann-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    k = 10
    kind = os.environ.get("ANN_PROBE_KIND", "iso")
    for n in sizes:
        corpus = spark.read.parquet(ensure_vectors(spark, n, kind))
        stride = n // 100
        queries = corpus.where(F.col("vec_id") % stride == 0)
        out = {"n_vectors": n, "kind": kind, "n_queries": queries.count(), "k": k}

        t0 = time.time()
        truth_df = sim.brute_force_topk(queries, corpus, "vec_id", "vec_id", "embedding", k, baseline=True)
        truth = topk_sets(truth_df)
        out["brute_force"] = {"wall_s": round(time.time() - t0, 2)}

        t0 = time.time()
        ivf = sim.ivf_topk(queries, corpus, "vec_id", "vec_id", "embedding", k, nprobe=4)
        got = topk_sets(ivf)
        out["ivf_nprobe4"] = {
            "wall_s": round(time.time() - t0, 2),
            "recall_at_10": recall(got, truth),
            "n_cells": sim.auto_n_cells(corpus),
        }

        # amortized regime: centroids + corpus assignment persisted once,
        # each query batch pays only the probed-cell scan
        n_cells = sim.auto_n_cells(corpus)
        cent = sim.ivf_centroids_deterministic(corpus, "vec_id", "embedding", n_cells)
        assigned = sim.ivf_assign(corpus, "vec_id", "embedding", cent).localCheckpoint()
        t0 = time.time()
        ivf2 = sim.ivf_topk(
            queries, corpus, "vec_id", "vec_id", "embedding", k,
            nprobe=4, centroids=cent, assigned=assigned,
        )
        got = topk_sets(ivf2)
        out["ivf_nprobe4_amortized"] = {
            "wall_s": round(time.time() - t0, 2),
            "recall_at_10": recall(got, truth),
        }

        t0 = time.time()
        lsh = sim.signlsh_topk(queries, corpus, "vec_id", "vec_id", "embedding", k, probe_radius=2)
        got = topk_sets(lsh)
        out["signlsh_r2"] = {
            "wall_s": round(time.time() - t0, 2),
            "recall_at_10": recall(got, truth),
        }

        t0 = time.time()
        pq = sim.ivfpq_topk(
            queries, corpus, "vec_id", "vec_id", "embedding", k, nprobe=4, refine=50
        )
        got = topk_sets(pq)
        out["ivfpq_nprobe4_refine50"] = {
            "wall_s": round(time.time() - t0, 2),
            "recall_at_10": recall(got, truth),
        }

        print(json.dumps(out), flush=True)
        with open("/tmp/ann_scale_probe.jsonl", "a") as fh:
            fh.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
