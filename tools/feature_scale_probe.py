"""Scale probe for the round-4-continuation operator family over the
planted synthetic corpora (make_doc_corpus.py), 1e4 → 1e5 documents —
the same two-decade evidence discipline SCALING.md applies to the dedup
family, for:

- chunk_documents: map-only sliding-window chunking (rows out, wall);
- bigram_lm_scores (self-mode): vocabulary-keyed LM joins at corpus
  scale (wall, docs scored);
- KMV distinct sketches: per-source distinct doc fingerprints with
  k-bounded state (wall; exact-below-k regime check);
- fuzzy_join: q-gram-blocked edit-distance linkage of dirtied titles
  (first 6 tokens, one char deleted) back to clean titles — measures
  CANDIDATE growth (the quadratic risk) with and without the hot-gram
  df-cap, plus recall of the planted self-links.

Usage: python tools/feature_scale_probe.py [N ...]  (default 10000 100000)
Emits one JSON line per corpus size; build the corpus first via
make_doc_corpus.py (the probe calls it if the dir is missing).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_wrap_spark.operators import sketches, text
from etl_wrap_spark.operators.linkage import fuzzy_join, qgrams
from etl_wrap_spark.session import get_session


def ensure_corpus(n: int) -> str:
    out = f"/tmp/doccorpus_{n}"
    if not os.path.isdir(os.path.join(out, "documents.parquet")):
        subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "make_doc_corpus.py"), str(n), out],
            check=True,
        )
    return os.path.join(out, "documents.parquet")


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [10_000, 100_000]
    spark = get_session("feature-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        path = ensure_corpus(n)
        docs = spark.read.parquet(path)
        out = {"n_docs": n}

        t0 = time.time()
        n_chunks = text.chunk_documents(docs, "doc_id", "text", 64, 8).count()
        out["chunking"] = {"wall_s": round(time.time() - t0, 2), "n_chunks": n_chunks}

        t0 = time.time()
        scored = text.bigram_lm_scores(docs, "doc_id", "text")
        n_scored = scored.count()
        out["bigram_lm"] = {"wall_s": round(time.time() - t0, 2), "n_docs_scored": n_scored}

        t0 = time.time()
        src = docs.withColumn("source", (F.col("doc_id") % 20).alias("source"))
        kmv = sketches.distinct_counts_kmv(
            src.select("source", text.fingerprint_md5("text").alias("fp")),
            ["source"], "fp", k=16384,
        )
        rows = kmv.collect()
        out["kmv"] = {
            "wall_s": round(time.time() - t0, 2),
            "n_groups": len(rows),
            "max_distinct": max(r.n_distinct for r in rows),
        }

        # ---- fuzzy linkage on derived titles (first 6 tokens) --------
        titles = docs.select(
            F.col("doc_id").alias("tid"),
            F.concat_ws(" ", F.slice(F.split(F.trim("text"), r"\s+"), 1, 6)).alias("title"),
        )
        dirty = titles.select(
            (F.col("tid") + 10_000_000).alias("did"),
            F.concat(
                F.expr("substr(title, 1, 4)"), F.expr("substr(title, 6)")
            ).alias("dtitle"),
        )
        # candidate volume = the quadratic risk: measure the blocking
        # index join size before verify, capped vs uncapped
        def cand_count(max_df):
            li = titles.select("tid", F.explode(qgrams(F.col("title"), 2)).alias("g"))
            ri = dirty.select("did", F.explode(qgrams(F.col("dtitle"), 2)).alias("g"))
            if max_df is not None:
                hot = li.groupBy("g").agg(F.count(F.lit(1)).alias("c")).where(F.col("c") > max_df)
                li = li.join(F.broadcast(hot.select("g")), "g", "left_anti")
                ri = ri.join(F.broadcast(hot.select("g")), "g", "left_anti")
            return li.join(ri, "g").select("tid", "did").distinct().count()

        t0 = time.time()
        cands_capped = cand_count(max_df=200)
        t_capped = round(time.time() - t0, 2)
        out["fuzzy_linkage"] = {"cand_pairs_dfcap200": cands_capped, "cand_wall_s": t_capped}
        for mode in ("prefix",):
            t0 = time.time()
            linked = fuzzy_join(
                dirty, titles, "did", "dtitle", "tid", "title",
                max_dist=1, q=2, block=mode,
            )
            # planted self-link recall: dirty(doc) must match clean(doc)
            hits = linked.where(F.col("did") - 10_000_000 == F.col("tid")).count()
            out["fuzzy_linkage"][mode] = {
                "wall_s": round(time.time() - t0, 2),
                "planted_recall": round(hits / n, 4),
            }
        print(json.dumps(out), flush=True)
        with open("/tmp/feature_scale_probe.jsonl", "a") as fh:
            fh.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
