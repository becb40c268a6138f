"""Decompose q157_bfs_hops fast-path build cost: probe count job,
Arrow edge collect (full symmetric union vs directed half), numpy CSR,
seed collect, result re-entry. Decision probe for the symmetrize idea:
is collecting HALF the edges (directed pairs) and mirroring driver-side
worth an operator API knob?"""
import os, sys, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF = os.environ["SPARK_GRAFT_SF_DIR"]

from pyspark.sql import functions as F
from etl_wrap_spark.session import get_session, load_tables
from etl_wrap_spark.operators.graph import _arrow_numpy_cols, _csr_adjacency

spark = get_session("q157-decomp")
spark.sparkContext.setLogLevel("ERROR")
t = load_tables(spark, SF, ["lineitem", "orders", "customer"])

out = {}

def build_pairs():
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("a"),
                (F.col("l_suppkey") + 1000000).alias("b"))
        .distinct()
    )

# warm the scans once
build_pairs().count()

for label, mk in [
    ("sym_union", lambda: (lambda p: p.select(F.col("a").alias("src"), F.col("b").alias("dst"))
                           .unionAll(p.select(F.col("b").alias("src"), F.col("a").alias("dst"))))(build_pairs())),
    ("directed_half", lambda: build_pairs().select(F.col("a").alias("src"), F.col("b").alias("dst"))),
]:
    res = {}
    for rep in range(3):
        e = mk().select(F.col("src").alias("__s"), F.col("dst").alias("__d")).localCheckpoint(eager=False)
        t0 = time.perf_counter(); n = e.count(); t1 = time.perf_counter()
        cols, nr, hn = _arrow_numpy_cols(e); t2 = time.perf_counter()
        import numpy as np
        if label == "directed_half":
            s = np.concatenate([cols["__s"], cols["__d"]])
            d = np.concatenate([cols["__d"], cols["__s"]])
        else:
            s, d = cols["__s"], cols["__d"]
        node_arr, indptr, nbr = _csr_adjacency(s, d); t3 = time.perf_counter()
        res.setdefault("count_job", []).append(round(t1 - t0, 4))
        res.setdefault("collect", []).append(round(t2 - t1, 4))
        res.setdefault("csr", []).append(round(t3 - t2, 4))
        res["rows_collected"] = nr
        res["n_nodes"] = int(len(node_arr))
    out[label] = res

print(json.dumps(out, indent=1))
