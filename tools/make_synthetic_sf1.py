"""Synthesize a ~sf1-scale dataset in /tmp by replicating sf0.1 with
key-shifted copies (join keys offset per copy so cardinalities and join
fan-outs stay realistic). Testdata itself is read-only — this writes
only under /tmp.

Usage: python tools/make_synthetic_sf1.py [copies] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_wrap_spark.session import get_session, load_tables

SRC = "/root/testdata/sf0.1"

# per-table key columns to shift per copy (dims like region/nation stay
# as-is — they are genuinely low-cardinality at every scale)
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]
OFFSET = 100_000_000


def main():
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/synth_sf1"
    spark = get_session("make-synth")
    spark.sparkContext.setLogLevel("ERROR")
    for t in COPY_AS_IS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    for t, keys in SHIFT.items():
        # load_tables normalizes the events nanos timestamp to micros
        base = load_tables(spark, SRC, [t])[t]
        parts = []
        for i in range(copies):
            df = base
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(i * OFFSET))
            parts.append(df)
        acc = parts[0]
        for p in parts[1:]:
            acc = acc.unionByName(p)
        acc.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(f"{t}: {copies}x -> {out}/{t}.parquet")


if __name__ == "__main__":
    main()
