"""Structured-Streaming drain-rate probe: watermarked hourly tumbling
aggregation over the events stream at two data decades, measuring
end-to-end micro-batch throughput (events/s) and per-batch wall — the
streaming-side counterpart of the batch 100x probes.

Layout: the immutable events.parquet is copied N times into a staging
dir (read-only testdata is never touched); the query reads it as a
file stream with maxFilesPerTrigger=2 so the drain exercises REAL
multi-batch checkpointing (state carry across batches), not one giant
batch. Sink is foreachBatch counting rows (no writer cost in the
measurement).

Usage: python tools/streaming_scale_probe.py [sf_dir ...]
Appends one JSON line per run to /tmp/streaming_scale_probe.jsonl.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_wrap_spark.session import get_session, load_tables


def probe(spark, sf_dir: str, copies: int = 8) -> dict:
    src = load_tables(spark, sf_dir, ["events"])["events"]
    n_src = src.count()
    stage = tempfile.mkdtemp(prefix="stream_probe_")
    data_dir = os.path.join(stage, "in")
    os.makedirs(data_dir)
    # one physical parquet per copy (micros timestamps — the stream
    # schema reads them directly, no nanos conf needed)
    src.write.mode("overwrite").parquet(os.path.join(stage, "seed"))
    seed_files = [
        f for f in os.listdir(os.path.join(stage, "seed")) if f.endswith(".parquet")
    ]
    for i in range(copies):
        for j, f in enumerate(seed_files):
            os.link(
                os.path.join(stage, "seed", f),
                os.path.join(data_dir, f"c{i}_{j}.parquet"),
            )
    schema = src.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max(len(seed_files) * copies // 4, 1))
        .parquet(data_dir)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    seen = {"rows": 0, "batches": 0}

    def _sink(batch_df, batch_id):
        seen["rows"] += batch_df.count()
        seen["batches"] += 1

    t0 = time.time()
    q = (
        agg.writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(stage, "ckpt", uuid.uuid4().hex))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    shutil.rmtree(stage, ignore_errors=True)
    total_events = n_src * copies
    return {
        "probe": "streaming_hourly_agg",
        "sf_dir": sf_dir,
        "events": total_events,
        "batches": seen["batches"],
        "wall_s": round(wall, 2),
        "events_per_s": int(total_events / wall),
    }


def main():
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_session("streaming-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        out = probe(spark, d)
        print(json.dumps(out), flush=True)
        with open("/tmp/streaming_scale_probe.jsonl", "a") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
