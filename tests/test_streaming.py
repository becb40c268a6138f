"""Streaming ingest tests: availableNow drain equivalence vs batch, and
incremental pickup of late-arriving files (the reference's retry-loop
semantics, checkpoint-subsumed)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from etl_wrap_spark.streaming import ingest

SCHEMA = StructType(
    [
        StructField("event_id", IntegerType()),
        StructField("user_id", IntegerType()),
        StructField("event_type", StringType()),
        StructField("value", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def _write_events_csv(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("".join(f"{r[0]}\t{r[1]}\t{r[2]}\t{r[3]}\t{r[4]}\n" for r in rows))


@pytest.fixture()
def event_dir(tmp_path):
    d = tmp_path / "in"
    _write_events_csv(
        d / "batch1.csv",
        [
            (1, 10, "click", "1.5", "2024-01-01 10:05:00"),
            (2, 10, "click", "2.0", "2024-01-01 10:20:00"),
            (3, 11, "view", "0.5", "2024-01-01 11:05:00"),
        ],
    )
    return d


def test_available_now_drain_matches_batch(spark, tmp_path, event_dir):
    stream = ingest.read_csv_stream(spark, str(event_dir), SCHEMA)
    agg = ingest.tumbling_counts(stream)
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    q = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", str(ck))
        .option("path", str(out))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(out))
    batch = ingest.tumbling_counts(
        spark.read.schema(SCHEMA).option("sep", "\t").csv(str(event_dir))
    )
    # append mode only emits windows the watermark has closed; every
    # emitted row must match the batch computation exactly
    emitted = got.collect()
    batch_rows = {(r["window_start"], r["event_type"]): r for r in batch.collect()}
    for r in emitted:
        b = batch_rows[(r["window_start"], r["event_type"])]
        assert r["n_events"] == b["n_events"] and r["total_value"] == b["total_value"]


def test_incremental_file_pickup(spark, tmp_path, event_dir):
    """Second drain after a new file lands processes ONLY the new data —
    checkpoint state subsumes the reference's processed-file ledger."""
    out = tmp_path / "out2"
    ck = tmp_path / "ck2"
    stream = ingest.read_csv_stream(spark, str(event_dir), SCHEMA)
    plain = stream.select("event_id", "user_id", "event_type")
    ingest.run_available_now(plain, str(ck), str(out))
    n1 = spark.read.parquet(str(out)).count()
    assert n1 == 3
    _write_events_csv(event_dir / "batch2.csv", [(4, 12, "click", "9.0", "2024-01-01 12:00:00")])
    stream2 = ingest.read_csv_stream(spark, str(event_dir), SCHEMA)
    ingest.run_available_now(stream2.select("event_id", "user_id", "event_type"), str(ck), str(out))
    ids = sorted(r["event_id"] for r in spark.read.parquet(str(out)).collect())
    assert ids == [1, 2, 3, 4]  # no reprocessing of batch1


def test_session_window_stream(spark, tmp_path, event_dir):
    _write_events_csv(
        event_dir / "batch3.csv",
        [
            (5, 20, "click", "1.0", "2024-01-01 09:00:00"),
            (6, 20, "click", "1.0", "2024-01-01 09:10:00"),  # same session (gap 10m)
            (7, 20, "click", "1.0", "2024-01-01 10:30:00"),  # new session (gap 80m)
            # sentinel far in the future: advances the watermark past the
            # sessions above so append mode emits them in this drain
            (8, 99, "click", "1.0", "2024-01-01 23:00:00"),
        ],
    )
    stream = ingest.read_csv_stream(spark, str(event_dir), SCHEMA)
    sess = ingest.session_windows(stream, gap="30 minutes")
    ck = tmp_path / "ck3"
    out = tmp_path / "out3"
    q = (
        sess.writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", str(ck))
        .option("path", str(out))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [r for r in spark.read.parquet(str(out)).collect() if r["user_id"] == 20]
    # user 20: two sessions — (09:00-09:10+gap, 2 events) and (10:30, 1 event)
    assert sorted(r["n_events"] for r in rows) == [1, 2]


def test_stream_dedupe_within_watermark(spark, tmp_path):
    d = tmp_path / "dd"
    _write_events_csv(
        d / "b1.csv",
        [
            (1, 10, "click", "1.0", "2024-01-01 10:00:00"),
            (1, 10, "click", "1.0", "2024-01-01 10:00:30"),  # re-delivery, same event_id
            (2, 11, "view", "2.0", "2024-01-01 10:05:00"),
            (2, 11, "view", "2.0", "2024-01-01 10:05:00"),  # exact dup row
        ],
    )
    stream = ingest.read_csv_stream(spark, str(d), SCHEMA)
    deduped = ingest.dedupe_stream(stream, ["event_id"])
    out, ck = tmp_path / "out_dd", tmp_path / "ck_dd"
    q = (
        deduped.writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", str(ck))
        .option("path", str(out))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = sorted(r["event_id"] for r in spark.read.parquet(str(out)).collect())
    assert ids == [1, 2]


def test_stream_static_enrichment(spark, tmp_path, event_dir):
    dim = spark.createDataFrame([(10, "gold"), (11, "silver")], ["user_id", "tier"])
    stream = ingest.read_csv_stream(spark, str(event_dir), SCHEMA)
    enriched = ingest.enrich_stream(stream.select("event_id", "user_id"), dim, on=["user_id"])
    out, ck = tmp_path / "out_en", tmp_path / "ck_en"
    ingest.run_available_now(enriched, str(ck), str(out))
    rows = {r["event_id"]: r["tier"] for r in spark.read.parquet(str(out)).collect()}
    assert rows[1] == "gold" and rows[3] == "silver"


def test_stream_stream_interval_join(spark, tmp_path):
    d = tmp_path / "ssj"
    _write_events_csv(
        d / "b1.csv",
        [
            (1, 10, "click", "1.0", "2024-01-01 10:00:00"),
            (2, 10, "purchase", "5.0", "2024-01-01 09:30:00"),  # 30m before click
            (3, 10, "purchase", "9.0", "2024-01-01 07:00:00"),  # 3h before → outside lookback
            (4, 11, "click", "1.0", "2024-01-01 10:00:00"),  # no purchase for user 11
        ],
    )
    stream = ingest.read_csv_stream(spark, str(d), SCHEMA)
    clicks = stream.where("event_type = 'click'").select(
        F.col("user_id"), F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    stream2 = ingest.read_csv_stream(spark, str(d), SCHEMA)
    purchases = stream2.where("event_type = 'purchase'").select(
        F.col("user_id").alias("p_user"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    ).withColumnRenamed("p_user", "user_id")
    joined = ingest.interval_join_streams(clicks, purchases, "user_id", "cts", "pts", lookback="1 HOUR")
    out, ck = tmp_path / "out_ssj", tmp_path / "ck_ssj"
    q = (
        joined.select(clicks["user_id"], "click_id", "purchase_id")
        .writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", str(ck))
        .option("path", str(out))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [(r["click_id"], r["purchase_id"]) for r in spark.read.parquet(str(out)).collect()]
    assert rows == [(1, 2)]  # only the in-window pair; user 11 and the 3h-old purchase drop


def test_streaming_near_dup_index_cross_batch(spark, tmp_path):
    """Two drains: the second batch's exact dup of a first-batch doc is
    caught by the signature index built during the first drain."""
    doc_schema = StructType(
        [StructField("doc_id", IntegerType()), StructField("text", StringType())]
    )
    src = tmp_path / "docs_in"
    src.mkdir()
    idx = str(tmp_path / "sig_index")
    hits = str(tmp_path / "dup_hits")
    ckpt = str(tmp_path / "ckpt")

    def _drain():
        stream = (
            spark.readStream.schema(doc_schema)
            .option("sep", "\t")
            .csv(str(src))
        )
        ingest.streaming_near_dup_index(
            stream, idx, hits, ckpt, min_est_j_bp=5000
        ).awaitTermination()

    (src / "b1.csv").write_text(
        "1\tthe quick brown fox jumps over the lazy dog near the river bank\n"
        "2\tcompletely different content with no overlap whatsoever here\n"
    )
    _drain()
    assert spark.read.parquet(idx).count() == 2

    (src / "b2.csv").write_text(
        "3\tthe quick brown fox jumps over the lazy dog near the river bank\n"
        "4\tnovel text that resembles nothing ingested before at all\n"
    )
    _drain()
    got = {(r["id_new"], r["id_idx"]): r["est_j_bp"] for r in spark.read.parquet(hits).collect()}
    assert got[(3, 1)] == 10000           # exact dup across batches
    assert all(k[0] != 4 for k in got)    # novel doc never pairs
    assert spark.read.parquet(idx).count() == 4


def test_watermark_drops_late_beyond_and_merges_within(spark, tmp_path):
    """Late-data semantics of the watermarked tumbling aggregation
    (§2.9): an event older than the watermark is DROPPED (its closed
    window is never re-emitted or revised); an out-of-order event still
    above the watermark is MERGED into its (open) window.
    """
    d = tmp_path / "in"
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    # drain 1: two clicks in [10:00,11:00), plus a 14:00 event that moves
    # the watermark to 12:00 (2h lateness), closing the 10:00 window
    _write_events_csv(
        d / "b1.csv",
        [
            (1, 10, "click", "1.0", "2024-01-01 10:05:00"),
            (2, 10, "click", "1.0", "2024-01-01 10:20:00"),
            (3, 11, "view", "1.0", "2024-01-01 14:00:00"),
        ],
    )
    ingest.run_available_now(
        ingest.tumbling_counts(ingest.read_csv_stream(spark, str(d), SCHEMA)),
        str(ck),
        str(out),
    )
    # drain 2: event 4 is BEYOND the 12:00 watermark (dropped); event 5
    # is out-of-order but within (merged into [13:00,14:00)); event 6
    # advances the watermark to 15:00 so both view windows finalize
    _write_events_csv(
        d / "b2.csv",
        [
            (4, 12, "click", "1.0", "2024-01-01 10:40:00"),
            (5, 13, "view", "1.0", "2024-01-01 13:30:00"),
            (6, 14, "view", "1.0", "2024-01-01 17:00:00"),
        ],
    )
    ingest.run_available_now(
        ingest.tumbling_counts(ingest.read_csv_stream(spark, str(d), SCHEMA)),
        str(ck),
        str(out),
    )
    rows = spark.read.parquet(str(out)).collect()
    by_key = {}
    for r in rows:
        key = (str(r["window_start"]), r["event_type"])
        assert key not in by_key, f"window {key} emitted twice (late revision?)"
        by_key[key] = r["n_events"]
    # the closed click window was emitted once, WITHOUT the late event 4
    assert by_key[("2024-01-01 10:00:00", "click")] == 2
    # the within-watermark out-of-order event 5 was merged, not dropped
    assert by_key[("2024-01-01 13:00:00", "view")] == 1
    assert by_key[("2024-01-01 14:00:00", "view")] == 1


def test_stream_upsert_to_lake_atomic_merge(spark, tmp_path):
    """Micro-batches MERGE into the atomic lake table: later deliveries
    of the same key replace earlier ones; each batch is one committed
    version; readers see whole versions only."""
    from etl_wrap_spark.sinks.lake import AtomicTable

    d = tmp_path / "in"
    _write_events_csv(
        d / "b1.csv",
        [
            (1, 10, "click", "1.0", "2024-01-01 10:00:00"),
            (2, 11, "view", "2.0", "2024-01-01 10:01:00"),
        ],
    )
    table = AtomicTable(spark, str(tmp_path / "tbl"))
    stream = ingest.read_csv_stream(spark, str(d), SCHEMA).select(
        "event_id", "event_type", "value"
    )
    q = ingest.stream_upsert_to_lake(stream, table, ["event_id"], str(tmp_path / "ck"))
    q.awaitTermination(120)
    v1 = table.current_version()
    got = {r["event_id"]: r["value"] for r in table.read().collect()}
    assert got == {1: "1.0", 2: "2.0"}

    # second drain: event 1 updated, event 3 new — ONE new version
    _write_events_csv(
        d / "b2.csv",
        [
            (1, 10, "click", "9.9", "2024-01-01 11:00:00"),
            (3, 12, "buy", "5.0", "2024-01-01 11:01:00"),
        ],
    )
    stream2 = ingest.read_csv_stream(spark, str(d), SCHEMA).select(
        "event_id", "event_type", "value"
    )
    q2 = ingest.stream_upsert_to_lake(stream2, table, ["event_id"], str(tmp_path / "ck"))
    q2.awaitTermination(120)
    assert table.current_version() == v1 + 1
    got = {r["event_id"]: r["value"] for r in table.read().collect()}
    assert got == {1: "9.9", 2: "2.0", 3: "5.0"}
    # the pre-batch version is still readable (time travel survives)
    old = {r["event_id"]: r["value"] for r in table.read(version=v1).collect()}
    assert old == {1: "1.0", 2: "2.0"}


def test_first_seen_with_ttl_readmits_after_expiry(spark, tmp_path):
    """TTL dedup contract: first sight emits, in-TTL duplicate is
    suppressed, and once the watermark passes last-sighting + ttl the
    EventTimeTimeout removes the state so the key re-emits — the
    re-admittance dropDuplicatesWithinWatermark cannot express."""
    from etl_wrap_spark.streaming.stateful import first_seen_with_ttl

    d = tmp_path / "ttl_in"
    out_rows = []

    def drain():
        stream = ingest.read_csv_stream(spark, str(d), SCHEMA)
        dedup = first_seen_with_ttl(
            stream.select("event_id", "user_id", "ts"),
            key_col="user_id", ts_col="ts", ttl_minutes=60, watermark="10 minutes",
        )
        q = (
            dedup.writeStream.foreachBatch(
                lambda df, _id: out_rows.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ttl_ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: first sight of user 10 -> emitted
    _write_events_csv(d / "b1.csv", [(1, 10, "click", "1.0", "2024-01-01 10:00:00")])
    drain()
    assert [r.user_id for r in out_rows] == [10]

    # batch 2: duplicate within TTL -> suppressed (state alive)
    _write_events_csv(d / "b2.csv", [(2, 10, "click", "1.0", "2024-01-01 10:20:00")])
    drain()
    assert [r.user_id for r in out_rows] == [10]

    # batch 3: unrelated key far in the future advances the watermark
    # beyond 10's timeout (10:20 + 60m = 11:20) — watermark updates at
    # batch END, so the timeout can only FIRE in a later batch
    _write_events_csv(d / "b3.csv", [(3, 99, "view", "1.0", "2024-01-01 14:00:00")])
    drain()
    # batch 4: watermark now 13:50 > 11:20, and 10 has NO data in this
    # batch -> its group gets the hasTimedOut invocation (state removed)
    _write_events_csv(d / "b4.csv", [(5, 98, "view", "1.0", "2024-01-01 14:05:00")])
    drain()
    # batch 5: 10 returns after expiry -> re-emitted
    _write_events_csv(d / "b5.csv", [(4, 10, "click", "1.0", "2024-01-01 14:10:00")])
    drain()
    emitted = [r.user_id for r in out_rows]
    assert emitted.count(10) == 2 and 99 in emitted and 98 in emitted


def test_stream_e2e_coerce_quarantine_partitioned_lake(spark, tmp_path):
    """The composed streaming pipeline, end to end: dirty CSV stream ->
    numeric coercion (SAP minus / N/A) -> rule-bank quarantine split ->
    micro-batch MERGE into a PARTITION-granular lake table. Two drains:
    the second touches only one partition, which the manifest must show
    as the only rewritten directory (file-reuse under streaming)."""
    from etl_wrap_spark.functions import coerce
    from etl_wrap_spark.sinks.lake import PartitionedAtomicTable
    from etl_wrap_spark.streaming.ingest import read_csv_stream, stream_upsert_to_lake

    d = tmp_path / "e2e_in"
    table = PartitionedAtomicTable(spark, str(tmp_path / "e2e_tbl"), "event_type")

    def drain():
        stream = read_csv_stream(spark, str(d), SCHEMA)
        clean = stream.select(
            "event_id", "event_type",
            coerce.coerce_number(F.col("value")).alias("v"),
        ).where(F.col("v").isNotNull())  # quarantine: unparseable values drop
        q = stream_upsert_to_lake(clean, table, ["event_id"], str(tmp_path / "e2e_ck"))
        q.awaitTermination(120)

    _write_events_csv(
        d / "b1.csv",
        [
            (1, 10, "click", "12.5", "2024-01-01 10:00:00"),
            (2, 10, "view", "3.0-", "2024-01-01 10:01:00"),   # SAP trailing minus
            (3, 11, "click", "N/A", "2024-01-01 10:02:00"),   # quarantined
            (4, 11, "view", "7.25", "2024-01-01 10:03:00"),
        ],
    )
    drain()
    dirs_v1 = table.partition_dirs()
    got1 = {(r.event_id, r.event_type, r.v) for r in table.read().collect()}
    assert got1 == {(1, "click", 12.5), (2, "view", -3.0), (4, "view", 7.25)}

    # second batch: updates event 1 and inserts event 5, clicks ONLY
    _write_events_csv(
        d / "b2.csv",
        [
            (1, 10, "click", "99.0", "2024-01-01 11:00:00"),
            (5, 12, "click", "1.5", "2024-01-01 11:01:00"),
        ],
    )
    drain()
    dirs_v2 = table.partition_dirs()
    assert dirs_v2["view"] == dirs_v1["view"]    # untouched partition reused
    assert dirs_v2["click"] != dirs_v1["click"]
    got2 = {(r.event_id, r.v) for r in table.read().collect()}
    assert got2 == {(1, 99.0), (2, -3.0), (4, 7.25), (5, 1.5)}


def test_lake_txn_idempotent_commits(spark, tmp_path):
    """The manifest transaction ledger (txnAppId pattern): a commit
    replayed with an already-recorded (app_id, txn_version) is a no-op
    EVEN when its content differs — the at-least-once -> exactly-once
    conversion for foreachBatch retries with non-idempotent payloads."""
    from etl_wrap_spark.sinks.lake import AtomicTable

    table = AtomicTable(spark, str(tmp_path / "t"))
    df1 = spark.createDataFrame([(1, 10), (2, 20)], ["k", "v"])
    v1 = table.write(df1, txn=("app", 0))
    assert table.last_txn_version("app") == 0

    # replay batch 0 with DIFFERENT (doubled) content — must be skipped
    doubled = spark.createDataFrame([(1, 20), (2, 40)], ["k", "v"])
    v_replay = table.upsert(doubled, ["k"], txn=("app", 0))
    assert v_replay == v1
    assert {r["k"]: r["v"] for r in table.read().collect()} == {1: 10, 2: 20}

    # the next batch applies normally and advances the ledger
    df2 = spark.createDataFrame([(2, 99), (3, 30)], ["k", "v"])
    v2 = table.upsert(df2, ["k"], txn=("app", 1))
    assert v2 == v1 + 1
    assert table.last_txn_version("app") == 1
    assert {r["k"]: r["v"] for r in table.read().collect()} == {1: 10, 2: 99, 3: 30}

    # a second independent app has its own ledger
    assert table.last_txn_version("other") is None
    table.upsert(spark.createDataFrame([(9, 9)], ["k", "v"]), ["k"], txn=("other", 5))
    assert table.last_txn_version("other") == 5
    assert table.last_txn_version("app") == 1

    # un-txn'd commits never touch the ledger
    table.upsert(spark.createDataFrame([(8, 8)], ["k", "v"]), ["k"])
    assert table.last_txn_version("app") == 1


def test_streaming_cusum_equals_batch(spark, tmp_path):
    """Cross-batch CUSUM state: two drains over a split series emit
    exactly the batch operator's S⁺/S⁻/flag per observation — the four
    -bigint state carries the prefix identity across micro-batches."""
    from etl_wrap_spark.operators.robust import cusum_changepoints
    from etl_wrap_spark.streaming.stateful import streaming_cusum

    vals = [100, 103, 98, 101, 99, 150, 152, 149, 151, 148]
    mu = sum(vals) // len(vals)  # the batch operator's integer mean
    rows = [("g", i, v) for i, v in enumerate(vals)]

    batch_df = spark.createDataFrame(rows, ["key", "t", "value"])
    expect = {
        r["t"]: (r["splus"], r["sminus"], 1 if r["cusum_flag"] else 0)
        for r in cusum_changepoints(
            batch_df, ["key"], "t", "value", slack_bp=500, threshold_bp=2000
        ).collect()
    }

    d = tmp_path / "cusum_in"
    d.mkdir()
    out_rows = []

    def drain():
        stream = (
            spark.readStream.schema("key STRING, t BIGINT, value BIGINT")
            .option("header", "false")
            .csv(str(d))
        )
        mon = streaming_cusum(
            stream, {"g": mu}, slack_bp=500, threshold_bp=2000
        )
        q = (
            mon.writeStream.foreachBatch(
                lambda df, _id: out_rows.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "cusum_ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def write_batch(name, items):
        (d / name).write_text("\n".join(f"g,{t},{v}" for t, v in items) + "\n")

    write_batch("b1.csv", [(i, v) for i, v in enumerate(vals[:6])])
    drain()
    write_batch("b2.csv", [(i + 6, v) for i, v in enumerate(vals[6:])])
    drain()

    got = {r["t"]: (r["splus"], r["sminus"], r["cusum_flag"]) for r in out_rows}
    assert got == expect
    # the level shift (t>=5) accumulates on the plus side and flags
    assert got[9][0] > 0 and got[9][2] == 1


def test_streaming_cusum_skips_unknown_keys(spark, tmp_path):
    """A key with no baseline entry must NOT kill the streaming query
    (round-4 ADVICE: KeyError inside applyInPandasWithState aborts the
    whole monitor) — it is silently unmonitored while known keys keep
    emitting."""
    from etl_wrap_spark.streaming.stateful import streaming_cusum

    d = tmp_path / "cusum_unk"
    d.mkdir()
    (d / "b1.csv").write_text(
        "\n".join(f"{k},{t},{v}" for k, t, v in
                  [("g", 0, 100), ("zz", 0, 5), ("g", 1, 150), ("zz", 1, 9)]) + "\n"
    )
    out_rows = []
    stream = (
        spark.readStream.schema("key STRING, t BIGINT, value BIGINT")
        .option("header", "false")
        .csv(str(d))
    )
    mon = streaming_cusum(stream, {"g": 100}, slack_bp=500, threshold_bp=2000)
    q = (
        mon.writeStream.foreachBatch(lambda df, _id: out_rows.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cusum_unk_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    keys = {r["key"] for r in out_rows}
    assert keys == {"g"}
    assert len(out_rows) == 2


def test_streaming_heavy_hitters_equals_sequential_mg(spark, tmp_path):
    """Cross-batch Misra-Gries: two drains over a split stream leave
    exactly the state a single sequential MG pass over the full stream
    would hold — the k-counter state carries the summary identity
    across micro-batches — and the heavy item survives with the
    textbook lower bound."""
    from etl_wrap_spark.streaming.stateful import streaming_heavy_hitters

    # 60 items: 'hot' appears 24x (> N/k = 15), filler cycles 9 values
    items = []
    for i in range(60):
        items.append("hot" if i % 5 in (0, 2) else f"f{i % 9}")
    k = 4

    def seq_mg(vals):
        counters = {}
        for v in vals:
            if v in counters:
                counters[v] += 1
            elif len(counters) < k:
                counters[v] = 1
            else:
                counters = {i: c - 1 for i, c in counters.items() if c > 1}
        return counters

    expect = seq_mg(items)

    d = tmp_path / "hh_in"
    d.mkdir()
    out_rows = []

    def drain():
        stream = (
            spark.readStream.schema("key STRING, t BIGINT, item STRING")
            .option("header", "false")
            .csv(str(d))
        )
        hh = streaming_heavy_hitters(stream, k=k)
        q = (
            hh.writeStream.foreachBatch(
                lambda df, _id: out_rows.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "hh_ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    (d / "b1.csv").write_text(
        "\n".join(f"g,{t},{v}" for t, v in enumerate(items[:35])) + "\n"
    )
    drain()
    (d / "b2.csv").write_text(
        "\n".join(f"g,{t + 35},{v}" for t, v in enumerate(items[35:])) + "\n"
    )
    drain()

    last = max(r["n_seen"] for r in out_rows)
    assert last == 60
    got = {r["item"]: r["cnt_lb"] for r in out_rows if r["n_seen"] == last}
    assert got == expect
    # MG guarantee: true count 24, undercount <= N/k = 15
    assert got.get("hot", 0) >= 24 - 60 // k


def test_heavy_hitters_drain_equals_batch_projection(spark, tmp_path):
    """q220 contract: in the exact regime (k >= distinct items per key)
    the drained streaming_heavy_hitters final emission equals the batch
    projection (frequent_items_sketch_df + n_seen) bit-for-bit — the
    drain ≡ batch pin the round-7 VERDICT asked for alongside the
    oracle registration."""
    from etl_wrap_spark.operators.frequent import frequent_items_sketch_df
    from etl_wrap_spark.streaming.stateful import streaming_heavy_hitters
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rows = []
    for t in range(40):
        rows.append(("a", t, f"u{t % 7}"))
        rows.append(("b", t, f"u{t % 3}"))
    k = 16

    d = tmp_path / "hh2_in"
    d.mkdir()
    (d / "b1.csv").write_text(
        "\n".join(f"{g},{t},{v}" for g, t, v in rows[:50]) + "\n"
    )
    (d / "b2.csv").write_text(
        "\n".join(f"{g},{t},{v}" for g, t, v in rows[50:]) + "\n"
    )
    out_rows = []
    stream = (
        spark.readStream.schema("key STRING, t BIGINT, item STRING")
        .option("header", "false")
        .csv(str(d))
    )
    q = (
        streaming_heavy_hitters(stream, k=k)
        .writeStream.foreachBatch(lambda df, _id: out_rows.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hh2_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    drained = {}
    for r in out_rows:
        cur = drained.get(r["key"])
        if cur is None or r["n_seen"] >= cur[0]:
            drained.setdefault(r["key"], (r["n_seen"], {}))
            if r["n_seen"] > drained[r["key"]][0]:
                drained[r["key"]] = (r["n_seen"], {})
            drained[r["key"]][1][r["item"]] = r["cnt_lb"]

    batch_src = spark.createDataFrame(rows, "key STRING, t BIGINT, item STRING")
    sk = frequent_items_sketch_df(batch_src, "item", k=k, group_by=["key"])
    w = Window.partitionBy("key")
    proj = sk.withColumn("n_seen", F.sum("cnt_lb").over(w)).collect()
    got = {}
    for r in proj:
        got.setdefault(r["key"], (r["n_seen"], {}))
        got[r["key"]][1][r["item"]] = r["cnt_lb"]
    assert got == drained
