"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY §2.9 extension surface).

The state store holds one pandas-serializable tuple per group key;
watermark-driven timeouts expire idle state. This is the engine's home
for streaming semantics the built-in windowed aggregates can't express
(running totals that never re-emit history, cross-batch counters,
custom session payloads).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_TOTAL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = "n BIGINT, total DOUBLE"


def running_totals(events: DataFrame, key_col: str = "user_id", value_col: str = "value") -> DataFrame:
    """Per-key running (event count, value sum) across micro-batches —
    state survives batches and restarts via the checkpoint.

    Emits one updated row per key per batch (update output mode)."""

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].astype(float).sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTAL_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def first_seen_with_ttl(
    events: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    ttl_minutes: int = 60,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming first-occurrence dedup with EVENT-TIME state expiry —
    the TTL variant ``dropDuplicatesWithinWatermark`` can't express:
    a key is emitted on first sight, suppressed while its state lives,
    and RE-ADMITTED (emitted again) once the watermark passes
    last-sighting + ttl and the timeout removes the state.  That is the
    production contract for "notify once per incident per hour" /
    re-crawl-after-cooldown pipelines, where re-emission is the point.

    Sliding TTL: every sighting re-arms the timeout at
    event_time + ttl.  State is one BIGINT per live key; expired keys
    are removed by the EventTimeTimeout invocation (hasTimedOut), so
    state size tracks the ACTIVE key population, not history — the
    bounded-state posture of §2.9.  Update output mode: pair with
    foreachBatch for file sinks (the documented gotcha).
    """
    key_dt = dict(events.dtypes)[key_col]
    out_schema = StructType(
        [
            StructField(key_col, events.schema[key_col].dataType),
            StructField("first_ts", events.schema[ts_col].dataType),
        ]
    )
    ttl_ms = ttl_minutes * 60 * 1000

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        rows = pd.concat(list(pdfs))
        last_ms = int(rows[ts_col].max().value // 10**6)
        if not state.exists:
            first = rows[ts_col].min()
            state.update((int(first.value // 10**6),))
            yield pd.DataFrame({key_col: [key[0]], "first_ts": [first]})
        # re-arm on every sighting (sliding TTL since LAST occurrence)
        state.setTimeoutTimestamp(last_ms + ttl_ms)

    _ = key_dt  # documented: output key type mirrors the input dtype
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="first_ms BIGINT",
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


CUSUM_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("t", LongType()),
        StructField("value", LongType()),
        StructField("splus", LongType()),
        StructField("sminus", LongType()),
        StructField("cusum_flag", LongType()),
    ]
)

_CUSUM_STATE = "cum_p BIGINT, min_p BIGINT, cum_m BIGINT, max_m BIGINT"


def streaming_cusum(
    events: DataFrame,
    baselines: dict,
    key_col: str = "key",
    order_col: str = "t",
    value_col: str = "value",
    slack_bp: int = 500,
    threshold_bp: int = 5000,
) -> DataFrame:
    """Streaming twin of robust.cusum_changepoints: the two-sided
    integer CUSUM maintained ACROSS micro-batches with four bigints of
    state per key — running cum⁺/cum⁻ and their running min/max, which
    by the prefix closed form reproduce the textbook recursion exactly,
    so a drained stream emits bit-for-bit the batch operator's S⁺/S⁻.

    ``baselines`` maps key → reference mean μ (integer). Streaming
    CUSUM monitors drift AGAINST A KNOWN BASELINE — the batch operator
    derives μ retrospectively from the full series; a monitor must fix
    it up front (yesterday's profile, a control period). Slack and
    threshold derive from μ exactly as in the batch form.

    Ordering contract: rows are processed in ``order_col`` order within
    each batch, and batches are assumed time-ordered per key (the
    running_totals contract) — a late event would splice into the wrong
    prefix; route late data through the watermarking ingest first.
    Update output mode; one emitted row per observation."""

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        k = key[0]
        if k not in baselines:
            # a key with no baseline cannot be monitored — emit nothing
            # for it rather than raising inside the state function,
            # which would kill the WHOLE streaming query on one unknown
            # key from live data (round-4 ADVICE). Register the key in
            # `baselines` and restart to start monitoring it.
            return
        mu = int(baselines[k])
        s = (mu * slack_bp) // 10000
        h = (mu * threshold_bp) // 10000
        cum_p, min_p, cum_m, max_m = (
            state.get if state.exists else (0, 0, 0, 0)
        )
        rows = {c: [] for c in ("key", "t", "value", "splus", "sminus", "cusum_flag")}
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col, kind="mergesort")
            for t, v in zip(pdf[order_col].astype("int64"), pdf[value_col].astype("int64")):
                v = int(v)
                cum_p += v - mu - s
                min_p = min(min_p, cum_p)
                cum_m += v - mu + s
                max_m = max(max_m, cum_m)
                splus = cum_p - min(0, min_p)
                sminus = max(0, max_m) - cum_m
                rows["key"].append(k)
                rows["t"].append(int(t))
                rows["value"].append(v)
                rows["splus"].append(splus)
                rows["sminus"].append(sminus)
                rows["cusum_flag"].append(1 if (splus > h or sminus > h) else 0)
        state.update((cum_p, min_p, cum_m, max_m))
        yield pd.DataFrame(rows)

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=CUSUM_SCHEMA,
        stateStructType=_CUSUM_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_heavy_hitters(
    events: DataFrame,
    k: int = 20,
    key_col: str = "key",
    order_col: str = "t",
    item_col: str = "item",
) -> DataFrame:
    """Streaming twin of operators/frequent.frequent_items_sketch_df:
    per-key Misra-Gries heavy hitters maintained ACROSS micro-batches —
    the state IS the k-counter summary (items + lower-bound counts +
    items-seen), so memory per key is k counters forever while the
    stream is unbounded. Emits the full current summary each batch with
    a monotone ``n_seen`` cursor (consumers keep the max-n_seen rows
    per key; update output mode re-emits evolving groups only).

    Exactness contract: because MG is a sequential algorithm, the
    cross-batch run is BIT-IDENTICAL to a single sequential MG pass
    over the concatenated stream (same decrement-all rule as the batch
    operator's partition pass) — which is what the drain≡reference test
    pins. The classic bound carries over: total undercount ≤ N/k, so
    every item with true frequency > N/k is guaranteed present.

    Ordering contract (as streaming_cusum): rows sort by ``order_col``
    within each batch and batches are time-ordered per key; route late
    data through the watermarking ingest first. Item values are
    processed as strings (the state store schema is fixed)."""
    kk = int(k)
    if kk < 1:
        raise ValueError("k must be >= 1")

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            items, counts, n_seen = state.get
            counters = dict(zip(items, counts))
        else:
            counters, n_seen = {}, 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values(order_col, kind="mergesort")
            for v in batch[item_col].astype(str):
                n_seen += 1
                if v in counters:
                    counters[v] += 1
                elif len(counters) < kk:
                    counters[v] = 1
                else:
                    counters = {i: c - 1 for i, c in counters.items() if c > 1}
        state.update(
            (list(counters), [int(c) for c in counters.values()], int(n_seen))
        )
        out = sorted(counters.items())
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(out),
                "item": [i for i, _ in out],
                "cnt_lb": [c for _, c in out],
                "n_seen": [int(n_seen)] * len(out),
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} string, item string, cnt_lb long, n_seen long",
        stateStructType="items array<string>, counts array<long>, n_seen long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
