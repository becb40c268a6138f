"""Event-sequence analytics: funnel progression and cohort retention.

The classic product-analytics pair over an event stream — both are
pure relational compositions (no UDFs), expressed so every shuffle
lands on the user key:

- funnel_stages: ordered-stage progression (stage k counts only when
  it happens strictly AFTER stage k-1). One type-filtered aggregation
  plus one user-key join per stage; the type filter pushes into the
  scan, and every join/agg shares the user-id partitioning, so AQE
  coalesces the cascade into co-partitioned exchanges at scale.
- cohort_retention: users bucketed by first-seen week; per
  (cohort_week, week_offset) distinct-active counts. Two aggregations
  and a user-key join.

No ETL-Wrap analogue (analytics addition beyond the reference's
operator set); both shapes stream with watermarks (the aggs are
per-user monotone minima).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel_stages(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel: (user, t1..tN) where t_k is the earliest
    stage-k event strictly after t_{k-1} (NULL once progression stops).
    Returns every user who reached stage 1, ordered columns t1..tN."""
    if not stages:
        raise ValueError("stages must be non-empty")
    cur = (
        events.where(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, st in enumerate(stages[1:], start=2):
        prev = f"t{i - 1}"
        reached = cur.where(F.col(prev).isNotNull()).select(user_col, prev)
        nxt = (
            events.where(F.col(type_col) == st)
            .join(reached, user_col)
            .where(F.col(ts_col) > F.col(prev))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t{i}"))
        )
        cur = cur.join(nxt, user_col, "left")
    return cur


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_week, week_offset, n_users): distinct users from the
    cohort (first-seen week) active in cohort_week + 7*offset days."""
    first = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_week")
    )
    active = events.select(
        F.col(user_col), F.date_trunc("week", F.col(ts_col)).alias("active_week")
    ).distinct()
    return (
        active.join(first, user_col)
        .select(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7).cast("int").alias("week_offset"),
            F.col(user_col),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(user_col).alias("n_users"))
    )


def linear_attribution(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    touch_type: str = "click",
    convert_type: str = "purchase",
    lookback: str = "6 hours",
) -> DataFrame:
    """Multi-touch LINEAR attribution: each conversion's value is split
    equally across that user's touch events inside the lookback window
    → (user, touch_ts, convert_ts, n_touches, attributed_bp).

    attributed_bp = floor(value * 10000 / n_touches) stays in integer
    arithmetic (exact decimal division rounds differently per engine).
    Conversions with zero in-window touches drop out (nothing to
    attribute to — last-touch-or-nothing policy; route them to a
    'direct' bucket upstream if needed).

    Plan shape: user-key equi join with a range residual (the band-join
    pattern of q31/q47) — never a cross join; both aggregations combine
    map-side on (user, convert_ts). At 100 TB the join shuffles both
    sides on the user key once and AQE handles skewed users (or salt
    via operators/skew for pathological power users)."""
    touches = events.where(F.col(type_col) == touch_type).select(
        F.col(user_col).alias("__u"), F.col(ts_col).alias("touch_ts")
    )
    convs = events.where(F.col(type_col) == convert_type).select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("convert_ts"),
        F.col(value_col).cast("decimal(18,4)").alias("__v"),
    )
    joined = convs.join(touches, on="__u").where(
        (F.col("touch_ts") < F.col("convert_ts"))
        & (F.col("touch_ts") >= F.col("convert_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    counted = joined.groupBy("__u", "convert_ts", "__v").agg(
        F.count(F.lit(1)).alias("n_touches")
    )
    return (
        joined.join(counted, on=["__u", "convert_ts", "__v"])
        .select(
            F.col("__u").alias(user_col),
            "touch_ts",
            "convert_ts",
            "n_touches",
            F.floor(F.col("__v") * 10000 / F.col("n_touches")).cast("bigint").alias("attributed_bp"),
        )
    )


def sessionize_capped(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    gap: str = "30 minutes",
    max_duration: str = "2 hours",
) -> DataFrame:
    """Sessionization with BOTH a gap rule and a MAX-DURATION cap — the
    variant plain ``session_window`` cannot express: a session breaks
    when the inter-event gap exceeds ``gap`` OR when the event would
    stretch the session past ``max_duration`` from its first event
    (billing periods, bot-defense, bounded-session analytics).

    The cap makes the assignment a PREFIX-DEPENDENT recurrence (each
    event's session depends on the session start chosen for the
    previous event), which no fixed window frame computes — this is the
    textbook case for a per-key ordered scan: ``applyInPandas`` groups
    by key, sorts by (ts, order_col), and runs the greedy split. State
    is one group in memory at a time; keys parallelize freely.

    Returns one row per session: (key, sess_idx, start_ts, end_ts,
    n_events)."""
    import pandas as pd

    gap_us = _interval_us(gap)
    dur_us = _interval_us(max_duration)

    def _scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, order_col], kind="mergesort")
        # pin the epoch unit explicitly (Arrow may hand us ns or us)
        ts = pd.to_datetime(pdf[ts_col]).astype("datetime64[ns]").astype("int64")
        out = []
        sess_idx, start = 0, None
        prev = None
        s_start = s_end = None
        n = 0
        for t in ts:
            if start is None:
                sess_idx, start, prev, n = 1, t, t, 1
            elif (t - prev) > gap_us * 1000 or (t - start) > dur_us * 1000:
                out.append((sess_idx, start, prev, n))
                sess_idx, start, n = sess_idx + 1, t, 1
                prev = t
            else:
                prev = t
                n += 1
        if start is not None:
            out.append((sess_idx, start, prev, n))
        key = pdf[key_col].iloc[0]
        return pd.DataFrame(
            {
                key_col: [key] * len(out),
                "sess_idx": [o[0] for o in out],
                "start_ts": pd.to_datetime([o[1] for o in out]),
                "end_ts": pd.to_datetime([o[2] for o in out]),
                "n_events": [o[3] for o in out],
            }
        )

    key_t = dict(df.dtypes)[key_col]
    return df.select(key_col, ts_col, order_col).groupBy(key_col).applyInPandas(
        _scan,
        schema=f"{key_col} {key_t}, sess_idx long, start_ts timestamp, "
        "end_ts timestamp, n_events long",
    )


def _interval_us(spec: str) -> int:
    """'30 minutes' → microseconds (plain int parsing, no Spark)."""
    num, unit = spec.split()
    mult = {
        "second": 1_000_000, "seconds": 1_000_000,
        "minute": 60_000_000, "minutes": 60_000_000,
        "hour": 3_600_000_000, "hours": 3_600_000_000,
    }[unit]
    return int(num) * mult


def rolling_distinct(
    df: DataFrame,
    ts_col: str,
    entity_col: str,
    window_days: int = 7,
) -> DataFrame:
    """EXACT rolling N-day distinct entities per day — the
    weekly-active-users metric computed without sketches: each (day,
    entity) observation explodes into the ``window_days`` window-end
    days it covers (a bounded sequence — map-only), then ONE
    count-distinct per end day. Work is window_days × |daily distinct
    pairs|; at 100 TB pre-aggregate to the (day, entity) grain first
    (this function does — the explode happens after that dedup, so raw
    event volume never multiplies).

    Returns (day, n_active) for every day that closes a full window
    (end day observed in the data range)."""
    from pyspark.sql import functions as F

    daily = df.select(
        F.to_date(ts_col).alias("d"), F.col(entity_col).alias("e")
    ).distinct()
    ends = daily.select(
        "e",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), window_days - 1))
        ).alias("day"),
    )
    bounds = df.agg(
        F.to_date(F.min(ts_col)).alias("lo"), F.to_date(F.max(ts_col)).alias("hi")
    )
    return (
        ends.crossJoin(F.broadcast(bounds))
        .where((F.col("day") >= F.col("lo")) & (F.col("day") <= F.col("hi")))
        .groupBy("day")
        .agg(F.count_distinct("e").cast("bigint").alias("n_active"))
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Market-basket association rules over (basket, item) pairs →
    (item_a, item_b, n_a, n_b, n_ab, confidence_bp, lift_bp) for every
    ordered pair with joint support ≥ ``min_support``.

    All-integer arithmetic (confidence = floor(1e4·n_ab/n_a), lift =
    floor(1e4·N·n_ab/(n_a·n_b))) keeps the statistics engine-exact.
    Plan: distinct (basket, item) — the support dedup — then a
    basket-keyed self-join for pair counts (work scales with per-basket
    item-pair counts, the a-priori candidate space) and two broadcast
    joins onto the item-count table; no all-pairs work ever happens
    across baskets."""
    from pyspark.sql import functions as F

    baskets = df.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    n_total = baskets.select("b").distinct().count()
    item_counts = baskets.groupBy(F.col("i").alias("item")).agg(
        F.count(F.lit(1)).alias("n")
    )
    a = baskets.select("b", F.col("i").alias("item_a"))
    b = baskets.select("b", F.col("i").alias("item_b"))
    pairs = (
        a.join(b, on="b")
        .where(F.col("item_a") != F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_support)
    )
    ca = item_counts.select(F.col("item").alias("item_a"), F.col("n").alias("n_a"))
    cb = item_counts.select(F.col("item").alias("item_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(ca), on="item_a")
        .join(F.broadcast(cb), on="item_b")
        .select(
            "item_a",
            "item_b",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.expr("(10000 * n_ab) div n_a").cast("bigint").alias("confidence_bp"),
            F.expr(f"(10000 * {n_total} * n_ab) div (n_a * n_b)").cast("bigint").alias("lift_bp"),
        )
    )


def seasonal_baseline(
    df: DataFrame,
    season_cols: Sequence[str],
    value_cents: Column | str,
) -> DataFrame:
    """Integer seasonal profile → one row per season cell with
    (n, baseline) where baseline = SUM(cents) div n — the exact-integer
    mean. The profile frame is season-cardinality-sized (e.g. 24×types
    for an hour-of-day profile), so it broadcasts no matter how large
    the event stream is."""
    v = F.col(value_cents) if isinstance(value_cents, str) else value_cents
    return (
        df.groupBy(*season_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(v).cast("bigint").alias("__sum"),
        )
        .withColumn("baseline", F.expr("__sum div n").cast("bigint"))
        .drop("__sum")
    )


def deseasonalize(
    df: DataFrame,
    season_cols: Sequence[str],
    value_cents_col: str,
    out_col: str = "residual",
) -> DataFrame:
    """Subtract the per-cell seasonal baseline → input rows plus
    (baseline, residual), residual = cents − baseline in exact ints.
    One profile aggregation + one BROADCAST join back onto the stream;
    compose with robust.mad_outliers on the residual for seasonal
    anomaly screening (the raw-value MAD would flag every nightly peak
    — deseasonalizing first is what makes the screen mean 'unusual FOR
    this hour', the form an ops/quality monitor actually wants)."""
    prof = seasonal_baseline(df, season_cols, value_cents_col)
    return df.join(F.broadcast(prof), on=list(season_cols)).withColumn(
        out_col, (F.col(value_cents_col) - F.col("baseline")).cast("bigint")
    )


W_DECAY_SCALE_BITS = 40


def time_decay_attribution(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    touch_type: str = "click",
    convert_type: str = "purchase",
    lookback: str = "6 hours",
    half_life_minutes: int = 60,
) -> DataFrame:
    """Multi-touch TIME-DECAY attribution: each conversion's credit is
    split across the user's in-window touches ∝ 2^(−age/half_life) —
    the standard alternative to linear attribution when recency matters
    → (user, touch_ts, convert_ts, weight_scaled, share_bp).

    The decay weight is an EXACT power of two: with age measured in
    whole half-lives n = age_us div half_life_us, weight = 2^(40−n)
    (0 beyond 40 half-lives — fully decayed), so weights, their per-
    conversion sum, and share_bp = (w·10⁴) div Σw are all exact int64
    and engine-replayable — a float exp() could never hash-match.
    Conversions whose every touch is fully decayed drop out (Σw = 0 —
    nothing attributable). Same band-join shape as linear_attribution:
    one user-key shuffle, two map-side-combining aggregations."""
    touches = events.where(F.col(type_col) == touch_type).select(
        F.col(user_col).alias("__u"), F.col(ts_col).alias("touch_ts")
    )
    convs = events.where(F.col(type_col) == convert_type).select(
        F.col(user_col).alias("__u"), F.col(ts_col).alias("convert_ts")
    )
    half_us = half_life_minutes * 60 * 1_000_000
    joined = (
        convs.join(touches, on="__u")
        .where(
            (F.col("touch_ts") < F.col("convert_ts"))
            & (
                F.col("touch_ts")
                >= F.col("convert_ts") - F.expr(f"INTERVAL {lookback}")
            )
        )
        .withColumn(
            "__n",
            F.expr(
                f"(unix_micros(convert_ts) - unix_micros(touch_ts)) div {half_us}"
            ),
        )
        .withColumn(
            "weight_scaled",
            F.when(
                F.col("__n") <= W_DECAY_SCALE_BITS,
                F.expr(
                    f"cast(power(2, {W_DECAY_SCALE_BITS} - __n) as bigint)"
                ),
            )
            .otherwise(F.lit(0))
            .cast("bigint"),
        )
    )
    sums = joined.groupBy("__u", "convert_ts").agg(
        F.sum("weight_scaled").alias("__tw")
    )
    return (
        joined.join(sums, on=["__u", "convert_ts"])
        .where(F.col("__tw") > 0)
        .select(
            F.col("__u").alias(user_col),
            "touch_ts",
            "convert_ts",
            "weight_scaled",
            F.expr("(weight_scaled * 10000) div __tw").cast("bigint").alias(
                "share_bp"
            ),
        )
    )


def sessions_by_gap(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    gap_us: int = 1_800_000_000,
) -> DataFrame:
    """Plain gap sessionization as pure window algebra → one interval
    row (key, sess_idx, start_us, end_us, n_events) per session, times
    in exact epoch MICROSECONDS (``unix_micros`` ≡ DuckDB ``epoch_us``,
    no float seconds anywhere).

    A new session starts when the gap to the previous event exceeds
    ``gap_us`` STRICTLY (the q142 convention); ``sess_idx`` is the
    running sum of break flags over (ts, order_col) — ``order_col``
    must make the per-key ordering total or the lag/sum pair is
    nondeterministic. Unlike ``sessionize_capped`` (a prefix-dependent
    recurrence that needs an ordered per-key scan), the uncapped rule
    is frame-expressible: two WindowExecs sharing one exchange on the
    key, then a map-side-combinable aggregate — nothing leaves the
    key's partition until the tiny interval frame."""
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    us = F.unix_micros(F.col(ts_col))
    brk = (
        F.when(us - F.unix_micros(F.lag(ts_col).over(w)) > gap_us, F.lit(1))
        .otherwise(F.lit(0))
    )
    return (
        df.withColumn("__sidx", F.sum(brk).over(w))
        .groupBy(F.col(key_col), F.col("__sidx").alias("sess_idx"))
        .agg(
            F.min(us).alias("start_us"),
            F.max(us).alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def interval_overlap_pairs(
    iv: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    cell_us: int = 3_600_000_000,
) -> DataFrame:
    """All STRICTLY overlapping interval pairs across DISTINCT keys →
    (key_a, start_a, end_a, key_b, start_b, end_b, overlap_us) — the
    1-D temporal sibling of ``spatial.radius_join_2d``, turning the
    non-equi range predicate into an equi join Spark can shuffle.

    Each interval explodes into the ``cell_us``-grain cells it spans;
    candidates equi-join on the cell. Two overlapping intervals share
    the cell containing the overlap's START, so keeping only the pair
    instance found in exactly that cell yields every pair ONCE with no
    distinct shuffle (the radius-join exactly-once argument, adapted:
    position replaces the one-sided neighbor expansion). Overlap is
    half-open [s,e): pairs match iff greatest(start) < least(end), so
    point sessions never match and every emitted overlap_us is > 0.

    At 100 TB: work per cell is quadratic in that cell's interval
    count, so size ``cell_us`` near the typical interval length (more
    cells per interval = more map-out rows; fewer = hotter cells), and
    a pathological hour (flash event) is the documented salting case —
    operators/skew applies on the cell key. Long intervals emit
    duration/cell_us rows — linear, bounded by total covered time."""
    cells = iv.select(
        F.col(key_col).alias("key_a"),
        F.col(start_col).alias("start_a"),
        F.col(end_col).alias("end_a"),
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {cell_us}"),
                F.expr(f"{end_col} div {cell_us}"),
            )
        ).alias("__cell"),
    )
    right = iv.select(
        F.col(key_col).alias("key_b"),
        F.col(start_col).alias("start_b"),
        F.col(end_col).alias("end_b"),
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {cell_us}"),
                F.expr(f"{end_col} div {cell_us}"),
            )
        ).alias("__cell"),
    )
    ov_start = F.greatest(F.col("start_a"), F.col("start_b"))
    return (
        cells.join(right, on="__cell")
        .where(F.col("key_a") < F.col("key_b"))
        # half-open [s,e) overlap: greatest(start) < least(end) — the
        # single predicate that also rejects point intervals and the
        # point-strictly-inside case ("a.s<b.e AND b.s<a.e" admits a
        # zero-length overlap when one interval is a point inside the
        # other)
        .where(
            F.greatest(F.col("start_a"), F.col("start_b"))
            < F.least(F.col("end_a"), F.col("end_b"))
        )
        .withColumn("__ovs", ov_start)
        # exactly-once: keep the instance in the overlap-start cell
        # (integer div — epoch micros stay exact, no double quotient)
        .where(F.col("__cell") == F.expr(f"__ovs div {cell_us}"))
        .select(
            "key_a",
            "start_a",
            "end_a",
            "key_b",
            "start_b",
            "end_b",
            (
                F.least(F.col("end_a"), F.col("end_b")) - ov_start
            ).alias("overlap_us"),
        )
    )


def srm_guard(
    assignments: DataFrame,
    experiment_col: str,
    variant_col: str,
    chi2_num: int = 3841459,
    chi2_den: int = 1000000,
) -> DataFrame:
    """Sample-ratio-mismatch guard per experiment → (experiment,
    n_variants, n_units, dev_sq_sum, srm): the first gate of every A/B
    readout — if the traffic split itself is off (a bug in assignment,
    logging loss on one arm), every downstream metric is invalid, so
    flag BEFORE reading q174's conversion cells. One-way chi² against
    EQUAL expected shares, entirely in integers: with k variants and n
    units, chi² = Σ_v (k·o_v − n)² / (k·n), so the significance test
    chi² > num/den becomes dev_sq_sum·den > num·k·n — exact on any
    engine. Default threshold 3.841459 (df=1, two-variant experiments
    at 5%); pass the df=k−1 critical value for more arms. Variants
    absent from the data count 0 only if they appear somewhere in the
    experiment's rows — a fully-silent arm is itself the strongest SRM,
    so feed the assignment ledger, not the event log, when arms can go
    dark. One aggregation + one |experiments|·k-row fold; int64-safe
    while k²·n² < 9·10¹⁸ (n ≈ 10⁹ at k=2)."""
    counts = assignments.groupBy(experiment_col, variant_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__o")
    )
    wexp = Window.partitionBy(experiment_col)
    per = counts.select(
        experiment_col,
        F.count(F.lit(1)).over(wexp).cast("bigint").alias("__k"),
        F.sum("__o").over(wexp).cast("bigint").alias("__n"),
        F.col("__o"),
    )
    dev = (F.col("__k") * F.col("__o") - F.col("__n"))
    out = (
        per.groupBy(experiment_col)
        .agg(
            F.max("__k").alias("n_variants"),
            F.max("__n").alias("n_units"),
            F.sum(dev * dev).cast("bigint").alias("dev_sq_sum"),
        )
        .select(
            experiment_col,
            "n_variants",
            "n_units",
            "dev_sq_sum",
            (
                F.col("dev_sq_sum") * F.lit(int(chi2_den))
                > F.lit(int(chi2_num)) * F.col("n_variants") * F.col("n_units")
            ).alias("srm"),
        )
    )
    return out


def cuped_diff(
    metrics: DataFrame,
    variant_col: str,
    pre_col: str,
    post_col: str,
    variant_a: str = "A",
    variant_b: str = "B",
) -> DataFrame:
    """CUPED-adjusted treatment-effect estimate (Deng et al. 2013 —
    the industry-standard variance-reduction for A/B metrics) → one
    row: (n_a, n_b, diff_milli, diff_adj_milli, theta_milli,
    var_reduction_bp). The pre-experiment covariate x (same metric,
    prior period) absorbs between-user variance: adjusted y = y −
    θ·(x − x̄) with θ = cov(x,y)/var(x) pooled across both arms (x
    predates assignment, so adjusting by it cannot bias the effect —
    only shrink its noise; var_reduction ≈ corr(x,y)²).

    Exact-integer construction: θ_milli = sign·((1000·|nSxy−SxSy|) div
    (nSxx−Sx²)) from pooled bigint sums; the adjusted difference
    multiplies out over the common denominator n_a·n_b —
    diff_adj_milli = sign·(|1000·Dy − θ_milli·Dx| div (n_a·n_b)) with
    Dy = SyA·nB − SyB·nA, Dx likewise — so the whole estimate replays
    in SQL. var_reduction_bp is the squared Pearson correlation via
    the acf_bp IEEE tail. Inputs must be exact integers (cents/counts,
    one row per unit); int64 bound: n²·max|value|² < 9·10¹⁸.

    Scale shape: ONE aggregation over the unit-grain frame (six
    map-side-combinable sums per arm via conditional aggregation) —
    no join, no window; the unit frame itself is the heavy stage's
    output upstream."""
    va, vb = F.lit(variant_a), F.lit(variant_b)
    both = metrics.where(F.col(variant_col).isin(variant_a, variant_b)).select(
        F.col(variant_col).alias("__v"),
        F.col(pre_col).cast("bigint").alias("__x"),
        F.col(post_col).cast("bigint").alias("__y"),
    )
    isa = (F.col("__v") == va).cast("bigint")
    isb = (F.col("__v") == vb).cast("bigint")
    agg = both.agg(
        F.sum(isa).alias("n_a"),
        F.sum(isb).alias("n_b"),
        F.sum(F.col("__x")).alias("sx"),
        F.sum(F.col("__y")).alias("sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("syy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
        F.sum(isa * F.col("__x")).alias("sxa"),
        F.sum(isb * F.col("__x")).alias("sxb"),
        F.sum(isa * F.col("__y")).alias("sya"),
        F.sum(isb * F.col("__y")).alias("syb"),
    )
    n = F.col("n_a") + F.col("n_b")
    cov_n = n * F.col("sxy") - F.col("sx") * F.col("sy")
    varx_n = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary_n = n * F.col("syy") - F.col("sy") * F.col("sy")
    sgn = lambda c: F.when(c >= 0, F.lit(1)).otherwise(F.lit(-1))  # noqa: E731
    theta = F.when(
        varx_n > 0,
        sgn(cov_n) * F.expr("(1000 * abs(__covn)) div __varxn"),
    ).otherwise(F.lit(0).cast("bigint"))
    staged = agg.withColumn("__covn", cov_n).withColumn("__varxn", varx_n).withColumn(
        "__varyn", vary_n
    )
    staged = staged.withColumn("theta_milli", theta.cast("bigint"))
    dy = F.col("sya") * F.col("n_b") - F.col("syb") * F.col("n_a")
    dx = F.col("sxa") * F.col("n_b") - F.col("sxb") * F.col("n_a")
    den = F.col("n_a") * F.col("n_b")
    staged = (
        staged.withColumn("__dy", dy)
        .withColumn("__dx", dx)
        .withColumn("__den", den)
        .withColumn("__numadj", F.lit(1000) * dy - F.col("theta_milli") * dx)
    )
    diff = sgn(F.col("__dy")) * F.expr("(1000 * abs(__dy)) div __den")
    diff_adj = sgn(F.col("__numadj")) * F.expr("abs(__numadj) div __den")
    varred = F.floor(
        F.lit(10000.0)
        * (
            (F.col("__covn").cast("double") * F.col("__covn").cast("double"))
            / (F.col("__varxn").cast("double") * F.col("__varyn").cast("double"))
        )
    ).cast("bigint")
    return staged.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        diff.cast("bigint").alias("diff_milli"),
        diff_adj.cast("bigint").alias("diff_adj_milli"),
        "theta_milli",
        F.when((F.col("__varxn") > 0) & (F.col("__varyn") > 0), varred).alias(
            "var_reduction_bp"
        ),
    )


def permutation_test_diff(
    metrics: DataFrame,
    variant_col: str,
    id_col: str,
    value_col: str,
    b: int = 199,
    salt: str = "perm",
    variant_a: str = "A",
) -> DataFrame:
    """Derandomized permutation test for the two-arm mean difference →
    one row (n_units, n_perms, diff_milli, n_as_extreme, p_bp): the
    assumption-free significance test (no normality, no variance
    formula — the reference distribution IS the data under re-randomized
    assignment). Permutation j reassigns every unit by
    md5-60(salt:j:id) mod 2 — seeded, so the usually-RNG-bound test
    replays bit-for-bit in SQL, reruns are identical, and the j-th
    permutation is reconstructible for audit. p_bp uses the standard
    add-one rule (Phipson-Smyth): p = (1 + #{|diff_j| ≥ |observed|})
    / (b + 1), floored to basis points — never exactly zero, as a
    permutation p-value must not be.

    Exact core: per-permutation diffs are the shared sign·((1000·|Dy|)
    div (n_a·n_b)) milli construction over bigint conditional sums, so
    every comparison against the observed diff is an integer one.
    Near-balanced (not exactly 50/50) re-assignment is the binomial
    randomization model — the standard Monte-Carlo permutation variant
    at scale, where exact n_a-preserving permutations would need a
    global shuffle per replicate.

    Scale shape: ONE ×b explode over the unit-grain frame aggregated
    in the same stage (map-side partials: shuffle carries b rows of
    sums, not units×b) — the unit frame is spread statically first
    (session.spread_units: the frame arrives post-aggregation, where
    AQE coalesces by bytes and an ensure_min_parallelism probe would
    execute the upstream shuffle during plan build — the round-6 q214
    wall regression)."""
    from etl_wrap_spark.operators.text import hash60
    from etl_wrap_spark.session import spread_units

    if b < 1:
        raise ValueError("b must be >= 1")
    base = metrics.select(
        F.col(id_col).alias("__id"),
        F.col(value_col).cast("bigint").alias("__y"),
        (F.col(variant_col) == F.lit(variant_a)).cast("bigint").alias("__isa"),
    )
    sgn = lambda c: F.when(c >= 0, F.lit(1)).otherwise(F.lit(-1))  # noqa: E731

    # The OBSERVED assignment rides the same explode as replicate
    # j = -1 (its arm flag is __isa instead of the seeded hash), so the
    # unit frame is scanned and aggregated exactly ONCE — the previous
    # two-branch shape (separate global aggregate + broadcast cross
    # join) re-aggregated the units and scheduled 3 extra AQE jobs for
    # a 1-row side (part of the round-6 q214 wall regression).
    reps = spread_units(base).select(
        "__id", "__y", "__isa",
        F.explode(F.sequence(F.lit(-1), F.lit(int(b) - 1))).alias("__j"),
    )
    arm = F.when(F.col("__j") < 0, F.col("__isa")).otherwise(
        (
            hash60(
                F.concat(
                    F.lit(salt + ":"), F.col("__j").cast("string"),
                    F.lit(":"), F.col("__id").cast("string"),
                )
            )
            % 2
            == 0
        ).cast("bigint")
    )
    per = (
        reps.select("__j", "__y", arm.alias("__pa"))
        .groupBy("__j")
        .agg(
            F.sum("__pa").alias("__na"),
            F.sum(1 - F.col("__pa")).alias("__nb"),
            F.sum(F.col("__pa") * F.col("__y")).alias("__sa"),
            F.sum((1 - F.col("__pa")) * F.col("__y")).alias("__sb"),
        )
        .withColumn("__dy", F.col("__sa") * F.col("__nb") - F.col("__sb") * F.col("__na"))
        .withColumn("__den", F.col("__na") * F.col("__nb"))
        .withColumn(
            "__pd",
            (sgn(F.col("__dy")) * F.expr("(1000 * abs(__dy)) div __den"))
            .cast("bigint"),
        )
    )
    # b+1 rows total: broadcast the observed row's stats to the
    # permutation rows via an all-rows window (single tiny partition)
    w = Window.partitionBy()
    obs_flag = F.col("__j") < 0
    stats = per.select(
        "__j", "__na", "__nb", "__pd",
        F.max(F.when(obs_flag, F.col("__na") + F.col("__nb"))).over(w)
        .cast("bigint").alias("n_units"),
        F.max(F.when(obs_flag, F.col("__pd"))).over(w)
        .cast("bigint").alias("diff_milli"),
    )
    return (
        stats.where(~obs_flag & (F.col("__na") > 0) & (F.col("__nb") > 0))
        .groupBy("n_units", "diff_milli")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_perms"),
            F.sum(
                (F.abs(F.col("__pd")) >= F.abs(F.col("diff_milli"))).cast("int")
            ).cast("bigint").alias("n_as_extreme"),
        )
        .select(
            "n_units", "n_perms", "diff_milli", "n_as_extreme",
            F.expr("((1 + n_as_extreme) * 10000) div (n_perms + 1)").alias("p_bp"),
        )
    )


def ttl_first_seen_batch(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    ttl_minutes: int = 60,
    out_col: str = "emitted",
) -> DataFrame:
    """Batch projection of streaming/stateful.py:first_seen_with_ttl
    (line 61): flags the rows the TTL dedup EMITS — the first sighting
    of a key, and every re-sighting whose gap from the PREVIOUS sighting
    exceeds the ttl (the sliding-TTL contract: every sighting, emitted
    or suppressed, re-arms the timer, so "previous sighting" means the
    immediately preceding event of the key, not the last emission).

    This is the drained-stream semantics under the operator's own
    ordering contract (watermark advanced past last+ttl before the
    re-sighting arrives — the re-admission path
    tests/test_streaming.py:test_first_seen_with_ttl_readmits_after_expiry
    pins); in-flight, a re-sighting inside the watermark delay can still
    see live state. One lag window per key, one shuffle.

    Emission COUNTS and emitted-timestamp aggregates are deterministic
    under timestamp ties (the gap sequence depends only on the sorted
    timestamp values); the per-ROW flag on tied rows is tie-order
    dependent, so aggregate before comparing engines."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    # microsecond arithmetic: a long cast truncates to seconds, and a
    # 3600.5s gap would then read as exactly 3600 — engines disagree
    gap_ok = (
        F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)
        > ttl_minutes * 60 * 1_000_000
    )
    return df.withColumn(out_col, prev.isNull() | gap_ok)
