"""Driver-contract regression guards.

The driver records only the FIRST 50 query registrations into
CORRECTNESS_r{N}.json (round-1 evidence: exactly the last 3 of 53
registrations were absent). The catalog manages import order so those 50
slots hold 50 distinct operators; this test pins the exact set so an
innocent reordering (or a new registration slipped into an early module)
cannot silently evict a driver-checked query.
"""

from __future__ import annotations

from etl_wrap_spark import catalog

# Rotation schedule: rounds 3-5 exposed DRIVER_CHECKED (below) as the
# driver-visible first-50; round 6 rotated a disjoint window of 50
# previously-unchecked queries to the front (catalog._DRIVER_WINDOW_R6);
# round 7 advances to q104–q153 (catalog._DRIVER_WINDOW_R7) per the
# round-6 verdict's explicit prescription, so driver-side correctness
# evidence accumulates across the catalog (150/215 after r7). Future
# rounds advance the window to the next unchecked block.

# The 50 names recorded by the driver in CORRECTNESS_r03..r05.json, in
# registration order (dict preserves insertion order).
DRIVER_CHECKED = [
    "q01_pricing_summary",
    "q02_lookup_enrichment",
    "q03_revenue_by_nation",
    "q04_topk_orders_per_customer",
    "q05_prev_row_delta",
    "q06_upsert_latest_event",
    "q07_delete_before_insert",
    "q08_union_distinct",
    "q09_semi_anti_join",
    "q10_rollup_priority",
    "q11_events_tumbling_hourly",
    "q12_events_sessionize",
    "q29_asof_join",
    "q30_small_qty_parts",
    "q31_price_band_join",
    "q33_cube_order_stats",
    "q35_price_percentiles",
    "q36_pivot_status_by_year",
    "q37_sql_passthrough",
    "q38_intersect_except",
    "q40_moving_window_frame",
    "q41_price_histogram",
    "q48_sorted_string_agg",
    "q49_regex_extraction",
    "q50_salted_aggregation",
    "q13_business_day_shift",
    "q14_holiday_profile",
    "q15_addmonths_overflow",
    "q16_business_day_series",
    "q17_format_conversions",
    "q18_numeric_coercion",
    "q19_datetime_coercion",
    "q53_german_number_format",
    "q20_text_stats",
    "q21_doc_quality",
    "q22_exact_dedup",
    "q23_minhash_lsh_neardup",
    "q25_simhash",
    "q26_ann_bruteforce",
    "q27_ann_signlsh",
    "q28_multimodal_plumbing",
    "q32_embedding_neardup",
    "q52_rolling_fingerprint",
    "q39_term_stats",
    "q42_corpus_clean",
    "q43_jaccard_df_capped",
    "q44_train_val_test_split",
    "q45_stratified_sample",
    "q46_sequence_packing",
    "q51_pii_redaction",
]


def test_first_50_entries_match_current_rotation_window():
    names = list(catalog.queries())
    assert names[:50] == catalog._DRIVER_WINDOW
    assert len(catalog._DRIVER_WINDOW) == 50
    # Round 8+: the window comes from tools/rotation_spec.json, editable
    # by the harness owner without touching catalog.py (round-7 VERDICT
    # ask #6). The spec must exist and be what the catalog exposes.
    spec = catalog._load_rotation_spec()
    assert spec is not None, "tools/rotation_spec.json missing/invalid"
    assert catalog._DRIVER_WINDOW == [
        *spec["window"], *spec.get("requested", []), *spec["spot_checks"]
    ]


def test_rotation_window_disjoint_from_all_prior_windows():
    # The rotation's new-coverage part (spec 'window') must be disjoint
    # from every prior driver-checked set; 'requested' names (verdict-
    # asked re-checks, round 11+) must come FROM prior sets and are
    # excluded from the seeded pool; the 'spot_checks' must be drawn
    # from that pool via the disclosed seeded procedure, so prior-window
    # regressions become driver-visible each round and the committed
    # list can't be cherry-picked.
    spec = catalog._load_rotation_spec()
    prior = (
        set(DRIVER_CHECKED)
        | set(catalog._DRIVER_WINDOW_R6)
        | set(catalog._DRIVER_WINDOW_R7)
        | set(catalog._DRIVER_WINDOW_R8)
        | set(catalog._DRIVER_WINDOW_R9)
        | set(catalog._DRIVER_WINDOW_R10)
    )
    requested = spec.get("requested", [])
    assert not set(spec["window"]) & prior
    assert set(requested) <= prior
    assert not set(requested) & set(spec["spot_checks"])
    assert set(spec["spot_checks"]) <= prior
    # re-derive the seeded selection — tampering with the committed list
    # (cherry-picking easy queries) fails here
    expected = catalog._seeded_spot_checks(
        sorted(prior - set(requested)),
        spec["spot_check_seed"],
        spec["spot_check_count"],
    )
    assert spec["spot_checks"] == expected
    # prior windows themselves were pairwise disjoint too
    assert not set(catalog._DRIVER_WINDOW_R6) & set(DRIVER_CHECKED)
    assert not set(catalog._DRIVER_WINDOW_R7) & (
        set(DRIVER_CHECKED) | set(catalog._DRIVER_WINDOW_R6)
    )
    assert not set(catalog._DRIVER_WINDOW_R8) & (
        set(DRIVER_CHECKED)
        | set(catalog._DRIVER_WINDOW_R6)
        | set(catalog._DRIVER_WINDOW_R7)
    )
    assert not set(catalog._DRIVER_WINDOW_R9) & (
        set(DRIVER_CHECKED)
        | set(catalog._DRIVER_WINDOW_R6)
        | set(catalog._DRIVER_WINDOW_R7)
        | set(catalog._DRIVER_WINDOW_R8)
    )
    assert not set(catalog._DRIVER_WINDOW_R10) & (
        set(DRIVER_CHECKED)
        | set(catalog._DRIVER_WINDOW_R6)
        | set(catalog._DRIVER_WINDOW_R7)
        | set(catalog._DRIVER_WINDOW_R8)
        | set(catalog._DRIVER_WINDOW_R9)
    )


def test_rotation_is_order_only_permutation():
    # Rotating the driver window must not add, drop, or rename queries.
    names = list(catalog.queries())
    assert len(names) == len(set(names))
    assert set(DRIVER_CHECKED) <= set(names)
    # every rotated-to-front name still has its oracle
    oracles = catalog.oracle_sql()
    for n in catalog._DRIVER_WINDOW:
        assert n in oracles


def test_local_gate_artifact_covers_every_registered_query():
    # Round-5 verdict ask #8: a new registration must not silently skip
    # the full-catalog strict gate. The latest committed
    # CORRECTNESS_LOCAL_r{N}.json must have a PASS row for every
    # registered query — this goes red the moment someone registers a
    # query without regenerating the artifact.
    import glob
    import json
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = glob.glob(os.path.join(repo, "CORRECTNESS_LOCAL_r*.json"))
    assert arts, "full-catalog gate artifact missing"
    latest = max(arts, key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))
    rows = json.load(open(latest))
    registered = set(catalog.queries())
    missing = sorted(registered - set(rows))
    assert not missing, f"queries lacking a gate row in {latest}: {missing}"
    failing = sorted(
        n
        for n in registered
        if not (
            rows[n].get("rows_match")
            and rows[n].get("schema_match")
            and rows[n].get("hash_match", True)
        )
    )
    assert not failing, f"gate rows not green in {latest}: {failing}"


def test_every_query_has_unique_qnn_prefix():
    # bench.py's compact stdout line keys queries by their qNN prefix;
    # a collision would make the driver's BENCH_r{N}.json ambiguous.
    names = list(catalog.queries())
    prefixes = [n.split("_")[0] for n in names]
    assert len(set(prefixes)) == len(names)


def test_oracle_keys_subset_of_queries():
    qs = catalog.queries()
    for name in catalog.oracle_sql():
        assert name in qs


def test_bench_compact_line_fits_driver_tail():
    # BENCH_r02 and BENCH_r04 were recorded parsed:null because the
    # compact stdout line overflowed the driver's 2000-char tail. The
    # emitter now degrades structurally; assert it fits AT THE CURRENT
    # CATALOG SIZE with worst-case-width values (3-digit seconds, full
    # duckdb/ratio sections populated).
    import json

    import bench

    names = list(catalog.queries())
    timings = {n: 999.99 for n in names}
    detail = {
        "metric": "catalog_queries_total_wall_warm",
        "value": round(sum(timings.values()), 3),
        "sf": 0.1,
        "n_queries": len(timings),
        "mean_per_query": 999.99,
        "cold_total": 999999.999,
        "duckdb_total": 99999.999,
        "ratio_summary": {
            "median": 10.85,
            "within_2x": 177,
            "within_5x": 177,
            "spark_faster": 177,
        },
    }
    line = bench.compact_line(detail, timings)
    assert len(line) <= 1900, len(line)
    parsed = json.loads(line)
    assert parsed["metric"] == "catalog_queries_total_wall_warm"
    assert parsed["n_queries"] == len(names)
    # the bounded subset still carries the headline queries
    for h in bench.HEADLINE:
        assert h.split("_")[0] in parsed["queries"]


def test_bench_presentation_sort_strip(spark):
    """strip_presentation_sort removes exactly a root GLOBAL Sort (same
    rows, order-free plan); Limit-rooted top-k and non-global sorts
    survive. strip_oracle_order_by is the symmetric SQL-side rule."""
    import bench
    from pyspark.sql import functions as F

    df = spark.range(100).withColumn("k", F.col("id") % 7)
    sorted_df = df.orderBy("k", "id")
    stripped = bench.strip_presentation_sort(sorted_df)
    assert stripped._jdf.queryExecution().logical().nodeName() != "Sort"
    assert stripped.count() == 100
    assert sorted(tuple(r) for r in stripped.collect()) == sorted(
        tuple(r) for r in sorted_df.collect()
    )
    # top-k compiles to a Limit root — untouched
    topk = df.orderBy("k").limit(5)
    assert bench.strip_presentation_sort(topk) is topk
    # non-global sort — untouched
    swp = df.sortWithinPartitions("k")
    assert bench.strip_presentation_sort(swp) is swp

    assert bench.strip_oracle_order_by(
        "SELECT k, sum(v) AS s FROM t GROUP BY k ORDER BY k, s"
    ) == "SELECT k, sum(v) AS s FROM t GROUP BY k "
    # LIMIT after ORDER BY = top-k semantics: keep
    keep = "SELECT * FROM t ORDER BY v DESC LIMIT 5"
    assert bench.strip_oracle_order_by(keep) == keep
    # top-level ORDER BY with function-call args now strips too (the
    # round-5 ADVICE q121 asymmetry: Spark's root Sort was stripped
    # while the oracle kept its sort)
    assert bench.strip_oracle_order_by(
        "SELECT * FROM t ORDER BY SUM(CAST(v AS BIGINT)) DESC"
    ) == "SELECT * FROM t "
    # window/subquery ORDER BY (inside parens): untouched
    keep3 = "SELECT rank() OVER (ORDER BY v) AS r FROM t"
    assert bench.strip_oracle_order_by(keep3) == keep3
    keep4 = "SELECT * FROM (SELECT v FROM t ORDER BY v LIMIT 3) s"
    assert bench.strip_oracle_order_by(keep4) == keep4
    # ORDER BY text inside a string literal: untouched
    keep5 = "SELECT 'ORDER BY x' AS s FROM t"
    assert bench.strip_oracle_order_by(keep5) == keep5
    # SQL comments must not corrupt the scan (round-6 ADVICE): an
    # unbalanced paren or the words ORDER BY inside `--` / `/* */`
    # comments are ignored, while the real trailing clause still strips
    commented = (
        "SELECT k, sum(v) AS s FROM t -- note ) ORDER BY junk\n"
        "GROUP BY k /* ( ORDER BY more junk */ ORDER BY k"
    )
    assert bench.strip_oracle_order_by(commented) == (
        "SELECT k, sum(v) AS s FROM t -- note ) ORDER BY junk\n"
        "GROUP BY k /* ( ORDER BY more junk */ "
    )
    # comment-only ORDER BY mention: nothing stripped
    keep6 = "SELECT k FROM t -- ORDER BY k\n"
    assert bench.strip_oracle_order_by(keep6) == keep6


def test_cc_closure_oracle_convergence_guard():
    # Round-8 ADVICE: the bounded CC closure must FAIL LOUDLY (not
    # silently under-merge) when a component's diameter exceeds what
    # _CC_ROUNDS propagate/jump alternations cover. The guard runs one
    # extra propagate and error()s if any label would still drop.
    import duckdb
    import pytest

    from etl_wrap_spark.queries_tail import _cc_closure_sql

    closure = _cc_closure_sql()

    def run(n_chain: int):
        sql = f"""
        WITH pairs AS (SELECT i AS id_a, i+1 AS id_b
                       FROM generate_series(0,{n_chain - 1}) t(i)),
        edges AS MATERIALIZED (
          SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs
        ), l0 AS MATERIALIZED (SELECT u AS id, u AS lbl FROM edges GROUP BY u)
        """ + closure + """
        SELECT id AS doc_id, MIN(r) AS component FROM walk GROUP BY id ORDER BY doc_id
        """
        return duckdb.connect().execute(sql).fetchall()

    rows = run(6)  # diameter 6: converges, single component labeled 0
    assert [r[1] for r in rows] == [0] * 7
    with pytest.raises(Exception, match="not converged"):
        run(200)  # diameter 199: the bound is exceeded -> loud error
