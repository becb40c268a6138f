"""Physical-plan CONTRACTS: the broadcast/pushdown/shuffle decisions
PLANS.md documents, pinned as assertions so a regression (a lost
broadcast hint, a filter that stops reaching the scan, an accidental
cartesian) fails CI instead of silently shipping a 100 TB foot-gun.

Plans are inspected at sf0.001 via explain strings — the assertions
target STRUCTURE (node kinds), never timings.
"""

from __future__ import annotations

import pytest

from etl_wrap_spark.catalog import queries

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name",
    [
        "q03_revenue_by_nation",     # dim chain must broadcast
        "q115_nation_market_share",  # year-total broadcast hint
        "q126_potential_promotion",  # HAVING key-set broadcast hint
        "q121_local_supplier_volume",
    ],
)
def test_no_sort_merge_join(spark, name):
    plan = _plan(spark, name)
    assert "SortMergeJoin" not in plan, f"{name} lost a broadcast decision"
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


@pytest.mark.parametrize(
    "name",
    ["q119_shipping_priority", "q122_forecast_revenue", "q124_lateship_priority_pivot"],
)
def test_filters_reach_the_scan(spark, name):
    """Date/segment predicates must appear as scan-level DataFilters —
    at 100 TB this is the difference between reading a partition and
    reading the lake."""
    plan = _plan(spark, name)
    assert "DataFilters: []" not in plan.split("FileScan")[1][:800], name
    assert "PushedFilters: []" not in plan.split("FileScan")[1][:1200], name


def test_unpivot_is_map_only_before_agg(spark):
    """q133's Expand must not introduce a pre-aggregation shuffle: one
    exchange for the final aggregation (plus the presentation sort)."""
    plan = _plan(spark, "q133_unpivot_measures")
    assert "Expand" in plan
    assert "CartesianProduct" not in plan
    # scan -> expand -> partial agg all inside one stage: the only
    # exchanges are the agg's hash exchange and the orderBy's range
    assert plan.count("Exchange hashpartitioning") <= 1


def test_no_cartesian_anywhere_in_tpch(spark):
    """None of the 22 TPC-H shapes may degrade to a cartesian product."""
    tpch = [
        n for n in queries()
        if n.split("_")[0] in {
            "q01", "q119", "q120", "q121", "q122", "q123", "q124", "q125",
            "q126", "q109", "q110", "q111", "q115", "q116",
        }
    ]
    for name in tpch:
        assert "CartesianProduct" not in _plan(spark, name), name


@pytest.mark.parametrize(
    "name,max_shuffles",
    [
        ("q157_bfs_hops", 2),       # frontier/visited pinned per round
        ("q158_kcore_peel", 3),     # survivor edges pinned per round
        ("q156_triangle_counts", 8),  # und + oriented pinned once
    ],
)
def test_iterative_graph_plans_stay_flat(spark, name, max_shuffles):
    """The iterative graph operators pin reused frames with
    localCheckpoint; without it, lineage multiplies per round (measured
    round 4: 250 in-plan shuffles for the 3-round peel, 77 rescans for
    3-hop BFS). A regression here means someone dropped a checkpoint."""
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, name
    n = plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
    assert n <= max_shuffles, f"{name}: {n} shuffles — lineage unpinned?"
