"""Physical-plan property tests: the scale claims in docstrings/README
(pushdown, pruning, broadcast, top-k, no cross joins) asserted on the
actual optimized plans, so a regression that silently changes a plan
shape fails CI — not just a benchmark.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()


def plan_of(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "p1_p3_projection_conjunctive")
    # equality conjunct reaches the parquet scan
    assert "PushedFilters" in plan and "l_returnflag" in plan.split("PushedFilters")[1][:200]
    # scan reads only the needed columns, not the 16-column lineitem
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "l_comment" not in read_schema and "l_suppkey" not in read_schema


def test_semi_join_broadcasts(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "p6_j2_semi_join_ids")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # the fact side must not shuffle for the join
    assert "SortMergeJoin" not in plan


def test_topk_uses_heap_not_global_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "o1_o2_pagination_topk")
    assert "TakeOrderedAndProject" in plan


def test_headline_joins_broadcast_dims(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q5_revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 3   # customer/nation/region
    plan3 = plan_of(spark, sf_dir, "q3_top_orders_by_revenue")
    assert "BroadcastHashJoin" in plan3
    assert "TakeOrderedAndProject" in plan3


@pytest.mark.parametrize(
    "name",
    ["dd_minhash_lsh", "dd_embedding_cosine", "ann_signlsh_topk",
     "pipeline_curation"],
)
def test_candidate_generation_never_cross_joins(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_aggregates_partially(spark, sf_dir):
    # w2_w3's max_by/min_by must combine map-side before the exchange
    plan = plan_of(spark, sf_dir, "w2_w3_dedup_variants")
    head = plan.split("Exchange")[-1]   # below the exchange = partial side
    assert "partial_max_by" in head or "partial" in head


def test_merge_target_scan_partition_pruned(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "j1_partitioned_merge")
    # reads the already-merged partitioned table; the query itself is an
    # aggregate — the pruning proof for the MERGE lives in
    # test_partitioned_merge.py. Here: partition column present.
    assert "o_year" in plan
