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


def test_ivf_assignment_is_map_side(spark, sf_dir):
    # The codebook is inlined as literals, so list assignment must be a
    # per-row expression on the scan side: the corpus may not shuffle (or
    # join) before the probe equi-join on cid. One Exchange per side of
    # that join plus the final window's is the complete budget; a
    # regression back to crossJoin(centroids) → groupBy(vec_id) adds an
    # aggregate exchange over an N_CENTROIDS-amplified corpus.
    plan = plan_of(spark, sf_dir, "ann_ivf_topk")
    assert "array_min" in plan          # map-side argmin assignment
    assert plan.count("HashAggregate") == 0
    # exchanges: probe-side hashpartitioning(cid), assign-side
    # hashpartitioning(cid), window hashpartitioning(query_id), plus the
    # two parallel_table round-robin repartitions of the base scans
    assert plan.count("Exchange") <= 5


def test_dedup_aggregates_partially(spark, sf_dir):
    # w2_w3's max_by/min_by must combine map-side before the exchange
    plan = plan_of(spark, sf_dir, "w2_w3_dedup_variants")
    head = plan.split("Exchange")[-1]   # below the exchange = partial side
    assert "partial_max_by" in head or "partial" in head


# Queries whose plan legitimately contains a BroadcastNestedLoopJoin:
# every one is a broadcast of a tiny/1-row frame (count scalars, query
# vectors, generated dims) — never data×data. Kept as an explicit
# allowlist so a new unconstrained nested-loop join fails the sweep.
_BNLJ_OK = {
    "a6_a7_p11_recent_counts",    # 1-row total joined to 1-row filtered
    "a4_a5_report_stats",         # 1-row grand-total broadcast
    "j3_fill_missing_years",      # generated year dim × 1-row bounds
    "knn_cosine_topk",            # broadcast tiny query-vector set
    "ann_signlsh_topk",           # broadcast query vectors to buckets
    "ann_ivf_topk",               # broadcast centroids + query vectors
    "dd_embedding_cosine",        # broadcast 1-row norm scalars
    "st4_a8_cursor_errors",       # 1-row cursor joined to counters
    "st1_st3_ingest_resume",      # same cursor-row shape
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_scale_killers_anywhere(spark, sf_dir, name):
    """Registry-wide sweep: no unconstrained cartesian join and no
    row-at-a-time Python UDF (BatchEvalPython) in ANY registered query's
    physical plan — the two plan shapes that cannot survive 100 TB.
    Arrow-batched mapInPandas/applyInPandas (MapInPandas/FlatMapGroups...)
    remain allowed: those are the sanctioned source/decode boundaries.
    """
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, f"{name} has a cartesian join"
    assert "BatchEvalPython" not in plan, f"{name} has a row-level Python UDF"
    if "BroadcastNestedLoopJoin" in plan:
        assert name in _BNLJ_OK, (
            f"{name} gained an unreviewed BroadcastNestedLoopJoin"
        )


def test_merge_target_scan_partition_pruned(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "j1_partitioned_merge")
    # reads the already-merged partitioned table; the query itself is an
    # aggregate — the pruning proof for the MERGE lives in
    # test_partitioned_merge.py. Here: partition column present.
    assert "o_year" in plan
