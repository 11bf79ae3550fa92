"""Property-based tests for the full-outer-join MERGE engine.

``plans.merge.merge_into`` is the most custom relational logic in the
engine (SURVEY §7 hard-part 1: MERGE without Delta) — hypothesis drives it
with arbitrary key sets and checks the MERGE axioms instead of one
hand-picked delta:

- post-state keys = target keys ∪ source keys (no loss, no invention)
- action classification partitions exactly into source-only = insert,
  intersection = update, target-only = noop
- matched rows take source values for source columns, keep target values
  for target-only columns; inserts NULL-fill target-only columns
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hs

from tmdb_sync_spark.plans.merge import ACTION_COL, merge_into

keysets = hs.lists(hs.integers(min_value=0, max_value=30), max_size=12)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tkeys=keysets, skeys=keysets)
def test_merge_axioms(spark, tkeys, skeys):
    tkeys, skeys = sorted(set(tkeys)), sorted(set(skeys))
    target = spark.createDataFrame(
        [(k, k * 10, f"t{k}") for k in tkeys], "k BIGINT, val BIGINT, town STRING"
    )
    source = spark.createDataFrame(
        [(k, k * 100) for k in skeys], "k BIGINT, val BIGINT"
    )

    post = merge_into(target, source, keys=["k"], with_action=True).collect()

    assert sorted(r["k"] for r in post) == sorted(set(tkeys) | set(skeys))
    by_key = {r["k"]: r for r in post}
    for k, r in by_key.items():
        if k in skeys and k in tkeys:
            assert r[ACTION_COL] == "update"
            assert r["val"] == k * 100      # source wins for source columns
            assert r["town"] == f"t{k}"     # target-only column preserved
        elif k in skeys:
            assert r[ACTION_COL] == "insert"
            assert r["val"] == k * 100
            assert r["town"] is None        # target-only column NULL-filled
        else:
            assert r[ACTION_COL] == "noop"
            assert r["val"] == k * 10
            assert r["town"] == f"t{k}"
