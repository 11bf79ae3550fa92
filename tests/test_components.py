"""min_label_components: fixpoint correctness on graphs whose diameter
far exceeds the old 20-round cap (round-1 advisor finding), log-bounded
round count via pointer jumping, and the r12 tiny-graph local finish
(single-task union-find) — bit-identical to the distributed loop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tmdb_sync_spark.functions.dedup import min_label_components


@pytest.mark.parametrize("local", [True, False])
def test_long_chain_converges_to_exact_components(spark, local):
    # one 300-node path (diameter 299) + one 50-node star + an isolated
    # pair — small enough that local=True exercises the union-find path
    # and local=False the distributed fixpoint, same exact answer.
    chain = [(i, i + 1) for i in range(1000, 1299)]
    star = [(5000, 5000 + k) for k in range(1, 50)]
    pair = [(9000, 9001)]
    edges = spark.createDataFrame(chain + star + pair, "u BIGINT, w BIGINT")

    stats: dict = {}
    labels = min_label_components(edges, stats=stats, local_finish=local)
    got = {r["v"]: r["label"] for r in labels.collect()}

    assert all(got[v] == 1000 for v in range(1000, 1300))
    assert all(got[v] == 5000 for v in [5000] + [5000 + k for k in range(1, 50)])
    assert got[9000] == 9000 and got[9001] == 9000
    assert len(got) == 300 + 50 + 2
    assert stats.get("local_finish", False) is local


def test_rounds_logarithmic_not_linear(spark):
    # a 120-node path: plain min-propagation needs ~119 rounds; with
    # pointer jumping the fixpoint must land well under the old 20 cap.
    # local_finish=False pins the DISTRIBUTED loop (the 100 TB path) —
    # without it this graph would take the union-find shortcut.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], "u BIGINT, w BIGINT"
    )
    labels = min_label_components(edges, max_rounds=15, local_finish=False)
    assert labels.count() == 121
    assert labels.where(F.col("label") != 0).count() == 0


def test_local_finish_matches_loop_exactly(spark):
    """The local union-find and the distributed fixpoint must be
    bit-identical (rows AND schema) on an awkward mixed graph:
    duplicate edges, self-loops, reversed duplicates, unordered ids."""
    raw = (
        [(7, 3), (3, 7), (7, 7), (2, 9), (9, 11), (11, 2), (42, 42)]
        + [(100 + i, 100 + i + 1) for i in range(40)]
        + [(100 + 40, 100)]   # close the cycle
    )
    edges = spark.createDataFrame(raw, "u BIGINT, w BIGINT")
    local = min_label_components(edges, local_finish=True)
    loop = min_label_components(edges, local_finish=False)
    assert local.schema == loop.schema
    assert local.exceptAll(loop).count() == 0
    assert loop.exceptAll(local).count() == 0


def test_local_finish_empty_and_null_edges(spark):
    """Empty edge list → empty labels on both paths; a NULL endpoint
    routes to the loop (whose NULL-as-non-edge semantics are the
    contract) even with local_finish left at its default."""
    empty = spark.createDataFrame([], "u BIGINT, w BIGINT")
    assert min_label_components(empty).count() == 0
    assert min_label_components(empty, local_finish=False).count() == 0

    stats: dict = {}
    nulled = spark.createDataFrame(
        [(1, 2), (None, 5)], "u BIGINT, w BIGINT"
    )
    labels = min_label_components(nulled, stats=stats)
    assert not stats.get("local_finish", False)
    got = {r["v"]: r["label"] for r in labels.collect()}
    # 5 is isolated (its only edge has a NULL endpoint), NULL stays its
    # own NULL-labeled node — the loop semantics the local path defers to
    assert got[1] == 1 and got[2] == 1 and got[5] == 5
    assert None in got and got[None] is None


def test_scaled_dup_bits_holds_occupancy(spark, sf_dir):
    """The r8 occupancy knob: +1 plane per corpus doubling above the
    tuning size, never below the base (small corpora keep full recall),
    capped; and the cluster operator with the DEFAULT knob value is
    bit-identical to the registered query."""
    from tmdb_sync_spark.functions.dedup import (
        cluster_components,
        dd_cluster_components,
    )
    from tmdb_sync_spark.functions.similarity import (
        DUP_BITS_BASE_N,
        N_DUP_BITS,
        scaled_dup_bits,
    )

    assert scaled_dup_bits(DUP_BITS_BASE_N) == N_DUP_BITS
    assert scaled_dup_bits(1) == N_DUP_BITS          # never below base
    assert scaled_dup_bits(DUP_BITS_BASE_N * 4) == N_DUP_BITS + 2
    assert scaled_dup_bits(DUP_BITS_BASE_N * 16) == N_DUP_BITS + 4
    from tmdb_sync_spark.functions.similarity import DIM

    assert scaled_dup_bits(DUP_BITS_BASE_N * 2**100) == DIM  # plane cap

    got = sorted(
        tuple(r) for r in cluster_components(spark, sf_dir).collect()
    )
    want = sorted(
        tuple(r) for r in dd_cluster_components(spark, sf_dir).collect()
    )
    assert got == want


def test_cluster_representatives_keep_policy(spark, sf_dir):
    """dd_cluster_representatives (r12): exactly one elected
    representative per component, and it is the (n_chars desc, doc_id
    asc) argmax among the members that exist in ``documents`` — while
    comp_size still counts the FULL cluster."""
    from tmdb_sync_spark.functions.dedup import (
        dd_cluster_components,
        dd_cluster_representatives,
    )

    reps = dd_cluster_representatives(spark, sf_dir).toPandas()
    assert len(reps) > 0

    per_comp = reps.groupby("component")
    # exactly one is_kept per component, and it's the keep_doc_id
    assert (per_comp["is_kept"].sum() == 1).all()
    for comp, g in per_comp:
        keep = set(g["keep_doc_id"])
        assert len(keep) == 1, f"component {comp}: conflicting keep ids"
        (kid,) = keep
        kept_rows = g[g["is_kept"]]
        assert list(kept_rows["doc_id"]) == [kid]
        # (that kid IS the (n_chars desc, doc_id asc) argmax is pinned
        # exactly by the DuckDB frame parity in test_oracle_parity)
    # comp_size is the pre-join cluster size: must match the registered
    # components query's sizing, not the joined row count
    comp_sizes = {
        r["component"]: r["comp_size"]
        for r in dd_cluster_components(spark, sf_dir)
        .select("component", "comp_size")
        .distinct()
        .collect()
    }
    for comp, g in per_comp:
        assert (g["comp_size"] == comp_sizes[comp]).all()
