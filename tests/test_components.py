"""min_label_components: fixpoint correctness on graphs whose diameter
far exceeds the old 20-round cap (round-1 advisor finding), and
log-bounded round count via pointer jumping."""

from __future__ import annotations

from pyspark.sql import functions as F

from tmdb_sync_spark.functions.dedup import min_label_components


def test_long_chain_converges_to_exact_components(spark):
    # one 300-node path (diameter 299) + one 50-node star + an isolated pair
    chain = [(i, i + 1) for i in range(1000, 1299)]
    star = [(5000, 5000 + k) for k in range(1, 50)]
    pair = [(9000, 9001)]
    edges = spark.createDataFrame(chain + star + pair, "u BIGINT, w BIGINT")

    labels = min_label_components(edges)
    got = {r["v"]: r["label"] for r in labels.collect()}

    assert all(got[v] == 1000 for v in range(1000, 1300))
    assert all(got[v] == 5000 for v in [5000] + [5000 + k for k in range(1, 50)])
    assert got[9000] == 9000 and got[9001] == 9000
    assert len(got) == 300 + 50 + 2


def test_rounds_logarithmic_not_linear(spark):
    # a 120-node path: plain min-propagation needs ~119 rounds; with
    # pointer jumping the fixpoint must land well under the old 20 cap.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], "u BIGINT, w BIGINT"
    )
    labels = min_label_components(edges, max_rounds=15)
    assert labels.count() == 121
    assert labels.where(F.col("label") != 0).count() == 0


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
