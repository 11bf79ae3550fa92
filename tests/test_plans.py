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


def test_customer_broadcast_is_size_gated(spark, sf_dir, monkeypatch):
    """The customer-side hints go through io.broadcast_if_dim: customer
    SCALES with SF (unlike nation/region's fixed 25/5 rows), so an
    unconditional hint is a driver-OOM at lake scale. With the gate
    forced shut the hint must disappear from the analyzed plan (the join
    is left to Catalyst/AQE) and the results must be unchanged."""
    from tmdb_sync_spark import io as io_mod

    def hinted(df):
        # count UnresolvedHint/ResolvedHint nodes in the ANALYZED plan —
        # pre-AQE, so runtime broadcast conversions don't mask the gate
        return df._jdf.queryExecution().analyzed().toString().count(
            "broadcast"
        )

    open_gate = QUERIES["q5_revenue_by_nation"](spark, sf_dir)
    n_open = hinted(open_gate)
    monkeypatch.setattr(io_mod, "DIM_BROADCAST_MAX_BYTES", 0)
    shut_gate = QUERIES["q5_revenue_by_nation"](spark, sf_dir)
    # exactly one hint (customer's) is gated; nation/region stay hinted
    assert hinted(shut_gate) == n_open - 1 >= 1
    assert sorted(map(tuple, shut_gate.collect())) == sorted(
        map(tuple, open_gate.collect())
    )


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
    # Centroid assignment is the broadcast-closure Arrow scorer: a
    # vectorized (never row-level) Python projection on the scan side —
    # the corpus may not shuffle (or join) before the probe equi-join on
    # cid. Asserted by SHAPE, not an exchange-count budget (ADVICE r4: a
    # total count ties the test to the exact physical plan of the current
    # Spark/AQE version): the regression this guards —
    # crossJoin(centroids) → groupBy(vec_id) — reintroduces an aggregate
    # over an N_CENTROIDS-amplified corpus, and this query contains no
    # aggregate at all when assignment is map-side.
    plan = plan_of(spark, sf_dir, "ann_ivf_topk")
    assert "ArrowEvalPython" in plan       # vectorized scorer
    assert "BatchEvalPython" not in plan   # never row-at-a-time Python
    assert plan.count("HashAggregate") == 0
    assert "CartesianProduct" not in plan


def test_ivf_scorer_matches_inline_literal_reference(spark, sf_dir):
    """Ordering contract of the Arrow scorer: numpy stable argsort over
    cid-ordered centroids must rank by (L2², cid) exactly like a JVM
    array_min/array_sort over struct(d, cid) with the codebook inlined
    as literals (the r4 implementation this replaced, measured slower in
    an in-session A/B — see _codebook_topn). Rebuild that reference form
    here and require identical end-to-end results."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tmdb_sync_spark.functions import similarity as sim

    # same trained codebook the operator uses — the contract under test
    # is the scorer's ORDERING, which must hold for any codebook
    cents = sim._train_codebook(spark, sf_dir)
    qd = sim._quantized(spark, sf_dir).where(F.col("nrm") > 0)
    dists = F.array(
        *[
            F.struct(
                (
                    F.col("nrm") + F.lit(int(c.nrm))
                    - 2 * sim._dot(
                        F.col("v"), F.array(*[F.lit(int(x)) for x in c.v])
                    )
                ).alias("d"),
                F.lit(int(c.vec_id)).cast("long").alias("cid"),
            )
            for c in cents
        ]
    )
    assign = qd.select(
        "vec_id", "v", "nrm", F.array_min(dists).getField("cid").alias("cid")
    )
    probes = (
        qd.where(F.col("vec_id") % 50 == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qnrm"),
            F.slice(F.array_sort(dists), 1, sim.N_PROBE)
            .getField("cid").alias("cids"),
        )
        .select("query_id", "qv", "qnrm", F.explode("cids").alias("cid"))
    )
    s = sim._dot(F.col("qv"), F.col("v")) / (
        F.sqrt(F.col("qnrm")) * F.sqrt(F.col("nrm"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    reference = (
        probes.join(assign, "cid")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            s.alias("cosine_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= sim.IVF_TOP_K)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )
    got = sorted(map(tuple, sim.ann_ivf_topk(spark, sf_dir).collect()))
    assert got == sorted(map(tuple, reference.collect()))


def test_dedup_aggregates_shuffle_first(spark, sf_dir):
    # w2_w3 (r12): struct max_by/min_by plans as SortAggregate, and on
    # the near-unique (l_orderkey, l_partkey) key partial aggregation
    # reduces nothing — it only added a serial map-side sort. The shape
    # to pin: ONE exchange, hash-partitioned on the exact group keys,
    # with NO aggregate (hence no map-side sort) below it.
    plan = plan_of(spark, sf_dir, "w2_w3_dedup_variants")
    tree = plan.split("\n\n")[0]          # the indented operator tree
    ex_lines = [l for l in tree.splitlines() if "Exchange" in l]
    assert len(ex_lines) == 1
    # the exchange hash-partitions on the exact group keys
    ex_arg = [l for l in plan.splitlines() if "hashpartitioning" in l]
    assert ex_arg and "l_orderkey" in ex_arg[0] and "l_partkey" in ex_arg[0]
    # map side below the exchange is the bare scan: no partial
    # SortAggregate and no Sort before the shuffle
    below_ex = tree[tree.index("Exchange"):]
    assert "SortAggregate" not in below_ex
    assert "Sort " not in below_ex


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


def test_tiled_branch_repartition_survives_aqe(spark, sf_dir):
    """The skew guard's tiled branch must keep its explicit-count
    exchanges: AQE's byte-based coalescing folded the tiles into one
    partition in the first draft, recreating the straggler (measured
    44 s tiled vs 25 s naive). REPARTITION_BY_NUM is the shape AQE never
    coalesces — pin that it's what the plan contains, and that the pair
    work actually lands on >1 partition."""
    from pyspark.sql import functions as F

    from tmdb_sync_spark.functions.pairs import tiled_self_pairs
    from tmdb_sync_spark.functions.similarity import N_DUP_BITS, _bucketed

    b = _bucketed(spark, sf_dir, N_DUP_BITS)
    # tiny cap → every bucket is "hot" → the tiled branch engages
    tiled = tiled_self_pairs(b, "bucket", "vec_id", cap=8)
    plan = tiled._jdf.queryExecution().executedPlan().toString()
    assert plan.count("REPARTITION_BY_NUM") >= 2, plan[:2000]
    dist = (
        tiled.groupBy(F.spark_partition_id().alias("p")).count().collect()
    )
    assert len(dist) > 1, "tiles collapsed onto one partition"


def test_merge_guard_filter_survives_every_consumer_shape(spark):
    """The duplicate-source-key guard is a Filter above the merge join;
    its enforcement depends on the optimizer NEVER eliminating it. Pin
    that `raise_error` survives into the OPTIMIZED plan for the three
    consumer shapes that matter — full materialization, single-column
    projection, and the all-columns-pruned `.count()` — so a Spark
    upgrade whose BooleanSimplification/PruneFilters behavior changes
    fails here instead of silently waiving the contract."""
    from tmdb_sync_spark.plans.merge import merge_into

    target = spark.createDataFrame([(1, "a", "c")],
                                   "id INT, v STRING, curated STRING")
    source = spark.createDataFrame([(1, "b")], "id INT, v STRING")
    merged = merge_into(target, source, ["id"])
    for df in (merged, merged.select("curated"),
               merged.groupBy().count()):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "raise_error" in plan, plan[:2000]


def test_new_trainer_ops_plan_shapes(spark, sf_dir):
    """Round-7 tail operators keep the declared scale shapes: the
    token mixer is a union of pure filtered scans (no Exchange, no
    cartesian); profile_estimates is a pure projection over state (no
    Exchange); both leakage audits generate candidates through the
    bucketed equi-join (never a cartesian)."""
    from pyspark.sql import functions as F

    from tmdb_sync_spark.functions.export import mix_sources_by_tokens
    from tmdb_sync_spark.functions.leakage import (
        embedding_split_leakage,
        split_leakage_audit,
    )
    from tmdb_sync_spark.functions.sampling import split_corpus
    from tmdb_sync_spark.functions.stats import (
        profile_drop_state,
        profile_estimates,
    )
    from tmdb_sync_spark.io import table

    def _plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.col("n_chars").alias("n_tokens")
    )
    mixed, _ = mix_sources_by_tokens(
        {"a": (toks, 1.0),
         "b": (toks.where(F.col("doc_id") < 50), 1.0)}, 2000,
    )
    p = _plan(mixed)
    assert "Exchange" not in p and "CartesianProduct" not in p

    state = profile_drop_state(docs, ("source", "lang"))
    # estimates add NO exchange beyond the state build's own two
    n_state = _plan(state).count("Exchange")
    n_est = _plan(profile_estimates(state, ("source", "lang"))).count(
        "Exchange"
    )
    assert n_est == n_state

    for frame in (
        split_leakage_audit(
            split_corpus(docs.select("doc_id", "text")),
            split_col="split", min_equal=4,
        ),
        embedding_split_leakage(
            split_corpus(
                table(spark, sf_dir, "embeddings"), key="vec_id"
            )
        ),
    ):
        p = _plan(frame)
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p


def test_r8_registry_rotation_plan_shapes(spark, sf_dir):
    """The four rotated-in registry queries keep their declared scale
    shapes on the physical plan:

    - chunk_documents: zero KEY exchange — the only Exchange allowed
      is parallel_table's RoundRobin scan-spread (deliberate: a staged
      parquet read-back coalesces to few splits); the operator itself
      is a pure per-row flatMap — also pinned in test_chunking over a
      plain table();
    - export_shard_layout: exactly ONE exchange, and it is the RANGE
      partitioning on shard (one writer task per shard value — hash
      would collide ~1/e of shards into straggler tasks);
    - corpus_report: ONE shuffle (Expand feeds a partial aggregate;
      the exchange moves sketch state, never rows);
    - repetition_stats: every aggregate is partial-then-final (map-side
      combine before each exchange), and no join in the assembly is a
      cartesian/BNLJ.
    """
    def key_exchanges(p: str) -> int:
        # exchanges that SHUFFLE ON DATA (hash/range) — RoundRobin is
        # parallel_table's scan-spread, not a data shuffle
        return p.count("Exchange hashpartitioning") + p.count(
            "Exchange rangepartitioning"
        )

    for name, want in (
        ("chunk_documents", dict(exchanges=0)),
        ("export_shard_layout", dict(exchanges=1, range_exchange=True)),
        ("corpus_report", dict(exchanges=1)),
    ):
        p = plan_of(spark, sf_dir, name)
        n = key_exchanges(p)
        assert n == want["exchanges"], f"{name}: {n} key exchanges\n{p}"
        if want.get("range_exchange"):
            assert "Exchange rangepartitioning" in p, name

    p = plan_of(spark, sf_dir, "repetition_stats")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # partial aggregation: HashAggregate pairs around each exchange —
    # a final-only aggregate would ship raw exploded rows
    assert p.count("HashAggregate") >= 2 * p.count(
        "Exchange hashpartitioning"
    )
