"""Contracts for the split / stratified-sample / sequence-packing tail
(tmdb_sync_spark/functions/sampling.py). No DuckDB twins exist
(xxhash64 / imperative FFD), so the contracts are pinned as properties:
partition-of-corpus, layout stability, per-stratum tolerance,
pack-budget bound, exactly-once membership, determinism."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tmdb_sync_spark.functions.sampling import (
    pack_sequences,
    split_corpus,
    split_expr,
    stratified_sample,
)
from tmdb_sync_spark.functions.text import tokens_expr
from tmdb_sync_spark.io import table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return table(spark, sf_dir, "documents").cache()


def test_split_is_a_partition_of_the_corpus(spark, docs):
    """Every row gets exactly one label from the weight map; counts sum
    to the corpus."""
    out = split_corpus(docs, weights={"train": 0.8, "val": 0.1,
                                      "test": 0.1}, seed=7)
    by = dict(
        out.groupBy("split").count().collect()
        and {r["split"]: r["count"]
             for r in out.groupBy("split").count().collect()}
    )
    assert set(by) <= {"train", "val", "test"}
    assert sum(by.values()) == docs.count()
    # at 500 docs an 80/10/10 split must land near 400/50/50; the hash
    # is uniform so 5-sigma bounds are generous
    assert 320 <= by["train"] <= 460
    assert 20 <= by.get("val", 0) <= 90
    assert 20 <= by.get("test", 0) <= 90


def test_split_fractions_converge_at_larger_sf(spark):
    """On the 5k-doc sf0.1 corpus the 98/1/1 default lands within ±40%
    of the expected val/test sizes — the tolerance sampling noise
    allows (sf0.01's 500 docs put 5-sigma past ±100%)."""
    docs = table(spark, "/root/testdata/sf0.1", "documents")
    n = docs.count()
    out = split_corpus(docs)
    by = {r["split"]: r["count"]
          for r in out.groupBy("split").count().collect()}
    assert sum(by.values()) == n
    for small in ("val", "test"):
        assert 0.006 * n <= by.get(small, 0) <= 0.014 * n


def test_split_stable_under_repartition_and_rerun(spark, docs):
    """The label is a pure function of (key, weights, seed): any layout,
    any run, same assignment — the property rand()-based splits lack."""
    w = {"train": 0.9, "heldout": 0.1}
    a = split_corpus(docs, weights=w, seed=3).select("doc_id", "split")
    b = (
        split_corpus(docs.repartition(17, "lang"), weights=w, seed=3)
        .select("doc_id", "split")
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_split_seed_moves_members_weights_unnormalized(spark, docs):
    """Different seed ⇒ different membership (not a constant labeling);
    unnormalized weights normalize (2/1/1 == 0.5/0.25/0.25)."""
    a = split_corpus(docs, weights={"x": 2, "y": 1, "z": 1}, seed=1)
    b = split_corpus(docs, weights={"x": 2, "y": 1, "z": 1}, seed=2)
    moved = (
        a.alias("a").join(b.alias("b"), "doc_id")
        .where(F.col("a.split") != F.col("b.split")).count()
    )
    assert moved > 0
    x = a.where(F.col("split") == "x").count()
    assert 200 <= x <= 300  # ~250 of 500


def test_split_expr_validation():
    with pytest.raises(ValueError):
        split_expr(F.col("doc_id"), {})
    with pytest.raises(ValueError):
        split_expr(F.col("doc_id"), {"a": 0.0})
    with pytest.raises(ValueError):
        split_expr(F.col("doc_id"), {"a": 0.9, "b": -0.1, "c": 0.2})


def test_stratified_sample_per_stratum_tolerance(spark):
    """Per-stratum keep fractions hold within 5-sigma; absent strata
    drop to zero (the conservative unlisted-language rule)."""
    docs = table(spark, "/root/testdata/sf0.01", "documents")
    langs = {r["lang"]: r["count"]
             for r in docs.groupBy("lang").count().collect()}
    frac = {"en": 0.5, "de": 0.1}
    out = stratified_sample(docs, "lang", frac, seed=11)
    got = {r["lang"]: r["count"]
           for r in out.groupBy("lang").count().collect()}
    for lang, f in frac.items():
        n = langs[lang]
        mean, sig = f * n, (f * (1 - f) * n) ** 0.5
        assert abs(got.get(lang, 0) - mean) <= 5 * sig + 1, (lang, got)
    for lang in set(langs) - set(frac):
        assert lang not in got


def test_stratified_sample_is_deterministic_subset(spark, docs):
    out1 = stratified_sample(docs, "lang", 0.3, seed=5)
    out2 = stratified_sample(docs.repartition(13), "lang", 0.3, seed=5)
    assert out1.exceptAll(out2).count() == 0
    assert out2.exceptAll(out1).count() == 0
    # subset: every sampled doc_id is a corpus doc_id (and scalar
    # fraction applies to all strata)
    assert out1.join(docs, "doc_id", "left_anti").count() == 0


def test_pack_budget_and_exactly_once(spark, docs):
    """Every pack ≤ max_tokens unless flagged oversize; every doc packed
    exactly once with its own token count carried through."""
    with_tokens = docs.select(
        "doc_id", F.size(tokens_expr(F.col("text"))).alias("n_tokens")
    )
    packed = pack_sequences(with_tokens, max_tokens=256, seed=1).cache()
    n = docs.count()
    assert packed.count() == n
    assert packed.select("doc_id").distinct().count() == n
    over_budget = packed.where(
        (F.col("pack_tokens") > 256) & ~F.col("oversize")
    )
    assert over_budget.count() == 0
    # oversize ⇔ the doc alone exceeds the budget
    assert (
        packed.where(F.col("oversize") != (F.col("n_tokens") > 256))
        .count() == 0
    )
    # pack_tokens is consistent: grouping by pack_id re-derives it
    bad = (
        packed.groupBy("pack_id", "pack_tokens")
        .agg(F.sum("n_tokens").alias("s"))
        .where(F.col("s") != F.col("pack_tokens"))
    )
    assert bad.count() == 0
    packed.unpersist()


def test_pack_efficiency_and_layout_stability(spark, docs):
    """FFD on this corpus fills packs reasonably (≥60% mean occupancy
    of non-trailing packs is a loose floor), and the packing is a pure
    function of the doc SET: repartitioning the input changes nothing."""
    with_tokens = docs.select(
        "doc_id", F.size(tokens_expr(F.col("text"))).alias("n_tokens")
    )
    a = pack_sequences(with_tokens, max_tokens=200, n_buckets=4, seed=2)
    b = pack_sequences(
        with_tokens.repartition(19), max_tokens=200, n_buckets=4, seed=2
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    packs = (
        a.where(~F.col("oversize"))
        .groupBy("bucket", "pack_id")
        .agg(F.max("pack_tokens").alias("t"))
    )
    # drop each bucket's single worst pack (the trailing remainder FFD
    # legitimately leaves open), then bound mean occupancy
    from pyspark.sql import Window
    w = Window.partitionBy("bucket").orderBy(F.col("t").asc())
    trimmed = packs.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") > 1
    )
    mean_occ = trimmed.agg(F.avg(F.col("t") / 200.0)).collect()[0][0]
    assert mean_occ is not None and mean_occ >= 0.6, mean_occ


def test_pack_rejects_corrupt_token_counts(spark):
    from pyspark.sql import Row
    from py4j.protocol import Py4JJavaError

    df = spark.createDataFrame(
        [Row(doc_id=1, n_tokens=10), Row(doc_id=2, n_tokens=-3)]
    )
    with pytest.raises(Exception) as ei:
        pack_sequences(df, max_tokens=100, n_buckets=1).collect()
    assert "fix token counts upstream" in str(ei.value)


def test_null_keys_deterministic(spark):
    """NULL keys collapse to ONE deterministic bucket (xxhash64 skips
    null args): all-NULL-key rows share a single split label, and a
    NULL stratum never matches a fraction-map entry (dropped — the
    same conservative rule as an unlisted stratum)."""
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )
    rows = [(None, "en")] * 20 + [(1, None)]
    df = spark.createDataFrame(
        rows,
        StructType([
            StructField("doc_id", LongType()),
            StructField("lang", StringType()),
        ]),
    )
    labels = (
        split_corpus(df.where(F.col("doc_id").isNull()), seed=4)
        .select("split").distinct().collect()
    )
    assert len(labels) == 1
    kept = stratified_sample(df, "lang", {"en": 1.0}, seed=4)
    assert kept.where(F.col("lang").isNull()).count() == 0


def test_ffd_kernel_properties_hypothesis():
    """Hammer the pure FFD kernel: exactly-once assignment, budget
    bound, totals consistency, oversize iff item > budget, and the
    FFD guarantee that no two packs could merge (any two non-oversize
    pack totals exceed the budget — otherwise first-fit would have
    placed the later pack's opener into the earlier pack, since
    longest-first means the opener is its pack's largest item)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        sizes=st.lists(st.integers(min_value=0, max_value=700),
                       min_size=0, max_size=80),
        budget=st.integers(min_value=1, max_value=512),
    )
    def check(sizes, budget):
        from tmdb_sync_spark.functions.sampling import ffd_pack

        ordered = sorted(sizes, reverse=True)  # the caller's FFD order
        assign, totals, oversize = ffd_pack(ordered, budget)
        assert len(assign) == len(ordered) == len(oversize)
        per_pack: dict[int, int] = {}
        for n, a, ov in zip(ordered, assign, oversize):
            per_pack[a] = per_pack.get(a, 0) + n
            assert ov == (n > budget)
        for a, s in per_pack.items():
            assert s == totals[a]
            if not (len([1 for i, x in enumerate(assign)
                         if x == a and oversize[i]])):
                assert s <= budget
        # mergeability: under longest-first feeding, any two finished
        # non-oversize packs sum past the budget
        closed = [totals[a] for a in set(assign)
                  if not any(oversize[i] for i, x in enumerate(assign)
                             if x == a)]
        closed.sort()
        if len(closed) >= 2:
            assert closed[0] + closed[1] > budget or closed[0] == 0

    check()


def test_plan_shapes(spark, docs):
    """The scale contracts as plan assertions: split adds NO exchange
    (pure projection), the stratified-sample predicate reaches the
    scan's data filters, and the pack plan contains exactly ONE
    exchange (the bucket shuffle)."""
    split_plan = (
        split_corpus(docs, seed=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in split_plan

    # the sample is one filter over one scan — no exchange, the hash
    # predicate right on top (in a cache-free session it lands in the
    # scan's DataFilters too, but the fixture cache substitutes the
    # relation, so assert the cache-insensitive shape)
    samp_plan = (
        stratified_sample(docs, "lang", {"en": 0.5}, seed=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in samp_plan
    filt = [l for l in samp_plan.splitlines() if "Filter" in l]
    assert filt and "xxhash64" in filt[0]

    with_tokens = docs.select(
        "doc_id", F.size(tokens_expr(F.col("text"))).alias("n_tokens")
    )
    pack_plan = (
        pack_sequences(with_tokens, max_tokens=256, n_buckets=4, seed=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert pack_plan.count("Exchange") == 1


def test_curation_to_trainer_handoff(spark, sf_dir):
    """The end-to-end intended composition: curated corpus → split →
    pack the train split. Every curated train doc is packed exactly
    once with its curation-time token count; no dropped/filtered doc
    sneaks back in."""
    from tmdb_sync_spark.functions.pipeline import curated_corpus

    kept = curated_corpus(spark, sf_dir).cache()
    n_kept = kept.count()
    assert n_kept > 0
    train = split_corpus(kept, weights={"train": 0.9, "val": 0.1},
                         seed=21).where(F.col("split") == "train")
    packed = pack_sequences(
        train.select("doc_id", F.col("ntok").alias("n_tokens")),
        max_tokens=256, n_buckets=2, seed=21,
    ).cache()
    n_train = train.count()
    assert packed.count() == n_train
    assert packed.select("doc_id").distinct().count() == n_train
    # packed ⊆ kept: anti-join against the curated set is empty
    assert packed.join(kept, "doc_id", "left_anti").count() == 0
    # token counts survived the handoff unchanged
    drift = packed.join(kept, "doc_id").where(
        F.col("n_tokens") != F.col("ntok")
    )
    assert drift.count() == 0
    packed.unpersist()
    kept.unpersist()


def test_split_then_pack_composes(spark, docs):
    """The intended composition: split, then pack only the train split —
    one plan, the split filter lands before the pack shuffle."""
    with_tokens = split_corpus(docs, seed=9).where(
        F.col("split") == "train"
    ).select(
        "doc_id", F.size(tokens_expr(F.col("text"))).alias("n_tokens")
    )
    packed = pack_sequences(with_tokens, max_tokens=512, n_buckets=2,
                            seed=9)
    assert packed.count() == with_tokens.count()


def test_cap_per_group_exact_and_layout_independent(spark):
    """Per-domain quota: kept set == the naive single-window answer,
    and identical under adversarial input layouts (the phase-1 salt is
    layout-dependent; the RESULT must not be)."""
    from pyspark.sql import Window

    from tmdb_sync_spark.functions.sampling import cap_per_group

    rows = [
        (i, f"dom{i % 7}", float((i * 37) % 100)) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, domain string, q double")

    got = cap_per_group(df, "domain", "q", 5)
    w = Window.partitionBy("domain").orderBy(
        F.desc("q"), F.asc("doc_id")
    )
    want = (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 5).drop("_rn")
    )
    assert sorted(r["doc_id"] for r in got.collect()) == \
        sorted(r["doc_id"] for r in want.collect())
    # every domain capped
    per = got.groupBy("domain").count().collect()
    assert all(r["count"] == 5 for r in per)

    relaid = cap_per_group(
        df.repartition(13).orderBy(F.desc("doc_id")), "domain", "q", 5
    )
    assert sorted(r["doc_id"] for r in relaid.collect()) == \
        sorted(r["doc_id"] for r in got.collect())


def test_cap_per_group_small_groups_ride_whole(spark):
    from tmdb_sync_spark.functions.sampling import cap_per_group

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 9.0)],
        "doc_id long, domain string, q double",
    )
    got = cap_per_group(df, "domain", "q", 10)
    assert got.count() == 3
    import pytest

    with pytest.raises(ValueError, match="positive"):
        cap_per_group(df, "domain", "q", 0)


def test_cap_per_group_ascending_keeps_worst_first(spark):
    """descending=False: keep the k LOWEST (e.g. cap by perplexity)."""
    from tmdb_sync_spark.functions.sampling import cap_per_group

    df = spark.createDataFrame(
        [(i, "d", float(i)) for i in range(10)],
        "doc_id long, domain string, ppl double",
    )
    got = cap_per_group(df, "domain", "ppl", 3, descending=False)
    assert sorted(r["doc_id"] for r in got.collect()) == [0, 1, 2]


def test_pack_null_doc_id_fails_loudly(spark):
    """A NULL doc id used to surface as a pandas IntCastingNaNError
    buried in the Arrow kernel stack; the contract failure must name
    itself (found by this round's NULL-probe of the kernel)."""
    import pytest

    from tmdb_sync_spark.functions.sampling import pack_sequences

    df = spark.createDataFrame(
        [(1, 10), (None, 20), (3, 30)], "doc_id long, n_tokens long"
    )
    with pytest.raises(Exception, match="NULL doc_id"):
        pack_sequences(df, 64, n_buckets=2).collect()


def test_materialize_packs_roundtrip(spark, docs):
    """The pack text splits back into exactly its members, in FFD
    insertion order; every doc's text appears exactly once corpus-wide;
    the separator tokenizes as one token so materialized token counts
    are Σ members + (n_docs − 1)."""
    from tmdb_sync_spark.functions.sampling import (
        EOD_SEP,
        materialize_packs,
    )

    base = docs.where(F.col("text").isNotNull())
    with_tokens = base.select(
        "doc_id", F.size(tokens_expr(F.col("text"))).alias("n_tokens")
    )
    packed = pack_sequences(with_tokens, max_tokens=256, seed=1)
    packs = materialize_packs(base, packed).cache()
    try:
        tok_by_id = {
            r["doc_id"]: (r["n_tokens"], r["text"])
            for r in base.select(
                "doc_id", F.size(tokens_expr(F.col("text")))
                .alias("n_tokens"), "text",
            ).collect()
        }
        seen: list = []
        for p in packs.collect():
            members = p["text"].split(f"\n{EOD_SEP}\n")
            assert len(members) == p["n_docs"] == len(p["doc_ids"])
            # member texts match their ids, in (tokens desc, id) order
            assert members == [tok_by_id[i][1] for i in p["doc_ids"]]
            order = [(-tok_by_id[i][0], i) for i in p["doc_ids"]]
            assert order == sorted(order)
            assert p["pack_tokens"] == sum(
                tok_by_id[i][0] for i in p["doc_ids"]
            )
            seen += list(p["doc_ids"])
        assert sorted(seen) == sorted(tok_by_id)
        # the separator is one whitespace token: materialized text
        # tokenizes to pack_tokens + (n_docs - 1)
        mat = packs.select(
            "pack_id",
            (F.size(tokens_expr(F.col("text")))
             - (F.col("n_docs") - 1)).alias("t"),
            "pack_tokens",
        ).where(F.col("t") != F.col("pack_tokens"))
        assert mat.count() == 0
    finally:
        packs.unpersist()


def test_materialize_packs_single_shuffle_after_join(spark, docs):
    """Plan shape: one join on the doc key + one aggregate exchange on
    pack_id — no window, no extra sort exchange."""
    from tmdb_sync_spark.functions.sampling import materialize_packs

    with_tokens = docs.select(
        "doc_id", F.size(tokens_expr(F.col("text"))).alias("n_tokens")
    )
    packed = pack_sequences(with_tokens, max_tokens=256, n_buckets=4)
    plan = materialize_packs(docs, packed)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Window" not in plan
