"""Sharded training export + source mixing contracts
(functions/export.py).

No SQL oracle exists for file layout / xxhash64, so the contracts are
pinned directly: exactly-once membership, deterministic within-shard
order, one data file per shard, manifest-vs-data agreement, atomic
publish, and mix proportion/determinism bounds — the same treatment as
tests/test_sampling.py.
"""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from tmdb_sync_spark.functions.export import (
    MANIFEST_NAME,
    export_training_shards,
    mix_sources,
    order_expr,
    read_manifest,
    shard_expr,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from tmdb_sync_spark.io import table

    return table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )


def _data_files(shard_dir: str) -> list[str]:
    return [
        f for f in os.listdir(shard_dir)
        if not f.startswith(("_", ".")) and not f.endswith(".crc")
    ]


def test_export_exactly_once_ordered_one_file_per_shard(
    spark, docs, tmp_path
):
    out = str(tmp_path / "export_v1")
    n = 8
    m = export_training_shards(
        docs, out, n, seed=7, keep_order_col="rank"
    )

    # manifest agrees with itself and with the input
    n_in = docs.count()
    assert m["total_rows"] == n_in
    assert sum(s["rows"] for s in m["shards"].values()) == n_in
    assert read_manifest(out) == m

    back = spark.read.parquet(out)
    # exactly-once membership, shard assignment = the pure expression
    got = {
        (r["doc_id"], r["shard"])
        for r in back.select("doc_id", "shard").collect()
    }
    want = {
        (r["doc_id"], r["s"])
        for r in docs.select(
            "doc_id", shard_expr(F.col("doc_id"), n, 7).alias("s")
        ).collect()
    }
    assert got == want

    # one data file per non-empty shard; rows inside are rank-ascending
    for i in range(n):
        sd = os.path.join(out, f"shard={i}")
        if not os.path.isdir(sd):
            assert m["shards"][str(i)]["rows"] == 0
            continue
        files = _data_files(sd)
        assert len(files) == 1, f"shard {i}: {files}"
        ranks = [
            r["rank"]
            for r in spark.read.parquet(sd).select("rank").collect()
        ]
        # parquet preserves write order within a file
        assert ranks == sorted(ranks)
        assert len(ranks) == m["shards"][str(i)]["rows"]


def test_export_order_is_layout_independent(spark, docs, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    export_training_shards(docs, a, 4, seed=3, keep_order_col="rank")
    export_training_shards(
        docs.repartition(17).orderBy(F.desc("doc_id")), b, 4, seed=3,
        keep_order_col="rank",
    )
    for i in range(4):
        da, db = f"{a}/shard={i}", f"{b}/shard={i}"
        assert os.path.isdir(da) == os.path.isdir(db)
        if not os.path.isdir(da):
            continue
        ra = [r["doc_id"] for r in spark.read.parquet(da).collect()]
        rb = [r["doc_id"] for r in spark.read.parquet(db).collect()]
        assert ra == rb


def test_export_seed_changes_order_not_membership_count(
    spark, docs, tmp_path
):
    a = str(tmp_path / "s0")
    b = str(tmp_path / "s1")
    export_training_shards(docs, a, 4, seed=0, keep_order_col="rank")
    export_training_shards(docs, b, 4, seed=1, keep_order_col="rank")
    ids_a = sorted(
        r["doc_id"] for r in spark.read.parquet(a).collect()
    )
    ids_b = sorted(
        r["doc_id"] for r in spark.read.parquet(b).collect()
    )
    assert ids_a == ids_b                     # same corpus
    seq_a = [
        r["doc_id"]
        for r in spark.read.parquet(f"{a}/shard=0").collect()
    ]
    seq_b = [
        r["doc_id"]
        for r in spark.read.parquet(f"{b}/shard=0").collect()
    ]
    assert seq_a != seq_b                     # a new epoch order


def test_export_manifest_tokens_and_jsonl(spark, docs, tmp_path):
    out = str(tmp_path / "jl")
    with_tok = docs.withColumn("n_tokens", F.length("text"))
    m = export_training_shards(
        with_tok, out, 3, fmt="jsonl", tokens_col="n_tokens"
    )
    want = with_tok.agg(F.sum("n_tokens")).collect()[0][0]
    assert m["total_tokens"] == want
    back = spark.read.schema(
        "doc_id long, text string, lang string, n_tokens long"
    ).json(f"{out}/shard=0")
    assert back.count() == m["shards"]["0"]["rows"]


def test_export_refuses_existing_and_clears_stale_staging(
    docs, tmp_path
):
    out = str(tmp_path / "pub")
    # crashed runs' leftovers (both the legacy shared name and the
    # writer-unique form) must not poison the retry
    stagings = [out + "._staging", out + "._staging-99999-0"]
    for staging in stagings:
        os.makedirs(os.path.join(staging, "shard=0"))
        with open(os.path.join(staging, "shard=0", "junk"), "w") as f:
            f.write("partial")
    m = export_training_shards(docs, out, 2)
    for staging in stagings:
        assert not os.path.exists(staging)
    assert m["total_rows"] > 0
    assert os.path.exists(os.path.join(out, MANIFEST_NAME))
    with pytest.raises(ValueError, match="immutable"):
        export_training_shards(docs, out, 2)


def test_read_manifest_rejects_unpublished(tmp_path):
    d = str(tmp_path / "not_an_export")
    os.makedirs(d)
    with pytest.raises(ValueError, match="manifest"):
        read_manifest(d)


def test_order_expr_independent_of_shard_expr(spark):
    # membership and order must decorrelate: across shards, order ranks
    # of shard-0 docs span the full range, not a band
    df = spark.range(0, 4000).select(F.col("id").alias("doc_id"))
    rows = df.select(
        shard_expr(F.col("doc_id"), 2).alias("s"),
        order_expr(F.col("doc_id")).alias("r"),
    ).collect()
    r0 = sorted(r["r"] for r in rows if r["s"] == 0)
    r1 = sorted(r["r"] for r in rows if r["s"] == 1)
    # interleaving check: the medians of the two groups are close
    # relative to the overall spread (a correlated hash would split
    # the rank space)
    all_r = sorted(r["r"] for r in rows)
    spread = all_r[-1] - all_r[0]
    assert abs(r0[len(r0) // 2] - r1[len(r1) // 2]) < spread / 10


def test_mix_proportions_and_determinism(spark):
    big = spark.range(0, 20000).select(F.col("id").alias("doc_id"))
    small = spark.range(100000, 105000).select(
        F.col("id").alias("doc_id")
    )
    mixed = mix_sources(
        {"web": (big, 1.0), "code": (small, 1.0)}, seed=5
    )
    counts = {
        r["source"]: r["n"]
        for r in mixed.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    # binding source (code: 5000/1.0) rides whole; web downsamples to
    # ~5000 (hash noise ~ sqrt(5000) ≈ 71; allow 5 sigma)
    assert counts["code"] == 5000
    assert abs(counts["web"] - 5000) < 400

    again = mix_sources(
        {"web": (big, 1.0), "code": (small, 1.0)}, seed=5
    )
    assert sorted(
        (r["doc_id"], r["source"]) for r in mixed.collect()
    ) == sorted((r["doc_id"], r["source"]) for r in again.collect())

    # exactly-once: no row appears twice
    assert mixed.count() == mixed.select("doc_id", "source").distinct() \
                                 .count()


def test_mix_rejects_empty_and_nonpositive(spark):
    df = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    empty = df.where(F.lit(False))
    with pytest.raises(ValueError, match="empty"):
        mix_sources({"a": (df, 1.0), "b": (empty, 1.0)})
    with pytest.raises(ValueError, match="> 0"):
        mix_sources({"a": (df, 0.0)})
    with pytest.raises(ValueError, match="non-empty"):
        mix_sources({})


def test_mix_weights_skewed(spark):
    a = spark.range(0, 30000).select(F.col("id").alias("doc_id"))
    b = spark.range(50000, 80000).select(F.col("id").alias("doc_id"))
    mixed = mix_sources({"a": (a, 3.0), "b": (b, 1.0)}, seed=2)
    counts = {
        r["source"]: r["n"]
        for r in mixed.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    # scale = min(30000/3, 30000/1) = 10000 → a: 30000 (binding),
    # b: 10000 ± noise
    assert counts["a"] == 30000
    assert abs(counts["b"] - 10000) < 500


def test_export_layout_is_one_exchange(spark, docs):
    """The scale claim, on the plan: ONE range exchange on shard, a
    partition-local sort, no second exchange, no global sort."""
    from tmdb_sync_spark.functions.export import shard_layout

    plan = shard_layout(docs, 8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" in plan
    # the sort is partition-local (global=false in the Sort operator)
    assert "Sort [shard" in plan and "false, 0" in plan


def test_mix_plan_is_shuffle_free(spark):
    from tmdb_sync_spark.functions.export import mix_sources

    a = spark.range(0, 5000).select(F.col("id").alias("doc_id"))
    b = spark.range(9000, 14000).select(F.col("id").alias("doc_id"))
    plan = mix_sources({"a": (a, 1.0), "b": (b, 1.0)})._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_read_training_shards_verifies_and_detects_loss(
    spark, docs, tmp_path
):
    import shutil

    out = str(tmp_path / "verified")
    m = export_training_shards(docs, out, 4)
    from tmdb_sync_spark.functions.export import read_training_shards

    back = read_training_shards(spark, out)
    assert back.count() == m["total_rows"]

    # simulate a lost shard file (partial copy): verify must fail loudly
    lost = next(
        i for i in range(4) if m["shards"][str(i)]["rows"] > 0
    )
    shutil.rmtree(os.path.join(out, f"shard={lost}"))
    spark.catalog.refreshByPath(out)
    with pytest.raises(ValueError, match=f"shard {lost}"):
        read_training_shards(spark, out)
    # opting out of verification reads what remains (caller's choice)
    assert read_training_shards(spark, out, verify=False).count() < \
        m["total_rows"]


def test_read_training_shards_jsonl_roundtrip(spark, docs, tmp_path):
    out = str(tmp_path / "jl_rt")
    m = export_training_shards(docs, out, 2, fmt="jsonl")
    from tmdb_sync_spark.functions.export import read_training_shards

    back = read_training_shards(spark, out)
    assert back.count() == m["total_rows"]
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }


def test_full_corpus_to_trainer_chain(spark, sf_dir, tmp_path):
    """The complete round-7 composition, end to end on the driver
    corpus: documents → repetition gate → per-source cap → 2-source
    mix → deterministic split → sharded export → verified read-back.
    Every stage's invariant holds on the final artifact: membership is
    a subset chain, nothing duplicates, and the manifest certifies the
    published rows."""
    from tmdb_sync_spark.functions.export import (
        export_training_shards,
        mix_sources,
        read_training_shards,
    )
    from tmdb_sync_spark.functions.sampling import (
        cap_per_group,
        split_corpus,
    )
    from tmdb_sync_spark.functions.text import repetition_stats
    from tmdb_sync_spark.io import table

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )

    # quality gate: repetition thresholds (the caller-policy example
    # from the docstring)
    stats = repetition_stats(docs)
    ok_ids = stats.where(
        (F.col("dup_line_frac") <= 0.30)
        & (F.col("top_ngram_frac") <= 0.80)
    ).select("doc_id")
    gated = docs.join(ok_ids, "doc_id")
    n_gated = gated.count()
    assert 0 < n_gated <= docs.count()

    # per-source cap, then a 2:1 mix of the two largest sources
    capped = cap_per_group(gated, "source", "n_chars", 200)
    srcs = [r["source"] for r in capped.groupBy("source").count()
            .orderBy(F.desc("count")).limit(2).collect()]
    mixed = mix_sources(
        {srcs[0]: (capped.where(F.col("source") == srcs[0]), 2.0),
         srcs[1]: (capped.where(F.col("source") == srcs[1]), 1.0)},
        seed=11, source_col="mix_source",
    )
    train = split_corpus(mixed, seed=11).where(F.col("split") == "train")
    n_train = train.count()
    assert 0 < n_train <= n_gated

    out = str(tmp_path / "train_v1")
    m = export_training_shards(
        train.drop("split"), out, 4, seed=11, tokens_col="n_chars"
    )
    assert m["total_rows"] == n_train

    back = read_training_shards(spark, out)   # manifest-verified
    assert back.count() == n_train
    # membership chain: exported ⊆ gated ⊆ documents, no duplicates
    assert back.select("doc_id").distinct().count() == n_train
    assert back.join(gated, "doc_id", "left_anti").count() == 0


def test_embedding_quantization_roundtrip(spark, sf_dir):
    """int8 payload quantization: per-component error ≤ scale/2 on the
    real embeddings table, cosine preserved to ~1e-3, degenerate
    vectors (NULL / all-zero) follow the engine conventions."""
    from tmdb_sync_spark.functions.export import (
        dequantize_embedding_expr,
        quantize_embedding_expr,
    )
    from tmdb_sync_spark.io import table

    emb = table(spark, sf_dir, "embeddings")
    codes, scale = quantize_embedding_expr(F.col("embedding"))
    q = emb.select(
        "vec_id", "embedding", codes.alias("codes"), scale.alias("scale")
    ).withColumn(
        "back", dequantize_embedding_expr(F.col("codes"), F.col("scale"))
    )
    # error bound + cosine drift, aggregated over the whole table
    err = q.select(
        F.array_max(F.zip_with(
            "embedding", "back", lambda a, b: F.abs(a - b)
        )).alias("max_err"),
        F.col("scale").alias("s"),
        (
            F.aggregate(
                F.zip_with("embedding", "back", lambda a, b: a * b),
                F.lit(0.0), lambda acc, x: acc + x,
            )
            / (
                F.sqrt(F.aggregate(
                    F.transform("embedding", lambda a: a * a),
                    F.lit(0.0), lambda acc, x: acc + x))
                * F.sqrt(F.aggregate(
                    F.transform("back", lambda a: a * a),
                    F.lit(0.0), lambda acc, x: acc + x))
            )
        ).alias("cos"),
    )
    row = err.agg(
        F.max(F.col("max_err") - F.col("s") / 2 - 1e-6).alias("viol"),
        F.min("cos").alias("min_cos"),
    ).collect()[0]
    assert row["viol"] <= 0          # every component inside the bound
    assert row["min_cos"] > 0.999

    # degenerate conventions
    d = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, None)],
        "vec_id long, embedding array<float>",
    )
    c2, s2 = quantize_embedding_expr(F.col("embedding"))
    rows = {
        r["vec_id"]: r
        for r in d.select(
            "vec_id", c2.alias("c"), s2.alias("s")
        ).withColumn(
            "back", dequantize_embedding_expr(F.col("c"), F.col("s"))
        ).collect()
    }
    assert rows[1]["c"] == [0, 0, 0] and rows[1]["s"] == 0.0
    assert list(rows[1]["back"]) == [0.0, 0.0, 0.0]
    assert rows[2]["c"] is None and rows[2]["back"] is None


def test_shard_read_order_is_a_stable_permutation():
    from tmdb_sync_spark.functions.export import shard_read_order

    a = shard_read_order(16, epoch=0)
    assert sorted(a) == list(range(16))      # a permutation
    assert a == shard_read_order(16, epoch=0)   # stable
    assert a != shard_read_order(16, epoch=1)   # epochs differ
    assert a != list(range(16))              # epoch 0 already shuffled
    assert shard_read_order(16, epoch=1, seed=9) != \
        shard_read_order(16, epoch=1)        # seeds differ
    import pytest as _pt

    with _pt.raises(ValueError):
        shard_read_order(0, epoch=0)


def test_gate_to_verified_shards_end_to_end(spark, sf_dir, tmp_path):
    """The FULL trainer handoff in one run: quality_gate → corpus_report
    sanity → split → FFD pack → materialize pack text → sharded export
    → manifest-verified load. Every gated train doc reaches exactly one
    pack; the export's token accounting equals the pack totals; the
    loader's integrity check passes on the published dir."""
    from pyspark.sql import functions as F

    from tmdb_sync_spark.functions.export import read_training_shards
    from tmdb_sync_spark.functions.sampling import (
        materialize_packs,
        pack_sequences,
        split_corpus,
    )
    from tmdb_sync_spark.functions.stats import corpus_report
    from tmdb_sync_spark.functions.text import quality_gate, tokens_expr
    from tmdb_sync_spark.io import table

    docs = table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    gate = quality_gate(docs)
    kept = gate["kept"].cache()
    try:
        n_kept = kept.count()
        assert gate["audit"]["n_kept"] == n_kept
        assert gate["audit"]["n_in"] == docs.count()

        # sketch report agrees with the frame it profiled
        total = {
            r["grouping_id"]: r
            for r in corpus_report(kept, ("lang",)).collect()
        }[1]
        assert total["n_docs"] == n_kept

        train = split_corpus(kept, seed=3).where(
            F.col("split") == "train"
        ).select(
            "doc_id", "text",
            F.size(tokens_expr(F.col("text"))).alias("n_tokens"),
        ).cache()
        n_train = train.count()
        packed = pack_sequences(
            train.select("doc_id", "n_tokens"),
            max_tokens=512, n_buckets=2, seed=3,
        )
        packs = materialize_packs(train, packed).cache()
        assert packs.agg(F.sum("n_docs")).collect()[0][0] == n_train

        out = str(tmp_path / "shards")
        manifest = export_training_shards(
            packs, out, 4, key="pack_id", tokens_col="pack_tokens"
        )
        n_packs = packs.count()
        assert manifest["total_rows"] == n_packs
        assert manifest["total_tokens"] == packs.agg(
            F.sum("pack_tokens")
        ).collect()[0][0]

        loaded = read_training_shards(spark, out, verify=True)
        assert loaded.count() == n_packs
        # provenance survives the export: the union of loaded packs'
        # doc_ids is exactly the train split
        ids = loaded.select(
            F.explode("doc_ids").alias("doc_id")
        )
        assert ids.distinct().count() == n_train
        assert ids.join(train, "doc_id", "left_anti").count() == 0
        packs.unpersist()
        train.unpersist()
    finally:
        kept.unpersist()


# --- review-finding pins: staging sweep, NULL tokens, round-trip ------


def test_reexport_roundtrip_recomputes_layout_columns(spark, docs, tmp_path):
    """read_training_shards returns 'shard'; re-exporting that frame
    must recompute the layout columns instead of dying on duplicates
    (review finding). Same rows, same manifest accounting."""
    from tmdb_sync_spark.functions.export import read_training_shards

    a = str(tmp_path / "a")
    m1 = export_training_shards(docs, a, 4)
    back = read_training_shards(spark, a)
    assert "shard" in back.columns
    b = str(tmp_path / "b")
    m2 = export_training_shards(back, b, 3)
    assert m2["total_rows"] == m1["total_rows"]
    again = read_training_shards(spark, b)
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(
        r["doc_id"] for r in docs.collect()
    )


def test_null_tokens_raise_before_any_write(spark, tmp_path):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a", 3), (2, "b", None), (3, "c", 5)],
        "doc_id long, text string, n_tokens int",
    )
    out = str(tmp_path / "out")
    with pytest.raises(ValueError, match="1 rows have NULL 'n_tokens'"):
        export_training_shards(df, out, 2, tokens_col="n_tokens")
    # the contract error fired BEFORE the export write: no target, no
    # staging leftovers
    assert not os.path.exists(out)
    assert [p for p in os.listdir(tmp_path)
            if "._staging" in p] == []


def test_staging_sweep_spares_live_writers(spark, docs, tmp_path):
    """The stale-staging sweep must only take CRASHED runs' dirs: one
    with a dead pid is swept, one named with a LIVE pid (a concurrent
    exporter mid-write) survives (review finding)."""
    out = str(tmp_path / "out")
    dead = f"{out}._staging-4194304-0"       # beyond pid_max: never alive
    live = f"{out}._staging-{os.getpid()}-999999"
    os.makedirs(dead)
    os.makedirs(live)
    export_training_shards(docs, out, 2)
    assert not os.path.exists(dead)
    assert os.path.exists(live)
    assert os.path.exists(os.path.join(out, MANIFEST_NAME))
    os.rmdir(live)


# --- token-budget mixing with up-sampling -----------------------------


def _tok_source(spark, n, start, tok=10):
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.lit(tok).alias("n_tokens"),
    )


def test_token_mix_budgets_repeats_and_determinism(spark):
    from tmdb_sync_spark.functions.export import mix_sources_by_tokens

    big = _tok_source(spark, 20000, 0)          # 200k tokens
    small = _tok_source(spark, 1000, 10**6)     # 10k tokens
    # weights 3:1 over 100k tokens → big 75k (ratio .375), small 25k
    # (ratio 2.5 → 2 full epochs + .5 remainder)
    mixed, plan = mix_sources_by_tokens(
        {"web": (big, 3.0), "code": (small, 1.0)}, 100_000, seed=4
    )
    assert plan["web"] == {
        "weight": 3.0, "available_tokens": 200_000,
        "budget_tokens": 75_000, "repeats": 0, "remainder_frac": 0.375,
    }
    assert plan["code"]["repeats"] == 2
    assert plan["code"]["remainder_frac"] == pytest.approx(0.5)

    got = mixed.groupBy("source", "epoch").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_tokens").alias("t"),
    ).collect()
    by = {(r["source"], r["epoch"]): r for r in got}
    # full epochs are EXACT copies
    assert by[("code", 0)]["n"] == 1000 and by[("code", 1)]["n"] == 1000
    # remainder slices track their fraction (hash noise ~ sqrt(n))
    assert abs(by[("code", 2)]["n"] - 500) < 120
    assert abs(by[("web", 0)]["n"] - 7500) < 500
    # realized tokens ≈ budgets
    tot = {s: sum(r["t"] for (s2, _), r in by.items() if s2 == s)
           for s in ("web", "code")}
    assert abs(tot["code"] - 25_000) < 1500
    assert abs(tot["web"] - 75_000) < 5000

    again, _ = mix_sources_by_tokens(
        {"web": (big, 3.0), "code": (small, 1.0)}, 100_000, seed=4
    )
    assert sorted(
        (r["doc_id"], r["source"], r["epoch"]) for r in mixed.collect()
    ) == sorted(
        (r["doc_id"], r["source"], r["epoch"]) for r in again.collect()
    )


def test_token_mix_contract_errors(spark):
    from tmdb_sync_spark.functions.export import mix_sources_by_tokens

    ok = _tok_source(spark, 100, 0)
    with pytest.raises(ValueError, match="max_repeats"):
        mix_sources_by_tokens({"s": (ok, 1.0)}, 10_000_000)
    with pytest.raises(ValueError, match="NULL 'n_tokens'"):
        bad = spark.createDataFrame(
            [(1, 5), (2, None)], "doc_id long, n_tokens int"
        )
        mix_sources_by_tokens({"s": (bad, 1.0)}, 10)
    with pytest.raises(ValueError, match="no token mass"):
        zero = spark.createDataFrame([], "doc_id long, n_tokens int")
        mix_sources_by_tokens({"s": (zero, 1.0)}, 10)
    with pytest.raises(ValueError, match="must be > 0"):
        mix_sources_by_tokens({"s": (ok, 0.0)}, 10)
    with pytest.raises(ValueError, match="total_tokens"):
        mix_sources_by_tokens({"s": (ok, 1.0)}, 0)


def test_keep_order_col_collision_refused(spark, docs, tmp_path):
    """A caller-named order column colliding with existing data must
    refuse rather than silently replace user data with the layout
    rank (second review pass)."""
    df = docs.withColumn("rank", F.lit(7))
    with pytest.raises(ValueError, match="collides"):
        export_training_shards(
            df, str(tmp_path / "x"), 2, keep_order_col="rank"
        )


def test_staging_sweep_age_fallback(spark, docs, tmp_path):
    """Pid reuse guard: a live-pid staging dir OLDER than the max age
    is swept anyway (no real export stages for a day)."""
    import time as _time

    out = str(tmp_path / "out")
    old = f"{out}._staging-{os.getpid()}-424242"
    os.makedirs(old)
    stale_t = _time.time() - 25 * 3600
    os.utime(old, (stale_t, stale_t))
    export_training_shards(docs, out, 2)
    assert not os.path.exists(old)


def test_mix_decisions_independent_across_sources(spark):
    """Two sources sharing the SAME key space, mixed at the same
    fraction under one seed: without the source name in the keep hash
    both would keep the identical key subset (correlated decisions —
    ADVICE r7); with it the kept sets differ like independent draws."""
    rows = [(i,) for i in range(2000)]
    a = spark.createDataFrame(rows, "doc_id long")
    b = spark.createDataFrame(rows, "doc_id long")
    # equal weights + a binding third source force frac < 1 on a and b
    tiny = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    mixed = mix_sources(
        {"a": (a, 1.0), "b": (b, 1.0), "tiny": (tiny, 1.0)}, seed=7
    )
    kept = {
        n: {r["doc_id"] for r in g}
        for n, g in (
            (n, mixed.where(F.col("source") == n).collect())
            for n in ("a", "b")
        )
    }
    assert 300 < len(kept["a"]) < 700 and 300 < len(kept["b"]) < 700
    # independence: overlap ≈ |a|·|b|/2000, NOT |a∩b| = |a| = |b|
    inter = len(kept["a"] & kept["b"])
    expected = len(kept["a"]) * len(kept["b"]) / 2000
    assert inter < 0.7 * min(len(kept["a"]), len(kept["b"])), (
        inter, expected, len(kept["a"]), len(kept["b"]))


def test_mix_by_tokens_remainder_independent_across_sources(spark):
    from tmdb_sync_spark.functions.export import mix_sources_by_tokens

    """Same property for the token-budget mixer's remainder slice: the
    remainder hash includes the source name, so two sources with the
    same keys and the same remainder fraction keep different subsets."""
    rows = [(i, 10) for i in range(2000)]
    a = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    b = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    mixed, plan = mix_sources_by_tokens(
        {"a": (a, 1.0), "b": (b, 1.0)}, total_tokens=20_000, seed=7
    )
    assert plan["a"]["repeats"] == 0 and 0 < plan["a"]["remainder_frac"] < 1
    kept = {
        n: {r["doc_id"] for r in
            mixed.where(F.col("source") == n).collect()}
        for n in ("a", "b")
    }
    inter = len(kept["a"] & kept["b"])
    assert inter < 0.7 * min(len(kept["a"]), len(kept["b"])), (
        inter, len(kept["a"]), len(kept["b"]))


def test_export_staging_sweep_nested_write_is_a_heartbeat(spark, docs, tmp_path):
    """Same nested-heartbeat contract as the profile store's sweep: a
    live-pid staging whose top-level mtime is a day old but whose
    nested task dir has a fresh part file is an in-flight write and
    must be spared (r8 advice; util.newest_tree_mtime)."""
    import time as _time

    out = str(tmp_path / "out")
    live = f"{out}._staging-{os.getpid()}-777"
    task = os.path.join(live, "_temporary", "task-7")
    os.makedirs(task)
    with open(os.path.join(task, "part-7.parquet"), "w") as fh:
        fh.write("x")
    old = _time.time() - 25 * 3600
    os.utime(live, (old, old))
    export_training_shards(docs, out, 2)
    assert os.path.exists(live)
