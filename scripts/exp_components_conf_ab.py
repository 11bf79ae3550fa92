#!/usr/bin/env python3
"""A/B/C: mechanism for sizing the components fixpoint loop's shuffles
(r11 verdict #6 / ADVICE — the session-conf window is the one global
side effect in the operator library; measure scoped alternatives before
keeping it).

A: shipped — min_label_components's session-conf window
   (spark.sql.shuffle.partitions = edge-keyed loop_parts, set/restore
   under a lock).
B: AQE-policy window — leave shuffle.partitions at the session's 32 and
   instead set spark.sql.adaptive.coalescePartitions.parallelismFirst
   = false for the loop (smaller blast radius: a concurrent plan merely
   coalesces post-shuffle partitions toward the 64 MB advisory target
   instead of planning every exchange at loop_parts).
C: plan-local — no conf change at all; explicit repartition(loop_parts)
   on the symmetrized edge frame and on each round's checkpointed
   output. Zero blast radius, but interior exchanges (the groupBy, the
   label join, the pointer-jump self-join) are still planned at the
   session's 32 partitions.

All variants run the same fixpoint kernel semantics; labels asserted
identical. 3 reps each, report all walls (JIT tiers up over the first
2-3 executions of a new plan shape — memory: spark-perf-traps).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tmdb_sync_spark.session import get_spark


def _fixpoint_repartitioned(sym, max_rounds: int, stats: dict, parts: int):
    """_min_label_fixpoint with plan-local repartition(parts) pins on the
    frames the loop owns (variant C)."""
    sym = sym.repartition(parts, "u")
    labels = (
        sym.select(F.col("u").alias("v")).distinct()
        .withColumn("label", F.col("v"))
        .repartition(parts, "v")
        .localCheckpoint()
    )
    changed = 1
    rounds = 0
    while changed:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError("no fixpoint")
        neigh_min = (
            sym.join(labels, sym.u == labels.v)
            .groupBy(F.col("w").alias("v"))
            .agg(F.min("label").alias("nl"))
        )
        prop = labels.join(neigh_min, "v", "left").select(
            "v", F.col("label").alias("_old"),
            F.least("label", "nl").alias("label"),
        )
        jumped = (
            prop.alias("a")
            .join(
                prop.select(F.col("v").alias("jv"),
                            F.col("label").alias("jl")).alias("b"),
                F.col("a.label") == F.col("b.jv"),
                "left",
            )
            .select(
                F.col("a.v").alias("v"),
                F.col("a._old").alias("_old"),
                F.least(F.col("a.label"),
                        F.coalesce("b.jl", "a.label")).alias("label"),
            )
            .repartition(parts, "v")
            .localCheckpoint()
        )
        changed = jumped.where(F.col("label") != F.col("_old")).count()
        labels = jumped.drop("_old")
    stats["rounds"] = rounds
    return labels


def main() -> None:
    from tmdb_sync_spark.functions import dedup
    from tmdb_sync_spark.functions.similarity import (
        DUP_THRESHOLD,
        N_DUP_BITS,
        _dup_candidate_pairs,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("EXP_REPS", "3"))
    spark = get_spark("exp-components-conf-ab")
    spark.sparkContext.setLogLevel("ERROR")

    edges = (
        _dup_candidate_pairs(spark, sf_dir, N_DUP_BITS)
        .where(F.col("cosine_sim") >= DUP_THRESHOLD)
        .select(F.col("a.vec_id").alias("u"), F.col("b.vec_id").alias("w"))
        .localCheckpoint()
    )
    n_edges = edges.count()
    loop_parts = max(1, min(32, -(-2 * n_edges // 50_000)))
    print(f"edges={n_edges} loop_parts={loop_parts}", flush=True)

    sym = edges.unionByName(
        edges.select(F.col("w").alias("u"), F.col("u").alias("w"))
    )

    def variant_a(stats):
        return dedup.min_label_components(
            edges, stats=stats, edges_materialized=True
        )

    def variant_b(stats):
        key = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
        prev = spark.conf.get(key)
        spark.conf.set(key, "false")
        try:
            return dedup._min_label_fixpoint(sym, 64, stats)
        finally:
            spark.conf.set(key, prev)

    def variant_c(stats):
        return _fixpoint_repartitioned(sym, 64, stats, loop_parts)

    # A and B share the fixpoint kernel, so whichever runs first pays
    # the JIT tier-up for both — run the script twice with EXP_ORDER
    # flipped (ABC / BAC) and compare each variant's best across runs.
    variants = {"A": ("A_conf_window", variant_a),
                "B": ("B_aqe_policy", variant_b),
                "C": ("C_repartition", variant_c)}
    order = os.environ.get("EXP_ORDER", "ABC")
    results = {}
    for tag, fn in (variants[ch] for ch in order):
        walls, rounds, rows = [], -1, None
        for _ in range(reps):
            stats: dict = {}
            t0 = time.perf_counter()
            labels = fn(stats)
            rows = sorted((r["v"], r["label"]) for r in labels.collect())
            walls.append(time.perf_counter() - t0)
            rounds = stats.get("rounds", -1)
        results[tag] = rows
        print(
            f"{tag:14s} rounds={rounds:3d} walls="
            + " ".join(f"{w:6.3f}" for w in walls)
            + f"  best={min(walls):6.3f}s",
            flush=True,
        )
    vals = list(results.values())
    assert all(v == vals[0] for v in vals), "labels diverge across variants!"
    print("labels identical across variants", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
