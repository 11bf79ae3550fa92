#!/usr/bin/env python3
"""A/B: edge-keyed shuffle partitions in the components fixpoint loop
(r10 verdict #8).

The loop's exchanges were sized by the session's
``spark.sql.shuffle.partitions`` (32 at bench settings) even when the
label frame is tiny at bench SF — AQE's ``parallelismFirst`` coalescing
keeps partition counts near default parallelism, so ~10 rounds × 4
exchanges a round schedule ~32 tasks each for a few thousand rows.
``min_label_components`` now keys the loop's partitions to the
materialized edge count, capped at the session's setting (a 100 TB edge
list keeps the session shape — only small graphs shrink).

A: legacy shape — loop pinned to the session's 32 partitions.
B: adaptive — edge-keyed (expected 1 at sf0.1's ~hundreds of edges).

Both variants run the identical fixpoint code (_min_label_fixpoint);
the A/B is ONLY the conf value during the loop. Reported walls are the
second run of each (first pays codegen). Labels are asserted identical
across variants.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tmdb_sync_spark.session import get_spark


def main() -> None:
    from tmdb_sync_spark.functions import dedup
    from tmdb_sync_spark.functions.similarity import (
        DUP_THRESHOLD,
        N_DUP_BITS,
        _dup_candidate_pairs,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp-components-parts")
    spark.sparkContext.setLogLevel("ERROR")

    edges = (
        _dup_candidate_pairs(spark, sf_dir, N_DUP_BITS)
        .where(F.col("cosine_sim") >= DUP_THRESHOLD)
        .select(F.col("a.vec_id").alias("u"), F.col("b.vec_id").alias("w"))
        .localCheckpoint()
    )
    n_edges = edges.count()
    print(f"edges={n_edges}", flush=True)

    def run_pinned(parts: str | None) -> tuple[float, int, dict]:
        """parts=None -> the adaptive path (min_label_components);
        otherwise pin the loop to ``parts`` and call the fixpoint
        kernel directly (the legacy shape)."""
        stats: dict = {}
        t0 = time.perf_counter()
        if parts is None:
            labels = dedup.min_label_components(
                edges, stats=stats, edges_materialized=True
            )
        else:
            sym = edges.unionByName(
                edges.select(F.col("w").alias("u"), F.col("u").alias("w"))
            )
            key = "spark.sql.shuffle.partitions"
            prev = spark.conf.get(key)
            spark.conf.set(key, parts)
            try:
                labels = dedup._min_label_fixpoint(sym, 64, stats)
            finally:
                spark.conf.set(key, prev)
        rows = sorted(
            (r["v"], r["label"]) for r in labels.collect()
        )
        dt = time.perf_counter() - t0
        return dt, stats.get("rounds", -1), {"rows": rows}

    results = {}
    for tag, parts in (("A_pinned32", "32"), ("B_adaptive", None)):
        walls = []
        rounds = -1
        rows = None
        for rep in range(2):
            dt, rounds, out = run_pinned(parts)
            walls.append(dt)
            rows = out["rows"]
        results[tag] = rows
        print(
            f"{tag:12s} rounds={rounds:3d} "
            f"wall_first={walls[0]:7.3f}s wall_warm={walls[1]:7.3f}s",
            flush=True,
        )
    assert results["A_pinned32"] == results["B_adaptive"], "labels diverge!"
    print("labels identical across variants", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
