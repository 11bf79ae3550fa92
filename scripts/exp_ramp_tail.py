#!/usr/bin/env python3
"""Scale-ramp tail (r6 verdict item 1): the operators the 1x-64x sweep
skipped.

D. dd_cluster_components / min_label_components — the ONE iterative
   operator. Two axes:
   - diameter ramp: fixed 65,536 nodes arranged as chains of diameter
     16 / 64 / 256 / 1024 (the adversarial shape for label propagation —
     a plain neighbor-min walk needs D rounds). The pointer-jumping
     claim is rounds ~ log2(D), i.e. +2 rounds per 4x diameter, and
     wall-clock ~ rounds (each round is a fixed set of bounded joins).
   - corpus ramp: the registered query at x1/x4/x16 of sf0.1 embeddings
     (edge generation dominates; components there are shallow).
E. knn_cosine_topk — corpus ramp with the query set FIXED by
   construction (vec_id < 10 lives in the base replica only): the
   two-phase top-k claim says the final per-query stage funnels
   K x n_partitions rows regardless of corpus, so the ramp should be
   ~linear in candidates.
F. The three streaming window queries on a ramped `events` (replicas
   shift user_id, keeping the time range): state rows grow with key
   cardinality, per-batch work with input size — expect ~linear.

Run: python -u scripts/exp_ramp_tail.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts.exp_scale_ramp import RAMP_ROOT, build_scaled, timed  # noqa: E402
from tmdb_sync_spark.io import table  # noqa: E402
from tmdb_sync_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [1, 4, 16]
CHAIN_NODES = 65_536
DIAMETERS = [16, 64, 256, 1024]


def chain_edges(spark, diameter: int):
    """CHAIN_NODES nodes as CHAIN_NODES/diameter disjoint path graphs:
    node i — i+1 within each chain. Diameter grows, node/edge count
    stays fixed, so the ramp isolates the iteration count."""
    return (
        spark.range(CHAIN_NODES)
        .where(F.col("id") % diameter != diameter - 1)
        .select(F.col("id").alias("u"), (F.col("id") + 1).alias("w"))
        .repartition(32)
    )


def build_events(spark, k: int) -> str:
    out = f"{RAMP_ROOT}/ev_x{k}"
    if os.path.isdir(out):
        return out
    ev = table(spark, BASE, "events")
    parts = [ev]
    for i in range(1, k):
        parts.append(
            ev.select(
                (F.col("event_id") + i * 10_000_000).alias("event_id"),
                "ts",
                (F.col("user_id") + i * 1_000_000).alias("user_id"),
                "event_type", "value", "props",
            )
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    allp.repartition(32).write.mode("overwrite").parquet(
        f"{out}/events.parquet"
    )
    return out


def main() -> None:
    spark = get_spark("exp-ramp-tail")
    spark.sparkContext.setLogLevel("ERROR")
    import tmdb_sync_spark.all_queries  # noqa: F401
    from tmdb_sync_spark.functions.dedup import min_label_components
    from tmdb_sync_spark.registry import QUERIES

    print("== D1. components: diameter ramp, fixed 65,536 nodes ==",
          flush=True)
    import time
    for d in DIAMETERS:
        edges = chain_edges(spark, d).localCheckpoint()
        stats: dict = {}
        t0 = time.perf_counter()
        n = min_label_components(edges, stats=stats).count()
        dt = round(time.perf_counter() - t0, 3)
        print(f"diameter={d:5d}  rounds={stats['rounds']:3d}  "
              f"time={dt:7.3f}s  labels={n}", flush=True)

    dirs = {k: build_scaled(spark, k) for k in SCALES}
    ev_dirs = {k: build_events(spark, k) for k in SCALES}

    print("\n== D2. dd_cluster_components: corpus ramp ==", flush=True)
    row = {k: timed(lambda k=k: QUERIES["dd_cluster_components"](
        spark, dirs[k])) for k in SCALES}
    print("dd_cluster_components: " + "  ".join(
        f"x{k}={row[k]}" for k in SCALES), flush=True)

    print("\n== E. knn_cosine_topk: corpus ramp, fixed 10 queries ==",
          flush=True)
    row = {k: timed(lambda k=k: QUERIES["knn_cosine_topk"](
        spark, dirs[k])) for k in SCALES}
    print("knn_cosine_topk: " + "  ".join(
        f"x{k}={row[k]}" for k in SCALES), flush=True)

    print("\n== F. streaming windows: events ramp ==", flush=True)
    for name in ("st_tumbling_window", "st_sliding_window",
                 "st_session_window"):
        row = {k: timed(lambda k=k, n=name: QUERIES[n](
            spark, ev_dirs[k])) for k in SCALES}
        print(f"{name}: " + "  ".join(
            f"x{k}={row[k]}" for k in SCALES), flush=True)


if __name__ == "__main__":
    main()
