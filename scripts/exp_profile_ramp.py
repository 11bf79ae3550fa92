#!/usr/bin/env python3
"""Scale evidence for the round-7 tail operators: the incremental
profile (drop state + merge) and the split-leakage audit.

Claims under test:

1. incremental profile: per-drop maintenance cost = ONE scan of the
   new drop (constant when drop size is constant) + a report over
   persisted state (O(drops x groups) KB-scale rows, near-flat) — while
   the rescan alternative (corpus_report over everything) grows
   linearly with accumulated corpus size. At 100 TB the rescan is the
   operator you cannot run daily; the state merge is.
2. split_leakage_audit: the same banded-LSH shape as dd_minhash_lsh
   (already ramped: 5.1x at 64x) plus two label joins — wall-clock must
   track the dedup pass, no new scaling break.

Run: python -u scripts/exp_profile_ramp.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts.exp_scale_ramp import build_scaled, timed  # noqa: E402
from tmdb_sync_spark.functions.leakage import split_leakage_audit  # noqa: E402
from tmdb_sync_spark.functions.stats import (  # noqa: E402
    corpus_report,
    incremental_report,
    profile_drop_state,
    write_profile_drop,
)
from tmdb_sync_spark.session import get_spark  # noqa: E402

PROFILE_DIR = "/tmp/spark_graft_ramp/profile_state"
N_DROPS = 16


def main() -> None:
    spark = get_spark("profile-ramp")
    spark.sparkContext.setLogLevel("ERROR")

    # one x16 corpus = 16 equal "drops" (the replicas of build_scaled)
    d16 = build_scaled(spark, N_DROPS)
    docs = spark.read.parquet(f"{d16}/documents.parquet")
    # drop i = replica i of build_scaled: ids offset by i * stride,
    # stride = the next STRIDE_UNIT multiple above the base doc count
    from scripts.exp_scale_ramp import BASE, STRIDE_UNIT

    n_base = spark.read.parquet(f"{BASE}/documents.parquet").count()
    stride = ((n_base // STRIDE_UNIT) + 1) * STRIDE_UNIT

    def drop_frame(i: int):
        return docs.where(
            (F.col("doc_id") >= i * stride)
            & (F.col("doc_id") < (i + 1) * stride)
        )

    shutil.rmtree(PROFILE_DIR, ignore_errors=True)
    print("== incremental profile vs rescan (drop size constant) ==")
    print("drops | t_state(new drop) | t_inc_report | t_rescan(all)")
    accum = None
    for i in range(N_DROPS):
        new = drop_frame(i)
        accum = new if accum is None else accum.unionByName(new)
        t0 = time.perf_counter()
        write_profile_drop(
            profile_drop_state(new, ("source", "lang")),
            PROFILE_DIR,
            f"d{i:02d}",
        )
        t_state = time.perf_counter() - t0
        if i + 1 in (1, 2, 4, 8, 16):
            t_inc = timed(
                lambda: incremental_report(
                    spark, PROFILE_DIR, ("source", "lang")
                ),
                reps=2,
            )
            t_full = timed(
                lambda: corpus_report(accum, ("source", "lang")), reps=2
            )
            print(
                f"{i + 1:5d} | {t_state:17.3f} | {t_inc:12.3f} |"
                f" {t_full:13.3f}"
            )

    print()
    print("== split_leakage_audit ramp (vs its dedup-shaped floor) ==")
    print("scale | t_audit | rows")
    for k in (1, 4, 16):
        d = build_scaled(spark, k)
        dk = spark.read.parquet(f"{d}/documents.parquet").select(
            "doc_id", "text"
        )
        t = timed(
            lambda: split_leakage_audit(
                dk, weights={"train": 0.7, "val": 0.15, "test": 0.15},
                seed=11, min_equal=4,
            ),
            reps=2,
        )
        n = split_leakage_audit(
            dk, weights={"train": 0.7, "val": 0.15, "test": 0.15},
            seed=11, min_equal=4,
        ).count()
        print(f"x{k:4d} | {t:7.3f} | {n}")

    spark.stop()


if __name__ == "__main__":
    main()
