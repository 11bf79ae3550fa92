#!/usr/bin/env python3
"""Family-seed A/B for the five extended slots that drifted +20-40%
r10→r11 with untouched code (r11 verdict #2 / "What's wrong" #1):
dd_simhash_fingerprint, export_shard_layout, corpus_report,
tx_ngram_topk, repetition_stats.

The extended family guardrail needs FAMILY_MIN_SAMPLES=3 healthy
same-SF artifacts and r11 was the FIRST — these slots are unpoliced
until ~r13. This script measures them best-of-5 under the exact bench
protocol (staged-cache reset per rep, noop sink, floor pairs bracketing
the suite) so the round log can seed a reference table and attribute
the r11 drift (noise vs real) without waiting two more rounds.

Usage: python -u scripts/exp_family_seed.py   (quiet host required —
the floor ratios are printed so a contended window self-identifies)
"""
from __future__ import annotations

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_BENCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
)
_spec = importlib.util.spec_from_file_location("bench_module", _BENCH)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)

SLOTS = [
    "dd_simhash_fingerprint",
    "export_shard_layout",
    "corpus_report",
    "tx_ngram_topk",
    "repetition_stats",
]


def main() -> None:
    from tmdb_sync_spark.session import get_spark
    from tmdb_sync_spark.util import reset_materialization_cache

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("EXP_REPS", "6"))  # 1 cold + 5 timed
    spark = get_spark("exp-family-seed")
    spark.sparkContext.setLogLevel("ERROR")

    import tmdb_sync_spark.all_queries  # noqa: F401
    from tmdb_sync_spark.registry import QUERIES

    # same warmup as bench.main
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    QUERIES["a1_sync_coverage"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    f1s, f32s = bench._floor_pair()
    print(f"floor_start 1t={f1s} 32t={f32s} ratio={f32s / max(f1s, 1e-9):.2f}",
          flush=True)

    for name in SLOTS:
        fn = QUERIES[name]
        runs = []
        for _ in range(reps):
            spark.catalog.clearCache()
            reset_materialization_cache(kinds=("staged",))
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        warm = runs[1:]
        print(
            f"{name:24s} first={runs[0]:6.3f} best5={min(warm):6.3f} "
            f"median5={bench._median(warm):6.3f} warm={warm}",
            flush=True,
        )

    f1e, f32e = bench._floor_pair()
    print(f"floor_end   1t={f1e} 32t={f32e} ratio={f32e / max(f1e, 1e-9):.2f}",
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
