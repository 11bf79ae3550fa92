#!/usr/bin/env python3
"""Paired A/B: does bench's PSS sampler tax the queries it measures?

Context (r12 family-seed attribution): five extended slots drifted
+20-40% r10→r11 with UNTOUCHED query code. One protocol change sits
exactly between those artifacts: the r11 memory-sampler rework swapped
the ~1 ms /proc stat sweep for a PSS sweep over smaps_rollup — ~15 ms
of kernel VMA walking under each tree member's mmap_lock, every 250 ms,
WHILE the query runs. smaps_rollup holds mmap_lock for read; the JVM's
mmap/munmap (allocation, GC) need it for write; queued writers then
stall later readers (page faults) — so each sweep can convoy-stall the
measured JVM for up to the sweep length, disproportionately hurting
sub-second queries.

Design: per slot, one JIT rep, then PAIRED alternating reps —
(no-sampler, sampler), 4 pairs — under the exact bench rep protocol
(staged-cache reset + noop sink). Pairing cancels slow host-weather
drift (each pair shares its window); the per-pair ratio B/A is the
sampler tax. Floors bracket the run for the record.

Usage: python -u scripts/exp_sampler_tax.py
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
PAIRS = 4


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main() -> None:
    from tmdb_sync_spark.session import get_spark
    from tmdb_sync_spark.util import reset_materialization_cache

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp-sampler-tax")
    spark.sparkContext.setLogLevel("ERROR")

    import tmdb_sync_spark.all_queries  # noqa: F401
    from tmdb_sync_spark.registry import QUERIES

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    QUERIES["a1_sync_coverage"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    f1s, f32s = bench._floor_pair()
    print(f"floor_start 1t={f1s:.3f} 32t={f32s:.3f} ratio={f32s/f1s:.2f}",
          flush=True)

    def rep(fn, sampled: bool) -> float:
        reset_materialization_cache(kinds=("staged",))
        if sampled:
            with bench._PeakRss():
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                return time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in SLOTS:
        fn = QUERIES[name]
        rep(fn, sampled=False)  # JIT rep, discarded
        pairs = []
        for _ in range(PAIRS):
            a = rep(fn, sampled=False)
            b = rep(fn, sampled=True)
            pairs.append((a, b))
        ratios = [b / a for a, b in pairs]
        print(
            f"{name:24s} med_no_sampler={_median([a for a, _ in pairs]):.3f}"
            f" med_sampler={_median([b for _, b in pairs]):.3f}"
            f" pair_ratios={[round(r, 3) for r in ratios]}"
            f" med_tax={(_median(ratios) - 1) * 100:+.1f}%",
            flush=True,
        )

    f1e, f32e = bench._floor_pair()
    print(f"floor_end   1t={f1e:.3f} 32t={f32e:.3f} ratio={f32e/f1e:.2f}",
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
