#!/usr/bin/env python3
"""Scale-ramp evidence for the round-7 additions: does the trainer
export, the source mix, and the repetition-stats roll-up grow linearly
with corpus size, as their plan shapes claim?

Reuses exp_scale_ramp's scaled corpora (1x/4x/16x of sf0.1 documents,
replicas with fresh ids + perturbed text). Measures, warm (2nd run):

- export_training_shards (parquet, n_shards scaled with corpus so the
  per-shard file size is held ~constant — the production sizing rule):
  expect linear (one range exchange + ordered write).
- mix_sources over two halves of the corpus: expect linear (union of
  filtered scans; the count() actions are footer-metadata cheap).
- repetition_stats: expect linear (explode + two-level agg — unit
  count per doc is corpus-independent).

Export wall time includes the staging write AND the manifest aggregate;
the published dir is removed between reps (exports are immutable, so a
rep must publish fresh, like a real re-export).
"""
from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tmdb_sync_spark.session import get_spark
from scripts.exp_scale_ramp import SCALES, build_scaled

OUT_ROOT = "/tmp/spark_graft_export_ramp"


def timed_export(spark, sf_dir: str, n_shards: int, tag: str) -> float:
    from tmdb_sync_spark.functions.export import export_training_shards

    t = 0.0
    for rep in range(2):
        out = f"{OUT_ROOT}/{tag}_rep{rep}"
        if os.path.isdir(out):
            shutil.rmtree(out)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        t0 = time.perf_counter()
        export_training_shards(
            docs, out, n_shards, tokens_col="n_chars"
        )
        t = time.perf_counter() - t0
    return round(t, 3)


def timed_noop(fn) -> float:
    t = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        t = time.perf_counter() - t0
    return round(t, 3)


def main() -> None:
    spark = get_spark("export-ramp")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from tmdb_sync_spark.functions.export import mix_sources
    from tmdb_sync_spark.functions.text import repetition_stats

    rows = []
    for k in SCALES:
        sf = build_scaled(spark, k)
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        n = docs.count()

        t_exp = timed_export(spark, sf, n_shards=8 * k, tag=f"x{k}")

        half_a = docs.where(F.col("doc_id") % 2 == 0)
        half_b = docs.where(F.col("doc_id") % 2 == 1)
        t_mix = timed_noop(
            lambda: mix_sources(
                {"a": (half_a, 2.0), "b": (half_b, 1.0)}
            )
        )

        t_rep = timed_noop(lambda: repetition_stats(docs))

        rows.append((k, n, t_exp, t_mix, t_rep))
        print(f"x{k}: docs={n} export={t_exp}s (shards={8*k}) "
              f"mix={t_mix}s repetition={t_rep}s", flush=True)

    base = rows[0]
    print("\nratios vs 1x (size ratio in parens):")
    for k, n, te, tm, tr in rows[1:]:
        print(f"  x{k} ({n/base[1]:.0f}x rows): export {te/base[2]:.1f}x, "
              f"mix {tm/base[3]:.1f}x, repetition {tr/base[4]:.1f}x")


if __name__ == "__main__":
    main()
