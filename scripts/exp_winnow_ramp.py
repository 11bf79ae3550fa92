#!/usr/bin/env python3
"""Winnow-fingerprint index ramp: build + probe walls at 1x/16x of
sf0.1's documents.

What the shape must show for the 100 TB posture:
- the BUILD (append_fingerprints_to_index) is a single fingerprint
  pass + bucketed write — ~linear in corpus size;
- the PROBE (substring_contamination_check, fixed 30-doc eval set) is
  bounded by the probed fps' document frequency, not corpus size —
  its wall should grow far sublinearly while the index grows 16x
  (the index is scanned map-side once; only the matched sliver
  shuffles for the df-cap window + pair aggregate).

Single-shot walls (stateful build); compare shape.
"""
from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tmdb_sync_spark.session import get_spark
from scripts.exp_scale_ramp import build_scaled

ROOT = "/tmp/spark_graft_winnow_ramp"


def main() -> None:
    from tmdb_sync_spark.functions.winnow_index import (
        append_fingerprints_to_index,
        substring_contamination_check,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp-winnow-ramp")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(ROOT, ignore_errors=True)

    # fixed eval set: 25 planted excerpts of BASE-corpus docs (present
    # at every scale) + 5 clean docs
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = (
        base.where((F.col("doc_id") % 97 == 0) & (F.length("text") >= 250))
        .limit(25)
        .select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.concat(F.lit("eval wrapper: "),
                     F.substring("text", 20, 160)).alias("text"),
        )
    )
    clean = spark.range(5).select(
        (F.col("id") + 20_000_000).alias("doc_id"),
        F.concat(F.lit("completely novel eval prompt number "),
                 F.col("id").cast("string"),
                 F.lit(" with fresh wording and no corpus text at all"),
                 ).alias("text"),
    )
    ev = planted.unionByName(clean).localCheckpoint()
    n_planted = planted.count()

    for k in (1, 16):
        scaled = build_scaled(spark, k)
        docs = spark.read.parquet(f"{scaled}/documents.parquet")
        idx = os.path.join(ROOT, f"idx_x{k}")
        t0 = time.perf_counter()
        append_fingerprints_to_index(spark, idx, docs)
        build_s = time.perf_counter() - t0

        # warm probe: run twice, report the second (build artifacts
        # freshly written, first touch pays listing)
        probe_s, hits, self_hits = 0.0, 0, 0
        for _ in range(2):
            t0 = time.perf_counter()
            res = substring_contamination_check(spark, idx, ev).collect()
            probe_s = time.perf_counter() - t0
        hits = len(res)
        self_hits = len({
            r["doc_id"] for r in res
            if r["corpus_doc_id"] % (10 ** 7) == r["doc_id"] % (10 ** 7)
            or r["doc_id"] - 10_000_000 == r["corpus_doc_id"]
        })
        print(
            f"x{k}: corpus={docs.count()} build={build_s:.2f}s "
            f"probe={probe_s:.2f}s pairs={hits} "
            f"planted_found={self_hits}/{n_planted}",
            flush=True,
        )

    if os.environ.get("SPARK_GRAFT_RAMP_KEEP") != "1":
        shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
