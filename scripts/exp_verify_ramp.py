#!/usr/bin/env python3
"""Exact-span verify-stage ramp: detection + verification walls at
1x/16x of sf0.1's documents.

What the shape must show for the 100 TB posture:
- DETECTION (substring_overlap) is the corpus fingerprint pass —
  ~linear in corpus size, the irreducible cost of looking everywhere;
- VERIFICATION (verify_overlap_spans) is bounded by the DETECTED pair
  set (fixed planted queries -> fixed pairs at every scale), so its
  wall must stay ~FLAT across a 16x corpus: the gram explodes are
  semi-joined to pair documents before anything widens, and every
  exchange is keyed by pair-set columns.

Single-shot walls (second run reported, first pays codegen); compare
shape.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tmdb_sync_spark.session import get_spark
from scripts.exp_scale_ramp import build_scaled


def main() -> None:
    from tmdb_sync_spark.functions.winnow import (
        substring_overlap,
        verify_overlap_spans,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp-verify-ramp")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    queries = (
        base.where((F.col("doc_id") % 97 == 0) & (F.length("text") >= 250))
        .limit(25)
        .select(
            F.col("doc_id").alias("query_id"),
            F.substring("text", 20, 160).alias("text"),
        )
        .localCheckpoint()
    )

    for k in (1, 16):
        scaled = build_scaled(spark, k)
        docs = spark.read.parquet(f"{scaled}/documents.parquet")
        corpus = docs.select(F.col("doc_id").alias("corpus_id"), "text")
        for rep in range(2):
            t0 = time.perf_counter()
            pairs = substring_overlap(
                queries, docs
            ).localCheckpoint(eager=True)
            detect_s = time.perf_counter() - t0
            n_pairs = pairs.count()
            t0 = time.perf_counter()
            spans = verify_overlap_spans(queries, corpus, pairs).collect()
            verify_s = time.perf_counter() - t0
        exact = sum(1 for s in spans
                    if s["q_start"] == 1 and s["match_len"] == 160)
        print(
            f"x{k}: corpus={docs.count()} detect={detect_s:.2f}s "
            f"pairs={n_pairs} verify={verify_s:.2f}s spans={len(spans)} "
            f"planted_exact={exact}/25",
            flush=True,
        )


if __name__ == "__main__":
    main()
