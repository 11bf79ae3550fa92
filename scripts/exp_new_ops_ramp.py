#!/usr/bin/env python3
"""Scale ramp for the round-7 continuation operators: chunking,
corpus_report, and the streaming watermark dedup.

Claims under test:
- chunk_documents / chunk_documents_tokens: pure per-row flatMap —
  wall-clock ~ linear in corpus chars (token variant pays the extra
  split+join CPU), never superlinear, no shuffle at any scale.
- corpus_report: one scan + sketch shuffle — ~linear in rows, and the
  rollup's Expand multiplier (d+1 = 3 row copies map-side) should show
  as a constant factor vs a plain single-level aggregate, not a scaling
  break.
- run_dedup_stream: per-batch work ~ input size; dedup STATE is
  bounded by keys-in-horizon (state_rows_total from the telemetry), so
  ramping the event count with a fixed horizon must grow emitted rows
  linearly while the final state size tracks keys-in-horizon, not
  history.

Run: python -u scripts/exp_new_ops_ramp.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts.exp_scale_ramp import RAMP_ROOT, build_scaled, timed  # noqa: E402
from tmdb_sync_spark.functions.chunking import (  # noqa: E402
    chunk_documents,
    chunk_documents_tokens,
)
from tmdb_sync_spark.functions.stats import corpus_report  # noqa: E402
from tmdb_sync_spark.session import get_spark  # noqa: E402

SCALES = [1, 4, 16]


def main() -> None:
    spark = get_spark("new-ops-ramp")
    spark.sparkContext.setLogLevel("ERROR")

    print("== chunking + corpus_report ramp ==")
    for k in SCALES + [64]:
        d = build_scaled(spark, k)
        docs = spark.read.parquet(f"{d}/documents.parquet")
        t_chars = timed(lambda: chunk_documents(docs, 512, 64))
        t_toks = timed(lambda: chunk_documents_tokens(docs, 64, 8))
        t_report = timed(
            lambda: corpus_report(docs, ("source", "lang")), reps=2
        )
        # plain single-level aggregate as the Expand-factor reference
        t_flat = timed(
            lambda: docs.groupBy("source", "lang").agg(
                F.count(F.lit(1)).alias("n"),
                F.approx_count_distinct("doc_id", 0.02).alias("nd"),
                F.sum("n_chars").alias("s"),
                F.percentile_approx("n_chars", 0.5, 10_000).alias("q"),
            ),
            reps=2,
        )
        print(
            f"x{k}: chunk_chars={t_chars}s chunk_tokens={t_toks}s "
            f"report={t_report}s flat_agg={t_flat}s"
        )

    print("== streaming dedup ramp (events x1/x4/x16, 20% redelivery) ==")
    from tmdb_sync_spark.streaming.dedup import run_dedup_stream

    base_events = 100_000
    for k in SCALES:
        src = f"{RAMP_ROOT}/dedup_ev_x{k}"
        state = f"{RAMP_ROOT}/dedup_state_x{k}"
        if not os.path.isdir(src):
            n = base_events * k
            ev = (
                spark.range(n)
                .select(
                    F.col("id").alias("event_id"),
                    (
                        F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                        + F.make_dt_interval(
                            F.lit(0), F.lit(0), F.lit(0),
                            (F.col("id") % 86_400).cast("double"),
                        )
                    ).alias("ts"),
                    F.lit("p").alias("payload"),
                )
            )
            dup = ev.where(F.col("event_id") % 5 == 0)  # 20% redelivered
            # 8 time-ordered files (range-partitioned by ts) so the
            # 1-file-per-trigger drain advances the watermark between
            # micro-batches — a single availableNow mega-batch could
            # never evict, and the bounded-state claim would be vacuous
            (
                ev.unionByName(dup)
                .repartitionByRange(8, "ts")
                .sortWithinPartitions("ts")
                .write.parquet(src)
            )
            # pin ARRIVAL order to ts order: the file source breaks
            # same-mtime ties arbitrarily, and a latest-file-first drain
            # advances the watermark past every other file — they all
            # drop as late data (real streaming semantics; an unordered
            # replay is the wrong harness for an in-order feed)
            import glob

            parts = sorted(glob.glob(f"{src}/part-*"))
            now = time.time()
            for i, p in enumerate(parts):
                os.utime(p, (now + i, now + i))
        t0 = time.perf_counter()
        res = run_dedup_stream(
            spark, src, "event_id BIGINT, ts TIMESTAMP, payload STRING",
            state, keys=["event_id"], delay="10 minutes",
            max_files_per_trigger=1,
        )
        t = round(time.perf_counter() - t0, 3)
        print(
            f"x{k}: {t}s in={res['input_rows']} out={res['emitted_rows']} "
            f"state_total={res['state_rows_total']} "
            f"state_removed={res['state_rows_removed']}"
        )


if __name__ == "__main__":
    main()
