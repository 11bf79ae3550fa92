#!/usr/bin/env python3
"""Decompose the streaming drain quartet's fixed overhead (r13 item #1).

For each st_* query, times with a perf_counter stopwatch around the
internal stages by monkey-patching seams:
  construct  = _events_stream() build (sub-session, footer sniff, schema)
  drain      = writeStream start → awaitTermination
  readback   = spark.read.parquet(out) + noop write of the returned frame

Then A/Bs SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS in {8, 4, 2, 1} —
interleaved, warm medians of N reps — and reports micro-batch counts.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tmdb_sync_spark.session import get_spark

QS = ["st_tumbling_window", "st_sliding_window",
      "st_session_window", "st_stateful_user_agg"]
REPS = int(os.environ.get("REPS", "4"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp-stream-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    import tmdb_sync_spark.all_queries  # noqa: F401
    from tmdb_sync_spark.registry import QUERIES
    import tmdb_sync_spark.streaming.windows as W

    # warm JVM + python workers
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    QUERIES["st_tumbling_window"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()

    # ---- stage decomposition (at the default partition count) ----
    orig_run = W._run_to_parquet
    orig_stream = W._events_stream
    stages: dict[str, float] = {}

    def timed_stream(spark_, sf_dir_):
        t0 = time.perf_counter()
        out = orig_stream(spark_, sf_dir_)
        stages["construct"] = stages.get("construct", 0) + (
            time.perf_counter() - t0)
        return out

    def timed_run(agg, mode):
        t0 = time.perf_counter()
        out = orig_run(agg, mode)
        stages["drain"] = stages.get("drain", 0) + (time.perf_counter() - t0)
        return out

    W._events_stream = timed_stream
    W._run_to_parquet = timed_run
    decomp = {}
    try:
        for name in QS:
            per = []
            for _ in range(REPS):
                stages.clear()
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                total = time.perf_counter() - t0
                per.append({
                    "total": round(total, 3),
                    "construct": round(stages.get("construct", 0), 3),
                    "drain": round(stages.get("drain", 0), 3),
                    "rest": round(total - stages.get("construct", 0)
                                  - stages.get("drain", 0), 3),
                })
            decomp[name] = per
    finally:
        W._events_stream = orig_stream
        W._run_to_parquet = orig_run
    print(json.dumps({"decompose": decomp}), flush=True)

    # ---- interleaved partition-count A/B ----
    results: dict[str, dict[str, list[float]]] = {
        name: {} for name in QS}
    for rep in range(REPS):
        for parts in ("8", "4", "2", "1"):
            os.environ["SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS"] = parts
            for name in QS:
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                results[name].setdefault(parts, []).append(
                    round(time.perf_counter() - t0, 3))
    os.environ.pop("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", None)
    print(json.dumps({"partition_ab": results}), flush=True)


if __name__ == "__main__":
    main()
