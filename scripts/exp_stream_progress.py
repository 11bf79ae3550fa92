#!/usr/bin/env python3
"""Inspect the streaming drains' per-trigger durations (r13 item #1):
how many micro-batches run, and where triggerExecution time goes
(latestOffset / getBatch / queryPlanning / walCommit / addBatch /
commitOffsets / state-store ops). Plus a MINIMAL drain (readStream →
project → foreachBatch no-op) to bound the machinery floor.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tmdb_sync_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp-stream-progress")
    spark.sparkContext.setLogLevel("ERROR")
    import tmdb_sync_spark.all_queries  # noqa: F401
    import tmdb_sync_spark.streaming.windows as W
    from tmdb_sync_spark.registry import QUERIES
    from tmdb_sync_spark.util import scratch_dir

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    QUERIES["st_tumbling_window"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()

    # patch _run_to_parquet to capture progress
    orig = W._run_to_parquet
    captured: list = []

    def capturing(agg, mode):
        out = scratch_dir("st_out_")
        ckpt = scratch_dir("st_ckpt_")
        write_mode = "overwrite" if mode == "complete" else "append"

        def sink(batch_df, _epoch):
            batch_df.write.mode(write_mode).parquet(out)

        t0 = time.perf_counter()
        q = (agg.writeStream.foreachBatch(sink).outputMode(mode)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        t_started = time.perf_counter() - t0
        q.awaitTermination()
        t_total = time.perf_counter() - t0
        captured.append({
            "start_s": round(t_started, 3),
            "drain_s": round(t_total, 3),
            "progress": [json.loads(p.json) for p in q.recentProgress],
        })
        return out

    W._run_to_parquet = capturing
    try:
        for name in ["st_tumbling_window", "st_sliding_window",
                     "st_session_window", "st_stateful_user_agg"]:
            captured.clear()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            for c in captured:
                summary = {
                    "query": name, "start_s": c["start_s"],
                    "drain_s": c["drain_s"],
                    "n_batches": len(c["progress"]),
                    "batches": [
                        {"batchId": p.get("batchId"),
                         "numInputRows": p.get("numInputRows"),
                         "durationMs": p.get("durationMs"),
                         "state": [
                             {k: so.get(k) for k in (
                                 "numRowsTotal", "numRowsUpdated",
                                 "commitTimeMs", "numShufflePartitions")}
                             for so in p.get("stateOperators", [])],
                         } for p in c["progress"]],
                }
                print(json.dumps(summary), flush=True)
    finally:
        W._run_to_parquet = orig

    # minimal drain floor: no aggregation, no state — machinery only
    sub = spark.newSession()
    sub.conf.set("spark.sql.shuffle.partitions", "8")
    sub.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    stream = W._events_stream(spark, sf_dir)
    for rep in range(3):
        out = scratch_dir("st_min_out_")
        ckpt = scratch_dir("st_min_ckpt_")

        def sink(batch_df, _epoch):
            batch_df.write.mode("append").parquet(out)

        t0 = time.perf_counter()
        q = (stream.select("user_id").writeStream.foreachBatch(sink)
             .outputMode("append").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        print(json.dumps({
            "minimal_drain_s": round(time.perf_counter() - t0, 3),
            "n_batches": len(q.recentProgress),
            "durations": [json.loads(p.json).get("durationMs")
                          for p in q.recentProgress],
        }), flush=True)


if __name__ == "__main__":
    main()
