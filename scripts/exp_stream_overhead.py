#!/usr/bin/env python3
"""One-session A/B: streaming-window cost vs shuffle partitions / state store.

Times each st_* query (noop sink, warm = 2nd run) under:
  A. shuffle.partitions=32 (status quo)
  B. shuffle.partitions=8
  C. shuffle.partitions=8 + RocksDB state store
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tmdb_sync_spark.session import get_spark

QUERIES_UNDER_TEST = ["st_tumbling_window", "st_sliding_window",
                      "st_session_window", "st_stateful_user_agg"]
ROCKSDB = ("org.apache.spark.sql.execution.streaming."
           "state.RocksDBStateStoreProvider")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp-stream-overhead")
    spark.sparkContext.setLogLevel("ERROR")
    import tmdb_sync_spark.all_queries  # noqa: F401
    from tmdb_sync_spark.registry import QUERIES

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    QUERIES["st_tumbling_window"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()

    def run_config(label: str, parts: str, provider: str | None) -> None:
        # _run_to_parquet pins the streaming shuffle partitions from this
        # env var around every start() — setting the session conf here
        # would be silently overridden (so set the env, as a caller would)
        os.environ["SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS"] = parts
        if provider:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                           provider)
        out = {}
        for name in QUERIES_UNDER_TEST:
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                runs.append(time.perf_counter() - t0)
            out[name] = [round(r, 3) for r in runs]
        print(json.dumps({"config": label, "timings_cold_warm": out}),
              flush=True)
        os.environ.pop("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", None)
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    run_config("A_32parts_hdfs", "32", None)
    run_config("B_8parts_hdfs", "8", None)
    run_config("C_8parts_rocksdb", "8", ROCKSDB)
    run_config("A2_32parts_hdfs_again", "32", None)


if __name__ == "__main__":
    main()
