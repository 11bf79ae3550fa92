"""Session-conf hygiene of the finite streaming harness
(streaming/windows.py:_run_to_parquet)."""

from __future__ import annotations

import threading

import tmdb_sync_spark.all_queries  # noqa: F401  (populates the registry)
from tmdb_sync_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_concurrent_streaming_runs_restore_session_conf(spark):
    """Overlapping driver-thread streaming runs must leave the main
    session's shuffle-partition and no-data-micro-batch confs exactly as
    found. The streaming confs now live on per-run sub-sessions
    (``_events_stream``), so the main session is never written at all —
    this pins that isolation (and that concurrent runs both complete)."""
    before_parts = spark.conf.get("spark.sql.shuffle.partitions")
    before_nodata = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled")
    errors: list[Exception] = []
    counts: list[int] = []

    def run(name: str) -> None:
        try:
            counts.append(QUERIES[name](spark, SF).count())
        except Exception as e:  # surfaced below; a hang would time out
            errors.append(e)

    threads = [
        threading.Thread(target=run, args=(n,))
        for n in ("st_tumbling_window", "st_session_window")
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(300)
    assert not errors
    assert len(counts) == 2 and all(c > 0 for c in counts)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before_parts
    assert spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled") == before_nodata
