"""Streaming watermark-dedup contracts: cross-batch redelivery dropped,
state actually evicted (telemetry), the bounded-state tradeoff visible
(fresh-timestamped redelivery past the horizon re-emits), checkpoint
resume, and the batch-oracle set equality for the within-horizon case."""

from __future__ import annotations

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from tmdb_sync_spark.streaming.dedup import (
    dedup_within_watermark,
    run_dedup_stream,
)

SCHEMA = "event_id BIGINT, ts TIMESTAMP, payload STRING"


def _write_file(spark, tmp_path, src_dir, name, rows, order):
    """One single-file parquet drop with pinned arrival order."""
    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts_s STRING, payload STRING"
    ).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "payload"
    )
    stage = tmp_path / f"_stage_{name}"
    df.coalesce(1).write.parquet(str(stage))
    part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
    dst = src_dir / f"{name}.parquet"
    shutil.move(str(stage / part), str(dst))
    os.utime(dst, (time.time() + order, time.time() + order))


@pytest.mark.slow
def test_cross_batch_redelivery_dropped_and_state_evicted(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # batch 1: keys 0..9 in the first minutes of hour 0
    _write_file(
        spark, tmp_path, src, "a",
        [(k, f"2024-01-01 00:0{k % 6}:00", f"p{k}") for k in range(10)],
        order=0,
    )
    # batch 2: redelivers 0..4 with slightly shifted event times (the
    # at-least-once shape) + fresh keys 10..14
    _write_file(
        spark, tmp_path, src, "b",
        [(k, "2024-01-01 00:06:00", f"p{k}") for k in range(5)]
        + [(k, "2024-01-01 00:07:00", f"p{k}") for k in range(10, 15)],
        order=1,
    )
    # batch 3: event time jumps 2 hours — at its END the watermark
    # passes every earlier key's horizon
    _write_file(
        spark, tmp_path, src, "c",
        [(20, "2024-01-01 02:00:00", "p20")], order=2,
    )
    # batch 4: physical eviction happens HERE (removal runs in the
    # commit of the first batch whose watermark has passed the horizon
    # — probed: a redelivery in THIS batch would still be deduped, the
    # key's row being present-though-expired during the lookup)
    _write_file(
        spark, tmp_path, src, "c2",
        [(21, "2024-01-01 02:02:00", "p21")], order=3,
    )
    # batch 5: key 0 redelivered with a FRESH timestamp after its state
    # is physically gone ⇒ emitted AGAIN (the bounded-state tradeoff,
    # asserted visible rather than hidden)
    _write_file(
        spark, tmp_path, src, "d",
        [(0, "2024-01-01 02:03:00", "p0")], order=4,
    )
    res = run_dedup_stream(
        spark, str(src), SCHEMA, str(tmp_path / "state"),
        keys=["event_id"], delay="10 minutes", max_files_per_trigger=1,
    )
    assert res["batches"] >= 5
    assert res["input_rows"] == 23
    # 10 + (5 dropped + 5 fresh) + 1 + 1 + 1 re-emit = 23 in, 18 out
    assert res["emitted_rows"] == 18
    assert res["state_rows_removed"] > 0, "watermark never evicted state"

    out = spark.read.parquet(res["out_path"])
    per_key = {
        r["event_id"]: r["n"]
        for r in out.groupBy("event_id").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    # key 0: once in-horizon + once past-horizon = 2 emissions
    assert per_key[0] == 2
    # every in-horizon redelivery deduped to exactly one row
    assert all(per_key[k] == 1 for k in range(1, 15))
    assert per_key[20] == 1 and per_key[21] == 1


def test_checkpoint_resume_continues_dedup(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    state = str(tmp_path / "state")
    _write_file(
        spark, tmp_path, src, "a",
        [(k, "2024-01-01 00:00:00", "x") for k in range(10)], order=0,
    )
    r1 = run_dedup_stream(
        spark, str(src), SCHEMA, state, keys=["event_id"], delay="1 hour"
    )
    assert r1["emitted_rows"] == 10
    # second RUN (new query, same checkpoint): redelivers 0..4 within
    # the horizon + 5 fresh keys — the dedup state survives the restart
    _write_file(
        spark, tmp_path, src, "b",
        [(k, "2024-01-01 00:05:00", "x") for k in range(5)]
        + [(k, "2024-01-01 00:06:00", "x") for k in range(10, 15)],
        order=1,
    )
    r2 = run_dedup_stream(
        spark, str(src), SCHEMA, state, keys=["event_id"], delay="1 hour"
    )
    assert r2["emitted_rows"] == 5, "state did not survive the restart"
    assert spark.read.parquet(r2["out_path"]).count() == 15


def test_exact_redelivery_matches_batch_distinct(spark, tmp_path):
    """Identical-payload redeliveries within the horizon: streaming
    result set == batch dropDuplicates on the key (the oracle)."""
    src = tmp_path / "src"
    src.mkdir()
    rows = [(k, f"2024-01-01 00:{k:02d}:00", f"p{k}") for k in range(20)]
    dups = [rows[k] for k in (1, 3, 5, 7)]
    _write_file(spark, tmp_path, src, "a", rows[:10] + dups[:2], order=0)
    _write_file(spark, tmp_path, src, "b", rows[10:] + dups[2:], order=1)
    res = run_dedup_stream(
        spark, str(src), SCHEMA, str(tmp_path / "state"),
        keys=["event_id"], delay="2 hours", max_files_per_trigger=1,
    )
    got = sorted(
        (r["event_id"], r["payload"])
        for r in spark.read.parquet(res["out_path"]).collect()
    )
    want = sorted((k, p) for k, _, p in rows)
    assert got == want


def test_validation(spark, tmp_path):
    df = spark.createDataFrame([], SCHEMA)
    with pytest.raises(ValueError):
        dedup_within_watermark(df, [])
    with pytest.raises(ValueError):
        dedup_within_watermark(df, ["event_id", "ts"])
    with pytest.raises(ValueError):
        dedup_within_watermark(df, ["nope"])


def test_null_key_and_null_ts_semantics(spark, tmp_path):
    """Observed-and-pinned edge semantics: ALL NULL-key rows share one
    dedup state (first NULL-key arrival survives, the rest drop — the
    grouping reading of NULL, same as the batch groupBy operators), and
    a NULL event-time row is ADMITTED (emitted, deduped by key) rather
    than dropped — unlike the windowed aggregates, which discard
    NULL-event-time rows before windowing. Corpora where NULL ids/times
    are errors filter upstream; this pin makes the operator's actual
    contract visible instead of folklore."""
    src = tmp_path / "src"
    src.mkdir()
    _write_file(
        spark, tmp_path, src, "a",
        [(1, "2024-01-01 00:00:00", "a"),
         (None, "2024-01-01 00:01:00", "n1"),
         (None, "2024-01-01 00:02:00", "n2"),
         (2, None, "nots"),
         (1, "2024-01-01 00:03:00", "dup")],
        order=0,
    )
    res = run_dedup_stream(
        spark, str(src), SCHEMA, str(tmp_path / "state"),
        keys=["event_id"], delay="10 minutes",
    )
    assert res["input_rows"] == 5 and res["emitted_rows"] == 3
    got = sorted(
        (r["payload"])
        for r in spark.read.parquet(res["out_path"]).collect()
    )
    assert got == ["a", "n1", "nots"]


def test_sink_replay_is_idempotent(spark, tmp_path):
    """Maximal crash replay (checkpoint wiped, every file reprocessed
    with the same epoch ids): the output parquet is row-identical —
    each epoch dynamically overwrites its own batch_id partition
    instead of appending duplicates (review finding, pinned)."""
    src = tmp_path / "src"
    src.mkdir()
    _write_file(
        spark, tmp_path, src, "a",
        [(k, f"2024-01-01 00:0{k % 6}:00", f"p{k}") for k in range(6)],
        order=0,
    )
    _write_file(
        spark, tmp_path, src, "b",
        [(6, "2024-01-01 00:06:00", "p6"),
         (1, "2024-01-01 00:01:30", "dup")],
        order=1,
    )
    state = str(tmp_path / "state")
    res = run_dedup_stream(
        spark, str(src), SCHEMA, state,
        keys=["event_id"], delay="2 hours", max_files_per_trigger=1,
    )
    rows = sorted(
        (r["event_id"], r["payload"], r["batch_id"])
        for r in spark.read.parquet(res["out_path"]).collect()
    )
    assert len(rows) == 7  # the redelivery of key 1 deduped

    shutil.rmtree(os.path.join(state, "_ckpt_deduped"))
    res2 = run_dedup_stream(
        spark, str(src), SCHEMA, state,
        keys=["event_id"], delay="2 hours", max_files_per_trigger=1,
    )
    assert sorted(
        (r["event_id"], r["payload"], r["batch_id"])
        for r in spark.read.parquet(res2["out_path"]).collect()
    ) == rows


def test_caller_session_timezone_untouched(spark, tmp_path):
    """run_dedup_stream writes files and returns paths — it must not
    mutate the CALLER's session timezone (review finding, pinned)."""
    src = tmp_path / "src"
    src.mkdir()
    _write_file(
        spark, tmp_path, src, "a",
        [(1, "2024-01-01 00:00:00", "p")], order=0,
    )
    before = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        run_dedup_stream(
            spark, str(src), SCHEMA, str(tmp_path / "state"),
            keys=["event_id"],
        )
        assert spark.conf.get(
            "spark.sql.session.timeZone"
        ) == "America/New_York"
    finally:
        spark.conf.set("spark.sql.session.timeZone", before)


def test_fresh_checkpoint_wipes_orphaned_output(spark, tmp_path):
    """A wiped checkpoint restarts epochs at 0; if the replay carves
    FEWER micro-batches than the original drain, stale higher-batch_id
    partitions would survive dynamic overwrite and interleave with the
    new rows (ADVICE r7). The ckpt and output dir are one unit: a fresh
    checkpoint regenerates the output in full, so the orphaned output
    is wiped — pinned here with exactly that misaligned re-batching."""
    src = tmp_path / "src"
    src.mkdir()
    _write_file(
        spark, tmp_path, src, "a",
        [(k, f"2024-01-01 00:0{k % 6}:00", f"p{k}") for k in range(4)],
        order=0,
    )
    _write_file(
        spark, tmp_path, src, "b",
        [(8, "2024-01-01 00:06:00", "p8"),
         (9, "2024-01-01 00:07:00", "p9")],
        order=1,
    )
    state = str(tmp_path / "state")
    # original drain: one file per trigger -> batch ids 0 and 1
    res = run_dedup_stream(
        spark, str(src), SCHEMA, state,
        keys=["event_id"], delay="2 hours", max_files_per_trigger=1,
    )
    want = sorted(
        (r["event_id"], r["payload"])
        for r in spark.read.parquet(res["out_path"]).collect()
    )
    assert len(want) == 6

    # checkpoint wiped, replay drains BOTH files in ONE micro-batch:
    # epochs restart at 0 and batch_id=1 from the prior drain would be
    # stale — the auto-wipe regenerates instead of interleaving
    shutil.rmtree(os.path.join(state, "_ckpt_deduped"))
    res2 = run_dedup_stream(
        spark, str(src), SCHEMA, state,
        keys=["event_id"], delay="2 hours",
    )
    out = spark.read.parquet(res2["out_path"])
    assert sorted(
        (r["event_id"], r["payload"]) for r in out.collect()
    ) == want
    assert out.select("batch_id").distinct().count() == 1  # one epoch


def test_dup_key_distinct_rows_never_collide(spark, tmp_path):
    """r12 review finding: the old sentinel-joined concat key let two
    DISTINCT rows render identically ('click', NULL value, '1.0|x'
    props vs 'click|<NULL>', 1.0, 'x') — md5 collision, one row
    silently deduped away. The JSON-struct key makes field boundaries
    unambiguous; both adversarial pairs must keep distinct keys."""
    from tmdb_sync_spark.streaming.dedup import _redelivery_feed

    d = str(tmp_path / "sf")
    os.makedirs(d)
    rows = [
        # pair 1: the '|' + '<NULL>' forgery from the review
        (4, "2024-01-01 00:00:00", 7, "click", None, "1.0|x"),
        (4, "2024-01-01 00:00:00", 7, "click|<NULL>", 1.0, "x"),
        # pair 2: literal '<NULL>' string vs a real NULL
        (5, "2024-01-01 00:00:00", 7, "<NULL>", None, "p"),
        (5, "2024-01-01 00:00:00", 7, None, None, "p"),
    ]
    spark.createDataFrame(
        [(e, __import__("datetime").datetime.fromisoformat(t), u, et, v, p)
         for e, t, u, et, v, p in rows],
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")

    feed = _redelivery_feed(spark, d)
    keys = feed.select("event_id", "dup_key").distinct().collect()
    by_event = {}
    for r in keys:
        by_event.setdefault(r["event_id"], set()).add(r["dup_key"])
    assert len(by_event[4]) == 2, "pair 1 collided — key scheme broken"
    assert len(by_event[5]) == 2, "pair 2 collided — key scheme broken"
