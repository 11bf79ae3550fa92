"""Single-writer guard on merge_into_partitioned: two concurrent merges
into one target_dir must not interleave the swap protocol or the manifest
read-modify-write — the second writer fails loudly; a lock abandoned by a
crashed writer is reclaimed."""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import threading

import pytest

from pyspark.sql import functions as F

from tmdb_sync_spark.io import table
from tmdb_sync_spark.plans import partitioned as pm
from tmdb_sync_spark.plans.partitioned import (
    ConcurrentMergeError,
    MERGE_LOCK_NAME,
    _acquire_merge_lock,
    merge_into_partitioned,
    write_partitioned,
)


def _fresh_target(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="mlock_")
    target = f"{d}/orders"
    orders = table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    write_partitioned(orders, target, "o_year")
    return target


def _source(spark, target):
    base = spark.read.parquet(target)
    return base.where(F.col("o_orderkey") % 11 == 0).select(
        "o_orderkey", "o_year",
        (F.col("o_totalprice") + 1).alias("o_totalprice"),
    )


def test_two_threads_exactly_one_merges(spark, sf_dir, monkeypatch):
    """Thread 1 holds the lock inside the merge window; thread 2's attempt
    during that window raises ConcurrentMergeError; thread 1 completes."""
    target = _fresh_target(spark, sf_dir)
    src = _source(spark, target).cache()
    src.count()

    inside = threading.Event()       # t1 is under the lock, pre-swap
    proceed = threading.Event()      # t2 has finished failing
    real_recover = pm._recover_leftovers
    first = threading.Event()

    def gated_recover(path):
        real_recover(path)
        if first.is_set():
            return                   # only gate the first (winning) entry
        first.set()
        inside.set()
        assert proceed.wait(timeout=60), "loser thread never finished"

    monkeypatch.setattr(pm, "_recover_leftovers", gated_recover)
    results: dict = {}

    def winner():
        try:
            results["winner"] = merge_into_partitioned(
                spark, target, src, keys=["o_orderkey"],
                partition_col="o_year",
            )
        except BaseException as e:   # pragma: no cover - diagnostic
            results["winner_err"] = e
            proceed.set()

    t1 = threading.Thread(target=winner)
    t1.start()
    try:
        assert inside.wait(timeout=60), "winner never reached the window"
        with pytest.raises(ConcurrentMergeError):
            merge_into_partitioned(
                spark, target, src, keys=["o_orderkey"],
                partition_col="o_year",
            )
    finally:
        proceed.set()
        t1.join(timeout=120)
    assert "winner_err" not in results, results.get("winner_err")
    assert results["winner"]["touched"]
    # the winner's finally released the lock
    assert not os.path.exists(os.path.join(target, MERGE_LOCK_NAME))
    src.unpersist()


def _dead_pid() -> int:
    p = subprocess.Popen([sys.executable, "-c", "pass"])
    p.wait()
    return p.pid


def test_stale_lock_from_dead_pid_is_reclaimed(spark, sf_dir):
    target = _fresh_target(spark, sf_dir)
    with open(os.path.join(target, MERGE_LOCK_NAME), "w") as fh:
        fh.write(f"{_dead_pid()} 0.0\n")
    res = merge_into_partitioned(
        spark, target, _source(spark, target), keys=["o_orderkey"],
        partition_col="o_year",
    )
    assert res["touched"]
    assert not os.path.exists(os.path.join(target, MERGE_LOCK_NAME))


def test_garbled_lock_is_reclaimed(tmp_path):
    target = str(tmp_path)
    with open(os.path.join(target, MERGE_LOCK_NAME), "w") as fh:
        fh.write("not-a-pid\n")
    lock = _acquire_merge_lock(target)
    assert os.path.exists(lock)
    with open(lock) as fh:
        assert int(fh.read().split()[0]) == os.getpid()
    os.unlink(lock)


def test_live_lock_raises(tmp_path):
    target = str(tmp_path)
    lock = _acquire_merge_lock(target)           # our own live pid holds it
    try:
        with pytest.raises(ConcurrentMergeError):
            _acquire_merge_lock(target)
    finally:
        os.unlink(lock)


def test_lock_is_born_with_payload_and_leaves_no_residue(tmp_path):
    """The lock must appear WITH its pid in one atomic step (os.link from
    a pre-written temp): a create-then-write would expose an empty file a
    concurrent reader would treat as garbled and reclaim from a LIVE
    writer. Also: no .tmp residue on either the success or the
    contention path."""
    target = str(tmp_path)
    lock = _acquire_merge_lock(target)
    with open(lock) as fh:
        assert int(fh.read().split()[0]) == os.getpid()
    with pytest.raises(ConcurrentMergeError):
        _acquire_merge_lock(target)
    os.unlink(lock)
    leftovers = [e for e in os.listdir(target) if ".tmp." in e]
    assert leftovers == []


def test_write_partitioned_respects_live_merge_lock(spark, sf_dir, tmp_path):
    """A full-table overwrite must not start while a merge holds the
    table: racing one would delete the merge's in-flight dirs (and the
    holder's lock) silently."""
    target = str(tmp_path / "orders")
    orders = table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    write_partitioned(orders, target, "o_year")        # takes+releases
    assert not os.path.exists(os.path.join(target, MERGE_LOCK_NAME))
    lock = _acquire_merge_lock(target)                 # simulate live merge
    try:
        with pytest.raises(ConcurrentMergeError):
            write_partitioned(orders, target, "o_year")
    finally:
        os.unlink(lock)


def test_dir_lock_mutual_exclusion_under_contention(tmp_path):
    """8 threads hammer one directory with wait-mode acquires around a
    deliberately unsynchronized critical section; the lock alone must
    serialize them (no overlap ever observed), including through the
    stale-reclaim path seeded by a garbled lock file."""
    import time as _time

    from tmdb_sync_spark.util import acquire_dir_lock, release_dir_lock

    target = str(tmp_path)
    # seed a garbled lock so the first winners exercise reclaim too
    with open(os.path.join(target, "_stress.lock"), "w") as fh:
        fh.write("garbage\n")
    active = [0]
    overlaps = []
    errors = []

    def worker():
        try:
            for _ in range(15):
                lock = acquire_dir_lock(target, "_stress.lock", wait_s=60)
                active[0] += 1
                if active[0] != 1:
                    overlaps.append(active[0])
                _time.sleep(0.002)
                active[0] -= 1
                release_dir_lock(lock)
        except BaseException as e:  # pragma: no cover - diagnostic
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
    assert overlaps == []
    assert not os.path.exists(os.path.join(target, "_stress.lock"))


def test_break_merge_lock_escape_hatch(tmp_path):
    """Operator escape hatch for a pid-recycled stuck lock: removes the
    lock (returns True), is a no-op on an unlocked table (False), and
    unblocks the next merge acquire."""
    from tmdb_sync_spark.plans.partitioned import break_merge_lock

    target = str(tmp_path)
    assert break_merge_lock(target) is False
    lock = _acquire_merge_lock(target)
    assert os.path.exists(lock)
    assert break_merge_lock(target) is True
    # table is acquirable again
    lock2 = _acquire_merge_lock(target)
    os.unlink(lock2)


def test_concurrent_overwrites_one_table_never_interleave(spark, tmp_path):
    """Two threads overwriting one table with DIFFERENT data: each
    attempt either completes or raises ConcurrentMergeError — and the
    final table is exactly ONE writer's dataset, with no hidden
    leftovers and no staging residue. The staging+swap rework must not
    have loosened the single-writer discipline."""
    import threading

    target = str(tmp_path / "t")
    d0 = spark.createDataFrame(
        [(i, i % 3, 0.0) for i in range(300)], "k BIGINT, y INT, p DOUBLE"
    )
    write_partitioned(d0, target, "y")     # table exists before the race

    datasets = {
        1: [(i, i % 4, 1.0) for i in range(400)],
        2: [(i, i % 5, 2.0) for i in range(500)],
    }
    outcomes = {}

    def run(tag):
        df = spark.createDataFrame(
            datasets[tag], "k BIGINT, y INT, p DOUBLE"
        )
        try:
            write_partitioned(df, target, "y")
            outcomes[tag] = "ok"
        except ConcurrentMergeError:
            outcomes[tag] = "locked"

    threads = [threading.Thread(target=run, args=(t,)) for t in (1, 2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(300)
    assert len(outcomes) == 2 and "ok" in outcomes.values()

    spark.catalog.refreshByPath(target)
    rows = [(r.k, r.y, r.p) for r in spark.read.parquet(target).collect()]
    winners = [t for t, o in outcomes.items() if o == "ok"]
    # final state is exactly one successful writer's dataset — which one
    # depends on scheduling when both succeeded serially
    assert sorted(rows) in [sorted(datasets[t]) for t in winners], (
        f"table is a mix; outcomes={outcomes}"
    )
    assert not [e for e in os.listdir(target) if e.startswith(".")]
    assert not os.path.exists(target + "__staging")
    assert not os.path.exists(os.path.join(target, MERGE_LOCK_NAME))
