"""Persisted winnow-fingerprint index (functions/winnow_index.py):
incremental build across drops, bucket-pruned substring-contamination
probe, boilerplate df-cap, store contract, single-writer lock, and
journaled compaction — the operational contracts the sibling indexes
pin, applied to the third index family."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from tmdb_sync_spark.functions.winnow import WINNOW_K, WINNOW_W
from tmdb_sync_spark.functions.winnow_index import (
    append_fingerprints_to_index,
    compact_fp_index,
    fp_index_exists,
    substring_contamination_check,
)

BOILER = "all rights reserved contact support for help "


def _corpus_rows(lo, hi):
    return [
        (i, BOILER + f"body {i} " + f"unique corpus content {i} " * 6)
        for i in range(lo, hi)
    ]


def _docs(spark, rows, id_col="doc_id"):
    return spark.createDataFrame(rows, f"{id_col} long, text string")


@pytest.fixture()
def index_path(tmp_path):
    return os.path.join(str(tmp_path), "fp_index")


def test_incremental_build_and_probe(spark, index_path):
    # two drops, appended separately (the incremental shape)
    append_fingerprints_to_index(spark, index_path,
                                 _docs(spark, _corpus_rows(1, 6)))
    append_fingerprints_to_index(spark, index_path,
                                 _docs(spark, _corpus_rows(6, 11)))
    assert fp_index_exists(index_path)

    # eval doc 100 embeds a paragraph of corpus doc 7 (from drop 2)
    # inside otherwise-novel text; eval doc 200 is clean
    stolen = ("body 7 " + "unique corpus content 7 " * 6)[:90]
    ev = _docs(spark, [
        (100, "a novel eval question about something, except: " + stolen),
        (200, "entirely clean evaluation prompt with fresh wording only"),
    ])
    got = {
        (r["doc_id"], r["corpus_doc_id"]): r
        for r in substring_contamination_check(
            spark, index_path, ev, min_shared=2).collect()
    }
    assert (100, 7) in got
    assert got[(100, 7)]["c_span_chars"] >= WINNOW_K + WINNOW_W - 1
    assert all(d != 200 for d, _ in got)          # clean doc stays clean


def test_boilerplate_df_cap_suppresses_shared_header(spark, index_path):
    """Every corpus doc carries BOILER; an eval doc made ONLY of the
    boilerplate must not light up the whole corpus — its fingerprints
    exceed the df cap and are dropped from the probe."""
    append_fingerprints_to_index(spark, index_path,
                                 _docs(spark, _corpus_rows(1, 20)))
    ev = _docs(spark, [(300, BOILER)])
    got = substring_contamination_check(
        spark, index_path, ev, min_shared=1, df_cap=5
    )
    assert got.count() == 0


def test_missing_index_raises_never_reports_clean(spark, tmp_path):
    ev = _docs(spark, [(1, "anything at all, long enough to fingerprint")])
    with pytest.raises(ValueError, match="no fingerprint index"):
        substring_contamination_check(
            spark, str(tmp_path / "never_built"), ev
        )
    # and the probe created nothing on disk
    assert not os.path.exists(str(tmp_path / "never_built"))


def test_store_contract_refuses_mismatched_constants(spark, index_path):
    append_fingerprints_to_index(spark, index_path,
                                 _docs(spark, _corpus_rows(1, 3)))
    f = os.path.join(index_path, "_store_contract.json")
    with open(f) as fh:
        rec = json.load(fh)
    assert rec["k"] == WINNOW_K
    rec["k"] = WINNOW_K + 4                  # an index built by other code
    with open(f, "w") as fh:
        json.dump(rec, fh)
    with pytest.raises(ValueError, match="store contract mismatch"):
        append_fingerprints_to_index(spark, index_path,
                                     _docs(spark, _corpus_rows(3, 5)))
    with pytest.raises(ValueError, match="store contract mismatch"):
        substring_contamination_check(
            spark, index_path, _docs(spark, [(1, "x" * 40)])
        )


def test_concurrent_writer_lock_enforced(spark, index_path):
    """Two appends cannot interleave: the second waits on the writer
    lock and fails loudly when it cannot get it (the sibling indexes'
    contract)."""
    from tmdb_sync_spark.plans.partitioned import MERGE_LOCK_NAME
    from tmdb_sync_spark.util import (
        ConcurrentWriterError,
        acquire_dir_lock,
        release_dir_lock,
    )

    append_fingerprints_to_index(spark, index_path,
                                 _docs(spark, _corpus_rows(1, 3)))
    held = acquire_dir_lock(index_path, MERGE_LOCK_NAME, wait_s=5)
    try:
        with pytest.raises(ConcurrentWriterError):
            append_fingerprints_to_index(
                spark, index_path, _docs(spark, _corpus_rows(3, 5)),
                lock_wait_s=0.2,
            )
    finally:
        release_dir_lock(held)
    # lock released → the append goes through
    append_fingerprints_to_index(spark, index_path,
                                 _docs(spark, _corpus_rows(3, 5)))


def test_compaction_preserves_probe_results(spark, index_path):
    for lo, hi in ((1, 4), (4, 7), (7, 10)):    # many small appends
        append_fingerprints_to_index(spark, index_path,
                                     _docs(spark, _corpus_rows(lo, hi)))
    stolen = ("body 5 " + "unique corpus content 5 " * 6)[:90]
    ev = _docs(spark, [(100, "eval wrapper text around: " + stolen)])

    def probe():
        return sorted(
            map(tuple, substring_contamination_check(
                spark, index_path, ev, min_shared=2).collect())
        )

    before = probe()
    stats = compact_fp_index(spark, index_path)
    assert stats["files_after"] < stats["files_before"]
    assert stats["rows"] > 0
    spark.catalog.refreshByPath(index_path)
    assert probe() == before and len(before) >= 1


def test_broadcast_gate_shuffle_path_identical(spark, index_path,
                                               monkeypatch):
    """r9 verdict #2: the probe's distinct-fp set must obey the SAME
    broadcast row-count gate as the (doc, fp) join. With the gate forced
    to 0 (every probe 'too big'), both joins take the shuffle path and
    the detected pairs must be identical to the broadcast path's."""
    import tmdb_sync_spark.functions.winnow_index as wi

    append_fingerprints_to_index(spark, index_path,
                                 _docs(spark, _corpus_rows(1, 10)))
    stolen = ("body 4 " + "unique corpus content 4 " * 6)[:90]
    ev = _docs(spark, [
        (100, "wrapper around the stolen paragraph: " + stolen),
        (200, "clean eval text sharing nothing with the corpus at all"),
    ])

    def probe():
        return sorted(
            map(tuple, substring_contamination_check(
                spark, index_path, ev, min_shared=2).collect())
        )

    broadcast_pairs = probe()
    monkeypatch.setattr(wi, "BROADCAST_PROBE_MAX_ROWS", 0)
    shuffle_pairs = probe()
    assert shuffle_pairs == broadcast_pairs and len(broadcast_pairs) >= 1


def test_compaction_holds_writer_lock(spark, index_path):
    """r9 advice: the compaction snapshot must be taken UNDER the writer
    lock — an append committing between a pre-lock listing and the
    rewrite would be silently dropped. Pin the mechanism: a held lock
    makes compaction fail loudly instead of snapshotting around it."""
    from tmdb_sync_spark.plans.partitioned import MERGE_LOCK_NAME
    from tmdb_sync_spark.util import (
        ConcurrentWriterError,
        acquire_dir_lock,
        release_dir_lock,
    )

    append_fingerprints_to_index(spark, index_path,
                                 _docs(spark, _corpus_rows(1, 4)))
    held = acquire_dir_lock(index_path, MERGE_LOCK_NAME, wait_s=5)
    try:
        with pytest.raises(ConcurrentWriterError):
            compact_fp_index(spark, index_path, lock_wait_s=0.2)
    finally:
        release_dir_lock(held)
    stats = compact_fp_index(spark, index_path)       # lock free → works
    assert stats["rows"] > 0


def test_degenerate_eval_sets(spark, index_path):
    """Edge contracts: an eval set with only sub-K (or NULL) texts has
    no fingerprints by definition — the probe returns an EMPTY frame
    (never an error, never a scan of the whole index); same for an
    eval set whose fingerprints simply match nothing."""
    append_fingerprints_to_index(spark, index_path,
                                 _docs(spark, _corpus_rows(1, 4)))
    short = _docs(spark, [(1, "tiny"), (2, None)])
    assert substring_contamination_check(spark, index_path, short).count() == 0
    novel = _docs(spark, [(3, "fresh wording that shares nothing at all "
                              "with the indexed corpus body text")])
    assert substring_contamination_check(spark, index_path, novel).count() == 0


def test_auto_compaction_on_append(spark, index_path):
    """The fingerprint index's append auto-compacts past the shared
    files-per-bucket threshold (r9 verdict #5) and probe results are
    unchanged across the self-triggered rewrite."""
    from tmdb_sync_spark.util import count_bucket_files

    for lo, hi in ((1, 4), (4, 7)):
        append_fingerprints_to_index(
            spark, index_path, _docs(spark, _corpus_rows(lo, hi)),
            auto_compact_files_per_bucket=16,
        )
    _, worst = count_bucket_files(index_path, "bb=")
    assert worst >= 2

    stolen = ("body 2 " + "unique corpus content 2 " * 6)[:90]
    ev = _docs(spark, [(100, "eval wrapper around: " + stolen)])
    before = sorted(
        map(tuple, substring_contamination_check(
            spark, index_path, ev, min_shared=2).collect())
    )
    assert before

    # second drop shares NO text with the eval doc, so the probe result
    # must be unchanged — only the compaction (and index growth) happens
    append_fingerprints_to_index(
        spark, index_path,
        _docs(spark, [(i, f"totally unrelated drop text number {i} " * 4)
                      for i in (7, 8, 9)]),
        auto_compact_files_per_bucket=1,
    )
    _, worst_after = count_bucket_files(index_path, "bb=")
    assert worst_after == 1
    spark.catalog.refreshByPath(index_path)
    after = sorted(
        map(tuple, substring_contamination_check(
            spark, index_path, ev, min_shared=2).collect())
    )
    assert after == before
