"""Incremental near-dup filtering against a PERSISTED signature index
— dedup as a maintained index, not a batch job.

The batch operators (dedup.py, pipeline.py) LSH the whole corpus each
run. That is the right shape for a one-shot curation pass and the wrong
one for operations: a 100 TB corpus receiving daily drops cannot
re-shingle 100 TB to ask whether 10 GB of new documents are near-dups.
The operational shape is an INDEX:

- The index is the exploded LSH **band table** of every accepted
  document — rows ``(band_key, doc_id, h0..h7)``, hive-partitioned by
  ``bb = pmod(xxhash64(band_key), N_INDEX_BUCKETS)``. Signatures ride
  on each band row (4× duplication of eight 8-char strings) so a
  candidate match verifies WITHOUT a second lookup join into a
  doc-keyed table.
- A new drop is signed (the SAME ``minhash_signature`` the batch path
  uses — one signature function in the codebase, or index and batch
  silently diverge), exploded to bands, and **broadcast** against the
  index scan: the drop is small by definition, so the join plans as a
  BroadcastHashJoin with the index streaming MAP-SIDE — per-drop cost
  is one index scan, ZERO index shuffle, however big the corpus has
  grown (plan-asserted in tests). At real scale the scan itself is
  pruned by bucketing the table on ``band_key``; the partition layout
  here keeps append files grouped so a bucketed rewrite is mechanical.
- Within-drop near-dups are folded by the batch candidate machinery
  (``banded_pairs_with_overlap`` — skew guard included) with the
  pipeline's greedy keep-smallest-id rule; survivors' band rows are
  APPENDED to the index (append-only: an index row is never rewritten,
  so no swap protocol is needed — redelivery protection belongs to the
  drop cursor, e.g. streaming/file_ingest.py's file checkpoint).

Verification threshold: ``NEAR_DUP_MIN`` of ``N_HASHES`` equal
minhashes, the curation pipeline's policy (pipeline.py).

Concurrency: the index is append-only and concurrent appends are safe
(uniquely-named parquet files), but two drops deduped CONCURRENTLY
cannot see each other's in-flight signatures — near-dups split across
them both survive. Since r9 this is ENFORCED, not just documented
(r8 verdict #4): every write-path entry (``dedup_against_index`` with
``update_index=True``, ``append_docs_to_index``) holds the table's
single-writer lock (``util.acquire_dir_lock`` under the same
``_merge.lock`` name ``compact_index``'s journaled rewrite takes, so
appends and compaction mutually exclude too) for its probe→append
critical section: concurrent writers serialize for ``lock_wait_s``
and then fail LOUDLY (``ConcurrentWriterError``) instead of silently
missing each other's in-flight near-dups. The append-after-commit
composition (``update_index=False`` + ``append_docs_to_index`` after
the caller's merge) still needs its probe→append window serialized by
the caller — the drop-cursor model of streaming/file_ingest.py does —
because a lock cannot span two calls.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tmdb_sync_spark.functions.dedup import (
    N_BANDS,
    N_HASHES,
    banded_pairs_with_overlap,
    minhash_signature,
)
from tmdb_sync_spark.functions.pipeline import NEAR_DUP_MIN

N_INDEX_BUCKETS = 64

# Above this many PROBE band rows the match join drops its broadcast
# hint: force-broadcasting a huge "drop" (someone feeding a corpus
# through the incremental path) trades a shuffle for an executor OOM,
# which is the wrong trade. Same discipline as the engine's size-gated
# broadcast hints elsewhere (plans/joins). 2M rows of (band_key, 8
# hashes, id) ≈ low hundreds of MB — comfortably under the default
# broadcast ceiling with margin for skewed string lengths.
BROADCAST_PROBE_MAX_ROWS = 2_000_000

# Auto-compaction policy (r9 verdict #5), shared by all three index
# families: the append-only layout adds ≥1 file per touched bucket per
# drop, so a year of daily drops makes probes FILE-OPEN-bound (measured
# in scripts/exp_index_ramp.py / COVERAGE.md) — and compaction existed
# but had to be called by hand. Now every append path checks the worst
# bucket's data-file count AFTER its write, still under the writer lock
# it already holds, and compacts when the count exceeds this threshold.
# Amortization: compaction rewrites the whole index, so a threshold of
# T means each row is rewritten ~1/T of the drops — 16 keeps the
# amortized append overhead ~6% while capping probe file-opens at
# 16×buckets. Per-call override (or None = disabled) on every append
# entry point for callers that batch compaction into a maintenance
# window.
AUTO_COMPACT_FILES_PER_BUCKET = 16

_H = [f"h{i}" for i in range(N_HASHES)]


def _check_contract(index_path: str, what: str, record: bool = True) -> None:
    """The constants that define this index's KEY SPACE — band layout
    and bucket modulus. An index written under different values would
    be probed with non-matching band keys / pruned on the wrong bb
    partitions and silently MISS (r8 review sweep; same hazard class
    as the profile store's dim-schema guard)."""
    from tmdb_sync_spark.util import check_store_contract

    check_store_contract(
        index_path,
        {"kind": "minhash_band_index", "n_hashes": N_HASHES,
         "n_bands": N_BANDS, "n_index_buckets": N_INDEX_BUCKETS,
         "shingle_tokens": 3, "digest": "md5-8hex"},
        what,
        record=record,
    )


def _band_rows(sig: DataFrame) -> DataFrame:
    """Explode a signature frame to ``(band_key, doc_id, h*, bb)``."""
    band_cols = F.array(
        *[
            F.concat(
                F.lit(f"{j}:"), F.col(f"h{2 * j}"), F.col(f"h{2 * j + 1}")
            )
            for j in range(N_BANDS)
        ]
    )
    return sig.select(
        "doc_id", *_H, F.explode(band_cols).alias("band_key")
    ).withColumn(
        "bb", F.pmod(F.xxhash64("band_key"), F.lit(N_INDEX_BUCKETS))
    )


def index_match_pairs(
    idx: DataFrame, new_bands: DataFrame, min_equal: int = NEAR_DUP_MIN,
    probe_rows: int | None = None,
) -> DataFrame:
    """Verified (probe doc, indexed doc) near-dup matches: band
    equi-join with the PROBE side broadcast — the index streams
    map-side with ZERO index shuffle regardless of corpus size
    (plan-asserted in tests/test_dedup_index.py) — then signature
    verification on the band rows' carried hashes. Returns
    ``(doc_id, corpus_doc_id, n_equal_hashes)`` — one row per matched
    pair (band-deduped), the detail surface the contamination checker
    reports from.

    ``probe_rows``: the probe's known band-row count, when the caller
    has it. Above ``BROADCAST_PROBE_MAX_ROWS`` the broadcast hint is
    dropped — the join falls back to a plain equi-join (both sides
    shuffle) rather than OOM-broadcasting a corpus-sized "drop"."""
    n_equal = reduce(
        lambda x, y: x + y,
        [(F.col(f"i.{h}") == F.col(f"n.{h}")).cast("int") for h in _H],
    )
    probe = new_bands.alias("n")
    if probe_rows is None or probe_rows <= BROADCAST_PROBE_MAX_ROWS:
        probe = F.broadcast(probe)
    return (
        idx.alias("i")
        .join(
            probe,
            on=(F.col("i.band_key") == F.col("n.band_key"))
            & (F.col("i.bb") == F.col("n.bb")),
        )
        .where(n_equal >= min_equal)
        .select(
            F.col("n.doc_id").alias("doc_id"),
            F.col("i.doc_id").alias("corpus_doc_id"),
            n_equal.alias("n_equal_hashes"),
        )
        .distinct()
    )


def index_matches(
    idx: DataFrame, new_bands: DataFrame, min_equal: int = NEAR_DUP_MIN,
    probe_rows: int | None = None,
) -> DataFrame:
    """Just the matched probe doc_ids — the dedup filter's view of
    :func:`index_match_pairs`."""
    return (
        index_match_pairs(idx, new_bands, min_equal, probe_rows)
        .select("doc_id").distinct()
    )


def _index_writer_lock(index_path: str, wait_s: float):
    """The index's single-writer lock — the SAME ``_merge.lock`` name
    ``compact_index``'s write_partitioned takes, so drop appends and
    compaction serialize against each other as well as themselves."""
    from tmdb_sync_spark.plans.partitioned import MERGE_LOCK_NAME
    from tmdb_sync_spark.util import acquire_dir_lock

    return acquire_dir_lock(index_path, MERGE_LOCK_NAME, wait_s=wait_s)


def append_docs_to_index(
    spark: SparkSession, index_path: str, docs: DataFrame,
    *, lock_wait_s: float = 60.0,
    auto_compact_files_per_bucket: int | None = AUTO_COMPACT_FILES_PER_BUCKET,
) -> None:
    """Append ``docs``' band rows to the index — split out of
    :func:`dedup_against_index` so callers that MERGE survivors into a
    table first (streaming/file_ingest.py) can order the index update
    AFTER their commit point: a crash-replayed batch then re-dedups
    against an index that does NOT yet contain its own signatures,
    re-merges idempotently, and appends once. (Appending BEFORE the
    merge loses the whole batch on replay: the docs match their own
    signatures and never reach the table — found by this round's
    crash-ordering review of the composed ingest.)

    Holds the index writer lock for the append (module docstring,
    Concurrency): waits ``lock_wait_s`` for a concurrent writer, then
    raises ``ConcurrentWriterError``. Auto-compacts under that same
    lock when the append pushes any bucket past
    ``auto_compact_files_per_bucket`` files (policy note at the
    constant; ``None`` disables)."""
    from tmdb_sync_spark.util import release_dir_lock

    _check_contract(index_path, "append_docs_to_index")
    lock = _index_writer_lock(index_path, lock_wait_s)
    try:
        _append_band_rows(docs, index_path)
        _maybe_compact_locked(
            spark, index_path, auto_compact_files_per_bucket
        )
    finally:
        release_dir_lock(lock)


def _maybe_compact_locked(
    spark: SparkSession, index_path: str, threshold: int | None,
) -> bool:
    """Compact iff the worst bucket exceeds ``threshold`` data files —
    called by append paths while they still hold the writer lock."""
    from tmdb_sync_spark.util import count_bucket_files

    if threshold is None:
        return False
    if count_bucket_files(index_path, "bb=")[1] <= threshold:
        return False
    _compact_locked(spark, index_path)
    return True


def _append_band_rows(docs: DataFrame, index_path: str) -> None:
    (
        # one file per touched bucket, not a sliver per shuffle
        # partition (see dedup_against_index)
        _band_rows(minhash_signature(docs))
        .repartition("bb")
        .write.mode("append")
        .partitionBy("bb")
        .parquet(index_path)
    )


def contamination_check(
    spark: SparkSession,
    index_path: str,
    eval_docs: DataFrame,
    *,
    min_equal: int = NEAR_DUP_MIN,
) -> DataFrame:
    """Benchmark-contamination scan: which eval documents near-match
    the training corpus?

    The question is the dedup question pointed backwards — instead of
    dropping corpus docs that match the index, REPORT eval docs that
    do. ``eval_docs`` is ``(doc_id, text, ...)`` (an eval set: small
    by definition, so it broadcasts); the corpus is the maintained
    signature index. Returns one row per VERIFIED match —
    ``(doc_id, corpus_doc_id, n_equal_hashes)`` — lazy and composable
    (count it for a contamination rate, join it back to eval metadata,
    anti-join it to get the clean eval subset). An eval set with no
    matches returns an empty frame; a missing index raises (scanning
    nothing and reporting "clean" would be the worst failure mode).

    Same sensitivity knob as the dedup family: ``min_equal`` of
    ``N_HASHES`` minhashes ≈ Jaccard ``min_equal/N_HASHES`` on
    3-token shingles — catches verbatim and lightly-edited inclusions,
    not paraphrase (that is an embedding question: point
    ``vector_index.vector_index_matches`` at eval embeddings the same
    way)."""
    if not index_exists(index_path):
        raise ValueError(
            f"contamination_check: no signature index at {index_path!r}"
            " — build one with append_docs_to_index over the corpus"
        )
    # record=False: a contamination scan is a READ — it must not pin
    # key-space constants on (or even create) a store it didn't build.
    _check_contract(index_path, "contamination_check", record=False)
    bands = _band_rows(minhash_signature(eval_docs))
    bbs = sorted(
        r["bb"] for r in bands.select("bb").distinct().collect()
    )
    idx = spark.read.parquet(index_path)
    if len(bbs) < N_INDEX_BUCKETS:
        idx = idx.where(F.col("bb").isin(bbs))
    return index_match_pairs(
        idx, bands, min_equal, probe_rows=bands.count()
    )


def index_exists(index_path: str) -> bool:
    return os.path.isdir(index_path) and any(
        e.startswith("bb=") for e in os.listdir(index_path)
    )


def compact_index(
    spark: SparkSession, index_path: str, *, cluster_by: str = "band_key",
    lock_wait_s: float = 60.0,
) -> dict:
    """Rewrite the append-only index into one file per bucket.

    Every drop appends ≥1 file per touched bucket, so a year of daily
    drops leaves each ``bb=`` dir with hundreds of small files — at
    which point the per-drop "one map-side index scan" pays more in
    file-open overhead than in bytes. Compaction is a maintenance
    rewrite: same rows, one file per bucket, locally sorted by
    ``cluster_by`` so parquet row-group stats are tight for the
    band-key equi-join.

    Crash safety is NOT hand-rolled: the rewrite delegates to
    ``plans.partitioned.write_partitioned_locked`` — staging dir,
    journaled swap plan, roll-forward recovery — so a crash
    mid-compaction leaves either the old file set or the new one, never
    a torn index. The writer lock is acquired HERE, before the snapshot
    read: the earlier shape (snapshot first, lock inside the rewrite)
    had a window where an append committing between the listing and the
    rewrite was silently dropped by the compaction (r9 advice).

    Returns ``{"files_before", "files_after", "rows"}``.
    """
    from tmdb_sync_spark.util import release_dir_lock

    if not index_exists(index_path):
        raise ValueError(f"compact_index: no index at {index_path!r}")
    lock = _index_writer_lock(index_path, lock_wait_s)
    try:
        return _compact_locked(spark, index_path, cluster_by)
    finally:
        release_dir_lock(lock)


def _compact_locked(
    spark: SparkSession, index_path: str, cluster_by: str = "band_key"
) -> dict:
    """Compaction body — caller holds the index writer lock (excludes
    appends for the snapshot; also the auto-compaction entry point from
    inside an append's own held lock)."""
    from tmdb_sync_spark.plans.partitioned import write_partitioned_locked
    from tmdb_sync_spark.util import count_bucket_files

    before, _ = count_bucket_files(index_path, "bb=")
    # drop any pre-lock FileStatusCache listing of this path
    spark.catalog.refreshByPath(index_path)
    idx = spark.read.parquet(index_path)
    rows = idx.count()
    # one task per bucket → exactly one output file per bucket; without
    # this, every input task would write a sliver into every bucket —
    # the very problem being compacted away
    write_partitioned_locked(
        idx.repartition("bb"), index_path, "bb",
        cluster_by=(cluster_by,),
    )
    after, _ = count_bucket_files(index_path, "bb=")
    return {"files_before": before, "files_after": after, "rows": rows}


def dedup_against_index(
    spark: SparkSession,
    new_docs: DataFrame,
    index_path: str,
    *,
    min_equal: int = NEAR_DUP_MIN,
    update_index: bool = True,
    lock_wait_s: float = 60.0,
    auto_compact_files_per_bucket: int | None = AUTO_COMPACT_FILES_PER_BUCKET,
) -> dict:
    """Filter a drop against the corpus signature index.

    ``new_docs``: ``(doc_id, text, ...)`` — doc_ids must be new to the
    corpus (the drop cursor's contract). Returns ``{"survivors":
    DataFrame, "dropped_vs_index": DataFrame, "dropped_in_batch":
    DataFrame, "n_dropped_vs_index": int, "n_dropped_in_batch": int}``;
    when ``update_index`` survivors' band rows are appended before
    returning.

    The dropped ids stay DISTRIBUTED (single-column ``doc_id`` frames):
    a large vendor drop that is mostly duplicates never funnels its
    matched ids through the driver — the r7 verdict's one remaining
    collect-shaped residue, fixed the same way as
    ``dedup_vectors_against_index`` (anti-join, O(1) driver). Only the
    two COUNTS land on the driver. The dropped frames are pinned BEFORE
    the index append, so the returned ``survivors`` — lazy by design —
    never re-read an index that already contains the drop's own
    surviving signatures (persist would NOT do: Spark recaches
    path-dependent plans on write, against the refreshed listing). Pin
    strength follows the path (r8 advice): ``update_index=True`` pins
    to scratch parquet so the returned frames also survive executor
    loss (checkpoint blocks don't); ``update_index=False`` — the
    composed ingest's append-after-commit protocol — uses the cheaper
    eager ``localCheckpoint``, whose blocks the ContextCleaner frees
    when the returned handles are garbage-collected.

    Policy mirrors the curation pipeline exactly: a new doc sharing
    ≥ ``min_equal`` of ``N_HASHES`` minhashes with ANY indexed doc is
    dropped; within the drop, the greedy keep-smallest-id rule breaks
    near-dup groups."""
    # Read-only probes (update_index=False) must not record a contract
    # for a store that was never built (r8 advice) — recording happens
    # on the write path only (here with update_index, or in
    # append_docs_to_index for the append-after-commit composition).
    _check_contract(index_path, "dedup_against_index", record=update_index)
    # Single-writer enforcement (module docstring, Concurrency): with
    # update_index the probe→append section holds the index writer
    # lock, so two concurrent drops serialize (wait, then loud
    # ConcurrentWriterError) instead of silently missing each other's
    # in-flight near-dups. Read-only probes don't lock — the
    # append-after-commit caller owns that serialization (drop cursor).
    from tmdb_sync_spark.util import release_dir_lock

    lock = (
        _index_writer_lock(index_path, lock_wait_s) if update_index
        else None
    )
    sig = minhash_signature(new_docs).cache()
    try:
        new_bands = _band_rows(sig)

        if index_exists(index_path):
            # STATIC bucket pruning: the drop's bb set is bounded
            # (≤ N_BANDS·|drop|, capped at N_INDEX_BUCKETS) and known
            # before the join — folding it into the read as a partition
            # filter skips index buckets a small drop cannot touch.
            # (Probed: Spark's dynamic partition pruning does NOT fire
            # on this broadcast join, so the pruning is done by hand.)
            bbs = sorted(
                r["bb"]
                for r in new_bands.select("bb").distinct().collect()
            )
            idx = spark.read.parquet(index_path)
            if len(bbs) < N_INDEX_BUCKETS:
                idx = idx.where(F.col("bb").isin(bbs))
            dropped_vs_index = index_matches(
                idx, new_bands, min_equal,
                probe_rows=sig.count() * N_BANDS,
            )
        else:
            # empty frame built FROM the drop's schema, not a "doc_id
            # long" literal — a caller with string doc ids would
            # otherwise hit a union type mismatch only on the
            # first-drop path (r8 review pass)
            dropped_vs_index = new_docs.select("doc_id").limit(0)

        # Pin the matched ids — NOT with persist(): Spark's
        # CacheManager recaches path-dependent cached plans when the
        # path is written, so a persisted frame would be RECOMPUTED
        # against the post-append file listing and match the drop's own
        # signatures (found live by the survivors-stability pin). Two
        # pin strengths by path (r8 advice):
        # - update_index=True appends INSIDE this call, and the caller
        #   acts on the returned frames afterwards — pin to scratch
        #   PARQUET (durable storage), because localCheckpoint blocks
        #   die with executors: on a real cluster a lost block makes a
        #   post-append action on the truncated-lineage frames fail
        #   unrecoverably, while a parquet-backed frame just re-reads.
        #   The id frames are single-column and drop-sized — the write
        #   is cheap relative to the append it accompanies.
        # - update_index=False (the composed ingest's append-after-
        #   commit protocol, streaming/file_ingest.py) does no same-
        #   path write here; localCheckpoint is the cheaper pin
        #   (executor-distributed blocks, never a driver list — the r7
        #   funnel) and the caller's own commit machinery evaluates the
        #   frames before its later append.
        if update_index:
            from tmdb_sync_spark.util import scratch_dir

            pin_base = scratch_dir("dedup-dropped-")

            def _pin(df: DataFrame, name: str) -> DataFrame:
                p = os.path.join(pin_base, name)
                df.write.mode("overwrite").parquet(p)
                return spark.read.parquet(p)

        else:
            def _pin(df: DataFrame, name: str) -> DataFrame:
                return df.localCheckpoint(eager=True)

        dropped_vs_index = _pin(dropped_vs_index, "vs_index")
        # within-drop near-dups: batch machinery, greedy keep-first;
        # ids already dropped vs the index are not double-listed
        dropped_in_batch = _pin(
            banded_pairs_with_overlap(sig)
            .where(F.col("n_equal_hashes") >= min_equal)
            .select(F.greatest("doc_a", "doc_b").alias("doc_id"))
            .distinct()
            .join(dropped_vs_index, "doc_id", "left_anti"),
            "in_batch",
        )
        # the counts are the only driver-side values (two ints,
        # whatever the drop size) — cheap aggregates over the blocks
        n_vs_index = dropped_vs_index.count()
        n_in_batch = dropped_in_batch.count()

        if n_vs_index + n_in_batch == 0:
            # nothing dropped — the COMMON case for a clean drop; skip
            # the anti-joins entirely (the r8 rewrite's first version
            # joined unconditionally and the ingest-throughput ramp
            # read +60% on the index path from the extra per-batch
            # stages alone — measured, fixed, re-measured)
            survivors = new_docs
            surviving_sig = sig
        else:
            all_dropped = dropped_vs_index.unionByName(dropped_in_batch)
            survivors = new_docs.join(all_dropped, "doc_id", "left_anti")
            surviving_sig = sig.join(all_dropped, "doc_id", "left_anti")

        if update_index:
            (
                # repartition by the partition column first: without it
                # every shuffle partition writes a sliver into every
                # bucket dir (32×64 = 2048 tiny files per append —
                # measured in scripts/exp_index_ramp.py); with it each
                # append adds ONE file per touched bucket. The shuffle
                # is of the DROP's band rows only — small by contract.
                _band_rows(surviving_sig)
                .repartition("bb")
                .write.mode("append")
                .partitionBy("bb")
                .parquet(index_path)
            )
            # auto-compaction rides the lock this path already holds
            # (policy at AUTO_COMPACT_FILES_PER_BUCKET); the returned
            # dropped frames are scratch-parquet-pinned and survivors
            # read only the caller's new_docs, so the rewrite cannot
            # invalidate anything returned below
            _maybe_compact_locked(
                spark, index_path, auto_compact_files_per_bucket
            )
        return {
            "survivors": survivors,
            "dropped_vs_index": dropped_vs_index,
            "dropped_in_batch": dropped_in_batch,
            "n_dropped_vs_index": n_vs_index,
            "n_dropped_in_batch": n_in_batch,
        }
    finally:
        sig.unpersist()
        if lock is not None:
            release_dir_lock(lock)
