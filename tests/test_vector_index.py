"""Incremental vector index (functions/vector_index.py): drop-vs-index
cosine filtering, in-batch folding, validity surfacing, index growth,
and the zero-index-shuffle plan contract."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, FloatType, LongType, StructField, StructType,
)

from tmdb_sync_spark.functions.similarity import DIM, N_DUP_BITS, bucketed_from
from tmdb_sync_spark.functions.vector_index import (
    dedup_vectors_against_index,
    vector_index_exists,
    vector_index_matches,
)

_SCHEMA = StructType([
    StructField("vec_id", LongType()),
    StructField("embedding", ArrayType(FloatType())),
])

def _ids(df):
    """Collect a dropped-ids frame (test-side only — the operator keeps
    them distributed; r8 anti-join rewrite, mirroring dedup_index)."""
    return sorted(r["vec_id"] for r in df.collect())



def _vec(hot: int, sign: float = 1.0):
    """Same-bucket vectors with disjoint hot components: the first
    N_DUP_BITS components carry the (tiny) sign pattern, one later
    component carries the mass — same bucket, cosine ≈ 0.0004."""
    v = [0.01 * sign] * N_DUP_BITS + [0.0] * (DIM - N_DUP_BITS)
    v[N_DUP_BITS + hot] = 1.0
    return v


def _near(v, eps: float = 0.01):
    out = list(v)
    out[N_DUP_BITS] += eps
    out[-1] = eps
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


@pytest.fixture()
def index_path(tmp_path):
    return os.path.join(str(tmp_path), "vec_index")


@pytest.mark.slow
def test_incremental_vector_drops(spark, index_path):
    a, b, d = _vec(0), _vec(1), _vec(2, sign=-1.0)
    r1 = dedup_vectors_against_index(
        spark, _df(spark, [(1, a), (2, b), (3, d)]), index_path
    )
    assert _ids(r1["dropped_vs_index"]) == [] == _ids(r1["dropped_in_batch"])
    assert r1["n_dropped_vs_index"] == 0 == r1["n_dropped_in_batch"]
    assert r1["invalid"] == []
    assert sorted(
        r["vec_id"] for r in r1["survivors"].collect()
    ) == [1, 2, 3]
    assert vector_index_exists(index_path)

    # drop 2: near-dup of vec 1, a fresh vector, and an invalid one
    r2 = dedup_vectors_against_index(
        spark,
        _df(spark, [
            (10, _near(a)),
            (11, _vec(3)),
            (12, [1.0] * (DIM - 1)),          # wrong DIM → invalid
        ]),
        index_path,
    )
    assert _ids(r2["dropped_vs_index"]) == [10]
    assert r2["invalid"] == [12]
    assert [r["vec_id"] for r in r2["survivors"].collect()] == [11]

    # drop 3: an in-batch near-dup pair → greedy keep-smallest-id
    h = _vec(4)
    r3 = dedup_vectors_against_index(
        spark, _df(spark, [(20, h), (21, _near(h))]), index_path
    )
    assert _ids(r3["dropped_in_batch"]) == [21]
    assert [r["vec_id"] for r in r3["survivors"].collect()] == [20]

    # the index holds exactly the accepted vectors — and a re-drop of
    # an accepted vector's near-dup is caught (growth)
    idx_ids = sorted(
        r["vec_id"]
        for r in spark.read.parquet(index_path)
        .select("vec_id").distinct().collect()
    )
    assert idx_ids == [1, 2, 3, 11, 20]
    r4 = dedup_vectors_against_index(
        spark, _df(spark, [(30, _near(h, eps=0.02))]), index_path,
        update_index=False,
    )
    assert _ids(r4["dropped_vs_index"]) == [30]


def test_update_index_false_leaves_index(spark, index_path):
    dedup_vectors_against_index(
        spark, _df(spark, [(1, _vec(0))]), index_path
    )
    before = spark.read.parquet(index_path).count()
    r = dedup_vectors_against_index(
        spark, _df(spark, [(2, _vec(1))]), index_path,
        update_index=False,
    )
    assert [x["vec_id"] for x in r["survivors"].collect()] == [2]
    assert spark.read.parquet(index_path).count() == before


def test_match_join_never_shuffles_the_index(spark, index_path):
    dedup_vectors_against_index(
        spark, _df(spark, [(1, _vec(0)), (2, _vec(1))]), index_path
    )
    idx = spark.read.parquet(index_path)
    new_b = bucketed_from(_df(spark, [(10, _near(_vec(0)))]), N_DUP_BITS)
    plan = (
        vector_index_matches(idx, new_b)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    join_at = plan.index("BroadcastHashJoin")
    scan_at = plan.index("Scan parquet", join_at)
    assert "Exchange hashpartitioning" not in plan[join_at:scan_at]


def test_zero_norm_vectors_survive_with_their_own_bucket(spark, index_path):
    """r6-ADVICE: an all-zero vector satisfies the validity contract
    (non-NULL, DIM components, all finite) — it just cannot cosine-match
    anything. It must NOT be reported as invalid or silently dropped:
    it survives, is listed under `zero_norm`, and is neither probed nor
    appended to the index (cosine is undefined for it)."""
    a = _vec(0)
    r = dedup_vectors_against_index(
        spark,
        _df(spark, [
            (1, a),
            (2, [0.0] * DIM),                  # valid, zero norm
            (3, [1.0] * (DIM - 1)),            # wrong DIM → invalid
        ]),
        index_path,
    )
    assert r["invalid"] == [3]
    assert r["zero_norm"] == [2]
    assert sorted(x["vec_id"] for x in r["survivors"].collect()) == [1, 2]
    # the index holds only the bucketable survivor
    idx_ids = sorted(
        x["vec_id"] for x in
        spark.read.parquet(index_path).select("vec_id").collect()
    )
    assert idx_ids == [1]
    # a second drop: the zero vector neither matches nor is matched
    r2 = dedup_vectors_against_index(
        spark, _df(spark, [(10, [0.0] * DIM)]), index_path
    )
    assert r2["zero_norm"] == [10]
    assert [x["vec_id"] for x in r2["survivors"].collect()] == [10]


def test_compact_vector_index(spark, tmp_path):
    from tmdb_sync_spark.functions.vector_index import (
        append_vectors_to_index,
        compact_vector_index,
    )
    from tmdb_sync_spark.functions.similarity import DIM

    idx_path = str(tmp_path / "vidx")

    def vecs(lo, hi):
        import math

        return spark.createDataFrame(
            [(i, [math.sin(i * 0.7 + p) for p in range(DIM)])
             for i in range(lo, hi)],
            f"vec_id long, embedding array<double>",
        ).selectExpr(
            "vec_id", "cast(embedding as array<float>) as embedding"
        )

    for k in range(4):
        append_vectors_to_index(spark, idx_path, vecs(k * 50, k * 50 + 50))

    res = compact_vector_index(spark, idx_path)
    assert res["files_before"] > res["files_after"]
    spark.catalog.refreshByPath(idx_path)
    assert spark.read.parquet(idx_path).count() == res["rows"]


def test_vector_concurrent_writer_lock_enforced(spark, tmp_path):
    """Vector-index twin of the dedup-index lock pin: write paths
    refuse while the lock is held; probes pass; release re-admits."""
    import os as _os

    import pytest as _pt

    from tmdb_sync_spark.functions.similarity import DIM
    from tmdb_sync_spark.functions.vector_index import (
        append_vectors_to_index,
        dedup_vectors_against_index,
    )
    from tmdb_sync_spark.plans.partitioned import MERGE_LOCK_NAME
    from tmdb_sync_spark.util import (
        ConcurrentWriterError,
        acquire_dir_lock,
        release_dir_lock,
    )

    path = _os.path.join(str(tmp_path), "vidx")
    v1 = spark.createDataFrame(
        [(1, [0.5] * DIM)], "vec_id long, embedding array<float>"
    )
    dedup_vectors_against_index(spark, v1, path)

    lock = acquire_dir_lock(path, MERGE_LOCK_NAME)
    try:
        v2 = spark.createDataFrame(
            [(2, [-0.5] * DIM)], "vec_id long, embedding array<float>"
        )
        with _pt.raises(ConcurrentWriterError):
            dedup_vectors_against_index(spark, v2, path, lock_wait_s=0.1)
        with _pt.raises(ConcurrentWriterError):
            append_vectors_to_index(spark, path, v2, lock_wait_s=0.1)
        r = dedup_vectors_against_index(
            spark, v2, path, update_index=False
        )
        assert [x["vec_id"] for x in r["survivors"].collect()] == [2]
    finally:
        release_dir_lock(lock)
    r = dedup_vectors_against_index(spark, v2, path)
    assert [x["vec_id"] for x in r["survivors"].collect()] == [2]


def test_compact_vector_index_holds_writer_lock(spark, tmp_path):
    """Lock-before-snapshot (r9 advice), vector twin: a held writer lock
    refuses compaction loudly instead of snapshotting around it."""
    from tmdb_sync_spark.functions.vector_index import (
        append_vectors_to_index,
        compact_vector_index,
    )
    from tmdb_sync_spark.plans.partitioned import MERGE_LOCK_NAME
    from tmdb_sync_spark.util import (
        ConcurrentWriterError,
        acquire_dir_lock,
        release_dir_lock,
    )

    idx_path = str(tmp_path / "vidx")
    append_vectors_to_index(
        spark, idx_path, _df(spark, [(i, _vec(i)) for i in range(6)])
    )
    held = acquire_dir_lock(idx_path, MERGE_LOCK_NAME, wait_s=5)
    try:
        with pytest.raises(ConcurrentWriterError):
            compact_vector_index(spark, idx_path, lock_wait_s=0.2)
    finally:
        release_dir_lock(held)
    assert compact_vector_index(spark, idx_path)["rows"] > 0


def test_vector_auto_compaction_on_append(spark, tmp_path):
    """The vector index's append paths auto-compact past the shared
    files-per-bucket threshold (r9 verdict #5); match results are
    unchanged across the self-triggered rewrite."""
    from tmdb_sync_spark.functions.vector_index import (
        append_vectors_to_index,
        vector_index_matches,
    )
    from tmdb_sync_spark.util import count_bucket_files

    idx_path = str(tmp_path / "vidx")
    for k in range(3):
        append_vectors_to_index(
            spark, idx_path,
            _df(spark, [(k * 10 + i, _vec(i)) for i in range(4)]),
            auto_compact_files_per_bucket=16,
        )
    _, worst = count_bucket_files(idx_path, "bucket=")
    assert worst >= 2

    probe = bucketed_from(
        _df(spark, [(999, _vec(0))]), N_DUP_BITS
    )
    spark.catalog.refreshByPath(idx_path)
    before = sorted(
        r["vec_id"] for r in vector_index_matches(
            spark.read.parquet(idx_path), probe, 0.9).collect()
    )
    assert before

    append_vectors_to_index(
        spark, idx_path, _df(spark, [(50 + i, _vec(i + 1)) for i in range(3)]),
        auto_compact_files_per_bucket=1,
    )
    _, worst_after = count_bucket_files(idx_path, "bucket=")
    assert worst_after == 1
    spark.catalog.refreshByPath(idx_path)
    after = sorted(
        r["vec_id"] for r in vector_index_matches(
            spark.read.parquet(idx_path), probe, 0.9).collect()
    )
    assert after == before
