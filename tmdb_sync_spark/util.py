"""Small shared utilities."""

from __future__ import annotations

import atexit
import shutil
import tempfile
import threading

from pyspark.sql import DataFrame

_SCRATCH: list[str] = []


def scratch_dir(prefix: str) -> str:
    """mkdtemp + removal at interpreter exit.

    Used for intra-query materializations (streaming sink/checkpoint
    dirs, signature temp tables): repeated query invocations in a
    long-lived session must not accumulate /tmp state.
    """
    d = tempfile.mkdtemp(prefix=prefix)
    if not _SCRATCH:
        atexit.register(
            lambda: [shutil.rmtree(p, ignore_errors=True) for p in _SCRATCH]
        )
    _SCRATCH.append(d)
    return d


class _Materialization:
    """Per-key placeholder: the registering thread writes, later callers
    wait on ``done`` — so first-call materializations of UNRELATED keys
    run concurrently instead of serializing behind one global lock."""

    __slots__ = ("done", "path", "error")

    def __init__(self) -> None:
        self.done = threading.Event()
        self.path: str | None = None
        self.error: BaseException | None = None


_MAT_CACHE: dict[tuple, _Materialization] = {}
_MAT_LOCK = threading.Lock()   # guards the dict only, never held over I/O


def _write_parquet(df: DataFrame, path: str) -> None:
    # seam for tests to gate/observe the write without touching Spark
    df.write.mode("overwrite").parquet(path)


def materialize_once(df: DataFrame, cache_key: tuple, prefix: str) -> DataFrame:
    """Write ``df`` to a scratch parquet dir once per (application,
    cache_key) and hand back a reader over it — the staging-table pattern.

    Versus ``persist()``: nothing is retained in executor storage, so a
    fanned-out intermediate (a minhash signature read by three join
    branches) is computed exactly once with no lazily-filled-cache race
    and no storage-memory pressure at 100 TB — the cluster equivalent is
    a bucketed staging table between pipeline stages. Versus a fresh
    scratch dir per invocation: repeated calls in a long-lived session
    reuse ONE materialization instead of accumulating unbounded /tmp
    state.

    ``cache_key`` IS the invalidation contract: it must capture every
    input the frame depends on. The immutable driver test tables keyed
    by sf_dir qualify; a path whose CONTENT can be rewritten mid-session
    does not — derive the key from a version/mtime in that case, or call
    :func:`reset_materialization_cache` after rewriting. Concurrent first
    calls for the SAME key materialize once (later callers wait on the
    owner's placeholder); a failed write is forgotten so a later call can
    retry.
    """
    spark = df.sparkSession
    key = (spark.sparkContext.applicationId, *cache_key)
    with _MAT_LOCK:
        entry = _MAT_CACHE.get(key)
        owner = entry is None
        if owner:
            entry = _MAT_CACHE[key] = _Materialization()
    if owner:
        try:
            path = scratch_dir(prefix)
            _write_parquet(df, path)
            entry.path = path
        except BaseException as e:
            entry.error = e
            with _MAT_LOCK:
                if _MAT_CACHE.get(key) is entry:
                    del _MAT_CACHE[key]
            raise
        finally:
            entry.done.set()   # waiters wake to a path or an error
    else:
        entry.done.wait()
        if entry.error is not None:
            raise RuntimeError(
                f"materialization of {key} failed in the owning thread"
            ) from entry.error
    return spark.read.parquet(entry.path)


# Extra caches to flush alongside _MAT_CACHE (e.g. similarity's collected
# IVF codebook): any module-level memo of table-derived driver-side state
# registers its clear() here so one reset call covers the whole engine.
_RESET_HOOKS: list = []


def register_reset_hook(fn) -> None:
    _RESET_HOOKS.append(fn)


def reset_materialization_cache() -> None:
    """Forget (but don't delete) cached materializations — bench.py calls
    this next to ``clearCache()`` so timed runs recompute staged
    intermediates instead of reading the previous run's parquet, keeping
    cold/warm timings honest (and callers rewriting a source table in
    place call it to drop every table-derived driver-side memo). Dirs are
    still removed at interpreter exit."""
    _MAT_CACHE.clear()
    for fn in _RESET_HOOKS:
        fn()
