"""ST6: async job launch + status poll (SURVEY §2.10).

The reference's sync endpoints return 202 immediately and run the job as a
background task on the event loop (``app/main.py:40-61,141-162``); progress
is polled by aggregating the cursor/error tables (``app/main.py:64-138``).

Spark-first shape: the driver launches the bounded ingest loop on a daemon
thread (Spark sessions are thread-safe for job submission; each loop's
actions get their own scheduler pool) and status polls combine in-memory
thread state with the durable cursor table — exactly the reference's
"progress lives in the database, liveness lives in the runtime" split, so
a poller sees committed page progress even mid-run.
"""

from __future__ import annotations

import threading
import uuid
from typing import Any, Callable

from pyspark.sql import SparkSession

from tmdb_sync_spark.streaming import state as st


class JobRunner:
    """Launch-and-poll surface over driver-side background jobs.

    Unknown job ids get the reference's not-found status shape
    (``app/main.py:64-138`` returns 404/empty, never a 500), and
    terminal records are bounded: past ``max_records``, the oldest
    terminal records whose outcome has been POLLED are evicted first, so
    a launcher that hasn't read its result yet doesn't lose it to a
    flood of later jobs; unread terminal records go only under sustained
    overflow, and running jobs are never evicted."""

    def __init__(self, max_records: int = 256) -> None:
        self._jobs: dict[str, dict[str, Any]] = {}   # insertion-ordered
        self._lock = threading.Lock()
        self._max_records = max_records

    def _prune(self) -> None:
        # caller holds the lock; dict order = launch order (oldest first)
        read = [
            jid for jid, r in self._jobs.items()
            if r["state"] != "running" and r["read"]
        ]
        unread = [
            jid for jid, r in self._jobs.items()
            if r["state"] != "running" and not r["read"]
        ]
        excess = len(self._jobs) - self._max_records
        for jid in (read + unread)[:max(excess, 0)]:
            del self._jobs[jid]

    _NOT_FOUND = {"state": "not_found", "result": None, "error": None}

    def launch(self, fn: Callable[..., dict], /, *args, **kwargs) -> str:
        """Start ``fn(*args, **kwargs)`` on a daemon thread; return the job
        id immediately (the 202 semantics of ``app/main.py:40-61``)."""
        job_id = uuid.uuid4().hex[:12]
        rec: dict[str, Any] = {
            "state": "running", "result": None, "error": None, "read": False,
        }

        def run() -> None:
            try:
                result = fn(*args, **kwargs)
                with self._lock:
                    rec["result"] = result
                    rec["state"] = "done"
                    rec.pop("thread", None)   # release the Thread object
            except Exception as e:  # status poll surfaces the failure
                with self._lock:
                    rec["error"] = f"{type(e).__name__}: {e}"
                    rec["state"] = "failed"
                    rec.pop("thread", None)

        t = threading.Thread(target=run, daemon=True, name=f"job-{job_id}")
        # thread handle set BEFORE the record is published: a wait() that
        # races the launch must find the thread and block, not observe a
        # thread-less "running" record and return immediately
        rec["thread"] = t
        with self._lock:
            self._jobs[job_id] = rec
            self._prune()
        t.start()
        return job_id

    def _snapshot(self, job_id: str, rec: dict[str, Any]) -> dict[str, Any]:
        # caller holds the lock: field reads and the read-flag write are
        # one atomic unit (the class advertises lock-based thread safety)
        out = {
            "job_id": job_id,
            "state": rec["state"],
            "result": rec["result"],
            "error": rec["error"],
        }
        if out["state"] != "running":
            rec["read"] = True   # outcome delivered → eligible for eviction
        return out

    def status(
        self,
        job_id: str,
        spark: SparkSession | None = None,
        cursors_path: str | None = None,
        cursor_key: str | None = None,
    ) -> dict[str, Any]:
        """Thread state + (optionally) the durable cursor row — committed
        page/counter progress is visible mid-run, like the reference's
        status aggregation over ``sync_cursors`` (``app/main.py:64-138``)."""
        with self._lock:
            rec = self._jobs.get(job_id)
            if rec is None:
                out = {"job_id": job_id, **self._NOT_FOUND}
            else:
                out = self._snapshot(job_id, rec)
        if spark is not None and cursors_path and cursor_key:
            out["cursor"] = st.read_cursor(spark, cursors_path, cursor_key)
        return out

    def wait(self, job_id: str, timeout: float | None = None) -> dict[str, Any]:
        with self._lock:
            rec = self._jobs.get(job_id)
            thread = rec.get("thread") if rec is not None else None
        if rec is None:
            return {"job_id": job_id, **self._NOT_FOUND}
        if thread is not None:
            thread.join(timeout)
        # snapshot the record we joined, NOT a re-lookup: the job may have
        # been pruned from _jobs between join() and here, but its outcome
        # still belongs to this caller
        with self._lock:
            return self._snapshot(job_id, rec)
