#!/usr/bin/env python3
"""Per-drop ingest cost curve (r8 verdict #6): fixed total volume, varied
delivery granularity, so the per-batch / per-call constant of the full
operational ingest (parse → dead-letter → index dedup → MERGE → profile)
is measured instead of guessed.

Four scenarios over the SAME corpus (sf0.1 documents, pre-split into 16
jsonl drop files):

  calls=1            all 16 files pending, one availableNow pass
                     (the file source folds them into ONE micro-batch —
                     the natural amortization: a sweep pays the fixed
                     cost once no matter how many drops accumulated)
  calls=4 / calls=16 files staged in waves, one ingest CALL per wave —
                     the operational "ingest on every arrival" shape;
                     each call pays stream startup + index scan +
                     journaled swap + profile write on a fraction of
                     the volume
  batches=16         all 16 pending, ONE call with max_files_per_batch=1
                     → 16 micro-batches inside one stream run; the delta
                     vs calls=1 isolates the per-BATCH constant from
                     per-CALL (session/stream startup) overhead

Derived constants printed at the end:
  per_call_s  ≈ (T_calls16 - T_calls1) / 15
  per_batch_s ≈ (T_batches16 - T_calls1) / 15

Read: if drops arrive faster than one at a time is worth, DON'T call per
arrival — let them accumulate and sweep (the checkpoint makes the sweep
exactly-once regardless). max_files_per_batch exists for the opposite
cliff: a backlog too big for one batch's memory.

Wall times are single-shot (the chain is stateful); compare SHAPE.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tmdb_sync_spark.session import get_spark

ROOT = "/tmp/spark_graft_ingest_drops"
N_FILES = 16
DOC_DDL = (
    "doc_id bigint, text string, lang string, source string, "
    "n_chars bigint"
)


def make_drop_files(spark, sf_dir: str, out: str) -> list[str]:
    """The corpus as N_FILES jsonl files (+1 corrupt line per file so the
    dead-letter path is always part of the measured cost)."""
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    paths = []
    for d in range(N_FILES):
        part = docs.where(F.col("doc_id") % N_FILES == d)
        tmp = f"{out}/_tmp{d}"
        part.coalesce(1).write.mode("overwrite").json(tmp)
        src = next(
            f for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".json")
        )
        with open(os.path.join(tmp, src), "a") as fh:
            fh.write("{corrupt line, dead-letters\n")
        dst = os.path.join(out, f"drop{d:02d}.jsonl")
        os.replace(os.path.join(tmp, src), dst)
        shutil.rmtree(tmp, ignore_errors=True)
        paths.append(dst)
    return paths


def run_scenario(spark, pool: list[str], work: str, *, calls: int,
                 max_files_per_batch: int | None = None) -> dict:
    from tmdb_sync_spark.plans.partitioned import read_partitioned
    from tmdb_sync_spark.streaming.file_ingest import ingest_file_stream

    src = os.path.join(work, "drops")
    state = os.path.join(work, "state")
    os.makedirs(src, exist_ok=True)
    per_call: list[float] = []
    batches = dead = dups = rows = 0
    wave = N_FILES // calls
    for c in range(calls):
        for p in pool[c * wave:(c + 1) * wave]:
            shutil.copy(p, src)
        t0 = time.perf_counter()
        res = ingest_file_stream(
            spark, src, DOC_DDL, state,
            keys=["doc_id"], partition_col="lang",
            dedup_index_path=os.path.join(work, "sig_index"),
            profile_path=os.path.join(work, "profile"),
            max_files_per_batch=max_files_per_batch,
        )
        per_call.append(time.perf_counter() - t0)
        batches += res["batches"]
        dead += res["dead"]
        dups += res["near_dups"]
    rows = read_partitioned(spark, res["table_path"]).count()
    return {
        "total_s": round(sum(per_call), 2),
        "per_call_s": [round(x, 2) for x in per_call],
        "batches": batches,
        "rows": rows,
        "dead": dead,
        "near_dups": dups,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp-ingest-drops")
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(ROOT, ignore_errors=True)
    pool_dir = os.path.join(ROOT, "pool")
    pool = make_drop_files(spark, sf_dir, pool_dir)

    scenarios = {
        "calls=1": dict(calls=1),
        "calls=4": dict(calls=4),
        "calls=16": dict(calls=16),
        "batches=16": dict(calls=1, max_files_per_batch=1),
    }
    out = {}
    for name, kw in scenarios.items():
        work = os.path.join(ROOT, name.replace("=", "_"))
        os.makedirs(work, exist_ok=True)
        out[name] = run_scenario(spark, pool, work, **kw)
        print(f"{name}: {json.dumps(out[name])}", flush=True)

    t1 = out["calls=1"]["total_s"]
    print("\n== ingest drop-granularity summary ==", flush=True)
    for name, r in out.items():
        print(f"{name}: {r['total_s']}s ({r['total_s'] / t1:.1f}x of one "
              f"sweep), {r['batches']} batches, rows={r['rows']}, "
              f"dead={r['dead']}", flush=True)
    print(f"per_call_s  ~= {(out['calls=16']['total_s'] - t1) / 15:.2f}",
          flush=True)
    print(f"per_batch_s ~= {(out['batches=16']['total_s'] - t1) / 15:.2f}",
          flush=True)

    if os.environ.get("SPARK_GRAFT_RAMP_KEEP") != "1":
        shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
