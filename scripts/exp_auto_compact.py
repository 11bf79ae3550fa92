"""Auto-compaction ramp (r9 verdict #5): probe time across N drops with
NO manual compact call, auto-compaction on (threshold 4 — small, so the
20-drop ramp crosses it repeatedly) vs off (None).

Expectation, stated before measuring: with auto-compaction OFF, every
drop adds one file per touched bucket, so the probe's file-open count
grows linearly with drop count and probe time ramps; with it ON, the
worst bucket is capped at the threshold, so probe time stays FLAT (the
bytes scanned grow slightly — the index holds more rows — but the
file-open overhead, which dominates at many-small-files, does not).

Usage: python scripts/exp_auto_compact.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from tmdb_sync_spark.functions.winnow_index import (  # noqa: E402
    append_fingerprints_to_index,
    substring_contamination_check,
)
from tmdb_sync_spark.session import get_spark  # noqa: E402
from tmdb_sync_spark.util import count_bucket_files  # noqa: E402

N_DROPS = 20
DOCS_PER_DROP = 100
THRESHOLD = 4


def _drop(spark, k: int):
    return spark.range(k * DOCS_PER_DROP, (k + 1) * DOCS_PER_DROP).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("drop body "),
            F.col("id").cast("string"),
            F.lit(" "),
            F.repeat(
                F.concat(F.lit("token"), F.col("id").cast("string"),
                         F.lit("x ")), 40,
            ),
        ).alias("text"),
    )


def _eval_docs(spark):
    # stable eval set: excerpts of drop-0 docs (planted hits) + clean
    return spark.range(5).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("eval wrapper around: drop body "),
            F.col("id").cast("string"),
            F.lit(" "),
            F.repeat(
                F.concat(F.lit("token"), F.col("id").cast("string"),
                         F.lit("x ")), 10,
            ),
        ).alias("text"),
    )


def run(auto: bool) -> None:
    spark = get_spark(f"auto-compact-ramp-{auto}")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="autocompact-")
    idx = os.path.join(root, "fp_index")
    ev = _eval_docs(spark)
    thr = THRESHOLD if auto else None
    label = "auto" if auto else "off "
    try:
        # warm probe machinery once (codegen) on a tiny throwaway index
        for k in range(N_DROPS):
            t0 = time.perf_counter()
            append_fingerprints_to_index(
                spark, idx, _drop(spark, k),
                auto_compact_files_per_bucket=thr,
            )
            t_append = time.perf_counter() - t0
            if k % 4 == 3 or k == N_DROPS - 1:
                t0 = time.perf_counter()
                n = substring_contamination_check(
                    spark, idx, ev, min_shared=2
                ).count()
                t_probe = time.perf_counter() - t0
                total, worst = count_bucket_files(idx, "bb=")
                print(
                    f"[{label}] drop {k + 1:>2}: append {t_append:5.2f}s  "
                    f"probe {t_probe:5.2f}s  hits {n}  "
                    f"files total={total} worst_bucket={worst}",
                    flush=True,
                )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    run(auto=False)
    run(auto=True)
