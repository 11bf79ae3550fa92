#!/usr/bin/env python3
"""Composition overhead of the unified contamination audit.

contamination_audit promises "lazily composed so shared work isn't
repeated": one call probing all three indexes should cost ~the sum of
the three individual probes (the verdict/clean composition reuses the
pinned pair frames, adding only id-sized joins) — NOT re-run probes
per downstream consumer.

Build: all three indexes from sf0.1's documents + embeddings (one
composed append). Measure, warm (second rep reported):
  (a) the three lens probes individually, each evaluated once;
  (b) one contamination_audit evaluating pairs + verdicts + clean —
      three consumers over the same call's result.

Usage: python scripts/exp_audit_compose.py
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tmdb_sync_spark.session import get_spark


def main() -> None:
    from tmdb_sync_spark.functions.audit import (
        append_corpus_to_audit_indexes,
        audit_index_paths,
        contamination_audit,
    )
    from tmdb_sync_spark.functions.dedup_index import contamination_check
    from tmdb_sync_spark.functions.similarity import N_DUP_BITS, bucketed_from
    from tmdb_sync_spark.functions.vector_index import (
        vector_index_match_pairs,
    )
    from tmdb_sync_spark.functions.winnow_index import (
        substring_contamination_check,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp-audit-compose")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="audit-compose-")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        t0 = time.perf_counter()
        append_corpus_to_audit_indexes(spark, root, docs, vecs)
        print(f"composed index build: {time.perf_counter() - t0:.2f}s",
              flush=True)

        # eval set: 20 planted excerpts + 5 near-verbatim docs + 5 clean;
        # eval embeddings = 10 corpus vectors re-labeled (semantic hits)
        ev = (
            docs.where((F.col("doc_id") % 97 == 0)
                       & (F.length("text") >= 250)).limit(25)
            .select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                    F.concat(F.lit("eval wrapper: "),
                             F.substring("text", 20, 160)).alias("text"))
            .unionByName(spark.range(5).select(
                (F.col("id") + 20_000_000).alias("doc_id"),
                F.concat(F.lit("clean novel prompt "),
                         F.col("id").cast("string")).alias("text")))
            .localCheckpoint()
        )
        emb = (
            vecs.limit(10)
            .select((F.col("vec_id") + 10_000_000).alias("doc_id"),
                    "embedding")
            .localCheckpoint()
        )
        paths = audit_index_paths(root)

        for rep in range(2):
            t0 = time.perf_counter()
            n1 = contamination_check(spark, paths["whole_doc"], ev).count()
            t_wd = time.perf_counter() - t0
            t0 = time.perf_counter()
            n2 = substring_contamination_check(
                spark, paths["substring"], ev).count()
            t_ss = time.perf_counter() - t0
            t0 = time.perf_counter()
            b = bucketed_from(
                emb.select(F.col("doc_id").alias("vec_id"), "embedding"),
                N_DUP_BITS)
            idx = spark.read.parquet(paths["semantic"])
            n3 = vector_index_match_pairs(idx, b).count()
            t_sem = time.perf_counter() - t0
            t0 = time.perf_counter()
            audit = contamination_audit(spark, ev, root,
                                        eval_embeddings=emb)
            nv = audit["verdicts"].count()
            nc = audit["clean"].count()
            np_ = sum(df.count() for df in audit["pairs"].values())
            t_audit = time.perf_counter() - t0
        print(
            f"individual probes: whole_doc {t_wd:.2f}s ({n1}) + "
            f"substring {t_ss:.2f}s ({n2}) + semantic {t_sem:.2f}s ({n3}) "
            f"= {t_wd + t_ss + t_sem:.2f}s",
            flush=True,
        )
        print(
            f"contamination_audit (pairs+verdicts+clean consumed): "
            f"{t_audit:.2f}s — verdicts={nv} clean={nc} pair_rows={np_}",
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
