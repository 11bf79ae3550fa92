#!/usr/bin/env python3
"""r13 stage decompositions: pipeline_curation, wn_verify_spans,
ann_ivf_topk — where the warm seconds actually sit (noop sink, staged
caches reset per rep like bench.py).
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tmdb_sync_spark.session import get_spark
from tmdb_sync_spark.util import reset_materialization_cache

REPS = int(os.environ.get("REPS", "4"))


def timed(label, fn, reps=REPS, reset=True):
    runs = []
    for _ in range(reps):
        if reset:
            reset_materialization_cache(kinds=("staged",))
        t0 = time.perf_counter()
        fn()
        runs.append(round(time.perf_counter() - t0, 3))
    print(f"{label}: {runs} median {statistics.median(runs)}", flush=True)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp-r13-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    import tmdb_sync_spark.all_queries  # noqa: F401
    from tmdb_sync_spark.registry import QUERIES

    spark.range(1_000_000).selectExpr("sum(id)").collect()

    which = set((os.environ.get("WHICH") or "curation,verify,ivf").split(","))

    if "curation" in which:
        import tmdb_sync_spark.functions.pipeline as P
        from tmdb_sync_spark.functions.dedup import (
            banded_pairs_with_overlap, minhash_signature,
        )
        from tmdb_sync_spark.functions.text import quality_score_expr, tokens_expr
        from tmdb_sync_spark.io import parallel_table
        from tmdb_sync_spark.util import file_fingerprint, materialize_once

        QUERIES["pipeline_curation"](spark, sf_dir).write.format("noop").mode(
            "overwrite").save()

        def quality_frame():
            docs = parallel_table(spark, sf_dir, "documents").withColumn(
                "_toks", tokens_expr(F.col("text")))
            return docs.select(
                "doc_id", "text", "lang",
                quality_score_expr(F.col("text"), tokens=F.col("_toks")).alias("q"),
                F.size("_toks").alias("ntok"),
            ).where(F.col("q") >= P.QUALITY_MIN)

        def kept_exact_frame():
            row = F.struct("doc_id", "text", "lang", "q", "ntok")
            return (quality_frame()
                    .groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
                    .agg(F.min_by(row, "doc_id").alias("r")).select("r.*")
                    .repartition(spark.sparkContext.defaultParallelism))

        timed("curation.quality", lambda: noop(quality_frame()))
        timed("curation.kept_exact", lambda: noop(kept_exact_frame()))
        timed("curation.sig_noop(no write)",
              lambda: noop(minhash_signature(kept_exact_frame(),
                                             carry=["lang", "q", "ntok"])))

        def staged_write():
            docs_fp = file_fingerprint(f"{sf_dir}/documents.parquet")
            materialize_once(
                minhash_signature(kept_exact_frame(), carry=["lang", "q", "ntok"]),
                cache_key=("cur_kept_sig", sf_dir, docs_fp),
                prefix="cur_kept_sig_")
        timed("curation.staged_write", staged_write)
        timed("curation.full", lambda: noop(QUERIES["pipeline_curation"](spark, sf_dir)))

    if "verify" in which:
        from tmdb_sync_spark.functions.winnow import (
            _detection_parts, substring_overlap, verify_overlap_spans,
        )
        from tmdb_sync_spark.io import parallel_table
        from tmdb_sync_spark.util import shuffle_partitions_window

        QUERIES["wn_verify_spans"](spark, sf_dir).write.format("noop").mode(
            "overwrite").save()

        def docs():
            return parallel_table(spark, sf_dir, "documents")

        def queries_frame(d):
            return (d.where((F.col("doc_id") % 31 == 0) & (F.length("text") >= 200))
                    .select(F.col("doc_id").alias("query_id"),
                            F.substring("text", 8, 150).alias("text")))

        def detection():
            d = docs()
            pairs = substring_overlap(queries_frame(d), d)
            parts = _detection_parts(spark, sf_dir)
            with shuffle_partitions_window(spark, parts):
                return pairs.localCheckpoint(eager=True)

        timed("verify.detection_ckpt", detection)
        pairs = detection()

        def verify_only():
            d = docs()
            corpus = d.select(F.col("doc_id").alias("corpus_id"), "text")
            noop(verify_overlap_spans(queries_frame(d), corpus, pairs)
                 .orderBy("query_id", "corpus_id", "q_start", "c_start"))
        timed("verify.verify_only", verify_only)
        timed("verify.full", lambda: noop(QUERIES["wn_verify_spans"](spark, sf_dir)))

    if "ivf" in which:
        QUERIES["ann_ivf_topk"](spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
        timed("ivf.full", lambda: noop(QUERIES["ann_ivf_topk"](spark, sf_dir)),
              reset=True)
        timed("knn.full", lambda: noop(QUERIES["knn_cosine_topk"](spark, sf_dir)))
        timed("signlsh.full", lambda: noop(QUERIES["ann_signlsh_topk"](spark, sf_dir)))
        timed("dd_embedding.full",
              lambda: noop(QUERIES["dd_embedding_cosine"](spark, sf_dir)))


if __name__ == "__main__":
    main()
