#!/usr/bin/env python3
"""Scale-ramp evidence: do the LLM-pipeline operators' runtimes grow
LINEARLY with corpus size, as their plan shapes claim?

Builds 4x and 16x versions of sf0.1's `documents` / `embeddings` in /tmp
(replicas get fresh ids on a stripe-preserving stride and perturbed
content, NOT byte-copies — duplicated rows would inflate every LSH
bucket artificially) and times each operator at 1x/4x/16x, warm (2nd
run), noop sink.

Three measurement groups:

A. Corpus-linear operators as registered: dd_exact, dd_simhash,
   dd_minhash_lsh, dd_ngram_jaccard, tx_text_features, tx_ngram_topk,
   mm_media_pipeline, pipeline_curation. Expect wall-clock to grow
   sub-linearly at these sizes (sf0.1 underfills 32 cores) and at worst
   linearly.

B. The bucketed pair-join (dd_embedding_cosine's shape) with the
   N_DUP_BITS knob: fixed 4 bits makes within-bucket pairs grow
   quadratically with corpus (expected and documented); scaling bits
   with log4(corpus) (4 -> 6 -> 8) holds bucket occupancy constant and
   restores ~linear growth. This is the production knob, measured.

C. IVF probe with a FIXED query set while the corpus ramps: the
   registered query derives queries from the corpus (%50), which scales
   the probe work by corpus^2 BY CONSTRUCTION; production ANN holds
   queries fixed. Fixed queries -> probe join reads q*n/N_CENTROIDS*
   N_PROBE rows -> linear in n.
"""
from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tmdb_sync_spark.session import get_spark
from tmdb_sync_spark.util import reset_materialization_cache

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RAMP_ROOT = "/tmp/spark_graft_ramp"
SCALES = [
    int(s) for s in os.environ.get("SPARK_GRAFT_RAMP_SCALES", "1,4,16").split(",")
]
STRIDE_UNIT = 2310            # lcm(7,5,11,3,2): preserves media stripes

GROUP_A = [
    "dd_exact", "dd_simhash_fingerprint", "dd_minhash_lsh",
    "dd_ngram_jaccard", "tx_text_features", "tx_ngram_topk",
    "mm_media_pipeline", "pipeline_curation",
]


def build_scaled(spark, k: int) -> str:
    """Write {RAMP_ROOT}/x{k}/{documents,embeddings}.parquet."""
    out = f"{RAMP_ROOT}/x{k}"
    if os.path.isdir(out):
        return out
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n_docs = docs.count()
    stride = ((n_docs // STRIDE_UNIT) + 1) * STRIDE_UNIT
    doc_parts = [docs]
    for i in range(1, k):
        # EVERY token tagged per replica, not a 1-token suffix: a
        # suffix changes md5 but leaves ~all 3-token shingles shared,
        # so replicas minhash-match their originals — the r8 chain ramp
        # caught the ingest dedup correctly dropping 98% of a "scaled"
        # corpus (near_dups=314k at x64), which silently flattened
        # every post-dedup stage's working set AND inflated LSH band
        # buckets k-fold for the text operators. Per-token tags give
        # replicas disjoint shingle sets (Jaccard ≈ 0 vs original)
        # while preserving token counts and length statistics.
        tagged = F.regexp_replace(F.col("text"), r"(\S+)", f"$1{i}")
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + i * stride).alias("doc_id"),
                tagged.alias("text"),
                "lang", "source",
                F.length(tagged).cast("long").alias("n_chars"),
            )
        )
    all_docs = doc_parts[0]
    for p in doc_parts[1:]:
        all_docs = all_docs.unionByName(p)
    all_docs.repartition(32).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    # replica embeddings: fresh deterministic pseudo-random vectors in
    # [-1, 1] — murmur3 of (vec_id, replica, position) scaled to the
    # originals' range, so components (and therefore LSH sign bits) are
    # mutually independent. NOT sin(a + p*const): an argument affine in
    # the position makes the sign bits a fixed rotation orbit of ONE
    # phase, collapsing 2^bits buckets to at most 2*bits arcs — a first
    # draft of this script did exactly that and manufactured a skew the
    # real corpus doesn't have.
    dim = len(emb.first()["embedding"])
    emb_parts = [emb]
    for i in range(1, k):
        pos = F.sequence(F.lit(1), F.lit(dim))
        v = F.transform(
            pos,
            lambda p: (
                F.hash(F.col("vec_id"), F.lit(i), p) / F.lit(2147483648.0)
            ).cast("float"),
        )
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
                v.alias("embedding"),
                "label",
            )
        )
    all_emb = emb_parts[0]
    for p in emb_parts[1:]:
        all_emb = all_emb.unionByName(p)
    all_emb.repartition(32).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )
    return out


def timed(fn, reps: int = 2) -> float:
    """Warm time: run reps, keep the last."""
    t = 0.0
    for _ in range(reps):
        reset_materialization_cache()
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        t = time.perf_counter() - t0
    return round(t, 3)


def pair_join(spark, sf_dir: str, n_bits: int):
    from tmdb_sync_spark.functions import similarity as S

    b = S._bucketed(spark, sf_dir, n_bits)
    left = b.select(
        F.col("vec_id").alias("a_id"), "bucket",
        F.col("v").alias("av"), F.col("nrm").alias("anrm"),
    )
    right = b.select(
        F.col("vec_id").alias("b_id"), F.col("bucket").alias("b_bucket"),
        F.col("v").alias("bv"), F.col("nrm").alias("bnrm"),
    )
    sim = S._dot(F.col("av"), F.col("bv")) / (
        F.sqrt(F.col("anrm")) * F.sqrt(F.col("bnrm"))
    )
    return (
        left.join(right, (F.col("bucket") == F.col("b_bucket"))
                  & (F.col("a_id") < F.col("b_id")))
        .select("a_id", "b_id", sim.alias("cosine_sim"))
        .where(F.col("cosine_sim") >= S.DUP_THRESHOLD)
    )


def ivf_fixed_queries(spark, sf_dir: str):
    """ann_ivf_topk's plan with the query set pinned to the base corpus
    ids (vec_id % 50 == 0 AND vec_id < 2000): constant 40 queries while
    the corpus ramps."""
    from tmdb_sync_spark.functions import similarity as S
    from pyspark.sql import Window

    qd = S._quantized_from(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ).where(F.col("nrm") > 0)
    cents = (
        S._quantized_from(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
        .where((F.col("vec_id") < S.N_CENTROIDS) & (F.col("nrm") > 0))
        .collect()
    )
    topn = S._codebook_topn(cents, S.N_PROBE)
    assign = qd.select(
        "vec_id", "v", "nrm",
        F.element_at(topn(F.col("v"), F.col("nrm")), 1).alias("cid"),
    )
    probes = (
        qd.where((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000))
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
                F.col("nrm").alias("qnrm"),
                topn(F.col("v"), F.col("nrm")).alias("cids"))
        .select("query_id", "qv", "qnrm",
                F.explode("cids").alias("cid"))
    )
    sim = S._dot(F.col("qv"), F.col("v")) / (
        F.sqrt(F.col("qnrm")) * F.sqrt(F.col("nrm"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        probes.join(assign, "cid")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= S.IVF_TOP_K)
    )


def main() -> None:
    spark = get_spark("exp-scale-ramp")
    spark.sparkContext.setLogLevel("ERROR")
    import tmdb_sync_spark.all_queries  # noqa: F401
    from tmdb_sync_spark.registry import QUERIES

    dirs = {}
    for k in SCALES:
        dirs[k] = build_scaled(spark, k)
        nd = spark.read.parquet(f"{dirs[k]}/documents.parquet").count()
        ne = spark.read.parquet(f"{dirs[k]}/embeddings.parquet").count()
        print(f"x{k}: {nd} docs, {ne} vectors", flush=True)

    print("\n== A. registered linear-shaped operators ==", flush=True)
    for name in GROUP_A if not os.environ.get("SPARK_GRAFT_RAMP_SKIP_A") else []:
        row = {k: timed(lambda k=k: QUERIES[name](spark, dirs[k]))
               for k in SCALES}
        print(f"{name}: " + "  ".join(
            f"x{k}={row[k]}" for k in SCALES), flush=True)

    print("\n== B. bucketed pair-join vs N_DUP_BITS ==", flush=True)
    fixed = {k: timed(lambda k=k: pair_join(spark, dirs[k], 4))
             for k in SCALES if k <= 4}
    print("fixed 4 bits: " + "  ".join(
        f"x{k}={v}" for k, v in fixed.items())
        + "  (x16 omitted: ~16x the x4 pair count)", flush=True)
    import math

    # hold bucket occupancy constant: +2 bits per 4x corpus (4/6/8/10...)
    bits_for = {k: 4 + 2 * round(math.log(k, 4)) for k in SCALES}
    scaled = {k: timed(lambda k=k: pair_join(spark, dirs[k], bits_for[k]))
              for k in SCALES}
    print("scaled bits " + "/".join(str(bits_for[k]) for k in SCALES)
          + ": " + "  ".join(f"x{k}={v}" for k, v in scaled.items()),
          flush=True)

    print("\n== C. IVF probe, FIXED 40 queries, corpus ramp ==", flush=True)
    ivf = {k: timed(lambda k=k: ivf_fixed_queries(spark, dirs[k]))
           for k in SCALES}
    print("ivf fixed-q: " + "  ".join(
        f"x{k}={v}" for k, v in ivf.items()), flush=True)

    print("\n== D. cluster components, occupancy-scaled bits ==", flush=True)
    # the r6 ramp's headline quadratic (fixed bits, x16 = 28.3 s) rerun
    # through the r8 knob: scaled_dup_bits holds pair density constant,
    # so rounds × pairs — the whole operator — should ramp near-linearly
    from tmdb_sync_spark.functions.dedup import cluster_components
    from tmdb_sync_spark.functions.similarity import scaled_dup_bits

    nvec = {
        k: spark.read.parquet(f"{dirs[k]}/embeddings.parquet").count()
        for k in SCALES
    }
    comp = {k: timed(lambda k=k: cluster_components(
        spark, dirs[k], scaled_dup_bits(nvec[k]))) for k in SCALES}
    print("cluster scaled bits "
          + "/".join(str(scaled_dup_bits(nvec[k])) for k in SCALES)
          + ": " + "  ".join(f"x{k}={v}" for k, v in comp.items()),
          flush=True)

    if os.environ.get("SPARK_GRAFT_RAMP_KEEP") != "1":
        shutil.rmtree(RAMP_ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
