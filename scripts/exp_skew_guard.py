#!/usr/bin/env python3
"""Measure the tiled_self_pairs skew guard (r5 verdict item 5).

Two questions, both answered by wall-clock A/B with row-identical
results verified first:

1. SKEWED corpus (the manufactured failure mode from the r5 ramp: a
   generator whose first N_DUP_BITS components share one sign, so every
   hot row lands in ONE LSH bucket): does the tiled join spread the hot
   bucket's quadratic pair space across cores where the naive join
   serializes it into one task?
2. REAL corpus (sf0.1, no skew): what does the guard cost when nothing
   is hot? (Expected ~nothing: one extra tiny count+broadcast, size-1
   explodes.)

Run: python scripts/exp_skew_guard.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tmdb_sync_spark.functions import similarity as S  # noqa: E402
from tmdb_sync_spark.functions.pairs import tiled_self_pairs  # noqa: E402
from tmdb_sync_spark.session import get_spark  # noqa: E402

SCRATCH = "/tmp/skew_guard_corpus"
DIM = S.DIM


def build_skewed(spark, n_hot: int, n_cold: int) -> str:
    """n_hot rows whose first N_DUP_BITS components are forced positive
    (one bucket); n_cold rows with independent signs."""
    out = f"{SCRATCH}_{n_hot}_{n_cold}"
    if os.path.isdir(out):
        return out
    pos = F.sequence(F.lit(1), F.lit(DIM))

    def vec(force_hot: bool):
        def comp(p):
            x = (F.hash(F.col("id"), p) / F.lit(2147483648.0)).cast("double")
            if force_hot:
                # hot rows: components 1..N_DUP_BITS all positive → every
                # row shares the all-ones bucket
                return F.when(p <= S.N_DUP_BITS, F.abs(x)).otherwise(x)
            return x
        return F.transform(pos, comp).cast("array<float>")

    hot = spark.range(n_hot).select(
        F.col("id").alias("vec_id"), vec(True).alias("embedding")
    )
    cold = spark.range(n_hot, n_hot + n_cold).select(
        F.col("id").alias("vec_id"), vec(False).alias("embedding")
    )
    hot.unionByName(cold).repartition(32).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )
    return out


def naive_pairs(b):
    left = b.select(F.col("vec_id").alias("a_id"), "bucket",
                    F.col("v").alias("av"), F.col("nrm").alias("anrm"))
    right = b.select(F.col("vec_id").alias("b_id"),
                     F.col("bucket").alias("b_bucket"),
                     F.col("v").alias("bv"), F.col("nrm").alias("bnrm"))
    sim = S._dot(F.col("av"), F.col("bv")) / (
        F.sqrt(F.col("anrm")) * F.sqrt(F.col("bnrm"))
    )
    return (
        left.join(right, (F.col("bucket") == F.col("b_bucket"))
                  & (F.col("a_id") < F.col("b_id")))
        .select("a_id", "b_id", sim.alias("cosine_sim"))
        .where(F.col("cosine_sim") >= S.DUP_THRESHOLD)
    )


def tiled_pairs(b, cap):
    # the production shape: cosine as a SYMMETRIC pair expression, so
    # the threshold pushes into the join without the role CASE WHEN
    # (the swapped-struct form measured 2× slower — pairs.py docstring)
    p = tiled_self_pairs(
        b, "bucket", "vec_id", cap=cap,
        sym={
            "cosine_sim": lambda l, r: S._dot(l["v"], r["v"]) / (
                F.sqrt(l["nrm"]) * F.sqrt(r["nrm"])
            )
        },
    )
    return (
        p.select(F.col("a.vec_id").alias("a_id"),
                 F.col("b.vec_id").alias("b_id"),
                 "cosine_sim")
        .where(F.col("cosine_sim") >= S.DUP_THRESHOLD)
    )


def timed(df, reps=2):
    t = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t = time.perf_counter() - t0
    return round(t, 3)


def main():
    spark = get_spark("skew-guard-exp")
    spark.sparkContext.setLogLevel("ERROR")

    # The regime the guard exists for: both sides too big to broadcast
    # (the 100 TB reality), so the bucket join is a sort-merge and ONE
    # task owns the hot key. Locally Spark escapes via broadcast-hash
    # (probe side spreads the hot bucket across input partitions), so
    # the SMJ regime is emulated by disabling broadcast on a sub-session
    # — the conditional tiling itself doesn't care which regime it's in.
    sub = spark.newSession()
    sub.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    # Sizes are deliberately modest: the straggler being demonstrated
    # runs the interpreted HOF dot ONCE PER PAIR on ONE CORE (~40 µs/
    # pair measured) — 8k hot rows = 32M pairs ≈ 20 single-core MINUTES,
    # which is the incident, not a usable benchmark loop. 1k/2k already
    # show the contrast; the exact-cover proof lives in tests/test_pairs.
    print("== skewed corpus, broadcast OFF (the 100 TB SMJ regime) ==",
          flush=True)
    for n_hot in (1_000, 2_000):
        d = build_skewed(spark, n_hot, 1_000)
        b = S._bucketed(sub, d, S.N_DUP_BITS)
        # cap 256: S = n_hot/256 sub-buckets → S(S+1)/2 tiles spread
        # across 32 cores vs ONE straggler SMJ task
        nv, tl = naive_pairs(b), tiled_pairs(b, cap=256)
        # results identical first (at the smaller size; the cover proof
        # is also pinned cap-by-cap in tests/test_pairs.py)
        if n_hot == 1_000:
            a = sorted(map(tuple, nv.select("a_id", "b_id").collect()))
            t = sorted(map(tuple, tl.select("a_id", "b_id").collect()))
            assert a == t, f"result divergence at n_hot={n_hot}"
        tn, tt = timed(nv, reps=1), timed(tl, reps=1)
        print(f"n_hot={n_hot:6d} pairs~{n_hot*(n_hot-1)//2:>12,}  "
              f"naive={tn:8.3f}s  tiled={tt:8.3f}s  speedup={tn/tt:5.2f}x",
              flush=True)

    print("== skewed corpus, broadcast ON (local escape hatch) ==",
          flush=True)
    d = build_skewed(spark, 2_000, 1_000)
    b = S._bucketed(spark, d, S.N_DUP_BITS)
    tn = timed(naive_pairs(b), reps=1)
    tt = timed(tiled_pairs(b, cap=256), reps=1)
    print(f"n_hot=2000 naive(BHJ)={tn:.3f}s  tiled={tt:.3f}s  "
          "(tiling engages on the hot probe; the BHJ naive is already "
          "parallel here — acceptable insurance locally, essential at "
          "SMJ scale)", flush=True)

    print("== real corpus sf0.1 (no skew) — guard overhead ==", flush=True)
    sf = "/root/testdata/sf0.1"
    b = S._bucketed(spark, sf, S.N_DUP_BITS)
    nv, tl = naive_pairs(b), tiled_pairs(b, cap=4096)
    runs = {"naive": [], "tiled": []}
    for _ in range(4):                       # interleaved
        runs["naive"].append(timed(nv, reps=1))
        runs["tiled"].append(timed(tl, reps=1))
    med = {k: sorted(v)[len(v) // 2] for k, v in runs.items()}
    print(f"naive median={med['naive']:.3f}s  tiled median={med['tiled']:.3f}s"
          f"  overhead={(med['tiled'] / med['naive'] - 1) * 100:+.1f}%",
          flush=True)


if __name__ == "__main__":
    main()
