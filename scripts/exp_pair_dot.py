#!/usr/bin/env python3
"""One-session interleaved A/B: pair-cosine verify stage, JVM HOF fold vs
Arrow-vectorized scorer.

`dd_embedding_cosine` (and `ann_signlsh_topk`) evaluate the exact
quantized cosine on every candidate pair out of the bucket equi-join via
`F.aggregate(F.zip_with(...))` — an interpreted HOF per row. The IVF A/B
(similarity.py:_codebook_topn) showed numpy-per-Arrow-batch beating the
HOF interpreter for centroid scoring; this experiment asks whether the
same holds for the pair-verify stage, where TWO array columns cross the
Arrow boundary per row (the cost the codebook path avoids by shipping
one side in the closure).

Protocol: N_REPS interleaved A/B reps (noop sink, full compute), report
all runs + medians, and verify the two variants return identical rows.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tmdb_sync_spark.session import get_spark

N_REPS = 5


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp-pair-dot")
    spark.sparkContext.setLogLevel("ERROR")

    from tmdb_sync_spark.functions import similarity as S
    from tmdb_sync_spark.registry import QUERIES

    def arrow_variant(spark, sf_dir):
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def pair_sim(av: pd.Series, bv: pd.Series,
                     anrm: pd.Series, bnrm: pd.Series) -> pd.Series:
            if not len(av):
                return pd.Series([], dtype="float64")
            a = np.array(av.tolist(), dtype=np.int64)
            b = np.array(bv.tolist(), dtype=np.int64)
            dots = np.einsum("ij,ij->i", a, b)
            return pd.Series(
                dots
                / (np.sqrt(anrm.to_numpy(dtype=np.int64))
                   * np.sqrt(bnrm.to_numpy(dtype=np.int64)))
            )

        b = S._bucketed(spark, sf_dir, S.N_DUP_BITS)
        left = b.select(
            F.col("vec_id").alias("a_id"), F.col("bucket"),
            F.col("v").alias("av"), F.col("nrm").alias("anrm"),
        )
        right = b.select(
            F.col("vec_id").alias("b_id"), F.col("bucket").alias("b_bucket"),
            F.col("v").alias("bv"), F.col("nrm").alias("bnrm"),
        )
        return (
            left.join(
                right,
                (F.col("bucket") == F.col("b_bucket"))
                & (F.col("a_id") < F.col("b_id")),
            )
            .select(
                "a_id", "b_id",
                pair_sim("av", "bv", "anrm", "bnrm").alias("cosine_sim"),
            )
            .where(F.col("cosine_sim") >= S.DUP_THRESHOLD)
            .orderBy("a_id", "b_id")
        )

    variants = {
        "hof": lambda: QUERIES["dd_embedding_cosine"](spark, sf_dir),
        "arrow": lambda: arrow_variant(spark, sf_dir),
    }

    # equivalence first (also warms codegen + the Python worker pool)
    rows = {
        k: [tuple(r) for r in fn().collect()] for k, fn in variants.items()
    }
    assert rows["hof"] == rows["arrow"], "variants disagree"
    print(f"equivalent: {len(rows['hof'])} rows identical", flush=True)

    runs: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(N_REPS):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            runs[k].append(round(time.perf_counter() - t0, 3))
    for k, xs in runs.items():
        med = sorted(xs)[len(xs) // 2]
        print(f"{k}: median {med}  runs {xs}", flush=True)


if __name__ == "__main__":
    main()
