#!/usr/bin/env python3
"""One-session A/B: tx_text_features' per-token stages — N separate HOF
passes (status quo) vs ONE F.aggregate fold with a struct accumulator.

The current form walks the token array ~6 times per doc (stopword
filter, 4 language-marker filters, char-length transform+sum), each an
interpreted HOF pass. The fused form folds once per token, computing
lower(x) once and accumulating (chars, stop, en, de, es, fr) in a
struct. Same integer arithmetic, so results must be row-identical.

Measured on the 16x ramp corpus (80k docs) where the per-token cost
dominates the fixed overhead.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tmdb_sync_spark.session import get_spark

N_REPS = 5


def fused_variant(spark, sf_dir):
    from tmdb_sync_spark.functions.text import (
        BPE_PATTERN,
        STOPWORDS,
        _MARKERS,
        _tokens,
    )
    from tmdb_sync_spark.io import parallel_table

    docs = parallel_table(spark, sf_dir, "documents").withColumn(
        "_toks", _tokens(F.col("text"))
    )
    t = F.col("_toks")
    zero = F.struct(
        F.lit(0).alias("chars"), F.lit(0).alias("stop"),
        F.lit(0).alias("en"), F.lit(0).alias("de"),
        F.lit(0).alias("es"), F.lit(0).alias("fr"),
    )

    def bump(pred):
        return F.when(pred, 1).otherwise(0)

    def fold(a, x):
        lx = F.lower(x)
        return F.struct(
            (a.chars + F.length(x)).alias("chars"),
            (a.stop + bump(lx.isin(*STOPWORDS))).alias("stop"),
            (a.en + bump(lx.isin(*_MARKERS["en"]))).alias("en"),
            (a.de + bump(lx.isin(*_MARKERS["de"]))).alias("de"),
            (a.es + bump(lx.isin(*_MARKERS["es"]))).alias("es"),
            (a.fr + bump(lx.isin(*_MARKERS["fr"]))).alias("fr"),
        )

    docs = docs.withColumn("_agg", F.aggregate(t, zero, fold))
    n_tokens = F.size(t)
    token_chars = F.col("_agg.chars").cast("long")
    n_stop = F.col("_agg.stop")
    n_punct = (
        F.length("text")
        - F.length(F.regexp_replace("text", r"[^A-Za-z0-9\s]", ""))
    )
    n_bpe = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), F.lit(0))
    )
    stop_ratio = n_stop / n_tokens
    quality = (
        F.when(n_tokens >= 10, 0.5).otherwise(0.0)
        + F.when(stop_ratio.between(0.05, 0.6), 0.3).otherwise(0.0)
        + F.when(n_punct * 5 < F.length(F.trim(F.col("text"))), 0.2)
         .otherwise(0.0)
    )
    en, de, es, fr = (F.col(f"_agg.{c}") for c in ("en", "de", "es", "fr"))
    guess = (
        F.when((en == 0) & (de == 0) & (es == 0) & (fr == 0), "und")
        .when((en >= de) & (en >= es) & (en >= fr), "en")
        .when((de >= es) & (de >= fr), "de")
        .when(es >= fr, "es")
        .otherwise("fr")
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        n_punct.alias("n_punct"),
        token_chars.alias("token_chars"),
        (token_chars / n_tokens).alias("avg_token_len"),
        n_stop.alias("n_stopwords"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality_score"),
        F.col("lang").alias("lang_label"),
        en.alias("en_n"),
        de.alias("de_n"),
        es.alias("es_n"),
        fr.alias("fr_n"),
        guess.alias("lang_guess"),
    )


def main() -> None:
    spark = get_spark("exp-text-fuse")
    spark.sparkContext.setLogLevel("ERROR")
    import tmdb_sync_spark.all_queries  # noqa: F401
    from tmdb_sync_spark.registry import QUERIES

    from exp_scale_ramp import build_scaled  # noqa: E402

    sf_dir = build_scaled(spark, 16)
    nd = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    print(f"corpus: {nd} docs", flush=True)

    variants = {
        "multi-pass": lambda: QUERIES["tx_text_features"](spark, sf_dir),
        "fused-fold": lambda: fused_variant(spark, sf_dir),
    }
    a = variants["multi-pass"]().toPandas().sort_values("doc_id")
    b = variants["fused-fold"]().toPandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True)), (
        "variants disagree"
    )
    print(f"equivalent: {len(a)} rows identical", flush=True)

    runs: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(N_REPS):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            runs[k].append(round(time.perf_counter() - t0, 3))
    for k, xs in runs.items():
        med = sorted(xs)[len(xs) // 2]
        print(f"{k}: median {med}  runs {xs}", flush=True)


if __name__ == "__main__":
    main()
