#!/usr/bin/env python3
"""A/B the quality stage's token machinery (r13 item #4).

Variants over the documents table at sf0.1 (projection → noop):
  A. shipped: materialized token array; interpreted per-token stopword
     filter (size(filter(t, lower(x) isin …)))
  B. regex-count stopwords: n_stop = regexp_count(text, word-boundary
     alternation), token array still materialized for ntok
  C. no-array: n_stop and ntok both regex counts — no token array at all

Asserts bit-identical (doc_id, ntok, n_stop, q) across variants first,
then interleaved timing (noop sink), REPS pairs.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tmdb_sync_spark.functions.text import (
    WS_CHARS,
    quality_score_expr,
    stopword_count_expr,
    tokens_expr,
    trim_ws,
    STOPWORDS,
)
from tmdb_sync_spark.io import parallel_table
from tmdb_sync_spark.session import get_spark

REPS = int(os.environ.get("REPS", "5"))
NONWS = rf"[^{WS_CHARS}]"
STOP_ALT = "|".join(sorted(STOPWORDS, key=len, reverse=True))
STOP_RX = rf"(?i)(?<!{NONWS})(?:{STOP_ALT})(?!{NONWS})"


def variant_a(docs):
    t = tokens_expr(F.col("text"))
    d = docs.withColumn("_toks", t)
    n_stop = stopword_count_expr(F.col("_toks"))
    return d.select(
        "doc_id",
        F.size("_toks").alias("ntok"),
        n_stop.alias("n_stop"),
        quality_score_expr(F.col("text"), tokens=F.col("_toks")).alias("q"),
    )


def variant_b(docs):
    t = tokens_expr(F.col("text"))
    d = docs.withColumn("_toks", t)
    n_stop = F.regexp_count(F.col("text"), F.lit(STOP_RX))
    return d.select(
        "doc_id",
        F.size("_toks").alias("ntok"),
        n_stop.alias("n_stop"),
        quality_score_expr(
            F.col("text"), tokens=F.col("_toks"), n_stop=n_stop
        ).alias("q"),
    )


def variant_c(docs):
    n_stop = F.regexp_count(F.col("text"), F.lit(STOP_RX))
    ntok = F.when(
        F.col("text").isNotNull(),
        F.greatest(F.regexp_count(F.col("text"), F.lit(NONWS + "+")), F.lit(1)),
    )
    n_tokens = ntok
    n_punct = F.length(
        F.translate(
            F.col("text"),
            "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
            + WS_CHARS.encode().decode("unicode_escape"),
            "",
        )
    )
    stop_ratio = n_stop / n_tokens
    q = (
        F.when(n_tokens >= 10, 0.5).otherwise(0.0)
        + F.when(stop_ratio.between(0.05, 0.6), 0.3).otherwise(0.0)
        + F.when(n_punct * 5 < F.length(trim_ws(F.col("text"))), 0.2)
        .otherwise(0.0)
    )
    return docs.select(
        "doc_id", ntok.alias("ntok"), n_stop.alias("n_stop"), q.alias("q")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp-quality-stopword")
    spark.sparkContext.setLogLevel("ERROR")
    docs = parallel_table(spark, sf_dir, "documents")

    a, b, c = variant_a(docs), variant_b(docs), variant_c(docs)
    for name, v in (("B", b), ("C", c)):
        diff = a.exceptAll(v).count() + v.exceptAll(a).count()
        print(f"variant {name} exceptAll-diff vs A: {diff}", flush=True)
        assert diff == 0, f"variant {name} diverges"

    # hostile probes: unicode case oddities, empty/WS/NULL text
    hostile = spark.createDataFrame(
        [
            (1, "The AND of TO in IS a"),
            (2, "theİS i̇s KKelvin K"),   # İ, combining dot, Kelvin sign
            (3, ""),
            (4, " \t\n\x0b "),
            (5, None),
            (6, "theand ofto ȧ THE"),
            (7, "ßS ẞS tHe"),                        # ß/ẞ shapes
            (8, "a a a a a a a a a a and of"),
        ],
        "doc_id long, text string",
    )
    ha, hb, hc = variant_a(hostile), variant_b(hostile), variant_c(hostile)
    for name, v in (("B", hb), ("C", hc)):
        diff = ha.exceptAll(v).count() + v.exceptAll(ha).count()
        print(f"hostile {name} diff: {diff}", flush=True)
        if diff:
            print("A:", sorted(map(tuple, ha.collect())))
            print(name + ":", sorted(map(tuple, v.collect())))
        assert diff == 0

    for v in (a, b, c):
        v.write.format("noop").mode("overwrite").save()
    times = {"A": [], "B": [], "C": []}
    for _ in range(REPS):
        for name, v in (("A", a), ("B", b), ("C", c)):
            t0 = time.perf_counter()
            v.write.format("noop").mode("overwrite").save()
            times[name].append(round(time.perf_counter() - t0, 3))
    import statistics

    for name, ts in times.items():
        print(name, ts, "median", statistics.median(ts), flush=True)


if __name__ == "__main__":
    main()
