"""Scalar-function layer (SURVEY.md §2.8 F1–F9).

Reference semantics: null-safe year extraction (``app/catalog/upsert.py:37-43``),
coalesce idioms (``app/sync.py:36``), conditional expressions
(``app/endpoints/meta_sync.py:38-52``), least/greatest range normalization
(``app/main.py:185-186``). All compile to Catalyst expressions — zero UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tmdb_sync_spark.io import table
from tmdb_sync_spark.registry import register


@register(
    "f1_try_cast_year",
    oracle="""
    SELECT o_orderstatus AS status,
           COUNT(*) AS n,
           CAST(SUM(COALESCE(TRY_CAST(substr(o_orderpriority, 1, 1) AS INT), 0)) AS BIGINT) AS priority_sum,
           CAST(SUM(CASE WHEN TRY_CAST(o_orderstatus AS INT) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS non_numeric_status,
           MIN(TRY_CAST(substr(strftime(o_orderdate, '%Y-%m-%d'), 1, 4) AS INT)) AS min_year,
           MAX(TRY_CAST(substr(strftime(o_orderdate, '%Y-%m-%d'), 1, 4) AS INT)) AS max_year
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
)
def f1_try_cast_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: null-safe year extraction via try_cast.

    Reference ``_extract_year`` (``app/catalog/upsert.py:37-43``) returns
    NULL when the prefix is absent/short/non-numeric, else int(prefix).
    ``try_cast(substring(x,1,4) AS INT)`` reproduces all three failure
    modes in one expression (SURVEY §2.8 F1). The non-numeric branch is
    exercised by casting the alphabetic status column.
    """
    o = table(spark, sf_dir, "orders")
    year = F.expr(
        "try_cast(substring(date_format(o_orderdate, 'yyyy-MM-dd'), 1, 4) AS INT)"
    )
    prio_num = F.expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)")
    return (
        o.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(prio_num, F.lit(0))).alias("priority_sum"),
            F.sum(
                F.when(F.expr("try_cast(o_orderstatus AS INT)").isNull(), 1).otherwise(0)
            ).alias("non_numeric_status"),
            F.min(year).alias("min_year"),
            F.max(year).alias("max_year"),
        )
        .orderBy("status")
    )


@register(
    "f4_f7_coalesce_cond",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0.0 THEN 'negative'
                WHEN c_acctbal < 5000.0 THEN 'mid'
                ELSE 'high' END AS balance_bucket,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS segment,
           COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def f4_f7_coalesce_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4+F7: coalesce and when/otherwise conditionals.

    Reference: ``data.get('title') or data.get('name')`` coalesce
    (``app/sync.py:36``) and ``$cond``/``$ifNull`` pipeline conditionals
    (``app/endpoints/meta_sync.py:38-52``).
    """
    c = table(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0.0, "negative")
        .when(F.col("c_acctbal") < 5000.0, "mid")
        .otherwise("high")
        .alias("balance_bucket")
    )
    segment = F.coalesce(
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
    ).alias("segment")
    return (
        c.groupBy(bucket, segment)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_bal"),
        )
        .orderBy("balance_bucket", "segment")
    )


@register(
    "f9_least_greatest",
    oracle="""
    SELECT l_returnflag AS return_flag,
           CAST(SUM(CAST(least(l_discount, l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_lo,
           CAST(SUM(CAST(greatest(l_discount, l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_hi,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY 1
    ORDER BY 1
    """,
)
def f9_least_greatest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: range-swap normalization via least/greatest.

    Reference: ``if end < start: swap`` (``app/main.py:185-186``,
    ``app/sync_years.py:166-167``) — expressed branch-free so it vectorizes.
    """
    li = table(spark, sf_dir, "lineitem")
    lo = F.least(F.col("l_discount"), F.col("l_tax"))
    hi = F.greatest(F.col("l_discount"), F.col("l_tax"))
    return (
        li.groupBy(F.col("l_returnflag").alias("return_flag"))
        .agg(
            F.sum(lo.cast("decimal(18,6)")).cast("double").alias("sum_lo"),
            F.sum(hi.cast("decimal(18,6)")).cast("double").alias("sum_hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("return_flag")
    )
