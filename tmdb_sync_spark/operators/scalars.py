"""Scalar-function layer (SURVEY.md §2.8 F1–F9).

Reference semantics: null-safe year extraction (``app/catalog/upsert.py:37-43``),
coalesce idioms (``app/sync.py:36``), conditional expressions
(``app/endpoints/meta_sync.py:38-52``), least/greatest range normalization
(``app/main.py:185-186``). All compile to Catalyst expressions — zero UDFs;
one query exercises the whole layer (F1, F4, F7, F9) so the scalar surface
is a single driver-gate row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import Column

from tmdb_sync_spark.io import table
from tmdb_sync_spark.registry import register

# NaN-measure convention, shared by every aggregate over a DOUBLE metric
# column (events.value): NaN behaves as NULL — the row still counts
# toward COUNT(*), but never contributes to SUM/MAX/MIN. Without making
# this EXPLICIT in both engines they diverge silently (found by a
# hostile-events probe): Spark's ANSI cast(NaN AS DECIMAL) yields NULL —
# the sum quietly skips it — while DuckDB raises on the same cast, and
# DuckDB's MAX treats NaN as greater-than-everything while the stateful
# kernel's pandas max skips it. One expression per engine, same rule.
NAN_VALUE_SQL = "CASE WHEN isnan(value) THEN NULL ELSE value END"


def nan_to_null(col: Column) -> Column:
    """Spark twin of ``NAN_VALUE_SQL`` (NULL passes through unchanged)."""
    return F.when(F.isnan(col), F.lit(None)).otherwise(col)


# Exactly the string domain Spark's ANSI string→int cast can PARSE:
# trimAll strips chars ≤ 0x20 AND DEL (0x7F) from both ends, then sign +
# ASCII digits (UTF8String.toInt's grammar). Everything outside this
# regex is a guaranteed parse failure — returned as NULL without
# entering the cast. The trim set was established empirically on this
# Spark build by sweeping every BMP codepoint as a leading/trailing
# char: ONLY \x00-\x20 and \x7f are trimmed — C1 controls (U+0080-9F)
# and Unicode whitespace (U+2028 etc.) are NOT, so neither
# \p{javaWhitespace} nor \p{Cc} would be the right class here.
_INT_PARSE_GUARD = r"^[\x00-\x20\x7f]*[+-]?[0-9]+[\x00-\x20\x7f]*$"


def try_to_int(col: Column) -> Column:
    """``try_cast(col AS INT)`` without the caught-exception tax on
    non-numeric input.

    Spark's ``try_cast`` evaluates the ANSI cast and catches the
    per-row ``NumberFormatException`` — ~10 µs per FAILING row (the
    JVM fills in a stack trace each time). On a column where failure is
    the COMMON case that tax dominates the whole aggregate: the r10
    extended-bench section caught ``f_scalar_suite`` at 6.6 s warm
    where its plan-twin aggregates run in ~1 s, and bisection attributed
    ~6 s to one ``try_cast(l_returnflag AS INT)`` over 600 k
    always-non-numeric rows. The regex guard above short-circuits every
    row the cast could not possibly parse straight to NULL (regex ≈
    0.5 µs/row, no exception); rows that MATCH still go through real
    ``try_cast``, so out-of-int-range digits ('99999999999') stay NULL
    exactly as before. Result-identical to bare ``try_cast`` by
    construction: the guard's accept set is precisely the parseable
    grammar, and the inner try_cast decides overflow.
    """
    return F.when(col.rlike(_INT_PARSE_GUARD), col.try_cast("int"))


@register(
    "f_scalar_suite",
    oracle="""
    SELECT l_returnflag AS return_flag,
           CASE WHEN l_quantity < 10.0 THEN 'low'
                WHEN l_quantity < 30.0 THEN 'mid'
                ELSE 'high' END AS qty_bucket,
           COALESCE(NULLIF(l_linestatus, 'O'), 'OTHER') AS line_segment,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN TRY_CAST(l_returnflag AS INT) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS non_numeric_flag,
           MIN(TRY_CAST(substr(strftime(l_shipdate, '%Y-%m-%d'), 1, 4) AS INT)) AS min_ship_year,
           MAX(TRY_CAST(substr(strftime(l_shipdate, '%Y-%m-%d'), 1, 4) AS INT)) AS max_ship_year,
           CAST(SUM(CAST(least(l_discount, l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_lo,
           CAST(SUM(CAST(greatest(l_discount, l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_hi
    FROM lineitem
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def f_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F4+F7+F9 in one grouped projection.

    - F1 (``_extract_year``, ``app/catalog/upsert.py:37-43``): NULL when
      the prefix is absent/short/non-numeric, else int(prefix) —
      ``try_cast(substring(x,1,4) AS INT)`` reproduces all three failure
      modes; the non-numeric branch is exercised by casting the alphabetic
      return flag.
    - F4 coalesce (``data.get('title') or data.get('name')``,
      ``app/sync.py:36``) via ``coalesce(nullif(...), ...)``.
    - F7 conditionals (``$cond``/``$ifNull``,
      ``app/endpoints/meta_sync.py:38-52``) via when/otherwise buckets.
    - F9 range-swap (``if end < start: swap``, ``app/main.py:185-186``)
      via branch-free least/greatest, summed through DECIMAL so the
      aggregate is shuffle-order-independent.
    """
    li = table(spark, sf_dir, "lineitem")
    bucket = (
        F.when(F.col("l_quantity") < 10.0, "low")
        .when(F.col("l_quantity") < 30.0, "mid")
        .otherwise("high")
        .alias("qty_bucket")
    )
    segment = F.coalesce(
        F.nullif(F.col("l_linestatus"), F.lit("O")), F.lit("OTHER")
    ).alias("line_segment")
    # year(), not try_cast(substring(date_format(...))) (r12, guide
    # §1.2): the oracle spells the year extraction as string prefix
    # parsing, but over a DATE column the two are value-identical for
    # every representable Spark date (years 0001–9999 format to exactly
    # 4 digits; NULL → NULL) — and the format→substring→parse chain
    # cost ~0.4 s of the query's 1.4 s at sf0.1 (A/B: 1.46 → 1.02 s
    # warm, results bit-identical; the oracle side is unchanged and
    # still pins the parsing semantics).
    ship_year = F.year("l_shipdate").cast("int")
    lo = F.least(F.col("l_discount"), F.col("l_tax"))
    hi = F.greatest(F.col("l_discount"), F.col("l_tax"))
    return (
        li.groupBy(F.col("l_returnflag").alias("return_flag"), bucket, segment)
        .agg(
            F.count(F.lit(1)).alias("n"),
            # try_to_int, not bare try_cast: the flag is non-numeric on
            # EVERY row, the worst case for try_cast's caught-exception
            # path (see try_to_int — found by the r10 extended bench)
            F.sum(
                F.when(try_to_int(F.col("l_returnflag")).isNull(), 1)
                .otherwise(0)
            ).alias("non_numeric_flag"),
            F.min(ship_year).alias("min_ship_year"),
            F.max(ship_year).alias("max_ship_year"),
            F.sum(lo.cast("decimal(18,6)")).cast("double").alias("sum_lo"),
            F.sum(hi.cast("decimal(18,6)")).cast("double").alias("sum_hi"),
        )
        .orderBy("return_flag", "qty_bucket", "line_segment")
    )
