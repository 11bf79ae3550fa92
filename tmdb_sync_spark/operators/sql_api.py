"""The SQL entry point: one dialect-shared SQL text, two engines.

The engine's user surface is not only the DataFrame API — ``spark.sql``
over registered views is first-class (SURVEY §1.4; ``io.register_views``).
This query is written ONCE in the common ANSI subset of Spark SQL and
DuckDB SQL and executed verbatim by both: the Spark side via
``spark.sql(SQL_TEXT)``, the oracle side because the oracle string IS the
same constant. Any dialect drift would fail the parity gate by
construction.

Shape: TPC-H Q1-style pricing summary — scan-heavy, grouped, decimal-exact
aggregates; the canonical whole-stage-codegen benchmark kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tmdb_sync_spark.io import register_views
from tmdb_sync_spark.registry import register

SQL_TEXT = """
SELECT l_returnflag,
       l_linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
           AS avg_qty,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
           AS avg_disc
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""".strip()


@register("q1_sql_pricing_summary", oracle=SQL_TEXT)
def q1_sql_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 pricing summary through the textual SQL surface.

    ``spark.sql`` on registered temp views; the oracle is the *identical
    string*. Decimal-cast sums keep every aggregate order-independent
    (SURVEY §5 determinism rules); averages are one double division of
    exact operands. Plan: one scan (3-col pruning + shipdate pushdown) →
    partial/final hashagg → sort.
    """
    register_views(spark, sf_dir)
    return spark.sql(SQL_TEXT)
