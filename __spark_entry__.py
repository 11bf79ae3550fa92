"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship coverage report (SURVEY.md §7 Phase 1);
``queries()`` / ``oracle_sql()`` expose the operator registry of
``tmdb_sync_spark`` — one entry per implemented operator from SURVEY.md §2
plus the large-scale pipeline operators (dedup / similarity / text /
multimodal).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import tmdb_sync_spark.all_queries  # noqa: E402,F401  (populates the registry)
from tmdb_sync_spark.registry import ORACLES, QUERIES  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["a1_sync_coverage"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (same column names)."""
    return dict(ORACLES)
