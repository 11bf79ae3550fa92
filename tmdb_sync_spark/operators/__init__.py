"""Operator library — SURVEY.md §2 transplanted onto the driver star schema.

Importing this package populates ``tmdb_sync_spark.registry``.
"""

from tmdb_sync_spark.operators import (  # noqa: F401
    aggregates,
    arrays,
    filters,
    joins,
    merge,
    sorts,
    scalars,
    sql_api,
    windows,
)
