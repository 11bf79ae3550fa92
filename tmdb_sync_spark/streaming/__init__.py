"""Incremental ingestion + structured streaming (SURVEY §2.10)."""

import tmdb_sync_spark.streaming.dedup  # noqa: F401
import tmdb_sync_spark.streaming.queries  # noqa: F401  (registers queries)
import tmdb_sync_spark.streaming.windows  # noqa: F401
