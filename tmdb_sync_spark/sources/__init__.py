"""Source layer: the TMDB-feed Python Data Source + enrichment (SURVEY §2.1)."""

import tmdb_sync_spark.sources.queries  # noqa: F401  (registers queries)
