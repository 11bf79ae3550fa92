"""Source layer: the TMDB-feed Python Data Source + enrichment
(SURVEY §2.1), plus the JSONL/CSV file boundary (files.py)."""

import tmdb_sync_spark.sources.queries  # noqa: F401  (registers queries)
