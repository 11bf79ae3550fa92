"""Incremental ingestion + structured streaming (SURVEY §2.10)."""

import tmdb_sync_spark.streaming.dedup  # noqa: F401
import tmdb_sync_spark.streaming.queries  # noqa: F401  (registers queries)
import tmdb_sync_spark.streaming.windows  # noqa: F401

# file_ingest registers only into the retired/local-parity window
# (st_file_drop_ingest), so importing it last cannot perturb the
# driver's 50-slot registration order.
import tmdb_sync_spark.streaming.file_ingest  # noqa: E402,F401
