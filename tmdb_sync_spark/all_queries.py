"""Import every query-defining module so the registry is fully populated.

Split from ``registry`` so importing the registry never recurses.
"""

import tmdb_sync_spark.operators  # noqa: F401

try:  # large-scale pipeline operators (documents/embeddings tables)
    import tmdb_sync_spark.functions  # noqa: F401
except ImportError:  # pragma: no cover - keep parity queries alive regardless
    pass

try:  # source layer (Python Data Source + mapInPandas enrichment)
    import tmdb_sync_spark.sources  # noqa: F401
except ImportError:  # pragma: no cover
    pass

try:  # incremental ingestion pipeline + structured streaming
    import tmdb_sync_spark.streaming  # noqa: F401
except ImportError:  # pragma: no cover
    pass
