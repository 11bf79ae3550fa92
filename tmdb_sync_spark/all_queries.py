"""Import every query-defining module so the registry is fully populated.

Split from ``registry`` so importing the registry never recurses.
"""

# REGISTRATION ORDER IS A CONTRACT: the driver's correctness gate verifies
# the first 50 registry entries in registration order. The full registry is
# kept at ≤50 entries (near-duplicate coverage consolidated — see round-1
# VERDICT.md top item) so EVERY query gets a driver-green row; reference
# parity (operators → sources → streaming) registers before the
# beyond-reference pipeline operators (functions) so any future overflow
# drops extras, never the reference surface.

import tmdb_sync_spark.operators  # noqa: F401


def _optional(modname: str) -> None:
    """Import a query layer, tolerating ONLY genuinely absent external
    dependencies. A bare ``except ImportError`` here once swallowed any
    import-time failure inside the engine itself (review finding): a
    renamed internal symbol would silently shrink the registry, bench.py
    would then skip the vanished headline queries, and the suite total
    would read as a massive speedup. Internal breakage must stay loud."""
    import importlib

    try:
        importlib.import_module(modname)
    except ImportError as e:  # pragma: no cover - optional-dep containers
        if (e.name or "").startswith("tmdb_sync_spark"):
            raise
        import warnings

        warnings.warn(
            f"{modname} skipped: external dependency {e.name!r} missing"
        )


# source layer (Python Data Source + mapInPandas enrichment)
_optional("tmdb_sync_spark.sources")
# incremental ingestion pipeline + structured streaming
_optional("tmdb_sync_spark.streaming")
# large-scale pipeline operators (documents/embeddings tables)
_optional("tmdb_sync_spark.functions")
