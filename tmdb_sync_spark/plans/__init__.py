"""Custom plan constructions that Spark does not ship natively (MERGE)."""

from tmdb_sync_spark.plans.merge import merge_into  # noqa: F401
