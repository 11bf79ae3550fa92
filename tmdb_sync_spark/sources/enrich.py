"""Per-item enrichment fetches (S5/S6/S7) as partition-parallel batch joins.

The reference enriches one item at a time with three *sequential* awaited
HTTP calls — details, ru-title, backdrops (``app/sync_top.py:190-207``; see
SURVEY §3.3 step 4). That is the architecture's dominant latency term. Here
each enrichment is a ``mapInPandas`` pass: one Arrow batch in, one batched
"client" call per partition, columns appended JVM-side afterwards. On a
cluster this runs once per input partition with connection reuse — the
correct scale shape for a remote keyed lookup (semantically a left join
against the remote source, SURVEY §2.1 S5).

The fixture (``fixture.py``) stands in for httpx; a production deployment
would swap ``_details_client`` for a real pooled HTTP client with the
reference's retry policy (3 attempts, ``app/tmdb_client.py:390``) — the
Spark-side plumbing (schemas, batching, partitioning) is identical and is
what's under test.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from tmdb_sync_spark.sources import fixture

FRAME_SCHEMA = (
    "id BIGINT, path STRING, aspect_ratio DOUBLE, vote_average DOUBLE, "
    "width BIGINT, j BIGINT"
)


def enrich_details(df: DataFrame) -> DataFrame:
    """Append ``title_ru`` and raw ``country_codes`` (S5+S6).

    ``country_codes`` here is the *raw* projection of
    ``production_countries[].iso_3166_1`` (``app/sync.py:106-107``) — may
    contain falsy codes; the null-safe filter variant
    (``app/catalog/upsert.py:65-66``) is a downstream query concern (AR2).
    """
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", title_ru STRING, country_codes ARRAY<STRING>"

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"]
            pdf = pdf.copy()
            pdf["title_ru"] = [fixture.title_ru(int(i)) for i in ids]
            pdf["country_codes"] = [
                [c["iso_3166_1"]
                 for c in fixture.details(int(i))["production_countries"]]
                for i in ids
            ]
            yield pdf

    return df.mapInPandas(batch, out_schema)


def fetch_frames(ids_df: DataFrame) -> DataFrame:
    """Exploded backdrop rows for each input ``id`` (S7 fetch step).

    Output carries ``j`` (API response position) — the keep-first dedup and
    stable-sort semantics of ``app/tmdb_client.py:199-221`` need the
    original order to be reproducible on an unordered DataFrame.
    """

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                {"id": int(i), **fixture.frame(int(i), j)}
                for i in pdf["id"]
                for j in range(fixture.n_frames(int(i)))
            ]
            yield pd.DataFrame(
                rows,
                columns=["id", "path", "aspect_ratio", "vote_average",
                         "width", "j"],
            )

    return ids_df.select("id").mapInPandas(batch, FRAME_SCHEMA)
