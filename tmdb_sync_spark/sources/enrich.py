"""Per-item enrichment fetches (S5/S6/S7) as partition-parallel batch joins.

The reference enriches one item at a time with three *sequential* awaited
HTTP calls — details, ru-title, backdrops (``app/sync_top.py:190-207``; see
SURVEY §3.3 step 4). That is the architecture's dominant latency term. Here
each enrichment is a ``mapInPandas`` pass: one Arrow batch in, one batched
"client" call per partition, columns appended JVM-side afterwards. On a
cluster this runs once per input partition with connection reuse — the
correct scale shape for a remote keyed lookup (semantically a left join
against the remote source, SURVEY §2.1 S5).

All lookups go through the injectable client seam
(``sources/http_client.py``): the shared 3-attempt retry with linear
backoff (``app/tmdb_client.py:390``) over either the deterministic fixture
transport (default) or a pooled httpx transport (TMDB_API_BASE opt-in) —
a production deployment swaps the transport without touching the tested
Spark-side plumbing (schemas, batching, partitioning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tmdb_sync_spark.sources.http_client import get_api

FRAME_SCHEMA = (
    "id BIGINT, path STRING, aspect_ratio DOUBLE, vote_average DOUBLE, "
    "width BIGINT, j BIGINT"
)


def _country_codes(details: dict) -> list:
    """Raw ``production_countries[].iso_3166_1`` projection. ``.get`` with
    ``[]``: a details payload MAY omit the key entirely and the reference
    treats that as "no countries", not an error (app/sync.py:106,
    app/sync_top.py:200); the inner ``iso_3166_1`` stays a hard index,
    as in the reference."""
    return [c["iso_3166_1"] for c in details.get("production_countries", [])]


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
        api = get_api()   # per-process pooled client
        for pdf in it:
            ids = pdf["id"]
            cts = pdf["content_type"] if "content_type" in pdf else ["movie"] * len(pdf)
            pdf = pdf.copy()
            pdf["title_ru"] = [
                api.title_ru(int(i), ct) for i, ct in zip(ids, cts)
            ]
            pdf["country_codes"] = [
                _country_codes(api.details(int(i), ct))
                for i, ct in zip(ids, cts)
            ]
            yield pdf

    return df.mapInPandas(batch, out_schema)


def valid_deduped_frames(frames: DataFrame) -> DataFrame:
    """P13+W3 over fetched frames: validity filter (1.5 ≤ ar ≤ 2.2, va ≥ 0,
    ``app/tmdb_client.py:194-196``) then keep-first dedup by (id, path) in
    API order (``:199-212``) — via aggregates, not windows: one shuffle on
    (id, path) after a map-side partial combine. The surviving struct ``s``
    carries (vote_average, width) for the downstream argmax plus
    aspect_ratio, which the reference's ``_normalize_frames`` keeps on
    every stored frame (``app/catalog/upsert.py:26-34``) and
    ``_project_movie`` serves verbatim — dropping it here would make
    served documents narrower than the reference's (r6 ADVICE)."""
    valid = frames.where(
        F.col("aspect_ratio").between(1.5, 2.2) & (F.col("vote_average") >= 0)
    )
    return valid.groupBy("id", "path").agg(
        F.min_by(
            F.struct("vote_average", "width", "aspect_ratio"), "j"
        ).alias("s")
    )


def frames_array_agg() -> "F.Column":
    """Aggregate :func:`valid_deduped_frames` rows into the per-movie
    ``frames`` ARRAY column the reference's document stores
    (``app/catalog/upsert.py:59``, ``_normalize_frames`` output): one
    struct per surviving path, canonically path-sorted so the stored
    array is deterministic regardless of aggregation order. Bounded by
    the same ≤~40-frames-per-movie bound the argmax relies on.

    Keep-max-width note: the reference normalizes AGAIN at upsert
    (keep-best-width per path, upsert.py:26-34), but its input has
    already been path-deduped by the client fetch (keep-first,
    tmdb_client.py:199-212) — paths are unique by then, so the second
    pass is a no-op and this single aggregation is the faithful result.
    """
    return F.array_sort(
        F.collect_list(
            F.struct(
                F.col("path"),
                F.col("s.vote_average").alias("vote_average"),
                F.col("s.width").alias("width"),
                # appended LAST: array_sort compares struct fields in
                # order, and (id, path) is unique post-dedup, so the
                # canonical path-first ordering is unchanged
                F.col("s.aspect_ratio").alias("aspect_ratio"),
            )
        )
    )


def pick_backdrop_expr(frames: "F.Column", bad: "F.Column") -> "F.Column":
    """``pick_backdrop`` (``app/utils/frames.py:4-19``) over the STORED
    frames array: exclude ``bad`` paths, argmax by (vote_average desc,
    width desc) with null→0 coercion and the engine's pinned path
    tiebreak — the array-HOF twin of :func:`best_path_expr`, usable
    inside MERGE expressions where frames are a column, not rows.
    Returns NULL when no frame survives (the reference returns None)."""
    allowed = F.filter(
        F.coalesce(frames, F.array().cast(
            "array<struct<path:string,vote_average:double,width:bigint,"
            "aspect_ratio:double>>")),
        lambda f: ~F.array_contains(
            F.coalesce(bad, F.array().cast("array<string>")), f["path"]
        ),
    )
    ranked = F.array_sort(
        F.transform(
            allowed,
            lambda f: F.struct(
                (-F.coalesce(f["vote_average"], F.lit(0.0))).alias("nva"),
                (-F.coalesce(f["width"], F.lit(0)).cast("double")).alias("nw"),
                f["path"].alias("path"),
            ),
        )
    )
    return F.try_element_at(ranked, F.lit(1))["path"]


def best_path_expr() -> "F.Column":
    """W1 argmax aggregate over :func:`valid_deduped_frames` output: total
    order (vote_average desc, width desc, path asc) via min_by on negated
    numeric keys — the path tiebreak pins the argmax even when
    (vote_average, width) pairs collide."""
    return F.min_by(
        "path",
        F.struct(
            (-F.col("s.vote_average")).alias("nva"),
            (-F.col("s.width")).alias("nw"),
            F.col("path"),
        ),
    )


def fetch_frames(ids_df: DataFrame) -> DataFrame:
    """Exploded backdrop rows for each input ``id`` (S7 fetch step).

    Output carries ``j`` (API response position) — the keep-first dedup and
    stable-sort semantics of ``app/tmdb_client.py:199-221`` need the
    original order to be reproducible on an unordered DataFrame.
    """

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        api = get_api()
        for pdf in it:
            rows = [
                {"id": int(i), "path": b["file_path"],
                 "aspect_ratio": b["aspect_ratio"],
                 "vote_average": b["vote_average"], "width": b["width"],
                 "j": j}
                for i, ct in zip(pdf["id"], pdf["content_type"])
                for j, b in enumerate(api.backdrops(int(i), ct))
            ]
            yield pd.DataFrame(
                rows,
                columns=["id", "path", "aspect_ratio", "vote_average",
                         "width", "j"],
            )

    # content_type must reach the images endpoint (/movie/… vs /tv/…,
    # app/tmdb_client.py:169-282) — the fixture ignores it, a real
    # transport must not.
    cols = ids_df.select(
        "id",
        (F.col("content_type") if "content_type" in ids_df.columns
         else F.lit("movie")).alias("content_type"),
    )
    return cols.mapInPandas(batch, FRAME_SCHEMA)
