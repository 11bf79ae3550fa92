"""User-facing catalog API: the reference's read endpoints as DataFrame
functions (SURVEY §2.2 P1-P13 composed dynamically).

The reference exposes its catalog through a handful of HTTP endpoints
that BUILD a filter document from optional query parameters
(``app/endpoints/catalog.py:30-79``, ``app/endpoints/movies.py:20-78``).
The individual predicates are all implemented as fixed operator queries
(registry: p1..p12, o1/o2, p6_j2); this module is the missing
composition seam — a user of the reference switches by replacing each
endpoint call with the matching function over the ingest's movies table
(``streaming.ingest.run_sync_top`` output, read via
``plans.partitioned.read_partitioned``).

Design notes:

- Predicates append ONLY when their parameter is present — exactly the
  reference's imperative filter-dict build. Absent parameters add
  nothing to the plan, so Catalyst sees the minimal conjunction and
  pushes every sargable conjunct to the scan.
- Parameter validation mirrors the endpoints' FastAPI ``Query``
  contracts (sort whitelist, order whitelist, limit/skip bounds,
  _type ∈ {movie, tv}) as loud ``ValueError``s — the engine twin of a
  422 response.
- Pagination carries a unique ``(sort key, id, content_type)`` total
  order: Mongo's sort is non-stable, so page contents there are
  replay-dependent; pinning the order is the documented deviation
  (SURVEY §7 hard-part 2) every fixed pagination operator already
  makes.
- ``frames`` non-emptiness (the search endpoints' base predicate,
  ``catalog.py:47``) maps to ``n_valid_frames > 0``: the ingest
  pipeline reduces the reference's frames array to its argmax
  ``backdrop_path`` + ``n_valid_frames`` count (S7), so "has frames"
  is a count predicate here.

Scale notes: everything is one filtered scan + ``TakeOrderedAndProject``
(orderBy + offset/limit never global-sort); no joins, no shuffles beyond
the top-k merge. The search is exactly as 100 TB-safe as the fixed
pagination operator it composes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The endpoints' sort whitelists (movies.py:31-34 ∪ catalog.py:38):
# "year" resolves through the ingest's materialized year column.
SORT_FIELDS = (
    "popularity", "vote_average", "vote_count", "release_date", "year",
)
CONTENT_TYPES = ("movie", "tv")
MAX_LIMIT = 200          # movies.py:28 (catalog.py caps at 100; the
                         # wider bound is the union surface)

# _project_movie's keep-set (movies.py:10-17), translated to the ingest
# schema: _type → content_type; the frames array → its reduced
# backdrop_path/n_valid_frames pair.
PROJECTION = (
    "id", "title", "title_ru", "name", "content_type", "genre_ids",
    "release_date", "popularity", "vote_average", "vote_count",
    "country_codes", "is_animated", "backdrop_path", "n_valid_frames",
)


def _validate(name: str, value, allowed) -> None:
    if value is not None and value not in allowed:
        raise ValueError(
            f"search_movies: {name}={value!r} not in {tuple(allowed)}"
        )


def _projection(movies: DataFrame) -> list[str]:
    # tolerate schema subsets (a caller may have pruned columns already);
    # the keep-set is a MAXIMUM, like the reference's dict filter
    return [c for c in PROJECTION if c in movies.columns]


def search_movies(
    movies: DataFrame,
    *,
    query: str | None = None,
    genre_id: int | None = None,
    country_code: str | None = None,
    year_from: int | None = None,
    year_to: int | None = None,
    is_animated: bool | None = None,
    content_type: str | None = None,
    sort_by: str = "vote_count",
    order: str = "desc",
    limit: int = 20,
    skip: int = 0,
) -> DataFrame:
    """``GET /movies/search`` (catalog.py:30-79 ∪ movies.py:20-69).

    Builds the conjunction imperatively, parameter by parameter, exactly
    like the endpoints build their Mongo filter dict; returns the
    projected page as a DataFrame.
    """
    _validate("sort_by", sort_by, SORT_FIELDS)
    _validate("order", order, ("asc", "desc"))
    _validate("content_type", content_type, CONTENT_TYPES)
    if not 1 <= limit <= MAX_LIMIT:
        raise ValueError(f"search_movies: limit={limit} not in 1..{MAX_LIMIT}")
    if skip < 0:
        raise ValueError(f"search_movies: skip={skip} negative")

    # base predicate: has frames (catalog.py:47 — $exists && $ne [])
    preds: list[Column] = [F.col("n_valid_frames") > 0]
    if query is not None:
        # ci substring-regex OR over both titles (catalog.py:50-53);
        # Mongo $regex + $options:i ≡ unanchored (?i) rlike. NULL titles
        # make rlike NULL; coalesce keeps the OR a two-sided decision
        # like Mongo's (a missing field simply doesn't match).
        pat = f"(?i){query}"
        preds.append(
            F.coalesce(F.col("title").rlike(pat), F.lit(False))
            | F.coalesce(F.col("title_ru").rlike(pat), F.lit(False))
        )
    if genre_id is not None:
        # multikey membership: scalar-vs-array equality (movies.py:40)
        preds.append(F.array_contains("genre_ids", F.lit(genre_id)))
    if country_code is not None:
        preds.append(F.array_contains("country_codes", F.lit(country_code)))
    if is_animated is not None:
        preds.append(F.col("is_animated").eqNullSafe(F.lit(is_animated)))
    if content_type is not None:
        preds.append(F.col("content_type") == content_type)
    if year_from is not None:
        # the reference's string-date idiom, kept bit-exact (movies.py:48)
        preds.append(F.col("release_date") >= f"{year_from}-01-01")
    if year_to is not None:
        preds.append(F.col("release_date") <= f"{year_to}-12-31")

    cond = preds[0]
    for p in preds[1:]:
        cond = cond & p

    key = F.col(sort_by)
    first = key.desc_nulls_last() if order == "desc" else key.asc_nulls_first()
    page = (
        movies.where(cond)
        .orderBy(first, F.col("id").asc(), F.col("content_type").asc())
        .offset(skip)
        .limit(limit)
    )
    return page.select(*_projection(movies))


def movies_by_ids(
    movies: DataFrame,
    ids: list[int],
    content_type: str | None = None,
) -> DataFrame:
    """``GET /movies/by-ids`` (movies.py:71-79): literal ``$in`` compiled
    to a pushed Catalyst ``In`` predicate — the P6 shape."""
    _validate("content_type", content_type, CONTENT_TYPES)
    if not ids:
        raise ValueError("movies_by_ids: ids must be non-empty (FastAPI "
                         "requires the parameter)")
    out = movies.where(F.col("id").isin([int(i) for i in ids]))
    if content_type is not None:
        out = out.where(F.col("content_type") == content_type)
    return out.select(*_projection(movies))


def get_movie(
    movies: DataFrame, movie_id: int, content_type: str = "movie"
) -> dict | None:
    """``GET /movies/{id}`` (catalog.py:10-16): single-document fetch.
    Returns the projected row dict, or ``None`` (the 404 case). The
    ``collect`` is bounded by the key's uniqueness (the MERGE maintains
    one row per (id, content_type))."""
    _validate("content_type", content_type, CONTENT_TYPES)
    rows = (
        movies.where(
            (F.col("id") == int(movie_id))
            & (F.col("content_type") == content_type)
        )
        .select(*_projection(movies))
        .limit(2)
        .collect()
    )
    return rows[0].asDict() if rows else None
