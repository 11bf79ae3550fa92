"""The dynamic catalog-search facade vs an independent Python model.

api.search_movies composes the P-operators the way the reference's
endpoints compose their Mongo filter dict (app/endpoints/catalog.py:30-79,
movies.py:20-78); the oracle here is a direct Python evaluation of the
same semantics over the same rows — independent of both Spark and the
filter-builder under test.
"""

from __future__ import annotations

import re

import pytest

from tmdb_sync_spark.api import get_movie, movies_by_ids, search_movies

ROWS = [
    # id, ctype, title, title_ru, genre_ids, release_date, popularity,
    # vote_average, vote_count, country_codes, is_animated, n_valid_frames
    (1, "movie", "The Matrix", "Матрица", [28, 878], "1999-03-31", 50.0, 8.7, 20000, ["US"], False, 4),
    (2, "movie", "Spirited Away", "Унесённые призраками", [16, 14], "2001-07-20", 40.0, 8.5, 15000, ["JP"], True, 6),
    (3, "tv", "Dark", "Тьма", [18, 9648], "2017-12-01", 30.0, 8.2, 9000, ["DE"], False, 2),
    (4, "movie", "No Frames", None, [28], "2005-01-01", 70.0, 7.0, 30000, ["US"], False, 0),
    (5, "movie", None, "Безымянный", [35], "1997-06-15", None, 6.1, 500, ["FR", ""], False, 1),
    (6, "tv", "Matrix Documentary", None, [99], "2021-09-09", 10.0, 6.9, 800, ["US", "GB"], False, 3),
    (7, "movie", "Akira", "Акира", [16, 28], "1988-07-16", 35.0, 8.0, 12000, ["JP"], True, 5),
    (8, "movie", "Amélie", "Амели", [35, 10749], "2001-04-25", 45.0, 8.3, 11000, ["FR"], False, 7),
]
SCHEMA = (
    "id BIGINT, content_type STRING, title STRING, title_ru STRING, "
    "genre_ids ARRAY<BIGINT>, release_date STRING, popularity DOUBLE, "
    "vote_average DOUBLE, vote_count BIGINT, country_codes ARRAY<STRING>, "
    "is_animated BOOLEAN, n_valid_frames BIGINT"
)
COLS = [c.split()[0] for c in SCHEMA.split(", ")]


@pytest.fixture(scope="module")
def movies(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def model_search(query=None, genre_id=None, country_code=None,
                 year_from=None, year_to=None, is_animated=None,
                 content_type=None, sort_by="vote_count", order="desc",
                 limit=20, skip=0):
    """Independent evaluation of the endpoint semantics over ROWS."""
    d = [dict(zip(COLS, r)) for r in ROWS]
    out = [r for r in d if r["n_valid_frames"] > 0]
    if query is not None:
        rx = re.compile(query, re.IGNORECASE)
        out = [r for r in out
               if (r["title"] is not None and rx.search(r["title"]))
               or (r["title_ru"] is not None and rx.search(r["title_ru"]))]
    if genre_id is not None:
        out = [r for r in out if genre_id in r["genre_ids"]]
    if country_code is not None:
        out = [r for r in out if country_code in r["country_codes"]]
    if is_animated is not None:
        out = [r for r in out if r["is_animated"] == is_animated]
    if content_type is not None:
        out = [r for r in out if r["content_type"] == content_type]
    if year_from is not None:
        out = [r for r in out if r["release_date"] >= f"{year_from}-01-01"]
    if year_to is not None:
        out = [r for r in out if r["release_date"] <= f"{year_to}-12-31"]
    # stable two-pass sort: unique tiebreak first, then the sort key with
    # Mongo's null placement (null lowest: asc → first, desc → last)
    out.sort(key=lambda r: (r["id"], r["content_type"]))
    none_low = 1 if order == "desc" else -1
    out.sort(
        key=lambda r: (none_low if r[sort_by] is None else 0, r[sort_by] or 0)
        if sort_by in ("popularity", "vote_average", "vote_count", "year")
        else (none_low if r[sort_by] is None else 0, r[sort_by] or ""),
        reverse=(order == "desc"),
    )
    # reverse=True flips the None bucket too; re-pin: None always means
    # "last under desc, first under asc"
    nn = [r for r in out if r[sort_by] is not None]
    ns = [r for r in out if r[sort_by] is None]
    out = (nn + ns) if order == "desc" else (ns + nn)
    return [r["id"] for r in out[skip:skip + limit]]


def got_ids(df):
    return [r["id"] for r in df.collect()]


def test_default_search_filters_frameless_and_sorts(movies):
    assert got_ids(search_movies(movies)) == model_search()
    # id 4 (no frames) is excluded by the base predicate everywhere
    assert 4 not in got_ids(search_movies(movies))


def test_ci_regex_query_matches_either_title(movies):
    # 'matrix' matches title on 1 and 6; cyrillic matches title_ru on 2
    assert got_ids(search_movies(movies, query="matrix")) == \
        model_search(query="matrix")
    assert got_ids(search_movies(movies, query="призрак")) == \
        model_search(query="призрак")


def test_conjunction_of_all_parameters(movies):
    kw = dict(genre_id=16, country_code="JP", year_from=1980, year_to=2010,
              is_animated=True, content_type="movie",
              sort_by="popularity", order="asc")
    assert got_ids(search_movies(movies, **kw)) == model_search(**kw)


def test_pagination_is_deterministic_and_disjoint(movies):
    p1 = got_ids(search_movies(movies, limit=3, skip=0))
    p2 = got_ids(search_movies(movies, limit=3, skip=3))
    assert p1 == model_search(limit=3, skip=0)
    assert p2 == model_search(limit=3, skip=3)
    assert not set(p1) & set(p2)
    assert p1 + p2 == model_search(limit=6, skip=0)


def test_null_sort_keys_take_mongo_placement(movies):
    # popularity NULL (id 5): last under desc, first under asc
    desc = got_ids(search_movies(movies, sort_by="popularity", order="desc"))
    asc = got_ids(search_movies(movies, sort_by="popularity", order="asc"))
    assert desc == model_search(sort_by="popularity", order="desc")
    assert asc == model_search(sort_by="popularity", order="asc")
    assert desc[-1] == 5 and asc[0] == 5


def test_validation_mirrors_endpoint_contracts(movies):
    with pytest.raises(ValueError, match="sort_by"):
        search_movies(movies, sort_by="title")       # not whitelisted
    with pytest.raises(ValueError, match="order"):
        search_movies(movies, order="up")
    with pytest.raises(ValueError, match="limit"):
        search_movies(movies, limit=0)
    with pytest.raises(ValueError, match="limit"):
        search_movies(movies, limit=201)
    with pytest.raises(ValueError, match="skip"):
        search_movies(movies, skip=-1)
    with pytest.raises(ValueError, match="content_type"):
        search_movies(movies, content_type="show")
    with pytest.raises(ValueError, match="non-empty"):
        movies_by_ids(movies, [])


def test_by_ids_and_single_fetch(movies):
    assert sorted(got_ids(movies_by_ids(movies, [1, 3, 999]))) == [1, 3]
    assert got_ids(movies_by_ids(movies, [1, 3], content_type="tv")) == [3]
    row = get_movie(movies, 2)
    assert row is not None and row["title"] == "Spirited Away"
    assert get_movie(movies, 2, content_type="tv") is None   # the 404 case
    assert get_movie(movies, 999) is None


def test_search_plan_is_scan_plus_topk(movies):
    """The facade must compose to the pagination operator's physical
    shape: filtered scan + TakeOrderedAndProject, no global sort, no
    join, no exchange beyond the top-k merge."""
    df = search_movies(movies, genre_id=28, sort_by="popularity", limit=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan and "Exchange rangepartitioning" not in plan


def test_search_over_live_ingest_table(spark, tmp_path):
    """End-to-end: the facade over the REAL ingest output (run_sync_top →
    read_partitioned), proving the schema contract holds against the
    table users actually query, not just a synthesized frame."""
    from tmdb_sync_spark.plans.partitioned import read_partitioned
    from tmdb_sync_spark.streaming.ingest import run_sync_top

    state = str(tmp_path / "state")
    run_sync_top(spark, state, max_pages=2, batch_pages=2)
    movies = read_partitioned(spark, f"{state}/movies")
    page = search_movies(movies, sort_by="vote_count", order="desc",
                         limit=10)
    rows = page.collect()
    assert 0 < len(rows) <= 10
    # monotone sort with the unique tiebreak; projection excludes
    # engine-internal columns
    vcs = [r["vote_count"] for r in rows]
    assert vcs == sorted(vcs, reverse=True)
    assert "synced_at" not in page.columns and "year" not in page.columns
    # every returned row has frames (the base predicate)
    assert all(r["n_valid_frames"] > 0 for r in rows)


@pytest.mark.slow
def test_string_and_year_sort_fields(spark, movies, tmp_path):
    """The two non-numeric whitelist entries: release_date sorts
    lexicographically (the ISO-string idiom), and year resolves through
    the ingest's materialized column (absent from this synthetic frame,
    present on the live table)."""
    got = got_ids(search_movies(movies, sort_by="release_date",
                                order="asc", limit=50))
    want = model_search(sort_by="release_date", order="asc", limit=50)
    assert got == want

    from tmdb_sync_spark.plans.partitioned import read_partitioned
    from tmdb_sync_spark.streaming.ingest import run_sync_years

    state = str(tmp_path / "s")
    run_sync_years(spark, state, start_year=1999, end_year=2000,
                   batch_pages=5)
    live = read_partitioned(spark, f"{state}/movies")
    page = search_movies(live, sort_by="year", order="asc", limit=30)
    ys = [r["release_date"][:4] for r in page.collect()]
    assert ys == sorted(ys) and len(ys) == 30
