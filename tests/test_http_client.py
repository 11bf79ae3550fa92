"""The injectable HTTP client seam: the shared retry/backoff/dead-letter
policy must behave identically over any transport (SURVEY §2.1 S1-S7;
reference policy app/sync_top.py:46, app/tmdb_client.py:55,76-85,390)."""

from __future__ import annotations

import pytest

from tmdb_sync_spark.sources import fixture
from tmdb_sync_spark.sources.http_client import (
    DISCOVER_ATTEMPTS,
    FixtureTransport,
    HttpStatusError,
    TmdbApi,
    TransientHttpError,
    error_record,
    request_with_retry,
)


def test_retry_recovers_from_transients():
    # page 7: 7 % 7 == 0 → responds on attempt 1 + 7 % 3 = 2
    api = TmdbApi(FixtureTransport())
    page = api.discover_top(7)
    assert page["page"] == 7 and len(page["results"]) == fixture.PAGE_SIZE
    key = [k for k in api.transport._attempts if k[0] == "/discover/movie"]
    assert api.transport._attempts[key[0]] == 2


class _AlwaysDown:
    backoff = staticmethod(lambda attempt: None)

    def __init__(self):
        self.calls = 0

    def request(self, endpoint, params):
        self.calls += 1
        raise TransientHttpError("boom")


def test_retry_exhaustion_bounded_and_dead_letterable():
    t = _AlwaysDown()
    with pytest.raises(TransientHttpError):
        request_with_retry(t, "/discover/movie", {"page": 1})
    assert t.calls == DISCOVER_ATTEMPTS   # app/sync_top.py:46

    rec = error_record("/discover/movie", TransientHttpError("boom"), page=1)
    assert rec["category"] == "other" and rec["status_code"] is None
    rec = error_record("/movie/1", HttpStatusError(404, "nope"), item_id=1)
    assert rec["category"] == "http" and rec["status_code"] == 404


def test_api_matches_fixture_formulas():
    api = TmdbApi(FixtureTransport())
    assert api.title_ru(3) is None           # mid % 3 == 0 → no localization
    assert api.title_ru(4) == "ru_4"
    d = api.details(5)
    assert [c["iso_3166_1"] for c in d["production_countries"]] == [
        c["iso_3166_1"] for c in fixture.details(5)["production_countries"]
    ]
    bd = api.backdrops(8)
    assert len(bd) == fixture.n_frames(8)
    assert bd[0]["file_path"] == fixture.frame(8, 0)["path"]
    # year + category feeds route by endpoint shape
    y = api.discover_year(1999, 1, "tv")
    assert y["results"][0]["id"] == 1999 * 10_000 + 1
    c = api.category("popular", 1, "movie")
    assert c["results"][0]["id"] == 90_000_000 + 2 * 100_000 + 1
