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
    RequestsTransport,
    UrllibTransport,
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


# ---------------------------------------------------------------------------
# Real-socket transport against a live stdlib http.server: the production
# path of the seam (reference policy app/tmdb_client.py:14, app/sync_top.py:46)
# executed end-to-end — 200 parse, 404 taxonomy, retryable-5xx recovery
# through request_with_retry with the sleep(attempt) backoff hook, and
# connection-level failure as a transient.
# ---------------------------------------------------------------------------


@pytest.fixture()
def live_server():
    import http.server
    import json
    import threading

    hits: dict[str, int] = {}

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):   # keep pytest output clean
            pass

        def do_GET(self):
            path = self.path.split("?")[0]
            hits[path] = hits.get(path, 0) + 1
            if path == "/flaky" and hits[path] <= 2:
                self.send_response(503)      # retryable; recovers on hit 3
                self.end_headers()
                return
            if path == "/missing":
                self.send_response(404)
                self.end_headers()
                self.wfile.write(b"no such endpoint")
                return
            if path == "/moved":
                self.send_response(302)
                self.send_header("Location", "/ok")
                self.end_headers()
                return
            if path == "/drip404":
                # 404 whose BODY drips slowly: each chunk arrives well
                # inside the per-operation socket timeout, but the total
                # transfer outlasts any sub-second deadline
                import time as _time

                self.send_response(404)
                self.end_headers()
                try:
                    for _ in range(50):
                        self.wfile.write(b"x" * 10)
                        self.wfile.flush()
                        _time.sleep(0.05)
                except (BrokenPipeError, ConnectionResetError):
                    pass
                return
            body = json.dumps(
                {"path": path, "hit": hits[path], "query": self.path}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}", hits
    finally:
        srv.shutdown()
        srv.server_close()


@pytest.mark.parametrize("T", [UrllibTransport, RequestsTransport])
def test_real_transport_200_and_params(live_server, T):
    base, _ = live_server
    t = T(base, api_key="k123")
    out = t.request("/ok", {"page": 3, "include_adult": False})
    assert out["path"] == "/ok" and out["hit"] == 1
    # query string carries params AND the injected api key
    assert "page=3" in out["query"] and "api_key=k123" in out["query"]
    # booleans encode lowercase like httpx (TMDB's documented contract),
    # not urlencode's str() capitalization
    assert "include_adult=false" in out["query"]


@pytest.mark.parametrize("T", [UrllibTransport, RequestsTransport])
def test_real_transport_404_taxonomy(live_server, T):
    base, _ = live_server
    t = T(base)
    with pytest.raises(HttpStatusError) as ei:
        t.request("/missing", {})
    assert ei.value.status_code == 404
    rec = error_record("/missing", ei.value)
    assert rec["category"] == "http" and rec["status_code"] == 404


@pytest.mark.parametrize("T", [UrllibTransport, RequestsTransport])
def test_real_transport_5xx_retries_with_backoff(live_server, T):
    base, hits = live_server
    t = T(base)
    waits: list[int] = []
    out = request_with_retry(
        t, "/flaky", {}, max_attempts=5, backoff=waits.append
    )
    assert out["hit"] == 3 and hits["/flaky"] == 3   # two 503s then 200
    assert waits == [1, 2]   # linear backoff hook called per failed attempt
    # the default hook on the real transport is time.sleep(attempt)
    import time
    assert T.backoff is time.sleep


@pytest.mark.parametrize("T", [UrllibTransport, RequestsTransport])
def test_real_transport_does_not_follow_redirects(live_server, T):
    """httpx's default surfaces 3xx as a status error; the stdlib
    transport must behave identically or the env-selected fallback would
    change observable sync behavior on a redirecting base URL."""
    base, hits = live_server
    t = T(base)
    with pytest.raises(HttpStatusError) as ei:
        t.request("/moved", {})
    assert ei.value.status_code == 302
    assert "/ok" not in hits   # the redirect target was never fetched


@pytest.mark.parametrize("T", [UrllibTransport, RequestsTransport])
def test_real_transport_connection_failure_is_transient(T):
    import socket

    # grab a port with nothing listening on it
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    t = T(f"http://127.0.0.1:{port}")
    with pytest.raises(TransientHttpError):
        t.request("/ok", {})


def test_urllib_slow_drip_error_body_obeys_total_deadline(live_server):
    """ADVICE round-3: the 30 s TOTAL deadline must also bound non-200
    bodies — a slow-drip 404 used to hold the request indefinitely via
    e.read() outside the deadline-checked reader."""
    import time

    base, _ = live_server
    t = UrllibTransport(base, timeout=0.3)
    start = time.monotonic()
    with pytest.raises(TransientHttpError, match="total deadline"):
        t.request("/drip404", {})
    # tripped by the deadline, not by waiting out the full 2.5 s drip
    assert time.monotonic() - start < 1.5


# ---------------------------------------------------------------------------
# HttpxTransport through an injected fake httpx module: the container has
# no httpx, so a sys.modules stub (urllib-backed, response shape and
# bool-encoding faithful to httpx) drives the REAL HttpxTransport code —
# timeout construction, status taxonomy, retry recovery — over the same
# live server as the stdlib transport (reference app/tmdb_client.py:14,55).
# ---------------------------------------------------------------------------


@pytest.fixture()
def fake_httpx(monkeypatch):
    import json as _json
    import sys
    import types
    import urllib.error
    import urllib.parse
    import urllib.request

    created: dict = {}
    mod = types.ModuleType("httpx")

    class Timeout:
        def __init__(self, timeout, connect=None):
            self.timeout, self.connect = timeout, connect

    class _Response:
        def __init__(self, status_code, body):
            self.status_code, self._body = status_code, body

        @property
        def text(self):
            return self._body.decode("utf-8", "replace")

        def json(self):
            return _json.loads(self._body)

    class Client:
        def __init__(self, base_url="", timeout=None):
            created["base_url"], created["timeout"] = base_url, timeout
            self._base = base_url.rstrip("/")

        def get(self, endpoint, params=None):
            url = self._base + endpoint
            if params:
                q = {k: (str(v).lower() if isinstance(v, bool) else v)
                     for k, v in params.items()}   # httpx's bool encoding
                url += "?" + urllib.parse.urlencode(q)
            try:
                with urllib.request.urlopen(url, timeout=10) as resp:
                    return _Response(resp.status, resp.read())
            except urllib.error.HTTPError as e:
                return _Response(e.code, e.read())
            # connection errors propagate raw, like httpx.ConnectError

    mod.Client, mod.Timeout = Client, Timeout
    monkeypatch.setitem(sys.modules, "httpx", mod)
    return created


def test_httpx_transport_policy_over_fake_module(live_server, fake_httpx):
    from tmdb_sync_spark.sources.http_client import HttpxTransport

    base, hits = live_server
    t = HttpxTransport(base, api_key="k9")
    # the reference's timeout policy is constructed (app/tmdb_client.py:14)
    to = fake_httpx["timeout"]
    assert (to.timeout, to.connect) == (30.0, 10.0)
    assert fake_httpx["base_url"] == base

    out = t.request("/ok", {"page": 2, "include_adult": False})
    assert out["path"] == "/ok"
    assert "api_key=k9" in out["query"]
    assert "include_adult=false" in out["query"]

    with pytest.raises(HttpStatusError) as ei:   # 404 → http taxonomy
        t.request("/missing", {})
    assert ei.value.status_code == 404
    assert "no such endpoint" in str(ei.value)

    waits: list[int] = []                        # 5xx → transient → retried
    out = request_with_retry(
        t, "/flaky", {}, max_attempts=5, backoff=waits.append
    )
    assert out["hit"] == 3 and hits["/flaky"] == 3
    assert waits == [1, 2]
    import time
    from tmdb_sync_spark.sources.http_client import HttpxTransport as HT
    assert HT.backoff is time.sleep              # app/sync_top.py:117


def test_httpx_transport_connection_failure_is_transient(fake_httpx):
    import socket

    from tmdb_sync_spark.sources.http_client import HttpxTransport

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    t = HttpxTransport(f"http://127.0.0.1:{port}")
    with pytest.raises(TransientHttpError):
        t.request("/ok", {})


def test_get_api_prefers_httpx_when_importable(live_server, fake_httpx,
                                               monkeypatch):
    """get_api's transport selection: httpx when the import succeeds,
    stdlib otherwise (the fallback case is covered above)."""
    import tmdb_sync_spark.sources.http_client as hc

    base, hits = live_server
    monkeypatch.setenv("TMDB_API_BASE", base)
    monkeypatch.setattr(hc, "_API", None)
    api = hc.get_api()
    assert isinstance(api.transport, hc.HttpxTransport)
    assert api.details(9)["path"] == "/movie/9" and hits["/movie/9"] == 1
    monkeypatch.setattr(hc, "_API", None)   # don't leak into other tests


def test_api_over_live_socket_end_to_end(live_server):
    """TmdbApi drives the real transport through request_with_retry — the
    exact call path a TMDB_API_BASE deployment runs (get_api selects the
    stdlib transport when httpx is absent)."""
    base, hits = live_server
    api = TmdbApi(UrllibTransport(base))
    out = api.details(42)
    assert out["path"] == "/movie/42"
    assert hits["/movie/42"] == 1


def test_get_api_env_selects_real_transport(live_server, monkeypatch):
    """TMDB_API_BASE opts the process into a real-socket transport via
    get_api without touching any other code — httpx (absent here) falls
    back to the pooled requests.Session (present), and when THAT is
    unavailable too, to the zero-dependency stdlib transport."""
    import tmdb_sync_spark.sources.http_client as hc

    base, hits = live_server
    monkeypatch.setenv("TMDB_API_BASE", base)
    monkeypatch.setattr(hc, "_API", None)   # reset the process singleton
    api = hc.get_api()
    assert isinstance(api.transport, RequestsTransport)
    assert api.details(7)["path"] == "/movie/7" and hits["/movie/7"] == 1

    def no_requests(*a, **k):
        raise ImportError("requests unavailable")

    monkeypatch.setattr(hc, "RequestsTransport", no_requests)
    monkeypatch.setattr(hc, "_API", None)
    api = hc.get_api()
    assert isinstance(api.transport, UrllibTransport)
    assert api.details(8)["path"] == "/movie/8" and hits["/movie/8"] == 1
    monkeypatch.setattr(hc, "_API", None)   # don't leak into other tests


def test_country_codes_tolerates_missing_production_countries():
    """Parity with the reference's `.get("production_countries", [])`
    (app/sync.py:106, app/sync_top.py:200): a details payload without the
    key means "no countries", never a KeyError — a single such item must
    not kill the whole enrichment partition. The inner iso_3166_1 index
    stays hard, exactly like the reference's comprehension."""
    import pytest

    from tmdb_sync_spark.sources.enrich import _country_codes

    assert _country_codes({}) == []
    assert _country_codes({"production_countries": []}) == []
    assert _country_codes(
        {"production_countries": [{"iso_3166_1": "US"}, {"iso_3166_1": "FR"}]}
    ) == ["US", "FR"]
    with pytest.raises(KeyError):   # malformed ENTRY is still loud
        _country_codes({"production_countries": [{"name": "x"}]})
