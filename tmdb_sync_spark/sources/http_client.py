"""Injectable TMDB API client — fixture and real HTTP share one code path.

The reference talks to TMDB through httpx with a bounded-attempt retry and
linear backoff (5 attempts for discover/category ``app/sync_top.py:46``,
3 for details/images/ru-title ``app/tmdb_client.py:55,175,390``,
``sleep(attempt)`` backoff ``app/sync_top.py:117``, timeouts 30 s total /
10 s connect ``app/tmdb_client.py:14``) and dead-letters failures into
``sync_errors`` with an http/other taxonomy (``app/tmdb_client.py:76-85,
161-165``).

Here that policy lives ONCE, in :func:`request_with_retry` /
:func:`error_record`, over a swappable transport:

- :class:`FixtureTransport` — deterministic responses computed from
  ``fixture.py``'s formulas (the default; tests and the sandbox never
  touch a network). Transient failures are simulated per endpoint so the
  retry loop is genuinely exercised: discover pages where
  ``page % 7 == 0`` only respond on attempt ``1 + page % 3``.
- :class:`HttpxTransport` — a pooled real client (import-gated; httpx is
  absent from this container) with the reference's timeout policy.
- :class:`UrllibTransport` — the same real-socket policy on the stdlib,
  used when httpx is unavailable; tested in-sandbox against a live local
  ``http.server`` (200 / 404 / retryable-5xx / connection failure).

Executors construct the transport lazily per process via :func:`get_api`
(transports hold sockets/state and must not be pickled into tasks);
setting ``TMDB_API_BASE`` (+ optional ``TMDB_API_KEY``) opts a deployment
into the real transport without touching any tested code.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from tmdb_sync_spark.sources import fixture

DISCOVER_ATTEMPTS = 5   # app/sync_top.py:46
DETAIL_ATTEMPTS = 3     # app/tmdb_client.py:55,175,390


class TransientHttpError(RuntimeError):
    """Network-level failure or retryable status — retry then dead-letter."""


class HttpStatusError(RuntimeError):
    """Non-retryable HTTP failure; carries the status code."""

    def __init__(self, status_code: int, text: str = ""):
        super().__init__(f"HTTP {status_code}: {text[:200]}")
        self.status_code = status_code


def request_with_retry(
    transport,
    endpoint: str,
    params: dict | None = None,
    max_attempts: int = DISCOVER_ATTEMPTS,
    backoff: Callable[[int], None] | None = None,
) -> dict:
    """The reference's bounded retry loop with linear backoff, shared by
    every fetch site (``app/sync_top.py:44-121``). ``backoff`` defaults to
    the transport's policy (fixture: no-op; httpx: ``sleep(attempt)``)."""
    if backoff is None:
        backoff = getattr(transport, "backoff", lambda attempt: None)
    last: Exception | None = None
    for attempt in range(1, max_attempts + 1):
        try:
            return transport.request(endpoint, params or {})
        except TransientHttpError as e:
            last = e
            if attempt < max_attempts:
                backoff(attempt)   # linear: sleep(attempt) in production
    raise last  # type: ignore[misc]


# The ST4 dead-letter taxonomy names, single-sourced: error_record (the
# per-exception classifier at this client seam) and streaming/ingest.py's
# set-oriented dead-letter write (whose deterministic id-stripes STAND IN
# for these exception classes) must group under the same labels, or the
# sync_errors table the ST4 oracle reads drifts from the tested policy.
CATEGORY_HTTP = "http"
CATEGORY_OTHER = "other"


def error_record(endpoint: str, exc: Exception, **context) -> dict:
    """A ``sync_errors`` dead-letter row (``app/tmdb_client.py:76-85``:
    http failures carry status_code; generic failures carry the message —
    the taxonomy ST4 queries group on)."""
    rec = {
        "endpoint": endpoint,
        "category": (
            CATEGORY_HTTP if isinstance(exc, HttpStatusError)
            else CATEGORY_OTHER
        ),
        "status_code": getattr(exc, "status_code", None),
        "error": str(exc)[:200],
        **context,
    }
    return rec


class FixtureTransport:
    """Deterministic stand-in for the TMDB API, endpoint-compatible with
    the reference's request shapes. Stateful attempt counting simulates a
    flaky upstream so the shared retry loop is exercised for real."""

    backoff = staticmethod(lambda attempt: None)   # deterministic — no waits

    def __init__(self) -> None:
        self._attempts: dict = {}

    def request(self, endpoint: str, params: dict) -> dict:
        # Attempt state is tracked ONLY for the flaky paged endpoints —
        # per-item lookups (details/images/ru-title, one key per id) would
        # otherwise grow the dict unboundedly in a long-lived process.
        if "page" in params:
            page = int(params["page"])
            if page % 7 == 0 and endpoint.startswith(("/discover/", "/movie/", "/tv/")):
                key = (endpoint, tuple(sorted(params.items())))
                n = self._attempts[key] = self._attempts.get(key, 0) + 1
                if n < 1 + page % 3:
                    raise TransientHttpError(
                        f"fixture transient on {endpoint} p{page}"
                    )

        if endpoint == "/discover/movie" and "primary_release_date.gte" in params:
            year = int(params["primary_release_date.gte"][:4])
            return self._page(params, fixture.YEAR_ITEMS["movie"],
                              lambda r: fixture.year_item(year, r, "movie"))
        if endpoint == "/discover/tv":
            year = int(params["first_air_date.gte"][:4])
            return self._page(params, fixture.YEAR_ITEMS["tv"],
                              lambda r: fixture.year_item(year, r, "tv"))
        if endpoint == "/discover/movie":
            return self._page(params, fixture.TOTAL_TOP, fixture.top_movie)
        for ct in ("movie", "tv"):
            prefix = f"/{ct}/"
            if endpoint.startswith(prefix):
                rest = endpoint[len(prefix):]
                if rest in fixture.CATEGORY_CODES:   # /movie/{category}
                    return self._page(
                        params, fixture.CAT_ITEMS,
                        lambda r: fixture.category_item(rest, r, ct),
                    )
                if rest.endswith("/images"):         # /{type}/{id}/images
                    mid = int(rest.split("/")[0])
                    return {"backdrops": [
                        {"file_path": f["path"], "aspect_ratio": f["aspect_ratio"],
                         "vote_average": f["vote_average"], "width": f["width"]}
                        for f in (fixture.frame(mid, j)
                                  for j in range(fixture.n_frames(mid)))
                    ]}
                if rest.isdigit():                   # /{type}/{id} details
                    mid = int(rest)
                    if params.get("language") == "ru-RU":
                        t = fixture.title_ru(mid)
                        return {"title": t, "name": t}
                    return fixture.details(mid)
        raise HttpStatusError(404, endpoint)

    @staticmethod
    def _page(params: dict, total: int, item_fn) -> dict:
        page = int(params.get("page", 1))
        lo = (page - 1) * fixture.PAGE_SIZE
        hi = min(lo + fixture.PAGE_SIZE, total)
        return {
            "page": page,
            "results": [item_fn(r) for r in range(lo, hi)],
            "total_pages": -(-total // fixture.PAGE_SIZE),
        }


class HttpxTransport:
    """Pooled real client with the reference's policy (import-gated —
    httpx is not in this container; the class is exercised only by a
    deployment that opts in via TMDB_API_BASE)."""

    backoff = staticmethod(time.sleep)   # linear, app/sync_top.py:117

    def __init__(self, base_url: str, api_key: str | None = None) -> None:
        import httpx   # deferred: absent in the sandbox

        self._api_key = api_key
        self._client = httpx.Client(
            base_url=base_url,
            timeout=httpx.Timeout(30.0, connect=10.0),  # app/tmdb_client.py:14
        )

    def request(self, endpoint: str, params: dict) -> dict:
        if self._api_key:
            params = {**params, "api_key": self._api_key}
        try:
            resp = self._client.get(endpoint, params=params)
        except Exception as e:   # DNS/conn/timeouts → retryable
            raise TransientHttpError(str(e)) from e
        if resp.status_code in (429, 500, 502, 503, 504):
            raise TransientHttpError(f"HTTP {resp.status_code}")
        if resp.status_code != 200:
            raise HttpStatusError(resp.status_code, resp.text)
        return resp.json()


class RequestsTransport:
    """Pooled third-party client over ``requests.Session`` — the same
    policy as :class:`HttpxTransport` (connect/read timeouts, no
    redirects, identical status taxonomy, lowercase booleans). Unlike
    httpx, ``requests`` IS present in this container, so the
    pooled-library variant of the seam is genuinely integration-tested
    against a live local ``http.server`` (tests/test_http_client.py);
    httpx remains first choice when installed. Timeout semantics match
    httpx's per-operation model (connect bound + between-bytes read
    bound); the stricter TOTAL body deadline is the urllib transport's
    extra."""

    backoff = staticmethod(time.sleep)   # linear, app/sync_top.py:117

    def __init__(self, base_url: str, api_key: str | None = None,
                 timeout: tuple[float, float] = (10.0, 30.0)) -> None:
        import requests   # third-party; import-gated like httpx

        self._base = base_url.rstrip("/")
        self._api_key = api_key
        self._timeout = timeout          # (connect, read) app/tmdb_client.py:14
        self._session = requests.Session()

    def request(self, endpoint: str, params: dict) -> dict:
        if self._api_key:
            params = {**params, "api_key": self._api_key}
        params = {
            k: (str(v).lower() if isinstance(v, bool) else v)
            for k, v in params.items()
        }
        try:
            resp = self._session.get(
                self._base + endpoint, params=params,
                timeout=self._timeout, allow_redirects=False,
            )
        except Exception as e:   # DNS/conn/timeouts → retryable
            raise TransientHttpError(str(e)) from e
        if resp.status_code in (429, 500, 502, 503, 504):
            raise TransientHttpError(f"HTTP {resp.status_code}")
        if resp.status_code != 200:
            raise HttpStatusError(resp.status_code, resp.text)
        return resp.json()


class UrllibTransport:
    """Stdlib real-socket transport — the same status taxonomy and retry
    contract as :class:`HttpxTransport` with zero dependencies, so the
    production path of the seam is executable (and tested against a live
    local ``http.server``) even where httpx is absent.

    Contract parity with the httpx path, deliberately enforced:
    - the reference's 30 s timeout (``app/tmdb_client.py:14``): connect
      and header exchange are bounded per socket operation (httpx's own
      read-timeout semantics — neither stack bounds a header-dripping
      server in aggregate), and the BODY — success or error — is
      additionally read in chunks against a monotonic TOTAL deadline,
      which is stricter than httpx's per-op policy;
    - redirects are NOT followed (httpx default): a 3xx surfaces as
      :class:`HttpStatusError`, identical over both transports;
    - booleans encode lowercase like httpx / TMDB's contract.
    """

    backoff = staticmethod(time.sleep)   # linear, app/sync_top.py:117

    def __init__(self, base_url: str, api_key: str | None = None,
                 timeout: float = 30.0) -> None:
        import urllib.request

        class _NoRedirect(urllib.request.HTTPRedirectHandler):
            def redirect_request(self, *a, **k):   # 3xx → HTTPError
                return None

        self._base = base_url.rstrip("/")
        self._api_key = api_key
        self._timeout = timeout
        self._opener = urllib.request.build_opener(_NoRedirect())

    def request(self, endpoint: str, params: dict) -> dict:
        import json
        import urllib.error
        import urllib.parse

        if self._api_key:
            params = {**params, "api_key": self._api_key}
        params = {
            k: (str(v).lower() if isinstance(v, bool) else v)
            for k, v in params.items()
        }
        url = self._base + endpoint
        if params:
            url += "?" + urllib.parse.urlencode(params)
        deadline = time.monotonic() + self._timeout

        def read_all(resp) -> bytes:
            # read1 = at most ONE raw recv per call, so the deadline check
            # interleaves with a dripping sender; plain read(n) would block
            # until n bytes or EOF and never observe the clock
            read1 = getattr(resp, "read1", None) or resp.read
            chunks = []
            while True:
                if time.monotonic() > deadline:
                    raise TransientHttpError(
                        f"total deadline {self._timeout}s exceeded"
                    )
                chunk = read1(65536)
                if not chunk:
                    return b"".join(chunks)
                chunks.append(chunk)

        # per-operation socket timeout, clamped to the remaining budget at
        # request start. This bounds connect/header EACH-OP (httpx's own
        # semantics — a header-dripping server is bounded per recv, not in
        # aggregate); only the body read below gets the strict total
        # deadline
        op_timeout = max(0.001, min(self._timeout,
                                    deadline - time.monotonic()))
        try:
            with self._opener.open(url, timeout=op_timeout) as resp:
                status, body = resp.status, read_all(resp)
        except TransientHttpError:
            raise
        except urllib.error.HTTPError as e:   # non-2xx arrives as an exception
            status = e.code
            try:
                body = read_all(e)   # error bodies obey the same deadline —
            except TransientHttpError:   # a slow-drip 404 can't hold us
                raise
            except Exception as e2:      # socket drop mid-error-body
                raise TransientHttpError(str(e2)) from e2
        except Exception as e:   # DNS/conn/timeout → retryable
            raise TransientHttpError(str(e)) from e
        if status in (429, 500, 502, 503, 504):
            raise TransientHttpError(f"HTTP {status}")
        if status != 200:
            raise HttpStatusError(status, body.decode("utf-8", "replace"))
        return json.loads(body)


class TmdbApi:
    """The fetch surface of the reference's client, one method per
    endpoint family, all funnelled through :func:`request_with_retry`."""

    def __init__(self, transport) -> None:
        self.transport = transport

    # -- discover feeds (S1-S4) --------------------------------------------
    def discover_top(self, page: int) -> dict:
        return request_with_retry(
            self.transport, "/discover/movie",
            {"sort_by": "vote_count.desc", "include_adult": False, "page": page},
            DISCOVER_ATTEMPTS,
        )

    def discover_year(self, year: int, page: int, content_type: str) -> dict:
        date_key = ("primary_release_date" if content_type == "movie"
                    else "first_air_date")   # app/sync_years.py:54-63
        return request_with_retry(
            self.transport, f"/discover/{content_type}",
            {f"{date_key}.gte": f"{year}-01-01", f"{date_key}.lte": f"{year}-12-31",
             "sort_by": "popularity.desc", "page": page},
            DISCOVER_ATTEMPTS,
        )

    def category(self, category: str, page: int, content_type: str) -> dict:
        return request_with_retry(
            self.transport, f"/{content_type}/{category}", {"page": page},
            DISCOVER_ATTEMPTS,
        )

    # -- per-item enrichment (S5-S7) ---------------------------------------
    def details(self, item_id: int, content_type: str = "movie") -> dict:
        return request_with_retry(
            self.transport, f"/{content_type}/{item_id}", {}, DETAIL_ATTEMPTS,
        )

    def title_ru(self, item_id: int, content_type: str = "movie") -> str | None:
        d = request_with_retry(
            self.transport, f"/{content_type}/{item_id}",
            {"language": "ru-RU"}, DETAIL_ATTEMPTS,
        )
        return d.get("title") or d.get("name")   # app/sync.py:36 coalesce

    def backdrops(self, item_id: int, content_type: str = "movie") -> list[dict]:
        d = request_with_retry(
            self.transport, f"/{content_type}/{item_id}/images", {},
            DETAIL_ATTEMPTS,
        )
        return d.get("backdrops", [])


_API: TmdbApi | None = None


_TRANSPORTS = {"httpx": "HttpxTransport", "requests": "RequestsTransport",
               "urllib": "UrllibTransport"}


def _real_transport(base: str, key: str | None):
    """Transport selection for a TMDB_API_BASE deployment: explicit via
    TMDB_TRANSPORT (httpx|requests|urllib — an unknown name fails LOUDLY;
    a typo silently falling back to a different socket stack would change
    timeout semantics in production), else best-available (httpx →
    requests → stdlib)."""
    forced = os.environ.get("TMDB_TRANSPORT")
    if forced:
        cls_name = _TRANSPORTS.get(forced.strip().lower())
        if cls_name is None:
            raise ValueError(
                f"TMDB_TRANSPORT={forced!r}: expected one of "
                f"{sorted(_TRANSPORTS)}"
            )
        return globals()[cls_name](base, key)
    try:
        return HttpxTransport(base, key)
    except ImportError:
        try:   # no httpx → pooled requests.Session, same policy
            return RequestsTransport(base, key)
        except ImportError:   # stdlib last — zero dependencies
            return UrllibTransport(base, key)


def get_api() -> TmdbApi:
    """Per-process API singleton (executors call this inside tasks —
    transports hold sockets/attempt state and are never pickled)."""
    global _API
    if _API is None:
        base = os.environ.get("TMDB_API_BASE")
        if base:
            transport = _real_transport(base, os.environ.get("TMDB_API_KEY"))
        else:
            transport = FixtureTransport()
        _API = TmdbApi(transport)
    return _API
