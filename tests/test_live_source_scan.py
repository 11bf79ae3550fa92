"""The full Data-Source scan over REAL sockets (r8 verdict #5).

tests/test_http_client.py proves the transports at the request level; this
module closes the remaining seam: a registered query
(``s1_discover_source``) driving ``TmdbDiscoverReader`` partition scans
from *executor tasks* over a live local ``http.server`` — planner probe,
partitioned page reads, retry-on-503 with the production backoff, Arrow
batch return, and the dead-letter taxonomy, all on a real transport.

The server is an HTTP facade over ``FixtureTransport``: every response is
computed by the same deterministic formulas the default in-process path
uses (simulated transients surface as retryable 503s), so the live-socket
run must be value-identical to the fixture-path run — a true A/B of the
transport seam with everything above it held fixed.

Env propagation: ``sc.environment`` is captured into the Python function's
envVars at registration/wrap time (pyspark ``_wrap_function`` →
``_prepare_for_python_RDD``), and PySpark keys worker daemons by the
envVars map — so setting ``TMDB_API_BASE`` there and re-registering spawns
fresh worker processes whose ``get_api()`` sees the live base. ``discover``
re-registers the source per call, so entering/leaving the live window is
just an environment edit.
"""

from __future__ import annotations

import pandas as pd
import pytest

from tmdb_sync_spark.sources.http_client import (
    FixtureTransport,
    HttpStatusError,
    TransientHttpError,
    error_record,
    get_api,
)
from tmdb_sync_spark.sources.queries import (
    discover,
    s1_discover_source,
)
from tmdb_sync_spark.sources.enrich import enrich_details


@pytest.fixture(scope="module")
def tmdb_facade():
    """A live ``http.server`` that answers TMDB endpoint shapes from a
    server-side ``FixtureTransport``: 200+JSON for data, 503 for the
    fixture's simulated transients (page % 7 == 0 needs 1 + page % 3
    attempts — attempt state lives server-side, so each client RETRY is a
    new socket round-trip), real status for hard failures (404)."""
    import http.server
    import json
    import threading
    import urllib.parse

    transport = FixtureTransport()
    hits: dict = {}          # (path, page) -> [n_hits, n_503]
    agents: set = set()      # User-Agent strings seen, to pin the stack

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            split = urllib.parse.urlsplit(self.path)
            params = {
                k: v[0] for k, v in
                urllib.parse.parse_qs(split.query).items()
            }
            key = (split.path, params.get("page"))
            cell = hits.setdefault(key, [0, 0])
            cell[0] += 1
            agents.add(self.headers.get("User-Agent", ""))
            try:
                body = json.dumps(transport.request(split.path, params))
            except TransientHttpError:
                cell[1] += 1
                self.send_response(503)
                self.end_headers()
                return
            except HttpStatusError as e:
                self.send_response(e.status_code)
                self.end_headers()
                self.wfile.write(str(e).encode())
                return
            payload = body.encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}", hits, agents
    finally:
        srv.shutdown()
        srv.server_close()


@pytest.fixture()
def live_env(spark, tmdb_facade):
    """Enter the live-HTTP window: point the WORKER environment at the
    facade (the driver's own env too, for any driver-side probe). Yields
    a setter for TMDB_TRANSPORT so tests pick the socket stack."""
    import os

    base, hits, agents = tmdb_facade
    env = spark.sparkContext.environment

    def enter(transport_name: str) -> None:
        env["TMDB_API_BASE"] = base
        env["TMDB_TRANSPORT"] = transport_name
        os.environ["TMDB_API_BASE"] = base
        os.environ["TMDB_TRANSPORT"] = transport_name

    try:
        yield enter, hits, agents
    finally:
        for k in ("TMDB_API_BASE", "TMDB_TRANSPORT"):
            env.pop(k, None)
            os.environ.pop(k, None)
        import tmdb_sync_spark.sources.http_client as hc
        hc._API = None   # the driver singleton must not leak a live client


@pytest.mark.slow
def test_s1_scan_over_real_sockets_urllib(spark, sf_dir, live_env):
    """The registered S1 query end-to-end on the zero-dependency stdlib
    transport: value-identical to the fixture path, with the retry loop
    observed as real 503 round-trips server-side."""
    enter, hits, agents = live_env
    expected = [tuple(r) for r in s1_discover_source(spark, sf_dir).collect()]

    enter("urllib")
    actual = [tuple(r) for r in s1_discover_source(spark, sf_dir).collect()]
    assert actual == expected and len(actual) > 0

    pages_hit = {int(p) for (path, p), _ in hits.items()
                 if path == "/discover/movie" and p is not None}
    assert pages_hit == set(range(1, 51))   # 50-page scan, every page real
    # planner total_pages probe + the page-1 task read
    assert hits[("/discover/movie", "1")][0] >= 2
    # retry-on-503: the fixture's transient pages recovered over sockets.
    # Server-side attempt state is per-(endpoint, params) — the probe and
    # scan share page 1 but flaky pages are read once, so attempt math is
    # exact: page p (p % 7 == 0) needs 1 + p % 3 attempts.
    for page in (14, 35):   # worst cases: two 503s then 200
        n, n503 = hits[("/discover/movie", str(page))]
        assert (n, n503) == (3, 2)
    for page in (21, 42):   # 1 + p % 3 == 1: no transient at all
        n, n503 = hits[("/discover/movie", str(page))]
        assert (n, n503) == (1, 0)
    assert any(a.startswith("Python-urllib") for a in agents)


def test_s1_scan_over_real_sockets_requests(spark, sf_dir, live_env):
    """The same scan on the pooled ``requests.Session`` transport (the
    container's best-available production path), shorter feed window."""
    enter, hits, agents = live_env
    fixture_run = discover(spark, mode="top", start_page=1, max_pages=16)
    expected = sorted(map(tuple, fixture_run.collect()))

    enter("requests")
    live_run = discover(spark, mode="top", start_page=1, max_pages=16)
    actual = sorted(map(tuple, live_run.collect()))
    assert actual == expected and len(actual) == 16 * 20
    assert any(a.startswith("python-requests") for a in agents)


def test_enrichment_over_real_sockets(spark, live_env):
    """S5/S6 ``mapInPandas`` enrichment fetching per-item details and
    ru-titles from executor tasks over live sockets — batched lookups on
    a pooled per-process client, value-identical to the fixture path."""
    enter, hits, _ = live_env
    feed = discover(spark, mode="top", start_page=1, max_pages=1)
    expected = sorted(
        map(tuple, enrich_details(feed).select(
            "id", "title_ru", "country_codes").collect())
    )

    enter("requests")
    feed = discover(spark, mode="top", start_page=1, max_pages=1)
    actual = sorted(
        map(tuple, enrich_details(feed).select(
            "id", "title_ru", "country_codes").collect())
    )
    assert actual == expected and len(actual) == 20
    # per-item endpoints were really fetched (details + ru-title per id)
    detail_paths = [p for (p, page), _ in hits.items()
                    if page is None and p.startswith("/movie/")]
    assert len(detail_paths) >= 20


def test_executor_dead_letter_over_real_sockets(spark, live_env):
    """ST4 taxonomy on a real transport from executor tasks: a hard 404
    (no such endpoint) becomes an ``error_record`` dead-letter row —
    category ``http``, status pinned — instead of a task failure."""
    enter, _, _ = live_env
    enter("urllib")

    def batch(it):
        api = get_api()
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                try:
                    # negative id → /movie/-N, an endpoint the API does
                    # not serve: a NON-retryable HttpStatusError
                    api.details(int(i))
                except HttpStatusError as e:
                    rows.append(error_record(
                        f"/movie/{int(i)}", e, item_id=int(i)))
            yield pd.DataFrame(
                rows, columns=["endpoint", "category", "status_code",
                               "error", "item_id"])

    out = (
        spark.range(-3, 0).toDF("id")
        .mapInPandas(batch, "endpoint string, category string, "
                            "status_code int, error string, item_id long")
        .collect()
    )
    assert len(out) == 3
    assert {r.category for r in out} == {"http"}
    assert {r.status_code for r in out} == {404}
