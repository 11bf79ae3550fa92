"""``tmdb_discover`` — a PySpark Python Data Source for the paginated feed.

Rebuilds SURVEY §2.1 S1-S4 Spark-first: the reference fetches discover
pages in a sequential driver-side loop (``app/sync_top.py:124-286``,
``app/sync_years.py:151-281``); here the page space is *partitioned* and
each executor scans its page range independently — the scan parallelism the
reference never had. Options mirror the reference's request parameters:

- ``mode``: ``top`` (vote_count.desc feed, app/sync_top.py:32-121) or
  ``years`` (per-year window, app/sync_years.py:34-148)
- ``year``, ``content_type``: the ``years``-mode shard key
- ``start_page`` / ``max_pages``: resume offset + bound (ST2/ST3;
  app/sync_top.py:133-134, app/sync_years.py:15,184)

Per-page transient failures are retried with the reference's bounded-attempt
loop (5 attempts, app/sync_top.py:46) — simulated deterministically by the
fixture (page % 7 picks how many attempts succeed) so the retry path is
exercised without a network or sleeps.

At 100 TB posture: one partition per small page range keeps every task
bounded-memory; no driver-side materialization ever happens (rows stream
from ``read()`` generators).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from tmdb_sync_spark.sources import fixture

SCHEMA = (
    "id BIGINT, content_type STRING, title STRING, name STRING, "
    "release_date STRING, popularity DOUBLE, vote_average DOUBLE, "
    "vote_count BIGINT, genre_ids ARRAY<BIGINT>, page INT"
)
_COLS = ("id", "content_type", "title", "name", "release_date",
         "popularity", "vote_average", "vote_count", "genre_ids", "page")
PAGES_PER_PARTITION = 4
MAX_ATTEMPTS = 5   # app/sync_top.py:46


class _PageRange(InputPartition):
    def __init__(self, first: int, last: int):
        self.first, self.last = first, last


class _TransientHttpError(RuntimeError):
    pass


def _fetch_page_with_retry(page: int, items_fn) -> list[dict]:
    """The reference's bounded retry loop (app/sync_top.py:44-121), with the
    fixture standing in for httpx: pages where page % 7 == 0 need
    1 + page % 3 attempts before 'responding'."""
    needed = 1 + page % 3 if page % 7 == 0 else 1
    for attempt in range(1, MAX_ATTEMPTS + 1):
        if attempt >= needed:
            return items_fn(page)
        # linear backoff would sleep(attempt) here (app/sync_top.py:117);
        # the fixture fails deterministically so no wait is needed.
    raise _TransientHttpError(f"page {page} failed after {MAX_ATTEMPTS}")


class TmdbDiscoverReader(DataSourceReader):
    def __init__(self, options: dict):
        self.mode = options.get("mode", "top")
        self.year = int(options.get("year", 0))
        self.content_type = options.get("content_type", "movie")
        self.start_page = int(options.get("start_page", 1))
        self.max_pages = int(options.get("max_pages", 10**9))
        self.category = options.get("category", "top_rated")

    def _total_items(self) -> int:
        if self.mode == "top":
            return fixture.TOTAL_TOP
        if self.mode == "category":
            return fixture.CAT_ITEMS
        return fixture.YEAR_ITEMS[self.content_type]

    def partitions(self):
        total_pages = -(-self._total_items() // fixture.PAGE_SIZE)
        last = min(total_pages, self.start_page + self.max_pages - 1)
        return [
            _PageRange(p, min(p + PAGES_PER_PARTITION - 1, last))
            for p in range(self.start_page, last + 1, PAGES_PER_PARTITION)
        ]

    def read(self, part: _PageRange):
        total = self._total_items()

        def items(page: int) -> list[dict]:
            lo = (page - 1) * fixture.PAGE_SIZE
            hi = min(lo + fixture.PAGE_SIZE, total)
            if self.mode == "top":
                return [fixture.top_movie(r) for r in range(lo, hi)]
            if self.mode == "category":
                return [
                    fixture.category_item(self.category, r, self.content_type)
                    for r in range(lo, hi)
                ]
            return [
                fixture.year_item(self.year, r, self.content_type)
                for r in range(lo, hi)
            ]

        # One Arrow RecordBatch per page range: columnar transfer into the
        # JVM instead of per-row pickling (~10× on wide scans).
        import pyarrow as pa

        rows: list[dict] = []
        for page in range(part.first, part.last + 1):
            rows.extend(_fetch_page_with_retry(page, items))
        if rows:
            yield pa.RecordBatch.from_pylist(
                [{c: r[c] for c in _COLS} for r in rows],
                schema=pa.schema([
                    ("id", pa.int64()),
                    ("content_type", pa.string()),
                    ("title", pa.string()),
                    ("name", pa.string()),
                    ("release_date", pa.string()),
                    ("popularity", pa.float64()),
                    ("vote_average", pa.float64()),
                    ("vote_count", pa.int64()),
                    ("genre_ids", pa.list_(pa.int64())),
                    ("page", pa.int32()),
                ]),
            )


class TmdbDiscoverStreamReader(SimpleDataSourceStreamReader):
    """The same feed as a STREAMING source: offset = last fully-read page.

    This is the Spark-native form of the reference's cursor protocol
    (``app/sync_top.py:22-29,267-273``): the page offset lives in the
    query's checkpoint, so resume-after-restart (ST2) and replay of an
    un-committed batch (``readBetweenOffsets``) come from the engine —
    no hand-rolled cursor table required. ``max_pages`` bounds the feed
    (ST3): once reached, reads report no new data and an
    ``availableNow``/``processAllAvailable`` run terminates.
    """

    def __init__(self, options: dict):
        self.batch = TmdbDiscoverReader(options)   # reuse page math
        self.start_page = self.batch.start_page
        self.pages_per_batch = int(options.get("pages_per_batch", 2))

    def initialOffset(self) -> dict:
        return {"page": self.start_page - 1}

    def _items(self, page: int) -> list[dict]:
        r = self.batch
        total = r._total_items()
        lo, hi = (page - 1) * fixture.PAGE_SIZE, min(page * fixture.PAGE_SIZE, total)
        if r.mode == "top":
            return [fixture.top_movie(i) for i in range(lo, hi)]
        if r.mode == "category":
            return [fixture.category_item(r.category, i, r.content_type)
                    for i in range(lo, hi)]
        return [fixture.year_item(r.year, i, r.content_type)
                for i in range(lo, hi)]

    def _read_pages(self, first: int, last: int):
        for page in range(first, last + 1):
            for row in _fetch_page_with_retry(page, self._items):
                yield tuple(row[c] for c in _COLS)

    def read(self, start: dict):
        first = start["page"] + 1
        last = min(
            first + self.pages_per_batch - 1,
            self.batch.start_page + self.batch.max_pages - 1,
            -(-self.batch._total_items() // fixture.PAGE_SIZE),
        )
        if last < first:   # caught up / bounded out (ST3)
            return iter([]), start
        return self._read_pages(first, last), {"page": last}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._read_pages(start["page"] + 1, end["page"])


class TmdbDiscoverDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tmdb_discover"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> TmdbDiscoverReader:
        return TmdbDiscoverReader(self.options)

    def simpleStreamReader(self, schema) -> TmdbDiscoverStreamReader:
        return TmdbDiscoverStreamReader(self.options)


def register_tmdb_source(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(TmdbDiscoverDataSource)
