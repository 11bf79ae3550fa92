"""The tmdb_discover STREAMING source: engine-checkpointed page offsets
(ST1/ST2 via Structured Streaming instead of the hand-rolled cursor
table), bounded backfill (ST3), exactly-once page delivery across
restarts."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from tmdb_sync_spark.sources import fixture
from tmdb_sync_spark.sources.tmdb_source import register_tmdb_source


def _run(spark, out: str, ckpt: str) -> None:
    register_tmdb_source(spark)
    stream = (
        spark.readStream.format("tmdb_discover")
        .option("mode", "top")
        .option("start_page", 1)
        .option("max_pages", 6)
        .option("pages_per_batch", 2)
        .load()
    )

    def sink(batch_df, _epoch):
        batch_df.write.mode("append").parquet(out)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()


def test_stream_source_bounded_and_resume_exactly_once(spark):
    out = tempfile.mkdtemp(prefix="tmdb_stream_out_")
    ckpt = tempfile.mkdtemp(prefix="tmdb_stream_ckpt_")

    _run(spark, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 6 * fixture.PAGE_SIZE          # ST3: max_pages bound
    pages = sorted(r["page"] for r in got.select("page").distinct().collect())
    assert pages == [1, 2, 3, 4, 5, 6]
    # content matches the batch source formula
    first = got.where(F.col("id") == 1).first()
    assert first["title"] == "Movie 1" and first["vote_count"] == 3_000_000

    # restart on the SAME checkpoint: offsets say all 6 pages are done —
    # no page may be re-delivered (ST2 resume, exactly-once delivery)
    _run(spark, out, ckpt)
    spark.catalog.refreshByPath(out)
    assert spark.read.parquet(out).count() == 6 * fixture.PAGE_SIZE


def test_discover_past_end_of_feed_yields_empty_not_crash(spark):
    """start_page beyond the feed must produce an empty scan (the ST3
    stop condition), not a crashed task: PySpark substitutes [None] for
    an empty partitions() list, so the reader must emit an empty page
    range instead."""
    from tmdb_sync_spark.sources.queries import discover

    assert discover(spark, mode="top", start_page=200, max_pages=5).count() == 0


def test_real_api_shaped_rows_normalize(monkeypatch):
    """Genuine TMDB discover items lack content_type/page and carry only
    one of title/name; the reader must stamp request context and
    NULL-fill absent fields instead of KeyError-ing on every row."""
    from tmdb_sync_spark.sources import tmdb_source as t

    class FakeApi:
        def discover_top(self, page):
            return {"results": [
                {"id": 7, "title": "Real Movie", "release_date": "2020-01-02",
                 "popularity": 1.5, "vote_average": 7.2, "vote_count": 10,
                 "genre_ids": [16, 35]},
            ]}

    rows = t._page_results(FakeApi(), "top", 3, year=0,
                           content_type="movie", category="")
    assert rows == [{
        "id": 7, "content_type": "movie", "title": "Real Movie",
        "name": None, "release_date": "2020-01-02", "popularity": 1.5,
        "vote_average": 7.2, "vote_count": 10, "genre_ids": [16, 35],
        "page": 3,
    }]


def test_partition_planning_uses_feed_total_pages(monkeypatch):
    """Partition planning must size the scan from the FEED's own
    pagination metadata, not the fixture constants (review finding):
    with TMDB_API_BASE set, the transports return the live feed's
    total_pages, and a fixture-sized plan silently truncated or
    over-scanned the real feed. The fixture math survives only as the
    fallback for a transport that omits the field."""
    from tmdb_sync_spark.sources import tmdb_source as t

    class FakeApi:
        def discover_top(self, page):
            # a "live" feed 3 pages long — nothing like fixture.TOTAL_TOP
            return {"results": [], "total_pages": 3, "page": page}

    monkeypatch.setattr(t, "get_api", lambda: FakeApi())
    r = t.TmdbDiscoverReader({"mode": "top"})
    parts = r.partitions()
    # 3 pages at PAGES_PER_PARTITION=4 → one partition covering 1..3
    assert [(p.first, p.last) for p in parts] == [(1, 3)]

    class NoMetaApi:
        def discover_top(self, page):
            return {"results": []}   # transport omits total_pages

    r2 = t.TmdbDiscoverReader({"mode": "top"})
    monkeypatch.setattr(t, "get_api", lambda: NoMetaApi())
    total = -(-fixture.TOTAL_TOP // fixture.PAGE_SIZE)
    assert r2._total_pages() == total   # fixture fallback
