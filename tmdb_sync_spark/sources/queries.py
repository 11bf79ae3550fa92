"""Source-layer queries (SURVEY.md §2.1 S1–S7) with DuckDB oracles.

Each query runs the real Spark plumbing — the ``tmdb_discover`` Python Data
Source, ``mapInPandas`` enrichment — while the oracle reproduces the fixture
formulas in pure SQL (``fixture.sql_*``), so the *entire source path* is
value-checked, not just transforms over parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tmdb_sync_spark.registry import register, register_retired
from tmdb_sync_spark.sources import fixture
from tmdb_sync_spark.sources.enrich import (
    best_path_expr,
    enrich_details,
    fetch_frames,
    valid_deduped_frames,
)
from tmdb_sync_spark.sources.tmdb_source import register_tmdb_source


def discover(spark: SparkSession, *, mode: str = "top", start_page: int = 1,
             max_pages: int = 10**9, year: int = 0,
             content_type: str = "movie") -> DataFrame:
    register_tmdb_source(spark)
    return (
        spark.read.format("tmdb_discover")
        .option("mode", mode)
        .option("start_page", start_page)
        .option("max_pages", max_pages)
        .option("year", year)
        .option("content_type", content_type)
        .load()
    )


def discover_category(spark: SparkSession, *, category: str,
                      content_type: str, start_page: int = 1,
                      max_pages: int = 10**9) -> DataFrame:
    register_tmdb_source(spark)
    return (
        spark.read.format("tmdb_discover")
        .option("mode", "category")
        .option("category", category)
        .option("content_type", content_type)
        .option("start_page", start_page)
        .option("max_pages", max_pages)
        .load()
    )


@register(
    "s1_discover_source",
    oracle=f"""
    WITH feed AS ({fixture.sql_top_feed(50 * fixture.PAGE_SIZE)})
    SELECT substr(release_date, 1, 4) AS ry,
           COUNT(*) AS n,
           CAST(SUM(vote_count) AS BIGINT) AS sum_votes,
           MAX(popularity) AS max_pop,
           CAST(SUM(CASE WHEN list_contains(genre_ids, 16)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_animated
    FROM feed
    GROUP BY ry
    ORDER BY ry
    """,
)
def s1_discover_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: the paginated discover feed as a partitioned Spark scan.

    Reads 50 pages (1,000 items) of the vote_count.desc feed through the
    ``tmdb_discover`` Python Data Source — page ranges are input partitions,
    so the scan parallelizes where the reference loops sequentially
    (``app/sync_top.py:147-273``) — then aggregates per release-year with
    the ``is_animated`` membership derivation (``app/sync.py:104``).

    Plan: pythonScan → partial hashagg → Exchange(ry) → final hashagg → sort.
    """
    feed = discover(spark, mode="top", start_page=1, max_pages=50)
    return (
        feed.groupBy(F.substring("release_date", 1, 4).alias("ry"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("vote_count").alias("sum_votes"),
            F.max("popularity").alias("max_pop"),
            F.sum(
                F.when(F.array_contains("genre_ids", F.lit(16)), 1).otherwise(0)
            ).alias("n_animated"),
        )
        .orderBy("ry")
    )


@register(
    "s5_s6_details_enrichment",
    oracle=f"""
    WITH feed AS ({fixture.sql_top_feed(10 * fixture.PAGE_SIZE)}),
    cc AS (
        SELECT f.id, g.range AS k,
               {fixture.sql_country_code('f.id', 'g.range')} AS code
        FROM feed f, range(0, 3) g
        WHERE g.range < 1 + f.id % 3
    ),
    cc_agg AS (
        SELECT id,
               COALESCE(string_agg(code, ',' ORDER BY k)
                        FILTER (WHERE code <> ''), '') AS cc_canon,
               COUNT(*) FILTER (WHERE code <> '') AS n_cc
        FROM cc GROUP BY id
    )
    SELECT f.id,
           COALESCE({fixture.sql_title_ru('f.id')}, f.title, f.name)
               AS display_title,
           COALESCE(a.cc_canon, '') AS cc_canon,
           CAST(COALESCE(a.n_cc, 0) AS BIGINT) AS n_cc
    FROM feed f LEFT JOIN cc_agg a USING (id)
    ORDER BY f.id
    """,
)
def s5_s6_details_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5+S6+AR2: batched details / ru-title enrichment as mapInPandas.

    The reference does 2 sequential HTTP calls per item
    (``app/sync_top.py:190-204``); here one Arrow-batched pass appends
    ``title_ru`` and ``production_countries``-derived codes per partition.
    Downstream, the null-safe code filter (``app/catalog/upsert.py:65-66``)
    and display-title coalesce (``app/sync.py:36``) are Catalyst
    expressions, not Python.
    """
    feed = discover(spark, mode="top", start_page=1, max_pages=10)
    enriched = enrich_details(feed)
    codes = F.filter(F.col("country_codes"), lambda c: c != F.lit(""))
    return enriched.select(
        "id",
        F.coalesce("title_ru", "title", "name").alias("display_title"),
        F.array_join(codes, ",").alias("cc_canon"),
        F.size(codes).cast("long").alias("n_cc"),
    ).orderBy("id")


@register(
    "s7_backdrop_pipeline",
    oracle=f"""
    WITH feed AS ({fixture.sql_top_feed(10 * fixture.PAGE_SIZE)}),
    frames AS ({fixture.SQL_FRAMES_FROM_FEED}),
    valid AS (
        SELECT * FROM frames
        WHERE aspect_ratio BETWEEN 1.5 AND 2.2 AND vote_average >= 0
    ),
    dedup AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY id, path ORDER BY j) AS rn
            FROM valid) WHERE rn = 1
    ),
    best AS (
        SELECT id, path FROM (
            SELECT id, path, row_number() OVER (
                PARTITION BY id
                ORDER BY vote_average DESC, width DESC, path) AS rn
            FROM dedup) WHERE rn = 1
    ),
    cnt AS (SELECT id, COUNT(*) AS n FROM dedup GROUP BY id)
    SELECT f.id, b.path AS backdrop_path,
           CASE WHEN b.path IS NOT NULL
                THEN 'https://image.tmdb.org/t/p/' || b.path END AS image_url,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_valid
    FROM feed f
    LEFT JOIN best b USING (id)
    LEFT JOIN cnt c USING (id)
    ORDER BY f.id
    """,
)
def s7_backdrop_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7+P13+W3+W1: the full backdrop selection pipeline.

    Fetch backdrops per item (mapInPandas), then entirely in Catalyst:
    validity filter 1.5 ≤ ar ≤ 2.2 ∧ va ≥ 0 (``app/tmdb_client.py:194-196``),
    keep-first dedup by path in API order (``:199-212``), argmax by
    (vote_average desc, width desc) (``:214-220``) — with an explicit
    ``path`` tiebreak so Spark and the oracle agree where Python's stable
    sort relied on input order (SURVEY §5 determinism rules).

    Items with zero valid frames surface with NULL backdrop_path — the
    reference's ``pick_backdrop`` None branch (``app/utils/frames.py:4-19``).
    ``image_url`` is S11: the image-CDN base constant prepended to the
    relative stored path (``app/tmdb_client.py:13``).
    """
    feed = discover(spark, mode="top", start_page=1, max_pages=10)
    frames = fetch_frames(feed)
    # The validity filter / keep-first dedup / argmax live ONCE in
    # sources/enrich.py (valid_deduped_frames + best_path_expr) — the
    # same helpers the live ingest and w1_j4_frames_moderation use, so
    # a rule change cannot desynchronize this query from the ingested
    # backdrop_path. The aggregate form is also the better plan: one
    # shuffle on (id, path) then one on id with map-side combines,
    # versus two sort-based window passes.
    dedup = valid_deduped_frames(frames)
    agg = dedup.groupBy("id").agg(
        best_path_expr().alias("backdrop_path"),
        F.count(F.lit(1)).alias("n"),
    )
    image_cdn = "https://image.tmdb.org/t/p/"   # S11, app/tmdb_client.py:13
    return (
        feed.select("id")
        .join(agg, "id", "left")
        .select(
            "id", "backdrop_path",
            F.when(
                F.col("backdrop_path").isNotNull(),
                F.concat(F.lit(image_cdn), F.col("backdrop_path")),
            ).alias("image_url"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n_valid"),
        )
        .orderBy("id")
    )


@register_retired(
    "s2_discover_years",
    oracle=f"""
    WITH feed AS (
        {fixture.sql_year_feed(1999, "movie")}
        UNION ALL
        {fixture.sql_year_feed(1999, "tv")}
    )
    SELECT content_type,
           COUNT(*) AS n,
           MAX(page) AS n_pages,
           CAST(SUM(vote_count) AS BIGINT) AS sum_votes,
           MAX(popularity) AS max_pop,
           MIN(release_date) AS min_date,
           CAST(SUM(CASE WHEN list_contains(genre_ids, 16)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_animated
    FROM feed
    GROUP BY content_type
    ORDER BY content_type
    """,
)
def s2_discover_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: the per-year discover shard, movie + tv feeds unioned.

    The reference syncs one (year, content_type) pair per job unit
    (``app/sync_years.py:151-281``) — the sharding that works around
    TMDB's 500-page cap. Here both shards of 1999 are two parallel
    bounded scans of the ``tmdb_discover`` source (``mode=years``)
    unioned into one plan; ``release_date`` stays inside the requested
    year window by construction (the gte/lte discover params,
    ``app/sync_years.py:54-63``).
    """
    movie = discover(spark, mode="years", year=1999, content_type="movie")
    tv = discover(spark, mode="years", year=1999, content_type="tv")
    feed = movie.unionByName(tv)
    return (
        feed.groupBy("content_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("page").alias("n_pages"),
            F.sum("vote_count").alias("sum_votes"),
            F.max("popularity").alias("max_pop"),
            F.min("release_date").alias("min_date"),
            F.sum(
                F.when(F.array_contains("genre_ids", F.lit(16)), 1).otherwise(0)
            ).alias("n_animated"),
        )
        .orderBy("content_type")
    )


@register_retired(
    "s3_category_source",
    oracle=f"""
    WITH feed AS (
        SELECT 'top_rated' AS _category, *
        FROM ({fixture.sql_category_feed("top_rated", "movie")})
        UNION ALL
        SELECT 'popular' AS _category, *
        FROM ({fixture.sql_category_feed("popular", "tv")})
    )
    SELECT _category,
           content_type,
           COUNT(*) AS n,
           MAX(page) AS n_pages,
           CAST(SUM(vote_count) AS BIGINT) AS sum_votes,
           MAX(popularity) AS max_pop,
           CAST(SUM(CASE WHEN list_contains(genre_ids, 16)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_animated
    FROM feed
    GROUP BY _category, content_type
    ORDER BY _category
    """,
)
def s3_category_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: category-list feeds (/movie/{cat}, /tv/{cat}) as source shards.

    Two category scans (movie top_rated + tv popular) through the
    ``tmdb_discover`` source with ``mode=category``; the ``_category``
    tag the reference stamps on every synced doc (``app/sync.py:102``,
    ``app/sync_top.py:203``) is attached per-shard before the union.
    """
    tr = discover_category(spark, category="top_rated", content_type="movie")
    po = discover_category(spark, category="popular", content_type="tv")
    feed = tr.withColumn("_category", F.lit("top_rated")).unionByName(
        po.withColumn("_category", F.lit("popular"))
    )
    return (
        feed.groupBy("_category", "content_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("page").alias("n_pages"),
            F.sum("vote_count").alias("sum_votes"),
            F.max("popularity").alias("max_pop"),
            F.sum(
                F.when(F.array_contains("genre_ids", F.lit(16)), 1).otherwise(0)
            ).alias("n_animated"),
        )
        .orderBy("_category")
    )
