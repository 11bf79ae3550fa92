"""Deterministic TMDB API fixture — one formula, two engines.

The reference ingests from the live TMDB REST API (``app/tmdb_client.py``,
``app/sync_top.py:32-121``, ``app/sync_years.py:34-148``). Tests must never
touch the network (SURVEY §7 Phase 4), so this module *is* the API: every
page/detail/image response is a pure function of integers (page, slot, id).

Crucially the formulas use only integer arithmetic plus one exact-int /
exact-int division per double, so the **DuckDB oracle reproduces them
bit-for-bit in SQL** (`range()` + the same expressions). The SQL fragments
below are generated from the same constants as the Python row generator —
single source of truth, no drift.

Reference parity map:
- discover page shape / 20-per-page: ``app/sync_top.py:95-121``, TMDB API
- per-item details (production_countries): ``app/tmdb_client.py:385-463``
- ru-title lookup with coalesce: ``app/sync.py:23-97``
- backdrops list (aspect filter / dedup / sort): ``app/tmdb_client.py:169-282``
"""

from __future__ import annotations

PAGE_SIZE = 20
TOTAL_TOP = 2_743          # 138 pages; page 138 has 3 items, page 139 empty
YEAR_ITEMS = {"movie": 97, "tv": 53}   # per-year totals (5 / 3 pages)

# ISO-3166 codes; slot 24 is "" (falsy) — the reference's null-safe
# country_codes derivation skips falsy codes (app/catalog/upsert.py:65-66).
COUNTRY_CODES = [
    "US", "GB", "FR", "DE", "JP", "KR", "IN", "BR", "CA", "AU",
    "IT", "ES", "MX", "RU", "CN", "SE", "NO", "DK", "NL", "PL",
    "TR", "AR", "ZA", "IE", "",
]

# ---------------------------------------------------------------------------
# discover pages (S1-S4)
# ---------------------------------------------------------------------------


def top_total_pages() -> int:
    return (TOTAL_TOP + PAGE_SIZE - 1) // PAGE_SIZE


def top_movie(rank: int) -> dict:
    """Movie at 0-based global ``rank`` of the vote_count.desc discover feed."""
    mid = rank + 1
    g1 = 1 + (mid * 3) % 19
    g2 = 16 if mid % 5 == 0 else 28 + mid % 7
    return {
        "id": mid,
        "content_type": "movie",
        "title": f"Movie {mid}",
        "name": None,
        "release_date": "%04d-%02d-%02d"
        % (1950 + mid % 75, 1 + mid % 12, 1 + mid % 28),
        "popularity": (mid * 2654435761) % 1_000_000 / 1000.0,
        "vote_average": (mid % 101) / 10.0,
        "vote_count": 3_000_000 - 7 * rank,
        "genre_ids": [g1, g2],
        "page": rank // PAGE_SIZE + 1,
    }


def year_item(year: int, rank: int, content_type: str) -> dict:
    """Item at 0-based ``rank`` of the per-year popularity.desc feed."""
    mid = year * 10_000 + rank + 1
    g1 = 1 + (mid * 3) % 19
    g2 = 16 if mid % 5 == 0 else 28 + mid % 7
    title = f"Movie {mid}" if content_type == "movie" else None
    name = f"Show {mid}" if content_type == "tv" else None
    return {
        "id": mid,
        "content_type": content_type,
        "title": title,
        "name": name,
        "release_date": "%04d-%02d-%02d" % (year, 1 + mid % 12, 1 + mid % 28),
        "popularity": (1_000_000 - 13 * rank) / 1000.0,
        "vote_average": (mid % 101) / 10.0,
        "vote_count": (mid % 9973) * 3,
        "genre_ids": [g1, g2],
        "page": rank // PAGE_SIZE + 1,
    }


# category lists (S3): /movie/{category} and /tv/{category} feeds
# (app/tmdb_client.py:44-136). Fixed code per category keeps ids disjoint
# from the top/year feeds.
CATEGORY_CODES = {"top_rated": 1, "popular": 2, "now_playing": 3, "upcoming": 4}
CAT_ITEMS = 61   # 4 pages, last partial


def category_item(category: str, rank: int, content_type: str) -> dict:
    code = CATEGORY_CODES[category]
    mid = 90_000_000 + code * 100_000 + rank + 1
    g1 = 1 + (mid * 3) % 19
    g2 = 16 if mid % 5 == 0 else 28 + mid % 7
    title = f"Movie {mid}" if content_type == "movie" else None
    name = f"Show {mid}" if content_type == "tv" else None
    return {
        "id": mid,
        "content_type": content_type,
        "title": title,
        "name": name,
        "release_date": "%04d-%02d-%02d"
        % (1950 + mid % 75, 1 + mid % 12, 1 + mid % 28),
        "popularity": (500_000 - 11 * rank) / 1000.0,
        "vote_average": (mid % 101) / 10.0,
        "vote_count": (mid % 7919) * 5,
        "genre_ids": [g1, g2],
        "page": rank // PAGE_SIZE + 1,
    }


# DuckDB SQL twin of category_item() over ranks [0, CAT_ITEMS).
def sql_category_feed(category: str, content_type: str) -> str:
    code = CATEGORY_CODES[category]
    mid = f"(90000000 + {code} * 100000 + range + 1)"
    title = f"'Movie ' || {mid}" if content_type == "movie" else "CAST(NULL AS VARCHAR)"
    name = f"'Show ' || {mid}" if content_type == "tv" else "CAST(NULL AS VARCHAR)"
    return f"""
    SELECT {mid} AS id,
           '{content_type}' AS content_type,
           {title} AS title,
           {name} AS name,
           printf('%04d-%02d-%02d', 1950 + {mid} % 75,
                  1 + {mid} % 12, 1 + {mid} % 28) AS release_date,
           (500000 - 11 * range) / 1000.0 AS popularity,
           ({mid} % 101) / 10.0 AS vote_average,
           ({mid} % 7919) * 5 AS vote_count,
           [1 + ({mid} * 3) % 19,
            CASE WHEN {mid} % 5 = 0 THEN 16
                 ELSE 28 + {mid} % 7 END] AS genre_ids,
           CAST(range // {PAGE_SIZE} + 1 AS INT) AS page
    FROM range(0, {CAT_ITEMS})
    """


# DuckDB SQL twin of year_item() over ranks [0, n): identical expressions.
def sql_year_feed(year: int, content_type: str) -> str:
    n = YEAR_ITEMS[content_type]
    mid = f"({year} * 10000 + range + 1)"
    title = f"'Movie ' || {mid}" if content_type == "movie" else "CAST(NULL AS VARCHAR)"
    name = f"'Show ' || {mid}" if content_type == "tv" else "CAST(NULL AS VARCHAR)"
    return f"""
    SELECT {mid} AS id,
           '{content_type}' AS content_type,
           {title} AS title,
           {name} AS name,
           printf('%04d-%02d-%02d', {year},
                  1 + {mid} % 12, 1 + {mid} % 28) AS release_date,
           (1000000 - 13 * range) / 1000.0 AS popularity,
           ({mid} % 101) / 10.0 AS vote_average,
           ({mid} % 9973) * 3 AS vote_count,
           [1 + ({mid} * 3) % 19,
            CASE WHEN {mid} % 5 = 0 THEN 16
                 ELSE 28 + {mid} % 7 END] AS genre_ids,
           CAST(range // {PAGE_SIZE} + 1 AS INT) AS page
    FROM range(0, {n})
    """


# DuckDB SQL twin of top_movie() over ranks [0, n): identical expressions.
def sql_top_feed(n: int) -> str:
    return f"""
    SELECT range + 1 AS id,
           'movie' AS content_type,
           'Movie ' || (range + 1) AS title,
           CAST(NULL AS VARCHAR) AS name,
           printf('%04d-%02d-%02d', 1950 + (range + 1) % 75,
                  1 + (range + 1) % 12, 1 + (range + 1) % 28) AS release_date,
           ((range + 1) * 2654435761) % 1000000 / 1000.0 AS popularity,
           ((range + 1) % 101) / 10.0 AS vote_average,
           3000000 - 7 * range AS vote_count,
           [1 + ((range + 1) * 3) % 19,
            CASE WHEN (range + 1) % 5 = 0 THEN 16
                 ELSE 28 + (range + 1) % 7 END] AS genre_ids,
           CAST(range // {PAGE_SIZE} + 1 AS INT) AS page
    FROM range(0, {n})
    """


# ---------------------------------------------------------------------------
# details / ru-title enrichment (S5, S6)
# ---------------------------------------------------------------------------


def details(mid: int) -> dict:
    """GET /{type}/{id} fixture: production_countries for one item."""
    n = 1 + mid % 3
    return {
        "production_countries": [
            {"iso_3166_1": COUNTRY_CODES[(mid + 7 * k) % 25],
             "name": f"Country {(mid + 7 * k) % 25}"}
            for k in range(n)
        ]
    }


def title_ru(mid: int) -> str | None:
    """GET with language=ru-RU fixture; one in three has no localization."""
    return None if mid % 3 == 0 else f"ru_{mid}"


# SQL twins (expressions over an id column).
SQL_CC_LIST = "[" + ", ".join(f"'{c}'" for c in COUNTRY_CODES) + "]"


def sql_title_ru(id_col: str = "id") -> str:
    return f"CASE WHEN {id_col} % 3 = 0 THEN NULL ELSE 'ru_' || {id_col} END"


# country code of the k-th (0-based) production country:
def sql_country_code(id_col: str = "id", k: str = "k") -> str:
    return f"list_extract({SQL_CC_LIST}, (({id_col} + 7 * {k}) % 25) + 1)"


# ---------------------------------------------------------------------------
# backdrops / frames (S7)
# ---------------------------------------------------------------------------


def n_frames(mid: int) -> int:
    return mid % 9            # 0..8; some items legitimately frameless


def frame(mid: int, j: int) -> dict:
    """j-th backdrop of item ``mid`` in API response order.

    ``path`` repeats every 5 slots, so items with >5 frames contain
    duplicate paths — exercising the keep-first dedup of
    ``app/tmdb_client.py:199-212``. aspect_ratio spans 1.3..2.2 so the
    1.5 ≤ ar ≤ 2.2 validity filter (``app/tmdb_client.py:194-196``) drops
    a deterministic subset.
    """
    return {
        "path": f"/f/{mid}_{j % 5}.jpg",
        "aspect_ratio": (13 + (mid + 3 * j) % 10) / 10.0,
        "vote_average": (mid * (j + 1)) % 100 / 10.0,
        "width": 640 + (mid + j) % 8 * 160,
        "j": j,
    }


# DuckDB twin: explode (id, j) pairs for j in [0, id % 9) given a CTE
# exposing `id`. Parameterized by source CTE name so every oracle reuses
# THIS fragment (single source of truth with fixture.frame()) instead of
# hand-copying the five formulas per query.
def sql_frames_from(src: str = "feed") -> str:
    return f"""
    SELECT f.id,
           '/f/' || f.id || '_' || (g.range % 5) || '.jpg' AS path,
           (13 + (f.id + 3 * g.range) % 10) / 10.0 AS aspect_ratio,
           (f.id * (g.range + 1)) % 100 / 10.0 AS vote_average,
           640 + (f.id + g.range) % 8 * 160 AS width,
           g.range AS j
    FROM {src} f, range(0, 9) g
    WHERE g.range < f.id % 9
"""


SQL_FRAMES_FROM_FEED = sql_frames_from()
