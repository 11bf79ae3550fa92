"""Projection / filter / predicate operators (SURVEY.md §2.2 P1–P13).

Reference semantics: the catalog-search filter builder
(``app/endpoints/movies.py:37-51``, ``app/endpoints/catalog.py:47-64``) —
dynamic conjunctions of equality / membership / range / regex predicates —
plus dashboard predicates (``app/main.py:98,180,201-202``).

Scale notes: every predicate here is a Catalyst expression; equality and
range conjuncts push down to the parquet scan (check ``PushedFilters`` in
``.explain``), columns are pruned to the projection. Regex predicates
(P9/P10) don't push down in Mongo either (SURVEY §4) — they run post-scan
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tmdb_sync_spark.io import table
from tmdb_sync_spark.registry import register


@register(
    "p1_projection_filter",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus = 'O'
    """,
)
def p1_projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2+P8: keep-set projection after an equality filter.

    Reference: ``_project_movie`` keep-set (``app/endpoints/movies.py:9-17``)
    + ``_type == t`` equality (P8). Unlike the reference — which projects
    app-side *after* full documents cross the wire (SURVEY §4) — the select
    prunes the parquet scan to 4 columns and the filter pushes down.
    """
    return (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    )


@register(
    "p3_conjunctive_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_returnflag = 'R'
      AND l_quantity BETWEEN 10.0 AND 40.0
      AND l_discount < 0.06
      AND strftime(l_shipdate, '%Y-%m-%d') >= '1996-06-01'
    """,
)
def p3_conjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: dynamic AND of optional predicates, built imperatively.

    Mirrors the reference's conjunctive filter-dict builder
    (``app/endpoints/movies.py:37-51``): each predicate appended only when
    its parameter is present; Catalyst folds the conjunction. The ship-date
    bound is compared *as a string* (P7's lexicographic-ISO-date idiom,
    ``app/endpoints/movies.py:46-51``).
    """
    li = table(spark, sf_dir, "lineitem")
    # imperative predicate assembly, as the reference builds its filter dict
    predicates = [
        F.col("l_returnflag") == "R",
        F.col("l_quantity").between(10.0, 40.0),
        F.col("l_discount") < 0.06,
        F.date_format("l_shipdate", "yyyy-MM-dd") >= "1996-06-01",
    ]
    cond = predicates[0]
    for p in predicates[1:]:
        cond = cond & p
    return li.where(cond).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice"
    )


@register(
    "p6_isin_by_ids",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    WHERE c_custkey IN (1, 7, 11, 42, 58, 77, 96, 104, 133, 149)
    """,
)
def p6_isin_by_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: scalar ``$in`` point-lookup by key list.

    Reference: ``/movies/by-ids`` (``app/endpoints/movies.py:71-79``).
    Small literal list → Catalyst ``In`` predicate, pushed to the scan.
    (For large id lists the engine switches to a broadcast LEFT SEMI join —
    see ``j2_semi_join_ids``.)
    """
    ids = [1, 7, 11, 42, 58, 77, 96, 104, 133, 149]
    return table(spark, sf_dir, "customer").where(F.col("c_custkey").isin(ids))


@register(
    "p7_date_string_range",
    oracle="""
    SELECT substr(strftime(o_orderdate, '%Y-%m-%d'), 1, 7) AS order_month,
           COUNT(*) AS n_orders
    FROM orders
    WHERE strftime(o_orderdate, '%Y-%m-%d') >= '1997-01-01'
      AND strftime(o_orderdate, '%Y-%m-%d') <= '1997-12-31'
    GROUP BY 1
    ORDER BY 1
    """,
)
def p7_date_string_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7+F2: year range as *lexicographic string* compare on ISO dates.

    Reference idiom: ``release_date >= '{y}-01-01' AND <= '{y}-12-31'`` as
    raw string comparison (``app/endpoints/movies.py:46-51``) — kept
    bit-exact (SURVEY §7 hard-part 3) rather than converting to date ops.
    """
    o = table(spark, sf_dir, "orders")
    ds = F.date_format("o_orderdate", "yyyy-MM-dd")
    y = 1997
    return (
        o.where((ds >= f"{y}-01-01") & (ds <= f"{y}-12-31"))
        .groupBy(F.substring(ds, 1, 7).alias("order_month"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("order_month")
    )


@register(
    "p9_regex_or_search",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE regexp_matches(p_name, '(?i)green')
       OR regexp_matches(p_type, '(?i)steel')
    """,
)
def p9_regex_or_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: case-insensitive unanchored regex OR across two columns.

    Reference: title search ``$or: [title ~ /q/i, title_ru ~ /q/i]``
    (``app/endpoints/catalog.py:50-53``). Full scan + rlike in both the
    reference (no index support) and here — acceptable by design (SURVEY §4).
    """
    p = table(spark, sf_dir, "part")
    return p.where(
        F.col("p_name").rlike("(?i)green") | F.col("p_type").rlike("(?i)steel")
    ).select("p_partkey", "p_name", "p_type")


@register(
    "p10_f3_key_build_parse",
    oracle="""
    WITH keyed AS (
        SELECT 'years:' || lower(split_part(o_orderpriority, '-', 2)) || ':'
                 || CAST(CAST(year(o_orderdate) AS INT) AS VARCHAR) AS key
        FROM orders
    )
    SELECT key,
           split_part(key, ':', 2) AS key_type,
           CAST(split_part(key, ':', 3) AS INT) AS key_year,
           COUNT(*) AS n
    FROM keyed
    WHERE regexp_matches(key, '^years:(high|urgent):[0-9]+$')
    GROUP BY 1, 2, 3
    ORDER BY 2, 3
    """,
)
def p10_f3_key_build_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10+F3+O3: build composite keys, filter with an anchored regex, parse back.

    Reference: cursor keys ``years:{type}:{year}`` built at
    ``app/sync_years.py:18-20``, filtered with ``^years:movie:\\d+$`` and
    re-parsed by splitting (``app/main.py:101-105,179,187,196-205``), then
    tuple-sorted (O3).
    """
    o = table(spark, sf_dir, "orders")
    keyed = o.select(
        F.concat_ws(
            ":",
            F.lit("years"),
            F.lower(F.split(F.col("o_orderpriority"), "-")[1]),
            F.year("o_orderdate").cast("string"),
        ).alias("key")
    )
    return (
        keyed.where(F.col("key").rlike("^years:(high|urgent):[0-9]+$"))
        .groupBy(
            "key",
            F.split(F.col("key"), ":")[1].alias("key_type"),
            F.split(F.col("key"), ":")[2].cast("int").alias("key_year"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("key_type", "key_year")
    )


@register(
    "p12_prefix_filter",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events
    WHERE event_type LIKE 'c%' OR starts_with(event_type, 'sig')
    GROUP BY 1
    ORDER BY 1
    """,
)
def p12_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12: prefix / startswith predicate.

    Reference: host-side ``key.startswith('years:')`` (``app/main.py:98``)
    — pushed into the engine as ``LIKE 'prefix%'`` (sargable: Catalyst
    turns it into a StartsWith pushed filter).
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_type").like("c%") | F.col("event_type").startswith("sig"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )
