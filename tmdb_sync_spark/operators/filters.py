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
from tmdb_sync_spark.registry import register, register_retired


@register(
    "p1_p3_projection_conjunctive",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_returnflag = 'R'
      AND l_quantity BETWEEN 10.0 AND 40.0
      AND l_discount < 0.06
      AND strftime(l_shipdate, '%Y-%m-%d') >= '1996-06-01'
    """,
)
def p1_p3_projection_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2+P3+P8: keep-set projection over a dynamically built conjunction.

    Mirrors the reference's conjunctive filter-dict builder
    (``app/endpoints/movies.py:37-51``): each predicate appended only when
    its parameter is present (equality = P8, range, string-date compare =
    P7's lexicographic-ISO idiom); Catalyst folds the conjunction. The
    final keep-set select is ``_project_movie`` (P1/P2,
    ``app/endpoints/movies.py:9-17``) — unlike the reference, which
    projects app-side after full documents cross the wire (SURVEY §4), the
    select prunes the parquet scan to 5 columns and every sargable
    conjunct pushes down (``PushedFilters`` in ``.explain``).
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
    WHERE regexp_matches(p_name, '(?i)RED')
       OR regexp_matches(p_type, '(?i)promo')
    """,
)
def p9_regex_or_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: case-insensitive unanchored regex OR across two columns.

    Reference: title search ``$or: [title ~ /q/i, title_ru ~ /q/i]``
    (``app/endpoints/catalog.py:50-53``). Full scan + rlike in both the
    reference (no index support) and here — acceptable by design (SURVEY §4).
    Patterns deliberately cross-cased against the data ('RED' vs lowercase
    names, 'promo' vs uppercase types) so the match set is non-empty ONLY
    if (?i) folding actually works — a vacuous empty-set parity proved
    nothing (round-1 verdict finding 4).
    """
    p = table(spark, sf_dir, "part")
    return p.where(
        F.col("p_name").rlike("(?i)RED") | F.col("p_type").rlike("(?i)promo")
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


@register_retired(
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
