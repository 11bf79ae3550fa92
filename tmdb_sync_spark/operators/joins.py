"""Join operators (SURVEY.md §2.3 J1–J4) plus headline multi-join analytics.

The reference has no general joins (document model); its join-equivalent
patterns — semi-join by id list (J2), fill-missing-group-keys (J3), and the
MERGE key-match (J1, in ``operators/merge.py``) — are rebuilt relationally,
and we add the multi-join aggregation shapes Spark gives for free (the
bench headliners).

Scale notes: dimension sides (region/nation/customer-slices, generated
year dims) are broadcast explicitly — no shuffle on the fact table for
dim joins. Fact-fact joins shuffle on the join key once; AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tmdb_sync_spark.io import broadcast_if_dim, table
from tmdb_sync_spark.registry import register


@register(
    "p6_j2_semi_join_ids",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_custkey % 10 = 1)
      AND o_orderstatus IN ('O', 'F')
    """,
)
def p6_j2_semi_join_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6+J2: scalar ``$in`` + semi-join by key list, broadcast.

    Reference: ``/movies/by-ids`` (``app/endpoints/movies.py:71-79``). Both
    renderings of the ``$in`` operator in one plan: the small literal list
    compiles to a Catalyst ``In`` predicate pushed to the scan (P6); the
    large id list is a broadcast LEFT SEMI join — the id set ships to every
    executor once; the fact scan never shuffles (J2). The hint is
    size-gated (:func:`broadcast_if_dim`): customer scales with SF, so at
    lake scale the semi-join falls back to a shuffle and AQE re-judges
    the filtered slice at runtime instead of the driver collecting it on
    hope.
    """
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus").isin("O", "F")  # P6: literal $in, pushed
    )
    ids = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 10 == 1)
        .select("c_custkey")
    )
    return orders.join(
        broadcast_if_dim(ids, sf_dir, "customer"),
        orders.o_custkey == ids.c_custkey,
        "left_semi",
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")


@register(
    "j3_fill_missing_years",
    oracle="""
    WITH dim AS (
        SELECT y AS order_year, r_name AS region_name
        FROM generate_series(1995, 2001) AS t(y)
        CROSS JOIN region
    ),
    counts AS (
        SELECT CAST(year(o.o_orderdate) AS INT) AS order_year,
               r.r_name AS region_name,
               COUNT(*) AS n_orders
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
    )
    SELECT d.order_year,
           d.region_name,
           COALESCE(c.n_orders, 0) AS n_orders
    FROM dim d
    LEFT JOIN counts c
      ON d.order_year = c.order_year AND d.region_name = c.region_name
    ORDER BY 1, 2
    """,
)
def j3_fill_missing_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: fill missing group keys via a generated dimension.

    Reference: year-range cursor status generates every ``years:{t}:{y}``
    key in range, left-joins found cursors, and zero-fills the gaps
    (``app/main.py:186-197``). The dimension is generated with
    ``sequence + explode`` (pure Catalyst, no driver loop) and broadcast.
    """
    years = spark.range(1).select(
        F.explode(F.sequence(F.lit(1995), F.lit(2001))).alias("order_year")
    )
    region = table(spark, sf_dir, "region")
    dim = years.crossJoin(region.select(F.col("r_name").alias("region_name")))

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    counts = (
        # customer scales with SF → size-gated hint; nation/region are
        # fixed 25/5 rows at ANY TPC-H scale → unconditional is safe
        o.join(broadcast_if_dim(c, sf_dir, "customer"),
               o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.col("r_name").alias("region_name"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    # dim is the PRESERVED side of the left join, so it cannot host the
    # broadcast hash table (Spark silently drops a broadcast hint there
    # and falls back to SortMergeJoin — verified in review). Broadcast
    # the build side instead: the post-aggregate counts frame is tiny
    # (years × regions), and the executed plan is then the intended
    # BroadcastHashJoin with no exchange on either side.
    return (
        dim.join(F.broadcast(counts), ["order_year", "region_name"], "left")
        .select(
            "order_year",
            "region_name",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        )
        .orderBy("order_year", "region_name")
    )


@register(
    "q5_revenue_by_nation",
    oracle="""
    SELECT n.n_name AS nation_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headline multi-join aggregate (TPC-H Q5 shape): revenue per nation.

    Beyond-reference analytics the document store cannot express (SURVEY
    §2.3: "all physical join strategies free from Spark"). Plan: lineitem
    shuffles once on ``l_orderkey``; orders is filtered *before* the join
    (date pushdown); nation/region broadcast unconditionally (fixed-size),
    customer through the size gate. Revenue is an exact DECIMAL sum cast
    to double — order-independent across shuffles.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # customer is size-gated (scales with SF); nation/region fixed
        .join(broadcast_if_dim(c, sf_dir, "customer"),
              o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q3_top_orders_by_revenue",
    oracle="""
    SELECT o.o_orderkey AS order_key,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           o.o_orderpriority AS order_priority,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, order_key ASC
    LIMIT 10
    """,
)
def q3_top_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headline join + agg + top-k (TPC-H Q3 shape).

    Segment-filtered customers broadcast; one shuffle on orderkey for the
    aggregate; final top-10 via TakeOrderedAndProject (no global sort).
    Unique ``order_key`` tiebreak keeps the page deterministic.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # size-gated: the BUILDING slice is small locally, but the hint
        # must not survive to a scale where customer itself is TBs
        .join(broadcast_if_dim(c, sf_dir, "customer"),
              o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("o_orderkey").alias("order_key"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.col("o_orderpriority").alias("order_priority"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("order_key").asc())
        .limit(10)
    )
