"""Window / top-k-per-group operators (SURVEY.md §2.5 W1–W3).

Reference semantics:
- W1 ``pick_backdrop``: argmax per group with an exclusion list — among
  frames whose path is not in ``incorrect_frames``, order by
  ``(vote_average desc, width desc)`` with null→0 coercion, take the first
  (``app/utils/frames.py:4-19``).
- W2 ``_normalize_frames``: dedup by key keeping max width
  (``app/catalog/upsert.py:26-34``).
- W3 keep-first-in-order dedup (``app/tmdb_client.py:199-212``).

Scale notes: all three are one window (or one ``max_by`` aggregate) —
a single hash-partition Exchange on the group key, streamed rank inside
each partition. The W1 relational form here scales to arbitrarily many
rows per group (the array-HOF form lives in ``operators/arrays.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tmdb_sync_spark.io import table
from tmdb_sync_spark.registry import register


@register(
    "w1_argmax_exclusion",
    oracle="""
    WITH best AS (
        SELECT l_orderkey, l_partkey, l_extendedprice, l_quantity,
               row_number() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY COALESCE(l_extendedprice, 0.0) DESC,
                            COALESCE(l_quantity, 0.0) DESC,
                            l_linenumber ASC, l_partkey ASC, l_suppkey ASC
               ) AS rn
        FROM lineitem
        WHERE l_partkey % 7 <> 0
    )
    SELECT o.o_orderkey AS order_key,
           b.l_partkey AS best_partkey,
           b.l_extendedprice AS best_price,
           b.l_quantity AS best_qty
    FROM orders o
    LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
      ON o.o_orderkey = b.l_orderkey
    """,
)
def w1_argmax_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 (signature operator): top-1 per group with exclusion (argmax).

    Transplant of ``pick_backdrop`` (``app/utils/frames.py:4-19``): best
    lineitem per order by ``(price desc, qty desc)`` with null→0 coercion
    and a deterministic tiebreak, excluding a denylist (partkey % 7 == 0
    stands in for ``incorrect_frames``). Orders whose candidates are all
    excluded surface with NULLs — the reference returns ``None`` there.
    """
    li = table(spark, sf_dir, "lineitem").where(F.col("l_partkey") % 7 != 0)
    w = Window.partitionBy("l_orderkey").orderBy(
        F.coalesce(F.col("l_extendedprice"), F.lit(0.0)).desc(),
        F.coalesce(F.col("l_quantity"), F.lit(0.0)).desc(),
        F.col("l_linenumber").asc(),
        F.col("l_partkey").asc(),
        F.col("l_suppkey").asc(),
    )
    best = (
        li.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_orderkey", "l_partkey", "l_extendedprice", "l_quantity")
    )
    orders = table(spark, sf_dir, "orders")
    return orders.join(best, orders.o_orderkey == best.l_orderkey, "left").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("l_partkey").alias("best_partkey"),
        F.col("l_extendedprice").alias("best_price"),
        F.col("l_quantity").alias("best_qty"),
    )


@register(
    "w2_dedup_keep_best",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_linenumber, l_extendedprice
    FROM lineitem
    QUALIFY row_number() OVER (
        PARTITION BY l_orderkey, l_partkey
        ORDER BY l_quantity DESC, l_linenumber ASC,
                 l_extendedprice ASC, l_suppkey ASC
    ) = 1
    """,
)
def w2_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: dedup per key keeping the best row (argmax per dup-key).

    Transplant of ``_normalize_frames``'s keep-max-width dedup
    (``app/catalog/upsert.py:26-34``). ``row_number`` (not ``rank``) plus a
    unique tiebreak guarantees exactly one survivor per key — the same
    plan ``groupBy(key).agg(max_by(struct(*), ord))`` would produce, kept
    in window form so the dedup key can stream at scale.
    """
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey", "l_partkey").orderBy(
        F.col("l_quantity").desc(), F.col("l_linenumber").asc(),
        F.col("l_extendedprice").asc(), F.col("l_suppkey").asc(),
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_orderkey", "l_partkey", "l_quantity", "l_linenumber", "l_extendedprice")
    )


@register(
    "w3_dedup_keep_first",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_linenumber
    FROM lineitem
    QUALIFY row_number() OVER (
        PARTITION BY l_orderkey, l_partkey
        ORDER BY l_linenumber ASC, l_quantity ASC,
                 l_extendedprice ASC, l_suppkey ASC
    ) = 1
    """,
)
def w3_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: dedup keeping the first occurrence in a defined order.

    Transplant of the seen-set keep-first dedup in ``fetch_backdrops``
    (``app/tmdb_client.py:199-212``). The reference's "first" is API
    arrival order; here the order is pinned by ``l_linenumber`` (ingest
    order surrogate) — at scale, arrival order must be a column, never
    implicit partition order.
    """
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey", "l_partkey").orderBy(
        F.col("l_linenumber").asc(), F.col("l_quantity").asc(),
        F.col("l_extendedprice").asc(), F.col("l_suppkey").asc(),
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_orderkey", "l_partkey", "l_quantity", "l_linenumber")
    )
