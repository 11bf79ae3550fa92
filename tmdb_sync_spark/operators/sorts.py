"""Sort / limit / pagination operators (SURVEY.md §2.6 O1–O4).

Reference semantics: dynamic single-field sort + skip/limit pagination
(``app/endpoints/movies.py:31-66``), multi-key desc sort with null→0
coercion (``app/tmdb_client.py:214-220``, ``app/utils/frames.py:17``).

Scale notes: ``orderBy + limit`` compiles to ``TakeOrderedAndProject``
(per-partition top-k, then a single-partition merge of k-sized heaps — no
global sort shuffle). Pagination (offset+limit) carries a unique-key
tiebreak: Mongo's sort is non-stable, so a pinned total order is a
deliberate, documented semantic deviation (SURVEY §7 hard-part 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tmdb_sync_spark.io import table
from tmdb_sync_spark.registry import register


@register(
    "o1_o2_pagination_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey,
           COALESCE(l_extendedprice, 0.0) AS price,
           COALESCE(l_quantity, 0.0) AS qty
    FROM lineitem
    ORDER BY COALESCE(l_extendedprice, 0.0) DESC,
             COALESCE(l_quantity, 0.0) DESC,
             l_orderkey ASC, l_linenumber ASC, l_partkey ASC
    LIMIT 100 OFFSET 50
    """,
)
def o1_o2_pagination_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2+O4: multi-key desc sort + skip/limit page, null→0 coercion.

    Reference: ``sort(field, ±1).skip(s).limit(n)`` pagination with
    whitelisted sort fields (``app/endpoints/movies.py:31-66``, O1) over
    the multi-key desc order with ``or 0`` null coercion the frames sort
    uses (``app/tmdb_client.py:214-220``, ``app/utils/frames.py:17``, O2)
    and a bounded fetch (O4). The unique (orderkey, linenumber, partkey)
    tiebreak pins a total order so page contents are deterministic across
    engines (Mongo's sort is non-stable — SURVEY §7 hard-part 2).
    Physical plan: TakeOrderedAndProject of offset+limit rows — no global
    sort at scale.
    """
    li = table(spark, sf_dir, "lineitem")
    price = F.coalesce(F.col("l_extendedprice"), F.lit(0.0)).alias("price")
    qty = F.coalesce(F.col("l_quantity"), F.lit(0.0)).alias("qty")
    return (
        li.select("l_orderkey", "l_linenumber", "l_partkey", price, qty)
        .orderBy(
            F.col("price").desc(), F.col("qty").desc(),
            F.col("l_orderkey").asc(), F.col("l_linenumber").asc(),
            F.col("l_partkey").asc(),
        )
        .offset(50)
        .limit(100)
    )
