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

from pyspark.sql import DataFrame, SparkSession
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

    Shape (r12, guide §2.3): the oracle's ``row_number``-window form
    sorted every surviving lineitem row on the 5-key ordering inside the
    window exchange and carried every column through it; the argmax is
    instead ONE ``max_by`` aggregate keyed on the ordering struct (desc
    keys direct, asc tiebreaks negated — identical total order), with
    the same shuffle-first repartition as ``w2_w3_dedup_variants``
    (struct-valued ``max_by`` plans as SortAggregate; pre-partitioning
    on the exact group key keeps the single exchange and runs the one
    sort post-shuffle, parallel). Measured at sf0.1: 0.83 → 0.58 s warm
    interleaved, results bit-identical (``exceptAll`` both ways = 0).
    """
    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_partkey") % 7 != 0)
        .repartition("l_orderkey")
    )
    best_ord = F.struct(
        F.coalesce(F.col("l_extendedprice"), F.lit(0.0)).alias("p"),
        F.coalesce(F.col("l_quantity"), F.lit(0.0)).alias("q"),
        (-F.col("l_linenumber")).alias("nl"),
        (-F.col("l_partkey")).alias("npk"),
        (-F.col("l_suppkey")).alias("nsk"),
    )
    best = (
        li.groupBy("l_orderkey")
        .agg(
            F.max_by(
                F.struct("l_partkey", "l_extendedprice", "l_quantity"),
                best_ord,
            ).alias("b")
        )
        .select("l_orderkey", "b.l_partkey", "b.l_extendedprice",
                "b.l_quantity")
    )
    orders = table(spark, sf_dir, "orders")
    return orders.join(best, orders.o_orderkey == best.l_orderkey, "left").select(
        F.col("o_orderkey").alias("order_key"),
        F.col("l_partkey").alias("best_partkey"),
        F.col("l_extendedprice").alias("best_price"),
        F.col("l_quantity").alias("best_qty"),
    )


@register(
    "w2_w3_dedup_variants",
    oracle="""
    WITH best AS (
        SELECT l_orderkey, l_partkey, l_quantity AS best_qty,
               l_linenumber AS best_line, l_extendedprice AS best_price
        FROM lineitem
        QUALIFY row_number() OVER (
            PARTITION BY l_orderkey, l_partkey
            ORDER BY l_quantity DESC, l_linenumber ASC,
                     l_extendedprice ASC, l_suppkey ASC
        ) = 1
    ),
    first AS (
        SELECT l_orderkey, l_partkey, l_linenumber AS first_line,
               l_quantity AS first_qty
        FROM lineitem
        QUALIFY row_number() OVER (
            PARTITION BY l_orderkey, l_partkey
            ORDER BY l_linenumber ASC, l_quantity ASC,
                     l_extendedprice ASC, l_suppkey ASC
        ) = 1
    )
    SELECT b.l_orderkey, b.l_partkey, b.best_qty, b.best_line, b.best_price,
           f.first_line, f.first_qty
    FROM best b JOIN first f USING (l_orderkey, l_partkey)
    """,
)
def w2_w3_dedup_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2+W3: dedup keep-best and dedup keep-first per key, one pass.

    - W2 transplants ``_normalize_frames``'s keep-max-width dedup
      (``app/catalog/upsert.py:26-34``): the survivor is the argmax row.
    - W3 transplants the seen-set keep-first dedup in ``fetch_backdrops``
      (``app/tmdb_client.py:199-212``); the reference's "first" is API
      arrival order — here pinned by ``l_linenumber`` (ingest-order
      surrogate): at scale, arrival order must be a column, never
      implicit partition order.

    Both variants fold into ONE groupBy via ``max_by``/``min_by`` ordering
    structs (desc keys negated): a single shuffle — vs. the two window
    passes of the oracle. ``w1_argmax_exclusion`` uses the same
    ``max_by`` shape since r12 (its oracle stays the row_number window —
    either form produces exactly one survivor per key).

    Shuffle-first (r12, guide §2.3): struct-valued ``max_by``/``min_by``
    buffers are immutable in UnsafeRow, so Catalyst falls back to
    SortAggregate — and the PARTIAL half of the default partial/final
    pair sorts the whole input on the map side for nothing:
    ``(l_orderkey, l_partkey)`` is near-unique in lineitem (~1 line per
    order-part AT EVERY SCALE — a data property, not an sf0.1 one), so
    partial aggregation cannot reduce what the exchange carries. The
    explicit repartition on the exact group keys satisfies the agg's
    required distribution, EnsureRequirements adds no further exchange,
    and the one sort runs post-shuffle, cluster-parallel: same single
    shuffle of the same rows, one serial sort pass removed. Measured at
    sf0.1: 1.34 → 0.56 s warm, results bit-identical.
    """
    li = table(spark, sf_dir, "lineitem").repartition(
        "l_orderkey", "l_partkey"
    )
    best_ord = F.struct(
        F.col("l_quantity"), (-F.col("l_linenumber")).alias("nl"),
        (-F.col("l_extendedprice")).alias("np"), (-F.col("l_suppkey")).alias("ns"),
    )
    first_ord = F.struct(
        F.col("l_linenumber"), F.col("l_quantity"),
        F.col("l_extendedprice"), F.col("l_suppkey"),
    )
    row = F.struct("l_quantity", "l_linenumber", "l_extendedprice")
    return (
        li.groupBy("l_orderkey", "l_partkey")
        .agg(
            F.max_by(row, best_ord).alias("b"),
            F.min_by(row, first_ord).alias("f"),
        )
        .select(
            "l_orderkey", "l_partkey",
            F.col("b.l_quantity").alias("best_qty"),
            F.col("b.l_linenumber").alias("best_line"),
            F.col("b.l_extendedprice").alias("best_price"),
            F.col("f.l_linenumber").alias("first_line"),
            F.col("f.l_quantity").alias("first_qty"),
        )
    )
