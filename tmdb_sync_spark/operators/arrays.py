"""Array / set operators (SURVEY.md §2.7 AR1–AR7, §2.2 P4/P5/P13).

Reference semantics: the nested ``frames`` / ``incorrect_frames`` array
columns and their set algebra — membership (``genre_ids ∋ g``), idempotent
add (``$addToSet``), removal (``$pull``), intersect/except partition
reports, struct normalization with a validity filter
(``app/endpoints/frames.py:52-96``, ``app/catalog/upsert.py:8-34``,
``app/tmdb_client.py:194-221``).

The star schema has no array columns, so each query *builds* the nested
shape first (collect_list per order — the document-model shape) and then
applies the array algebra with Spark higher-order functions. Array results
are emitted as canonical sorted strings: raw arrays don't hash stably
across engines (SURVEY §5 hard-part 5).

Scale notes: one shuffle to build the per-key array; all HOFs
(filter/transform/array_sort) then run element-wise inside codegen with no
further exchange. At 100 TB the per-key arrays stay bounded (frames ≤ ~40
per movie in the reference); unbounded groups would argue for the
relational window form instead (see ``operators/windows.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tmdb_sync_spark.io import table
from tmdb_sync_spark.registry import register, register_retired


def _join_ints(arr: Column) -> Column:
    """Canonical string form of an integer array (already sorted)."""
    return F.array_join(F.transform(arr, lambda x: x.cast("string")), ",")


@register(
    "p5_array_membership",
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey AS order_key,
               list_sort(list_distinct(list(l_partkey))) AS parts
        FROM lineitem
        GROUP BY 1
    )
    SELECT order_key,
           len(parts) AS n_parts,
           COALESCE(array_to_string(parts, ','), '') AS parts_csv
    FROM per_order
    WHERE list_contains(parts, 42) AND len(parts) > 0
    """,
)
def p5_array_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4+P5+AR1: non-empty-array guard + array membership.

    Reference: ``{'genre_ids': {'$in': [g]}}`` multikey membership and the
    ``frames exists+non-empty`` base predicate
    (``app/endpoints/movies.py:37-41``). ``size(x) > 0`` is the exact
    Spark rendering of Mongo's ``$exists && $ne []`` combo (SURVEY §7
    hard-part 4).
    """
    li = table(spark, sf_dir, "lineitem")
    per_order = li.groupBy(F.col("l_orderkey").alias("order_key")).agg(
        F.array_sort(F.array_distinct(F.collect_list("l_partkey"))).alias("parts")
    )
    return (
        per_order
        .where(F.array_contains(F.col("parts"), 42) & (F.size("parts") > 0))
        .select(
            "order_key",
            F.size("parts").alias("n_parts"),
            _join_ints(F.col("parts")).alias("parts_csv"),
        )
    )


@register(
    "ar_set_algebra",
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey AS order_key,
               list_sort(list_distinct(list(l_partkey))) AS parts
        FROM lineitem
        WHERE l_orderkey % 20 = 0
        GROUP BY 1
    )
    SELECT order_key,
           COALESCE(array_to_string(parts, ','), '') AS parts_csv,
           COALESCE(array_to_string(list_sort(list_distinct(parts || [1, 5, 42])), ','), '') AS after_add,
           COALESCE(array_to_string(list_sort(list_filter(parts, x -> NOT list_contains([1, 5, 42], x))), ','), '') AS after_remove,
           COALESCE(array_to_string(list_sort(list_filter(parts, x -> list_contains([1, 5, 42, 77, 103], x))), ','), '') AS present,
           COALESCE(array_to_string(list_sort(list_filter([1::BIGINT, 5::BIGINT, 42::BIGINT, 77::BIGINT, 103::BIGINT],
                                                 x -> NOT list_contains(parts, x))), ','), '') AS absent
    FROM per_order
    """,
)
def ar_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR3+AR4+AR5: idempotent set-add, pull, and membership partition.

    Reference: ``$addToSet`` (mark incorrect frames,
    ``app/endpoints/frames.py:52-55``), ``$pull`` (unmark, ``:93-96``), and
    the present/absent membership report (``:66-69``). Rendered as
    ``array_union`` / ``array_except`` / ``array_intersect`` over the
    per-key array — a single narrow projection after the grouping shuffle.
    """
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 20 == 0)
    req = F.array(*[F.lit(x).cast("long") for x in (1, 5, 42)])
    probe = F.array(*[F.lit(x).cast("long") for x in (1, 5, 42, 77, 103)])
    per_order = li.groupBy(F.col("l_orderkey").alias("order_key")).agg(
        F.array_sort(F.array_distinct(F.collect_list("l_partkey"))).alias("parts")
    )
    return per_order.select(
        "order_key",
        _join_ints(F.col("parts")).alias("parts_csv"),
        _join_ints(F.array_sort(F.array_union(F.col("parts"), req))).alias("after_add"),
        _join_ints(F.array_sort(F.array_except(F.col("parts"), req))).alias("after_remove"),
        _join_ints(F.array_sort(F.array_intersect(F.col("parts"), probe))).alias("present"),
        _join_ints(F.array_sort(F.array_except(probe, F.col("parts")))).alias("absent"),
    )


@register(
    "ar7_normalize_frames",
    oracle="""
    WITH framed AS (
        SELECT l_orderkey AS order_key,
               list(struct_pack(
                   path := CAST(l_partkey AS VARCHAR) || '.jpg',
                   aspect_ratio := l_discount,
                   vote_average := l_tax,
                   width := l_quantity)) AS frames
        FROM lineitem
        WHERE l_orderkey % 10 = 0
        GROUP BY 1
    )
    SELECT order_key,
           len(frames) AS n_frames,
           len(list_filter(frames, f -> f.aspect_ratio BETWEEN 0.02 AND 0.06
                                        AND COALESCE(f.vote_average, 0.0) >= 0.0)) AS n_valid,
           COALESCE(array_to_string(
               list_sort(list_transform(
                   list_filter(frames, f -> f.aspect_ratio BETWEEN 0.02 AND 0.06
                                            AND COALESCE(f.vote_average, 0.0) >= 0.0),
                   f -> f.path)), ','), '') AS valid_paths
    FROM framed
    """,
)
def ar7_normalize_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR7+P13+AR2: struct-array normalization with a validity filter.

    Reference: ``_normalize_frames`` struct normalization
    (``app/catalog/upsert.py:8-24``) + the backdrop validity rule
    ``1.5 ≤ aspect_ratio ≤ 2.2 AND coalesce(vote_average,0) ≥ 0``
    (``app/tmdb_client.py:194-196``) + array-of-structs → array-of-field
    projection (``app/sync.py:106-107``). All higher-order functions —
    filter / transform / array_sort — zero UDFs, zero explodes.
    """
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 10 == 0)
    framed = li.groupBy(F.col("l_orderkey").alias("order_key")).agg(
        F.collect_list(
            F.struct(
                F.concat(F.col("l_partkey").cast("string"), F.lit(".jpg")).alias("path"),
                F.col("l_discount").alias("aspect_ratio"),
                F.col("l_tax").alias("vote_average"),
                F.col("l_quantity").alias("width"),
            )
        ).alias("frames")
    )
    valid = F.filter(
        F.col("frames"),
        lambda f: f["aspect_ratio"].between(0.02, 0.06)
        & (F.coalesce(f["vote_average"], F.lit(0.0)) >= 0.0),
    )
    return framed.select(
        "order_key",
        F.size("frames").alias("n_frames"),
        F.size(valid).alias("n_valid"),
        F.array_join(F.array_sort(F.transform(valid, lambda f: f["path"])), ",").alias(
            "valid_paths"
        ),
    )


@register_retired(
    "w1_array_argmax",
    oracle="""
    WITH framed AS (
        SELECT l_orderkey AS order_key,
               list(struct_pack(
                   path := CAST(l_partkey AS VARCHAR) || '.jpg',
                   va := l_extendedprice,
                   width := l_quantity,
                   line := l_linenumber)) AS frames,
               list_sort(list(CAST(l_partkey AS VARCHAR) || '.jpg')
                         FILTER (WHERE l_partkey % 7 = 0)) AS incorrect
        FROM lineitem
        WHERE l_orderkey % 10 = 0
        GROUP BY 1
    )
    SELECT order_key,
           (list_sort(
               list_transform(
                   list_filter(frames, f -> NOT list_contains(COALESCE(incorrect, []), f.path)),
                   f -> struct_pack(nva := -COALESCE(f.va, 0.0),
                                    nwidth := -COALESCE(f.width, 0.0),
                                    line := f.line,
                                    path := f.path)))
           )[1].path AS backdrop_path
    FROM framed
    """,
)
def w1_array_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1, array form: ``pick_backdrop`` as pure array HOFs.

    The same argmax-with-exclusion as ``w1_argmax_exclusion`` but computed
    *inside* the array column — filter out excluded paths, sort by
    ``(va desc, width desc, line asc)`` via negated sort keys in a struct
    comparator, take element 1 (``app/utils/frames.py:4-19``). This is the
    shape used inside the MERGE pipeline where frames are already nested;
    no explode, no extra shuffle.
    """
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 10 == 0)
    framed = li.groupBy(F.col("l_orderkey").alias("order_key")).agg(
        F.collect_list(
            F.struct(
                F.concat(F.col("l_partkey").cast("string"), F.lit(".jpg")).alias("path"),
                F.col("l_extendedprice").alias("va"),
                F.col("l_quantity").alias("width"),
                F.col("l_linenumber").alias("line"),
            )
        ).alias("frames"),
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("l_partkey") % 7 == 0,
                    F.concat(F.col("l_partkey").cast("string"), F.lit(".jpg")),
                )
            )
        ).alias("incorrect"),
    )
    allowed = F.filter(
        F.col("frames"),
        lambda f: ~F.array_contains(
            F.coalesce(F.col("incorrect"), F.array().cast("array<string>")), f["path"]
        ),
    )
    # array_sort's default comparator is ascending struct order; negate the
    # desc keys so (va desc, width desc, line asc) becomes ascending.
    ranked = F.array_sort(
        F.transform(
            allowed,
            lambda f: F.struct(
                (-F.coalesce(f["va"], F.lit(0.0))).alias("nva"),
                (-F.coalesce(f["width"], F.lit(0.0))).alias("nwidth"),
                f["line"].alias("line"),
                f["path"].alias("path"),
            ),
        )
    )
    return framed.select(
        "order_key", F.try_element_at(ranked, F.lit(1))["path"].alias("backdrop_path")
    )
