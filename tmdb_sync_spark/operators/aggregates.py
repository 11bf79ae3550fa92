"""Aggregation operators (SURVEY.md §2.4 A1–A8).

Reference semantics being re-expressed:
- A1/A2/A3: the meta-sync coverage report — $match → $group(year) with
  conditional sums → guarded-divide coverage projection → sort
  (reference ``app/endpoints/meta_sync.py:22-55``).
- A4/A5: frame-report stats — multi-key group, count, pushed list of
  reasons, per-reason frequency map (``app/endpoints/reports.py:20-46``).
- A6/A7: filtered / total counts (``app/main.py:121-127``).
- A8: running batch counters folded per category
  (``app/sync_top.py:136-143,267-273``).

Scale notes: each query is a single hash-aggregate plan — partial (map-side)
aggregation then one Exchange on the group key. No collect-driven loops; the
A5 frequency map is a two-level aggregation, not a per-group Python Counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tmdb_sync_spark.io import table
from tmdb_sync_spark.operators.scalars import NAN_VALUE_SQL, nan_to_null
from tmdb_sync_spark.registry import register, register_retired


@register(
    "a1_sync_coverage",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           COUNT(*) AS total,
           MAX(o_orderdate) AS last_order_at,
           CAST(SUM(CASE WHEN o_totalprice > 200000.0 THEN 1 ELSE 0 END) AS BIGINT) AS with_high_value,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS with_urgent,
           CASE WHEN COUNT(*) > 0
                THEN CAST(SUM(CASE WHEN o_totalprice > 200000.0 THEN 1 ELSE 0 END) AS BIGINT) / COUNT(*)
                ELSE 0.0 END AS high_value_coverage,
           CASE WHEN COUNT(*) > 0
                THEN CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) / COUNT(*)
                ELSE 0.0 END AS urgent_coverage
    FROM orders
    WHERE o_orderstatus IN ('O','F','P')
    GROUP BY 1
    ORDER BY 1
    """,
)
def a1_sync_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2+A3 flagship: group-by-year coverage report.

    Transplant of the reference sync-status aggregation
    (``app/endpoints/meta_sync.py:22-55``): the year-keyed group with two
    conditional sums ("how many rows carry this sync watermark") and
    divide-by-zero-guarded coverage ratios, sorted by year.

    Plan shape: scan(orders: 4 cols) → partial hashagg → Exchange(year) →
    final hashagg → project → sort. Exactly one shuffle.
    """
    orders = table(spark, sf_dir, "orders")
    hi = F.col("o_totalprice") > 200000.0
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders
        .where(F.col("o_orderstatus").isin("O", "F", "P"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.max("o_orderdate").alias("last_order_at"),
            F.sum(F.when(hi, 1).otherwise(0)).alias("with_high_value"),
            F.sum(F.when(urgent, 1).otherwise(0)).alias("with_urgent"),
        )
        .select(
            "order_year", "total", "last_order_at", "with_high_value", "with_urgent",
            F.when(F.col("total") > 0, F.col("with_high_value") / F.col("total"))
             .otherwise(F.lit(0.0)).alias("high_value_coverage"),
            F.when(F.col("total") > 0, F.col("with_urgent") / F.col("total"))
             .otherwise(F.lit(0.0)).alias("urgent_coverage"),
        )
        .orderBy("order_year")
    )


@register(
    "a4_a5_report_stats",
    oracle="""
    WITH per_status AS (
        SELECT l_orderkey, l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        WHERE l_orderkey % 5 = 0
        GROUP BY 1, 2, 3
    )
    SELECT l_orderkey AS order_key,
           l_returnflag AS return_flag,
           CAST(SUM(n) AS BIGINT) AS report_count,
           array_to_string(list_sort(list(l_linestatus || ':' || CAST(n AS VARCHAR))), ',') AS status_counts
    FROM per_status
    GROUP BY 1, 2
    """,
)
def a4_a5_report_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+A5: multi-key group + per-value frequency map.

    Reference: frame-report stats group on (movie_id, frame_path,
    content_type) with ``$push(reason)`` then a host-side Counter
    (``app/endpoints/reports.py:20-46``). Re-expressed as a *two-level*
    aggregation — no per-group Python, no Counter: first count per
    (keys, value), then fold to a canonical sorted "value:count" string
    (maps hash unreliably across engines, SURVEY §5 hard-part 5).
    """
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 5 == 0)
    per_status = (
        li.groupBy("l_orderkey", "l_returnflag", "l_linestatus")
          .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        per_status
        .groupBy(
            F.col("l_orderkey").alias("order_key"),
            F.col("l_returnflag").alias("return_flag"),
        )
        .agg(
            F.sum("n").alias("report_count"),
            F.array_join(
                F.array_sort(
                    F.collect_list(
                        F.concat_ws(":", F.col("l_linestatus"), F.col("n"))
                    )
                ),
                ",",
            ).alias("status_counts"),
        )
    )


@register(
    "a8_sk_salted_counters",
    oracle=f"""
    WITH agg AS (
        SELECT event_type,
               COUNT(*) AS processed,
               CAST(SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS inserted,
               CAST(SUM(CASE WHEN value <= 50.0 OR value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS updated,
               MAX(ts) AS cursor_ts,
               CAST(SUM(CAST({NAN_VALUE_SQL} AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1
    ),
    u AS (
        SELECT event_type, COUNT(*) AS n_users
        FROM (SELECT DISTINCT event_type, user_id FROM events)
        GROUP BY event_type
    )
    SELECT a.event_type, a.processed, a.inserted, a.updated, a.cursor_ts,
           a.total_value, u.n_users
    FROM agg a JOIN u USING (event_type)
    ORDER BY a.event_type
    """,
)
def a8_sk_salted_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 + skew mitigation: batch counters via an explicitly salted plan.

    Semantics (A8): inserted/updated/processed counters accumulated across
    the ingest loop and merged into the cursor row
    (``app/sync_top.py:136-143,267-273``) — set-oriented, one aggregate
    over the batch, ``value`` summed through DECIMAL so it is exact and
    shuffle-order-independent.

    Physical shape (the 100 TB posture): ``event_type`` has a handful of
    values over millions of events — a direct groupBy sends each whole
    key to ONE reducer. The salted plan shuffles on ``(event_type,
    salt)`` (16-way spread of every hot key), combines partials, then
    merges the 16 sub-aggregates in a second, trivially small Exchange.
    ``n_users`` shows the companion rewrite for COUNT(DISTINCT) under
    skew: de-dup on the full pair first, count second. Results are
    exactly the plain GROUP BY (the oracle) — only the distribution
    differs. (AQE skew-join handles *join* skew automatically; aggregate
    hot keys still need this explicit two-level shape.)
    """
    ev = table(spark, sf_dir, "events")
    salted = ev.withColumn("salt", F.pmod(F.col("user_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.when(F.col("value") > 50.0, 1).otherwise(0)).alias("pins"),
        F.sum(
            F.when((F.col("value") <= 50.0) | F.col("value").isNull(), 1).otherwise(0)
        ).alias("pupd"),
        F.max("ts").alias("pts"),
        F.sum(nan_to_null(F.col("value")).cast("decimal(18,6)")).alias("psum"),
    )
    agg = partial.groupBy("event_type").agg(
        F.sum("pn").alias("processed"),
        F.sum("pins").alias("inserted"),
        F.sum("pupd").alias("updated"),
        F.max("pts").alias("cursor_ts"),
        F.sum("psum").cast("double").alias("total_value"),
    )
    users = (
        ev.select("event_type", "user_id").distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return agg.join(users, "event_type").orderBy("event_type")


@register(
    "a6_a7_p11_recent_counts",
    oracle="""
    WITH anchor AS (SELECT MAX(ts) AS now_ts FROM events)
    SELECT COUNT(*) AS total,
           CAST(SUM(CASE WHEN ts >= now_ts - INTERVAL 1 HOUR THEN 1 ELSE 0 END) AS BIGINT) AS last_hour,
           CAST(SUM(CASE WHEN ts >= now_ts - INTERVAL 24 HOUR THEN 1 ELSE 0 END) AS BIGINT) AS last_day,
           CAST(SUM(CASE WHEN event_type = 'error' AND ts >= now_ts - INTERVAL 24 HOUR THEN 1 ELSE 0 END) AS BIGINT) AS errors_last_day
    FROM events, anchor
    """,
)
def a6_a7_p11_recent_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6+A7+P11+F6: timestamp-window counts anchored to max(ts).

    Reference: error-dashboard counts over the last hour / 24 h
    (``app/main.py:73-75,121-127``). "now" is anchored in-data
    (max(ts)) for determinism — no wall clock (FIXTURES.md invariant 3).
    Interval arithmetic = F6. The anchor is a scalar broadcast (tiny
    cross join), not a driver round-trip embedded in the plan as a literal
    — the whole thing stays one job.
    """
    ev = table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("now_ts"))
    return (
        ev.crossJoin(F.broadcast(anchor))
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.when(F.col("ts") >= F.col("now_ts") - F.expr("INTERVAL 1 HOUR"), 1).otherwise(0)).alias("last_hour"),
            F.sum(F.when(F.col("ts") >= F.col("now_ts") - F.expr("INTERVAL 24 HOUR"), 1).otherwise(0)).alias("last_day"),
            F.sum(
                F.when(
                    (F.col("event_type") == "error")
                    & (F.col("ts") >= F.col("now_ts") - F.expr("INTERVAL 24 HOUR")),
                    1,
                ).otherwise(0)
            ).alias("errors_last_day"),
        )
    )


@register_retired(
    # Rotated to the local-parity window in round 10 to free the driver
    # slot for wn_verify_spans (the r9 verdict's top item): exact
    # percentiles are a single well-understood aggregate whose semantics
    # this oracle pins identically from tests/test_oracle_parity.py.
    "a9_percentiles",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           quantile_cont(l_extendedprice, 0.5) AS p50,
           quantile_cont(l_extendedprice, 0.95) AS p95,
           quantile_cont(l_extendedprice, 0.99) AS p99,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def a9_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distribution statistics per group (beyond the reference).

    ``percentile`` (exact, linear interpolation — identical to DuckDB's
    ``quantile_cont``) over the price distribution. Exact percentile
    requires a per-group sort, so this is the one aggregate whose *scale
    path* differs: at 100 TB you'd switch to ``approx_percentile``
    (t-digest sketch, mergeable map-side) and accept bounded error —
    kept exact here so the oracle can value-match bit-for-bit.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("percentile(l_extendedprice, 0.5D)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.95D)").alias("p95"),
            F.expr("percentile(l_extendedprice, 0.99D)").alias("p99"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
        .orderBy("l_returnflag")
    )


