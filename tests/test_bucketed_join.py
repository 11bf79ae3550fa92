"""Bucketed (co-located) join: both sides pre-bucketed on the join key →
the sort-merge join reads bucket-aligned scans with NO Exchange.

This is the 100 TB answer to the repeated orders⋈lineitem joins (SURVEY
§4): pay the shuffle once at layout time, never per query. The test
proves both the physical claim (no Exchange operator in the executed
plan) and result equality with the shuffled join.
"""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import functions as F

from tmdb_sync_spark.io import table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="bucketed_")
    names = {}
    for t, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        name = f"bt_{t}"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            table(spark, sf_dir, t)
            .write.bucketBy(8, key)
            .sortBy(key)
            .option("path", f"{d}/{t}")
            .saveAsTable(name)
        )
        names[t] = name
    yield names
    for name in names.values():
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed):
    o = spark.table(bucketed["orders"])
    li = spark.table(bucketed["lineitem"])
    # force the sort-merge path: at test SF the dimension fits a broadcast,
    # which would bypass the co-location being proven
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                 .cast("double").alias("rev"),
            )
        )
        joined.collect()   # finalize the adaptive plan before inspecting it
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SelectedBucketsCount: 8 out of 8" in plan
    assert "SortMergeJoin" in plan
    join_part = plan.split("SortMergeJoin")[-1]  # join subtree: its inputs
    assert "Exchange" not in join_part, (
        "bucketed join should not shuffle its inputs:\n" + join_part
    )

    # same result as the plain (shuffled) join
    o2 = table(spark, sf_dir, "orders")
    li2 = table(spark, sf_dir, "lineitem")
    expected = (
        o2.join(li2, o2.o_orderkey == li2.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
             .cast("double").alias("rev"),
        )
    )
    got = {r["o_orderpriority"]: (r["n"], r["rev"]) for r in joined.collect()}
    want = {r["o_orderpriority"]: (r["n"], r["rev"]) for r in expected.collect()}
    assert got == want
