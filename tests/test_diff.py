"""Corpus diff (functions/diff.py): DuckDB frame parity over a
version pair derived from the real documents table, NULL-content
semantics, plan shape (fingerprints through the shuffle, never text),
and the summary's self-checkable totals."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tmdb_sync_spark.functions.diff import diff_corpora, diff_summary
from tmdb_sync_spark.io import table

from tests.test_oracle_parity import canon


@pytest.fixture(scope="module")
def versions(spark, sf_dir):
    """v1 = docs minus (doc_id % 7 == 0); v2 = docs minus
    (doc_id % 5 == 0), with (doc_id % 3 == 0) texts edited — a diff
    with all four statuses populated, derived deterministically from
    the driver corpus so DuckDB can mirror it exactly."""
    docs = table(spark, sf_dir, "documents")
    v1 = docs.where(F.col("doc_id") % 7 != 0)
    v2 = docs.where(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return v1, v2


def _duck(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    con.execute("""
        CREATE VIEW v1 AS SELECT * FROM documents WHERE doc_id % 7 <> 0
    """)
    con.execute("""
        CREATE VIEW v2 AS
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END
                   AS text,
               lang, source, n_chars
        FROM documents WHERE doc_id % 5 <> 0
    """)
    return con.execute(sql).df()


def test_detail_parity_with_duckdb(spark, sf_dir, versions):
    v1, v2 = versions
    got = canon(diff_corpora(v1, v2).toPandas())
    want = canon(_duck(sf_dir, """
        SELECT COALESCE(n.doc_id, o.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN md5(o.text) IS NOT DISTINCT FROM md5(n.text)
                         THEN 'unchanged'
                    ELSE 'changed' END AS status,
               COALESCE(n.source, o.source) AS source
        FROM v1 o FULL OUTER JOIN v2 n ON o.doc_id = n.doc_id
    """))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want)


def test_summary_totals_check_out(spark, versions):
    v1, v2 = versions
    s = diff_summary(diff_corpora(v1, v2), dims=()).collect()[0]
    assert s["n_old"] == v1.count()
    assert s["n_new"] == v2.count()
    assert s["n_added"] == v2.join(v1, "doc_id", "left_anti").count()
    assert s["n_removed"] == v1.join(v2, "doc_id", "left_anti").count()
    assert s["n_changed"] > 0 and s["n_unchanged"] > 0
    assert (
        s["n_added"] + s["n_changed"] + s["n_unchanged"] == s["n_new"]
    )


def test_null_content_semantics(spark):
    old = spark.createDataFrame(
        [(1, None, "a"), (2, None, "a"), (3, "x", "a")],
        "doc_id long, text string, source string",
    )
    new = spark.createDataFrame(
        [(1, None, "a"), (2, "now", "a"), (3, None, "a")],
        "doc_id long, text string, source string",
    )
    got = {
        r["doc_id"]: r["status"]
        for r in diff_corpora(old, new).collect()
    }
    assert got == {1: "unchanged", 2: "changed", 3: "changed"}


def test_shuffle_moves_fingerprints_not_text(spark, versions):
    """The exchanges feeding the full-outer join carry md5 + dims, not
    document bodies — text is hashed BELOW the exchange."""
    v1, v2 = versions
    plan = (
        diff_corpora(v1, v2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    for m in re.finditer(r"Exchange hashpartitioning[^\n]*", plan):
        assert "text#" not in m.group(0)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_validation(spark, versions):
    v1, v2 = versions
    with pytest.raises(ValueError, match="no 'nope'"):
        diff_corpora(v1.drop("source"), v2, dims=("nope",))


def test_duplicate_or_null_keys_fail_loudly(spark):
    """r9 hostile pass: a duplicated (or NULL) key fans the full-outer
    join out — every old×new pairing of the key becomes a detail row —
    and the summary silently stops counting documents. The in-plan
    guard (merge's assert_true idiom) fails the job instead, naming
    the offending side."""
    from pyspark.errors import SparkRuntimeException

    ok = spark.createDataFrame(
        [(1, "x", "a")], "doc_id long, text string, source string"
    )
    dup = spark.createDataFrame(
        [(1, "x", "a"), (1, "y", "a"), (2, "z", "a")],
        "doc_id long, text string, source string",
    )
    nullk = spark.createDataFrame(
        [(None, "x", "a"), (2, "z", "a")],
        "doc_id long, text string, source string",
    )
    with pytest.raises(SparkRuntimeException, match="old version has"):
        diff_corpora(dup, ok).count()
    with pytest.raises(SparkRuntimeException, match="new version has"):
        diff_corpora(ok, dup).count()
    with pytest.raises(SparkRuntimeException, match="NULL 'doc_id'"):
        diff_corpora(nullk, ok).count()
    # the documented opt-out reproduces the raw-join fanout: 1 old key
    # colliding with 2 new rows → 2 detail rows for that key
    got = diff_corpora(ok, dup, check_keys=False)
    assert got.where(F.col("doc_id") == 1).count() == 2


def test_key_guard_adds_no_exchange(spark, versions):
    """The guard's count window partitions by the join key, so the
    physical plan still has exactly one exchange per side — the guard
    is structurally free at 100 TB."""
    v1, v2 = versions
    for check in (True, False):
        plan = (
            diff_corpora(v1, v2, check_keys=check)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange hashpartitioning") == 2, plan
