"""corpus_report contracts: every approximate column checked against the
EXACT answer (computed by Spark + cross-checked in DuckDB) within the
published bound; rollup-level consistency; grouping_id disambiguation;
single-scan plan shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tmdb_sync_spark.functions.stats import corpus_report
from tmdb_sync_spark.io import table


@pytest.fixture(scope="module")
def report(spark, sf_dir):
    return {
        (r["source"], r["lang"], r["grouping_id"]): r
        for r in corpus_report(
            table(spark, sf_dir, "documents"), ("source", "lang")
        ).collect()
    }


def _exact(sf_dir):
    con = duckdb.connect()
    return con.execute(f"""
        SELECT source, lang, count(*) AS n,
               count(DISTINCT doc_id) AS nd,
               sum(n_chars) AS total, max(n_chars) AS mx
        FROM read_parquet('{sf_dir}/documents.parquet')
        GROUP BY ROLLUP(source, lang)
    """).df()


def test_counts_and_mass_exact(report, sf_dir):
    """count/sum/max are algebraic, not sketches — exact vs DuckDB at
    every rollup level."""
    want = _exact(sf_dir)
    assert len(report) == len(want)
    for _, w in want.iterrows():
        src = None if w["source"] != w["source"] or w["source"] is None else w["source"]
        lng = None if w["lang"] != w["lang"] or w["lang"] is None else w["lang"]
        gid = (1 if lng is None else 0) + (2 if src is None else 0)
        r = report[(src, lng, gid)]
        assert r["n_docs"] == int(w["n"])
        assert r["total_size"] == int(w["total"])
        assert r["max_size"] == int(w["mx"])


def test_hll_within_bound(report):
    """HLL++ distinct within bound of exact (doc_id unique ⇒ exact
    distinct = n_docs) at EVERY level, including the grand total. The
    rsd contract is asymptotic — tiny slices (a handful of docs) see
    off-by-a-few register noise — so the bound is 5·rsd relative OR a
    small absolute slack, whichever is larger."""
    for r in report.values():
        err = abs(r["n_distinct_keys_approx"] - r["n_docs"])
        assert err <= max(4, 5 * 0.02 * r["n_docs"]), (
            r["source"], r["lang"], err, r["n_docs"]
        )


def test_quantiles_within_rank_bound(spark, sf_dir, report):
    """percentile_approx rank error ≤ n/accuracy — check the grand-total
    row's quantiles against the exact sorted sizes."""
    sizes = sorted(
        r["n_chars"]
        for r in table(spark, sf_dir, "documents")
        .select("n_chars").where(F.col("n_chars").isNotNull()).collect()
    )
    n = len(sizes)
    total = report[(None, None, 3)]
    for q, v in zip((0.5, 0.9, 0.99), total["size_q"]):
        # the returned value must be a corpus value whose rank is within
        # the bound of the target rank
        lo = max(0, int(q * n) - max(1, n // 10_000) - 1)
        hi = min(n - 1, int(q * n) + max(1, n // 10_000) + 1)
        assert sizes[lo] <= v <= sizes[hi], (q, v, sizes[lo], sizes[hi])


def test_grouping_id_disambiguates_null_dim(spark):
    """A document slice with a GENUINE NULL lang stays distinguishable
    from the rolled-up per-source row: same NULL in the dim column,
    different grouping_id."""
    df = spark.createDataFrame(
        [(1, "web", None, 10), (2, "web", None, 20), (3, "web", "en", 30)],
        "doc_id long, source string, lang string, n_chars long",
    )
    rows = {
        (r["source"], r["lang"], r["grouping_id"]): r["n_docs"]
        for r in corpus_report(df, ("source", "lang")).collect()
    }
    assert rows[("web", None, 0)] == 2   # genuine NULL-lang leaf
    assert rows[("web", None, 1)] == 3   # per-source rollup
    assert rows[(None, None, 3)] == 3    # grand total


def test_null_sizes_count_but_dont_mass(spark):
    df = spark.createDataFrame(
        [(1, "a", "en", None), (2, "a", "en", None)],
        "doc_id long, source string, lang string, n_chars long",
    )
    r = {
        r["grouping_id"]: r for r in corpus_report(df, ("source",)).collect()
    }[0]
    assert r["n_docs"] == 2 and r["total_size"] is None


def test_validation(spark):
    df = spark.createDataFrame(
        [(1, "a", "en", 5)], "doc_id long, source string, lang string, n_chars long"
    )
    with pytest.raises(ValueError):
        corpus_report(df, ())
    with pytest.raises(ValueError):
        corpus_report(df, ("nope",))
    with pytest.raises(ValueError):
        corpus_report(df, ("source",), rsd=0)
    with pytest.raises(ValueError):
        corpus_report(df, ("source",), quantiles=(1.5,))


def test_single_scan_partial_agg_plan(spark, sf_dir):
    """One scan, Expand for the rollup levels, and a PARTIAL aggregate
    below the exchange — the sketch-merge shape that keeps the shuffle
    O(groups)."""
    plan = corpus_report(
        table(spark, sf_dir, "documents"), ("source", "lang")
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") <= 1 or plan.count("Scan parquet") <= 1
    assert "Expand" in plan
    assert "partial" in plan.lower()
