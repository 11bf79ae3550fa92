"""Degenerate-corpus sweep: every registered query against EMPTY tables.

At 100 TB an empty input is not exotic — a partition filtered to zero
rows, a fresh table before its first ingest, a dedup stage that dropped
everything. The driver's correctness gate only ever runs populated
corpora, so nothing upstream proves the 50 registered queries survive
the zero-row case. The contract this sweep pins:

- a query either RUNS (any row count, usually 0), or
- fails through a DOCUMENTED loud contract (today: ``ann_ivf_topk``
  raises ``ValueError`` — there is nothing to train a codebook on; the
  operator's docstring declares it).

Anything else — an ``IndexError`` off a driver-side ``collect()[0]``,
an analysis error from a NULL-typed aggregate, a hang — is a real bug
this test exists to catch before a user's empty partition does.
"""

from __future__ import annotations

import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402

from tmdb_sync_spark.io import table  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# name -> exception type: queries whose empty-corpus behavior is a
# documented loud error rather than an empty result
LOUD_CONTRACTS = {
    "ann_ivf_topk": ValueError,     # functions/similarity.py: no usable
                                    # vectors to train the IVF codebook on
    "audit_verdicts": ValueError,   # functions/audit.py: an empty corpus
                                    # builds no indexes, and auditing
                                    # against nothing must raise, never
                                    # report a false all-clear
}


@pytest.fixture(scope="module")
def empty_sf(spark) -> str:
    """A sibling of the real testdata layout where every table has the
    real schema and zero rows. Built through ``io.table`` so the events
    timestamp normalization (NANOS vs MICROS footers) applies before the
    re-write, exactly as a query would see it."""
    d = tempfile.mkdtemp(prefix="sf_empty_")
    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    for t in TABLES:
        table(spark, src, t).limit(0).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"{t}.parquet"))
    return d


from tmdb_sync_spark.registry import RETIRED_QUERIES  # noqa: E402


@pytest.mark.parametrize(
    "name", sorted({**E.queries(), **RETIRED_QUERIES})
)
def test_query_survives_empty_tables(spark, empty_sf, name):
    fn = {**E.queries(), **RETIRED_QUERIES}[name]
    loud = LOUD_CONTRACTS.get(name)
    if loud is not None:
        with pytest.raises(loud):
            fn(spark, empty_sf).count()
        return
    n = fn(spark, empty_sf).count()
    assert n >= 0
