"""Local replica of the driver's t2 gate: run every registered query on
Spark and its oracle SQL on DuckDB over the same parquet, compare
row-count + column names + order-insensitive canonicalized values.

Stricter than a hash: full frame diff, so mismatches are debuggable.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from tmdb_sync_spark.io import TABLES

DRIVER_QUERIES = entry_mod.queries()
DRIVER_ORACLES = entry_mod.oracle_sql()

# Rotated out of the 50-slot driver window (r8) but still implemented:
# retired queries run HERE at exactly the registered bar, so rotation
# never weakens coverage — it only reassigns the driver's slots.
from tmdb_sync_spark.registry import (  # noqa: E402
    RETIRED_ORACLES,
    RETIRED_QUERIES,
)

QUERIES = {**DRIVER_QUERIES, **RETIRED_QUERIES}
ORACLES = {**DRIVER_ORACLES, **RETIRED_ORACLES}


def duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _cell(v):
    import numpy as np

    if v is None or v is pd.NaT:
        return "<NULL>"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "<NULL>"
        return repr(float(v))
    if isinstance(v, (int, np.integer)):
        return repr(float(v)) if abs(int(v)) < 2**53 else str(int(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = pd.DataFrame({c: [ _cell(v) for v in df[c] ] for c in df.columns})
    if len(out):
        out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    # normalize numpy ints so _cell sees python scalars
    odf = duck(sf_dir).execute(ORACLES[name]).df()
    a, b = canon(sdf), canon(odf)
    assert list(a.columns) == list(b.columns), f"{name}: column names differ"
    assert len(a) == len(b), f"{name}: row count {len(a)} != {len(b)}"
    pd.testing.assert_frame_equal(a, b, obj=name)


def test_all_queries_have_entries():
    assert QUERIES, "registry is empty"
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


def test_registry_fits_driver_window():
    """The driver verifies only the FIRST 50 registry entries; an entry
    past position 50 silently gets no correctness row (round-1 verdict
    top finding). Adding a query therefore REQUIRES consolidating another
    — this guard turns a silent coverage loss into a test failure."""
    assert len(DRIVER_QUERIES) <= 50, (
        f"registry has {len(DRIVER_QUERIES)} entries; entries past 50 are "
        "never driver-verified — consolidate (or retire) before adding"
    )
    unpaired = set(QUERIES) - set(ORACLES)
    assert not unpaired, f"queries without oracle SQL (weaker check): {unpaired}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
