"""Cross-engine parity on HOSTILE events (the time/measure twin of the
hostile text and embeddings probes).

What this corpus flushed out (all found live, all now contracts):

- **NaN measures**: Spark's ANSI ``cast(NaN AS DECIMAL)`` yields NULL —
  a sum quietly skips the row — while DuckDB raises on the same cast,
  and DuckDB's MAX treats NaN as greater-than-everything where the
  stateful kernel's pandas max skips it. Convention
  (``operators.scalars.NAN_VALUE_SQL``): NaN behaves as NULL — counts
  toward COUNT(*), never contributes to SUM/MAX/MIN — spelled
  explicitly in BOTH engines.
- **NULL event times**: event-time windows require an event time;
  Structured Streaming drops NULL-ts rows before windowing, so the
  batch oracles mirror ``WHERE ts IS NOT NULL`` instead of emitting a
  NULL-window group.
- **Pre-epoch event times**: Structured Streaming's initial watermark
  is the epoch, and the session-window merge drops events whose session
  end precedes it (late-on-arrival) — while tumbling/sliding in
  complete mode do no late filtering and keep them. The session oracle
  mirrors the drop; post-epoch timestamps are the documented domain.
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402

EV_QUERIES = [
    "st_tumbling_window", "st_sliding_window", "st_session_window",
    "st_stateful_user_agg", "a8_sk_salted_counters",
    "a6_a7_p11_recent_counts", "a9_percentiles",
    "st_dedup_within_watermark",
]


@pytest.fixture(scope="module")
def hostile_ev_sf(spark, sf_dir) -> str:
    import duckdb

    d = tempfile.mkdtemp(prefix="sf_hostile_ev_")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"]:
        shutil.copyfile(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE ev AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    con.execute("""
    INSERT INTO ev VALUES
     (900001, NULL,                                5, 'click',  1.0, '{}'),
     (900002, TIMESTAMP '2024-01-01 01:00:00', NULL, 'click',  2.0, '{}'),
     (900003, TIMESTAMP '2024-01-01 01:01:00',    6, NULL,     3.0, '{}'),
     (900004, TIMESTAMP '2024-01-01 01:02:00',    7, 'click', NULL, '{}'),
     (900005, TIMESTAMP '1900-01-01 00:00:00',    8, 'click',  4.0, '{}'),
     (900006, TIMESTAMP '2200-01-01 00:00:00',    9, 'click',  5.0, '{}'),
     (900007, TIMESTAMP '2024-01-01 01:03:00',   10, 'click',
      'nan'::DOUBLE, '{}'),
     (0, TIMESTAMP '2024-01-01 00:09:58.778549', 13, 'error', 185.22,
      '{"k": 87}')
    """)
    con.execute(f"COPY ev TO '{d}/events.parquet' (FORMAT PARQUET)")
    con.close()
    return d


def _canon(df) -> list[str]:
    import numpy as np
    import pandas as pd

    p = df if isinstance(df, pd.DataFrame) else df.toPandas()
    p = p.reindex(sorted(p.columns), axis=1)

    def cell(v):
        if v is None or v is pd.NaT:
            return "<NULL>"
        if isinstance(v, (bool, np.bool_)):
            return str(bool(v))
        if isinstance(v, (float, np.floating)):
            return "<NULL>" if math.isnan(v) else repr(float(v))
        if isinstance(v, (int, np.integer)):
            return repr(float(v))
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return str(v)

    return sorted(
        "|".join(cell(v) for v in r) for r in p.itertuples(index=False)
    )


@pytest.mark.parametrize("name", EV_QUERIES)
def test_event_query_parity_on_hostile_events(spark, hostile_ev_sf, name):
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{hostile_ev_sf}/{t}.parquet')"
        )
    # retired queries keep this hostile bar too (the r8 rotation rule,
    # tests/test_hostile_text.py): look them up past the driver window
    from tmdb_sync_spark.registry import RETIRED_ORACLES, RETIRED_QUERIES

    queries = {**E.queries(), **RETIRED_QUERIES}
    oracles = {**E.oracle_sql(), **RETIRED_ORACLES}
    got = _canon(queries[name](spark, hostile_ev_sf))
    want = _canon(con.execute(oracles[name]).df())
    con.close()
    assert got == want, f"{name} diverges on hostile events"
