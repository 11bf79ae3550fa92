"""Cross-engine parity on HOSTILE embeddings (the vector twin of
test_hostile_text).

Without the validity contract the engines diverge SILENTLY on malformed
vectors (all found live by this probe): Spark's ``floor`` clamps
Infinity to Long.MAX — the norm multiply then overflows — and floors
NaN to 0 (silently wrong); DuckDB's BIGINT cast errors on both. Spark's
fold-based norm propagates a NULL component to a NULL norm while
DuckDB's ``list_aggregate('sum')`` skips NULLs. A wrong-length vector
sums every component in Spark but only the first DIM in DuckDB.

The contract (``similarity._VALID_SQL`` / ``_valid_expr``): a vector
participates in the similarity operators iff it is non-NULL, exactly
DIM components, all finite and non-NULL — enforced INSIDE the
quantization CaseWhen (a bare pre-filter is not enough: Catalyst can
reorder a pushed-down ``nrm > 0`` ahead of it and run the arithmetic on
garbage). Huge-but-finite magnitudes keep the documented loud ANSI
overflow in both engines.
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

DIM = 64

EMB_QUERIES = [
    "knn_cosine_topk", "ann_signlsh_topk", "ann_ivf_topk",
    "dd_embedding_cosine", "dd_cluster_components",
]


def _unit(seed: int, scale: float = 0.1) -> list[float]:
    return [((seed * 31 + i * 7) % 13 - 6) * scale / 10 for i in range(DIM)]


@pytest.fixture(scope="module")
def hostile_emb_sf(spark, sf_dir) -> str:
    import duckdb

    d = tempfile.mkdtemp(prefix="sf_hostile_emb_")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents"]:
        shutil.copyfile(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    rows = [(i, _unit(i), i % 4) for i in range(40)]
    rows += [
        (100, [float("nan")] + _unit(1)[1:], 0),    # NaN component
        (101, [float("inf")] + _unit(2)[1:], 0),    # Infinity component
        (102, [None] + _unit(3)[1:], 0),            # NULL component
        (103, _unit(4)[:32], 0),                    # wrong length (short)
        (104, _unit(5) + _unit(6), 0),              # wrong length (long)
        (105, [0.0] * DIM, 0),                      # zero vector (nrm=0)
        (106, None, 0),                             # NULL embedding
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE e (vec_id BIGINT, embedding FLOAT[],"
                " label INTEGER)")
    con.executemany("INSERT INTO e VALUES (?,?,?)", rows)
    con.execute(f"COPY e TO '{d}/embeddings.parquet' (FORMAT PARQUET)")
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
        return str(v)

    return sorted(
        "|".join(cell(v) for v in r) for r in p.itertuples(index=False)
    )


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_embedding_query_parity_on_hostile_vectors(
    spark, hostile_emb_sf, name
):
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{hostile_emb_sf}/{t}.parquet')"
        )
    got = _canon(E.queries()[name](spark, hostile_emb_sf))
    want = _canon(con.execute(E.oracle_sql()[name]).df())
    con.close()
    assert got == want, f"{name} diverges on hostile vectors"
    # the malformed ids must not appear anywhere in any output id column
    bad = {"100.0", "101.0", "102.0", "103.0", "104.0", "106.0"}
    joined = "\n".join(got)
    for b in bad:
        assert f"|{b}|" not in f"|{joined}|", (
            f"malformed vector {b} leaked into {name} output"
        )
