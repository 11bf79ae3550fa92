"""Cross-engine parity on HOSTILE relational rows (orders / lineitem /
customer / part): NULL keys, NULL dates, NULL prices, negative amounts,
and Unicode case-folding traps (İ, ß) in the string columns the regex
and sort operators read.

Magnitude domain, probed and documented rather than papered over:

- A price that overflows DECIMAL(18,6) fails LOUDLY in BOTH engines
  (Spark NUMERIC_VALUE_OUT_OF_RANGE, DuckDB ConversionException) — the
  same both-loud contract as the embedding quantization magnitude
  (COVERAGE.md). Pinned by ``test_decimal_overflow_is_loud_in_both``.
- Once a money sum's scaled integer exceeds 2^53 (≈ 9e13 at scale 2),
  the final DECIMAL → DOUBLE cast can differ by 1 ulp between engines:
  Spark/Java round the exact decimal to the nearest double directly,
  DuckDB converts the int128 to double FIRST and then divides by the
  scale (double rounding) — reproduced exactly offline with
  1000000058460897.56 → .5 (correct) vs .6 (double-rounded). The
  decimal arithmetic itself is exact in both engines at any magnitude;
  only the display cast diverges. Sums in this corpus stay below the
  boundary, where the cast is bit-exact.
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

REL_QUERIES = [
    "a1_sync_coverage", "a4_a5_report_stats", "a9_percentiles",
    "q1_sql_pricing_summary", "q3_top_orders_by_revenue",
    "q5_revenue_by_nation", "j1_merge_upsert", "j1_partitioned_merge",
    "j3_fill_missing_years", "o1_o2_pagination_topk",
    "p1_p3_projection_conjunctive", "p7_date_string_range",
    "p9_regex_or_search", "p12_prefix_filter", "f_scalar_suite",
    "w1_argmax_exclusion", "w2_w3_dedup_variants",
]


@pytest.fixture(scope="module")
def hostile_rel_sf(spark, sf_dir) -> str:
    import duckdb

    d = tempfile.mkdtemp(prefix="sf_hostile_rel_")
    for t in ["region", "nation", "supplier", "events", "documents",
              "embeddings"]:
        shutil.copyfile(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE TABLE o AS SELECT * FROM "
                f"read_parquet('{sf_dir}/orders.parquet')")
    con.execute("""INSERT INTO o VALUES
     (9900001, 1, NULL, 100.0, TIMESTAMP '1996-06-01', '1-URGENT'),
     (9900002, NULL, 'O', 200.0, TIMESTAMP '1996-06-02', NULL),
     (9900003, 2, 'F', NULL, TIMESTAMP '1996-06-03', '5-LOW'),
     (9900004, 3, 'O', 123.45, NULL, '2-HIGH'),
     (9900005, 4, 'O', -5000.0, TIMESTAMP '1996-06-04', '3-MEDIUM')
    """)
    con.execute(f"COPY o TO '{d}/orders.parquet' (FORMAT PARQUET)")
    con.execute(f"CREATE TABLE li AS SELECT * FROM "
                f"read_parquet('{sf_dir}/lineitem.parquet')")
    con.execute("""INSERT INTO li VALUES
     (9900001, 1, 1, 1, NULL, 100.0, 0.05, 0.02, 'N', 'O',
      TIMESTAMP '1996-06-10'),
     (9900001, 2, 1, 2, 5.0, NULL, NULL, NULL, NULL, NULL, NULL),
     (9900002, 3, 2, 1, -10.0, -100.0, 0.0, 0.0, 'R', 'F',
      TIMESTAMP '1996-06-11')
    """)
    con.execute(f"COPY li TO '{d}/lineitem.parquet' (FORMAT PARQUET)")
    con.execute(f"CREATE TABLE c AS SELECT * FROM "
                f"read_parquet('{sf_dir}/customer.parquet')")
    con.execute("""INSERT INTO c VALUES
     (9900001, 'İstanbul ß Customer', 1, -999.99, 'BUILDING'),
     (9900002, NULL, NULL, NULL, NULL),
     (9900003, 'Ünïcödé 電影 client', 2, 0.0, 'AUTOMOBILE')
    """)
    con.execute(f"COPY c TO '{d}/customer.parquet' (FORMAT PARQUET)")
    con.execute(f"CREATE TABLE p AS SELECT * FROM "
                f"read_parquet('{sf_dir}/part.parquet')")
    con.execute("""INSERT INTO p VALUES
     (9900001, 'İRONIC brass İtem', 'Brand#99', 'PROMO İSTANBUL CASE',
      1, 1.0),
     (9900002, NULL, NULL, NULL, NULL, NULL),
     (9900003, 'straße naïve blend', 'Brand#98', 'STANDARD ÜBER TIN',
      50, 2.0)
    """)
    con.execute(f"COPY p TO '{d}/part.parquet' (FORMAT PARQUET)")
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


def _oracle_con(d):
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{d}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", REL_QUERIES)
def test_relational_parity_on_hostile_rows(spark, hostile_rel_sf, name):
    con = _oracle_con(hostile_rel_sf)
    from tmdb_sync_spark.registry import RETIRED_ORACLES, RETIRED_QUERIES

    got = _canon(
        {**E.queries(), **RETIRED_QUERIES}[name](spark, hostile_rel_sf)
    )
    want = _canon(con.execute(
        {**E.oracle_sql(), **RETIRED_ORACLES}[name]).df())
    con.close()
    assert got == want, f"{name} diverges on hostile relational rows"


def test_decimal_overflow_is_loud_in_both(spark, hostile_rel_sf):
    """A price whose discounted sum overflows DECIMAL(18,6) must fail
    LOUDLY in BOTH engines — never a silent NULL/clamp in one of them
    (the magnitude contract; same rule as the embedding quantization)."""
    import duckdb

    d = tempfile.mkdtemp(prefix="sf_overflow_")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "events", "documents", "embeddings"]:
        shutil.copyfile(
            f"{hostile_rel_sf}/{t}.parquet", f"{d}/{t}.parquet"
        )
    con = duckdb.connect()
    con.execute(f"CREATE TABLE li AS SELECT * FROM "
                f"read_parquet('{hostile_rel_sf}/lineitem.parquet')")
    con.execute("""INSERT INTO li VALUES
     (9900003, 4, 2, 1, 2.0, 1e14, 0.5, 0.07, 'A', 'F',
      TIMESTAMP '1996-06-12')
    """)
    con.execute(f"COPY li TO '{d}/lineitem.parquet' (FORMAT PARQUET)")
    with pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE"):
        E.queries()["q1_sql_pricing_summary"](spark, d).collect()
    con2 = _oracle_con(d)
    with pytest.raises(duckdb.ConversionException):
        con2.execute(E.oracle_sql()["q1_sql_pricing_summary"]).df()
    con.close()
    con2.close()


def test_try_to_int_equivalent_to_try_cast(spark):
    """try_to_int's regex guard must accept EXACTLY the strings ANSI
    string->int can parse — any divergence silently changes the F1
    non-numeric taxonomy. Hostile domain: control-char trim (cast trims
    chars <= 0x20, regex \\s would not), overflow digits, decimals,
    non-ASCII digits, malformed signs, empty, NULL."""
    from pyspark.sql import functions as F

    from tmdb_sync_spark.operators.scalars import try_to_int

    rows = [("12",), ("+7",), ("-0",), ("  33  ",), ("\x0199\x01",),
            ("\x09-4\x0b",), ("1.5",), ("A",), ("",), (None,),
            ("99999999999999",), ("٣٤",), (" +1",), ("+-1",),
            ("0x10",), ("2147483647",), ("2147483648",), ("- 5",),
            # DEL (0x7f) IS in the cast's trim set (r10 advice); C1
            # controls and Unicode whitespace are NOT (BMP sweep).
            ("\x7f12",), ("12\x7f",), ("\x7f\x7f-8\x20\x7f",),
            ("\x8512",), ("12",), (" 12",), (" 12",)]
    df = spark.createDataFrame(rows, "s string")
    bad = df.select(
        "s",
        try_to_int(F.col("s")).alias("fast"),
        F.expr("try_cast(s AS INT)").alias("ref"),
    ).where(~F.col("fast").eqNullSafe(F.col("ref"))).collect()
    assert bad == []
