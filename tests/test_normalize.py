"""Unicode normalization (functions/normalize.py): cross-engine parity
with DuckDB's nfc_normalize on the hostile-unicode corpus, idempotence,
NULL/degenerate contracts, and the end-to-end reason the operator
exists — canonically-equal texts become byte-equal for hash dedup."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tmdb_sync_spark.functions.normalize import (
    normalize_expr,
    normalize_text,
)

from tests.test_hostile_text import HOSTILE_TEXTS

COMBINING = "combining é acute"
PRECOMPOSED = "combining é acute"


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_nfc_parity_with_duckdb(spark):
    texts = HOSTILE_TEXTS + [COMBINING, PRECOMPOSED, None]
    got = {
        r["doc_id"]: r["n"]
        for r in normalize_text(_df(spark, texts), out_col="n").collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute(
            "SELECT nfc_normalize(?)", [t]
        ).fetchone()[0] if t is not None else None
        assert got[i] == want, (i, t)


def test_idempotent_and_null(spark):
    texts = [COMBINING, None, "", "plain ascii"]
    once = normalize_text(_df(spark, texts))
    twice = normalize_text(once)
    assert [r["text"] for r in once.orderBy("doc_id").collect()] == [
        r["text"] for r in twice.orderBy("doc_id").collect()
    ]
    rows = {r["doc_id"]: r["text"] for r in once.collect()}
    assert rows[1] is None and rows[2] == ""


def test_forms_and_validation(spark):
    df = _df(spark, ["ﬁ ligature ４２ fullwidth"])
    nfkc = normalize_text(df, form="NFKC").collect()[0]["text"]
    assert nfkc == "fi ligature 42 fullwidth"     # lossy by design
    nfc = normalize_text(df, form="NFC").collect()[0]["text"]
    assert nfc == "ﬁ ligature ４２ fullwidth"     # NFC preserves them
    with pytest.raises(ValueError, match="not in"):
        normalize_text(df, form="NFX")
    with pytest.raises(ValueError, match="no 'nope'"):
        normalize_text(df, text_col="nope")
    # plan-time type check (r9 hostile pass): a non-string column would
    # otherwise die inside an executor's Arrow batch with an opaque
    # per-task TypeError from unicodedata
    ints = spark.range(3).toDF("text")
    with pytest.raises(ValueError, match="is bigint, not string"):
        normalize_text(ints)


def test_normalization_makes_hash_dedup_canonical(spark):
    """The operator's reason to exist: the combining/precomposed pair
    is INVISIBLE to md5 exact dedup raw, and an exact-dup group once
    normalized — end to end through the registered dd_exact shape."""
    df = _df(spark, [COMBINING, PRECOMPOSED])
    raw = df.select(F.md5(F.col("text").cast("binary")).alias("h"))
    assert raw.distinct().count() == 2            # missed raw
    norm = normalize_text(df).select(
        F.md5(F.col("text").cast("binary")).alias("h")
    )
    assert norm.distinct().count() == 1           # caught normalized

    # and through the minhash band index: raw signatures differ,
    # normalized signatures are identical
    from tmdb_sync_spark.functions.dedup import minhash_signature

    sig_raw = minhash_signature(df).drop("doc_id").distinct().count()
    sig_norm = (
        minhash_signature(normalize_text(df))
        .drop("doc_id").distinct().count()
    )
    assert sig_raw == 2 and sig_norm == 1


def test_plan_is_arrow_batched_not_row_udf(spark):
    """The one sanctioned Python boundary class: ArrowEvalPython in
    the plan (vectorized batches), never BatchEvalPython (per-row)."""
    plan = (
        normalize_text(_df(spark, ["x"]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
