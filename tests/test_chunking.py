"""Chunking contracts: DuckDB frame parity over the real documents
table (registered-surface bar, even though the operators live beyond
the 50-entry registry window) + Hypothesis properties on the
chunk-count/coverage/reconstruction contract."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tmdb_sync_spark.functions.chunking import (
    chunk_documents,
    chunk_documents_tokens,
)
from tmdb_sync_spark.io import table

from tests.test_oracle_parity import canon


def _duck_chars(sf_dir: str, w: int, ov: int) -> pd.DataFrame:
    s = w - ov
    return duckdb.connect().execute(f"""
        SELECT doc_id, CAST(i AS INT) AS chunk_index,
               CAST(i * {s} AS INT) AS chunk_start,
               substring(text, CAST(i * {s} AS INT) + 1, {w}) AS chunk_text
        FROM read_parquet('{sf_dir}/documents.parquet'),
             unnest(generate_series(0, CAST(ceil(
                 greatest(length(text) - {w}, 0) / {s}) AS BIGINT))) AS t(i)
        WHERE text IS NOT NULL
    """).df()


def _duck_tokens(sf_dir: str, w: int, ov: int) -> pd.DataFrame:
    # the tokenizer twin mirrors text.tokens_expr's EXPLICIT whitespace
    # class (WS_SQL) — never bare \s / trim(), whose definitions differ
    # across engines (the NBSP/\x0B hazards trim_ws documents)
    from tmdb_sync_spark.functions.text import WS_SQL, trim_sql

    s = w - ov
    return duckdb.connect().execute(f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(
                       {trim_sql('text')}, '[{WS_SQL}]+'),
                               x -> x <> '') AS tk
            FROM read_parquet('{sf_dir}/documents.parquet')
            WHERE text IS NOT NULL
        )
        SELECT doc_id, CAST(i AS INT) AS chunk_index,
               CAST(i * {s} AS INT) AS token_start,
               CAST(len(list_slice(tk, CAST(i * {s} AS INT) + 1,
                        CAST(i * {s} AS INT) + {w})) AS INT) AS n_tokens,
               array_to_string(list_slice(tk, CAST(i * {s} AS INT) + 1,
                        CAST(i * {s} AS INT) + {w}), ' ') AS chunk_text
        FROM toks,
             unnest(generate_series(0, CAST(ceil(
                 greatest(len(tk) - {w}, 0) / {s}) AS BIGINT))) AS t(i)
    """).df()


@pytest.mark.parametrize("w,ov", [(200, 0), (200, 50), (64, 63)])
def test_char_parity(spark, sf_dir, w, ov):
    got = canon(
        chunk_documents(table(spark, sf_dir, "documents"), w, ov)
        .withColumn("chunk_index", F.col("chunk_index").cast("int"))
        .withColumn("chunk_start", F.col("chunk_start").cast("int"))
        .toPandas()
    )
    want = canon(_duck_chars(sf_dir, w, ov))
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.parametrize("w,ov", [(30, 0), (30, 10)])
def test_token_parity(spark, sf_dir, w, ov):
    got = canon(
        chunk_documents_tokens(table(spark, sf_dir, "documents"), w, ov)
        .withColumn("chunk_index", F.col("chunk_index").cast("int"))
        .withColumn("token_start", F.col("token_start").cast("int"))
        .toPandas()
    )
    want = canon(_duck_tokens(sf_dir, w, ov))
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(got, want)


# --- properties -------------------------------------------------------

TEXTS = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
    ),
    min_size=1,
    max_size=8,
)


def _chunk_rows(spark, texts, w, ov, tokens=False):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    fn = chunk_documents_tokens if tokens else chunk_documents
    return fn(df, w, ov).orderBy("doc_id", "chunk_index").collect()


@settings(max_examples=20, deadline=None)
@given(texts=TEXTS, w=st.integers(1, 12), ov=st.integers(0, 11))
@pytest.mark.slow
def test_char_properties(spark, texts, w, ov):
    if ov >= w:
        with pytest.raises(ValueError):
            _chunk_rows(spark, texts, w, ov)
        return
    rows = _chunk_rows(spark, texts, w, ov)
    step = w - ov
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in enumerate(texts):
        rs = by_doc[i]
        # chunk-count contract
        want_n = 1 + max(0, -(-max(0, len(t) - w) // step))
        assert len(rs) == want_n
        assert [r.chunk_index for r in rs] == list(range(want_n))
        for r in rs:
            # exact offset contract
            assert r.chunk_start == r.chunk_index * step
            assert r.chunk_text == t[r.chunk_start:r.chunk_start + w]
        # reconstruction: strip each chunk's overlap prefix, concat
        assert t == rs[0].chunk_text + "".join(
            r.chunk_text[ov:] for r in rs[1:]
        )
        # only the final chunk may be short
        for r in rs[:-1]:
            assert len(r.chunk_text) == w


@settings(max_examples=15, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet=" \t\nab", max_size=60), min_size=1, max_size=6
    ),
    w=st.integers(1, 6),
    ov=st.integers(0, 5),
)
def test_token_properties(spark, texts, w, ov):
    if ov >= w:
        return
    rows = _chunk_rows(spark, texts, w, ov, tokens=True)
    step = w - ov
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in enumerate(texts):
        toks = t.split()
        rs = by_doc[i]
        want_n = 1 + max(0, -(-max(0, len(toks) - w) // step))
        assert len(rs) == want_n
        for r in rs:
            window = toks[r.token_start:r.token_start + w]
            assert r.chunk_text == " ".join(window)
            assert r.n_tokens == len(window)
        # token-level reconstruction
        got = list(rs[0].chunk_text.split())
        for r in rs[1:]:
            got += r.chunk_text.split()[ov:]
        assert got == toks


def test_null_text_yields_no_chunks(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "ab")], "doc_id long, text string"
    )
    assert [r.doc_id for r in chunk_documents(df, 5).collect()] == [2]
    assert [
        r.doc_id for r in chunk_documents_tokens(df, 5).collect()
    ] == [2]


def test_empty_text_identity_chunk(spark):
    df = spark.createDataFrame([(1, ""), (2, "  ")], "doc_id long, text string")
    rows = chunk_documents(df, 5).orderBy("doc_id").collect()
    assert [(r.doc_id, r.chunk_index, r.chunk_text) for r in rows] == [
        (1, 0, ""), (2, 0, "  ")
    ]
    trows = chunk_documents_tokens(df, 5).orderBy("doc_id").collect()
    assert [(r.doc_id, r.n_tokens, r.chunk_text) for r in trows] == [
        (1, 0, ""), (2, 0, "")
    ]


def test_parameter_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    for bad in ((0, 0), (5, 5), (5, -1), (-3, 0)):
        with pytest.raises(ValueError):
            chunk_documents(df, *bad)
        with pytest.raises(ValueError):
            chunk_documents_tokens(df, *bad)


def test_no_shuffle_in_plan(spark, sf_dir):
    """The chunker is a pure flatMap: no Exchange anywhere in the plan."""
    for fn in (chunk_documents, chunk_documents_tokens):
        plan = fn(
            table(spark, sf_dir, "documents"), 100, 20
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_char_parity_unicode(spark, tmp_path):
    """Cross-engine codepoint contract: Spark length/substr and DuckDB
    length/substring both count CODEPOINTS — including combining marks,
    ZWJ emoji sequences (each codepoint separate), and astral-plane
    chars (never split surrogate pairs). Probed, then pinned with frame
    parity on a hostile unicode corpus."""
    texts = [
        "héllo wörld héllo wörld",
        "日本語のテキストです。長い文書を分割します。",
        "emoji 👩‍👩‍👧‍👦 zwj sequence 👩‍👩‍👧‍👦 again",
        "é combining é combining é",
        "𝔪𝔞𝔱𝔥𝔢𝔪𝔞𝔱𝔦𝔠𝔰 𐍈 astral 𝔪𝔞𝔱𝔥",
    ]
    p = str(tmp_path / "uni.parquet")
    spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    ).write.parquet(p)
    got = canon(
        chunk_documents(spark.read.parquet(p), 7, 3)
        .withColumn("chunk_index", F.col("chunk_index").cast("int"))
        .withColumn("chunk_start", F.col("chunk_start").cast("int"))
        .toPandas()
    )
    want = canon(duckdb.connect().execute(f"""
        SELECT doc_id, CAST(i AS INT) AS chunk_index,
               CAST(i * 4 AS INT) AS chunk_start,
               substring(text, CAST(i * 4 AS INT) + 1, 7) AS chunk_text
        FROM read_parquet('{p}/*.parquet'),
             unnest(generate_series(0, CAST(ceil(
                 greatest(length(text) - 7, 0) / 4) AS BIGINT))) AS t(i)
        WHERE text IS NOT NULL
    """).df())
    assert len(got) == len(want) > len(texts)
    pd.testing.assert_frame_equal(got, want)
