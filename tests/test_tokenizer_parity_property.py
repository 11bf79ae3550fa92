"""Generator-driven cross-engine tokenizer parity.

The hostile-text corpus pins twenty hand-picked traps; this module lets
hypothesis explore arbitrary Unicode (minus lone surrogates, which are
not encodable) through the SAME expressions both engines use for
``tx_text_features``: whitespace tokenization over the explicit
``WS_CHARS`` class, token count, token character sum, punct count, and
the BPE-ish regex token count. Java regex operates over UTF-16 with its
own class definitions; RE2 over code points — any class/semantics
disagreement beyond the already-fixed ``\\s`` shows up here as a
per-document count mismatch long before it corrupts a corpus run.
"""

from __future__ import annotations

import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as hs

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tmdb_sync_spark.functions.text import (  # noqa: E402
    BPE_PATTERN,
    WS_SQL,
    tokens_expr,
    trim_sql,
)

_T = trim_sql("text")

# UTF-8-encodable unicode text: exclude the surrogate category (Cs)
texts = hs.lists(
    hs.text(
        alphabet=hs.characters(blacklist_categories=("Cs",)),
        max_size=40,
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=texts)
def test_token_counts_agree_across_engines(spark, docs):
    import duckdb
    import pandas as pd

    from pyspark.sql import functions as F

    pdf = pd.DataFrame(
        {"doc_id": range(len(docs)), "text": docs}
    )
    sdf = spark.createDataFrame(pdf.astype({"text": "str"}))
    t = tokens_expr(F.col("text"))
    got = (
        sdf.select(
            "doc_id",
            F.size(t).alias("n_tokens"),
            F.aggregate(
                F.transform(t, lambda x: F.length(x)),
                F.lit(0), lambda a, b: a + b,
            ).alias("token_chars"),
            (F.length("text") - F.length(
                F.regexp_replace("text", r"[^A-Za-z0-9 \t\n\r\f\x0B]", "")
            )).alias("n_punct"),
            F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0))
            .alias("n_bpe"),
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.execute(f"""
        SELECT doc_id,
               len(regexp_split_to_array({_T}, '[{WS_SQL}]+'))
                   AS n_tokens,
               list_aggregate(list_transform(
                   regexp_split_to_array({_T}, '[{WS_SQL}]+'),
                   x -> length(x)), 'sum') AS token_chars,
               length(text) - length(regexp_replace(
                   text, '[^A-Za-z0-9{WS_SQL}]', '', 'g')) AS n_punct,
               len(regexp_extract_all(
                   text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9{WS_SQL}]')) AS n_bpe
        FROM docs ORDER BY doc_id
    """).df()
    con.close()
    for col in ("n_tokens", "token_chars", "n_punct", "n_bpe"):
        a = [None if v != v else int(v) for v in got[col]]
        b = [None if v != v else int(v) for v in want[col]]
        assert a == b, (
            f"{col} diverges: spark={a} duckdb={b} on docs={docs!r}"
        )


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=texts)
def test_quality_score_agrees_across_engines(spark, docs):
    """The quality heuristic's CROSS-ENGINE contract under generated
    Unicode: the score is three exact double literals gated by integer
    comparisons and ONE ratio boundary (stop_ratio ∈ [0.05, 0.6], a
    single IEEE division of exact ints in both engines) — any class
    drift in the tokenizer, the stopword fold, or the punct class moves
    a gate and the scores split. Complements the count-parity property
    above by exercising the boundary LOGIC, not just the counts."""
    import duckdb
    import pandas as pd

    from pyspark.sql import functions as F

    from tmdb_sync_spark.functions.text import (
        QUALITY_SQL,
        quality_score_expr,
        tokens_expr,
    )

    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    sdf = spark.createDataFrame(pdf.astype({"text": "str"}))
    t = tokens_expr(F.col("text"))
    got = (
        sdf.select("doc_id", "text", t.alias("_toks"))
        .select(
            "doc_id",
            quality_score_expr(F.col("text"), tokens=F.col("_toks"))
            .alias("q"),
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.execute(
        f"SELECT doc_id, {QUALITY_SQL} AS q FROM docs ORDER BY doc_id"
    ).df()
    con.close()
    a = [None if v != v else float(v) for v in got["q"]]
    b = [None if v != v else float(v) for v in want["q"]]
    assert a == b, f"quality diverges: spark={a} duckdb={b} on {docs!r}"
