"""Unicode normalization — the corpus-prep step HASH-BASED dedup
correctness quietly depends on.

"é" as U+00E9 and "é" as U+0065 U+0301 are the same text to a reader
and DIFFERENT byte strings to every operator downstream: md5 exact
dedup misses the pair, shingle minhash sees disjoint shingles, band
keys diverge, the signature index never matches — the near-dup stack
is only as canonical as its input bytes. Real pretraining pipelines
normalize once at ingest; this module is that operator.

Spark has no built-in Unicode normalizer (Catalyst strings are opaque
UTF-8), so this is one of the engine's few sanctioned Python
boundaries: an Arrow-batched ``pandas_udf`` over ``unicodedata`` —
vectorized batch transfer, per-batch Python cost, never per-row py4j
(the same budget class as the media decode and the source parse;
U1-U4 posture unchanged). The DuckDB oracle twin is ``nfc_normalize``
for the NFC form — both sides implement the same Unicode standard, so
parity is testable byte-for-byte (tests/test_normalize.py runs the
hostile-unicode corpus through both).

Contract notes:
- NULL → NULL; normalization is idempotent (pinned).
- ``form``: NFC (default — canonical composition, the dedup choice),
  NFD, NFKC, NFKD. NFKC/NFKD are LOSSY by design (ligatures, width,
  compatibility forms fold) — the right choice for matching, the
  wrong one for provenance-preserving storage; the docstring states
  it so the caller chooses deliberately.
- Scale shape: pure per-row map, no shuffle, composes onto the scan;
  at 100 TB it rides the same Arrow batches the ingest parse already
  pays for.

Composition: ``normalize_text(docs)`` before any hash-based operator
(dd_exact, minhash_signature, the band index) makes canonically-equal
texts byte-equal — pinned end-to-end in the tests (the combining-é
pair becomes an exact-dup group).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def _normalizer(form: str):
    if form not in _FORMS:
        raise ValueError(
            f"normalize_text: form {form!r} not in {_FORMS}"
        )

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: None if x is None
            else unicodedata.normalize(form, x)
        )

    return _norm


def normalize_expr(col: Column, form: str = "NFC") -> Column:
    """Column expression: Unicode-normalize ``col`` to ``form``
    (Arrow-batched pandas_udf — see module docstring)."""
    return _normalizer(form)(col)


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    *,
    form: str = "NFC",
    out_col: str | None = None,
) -> DataFrame:
    """``df`` with ``text_col`` Unicode-normalized in place (or into
    ``out_col`` when provenance must keep the original bytes)."""
    if text_col not in df.columns:
        raise ValueError(f"normalize_text: no {text_col!r} column")
    # Fail at plan time, not deep inside an executor's Arrow batch: a
    # non-string column reaches unicodedata.normalize as int/bytes and
    # dies there with an opaque per-task TypeError (r9 hostile pass).
    dt = df.schema[text_col].dataType.simpleString()
    if dt != "string":
        raise ValueError(
            f"normalize_text: column {text_col!r} is {dt}, not string — "
            "cast (or decode) it first"
        )
    return df.withColumn(
        out_col or text_col, normalize_expr(F.col(text_col), form)
    )
