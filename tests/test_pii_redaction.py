"""PII redaction expressions (functions/text.py): category coverage,
ordering, idempotency, false-positive guards, and the audit counts."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tmdb_sync_spark.functions.text import (
    pii_counts_expr,
    redact_pii_expr,
)


def _redact(spark, text: str) -> str:
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(redact_pii_expr(F.col("text")).alias("r"))
        .collect()[0]["r"]
    )


def _counts(spark, text: str):
    r = (
        spark.createDataFrame([(text,)], "text string")
        .select(pii_counts_expr(F.col("text")).alias("c"))
        .collect()[0]["c"]
    )
    return (r["emails"], r["ips"], r["phones"])


CASES = [
    # emails
    ("mail me at jane.doe+spam@sub.example.co today",
     "mail me at [EMAIL] today"),
    # ipv4, word-bounded
    ("server 192.168.001.1 and 10.0.0.255 up",
     "server [IP] and [IP] up"),
    # phones: international, separators, parens
    ("call +49 (030) 123-45678 now", "call [PHONE] now"),
    ("call 0301234567 now", "call [PHONE] now"),
    # NOT a phone: too few digits through separators
    ("rooms 12 34-5 6 78 listed", "rooms 12 34-5 6 78 listed"),
    # NOT a phone: version-ish / decimal tails stay
    ("pi is 3.141592653589793 exactly", "pi is 3.141592653589793 exactly"),
    # NOT redacted: long hex id (letters break the digit run)
    ("commit 54cedf91a23b45c67d89e01f stays",
     "commit 54cedf91a23b45c67d89e01f stays"),
    # email local part with digits doesn't leak a phone match
    ("a123456789@example.com wrote", "[EMAIL] wrote"),
    # dotted quad is IP, not phone
    ("8.8.8.8", "[IP]"),
    # mixed, all three
    ("jane@x.io / 10.1.2.3 / +1 555 123 4567",
     "[EMAIL] / [IP] / [PHONE]"),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_redaction_cases(spark, raw, expected):
    assert _redact(spark, raw) == expected


def test_redaction_idempotent(spark):
    raw = "jane@x.io / 10.1.2.3 / +1 555 123 4567 and text"
    once = _redact(spark, raw)
    assert _redact(spark, once) == once


def test_counts_match_redactions(spark):
    raw = "a@b.co c@d.org 10.0.0.1 +1 555 123 4567 plain"
    assert _counts(spark, raw) == (2, 1, 1)
    assert _counts(spark, "nothing here") == (0, 0, 0)


def test_scrub_composes_with_corpus(spark, sf_dir):
    """The scrub is a pure projection over the documents table — no
    shuffle, and clean documents come through unchanged."""
    from tmdb_sync_spark.io import table

    docs = table(spark, sf_dir, "documents")
    out = docs.select(
        "doc_id",
        redact_pii_expr(F.col("text")).alias("text"),
        pii_counts_expr(F.col("text")).alias("pii"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # the synthetic corpus contains no PII; the scrub must be a no-op
    changed = (
        out.join(docs.withColumnRenamed("text", "orig"), "doc_id")
        .where(F.col("text") != F.col("orig"))
    )
    assert changed.count() == 0
