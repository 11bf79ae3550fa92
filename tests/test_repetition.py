"""Repetition quality signals (functions/text.py repetition_stats) —
hand-computed fixtures, degenerate inputs, and the scale-shape claim.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tmdb_sync_spark.functions.text import (
    max_char_run_expr,
    repetition_stats,
)


def _stats(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = repetition_stats(df, **kw)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_hand_computed_line_stats(spark):
    # doc 1: lines a,b,a,a,c → 5 occurrences, 3 distinct →
    #   dup_line_frac = 1 - 3/5 = 0.4
    #   chars: a(1)*3 + b(1) + c(1) = 5; duplicated-line chars = 3
    s = _stats(spark, [(1, "a\nb\na\na\nc")])
    d = s[1]
    assert d["n_lines"] == 5
    assert d["dup_line_frac"] == pytest.approx(0.4)
    assert d["dup_line_char_frac"] == pytest.approx(3 / 5)


def test_hand_computed_ngram_stats(spark):
    # "x y x y x y" → tokens 6; 2-grams: (x y)×3, (y x)×2 → top
    # 2-gram covers 3*2/6 = 1.0 → capped at 1.0
    s = _stats(spark, [(1, "x y x y x y")])
    assert s[1]["top_ngram_frac"] == pytest.approx(1.0)

    # "p q r p q s" → 2-grams: pq×2, qr, rp, qs → top = 2*2/6
    s = _stats(spark, [(2, "p q r p q s")])
    assert s[2]["top_ngram_frac"] == pytest.approx(4 / 6)

    # dup 5-grams: "a b c d e" ×3 = 15 tokens → 11 5-grams. The text
    # is PERIODIC, so every rotation repeats: 'a b c d e' ×3 (at 0, 5,
    # 10) and the four other rotations ×2 each → repeats =
    # (3-1) + 4·(2-1) = 6 → dup_frac = 6/11
    s = _stats(spark, [(3, " ".join(["a b c d e"] * 3))])
    assert s[3]["dup_ngram_frac"] == pytest.approx(6 / 11)

    # non-periodic control: unique middle tokens break the rotations —
    # "a b c d e U V W a b c d e" has 13 tokens → 9 5-grams, and ONLY
    # the bookend 'a b c d e' (positions 0 and 8) repeats → 1/9
    s = _stats(spark, [(4, "a b c d e U V W a b c d e")])
    assert s[4]["dup_ngram_frac"] == pytest.approx(1 / 9)
    # fully distinct tokens: nothing repeats at any n
    s = _stats(spark, [(5, "q w e r t y u i o p")])
    assert s[5]["dup_ngram_frac"] == 0.0


def test_boilerplate_paste_scores_high(spark):
    doc = "\n".join(["Buy now! Limited offer today only."] * 50)
    s = _stats(spark, [(1, doc)])
    assert s[1]["dup_line_frac"] > 0.95
    assert s[1]["dup_line_char_frac"] > 0.95
    assert s[1]["dup_ngram_frac"] > 0.9


def test_clean_prose_scores_low(spark):
    doc = ("The quick brown fox jumps over the lazy dog.\n"
           "Pack my box with five dozen liquor jugs.\n"
           "Sphinx of black quartz, judge my vow.")
    s = _stats(spark, [(1, doc)])
    assert s[1]["dup_line_frac"] == 0.0
    assert s[1]["dup_ngram_frac"] == 0.0
    assert s[1]["top_ngram_frac"] < 0.15
    assert s[1]["max_char_run"] <= 2


def test_degenerate_docs_zeroed_not_missing(spark):
    s = _stats(spark, [(1, None), (2, ""), (3, "word"),
                       (4, "\n\n\n"), (5, "  \t ")])
    assert set(s) == {1, 2, 3, 4, 5}
    for i in (1, 2, 4, 5):
        assert s[i]["n_lines"] == 0
        assert s[i]["dup_line_frac"] == 0.0
        assert s[i]["top_ngram_frac"] == 0.0
    # single token: no 2-gram → 0, one line
    assert s[3]["n_lines"] == 1
    assert s[3]["top_ngram_frac"] == 0.0
    assert s[3]["max_char_run"] == 1


def test_max_char_run(spark):
    df = spark.createDataFrame(
        [(1, "normal text"), (2, "aaaaaa"), (3, "x" + "!" * 40 + "y"),
         (4, ""), (5, None)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["run"]
        for r in df.select(
            "doc_id",
            max_char_run_expr(F.col("text")).alias("run"),
        ).collect()
    }
    assert got[1] == 1
    assert got[2] == 6
    assert got[3] == 40
    assert got[4] == 0
    assert got[5] == 0


def test_runs_on_documents_table(spark, sf_dir):
    from tmdb_sync_spark.io import table

    docs = table(spark, sf_dir, "documents")
    out = repetition_stats(docs)
    assert out.count() == docs.count()
    row = out.agg(
        F.min("dup_line_frac"), F.max("dup_line_frac"),
        F.max("top_ngram_frac"),
    ).collect()[0]
    assert 0.0 <= row[0] <= row[1] <= 1.0
    assert row[2] <= 1.0


def test_shuffles_key_on_doc_scoped_units(spark):
    """Scale-shape pin: every Exchange in the plan partitions by
    expressions that include doc_id — a hot n-gram can never skew a
    shuffle, because no shuffle keys on the unit alone."""
    df = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    plan = repetition_stats(df)._jdf.queryExecution() \
        .executedPlan().toString()
    import re

    for m in re.finditer(r"hashpartitioning\(([^)]*)\)", plan):
        assert "doc_id" in m.group(1), m.group(0)


def test_crlf_and_unicode_lines(spark):
    """Windows line endings: split on \\n leaves a trailing \\r, which
    trim_ws strips (\\r is in WS_CHARS) — so 'a\\r\\na\\r\\n' is a
    duplicated line, not two distinct lines 'a\\r' / 'a'. Unicode
    content rides through untouched."""
    s = _stats(spark, [
        (1, "a\r\na\r\nb"),
        (2, "héllo wörld\nhéllo wörld"),
        (3, "x x\nx x"),
    ])
    assert s[1]["n_lines"] == 3
    assert s[1]["dup_line_frac"] == pytest.approx(1 - 2 / 3)
    assert s[2]["dup_line_frac"] == pytest.approx(0.5)
    assert s[3]["dup_line_frac"] == pytest.approx(0.5)
    # doc 3 tokenizes across the newline (\\n is WS): x,x,x,x → the
    # 2-gram 'x x' appears 3× in 4 tokens → 3·2/4 = 1.5 → capped at 1
    assert s[3]["top_ngram_frac"] == pytest.approx(1.0)


def test_huge_single_line_is_one_line(spark):
    doc = "tok " * 5000
    s = _stats(spark, [(1, doc)])
    assert s[1]["n_lines"] == 1
    assert s[1]["dup_line_frac"] == 0.0
    # 5000 identical tokens: every 2-gram identical → frac capped at 1
    assert s[1]["top_ngram_frac"] == pytest.approx(1.0)
    assert s[1]["dup_ngram_frac"] == pytest.approx(1 - 1 / 4996)


def test_quality_gate_audit_and_kept(spark):
    from tmdb_sync_spark.functions.text import quality_gate

    spam = "\n".join(["Buy now! Limited offer today only."] * 50)
    runs = "Read this " + "a" * 200
    clean = ("The quick brown fox jumps over the lazy dog.\n"
             "Pack my box with five dozen liquor jugs.")
    df = spark.createDataFrame(
        [(1, clean), (2, spam), (3, runs), (4, clean + " indeed")],
        "doc_id long, text string",
    )
    res = quality_gate(df)
    kept_ids = {r["doc_id"] for r in res["kept"].collect()}
    assert kept_ids == {1, 4}
    a = res["audit"]
    assert a["n_in"] == 4 and a["n_kept"] == 2
    # the spam doc trips the line rules; the run doc trips the char run
    assert a["dup_line_frac"] >= 1
    assert a["max_char_run"] >= 1
    # kept frame carries ORIGINAL columns untouched
    assert set(res["kept"].columns) == {"doc_id", "text"}


def test_quality_gate_threshold_typo_is_loud(spark):
    from tmdb_sync_spark.functions.text import quality_gate

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    import pytest as _pt

    with _pt.raises(ValueError, match="unknown threshold"):
        quality_gate(df, thresholds={"max_dup_lines_frac": 0.1})


def test_quality_gate_min_quality(spark):
    from tmdb_sync_spark.functions.text import quality_gate

    good = ("the cat and the dog went to the market in town and "
            "bought a fish")
    df = spark.createDataFrame(
        [(1, good), (2, "zz qq ww")],
        "doc_id long, text string",
    )
    res = quality_gate(df, min_quality=0.8)
    assert {r["doc_id"] for r in res["kept"].collect()} == {1}
    assert res["audit"]["min_quality"] == 1
