"""Unified contamination audit (functions/audit.py): one call, three
lenses, each catching the leak shape the other two are blind to — a
corpus with all three planted shapes, per-lens verdicts, the clean
anti-join, and the family's loud-failure contracts (r9 verdict #6)."""

from __future__ import annotations

import os

import pytest

from tmdb_sync_spark.functions.audit import (
    append_corpus_to_audit_indexes,
    contamination_audit,
)
from tmdb_sync_spark.functions.similarity import DIM, N_DUP_BITS


def _corpus_text(i: int) -> str:
    words = " ".join(f"corpus{i}word{j}" for j in range(40))
    return f"document number {i} begins here {words} and ends here"


def _vec(hot: int, sign: float = 1.0):
    v = [0.01 * sign] * N_DUP_BITS + [0.0] * (DIM - N_DUP_BITS)
    v[N_DUP_BITS + (hot % (DIM - N_DUP_BITS - 2))] = 1.0
    return v


def _near(v, eps: float = 0.01):
    out = list(v)
    out[N_DUP_BITS] += eps
    out[-1] = eps
    return out


def _docs(spark, rows, id_col="doc_id"):
    return spark.createDataFrame(rows, f"{id_col} long, text string")


def _vecs(spark, rows):
    from pyspark.sql.types import (
        ArrayType, FloatType, LongType, StructField, StructType,
    )

    return spark.createDataFrame(rows, StructType([
        StructField("doc_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]))


@pytest.fixture()
def index_root(tmp_path, spark):
    root = os.path.join(str(tmp_path), "audit_indexes")
    docs = _docs(spark, [(i, _corpus_text(i)) for i in range(1, 11)])
    vecs = _vecs(spark, [(i, _vec(i)) for i in range(1, 11)]).withColumnRenamed(
        "doc_id", "vec_id"
    )
    append_corpus_to_audit_indexes(spark, root, docs, vecs)
    return root


def test_three_lens_audit_end_to_end(spark, index_root):
    """Each planted shape is caught by exactly the lens built for it:
    100 = lightly-edited whole-doc copy (bands), 101 = copied paragraph
    inside novel text (winnow — invisible to doc-level signatures),
    102 = clean text whose EMBEDDING near-matches the corpus (vectors),
    103 = clean on every axis."""
    stolen = _corpus_text(5)[30:120]     # a 90-char paragraph of doc 5
    ev = _docs(spark, [
        (100, _corpus_text(3).replace("ends here", "ends now")),
        (101, "a genuinely novel eval question, but quoting: " + stolen),
        (102, "fresh wording sharing no surface text with anything"),
        (103, "another clean evaluation prompt with original phrasing"),
    ])
    emb = _vecs(spark, [
        (100, _vec(100)),
        (101, _vec(101)),
        (102, _near(_vec(7))),           # paraphrase stand-in: near vec 7
        (103, _vec(103)),
    ])
    audit = contamination_audit(spark, ev, index_root, eval_embeddings=emb)

    v = {
        r["doc_id"]: (r["whole_doc"], r["substring"], r["semantic"],
                      r["contaminated"])
        for r in audit["verdicts"].collect()
    }
    assert set(v) == {100, 101, 102, 103}
    assert v[100][0] and v[100][3]             # whole-doc lens fires
    assert v[101] == (False, True, False, True)
    assert v[102] == (False, False, True, True)
    assert v[103] == (False, False, False, False)

    # per-pair detail names the right corpus counterpart per lens
    wd = {(r["doc_id"], r["corpus_doc_id"])
          for r in audit["pairs"]["whole_doc"].collect()}
    assert (100, 3) in wd
    ss = {(r["doc_id"], r["corpus_doc_id"])
          for r in audit["pairs"]["substring"].collect()}
    assert (101, 5) in ss
    sem = {(r["doc_id"], r["corpus_vec_id"])
           for r in audit["pairs"]["semantic"].collect()}
    assert sem == {(102, 7)}

    # the clean subset is the anti-join of the contaminated ids
    assert [r["doc_id"] for r in audit["clean"].collect()] == [103]


def test_lens_subset_and_loud_failures(spark, index_root, tmp_path):
    ev = _docs(spark, [(1, "some evaluation text long enough to matter")])

    # semantic requested without embeddings → loud, never skipped
    with pytest.raises(ValueError, match="needs\\s+eval_embeddings"):
        contamination_audit(spark, ev, index_root)

    # explicit two-lens audit works and the verdict frame shows the
    # absence (no semantic column) instead of a silent all-clear
    audit = contamination_audit(
        spark, ev, index_root, lenses=("whole_doc", "substring")
    )
    cols = audit["verdicts"].columns
    assert "semantic" not in cols and "whole_doc" in cols
    assert audit["verdicts"].count() == 1
    assert audit["clean"].count() == 1

    # a missing index for a requested lens raises
    with pytest.raises(ValueError, match="no index for lens"):
        contamination_audit(
            spark, ev, str(tmp_path / "never_built"),
            lenses=("whole_doc",),
        )

    # unknown / empty lens sets are caller bugs, not no-ops
    with pytest.raises(ValueError, match="unknown lenses"):
        contamination_audit(spark, ev, index_root, lenses=("typo",))
    with pytest.raises(ValueError, match="no lenses"):
        contamination_audit(spark, ev, index_root, lenses=())


def test_incremental_maintenance_across_drops(spark, tmp_path):
    """The composed append maintains all three indexes drop by drop —
    a leak planted against the SECOND drop is caught too."""
    root = os.path.join(str(tmp_path), "audit_idx")
    d1 = _docs(spark, [(i, _corpus_text(i)) for i in range(1, 4)])
    v1 = _vecs(spark, [(i, _vec(i)) for i in range(1, 4)]).withColumnRenamed(
        "doc_id", "vec_id")
    append_corpus_to_audit_indexes(spark, root, d1, v1)
    d2 = _docs(spark, [(i, _corpus_text(i)) for i in range(4, 7)])
    v2 = _vecs(spark, [(i, _vec(i)) for i in range(4, 7)]).withColumnRenamed(
        "doc_id", "vec_id")
    append_corpus_to_audit_indexes(spark, root, d2, v2)

    stolen = _corpus_text(5)[30:120]
    ev = _docs(spark, [(50, "novel wrapper quoting: " + stolen)])
    emb = _vecs(spark, [(50, _vec(50))])
    audit = contamination_audit(spark, ev, root, eval_embeddings=emb)
    got = {(r["doc_id"], r["corpus_doc_id"])
           for r in audit["pairs"]["substring"].collect()}
    assert (50, 5) in got
    assert audit["clean"].count() == 0


def test_verify_substring_spans_adapter(spark, index_root):
    """Audit substring pairs feed straight into exact-span verification
    — the copied paragraph's extent comes back exactly, 1-based on both
    sides, using the corpus table's text for the matched docs only."""
    from tmdb_sync_spark.functions.audit import verify_substring_spans

    stolen = _corpus_text(5)[30:120]
    ev = _docs(spark, [
        (101, "a genuinely novel eval question, but quoting: " + stolen),
    ])
    audit = contamination_audit(
        spark, ev, index_root, lenses=("substring",)
    )
    corpus_docs = _docs(spark, [(i, _corpus_text(i)) for i in range(1, 11)])
    spans = sorted(map(tuple, verify_substring_spans(
        ev, corpus_docs, audit["pairs"]["substring"]
    ).collect()))
    # both sides precede the 90-char excerpt (corpus offset 31) with a
    # space, so the MAXIMAL match starts one char earlier and is 91
    # chars — exact-span semantics, pinned as such in test_winnow.py
    q_start = len("a genuinely novel eval question, but quoting: ")  # 46
    assert (101, 5, q_start, 30, 91) in spans
