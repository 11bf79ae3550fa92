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

# Long property/chaos/replay suite: excluded from the default
# (driver-time-boxed) profile; the full local gate runs it — see
# pytest.ini and scripts/run_full_tests.sh.
pytestmark = pytest.mark.slow



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


# ---- r11 hostile pass (r10 verdict #3): probe the audit surface the
# way winnow was probed — degenerate inputs, id collisions, and the
# silent-vanish failure mode in the span adapter. Findings table in
# COVERAGE.md.


def test_audit_empty_eval_set(spark, index_root):
    """Zero eval docs: every frame is empty, nothing crashes, and no
    lens reports anything (0 verdicts ≠ all-clear of a non-empty set)."""
    ev = _docs(spark, [])
    emb = _vecs(spark, [])
    audit = contamination_audit(spark, ev, index_root, eval_embeddings=emb)
    assert audit["verdicts"].count() == 0
    assert audit["clean"].count() == 0
    assert {k: v.count() for k, v in audit["pairs"].items()} == {
        "whole_doc": 0, "substring": 0, "semantic": 0,
    }


def test_audit_duplicate_eval_ids(spark, index_root):
    """Duplicate doc_ids: ONE verdict row per distinct id, contaminated
    if ANY of the id's rows trips a lens (ids are the audit unit — two
    texts sharing an id share a fate); clean keeps the duplicate ROWS
    of ids whose every row is clean."""
    stolen = _corpus_text(3)[30:120]
    ev = _docs(spark, [
        (7, "novel words quoting: " + stolen),
        (7, "totally clean other row same id"),
        (8, "clean row"), (8, "clean row"),
    ])
    emb = _vecs(spark, [(7, _vec(70)), (7, _vec(71)),
                        (8, _vec(80)), (8, _vec(80))])
    audit = contamination_audit(spark, ev, index_root, eval_embeddings=emb)
    verdicts = sorted((r["doc_id"], r["contaminated"])
                      for r in audit["verdicts"].collect())
    assert verdicts == [(7, True), (8, False)]
    assert audit["clean"].count() == 2  # both rows of id 8


def test_audit_eval_ids_colliding_with_corpus_ids(spark, index_root):
    """An eval doc_id that also exists as a corpus id is a legitimate
    probe (id spaces are independent): the pair (3, 3) must surface,
    not be mistaken for a self-join artifact and dropped."""
    ev = _docs(spark, [
        (3, _corpus_text(3)),
        (4, "clean fresh words nothing shared with any corpus doc"),
    ])
    emb = _vecs(spark, [(3, _vec(3)), (4, _vec(400))])
    audit = contamination_audit(spark, ev, index_root, eval_embeddings=emb)
    v = {r["doc_id"]: (r["whole_doc"], r["substring"], r["semantic"])
         for r in audit["verdicts"].collect()}
    assert v[3] == (True, True, True)
    assert v[4] == (False, False, False)
    assert (3, 3) in {(r["doc_id"], r["corpus_doc_id"])
                      for r in audit["pairs"]["whole_doc"].collect()}


def test_audit_null_and_subk_texts(spark, index_root):
    """NULL / empty / sub-k-gram texts flow through every lens without
    crashing and flag nothing (embeddings here are far from the corpus,
    so the text lenses are isolated)."""
    ev = _docs(spark, [(20, None), (21, ""), (22, "tiny"), (23, "a b"),
                       (24, _corpus_text(2))])
    emb = _vecs(spark, [(20, _vec(200)), (21, None), (22, _vec(220)),
                        (23, _vec(230)), (24, _vec(240))])
    audit = contamination_audit(spark, ev, index_root, eval_embeddings=emb)
    v = {r["doc_id"]: r["contaminated"]
         for r in audit["verdicts"].collect()}
    assert v == {20: False, 21: False, 22: False, 23: False, 24: True}


def test_audit_semantic_lens_with_no_valid_embeddings(spark, index_root):
    """All-NaN / NULL embeddings: the validity contract zeroes the
    semantic probe instead of crashing or flagging garbage."""
    ev = _docs(spark, [(30, "clean words here"), (31, "more clean words")])
    nan = float("nan")
    emb = _vecs(spark, [(30, [nan] * DIM), (31, None)])
    audit = contamination_audit(spark, ev, index_root, eval_embeddings=emb)
    v = sorted((r["doc_id"], r["semantic"])
               for r in audit["verdicts"].collect())
    assert v == [(30, False), (31, False)]
    assert audit["pairs"]["semantic"].count() == 0


def test_audit_eval_set_larger_than_corpus(spark, index_root):
    """More eval docs than corpus docs — the probe direction must not
    assume which side is small."""
    ev = _docs(spark, [
        (100 + i, f"eval number {i} "
         + " ".join(f"unique{i}w{j}" for j in range(30)))
        for i in range(25)
    ])
    emb = _vecs(spark, [(100 + i, _vec(200 + i)) for i in range(25)])
    audit = contamination_audit(spark, ev, index_root, eval_embeddings=emb)
    assert audit["verdicts"].count() == 25
    assert audit["clean"].count() == 25


def test_verify_spans_raises_on_missing_pair_text(spark, index_root):
    """A detected pair whose corpus (or eval) text is absent from the
    frames handed to the adapter RAISES instead of silently vanishing
    from the span output — a dropped pair reads as 'nothing to verify',
    the audit's worst failure mode (found by this hostile pass: the
    pre-fix adapter returned [] for exactly this input)."""
    from tmdb_sync_spark.functions.audit import verify_substring_spans

    stolen = _corpus_text(3)[30:120]
    ev = _docs(spark, [(40, "novel words quoting: " + stolen)])
    audit = contamination_audit(spark, ev, index_root,
                                lenses=("substring",))
    assert audit["pairs"]["substring"].count() == 1

    partial_corpus = _docs(spark, [(1, _corpus_text(1))])  # doc 3 absent
    with pytest.raises(ValueError, match="missing from corpus_docs"):
        verify_substring_spans(ev, partial_corpus,
                               audit["pairs"]["substring"]).collect()

    wrong_eval = _docs(spark, [(41, "some other eval doc")])
    full_corpus = _docs(spark,
                        [(i, _corpus_text(i)) for i in range(1, 11)])
    with pytest.raises(ValueError, match="missing from eval_docs"):
        verify_substring_spans(wrong_eval, full_corpus,
                               audit["pairs"]["substring"]).collect()

    # and with both sides present the pair verifies exactly
    spans = verify_substring_spans(
        ev, full_corpus, audit["pairs"]["substring"]).collect()
    assert len(spans) == 1 and spans[0]["corpus_doc_id"] == 3


def test_audit_verdicts_memo_invalidates_on_corpus_rewrite(spark, tmp_path):
    """The staged audit indexes are memoized per corpus fingerprint —
    an IN-PLACE regeneration of documents/embeddings.parquet (the
    driver does this between rounds) must MISS the memo and rebuild,
    or the audit silently runs against the previous corpus."""
    import shutil
    import time

    from tmdb_sync_spark.functions.audit import _staged_audit_indexes

    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                         "/root/testdata/sf0.001")
    d = str(tmp_path / "sf_rewrite")
    os.makedirs(d)
    for t in ("documents", "embeddings"):
        shutil.copyfile(f"{src}/{t}.parquet", f"{d}/{t}.parquet")

    root1 = _staged_audit_indexes(spark, d)
    assert root1 == _staged_audit_indexes(spark, d)  # memo hit

    # in-place rewrite: same path, different content version
    time.sleep(0.05)  # mtime granularity
    docs = spark.read.parquet(f"{d}/documents.parquet").limit(5)
    docs.toPandas().to_parquet(f"{d}/documents.parquet")
    root2 = _staged_audit_indexes(spark, d)
    assert root2 != root1, (
        "staged audit indexes served a stale memo after the corpus "
        "was rewritten in place"
    )
