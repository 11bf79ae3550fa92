"""Split-leakage audit contracts (functions/leakage.py): full DuckDB
frame parity on the real documents table (the registered-surface bar)
plus planted-leak semantics — orientation, same-split exclusion,
rates, decontamination."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

from tmdb_sync_spark.functions.dedup import (
    SIGS_CTE,
    minhash_signature,
    shingle_sql,
)
from tmdb_sync_spark.functions.leakage import (
    decontaminated_eval,
    leakage_rates,
    split_leakage_audit,
)
from tmdb_sync_spark.functions.sampling import split_corpus
from tmdb_sync_spark.io import table

from tests.test_oracle_parity import canon

_N_EQ = " + ".join(
    f"(a.h{i} = b.h{i})::INT" for i in range(8)
)
_BANDS = " OR ".join(
    f"(a.h{2 * j} = b.h{2 * j} AND a.h{2 * j + 1} = b.h{2 * j + 1})"
    for j in range(4)
)


def _duck_audit(pq: str, min_equal: int, train: str = "train"):
    """DuckDB twin of the whole audit over a (doc_id, text, split)
    parquet: shingles → signatures → banded candidates → cross-split
    filter → eval-first orientation."""
    src = f"read_parquet('{pq}')"
    return duckdb.connect().execute(f"""
        WITH {shingle_sql(src)}, {SIGS_CTE},
        lab AS (SELECT doc_id, split FROM {src}),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(({_N_EQ}) AS INT) AS n_equal_hashes
            FROM sigs a JOIN sigs b
              ON a.doc_id < b.doc_id AND ({_BANDS})
        ),
        labeled AS (
            SELECT p.*, la.split AS split_a, lb.split AS split_b
            FROM pairs p
            JOIN lab la ON p.doc_a = la.doc_id
            JOIN lab lb ON p.doc_b = lb.doc_id
            WHERE la.split <> lb.split
              AND p.n_equal_hashes >= {min_equal}
        )
        SELECT CASE WHEN split_a = '{train}' THEN doc_b ELSE doc_a END
                   AS eval_doc_id,
               CASE WHEN split_a = '{train}' THEN split_b ELSE split_a END
                   AS eval_split,
               CASE WHEN split_a = '{train}' THEN doc_a ELSE doc_b END
                   AS other_doc_id,
               CASE WHEN split_a = '{train}' THEN split_a ELSE split_b END
                   AS other_split,
               n_equal_hashes,
               n_equal_hashes / 8.0 AS est_jaccard
        FROM labeled
    """).df()


def test_audit_duckdb_parity_real_documents(spark, sf_dir, tmp_path):
    """End-to-end frame parity at min_equal=4 (wider than the near-dup
    policy so the real corpus yields non-vacuous cross-split pairs) on
    a 70/15/15 split of the real documents table."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    labeled = split_corpus(
        docs, weights={"train": 0.7, "val": 0.15, "test": 0.15}, seed=11
    )
    pq = str(tmp_path / "docs_split")
    labeled.coalesce(1).write.parquet(pq)

    got = canon(
        split_leakage_audit(
            spark.read.parquet(pq), split_col="split", min_equal=4
        ).toPandas()
    )
    want = canon(_duck_audit(pq + "/*.parquet", min_equal=4))
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want)
    # non-vacuous: the documents table plants near-dups, and a 30%
    # eval mass must catch some across the boundary
    assert len(got) > 0
    # every reported left side is an eval doc
    assert (got["eval_split"] != "train").all()


def _planted(spark, texts_by_split):
    """Build a (doc_id, text, split) frame where membership is chosen
    AFTER hashing: ids 0..199 are labeled by split_corpus, then texts
    are assigned per split so the plant is deterministic."""
    base = spark.createDataFrame(
        [(i, f"filler {i} " + " ".join(f"w{i}{j}" for j in range(12)))
         for i in range(200)],
        "doc_id long, text string",
    )
    labeled = split_corpus(
        base, weights={"train": 0.6, "val": 0.2, "test": 0.2}, seed=7
    )
    ids = {
        s: [r["doc_id"] for r in labeled.where(F.col("split") == s)
            .orderBy("doc_id").collect()]
        for s in ("train", "val", "test")
    }
    rows = labeled.collect()
    texts = {r["doc_id"]: r["text"] for r in rows}
    for split, assign in texts_by_split.items():
        for k, text in assign.items():
            texts[ids[split][k]] = text
    out = spark.createDataFrame(
        [(r["doc_id"], texts[r["doc_id"]], r["split"]) for r in rows],
        "doc_id long, text string, split string",
    )
    return out, ids


LEAK = "the quick brown fox jumps over the lazy dog again and again ok"


def test_planted_leak_orientation_and_exclusions(spark):
    docs, ids = _planted(spark, {
        # train↔val twin: must be reported, val side first
        "train": {0: LEAK, 1: "train only twin A " * 5},
        "val": {0: LEAK},
        # train↔train twin: dedup's business, NOT leakage
        # (ids train[1] and train[2] share a text)
    })
    docs = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == ids["train"][2],
               F.lit("train only twin A " * 5)).otherwise(F.col("text")),
    )
    leaks = split_leakage_audit(docs, split_col="split").collect()
    assert len(leaks) == 1
    r = leaks[0]
    assert r["eval_doc_id"] == ids["val"][0]
    assert r["eval_split"] == "val"
    assert r["other_doc_id"] == ids["train"][0]
    assert r["other_split"] == "train"
    assert r["n_equal_hashes"] == 8 and r["est_jaccard"] == 1.0


def test_eval_eval_twin_reported_smaller_id_first(spark):
    docs, ids = _planted(spark, {
        "val": {0: LEAK},
        "test": {0: LEAK},
    })
    leaks = split_leakage_audit(docs, split_col="split").collect()
    assert len(leaks) == 1
    r = leaks[0]
    lo, hi = sorted([ids["val"][0], ids["test"][0]])
    assert r["eval_doc_id"] == lo and r["other_doc_id"] == hi
    assert {r["eval_split"], r["other_split"]} == {"val", "test"}


def test_rates_and_decontamination(spark):
    docs, ids = _planted(spark, {
        "train": {0: LEAK},
        "val": {0: LEAK},
    })
    leaks = split_leakage_audit(docs, split_col="split")
    rates = {r["split"]: r for r in leakage_rates(docs, leaks).collect()}
    # both eval splits present; only val is leaked
    assert set(rates) == {"val", "test"}
    n_val = len(ids["val"])
    assert rates["val"]["n_docs"] == n_val
    assert rates["val"]["n_leaked"] == 1
    assert rates["val"]["leak_rate"] == pytest.approx(1.0 / n_val)
    assert rates["test"]["n_leaked"] == 0
    assert rates["test"]["leak_rate"] == 0.0

    clean = decontaminated_eval(docs, leaks)
    kept = {r["doc_id"] for r in clean.collect()}
    assert ids["val"][0] not in kept          # leaked eval doc dropped
    assert ids["train"][0] in kept            # train twin untouched
    assert clean.count() == docs.count() - 1


def test_staged_signature_path_matches_direct(spark):
    docs, _ = _planted(spark, {
        "train": {0: LEAK},
        "val": {0: LEAK},
    })
    direct = split_leakage_audit(docs, split_col="split")
    sig = minhash_signature(docs, carry=("split",))
    staged = split_leakage_audit(docs, split_col="split", sig=sig)
    a = canon(direct.toPandas())
    b = canon(staged.toPandas())
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 1


def test_sig_without_label_raises(spark):
    docs, _ = _planted(spark, {})
    sig = minhash_signature(docs)  # no carry
    with pytest.raises(ValueError, match="no 'split' column"):
        split_leakage_audit(docs, split_col="split", sig=sig)
    with pytest.raises(ValueError, match="no 'nope' column"):
        split_leakage_audit(docs, split_col="nope")


# --- embedding-space (semantic) leakage --------------------------------


def test_embedding_audit_equivalence_with_dd_pairs(spark, sf_dir):
    """The audit's unordered pair set IS dd_embedding_cosine's
    restricted to label-differing pairs — same buckets, same quantized
    cosine, same threshold — and every reported left side is eval."""
    from tmdb_sync_spark.functions.leakage import embedding_split_leakage
    from tmdb_sync_spark.functions.similarity import dd_embedding_cosine

    emb = table(spark, sf_dir, "embeddings")
    labeled = split_corpus(
        emb, key="vec_id",
        weights={"train": 0.6, "val": 0.2, "test": 0.2}, seed=5,
    )
    got = embedding_split_leakage(labeled).collect()

    splits = {r["vec_id"]: r["split"] for r in
              labeled.select("vec_id", "split").collect()}
    dd = dd_embedding_cosine(spark, sf_dir).collect()
    want = {
        frozenset((r["a_id"], r["b_id"]))
        for r in dd
        if splits[r["a_id"]] != splits[r["b_id"]]
    }
    assert {
        frozenset((r["eval_vec_id"], r["other_vec_id"])) for r in got
    } == want
    assert len(got) == len(want) > 0
    cos = {frozenset((r["a_id"], r["b_id"])): r["cosine_sim"] for r in dd}
    for r in got:
        assert r["eval_split"] != "train"
        if r["other_split"] == "train":
            assert splits[r["eval_vec_id"]] != "train"
        else:  # both eval: smaller id first
            assert r["eval_vec_id"] < r["other_vec_id"]
        assert r["cosine_sim"] == cos[
            frozenset((r["eval_vec_id"], r["other_vec_id"]))
        ]


def test_embedding_audit_single_split_is_empty(spark, sf_dir):
    from tmdb_sync_spark.functions.leakage import embedding_split_leakage

    emb = table(spark, sf_dir, "embeddings").withColumn(
        "split", F.lit("train")
    )
    assert embedding_split_leakage(emb).count() == 0


def test_embedding_audit_validates_columns(spark):
    from tmdb_sync_spark.functions.leakage import embedding_split_leakage

    df = spark.createDataFrame([(1,)], "vec_id long")
    with pytest.raises(ValueError, match="no 'embedding'"):
        embedding_split_leakage(df)


def test_rates_and_decontamination_accept_embedding_audit(spark, sf_dir):
    from tmdb_sync_spark.functions.leakage import embedding_split_leakage

    emb = split_corpus(
        table(spark, sf_dir, "embeddings"), key="vec_id",
        weights={"train": 0.6, "val": 0.2, "test": 0.2}, seed=5,
    )
    leaks = embedding_split_leakage(emb)
    rates = {
        r["split"]: r
        for r in leakage_rates(
            emb, leaks, eval_id_col="eval_vec_id"
        ).collect()
    }
    assert set(rates) == {"val", "test"}
    n_leaked = sum(r["n_leaked"] for r in rates.values())
    assert n_leaked == leaks.select("eval_vec_id").distinct().count()

    clean = decontaminated_eval(
        emb, leaks, key="vec_id", eval_id_col="eval_vec_id"
    )
    assert clean.count() == emb.count() - n_leaked

    with pytest.raises(ValueError, match="eval_vec_id"):
        leakage_rates(emb, leaks)  # default id col is the lexical one
