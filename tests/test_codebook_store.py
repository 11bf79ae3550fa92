"""Persisted IVF codebook (functions/codebook_store.py): cross-session
probe parity without retraining, fingerprint invalidation on table
rewrite, store-contract refusal, versioned atomic publish — the index
family's operational contracts applied to the trained-model artifact
(r9 verdict #4)."""

from __future__ import annotations

import json
import os

import pytest

import tmdb_sync_spark.functions.similarity as sim
from tmdb_sync_spark.functions.codebook_store import (
    CODEBOOK_NAME,
    codebook_version,
    load_codebook,
    save_codebook,
)
from tmdb_sync_spark.functions.similarity import (
    IVF_TOP_K,
    N_PROBE,
    ann_ivf_topk_at,
    resolve_codebook,
)
from tmdb_sync_spark.util import reset_materialization_cache


@pytest.fixture()
def store(tmp_path):
    return os.path.join(str(tmp_path), "codebook")


@pytest.fixture(autouse=True)
def _fresh_memo():
    # each test gets its own store dir, so a memo left by an earlier
    # test (same session + table) would satisfy the resolver before the
    # store ever gets written — clear the model memo per test
    reset_materialization_cache()
    yield


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_cross_session_parity_without_retraining(spark, sf_dir, store,
                                                 monkeypatch):
    """Session 1 trains and persists; 'session 2' (memo cleared — the
    in-process stand-in for a fresh driver) must serve the PERSISTED
    book: identical probe results, and _train_codebook provably never
    runs (it raises if called)."""
    first = _rows(ann_ivf_topk_at(
        spark, sf_dir, N_PROBE, IVF_TOP_K, codebook_store=store
    ))
    assert codebook_version(store) == 1
    trained = resolve_codebook(spark, sf_dir, store)

    reset_materialization_cache()        # kills the model memo
    monkeypatch.setattr(
        sim, "_train_codebook",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("retrained despite a fresh persisted codebook")
        ),
    )
    loaded = resolve_codebook(spark, sf_dir, store)
    assert [tuple(c) for c in loaded] == [tuple(c) for c in trained]
    second = _rows(ann_ivf_topk_at(
        spark, sf_dir, N_PROBE, IVF_TOP_K, codebook_store=store
    ))
    assert second == first
    assert codebook_version(store) == 1  # load never re-publishes


def test_fingerprint_invalidation_retrains_and_reversions(
    spark, sf_dir, store
):
    """A codebook stamped with a DIFFERENT table fingerprint is stale:
    load returns None, the resolver retrains, and the store re-publishes
    as version 2 with the current stamp."""
    resolve_codebook(spark, sf_dir, store)
    f = os.path.join(store, CODEBOOK_NAME)
    with open(f) as fh:
        doc = json.load(fh)
    doc["fingerprint"] = ["rewritten-table-stamp"]
    with open(f, "w") as fh:
        json.dump(doc, fh)

    fp = sim._embeddings_fingerprint(sf_dir)
    assert load_codebook(store, fp) is None     # stale → None, not error

    reset_materialization_cache()
    again = resolve_codebook(spark, sf_dir, store)
    assert codebook_version(store) == 2
    assert load_codebook(store, fp) is not None
    assert [tuple(c) for c in load_codebook(store, fp)] == [
        tuple(c) for c in again
    ]


def test_store_contract_mismatch_refuses(spark, sf_dir, store):
    """A store written under different key-space constants (another
    N_CENTROIDS, DIM, quantization…) must refuse loudly on BOTH load and
    save — serving assignments from a foreign quantizer would be the
    silent-miss failure the contract family exists to prevent."""
    resolve_codebook(spark, sf_dir, store)
    cf = os.path.join(store, "_store_contract.json")
    with open(cf) as fh:
        rec = json.load(fh)
    rec["n_centroids"] = rec["n_centroids"] * 2
    with open(cf, "w") as fh:
        json.dump(rec, fh)

    fp = sim._embeddings_fingerprint(sf_dir)
    with pytest.raises(ValueError, match="store contract mismatch"):
        load_codebook(store, fp)
    with pytest.raises(ValueError, match="store contract mismatch"):
        save_codebook(store, [], fp)


def test_save_is_versioned_and_locked(spark, sf_dir, store):
    """Each save increments the artifact version (tmp + atomic rename),
    and a held writer lock refuses a concurrent save loudly."""
    from tmdb_sync_spark.plans.partitioned import MERGE_LOCK_NAME
    from tmdb_sync_spark.util import (
        ConcurrentWriterError,
        acquire_dir_lock,
        release_dir_lock,
    )

    cents = resolve_codebook(spark, sf_dir, store)
    fp = sim._embeddings_fingerprint(sf_dir)
    assert save_codebook(store, cents, fp) == 2
    assert codebook_version(store) == 2

    held = acquire_dir_lock(store, MERGE_LOCK_NAME, wait_s=5)
    try:
        with pytest.raises(ConcurrentWriterError):
            save_codebook(store, cents, fp, lock_wait_s=0.2)
    finally:
        release_dir_lock(held)
