"""IVF codebook training (functions/similarity._train_codebook).

The r5 verdict's missing-item 2: the coarse quantizer is now a seeded,
engine-deterministic k-means instead of the first-N-vectors layout demo.
These tests pin (a) the recall win the training exists for, on a corpus
with actual cluster structure, (b) determinism (same table → bit-equal
codebook), and (c) the loud degenerate-corpus failure.

Note on (a): the driver's synthetic embeddings are isotropic iid noise
(flat singular spectrum, measured in-session round 6) — k-means cannot
improve recall there, by math. The recall assertion therefore runs on a
deterministically generated CLUSTERED corpus, the data shape the
training targets in production.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import Row

from tmdb_sync_spark.functions import similarity as sim

N_CLUSTERS = sim.N_CENTROIDS
ROWS_PER_CLUSTER = 120


def _write_clustered_embeddings(path: str, seed: int = 7) -> None:
    """8 well-separated Gaussian clusters in DIM dims, fixed seed."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1.0, (N_CLUSTERS, sim.DIM))
    X = np.concatenate(
        [c + rng.normal(0, 0.35, (ROWS_PER_CLUSTER, sim.DIM))
         for c in centers]
    )
    ids = np.arange(len(X), dtype=np.int64)
    pq.write_table(
        pa.table({
            "vec_id": ids,
            "embedding": [row.astype(np.float32).tolist() for row in X],
        }),
        path,
    )


@pytest.fixture(scope="module")
def clustered_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ivf_clustered")
    _write_clustered_embeddings(str(d / "embeddings.parquet"))
    return str(d)


def _quantize(path: str):
    t = pq.read_table(path)
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    v = np.floor(emb * 1000 + 0.5).astype(np.int64)
    nrm = (v * v).sum(axis=1)
    return ids, v, nrm


def _recall_vs_bruteforce(df_rows, ids, v, nrm) -> float:
    """recall@IVF_TOP_K of the operator's output against exact cosine
    top-k (excluding self, ties on neighbor_id — the operator's own
    ordering) computed in numpy."""
    qmask = ids % 50 == 0
    sims = (v[qmask] @ v.T) / (
        np.sqrt(nrm[qmask])[:, None] * np.sqrt(nrm)[None, :]
    )
    truth = {}
    for qi, qid in enumerate(ids[qmask]):
        s = sims[qi].copy()
        s[ids == qid] = -np.inf
        order = np.lexsort((ids, -s))[: sim.IVF_TOP_K]
        truth[int(qid)] = set(int(x) for x in ids[order])
    got: dict[int, set] = {}
    for r in df_rows:
        got.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    return hits / (len(truth) * sim.IVF_TOP_K)


def test_trained_codebook_beats_first_n_on_clustered_corpus(
    spark, clustered_dir, monkeypatch
):
    ids, v, nrm = _quantize(f"{clustered_dir}/embeddings.parquet")

    sim._CODEBOOK_MEMO.clear()
    trained_rows = sim.ann_ivf_topk(spark, clustered_dir).collect()
    trained_recall = _recall_vs_bruteforce(trained_rows, ids, v, nrm)

    # the pre-r6 codebook: first N_CENTROIDS vectors by vec_id — on a
    # clustered corpus they all land in ONE cluster, so most probes miss
    first_n = [
        Row(vec_id=int(i), v=[int(x) for x in v[i]], nrm=int(nrm[i]))
        for i in range(sim.N_CENTROIDS)
    ]
    sim._CODEBOOK_MEMO.clear()
    monkeypatch.setattr(sim, "_train_codebook", lambda s, d: first_n)
    untrained_rows = sim.ann_ivf_topk(spark, clustered_dir).collect()
    untrained_recall = _recall_vs_bruteforce(untrained_rows, ids, v, nrm)
    sim._CODEBOOK_MEMO.clear()

    # measured in-session: ~0.96 trained vs ~0.84 untrained; assert the
    # direction with margin, not the exact figures
    assert trained_recall > untrained_recall + 0.05, (
        f"trained {trained_recall:.3f} vs untrained {untrained_recall:.3f}"
    )
    assert trained_recall >= 0.9


def test_training_is_deterministic(spark, clustered_dir):
    sim._CODEBOOK_MEMO.clear()
    a = sim._train_codebook(spark, clustered_dir)
    b = sim._train_codebook(spark, clustered_dir)
    assert [(r.vec_id, list(r.v), r.nrm) for r in a] == [
        (r.vec_id, list(r.v), r.nrm) for r in b
    ]
    # cids are the dense 0..N-1 range the oracle's row_number() produces
    assert [r.vec_id for r in a] == list(range(sim.N_CENTROIDS))
    # norms are consistent with the trained vectors
    for r in a:
        assert r.nrm == sum(x * x for x in r.v)


def test_training_mean_is_round_half_up_integer(spark, clustered_dir):
    """The recenter arithmetic both engines must share: floor((2Σ+n)/2n)
    == floor(mean + 0.5) for positive and negative sums."""
    for s, n in [(7, 2), (-7, 2), (5, 4), (-5, 4), (0, 3), (10, 5)]:
        assert math.floor((2 * s + n) / (2.0 * n)) == math.floor(s / n + 0.5)


def test_empty_corpus_fails_loudly(spark, tmp_path):
    d = tmp_path / "sfz"
    d.mkdir()
    pq.write_table(
        pa.table({
            "vec_id": pa.array([0, 1], type=pa.int64()),
            "embedding": pa.array(
                [[0.0] * sim.DIM, [0.0] * sim.DIM],
                type=pa.list_(pa.float32()),
            ),
        }),
        str(d / "embeddings.parquet"),
    )
    sim._CODEBOOK_MEMO.clear()
    with pytest.raises(ValueError, match="no usable vectors"):
        sim.ann_ivf_topk(spark, str(d))


def test_trained_ivf_oracle_parity_on_clustered_corpus(spark, clustered_dir):
    """The driver checks ann_ivf_topk's oracle only on its isotropic
    embeddings, where k-means barely moves the centroids; run the same
    Spark-vs-DuckDB comparison on the CLUSTERED corpus, where the
    training actually relocates every centroid across both Lloyd
    structures — a divergence in init ordering, sampling, assignment
    tie-breaks, or the round-half-up mean shows up here first."""
    import duckdb

    import __spark_entry__ as entry_mod
    from tests.test_oracle_parity import canon

    import pandas as pd

    sim._CODEBOOK_MEMO.clear()
    sdf = entry_mod.queries()["ann_ivf_topk"](spark, clustered_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{clustered_dir}/embeddings.parquet')"
    )
    odf = con.execute(entry_mod.oracle_sql()["ann_ivf_topk"]).df()
    a, b = canon(sdf), canon(odf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b) > 0
    pd.testing.assert_frame_equal(a, b, obj="ann_ivf_topk@clustered")


def test_codebook_mirror_duckdb_on_random_corpora(spark, tmp_path):
    """Compare the TRAINED CODEBOOK itself (not just the final query)
    against a DuckDB replay of the training CTEs, over several
    deterministic pseudo-random corpora — zero vectors, duplicated
    positions, sub-N_CENTROIDS sizes, empty Lloyd samples. Any drift in
    init ordering, sampling, assignment tie-breaks, recenter rounding,
    or the empty-cluster fallback diverges HERE, one stage before the
    query-level oracles can see it."""
    import duckdb

    rng = np.random.default_rng(11)
    cases = {
        "plain": rng.normal(0, 0.3, (40, sim.DIM)),
        # duplicate positions → distance ties broken by cid
        "dups": np.repeat(rng.normal(0, 0.3, (5, sim.DIM)), 8, axis=0),
        # fewer usable vectors than centroids
        "tiny": rng.normal(0, 0.3, (5, sim.DIM)),
        # sample (vec_id % 4 == 0) rows are all zero → empty Lloyd
        # sample → codebook must stay at the init book
        "zero_sample": np.where(
            (np.arange(24) % 4 == 0)[:, None],
            0.0, rng.normal(0, 0.3, (24, sim.DIM))
        ),
    }
    for name, x in cases.items():
        d = tmp_path / name
        d.mkdir()
        pq.write_table(
            pa.table({
                "vec_id": np.arange(len(x), dtype=np.int64),
                "embedding": [r.astype(np.float32).tolist() for r in x],
            }),
            str(d / "embeddings.parquet"),
        )
        sim._CODEBOOK_MEMO.clear()
        cents = sim._train_codebook(spark, str(d))
        got = [(r.vec_id, [int(v) for v in r.v], int(r.nrm)) for r in cents]

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{d}/embeddings.parquet')"
        )
        sql = (
            sim._QUANT_SQL + "," + sim._kmeans_sql()
            + " SELECT cid, cv, cnrm FROM cent ORDER BY cid"
        )
        want = [
            (int(cid), [int(v) for v in cv], int(cnrm))
            for cid, cv, cnrm in con.execute(sql).fetchall()
        ]
        assert got == want, f"codebook mirror diverged on corpus {name!r}"
