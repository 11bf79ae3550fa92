#!/usr/bin/env python3
"""ANN recall contract sweep (r8 verdict #3).

A production ANN operator is specified by recall@k at a probe budget,
not by hash parity — this script measures recall for both ANN variants
against the exact kernel (similarity.exact_topk_frames, self excluded)
on TWO corpora:

- the driver's sf0.1 embeddings — isotropic iid noise (flat singular
  spectrum, measured r6): the ADVERSARIAL case, where true neighbors
  are barely closer than random points and any prune loses them. The
  numbers are a deterministic regression pin, not a quality claim.
- a planted-cluster corpus (8 Gaussian clusters, fixed seed — the same
  generator as tests/test_ivf_training.py): the data shape ANN exists
  for, and the basis of the recall FLOORS pinned in
  tests/test_ann_recall.py.

Sweeps: IVF n_probe ∈ {1, 2, 4, 8} (8 = exhaustive ⇒ recall 1.0, the
kernel sanity row); sign-LSH bits ∈ {4, 6, 8} × hamming_radius ∈
{0, 1}. Results are printed as a markdown table for COVERAGE.md.

Usage: python scripts/exp_ann_recall.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from tmdb_sync_spark.functions import similarity as sim  # noqa: E402
from tmdb_sync_spark.functions.similarity import (  # noqa: E402
    ann_ground_truth,
    ann_ivf_topk_at,
    ann_recall_at_k,
    ann_signlsh_topk_at,
)
from tmdb_sync_spark.session import get_spark  # noqa: E402


def write_clustered(path: str, seed: int = 7, rows_per_cluster: int = 120):
    """8 well-separated Gaussian clusters in DIM dims, fixed seed — the
    corpus shape shared with tests/test_ivf_training.py."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1.0, (sim.N_CENTROIDS, sim.DIM))
    X = np.concatenate(
        [c + rng.normal(0, 0.35, (rows_per_cluster, sim.DIM))
         for c in centers]
    )
    ids = np.arange(len(X), dtype=np.int64)
    pq.write_table(
        pa.table({
            "vec_id": ids,
            "embedding": [r.astype(np.float32).tolist() for r in X],
        }),
        path,
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ann-recall", cpus="16")
    spark.sparkContext.setLogLevel("ERROR")

    cdir = tempfile.mkdtemp(prefix="ann-recall-clustered-")
    write_clustered(os.path.join(cdir, "embeddings.parquet"))

    variants = (
        [(f"ivf n_probe={p}", lambda s, d, k, p=p: ann_ivf_topk_at(s, d, p, k))
         for p in (1, 2, 4, 8)]
        + [(f"signlsh bits={b} radius={r}",
            lambda s, d, k, b=b, r=r: ann_signlsh_topk_at(s, d, b, k, r))
           for b in (4, 6, 8) for r in (0, 1)]
    )

    print("| variant | corpus | recall@3 | recall@5 |")
    print("|---|---|---|---|")
    for label, d in (("clustered", cdir), ("driver-isotropic", sf_dir)):
        rec: dict[str, dict[int, float]] = {}
        for k in (3, 5):
            truth = ann_ground_truth(spark, d, k).cache()
            truth.count()
            for name, fn in variants:
                rec.setdefault(name, {})[k] = ann_recall_at_k(
                    fn(spark, d, k), truth, k
                )
            truth.unpersist()
        for name, by_k in rec.items():
            print(f"| {name} | {label} | {by_k[3]:.3f} | {by_k[5]:.3f} |")


if __name__ == "__main__":
    main()
