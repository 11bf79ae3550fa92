"""Scale ramp for functions/dedup_index: per-drop filtering cost vs
INDEX size. Index built from 5k/20k/80k synthetic docs (sf0.1 documents
replicated with distinct ids and alien vocabularies via an id-salted
token prefix); the measured drop is a fixed 500 fresh docs with
update_index=False (pure query cost), warm (one discarded prime).

Expectation, stated before measuring: a realistic 500-doc drop touches
all 64 bb buckets, so bucket pruning does not engage and the drop cost
is the signature cost of the DROP (fixed) plus ONE map-side scan of the
index — LINEAR in index size with a small constant, zero index shuffle.
At production scale the remedy is bucketing the index table on
band_key (the partition layout already groups files for a mechanical
rewrite); tiny point-drops DO prune (test-asserted).

Usage: python scripts/exp_index_ramp.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from tmdb_sync_spark.functions.dedup_index import (  # noqa: E402
    dedup_against_index,
)
from tmdb_sync_spark.session import get_spark  # noqa: E402


def _corpus(spark, n: int, salt: str):
    # 60 alien tokens per doc; vocabulary keyed by (salt, id) so no
    # cross-doc near-dups exist unless constructed
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.array(*[
                F.concat(F.lit(f"{salt}"), F.col("id"),
                         F.lit(f"_t{j} "))
                for j in range(60)
            ]),
        ).alias("text"),
    )


def _vecs(spark, n: int, lo: int):
    """Deterministic well-spread 64-dim vectors (ids lo..lo+n)."""
    from pyspark.sql import functions as F

    from tmdb_sync_spark.functions.similarity import DIM

    return spark.range(lo, lo + n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(2001)) - 1000
            ).cast("float") / 1000.0,
        ).alias("embedding"),
    )


def main() -> None:
    from tmdb_sync_spark.functions.vector_index import (
        dedup_vectors_against_index,
    )

    spark = get_spark("index-ramp", cpus="32")
    drop = _corpus(spark, 500, "drop").cache()
    drop.count()
    for n in (5_000, 20_000, 80_000):
        tmp = tempfile.mkdtemp(prefix="idxramp_")
        idx = os.path.join(tmp, "idx")
        t0 = time.time()
        dedup_against_index(spark, _corpus(spark, n, "base"), idx)
        build = time.time() - t0
        # prime then measure the pure drop query
        dedup_against_index(spark, drop, idx, update_index=False)
        t0 = time.time()
        res = dedup_against_index(spark, drop, idx, update_index=False)
        dt = time.time() - t0
        n_files = len(spark.read.parquet(idx).inputFiles())
        print(
            f"index={n} docs ({n_files} files, build {build:.1f}s): "
            f"drop500 query {dt:.2f}s, dropped="
            f"{res['n_dropped_vs_index']}"
        )
        shutil.rmtree(tmp, ignore_errors=True)

    vdrop = _vecs(spark, 500, 10_000_000).cache()
    vdrop.count()
    for n in (5_000, 20_000, 80_000):
        tmp = tempfile.mkdtemp(prefix="vecramp_")
        idx = os.path.join(tmp, "vidx")
        # bulk build = the append path (no in-batch self-pair pass —
        # that is the batch operator's job; feeding the whole corpus
        # through dedup_vectors_against_index measured QUADRATIC,
        # 4.9/50.9/243 s, because the self-pair pass is Σ bucket² and
        # the synthetic corpus at threshold 0.30 is a dense graph)
        from tmdb_sync_spark.functions.vector_index import (
            append_vectors_to_index,
        )

        t0 = time.time()
        append_vectors_to_index(spark, idx, _vecs(spark, n, 0))
        build = time.time() - t0
        dedup_vectors_against_index(spark, vdrop, idx,
                                    update_index=False)
        t0 = time.time()
        res = dedup_vectors_against_index(spark, vdrop, idx,
                                          update_index=False)
        dt = time.time() - t0
        print(
            f"vec index={n} ({build:.1f}s build): drop500 query "
            f"{dt:.2f}s, dropped={res['n_dropped_vs_index']}"
        )
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
