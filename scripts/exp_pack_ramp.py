"""Scale ramp for functions/sampling.pack_sequences: corpus token mass
x1/x4/x16/x64 (sf0.1 documents replicated with distinct doc_ids), FFD
packing at max_tokens=512 into a noop sink, warm (one discarded prime
rep per size). Expectation from the plan shape (one hash-bucket
Exchange + embarrassingly-parallel per-bucket kernels whose count grows
with mass): near-flat until the fixed job overhead is amortized, then
linear. Recorded run (local[32]): 0.58 / 0.63 / 1.16 / 1.26 s —
64x mass -> 2.2x wall, overhead-dominated at these sizes.

Usage: python scripts/exp_pack_ramp.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from tmdb_sync_spark.functions.sampling import pack_sequences  # noqa: E402
from tmdb_sync_spark.functions.text import tokens_expr  # noqa: E402
from tmdb_sync_spark.io import table  # noqa: E402
from tmdb_sync_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("pack-ramp", cpus="32")
    docs = table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", F.size(tokens_expr(F.col("text"))).alias("n_tokens")
    ).cache()
    base.count()

    def ramp(mult: int) -> tuple[int, float]:
        if mult == 1:
            df = base
        else:
            df = (
                base.crossJoin(
                    spark.range(mult).withColumnRenamed("id", "r")
                )
                .select(
                    (F.col("doc_id") * mult + F.col("r")).alias("doc_id"),
                    "n_tokens",
                )
            )
        df = df.cache()
        n = df.count()
        sink = (
            pack_sequences(df, max_tokens=512)
            .write.format("noop").mode("overwrite")
        )
        sink.save()                      # prime (codegen, shuffles)
        t0 = time.time()
        sink.save()
        dt = time.time() - t0
        df.unpersist()
        return n, dt

    for m in (1, 4, 16, 64):
        n, dt = ramp(m)
        print(f"x{m}: {n} docs, {dt:.2f}s")


if __name__ == "__main__":
    main()
