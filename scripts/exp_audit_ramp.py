#!/usr/bin/env python3
"""Index-backed contamination-audit ramp at 1x/16x (r10 verdict #4).

exp_verify_ramp.py pinned the exact-span VERIFY stage flat at 16x, but
its detection side was the non-index ``substring_overlap`` (a full
corpus fingerprint pass — the honest cost when no index exists). The
PRODUCTION audit path amortizes exactly that pass into the persisted
winnow-fingerprint index:

    append_fingerprints_to_index   (once per corpus drop, linear)
    substring_contamination_check  (per eval set — bucket-pruned probe)
    verify_substring_spans         (per detected pair set)

Expectation, stated before measuring: the index BUILD is the linear
corpus cost and must scale ~16x; the PROBE is bounded by the eval set's
fingerprints (bucket pruning + broadcast probe + fp semi-join before
anything widens) so its wall must stay ~FLAT across a 16x index; VERIFY
is bounded by the detected pair set (fixed 25 planted excerpts at every
scale) and must stay ~FLAT as well. The planted excerpts pin
correctness at both scales: 25 pairs detected, 25 exact spans.

Walls are the second rep (first pays codegen/JIT).

r12 extension (r11 verdict #5): scales are env-configurable
(AUDIT_RAMP_SCALES, default "1,16,64") — at 64x a hidden linear term in
the probe would be ~4x more visible than the 16x pass could show. Each
scale also times the components fixpoint loop (min_label_components at
its shipped 50k-rows/task sizing) on a sign-LSH edge list built from
the scaled embeddings with occupancy-constant bits
(N_DUP_BITS + log4(k), the production knob from exp_scale_ramp group
B); edge GENERATION is excluded from the timed window — the loop is
the iterative part under test.

Usage: python scripts/exp_audit_ramp.py
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scripts.exp_scale_ramp import build_scaled
from tmdb_sync_spark.session import get_spark


def main() -> None:
    from tmdb_sync_spark.functions.audit import verify_substring_spans
    from tmdb_sync_spark.functions.winnow_index import (
        append_fingerprints_to_index,
        substring_contamination_check,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp-audit-ramp")
    spark.sparkContext.setLogLevel("ERROR")

    # the same 25 planted excerpts as exp_verify_ramp: 160-char slices
    # of base-corpus docs, wrapped in nothing (q_start=1, match_len=160)
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    eval_docs = (
        base.where((F.col("doc_id") % 97 == 0) & (F.length("text") >= 250))
        .limit(25)
        .select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.substring("text", 20, 160).alias("text"),
        )
        .localCheckpoint()
    )
    assert eval_docs.count() == 25

    scales = [
        int(s)
        for s in os.environ.get("AUDIT_RAMP_SCALES", "1,16,64").split(",")
    ]
    for k in scales:
        scaled = build_scaled(spark, k)
        docs = spark.read.parquet(f"{scaled}/documents.parquet")
        tmp = tempfile.mkdtemp(prefix="auditramp_")
        idx = os.path.join(tmp, "fingerprints")
        t0 = time.perf_counter()
        append_fingerprints_to_index(spark, idx, docs)
        build_s = time.perf_counter() - t0
        # 3 reps, best reported: generated-code JIT tiers up over the
        # first few executions of a new plan shape, so the x1 pass (the
        # process's first heavy plans) reads inflated on reps 1-2 —
        # the first run of this script recorded x1 probe 13.5 s vs x16
        # 9.8 s for the same fixed eval set, pure warm-up artifact.
        probe_reps, verify_reps = [], []
        for rep in range(3):
            t0 = time.perf_counter()
            pairs = substring_contamination_check(
                spark, idx, eval_docs
            ).localCheckpoint(eager=True)
            n_pairs = pairs.count()
            probe_reps.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            spans = verify_substring_spans(
                eval_docs,
                docs.select("doc_id", "text"),
                pairs,
            ).collect()
            verify_reps.append(time.perf_counter() - t0)
        exact = sum(
            1 for s in spans if s["q_start"] == 1 and s["match_len"] == 160
        )
        print(
            f"x{k}: corpus={docs.count()} build={build_s:.1f}s "
            f"probe={min(probe_reps):.2f}s pairs={n_pairs} "
            f"verify={min(verify_reps):.2f}s spans={len(spans)} "
            f"planted_exact_spans={exact} (>=25: the base corpus's own "
            f"near-dup docs legitimately multi-match) "
            f"probe_reps={[round(r, 2) for r in probe_reps]} "
            f"verify_reps={[round(r, 2) for r in verify_reps]}",
            flush=True,
        )
        # components fixpoint at this scale (r11 verdict #5): edges from
        # the scaled embeddings with occupancy-constant bucket bits
        # (+2 per 4x — exp_scale_ramp group B's production knob); edge
        # generation checkpointed OUTSIDE the timed window.
        import math

        from tmdb_sync_spark.functions.dedup import min_label_components
        from tmdb_sync_spark.functions.similarity import (
            DUP_THRESHOLD,
            N_DUP_BITS,
            _dup_candidate_pairs,
        )

        bits = N_DUP_BITS + 2 * int(round(math.log(k, 4)))
        edges = (
            _dup_candidate_pairs(spark, scaled, bits)
            .where(F.col("cosine_sim") >= DUP_THRESHOLD)
            .select(
                F.col("a.vec_id").alias("u"), F.col("b.vec_id").alias("w")
            )
            .localCheckpoint()
        )
        n_edges = edges.count()
        comp_reps, stats = [], {}
        for rep in range(3):
            stats = {}
            t0 = time.perf_counter()
            n_labels = min_label_components(
                edges, stats=stats, edges_materialized=True
            ).count()
            comp_reps.append(time.perf_counter() - t0)
        print(
            f"x{k}: components edges={n_edges} bits={bits} "
            f"labels={n_labels} rounds={stats.get('rounds')} "
            f"loop_parts={stats.get('shuffle_partitions')} "
            f"wall={min(comp_reps):.2f}s "
            f"reps={[round(r, 2) for r in comp_reps]}",
            flush=True,
        )
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
