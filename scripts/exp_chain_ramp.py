#!/usr/bin/env python3
"""End-to-end trainer-pipeline ramp (r7 verdict #3): the COMPOSED chain

  file-drop ingest (parse → dead-letter → index dedup → MERGE → profile)
  → quality_gate → incremental profile report → split + leakage audit
  → cap_per_group → mix_sources → pack_sequences
  → export_training_shards → read_training_shards (manifest-verified)

measured whole and per stage at 1x/16x/64x of sf0.1's documents.
Cross-operator cliffs (a gate's audit aggregate feeding the index's
repartition, the profile read fanning into the leakage join) only show
up composed — each operator's own ramp already exists piecewise
(exp_scale_ramp, exp_index_ramp, exp_profile_ramp, exp_export_ramp,
exp_pack_ramp).

Scale posture choices mirrored from production shapes:
- drops arrive as N_DROPS jsonl files per scale (the ingest's unit of
  exactly-once), so ingest cost includes the real parse + dead-letter
  + per-batch index/profile maintenance;
- the dedup index uses scaled_dup_bits-equivalent occupancy via the
  minhash band index (band keys don't need the knob — band cardinality
  grows with the corpus by construction);
- export shard count scales with the corpus (constant target shard
  size), so writer-task memory stays flat.

Output: one table row per scale with per-stage seconds + state sizes
(index files, profile drops, leak pairs, packs, shards). Wall times are
single-shot (the chain is stateful; a warm rep would re-ingest nothing)
— compare SHAPE across scales, not absolute numbers.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tmdb_sync_spark.session import get_spark
from scripts.exp_scale_ramp import build_scaled

ROOT = "/tmp/spark_graft_chain_ramp"
SCALES = [
    int(s)
    for s in os.environ.get("SPARK_GRAFT_CHAIN_SCALES", "1,16,64").split(",")
]
N_DROPS = 4
DOC_DDL = (
    "doc_id bigint, text string, lang string, source string, "
    "n_chars bigint"
)


def make_drops(spark, sf_dir: str, out: str) -> None:
    """The scaled corpus as N_DROPS jsonl drop files (+1 corrupt line
    per drop so the dead-letter path is exercised, not skipped)."""
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for d in range(N_DROPS):
        part = docs.where(F.col("doc_id") % N_DROPS == d)
        tmp = f"{out}/_tmp{d}"
        part.coalesce(1).write.mode("overwrite").json(tmp)
        src = next(
            f for f in os.listdir(tmp)
            if f.startswith("part-") and f.endswith(".json")
        )
        with open(os.path.join(tmp, src), "a") as fh:
            fh.write("{corrupt line, dead-letters\n")
        os.replace(os.path.join(tmp, src), os.path.join(out, f"drop{d}.jsonl"))
        shutil.rmtree(tmp, ignore_errors=True)


def run_chain(spark, sf_dir: str, work: str) -> dict:
    from tmdb_sync_spark.functions.export import (
        export_training_shards,
        mix_sources,
        read_training_shards,
    )
    from tmdb_sync_spark.functions.leakage import (
        leakage_rates,
        split_leakage_audit,
    )
    from tmdb_sync_spark.functions.sampling import (
        cap_per_group,
        pack_sequences,
        split_corpus,
    )
    from tmdb_sync_spark.functions.stats import incremental_report
    from tmdb_sync_spark.functions.text import quality_gate
    from tmdb_sync_spark.plans.partitioned import read_partitioned
    from tmdb_sync_spark.streaming.file_ingest import ingest_file_stream

    t: dict[str, float] = {}
    sizes: dict[str, int] = {}

    def stage(name):
        class _S:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *a):
                t[name] = round(time.perf_counter() - self.t0, 2)

        return _S()

    drops = os.path.join(work, "drops")
    state = os.path.join(work, "state")
    idx = os.path.join(work, "sig_index")
    prof = os.path.join(work, "profile")

    with stage("ingest"):
        res = ingest_file_stream(
            spark, drops, DOC_DDL, state,
            keys=["doc_id"], partition_col="lang",
            dedup_index_path=idx, profile_path=prof,
        )
        corpus = read_partitioned(spark, res["table_path"])
        sizes["corpus_rows"] = corpus.count()
    sizes["dead"] = res["dead"]
    sizes["near_dups"] = res["near_dups"]
    sizes["index_files"] = sum(
        1
        for e in os.scandir(idx)
        if e.is_dir() and e.name.startswith("bb=")
        for f in os.listdir(e.path)
        if f.endswith(".parquet")
    )
    sizes["profile_drops"] = sum(
        1 for e in os.listdir(prof) if e.startswith("drop=")
    )

    with stage("gate"):
        g = quality_gate(corpus, thresholds={"max_top_ngram_frac": 0.80})
        kept = g["kept"].localCheckpoint()  # the chain's working set
        sizes["kept_rows"] = kept.count()

    with stage("profile_report"):
        rep = incremental_report(spark, prof, ("source",)).collect()
        sizes["profile_groups"] = len(rep)

    with stage("leakage"):
        labeled = split_corpus(kept, seed=11)
        leaks = split_leakage_audit(labeled, split_col="split")
        rates = leakage_rates(labeled, leaks).collect()
        sizes["leak_splits"] = len(rates)

    with stage("cap_mix_pack"):
        capped = cap_per_group(kept, "source", "n_chars", 200)
        srcs = [
            r["source"]
            for r in capped.groupBy("source").count()
            .orderBy(F.desc("count"), "source").limit(2).collect()
        ]
        mixed = mix_sources(
            {srcs[0]: (capped.where(F.col("source") == srcs[0]), 2.0),
             srcs[1]: (capped.where(F.col("source") == srcs[1]), 1.0)},
            seed=11, source_col="mix_source",
        )
        train = (
            split_corpus(mixed, seed=11)
            .where(F.col("split") == "train")
            .drop("split")
            .localCheckpoint()
        )
        packs = pack_sequences(
            train.withColumn("n_tokens", F.col("n_chars")), 4096
        )
        sizes["packs"] = packs.select("pack_id").distinct().count()
        sizes["train_rows"] = train.count()

    with stage("export_read"):
        out = os.path.join(work, "train_v1")
        n_shards = max(4, sizes["train_rows"] // 2000)
        m = export_training_shards(
            train, out, n_shards, seed=11, tokens_col="n_chars"
        )
        back = read_training_shards(spark, out)
        assert back.count() == m["total_rows"] == sizes["train_rows"]
        sizes["shards"] = m["n_shards"]

    t["total"] = round(sum(v for k, v in t.items() if k != "total"), 2)
    return {"stages_sec": t, "sizes": sizes}


def main() -> None:
    spark = get_spark("exp-chain-ramp")
    spark.sparkContext.setLogLevel("ERROR")

    rows = {}
    for k in SCALES:
        sf = build_scaled(spark, k)
        work = os.path.join(ROOT, f"x{k}")
        shutil.rmtree(work, ignore_errors=True)
        os.makedirs(work, exist_ok=True)
        make_drops(spark, sf, os.path.join(work, "drops"))
        rows[k] = run_chain(spark, sf, work)
        print(f"x{k}: {json.dumps(rows[k])}", flush=True)

    print("\n== chain ramp summary ==", flush=True)
    base = rows[SCALES[0]]["stages_sec"]["total"]
    for k in SCALES:
        r = rows[k]
        print(
            f"x{k}: total={r['stages_sec']['total']}s "
            f"({r['stages_sec']['total'] / base:.1f}x base), "
            + ", ".join(
                f"{s}={v}s" for s, v in r["stages_sec"].items()
                if s != "total"
            ),
            flush=True,
        )

    if os.environ.get("SPARK_GRAFT_RAMP_KEEP") != "1":
        shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
