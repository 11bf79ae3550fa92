"""Degenerate-input sweep over the round-6 operational surface
(the same discipline as the registered queries' empty-corpus sweep):
empty corpora, empty drops, and empty eval sets must produce empty —
never crash, never fabricate."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, FloatType, LongType, StringType, StructField, StructType,
)

DOC_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])
VEC_SCHEMA = StructType([
    StructField("vec_id", LongType()),
    StructField("embedding", ArrayType(FloatType())),
])


def _empty_docs(spark):
    return spark.createDataFrame([], DOC_SCHEMA)


def test_sampling_on_empty_corpus(spark):
    from tmdb_sync_spark.functions.sampling import (
        pack_sequences, split_corpus, stratified_sample,
    )

    e = _empty_docs(spark)
    assert split_corpus(e).count() == 0
    assert stratified_sample(e, "lang", 0.5).count() == 0
    # n_buckets derivation survives a NULL token mass
    packed = pack_sequences(
        e.select("doc_id", F.lit(None).cast("long").alias("n_tokens"))
        .where(F.lit(False)),
        max_tokens=100,
    )
    assert packed.count() == 0


def test_jsonl_of_only_blank_lines(spark, tmp_path):
    from tmdb_sync_spark.sources.files import read_jsonl

    p = os.path.join(str(tmp_path), "blank.jsonl")
    with open(p, "w") as fh:
        fh.write("\n\n   \n")
    clean, dead = read_jsonl(spark, p, "doc_id bigint, text string")
    assert clean.count() == 0 and dead.count() == 0


def test_dedup_index_empty_drop(spark, tmp_path):
    from tmdb_sync_spark.functions.dedup_index import (
        dedup_against_index, index_exists,
    )

    idx = os.path.join(str(tmp_path), "idx")
    r = dedup_against_index(spark, _empty_docs(spark), idx)
    assert r["survivors"].count() == 0
    assert r["n_dropped_vs_index"] == 0 == r["n_dropped_in_batch"]
    assert r["dropped_vs_index"].count() == 0
    assert r["dropped_in_batch"].count() == 0
    # an empty drop must not conjure an index
    assert not index_exists(idx)


def test_vector_index_empty_drop(spark, tmp_path):
    from tmdb_sync_spark.functions.vector_index import (
        dedup_vectors_against_index, vector_index_exists,
    )

    idx = os.path.join(str(tmp_path), "vidx")
    r = dedup_vectors_against_index(
        spark, spark.createDataFrame([], VEC_SCHEMA), idx
    )
    assert r["survivors"].count() == 0
    assert r["invalid"] == []
    assert not vector_index_exists(idx)


def test_contamination_empty_eval(spark, tmp_path):
    from tmdb_sync_spark.functions.dedup_index import (
        contamination_check, dedup_against_index,
    )

    idx = os.path.join(str(tmp_path), "idx")
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(40)), "en")], DOC_SCHEMA
    )
    dedup_against_index(spark, docs, idx)
    rep = contamination_check(spark, idx, _empty_docs(spark))
    assert rep.count() == 0


def test_ingest_empty_drop_dir(spark, tmp_path):
    from tmdb_sync_spark.plans.partitioned import read_partitioned
    from tmdb_sync_spark.streaming.file_ingest import ingest_file_stream

    src = os.path.join(str(tmp_path), "drops")
    state = os.path.join(str(tmp_path), "state")
    os.makedirs(src)
    res = ingest_file_stream(
        spark, src, "doc_id bigint, text string, lang string", state,
        keys=["doc_id"], partition_col="lang",
    )
    assert res["dead"] == 0
    # the table bootstraps empty and reads as zero rows
    assert read_partitioned(spark, res["table_path"]).count() == 0
