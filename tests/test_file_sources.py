"""Contracts for the JSONL/CSV boundary readers
(tmdb_sync_spark/sources/files.py): schema-exact round-trip against the
parquet documents table, corrupt-row dead-lettering with the raw line
preserved, and the refuse-to-infer rule."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from tmdb_sync_spark.io import table
from tmdb_sync_spark.sources.files import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
    write_jsonl,
)

DOC_DDL = (
    "doc_id bigint, text string, lang string, source string, "
    "n_chars bigint"
)


def _frames_equal(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_jsonl_round_trip_matches_parquet(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents")
    out = os.path.join(str(tmp_path), "docs_jsonl")
    write_jsonl(docs, out)
    clean, dead = read_jsonl(spark, out, DOC_DDL)
    assert dead.count() == 0
    assert [f.simpleString() for f in clean.schema.fields] == [
        f.simpleString() for f in docs.schema.fields
    ]
    assert _frames_equal(clean, docs)


def test_jsonl_corrupt_rows_dead_letter(spark, tmp_path):
    p = os.path.join(str(tmp_path), "mixed.jsonl")
    lines = [
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", '
        '"n_chars": 2}',
        'this is not json at all',
        '{"doc_id": "NOT_A_NUMBER", "text": "typed wrong", '
        '"lang": "en", "source": "s", "n_chars": 0}',
        '{"doc_id": 2, "text": "also ok", "lang": "de", '
        '"source": "s", "n_chars": 7}',
        '{broken',
    ]
    with open(p, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    clean, dead = read_jsonl(spark, p, DOC_DDL)
    assert clean.count() == 2
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
    got_dead = sorted(r["raw_record"] for r in dead.collect())
    # every malformed line survives VERBATIM
    assert lines[1] in got_dead and lines[4] in got_dead
    assert any("NOT_A_NUMBER" in d for d in got_dead)
    assert len(got_dead) == 3


def test_csv_round_trip_and_dead_letter(spark, tmp_path):
    p = os.path.join(str(tmp_path), "docs.csv")
    with open(p, "w") as fh:
        fh.write("doc_id,text,lang,source,n_chars\n")
        fh.write("1,hello,en,s,5\n")
        fh.write("oops,not_a_long,en,s,0\n")
        fh.write("2,welt,de,s,4\n")
    clean, dead = read_csv(spark, p, DOC_DDL)
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
    deads = dead.collect()
    assert len(deads) == 1 and "oops" in deads[0]["raw_record"]


def test_jsonl_gzip_round_trip(spark, sf_dir, tmp_path):
    """The documented export path: gzip JSONL re-reads losslessly (one
    whole file per task — the docstring's many-medium-files guidance)."""
    docs = table(spark, sf_dir, "documents")
    out = os.path.join(str(tmp_path), "docs_gz")
    write_jsonl(docs, out, compression="gzip")
    import glob
    assert glob.glob(os.path.join(out, "*.json.gz"))
    clean, dead = read_jsonl(spark, out, DOC_DDL)
    assert dead.count() == 0
    assert _frames_equal(clean, docs)


def test_csv_quoted_sep_ok_embedded_newline_dead_letters(spark, tmp_path):
    """Quoted separators parse; an embedded NEWLINE splits the row and
    both halves dead-letter (the splittable-scan trade, documented)."""
    p = os.path.join(str(tmp_path), "quoted.csv")
    with open(p, "w") as fh:
        fh.write("doc_id,text,lang,source,n_chars\n")
        fh.write('1,"hello, world",en,s,12\n')
        fh.write('2,"broken\nrow",en,s,9\n')
    clean, dead = read_csv(spark, p, DOC_DDL)
    rows = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert rows == {1: "hello, world"}
    assert dead.count() == 2


@pytest.mark.slow
def test_jsonl_round_trip_hypothesis_unicode(spark, tmp_path):
    """Property: ANY unicode text survives write_jsonl → read_jsonl
    bit-exactly with zero dead letters (JSON escaping handles embedded
    newlines, quotes, control chars — the line scan never splits a
    document because \\n inside a JSON string is escaped, not literal).
    The repo has caught real cross-engine unicode divergences before
    (the \\x0B tokenizer incident); this pins the boundary the same
    way."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    out_root = str(tmp_path)
    case = [0]

    @settings(
        max_examples=20, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        texts=st.lists(st.text(max_size=60), min_size=1, max_size=6),
    )
    def check(texts):
        case[0] += 1
        out = os.path.join(out_root, f"hyp{case[0]}")
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        write_jsonl(df, out)
        clean, dead = read_jsonl(spark, out, "doc_id long, text string")
        assert dead.count() == 0
        got = {r["doc_id"]: r["text"] for r in clean.collect()}
        assert got == {i: t for i, t in enumerate(texts)}

    check()


def test_schema_with_corrupt_col_refused(spark):
    with pytest.raises(ValueError):
        read_jsonl(spark, "/nonexistent", f"a bigint, {CORRUPT_COL} string")


def test_jsonl_embeddings_array_round_trip(spark, sf_dir, tmp_path):
    """array<float> survives the JSONL boundary bit-exactly (Spark's
    JSON float rendering is shortest-repr, so text→float32 round-trips
    losslessly) — the multimodal/vector tables can travel as JSONL."""
    emb = table(spark, sf_dir, "embeddings")
    out = os.path.join(str(tmp_path), "emb_jsonl")
    write_jsonl(emb, out)
    clean, dead = read_jsonl(
        spark, out, "vec_id bigint, embedding array<float>, label int"
    )
    assert dead.count() == 0
    assert _frames_equal(clean, emb)


def test_jsonl_binary_media_round_trip(spark, sf_dir, tmp_path):
    """Multimodal binary payloads survive the JSONL boundary bit-exactly
    (Spark renders binary as base64 and from_json parses it back) — the
    media stripe built by the multimodal encoder round-trips whole."""
    from tmdb_sync_spark.functions.multimodal import (
        MEDIA_SCHEMA, encode_media,
    )

    docs = table(spark, sf_dir, "documents").limit(50)
    media = docs.mapInPandas(encode_media, MEDIA_SCHEMA)
    out = os.path.join(str(tmp_path), "media_jsonl")
    write_jsonl(media, out)
    clean, dead = read_jsonl(spark, out, MEDIA_SCHEMA)
    assert dead.count() == 0
    assert _frames_equal(clean, media)


def test_jsonl_feeds_the_pipeline(spark, sf_dir, tmp_path):
    """The intended use: a JSONL-delivered corpus flows into the same
    operators the parquet table does — token features over the clean
    side produce identical results either way."""
    from tmdb_sync_spark.functions.text import tokens_expr

    docs = table(spark, sf_dir, "documents")
    out = os.path.join(str(tmp_path), "docs_jsonl2")
    write_jsonl(docs, out)
    clean, _ = read_jsonl(spark, out, DOC_DDL)
    a = docs.select("doc_id", F.size(tokens_expr(F.col("text"))).alias("n"))
    b = clean.select("doc_id", F.size(tokens_expr(F.col("text"))).alias("n"))
    assert _frames_equal(a, b)
