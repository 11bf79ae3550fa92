"""Cross-engine parity on HOSTILE text the synthetic corpus never has.

Spark compiles regex with Java's engine, DuckDB with RE2 — their
definitions of innocent-looking classes differ (found live: Java ``\\s``
includes the vertical tab U+000B, RE2's does not, so one document with a
``\\x0B`` shifted seven feature columns of ``tx_text_features`` and broke
three operators' hash parity). The engine therefore spells whitespace as
an explicit class (``text.WS_CHARS``) in BOTH engines; this module pins
that contract against a corpus of emoji, CJK, RTL, exotic whitespace
(NBSP, ideographic space, zero-width space, vertical tab), combining
characters, case-folding traps (ß, dotted İ), surrogate pairs, and the
empty/whitespace-only degenerates.

NBSP/U+3000/zero-width are deliberately NOT in the whitespace class
(neither engine's ``\\s`` has them): they glue words into one token, the
same choice a bytes-faithful pretraining tokenizer makes.
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402

HOSTILE_TEXTS = [
    "ascii baseline words here",
    "emoji \U0001F3AC\U0001F3A5 mixed ascii",
    "CJK 電影資料庫 测试 文本",
    "RTL مرحبا بالعالم text",
    "nbsp separated words",
    "ideographic　space　words",
    "zero​width​joined",
    "tab\tand\nnewline\rand\x0bvtab mix",       # the divergence finder
    "Ünïcödé àccénts ÉLÉGANT tester",
    "ß sharp s and İstanbul dotted I",
    "combining é acute vs precomposed é",
    "",
    "   ",
    "word " * 200,
    "ONE",
    "punct!!! ??? ... ;;; ::: (((",
    "digits 12345 67890 mixed 3.14159",
    "repeat repeat repeat repeat repeat",
    "surrogate pair \U0001D518\U0001D52B\U0001D526\U0001D520\U0001D52C\U0001D521\U0001D522 math",
    "the and of is a to in the and of",         # all stopwords
]

# text-reading queries whose Spark/DuckDB twins must hash-match on this
# (looked up across BOTH registries — driver slots rotate, the hostile
# bar does not: dd_ngram_jaccard faces it from the retired registry)
TEXT_QUERIES = [
    "tx_text_features", "tx_ngram_topk", "dd_exact", "dd_minhash_lsh",
    "dd_simhash_fingerprint", "dd_ngram_jaccard", "dd_cluster_components",
    "pipeline_curation",
    # r8 rotation: the new text-reading registry entries face the same
    # hostile corpus (unicode classes, WS zoo, NULL text/lang/size edges)
    "chunk_documents", "repetition_stats", "corpus_report",
    "export_shard_layout",
    # r9: winnowed fingerprints read raw text (multi-byte substr + md5)
    "wn_substring_overlap",
    # r11: the three-lens audit verdict surface — staged index builds
    # must digest NULL text, and every lens's pair rule must agree with
    # its declarative twin on multibyte/WS-zoo/near-dup-twin plants
    "audit_verdicts",
    # r12: the lexical split-leakage audit shingles the same hostile
    # text (plus an md5 split label over ids), and the per-group cap
    # must agree on the NULL-lang group and NULL-n_chars ordering
    "lk_split_leakage", "sp_cap_per_group",
]


@pytest.fixture(scope="module")
def hostile_sf(spark, sf_dir) -> str:
    import duckdb

    d = tempfile.mkdtemp(prefix="sf_hostile_")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"]:
        shutil.copyfile(f"{sf_dir}/{t}.parquet", f"{d}/{t}.parquet")
    rows = []
    for i, t in enumerate(HOSTILE_TEXTS):
        rows.append((i, t, ["en", "zh", "ar", "de"][i % 4], "hostile", len(t)))
        if i % 5 == 0:   # near-dup twins exercise the LSH/jaccard paths
            rows.append((1000 + i, t + " near dup tail", "en", "hostile",
                         len(t) + 14))
    # NULL edges for the rollup/profile/chunk paths: NULL text (chunks
    # of nothing are nothing), NULL lang (a genuine NULL dim value vs
    # the rolled-up level — grouping_id must disambiguate), NULL size
    # (counted in n_docs, excluded from mass aggregates)
    rows.append((2001, None, "en", "hostile", None))
    rows.append((2002, "null lang doc", None, "hostile", 13))
    rows.append((2003, "null size doc", "de", "hostile", None))
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
                " source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", rows)
    con.execute(f"COPY d TO '{d}/documents.parquet' (FORMAT PARQUET)")
    con.close()
    return d


def _canon(df) -> list[str]:
    import numpy as np
    import pandas as pd

    p = df if isinstance(df, pd.DataFrame) else df.toPandas()
    p = p.reindex(sorted(p.columns), axis=1)

    def cell(v):
        if v is None or v is pd.NaT:
            return "<NULL>"
        if isinstance(v, (bool, np.bool_)):
            return str(bool(v))
        if isinstance(v, (float, np.floating)):
            return "<NULL>" if math.isnan(v) else repr(float(v))
        if isinstance(v, (int, np.integer)):
            return repr(float(v))
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return str(v)

    return sorted(
        "|".join(cell(v) for v in r) for r in p.itertuples(index=False)
    )


@pytest.mark.parametrize("name", TEXT_QUERIES)
def test_text_query_parity_on_hostile_corpus(spark, hostile_sf, name):
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{hostile_sf}/{t}.parquet')"
        )
    from tmdb_sync_spark.registry import RETIRED_ORACLES, RETIRED_QUERIES

    queries = {**E.queries(), **RETIRED_QUERIES}
    oracles = {**E.oracle_sql(), **RETIRED_ORACLES}
    got = _canon(queries[name](spark, hostile_sf))
    want = _canon(con.execute(oracles[name]).df())
    con.close()
    assert got == want, f"{name} diverges on hostile text"
