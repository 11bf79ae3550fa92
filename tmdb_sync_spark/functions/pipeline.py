"""End-to-end training-data curation pipeline (SURVEY.md Phase 5 capstone).

The canonical 100 TB pretraining-corpus flow, composed from this engine's
operator library in ONE lazy plan:

    raw corpus
      → quality filter        (deterministic heuristic, map-side)
      → exact dedup           (md5 hash-group, keep min doc_id)
      → near-dup removal      (MinHash banding → candidate equi-join →
                               signature-overlap filter → greedy keep-first)
      → per-language summary  (exact counters)

Scale shape: the only shuffles are the exact-dedup hash group, the
minhash min-agg, the banded candidate equi-join, and the final summary —
each keyed on uniform hashes or bounded keys. No cross joins, no driver
materialization; the near-dup drop is a broadcast-able anti-join on the
(small) drop set.

Near-dup policy: a document is dropped when it shares ≥ ``NEAR_DUP_MIN``
of ``N_HASHES`` minhashes with a smaller-id document among band-join
candidates — the greedy keep-first rule (transitive closure is available
via ``min_label_components`` when cluster-exact policy is required; kept
greedy here so the oracle stays a pure anti-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tmdb_sync_spark.functions.dedup import (
    N_BANDS,
    N_HASHES,
    SIGS_CTE,
    banded_pairs_with_overlap,
    minhash_signature,
    shingle_sql,
)
from tmdb_sync_spark.functions.text import (
    WS_SQL,
    QUALITY_SQL,
    quality_score_expr,
    tokens_expr,
    trim_sql,
)

_TRIM = trim_sql("text")
from tmdb_sync_spark.io import parallel_table
from tmdb_sync_spark.registry import register

QUALITY_MIN = 0.8     # keeps only full-score docs (corpus has {0.7, 1.0})
NEAR_DUP_MIN = 6      # of N_HASHES equal minhashes ⇒ near-duplicate

_BAND_COND = " OR ".join(
    f"(a.h{2 * j} = b.h{2 * j} AND a.h{2 * j + 1} = b.h{2 * j + 1})"
    for j in range(N_BANDS)
)
_N_EQUAL = " + ".join(f"(a.h{i} = b.h{i})::INT" for i in range(N_HASHES))


@register(
    "pipeline_curation",
    oracle=f"""
    WITH quality AS (
        SELECT doc_id, text, lang,
               {QUALITY_SQL} AS q,
               len(regexp_split_to_array({_TRIM}, '[{WS_SQL}]+')) AS ntok
        FROM documents
    ),
    kept_q AS (SELECT * FROM quality WHERE q >= {QUALITY_MIN}),
    kept_exact AS (
        SELECT doc_id, text, lang, q, ntok FROM (
            SELECT *, row_number() OVER (
                PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM kept_q) WHERE rn = 1
    ),
    {shingle_sql("kept_exact")},
    {SIGS_CTE},
    drops AS (
        SELECT DISTINCT b.doc_id
        FROM sigs a
        JOIN sigs b ON a.doc_id < b.doc_id AND ({_BAND_COND})
        WHERE ({_N_EQUAL}) >= {NEAR_DUP_MIN}
    ),
    final AS (
        SELECT k.* FROM kept_exact k
        WHERE NOT EXISTS (SELECT 1 FROM drops d WHERE d.doc_id = k.doc_id)
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(ntok) AS BIGINT) AS total_tokens,
           CAST(SUM(CAST(q AS DECIMAL(4,1))) AS DOUBLE) AS sum_quality
    FROM final
    GROUP BY lang
    ORDER BY lang
    """,
)
def pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter → exact-dedup → near-dup-drop → summarize, one plan."""
    final = curated_corpus(spark, sf_dir)
    return (
        final.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").cast("long").alias("total_tokens"),
            F.sum(F.col("q").cast("decimal(4,1)")).cast("double")
             .alias("sum_quality"),
        )
        .orderBy("lang")
    )


def curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline's KEPT corpus — ``(doc_id, lang, q, ntok)`` after
    quality filter + exact dedup + near-dup drop — exposed as the
    trainer handoff: compose with ``functions.sampling`` (split the
    kept set, pack the train split) without re-running curation.
    :func:`pipeline_curation` (the registered query) is exactly this
    frame summarized per language."""
    docs = parallel_table(spark, sf_dir, "documents").withColumn(
        # tokens materialized once (single-sourced tokenizer — a drifted
        # copy would desynchronize from QUALITY_SQL); the quality expr's
        # stopword filter reads the attribute instead of re-splitting
        # per element
        "_toks", tokens_expr(F.col("text"))
    )
    quality = docs.select(
        "doc_id", "text", "lang",
        quality_score_expr(F.col("text"), tokens=F.col("_toks")).alias("q"),
        F.size("_toks").alias("ntok"),
    ).where(F.col("q") >= QUALITY_MIN)

    # exact dedup: one shuffle on the (uniform) md5 key, min_by keeps the
    # smallest doc_id — identical to dd_exact's canonical-id policy.
    # ONE staging table, not persist() and not two: the kept corpus used
    # to stage once for itself and once for its signature — two full
    # passes. The signature aggregation now CARRIES the doc-level
    # summary columns (constant per doc, F.first through the same
    # map-side combine), so a single scratch parquet table serves both
    # the banded self-join (reads doc_id+h*) and the final summary
    # (reads doc_id+lang+q+ntok) — parquet column pruning splits the
    # reads, nothing lives in executor storage, and at 100 TB one whole
    # write+read of the kept corpus disappears. (A lazily-filled cache
    # instead of staging would race: the signature fans out to three
    # branches of one action, each recomputing the md5-heavy shingling
    # before the cache fills.)
    from tmdb_sync_spark.util import file_fingerprint, materialize_once

    # content fingerprint in the key: a driver-side regeneration of
    # documents.parquet must miss this cache, not serve a stale stage
    docs_fp = file_fingerprint(f"{sf_dir}/documents.parquet")
    row = F.struct("doc_id", "text", "lang", "q", "ntok")
    kept_exact = (
        quality.groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(F.min_by(row, "doc_id").alias("r"))
        .select("r.*")
        # spread the md5-heavy shingling across the cluster: the dedup
        # agg's output partitioning is the md5 key's, which is fine, but
        # AQE may coalesce it small at this SF — pin the CPU-bound
        # stage's parallelism before it
        .repartition(spark.sparkContext.defaultParallelism)
    )
    staged = materialize_once(
        minhash_signature(kept_exact, carry=["lang", "q", "ntok"]),
        cache_key=("cur_kept_sig", sf_dir, docs_fp),
        prefix="cur_kept_sig_",
    )

    # near-dup candidates: banded minhash equi-join (dd_minhash_lsh's
    # shared shape), then the overlap filter picks real near-dups.
    drops = (
        banded_pairs_with_overlap(
            staged,
            probe_key=("cur_bands", sf_dir),
            probe_fingerprint=docs_fp,
        )
        .where(F.col("n_equal_hashes") >= NEAR_DUP_MIN)
        .select(F.col("doc_b").alias("drop_id"))
        .distinct()
    )
    return staged.select("doc_id", "lang", "q", "ntok").join(
        drops, staged.doc_id == drops.drop_id, "left_anti"
    )
