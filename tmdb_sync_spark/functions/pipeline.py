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
    QUALITY_SQL,
    quality_score_expr,
    tokens_expr,
)
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
               len(regexp_split_to_array(trim(text), '\\s+')) AS ntok
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
    # Staging tables, not persist(): the filtered corpus feeds BOTH the
    # signature branch and the final anti-join, and the signature fans
    # out into three branches of one downstream action — a lazily-filled
    # executor cache can race (concurrent branches each recompute the
    # md5-heavy shingling before the cache fills) and holds the whole
    # kept corpus in executor storage, a real cost cliff at 100 TB.
    # materialize_once runs each stage exactly once into a scratch
    # parquet table (keyed on sf_dir — bounded /tmp across invocations)
    # and every consumer reads the files; nothing lives in storage memory.
    from tmdb_sync_spark.util import file_fingerprint, materialize_once

    # content fingerprint in both keys: a driver-side regeneration of
    # documents.parquet must miss these caches, not serve stale stages
    docs_fp = file_fingerprint(f"{sf_dir}/documents.parquet")
    row = F.struct("doc_id", "text", "lang", "q", "ntok")
    kept_exact = materialize_once(
        quality.groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(F.min_by(row, "doc_id").alias("r"))
        .select("r.*"),
        cache_key=("cur_kept", sf_dir, docs_fp),
        prefix="cur_kept_",
    )

    # near-dup candidates: banded minhash equi-join (dd_minhash_lsh's
    # shared shape), then the overlap filter picks real near-dups.
    # repartition first: the staged table's files coalesce into very few
    # input splits (maxPartitionBytes), which would serialize the
    # md5-heavy shingling onto one core — spread the CPU-bound stage
    # across the cluster before it, not after.
    sig = materialize_once(
        minhash_signature(
            kept_exact.select("doc_id", "text")
            .repartition(spark.sparkContext.defaultParallelism)
        ),
        cache_key=("cur_sig", sf_dir, docs_fp),
        prefix="cur_sig_",
    )
    drops = (
        banded_pairs_with_overlap(sig)
        .where(F.col("n_equal_hashes") >= NEAR_DUP_MIN)
        .select(F.col("doc_b").alias("drop_id"))
        .distinct()
    )
    final = kept_exact.join(
        drops, kept_exact.doc_id == drops.drop_id, "left_anti"
    )
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
