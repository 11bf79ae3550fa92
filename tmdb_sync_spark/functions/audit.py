"""Unified contamination audit — the three lenses as one API.

The engine keeps three independent contamination probes, each blind to
the other two's leak shape:

- **whole_doc** (``dedup_index.contamination_check``): minhash bands —
  verbatim or lightly-edited WHOLE-document inclusion;
- **substring** (``winnow_index.substring_contamination_check``):
  winnowed local fingerprints — a copied PARAGRAPH inside an
  otherwise-novel document (invisible to doc-level signatures);
- **semantic** (``vector_index.vector_index_match_pairs``): sign-LSH
  bucketed embedding cosine — paraphrase, translation, near-duplicate
  meaning with different surface text.

Operationally they were three calls with three output shapes, so every
standing eval gate re-composed them by hand (r9 verdict #6). This
module is that composition, done once:

``contamination_audit(spark, eval_docs, index_root)`` probes all three
indexes under one store root (``signatures/`` / ``vectors/`` /
``fingerprints/`` — the layout ``append_corpus_to_audit_indexes``
maintains) and returns per-pair detail, one per-doc per-lens verdict
frame, and the clean eval subset as an anti-join — lazily composed so
the caller decides what to evaluate.

Contract notes, inherited deliberately from the lens family:

- a MISSING index for a requested lens RAISES — auditing against
  nothing and reporting "clean" is the worst failure mode;
- the ``semantic`` lens needs ``eval_embeddings``; requesting it
  without them raises rather than silently skipping a lens;
- each lens's pair frame is pinned (eager ``localCheckpoint``) before
  verdict composition — the verdict/clean frames reuse the pinned
  blocks instead of re-running every probe per downstream action, and
  ``eval_docs`` is persisted across the two text-lens pins so the eval
  scan runs once, not once per lens.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tmdb_sync_spark.functions.dedup_index import (
    contamination_check,
    index_exists,
)
from tmdb_sync_spark.functions.pipeline import NEAR_DUP_MIN
from tmdb_sync_spark.functions.similarity import (
    DUP_THRESHOLD,
    N_DUP_BITS,
    bucketed_from,
)
from tmdb_sync_spark.functions.vector_index import (
    vector_index_exists,
    vector_index_match_pairs,
)
from tmdb_sync_spark.functions.winnow import (
    HOT_FP_DOC_CAP,
    MIN_SHARED_FPS,
)
from tmdb_sync_spark.functions.winnow_index import (
    fp_index_exists,
    substring_contamination_check,
)

LENSES = ("whole_doc", "substring", "semantic")

SIGNATURES_SUBDIR = "signatures"
VECTORS_SUBDIR = "vectors"
FINGERPRINTS_SUBDIR = "fingerprints"


def audit_index_paths(index_root: str) -> dict:
    return {
        "whole_doc": os.path.join(index_root, SIGNATURES_SUBDIR),
        "semantic": os.path.join(index_root, VECTORS_SUBDIR),
        "substring": os.path.join(index_root, FINGERPRINTS_SUBDIR),
    }


def append_corpus_to_audit_indexes(
    spark: SparkSession,
    index_root: str,
    docs: DataFrame,
    vecs: DataFrame | None = None,
    *,
    lock_wait_s: float = 60.0,
) -> None:
    """Maintain all audit indexes under one root from a corpus drop:
    ``docs`` is ``(doc_id, text, ...)`` (feeds the band + fingerprint
    indexes); ``vecs`` is the drop's ``(vec_id, embedding)`` rows (feeds
    the vector index; omit to leave the semantic lens unmaintained).
    Same caller contracts as the individual appends: ids NEW to the
    corpus, ordered AFTER the caller's table commit. Each index has its
    own writer lock, so the three appends serialize independently —
    this is a convenience composition, not a transaction: a crash
    between appends leaves the indexes at different drop cursors, which
    the drop-cursor replay discipline already tolerates (re-appending
    only the missing index is the caller's replay job)."""
    from tmdb_sync_spark.functions.dedup_index import append_docs_to_index
    from tmdb_sync_spark.functions.vector_index import (
        append_vectors_to_index,
    )
    from tmdb_sync_spark.functions.winnow_index import (
        append_fingerprints_to_index,
    )

    paths = audit_index_paths(index_root)
    append_docs_to_index(
        spark, paths["whole_doc"], docs, lock_wait_s=lock_wait_s
    )
    append_fingerprints_to_index(
        spark, paths["substring"], docs, lock_wait_s=lock_wait_s
    )
    if vecs is not None:
        append_vectors_to_index(
            spark, paths["semantic"], vecs, lock_wait_s=lock_wait_s
        )


def contamination_audit(
    spark: SparkSession,
    eval_docs: DataFrame,
    index_root: str,
    *,
    eval_embeddings: DataFrame | None = None,
    lenses: tuple = LENSES,
    min_equal: int = NEAR_DUP_MIN,
    min_shared: int = MIN_SHARED_FPS,
    df_cap: int = HOT_FP_DOC_CAP,
    threshold: float = DUP_THRESHOLD,
) -> dict:
    """Audit an eval set against all three contamination lenses.

    ``eval_docs``: ``(doc_id, text, ...)``. ``eval_embeddings``:
    ``(doc_id, embedding)`` — required iff ``"semantic"`` is in
    ``lenses``. Returns::

        {
          "pairs": {           # per-lens detail, pinned frames
            "whole_doc": (doc_id, corpus_doc_id, n_equal_hashes),
            "substring": (doc_id, corpus_doc_id, n_shared_fps,
                          c_span_chars),
            "semantic":  (doc_id, corpus_vec_id, cosine_sim),
          },
          "verdicts": one row per eval doc — doc_id, one boolean per
                      requested lens, and `contaminated` (any-lens OR),
          "clean":    eval_docs anti-joined on contaminated ids,
        }

    Per-lens sensitivity knobs pass through unchanged (``min_equal`` —
    bands; ``min_shared``/``df_cap`` — winnow; ``threshold`` — cosine).
    A missing index for any REQUESTED lens raises; drop a lens from
    ``lenses`` to audit without it (the verdict frame then simply lacks
    that column — absence is visible, never a silent all-clear).

    Caveat: ``eval_docs`` is persisted for the duration of the text-lens
    probes and unpersisted after — pass an unpersisted frame (a caller's
    own ``persist()`` on the SAME plan would be released with it).

    For exact matched-substring extents of the ``substring`` pairs, feed
    them through :func:`verify_substring_spans` with the corpus text.
    """
    unknown = [x for x in lenses if x not in LENSES]
    if unknown:
        raise ValueError(f"contamination_audit: unknown lenses {unknown}")
    if not lenses:
        raise ValueError("contamination_audit: no lenses requested")
    if "semantic" in lenses and eval_embeddings is None:
        raise ValueError(
            "contamination_audit: the 'semantic' lens needs "
            "eval_embeddings (doc_id, embedding) — pass them, or drop "
            "the lens explicitly with lenses=('whole_doc', 'substring')"
        )
    paths = audit_index_paths(index_root)
    missing = [
        lens for lens, ok in (
            ("whole_doc", index_exists(paths["whole_doc"])),
            ("substring", fp_index_exists(paths["substring"])),
            ("semantic", vector_index_exists(paths["semantic"])),
        )
        if lens in lenses and not ok
    ]
    if missing:
        raise ValueError(
            f"contamination_audit: no index for lens(es) {missing} under "
            f"{index_root!r} — build them with "
            "append_corpus_to_audit_indexes (auditing against nothing "
            "would report a false all-clear)"
        )

    pairs: dict[str, DataFrame] = {}
    eval_docs.persist()
    try:
        if "whole_doc" in lenses:
            pairs["whole_doc"] = contamination_check(
                spark, paths["whole_doc"], eval_docs, min_equal=min_equal,
            ).localCheckpoint(eager=True)
        if "substring" in lenses:
            pairs["substring"] = substring_contamination_check(
                spark, paths["substring"], eval_docs,
                min_shared=min_shared, df_cap=df_cap,
            ).localCheckpoint(eager=True)
    finally:
        eval_docs.unpersist()
    if "semantic" in lenses:
        # pinned once — it feeds the bucket-list collect, the broadcast
        # row-count gate, and the match join (the same 3×-evaluation
        # shape the winnow probe fixed this round)
        b = bucketed_from(
            eval_embeddings.select(
                F.col("doc_id").alias("vec_id"), "embedding"
            ),
            N_DUP_BITS,
        ).localCheckpoint(eager=True)
        bbs = [r["bucket"] for r in b.select("bucket").distinct().collect()]
        idx = spark.read.parquet(paths["semantic"])
        if bbs:
            idx = idx.where(F.col("bucket").isin(bbs))
        pairs["semantic"] = (
            vector_index_match_pairs(idx, b, threshold, probe_rows=b.count())
            .withColumnRenamed("vec_id", "doc_id")
            .localCheckpoint(eager=True)
        )

    ids = eval_docs.select("doc_id").distinct()
    verdicts = ids
    for lens in LENSES:
        if lens not in pairs:
            continue
        flagged = (
            pairs[lens].select("doc_id").distinct()
            .withColumn(lens, F.lit(True))
        )
        verdicts = verdicts.join(flagged, "doc_id", "left").withColumn(
            lens, F.coalesce(F.col(lens), F.lit(False))
        )
    flags = [F.col(lens) for lens in LENSES if lens in pairs]
    # greatest() requires ≥2 columns — a single-lens audit's verdict is
    # that lens's flag itself (caught by the span-adapter test, which
    # audits with lenses=("substring",) only)
    verdicts = verdicts.withColumn(
        "contaminated", F.greatest(*flags) if len(flags) > 1 else flags[0]
    )
    contaminated_ids = (
        verdicts.where(F.col("contaminated")).select("doc_id")
    )
    clean = eval_docs.join(contaminated_ids, "doc_id", "left_anti")
    return {"pairs": pairs, "verdicts": verdicts, "clean": clean}


def verify_substring_spans(
    eval_docs: DataFrame,
    corpus_docs: DataFrame,
    substring_pairs: DataFrame,
    **kwargs,
) -> DataFrame:
    """Exact matched-substring alignments for an audit's ``substring``
    pair frame — the audit-shaped adapter over
    ``winnow.verify_overlap_spans`` (the index probe's ``c_span_chars``
    is an upper bound; this recovers exact extents).

    ``substring_pairs`` is ``(doc_id, corpus_doc_id, ...)`` as returned
    under ``pairs["substring"]``; ``corpus_docs`` must provide the
    matched corpus documents' TEXT (``(doc_id, text)`` — the index
    stores fingerprints, not text, so exact spans need one read of the
    pair docs from the corpus table; the verify stage semi-joins it
    down to the pair set before anything widens). Returns
    ``(doc_id, corpus_doc_id, q_start, c_start, match_len)``.

    Every pair's documents MUST be present on both sides: a pair whose
    corpus (or eval) text is missing would otherwise fall out of the
    span join silently — and a DETECTED pair vanishing from the verify
    output reads as "nothing to verify", the audit's worst failure mode
    (r11 hostile probe). Raises ``ValueError`` naming the missing ids;
    the check is id-sized (distinct pair ids anti-joined to the
    provided docs — never a text scan).
    """
    from tmdb_sync_spark.functions.winnow import verify_overlap_spans

    for side, id_in_pairs, doc_frame in (
        ("corpus_docs", "corpus_doc_id", corpus_docs),
        ("eval_docs", "doc_id", eval_docs),
    ):
        missing = (
            substring_pairs.select(F.col(id_in_pairs).alias("_mid"))
            .distinct()
            .join(
                doc_frame.select(F.col("doc_id").alias("_mid")).distinct(),
                "_mid",
                "left_anti",
            )
        )
        missing_ids = [r["_mid"] for r in missing.limit(20).collect()]
        if missing_ids:
            raise ValueError(
                "verify_substring_spans: pair document(s) missing from "
                f"{side} — a detected pair would silently vanish from "
                f"the span output. First missing ids: {missing_ids}"
            )

    out = verify_overlap_spans(
        eval_docs.withColumnRenamed("doc_id", "query_id"),
        corpus_docs.withColumnRenamed("doc_id", "corpus_doc_id"),
        substring_pairs.withColumnRenamed("doc_id", "query_id"),
        query_id_col="query_id",
        corpus_id_col="corpus_doc_id",
        **kwargs,
    )
    return out.withColumnRenamed("query_id", "doc_id")
