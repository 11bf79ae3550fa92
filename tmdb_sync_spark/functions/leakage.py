"""Split-leakage audit — near-duplicate contamination BETWEEN corpus
splits (train ↔ val/test), the eval-integrity check every trainer
pipeline runs before trusting a held-out number.

The hash split (sampling.split_corpus) guarantees a DOCUMENT is in
exactly one split — it cannot guarantee its near-twin is. A web-scale
corpus is full of lightly-edited copies (mirrors, quotes, boilerplate
rewraps); when one lands in train and the other in val, the val loss is
measuring memorization, not generalization. This module answers "how
leaky is this split?" with the engine's own near-dup machinery:

- one :func:`~tmdb_sync_spark.functions.dedup.minhash_signature` pass
  over the corpus with the split label carried through the signature
  aggregation (no second scan for labels);
- ONE banded-LSH self-join for candidates — the same skew-guarded
  :func:`~tmdb_sync_spark.functions.dedup.banded_pairs_with_overlap`
  the dedup family uses, so a pathological corpus cannot hand one task
  a quadratic hot band;
- verification by signature agreement (``n_equal_hashes >=
  min_equal``, the NEAR_DUP_MIN policy shared with pipeline_curation);
- a CROSS-SPLIT filter: same-split near-dups are dedup's business
  (within-train redundancy is a curation question), leakage is
  strictly pairs whose split labels differ.

Orientation contract (so each unordered pair is reported exactly once,
deterministically): the EVAL side (split != ``train_split``) is the
left/reported document; when both sides are eval (a val ↔ test twin —
not train leakage, but the same eval-integrity hazard, so it IS
reported), the smaller ``doc_id`` is left. Columns:
``(eval_doc_id, eval_split, other_doc_id, other_split,
n_equal_hashes, est_jaccard)``.

Scale shape: identical to dd_minhash_lsh — the audit is the dedup pass
with a label filter, so a pipeline that already runs near-dup dedup
gets leakage for one extra band-key shuffle over the SAME signature
table (pass your staged signature frame via ``sig=``). Nothing here is
O(n²); nothing collects.

Reference scope: beyond-reference (the reference syncs a catalog, it
does not train on one). Tested to the registered-surface bar in
tests/test_leakage.py with a full DuckDB frame-parity twin, and —
since r12 — registered in the LOCAL parity window as
:func:`lk_split_leakage`, so the lexical audit faces the standard
oracle / hostile-text / empty-corpus gates every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tmdb_sync_spark.functions.dedup import (
    _SIG_SQL,
    N_HASHES,
    banded_pairs_with_overlap,
    minhash_signature,
)
from tmdb_sync_spark.functions.pipeline import NEAR_DUP_MIN
from tmdb_sync_spark.functions.sampling import split_corpus
from tmdb_sync_spark.registry import register_retired


def split_leakage_audit(
    docs: DataFrame,
    *,
    split_col: str | None = None,
    weights=None,
    seed: int = 0,
    train_split: str = "train",
    min_equal: int = NEAR_DUP_MIN,
    sig: DataFrame | None = None,
) -> DataFrame:
    """Verified cross-split near-dup pairs, eval side first.

    ``docs`` is ``(doc_id, text, ...)``. Labels come from an existing
    ``split_col`` if named, else from ``split_corpus(docs, weights,
    seed)`` — the same pure-projection hash split, so the audit sees
    exactly the labels training will. Callers that already staged a
    signature table (pipeline_curation does) pass it as ``sig`` —
    it must carry ``doc_id, h0..h{n}, <split_col>`` — and the corpus
    is not re-shingled.

    Returns a lazy frame; compose it:

    - ``leaks.count()`` → is the split leaky at all;
    - :func:`leakage_rates` → per-eval-split contamination rates;
    - ``eval_df.join(leaks, on=.., "left_anti")`` → the decontaminated
      eval set (drop the eval twin, keep the train doc — eval sets are
      cheap to shrink, train tokens are not).
    """
    if sig is not None:
        label = split_col or "split"
        if label not in sig.columns:
            raise ValueError(
                f"split_leakage_audit: sig has no {label!r} column — "
                "carry the split label through minhash_signature(carry=...)"
            )
    else:
        if split_col is None:
            docs = split_corpus(docs, weights=weights, seed=seed)
            label = "split"
        else:
            if split_col not in docs.columns:
                raise ValueError(
                    f"split_leakage_audit: no {split_col!r} column in docs"
                )
            label = split_col
        sig = minhash_signature(docs, carry=(label,))

    pairs = banded_pairs_with_overlap(sig).where(
        F.col("n_equal_hashes") >= F.lit(int(min_equal))
    )
    labels = sig.select("doc_id", label)
    la = labels.withColumnsRenamed({"doc_id": "doc_a", label: "split_a"})
    lb = labels.withColumnsRenamed({"doc_id": "doc_b", label: "split_b"})
    labeled = (
        pairs.join(la, "doc_a").join(lb, "doc_b")
        .where(F.col("split_a") != F.col("split_b"))
    )

    # orient: eval side left; train (if present) right; both-eval ties
    # broken by doc_id — pairs arrive doc_a < doc_b, so "swap iff a is
    # the train side" is a complete, deterministic rule.
    swap = F.col("split_a") == F.lit(train_split)
    pick = lambda yes, no: F.when(swap, yes).otherwise(no)  # noqa: E731
    return labeled.select(
        pick(F.col("doc_b"), F.col("doc_a")).alias("eval_doc_id"),
        pick(F.col("split_b"), F.col("split_a")).alias("eval_split"),
        pick(F.col("doc_a"), F.col("doc_b")).alias("other_doc_id"),
        pick(F.col("split_a"), F.col("split_b")).alias("other_split"),
        "n_equal_hashes",
        (F.col("n_equal_hashes") / F.lit(float(N_HASHES))).alias(
            "est_jaccard"
        ),
    )


def embedding_split_leakage(
    emb_with_split: DataFrame,
    *,
    split_col: str = "split",
    train_split: str = "train",
    id_col: str = "vec_id",
    n_bits: int | None = None,
    threshold: float | None = None,
) -> DataFrame:
    """The SEMANTIC leakage audit: cross-split near-duplicates in
    embedding space — the paraphrase leaks :func:`split_leakage_audit`
    structurally cannot see (minhash is a lexical overlap test; a
    reworded val twin shares no 3-shingles with its train source but
    sits at cosine ≈ 1 next to it).

    ``emb_with_split`` is ``(id_col, embedding, <split_col>, ...)``.
    Candidates come from the engine's sign-LSH bucket equi-join
    (:func:`~tmdb_sync_spark.functions.similarity.bucketed_from` — the
    ONE bucketing definition shared with the dedup family and the
    vector index), skew-tiled exactly like
    ``dd_embedding_cosine``; verification is the exact quantized
    cosine ≥ ``threshold`` (default ``DUP_THRESHOLD``). Invalid
    embeddings (NULL / wrong dim / non-finite / zero norm) are
    excluded by the shared validity contract — audit them separately
    with ``vector_index.dedup_vectors_against_index``'s taxonomy if
    the corpus allows them.

    Output, oriented like the lexical audit (eval side first, both-
    eval ties by smaller id): ``(eval_vec_id, eval_split,
    other_vec_id, other_split, cosine_sim)``. Equivalence contract,
    pinned in tests: the audit's unordered pair set IS
    ``dd_embedding_cosine``'s restricted to label-differing pairs —
    same buckets, same cosine, same threshold.
    """
    from tmdb_sync_spark.functions.pairs import tiled_self_pairs
    from tmdb_sync_spark.functions.similarity import (
        DUP_THRESHOLD,
        N_DUP_BITS,
        _dot,
        bucketed_from,
    )

    n_bits = N_DUP_BITS if n_bits is None else int(n_bits)
    threshold = DUP_THRESHOLD if threshold is None else float(threshold)
    for c in (id_col, "embedding", split_col):
        if c not in emb_with_split.columns:
            raise ValueError(
                f"embedding_split_leakage: no {c!r} column"
            )
    b = bucketed_from(
        emb_with_split.select(
            F.col(id_col).alias("vec_id"), "embedding"
        ),
        n_bits,
    )
    pairs = (
        tiled_self_pairs(
            b, "bucket", "vec_id",
            sym={
                "cosine_sim": lambda l, r: _dot(l["v"], r["v"]) / (
                    F.sqrt(l["nrm"]) * F.sqrt(r["nrm"])
                )
            },
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            "cosine_sim",
        )
        .where(F.col("cosine_sim") >= F.lit(threshold))
    )
    labels = emb_with_split.select(F.col(id_col).alias("_id"), split_col)
    la = labels.withColumnsRenamed({"_id": "id_a", split_col: "split_a"})
    lb = labels.withColumnsRenamed({"_id": "id_b", split_col: "split_b"})
    labeled = (
        pairs.join(la, "id_a").join(lb, "id_b")
        .where(F.col("split_a") != F.col("split_b"))
    )
    swap = F.col("split_a") == F.lit(train_split)
    pick = lambda yes, no: F.when(swap, yes).otherwise(no)  # noqa: E731
    return labeled.select(
        pick(F.col("id_b"), F.col("id_a")).alias("eval_vec_id"),
        pick(F.col("split_b"), F.col("split_a")).alias("eval_split"),
        pick(F.col("id_a"), F.col("id_b")).alias("other_vec_id"),
        pick(F.col("split_a"), F.col("split_b")).alias("other_split"),
        "cosine_sim",
    )


def leakage_rates(
    docs_with_split: DataFrame,
    leaks: DataFrame,
    *,
    split_col: str = "split",
    train_split: str = "train",
    eval_id_col: str = "eval_doc_id",
) -> DataFrame:
    """Per-eval-split contamination summary from an audit frame —
    either audit's (`split_leakage_audit` reports ``eval_doc_id``,
    the default; for `embedding_split_leakage` frames pass
    ``eval_id_col="eval_vec_id"``).

    One row per non-train split: ``(split, n_docs, n_leaked,
    leak_rate)`` where ``n_leaked`` counts DISTINCT eval documents with
    at least one cross-split twin (a doc matching five train mirrors is
    one leaked doc, not five). Splits with zero leaks still appear —
    the report proves the audit RAN on them, absence of a row is never
    the evidence of cleanliness."""
    if eval_id_col not in leaks.columns:
        raise ValueError(
            f"leakage_rates: no {eval_id_col!r} in the audit frame — "
            "pass eval_id_col='eval_vec_id' for embedding audits"
        )
    evals = docs_with_split.where(
        F.col(split_col) != F.lit(train_split)
    ).groupBy(F.col(split_col).alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    hit = leaks.groupBy(F.col("eval_split").alias("split")).agg(
        F.count_distinct(eval_id_col).alias("n_leaked")
    )
    return evals.join(hit, "split", "left").select(
        "split",
        "n_docs",
        F.coalesce(F.col("n_leaked"), F.lit(0)).alias("n_leaked"),
        (
            F.coalesce(F.col("n_leaked"), F.lit(0))
            / F.col("n_docs").cast("double")
        ).alias("leak_rate"),
    )


def decontaminated_eval(
    docs_with_split: DataFrame,
    leaks: DataFrame,
    *,
    split_col: str = "split",
    train_split: str = "train",
    key: str = "doc_id",
    eval_id_col: str = "eval_doc_id",
) -> DataFrame:
    """The eval rows that survive the audit: every non-train document
    with NO cross-split twin (train docs pass through untouched — the
    policy is "shrink eval, never train"). Pure anti-join on the audit
    frame; eval ↔ eval twins drop only the reported (smaller-id) side,
    keeping one representative. For embedding audits pass
    ``key="vec_id", eval_id_col="eval_vec_id"``."""
    if eval_id_col not in leaks.columns:
        raise ValueError(
            f"decontaminated_eval: no {eval_id_col!r} in the audit "
            "frame — pass eval_id_col='eval_vec_id' for embedding audits"
        )
    leaked = leaks.select(F.col(eval_id_col).alias(key)).distinct()
    is_eval = F.col(split_col) != F.lit(train_split)
    return docs_with_split.join(
        leaked.withColumn("_leaked", F.lit(True)), key, "left"
    ).where(
        ~is_eval | F.col("_leaked").isNull()
    ).drop("_leaked")


# --- registered surface (local parity window) -------------------------

# Split label for the REGISTERED audit: a cross-engine-identical hash
# bucket — the first two hex chars of md5(doc_id) against boundaries
# 'e8' (train: 232/256 ≈ 90.6%) and 'f4' (val: 12/256 ≈ 4.7%; rest
# test). The production split is sampling.split_corpus's xxhash64 (JVM
# codegen'd, no DuckDB twin — its contract is property-tested in
# tests/test_sampling.py); the md5 label exercises the SAME audit path
# (split_leakage_audit accepts any split_col) while staying
# SQL-expressible, so the oracle pins the full pipeline: signature →
# banded candidates → overlap verify → cross-split filter →
# orientation. A NULL doc_id hashes to a NULL bucket and falls through
# both CASE branches to 'test' — identically in both engines.
_SPLIT_B2_SQL = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)"

_N_EQ_SQL = " + ".join(
    f"(a.h{i} = b.h{i})::INT" for i in range(N_HASHES)
)

_LEAK_ORACLE = _SIG_SQL + f""",
    lab AS (
        SELECT doc_id,
               CASE WHEN {_SPLIT_B2_SQL} < 'e8' THEN 'train'
                    WHEN {_SPLIT_B2_SQL} < 'f4' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    ),
    cand AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(({_N_EQ_SQL}) AS INT) AS n_equal_hashes
        FROM sigs a
        JOIN sigs b
          ON a.doc_id < b.doc_id
         AND ((a.h0 = b.h0 AND a.h1 = b.h1) OR (a.h2 = b.h2 AND a.h3 = b.h3)
           OR (a.h4 = b.h4 AND a.h5 = b.h5) OR (a.h6 = b.h6 AND a.h7 = b.h7))
    )
    SELECT CASE WHEN la.split = 'train' THEN c.doc_b ELSE c.doc_a END AS eval_doc_id,
           CASE WHEN la.split = 'train' THEN lb.split ELSE la.split END AS eval_split,
           CASE WHEN la.split = 'train' THEN c.doc_a ELSE c.doc_b END AS other_doc_id,
           CASE WHEN la.split = 'train' THEN la.split ELSE lb.split END AS other_split,
           c.n_equal_hashes,
           c.n_equal_hashes / {float(N_HASHES)} AS est_jaccard
    FROM cand c
    JOIN lab la ON la.doc_id = c.doc_a
    JOIN lab lb ON lb.doc_id = c.doc_b
    WHERE la.split <> lb.split
      AND c.n_equal_hashes >= {NEAR_DUP_MIN}
"""


@register_retired("lk_split_leakage", oracle=_LEAK_ORACLE)
def lk_split_leakage(spark, sf_dir: str) -> DataFrame:
    """Cross-split near-dup audit over ``documents`` with a
    deterministic md5-bucket split label — the full
    :func:`split_leakage_audit` path (one signature pass, banded-LSH
    candidates, ``n_equal_hashes >= NEAR_DUP_MIN`` verify, cross-split
    filter, eval-side-first orientation) against a declarative DuckDB
    twin. Scale shape is ``dd_minhash_lsh``'s: one band-key shuffle,
    skew-tiled, nothing O(n²), nothing collected."""
    from tmdb_sync_spark.io import parallel_table

    from tmdb_sync_spark.util import file_fingerprint, materialize_once

    docs = parallel_table(spark, sf_dir, "documents")
    b2 = F.substring(
        F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2
    )
    labeled = docs.withColumn(
        "split",
        F.when(b2 < "e8", "train").when(b2 < "f4", "val").otherwise("test"),
    )
    # the signature frame fans out to FOUR consumers inside the audit
    # (band explode + both pair sides + the label lookup); an
    # unmaterialized plan would duplicate the whole shingle+hash
    # subtree per consumer (ReuseExchange does not dedupe
    # alias-differing branches) — stage it once, keyed on the corpus
    # content version, exactly like dd_minhash_lsh's signature table
    sig = materialize_once(
        minhash_signature(labeled, carry=("split",)),
        cache_key=(
            "lk_sig",
            sf_dir,
            file_fingerprint(f"{sf_dir}/documents.parquet"),
        ),
        prefix="lk_sig_",
    )
    return split_leakage_audit(labeled, split_col="split", sig=sig)
