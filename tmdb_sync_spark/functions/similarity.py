"""Similarity search over the ``embeddings`` table (SURVEY.md Phase 5).

Two operators:
- brute-force cosine top-k (the correctness baseline), and
- sign-LSH bucketed ANN (the scale path: random-hyperplane LSH specialized
  to axis-aligned planes so both engines compute identical buckets).

Cross-engine exactness: float dot products fold in engine-specific order,
so raw doubles won't hash-match. The embeddings are therefore *quantized*
(``floor(x*1000 + 0.5)`` per component — deterministic, no round-half
ambiguity) and all dot products / norms are exact BIGINT sums; the final
cosine is one IEEE-deterministic expression ``dot / (sqrt(na)*sqrt(nb))``.
This mirrors production practice at 100 TB: int8/int16-quantized vectors
for the candidate pass, full precision only for re-ranking.

Magnitude contract: quantized components must keep ``Σ v[i]²`` inside
int64 (components ≲ 4e8 at DIM=64 — embeddings are unit-ish, quantized
~±1000, so the headroom is ~10⁵×). A corpus that violates it fails
LOUDLY and consistently in both engines: the session runs ANSI mode
(Spark 4 default — long overflow throws) and DuckDB errors on BIGINT
overflow; neither silently wraps.
"""

from __future__ import annotations

import os

# module-level so PySpark's type-hint resolution can see 'pd.Series' in
# _codebook_topn's stringified annotations (PEP 563 via the __future__
# import above)
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tmdb_sync_spark.io import parallel_table, table
from tmdb_sync_spark.registry import register
from tmdb_sync_spark.util import file_fingerprint, register_reset_hook

DIM = 64
TOP_K = 5
N_SIGN_BITS = 8

# Vector validity contract, enforced identically in BOTH engines BEFORE
# any arithmetic: embedding present, exactly DIM components, every
# component a finite non-NULL float. Without it the engines diverge
# SILENTLY on malformed vectors (found by a hostile-embeddings probe):
# Spark's floor() clamps Infinity to Long.MAX (then the norm multiply
# overflows loudly) and floors NaN to 0 (silently wrong!), DuckDB's
# BIGINT cast errors on both; Spark's fold-based norm propagates a NULL
# component to a NULL norm while DuckDB's list_aggregate('sum') skips
# NULLs; and a wrong-length vector sums all its components in Spark but
# only the first DIM in DuckDB. Production pipelines dead-letter such
# rows; here they are excluded by this one shared predicate (the
# similarity operators' contract — a malformed vector can't meaningfully
# match anything), and huge-but-finite magnitudes keep the documented
# loud ANSI overflow in both engines.
_VALID_SQL = (
    f"embedding IS NOT NULL AND len(embedding) = {{dim}} "
    "AND len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0"
).format(dim=DIM)

_QUANT_SQL = f"""
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                              x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS v
        FROM embeddings
        WHERE {_VALID_SQL}
    ),
    n AS (
        SELECT vec_id, v,
               CAST(list_aggregate(list_transform(generate_series(1, {DIM}), i -> v[i] * v[i]),
                                   'sum') AS BIGINT) AS nrm
        FROM q
    )
"""


def _quant_expr(col: Column) -> Column:
    """floor(x*1000 + 0.5) BIGINT quantization — the ONE definition both
    projections below and ``_QUANT_SQL`` must stay bit-identical to."""
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * 1000 + 0.5).cast("long")
    )


def _nrm_expr(v: Column) -> Column:
    """Exact squared norm of an already-quantized attribute column."""
    return F.aggregate(
        F.zip_with(v, v, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _valid_expr(col: Column) -> Column:
    """Spark twin of ``_VALID_SQL`` — see that constant's comment."""
    return (
        col.isNotNull()
        & (F.size(col) == DIM)
        & F.forall(
            col,
            lambda x: x.isNotNull()
            & ~F.isnan(x)
            & (F.abs(x) != F.lit(float("inf"))),
        )
    )


def _guarded_quant(col: Column) -> Column:
    """Quantization gated INSIDE a CaseWhen on the validity predicate:
    a bare ``.where(valid)`` before the projection is not enough,
    because Catalyst pushes consumer filters (``nrm > 0``) down and can
    order them AHEAD of the validity filter in the combined predicate —
    the norm arithmetic then runs on a garbage row (observed live: an
    Infinity component floor-clamped to Long.MAX overflowed the norm
    multiply despite the upstream filter). CaseWhen evaluates its value
    branch lazily, so however Catalyst reorders, no arithmetic touches
    an invalid vector — it quantizes to NULL and every consumer's
    ``nrm > 0`` / join drops it."""
    return F.when(_valid_expr(col), _quant_expr(col))


def _quantized_from(emb: DataFrame) -> DataFrame:
    """vec_id, v (quantized BIGINT vector), nrm (exact squared norm).
    Malformed vectors are excluded by the validity contract
    (``_VALID_SQL``) before any arithmetic."""
    df = emb.select(
        "vec_id", _guarded_quant(F.col("embedding")).alias("v")
    ).where(F.col("v").isNotNull())
    return df.select("vec_id", "v", _nrm_expr(F.col("v")).alias("nrm"))


# Rows per task for the embeddings spread (guide §2.2 right-sizing —
# r13): the per-row work behind _quantized/_bucketed is a 64-wide
# quant/norm projection plus one vectorized numpy matmul per Arrow
# batch — microseconds per row — so the old unconditional 32-way spread
# of a small table scheduled near-empty tasks and near-empty Arrow
# batches (the measured reason ann_ivf ran SLOWER at 32 cores than 8 in
# BENCH_r12_c8). Partition count = ceil(footer_rows / this) capped at
# the session parallelism: any at-scale corpus exceeds the cap, so the
# 100 TB plan shape is untouched.
EMB_ROWS_PER_TASK = 4096


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _quantized_from(
        parallel_table(
            spark, sf_dir, "embeddings", rows_per_task=EMB_ROWS_PER_TASK
        )
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _codebook_topn(cents, n_out: int):
    """Broadcast-closure centroid scorer: the one sanctioned vectorized
    Python stage in the engine's hot path, chosen BY MEASUREMENT.

    The collected codebook rides to every task inside the UDF closure as
    numpy int64 arrays — the pandas-UDF equivalent of a Spark broadcast
    variable — and each Arrow batch is scored with ONE
    ``(rows × DIM)·(DIM × k)`` integer matmul. Centroids are ordered by
    cid and ties broken with a stable argsort, so the returned
    ``n_out``-prefix of cids by ``(L2², cid)`` is bit-identical to a
    JVM ``array_min`` / ``array_sort`` over ``struct(d, cid)`` with
    literal-inlined centroids (the r4 implementation; proven equivalent
    in tests/test_plans.py).

    Why not stay JVM-side? In-session interleaved A/B at sf0.1 (5 reps,
    medians, identical results): literal-codebook ``F.aggregate`` folds
    1.74 s, the same dots as flat codegen'd ``element_at`` sums 5.29 s
    (the 512-term Add tree is WORSE than the interpreted fold), this
    Arrow path 1.32 s. Per row the matmul is vectorized C against the
    HOF interpreter's per-element dispatch, and only ``(v, nrm)`` cross
    the Arrow boundary. It also ends the r4 plan-growth caveat
    structurally: plan size is O(1) in the codebook, so a production 4k-
    centroid book needs no inlining guard at all.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    order = sorted(range(len(cents)), key=lambda i: int(cents[i].vec_id))
    mat = np.array(
        [[int(x) for x in cents[i].v] for i in order], dtype=np.int64
    )
    cnrm = np.array([int(cents[i].nrm) for i in order], dtype=np.int64)
    cids = np.array([int(cents[i].vec_id) for i in order], dtype=np.int64)

    @pandas_udf("array<bigint>")
    def topn(v: pd.Series, nrm: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype=object)
        vec = np.array(v.tolist(), dtype=np.int64)
        d = (
            nrm.to_numpy(dtype=np.int64)[:, None]
            + cnrm[None, :]
            - 2 * (vec @ mat.T)
        )
        idx = np.argsort(d, axis=1, kind="stable")[:, :n_out]
        return pd.Series(cids[idx].tolist())

    return topn


def bucketed_from(emb: DataFrame, n_bits: int) -> DataFrame:
    """vec_id, sign-LSH bucket, quantized v, exact norm — ONE projection
    over any ``(vec_id, embedding)`` frame.

    Bucket bits, quantization and the norm all come out of a single scan
    pass (no self-join back onto the raw table): for self-join consumers
    this halves the scans and keeps each side a scan→project→filter
    pipeline, the shape that matters when the corpus is 10^9 vectors.
    Shared by the registered batch operators (via :func:`_bucketed`) and
    the incremental vector index (functions/vector_index.py) — one
    bucketing definition, or index and batch silently diverge.
    """
    # try_element_at, not element_at: under ANSI mode a malformed
    # embedding with < n_bits components would raise INVALID_ARRAY_INDEX
    # from the bit probe if a consumer filter on `bucket` ever reordered
    # ahead of the nrm > 0 validity drop — the same optimizer-placement
    # fragility _guarded_quant closes for the arithmetic. NULL probes
    # fold to "0" bits; the row's v/nrm are NULL anyway, so the validity
    # contract still excludes it downstream (r6 ADVICE).
    bits = [
        F.when(F.try_element_at(F.col("embedding"), F.lit(i + 1)) >= 0,
               "1").otherwise("0")
        for i in range(n_bits)
    ]
    q = emb.select(
        "vec_id", F.concat(*bits).alias("bucket"),
        _guarded_quant(F.col("embedding")).alias("v"),
    )
    return q.select(
        "vec_id", "bucket", "v", _nrm_expr(F.col("v")).alias("nrm")
    ).where(F.col("nrm") > 0)


def _bucketed(spark: SparkSession, sf_dir: str, n_bits: int) -> DataFrame:
    return bucketed_from(
        parallel_table(
            spark, sf_dir, "embeddings", rows_per_task=EMB_ROWS_PER_TASK
        ),
        n_bits,
    )


def exact_topk_frames(
    queries: DataFrame,
    cands: DataFrame,
    k: int,
    exclude_self: bool = False,
) -> DataFrame:
    """The exact-cosine top-k kernel: ``queries`` is ``(query_id, qv,
    qnrm)`` (tiny — broadcast), ``cands`` is ``(neighbor_id, cv, cnrm)``
    (the corpus — scanned once). Returns ``(query_id, neighbor_id, rank,
    cosine_sim)`` with ``rank ≤ k``.

    Two-phase top-k: ranking everything in ONE
    Window.partitionBy(query_id) caps final-stage parallelism at the
    query count (q tasks sorting the whole corpus at 10^9 candidates).
    Phase 1 ranks per (query, input partition) — parallelism n_queries ×
    n_scan_partitions, each task sorting only its slice — and keeps k
    rows per group, a superset of the global top-k. Phase 2 ranks the
    surviving k × n_partitions rows per query: the per-query stage now
    funnels a few hundred rows, not the corpus. Ties break on
    neighbor_id both times, so the result (and the oracle hash) is
    identical to the one-shot window.

    This is both the registered brute-force query's engine and the
    ANN operators' ground truth (the recall contract — see
    ``ann_recall_at_k``)."""
    dot = _dot(F.col("qv"), F.col("cv"))
    sim = dot / (F.sqrt(F.col("qnrm")) * F.sqrt(F.col("cnrm")))
    scored = (
        cands.crossJoin(F.broadcast(queries))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"),
                F.spark_partition_id().alias("pid"))
    )
    if exclude_self:
        scored = scored.where(F.col("neighbor_id") != F.col("query_id"))
    w_part = Window.partitionBy("query_id", "pid").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("prank", F.row_number().over(w_part))
        .where(F.col("prank") <= k)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


@register(
    "knn_cosine_topk",
    oracle=_QUANT_SQL
    + f"""
    SELECT qq.vec_id AS query_id,
           c.vec_id AS neighbor_id,
           CAST(row_number() OVER (
               PARTITION BY qq.vec_id
               ORDER BY CAST(list_aggregate(list_transform(generate_series(1, {DIM}),
                                            i -> qq.v[i] * c.v[i]), 'sum') AS BIGINT)
                        / (sqrt(qq.nrm) * sqrt(c.nrm)) DESC,
                        c.vec_id ASC) AS INT) AS rank,
           CAST(list_aggregate(list_transform(generate_series(1, {DIM}),
                                i -> qq.v[i] * c.v[i]), 'sum') AS BIGINT)
             / (sqrt(qq.nrm) * sqrt(c.nrm)) AS cosine_sim
    FROM n qq
    JOIN n c ON qq.vec_id < 10 AND c.vec_id >= 10 AND qq.nrm > 0 AND c.nrm > 0
    QUALIFY rank <= {TOP_K}
    """,
)
def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: 10 query vectors against the corpus.

    Plan: queries broadcast (tiny), candidates scan once — the dot product
    is a JVM-side array fold inside codegen (no UDF, no explode); top-k per
    query is one window over the candidate stream. At cluster scale this
    is the exact-rerank stage; the ANN operator below prunes candidates
    first.
    """
    qd = _quantized(spark, sf_dir)
    queries = qd.where((F.col("vec_id") < 10) & (F.col("nrm") > 0)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    cands = qd.where((F.col("vec_id") >= 10) & (F.col("nrm") > 0)).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    return exact_topk_frames(queries, cands, TOP_K)


_BUCKET_BITS_SQL = " || ".join(
    f"(CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END)"
    for i in range(N_SIGN_BITS)
)


@register(
    "ann_signlsh_topk",
    oracle=_QUANT_SQL
    + f"""
    , b AS (
        SELECT e.vec_id, {_BUCKET_BITS_SQL} AS bucket, n.v, n.nrm
        FROM embeddings e JOIN n ON e.vec_id = n.vec_id
        WHERE n.nrm > 0
    )
    SELECT qq.vec_id AS query_id,
           qq.bucket AS bucket,
           c.vec_id AS neighbor_id,
           CAST(row_number() OVER (
               PARTITION BY qq.vec_id
               ORDER BY CAST(list_aggregate(list_transform(generate_series(1, {DIM}),
                                            i -> qq.v[i] * c.v[i]), 'sum') AS BIGINT)
                        / (sqrt(qq.nrm) * sqrt(c.nrm)) DESC,
                        c.vec_id ASC) AS INT) AS rank,
           CAST(list_aggregate(list_transform(generate_series(1, {DIM}),
                                i -> qq.v[i] * c.v[i]), 'sum') AS BIGINT)
             / (sqrt(qq.nrm) * sqrt(c.nrm)) AS cosine_sim
    FROM b qq
    JOIN b c ON qq.vec_id % 50 = 0 AND c.vec_id <> qq.vec_id
            AND len(list_filter(generate_series(1, {N_SIGN_BITS}),
                    i -> substr(c.bucket, i, 1) <> substr(qq.bucket, i, 1))) <= 1
    QUALIFY rank <= 3
    """,
)
def ann_signlsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via sign-LSH bucketing, multi-probe radius 1.

    Bucket = sign bits of the first 8 components (axis-aligned random
    hyperplanes — portable across engines, unlike seeded random
    projections). Candidates are vectors whose bucket is within Hamming
    distance 1 of the query's (the query's own bucket + one probe per
    flipped bit): on the Spark side this stays an *equi*-join — queries
    explode to (query, probe-bucket) rows and the corpus shuffles once
    on its own bucket key — so at 100 TB there is still no O(n·q) cross
    product, and candidate volume is (bits+1)/2^bits of the corpus. The
    oracle expresses the same radius as a Hamming predicate, which is
    fine at oracle scale.

    Default radius 1, by measurement (r9): exact-bucket probing loses
    any true neighbor on the far side of even ONE of the 8 hyperplanes,
    which on the clustered recall corpus capped recall@3 at 0.28 and on
    the isotropic driver corpus at 0.0; radius 1 lifts those to 0.63
    and 0.125 for ~9/256 of the corpus scanned per query. The recall
    floor is pinned in tests/test_ann_recall.py; the full
    bits × radius sweep is recorded in COVERAGE.md
    (scripts/exp_ann_recall.py).
    """
    return ann_signlsh_topk_at(
        spark, sf_dir, N_SIGN_BITS, 3, hamming_radius=1
    )


def ann_signlsh_topk_at(
    spark: SparkSession, sf_dir: str, n_bits: int, top_k: int,
    hamming_radius: int = 0,
) -> DataFrame:
    """``ann_signlsh_topk`` with explicit knobs — the sweep/recall
    surface. ``n_bits`` trades candidate-set size (≈ corpus / 2^bits
    per bucket) against recall; the registered query pins the defaults
    so its oracle stays a single static SQL string.

    ``hamming_radius``: multi-probe LSH, the standard recall dial for a
    single-table sign-LSH. Radius 0 probes only the query's own bucket
    — a true neighbor on the far side of ANY of the ``n_bits``
    hyperplanes is unreachable, which is why exact-bucket recall decays
    geometrically in the bit count (measured: the recall sweep in
    COVERAGE.md). Radius 1 also probes the ``n_bits`` buckets one bit-
    flip away — candidate volume ×(n_bits+1)/2^bits of the corpus, and
    the probe stays an EQUI-join: queries explode to (query, probe-
    bucket) rows, so at 100 TB the corpus still shuffles once on its
    own bucket and each candidate can match a query at most once (a
    vector lives in exactly one bucket — no pair dedup needed).
    Radius ≥ 2 is combinatorial (C(bits,2) probes) and out of scope —
    raise rather than silently build it."""
    if hamming_radius not in (0, 1):
        raise ValueError(
            f"hamming_radius must be 0 or 1, got {hamming_radius}"
        )
    b = _bucketed(spark, sf_dir, n_bits)
    queries = b.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("bucket"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    if hamming_radius == 1:
        def _flip(i: int) -> Column:   # flip 0-based bit i of the key
            c = F.substring(F.col("bucket"), i + 1, 1)
            return F.concat(
                F.substring(F.col("bucket"), 1, i),
                F.when(c == "1", F.lit("0")).otherwise(F.lit("1")),
                F.substring(F.col("bucket"), i + 2, n_bits - i - 1),
            )

        probe_set = F.array(F.col("bucket"),
                            *[_flip(i) for i in range(n_bits)])
        queries = queries.withColumn(
            "p_bucket", F.explode(probe_set)
        )
    else:
        queries = queries.withColumn("p_bucket", F.col("bucket"))
    cands = b.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("bucket").alias("c_bucket"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    dot = _dot(F.col("qv"), F.col("cv"))
    sim = dot / (F.sqrt(F.col("qnrm")) * F.sqrt(F.col("cnrm")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        queries.join(
            cands,
            (F.col("p_bucket") == F.col("c_bucket"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select("query_id", "bucket", "neighbor_id", sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", "bucket", "neighbor_id", "rank", "cosine_sim")
    )


N_DUP_BITS = 4
DUP_THRESHOLD = 0.30

_DUP_BITS_SQL = " || ".join(
    f"(CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END)"
    for i in range(N_DUP_BITS)
)


@register(
    "dd_embedding_cosine",
    oracle=_QUANT_SQL
    + f"""
    , b AS (
        SELECT e.vec_id, {_DUP_BITS_SQL} AS bucket, n.v, n.nrm
        FROM embeddings e JOIN n ON e.vec_id = n.vec_id
        WHERE n.nrm > 0
    )
    SELECT a.vec_id AS a_id, c.vec_id AS b_id,
           CAST(list_aggregate(list_transform(generate_series(1, {DIM}),
                                i -> a.v[i] * c.v[i]), 'sum') AS BIGINT)
             / (sqrt(a.nrm) * sqrt(c.nrm)) AS cosine_sim
    FROM b a
    JOIN b c ON a.vec_id < c.vec_id AND a.bucket = c.bucket
    WHERE CAST(list_aggregate(list_transform(generate_series(1, {DIM}),
                               i -> a.v[i] * c.v[i]), 'sum') AS BIGINT)
            / (sqrt(a.nrm) * sqrt(c.nrm)) >= {DUP_THRESHOLD}
    ORDER BY a_id, b_id
    """,
)
def dd_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (LSH-bucketed).

    The near-dup generalization of the reference's keep-best frame dedup
    (``app/catalog/upsert.py:26-34``) to dense vectors: candidate pairs
    come from a sign-LSH *equi*-join (first ``N_DUP_BITS`` component
    signs), then the exact quantized cosine keeps pairs ≥ threshold.

    Scale shape: the pair space shrinks from O(n²) to Σ bucket², and the
    candidate join is a hash join on ``bucket`` — one shuffle each side.
    Raising N_DUP_BITS trades recall for balance, and a degenerate
    corpus that still collapses into a hot bucket is triangle-tiled by
    :func:`functions.pairs.tiled_self_pairs` (r5's manufactured 94 s
    incident): the hot key's pair space rides every core instead of one
    task, with bit-identical output. Production near-dup at 100 TB uses
    the same plan with more planes and banded re-ranking.
    """
    p = _dup_candidate_pairs(spark, sf_dir)
    return (
        p.select(
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            "cosine_sim",
        )
        .where(F.col("cosine_sim") >= DUP_THRESHOLD)
        .orderBy("a_id", "b_id")
    )


# Occupancy-scaled plane count: with FIXED bits, mean bucket occupancy
# n/2^bits grows linearly in corpus size, so within-bucket pair density
# — the work every dup consumer pays — grows QUADRATICALLY (the r6 ramp
# measured dd_cluster_components at 28.3 s by x16 for exactly this).
# Holding occupancy constant instead costs +2 bits per 4× corpus and
# restores linear pair growth (same ramp, 'scaled bits' rows). The
# trade is recall at the margin: each extra plane halves the chance a
# near-dup pair shares a bucket, so production sweeps re-rank with
# more bands (dd_minhash_lsh) rather than scaling bits forever.
DUP_BITS_BASE_N = 2_000  # sf0.1 embeddings — the tuning corpus


def scaled_dup_bits(
    n_vectors: int,
    *,
    base_bits: int = N_DUP_BITS,
    base_n: int = DUP_BITS_BASE_N,
) -> int:
    """Plane count holding expected bucket occupancy at the tuning
    corpus's level: ``base_bits + log2(n/base_n)``, floored at
    ``base_bits`` (a smaller corpus never loses recall) and capped at
    the embedding's usable sign planes."""
    import math

    if n_vectors <= base_n:
        return base_bits
    # cap at the embedding's usable sign planes: bits past DIM read
    # try_element_at NULLs and fold to a constant '0' — they would
    # lengthen every bucket key without splitting any bucket
    return min(
        base_bits + int(round(math.log2(n_vectors / base_n))), DIM
    )


def _dup_candidate_pairs(
    spark: SparkSession, sf_dir: str, n_bits: int = N_DUP_BITS
) -> DataFrame:
    """Skew-tiled sign-LSH candidate pairs with their exact cosine —
    shared by ``dd_embedding_cosine`` and ``dd_cluster_components``.

    ``n_bits`` (r8, the r6-ramp knob made a parameter): the registered
    queries keep the fixed default so oracle SQL stays stable; scale
    consumers pass :func:`scaled_dup_bits` of their corpus size to hold
    bucket occupancy — and therefore per-bucket pair density — constant
    as the corpus grows (measured in scripts/exp_scale_ramp.py §B and
    the cluster ramp row in COVERAGE.md).

    The hot-group probe runs on the bucketed frame directly: the probe
    aggregates only ``bucket`` (Catalyst prunes the quantized vector
    from its output, leaving one norm evaluation for the filter), and
    an interleaved A/B measured the conditional probe at **0.0%**
    overhead on the unskewed sf0.1 corpus — while a staged-parquet
    variant of this function cost +0.8 s/run in fixed job overhead
    (write + read-back + probe as separate jobs) at bench scale. The
    cosine rides as a ``sym`` pair expression so the threshold filter
    pushes into the join in its plain symmetric form (see
    ``tiled_self_pairs``).
    """
    from tmdb_sync_spark.functions.pairs import tiled_self_pairs

    b = _bucketed(spark, sf_dir, n_bits)
    return tiled_self_pairs(
        b, "bucket", "vec_id",
        sym={
            "cosine_sim": lambda l, r: _dot(l["v"], r["v"]) / (
                F.sqrt(l["nrm"]) * F.sqrt(r["nrm"])
            )
        },
        probe_key=("dup_buckets", sf_dir, n_bits),
        probe_fingerprint=_embeddings_fingerprint(sf_dir),
    )


N_CENTROIDS = 8
N_PROBE = 2
IVF_TOP_K = 3

# (applicationId, sf_dir) -> (table fingerprint, collected codebook rows
# (≤ N_CENTROIDS)). The fingerprint (embeddings parquet mtime+size,
# ADVICE r4) detects an in-place table rewrite within one application
# without relying on callers to invoke reset_materialization_cache; it
# lives in the VALUE, not the key, so a rewrite REPLACES the entry
# instead of accumulating one dead codebook per rewrite for the driver's
# lifetime. The reset hook remains for callers that rewrite without
# touching mtime granularity (same-ns rewrites) or want a hard flush —
# registered as a MODEL hook: the codebook is a trained index artifact
# (built once, served to many queries), so a staged-only reset (bench.py
# between warm reps) keeps it, exactly as a production IVF deployment
# would; the fingerprint in the value still invalidates on data change.
_CODEBOOK_MEMO: dict = {}
register_reset_hook(_CODEBOOK_MEMO.clear, kind="model")


def _embeddings_fingerprint(sf_dir: str) -> tuple:
    # shared stamp (util.file_fingerprint): unlike a bare os.stat, it
    # descends a directory-of-parts layout, where a dir's own
    # (mtime, size) can survive an in-place part-file rewrite unchanged
    return file_fingerprint(os.path.join(sf_dir, "embeddings.parquet"))

# ONE Lloyd pass, chosen by measurement: on the clustered recall corpus
# pass 1 reached recall@3 = 0.967 and pass 2 moved it to 0.958 (noise,
# slightly down) — while every extra pass costs an assignment scan plus
# a recenter job per training. More passes buy convergence k-means
# cares about, not recall an 8-list coarse quantizer can see.
N_LLOYD = 1
# Lloyd passes run over a deterministic 1/TRAIN_SAMPLE_MOD sample of the
# corpus — the standard production shape (k-means needs ~hundreds of
# rows per centroid, not the corpus; faiss trains IVF books the same
# way) and it cuts each pass's assignment scan by the sampling factor.
# The INIT still orders the FULL corpus, so the codebook trains whenever
# any usable vector exists; an empty sample just keeps the init book.
TRAIN_SAMPLE_MOD = 4
# multiplicative-hash sample order for the k-means init: a bijection on
# Z_p (p prime, multiplier coprime) — a seeded pseudo-random permutation
# both engines compute with exact 64-bit-safe integer arithmetic
# (max product ~1e12). The "seed" is the (P, M) pair.
_HASH_P, _HASH_M = 1000003, 999983


def _mean_list_sql() -> str:
    # round-half-up integer mean per component: floor((2·Σ + n) / (2n))
    # — the 2Σ+n trick keeps it one IEEE double division of exact
    # integers (< 2^53), bit-identical between DuckDB and the JVM/Python
    terms = ", ".join(
        f"CAST(floor((2 * sum(v[{i + 1}]) + count(*)) / (2.0 * count(*))) "
        "AS BIGINT)"
        for i in range(DIM)
    )
    return f"[{terms}]"


def _kmeans_sql() -> str:
    """CTE chain mirroring :func:`_train_codebook` exactly: seeded-hash
    init, then ``N_LLOYD`` Lloyd passes (assign by exact quantized L2,
    tie → smaller cid; recenter by round-half-up integer mean; empty
    cluster keeps its previous centroid)."""
    parts = [f"""
    cand AS (
        SELECT vec_id, v, ((vec_id % {_HASH_P}) * {_HASH_M}) % {_HASH_P} AS hkey
        FROM n WHERE nrm > 0
    ),
    samp AS (
        SELECT vec_id, v, nrm FROM n
        WHERE nrm > 0 AND vec_id % {TRAIN_SAMPLE_MOD} = 0
    ),
    c0 AS (
        SELECT row_number() OVER (ORDER BY hkey, vec_id) - 1 AS cid, v AS cv
        FROM cand ORDER BY hkey, vec_id LIMIT {N_CENTROIDS}
    )"""]
    for p in range(1, N_LLOYD + 1):
        prev = f"c{p - 1}"
        parts.append(f"""
    {prev}n AS (
        SELECT cid, cv,
               CAST(list_aggregate(list_transform(generate_series(1, {DIM}),
                    i -> cv[i] * cv[i]), 'sum') AS BIGINT) AS cnrm
        FROM {prev}
    ),
    a{p} AS (
        SELECT vec_id, v, cid FROM (
            SELECT s.vec_id, s.v, c.cid,
                   row_number() OVER (
                       PARTITION BY s.vec_id
                       ORDER BY s.nrm + c.cnrm
                                - 2 * CAST(list_aggregate(list_transform(
                                      generate_series(1, {DIM}),
                                      i -> s.v[i] * c.cv[i]), 'sum') AS BIGINT),
                                c.cid) AS rnk
            FROM samp s, {prev}n c
        ) WHERE rnk = 1
    ),
    m{p} AS (
        SELECT cid, {_mean_list_sql()} AS mv FROM a{p} GROUP BY cid
    ),
    c{p} AS (
        SELECT c.cid, COALESCE(m.mv, c.cv) AS cv
        FROM {prev} c LEFT JOIN m{p} m ON m.cid = c.cid
    )""")
    parts.append(f"""
    cent AS (
        SELECT cid, cv,
               CAST(list_aggregate(list_transform(generate_series(1, {DIM}),
                    i -> cv[i] * cv[i]), 'sum') AS BIGINT) AS cnrm
        FROM c{N_LLOYD}
    )""")
    return ",".join(parts)


# centroids = a seeded k-means codebook (hash-sample init + N_LLOYD Lloyd
# passes, exact integer arithmetic) — deterministic in both engines, so
# the oracle mirrors the training step for step.
_IVF_SQL = _QUANT_SQL + "," + _kmeans_sql() + f"""
    ,
    assign AS (
        SELECT * FROM (
            SELECT n.vec_id, n.v, n.nrm, cent.cid,
                   row_number() OVER (
                       PARTITION BY n.vec_id
                       ORDER BY n.nrm + cent.cnrm
                                - 2 * CAST(list_aggregate(list_transform(
                                      generate_series(1, {DIM}),
                                      i -> n.v[i] * cent.cv[i]), 'sum') AS BIGINT),
                                cent.cid) AS rnk
            FROM n, cent WHERE n.nrm > 0
        ) WHERE rnk = 1
    ),
    probes AS (
        SELECT * FROM (
            SELECT q.vec_id AS query_id, q.v AS qv, q.nrm AS qnrm, cent.cid,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY q.nrm + cent.cnrm
                                - 2 * CAST(list_aggregate(list_transform(
                                      generate_series(1, {DIM}),
                                      i -> q.v[i] * cent.cv[i]), 'sum') AS BIGINT),
                                cent.cid) AS rnk
            FROM n q, cent WHERE q.vec_id % 50 = 0 AND q.nrm > 0
        ) WHERE rnk <= {N_PROBE}
    )
"""


def _train_codebook(spark: SparkSession, sf_dir: str) -> list:
    """Seeded k-means coarse quantizer (closes the r5 verdict's
    'training out of scope' residue).

    Deterministic by construction so the DuckDB oracle can replay it
    step for step (:func:`_kmeans_sql`):

    - **init**: the ``N_CENTROIDS`` corpus vectors first in
      ``((vec_id % P) * M) % P`` order — a seeded hash-permutation
      sample (not first-N, which on a clustered corpus can land every
      seed in one cluster); one bounded TakeOrdered job over the FULL
      corpus, so training succeeds whenever any usable vector exists.
    - **N_LLOYD Lloyd passes over a 1/TRAIN_SAMPLE_MOD sample**
      (``vec_id % MOD = 0`` — deterministic, oracle-mirrorable):
      assignment is the existing map-side Arrow scorer
      (:func:`_codebook_topn` — no shuffle, sample scanned once per
      pass); recentering is ONE ``groupBy(cid)`` over ``DIM``
      per-component integer sums (map-side partial agg; the shuffle
      moves ≤ #partitions × N_CENTROIDS rows), collected driver-side
      bounded by ``N_CENTROIDS`` rows. An empty sample keeps the init
      book (every cluster "empty" → COALESCE path in the oracle).
    - **exactness**: vectors are the quantized BIGINT form; the new
      centroid component is ``floor((2·Σ + n) / (2n))`` — round-half-up
      integer mean via one IEEE double division of exact integers,
      bit-identical in DuckDB, the JVM and Python. An emptied cluster
      keeps its previous centroid.

    Measured (scripts/proto in-session, recall@3 of the probe-2 IVF vs
    brute force): on a synthetically CLUSTERED corpus the trained book
    lifts recall 0.84 → 0.96; on the driver's isotropic-noise embeddings
    it is flat (~0.5 either way) — with iid components there is no
    structure to learn, so cell occupancy balance is the only effect.
    Returns ``Row(vec_id=cid, v, nrm)`` rows (the codebook contract
    :func:`_codebook_topn` consumes).
    """
    import math

    from pyspark.sql import Row

    qd = _quantized_from(table(spark, sf_dir, "embeddings")).where(
        F.col("nrm") > 0
    )
    hkey = ((F.col("vec_id") % _HASH_P) * _HASH_M) % _HASH_P
    init = (
        qd.select("vec_id", "v", hkey.alias("hkey"))
        .orderBy("hkey", "vec_id")
        .limit(N_CENTROIDS)
        .collect()
    )
    if not init:
        raise ValueError(
            f"ann_ivf_topk: no usable vectors (nrm > 0) in {sf_dir} to "
            "train the IVF codebook"
        )
    cents = [
        Row(vec_id=i, v=list(r.v), nrm=sum(x * x for x in r.v))
        for i, r in enumerate(init)
    ]
    sums = [
        F.sum(F.element_at(F.col("v"), i + 1)).alias(f"s{i}")
        for i in range(DIM)
    ]
    samp = qd.where(F.col("vec_id") % TRAIN_SAMPLE_MOD == 0)
    for _ in range(N_LLOYD):
        topn = _codebook_topn(cents, 1)
        cid = F.element_at(topn(F.col("v"), F.col("nrm")), 1)
        rows = (
            samp.select(cid.alias("cid"), "v")
            .groupBy("cid")
            .agg(F.count(F.lit(1)).alias("cnt"), *sums)
            .collect()
        )
        means = {
            int(r["cid"]): [
                math.floor((2 * int(r[f"s{i}"]) + int(r["cnt"]))
                           / (2.0 * int(r["cnt"])))
                for i in range(DIM)
            ]
            for r in rows
        }
        cents = [
            Row(
                vec_id=c.vec_id,
                v=means.get(c.vec_id, c.v),
                nrm=sum(
                    x * x for x in means.get(c.vec_id, c.v)
                ),
            )
            for c in cents
        ]
    return cents


@register(
    "ann_ivf_topk",
    oracle=_IVF_SQL
    + f"""
    SELECT query_id, neighbor_id, rank, cosine_sim FROM (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               CAST(row_number() OVER (
                   PARTITION BY p.query_id
                   ORDER BY CAST(list_aggregate(list_transform(
                                generate_series(1, {DIM}),
                                i -> p.qv[i] * a.v[i]), 'sum') AS BIGINT)
                            / (sqrt(p.qnrm) * sqrt(a.nrm)) DESC,
                            a.vec_id ASC) AS INT) AS rank,
               CAST(list_aggregate(list_transform(generate_series(1, {DIM}),
                                    i -> p.qv[i] * a.v[i]), 'sum') AS BIGINT)
                 / (sqrt(p.qnrm) * sqrt(a.nrm)) AS cosine_sim
        FROM probes p
        JOIN assign a ON a.cid = p.cid AND a.vec_id <> p.query_id
    ) WHERE rank <= {IVF_TOP_K}
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbors.

    Coarse quantizer: every vector is assigned to its nearest of
    ``N_CENTROIDS`` centroids by exact quantized L2. The codebook is
    TRAINED — a seeded, engine-deterministic k-means
    (:func:`_train_codebook`: hash-sample init + ``N_LLOYD`` Lloyd
    passes, exact integer arithmetic; the oracle replays it in SQL) —
    bounded by the module constant and shipped to every
    task as a pandas-UDF closure — a broadcast variable — where
    ``_codebook_topn`` scores each Arrow batch with one vectorized numpy
    matmul: assignment is map-side, with no join and no shuffle, and
    plan size is O(1) in the codebook (a production 4k-centroid book
    changes nothing). Chosen over the r4 literal-inlined JVM form by an
    in-session A/B — see ``_codebook_topn``'s docstring for the numbers
    and tests/test_plans.py for the bit-identical-ordering proof.
    Queries probe their ``N_PROBE`` closest inverted lists and re-rank
    exactly within them.

    Scale shape: the corpus scan computes assignments map-side (exactly
    how production IVF ships a k-means codebook to every task), the probe
    join is an equi-join on ``cid`` (shuffles only the probed lists), and
    re-ranking is the brute-force kernel restricted to
    ~N_PROBE/N_CENTROIDS of the data. This is the standard IVF-flat
    layout used at billion-vector scale, training included: each Lloyd
    pass is one map-side assignment scan plus a tiny recenter shuffle
    (≤ partitions × N_CENTROIDS partial-agg rows), and the trained book
    is memoized per (application, table-fingerprint) so repeat queries
    never retrain.

    Precondition: ``vec_id`` is the corpus primary key (unique). The
    previous groupBy-based assignment incidentally collapsed duplicate
    ids; the map-side form does not — a corpus with duplicate ids should
    go through the dedup operators first, not lean on ANN assignment to
    mask them.

    Degenerate corpora: when NO row has a positive norm there is nothing
    to train on and this raises ``ValueError`` (loudly, since round 4)
    where older builds returned an empty result — callers replaying
    all-zero corpora should catch it or clean the corpus first.

    Recall contract: the registered defaults (``N_PROBE`` of
    ``N_CENTROIDS`` lists, top-``IVF_TOP_K``) carry a measured recall
    floor vs the exact kernel, pinned in tests/test_ann_recall.py; the
    n_probe-vs-recall sweep is recorded in COVERAGE.md
    (scripts/exp_ann_recall.py).
    """
    return ann_ivf_topk_at(spark, sf_dir, N_PROBE, IVF_TOP_K)


def resolve_codebook(
    spark: SparkSession, sf_dir: str, codebook_store: str | None = None,
) -> list:
    """The trained codebook through the full resolution chain:
    in-process memo → persisted store (r9 verdict #4: a standing gate
    must not retrain per session) → train (and persist, when a store is
    given). Every tier is invalidated by the embeddings table's content
    fingerprint, so an in-place rewrite can never serve the previous
    corpus's geometry from ANY tier."""
    memo_key = (spark.sparkContext.applicationId, sf_dir)
    fingerprint = _embeddings_fingerprint(sf_dir)
    memo = _CODEBOOK_MEMO.get(memo_key)
    if memo is not None and memo[0] == fingerprint:
        return memo[1]
    cents = None
    if codebook_store is not None:
        from tmdb_sync_spark.functions.codebook_store import load_codebook

        cents = load_codebook(codebook_store, fingerprint)
    if cents is None:
        cents = _train_codebook(spark, sf_dir)
        if codebook_store is not None:
            from tmdb_sync_spark.functions.codebook_store import (
                save_codebook,
            )

            save_codebook(codebook_store, cents, fingerprint)
    _CODEBOOK_MEMO[memo_key] = (fingerprint, cents)
    return cents


def ann_ivf_topk_at(
    spark: SparkSession, sf_dir: str, n_probe: int, top_k: int,
    codebook_store: str | None = None,
) -> DataFrame:
    """``ann_ivf_topk`` with explicit knobs — the sweep/recall surface.
    ``n_probe`` is THE IVF recall/cost dial (fraction of the corpus
    re-ranked ≈ n_probe/N_CENTROIDS; n_probe = N_CENTROIDS degenerates
    to exact search); the registered query pins the defaults so its
    oracle stays a single static SQL string. ``codebook_store`` points
    at a persisted-codebook dir (functions/codebook_store.py) so a
    fresh session serves the already-trained quantizer instead of
    retraining — load/train/save via :func:`resolve_codebook`."""
    if not (1 <= n_probe <= N_CENTROIDS):
        raise ValueError(f"n_probe out of range: {n_probe}")
    qd = _quantized(spark, sf_dir).where(F.col("nrm") > 0)
    # The coarse quantizer is a BOUNDED side model (≤ N_CENTROIDS rows, a
    # module constant) — collect it once and inline the centroids as
    # literals, the way production IVF ships its k-means codebook to every
    # task. Assignment and probe selection then run MAP-SIDE: per row, an
    # argmin/top-2 over the centroid array. The previous shape
    # (crossJoin(centroids) → groupBy(vec_id) / window) re-shuffled an
    # N_CENTROIDS-amplified copy of the full corpus just to pick each
    # row's nearest list — at 10^9 vectors that shuffle IS the job; this
    # form never shuffles the corpus at all (the only exchange left is the
    # probe equi-join on cid).
    # Train the codebook off the UNREPARTITIONED table (the training jobs
    # are scans + bounded collects, not a ride through parallel_table's
    # exchange). Resolution: memo → persisted store → train
    # (resolve_codebook) — the codebook is immutable for a given table
    # content, so repeat invocations (and, with a store, repeat
    # SESSIONS) skip the training jobs entirely.
    cents = resolve_codebook(spark, sf_dir, codebook_store)
    # asNondeterministic is the guide-§4.4 optimizer fence, not a
    # semantics change (the scorer is deterministic — stable argsort,
    # cid tiebreak): without it the r13 before-plan showed the Arrow
    # scorer evaluated TWICE per side — the probe explode's inferred
    # `size(cids) > 0` filter and the join key's inferred
    # `isnotnull(cid)` were pushed below the spread exchange and each
    # re-instantiated the UDF (4 ArrowEvalPython nodes for 2 calls),
    # re-running the quant projection AND the scorer on every corpus row
    # twice. The fence yields exactly one evaluation per side.
    topn = _codebook_topn(cents, n_probe).asNondeterministic()
    assign_cid = F.element_at(topn(F.col("v"), F.col("nrm")), 1)
    probe_cids = topn(F.col("v"), F.col("nrm"))
    assign = qd.select("vec_id", "v", "nrm", assign_cid.alias("cid"))
    probes = (
        qd.where(F.col("vec_id") % 50 == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qnrm"),
            probe_cids.alias("cids"),
        )
        .select(
            # explode_outer, not explode: InferFiltersFromGenerate adds
            # `size(cids) > 0 AND isnotnull(cids)` for the inner variant
            # (the minhash explode's documented trap) — the outer form
            # is exempt and identical here: topn always returns n_probe
            # cids for rows that passed nrm > 0
            "query_id", "qv", "qnrm",
            F.explode_outer(F.col("cids")).alias("cid"),
        )
    )
    sim = _dot(F.col("qv"), F.col("v")) / (
        F.sqrt(F.col("qnrm")) * F.sqrt(F.col("nrm"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        probes.join(assign, "cid")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            sim.alias("cosine_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


def ann_ground_truth(
    spark: SparkSession, sf_dir: str, k: int
) -> DataFrame:
    """Exact cosine top-``k`` for the ANN operators' query set
    (``vec_id % 50 == 0``) over the full valid corpus, self excluded —
    the recall denominator both ANN variants are graded against."""
    qd = _quantized(spark, sf_dir).where(F.col("nrm") > 0)
    queries = qd.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    cands = qd.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    return exact_topk_frames(queries, cands, k, exclude_self=True)


def ann_recall_at_k(ann: DataFrame, truth: DataFrame, k: int) -> float:
    """Mean recall@k: |ANN top-k ∩ exact top-k| / k, averaged over ALL
    ground-truth queries — a query the ANN misses entirely (empty
    bucket) scores 0, it does not silently drop out of the mean. This
    is the production ANN contract (recall@k at a probe budget), which
    determinism checks alone cannot express (r8 verdict #3). Driver
    cost: two scalar aggregates — never a per-row collect."""
    t = truth.where(F.col("rank") <= k).select("query_id", "neighbor_id")
    hits = ann.where(F.col("rank") <= k).select(
        "query_id", "neighbor_id"
    ).join(t, ["query_id", "neighbor_id"]).count()
    n_q = t.select("query_id").distinct().count()
    if n_q == 0:
        raise ValueError("ann_recall_at_k: ground truth has no queries")
    return hits / (k * n_q)
