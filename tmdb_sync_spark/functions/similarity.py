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
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tmdb_sync_spark.io import parallel_table, table
from tmdb_sync_spark.registry import register

DIM = 64
TOP_K = 5
N_SIGN_BITS = 8

_QUANT_SQL = """
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                              x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS v
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, v,
               CAST(list_aggregate(list_transform(generate_series(1, 64), i -> v[i] * v[i]),
                                   'sum') AS BIGINT) AS nrm
        FROM q
    )
"""


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vec_id, v (quantized BIGINT vector), nrm (exact squared norm)."""
    emb = parallel_table(spark, sf_dir, "embeddings")
    v = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 1000 + 0.5).cast("long"),
    )
    df = emb.select("vec_id", v.alias("v"))
    nrm = F.aggregate(
        F.zip_with(F.col("v"), F.col("v"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select("vec_id", "v", nrm.alias("nrm"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
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
    dot = _dot(F.col("qv"), F.col("cv"))
    sim = dot / (F.sqrt(F.col("qnrm")) * F.sqrt(F.col("cnrm")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cands.crossJoin(F.broadcast(queries))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


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
    JOIN b c ON qq.vec_id % 50 = 0 AND c.vec_id <> qq.vec_id AND c.bucket = qq.bucket
    QUALIFY rank <= 3
    """,
)
def ann_signlsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via sign-LSH bucketing.

    Bucket = sign bits of the first 8 components (axis-aligned random
    hyperplanes — portable across engines, unlike seeded random
    projections). Candidates are only same-bucket vectors, so the join is
    an *equi*-join on the bucket key: at 100 TB this shuffles each side
    once on ``bucket`` instead of building an O(n·q) cross product, and
    bucket cardinality (2^8..2^64) is tuned to keep partitions balanced.
    """
    qd = _quantized(spark, sf_dir)
    emb = table(spark, sf_dir, "embeddings")
    bits = [
        F.when(F.element_at(F.col("embedding"), i + 1) >= 0, "1").otherwise("0")
        for i in range(N_SIGN_BITS)
    ]
    b = (
        emb.join(qd, "vec_id")
        .where(F.col("nrm") > 0)
        .select("vec_id", F.concat(*bits).alias("bucket"), "v", "nrm")
    )
    queries = b.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("bucket"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
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
            (F.col("bucket") == F.col("c_bucket"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select("query_id", "bucket", "neighbor_id", sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("query_id", "bucket", "neighbor_id", "rank", "cosine_sim")
    )
