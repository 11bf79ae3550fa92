"""Document chunking — fixed-window splitting with overlap, the
context-length preparation step between curation and embedding/training.

Every retrieval or embedding pipeline over a web-scale corpus runs this
exact op: a document longer than the model's context window is cut into
overlapping windows, each carrying (parent id, chunk index, offset) so
downstream joins can re-attach chunk-level results (embeddings, scores)
to their parent document. Two variants:

- **Character windows** (:func:`chunk_documents`): windows of
  ``chunk_chars`` codepoints advancing by ``chunk_chars - overlap``;
  byte/char budgets are what embedding APIs meter.
- **Whitespace-token windows** (:func:`chunk_documents_tokens`):
  windows of ``chunk_tokens`` whitespace-delimited tokens — the
  approximation of model tokens the engine's token counter
  (functions/text.py) already uses. Chunk text is the window's tokens
  re-joined with single spaces, so intra-document whitespace runs are
  NOT preserved (same normalization the token counter applies); callers
  that need byte-exact provenance use the character variant.

Scale shape — both variants are a pure per-row flatMap expressed in
Catalyst: ``sequence()`` builds the window starts, an array
``transform`` cuts each window, ``posexplode`` emits one row per chunk.
No UDF, no shuffle, no action; the op composes onto a parquet scan with
column pruning intact and parallelism equal to the scan's. Output size
is input × (1 + overlap/step) — amplification is declared by the
parameters, never data-dependent. At 100 TB this is the ideal operator
class: embarrassingly parallel, whole-stage-codegen'd end to end.

Chunk-count contract (both variants, for unit length L, window W,
step S = W - overlap): ``n_chunks = 1 + ceil(max(0, L - W) / S)`` —
every unit of the document is covered, the FINAL window is the only
one allowed to be short, and a document with L ≤ W (including L = 0
for an empty-but-present text) yields exactly one chunk: its identity.
NULL text yields zero chunks (the document disappears from the chunk
frame — chunks of nothing are nothing; the parity and property tests
pin both edges).

Driver-registered since r8 (``chunk_documents``, rotated into the
50-slot window per the r7 verdict); tests/test_chunking.py additionally
runs DuckDB twins of both variants at more parameter points plus
Hypothesis properties (coverage, overlap, reconstruction, determinism).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from tmdb_sync_spark.registry import register


def _check(chunk: int, overlap: int, what: str) -> int:
    if chunk <= 0:
        raise ValueError(f"chunking: {what} must be positive, got {chunk}")
    if overlap < 0 or overlap >= chunk:
        raise ValueError(
            f"chunking: overlap must satisfy 0 <= overlap < {what} "
            f"({overlap} vs {chunk}) — step would be <= 0"
        )
    return chunk - overlap


def _starts(n_units: Column, window: int, step: int) -> Column:
    """Array of window start offsets (0-based, in units) under the
    chunk-count contract: starts 0, step, 2*step, …, covering the last
    unit; one start (0) when n_units <= window."""
    last = F.ceil(
        F.greatest(n_units - F.lit(window), F.lit(0)) / F.lit(step)
    ).cast("int")
    return F.sequence(F.lit(0), last * F.lit(step), F.lit(step))


def chunk_documents(
    df: DataFrame,
    chunk_chars: int,
    overlap: int = 0,
    *,
    key: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per character window: ``(key, chunk_index, chunk_start,
    chunk_text)``.

    ``chunk_start`` is the 0-based codepoint offset of the window in the
    original text — ``chunk_text = text[chunk_start : chunk_start +
    chunk_chars]`` exactly, so chunk-level results join back to byte
    ranges of the source document. Offsets/lengths count CODEPOINTS
    (Spark ``length``/``substr`` semantics), not bytes.
    """
    step = _check(chunk_chars, overlap, "chunk_chars")
    text = F.col(text_col)
    starts = _starts(F.length(text), chunk_chars, step)
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("chunk_start"),
            text.substr(s + 1, F.lit(chunk_chars)).alias("chunk_text"),
        ),
    )
    return (
        df.where(text.isNotNull())
        .select(F.col(key), F.posexplode(chunks).alias("chunk_index", "c"))
        .select(
            key,
            "chunk_index",
            F.col("c.chunk_start").alias("chunk_start"),
            F.col("c.chunk_text").alias("chunk_text"),
        )
    )


@register(
    "chunk_documents",
    # the same contract the pytest twin pins at three parameter points:
    # starts 0, S, 2S, ... covering the last codepoint; final window may
    # be short; NULL text contributes no chunks
    oracle="""
    SELECT doc_id, CAST(i AS INT) AS chunk_index,
           CAST(i * 150 AS INT) AS chunk_start,
           substring(text, CAST(i * 150 AS INT) + 1, 200) AS chunk_text
    FROM documents,
         unnest(generate_series(0, CAST(ceil(
             greatest(length(text) - 200, 0) / 150) AS BIGINT))) AS t(i)
    WHERE text IS NOT NULL
    """,
)
def chunk_documents_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver registration of :func:`chunk_documents` (rotated into the
    50-slot window in r8): 200-char windows, 50-char overlap, over the
    documents table — the embedding-prep chunker at its default shape.
    Pure Catalyst flatMap: sequence → transform → posexplode, zero UDF,
    zero shuffle, parallelism = the scan's (plan pinned in
    tests/test_chunking.py::test_no_shuffle_in_plan)."""
    from tmdb_sync_spark.io import parallel_table

    return (
        chunk_documents(parallel_table(spark, sf_dir, "documents"), 200, 50)
        .withColumn("chunk_index", F.col("chunk_index").cast("int"))
        .withColumn("chunk_start", F.col("chunk_start").cast("int"))
    )


def chunk_documents_tokens(
    df: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    *,
    key: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per whitespace-token window: ``(key, chunk_index,
    token_start, n_tokens, chunk_text)``.

    Tokens are maximal ``\\S+`` runs of the TRIMMED text (the token
    counter's definition, functions/text.py); ``token_start`` is the
    0-based index of the window's first token, ``n_tokens`` its actual
    token count (= ``chunk_tokens`` except possibly the final window),
    and ``chunk_text`` the window's tokens joined with single spaces.
    A text that is empty or all-whitespace has zero tokens and yields
    one empty chunk (L = 0 ≤ W — the identity chunk of the contract).
    """
    from tmdb_sync_spark.functions.text import tokens_expr

    step = _check(chunk_tokens, overlap, "chunk_tokens")
    text = F.col(text_col)
    # THE engine tokenizer (text.tokens_expr — the single source every
    # token-materializing operator must build from, so a future
    # whitespace-class change can never desync chunk boundaries from
    # token budgets); the filter keeps token arrays honest for
    # empty/all-whitespace texts (split yields [''] there — zero
    # tokens, not one empty token)
    toks = F.filter(tokens_expr(text), lambda t: t != F.lit(""))
    starts = _starts(F.size(toks), chunk_tokens, step)
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("token_start"),
            F.slice(toks, s + 1, F.lit(chunk_tokens)).alias("toks"),
        ),
    )
    return (
        df.where(text.isNotNull())
        .select(F.col(key), F.posexplode(chunks).alias("chunk_index", "c"))
        .select(
            key,
            "chunk_index",
            F.col("c.token_start").alias("token_start"),
            F.size(F.col("c.toks")).alias("n_tokens"),
            F.array_join(F.col("c.toks"), " ").alias("chunk_text"),
        )
    )
