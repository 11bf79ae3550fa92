"""Multimodal-column plumbing (SURVEY.md Phase 5).

Pattern: media (image/audio/video) ride as opaque ``binary`` columns with
typed metadata; decode / feature-extraction runs as Arrow-batched pandas
over ``mapInPandas`` — the one place Python is allowed in this engine
(registry rule: Python only at source/decode boundaries, reference
precedent: the frames image-metadata pipeline ``app/tmdb_client.py:169-282``).

The real decode (PIL/ffmpeg) is STUBBED — those libraries are not in this
container — behind ``_decode_stub``, which derives deterministic fake
dimensions from the payload bytes. Everything around the stub is real and
tested: binary encoding, Arrow batch transfer, output schema, and the
DuckDB oracle computing the same features from ``octet_length``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tmdb_sync_spark.io import table
from tmdb_sync_spark.registry import register

FEATURE_SCHEMA = (
    "doc_id bigint, byte_len bigint, width int, height int, "
    "n_frames int, media_format string"
)


def _decode_stub(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic fake decoder: width/height/frame-count from byte
    length. Replace with PIL/av decode in a full environment — the
    signature (bytes in, typed metadata out) is the contract."""
    n = len(payload)
    return n % 64, (n // 64) % 64, n % 5, "fakeimg"


def decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Arrow batch in, one feature frame out.
    Vectorized per batch; no per-row Python beyond the decode call itself
    (which in production is the C-backed image library)."""
    for pdf in batches:
        feats = [_decode_stub(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "byte_len": [len(p) for p in pdf["payload"]],
                "width": [f[0] for f in feats],
                "height": [f[1] for f in feats],
                "n_frames": [f[2] for f in feats],
                "media_format": [f[3] for f in feats],
            }
        )


SAMPLE_EVERY = 2   # keep every 2nd frame (production: fps-based stride)

SAMPLE_SCHEMA = (
    "doc_id bigint, byte_len bigint, media_format string, "
    "frame_idx int, frame_ts double, thumb_w int, thumb_h int"
)


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel with *row-expanding* output: one input media row
    fans out to its sampled frames, carrying the doc-level decode metadata
    along. In production this is the ffmpeg-frame-seek + thumbnail-resize
    loop; the stub derives the frame list from the decoded ``n_frames``
    metadata and fake 2:1-downscaled thumbnail dims — the Spark-side
    contract (schema, fan-out shape, Arrow batching) is identical."""
    for pdf in batches:
        rows = []
        for doc_id, byte_len, fmt, n_frames, w, h in zip(
            pdf["doc_id"], pdf["byte_len"], pdf["media_format"],
            pdf["n_frames"], pdf["width"], pdf["height"],
        ):
            for k in range(0, int(n_frames), SAMPLE_EVERY):
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "byte_len": int(byte_len),
                        "media_format": fmt,
                        "frame_idx": k,
                        "frame_ts": k / 24.0,      # fake 24 fps timeline
                        "thumb_w": int(w) // 2,
                        "thumb_h": int(h) // 2,
                    }
                )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "byte_len", "media_format",
                     "frame_idx", "frame_ts", "thumb_w", "thumb_h"],
        )


@register(
    "mm_media_pipeline",
    oracle=f"""
    WITH feats AS (
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
               CAST(octet_length(encode(text)) % 64 AS INT) AS width,
               CAST((octet_length(encode(text)) // 64) % 64 AS INT) AS height,
               CAST(octet_length(encode(text)) % 5 AS INT) AS n_frames,
               'fakeimg' AS media_format
        FROM documents
    )
    SELECT f.doc_id,
           f.byte_len,
           f.media_format,
           CAST(g.range AS INT) AS frame_idx,
           g.range / 24.0 AS frame_ts,
           CAST(f.width // 2 AS INT) AS thumb_w,
           CAST(f.height // 2 AS INT) AS thumb_h
    FROM feats f, range(0, 5) g
    WHERE g.range < f.n_frames AND g.range % {SAMPLE_EVERY} = 0
    """,
)
def mm_media_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode → feature extraction → frame sampling, one pipeline.

    ``documents.text`` stands in for the media bytes (utf-8 encoded to a
    real ``binary`` column). Chains the two mapInPandas stages — decode
    (typed metadata out of opaque bytes) then frame-sample (row-expanding
    with the doc-level features carried through) — the canonical
    video-curation shape: media scan → narrow binary projection → decode →
    stride-sample frames → per-frame features downstream. Both stages
    pipeline within the same task set (no shuffle between them:
    ``.explain`` shows a single WholeStageCodegen→Python chain); Python
    cost is amortized per ~10k-row Arrow batch. (On the single-file test
    tables the scan is one partition; production media lakes arrive
    pre-split, and the decode stub is too cheap here to amortize spinning
    up 32 Python workers.)
    """
    docs = table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    feats = payloads.mapInPandas(decode_features, FEATURE_SCHEMA)
    return feats.mapInPandas(sample_frames, SAMPLE_SCHEMA)
