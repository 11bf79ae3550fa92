"""Multimodal-column plumbing (SURVEY.md Phase 5).

Pattern: media (image/audio/video) ride as opaque ``binary`` columns with
typed metadata; decode / feature-extraction runs as Arrow-batched pandas
over ``mapInPandas`` — the one place Python is allowed in this engine
(registry rule: Python only at source/decode boundaries, reference
precedent: the frames image-metadata pipeline ``app/tmdb_client.py:169-282``).

One codec is REAL: BMP headers are parsed with stdlib ``struct``
(``_decode_bmp`` — magic check, little-endian dims at offsets 18/22,
top-down negative-height handling), dispatched on the ``BM`` magic.
Formats whose decoders genuinely need PIL/ffmpeg (absent from this
container) fall through to ``_decode_stub``, which derives deterministic
fake dimensions from the payload bytes. Everything around the decoders is
real and tested: binary encoding, Arrow batch transfer, output schema,
and the DuckDB oracle predicting the same features per branch.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from tmdb_sync_spark.io import table
from tmdb_sync_spark.registry import register

MEDIA_SCHEMA = "doc_id bigint, payload binary"

FEATURE_SCHEMA = (
    "doc_id bigint, byte_len bigint, width int, height int, "
    "n_frames int, media_format string"
)

BMP_WRAP_EVERY = 7       # every 7th doc arrives as a real BMP container
BMP_HEADER_LEN = 54      # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)


def _encode_bmp(width: int, height: int, body: bytes) -> bytes:
    """A genuine BMP container: BITMAPFILEHEADER + BITMAPINFOHEADER
    (24bpp, the classic 54-byte layout) followed by ``body`` as the pixel
    area. Header fields are real — file size, pixel offset, dims — so any
    BMP-aware reader parses the same width/height the decoder extracts."""
    file_header = struct.pack(
        "<2sIHHI", b"BM", BMP_HEADER_LEN + len(body), 0, 0, BMP_HEADER_LEN
    )
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body),
        2835, 2835, 0, 0,
    )
    return file_header + info_header + body


def _decode_bmp(payload: bytes) -> tuple[int, int, int, str]:
    """Real stdlib BMP header parse: little-endian int32 width/height at
    offsets 18/22 of the classic layout; negative height means top-down
    row order, dimensions are its magnitude. Still images are one frame."""
    width, height = struct.unpack_from("<ii", payload, 18)
    return width, abs(height), 1, "bmp"


def _is_bmp(payload: bytes) -> bool:
    # magic + the two fixed header fields (pixel offset 54, info size 40):
    # a text payload that merely starts with 'BM' cannot match both
    return (
        len(payload) >= BMP_HEADER_LEN
        and payload[:2] == b"BM"
        and struct.unpack_from("<I", payload, 10)[0] == BMP_HEADER_LEN
        and struct.unpack_from("<I", payload, 14)[0] == 40
    )


def _decode_stub(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic fake decoder for formats whose real parse needs
    PIL/av (absent here): width/height/frame-count from byte length. The
    signature (bytes in, typed metadata out) is the contract."""
    n = len(payload)
    return n % 64, (n // 64) % 64, n % 5, "fakeimg"


def _decode(payload: bytes) -> tuple[int, int, int, str]:
    if _is_bmp(payload):
        return _decode_bmp(payload)
    return _decode_stub(payload)


def encode_media(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel standing in for the media lake's blob source:
    every ``BMP_WRAP_EVERY``-th document's bytes arrive inside a real BMP
    container (dims derived from doc_id, so the oracle can predict them);
    the rest stay raw. Models the mixed-container reality of a crawl."""
    for pdf in batches:
        payloads = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            body = text.encode("utf-8")
            if int(doc_id) % BMP_WRAP_EVERY == 0:
                payloads.append(_encode_bmp(
                    int(doc_id) % 64 + 1, int(doc_id) % 48 + 1, body
                ))
            else:
                payloads.append(body)
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64"), "payload": payloads}
        )


def decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Arrow batch in, one feature frame out.
    Vectorized per batch; no per-row Python beyond the decode call itself
    (which in production is the C-backed image library)."""
    for pdf in batches:
        feats = [_decode(p) for p in pdf["payload"]]
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
               CASE WHEN doc_id % {BMP_WRAP_EVERY} = 0
                    THEN CAST(octet_length(encode(text)) + {BMP_HEADER_LEN}
                              AS BIGINT)
                    ELSE CAST(octet_length(encode(text)) AS BIGINT)
               END AS byte_len,
               CASE WHEN doc_id % {BMP_WRAP_EVERY} = 0
                    THEN CAST(doc_id % 64 + 1 AS INT)
                    ELSE CAST(octet_length(encode(text)) % 64 AS INT)
               END AS width,
               CASE WHEN doc_id % {BMP_WRAP_EVERY} = 0
                    THEN CAST(doc_id % 48 + 1 AS INT)
                    ELSE CAST((octet_length(encode(text)) // 64) % 64 AS INT)
               END AS height,
               CASE WHEN doc_id % {BMP_WRAP_EVERY} = 0 THEN 1
                    ELSE CAST(octet_length(encode(text)) % 5 AS INT)
               END AS n_frames,
               CASE WHEN doc_id % {BMP_WRAP_EVERY} = 0 THEN 'bmp'
                    ELSE 'fakeimg'
               END AS media_format
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
    """Binary encode → decode → feature extraction → frame sampling.

    ``documents.text`` stands in for the media bytes; every 7th doc is
    containerized as a REAL BMP (``encode_media``) whose header the
    decode stage genuinely parses with ``struct`` — other payloads take
    the declared stub path. Chains three mapInPandas stages — blob
    source, decode (typed metadata out of opaque bytes), frame-sample
    (row-expanding, doc-level features carried through) — the canonical
    video-curation shape: media scan → narrow binary projection → decode
    → stride-sample frames → per-frame features downstream. The stages
    pipeline within the same task set (no shuffle between them:
    ``.explain`` shows a single WholeStageCodegen→Python chain); Python
    cost is amortized per ~10k-row Arrow batch. (On the single-file test
    tables the scan is one partition; production media lakes arrive
    pre-split, and decode here is too cheap to amortize spinning up 32
    Python workers.)
    """
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = docs.mapInPandas(encode_media, MEDIA_SCHEMA)
    feats = payloads.mapInPandas(decode_features, FEATURE_SCHEMA)
    return feats.mapInPandas(sample_frames, SAMPLE_SCHEMA)
