"""Multimodal decode plumbing: the real BMP codec and the stub dispatch
(SURVEY Phase 5; reference precedent for image metadata extraction at
app/tmdb_client.py:169-282)."""

from __future__ import annotations

import struct

from tmdb_sync_spark.functions.multimodal import (
    BMP_HEADER_LEN,
    _decode,
    _decode_bmp,
    _encode_bmp,
    _is_bmp,
)


def test_bmp_roundtrip_parses_real_header_fields():
    payload = _encode_bmp(640, 480, b"\x00" * 12)
    assert _is_bmp(payload)
    assert _decode_bmp(payload) == (640, 480, 1, "bmp")
    # the container is a REAL BMP: file size and pixel offset are honest
    assert payload[:2] == b"BM"
    assert struct.unpack_from("<I", payload, 2)[0] == len(payload)
    assert struct.unpack_from("<I", payload, 10)[0] == BMP_HEADER_LEN


def test_bmp_topdown_negative_height():
    # height < 0 = top-down row order; dimensions are the magnitude
    p = bytearray(_encode_bmp(64, 48, b""))
    struct.pack_into("<i", p, 22, -48)
    assert _decode_bmp(bytes(p)) == (64, 48, 1, "bmp")


def test_non_bmp_payloads_take_the_stub_path():
    # even a text payload that STARTS with the magic fails the fixed
    # header-field checks and falls through to the declared stub
    fake = b"BMW is a car maker, not a bitmap, but this is long enough" * 2
    assert not _is_bmp(fake)
    w, h, n, fmt = _decode(fake)
    assert fmt == "fakeimg" and (w, h, n) == (
        len(fake) % 64, (len(fake) // 64) % 64, len(fake) % 5
    )
    # short payloads can't be BMPs at all
    assert not _is_bmp(b"BM")


def test_mixed_batch_dispatches_per_row(spark):
    """End-to-end through the registered pipeline at the smallest SF:
    wrapped docs carry genuinely parsed dims, others the stub's."""
    from tmdb_sync_spark.functions.multimodal import mm_media_pipeline

    out = mm_media_pipeline(spark, "/root/testdata/sf0.001").toPandas()
    bmp = out[out["media_format"] == "bmp"]
    other = out[out["media_format"] == "fakeimg"]
    assert len(bmp) > 0 and len(other) > 0
    # BMP rows: one frame each, dims from the container header
    assert (bmp["frame_idx"] == 0).all()
    assert (bmp["thumb_w"] == (bmp["doc_id"] % 64 + 1) // 2).all()
    assert (bmp["thumb_h"] == (bmp["doc_id"] % 48 + 1) // 2).all()
    assert (bmp["doc_id"] % 7 == 0).all()
