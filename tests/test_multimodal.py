"""Multimodal decode plumbing: the real BMP/WAV/PNG/GIF codecs and the
stub dispatch (SURVEY Phase 5; reference precedent for image metadata
extraction at app/tmdb_client.py:169-282)."""

from __future__ import annotations

import struct
import zlib

import pytest

from tmdb_sync_spark.functions.multimodal import (
    BMP_HEADER_LEN,
    PNG_OVERHEAD,
    WAV_HEADER_LEN,
    _decode,
    _decode_bmp,
    _decode_gif,
    _decode_png,
    _decode_wav,
    _encode_bmp,
    _encode_gif,
    _encode_png,
    _encode_wav,
    _gif_params,
    _is_bmp,
    _is_gif,
    _is_png,
    _is_wav,
    _png_dims,
    _wav_params,
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
    w, h, n, fmt, _, _ = _decode(fake)
    assert fmt == "fakeimg" and (w, h, n) == (
        len(fake) % 64, (len(fake) // 64) % 64, len(fake) % 5
    )
    # short payloads can't be BMPs at all
    assert not _is_bmp(b"BM")


def test_wav_roundtrip_parses_real_chunks():
    body = b"\x01\x02" * 100            # 200 bytes
    payload = _encode_wav(10, body)     # doc 10: 1 channel, 16000 Hz
    assert _is_wav(payload)
    n_channels, sample_rate = _wav_params(10)
    assert (n_channels, sample_rate) == (1, 16000)
    # header fields are honest: RIFF size spans the whole file
    assert struct.unpack_from("<I", payload, 4)[0] == len(payload) - 8
    assert len(payload) == WAV_HEADER_LEN + 200
    assert _decode_wav(payload) == (16000, 1, 100)   # 200 bytes / 2 ba


def test_wav_truncates_to_whole_sample_frames():
    # doc 11: 2 channels -> block_align 4; 201 bytes keeps 200 (50 frames)
    payload = _encode_wav(11, b"x" * 201)   # 11 % 4 = 3 -> 20000 Hz
    assert _decode_wav(payload) == (20000, 2, 50)
    assert len(payload) == WAV_HEADER_LEN + 200


def test_wav_chunk_walk_handles_reordered_and_padded_chunks():
    # data BEFORE fmt, plus an unknown odd-sized chunk with pad byte —
    # a reader that assumes the canonical 44-byte layout would fail
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 2, 8000, 32000, 4, 16)
    data = struct.pack("<4sI", b"data", 8) + b"\x00" * 8
    junk = struct.pack("<4sI", b"LIST", 3) + b"abc\x00"   # padded to even
    body = data + junk + fmt
    payload = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    assert _is_wav(payload)
    assert _decode_wav(payload) == (8000, 2, 2)          # 8 bytes / 4 ba


def test_png_roundtrip_parses_ihdr_and_verifies_crcs():
    body = b"pixel bytes here" * 9
    payload = _encode_png(123, body)          # doc 123: 4 x 4 per _png_dims
    assert _is_png(payload)
    assert _png_dims(123) == (123 % 40 + 1, 123 % 30 + 1)
    assert _decode_png(payload) == (*_png_dims(123), 1, "png")
    # container size is the oracle-predictable stored-stream formula
    assert len(payload) == len(body) + PNG_OVERHEAD
    # the IDAT is a genuine zlib stream holding the body
    (ihdr_len,) = struct.unpack_from(">I", payload, 8)
    idat_off = 8 + 12 + ihdr_len
    (idat_len,) = struct.unpack_from(">I", payload, idat_off)
    idat = payload[idat_off + 8:idat_off + 8 + idat_len]
    assert zlib.decompress(idat) == body


def test_png_corrupt_chunk_fails_loudly():
    p = bytearray(_encode_png(9, b"abcdef"))
    p[20] ^= 0xFF                             # flip a byte inside IHDR data
    with pytest.raises(ValueError, match="CRC mismatch"):
        _decode_png(bytes(p))


def test_gif_block_walk_counts_frames_and_skips_extensions():
    body = b"z" * 600                         # spans three 255-byte sub-blocks
    payload = _encode_gif(14, body)           # doc 14: 15 x 15, 3 frames
    assert _is_gif(payload)
    assert _decode_gif(payload) == (*_gif_params(14)[:2], 3, "gif")
    # a graphic-control extension before the frames must be skipped, and
    # a global color table honored, without miscounting frames
    gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    lsd = struct.pack("<HHBBB", 7, 5, 0x80, 0, 0)   # GCT flag, 2 entries
    with_extras = (
        b"GIF89a" + lsd + b"\x00" * 6 + gce + payload[13:]
    )
    assert _decode_gif(with_extras) == (7, 5, 3, "gif")


def test_gif_truncation_raises_not_wrong_frame_count():
    payload = _encode_gif(14, b"z" * 600)     # 3 frames
    # cut mid-sub-block: must NOT decode to a plausible smaller count
    with pytest.raises(ValueError):
        _decode_gif(payload[:30])
    # missing trailer only
    with pytest.raises(ValueError, match="without a trailer"):
        _decode_gif(payload[:-1])
    # through the dispatch both become dead-letter rows
    assert _decode(payload[:30])[3] == "corrupt"
    assert _decode(payload[:-1])[3] == "corrupt"


def test_gif_magic_alone_is_not_enough():
    # raw text starting with the printable magic fails the structural
    # first-block check and stays on the oracle-predicted stub path
    assert not _is_gif(b"GIF89a is an image format from 1989, neat")
    assert _decode(b"GIF89a is an image format from 1989, neat")[3] == "fakeimg"


def test_png_body_cap_keeps_oracle_formula_exact():
    import zlib as z

    assert len(z.compress(b"x" * 65531, 0)) == 65531 + 11   # single block
    assert len(z.compress(b"x" * 65532, 0)) > 65532 + 11    # splits


def test_decode_dispatch_prefers_real_containers():
    from tmdb_sync_spark.functions.multimodal import _encode_jpeg

    assert _decode(_encode_wav(5, b"ab" * 30))[3] == "wav"
    assert _decode(_encode_bmp(8, 8, b""))[3] == "bmp"
    assert _decode(_encode_png(3, b"body"))[3] == "png"
    assert _decode(_encode_gif(4, b"body"))[3] == "gif"
    assert _decode(_encode_jpeg(11, b"body"))[3] == "jpeg"
    assert _decode(b"RIFFxxxx")[3] == "fakeimg"          # too short for WAV
    # sniff passes but the container body is garbage: corrupt-row
    # fallback, never an exception out of the batch kernel
    assert _decode(_encode_gif(4, b"body")[:15])[3] == "corrupt"
    w, h, n, fmt, sr, ch = _decode(b"plain text payload, no container")
    assert fmt == "fakeimg" and sr is None and ch is None


def test_corrupt_rows_sample_no_frames():
    import pandas as pd

    from tmdb_sync_spark.functions.multimodal import (
        decode_features,
        sample_frames,
    )

    # stripe-consistent ids: 4 is a GIF-stripe doc, 7 a BMP-stripe doc
    truncated = _encode_gif(4, b"body")[:15]
    intact = _encode_bmp(6, 4, b"\x00" * 6)
    src = pd.DataFrame({"doc_id": [4, 7], "payload": [truncated, intact]})
    feats = pd.concat(decode_features(iter([src])))
    assert list(feats["media_format"]) == ["corrupt", "bmp"]
    out = pd.concat(sample_frames(iter([feats])))
    # the corrupt row is dead-lettered out of the frame fan-out entirely
    assert list(out["media_format"]) == ["bmp"]


def test_decode_is_stripe_gated_not_sniffed():
    """ADVICE r4: a RAW (never-wrapped) doc whose text accidentally
    carries a container magic must take the oracle-predicted stub path —
    neither false-parse as media nor dead-letter as corrupt."""
    import pandas as pd

    from tmdb_sync_spark.functions.multimodal import (
        _decode_expected,
        _encode_jpeg,
        _encode_png,
        decode_features,
    )

    # doc_id 1 is raw (not divisible by 7, 5, 11, 3, or 2); this payload
    # IS a structurally valid GIF, so a sniffing decode would call it gif
    fake_gif = _encode_gif(4, b"body")
    assert _decode(fake_gif)[3] == "gif"
    assert _decode_expected(1, fake_gif)[3] == "fakeimg"
    # ... and a *malformed* accidental magic must not dead-letter either
    assert _decode_expected(1, fake_gif[:15])[3] == "fakeimg"
    assert _decode_expected(1, b"RIFF1234WAVEfmt plain text")[3] == "fakeimg"
    # wrapped stripes still parse / dead-letter exactly as before
    src = pd.DataFrame(
        {"doc_id": [1, 13], "payload": [fake_gif, fake_gif[:15]]}
    )
    feats = pd.concat(decode_features(iter([src])))
    assert list(feats["media_format"]) == ["fakeimg", "fakeimg"]
    # oversize JPEG/PNG-stripe bodies ship raw; the magic byte (0xFF /
    # 0x89, both invalid UTF-8 leads) is what distinguishes them
    assert _decode_expected(11, _encode_jpeg(11, b"body"))[3] == "jpeg"
    assert _decode_expected(11, b"x" * 70000)[3] == "fakeimg"
    assert _decode_expected(3, _encode_png(3, b"body"))[3] == "png"
    assert _decode_expected(3, b"x" * 70000)[3] == "fakeimg"


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_corpus_has_no_accidental_magic_prefixes(sf):
    """Corpus-fact guard (ADVICE r4, second line of defense): the decode
    path is now stripe-gated (``_decode_expected``), so a raw doc with an
    accidental magic can no longer diverge from the oracle — but keep
    asserting the corpus carries no such prefixes per SF, so the sniffing
    ``_decode`` (still the property-test surface) and any future caller
    that reaches for it stay safe, and a regenerated corpus that breaks
    the assumption fails HERE with a clear message."""
    import duckdb

    from tmdb_sync_spark.functions.multimodal import (
        JPEG_MAX_BODY,
        JPEG_WRAP_EVERY,
        PNG_MAX_BODY,
        _is_jpeg,
    )

    rows = duckdb.execute(
        "select doc_id, text from "
        f"read_parquet('/root/testdata/{sf}/documents.parquet')"
    ).fetchall()
    assert rows
    for doc_id, text in rows:
        body = text.encode("utf-8")
        # mirror encode_media's elif chain: an oversize %11/%3 doc takes
        # its wrap branch but ships the raw body (no fall-through to GIF)
        if doc_id % 7 == 0 or doc_id % 5 == 0:
            raw = False
        elif doc_id % JPEG_WRAP_EVERY == 0:
            raw = len(body) > JPEG_MAX_BODY
        elif doc_id % 3 == 0:
            raw = len(body) > PNG_MAX_BODY
        elif doc_id % 2 == 0:
            raw = False
        else:
            raw = True
        if raw:
            for sniff in (_is_bmp, _is_wav, _is_png, _is_gif, _is_jpeg):
                assert not sniff(body), (
                    f"doc {doc_id} at {sf} is a raw-stripe doc whose text "
                    f"sniffs as {sniff.__name__} — the decode would "
                    "dead-letter it while the oracle predicts a stub row"
                )


def test_mixed_batch_dispatches_per_row(spark):
    """End-to-end through the registered pipeline at the smallest SF:
    wrapped docs carry genuinely parsed dims, others the stub's."""
    from tmdb_sync_spark.functions.multimodal import mm_media_pipeline

    out = mm_media_pipeline(spark, "/root/testdata/sf0.001").toPandas()
    bmp = out[out["media_format"] == "bmp"]
    wav = out[out["media_format"] == "wav"]
    png = out[out["media_format"] == "png"]
    gif = out[out["media_format"] == "gif"]
    jpeg = out[out["media_format"] == "jpeg"]
    other = out[out["media_format"] == "fakeimg"]
    for frame in (bmp, wav, png, gif, jpeg, other):
        assert len(frame) > 0
    # JPEG rows: one frame, dims from the genuinely parsed SOF0 header
    assert (jpeg["doc_id"] % 11 == 0).all()
    assert (jpeg["frame_idx"] == 0).all()
    assert (jpeg["thumb_w"] == (jpeg["doc_id"] % 50 + 1) // 2).all()
    assert (jpeg["thumb_h"] == (jpeg["doc_id"] % 35 + 1) // 2).all()
    # PNG rows: one frame, dims from the genuinely parsed IHDR
    assert (png["doc_id"] % 3 == 0).all()
    assert (png["thumb_w"] == (png["doc_id"] % 40 + 1) // 2).all()
    assert (png["thumb_h"] == (png["doc_id"] % 30 + 1) // 2).all()
    # GIF rows: frame count from the real image-descriptor walk
    assert (gif["doc_id"] % 2 == 0).all()
    n_rows = gif.groupby("doc_id")["frame_idx"].count()
    expected = (n_rows.index % 3 + 1 + 1) // 2      # ceil(n_frames / 2)
    assert (n_rows == expected).all()
    # BMP rows: one frame each, dims from the container header
    assert (bmp["frame_idx"] == 0).all()
    assert (bmp["thumb_w"] == (bmp["doc_id"] % 64 + 1) // 2).all()
    assert (bmp["thumb_h"] == (bmp["doc_id"] % 48 + 1) // 2).all()
    assert (bmp["doc_id"] % 7 == 0).all()
    # WAV rows: %5-but-not-%7 docs, no thumbnails, window 0 at ts 0
    assert (wav["doc_id"] % 5 == 0).all() and (wav["doc_id"] % 7 != 0).all()
    assert wav["thumb_w"].isna().all() and wav["thumb_h"].isna().all()
    assert (wav["frame_idx"] == 0).all() and (wav["frame_ts"] == 0.0).all()


def test_wav_undersized_fmt_chunk_dead_letters():
    """A fmt chunk declaring fewer than the 16 PCM-header bytes must
    raise (dead-letter), not silently parse the NEXT chunk's bytes as
    sample_rate/n_channels (review finding, confirmed by experiment)."""
    import struct

    from tmdb_sync_spark.functions.multimodal import _decode, _decode_wav

    # RIFF/WAVE with a zero-size fmt chunk followed by a junk chunk
    # whose bytes would parse as plausible positive shorts
    body = b"fmt " + struct.pack("<I", 0) + b"junk" + struct.pack("<I", 16) \
        + struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(ValueError, match="fmt chunk smaller"):
        _decode_wav(payload)
    assert _decode(payload)[3] == "corrupt"
