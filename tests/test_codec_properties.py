"""Property-based codec contracts (hypothesis): every container the
synthetic blob source can emit roundtrips exactly, and every proper
truncation of one is rejected into the corrupt-row path — never decoded
into plausible-but-wrong metadata and never an exception escaping
``_decode``."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from tmdb_sync_spark.functions.multimodal import (
    JPEG_OVERHEAD,
    PNG_MAX_BODY,
    PNG_OVERHEAD,
    _decode,
    _decode_bmp,
    _decode_gif,
    _decode_jpeg,
    _decode_png,
    _decode_wav,
    _encode_bmp,
    _encode_gif,
    _encode_jpeg,
    _encode_png,
    _encode_wav,
    _gif_params,
    _is_bmp,
    _is_gif,
    _is_jpeg,
    _is_png,
    _is_wav,
    _jpeg_dims,
    _png_dims,
    _wav_params,
)

BODIES = st.binary(min_size=0, max_size=2000)
DOC_IDS = st.integers(min_value=0, max_value=10_000)


@given(w=st.integers(1, 1 << 20), h=st.integers(1, 1 << 20), body=BODIES)
def test_bmp_roundtrip_property(w, h, body):
    p = _encode_bmp(w, h, body)
    assert _is_bmp(p)
    assert _decode_bmp(p) == (w, h, 1, "bmp")


@given(doc_id=DOC_IDS, body=BODIES)
def test_wav_roundtrip_property(doc_id, body):
    p = _encode_wav(doc_id, body)
    assert _is_wav(p)
    n_channels, sample_rate = _wav_params(doc_id)
    ba = n_channels * 2
    assert _decode_wav(p) == (sample_rate, n_channels, len(body) // ba)


@given(doc_id=DOC_IDS, body=BODIES)
def test_png_roundtrip_and_size_formula_property(doc_id, body):
    p = _encode_png(doc_id, body)
    assert _is_png(p)
    assert _decode_png(p) == (*_png_dims(doc_id), 1, "png")
    assert len(p) == len(body) + PNG_OVERHEAD


@given(doc_id=DOC_IDS, body=BODIES)
def test_gif_roundtrip_property(doc_id, body):
    p = _encode_gif(doc_id, body)
    assert _is_gif(p)
    w, h, n_frames = _gif_params(doc_id)
    assert _decode_gif(p) == (w, h, n_frames, "gif")


# sub-block framing boundaries: bodies straddling the 255-byte block size
@given(
    doc_id=DOC_IDS,
    size=st.sampled_from([254, 255, 256, 509, 510, 511, 765]),
)
def test_gif_subblock_boundaries(doc_id, size):
    p = _encode_gif(doc_id, b"\x00" * size)   # zero bytes ≠ terminators
    assert _decode_gif(p)[2] == _gif_params(doc_id)[2]


@settings(max_examples=40)
@given(doc_id=DOC_IDS, body=BODIES, data=st.data())
def test_gif_every_truncation_is_corrupt_or_stub(doc_id, body, data):
    p = _encode_gif(doc_id, body)
    cut = data.draw(st.integers(0, len(p) - 1), label="cut")
    fmt = _decode(p[:cut])[3]
    # short prefixes fail the sniff (stub/fakeimg); structurally
    # sniffable ones must land in 'corrupt' — never a valid 'gif'
    assert fmt in ("fakeimg", "corrupt")


@settings(max_examples=40)
@given(doc_id=DOC_IDS, body=st.binary(min_size=1, max_size=500), data=st.data())
def test_png_every_truncation_is_corrupt_or_stub(doc_id, body, data):
    p = _encode_png(doc_id, body)
    cut = data.draw(st.integers(0, len(p) - 1), label="cut")
    fmt = _decode(p[:cut])[3]
    assert fmt in ("fakeimg", "corrupt")


@settings(max_examples=40)
@given(doc_id=DOC_IDS, body=st.binary(min_size=8, max_size=500), data=st.data())
def test_wav_truncation_never_overcounts_frames(doc_id, body, data):
    p = _encode_wav(doc_id, body)
    cut = data.draw(st.integers(0, len(p) - 1), label="cut")
    out = _decode(p[:cut])
    if out[3] == "wav":
        # a prefix that still parses may only report frames whose PCM
        # bytes are actually present
        n_channels, _ = _wav_params(doc_id)
        assert out[2] * n_channels * 2 <= cut
    else:
        assert out[3] in ("fakeimg", "corrupt")


@given(doc_id=DOC_IDS, body=BODIES)
def test_jpeg_roundtrip_and_size_formula_property(doc_id, body):
    p = _encode_jpeg(doc_id, body)
    assert _is_jpeg(p)
    assert _decode_jpeg(p) == (*_jpeg_dims(doc_id), 1, "jpeg")
    assert len(p) == len(body) + JPEG_OVERHEAD


@settings(max_examples=40)
@given(doc_id=DOC_IDS, body=BODIES, data=st.data())
def test_jpeg_every_truncation_is_corrupt_or_stub(doc_id, body, data):
    p = _encode_jpeg(doc_id, body)
    cut = data.draw(st.integers(0, len(p) - 1), label="cut")
    fmt = _decode(p[:cut])[3]
    assert fmt in ("fakeimg", "corrupt")


def test_jpeg_marker_walk_handles_fill_and_rst_markers():
    # fill bytes before a marker and standalone RST/TEM markers between
    # segments are legal; the walk must skip them and still find SOF dims
    p = _encode_jpeg(13, b"payload")
    soi, rest = p[:2], p[2:]
    padded = soi + b"\xff" + rest            # fill byte before COM
    assert _decode_jpeg(padded)[:2] == _jpeg_dims(13)
    with_rst = soi + b"\xff\xd0" + b"\xff\x01" + rest
    assert _decode_jpeg(with_rst)[:2] == _jpeg_dims(13)


def test_png_max_body_is_the_single_block_bound():
    import zlib

    assert len(zlib.compress(b"x" * PNG_MAX_BODY, 0)) == PNG_MAX_BODY + 11
    assert len(zlib.compress(b"x" * (PNG_MAX_BODY + 1), 0)) > PNG_MAX_BODY + 12


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=10**7),
       st.text(min_size=0, max_size=200))
def test_wrap_stripe_mirrors_encode_media(did, text):
    """_wrap_stripe (the decode gate's mirror of encode_media's elif
    chain) must agree with the container encode_media ACTUALLY emits for
    every doc_id — if the chains drift, raw docs get parsed as media or
    wrapped docs get stubbed, and the oracle diverges."""
    import pandas as pd

    from tmdb_sync_spark.functions.multimodal import (
        _decode_expected,
        _wrap_stripe,
        encode_media,
    )

    out = pd.concat(
        encode_media(iter([pd.DataFrame({"doc_id": [did], "text": [text]})]))
    )
    payload = out["payload"].iloc[0]
    stripe = _wrap_stripe(did)
    magic = {
        "bmp": b"BM", "wav": b"RIFF", "jpeg": b"\xff\xd8",
        "png": b"\x89PNG", "gif": b"GIF",
    }
    if stripe is None:
        assert payload == text.encode("utf-8")
    else:
        # small hypothesis bodies never trip the JPEG/PNG length guard,
        # so the stripe's container is always actually present
        assert payload[: len(magic[stripe])] == magic[stripe]
    # and the gated decode of what encode emitted never dead-letters
    fmt = _decode_expected(did, payload)[3]
    assert fmt == (stripe or "fakeimg")
