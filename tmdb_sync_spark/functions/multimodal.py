"""Multimodal-column plumbing (SURVEY.md Phase 5).

Pattern: media (image/audio/video) ride as opaque ``binary`` columns with
typed metadata; decode / feature-extraction runs as Arrow-batched pandas
over ``mapInPandas`` — the one place Python is allowed in this engine
(registry rule: Python only at source/decode boundaries, reference
precedent: the frames image-metadata pipeline ``app/tmdb_client.py:169-282``).

Five codecs are REAL, all pure stdlib (``struct``/``zlib``): BMP headers
(``_decode_bmp`` — magic check, little-endian dims at offsets 18/22,
top-down negative-height handling), PCM WAV containers
(``_decode_wav`` — RIFF chunk walk honoring word alignment and
arbitrary chunk order, PCM params from ``fmt ``, frame count from
``data``), PNG (``_decode_png`` — signature + chunk walk with CRC-32
verification per chunk, dims from IHDR), GIF (``_decode_gif`` —
logical-screen-descriptor dims, color-table-aware block walk counting
image descriptors for the frame count, extension/sub-block skipping),
and JPEG (``_decode_jpeg`` — segment marker walk, dims from the first
SOF0/1/2 frame header, entropy-stream scan honoring byte stuffing and
restart markers; JPEG is the format a real user of the reference hits
first, since the TMDB CDN serves JPEGs — ``app/tmdb_client.py:13``).
Formats whose decoders genuinely need PIL/ffmpeg (absent from this
container) fall through to ``_decode_stub``, which derives
deterministic fake dimensions from the payload bytes. Everything around the decoders is
real and tested: binary encoding, Arrow batch transfer, output schema,
and the DuckDB oracle predicting the same features per branch.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from tmdb_sync_spark.io import table
from tmdb_sync_spark.registry import register

MEDIA_SCHEMA = "doc_id bigint, payload binary"

FEATURE_SCHEMA = (
    "doc_id bigint, byte_len bigint, width int, height int, "
    "n_frames int, media_format string, sample_rate int, n_channels int"
)

BMP_WRAP_EVERY = 7       # every 7th doc arrives as a real BMP container
BMP_HEADER_LEN = 54      # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)

WAV_WRAP_EVERY = 5       # every 5th (non-BMP) doc arrives as a real WAV
WAV_HEADER_LEN = 44      # RIFF(12) + fmt chunk(24) + data chunk header(8)

PNG_WRAP_EVERY = 3       # every 3rd remaining doc arrives as a real PNG
# sig(8) + IHDR chunk(25) + IDAT framing(12) + zlib stored-stream
# overhead(11) + IEND(12): container size = body length + 68 — valid
# only while the stored stream is a single deflate block, i.e. body ≤
# PNG_MAX_BODY (beyond that zlib emits +5 bytes per extra block).
# encode_media leaves larger bodies raw so the oracle formula stays
# exact; the e2e branch test asserts PNGs actually occur at every SF.
PNG_OVERHEAD = 68
PNG_MAX_BODY = 65531

GIF_WRAP_EVERY = 2       # every 2nd remaining doc arrives as a real GIF

JPEG_WRAP_EVERY = 11     # every 11th remaining doc arrives as a real JPEG
# SOI(2) + COM header(4) + SOF0 segment(13) + SOS segment(10) + EOI(2):
# the body rides in the COM segment (declared length, no entropy-stream
# byte stuffing), so container size = body + 31 stays oracle-exact. The
# COM length field is 16-bit and counts itself, so body ≤ 65533.
JPEG_OVERHEAD = 31
JPEG_MAX_BODY = 65533


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


def _wav_params(doc_id: int) -> tuple[int, int]:
    """(n_channels, sample_rate) the synthetic blob source assigns —
    derived from doc_id so the DuckDB oracle can predict them."""
    return 1 + doc_id % 2, 8000 + (doc_id % 4) * 4000


def _encode_wav(doc_id: int, body: bytes) -> bytes:
    """A genuine PCM WAV container: RIFF/WAVE + canonical 16-byte ``fmt``
    chunk + ``data`` chunk holding ``body`` truncated to whole sample
    frames. All header fields are honest (byte rate, block align, chunk
    sizes), so any WAV reader derives the same frame count the decoder
    extracts."""
    n_channels, sample_rate = _wav_params(doc_id)
    block_align = n_channels * 2          # 16-bit PCM
    data_len = len(body) - len(body) % block_align
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, n_channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    data = struct.pack("<4sI", b"data", data_len) + body[:data_len]
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE")
    return riff + fmt + data


def _is_wav(payload: bytes) -> bool:
    return (
        len(payload) >= WAV_HEADER_LEN
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def _decode_wav(payload: bytes) -> tuple[int, int, int]:
    """Real stdlib RIFF chunk walk: scan (id, size) chunk headers from
    offset 12, honoring word alignment, pick up PCM params from ``fmt ``
    and the payload length from ``data`` — chunk order is NOT assumed.
    Returns (sample_rate, n_channels, n_frames); n_frames is the PCM
    sample-frame count ``data_size // block_align``."""
    pos, sample_rate, n_channels, block_align, data_len = 12, 0, 0, 0, 0
    while pos + 8 <= len(payload):
        cid, csz = struct.unpack_from("<4sI", payload, pos)
        if pos + 8 + csz > len(payload):
            # declared chunk extends past the payload: a truncated
            # container must dead-letter, not claim the declared frames
            raise ValueError(f"WAV chunk {cid!r} runs past end of payload")
        if cid == b"fmt ":
            if csz < 16:
                # unpacking 16 bytes from an undersized fmt chunk would
                # silently read the NEXT chunk's bytes as PCM params —
                # plausible-but-wrong metadata instead of a dead letter
                raise ValueError("WAV fmt chunk smaller than PCM header")
            _, n_channels, sample_rate, _, block_align, _ = struct.unpack_from(
                "<HHIIHH", payload, pos + 8
            )
        elif cid == b"data":
            data_len = csz
        pos += 8 + csz + (csz & 1)        # RIFF chunks are word-aligned
    if sample_rate <= 0 or n_channels <= 0 or block_align <= 0:
        # no fmt chunk, or garbage that merely sniffed as RIFF/WAVE: a
        # zero sample rate would divide-by-zero in the frame sampler and
        # a 'wav' label here diverges from the stub path any non-WAV
        # payload must take — dead-letter instead
        raise ValueError("WAV payload lacks a sane PCM fmt chunk")
    return sample_rate, n_channels, data_len // block_align


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_dims(doc_id: int) -> tuple[int, int]:
    return doc_id % 40 + 1, doc_id % 30 + 1


def _encode_png(doc_id: int, body: bytes) -> bytes:
    """A genuine PNG container: signature, IHDR (8-bit RGB), one IDAT
    holding ``body`` as a level-0 (stored) zlib stream, IEND — every
    chunk with its real CRC-32. Stored zlib framing adds exactly 11
    bytes for payloads < 64 KiB, so the container length stays
    oracle-predictable (``body + PNG_OVERHEAD``)."""
    width, height = _png_dims(doc_id)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(body, 0))
        + _png_chunk(b"IEND", b"")
    )


def _is_png(payload: bytes) -> bool:
    return (
        len(payload) >= 33
        and payload[:8] == _PNG_SIG
        and payload[12:16] == b"IHDR"
    )


def _decode_png(payload: bytes) -> tuple[int, int, int, str]:
    """Real stdlib PNG chunk walk: iterate (length, type, data, crc)
    records from offset 8, verifying each CRC-32 over type+data (a
    corrupt chunk raises rather than yielding garbage dims), and read
    big-endian width/height out of IHDR. A stream that ends without a
    complete, CRC-valid IEND (truncation) raises — corrupt crawl rows
    take _decode's dead-letter path. Still images are one frame."""
    pos = 8
    width = height = None
    while True:
        if pos + 12 > len(payload):
            raise ValueError("PNG payload ends without an IEND chunk")
        (clen,) = struct.unpack_from(">I", payload, pos)
        if pos + 12 + clen > len(payload):
            raise ValueError("PNG chunk runs past end of payload")
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + clen]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + clen)
        if crc != zlib.crc32(ctype + data) & 0xFFFFFFFF:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            width, height = struct.unpack_from(">II", data, 0)
        if ctype == b"IEND":
            break
        pos += 12 + clen
    if width is None:
        raise ValueError("PNG without IHDR")
    return width, height, 1, "png"


def _gif_params(doc_id: int) -> tuple[int, int, int]:
    """(width, height, n_frames) the synthetic blob source assigns."""
    return doc_id % 20 + 1, doc_id % 15 + 1, doc_id % 3 + 1


def _encode_gif(doc_id: int, body: bytes) -> bytes:
    """A genuine GIF89a container: header + logical screen descriptor,
    ``n_frames`` image descriptors (the first carrying ``body`` as LZW
    data sub-blocks — 255-byte blocks with length prefixes — the rest
    empty), trailer. Frame structure and sub-block framing are real, so
    any frame-counting GIF walker derives the same count the decoder
    extracts; only the LZW pixel stream itself is synthetic."""
    width, height, n_frames = _gif_params(doc_id)
    out = [b"GIF89a", struct.pack("<HHBBB", width, height, 0, 0, 0)]
    for k in range(n_frames):
        out.append(struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0))
        out.append(b"\x02")               # LZW minimum code size
        if k == 0:
            for i in range(0, len(body), 255):
                block = body[i:i + 255]
                out.append(bytes([len(block)]) + block)
        out.append(b"\x00")               # sub-block terminator
    out.append(b"\x3b")                   # trailer
    return b"".join(out)


def _is_gif(payload: bytes) -> bool:
    # magic alone is 6 printable ASCII bytes a raw text document could
    # start with (cf. _is_bmp's hardening note), so additionally require
    # the first block after the screen descriptor (+ global color table
    # if flagged) to be structurally valid: an image descriptor, an
    # extension introducer, or the trailer.
    if len(payload) < 14 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return False
    packed = payload[10]
    pos = 13 + (3 * (2 << (packed & 0x07)) if packed & 0x80 else 0)
    return pos < len(payload) and payload[pos] in (0x2C, 0x21, 0x3B)


def _decode_gif(payload: bytes) -> tuple[int, int, int, str]:
    """Real stdlib GIF block walk: dims from the logical screen
    descriptor, then iterate blocks — image descriptors (0x2C, counted
    as frames; local color table honored; LZW data skipped sub-block by
    sub-block), extensions (0x21, sub-blocks skipped), trailer (0x3B).
    Truncation anywhere (a sub-block running past the end, a missing
    trailer) raises, so corrupt crawl rows take _decode's dead-letter
    path instead of yielding a plausible-but-wrong frame count."""
    width, height, packed = struct.unpack_from("<HHB", payload, 6)
    pos = 13
    if packed & 0x80:                     # global color table present
        pos += 3 * (2 << (packed & 0x07))
    n_frames = 0

    def _skip_subblocks(p: int) -> int:
        while p < len(payload) and payload[p] != 0:
            p += 1 + payload[p]
        if p >= len(payload):
            raise ValueError("GIF sub-block chain runs past end of payload")
        return p + 1

    while True:
        if pos >= len(payload):
            raise ValueError("GIF payload ends without a trailer")
        block = payload[pos]
        if block == 0x3B:                 # trailer
            break
        if block == 0x2C:                 # image descriptor
            n_frames += 1
            flags = payload[pos + 9]
            pos += 10
            if flags & 0x80:              # local color table
                pos += 3 * (2 << (flags & 0x07))
            pos = _skip_subblocks(pos + 1)    # skip LZW mcs + data
        elif block == 0x21:               # extension: label + sub-blocks
            pos = _skip_subblocks(pos + 2)
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x} at {pos}")
    return width, height, n_frames, "gif"


def _jpeg_dims(doc_id: int) -> tuple[int, int]:
    """(width, height) the synthetic blob source assigns."""
    return doc_id % 50 + 1, doc_id % 35 + 1


# SOF markers that carry the frame header (height/width). C4/C8/CC look
# like SOFs but are DHT/JPG/DAC — excluded per the JPEG marker table.
_JPEG_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _encode_jpeg(doc_id: int, body: bytes) -> bytes:
    """A genuine baseline JPEG container: SOI, a COM segment carrying
    ``body`` (declared-length, so no entropy byte stuffing and the size
    formula stays exact), a SOF0 frame header with real height/width
    (8-bit precision, one grayscale component), an SOS header with an
    empty entropy stream, EOI. Any dimension-reading JPEG parser (the
    TMDB CDN serves JPEGs — reference app/tmdb_client.py:13) walks to the
    same SOF0 and reads the same dims the decoder extracts; only the
    entropy-coded pixel data is absent."""
    width, height = _jpeg_dims(doc_id)
    com = struct.pack(">2sH", b"\xff\xfe", len(body) + 2) + body
    sof0 = struct.pack(
        ">2sHBHHBBBB", b"\xff\xc0", 11, 8, height, width, 1, 1, 0x11, 0
    )
    sos = struct.pack(">2sHBBBBBB", b"\xff\xda", 8, 1, 1, 0, 0, 63, 0)
    return b"\xff\xd8" + com + sof0 + sos + b"\xff\xd9"


def _is_jpeg(payload: bytes) -> bool:
    # SOI + the next marker prefix. 0xFF is not a valid UTF-8 lead byte,
    # so a raw text body can never sniff as JPEG (cf. _is_bmp's note).
    return (
        len(payload) >= 4
        and payload[:2] == b"\xff\xd8"
        and payload[2] == 0xFF
    )


def _decode_jpeg(payload: bytes) -> tuple[int, int, int, str]:
    """Real stdlib JPEG marker walk: iterate segments from SOI — fill
    bytes honored, standalone markers (RST/TEM) skipped, every other
    segment advanced by its declared big-endian length; height/width read
    from the first SOF frame header (SOF0/1/2/...); after SOS the entropy
    stream is scanned for the next non-stuffed, non-RST marker. A stream
    that ends without EOI, a segment running past the payload, or a
    missing SOF raises — truncated crawl rows take _decode's dead-letter
    path instead of yielding plausible-but-wrong dims."""
    pos = 2
    dims = None
    while True:
        if pos + 2 > len(payload):
            raise ValueError("JPEG payload ends without an EOI marker")
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG expected a marker at offset {pos}")
        marker = payload[pos + 1]
        if marker == 0xFF:                # fill byte before the marker
            pos += 1
            continue
        pos += 2
        if marker == 0xD9:                # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:   # TEM / RSTn
            continue
        if pos + 2 > len(payload):
            raise ValueError("JPEG segment length truncated")
        (seglen,) = struct.unpack_from(">H", payload, pos)
        if seglen < 2 or pos + seglen > len(payload):
            raise ValueError("JPEG segment runs past end of payload")
        if marker in _JPEG_SOF_MARKERS:
            if seglen < 7:
                raise ValueError("JPEG SOF segment too short")
            _prec, height, width = struct.unpack_from(">BHH", payload, pos + 2)
            dims = (width, height)
        pos += seglen
        if marker == 0xDA:                # SOS: skip entropy-coded data
            while True:
                if pos + 2 > len(payload):
                    raise ValueError("JPEG entropy stream ends mid-scan")
                if (
                    payload[pos] == 0xFF
                    and payload[pos + 1] != 0x00
                    and not 0xD0 <= payload[pos + 1] <= 0xD7
                ):
                    break                 # a real marker: rejoin the walk
                pos += 1
    if dims is None:
        raise ValueError("JPEG without a SOF frame header")
    return dims[0], dims[1], 1, "jpeg"


def _decode_stub(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic fake decoder for formats whose real parse needs
    PIL/av (absent here): width/height/frame-count from byte length. The
    signature (bytes in, typed metadata out) is the contract."""
    n = len(payload)
    return n % 64, (n // 64) % 64, n % 5, "fakeimg"


def _decode(
    payload: bytes,
) -> tuple[int | None, int | None, int, str, int | None, int | None]:
    """(width, height, n_frames, format, sample_rate, n_channels) —
    image fields are None for audio and vice versa. Magic-sniffing
    variant exercised by the codec property tests; the pipeline path is
    ``_decode_expected``, which gates on the encode stripe instead of a
    sniff so raw text can never false-match a container magic."""
    try:
        if _is_bmp(payload):
            return *_decode_bmp(payload), None, None
        if _is_wav(payload):
            sample_rate, n_channels, n_frames = _decode_wav(payload)
            return None, None, n_frames, "wav", sample_rate, n_channels
        if _is_png(payload):
            return *_decode_png(payload), None, None
        if _is_gif(payload):
            return *_decode_gif(payload), None, None
        if _is_jpeg(payload):
            return *_decode_jpeg(payload), None, None
    except (ValueError, IndexError, struct.error):
        # magic matched but the container is malformed (truncated chunk,
        # CRC mismatch, unknown block): a crawl row, not a crash. Route
        # to the stub features under a distinct label so downstream can
        # dead-letter it instead of the decode killing the whole batch.
        return *_decode_stub(payload)[:3], "corrupt", None, None
    return *_decode_stub(payload), None, None


def _wrap_stripe(doc_id: int) -> str | None:
    """Mirror of ``encode_media``'s elif chain: which container this
    doc_id arrives wrapped in (None = raw passthrough). The JPEG/PNG
    stripes are still length-conditional — callers resolve that with the
    magic byte, which is decisive because 0xFF/0x89 are not valid UTF-8
    lead bytes, so a raw text body can never carry those magics."""
    if doc_id % BMP_WRAP_EVERY == 0:
        return "bmp"
    if doc_id % WAV_WRAP_EVERY == 0:
        return "wav"
    if doc_id % JPEG_WRAP_EVERY == 0:
        return "jpeg"
    if doc_id % PNG_WRAP_EVERY == 0:
        return "png"
    if doc_id % GIF_WRAP_EVERY == 0:
        return "gif"
    return None


def _decode_expected(
    doc_id: int, payload: bytes,
) -> tuple[int | None, int | None, int, str, int | None, int | None]:
    """Stripe-gated decode: only docs the encode stage actually wrapped
    are parsed as containers; raw docs go straight to the stub, so a raw
    text that merely *looks* like a container (e.g. starts ``GIF89a`` or
    ``RIFF????WAVE``) can neither false-parse nor dead-letter — it takes
    the same stub row the oracle predicts. In production terms: the lake
    records each blob's declared content type at ingest; the decoder
    trusts that over a byte sniff and dead-letters only declared media
    that fails to parse."""
    stripe = _wrap_stripe(doc_id)
    if stripe == "jpeg" and not payload.startswith(b"\xff"):
        stripe = None        # oversized body stayed raw (encode's guard)
    elif stripe == "png" and not payload.startswith(b"\x89"):
        stripe = None
    if stripe is None:
        return *_decode_stub(payload), None, None
    try:
        if stripe == "bmp":
            return *_decode_bmp(payload), None, None
        if stripe == "wav":
            sample_rate, n_channels, n_frames = _decode_wav(payload)
            return None, None, n_frames, "wav", sample_rate, n_channels
        if stripe == "png":
            return *_decode_png(payload), None, None
        if stripe == "gif":
            return *_decode_gif(payload), None, None
        return *_decode_jpeg(payload), None, None
    except (ValueError, IndexError, struct.error):
        # declared media that fails its parse: dead-letter, don't crash
        return *_decode_stub(payload)[:3], "corrupt", None, None


def encode_media(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel standing in for the media lake's blob source:
    documents' bytes arrive inside real containers — BMP, PCM WAV, JPEG,
    PNG, or GIF by doc_id stripe (params derived from doc_id, so the
    oracle can predict them; JPEG/PNG fall back to the raw body when it
    exceeds the format's exact-size-formula cap); the rest stay raw.
    Models the mixed-container reality of a crawl. The elif ORDER is
    load-bearing: ``_wrap_stripe`` and the SQL oracle mirror it branch
    for branch (property-pinned in tests/test_codec_properties.py)."""
    for pdf in batches:
        payloads = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            body = text.encode("utf-8")
            did = int(doc_id)
            if did % BMP_WRAP_EVERY == 0:
                payloads.append(_encode_bmp(did % 64 + 1, did % 48 + 1, body))
            elif did % WAV_WRAP_EVERY == 0:
                payloads.append(_encode_wav(did, body))
            elif did % JPEG_WRAP_EVERY == 0:
                payloads.append(
                    _encode_jpeg(did, body)
                    if len(body) <= JPEG_MAX_BODY else body
                )
            elif did % PNG_WRAP_EVERY == 0:
                payloads.append(
                    _encode_png(did, body)
                    if len(body) <= PNG_MAX_BODY else body
                )
            elif did % GIF_WRAP_EVERY == 0:
                payloads.append(_encode_gif(did, body))
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
        feats = [
            _decode_expected(int(d), p)
            for d, p in zip(pdf["doc_id"], pdf["payload"])
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "byte_len": [len(p) for p in pdf["payload"]],
                "width": pd.array([f[0] for f in feats], dtype="Int32"),
                "height": pd.array([f[1] for f in feats], dtype="Int32"),
                "n_frames": [f[2] for f in feats],
                "media_format": [f[3] for f in feats],
                "sample_rate": pd.array([f[4] for f in feats], dtype="Int32"),
                "n_channels": pd.array([f[5] for f in feats], dtype="Int32"),
            }
        )


SAMPLE_EVERY = 2     # keep every 2nd frame (production: fps-based stride)
AUDIO_WINDOW = 4096  # PCM frames per sampled audio analysis window
MAX_WINDOWS = 32     # bounded fan-out per doc — no row explosion at 100 TB

SAMPLE_SCHEMA = (
    "doc_id bigint, byte_len bigint, media_format string, "
    "frame_idx int, frame_ts double, thumb_w int, thumb_h int"
)


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel with *row-expanding* output: one input media row
    fans out to its sampled units, carrying the doc-level decode metadata
    along. Images/video fan out to stride-sampled frames with fake
    2:1-downscaled thumbnail dims (the ffmpeg seek+resize loop in
    production); WAV audio fans out to fixed-size PCM analysis windows
    whose timestamps come from the genuinely parsed sample rate. Fan-out
    is capped at MAX_WINDOWS rows per doc — the bound that keeps a
    pathological 10-hour input from exploding a partition."""
    for pdf in batches:
        rows = []
        for doc_id, byte_len, fmt, n_frames, w, h, sr in zip(
            pdf["doc_id"], pdf["byte_len"], pdf["media_format"],
            pdf["n_frames"], pdf["width"], pdf["height"],
            pdf["sample_rate"],
        ):
            if fmt == "corrupt":
                # dead-lettered container: its stub-derived dims are
                # placeholders, not media — sample nothing downstream
                continue
            base = {
                "doc_id": int(doc_id),
                "byte_len": int(byte_len),
                "media_format": fmt,
            }
            if fmt == "wav":
                n_windows = min(
                    (int(n_frames) + AUDIO_WINDOW - 1) // AUDIO_WINDOW,
                    MAX_WINDOWS,
                )
                rows.extend(
                    {
                        **base,
                        "frame_idx": k,
                        "frame_ts": k * AUDIO_WINDOW / int(sr),
                        "thumb_w": None,
                        "thumb_h": None,
                    }
                    for k in range(n_windows)
                )
            else:
                rows.extend(
                    {
                        **base,
                        "frame_idx": k,
                        "frame_ts": k / 24.0,      # fake 24 fps timeline
                        "thumb_w": int(w) // 2,
                        "thumb_h": int(h) // 2,
                    }
                    for k in range(0, min(int(n_frames), MAX_WINDOWS),
                                   SAMPLE_EVERY)
                )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "byte_len", "media_format",
                     "frame_idx", "frame_ts", "thumb_w", "thumb_h"],
        )


@register(
    "mm_media_pipeline",
    oracle=f"""
    WITH raw AS (
        SELECT doc_id,
               octet_length(encode(text)) AS olen,
               (1 + doc_id % 2) * 2 AS ba,
               8000 + (doc_id % 4) * 4000 AS sr,
               CASE WHEN doc_id % {BMP_WRAP_EVERY} = 0 THEN 'bmp'
                    WHEN doc_id % {WAV_WRAP_EVERY} = 0 THEN 'wav'
                    WHEN doc_id % {JPEG_WRAP_EVERY} = 0
                         AND octet_length(encode(text)) <= {JPEG_MAX_BODY}
                         THEN 'jpeg'
                    WHEN doc_id % {JPEG_WRAP_EVERY} = 0 THEN 'fakeimg'
                    WHEN doc_id % {PNG_WRAP_EVERY} = 0
                         AND octet_length(encode(text)) <= {PNG_MAX_BODY}
                         THEN 'png'
                    WHEN doc_id % {PNG_WRAP_EVERY} = 0 THEN 'fakeimg'
                    WHEN doc_id % {GIF_WRAP_EVERY} = 0 THEN 'gif'
                    ELSE 'fakeimg'
               END AS media_format
        FROM documents
    ),
    feats AS (
        SELECT doc_id, media_format, sr,
               CASE media_format
                    WHEN 'bmp' THEN CAST(olen + {BMP_HEADER_LEN} AS BIGINT)
                    WHEN 'wav' THEN CAST({WAV_HEADER_LEN} + olen - olen % ba
                                         AS BIGINT)
                    WHEN 'jpeg' THEN CAST(olen + {JPEG_OVERHEAD} AS BIGINT)
                    WHEN 'png' THEN CAST(olen + {PNG_OVERHEAD} AS BIGINT)
                    WHEN 'gif' THEN CAST(olen + CAST(ceil(olen / 255.0) AS BIGINT)
                                         + 26 + (doc_id % 3) * 12 AS BIGINT)
                    ELSE CAST(olen AS BIGINT)
               END AS byte_len,
               CASE media_format
                    WHEN 'bmp' THEN CAST(doc_id % 64 + 1 AS INT)
                    WHEN 'wav' THEN CAST(NULL AS INT)
                    WHEN 'jpeg' THEN CAST(doc_id % 50 + 1 AS INT)
                    WHEN 'png' THEN CAST(doc_id % 40 + 1 AS INT)
                    WHEN 'gif' THEN CAST(doc_id % 20 + 1 AS INT)
                    ELSE CAST(olen % 64 AS INT)
               END AS width,
               CASE media_format
                    WHEN 'bmp' THEN CAST(doc_id % 48 + 1 AS INT)
                    WHEN 'wav' THEN CAST(NULL AS INT)
                    WHEN 'jpeg' THEN CAST(doc_id % 35 + 1 AS INT)
                    WHEN 'png' THEN CAST(doc_id % 30 + 1 AS INT)
                    WHEN 'gif' THEN CAST(doc_id % 15 + 1 AS INT)
                    ELSE CAST((olen // 64) % 64 AS INT)
               END AS height,
               CASE media_format
                    WHEN 'bmp' THEN 1
                    WHEN 'wav' THEN CAST(olen // ba AS INT)
                    WHEN 'jpeg' THEN 1
                    WHEN 'png' THEN 1
                    WHEN 'gif' THEN CAST(doc_id % 3 + 1 AS INT)
                    ELSE CAST(olen % 5 AS INT)
               END AS n_frames
        FROM raw
    )
    SELECT f.doc_id,
           f.byte_len,
           f.media_format,
           CAST(g.range AS INT) AS frame_idx,
           CASE WHEN f.media_format = 'wav'
                THEN g.range * {AUDIO_WINDOW}.0 / f.sr
                ELSE g.range / 24.0
           END AS frame_ts,
           CASE WHEN f.media_format = 'wav' THEN CAST(NULL AS INT)
                ELSE CAST(f.width // 2 AS INT) END AS thumb_w,
           CASE WHEN f.media_format = 'wav' THEN CAST(NULL AS INT)
                ELSE CAST(f.height // 2 AS INT) END AS thumb_h
    FROM feats f, range(0, 64) g
    WHERE (f.media_format <> 'wav'
           AND g.range < least(f.n_frames, {MAX_WINDOWS})
           AND g.range % {SAMPLE_EVERY} = 0)
       OR (f.media_format = 'wav'
           AND g.range < least((f.n_frames + {AUDIO_WINDOW} - 1)
                               // {AUDIO_WINDOW}, {MAX_WINDOWS}))
    """,
)
def mm_media_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary encode → decode → feature extraction → frame sampling.

    ``documents.text`` stands in for the media bytes; docs are striped
    into REAL containers — every 7th a BMP, every remaining 5th a PCM
    WAV, every remaining 11th a JPEG, every remaining 3rd a PNG, every
    remaining 2nd a GIF (``encode_media``) — all five genuinely parsed
    back with stdlib ``struct``/``zlib`` (BMP header fields; RIFF chunk
    walk for fmt/data; JPEG marker walk for the SOF frame header; PNG
    chunk walk with CRC-32 verification; GIF block walk counting image
    descriptors). Payloads needing PIL/ffmpeg take the
    declared stub path. Audio rows
    carry parsed sample_rate/n_channels and fan out to bounded PCM
    analysis windows; image rows to stride-sampled frames. Chains three
    mapInPandas stages — blob
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
