"""Real image decode: the pure-Python codec (spec-based PNG
decode/encode, JPEG/GIF/BMP header parse) and its integration with the
multimodal mapInPandas stages — fixture images are generated
programmatically, decoded for real on executors, and resized for real.
"""

from __future__ import annotations

import struct
import zlib

import pytest
from pyspark.sql import functions as F

from mtg_bulk_database_spark.operators import multimodal
from mtg_bulk_database_spark.operators.imagecodec import build_codec

codec = build_codec()

MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def _gradient_pixels(w: int, h: int, ch: int) -> bytes:
    return bytes((x * 7 + y * 13 + c * 29) % 256 for y in range(h) for x in range(w) for c in range(ch))


# ---------------------------------------------------------------------------
# codec unit tests
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip(channels):
    w, h = 17, 9
    px = _gradient_pixels(w, h, channels)
    png = codec.png_encode(w, h, channels, px)
    assert codec.sniff(png) == "png"
    assert codec.decode_header(png) == (w, h, channels)
    assert codec.png_decode(png) == (w, h, channels, px)


def test_png_all_filter_types_decode():
    """Decode a PNG whose scanlines use Sub/Up/Average/Paeth filters —
    the filters a real encoder (libpng) emits."""
    w, h, ch = 6, 4, 3
    stride = w * ch
    px = _gradient_pixels(w, h, ch)
    rows = [bytearray(px[y * stride : (y + 1) * stride]) for y in range(h)]

    def filt(ftype, line, prev):
        out = bytearray(stride)
        for x in range(stride):
            left = line[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:  # paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
            out[x] = (line[x] - pred) & 0xFF
        return bytes([ftype]) + bytes(out)

    scan = (
        filt(1, rows[0], bytearray(stride))
        + filt(2, rows[1], rows[0])
        + filt(3, rows[2], rows[1])
        + filt(4, rows[3], rows[2])
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(scan)) + _chunk(b"IEND", b"")
    assert codec.png_decode(png) == (w, h, ch, px)


def test_png_palette_expansion():
    plte = bytes(range(3 * 4))  # 4 palette entries
    idx = bytes([0, 1, 2, 3, 0] * 2)
    ihdr = struct.pack(">IIBBBBB", 5, 2, 8, 3, 0, 0, 0)
    scan = b"".join(b"\x00" + idx[y * 5 : (y + 1) * 5] for y in range(2))
    png = (
        MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(scan))
        + _chunk(b"IEND", b"")
    )
    w, h, ch, px = codec.png_decode(png)
    assert (w, h, ch) == (5, 2, 3)
    assert px[:3] == plte[0:3] and px[3:6] == plte[3:6]


def test_png_unsupported_variants_return_none():
    # 16-bit depth and Adam7 interlace fall back to None (header-only)
    for depth, interlace in [(16, 0), (8, 1)]:
        ihdr = struct.pack(">IIBBBBB", 4, 4, depth, 2, 0, 0, interlace)
        png = MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(b"\x00" * 100)) + _chunk(b"IEND", b"")
        assert codec.png_decode(png) is None
        assert codec.decode_header(png) is not None  # header still parses
    # truncated / corrupt zlib stream
    good = codec.png_encode(4, 4, 3, _gradient_pixels(4, 4, 3))
    assert codec.png_decode(good[:40]) is None


def test_non_png_headers():
    jpeg = (
        b"\xff\xd8\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
        + b"\xff\xc0" + struct.pack(">H", 11) + bytes([8])
        + struct.pack(">HH", 40, 30) + bytes([3, 0, 0, 0])
    )
    assert codec.decode_header(jpeg) == (30, 40, 3)
    gif = b"GIF89a" + struct.pack("<HH", 64, 48) + bytes(20)
    assert codec.decode_header(gif) == (64, 48, 3)
    bmp = (
        b"BM" + bytes(16) + struct.pack("<ii", 32, 24)
        + struct.pack("<HH", 1, 24) + bytes(10)
    )
    assert codec.decode_header(bmp) == (32, 24, 3)
    assert codec.decode_header(b"just some text payload") is None
    # magic-prefixed TEXT must not be mistaken for an image: BMP planes
    # check and GIF zero-dims check reject implausible headers
    assert codec.decode_header(b"BM this is a sentence about bitmap files!") is None
    assert codec.decode_header(b"GIF89a" + bytes(24)) is None
    # truncated PNG (magic + partial IHDR) neither crashes nor decodes
    png = codec.png_encode(4, 4, 3, bytes(48))
    assert codec.png_decode(png[:28]) is None


def test_resize_nearest_identity_and_downscale():
    w, h, ch = 8, 4, 3
    px = _gradient_pixels(w, h, ch)
    assert codec.resize_nearest(w, h, ch, px, w, h) == px
    small = codec.resize_nearest(w, h, ch, px, 4, 2)
    assert len(small) == 4 * 2 * 3
    # nearest-neighbor: top-left pixel survives a clean 2x downscale
    assert small[:3] == px[:3]


# ---------------------------------------------------------------------------
# Spark integration: real PNGs through the mapInPandas stages
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def png_media(spark):
    rows = []
    for i, (w, h, ch) in enumerate([(320, 200, 3), (64, 128, 4), (200, 50, 1)]):
        png = codec.png_encode(w, h, ch, _gradient_pixels(w, h, ch))
        rows.append((i, bytearray(png), "image/png", ("fixture", len(png))))
    # one non-image payload to pin the fallback in the same batch
    rows.append((99, bytearray(b"plain text payload"), "text/plain", ("fixture", 18)))
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_decode_images_real_dimensions(png_media):
    out = {r["doc_id"]: r for r in multimodal.decode_images(png_media).collect()}
    assert (out[0]["width"], out[0]["height"], out[0]["n_channels"]) == (320, 200, 3)
    assert (out[1]["width"], out[1]["height"], out[1]["n_channels"]) == (64, 128, 4)
    assert (out[2]["width"], out[2]["height"], out[2]["n_channels"]) == (200, 50, 1)
    # fallback path: deterministic fake dims from byte length
    n = 18
    assert (out[99]["width"], out[99]["height"]) == (n % 1024 + 1, n % 768 + 1)


def test_resize_images_real_png_roundtrip(png_media):
    out = {r["doc_id"]: r for r in multimodal.resize_images(png_media, max_side=100).collect()}
    # 320x200 -> bounded by 100 on the long side, aspect preserved
    assert (out[0]["width"], out[0]["height"]) == (100, 62)
    # the re-encoded payload is itself a valid PNG with the new dims
    w, h, ch, px = codec.png_decode(bytes(out[0]["content"]))
    assert (w, h, ch) == (100, 62, 3) and len(px) == 100 * 62 * 3
    # portrait RGBA image: long side 128 -> 100, aspect preserved
    assert (out[1]["width"], out[1]["height"]) == (50, 100)
    w4, h4, ch4, _ = codec.png_decode(bytes(out[1]["content"]))
    assert (w4, h4, ch4) == (50, 100, 4)
    # non-image payload keeps the stub truncation path
    assert out[99]["width"] >= 1 and len(bytes(out[99]["content"])) >= 1


def test_codec_distributed_corpus(spark):
    """A 48-image corpus across 8 partitions: every payload is a REAL
    png_encode'd image, decoded and resized on executors through the
    Arrow mapInPandas stages — multi-partition, multi-batch, all four
    channel layouts — and every resized payload re-decodes as a valid
    PNG with the advertised dimensions."""
    dims = [(8 + i % 24, 8 + (i * 3) % 16, 1 + i % 4) for i in range(48)]
    rows = []
    for i, (w, h, ch) in enumerate(dims):
        png = codec.png_encode(w, h, ch, _gradient_pixels(w, h, ch))
        rows.append((i, bytearray(png), "image/png", ("fixture", len(png))))
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA).repartition(8)

    dec = {r["doc_id"]: r for r in multimodal.decode_images(media).collect()}
    assert len(dec) == 48
    for i, (w, h, ch) in enumerate(dims):
        assert (dec[i]["width"], dec[i]["height"], dec[i]["n_channels"]) == (
            w,
            h,
            ch,
        ), f"doc {i}"

    for r in multimodal.resize_images(media, max_side=10).collect():
        assert max(r["width"], r["height"]) <= 10
        out = codec.png_decode(bytes(r["content"]))
        assert out is not None, f"doc {r['doc_id']} not a decodable PNG"
        w, h, ch, px = out
        assert (w, h) == (r["width"], r["height"])
        assert len(px) == w * h * ch


# ---------------------------------------------------------------------------
# r12: the unfilter stage was numpy-vectorized (filter 0 fast path, Sub
# as a mod-256 prefix sum, Up as wrapping uint8 row adds) — pin every
# filter type bit-identical to the spec's scalar recurrences, which the
# repo's own encoders never emit (they write filter 0 only).
# ---------------------------------------------------------------------------
def _scalar_unfilter(raw: bytes, w: int, h: int, samples: int) -> bytes:
    """Reference implementation: the PNG spec's per-byte recurrences
    exactly as the pre-r12 decode loop computed them."""

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    stride = w * samples
    out = bytearray(h * stride)
    prev = bytearray(stride)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:
            for x in range(samples, stride):
                line[x] = (line[x] + line[x - samples]) & 0xFF
        elif ftype == 2:
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:
            for x in range(stride):
                left = line[x - samples] if x >= samples else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:
            for x in range(stride):
                left = line[x - samples] if x >= samples else 0
                ul = prev[x - samples] if x >= samples else 0
                line[x] = (line[x] + paeth(left, prev[x], ul)) & 0xFF
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return bytes(out)


def _filtered_png(w, h, color, samples, filters, rng):
    stride = w * samples
    raw = bytearray()
    for y in range(h):
        raw.append(filters[y % len(filters)])
        raw += bytes(rng.randrange(256) for _ in range(stride))

    def chunk(t, d):
        return (
            struct.pack(">I", len(d))
            + t
            + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    body = chunk(b"IHDR", ihdr)
    plte = None
    if color == 3:
        plte = bytes(rng.randrange(256) for _ in range(256 * 3))
        body += chunk(b"PLTE", plte)
    body += chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    return b"\x89PNG\r\n\x1a\n" + body, bytes(raw), plte


def test_png_unfilter_all_filter_types_bit_identical():
    import random

    rng = random.Random(7)
    cases = [(5, 4, 0, 1), (8, 8, 2, 3), (16, 9, 6, 4), (7, 3, 4, 2), (12, 12, 3, 1)]
    fsets = [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4], [4, 3, 2, 1, 0], [2, 4]]
    for w, h, color, samples in cases:
        for fs in fsets:
            png, raw, plte = _filtered_png(w, h, color, samples, fs, rng)
            got = codec.png_decode(png)
            assert got is not None, (w, h, color, fs)
            ref = _scalar_unfilter(raw, w, h, samples)
            if color == 3:
                exp = bytearray()
                for idx in ref:
                    exp += plte[idx * 3 : idx * 3 + 3]
                ref = bytes(exp)
            assert got[:3] == (w, h, 3 if color == 3 else samples)
            assert got[3] == ref, (w, h, color, fs, "pixel mismatch")
