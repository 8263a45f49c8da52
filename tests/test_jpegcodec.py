"""Baseline JPEG codec (ITU-T T.81, stdlib-only): round trips with
bounded lossy error, exact flat-field reconstruction, 4:2:0 and
restart-marker paths, structural cross-validation against the
INDEPENDENT header parser in imagecodec, and the distributed
aHash/resize stages consuming real JPEG payloads."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mtg_bulk_database_spark.operators.imagecodec import build_codec
from mtg_bulk_database_spark.operators.jpegcodec import build_jpeg_codec

J = build_jpeg_codec()
IC = build_codec()


def _smooth_rgb(w, h, a=10, b=12, c=5):
    return bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in (min(255, x * a), min(255, y * b), min(255, (x + y) * c))
    )


def test_gray_gradient_round_trip_tight_error():
    w, h = 16, 16
    gray = bytes(min(255, x * 8 + y * 4) for y in range(h) for x in range(w))
    enc = J.jpeg_encode(w, h, 1, gray)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    dw, dh, dc, px = J.jpeg_decode(enc)
    assert (dw, dh, dc) == (w, h, 1)
    assert max(abs(a - b) for a, b in zip(gray, px)) <= 4


def test_flat_fields_reconstruct_exactly():
    """A flat field is pure DC; with the Annex-K DC quantizer (16) the
    representable gray levels are 128 ± 2k — those reconstruct EXACTLY
    (analytical property of the transform, not a tolerance)."""
    for level in (128, 130, 96, 200):
        flat = bytes([level]) * 256
        assert J.jpeg_decode(J.jpeg_encode(16, 16, 1, flat))[3] == flat
    # an odd level sits between representable levels: off by exactly 1
    flat77 = bytes([77]) * 256
    out = J.jpeg_decode(J.jpeg_encode(16, 16, 1, flat77))[3]
    assert set(out) == {78}


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("ri", [0, 2])
def test_color_round_trip_all_modes(sub, ri):
    w, h = 24, 20
    rgb = _smooth_rgb(w, h)
    enc = J.jpeg_encode(w, h, 3, rgb, subsampling=sub, restart_interval=ri)
    dw, dh, dc, px = J.jpeg_decode(enc)
    assert (dw, dh, dc) == (w, h, 3)
    mean = sum(abs(a - b) for a, b in zip(rgb, px)) / len(rgb)
    assert mean < 8.0  # smooth content survives quantization closely
    assert max(abs(a - b) for a, b in zip(rgb, px)) < 40


@pytest.mark.parametrize("w,h,ch", [(13, 9, 1), (25, 17, 3), (1, 1, 1), (33, 1, 1)])
def test_odd_dimensions_round_trip(w, h, ch):
    px = _smooth_rgb(w, h)[: w * h * ch] if ch == 3 else bytes(
        min(255, x * 7 + y * 3) for y in range(h) for x in range(w)
    )
    dw, dh, dc, out = J.jpeg_decode(J.jpeg_encode(w, h, ch, px))
    assert (dw, dh, dc) == (w, h, ch)
    assert len(out) == w * h * ch


def test_encode_is_deterministic():
    rgb = _smooth_rgb(16, 16)
    assert J.jpeg_encode(16, 16, 3, rgb) == J.jpeg_encode(16, 16, 3, rgb)


def test_dims_agree_with_independent_header_parser():
    """imagecodec._jpeg_dims walks SOFn markers with completely separate
    code — structural cross-validation of the emitted byte stream."""
    for w, h, ch, sub in [(24, 20, 3, "444"), (24, 20, 3, "420"), (9, 31, 1, "444")]:
        px = (
            _smooth_rgb(w, h)
            if ch == 3
            else bytes((x + y) % 256 for y in range(h) for x in range(w))
        )
        enc = J.jpeg_encode(w, h, ch, px, subsampling=sub)
        assert IC.sniff(enc) == "jpeg"
        assert IC.decode_header(enc) == (w, h, ch)


def test_decode_rejects_progressive_and_garbage():
    # progressive: flip SOF0 (C0) to SOF2 (C2) in a valid stream
    enc = bytearray(J.jpeg_encode(8, 8, 1, bytes(range(192, 256))))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    assert J.jpeg_decode(bytes(enc)) is None
    assert J.jpeg_decode(b"\xff\xd8not a jpeg") is None
    assert J.jpeg_decode(b"plain text") is None


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=10**6),
)
def test_property_round_trip_never_crashes_and_bounds_shape(w, h, seed):
    base = hashlib.md5(f"jp:{seed}".encode()).digest()
    # smooth-ish: tile md5 bytes through a blur-by-repetition
    px = bytes(base[(x // 4 + y // 4) % 16] for y in range(h) for x in range(w))
    dw, dh, dc, out = J.jpeg_decode(J.jpeg_encode(w, h, 1, px))
    assert (dw, dh, dc) == (w, h, 1) and len(out) == w * h


# --- distributed stages over real JPEG payloads ---------------------------


def _jpeg_media(spark, n=12):
    from pyspark.sql import functions as F

    rows = []
    for i in range(n):
        g = i % 4
        w = h = 16
        px = bytearray(
            hashlib.md5(f"jgroup:{g}:{j}".encode()).digest()[0]
            for j in range(w * h)
        )
        px[i % (w * h)] = (px[i % (w * h)] + 9) & 0xFF
        rows.append((i, J.jpeg_encode(w, h, 1, bytes(px))))
    return (
        spark.createDataFrame(rows, "doc_id long, content binary")
        .withColumn("media_type", F.lit("image/jpeg"))
        .withColumn(
            "meta",
            F.struct(
                F.lit("jpeg").alias("source"),
                F.lit(0).cast("long").alias("declared_bytes"),
            ),
        )
    )


def test_ahash_consumes_real_jpegs_distributed(spark):
    from mtg_bulk_database_spark.operators import multimodal

    media = _jpeg_media(spark)
    rows = {r["doc_id"]: r for r in multimodal.with_image_ahash(media).collect()}
    assert all(r["is_image"] for r in rows.values())
    pairs = multimodal.image_near_dup_pairs(media, max_hamming=4).collect()
    assert pairs
    # planted groups (doc_id % 4 share base pixels) cluster together
    for r in pairs:
        assert r["id_a"] % 4 == r["id_b"] % 4


def test_resize_decodes_real_jpegs(spark):
    from mtg_bulk_database_spark.operators import multimodal

    media = _jpeg_media(spark, n=4)
    out = {r["doc_id"]: r for r in multimodal.resize_images(media, max_side=8).collect()}
    for r in out.values():
        assert (r["width"], r["height"]) == (8, 8)
        # real path re-encodes as PNG
        assert bytes(r["content"])[:8] == b"\x89PNG\r\n\x1a\n"


def test_q148_cross_format_dedup_gate(spark):
    """The headline property: PNG and JPEG encodings of the same picture
    pair up (cross_format=true at tiny Hamming), with zero cross-group
    false positives and complete group recall."""
    from mtg_bulk_database_spark.registry import load_registry

    QUERIES, _ = load_registry()
    rows = QUERIES["q148_cross_format_image_dedup"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    cross = sum(r["n_pairs"] for r in rows if r["cross_format"])
    same = sum(r["n_pairs"] for r in rows if not r["cross_format"])
    assert cross > 0, "cross-format copies must be found"
    # 500 docs, 50 groups of 10 (5 PNG + 5 JPEG): 25 cross + 20 same
    # pairs per group, all within the radius
    assert cross == 25 * 50
    assert same == 20 * 50


# --- AVI/MJPEG container --------------------------------------------------


def test_avi_mjpeg_round_trip_and_reference_means(spark):
    from mtg_bulk_database_spark.operators import multimodal
    from mtg_bulk_database_spark.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(10)
    media = multimodal.synthetic_avi_corpus(docs, n_frames=6)
    out = multimodal.sample_mjpeg_frames(media, every_n=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc) == 10
    for doc_id, rows in by_doc.items():
        assert sorted(r["frame_idx"] for r in rows) == [0, 2, 4]
        assert all(
            r["decoded"] and r["n_frames"] == 6
            and (r["width"], r["height"]) == (16, 16)
            and r["delay_cs"] == 10  # fps=10 -> 100000 us -> 10 cs
            for r in rows
        )
        # flat DCT-aligned even-level blocks reconstruct EXACTLY, so the
        # executor's decoded mean equals the analytical mean of the four
        # 8x8 block levels
        for r in rows:
            seed = hashlib.md5(
                f"avi:{doc_id}:{r['frame_idx']}".encode()
            ).digest()
            blocks = [seed[0] & 0xFE, seed[1] & 0xFE, seed[2] & 0xFE, seed[3] & 0xFE]
            want = sum(b * 64 for b in blocks) // 256
            assert r["mean_intensity"] == want


def test_mjpeg_sampler_fallback_for_non_avi(spark):
    from mtg_bulk_database_spark.operators import multimodal
    from mtg_bulk_database_spark.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(4)
    media = multimodal.as_media_table(docs)
    out = multimodal.sample_mjpeg_frames(media).collect()
    assert len(out) == 4
    assert all(not r["decoded"] and r["n_frames"] == 1 for r in out)


def test_q149_video_gate(spark):
    from mtg_bulk_database_spark.registry import load_registry

    QUERIES, _ = load_registry()
    out = QUERIES["q149_mjpeg_frame_sample"](
        spark, "/root/testdata/sf0.001"
    )
    rows = out.collect()
    n_docs = out.select("doc_id").distinct().count()
    assert len(rows) == 3 * n_docs  # 6 frames sampled every 2
    assert all(r["decoded"] for r in rows)
