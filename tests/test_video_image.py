"""Video modality (animated GIF: real LZW + container walk) and image
perceptual-hash near-dup — codec round trips, executor-vs-driver
reference agreement, and planted-cluster invariants."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mtg_bulk_database_spark.operators import multimodal
from mtg_bulk_database_spark.operators.imagecodec import build_codec
from mtg_bulk_database_spark.registry import load_registry

QUERIES, _ = load_registry()
SF_DIR = "/root/testdata/sf0.001"
CODEC = build_codec()


# --- LZW / GIF codec (pure python, no spark) ------------------------------


@pytest.mark.parametrize(
    "mcs,data",
    [
        (8, b"hello world" * 10),
        (8, b""),
        (8, bytes(range(256)) * 500),  # forces width growth + 4096 reset
        (2, bytes([i % 4 for i in range(5000)])),
        (
            8,
            b"".join(
                hashlib.md5(str(i).encode()).digest() for i in range(2000)
            ),
        ),
    ],
)
def test_lzw_round_trip(mcs, data):
    enc = CODEC.lzw_encode(mcs, data)
    assert CODEC.lzw_decode(mcs, enc, len(data)) == data


def test_gif_animation_round_trip_pixel_exact():
    frames = [
        bytes((i * 37 + f * 11) % 256 for i in range(64)) for f in range(5)
    ]
    gif = CODEC.gif_encode_animation(8, 8, frames, [10, 20, 30, 40, 50])
    assert CODEC.sniff(gif) == "gif"
    w, h, parsed = CODEC.gif_frames(gif)
    assert (w, h) == (8, 8) and len(parsed) == 5
    for want, (left, top, fw, fh, delay, px) in zip(frames, parsed):
        assert (left, top, fw, fh) == (0, 0, 8, 8)
        assert px == want  # grayscale palette -> luminance is identity
    assert [f[4] for f in parsed] == [10, 20, 30, 40, 50]


def test_gif_frames_rejects_non_gif():
    assert CODEC.gif_frames(b"GIF89a but not really a gif stream") is None
    assert CODEC.gif_frames(b"plain text") is None


# --- distributed video frame sampling -------------------------------------


def test_sample_gif_frames_distributed(spark):
    from mtg_bulk_database_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(20)
    media = multimodal.synthetic_gif_corpus(docs, n_frames=4)
    out = multimodal.sample_gif_frames(media, every_n=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc) == 20
    for doc_id, rows in by_doc.items():
        assert sorted(r["frame_idx"] for r in rows) == [0, 2]  # 4 frames / 2
        assert all(r["n_frames"] == 4 and r["decoded"] for r in rows)
        assert all((r["width"], r["height"]) == (8, 8) for r in rows)
        # delays were 10*(i+1) centiseconds at synthesis
        delays = {r["frame_idx"]: r["delay_cs"] for r in rows}
        assert delays == {0: 10, 2: 30}
        # executor-decoded mean intensity == driver-side reference
        for r in rows:
            px = b""
            ctr = 0
            while len(px) < 64:
                px += hashlib.md5(
                    f"gif:{doc_id}:{r['frame_idx']}:{ctr}".encode()
                ).digest()
                ctr += 1
            assert r["mean_intensity"] == sum(px[:64]) // 64


def test_sample_gif_frames_fallback_for_non_gif(spark):
    from mtg_bulk_database_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(5)
    media = multimodal.as_media_table(docs)  # text stand-ins, not GIFs
    out = multimodal.sample_gif_frames(media).collect()
    assert len(out) == 5
    assert all(not r["decoded"] and r["n_frames"] == 1 for r in out)


# --- image average-hash ----------------------------------------------------


def _dhash_bits(thumb: bytes) -> int:
    """Gradient-hash twin of operators/multimodal.ahash_of: 8×8
    thumbnail, bit i = cell i > cell (i*37+11)%64 (a fixed far
    bijection)."""
    bits = 0
    for i in range(64):
        if thumb[i] > thumb[(i * 37 + 11) % 64]:
            bits |= 1 << i
    return bits


def _ahash_reference(payload: bytes) -> int:
    w, h, ch, px = CODEC.png_decode(payload)
    assert ch == 1
    bits = _dhash_bits(CODEC.resize_nearest(w, h, 1, px, 8, 8))
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def test_ahash_matches_driver_reference(spark):
    from mtg_bulk_database_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(10)
    media = multimodal.synthetic_png_corpus(docs, group_mod=100)
    payloads = {
        r["doc_id"]: bytes(r["content"]) for r in media.collect()
    }
    hashes = {
        r["doc_id"]: (r["ahash"], r["is_image"])
        for r in multimodal.with_image_ahash(media).collect()
    }
    for doc_id, payload in payloads.items():
        got, is_image = hashes[doc_id]
        assert is_image
        assert got == _ahash_reference(payload)


def test_image_near_dup_pairs_find_planted_clusters(spark):
    from mtg_bulk_database_spark.catalog import load_table

    # 40 docs, groups of doc_id % 10 -> 4 docs per group
    docs = load_table(spark, SF_DIR, "documents").limit(40)
    media = multimodal.synthetic_png_corpus(docs, group_mod=10)
    pairs = multimodal.image_near_dup_pairs(media, max_hamming=4).collect()
    assert pairs, "planted near-dups must be found"
    for r in pairs:
        # every surviving pair is a planted same-group pair
        assert r["id_a"] % 10 == r["id_b"] % 10
        assert r["hamming"] <= 4
    # and the clusters are complete: each group of 4 -> 6 pairs
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    for g in range(10):
        members = sorted(i for i in ids if i % 10 == g)
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                assert (a, b) in found


def test_ahash_fallback_is_deterministic_not_image(spark):
    df = spark.createDataFrame(
        [(1, b"not an image"), (2, b"not an image"), (3, b"other bytes")],
        "doc_id long, content binary",
    ).withColumn("media_type", F.lit("application/octet-stream")).withColumn(
        "meta",
        F.struct(
            F.lit("t").alias("source"), F.lit(0).cast("long").alias("declared_bytes")
        ),
    )
    rows = {r["doc_id"]: r for r in multimodal.with_image_ahash(df).collect()}
    assert not rows[1]["is_image"]
    assert rows[1]["ahash"] == rows[2]["ahash"]  # same bytes, same pseudo-hash
    assert rows[1]["ahash"] != rows[3]["ahash"]


# --- registered gates ------------------------------------------------------


def test_q130_video_gate_shape(spark):
    out = QUERIES["q130_video_frame_sample"](spark, SF_DIR)
    rows = out.collect()
    n_docs = out.select("doc_id").distinct().count()
    assert len(rows) == 2 * n_docs  # 4 frames sampled every 2
    assert all(r["decoded"] for r in rows)


def test_q132_image_pairs_gate_histogram(spark):
    rows = QUERIES["q132_image_phash_pairs"](spark, SF_DIR).collect()
    assert rows
    assert all(0 <= r["hamming"] <= 4 and r["n_pairs"] > 0 for r in rows)


# --- property tests (pure python, no spark) -------------------------------

from hypothesis import example, given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(data=st.binary(min_size=0, max_size=4096))
def test_lzw_round_trip_arbitrary_bytes(data):
    enc = CODEC.lzw_encode(8, data)
    assert CODEC.lzw_decode(8, enc, len(data)) == data


@settings(max_examples=30, deadline=None)
@given(
    mcs=st.integers(min_value=2, max_value=8),
    data=st.lists(st.integers(min_value=0, max_value=3), max_size=2000),
)
def test_lzw_round_trip_small_alphabets(mcs, data):
    b = bytes(data)  # values < 2^mcs for every mcs >= 2
    enc = CODEC.lzw_encode(mcs, b)
    assert CODEC.lzw_decode(mcs, enc, len(b)) == b


@settings(max_examples=25, deadline=None)
@given(
    frames=st.lists(
        st.binary(min_size=16, max_size=16), min_size=1, max_size=6
    )
)
def test_gif_animation_round_trip_property(frames):
    gif = CODEC.gif_encode_animation(4, 4, frames)
    w, h, parsed = CODEC.gif_frames(gif)
    assert (w, h) == (4, 4)
    assert [px for (_, _, _, _, _, px) in parsed] == frames


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10**9))
@example(seed=9372)  # the r4 failure: mean landed on a 16-way tie
def test_ahash_deterministic_and_noise_tolerant(seed):
    """Same pixels -> same hash; a single-pixel nudge moves the hash by
    at most a few bits (the property the pigeonhole join relies on).
    The old sign-of-mean aHash FAILED this at seed 9372: the nudge moved
    the global mean onto a 16-way tie and flipped 16 bits at once. The
    gradient hash has no global statistic, so a changed pixel touches at
    most one thumbnail cell (nearest-neighbor downscale is injective for
    32×32→8×8) and flips at most that cell's 2 comparison bits."""
    px = bytearray(
        hashlib.md5(f"prop:{seed}".encode()).digest() * 64
    )[: 32 * 32]
    img_a = CODEC.png_encode(32, 32, 1, bytes(px))
    pos = seed % len(px)
    px[pos] = (px[pos] + 16) & 0xFF
    img_b = CODEC.png_encode(32, 32, 1, bytes(px))

    def dhash(img):
        w, h, ch, p = CODEC.png_decode(img)
        return _dhash_bits(CODEC.resize_nearest(w, h, 1, p, 8, 8))

    a1, a2 = dhash(img_a), dhash(img_a)
    assert a1 == a2
    b = dhash(img_b)
    assert bin(a1 ^ b).count("1") <= 2


@settings(max_examples=60, deadline=None)
@given(
    thumb=st.lists(
        st.integers(min_value=0, max_value=255), min_size=64, max_size=64
    ),
    cell=st.integers(min_value=0, max_value=63),
    delta=st.integers(min_value=-255, max_value=255),
)
def test_dhash_single_cell_noise_bounded(thumb, cell, delta):
    """The provable contract the pigeonhole join needs: changing ONE
    thumbnail cell by ANY amount flips at most 2 bits (the cell's own
    comparison plus the single bit whose partner it is, the map being a
    bijection) — including on all-tied (flat) thumbnails, the case that
    broke sign-of-mean aHash."""
    a = bytes(thumb)
    mutated = list(thumb)
    mutated[cell] = max(0, min(255, mutated[cell] + delta))
    b = bytes(mutated)
    assert bin(_dhash_bits(a) ^ _dhash_bits(b)).count("1") <= 2


def test_q206_video_near_dup_pairs_exact_group_structure(spark):
    """Planted-dup AVI corpus: 40 videos in 8 groups of 5 sharing 4
    bitwise-identical body frames, 0-2 unique trailers each → exactly
    C(5,2)·8 = 80 pairs, all in-group, every match_frac ≥ 4/6 (the
    worst 2-trailer dilution), and no cross-group pair survives."""
    rows = QUERIES["q206_video_near_dup"](spark, SF_DIR).collect()
    assert len(rows) == 80
    for r in rows:
        assert r["id_a"] % 8 == r["id_b"] % 8, (r["id_a"], r["id_b"])
        assert r["match_frac"] >= 4.0 / 6.0 - 1e-9
        assert r["n_match_a"] >= 4 and r["n_match_b"] >= 4
