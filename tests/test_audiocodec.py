"""WAV codec + audio feature stage: spec round-trips, malformed-input
rejection, integer-feature agreement with a pure-Python reference, and
the distributed Arrow stage over a mixed WAV/raw corpus."""

from __future__ import annotations

import math
import struct

from pyspark.sql import functions as F

from mtg_bulk_database_spark.catalog import load_table
from mtg_bulk_database_spark.operators.audiocodec import (
    pcm16_features,
    wav_encode,
    wav_parse,
)

SF_DIR = "/root/testdata/sf0.001"


def test_wav_round_trip_mono_and_stereo():
    mono = [0, 1000, -1000, 32767, -32768, 5]
    assert wav_parse(wav_encode(mono, 8000, 1)) == (1, 8000, mono)
    stereo = [10, -10, 20, -20, 30, -30]
    assert wav_parse(wav_encode(stereo, 44100, 2)) == (2, 44100, stereo)


def test_wav_parse_skips_extra_chunks_and_rejects_garbage():
    w = wav_encode([1, 2, 3], 8000)
    # splice a LIST chunk (odd size → pad byte) between fmt and data
    fmt_end = w.index(b"data")
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    spliced = w[:fmt_end] + extra + w[fmt_end:]
    assert wav_parse(spliced) == (1, 8000, [1, 2, 3])

    assert wav_parse(b"") is None
    assert wav_parse(b"RIFFxxxxWAVE") is None  # no chunks
    assert wav_parse(b"\x89PNG\r\n\x1a\n" + b"0" * 40) is None
    truncated = w[: len(w) - 2]
    assert wav_parse(truncated) is None  # data chunk shorter than declared


def test_pcm16_features_reference_values():
    # square wave ±1000: rms == 1000 exactly, one crossing per flip
    sq = [1000, -1000] * 50
    f = pcm16_features(sq, 8000)
    assert f["rms"] == 1000
    assert f["zero_crossings"] == 99
    assert f["n_samples"] == 100
    assert f["duration_ms"] == (1000 * 100) // 8000
    # integer mean-square floor: [3, 4] → isqrt((9+16)//2) = 3
    assert pcm16_features([3, 4], 8000)["rms"] == 3
    assert pcm16_features([], 8000) == {
        "n_samples": 0,
        "rms": 0,
        "zero_crossings": 0,
        "duration_ms": 0,
    }


def test_distributed_stage_matches_python_reference(spark):
    """Mixed corpus — half real WAVs (synthesized with wav_encode from
    each doc's id), half raw text payloads (headerless-PCM fallback) —
    through the Arrow stage on a multi-partition frame, validated
    row-for-row against the driver-side reference."""
    from mtg_bulk_database_spark.operators import multimodal

    docs = load_table(spark, SF_DIR, "documents").limit(40).collect()
    rows = []
    expected = {}
    for i, r in enumerate(docs):
        if i % 2 == 0:
            samples = [((r.doc_id * 37 + k * 997) % 4001) - 2000 for k in range(64)]
            payload = wav_encode(samples, 16000)
            ref = pcm16_features(samples, 16000)
            expected[r.doc_id] = (True, 1, 16000, ref)
        else:
            payload = (r.text or "").encode()
            n = len(payload) // 2
            samples = list(struct.unpack(f"<{n}h", payload[: 2 * n]))
            expected[r.doc_id] = (False, 1, 8000, pcm16_features(samples, 8000))
        rows.append((r.doc_id, payload, "audio/mixed", (str(r.source), len(payload))))

    media = spark.createDataFrame(
        rows,
        "doc_id long, content binary, media_type string, "
        "meta struct<source:string, declared_bytes:long>",
    ).repartition(5)
    got = multimodal.extract_audio_features(media).collect()
    assert len(got) == len(expected)
    for g in got:
        is_wav, nch, rate, ref = expected[g.doc_id]
        assert (g.is_wav, g.n_channels, g.sample_rate) == (is_wav, nch, rate)
        assert g.n_samples == ref["n_samples"]
        assert g.rms == ref["rms"]
        assert g.zero_crossings == ref["zero_crossings"]
        assert g.duration_ms == ref["duration_ms"]


def test_stereo_features_use_frames_and_channel0():
    """Multichannel regression (review finding): duration must count
    FRAMES not interleaved samples, and zero-crossings must follow one
    channel — interleaved comparison would count spurious flips."""
    # 1 s of stereo at 8 kHz: L alternates ±1000 (one crossing per
    # frame), R constant +5 (zero crossings)
    frames = 8000
    samples = []
    for i in range(frames):
        samples += [1000 if i % 2 == 0 else -1000, 5]
    f = pcm16_features(samples, 8000, n_channels=2)
    assert f["duration_ms"] == 1000  # NOT 2000
    assert f["zero_crossings"] == frames - 1  # channel 0 only
    assert f["n_samples"] == 2 * frames
    parsed = wav_parse(wav_encode(samples, 8000, 2))
    assert parsed == (2, 8000, samples)
