"""Pure-stdlib WAV (RIFF/WAVE, PCM16) codec — the audio half of the
multimodal column surface, built the same way as ``imagecodec``: a real
spec-based parser for recognized payloads, stdlib ``struct`` only, no
third-party audio libraries (none exist in this container, and the
Spark-side plumbing — schema, Arrow batching, by-value pickling — is
what must be real).

Format notes (public Microsoft/IBM RIFF spec): a WAV file is
``b"RIFF" <u32 size> b"WAVE"`` followed by chunks; the ``fmt `` chunk
carries ``<u16 audio_format> <u16 n_channels> <u32 sample_rate>
<u32 byte_rate> <u16 block_align> <u16 bits_per_sample>`` and the
``data`` chunk carries the little-endian samples. Only uncompressed
PCM (audio_format == 1) 16-bit is decoded — the overwhelmingly common
training-data case; anything else returns None and callers take the
deterministic raw-PCM fallback.
"""

from __future__ import annotations

import struct


def wav_encode(
    samples: list[int], sample_rate: int = 8000, n_channels: int = 1
) -> bytes:
    """Serialize int16 samples to a minimal canonical PCM16 WAV
    (RIFF + fmt + data, no optional chunks). Interleaved if
    ``n_channels > 1``; sample count must be divisible by channels."""
    if n_channels < 1:
        raise ValueError("n_channels must be >= 1")
    if len(samples) % n_channels:
        raise ValueError("sample count must be divisible by n_channels")
    data = struct.pack(f"<{len(samples)}h", *samples)
    block_align = 2 * n_channels
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        n_channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        16,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def build_audio_codec():
    """Self-contained namespace of pure-Python audio functions:
    ``wav_parse`` and ``pcm16_features``. Every function is defined
    NESTED so the bundle pickles by VALUE into mapInPandas closures —
    a module-global reference would require workers to import this
    package themselves (imagecodec.build_codec's rationale)."""
    import math
    import struct
    from types import SimpleNamespace

    def wav_parse(payload: bytes):
        """(n_channels, sample_rate, interleaved int16 samples) for a
        PCM16 RIFF/WAVE payload, else None (wrong magic, compressed,
        odd bit depth, truncated). Chunk-walks so extra chunks
        (LIST/INFO, fact) are skipped per spec, including the odd-size
        pad byte."""
        if (
            len(payload) < 12
            or payload[:4] != b"RIFF"
            or payload[8:12] != b"WAVE"
        ):
            return None
        pos = 12
        fmt_info = None
        data = None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body_start = pos + 8
            if body_start + size > len(payload):
                return None  # truncated chunk
            if cid == b"fmt " and size >= 16:
                fmt_info = struct.unpack_from("<HHIIHH", payload, body_start)
            elif cid == b"data":
                data = payload[body_start : body_start + size]
            pos = body_start + size + (size & 1)  # chunks are word-aligned
        if fmt_info is None or data is None:
            return None
        audio_format, n_channels, sample_rate, _rate, _align, bits = fmt_info
        if audio_format != 1 or bits != 16 or n_channels < 1:
            return None
        n = len(data) // 2
        samples = list(struct.unpack(f"<{n}h", data[: 2 * n]))
        return (n_channels, sample_rate, samples)

    def pcm16_features(
        samples: list[int], sample_rate: int, n_channels: int = 1
    ) -> dict:
        """Deterministic integer features over an INTERLEAVED int16
        vector — all-integer math (mean-square floor-div, isqrt) so any
        two executors, or a Python reference in a test, produce
        identical values with no float accumulation order to diverge on.

        - ``rms``: ⌊sqrt(⌊Σs²/n⌋)⌋ over ALL channels' samples —
          loudness across the mix;
        - ``zero_crossings``: strict sign-change count along CHANNEL 0
          only (comparing interleaved samples across channels would
          count spurious crossings);
        - ``duration_ms``: ⌊1000·frames/rate⌋ where
          frames = n_samples / n_channels — wall-clock length, not
          inflated by channel count;
        - ``n_samples``: total interleaved samples (all channels).
        """
        n = len(samples)
        if n == 0 or n_channels < 1:
            return {
                "n_samples": 0,
                "rms": 0,
                "zero_crossings": 0,
                "duration_ms": 0,
            }
        sumsq = sum(s * s for s in samples)
        rms = math.isqrt(sumsq // n)
        ch0 = samples[::n_channels]
        zc = 0
        prev = ch0[0]
        for s in ch0[1:]:
            if (prev < 0 <= s) or (s < 0 <= prev):
                zc += 1
            prev = s
        frames = n // n_channels
        return {
            "n_samples": n,
            "rms": rms,
            "zero_crossings": zc,
            "duration_ms": (1000 * frames) // max(sample_rate, 1),
        }

    return SimpleNamespace(wav_parse=wav_parse, pcm16_features=pcm16_features)


#: module-level aliases for tests/interactive use — same objects, no drift.
_codec = build_audio_codec()
wav_parse = _codec.wav_parse
pcm16_features = _codec.pcm16_features
