"""AVI/MJPEG video container codec, stdlib only — the true-video leg of
the multimodal stack (the GIF animation path proved the frame-sampling
contract; this is the same contract over an actual video container).

AVI is RIFF (the same chunk discipline as the WAV codec in
``audiocodec``): ``RIFF('AVI ' LIST('hdrl' avih ...) LIST('movi'
00dc...))``. Motion-JPEG stores every frame as a standalone baseline
JPEG, so the full per-frame pixel decode comes from ``jpegcodec`` —
no inter-frame prediction, which is exactly why MJPEG is the one video
format honestly implementable from specs without a codec library.

Encoder writes the minimal standard layout (avih + one 'vids'/'MJPG'
stream header + movi chunks, even-padded); parser walks chunks
tolerantly (skips unknown LISTs/chunks, stops at the declared RIFF
size) and returns frame payloads without decoding them — decode is the
caller's choice per sampled frame, which is the whole point of
sampling (decode 1/N of the bytes, not all of them).

Same by-value pickling convention as the image codecs.
"""

from __future__ import annotations


def build_video_codec():
    import struct
    from types import SimpleNamespace

    def _chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def _list(list_type: bytes, *payloads: bytes) -> bytes:
        body = list_type + b"".join(payloads)
        return _chunk(b"LIST", body)

    def avi_encode_mjpeg(
        w: int, h: int, jpeg_frames: list[bytes], fps: int = 10
    ) -> bytes:
        """Minimal spec-conforming AVI wrapping pre-encoded baseline
        JPEG frames as one MJPG video stream."""
        us_per_frame = 1_000_000 // fps
        n = len(jpeg_frames)
        max_bytes = max((len(f) for f in jpeg_frames), default=0)
        avih = struct.pack(
            "<14I",
            us_per_frame, max_bytes * fps, 0, 0x10,  # AVIF_HASINDEX off
            n, 0, 1, max_bytes, w, h, 0, 0, 0, 0,
        )
        strh = struct.pack(
            "<4s4sIHHIIIIIIII4H",
            b"vids", b"MJPG", 0, 0, 0, 0,
            1, fps, 0, n, max_bytes, 0, 0, 0, 0, w, h,
        )
        strf = struct.pack(
            "<IiiHH4sIiiII",
            40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
        )
        hdrl = _list(
            b"hdrl",
            _chunk(b"avih", avih),
            _list(b"strl", _chunk(b"strh", strh), _chunk(b"strf", strf)),
        )
        movi = _list(b"movi", *[_chunk(b"00dc", f) for f in jpeg_frames])
        riff_body = b"AVI " + hdrl + movi
        return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body

    def avi_parse(payload: bytes):
        """(width, height, n_frames_declared, us_per_frame, frames)
        where ``frames`` is the list of raw JPEG payloads from '00dc'
        chunks — or None if the payload is not a plausible AVI."""
        if (
            len(payload) < 24
            or payload[:4] != b"RIFF"
            or payload[8:12] != b"AVI "
        ):
            return None
        try:
            end = min(8 + struct.unpack("<I", payload[4:8])[0], len(payload))
            w = h = n_decl = uspf = 0
            frames: list[bytes] = []

            def walk(lo: int, hi: int):
                nonlocal w, h, n_decl, uspf
                i = lo
                while i + 8 <= hi:
                    fourcc = payload[i : i + 4]
                    (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
                    body_lo = i + 8
                    body_hi = min(body_lo + size, hi)
                    if fourcc == b"LIST":
                        walk(body_lo + 4, body_hi)  # skip list type
                    elif fourcc == b"avih" and size >= 40:
                        vals = struct.unpack(
                            "<10I", payload[body_lo : body_lo + 40]
                        )
                        uspf, n_decl, w, h = vals[0], vals[4], vals[8], vals[9]
                    elif fourcc[2:4] == b"dc":
                        frames.append(payload[body_lo:body_hi])
                    i = body_hi + (size % 2)
            walk(12, end)
            if w == 0 or h == 0 or not frames:
                return None
            return w, h, n_decl, uspf, frames
        except (struct.error, IndexError):
            return None

    return SimpleNamespace(
        avi_encode_mjpeg=avi_encode_mjpeg,
        avi_parse=avi_parse,
    )
