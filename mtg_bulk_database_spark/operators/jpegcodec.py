"""Baseline JPEG codec from the published spec (ITU-T T.81), stdlib
only — closes the last "header-only" gap in the multimodal decode
stack (PNG and GIF already have full pixel codecs; see
``imagecodec.py``).

Scope: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr with
4:4:4 / 4:2:0 / 4:2:2 sampling, restart markers, 0xFF byte stuffing —
i.e. the overwhelming majority of real-world JPEGs. Progressive
(SOF2) and arithmetic coding return ``None`` (caller falls back to
header-only parse). The encoder emits 4:4:4 (or single-component
grayscale) with the spec's Annex-K quantization and Huffman tables —
bytes any external viewer decodes.

Everything lives inside :func:`build_jpeg_codec` so the returned
functions close over each other and pickle BY VALUE into mapInPandas
closures (same convention as ``imagecodec.build_codec``).

JPEG is lossy: round-trip tests assert bounded per-pixel error, not
equality (the exactness-obsessed operators in this engine hash the
*encoded bytes*, which ARE deterministic — the float DCT here is fixed
arithmetic on fixed tables, no platform-dependent fast paths).
"""

from __future__ import annotations


def build_jpeg_codec():
    import math
    import struct
    from types import SimpleNamespace

    import numpy as np

    ZIGZAG = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    # Annex K quantization tables (quality ~50)
    QT_LUM = [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ]
    QT_CHR = [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ]
    # Annex K Huffman specs: (bits[1..16], values)
    HT_DC_LUM = (
        [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
        list(range(12)),
    )
    HT_DC_CHR = (
        [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
        list(range(12)),
    )
    HT_AC_LUM = (
        [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
        [
            0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
            0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
            0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
            0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
            0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
            0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
            0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
            0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
            0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
            0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
            0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
            0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
            0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
            0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
            0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
            0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
            0xF9, 0xFA,
        ],
    )
    HT_AC_CHR = (
        [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
        [
            0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
            0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
            0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
            0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
            0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
            0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
            0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
            0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
            0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
            0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
            0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
            0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
            0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
            0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
            0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
            0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
            0xF9, 0xFA,
        ],
    )

    COS = [
        [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
        for x in range(8)
    ]
    C = [1 / math.sqrt(2)] + [1.0] * 7
    # DCT basis as a matrix: A[u, x] = C[u]·cos((2x+1)uπ/16), so the
    # 2-D transforms become two 8×8 matmuls (r4 numpy vectorization):
    #   FDCT:  A @ block @ Aᵀ / 4      IDCT:  Aᵀ @ coefs @ A / 4
    A_DCT = np.array(
        [[C[u] * COS[x][u] for x in range(8)] for u in range(8)],
        dtype=np.float64,
    )

    # ---- shared Huffman machinery -----------------------------------------
    def _build_codes(bits, values):
        """symbol -> (code, length), canonical per spec."""
        out = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                out[values[k]] = (code, length)
                code += 1
                k += 1
            code <<= 1
        return out

    _LUT_BITS = 9  # primary lookup width: covers the common short codes

    def _build_decode(bits, values):
        """Two-level Huffman decode table: a 2^9 direct LUT for codes
        <= 9 bits (one peek + one list index per symbol, replacing the
        r3 bit-by-bit dict walk) and a (length, code) dict for the long
        tail.  Built per DHT segment — 512 slice-assigned entries, so
        per-image build cost stays trivial."""
        enc = _build_codes(bits, values)
        lut = [None] * (1 << _LUT_BITS)
        long_tab = {}
        for sym, (code, ln) in enc.items():
            if ln <= _LUT_BITS:
                start = code << (_LUT_BITS - ln)
                span = 1 << (_LUT_BITS - ln)
                lut[start : start + span] = [(sym, ln)] * span
            else:
                long_tab[(ln, code)] = sym
        return lut, long_tab

    # ---- encoder -----------------------------------------------------------
    class _BitWriter:
        def __init__(self):
            self.buf = bytearray()
            self.acc = 0
            self.n = 0

        def write(self, code, length):
            self.acc = (self.acc << length) | (code & ((1 << length) - 1))
            self.n += length
            while self.n >= 8:
                byte = (self.acc >> (self.n - 8)) & 0xFF
                self.buf.append(byte)
                if byte == 0xFF:
                    self.buf.append(0x00)  # stuffing
                self.n -= 8
            self.acc &= (1 << self.n) - 1

        def flush(self):
            if self.n:
                pad = 8 - self.n
                self.write((1 << pad) - 1, pad)  # 1-fill per spec

    def _magnitude(v):
        """(size, bits) for a DC diff / AC coefficient."""
        if v == 0:
            return 0, 0
        a = abs(v)
        size = a.bit_length()
        bits = v if v > 0 else v + (1 << size) - 1
        return size, bits

    def _encode_block(bw, coefs, dc_codes, ac_codes, pred):
        zz = [coefs[ZIGZAG[i]] for i in range(64)]
        diff = zz[0] - pred
        size, bits = _magnitude(diff)
        code, ln = dc_codes[size]
        bw.write(code, ln)
        if size:
            bw.write(bits, size)
        run = 0
        last_nz = 0
        for i in range(63, 0, -1):
            if zz[i]:
                last_nz = i
                break
        for i in range(1, last_nz + 1):
            if zz[i] == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            size, bits = _magnitude(zz[i])
            code, ln = ac_codes[(run << 4) | size]
            bw.write(code, ln)
            bw.write(bits, size)
            run = 0
        if last_nz != 63:
            code, ln = ac_codes[0x00]  # EOB
            bw.write(code, ln)
        return zz[0]

    def _seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def jpeg_encode(w, h, channels, pixels, subsampling="444",
                    restart_interval=0):
        """Baseline JPEG bytes for 8-bit gray (channels=1) or RGB
        (channels=3, YCbCr). ``subsampling``: "444" or "420" (color
        only — 420 averages each 2×2 chroma neighborhood, the
        photographic default). ``restart_interval`` > 0 emits DRI +
        RSTn markers every N MCUs (the parallel-decode/error-recovery
        feature; exercises the decoder's restart path)."""
        if channels not in (1, 3):
            raise ValueError("jpeg_encode: channels must be 1 or 3")
        if subsampling not in ("444", "420"):
            raise ValueError("jpeg_encode: subsampling must be 444 or 420")
        ncomp = 1 if channels == 1 else 3
        # component planes, level-shifted (numpy; same expressions and
        # evaluation order as the r3 scalar loops, float64 throughout)
        px_arr = np.asarray(
            bytearray(pixels) if isinstance(pixels, (bytes, bytearray)) else pixels,
            dtype=np.float64,
        ).reshape(h, w, channels)
        if ncomp == 1:
            planes = [px_arr[:, :, 0] - 128.0]
        else:
            r = px_arr[:, :, 0]
            g = px_arr[:, :, 1]
            b = px_arr[:, :, 2]
            yy = 0.299 * r + 0.587 * g + 0.114 * b
            cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
            cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
            planes = [yy - 128, cb - 128, cr - 128]

        # per-component sampling factors + (possibly downsampled) planes
        if ncomp == 3 and subsampling == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
            for ci in (1, 2):
                # 2x2 mean with edge replication for odd dims — the
                # same (a+b+c+d)/4.0 the scalar loop computed
                src = planes[ci]
                ph, pw = h + (h & 1), w + (w & 1)
                pad = np.pad(src, ((0, ph - h), (0, pw - w)), mode="edge")
                planes[ci] = (
                    pad[0::2, 0::2] + pad[0::2, 1::2]
                    + pad[1::2, 0::2] + pad[1::2, 1::2]
                ) / 4.0
        else:
            samp = [(1, 1)] * ncomp
        dims = [
            (planes[ci].shape[1], planes[ci].shape[0]) for ci in range(ncomp)
        ]

        dc_lum = _build_codes(*HT_DC_LUM)
        ac_lum = _build_codes(*HT_AC_LUM)
        dc_chr = _build_codes(*HT_DC_CHR)
        ac_chr = _build_codes(*HT_AC_CHR)
        bw = _BitWriter()
        preds = [0] * ncomp
        hmax = max(sh for sh, _ in samp)
        vmax = max(sv for _, sv in samp)
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        # Batched FDCT+quantization per component (r4): pad each plane
        # to its MCU grid with edge replication (== the scalar loop's
        # min() clamping), carve into 8×8 blocks, transform ALL of them
        # with two broadcast matmuls, quantize with round-half-even —
        # the entropy loop below just reads the precomputed blocks.
        qblocks = []
        for ci in range(ncomp):
            sh, sv = samp[ci]
            cw, chh = dims[ci]
            ph_, pw_ = mcuy * 8 * sv, mcux * 8 * sh
            pad = np.pad(
                planes[ci], ((0, ph_ - chh), (0, pw_ - cw)), mode="edge"
            )
            blocks = pad.reshape(ph_ // 8, 8, pw_ // 8, 8).transpose(0, 2, 1, 3)
            qt = np.asarray(
                QT_LUM if ci == 0 else QT_CHR, dtype=np.float64
            ).reshape(8, 8)
            coef = A_DCT @ blocks @ A_DCT.T / 4.0
            qblocks.append(np.rint(coef / qt).astype(np.int64))
        n_mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and n_mcu and (
                    n_mcu % restart_interval == 0
                ):
                    bw.flush()
                    bw.buf += bytes(
                        [0xFF, 0xD0 + ((n_mcu // restart_interval - 1) % 8)]
                    )
                    preds = [0] * ncomp
                n_mcu += 1
                for ci in range(ncomp):
                    sh, sv = samp[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            # natural-order coefs; _encode_block zigzags
                            coefs = qblocks[ci][
                                my * sv + by, mx * sh + bx
                            ].ravel().tolist()
                            preds[ci] = _encode_block(
                                bw,
                                coefs,
                                dc_lum if ci == 0 else dc_chr,
                                ac_lum if ci == 0 else ac_chr,
                                preds[ci],
                            )
        bw.flush()

        out = bytearray(b"\xff\xd8")  # SOI
        dqt = bytes([0]) + bytes(QT_LUM[ZIGZAG[i]] for i in range(64))
        out += _seg(0xDB, dqt)
        if ncomp == 3:
            dqt2 = bytes([1]) + bytes(QT_CHR[ZIGZAG[i]] for i in range(64))
            out += _seg(0xDB, dqt2)
        sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
        for ci in range(ncomp):
            sh, sv = samp[ci]
            sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
        out += _seg(0xC0, bytes(sof))
        if restart_interval:
            out += _seg(0xDD, struct.pack(">H", restart_interval))
        for cls, tid, (bits, vals) in (
            (0, 0, HT_DC_LUM),
            (1, 0, HT_AC_LUM),
            (0, 1, HT_DC_CHR),
            (1, 1, HT_AC_CHR),
        )[: 2 if ncomp == 1 else 4]:
            out += _seg(
                0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
            )
        sos = bytearray([ncomp])
        for ci in range(ncomp):
            t = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (t << 4) | t])
        sos += bytes([0, 63, 0])
        out += _seg(0xDA, bytes(sos))
        out += bw.buf
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    # ---- decoder -----------------------------------------------------------
    def jpeg_decode(payload):
        """(width, height, n_channels, pixel_bytes) for a baseline JPEG,
        or None for unsupported variants (progressive, arithmetic,
        12-bit, malformed)."""
        try:
            return _jpeg_decode(payload)
        except (struct.error, IndexError, KeyError, ValueError, TypeError):
            return None

    def _jpeg_decode(d):
        if d[:2] != b"\xff\xd8":
            return None
        pos = 2
        qts = {}
        dc_tabs, ac_tabs = {}, {}
        comps = []
        w = h = 0
        restart = 0
        while pos + 4 <= len(d):
            if d[pos] != 0xFF:
                pos += 1
                continue
            marker = d[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xD9:
                return None  # EOI before SOS
            seglen = struct.unpack(">H", d[pos + 2 : pos + 4])[0]
            body = d[pos + 4 : pos + 2 + seglen]
            if marker == 0xDB:
                i = 0
                while i < len(body):
                    pq, tq = body[i] >> 4, body[i] & 0xF
                    i += 1
                    n = 64 * (2 if pq else 1)
                    raw = body[i : i + n]
                    i += n
                    if pq:
                        vals = list(
                            struct.unpack(f">{64}H", raw)
                        )
                    else:
                        vals = list(raw)
                    qt = [0] * 64
                    for k in range(64):
                        qt[ZIGZAG[k]] = vals[k]
                    qts[tq] = qt
            elif marker == 0xC0:
                prec = body[0]
                if prec != 8:
                    return None
                h, w = struct.unpack(">HH", body[1:5])
                nc = body[5]
                comps = []
                for ci in range(nc):
                    cid, hv, tq = body[6 + ci * 3 : 9 + ci * 3]
                    comps.append(
                        {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                    )
            elif marker in (0xC1,):
                # extended sequential is the same entropy coding
                prec = body[0]
                if prec != 8:
                    return None
                h, w = struct.unpack(">HH", body[1:5])
                nc = body[5]
                comps = []
                for ci in range(nc):
                    cid, hv, tq = body[6 + ci * 3 : 9 + ci * 3]
                    comps.append(
                        {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                    )
            elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                            0xCD, 0xCE, 0xCF):
                return None  # progressive / hierarchical / arithmetic
            elif marker == 0xC4:
                i = 0
                while i < len(body):
                    tc, th = body[i] >> 4, body[i] & 0xF
                    bits = list(body[i + 1 : i + 17])
                    nv = sum(bits)
                    vals = list(body[i + 17 : i + 17 + nv])
                    tab = _build_decode(bits, vals)
                    (ac_tabs if tc else dc_tabs)[th] = tab
                    i += 17 + nv
            elif marker == 0xDD:
                restart = struct.unpack(">H", body[:2])[0]
            elif marker == 0xDA:
                ns = body[0]
                scan = []
                for ci in range(ns):
                    cid, tt = body[1 + ci * 2 : 3 + ci * 2]
                    comp = next(c for c in comps if c["id"] == cid)
                    scan.append(
                        {**comp, "dc": tt >> 4, "ac": tt & 0xF}
                    )
                data_start = pos + 2 + seglen
                return _decode_scan(
                    d, data_start, w, h, scan, qts, dc_tabs, ac_tabs,
                    restart,
                )
            pos += 2 + seglen
        return None

    def _decode_scan(d, pos, w, h, scan, qts, dc_tabs, ac_tabs, restart):
        if not scan or w == 0 or h == 0 or w * h > 1 << 22:
            return None
        hmax = max(c["h"] for c in scan)
        vmax = max(c["v"] for c in scan)
        if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
            return None
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        # per-component planes at component resolution (numpy: blocks
        # land as 8×8 slice stores; chroma upsampled vectorized below)
        planes = [
            np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.uint8)
            for c in scan
        ]
        # --- entropy decode with an INLINED bit reader (r4) -------------
        # The r3 _BitReader/_decode_huff method-call structure spent
        # most of the decode in Python call overhead (~150k calls per
        # 64×64 image); here the accumulator rides in locals, the 9-bit
        # Huffman LUT resolves common symbols with one index, and the
        # rare paths (refill at marker boundaries, >9-bit codes,
        # bit-exhaustion 0-padding) live in closures with IDENTICAL
        # semantics to the r3 reader.  Coefficient blocks are collected
        # and IDCT'd in ONE batched matmul at the end.
        lend = len(d)
        acc = 0
        nbits = 0
        bpos = pos
        LB = _LUT_BITS
        LBMASK = (1 << LB) - 1

        def _fill_bits():
            nonlocal acc, nbits, bpos
            while nbits <= 24:
                if bpos >= lend:
                    acc = (acc << 8) | 0xFF  # pad past EOI
                    nbits += 8
                    continue
                b = d[bpos]
                if b == 0xFF:
                    nxt = d[bpos + 1] if bpos + 1 < lend else 0xD9
                    if nxt == 0x00:
                        bpos += 2
                    elif 0xD0 <= nxt <= 0xD7:
                        break  # restart marker: stop filling
                    else:
                        break  # EOI / other marker
                else:
                    bpos += 1
                acc = (acc << 8) | b
                nbits += 8

        def _slow_bits(k):
            # bit-at-a-time with 0-padding once truly exhausted —
            # byte-for-byte the r3 read_bit loop
            nonlocal acc, nbits
            v = 0
            for _ in range(k):
                if nbits == 0:
                    _fill_bits()
                    if nbits == 0:
                        v <<= 1
                        continue
                nbits -= 1
                v = (v << 1) | ((acc >> nbits) & 1)
            return v

        def _slow_huff(lut, long_tab):
            nonlocal acc, nbits
            code = 0
            for length in range(1, 17):
                if nbits == 0:
                    _fill_bits()
                bit = 0
                if nbits:
                    nbits -= 1
                    bit = (acc >> nbits) & 1
                code = (code << 1) | bit
                if length <= LB:
                    hit = lut[code << (LB - length)]
                    if hit is not None and hit[1] == length:
                        return hit[0]
                else:
                    sym = long_tab.get((length, code))
                    if sym is not None:
                        return sym
            return None

        comp_dc = [dc_tabs[c["dc"]] for c in scan]
        comp_ac = [ac_tabs[c["ac"]] for c in scan]
        comp_qt = [qts[c["tq"]] for c in scan]
        preds = [0] * len(scan)
        n_mcu = 0
        blk_coefs = []  # natural-order 64-lists, one per decoded block
        blk_pos = []  # (ci, oy, ox)
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and n_mcu and n_mcu % restart == 0:
                    acc = 0
                    nbits = 0
                    while bpos + 1 < lend:  # consume the RSTn marker
                        if d[bpos] == 0xFF and 0xD0 <= d[bpos + 1] <= 0xD7:
                            bpos += 2
                            break
                        bpos += 1
                    preds = [0] * len(scan)
                n_mcu += 1
                for ci, c in enumerate(scan):
                    dc_lut, dc_long = comp_dc[ci]
                    ac_lut, ac_long = comp_ac[ci]
                    qt = comp_qt[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coefs = [0] * 64
                            # DC symbol
                            if nbits < LB:
                                _fill_bits()
                            sym = None
                            if nbits >= LB:
                                hit = dc_lut[(acc >> (nbits - LB)) & LBMASK]
                                if hit is not None:
                                    sym = hit[0]
                                    nbits -= hit[1]
                            if sym is None:
                                sym = _slow_huff(dc_lut, dc_long)
                                if sym is None:
                                    return None
                            if sym:
                                if nbits < sym:
                                    _fill_bits()
                                if nbits >= sym:
                                    nbits -= sym
                                    bits = (acc >> nbits) & ((1 << sym) - 1)
                                else:
                                    bits = _slow_bits(sym)
                                diff = (
                                    bits
                                    if bits >> (sym - 1)
                                    else bits - (1 << sym) + 1
                                )
                                preds[ci] += diff
                            coefs[0] = preds[ci] * qt[0]
                            k = 1
                            while k < 64:
                                # AC run/size symbol
                                if nbits < LB:
                                    _fill_bits()
                                rs = None
                                if nbits >= LB:
                                    hit = ac_lut[(acc >> (nbits - LB)) & LBMASK]
                                    if hit is not None:
                                        rs = hit[0]
                                        nbits -= hit[1]
                                if rs is None:
                                    rs = _slow_huff(ac_lut, ac_long)
                                    if rs is None:
                                        return None
                                if rs == 0x00:
                                    break
                                if rs == 0xF0:
                                    k += 16
                                    continue
                                k += rs >> 4
                                size = rs & 0xF
                                if k > 63:
                                    break
                                if nbits < size:
                                    _fill_bits()
                                if nbits >= size:
                                    nbits -= size
                                    bits = (acc >> nbits) & ((1 << size) - 1)
                                else:
                                    bits = _slow_bits(size)
                                if size and not bits >> (size - 1):
                                    bits = bits - (1 << size) + 1
                                zk = ZIGZAG[k]
                                coefs[zk] = bits * qt[zk]
                                k += 1
                            blk_coefs.append(coefs)
                            blk_pos.append(
                                (
                                    ci,
                                    (my * c["v"] + by) * 8,
                                    (mx * c["h"] + bx) * 8,
                                )
                            )
        # batched IDCT: one (Aᵀ @ cf @ A)/4 over every block, then the
        # r3 scalar rounding (int(x+128.5) truncates; trunc == floor
        # for the non-negatives that survive the clamp)
        cf = np.asarray(blk_coefs, dtype=np.float64).reshape(-1, 8, 8)
        px_all = np.clip(
            np.trunc(A_DCT.T @ cf @ A_DCT / 4.0 + 128.5), 0, 255
        ).astype(np.uint8)
        for i, (ci, oy, ox) in enumerate(blk_pos):
            planes[ci][oy : oy + 8, ox : ox + 8] = px_all[i]
        # assemble output (vectorized: nearest-neighbor chroma upsample
        # via integer index arrays, then one float64 YCbCr->RGB pass —
        # the same expressions/order as the r3 scalar loop, so the
        # float results and trunc-then-clamp rounding match exactly)
        if len(scan) == 1:
            return w, h, 1, planes[0][:h, :w].tobytes()
        ys = np.arange(h)
        xs = np.arange(w)

        def _up(plane, c):
            return plane[
                np.ix_(ys * c["v"] // vmax, xs * c["h"] // hmax)
            ].astype(np.float64)

        Y = _up(planes[0], scan[0])
        cb = _up(planes[1], scan[1]) - 128.0
        cr = _up(planes[2], scan[2]) - 128.0
        r = Y + 1.402 * cr + 0.5
        g = Y - 0.344136 * cb - 0.714136 * cr + 0.5
        b = Y + 1.772 * cb + 0.5
        rgb = np.clip(
            np.trunc(np.stack([r, g, b], axis=-1)), 0, 255
        ).astype(np.uint8)
        return w, h, 3, rgb.tobytes()

    return SimpleNamespace(
        jpeg_encode=jpeg_encode,
        jpeg_decode=jpeg_decode,
    )
