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

    def _build_decode(bits, values):
        """(length, code) -> symbol."""
        enc = _build_codes(bits, values)
        return {(ln, code): sym for sym, (code, ln) in enc.items()}

    # ---- encoder -----------------------------------------------------------
    def _fdct_quant(block, qt):
        out = [0] * 64
        for v in range(8):
            for u in range(8):
                s = 0.0
                for y in range(8):
                    cyv = COS[y][v]
                    row = block[y]
                    for x in range(8):
                        s += row[x] * COS[x][u] * cyv
                val = s * C[u] * C[v] / 4.0
                q = qt[v * 8 + u]
                out[v * 8 + u] = int(round(val / q))
        return out

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
        # component planes, level-shifted
        planes = []
        if ncomp == 1:
            planes.append(
                [
                    [pixels[(y * w + x)] - 128 for x in range(w)]
                    for y in range(h)
                ]
            )
        else:
            ys, cbs, crs = [], [], []
            for y in range(h):
                ry, rcb, rcr = [], [], []
                for x in range(w):
                    r = pixels[(y * w + x) * 3]
                    g = pixels[(y * w + x) * 3 + 1]
                    b = pixels[(y * w + x) * 3 + 2]
                    yy = 0.299 * r + 0.587 * g + 0.114 * b
                    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
                    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
                    ry.append(yy - 128)
                    rcb.append(cb - 128)
                    rcr.append(cr - 128)
                ys.append(ry)
                cbs.append(rcb)
                crs.append(rcr)
            planes = [ys, cbs, crs]

        # per-component sampling factors + (possibly downsampled) planes
        if ncomp == 3 and subsampling == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
            for ci in (1, 2):
                src = planes[ci]
                cw, chh = (w + 1) // 2, (h + 1) // 2
                ds = []
                for y in range(chh):
                    row = []
                    for x in range(cw):
                        y0, y1 = 2 * y, min(2 * y + 1, h - 1)
                        x0, x1 = 2 * x, min(2 * x + 1, w - 1)
                        row.append(
                            (src[y0][x0] + src[y0][x1] + src[y1][x0]
                             + src[y1][x1]) / 4.0
                        )
                    ds.append(row)
                planes[ci] = ds
        else:
            samp = [(1, 1)] * ncomp
        dims = []
        for ci in range(ncomp):
            dims.append((len(planes[ci][0]), len(planes[ci])))

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
                    cw, chh = dims[ci]
                    plane = planes[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            block = []
                            for yy in range(8):
                                sy = min(
                                    (my * sv + by) * 8 + yy, chh - 1
                                )
                                row = []
                                for xx in range(8):
                                    sx = min(
                                        (mx * sh + bx) * 8 + xx, cw - 1
                                    )
                                    row.append(plane[sy][sx])
                                block.append(row)
                            qt = QT_LUM if ci == 0 else QT_CHR
                            # natural-order coefs; _encode_block zigzags
                            coefs = _fdct_quant(block, qt)
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
    class _BitReader:
        def __init__(self, data, pos):
            self.data = data
            self.pos = pos
            self.acc = 0
            self.n = 0

        def _fill(self):
            d = self.data
            while self.n <= 24:
                if self.pos >= len(d):
                    self.acc = (self.acc << 8) | 0xFF  # pad past EOI
                    self.n += 8
                    continue
                b = d[self.pos]
                if b == 0xFF:
                    nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                    if nxt == 0x00:
                        self.pos += 2
                    elif 0xD0 <= nxt <= 0xD7:
                        break  # restart marker: stop filling
                    else:
                        break  # EOI / other marker
                else:
                    self.pos += 1
                self.acc = (self.acc << 8) | b
                self.n += 8

        def read_bit(self):
            if self.n == 0:
                self._fill()
                if self.n == 0:
                    return 0
            self.n -= 1
            return (self.acc >> self.n) & 1

        def read_bits(self, k):
            v = 0
            for _ in range(k):
                v = (v << 1) | self.read_bit()
            return v

        def sync_restart(self):
            """Consume an RSTn marker at the current byte position."""
            self.acc = 0
            self.n = 0
            d = self.data
            while self.pos + 1 < len(d):
                if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                    self.pos += 2
                    return True
                self.pos += 1
            return False

    def _decode_huff(br, table):
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        return None

    def _extend(bits, size):
        if size == 0:
            return 0
        if bits >> (size - 1):
            return bits
        return bits - (1 << size) + 1

    def _idct(coefs):
        out = [[0.0] * 8 for _ in range(8)]
        for y in range(8):
            for x in range(8):
                s = 0.0
                for v in range(8):
                    cv = C[v] * COS[y][v]
                    base = v * 8
                    for u in range(8):
                        c = coefs[base + u]
                        if c:
                            s += C[u] * c * COS[x][u] * cv
                out[y][x] = s / 4.0
        return out

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
        # per-component full-res planes (filled block by block, chroma
        # at component resolution then upsampled)
        planes = [
            [
                [0] * (mcux * 8 * c["h"])
                for _ in range(mcuy * 8 * c["v"])
            ]
            for c in scan
        ]
        br = _BitReader(d, pos)
        preds = [0] * len(scan)
        n_mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and n_mcu and n_mcu % restart == 0:
                    br.sync_restart()
                    preds = [0] * len(scan)
                n_mcu += 1
                for ci, c in enumerate(scan):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coefs = [0] * 64
                            sym = _decode_huff(br, dc_tabs[c["dc"]])
                            if sym is None:
                                return None
                            diff = _extend(br.read_bits(sym), sym)
                            preds[ci] += diff
                            coefs[0] = preds[ci] * qts[c["tq"]][0]
                            k = 1
                            while k < 64:
                                rs = _decode_huff(br, ac_tabs[c["ac"]])
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
                                val = _extend(br.read_bits(size), size)
                                coefs[ZIGZAG[k]] = (
                                    val * qts[c["tq"]][ZIGZAG[k]]
                                )
                                k += 1
                            px = _idct(coefs)
                            plane = planes[ci]
                            oy = (my * c["v"] + by) * 8
                            ox = (mx * c["h"] + bx) * 8
                            for yy in range(8):
                                row = plane[oy + yy]
                                for xx in range(8):
                                    v = int(px[yy][xx] + 128.5)
                                    row[ox + xx] = (
                                        0 if v < 0 else 255 if v > 255 else v
                                    )
        # assemble output
        if len(scan) == 1:
            plane = planes[0]
            out = bytearray(w * h)
            for y in range(h):
                out[y * w : (y + 1) * w] = bytes(plane[y][:w])
            return w, h, 1, bytes(out)
        out = bytearray(w * h * 3)
        c0, c1, c2 = scan[0], scan[1], scan[2]
        p0, p1, p2 = planes
        for y in range(h):
            y1 = y * c1["v"] // vmax
            y2 = y * c2["v"] // vmax
            row0 = p0[y * c0["v"] // vmax]
            row1 = p1[y1]
            row2 = p2[y2]
            base = y * w * 3
            for x in range(w):
                Y = row0[x * c0["h"] // hmax]
                cb = row1[x * c1["h"] // hmax] - 128
                cr = row2[x * c2["h"] // hmax] - 128
                r = int(Y + 1.402 * cr + 0.5)
                g = int(Y - 0.344136 * cb - 0.714136 * cr + 0.5)
                b = int(Y + 1.772 * cb + 0.5)
                out[base + x * 3] = 0 if r < 0 else 255 if r > 255 else r
                out[base + x * 3 + 1] = 0 if g < 0 else 255 if g > 255 else g
                out[base + x * 3 + 2] = 0 if b < 0 else 255 if b > 255 else b
        return w, h, 3, bytes(out)

    return SimpleNamespace(
        jpeg_encode=jpeg_encode,
        jpeg_decode=jpeg_decode,
    )
