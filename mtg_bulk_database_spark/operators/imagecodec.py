"""Dependency-free image codec used by the multimodal decode stages.

No media libraries ship in this environment, so the "real decode" branch
is implemented from the published file-format specs with stdlib only
(``zlib`` + ``struct``):

- **PNG**: full pixel decode/encode — 8-bit depth, color types
  0/2/3/4/6, non-interlaced (Adam7 and 16-bit fall back to header-only).
- **GIF**: full animation support — real variable-width LZW
  encode/decode (CLEAR/EOI, 4096-entry dictionary reset), frame walk
  with graphic-control delays, grayscale-palette animation encoder
  (the video-modality container).
- **JPEG**: header parse here; FULL baseline pixel decode/encode lives
  in the sibling ``jpegcodec`` module (Huffman + DCT, 4:4:4/4:2:0,
  restart markers).
- **BMP**: full uncompressed 8/24/32-bit decode + 8/24-bit encode.
- anything else: the caller falls back to the deterministic stub.

Everything is built inside :func:`build_codec` so the returned functions
close over each other instead of referencing module globals — cloudpickle
then serializes them **by value**, keeping the mapInPandas closures
self-contained under any launcher (see ``multimodal._decode_by_value``).
"""

from __future__ import annotations


def build_codec():
    """Return a self-contained namespace of pure-Python image functions:
    ``sniff``, ``decode_header``, ``png_decode``, ``png_encode``,
    ``resize_nearest``. All inner functions reference only each other and
    stdlib imports, so the whole bundle pickles by value."""
    import struct
    import zlib
    from types import SimpleNamespace

    PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
    # PNG color type -> samples per pixel (palette counts as 1 pre-expansion)
    PNG_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

    def sniff(payload: bytes) -> str | None:
        if payload[:8] == PNG_MAGIC:
            return "png"
        if payload[:3] == b"\xff\xd8\xff":
            return "jpeg"
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return "gif"
        if payload[:2] == b"BM" and len(payload) >= 30:
            return "bmp"
        return None

    # -- header-only parsers ------------------------------------------------
    def _png_ihdr(b: bytes):
        # magic(8) len(4) 'IHDR'(4) w(4) h(4) depth(1) color(1) ...
        if b[12:16] != b"IHDR" or len(b) < 26:
            return None
        w, h = struct.unpack(">II", b[16:24])
        depth, color = b[24], b[25]
        if color not in PNG_SAMPLES:
            return None
        channels = 3 if color == 3 else PNG_SAMPLES[color]
        return w, h, depth, color, channels

    def _jpeg_dims(b: bytes):
        # walk markers to the first SOFn (C0-CF minus C4/C8/CC)
        i, n = 2, len(b)
        while i + 9 < n:
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                ncomp = b[i + 9]
                if w == 0 or h == 0 or ncomp not in (1, 3, 4):
                    return None
                return w, h, ncomp
            i += 2 + seglen
        return None

    def _gif_dims(b: bytes):
        w, h = struct.unpack("<HH", b[6:10])
        if w == 0 or h == 0:
            return None
        return w, h, 3

    def _bmp_dims(b: bytes):
        # plausibility-check the header: a text payload that merely
        # starts with 'BM' must not be mistaken for a bitmap (the
        # decode fallback contract depends on rejecting it)
        planes = struct.unpack("<H", b[26:28])[0]
        bpp = struct.unpack("<H", b[28:30])[0]
        if planes != 1 or bpp not in (1, 4, 8, 16, 24, 32):
            return None
        w, h = struct.unpack("<ii", b[18:26])
        if not (0 < w <= 1 << 16 and 0 < abs(h) <= 1 << 16):
            return None
        channels = {8: 1, 24: 3, 32: 4}.get(bpp, 3)
        return w, abs(h), channels

    def decode_header(payload: bytes):
        """(width, height, n_channels) for a recognized format, else None.

        Headers are plausibility-checked (nonzero bounded dims, BMP
        planes/bpp, JPEG component count) so text that merely starts
        with a magic-like prefix ('BM...', 'GIF89a...') almost always
        falls through to None — callers rely on that to route non-image
        payloads to the deterministic fallback. Residual risk: a text
        payload crafted to carry a fully plausible binary header would
        still be treated as an image; binary-magic formats (PNG/JPEG)
        can't collide with text at all.
        """
        fmt = sniff(payload)
        try:
            if fmt == "png":
                info = _png_ihdr(payload)
                return info and (info[0], info[1], info[4])
            if fmt == "jpeg":
                return _jpeg_dims(payload)
            if fmt == "gif":
                return _gif_dims(payload)
            if fmt == "bmp":
                return _bmp_dims(payload)
        except (struct.error, IndexError):
            return None
        return None

    # -- full PNG pixel decode ---------------------------------------------
    def _paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    def png_decode(payload: bytes):
        """Decode an 8-bit non-interlaced PNG to raw pixels.

        Returns ``(width, height, n_channels, pixel_bytes)`` with palette
        images expanded to RGB, or ``None`` for unsupported variants
        (16-bit, Adam7 interlace, malformed streams).
        """
        if len(payload) < 29:  # magic + full IHDR incl. interlace byte
            return None
        info = _png_ihdr(payload)
        if info is None:
            return None
        w, h, depth, color, _ = info
        interlace = payload[28]
        if depth != 8 or interlace != 0 or w == 0 or h == 0:
            return None
        samples = PNG_SAMPLES[color]
        # walk chunks
        idat, plte = [], None
        i = 8
        try:
            while i + 8 <= len(payload):
                (clen,) = struct.unpack(">I", payload[i : i + 4])
                ctype = payload[i + 4 : i + 8]
                data = payload[i + 8 : i + 8 + clen]
                if ctype == b"IDAT":
                    idat.append(data)
                elif ctype == b"PLTE":
                    plte = data
                elif ctype == b"IEND":
                    break
                i += 12 + clen  # len + type + data + crc
            raw = zlib.decompress(b"".join(idat))
        except (zlib.error, struct.error):
            return None
        stride = w * samples
        if len(raw) < h * (1 + stride):
            return None
        # Vectorized unfilter (r12, guide §4.2): the per-byte Python
        # loops ran h × stride interpreted iterations per image even
        # when every scanline used filter 0 (all this repo's encoders
        # emit filter 0 — the loop did nothing but copy).  numpy uint8
        # addition wraps mod 256, identical to the `& 0xFF` the scalar
        # loop applied; Sub is a per-residue-class prefix sum (addition
        # mod 256 is associative), Up adds the reconstructed previous
        # row.  Average/Paeth keep the exact scalar per-row loop (a
        # left-to-right data dependence with a nonlinear mix — and
        # unreachable from this repo's own encoders).  Byte-for-byte
        # identical outputs for every input (pinned by the round-trip
        # suite in tests/test_video_image.py).
        import numpy as np

        sl = np.frombuffer(
            raw[: h * (1 + stride)], dtype=np.uint8
        ).reshape(h, 1 + stride)
        ftypes = sl[:, 0]
        if ftypes.max(initial=0) > 4:
            return None
        lines = sl[:, 1:]
        if not ftypes.any():  # every scanline filter 0: raw copy
            outbytes = lines.tobytes()
        else:
            outa = np.empty((h, stride), dtype=np.uint8)
            prev_row = np.zeros(stride, dtype=np.uint8)
            for y in range(h):
                ftype = ftypes[y]
                if ftype == 0:
                    row = lines[y]
                elif ftype == 1:  # Sub: prefix sum per residue class
                    row = lines[y].reshape(-1, samples)
                    row = (
                        np.cumsum(row, axis=0, dtype=np.int64) & 0xFF
                    ).astype(np.uint8).reshape(-1)
                elif ftype == 2:  # Up
                    row = lines[y] + prev_row  # uint8 add ≡ & 0xFF
                else:  # Average / Paeth: exact scalar recurrence
                    line = bytearray(lines[y].tobytes())
                    prev = prev_row
                    if ftype == 3:
                        for x in range(stride):
                            left = line[x - samples] if x >= samples else 0
                            line[x] = (
                                line[x] + ((left + int(prev[x])) >> 1)
                            ) & 0xFF
                    else:
                        for x in range(stride):
                            left = line[x - samples] if x >= samples else 0
                            ul = int(prev[x - samples]) if x >= samples else 0
                            line[x] = (
                                line[x] + _paeth(left, int(prev[x]), ul)
                            ) & 0xFF
                    row = np.frombuffer(bytes(line), dtype=np.uint8)
                outa[y] = row
                prev_row = outa[y]
            outbytes = outa.tobytes()
        if color == 3:  # palette -> RGB (vectorized gather, same bytes)
            idx = np.frombuffer(outbytes, dtype=np.uint8)
            if plte is None or int(idx.max(initial=0)) * 3 + 3 > len(plte):
                return None  # palette index out of range → malformed
            pal = np.frombuffer(plte, dtype=np.uint8)
            pal = pal[: (len(plte) // 3) * 3].reshape(-1, 3)
            return w, h, 3, pal[idx].tobytes()
        return w, h, samples, outbytes

    # -- PNG encode (filter 0, one IDAT) ------------------------------------
    def _chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    def png_encode(w: int, h: int, channels: int, pixels: bytes) -> bytes:
        color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        stride = w * channels
        scanlines = b"".join(
            b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(h)
        )
        idat = zlib.compress(scanlines, 6)
        return (
            PNG_MAGIC
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b"")
        )

    # -- GIF: real LZW codec + animation frame walk --------------------------
    # (GIF89a per the published spec: logical screen descriptor, graphic
    # control extensions, image descriptors, variable-width LZW with
    # CLEAR/EOI codes and 4096-entry dictionary reset.)

    def _lzw_encode(min_code_size: int, data: bytes) -> bytes:
        clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
        table = {bytes([i]): i for i in range(1 << min_code_size)}
        next_code = eoi + 1
        width = min_code_size + 1
        out = bytearray()
        acc = n_bits = 0

        def emit(code: int):
            nonlocal acc, n_bits
            acc |= code << n_bits
            n_bits += width
            while n_bits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                n_bits -= 8

        emit(clear)
        buf = b""
        for byte in data:
            nxt = buf + bytes([byte])
            if nxt in table:
                buf = nxt
                continue
            emit(table[buf])
            table[nxt] = next_code
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
            elif next_code >= 4096:
                emit(clear)
                table = {bytes([i]): i for i in range(1 << min_code_size)}
                next_code = eoi + 1
                width = min_code_size + 1
            buf = bytes([byte])
        if buf:
            emit(table[buf])
        emit(eoi)
        if n_bits:
            out.append(acc & 0xFF)
        return bytes(out)

    def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int):
        clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
        width = min_code_size + 1
        table = [bytes([i]) for i in range(1 << min_code_size)] + [b"", b""]
        out = bytearray()
        acc = n_bits = pos = 0
        prev = None
        while len(out) < n_pixels:
            while n_bits < width:
                if pos >= len(data):
                    return None
                acc |= data[pos] << n_bits
                pos += 1
                n_bits += 8
            code = acc & ((1 << width) - 1)
            acc >>= width
            n_bits -= width
            if code == clear:
                table = table[: eoi + 1]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                break
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
        return bytes(out[:n_pixels]) if len(out) >= n_pixels else None

    def _gray_palette() -> bytes:
        return bytes(v for i in range(256) for v in (i, i, i))

    def gif_encode_animation(
        w: int, h: int, frames: list[bytes], delays_cs: list[int] | None = None
    ) -> bytes:
        """Encode 8-bit (grayscale-palette) frames as an animated GIF89a.
        Each frame is ``w*h`` palette indices; delays are centiseconds."""
        delays = delays_cs or [10] * len(frames)
        out = bytearray(b"GIF89a")
        out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 entries
        out += _gray_palette()
        # Netscape looping extension (standard for animations)
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
        for frame, delay in zip(frames, delays):
            out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay) + b"\x00\x00"
            out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
            out += b"\x08"  # LZW min code size
            comp = _lzw_encode(8, frame)
            for i in range(0, len(comp), 255):
                block = comp[i : i + 255]
                out += bytes([len(block)]) + block
            out += b"\x00"
        out += b"\x3b"
        return bytes(out)

    def gif_frames(payload: bytes):
        """Walk a GIF's block structure; return per-frame records
        ``(left, top, width, height, delay_cs, pixels_or_None)`` with
        pixels as grayscale bytes (palette luminance via integer
        (r+g+b)//3), or ``None`` if the payload is not a plausible GIF.
        Interlaced frames keep their metadata but yield ``pixels=None``.
        """
        if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
            return None
        try:
            w, h, flags = struct.unpack("<HHB", payload[6:11])
            i = 13
            gct = None
            if flags & 0x80:
                size = 3 * (2 << (flags & 7))
                gct = payload[i : i + size]
                i += size
            frames = []
            delay_cs = 0
            while i < len(payload):
                b0 = payload[i]
                if b0 == 0x3B:  # trailer
                    break
                if b0 == 0x21:  # extension
                    label = payload[i + 1]
                    i += 2
                    if label == 0xF9 and payload[i] >= 4:
                        delay_cs = struct.unpack(
                            "<H", payload[i + 2 : i + 4]
                        )[0]
                    while payload[i]:  # data sub-blocks
                        i += 1 + payload[i]
                    i += 1
                elif b0 == 0x2C:  # image descriptor
                    left, top, fw, fh, iflags = struct.unpack(
                        "<HHHHB", payload[i + 1 : i + 10]
                    )
                    i += 10
                    pal = gct
                    if iflags & 0x80:  # local color table
                        size = 3 * (2 << (iflags & 7))
                        pal = payload[i : i + size]
                        i += size
                    min_code = payload[i]
                    i += 1
                    chunks = []
                    while payload[i]:
                        n = payload[i]
                        chunks.append(payload[i + 1 : i + 1 + n])
                        i += 1 + n
                    i += 1
                    pixels = None
                    if not (iflags & 0x40) and pal is not None:  # non-interlaced
                        idx = _lzw_decode(min_code, b"".join(chunks), fw * fh)
                        if idx is not None:
                            pixels = bytes(
                                (pal[j * 3] + pal[j * 3 + 1] + pal[j * 3 + 2]) // 3
                                if j * 3 + 2 < len(pal)
                                else 0
                                for j in idx
                            )
                    frames.append((left, top, fw, fh, delay_cs, pixels))
                    delay_cs = 0
                else:
                    return None  # not a GIF block stream after all
            if not frames:
                return None
            return w, h, frames
        except (struct.error, IndexError):
            return None

    # -- BMP: full uncompressed decode/encode --------------------------------
    def bmp_decode(payload: bytes):
        """Decode an uncompressed 8/24/32-bit BMP to raw pixels
        (grayscale for 8-bit with a grayscale palette, RGB for 24/32 —
        alpha dropped). Returns (w, h, channels, bytes) or None."""
        if payload[:2] != b"BM" or len(payload) < 54:
            return None
        try:
            (data_off,) = struct.unpack("<I", payload[10:14])
            (hdr_size,) = struct.unpack("<I", payload[14:18])
            if hdr_size < 40:
                return None
            w, h = struct.unpack("<ii", payload[18:26])
            planes, bpp = struct.unpack("<HH", payload[26:30])
            (compression,) = struct.unpack("<I", payload[30:34])
            if planes != 1 or compression != 0 or w <= 0 or h == 0:
                return None
            if bpp not in (8, 24, 32):
                return None
            flip = h > 0  # positive height = bottom-up storage
            h = abs(h)
            if w * h > 1 << 22:
                return None
            row_stride = (w * (bpp // 8) + 3) & ~3  # 4-byte aligned
            if data_off + row_stride * h > len(payload):
                return None
            palette = None
            if bpp == 8:
                pal_off = 14 + hdr_size
                palette = payload[pal_off : pal_off + 1024]
            ch = 1 if bpp == 8 else 3
            out = bytearray(w * h * ch)
            for y in range(h):
                src_y = (h - 1 - y) if flip else y
                row = payload[
                    data_off + src_y * row_stride :
                    data_off + src_y * row_stride + row_stride
                ]
                if bpp == 8:
                    for x in range(w):
                        i = row[x] * 4
                        b, g, r = palette[i], palette[i + 1], palette[i + 2]
                        out[y * w + x] = (r + g + b) // 3
                else:
                    step = bpp // 8
                    base = y * w * 3
                    for x in range(w):
                        b, g, r = row[x * step : x * step + 3]
                        out[base + x * 3] = r
                        out[base + x * 3 + 1] = g
                        out[base + x * 3 + 2] = b
            return w, h, ch, bytes(out)
        except (struct.error, IndexError):
            return None

    def bmp_encode(w: int, h: int, channels: int, pixels: bytes) -> bytes:
        """Encode grayscale (8-bit + grayscale palette) or RGB (24-bit)
        pixels as a bottom-up uncompressed BMP."""
        if channels == 1:
            bpp, pal = 8, bytes(
                v for i in range(256) for v in (i, i, i, 0)
            )
        elif channels == 3:
            bpp, pal = 24, b""
        else:
            raise ValueError("bmp_encode: channels must be 1 or 3")
        row_stride = (w * (bpp // 8) + 3) & ~3
        data_off = 14 + 40 + len(pal)
        size = data_off + row_stride * h
        out = bytearray()
        out += b"BM" + struct.pack("<IHHI", size, 0, 0, data_off)
        out += struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, row_stride * h,
            2835, 2835, 256 if channels == 1 else 0, 0,
        )
        out += pal
        pad = b"\x00" * (row_stride - w * (bpp // 8))
        for y in range(h - 1, -1, -1):  # bottom-up
            if channels == 1:
                out += pixels[y * w : (y + 1) * w] + pad
            else:
                row = bytearray()
                for x in range(w):
                    r, g, b = pixels[(y * w + x) * 3 : (y * w + x) * 3 + 3]
                    row += bytes((b, g, r))
                out += row + pad
        return bytes(out)

    # -- resize --------------------------------------------------------------
    def resize_nearest(
        w: int, h: int, channels: int, pixels: bytes, nw: int, nh: int
    ) -> bytes:
        """Nearest-neighbor resample (numpy-vectorized; no sequential deps)."""
        import numpy as np

        arr = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, channels)
        ys = (np.arange(nh) * h) // nh
        xs = (np.arange(nw) * w) // nw
        return arr[ys][:, xs].tobytes()

    return SimpleNamespace(
        sniff=sniff,
        decode_header=decode_header,
        png_decode=png_decode,
        png_encode=png_encode,
        resize_nearest=resize_nearest,
        gif_encode_animation=gif_encode_animation,
        gif_frames=gif_frames,
        bmp_decode=bmp_decode,
        bmp_encode=bmp_encode,
        lzw_encode=_lzw_encode,
        lzw_decode=_lzw_decode,
    )
