"""Multimodal column plumbing (north-star extension): image/audio/video
as opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` stages.

The Spark-side architecture here is real and tested — schema contract,
batch iteration, partition sizing, UDF signatures. The decode itself
dispatches on magic bytes: recognized image formats take the REAL
spec-based decoder in ``imagecodec`` (full PNG pixel decode/encode with
stdlib zlib; JPEG/GIF/BMP header parse — no media libs ship in this
environment), and unrecognized payloads fall back to a deterministic
stub (fake dimensions derived from byte length) so text stand-ins stay
reproducible. Audio/video decode would swap torchaudio/pyav into the
same contract.

Scale notes: binary payloads ride the columnar format (parquet/Delta
handle multi-MB binary cells; at 100 TB prefer pointer+object-store for
>10 MB blobs). ``mapInPandas`` streams Arrow batches, so executor memory
is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` × average
blob size — size those together.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType()),
                    T.StructField("declared_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
    ]
)


def as_media_table(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into the media-column shape (text bytes
    stand in for image payloads — the schema/partitioning contract is
    what's under test)."""
    return docs.select(
        F.col("doc_id"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("image/fake").alias("media_type"),
        F.struct(
            F.col("source").alias("source"),
            F.col("n_chars").cast("long").alias("declared_bytes"),
        ).alias("meta"),
    )


def _decode_by_value(codec=None):
    """Decode dispatcher, built for by-value pickling — the single
    source of the decode logic. Pass an existing ``build_codec()``
    bundle to share it (avoids pickling two codec copies into closures
    that also need the pixel functions).

    Recognized image bytes (PNG/JPEG/GIF/BMP magic) are parsed by the
    real spec-based codec; anything else gets deterministic fake
    dimensions derived from the byte length (reproducible, and what the
    ``q42`` oracle expresses in SQL for text stand-in payloads).

    Every mapInPandas closure binds the returned NESTED function instead
    of a module global: a module-global reference is pickled by
    *reference*, so workers would need ``mtg_bulk_database_spark``
    importable on their own path — true only when the driver happens to
    run from the repo root. The nested copy closes over ``build_codec``'s
    self-contained functions and is pickled by value, making the UDFs
    self-contained under any launcher.
    """
    from .imagecodec import build_codec

    decode_header = (codec or build_codec()).decode_header

    def decode(payload: bytes) -> tuple[int, int, int]:
        real = decode_header(payload)
        if real is not None:
            return real
        n = len(payload)
        return (n % 1024 + 1, n % 768 + 1, 3)

    return decode


#: module-level alias for tests/interactive use — same object, no drift.
_fake_decode = _decode_by_value()


def decode_images(media: DataFrame) -> DataFrame:
    """Arrow-batched decode stage: mapInPandas streams record batches
    through the format-dispatching decoder (real header parse for
    PNG/JPEG/GIF/BMP, deterministic fallback otherwise); output schema is
    the typed feature contract downstream stages rely on."""
    import pandas as pd

    fake_decode = _decode_by_value()

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL content decodes to NULL features (the SQL twin's
            # octet_length(NULL)/NULL-arithmetic propagation), via
            # pandas nullable dtypes so Arrow ships real nulls back.
            dims = [
                (None, None, None) if b is None else fake_decode(bytes(b))
                for b in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "content_bytes": pd.Series(
                        [None if b is None else len(b) for b in pdf["content"]],
                        dtype="Int64",
                    ),
                    "width": pd.Series([d[0] for d in dims], dtype="Int32"),
                    "height": pd.Series([d[1] for d in dims], dtype="Int32"),
                    "n_channels": pd.Series([d[2] for d in dims], dtype="Int32"),
                }
            )

    return media.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Arrow-batched resize stage.

    Decodable PNGs take the REAL path: pixel decode → nearest-neighbor
    resample (numpy, vectorized) → PNG re-encode. Other payloads keep the
    deterministic stub (dimension math from the dispatching decoder,
    byte-truncation "re-encode") so the stage stays total and
    reproducible over non-image stand-ins.
    """
    import pandas as pd

    from .imagecodec import build_codec
    from .jpegcodec import build_jpeg_codec

    codec = build_codec()
    fake_decode = _decode_by_value(codec)
    png_decode, png_encode, resize_nearest = (
        codec.png_decode,
        codec.png_encode,
        codec.resize_nearest,
    )
    jpeg_decode = build_jpeg_codec().jpeg_decode

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(payload)
                decoded = png_decode(b)
                if decoded is None and b[:3] == b"\xff\xd8\xff":
                    # real JPEG pixel path; output stays PNG (lossless
                    # re-encode of the resampled pixels)
                    decoded = jpeg_decode(b)
                if decoded is not None:
                    w, h, ch, px = decoded
                    scale = min(max_side / max(w, h), 1.0)
                    nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
                    out = png_encode(nw, nh, ch, resize_nearest(w, h, ch, px, nw, nh))
                    rows.append((int(doc_id), nw, nh, out))
                    continue
                w, h, _ = fake_decode(b)
                scale = min(max_side / max(w, h), 1.0)
                nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
                # stub re-encode: truncate payload proportionally to the
                # pixel reduction so byte sizes behave like a real resize;
                # an empty payload stays empty (slicing can't invent bytes)
                n_bytes = max(int(len(b) * scale * scale), 1)
                rows.append((int(doc_id), nw, nh, b[:n_bytes]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "content"]
            ).astype({"doc_id": "int64", "width": "int32", "height": "int32"})

    return media.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling stage for video-shaped payloads: one input row →
    n output rows (byte-range slices stand in for decoded frames —
    production swaps in pyav keyframe extraction; the fan-out shape and
    schema are the tested contract)."""
    import pandas as pd

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(payload)
                step = max(len(b) // n_frames, 1)
                # contract: ALWAYS n_frames rows per doc — a short/empty
                # payload yields empty frame slices rather than silently
                # dropping the document from the output
                for i in range(n_frames):
                    rows.append((int(doc_id), i, b[i * step : i * step + step]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame"]
            ).astype({"doc_id": "int64", "frame_idx": "int32"})

    return media.mapInPandas(frames, schema=FRAMES_SCHEMA)


VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("delay_cs", T.IntegerType()),
        T.StructField("mean_intensity", T.IntegerType()),
        T.StructField("decoded", T.BooleanType()),
    ]
)


def sample_gif_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video-modality frame sampling with a REAL container decode:
    animated GIFs (the one video-ish format expressible stdlib-only)
    are walked frame-by-frame — block structure, graphic-control
    delays, full LZW pixel decode (``imagecodec.gif_frames``) — and
    every ``every_n``-th frame is emitted with its decoded mean
    intensity, the smallest feature that PROVES pixels were actually
    reconstructed. Production swaps pyav keyframe extraction into this
    exact contract (same fan-out, same schema, same batch shape).

    Non-GIF payloads emit one fallback row (``decoded=false``) with the
    dispatching decoder's deterministic dimensions and a byte-mean
    intensity, so the stage is total and never drops a document.

    Scale: map-only Arrow fan-out; output rows ≈ input rows ×
    frames/every_n. No shuffle — downstream aggregation decides its own
    partitioning.
    """
    import pandas as pd

    from .imagecodec import build_codec

    codec = build_codec()
    gif_frames = codec.gif_frames
    fake_decode = _decode_by_value(codec)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(payload)
                parsed = gif_frames(b)
                if parsed is not None:
                    _, _, frames = parsed
                    n = len(frames)
                    for idx in range(0, n, every_n):
                        left, top, fw, fh, delay, px = frames[idx]
                        mean = sum(px) // len(px) if px else 0
                        rows.append(
                            (int(doc_id), idx, n, fw, fh, delay,
                             mean, px is not None)
                        )
                    continue
                w, h, _ = fake_decode(b)
                mean = sum(b) // len(b) if b else 0
                rows.append((int(doc_id), 0, 1, w, h, 0, mean, False))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "n_frames", "width", "height",
                    "delay_cs", "mean_intensity", "decoded",
                ],
            ).astype(
                {
                    "doc_id": "int64", "frame_idx": "int32",
                    "n_frames": "int32", "width": "int32",
                    "height": "int32", "delay_cs": "int32",
                    "mean_intensity": "int32", "decoded": "bool",
                }
            )

    return media.mapInPandas(sample, schema=VIDEO_FRAMES_SCHEMA)


def synthetic_gif_corpus(
    docs: DataFrame, n_frames: int = 4, size: int = 8
) -> DataFrame:
    """Deterministic animated-GIF corpus from the documents table: per
    doc, ``n_frames`` frames of ``size``×``size`` md5-stream pixels,
    encoded by the REAL GIF89a encoder (LZW and all). This is how the
    registered video query exercises the container walk + LZW decode on
    executors without any media library — the payloads are genuine GIF
    bytes any external viewer could open. Pure function of doc_id, so
    every engine/run builds the identical corpus."""
    import hashlib

    import pandas as pd

    from .imagecodec import build_codec

    gif_encode = build_codec().gif_encode_animation
    npx = size * size

    def pixels(seed: str) -> bytes:
        out = b""
        ctr = 0
        while len(out) < npx:
            out += hashlib.md5(f"{seed}:{ctr}".encode()).digest()
            ctr += 1
        return out[:npx]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, source in zip(pdf["doc_id"], pdf["source"]):
                frames = [
                    pixels(f"gif:{doc_id}:{i}") for i in range(n_frames)
                ]
                payload = gif_encode(
                    size, size, frames, [10 * (i + 1) for i in range(n_frames)]
                )
                rows.append(
                    (int(doc_id), payload, "image/gif", (source, len(payload)))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "content", "media_type", "meta"]
            )

    return docs.select("doc_id", "source").mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


def synthetic_png_corpus(
    docs: DataFrame, group_mod: int = 100, size: int = 32
) -> DataFrame:
    """Deterministic PNG corpus with PLANTED near-duplicate clusters:
    pixels derive from the doc's group (``doc_id % group_mod``), then
    one group-relative pixel gets a small per-doc perturbation — so
    same-group images are perceptual near-dups (Hamming ≈ 0-1 after the
    8×8 thumbnail) and cross-group images are unrelated md5 noise
    (Hamming ≈ 32). Real spec-encoded PNGs, pure function of doc_id."""
    import hashlib

    import pandas as pd

    from .imagecodec import build_codec

    png_encode = build_codec().png_encode
    npx = size * size

    def base_pixels(group: int) -> bytearray:
        out = b""
        ctr = 0
        while len(out) < npx:
            out += hashlib.md5(f"png:{group}:{ctr}".encode()).digest()
            ctr += 1
        return bytearray(out[:npx])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-TASK memo of the group base pixels (r12, guide §4.5
        # heavyweight-init amortization): base_pixels(group) is a pure
        # function of doc_id % group_mod, but the md5 stream (64 digest
        # calls per image) was recomputed for EVERY doc — ~group-size×
        # redundant hashing per task.  The memo lives inside the
        # closure, holds ≤ group_mod entries, and is rebuilt on every
        # task/run — in-process compute reuse, not cross-run caching.
        base_cache: dict[int, bytes] = {}
        for pdf in batches:
            rows = []
            for doc_id, source in zip(pdf["doc_id"], pdf["source"]):
                group = int(doc_id) % group_mod
                base = base_cache.get(group)
                if base is None:
                    base = base_cache[group] = bytes(base_pixels(group))
                px = bytearray(base)
                pos = (int(doc_id) * 7919) % npx
                px[pos] = (px[pos] + 16) & 0xFF
                payload = png_encode(size, size, 1, bytes(px))
                rows.append(
                    (int(doc_id), payload, "image/png", (source, len(payload)))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "content", "media_type", "meta"]
            )

    return docs.select("doc_id", "source").mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


def sample_mjpeg_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """TRUE-video frame sampling: AVI/MJPEG container walk
    (``videocodec.avi_parse``) + per-sampled-frame baseline JPEG pixel
    decode (``jpegcodec``). Same output contract as the GIF sampler
    (VIDEO_FRAMES_SCHEMA), and the reason sampling exists is visible in
    the plan: only every ``every_n``-th frame's JPEG bytes are entropy-
    decoded — the container walk itself never touches pixel data.

    delay_cs comes from the container's microseconds-per-frame; the
    decoded mean intensity (integer) is the proof-of-pixels feature,
    exactly as in the GIF path. Non-AVI payloads fall back to one
    ``decoded=false`` row so the stage stays total."""
    import pandas as pd

    from .jpegcodec import build_jpeg_codec
    from .videocodec import build_video_codec

    avi_parse = build_video_codec().avi_parse
    jpeg_decode = build_jpeg_codec().jpeg_decode
    fake_decode = _decode_by_value()

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(payload)
                parsed = avi_parse(b)
                if parsed is not None:
                    w, h, n_decl, uspf, frames = parsed
                    n = len(frames)
                    delay_cs = uspf // 10_000
                    for idx in range(0, n, every_n):
                        dec = jpeg_decode(frames[idx])
                        if dec is not None:
                            fw, fh, ch, px = dec
                            mean = sum(px) // len(px) if px else 0
                            rows.append(
                                (int(doc_id), idx, n, fw, fh,
                                 delay_cs, mean, True)
                            )
                        else:
                            rows.append(
                                (int(doc_id), idx, n, w, h,
                                 delay_cs, 0, False)
                            )
                    continue
                w, h, _ = fake_decode(b)
                mean = sum(b) // len(b) if b else 0
                rows.append((int(doc_id), 0, 1, w, h, 0, mean, False))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "n_frames", "width", "height",
                    "delay_cs", "mean_intensity", "decoded",
                ],
            ).astype(
                {
                    "doc_id": "int64", "frame_idx": "int32",
                    "n_frames": "int32", "width": "int32",
                    "height": "int32", "delay_cs": "int32",
                    "mean_intensity": "int32", "decoded": "bool",
                }
            )

    return media.mapInPandas(sample, schema=VIDEO_FRAMES_SCHEMA)


def synthetic_avi_corpus(
    docs: DataFrame, n_frames: int = 6, size: int = 16, fps: int = 10
) -> DataFrame:
    """Deterministic AVI/MJPEG corpus: per doc, ``n_frames`` genuine
    baseline-JPEG frames (DCT-aligned 8×8 block patterns from md5, so
    frames survive quantization near-exactly) in a spec-conforming AVI
    any external player could open. Pure function of doc_id."""
    import hashlib

    import pandas as pd

    from .jpegcodec import build_jpeg_codec
    from .videocodec import build_video_codec

    jpeg_encode = build_jpeg_codec().jpeg_encode
    avi_encode = build_video_codec().avi_encode_mjpeg
    grid = size // 8

    def frame_pixels(doc_id: int, idx: int) -> bytes:
        seed = hashlib.md5(f"avi:{doc_id}:{idx}".encode()).digest()
        return bytes(
            # even levels only: exactly representable under the DC
            # quantizer, so executor means are analytically predictable
            (seed[((i // size) // 8) * grid + ((i % size) // 8)]) & 0xFE
            for i in range(size * size)
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, source in zip(pdf["doc_id"], pdf["source"]):
                frames = [
                    jpeg_encode(size, size, 1, frame_pixels(int(doc_id), i))
                    for i in range(n_frames)
                ]
                payload = avi_encode(size, size, frames, fps=fps)
                rows.append(
                    (int(doc_id), payload, "video/x-msvideo",
                     (source, len(payload)))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "content", "media_type", "meta"]
            )

    return docs.select("doc_id", "source").mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


def synthetic_mixed_corpus(
    docs: DataFrame, group_mod: int = 50, size: int = 32
) -> DataFrame:
    """PNG/JPEG mixed corpus with CROSS-FORMAT planted near-dups: every
    doc in a group renders the same base image, but even doc_ids encode
    it losslessly (PNG) and odd doc_ids lossily (baseline JPEG). An
    exact byte/content hash can never match across the two encodings of
    the same picture — the perceptual aHash over DECODED pixels is what
    clusters them, which is precisely the property q148 gates."""
    import hashlib

    import pandas as pd

    from .imagecodec import build_codec
    from .jpegcodec import build_jpeg_codec

    png_encode = build_codec().png_encode
    jpeg_encode = build_jpeg_codec().jpeg_encode
    npx = size * size

    def base_pixels(group: int) -> bytes:
        # 8×8-pixel flat blocks from md5 bytes: aligned with JPEG's DCT
        # grid (flat blocks are pure DC → near-exact under quantization)
        # AND distinctive under aHash (each thumbnail cell samples one
        # block) — unlike smooth gradients, whose coarse sign-of-mean
        # bits collide across groups
        seed = hashlib.md5(f"mix:{group}".encode()).digest()
        grid = size // 8
        return bytes(
            seed[((i // size) // 8) * grid + ((i % size) // 8)]
            for i in range(npx)
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-TASK payload memo (r12, guide §4.5): unlike the PNG
        # corpus there is NO per-doc perturbation here — the payload is
        # a pure function of (group, format parity), ≤ 2·group_mod
        # distinct values — yet the full pipeline (md5 pixel stream +
        # PNG zlib or baseline-JPEG DCT/Huffman encode) ran per DOC.
        # The memo is closure-local, bounded, rebuilt per task/run.
        pay_cache: dict[tuple[int, int], tuple[bytes, str]] = {}
        for pdf in batches:
            rows = []
            for doc_id, source in zip(pdf["doc_id"], pdf["source"]):
                d = int(doc_id)
                # alternate format along the group AXIS (doc_id //
                # group_mod), so every group holds both encodings —
                # doc_id % 2 would give whole groups one parity/format
                key = (d % group_mod, (d // group_mod) % 2)
                hit = pay_cache.get(key)
                if hit is None:
                    px = base_pixels(key[0])
                    if key[1] == 0:
                        hit = (png_encode(size, size, 1, px), "image/png")
                    else:
                        hit = (jpeg_encode(size, size, 1, px), "image/jpeg")
                    pay_cache[key] = hit
                payload, mt = hit
                rows.append((d, payload, mt, (source, len(payload))))
            yield pd.DataFrame(
                rows, columns=["doc_id", "content", "media_type", "meta"]
            )

    return docs.select("doc_id", "source").mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ahash", T.LongType()),
        T.StructField("is_image", T.BooleanType()),
    ]
)


def gradient_hash64(thumb) -> int:
    """The repo's 64-bit perceptual hash over an 8×8 grayscale
    thumbnail: bit i = thumb[i] > thumb[(i*37+11) % 64] — pairwise
    comparisons across a fixed far-cell bijection (gcd(37,64)=1), so a
    single changed cell flips ≤2 bits and there is no tie-fragile
    global statistic. See :func:`with_image_ahash` for the full design
    rationale; shared by the image and video hashing paths. Returns a
    signed int64."""
    bits = 0
    for i in range(64):
        if thumb[i] > thumb[(i * 37 + 11) % 64]:
            bits |= 1 << i
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def with_image_ahash(media: DataFrame) -> DataFrame:
    """Perceptual gradient-hash over REAL decoded pixels: PNG (full
    decode), JPEG, BMP, or GIF (first decodable frame) → integer
    grayscale → 8×8 nearest-neighbor thumbnail → 64-bit hash where
    bit i = thumb[i] > thumb[(i*37+11) % 64]. All integer arithmetic
    (comparisons only), so the hash is bit-reproducible across
    executors and against a driver-side reference.

    Why pairwise-comparison bits, not sign-of-mean (aHash): each bit
    depends on exactly TWO cells, never on a global statistic — a
    single changed thumbnail cell participates in exactly 2 comparisons
    (its own bit, plus the one bit whose partner it is, since i↦(i*37+
    11)%64 is a bijection), so single-cell noise flips ≤2 bits
    (property-pinned in tests/test_video_image.py). aHash's ``v >
    mean`` rule is tie-fragile: one nudged pixel can move the global
    mean onto a value many cells tie at and flip them ALL at once
    (observed: 16 bits from a +16 single-pixel nudge), breaking the
    ≤7-Hamming pigeonhole-join contract. Why a FAR permutation rather
    than adjacent-cell dHash: images with locally-flat structure
    (logos, scans, flat color blocks) tie most adjacent pairs, draining
    dHash's entropy to a handful of informative bits and letting
    unrelated images collide at small radii; comparisons across the
    scrambled permutation span distant cells, keeping ~64 informative
    bits on exactly those images. The column keeps its historical name
    ``ahash``.

    Non-decodable payloads get an md5-derived pseudo-hash
    (``is_image=false``): deterministic, but effectively random bits,
    so they never cluster with real images at small Hamming radii.
    """
    import hashlib
    import struct as _struct

    import pandas as pd

    from .imagecodec import build_codec
    from .jpegcodec import build_jpeg_codec

    codec = build_codec()
    png_decode, gif_frames, resize_nearest = (
        codec.png_decode,
        codec.gif_frames,
        codec.resize_nearest,
    )
    jpeg_decode = build_jpeg_codec().jpeg_decode

    def gray_of(payload: bytes):
        decoded = png_decode(payload)
        if decoded is None and payload[:3] == b"\xff\xd8\xff":
            decoded = jpeg_decode(payload)  # real baseline JPEG decode
        if decoded is None and payload[:2] == b"BM":
            decoded = codec.bmp_decode(payload)
        if decoded is not None:
            w, h, ch, px = decoded
            if ch == 1:
                return w, h, px
            gray = bytes(
                (px[i] + px[i + 1] + px[i + 2]) // 3
                if ch >= 3
                else px[i]
                for i in range(0, len(px), ch)
            )
            return w, h, gray
        parsed = gif_frames(payload)
        if parsed is not None:
            for left, top, fw, fh, delay, px in parsed[2]:
                if px is not None:
                    return fw, fh, px
        return None

    def ahash_of(payload: bytes):
        g = gray_of(payload)
        if g is None:
            digest = hashlib.md5(payload).digest()
            (pseudo,) = _struct.unpack(">q", digest[:8])
            return pseudo, False
        w, h, gray = g
        thumb = resize_nearest(w, h, 1, gray, 8, 8)
        return gradient_hash64(thumb), True

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = [ahash_of(bytes(b)) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "ahash": pd.Series(
                        [h for h, _ in hashes], dtype="int64"
                    ),
                    "is_image": pd.Series(
                        [ok for _, ok in hashes], dtype="bool"
                    ),
                }
            )

    return media.mapInPandas(batches, schema=AHASH_SCHEMA)


def image_near_dup_pairs(media: DataFrame, max_hamming: int = 4) -> DataFrame:
    """Near-duplicate IMAGES by perceptual hash: ahash (real pixel
    path above) + the same pigeonhole 8×8-bit band join the text
    SimHash uses — Hamming ≤ 7 guarantees one exact byte-chunk match,
    so candidate generation is an equi-join, never all-pairs. Returns
    (id_a, id_b, hamming)."""
    from .dedup import hamming64_near_pairs

    fp = with_image_ahash(media).localCheckpoint(eager=False)
    return hamming64_near_pairs(fp, "ahash", "doc_id", max_hamming)


def media_metadata(media: DataFrame) -> DataFrame:
    """Pure-columnar metadata pass (no Python): byte sizes + declared
    sizes — the cheap pre-filter before any decode fan-out."""
    return media.select(
        "doc_id",
        F.octet_length("content").alias("content_bytes"),
        F.col("meta.declared_bytes").alias("declared_bytes"),
        "media_type",
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("is_wav", T.BooleanType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Arrow-batched audio feature extraction: real spec-based RIFF/WAVE
    PCM16 parse (``audiocodec.build_audio_codec``) for recognized
    payloads; any other payload is treated as headerless mono PCM16 at
    8 kHz (a deterministic pure function of the bytes, the same
    fallback philosophy as the image decode stage). Features are
    all-integer (isqrt RMS, sign-change count) so executor results are
    bit-reproducible against a driver-side Python reference.

    Scale shape: map-only fan-through — one Python stage streaming
    Arrow batches, no shuffle; at 100 TB this rides the same
    partitioning as the payload scan and the per-batch cost is linear
    in payload bytes."""
    import struct as _struct

    import pandas as pd

    from .audiocodec import build_audio_codec

    codec = build_audio_codec()
    wav_parse, pcm16_features = codec.wav_parse, codec.pcm16_features

    def features(payload: bytes):
        parsed = wav_parse(payload)
        if parsed is not None:
            n_channels, rate, samples = parsed
            return (
                True,
                n_channels,
                rate,
                pcm16_features(samples, rate, n_channels),
            )
        n = len(payload) // 2
        samples = list(_struct.unpack(f"<{n}h", payload[: 2 * n]))
        return (False, 1, 8000, pcm16_features(samples, 8000, 1))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                if payload is None:
                    # NULL payload → NULL features (SQL propagation)
                    rows.append((int(doc_id),) + (None,) * 7)
                    continue
                is_wav, nch, rate, f = features(bytes(payload))
                rows.append(
                    (
                        int(doc_id),
                        is_wav,
                        nch,
                        rate,
                        f["n_samples"],
                        f["duration_ms"],
                        f["rms"],
                        f["zero_crossings"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "is_wav",
                    "n_channels",
                    "sample_rate",
                    "n_samples",
                    "duration_ms",
                    "rms",
                    "zero_crossings",
                ],
            ).astype(
                # pandas NULLABLE dtypes so a None row ships as real
                # nulls through Arrow instead of failing the int cast
                {
                    "doc_id": "int64",
                    "is_wav": "boolean",
                    "n_channels": "Int32",
                    "sample_rate": "Int32",
                    "n_samples": "Int64",
                    "duration_ms": "Int64",
                    "rms": "Int64",
                    "zero_crossings": "Int64",
                }
            )

    return media.mapInPandas(batches, schema=AUDIO_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# Cross-video near-duplicate detection (frame-hash signatures).
# ---------------------------------------------------------------------------

#: frame-hash rows: one per SAMPLED decodable frame of a video payload
VIDEO_FRAME_HASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_hash", T.LongType()),
    ]
)

#: composite frame id = doc_id·_FID_BASE + frame_idx — keeps the
#: pigeonhole join's single orderable id column; frame counts are far
#: below the base by construction (containers cap n_frames well under
#: it), so the encoding is collision-free.
_FID_BASE = 1 << 20


def video_frame_hashes(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Per-sampled-frame perceptual hashes for AVI/MJPEG payloads: the
    container walk touches ONLY every ``every_n``-th frame's JPEG bytes
    (same sampling economics as sample_mjpeg_frames), each decoded
    frame is thumbnailed to 8×8 and hashed with the shared
    :func:`gradient_hash64`. Non-video / non-decodable payloads emit
    no rows — a video signature is the SET of its frame hashes."""
    import pandas as pd

    from .imagecodec import build_codec
    from .jpegcodec import build_jpeg_codec
    from .videocodec import build_video_codec

    avi_parse = build_video_codec().avi_parse
    jpeg_decode = build_jpeg_codec().jpeg_decode
    resize_nearest = build_codec().resize_nearest

    def hashes(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                parsed = avi_parse(bytes(payload))
                if parsed is None:
                    continue
                _w, _h, _n, _uspf, frames = parsed
                for idx in range(0, len(frames), every_n):
                    dec = jpeg_decode(frames[idx])
                    if dec is None:
                        continue
                    fw, fh, ch, px = dec
                    if ch >= 3:
                        px = bytes(
                            (px[i] + px[i + 1] + px[i + 2]) // 3
                            for i in range(0, len(px), ch)
                        )
                    thumb = resize_nearest(fw, fh, 1, px, 8, 8)
                    rows.append(
                        (int(doc_id), idx, gradient_hash64(thumb))
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_hash"]
            ).astype(
                {
                    "doc_id": "int64",
                    "frame_idx": "int32",
                    "frame_hash": "int64",
                }
            )

    return media.mapInPandas(hashes, schema=VIDEO_FRAME_HASH_SCHEMA)


def video_near_dup_pairs(
    media: DataFrame,
    every_n: int = 2,
    max_hamming: int = 3,
    min_match_frac: float = 0.5,
) -> DataFrame:
    """Near-duplicate VIDEOS: two payloads pair when enough of their
    sampled frames match perceptually — the re-encode/trim-robust
    signature (same frames at different fps/container, or a shared
    body with differing intro/outro, still pair; wholly different
    footage cannot).

    Scale shape: frame hashes (Python decode stage, checkpointed once)
    → the SAME pigeonhole 8×8-bit band equi-join the image/SimHash
    paths use, over composite frame ids — candidates are
    hash-bucketed, never all-pairs → per-video-pair aggregation
    counting DISTINCT matched frames on each side → keep pairs where
    both videos match on ≥ ``min_match_frac`` of their sampled frames.
    Returns (id_a, id_b, n_match_a, n_match_b, n_a, n_b, match_frac)
    with match_frac = the smaller side's matched fraction.
    """
    from .dedup import hamming64_near_pairs

    fh = video_frame_hashes(media, every_n).localCheckpoint(eager=False)
    fh = fh.withColumn(
        "fid",
        F.col("doc_id") * F.lit(_FID_BASE) + F.col("frame_idx"),
    )
    sizes = fh.groupBy("doc_id").agg(F.count("*").alias("n_frames"))
    fpairs = hamming64_near_pairs(fh, "frame_hash", "fid", max_hamming)
    vid = lambda c: (F.col(c) / _FID_BASE).cast("long")  # noqa: E731
    cross = (
        fpairs.select(
            vid("id_a").alias("vid_a"),
            vid("id_b").alias("vid_b"),
            F.col("id_a").alias("fid_a"),
            F.col("id_b").alias("fid_b"),
        )
        .filter(F.col("vid_a") != F.col("vid_b"))
        .groupBy("vid_a", "vid_b")
        .agg(
            F.count_distinct("fid_a").alias("n_match_a"),
            F.count_distinct("fid_b").alias("n_match_b"),
        )
    )
    out = (
        cross.join(
            sizes.select(
                F.col("doc_id").alias("vid_a"),
                F.col("n_frames").alias("n_a"),
            ),
            on="vid_a",
        )
        .join(
            sizes.select(
                F.col("doc_id").alias("vid_b"),
                F.col("n_frames").alias("n_b"),
            ),
            on="vid_b",
        )
        .withColumn(
            "match_frac",
            F.least(
                F.col("n_match_a").cast("double") / F.col("n_a"),
                F.col("n_match_b").cast("double") / F.col("n_b"),
            ),
        )
        .filter(F.col("match_frac") >= min_match_frac)
    )
    return out.select(
        F.col("vid_a").alias("id_a"),
        F.col("vid_b").alias("id_b"),
        "n_match_a",
        "n_match_b",
        "n_a",
        "n_b",
        F.round("match_frac", 6).alias("match_frac"),
    )


def synthetic_avi_dup_corpus(
    docs: DataFrame,
    group_mod: int = 25,
    n_shared: int = 4,
    size: int = 16,
    fps: int = 10,
) -> DataFrame:
    """AVI corpus with PLANTED cross-video duplication: all docs in a
    ``doc_id % group_mod`` group share the same ``n_shared`` body
    frames (bitwise — DCT-aligned even-level blocks survive JPEG
    quantization exactly, as in synthetic_avi_corpus), and each doc
    appends ``doc_id % 3`` unique trailer frames — the trimmed-
    intro/outro near-dup case. Pure function of doc_id."""
    import hashlib

    import pandas as pd

    from .jpegcodec import build_jpeg_codec
    from .videocodec import build_video_codec

    jpeg_encode = build_jpeg_codec().jpeg_encode
    avi_encode = build_video_codec().avi_encode_mjpeg
    grid = size // 8

    def pixels(seed_txt: str) -> bytes:
        seed = hashlib.md5(seed_txt.encode()).digest()
        return bytes(
            (seed[((i // size) // 8) * grid + ((i % size) // 8)]) & 0xFE
            for i in range(size * size)
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-TASK memo of the SHARED body frames (r12, guide §4.5):
        # the n_shared group frames are a pure function of the group id
        # but their JPEG encode ran per DOC; the per-doc tail frames
        # still encode individually.  Bounded (≤ group_mod entries),
        # closure-local, rebuilt per task/run.
        body_cache: dict[int, list[bytes]] = {}
        for pdf in batches:
            rows = []
            for doc_id, source in zip(pdf["doc_id"], pdf["source"]):
                d = int(doc_id)
                g = d % group_mod
                body = body_cache.get(g)
                if body is None:
                    body = body_cache[g] = [
                        jpeg_encode(size, size, 1, pixels(f"dup:{g}:{i}"))
                        for i in range(n_shared)
                    ]
                frames = list(body)
                frames += [
                    jpeg_encode(size, size, 1, pixels(f"tail:{d}:{i}"))
                    for i in range(d % 3)
                ]
                payload = avi_encode(size, size, frames, fps=fps)
                rows.append(
                    (d, payload, "video/x-msvideo",
                     (source, len(payload)))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "content", "media_type", "meta"]
            )

    return docs.select("doc_id", "source").mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )
