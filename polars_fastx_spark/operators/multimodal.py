"""Multimodal columns (SURVEY.md §2.11 L5) — binary media + typed metadata.

Image/audio/video are opaque ``binary`` columns plus a typed metadata
struct. The Spark-side plumbing is real and tested: schemas,
``spark.read.format("binaryFile")`` ingestion, Arrow-batched
``mapInPandas`` transforms with correct batch shapes and partitioning.

The DEFAULT decoder is real for three formats decodable with the
standard library alone — BMP (uncompressed 24/32-bit), PNM (P5/P6
binary gray/RGB), and PNG (8-bit gray/GA/RGB/RGBA, non-interlaced,
via ``zlib``) — emitting shape + per-channel mean/std features. Every
other codec stays an injection point: pass ``decoder=`` (e.g. Pillow's
``Image.open``) and the pipeline shape is unchanged.

Reference parity: the reference is FASTX-only; the multimodal tier is
north-star extension per /root/repo/BASELINE.json:6.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical media-table schema: path + opaque bytes + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("modification_time", LongType(), True),
        StructField("length", LongType(), True),
        StructField("content", BinaryType(), True),
        StructField("media_type", StringType(), True),  # image|audio|video
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("embedding", ArrayType(FloatType()), True),
    ]
)


def read_media(spark: SparkSession, path: str, media_type: str = "image") -> DataFrame:
    """Ingest a directory of media files as a binary-column table.

    Built on Spark's ``binaryFile`` source — distributed, partition-per
    file-group, predicate pushdown on path/length works.
    """
    df = spark.read.format("binaryFile").load(path)
    return df.select(
        F.col("path"),
        F.unix_timestamp("modificationTime").alias("modification_time"),
        F.col("length"),
        F.col("content"),
        F.lit(media_type).alias("media_type"),
    )


def _pixel_features(arr, width: int, height: int, channels: int) -> dict[str, Any]:
    """Shape + 8-float embedding: per-channel means then stds (both
    /255, zero-padded to 4 channels each) — deterministic, codec-free."""
    import numpy as np

    px = np.asarray(arr, dtype=np.float64).reshape(-1, channels)
    means = px.mean(axis=0) / 255.0 if len(px) else np.zeros(channels)
    stds = px.std(axis=0) / 255.0 if len(px) else np.zeros(channels)
    pad = [0.0] * (4 - channels)
    return {
        "width": width,
        "height": height,
        "n_channels": channels,
        "embedding": [float(x) for x in means] + pad + [float(x) for x in stds] + pad,
    }


def pnm_pixels(content: bytes):
    """(pixels, width, height, channels) of a binary PNM (P5/P6)."""
    import numpy as np

    magic = content[:2]
    channels = {b"P5": 1, b"P6": 3}[magic]
    i, tokens = 2, []
    while len(tokens) < 3:
        while i < len(content) and content[i : i + 1].isspace():
            i += 1
        if content[i : i + 1] == b"#":
            while i < len(content) and content[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(content) and not content[j : j + 1].isspace():
            j += 1
        tokens.append(int(content[i:j]))
        i = j
    i += 1  # exactly one whitespace byte before the raster
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError("PNM maxval > 255 (16-bit) not supported")
    n = width * height * channels
    raster = np.frombuffer(content, dtype=np.uint8, count=n, offset=i)
    return raster, width, height, channels


def decode_pnm(content: bytes) -> dict[str, Any]:
    """Binary PNM: P5 (gray, 1ch) / P6 (RGB, 3ch), maxval ≤ 255."""
    return _pixel_features(*pnm_pixels(content))


def bmp_pixels(content: bytes):
    """(pixels, width, height, channels) of an uncompressed (BI_RGB)
    24/32-bit BMP. Rows are 4-byte aligned and stored bottom-up
    (top-down when the header height is negative); bottom-up rasters
    are FLIPPED here so every consumer sees one orientation —
    mean/std features are row-order-free, but spatial consumers
    (dHash) are not."""
    import struct

    import numpy as np

    pixel_off = struct.unpack_from("<I", content, 10)[0]
    width, height = struct.unpack_from("<ii", content, 18)
    bpp, compression = (
        struct.unpack_from("<H", content, 28)[0],
        struct.unpack_from("<I", content, 30)[0],
    )
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    channels = bpp // 8
    flip = height > 0  # positive height = bottom-up storage
    height = abs(height)
    stride = (width * channels + 3) // 4 * 4
    rows = np.frombuffer(
        content, dtype=np.uint8, count=stride * height, offset=pixel_off
    ).reshape(height, stride)[:, : width * channels]
    if flip:
        rows = rows[::-1]
    return rows, width, height, channels


def decode_bmp(content: bytes) -> dict[str, Any]:
    """Uncompressed (BI_RGB) 24/32-bit BMP (see :func:`bmp_pixels`)."""
    return _pixel_features(*bmp_pixels(content))


_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type → channels


def png_pixels(content: bytes):
    """(pixels, width, height, channels) of an 8-bit non-interlaced
    PNG (gray / gray+alpha / RGB / RGBA) with stdlib zlib; scanline
    filters 0-4 un-applied per the spec."""
    import zlib

    import numpy as np

    if content[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(content):
        ln = int.from_bytes(content[pos : pos + 4], "big")
        typ = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            width = int.from_bytes(data[0:4], "big")
            height = int.from_bytes(data[4:8], "big")
            depth, color, _, _, interlace = data[8:13]
            if depth != 8 or color not in _PNG_CHANNELS or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color}, "
                    f"interlace={interlace})"
                )
            meta = (width, height, _PNG_CHANNELS[color])
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    width, height, channels = meta
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    out = np.empty((height, stride), dtype=np.uint8)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        # filters 0/2 have no left-neighbor dependency and filter 1's
        # left-recursion is a per-channel-lane prefix sum (mod 256
        # commutes with addition) — one numpy op per scanline instead
        # of a per-pixel Python loop (~4M iterations on a 1024²  RGBA
        # image). Only 3 (average) and 4 (Paeth) are truly sequential.
        if f == 0:
            out[y] = line.astype(np.uint8)
            continue
        if f == 2:
            out[y] = ((line + prev) & 0xFF).astype(np.uint8)
            continue
        if f == 1:
            lanes = line.reshape(width, channels)
            out[y] = (
                (np.cumsum(lanes, axis=0, dtype=np.int64) & 0xFF)
                .astype(np.uint8)
                .reshape(stride)
            )
            continue
        if f not in (3, 4):
            raise ValueError(f"bad PNG filter {f}")
        cur = np.zeros(stride, np.int32)
        for x in range(stride):
            a = cur[x - channels] if x >= channels else 0
            b = prev[x]
            c = prev[x - channels] if x >= channels else 0
            if f == 3:
                v = line[x] + (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                v = line[x] + (a if pa <= pb and pa <= pc else b if pb <= pc else c)
            cur[x] = v & 0xFF
        out[y] = cur
    return out, width, height, channels


def decode_png(content: bytes) -> dict[str, Any]:
    """8-bit non-interlaced PNG (see :func:`png_pixels`)."""
    return _pixel_features(*png_pixels(content))


def default_image_decoder(content: bytes) -> dict[str, Any]:
    """Dependency-free decode for BMP / PNM (P5, P6) / PNG (8-bit,
    non-interlaced) / baseline JPEG (``operators/jpeg.py`` — the
    dominant crawl format, sequential DCT 8-bit with 4:4:4/4:2:2/4:2:0
    and restart markers). Progressive JPEG and other codecs (WebP, ...)
    need a real image library — inject ``decoder=`` (e.g. a
    Pillow-backed callable with this same signature) without touching
    the pipeline."""
    return _pixel_features(*default_pixels(content))


def default_pixels(content: bytes):
    """Raw-pixel companion of :func:`default_image_decoder`:
    (pixels, width, height, channels) for the builtin formats."""
    if content[:2] in (b"P5", b"P6"):
        return pnm_pixels(content)
    if content[:2] == b"BM":
        return bmp_pixels(content)
    if content[:8] == b"\x89PNG\r\n\x1a\n":
        return png_pixels(content)
    if content[:3] == b"\xff\xd8\xff":
        from polars_fastx_spark.operators.jpeg import decode_jpeg_pixels

        return decode_jpeg_pixels(content)
    raise NotImplementedError(
        "unsupported image format (builtin: BMP, PNM P5/P6, PNG-8, "
        "baseline JPEG); inject pixels=/decoder=... for other codecs"
    )


def dhash_bits(pixels, width: int, height: int, channels: int,
               hash_size: int = 8) -> list[int]:
    """Deterministic 64-bit difference hash (dHash) as a bit list:
    grayscale by channel mean, area-average downsample to a
    ``hash_size × (hash_size+1)`` grid, 1 bit per horizontal gradient
    (left < right). Codec-free and dependency-free — robust to
    re-encoding, resizing, and small edits, the standard cheap
    perceptual signature for image near-dup detection. Block edges
    are ``max(lo+1, ...)``-guarded so images smaller than the grid
    still hash (blocks degrade toward nearest-neighbor sampling)."""
    import numpy as np

    px = (
        np.asarray(pixels, dtype=np.float64)
        .reshape(height, width, channels)
        .mean(axis=2)
    )
    rows, cols = hash_size, hash_size + 1
    g = np.empty((rows, cols))
    for r in range(rows):
        ylo = r * height // rows
        yhi = max(ylo + 1, (r + 1) * height // rows)
        for c in range(cols):
            xlo = c * width // cols
            xhi = max(xlo + 1, (c + 1) * width // cols)
            g[r, c] = px[ylo:yhi, xlo:xhi].mean()
    return [int(b) for b in (g[:, :-1] < g[:, 1:]).flatten()]


def image_dhash(
    df: DataFrame,
    pixels: Callable[[bytes], tuple] = default_pixels,
    hash_size: int = 8,
) -> DataFrame:
    """Per-image dHash signatures over a ``read_media`` frame — the
    image-modality entry into the shared 64-bit hamming dedup engine.
    Arrow-batched mapInPandas like every decode path; null/broken
    content yields a null signature row (kept, so a corrupt file is
    visible downstream instead of silently vanishing). Returns
    (path, sig array<int> of 64 bits, width, height)."""

    def do(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            out = {"path": [], "sig": [], "width": [], "height": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                out["path"].append(path)
                try:
                    arr, w, h, ch = pixels(
                        bytes(content) if content is not None else b""
                    )
                    out["sig"].append(dhash_bits(arr, w, h, ch, hash_size))
                    out["width"].append(w)
                    out["height"].append(h)
                except Exception:
                    out["sig"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
            yield pd.DataFrame(out)

    return df.select("path", "content").mapInPandas(
        do, "path string, sig array<int>, width int, height int"
    )


def image_near_duplicates(
    df: DataFrame,
    max_distance: int = 6,
    pixels: Callable[[bytes], tuple] = default_pixels,
) -> DataFrame:
    """Image near-dup pairs: dHash signatures fed through the SAME
    pigeonhole hamming engine the SimHash text path uses
    (``dedup.hamming_near_duplicates`` — exact, banded, never O(n²)),
    extending the dedup family across modalities: a re-encoded,
    slightly-cropped, or lightly-edited copy lands within a few
    gradient-bit flips of its source. Returns (id_a, id_b, hamming)
    keyed by path; undecodable images (null signature) never band."""
    from polars_fastx_spark.operators import dedup

    sig = image_dhash(df, pixels).filter(F.col("sig").isNotNull()).select(
        F.col("path").alias("__id"), F.col("sig").alias("__sig")
    )
    return dedup.hamming_near_duplicates(sig, max_distance)


def image_signature_index(
    df: DataFrame,
    max_distance: int = 6,
    pixels: Callable[[bytes], tuple] = default_pixels,
) -> DataFrame:
    """The persistable image near-dup INDEX: dHash signatures banded
    by ``dedup.hamming_band_table`` — write it partitioned by
    ``chunk`` and gate later ingest batches with
    :func:`image_neardup_gate` WITHOUT ever re-decoding history (the
    point, for media: pixels dominate the cost, signatures are 64
    ints). Undecodable content carries no signature and never
    indexes."""
    from polars_fastx_spark.operators import dedup

    sig = image_dhash(df, pixels).filter(F.col("sig").isNotNull()).select(
        F.col("path").alias("__id"), F.col("sig").alias("__sig")
    )
    return dedup.hamming_band_table(sig, max_distance)


def image_neardup_gate(
    batch: DataFrame,
    index: DataFrame,
    max_distance: int = 6,
    pixels: Callable[[bytes], tuple] = default_pixels,
    keep_hits: bool = False,
) -> DataFrame:
    """Ingest-time image near-dup gate: drop batch images within
    ``max_distance`` hamming of ANY already-indexed image
    (:func:`image_signature_index`) — decision verified by exact
    hamming against the index's stored signatures
    (``dedup.hamming_gate``), so unlike the text LSH gate there is no
    candidate-level false-positive drop. Undecodable content passes
    (no signature = no evidence, the media analog of shingle-less
    docs). Same incremental contract as the text gate: intra-batch
    dups are not mutually gated; append the accepted batch's
    :func:`image_signature_index` to the stored index so later batches
    see them. Returns surviving batch rows (``keep_hits=True``: only
    the flagged ones)."""
    from polars_fastx_spark.operators import dedup

    sig = image_dhash(batch, pixels).filter(
        F.col("sig").isNotNull()
    ).select(F.col("path").alias("__id"), F.col("sig").alias("__sig"))
    hits = dedup.hamming_gate(
        sig, index, max_distance, keep_hits=True
    ).select(F.col("__id").alias("path"))
    how = "left_semi" if keep_hits else "left_anti"
    return batch.join(hits, "path", how)


def pillow_image_decoder(content: bytes) -> dict[str, Any]:
    """Progressive-JPEG/WebP/GIF/... decode through Pillow — the
    worked example of the ``decoder=`` injection seam (baseline JPEG
    is a BUILTIN now, operators/jpeg.py). Same signature and feature
    contract as :func:`default_image_decoder` (shape + the
    _pixel_features mean/std embedding), so
    ``extract_image_features(df, decoder=pillow_image_decoder)`` is the
    whole integration; the Spark-side plumbing (schema, Arrow batching,
    partitioning) is identical. Import-gated: this container ships no
    image libraries, so the decode raises NotImplementedError unless
    Pillow is installed (tests skip accordingly)."""
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - exercised via tests' skipif
        raise NotImplementedError(
            "pillow_image_decoder requires Pillow (pip install Pillow)"
        ) from e
    import io

    import numpy as np

    with Image.open(io.BytesIO(content)) as im:
        if im.mode not in ("L", "RGB", "RGBA"):
            im = im.convert("RGB")
        arr = np.asarray(im)
    if arr.ndim == 2:
        height, width = arr.shape
        channels = 1
    else:
        height, width, channels = arr.shape
    return _pixel_features(arr, width, height, channels)


def fake_image_decoder(content: bytes) -> dict[str, Any]:
    """Deterministic fake decoder for tests: derives shape + a tiny
    'embedding' from the bytes' md5 — stable across runs/machines."""
    import hashlib

    h = hashlib.md5(content or b"").digest()
    return {
        "width": 16 + h[0] % 64,
        "height": 16 + h[1] % 64,
        "n_channels": 1 + h[2] % 3,
        "embedding": [b / 255.0 for b in h[:8]],
    }


def extract_image_features(
    df: DataFrame,
    decoder: Callable[[bytes], dict[str, Any]] = default_image_decoder,
    batch_hint: int | None = None,
) -> DataFrame:
    """Decode/feature-extract via Arrow-batched mapInPandas.

    The decode runs once per row inside a batch loop (codecs are
    per-item anyway); Arrow moves the binary column executor→Python in
    large batches, not per record. Output schema is fixed
    (IMAGE_FEATURES_SCHEMA) so downstream relational ops compose.
    """

    def decode_batches(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            out = {
                "path": [], "width": [], "height": [],
                "n_channels": [], "embedding": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                feats = decoder(bytes(content) if content is not None else b"")
                out["path"].append(path)
                out["width"].append(feats.get("width"))
                out["height"].append(feats.get("height"))
                out["n_channels"].append(feats.get("n_channels"))
                out["embedding"].append(feats.get("embedding"))
            yield pd.DataFrame(out)

    return df.select("path", "content").mapInPandas(
        decode_batches, IMAGE_FEATURES_SCHEMA
    )


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize plumbing (Arrow-batched mapInPandas): the Spark side —
    schema (path, content, width, height), batch shape, partitioning —
    is real; the pixel op is injected via ``resizer(content, w, h) ->
    bytes`` (e.g. a Pillow thumbnail+save). Without an injected codec
    it raises NotImplementedError per the stub contract (this
    container ships no image libraries)."""

    def do(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for content in pdf["content"]:
                if resizer is None:
                    raise NotImplementedError(
                        "resize_images needs an injected resizer "
                        "(e.g. Pillow); no image codecs in this container"
                    )
                # null content stays null (binaryFile can yield it);
                # bytes(None) would crash the whole write
                out.append(
                    resizer(bytes(content), width, height)
                    if content is not None
                    else None
                )
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "content": out,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                }
            )

    return df.select("path", "content").mapInPandas(
        do, "path string, content binary, width int, height int"
    )


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Back-compat alias for :func:`resize_images` without a codec."""
    return resize_images(df, width, height)


def frame_sample(
    df: DataFrame,
    every_n: int = 10,
    decoder: Callable[[bytes], list[bytes]] | None = None,
) -> DataFrame:
    """Video frame sampling plumbing: one row in → N frame rows out
    (mapInPandas is the UDTF shape). Default 'decoder' fakes frames by
    slicing the byte stream deterministically."""

    def split_frames(batches):
        import pandas as pd

        for pdf in batches:
            paths, idxs, frames = [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content) if content is not None else b""
                if decoder is not None:
                    fs = decoder(data)
                else:
                    step = max(1, len(data) // max(1, every_n))
                    fs = [data[i : i + step] for i in range(0, len(data), step)]
                for i, fr in enumerate(fs):
                    paths.append(path)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame({"path": paths, "frame_idx": idxs, "frame": frames})

    schema = StructType(
        [
            StructField("path", StringType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )
    return df.select("path", "content").mapInPandas(split_frames, schema)


# ---------------------------------------------------------------- audio

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_s", FloatType(), True),
        StructField("embedding", ArrayType(FloatType()), True),
    ]
)


def wav_samples(content: bytes):
    """(samples[n, channels] float64 in [-1, 1], sample_rate, channels)
    of a RIFF/WAVE PCM file — stdlib + numpy alone: integer PCM (8-bit
    unsigned, 16/32-bit signed) and 32-bit IEEE float, any channel
    count."""
    import struct

    import numpy as np

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        ln = struct.unpack_from("<I", content, pos + 4)[0]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", content, pos + 8)
        elif cid == b"data":
            data = content[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format == 1 and bits == 8:
        x = (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif audio_format == 1 and bits == 16:
        x = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
    elif audio_format == 1 and bits == 32:
        x = np.frombuffer(data, "<i4").astype(np.float64) / 2147483648.0
    elif audio_format == 3 and bits == 32:
        x = np.frombuffer(data, "<f4").astype(np.float64)
    else:
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    n = len(x) // channels
    x = x[: n * channels].reshape(n, channels)
    return x, int(sample_rate), int(channels)


def decode_wav(content: bytes) -> dict[str, Any]:
    """WAV features over :func:`wav_samples`: per-channel RMS then
    per-channel peak (each zero-padded to 4), mirroring the image
    tier's mean/std embedding layout."""
    import numpy as np

    x, sample_rate, channels = wav_samples(content)
    n = len(x)
    rms = np.sqrt((x * x).mean(axis=0)) if n else np.zeros(channels)
    peak = np.abs(x).max(axis=0) if n else np.zeros(channels)
    pad = [0.0] * (4 - channels) if channels < 4 else []
    emb = [float(v) for v in rms[:4]] + pad + [float(v) for v in peak[:4]] + pad
    return {
        "sample_rate": sample_rate,
        "n_channels": channels,
        "n_samples": int(n),
        "duration_s": (n / sample_rate) if sample_rate else None,
        "embedding": emb,
    }


def audio_fingerprint_bits(x, sample_rate: int, channels: int,
                           n_frames: int = 65) -> list[int]:
    """64-bit energy-gradient audio fingerprint — the temporal analog
    of image dHash: downmix to mono (channel mean), split into
    ``n_frames`` equal frames, per-frame RMS, one bit per consecutive-
    frame gradient (rising energy = 1). GAIN-INVARIANT by construction
    (a volume change scales every frame's RMS by the same factor, and
    the gradient comparison only uses order), so the same clip at a
    different volume or sample width fingerprints identically. NOT
    time-shift-invariant — alignment-robust matching needs real
    spectral landmarks (a Chromaprint-style codec would be injected
    like an image decoder). Frame edges are max(lo+1,·)-guarded so
    clips shorter than the grid still hash."""
    import numpy as np

    mono = np.asarray(x, dtype=np.float64).reshape(-1, channels).mean(axis=1)
    n = len(mono)
    if n == 0:
        raise ValueError("empty audio stream")
    e = np.empty(n_frames)
    for i in range(n_frames):
        lo = i * n // n_frames
        hi = max(lo + 1, (i + 1) * n // n_frames)
        seg = mono[lo:hi]
        e[i] = float(np.sqrt((seg * seg).mean()))
    return [int(b) for b in (e[:-1] < e[1:])]


def audio_fingerprint(
    df: DataFrame,
    samples: Callable[[bytes], tuple] = wav_samples,
    n_frames: int = 65,
) -> DataFrame:
    """Per-clip audio fingerprints over a ``read_media`` frame —
    Arrow-batched mapInPandas like every decode path; null/broken
    content yields a null signature row. Returns
    (path, sig array<int>, sample_rate, n_samples)."""

    def do(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            out = {"path": [], "sig": [], "sample_rate": [], "n_samples": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                out["path"].append(path)
                try:
                    x, rate, ch = samples(
                        bytes(content) if content is not None else b""
                    )
                    out["sig"].append(
                        audio_fingerprint_bits(x, rate, ch, n_frames)
                    )
                    out["sample_rate"].append(rate)
                    out["n_samples"].append(len(x))
                except Exception:
                    out["sig"].append(None)
                    out["sample_rate"].append(None)
                    out["n_samples"].append(None)
            yield pd.DataFrame(out)

    return df.select("path", "content").mapInPandas(
        do, "path string, sig array<int>, sample_rate int, n_samples long"
    )


def audio_near_duplicates(
    df: DataFrame,
    max_distance: int = 6,
    samples: Callable[[bytes], tuple] = wav_samples,
) -> DataFrame:
    """Audio near-dup pairs through the SAME pigeonhole hamming engine
    as text SimHash and image dHash (dedup.hamming_near_duplicates) —
    a re-encoded, re-gained, or lightly-edited copy of a clip lands
    within a few energy-gradient bit flips of its source. Returns
    (id_a, id_b, hamming) keyed by path."""
    from polars_fastx_spark.operators import dedup

    sig = audio_fingerprint(df, samples).filter(
        F.col("sig").isNotNull()
    ).select(F.col("path").alias("__id"), F.col("sig").alias("__sig"))
    return dedup.hamming_near_duplicates(sig, max_distance)


def default_audio_decoder(content: bytes) -> dict[str, Any]:
    """Dependency-free decode for PCM/float WAV. Compressed codecs
    (MP3, FLAC, Opus, ...) need a real audio library — inject
    ``decoder=`` with this same signature, pipeline unchanged."""
    if content[:4] == b"RIFF":
        return decode_wav(content)
    raise NotImplementedError(
        "unsupported audio format (builtin: RIFF/WAVE PCM u8/i16/i32/f32);"
        " inject decoder=... for compressed codecs"
    )


def extract_audio_features(
    df: DataFrame,
    decoder: Callable[[bytes], dict[str, Any]] = default_audio_decoder,
) -> DataFrame:
    """Audio twin of :func:`extract_image_features`: Arrow-batched
    mapInPandas over (path, content) emitting typed feature rows."""

    def decode_batches(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            out = {
                "path": [], "sample_rate": [], "n_channels": [],
                "n_samples": [], "duration_s": [], "embedding": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                feats = decoder(bytes(content) if content is not None else b"")
                out["path"].append(path)
                out["sample_rate"].append(feats.get("sample_rate"))
                out["n_channels"].append(feats.get("n_channels"))
                out["n_samples"].append(feats.get("n_samples"))
                out["duration_s"].append(feats.get("duration_s"))
                out["embedding"].append(feats.get("embedding"))
            yield pd.DataFrame(out)

    return df.select("path", "content").mapInPandas(
        decode_batches, AUDIO_FEATURES_SCHEMA
    )


def audio_signature_index(
    df: DataFrame,
    max_distance: int = 6,
    samples: Callable[[bytes], tuple] = wav_samples,
) -> DataFrame:
    """Persistable audio near-dup index — :func:`image_signature_index`
    with energy fingerprints instead of dHash; same banding, same gate
    machinery, history never re-decoded."""
    from polars_fastx_spark.operators import dedup

    sig = audio_fingerprint(df, samples).filter(
        F.col("sig").isNotNull()
    ).select(F.col("path").alias("__id"), F.col("sig").alias("__sig"))
    return dedup.hamming_band_table(sig, max_distance)


def audio_neardup_gate(
    batch: DataFrame,
    index: DataFrame,
    max_distance: int = 6,
    samples: Callable[[bytes], tuple] = wav_samples,
    keep_hits: bool = False,
) -> DataFrame:
    """Ingest-time audio near-dup gate — :func:`image_neardup_gate`
    for clips: exact-hamming-verified against the stored fingerprints,
    undecodable content passes, same grown-index incremental
    contract."""
    from polars_fastx_spark.operators import dedup

    sig = audio_fingerprint(batch, samples).filter(
        F.col("sig").isNotNull()
    ).select(F.col("path").alias("__id"), F.col("sig").alias("__sig"))
    hits = dedup.hamming_gate(
        sig, index, max_distance, keep_hits=True
    ).select(F.col("__id").alias("path"))
    how = "left_semi" if keep_hits else "left_anti"
    return batch.join(hits, "path", how)
