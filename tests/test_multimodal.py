"""Multimodal decode (L5): the builtin BMP/PNM/PNG decoders recover
known pixel values, and the Spark pipeline runs them end-to-end with
no injected fake."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_fastx_spark.operators import multimodal as mm


def _expected(pixels: np.ndarray, w: int, h: int, c: int) -> dict:
    px = pixels.reshape(-1, c).astype(np.float64)
    pad = [0.0] * (4 - c)
    return {
        "width": w,
        "height": h,
        "n_channels": c,
        "embedding": [float(x) for x in px.mean(axis=0) / 255.0]
        + pad
        + [float(x) for x in px.std(axis=0) / 255.0]
        + pad,
    }


def _check(got: dict, want: dict):
    assert got["width"] == want["width"]
    assert got["height"] == want["height"]
    assert got["n_channels"] == want["n_channels"]
    assert got["embedding"] == pytest.approx(want["embedding"], abs=1e-12)


def make_ppm(pixels: np.ndarray, w: int, h: int) -> bytes:
    return f"P6\n# comment\n{w} {h}\n255\n".encode() + pixels.tobytes()


def make_pgm(pixels: np.ndarray, w: int, h: int) -> bytes:
    return f"P5 {w} {h} 255\n".encode() + pixels.tobytes()


def make_bmp(pixels: np.ndarray, w: int, h: int) -> bytes:
    """24-bit bottom-up BI_RGB BMP from (h, w, 3) pixel array."""
    stride = (w * 3 + 3) // 4 * 4
    body = b""
    for row in pixels[::-1]:  # bottom-up
        line = row.tobytes()
        body += line + b"\x00" * (stride - len(line))
    header = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    header += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    return header + body


def make_png(pixels: np.ndarray, w: int, h: int, c: int) -> bytes:
    """8-bit non-interlaced PNG; alternate filters to exercise 0-4."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    stride = w * c
    flat = pixels.reshape(h, stride).astype(np.int32)
    raw = b""
    for y in range(h):
        f = y % 5
        cur, prev = flat[y], (flat[y - 1] if y else np.zeros(stride, np.int32))
        line = np.zeros(stride, np.int32)
        for x in range(stride):
            a = cur[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                line[x] = cur[x]
            elif f == 1:
                line[x] = cur[x] - a
            elif f == 2:
                line[x] = cur[x] - b
            elif f == 3:
                line[x] = cur[x] - (a + b) // 2
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa <= pb and pa <= pc else b if pb <= pc else cc
                line[x] = cur[x] - pred
        raw += bytes([f]) + (line & 0xFF).astype(np.uint8).tobytes()
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


RNG = np.random.default_rng(7)


def test_decode_ppm():
    px = RNG.integers(0, 256, (3, 5, 3), dtype=np.uint8)
    _check(mm.decode_pnm(make_ppm(px, 5, 3)), _expected(px, 5, 3, 3))


def test_decode_pgm():
    px = RNG.integers(0, 256, (4, 6, 1), dtype=np.uint8)
    _check(mm.decode_pnm(make_pgm(px, 6, 4)), _expected(px, 6, 4, 1))


def test_decode_bmp_strips_row_padding():
    # width 3 → stride 12 with 3 pad bytes/row; padding must not leak
    # into the channel stats
    px = RNG.integers(0, 256, (2, 3, 3), dtype=np.uint8)
    _check(mm.decode_bmp(make_bmp(px, 3, 2)), _expected(px, 3, 2, 3))


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_decode_png_all_color_types(c):
    px = RNG.integers(0, 256, (7, 4, c), dtype=np.uint8)
    _check(mm.decode_png(make_png(px, 4, 7, c)), _expected(px, 4, 7, c))


def test_default_decoder_dispatch_and_unknown():
    px = RNG.integers(0, 256, (2, 2, 3), dtype=np.uint8)
    assert mm.default_image_decoder(make_ppm(px, 2, 2))["n_channels"] == 3
    assert mm.default_image_decoder(make_bmp(px, 2, 2))["n_channels"] == 3
    assert mm.default_image_decoder(make_png(px, 2, 2, 3))["n_channels"] == 3
    with pytest.raises(NotImplementedError):
        mm.default_image_decoder(b"\xff\xd8\xff JPEG-ish")


def test_extract_image_features_end_to_end(spark):
    """Real decoder through the Spark pipeline: binary column → Arrow
    → mapInPandas → typed rows, mixed formats in one table."""
    px1 = RNG.integers(0, 256, (3, 3, 3), dtype=np.uint8)
    px2 = RNG.integers(0, 256, (2, 4, 3), dtype=np.uint8)
    rows = [
        ("a.ppm", bytearray(make_ppm(px1, 3, 3))),
        ("b.bmp", bytearray(make_bmp(px2, 4, 2))),
        ("c.png", bytearray(make_png(px1, 3, 3, 3))),
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    out = {r["path"]: r for r in mm.extract_image_features(df).collect()}
    assert out["a.ppm"]["width"] == 3 and out["a.ppm"]["height"] == 3
    assert out["b.bmp"]["width"] == 4 and out["b.bmp"]["height"] == 2
    assert out["c.png"]["width"] == 3
    e1 = _expected(px1, 3, 3, 3)["embedding"]
    assert out["a.ppm"]["embedding"] == pytest.approx(e1, abs=1e-6)
    assert out["c.png"]["embedding"] == pytest.approx(e1, abs=1e-6)


def test_read_media_binaryfile(spark, tmp_path):
    px = RNG.integers(0, 256, (2, 2, 3), dtype=np.uint8)
    (tmp_path / "x.ppm").write_bytes(make_ppm(px, 2, 2))
    (tmp_path / "y.ppm").write_bytes(make_ppm(px, 2, 2))
    media = mm.read_media(spark, str(tmp_path), media_type="image")
    assert media.count() == 2
    feats = mm.extract_image_features(media).collect()
    assert {r["width"] for r in feats} == {2}


def test_frame_sample_explodes_rows(spark):
    df = spark.createDataFrame(
        [("v.bin", bytearray(bytes(range(100))))], "path string, content binary"
    )
    frames = mm.frame_sample(df, every_n=10).collect()
    assert len(frames) == 10
    assert sorted(r["frame_idx"] for r in frames) == list(range(10))
    assert b"".join(bytes(r["frame"]) for r in sorted(frames, key=lambda r: r["frame_idx"])) == bytes(range(100))
