"""Baseline JPEG codec (operators/jpeg.py) — the r5 verdict's task 4:
the dominant crawl image format gets a TESTED dependency-free path
(encode→decode roundtrip PSNR, restart markers, subsampling, odd
sizes), codec parity with BMP through the dHash pipeline, the committed
golden fixture, and — whenever Pillow is present — cross-codec interop
in both directions."""

from __future__ import annotations

import hashlib
from pathlib import Path

import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_fastx_spark.operators import jpeg
from polars_fastx_spark.operators import multimodal as mm

FIXTURE = Path(__file__).parent / "fixtures" / "golden_baseline.jpg"


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (xx * 255 / w),
            (yy * 255 / h),
            ((xx + 2 * yy) * 255 / (w + 2 * h)),
        ],
        axis=-1,
    ).astype(np.uint8)


def _psnr(a, b):
    err = np.sqrt(np.mean((a.astype(float) - b.astype(float)) ** 2))
    return 20 * np.log10(255 / max(err, 1e-9))


@pytest.mark.parametrize("subsample", ["444", "420"])
def test_roundtrip_psnr(subsample):
    img = _gradient(48, 64)
    data = jpeg.encode_jpeg_baseline(
        img.reshape(-1), 64, 48, 3, quality=90, subsample=subsample
    )
    px, w, h, c = jpeg.decode_jpeg_pixels(data)
    assert (w, h, c) == (64, 48, 3)
    assert _psnr(px.reshape(48, 64, 3), img) > 35


def test_roundtrip_grayscale_and_odd_sizes():
    rng = np.random.default_rng(11)
    g = (np.add.outer(np.arange(17) * 3, np.arange(23) * 5) % 256).astype(
        np.uint8
    )
    data = jpeg.encode_jpeg_baseline(g.reshape(-1), 23, 17, 1, quality=90)
    px, w, h, c = jpeg.decode_jpeg_pixels(data)
    assert (w, h, c) == (23, 17, 1)
    # odd sizes through 4:2:0 exercise the pad/crop paths; noise at low
    # quality exercises ZRL/EOB and large-magnitude Huffman symbols
    for hh, ww in ((9, 16), (8, 8), (31, 13)):
        im = rng.integers(0, 256, size=(hh, ww, 3), dtype=np.uint8)
        d = jpeg.encode_jpeg_baseline(
            im.reshape(-1), ww, hh, 3, quality=25, subsample="420"
        )
        px, w, h, c = jpeg.decode_jpeg_pixels(d)
        assert (w, h, c) == (ww, hh, 3)


def test_restart_markers_roundtrip():
    """DRI/RSTn: encoder emits a restart every 2 MCUs, decoder resyncs
    and resets DC predictors — byte-identical pixels to the
    no-restart encode of the same image (restarts change framing, not
    content)."""
    img = _gradient(32, 48)
    plain = jpeg.decode_jpeg_pixels(
        jpeg.encode_jpeg_baseline(img.reshape(-1), 48, 32, 3, quality=85)
    )[0]
    restarted_bytes = jpeg.encode_jpeg_baseline(
        img.reshape(-1), 48, 32, 3, quality=85, restart_interval=2
    )
    assert b"\xff\xdd" in restarted_bytes  # DRI present
    assert any(
        bytes([0xFF, 0xD0 + i]) in restarted_bytes for i in range(8)
    )
    restarted = jpeg.decode_jpeg_pixels(restarted_bytes)[0]
    assert np.array_equal(plain, restarted)


def test_golden_fixture_pinned():
    """The committed fixture decodes to pinned shape + pixel hash —
    any decoder regression moves the hash."""
    data = FIXTURE.read_bytes()
    px, w, h, c = jpeg.decode_jpeg_pixels(data)
    assert (w, h, c) == (56, 40, 3)
    assert hashlib.md5(px.tobytes()).hexdigest() == (
        "bbbe917d0c7daf85f569dc1dcb764bc8"
    )
    assert _psnr(px.reshape(40, 56, 3), _gradient(40, 56)) > 35


def test_codec_parity_dhash_jpeg_vs_bmp():
    """Codec parity through the perceptual pipeline: the SAME image
    as lossless BMP and lossy (q90) JPEG must produce the SAME 64-bit
    dHash — that is the property the near-dup tier depends on."""
    from tests.test_multimodal import make_bmp

    img = _gradient(40, 56)
    bmp = make_bmp(img, 56, 40)
    jpg = jpeg.encode_jpeg_baseline(
        img.reshape(-1), 56, 40, 3, quality=90, subsample="444"
    )
    hb = mm.dhash_bits(*mm.default_pixels(bmp))
    hj = mm.dhash_bits(*mm.default_pixels(jpg))
    assert hb == hj and len(hb) == 64


def test_progressive_rejected_with_injection_hint():
    """A progressive (SOF2) stream fails loudly toward the injection
    seam, not obscurely."""
    # minimal prefix: SOI + SOF2 marker
    data = b"\xff\xd8\xff\xc2" + b"\x00\x0b" + b"\x08" + b"\x00\x08" \
        + b"\x00\x08" + b"\x01" + b"\x01\x11\x00"
    with pytest.raises(NotImplementedError, match="baseline"):
        jpeg.decode_jpeg_pixels(data)


def test_image_neardup_pipeline_on_jpegs(spark):
    """The near-dup pipeline end-to-end on a JPEG corpus through the
    BUILTIN decoder (no injection): a re-encoded (recompressed) copy
    and a lightly-edited copy pair with their source; an unrelated
    image does not."""
    base = _gradient(32, 32)
    edited = base.copy()
    edited[0:2, 0:2] = 255  # light edit
    other = 255 - _gradient(32, 32)[::-1]

    def _jpg(im, q=90):
        return bytearray(
            jpeg.encode_jpeg_baseline(
                im.reshape(-1), 32, 32, 3, quality=q, subsample="420"
            )
        )

    rows = [
        ("a.jpg", _jpg(base)),
        ("a_recompressed.jpg", _jpg(base, q=70)),
        ("a_edited.jpg", _jpg(edited)),
        ("other.jpg", _jpg(other)),
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    pairs = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in mm.image_near_duplicates(df, max_distance=6).collect()
    }
    assert ("a.jpg", "a_recompressed.jpg") in pairs
    assert ("a.jpg", "a_edited.jpg") in pairs
    assert not any("other.jpg" in p for p in pairs)


def _has_pillow() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _has_pillow(), reason="Pillow not installed")
def test_pillow_interop_both_directions():
    """Cross-codec interop whenever Pillow IS present: Pillow decodes
    our bytes (incl. the committed fixture) within JPEG tolerance, and
    we decode Pillow's encoder output — the seam exercised end-to-end,
    independent of this module's own table constants."""
    import io

    from PIL import Image

    img = _gradient(40, 56)
    ours = jpeg.encode_jpeg_baseline(
        img.reshape(-1), 56, 40, 3, quality=90, subsample="420",
        restart_interval=2,
    )
    via_pil = np.asarray(Image.open(io.BytesIO(ours)).convert("RGB"))
    assert via_pil.shape == (40, 56, 3)
    assert _psnr(via_pil, img) > 30
    ours_px = jpeg.decode_jpeg_pixels(ours)[0].reshape(40, 56, 3)
    assert _psnr(via_pil, ours_px) > 40  # two decoders, same stream
    via_pil_fix = np.asarray(
        Image.open(io.BytesIO(FIXTURE.read_bytes())).convert("RGB")
    )
    assert _psnr(via_pil_fix, _gradient(40, 56)) > 30
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=90)
    theirs = jpeg.decode_jpeg_pixels(buf.getvalue())
    assert (theirs[1], theirs[2], theirs[3]) == (56, 40, 3)
    assert _psnr(theirs[0].reshape(40, 56, 3), img) > 30
