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
    # JPEG is a BUILTIN now (operators/jpeg.py): valid streams decode,
    # a corrupt JPEG-magic blob fails as corrupt — not as unsupported
    from polars_fastx_spark.operators import jpeg as _jpeg

    data = _jpeg.encode_jpeg_baseline(px.reshape(-1), 2, 2, 3)
    assert mm.default_image_decoder(data)["n_channels"] == 3
    with pytest.raises(ValueError, match="corrupt JPEG"):
        mm.default_image_decoder(b"\xff\xd8\xff\xdaJPEG-ish-garbage")
    # genuinely unknown containers still route to the injection seam
    with pytest.raises(NotImplementedError):
        mm.default_image_decoder(b"RIFF....WEBPVP8 ")


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


# ---------------------------------------------------------------- audio

def _wav_bytes(samples: np.ndarray, rate: int, sampwidth: int) -> bytes:
    """Golden WAV via the stdlib wave writer (int PCM only)."""
    import io
    import wave

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    nch = 1 if samples.ndim == 1 else samples.shape[1]
    w.setnchannels(nch)
    w.setsampwidth(sampwidth)
    w.setframerate(rate)
    w.writeframes(samples.astype(f"<i{sampwidth}" if sampwidth > 1 else "u1").tobytes())
    w.close()
    return buf.getvalue()


def test_decode_wav_16bit_stereo():
    t = np.arange(64)
    samples = np.stack([(1000 * np.sin(t / 3)).astype(np.int16),
                        np.full(64, 16384, np.int16)], axis=1)
    feats = mm.decode_wav(_wav_bytes(samples, 44100, 2))
    assert (feats["sample_rate"], feats["n_channels"], feats["n_samples"]) == (
        44100, 2, 64)
    x = samples.astype(np.float64) / 32768.0
    want_rms = np.sqrt((x * x).mean(axis=0))
    assert feats["embedding"][0] == pytest.approx(want_rms[0], abs=1e-12)
    assert feats["embedding"][1] == pytest.approx(want_rms[1], abs=1e-12)
    assert feats["embedding"][4] == pytest.approx(np.abs(x[:, 0]).max(), abs=1e-12)
    assert feats["duration_s"] == pytest.approx(64 / 44100)


def test_decode_wav_8bit_and_float32():
    u8 = mm.decode_wav(_wav_bytes(np.array([128, 255, 0, 128], np.uint8), 8000, 1))
    assert u8["n_channels"] == 1 and u8["n_samples"] == 4
    assert u8["embedding"][4] == pytest.approx(1.0)  # peak at sample 0 or 255

    # float32 WAV: hand-built header (wave module can't write format 3)
    data = np.array([0.5, -0.25, 0.0, 1.0], "<f4").tobytes()
    wav = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 16000, 64000, 4, 32)
           + b"data" + struct.pack("<I", len(data)) + data)
    f32 = mm.decode_wav(wav)
    assert f32["embedding"][4] == pytest.approx(1.0)
    assert f32["embedding"][0] == pytest.approx(
        np.sqrt(np.mean(np.array([0.5, -0.25, 0.0, 1.0]) ** 2)), abs=1e-12)


def test_audio_decoder_dispatch_and_unknown():
    with pytest.raises(NotImplementedError):
        mm.default_audio_decoder(b"\xffOggS not audio we know")
    with pytest.raises(ValueError):
        mm.decode_wav(b"RIFFxxxxJUNK")


def test_extract_audio_features_end_to_end(spark):
    rows = [
        ("a.wav", _wav_bytes(np.full(32, 100, np.uint8), 8000, 1)),
        ("b.wav", _wav_bytes(np.zeros((16, 2), np.int16), 22050, 2)),
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    got = {r["path"]: r for r in mm.extract_audio_features(df).collect()}
    assert got["a.wav"]["n_samples"] == 32 and got["a.wav"]["sample_rate"] == 8000
    assert got["b.wav"]["n_channels"] == 2 and got["b.wav"]["n_samples"] == 16
    assert got["b.wav"]["embedding"][0] == 0.0  # silent stereo → zero RMS


def _has_pillow() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_pillow_decoder_gated_without_pillow():
    """The injection example must fail loudly (not crash obscurely)
    when Pillow is absent — the container ships no image libs."""
    if _has_pillow():
        pytest.skip("Pillow installed; gating branch unreachable")
    with pytest.raises(NotImplementedError, match="Pillow"):
        mm.pillow_image_decoder(b"\xff\xd8\xff\xe0 not really a jpeg")


@pytest.mark.skipif(not _has_pillow(), reason="Pillow not installed")
def test_pillow_decoder_parity_with_builtin_on_bmp():
    """Golden parity: Pillow and the dependency-free decoder must agree
    on shape and features for a format both can read."""
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    data = make_bmp(px, 4, 5)
    _check(mm.pillow_image_decoder(data), mm.default_image_decoder(data))


@pytest.mark.skipif(not _has_pillow(), reason="Pillow not installed")
def test_pillow_decoder_jpeg_end_to_end(spark, tmp_path):
    """JPEG through the full extract_image_features pipeline with the
    injected decoder — plumbing identical to the builtin path."""
    from PIL import Image

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
    p = tmp_path / "x.jpg"
    Image.fromarray(px).save(p, "JPEG")
    df = mm.read_media(spark, str(tmp_path))
    row = mm.extract_image_features(
        df, decoder=mm.pillow_image_decoder
    ).collect()[0]
    assert (row["width"], row["height"], row["n_channels"]) == (6, 8, 3)
    assert len(row["embedding"]) == 8


def test_fake_image_decoder_deterministic_plumbing(spark):
    """The injectable test fake: stable shape/embedding from bytes'
    md5, through the full Arrow-batched pipeline."""
    df = spark.createDataFrame(
        [("mem://a", bytearray(b"payload-a")), ("mem://b", bytearray(b"payload-b"))],
        "path string, content binary",
    )
    rows = {r["path"]: r for r in
            mm.extract_image_features(df, decoder=mm.fake_image_decoder).collect()}
    again = {r["path"]: r for r in
             mm.extract_image_features(df, decoder=mm.fake_image_decoder).collect()}
    for p in rows:
        assert rows[p]["width"] == again[p]["width"]
        assert rows[p]["embedding"] == again[p]["embedding"]
        assert 16 <= rows[p]["width"] < 80 and len(rows[p]["embedding"]) == 8
    assert rows["mem://a"]["embedding"] != rows["mem://b"]["embedding"]


def test_resize_images_plumbing_with_injected_codec(spark):
    """The resize stage: Arrow-batched, schema + metadata real; the
    pixel op is whatever codec the caller injects."""
    df = spark.createDataFrame(
        [("mem://x", bytearray(b"AABB")), ("mem://y", bytearray(b"CC"))],
        "path string, content binary",
    )

    def fake_resizer(content: bytes, w: int, h: int) -> bytes:
        return content[: w * h] .ljust(w * h, b".")  # deterministic fake

    rows = {r["path"]: r for r in
            mm.resize_images(df, 2, 3, resizer=fake_resizer).collect()}
    assert bytes(rows["mem://x"]["content"]) == b"AABB.."
    assert bytes(rows["mem://y"]["content"]) == b"CC...."
    assert (rows["mem://x"]["width"], rows["mem://x"]["height"]) == (2, 3)
    # without a codec the stub contract raises loudly
    with pytest.raises(Exception, match="resizer|NotImplemented"):
        mm.resize_images(df, 2, 3).collect()


def test_resize_images_null_content_passes_through(spark):
    """binaryFile can yield null content: resize must emit null for
    that row, not crash the whole write on bytes(None)."""
    df = spark.createDataFrame(
        [("a.img", bytearray(b"\x01\x02")), ("b.img", None)],
        "path string, content binary",
    )
    out = {
        r["path"]: r["content"]
        for r in mm.resize_images(
            df, 2, 2, resizer=lambda b, w, h: b[: w * h]
        ).collect()
    }
    assert out["a.img"] is not None and out["b.img"] is None


def test_decode_png_filter1_tall_image_matches_reference(spark):
    """The vectorized filter-1 (per-lane cumsum) path on a tall image:
    decode features equal the pixel-space reference."""
    px = RNG.integers(0, 256, (64, 3, 3), dtype=np.uint8)
    data = make_png(px, 3, 64, 3)
    _check(mm.decode_png(data), _expected(px, 3, 64, 3))


# ------------------------------------------------------- dHash / image dedup

def test_dhash_identical_across_codecs():
    """The same pixel raster must hash identically through PPM, BMP,
    and PNG — pinning grayscale order, the BMP bottom-up flip, and the
    PNG filter un-application against each other."""
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    outs = []
    for blob in (
        make_ppm(px, 16, 16),
        make_bmp(px, 16, 16),
        make_png(px, 16, 16, 3),
    ):
        arr, w, h, c = mm.default_pixels(blob)
        outs.append(mm.dhash_bits(arr, w, h, c))
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) == 64 and set(outs[0]) <= {0, 1}


def test_dhash_known_gradient():
    """A strict left-to-right brightness ramp sets every gradient bit
    (left < right everywhere); the reversed ramp clears every bit."""
    ramp = np.tile(
        np.linspace(0, 255, 18, dtype=np.uint8), (16, 1)
    ).reshape(16, 18, 1)
    assert mm.dhash_bits(ramp, 18, 16, 1) == [1] * 64
    rev = ramp[:, ::-1, :].copy()
    assert mm.dhash_bits(rev, 18, 16, 1) == [0] * 64


def test_dhash_smaller_than_grid_still_hashes():
    tiny = np.arange(12, dtype=np.uint8).reshape(3, 4, 1)
    bits = mm.dhash_bits(tiny, 4, 3, 1)
    assert len(bits) == 64


def test_image_near_duplicates_spark(spark):
    """A lightly-edited copy pairs with its source at a small hamming
    distance; an unrelated image does not; a corrupt blob yields a
    null signature and is skipped, not crashed on."""
    rng = np.random.RandomState(11)
    base = rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
    edited = base.copy()
    edited[12:16, 12:16] = 255  # small local edit
    other = rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
    rows = [
        ("a.bmp", bytearray(make_bmp(base, 32, 32))),
        ("b.bmp", bytearray(make_bmp(edited, 32, 32))),
        ("c.png", bytearray(make_png(other, 32, 32, 3))),
        ("broken.jpg", bytearray(b"\xff\xd8 not really a jpeg")),
    ]
    df = spark.createDataFrame(rows, "path string, content binary")

    sigs = {r["path"]: r["sig"] for r in mm.image_dhash(df).collect()}
    assert sigs["broken.jpg"] is None
    ham_ab = sum(x != y for x, y in zip(sigs["a.bmp"], sigs["b.bmp"]))
    assert 0 < ham_ab <= 6  # local edit flips a few gradient bits

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in mm.image_near_duplicates(df, max_distance=6).collect()
    }
    assert ("a.bmp", "b.bmp") in pairs
    assert pairs[("a.bmp", "b.bmp")] == ham_ab
    assert not any("c.png" in p for p in pairs)
    assert not any("broken.jpg" in p for p in pairs)


# ------------------------------------------------- audio fingerprint dedup

def _f32_wav(samples: np.ndarray, rate: int) -> bytes:
    """32-bit IEEE-float mono WAV (the stdlib wave writer is int-only)."""
    data = samples.astype("<f4").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, rate, rate * 4, 4, 32)
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


def test_audio_fingerprint_gain_and_width_invariant():
    """The same clip fingerprints identically across sample widths and
    volume scaling — RMS order is preserved by any positive gain."""
    rng = np.random.RandomState(3)
    clip = rng.randn(8000) * 0.2
    i16 = (np.clip(clip, -1, 1) * 32767).astype(np.int16)
    b16 = _wav_bytes(i16, 8000, 2)
    bf32 = _f32_wav(i16.astype(np.float64) / 32768.0, 8000)
    bhalf = _f32_wav(i16.astype(np.float64) / 32768.0 * 0.5, 8000)
    sigs = []
    for blob in (b16, bf32, bhalf):
        x, rate, ch = mm.wav_samples(blob)
        sigs.append(mm.audio_fingerprint_bits(x, rate, ch))
    assert sigs[0] == sigs[1] == sigs[2]
    assert len(sigs[0]) == 64 and set(sigs[0]) <= {0, 1}


def test_audio_near_duplicates_spark(spark):
    rng = np.random.RandomState(9)
    base = rng.randn(16000) * 0.2
    edited = base.copy()
    edited[7000:8000] = 0.0  # drop a segment's energy
    other = rng.randn(16000) * 0.2
    rows = [
        ("a.wav", bytearray(_f32_wav(base, 16000))),
        ("b.wav", bytearray(_f32_wav(edited, 16000))),
        ("c.wav", bytearray(_f32_wav(other, 16000))),
        ("broken.wav", bytearray(b"RIFFxxxxNOPE")),
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    sigs = {r["path"]: r["sig"] for r in mm.audio_fingerprint(df).collect()}
    assert sigs["broken.wav"] is None
    ham = sum(x != y for x, y in zip(sigs["a.wav"], sigs["b.wav"]))
    assert 0 < ham <= 6
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in mm.audio_near_duplicates(df, max_distance=6).collect()
    }
    assert ("a.wav", "b.wav") in pairs and pairs[("a.wav", "b.wav")] == ham
    assert not any("c.wav" in p for p in pairs)


def test_image_neardup_gate_grows_like_text_gate(spark):
    """Incremental image dedup: a batch near-dup of an INDEXED image
    drops; novel and undecodable content passes; appending the
    accepted batch's signature index makes a later near-dup of an
    accepted image drop too — the media analog of the text gate's
    grown-index contract, with history never re-decoded."""
    rng = np.random.RandomState(23)

    def img(seed_arr, edit=False):
        px = seed_arr.copy()
        if edit:
            px[4:8, 4:8] = 255
        return bytearray(make_bmp(px, 32, 32))

    base0 = rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
    novel1 = rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
    corpus = spark.createDataFrame(
        [("c0.bmp", img(base0))], "path string, content binary"
    )
    index = mm.image_signature_index(corpus)

    batch1 = spark.createDataFrame(
        [
            ("b0.bmp", img(base0, edit=True)),   # near-dup of indexed
            ("b1.bmp", img(novel1)),             # novel
            ("bad.bin", bytearray(b"not an image")),  # undecodable
        ],
        "path string, content binary",
    )
    kept1 = mm.image_neardup_gate(batch1, index)
    assert {r["path"] for r in kept1.collect()} == {"b1.bmp", "bad.bin"}
    hits1 = mm.image_neardup_gate(batch1, index, keep_hits=True)
    assert {r["path"] for r in hits1.collect()} == {"b0.bmp"}

    # grow the index with the accepted batch, then a near-dup of the
    # ACCEPTED novel image must drop — only a grown index can do that
    grown = index.unionByName(mm.image_signature_index(kept1))
    batch2 = spark.createDataFrame(
        [
            ("d0.bmp", img(novel1, edit=True)),  # near-dup of b1
            ("d1.bmp", img(rng.randint(0, 256, size=(32, 32, 3),
                                       dtype=np.uint8))),
        ],
        "path string, content binary",
    )
    kept2 = mm.image_neardup_gate(batch2, grown)
    assert {r["path"] for r in kept2.collect()} == {"d1.bmp"}


def test_audio_neardup_gate(spark):
    rng = np.random.RandomState(31)
    base = rng.randn(16000) * 0.2
    novel = rng.randn(16000) * 0.2
    corpus = spark.createDataFrame(
        [("c0.wav", bytearray(_f32_wav(base, 16000)))],
        "path string, content binary",
    )
    index = mm.audio_signature_index(corpus)
    edited = base.copy()
    edited[7000:8000] = 0.0
    batch = spark.createDataFrame(
        [
            ("b0.wav", bytearray(_f32_wav(edited, 16000))),  # near-dup
            ("b1.wav", bytearray(_f32_wav(novel, 16000))),   # novel
            ("bad.wav", bytearray(b"RIFFxxxxNOPE")),         # broken
        ],
        "path string, content binary",
    )
    kept = mm.audio_neardup_gate(batch, index)
    assert {r["path"] for r in kept.collect()} == {"b1.wav", "bad.wav"}
    hits = mm.audio_neardup_gate(batch, index, keep_hits=True)
    assert {r["path"] for r in hits.collect()} == {"b0.wav"}
