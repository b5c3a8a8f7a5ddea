"""Baseline JPEG codec — pure Python + numpy, no image library.

JPEG is the dominant crawl-corpus image format, and the engine's
builtin decoders (BMP/PNM/PNG-8 in ``operators/multimodal.py``)
previously covered it only through the documented Pillow injection
seam — untestable in a no-installs environment. This module implements
the BASELINE SEQUENTIAL DCT process of the public JPEG spec (ITU-T
T.81 / ISO 10918-1): 8-bit samples, Huffman entropy coding, 4:4:4 /
4:2:2 / 4:2:0 chroma subsampling, restart markers. Progressive
(SOF2) and arithmetic-coded streams raise ``NotImplementedError`` with
the injection hint — same contract as the other builtin decoders.

A matching ENCODER is included (Annex K example tables, libjpeg's
quality scaling) so tests can mint fixtures without any external
dependency, and so the decoder's correctness is pinned two ways:
encode→decode roundtrip PSNR on this codec, and — whenever Pillow IS
present — cross-codec interop (Pillow decodes our bytes, we decode
Pillow's). The decoder reads all Huffman/quant tables from the file
itself, so interop never depends on the encoder's table choices.

Decode cost is per-block Python+numpy — acceptable because media
decode is ALWAYS the modality's dominant cost and runs Arrow-batched
inside ``mapInPandas`` (see ``multimodal.image_dhash``); the 100 TB
posture is unchanged: decode scales with the batch, never history.

Reference parity: the reference (apcamargo/polars-fastx) has no image
surface; north-star extension per /root/repo/BASELINE.json:6.
"""

from __future__ import annotations

import struct

#: zigzag index -> raster index (T.81 figure A.6)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: T.81 Annex K example quantization tables (raster order)
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

#: T.81 Annex K example Huffman tables: (bits[1..16], values)
DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix():
    """8×8 orthonormal DCT-II basis M: forward F = M f Mᵀ, inverse
    f = Mᵀ F M."""
    import numpy as np

    n = np.arange(8)
    M = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) / 2.0
    M[0, :] *= 1 / np.sqrt(2)
    return M


def _canonical_codes(bits, values):
    """(length, code) -> symbol map from a T.81 (BITS, HUFFVAL) spec —
    canonical assignment per T.81 Annex C."""
    out = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _encode_codes(bits, values):
    """symbol -> (code, length) map (encoder direction)."""
    return {
        sym: (code, length)
        for (length, code), sym in _canonical_codes(bits, values).items()
    }


class _BitReader:
    """Entropy-segment bit reader: FF00 byte-stuffing removed, RSTn
    markers surfaced via ``sync_restart`` (byte-align + consume)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = (
                    self.data[self.pos + 1]
                    if self.pos + 1 < len(self.data)
                    else 0xD9
                )
                if nxt == 0x00:  # stuffed FF
                    self.pos += 2
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
                # a real marker: pad with zeros, don't consume it
                self.bitbuf = self.bitbuf << 8
                self.nbits += 8
                continue
            self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table) -> int:
        code, length = 0, 0
        while True:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
            if length > 16:
                raise ValueError("corrupt JPEG: no Huffman code matched")

    def sync_restart(self):
        """Byte-align and consume an RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if (
                self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7
            ):
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("corrupt JPEG: expected restart marker")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map an s-bit magnitude to its signed
    value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg_pixels(content: bytes):
    """(pixels, width, height, channels) of a BASELINE (SOF0) JPEG —
    the ``*_pixels`` convention of ``operators/multimodal.py``:
    flat uint8 raster, top-down, channels 1 (grayscale) or 3 (RGB,
    JFIF BT.601 YCbCr conversion). Chroma planes upsample by nearest
    (pixel replication) — within codec tolerance for every consumer
    here (dHash/feature means), and what fast decoders default to."""
    import numpy as np

    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos < len(content):
        if content[pos] != 0xFF:
            pos += 1
            continue
        marker = content[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            continue  # standalone
        seglen = struct.unpack(">H", content[pos : pos + 2])[0]
        seg = content[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq:
                    vals = struct.unpack(">64H", seg[i : i + 128])
                    i += 128
                else:
                    vals = seg[i : i + 64]
                    i += 64
                tbl = np.zeros(64, dtype=np.float64)
                for z, v in enumerate(vals):
                    tbl[ZIGZAG[z]] = v
                quant[tq] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                (huff_ac if tc else huff_dc)[th] = _canonical_codes(
                    bits, vals
                )
                i += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            prec, h, w, nc = (
                seg[0],
                struct.unpack(">H", seg[1:3])[0],
                struct.unpack(">H", seg[3:5])[0],
                seg[5],
            )
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/1) supported; "
                "inject decoder=... (e.g. pillow_image_decoder) for "
                "progressive/arithmetic streams"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(
                    x for x in frame["comps"] if x["id"] == cs
                )
                scan.append(
                    {"comp": comp, "dc": tdta >> 4, "ac": tdta & 0xF}
                )
            data_start = pos + seglen
            return _decode_scan(
                np, content, data_start, frame, scan, quant,
                huff_dc, huff_ac, restart_interval,
            )
        pos += seglen
    raise ValueError("corrupt JPEG: no SOS segment")


def _decode_scan(np, content, data_start, frame, scan, quant,
                 huff_dc, huff_ac, restart_interval):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes[c["id"]] = np.zeros((ph, pw), dtype=np.float64)
    M = _dct_matrix()
    reader = _BitReader(content, data_start)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                reader.sync_restart()
                pred = {c["id"]: 0 for c in comps}
            for sc in scan:
                c = sc["comp"]
                qt = quant[c["tq"]]
                dct = huff_dc[sc["dc"]]
                act = huff_ac[sc["ac"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.float64)
                        s = reader.decode_huff(dct)
                        diff = _extend(reader.receive(s), s)
                        pred[c["id"]] += diff
                        coef[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(act)
                            r, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "corrupt JPEG: AC index overflow"
                                )
                            coef[ZIGZAG[k]] = _extend(
                                reader.receive(size), size
                            )
                            k += 1
                        block = coef.reshape(8, 8) * qt
                        px = M.T @ block @ M + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1
    # upsample to full resolution (nearest) and crop
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return out.reshape(-1), w, h, 1
    if len(full) != 3:
        raise NotImplementedError("only 1- or 3-component JPEG")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return out.reshape(-1), w, h, 3


# ------------------------------------------------------------- encoder

def _quality_tables(quality: int):
    """libjpeg quality scaling of the Annex K tables (public
    formula)."""
    import numpy as np

    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = [(v * scale + 50) // 100 for v in base]
        out.append(
            np.array([min(255, max(1, v)) for v in t], dtype=np.float64)
            .reshape(8, 8)
        )
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _encode_block(wtr, block, qt, dc_codes, ac_codes, pred, M, np):
    coef = M @ (block - 128.0) @ M.T
    q = np.round(coef / qt).astype(np.int64)
    zz = [int(q.reshape(-1)[ZIGZAG[z]]) for z in range(64)]
    diff = zz[0] - pred
    s = int(diff).bit_length() if diff else 0
    code, ln = dc_codes[s]
    wtr.write(code, ln)
    if s:
        v = diff if diff > 0 else diff + (1 << s) - 1
        wtr.write(v, s)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, 64):
        if k > last_nz:
            code, ln = ac_codes[0x00]  # EOB
            wtr.write(code, ln)
            break
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            wtr.write(code, ln)
            run -= 16
        size = abs(v).bit_length()
        code, ln = ac_codes[(run << 4) | size]
        wtr.write(code, ln)
        mag = v if v > 0 else v + (1 << size) - 1
        wtr.write(mag, size)
        run = 0
    return zz[0]


def encode_jpeg_baseline(
    pixels, width: int, height: int, channels: int,
    quality: int = 85, subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode a flat uint8 raster (the ``*_pixels`` convention) as a
    baseline JFIF JPEG. ``subsample`` = '444' or '420' (3-channel
    only); ``restart_interval`` > 0 emits DRI + RSTn markers every N
    MCUs (what camera/crawl JPEGs carry for error resilience — and the
    decoder path worth testing). Annex K Huffman tables are embedded
    in the stream, so ANY baseline decoder reads the output — interop
    never depends on this module's constants."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.float64).reshape(
        height, width, channels
    )
    if channels == 3:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample == "420":
            hv = [(2, 2), (1, 1), (1, 1)]
        elif subsample == "444":
            hv = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError("subsample must be '444' or '420'")
        planes = [y, cb, cr]
    elif channels == 1:
        planes = [px[..., 0]]
        hv = [(1, 1)]
    else:
        raise ValueError("channels must be 1 or 3")
    qluma, qchroma = _quality_tables(quality)
    M = _dct_matrix()
    hmax = max(h for h, _ in hv)
    vmax = max(v for _, v in hv)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))

    padded = []
    for p, (ch, cv) in zip(planes, hv):
        # subsample by box mean, pad by edge replication to MCU grid
        if ch != hmax or cv != vmax:
            fy, fx = vmax // cv, hmax // ch
            ph = -(-p.shape[0] // fy) * fy
            pw = -(-p.shape[1] // fx) * fx
            p = np.pad(
                p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                mode="edge",
            )
            p = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        th, tw = mcuy * 8 * cv, mcux * 8 * ch
        p = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        )
        padded.append(p)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"

    def _dqt(tid, tbl):
        zz = bytes(int(tbl.reshape(-1)[ZIGZAG[z]]) for z in range(64))
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz

    out += _dqt(0, qluma)
    if channels == 3:
        out += _dqt(1, qchroma)
    # SOF0
    nc = channels
    sof = struct.pack(">BHHB", 8, height, width, nc)
    for i in range(nc):
        tq = 0 if i == 0 else 1
        sof += bytes([i + 1, (hv[i][0] << 4) | hv[i][1], tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def _dht(tc, th, spec):
        bits, vals = spec
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += _dht(0, 0, DC_LUMA) + _dht(1, 0, AC_LUMA)
    if channels == 3:
        out += _dht(0, 1, DC_CHROMA) + _dht(1, 1, AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([nc])
    for i in range(nc):
        t = 0 if i == 0 else 1
        sos += bytes([i + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_l, ac_l = _encode_codes(*DC_LUMA), _encode_codes(*AC_LUMA)
    dc_c, ac_c = _encode_codes(*DC_CHROMA), _encode_codes(*AC_CHROMA)
    wtr = _BitWriter()
    pred = [0] * nc
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                wtr.flush()
                out += wtr.out
                wtr = _BitWriter()
                rst = (mcu_count // restart_interval - 1) % 8
                out += bytes([0xFF, 0xD0 + rst])
                pred = [0] * nc
            mcu_count += 1
            for ci in range(nc):
                ch, cv = hv[ci]
                qt = qluma if ci == 0 else qchroma
                dct = dc_l if ci == 0 else dc_c
                act = ac_l if ci == 0 else ac_c
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        pred[ci] = _encode_block(
                            wtr, block, qt, dct, act, pred[ci], M, np
                        )
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
