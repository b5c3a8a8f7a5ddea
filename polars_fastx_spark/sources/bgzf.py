"""BGZF (bgzip) block-compressed FASTX — the splittable-gzip layout.

Raw gzip is not splittable: one ``.gz`` file scans on one task no
matter its size. The bioinformatics-standard answer is BGZF (the
framing under BAM/tabix, htslib's ``bgzip``): the file is a
concatenation of independent gzip members, each ≤ 64 KiB, whose header
carries a ``BC`` extra subfield with the block's compressed length —
so any block boundary is a safe decompression entry point, and a
100 TB compressed sequence archive parses with byte-range parallelism
just like plain text.

What lives here (all pure stdlib — ``zlib`` + ``struct``):

- block detection (:func:`is_bgzf_file`) and the whole-file block
  index (:func:`block_index` — compressed offset + ISIZE per block, a
  header-only walk; large deployments would persist this as the
  standard ``.gzi`` sidecar instead of re-walking);
- range planning (:func:`split_ranges` — group blocks into
  ~``split_bytes`` compressed ranges; each range also records the
  preceding non-empty block so the reader can apply the classic
  "discard the line containing byte start−1" Hadoop convention
  without decompressing the whole prefix);
- the ownership-aware line stream (:func:`iter_lines_range`): a range
  [start, end) owns exactly the lines that BEGIN inside the
  decompressed bytes of its blocks, and keeps decompressing past
  ``end`` so a record straddling the boundary finishes — every record
  parsed exactly once across partitions, the same contract as
  ``parser.parse_fasta_range``;
- a writer (:func:`compress`) used by sinks/tests to produce
  bgzip-compatible files.

Reference parity: the reference reads plain/gzip FASTX via needletail
(src/polars_fastx/fastx_parsers.py:70-129) and has no splittable
compression story; this is the 100 TB posture the brief demands.
"""

from __future__ import annotations

import os
import struct
import zlib
from collections.abc import Iterator
from typing import BinaryIO

#: gzip magic + FLG.FEXTRA set — the only legal start of a BGZF block
_HDR_MAGIC = b"\x1f\x8b\x08\x04"

#: the canonical 28-byte EOF marker block every bgzip file ends with
EOF_BLOCK = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)

#: max decompressed payload per block (htslib convention: 64 KiB − 256)
MAX_BLOCK_DATA = 65280


def _bsize_from_header(head: bytes) -> int | None:
    """Total compressed block length if ``head`` opens a BGZF block
    (gzip + FEXTRA + a ``BC`` subfield), else None. ``head`` must hold
    at least the 12 fixed bytes plus the XLEN extra bytes."""
    if len(head) < 12 or head[:4] != _HDR_MAGIC:
        return None
    xlen = struct.unpack_from("<H", head, 10)[0]
    if len(head) < 12 + xlen:
        return None
    pos = 12
    end = 12 + xlen
    while pos + 4 <= end:
        si1, si2, slen = head[pos], head[pos + 1], struct.unpack_from("<H", head, pos + 2)[0]
        if si1 == 0x42 and si2 == 0x43 and slen == 2:  # 'B' 'C'
            return struct.unpack_from("<H", head, pos + 4)[0] + 1
        pos += 4 + slen
    return None


def is_bgzf_file(path: str) -> bool:
    with open(path, "rb") as f:
        head = f.read(64)
    return _bsize_from_header(head) is not None


def _read_block(f: BinaryIO, offset: int) -> tuple[int, bytes]:
    """(compressed length, decompressed bytes) of the block at
    ``offset``; one seek + one read + one zlib call."""
    f.seek(offset)
    head = f.read(64)
    bsize = _bsize_from_header(head)
    if bsize is None:
        raise ValueError(f"not a BGZF block at byte {offset}")
    f.seek(offset)
    return bsize, zlib.decompress(f.read(bsize), 31)


def block_index(path: str) -> list[tuple[int, int]]:
    """[(compressed_offset, decompressed_size)] for every block — a
    header-only walk (2 small reads per block, no decompression). At
    warehouse scale this is the ``.gzi`` sidecar; locally it is cheap
    enough to rebuild at plan time."""
    out: list[tuple[int, int]] = []
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        off = 0
        while off < size:
            f.seek(off)
            head = f.read(64)
            bsize = _bsize_from_header(head)
            if bsize is None:
                raise ValueError(f"{path}: BGZF chain broken at byte {off}")
            f.seek(off + bsize - 4)
            isize = struct.unpack("<I", f.read(4))[0]
            out.append((off, isize))
            off += bsize
    return out


def split_ranges(
    index: list[tuple[int, int]], split_bytes: int, file_size: int
) -> list[tuple[int, int, int | None]]:
    """Group blocks into (start, end, prev_nonempty) compressed ranges
    of roughly ``split_bytes`` compressed bytes each. ``end`` of the
    last range is the file size (no block starts there → the reader
    owns everything to EOF); ``prev_nonempty`` is the offset of the
    closest preceding block with decompressed bytes, used by the
    reader to decide whether its first line is a continuation."""
    starts: list[int] = [0]
    acc_from = 0
    for off, _ in index:
        if off > acc_from and off - acc_from >= split_bytes:
            starts.append(off)
            acc_from = off
    out: list[tuple[int, int, int | None]] = []
    # one forward sweep over the (sorted) non-empty offsets in lockstep
    # with the (sorted) range starts — O(blocks), not O(ranges·blocks):
    # a 100 GB file is ~1.6M blocks, and a rescan per range would make
    # partition planning quadratic
    nonempty = [off for off, isize in index if isize > 0]
    j = 0
    prev: int | None = None
    for i, s in enumerate(starts):
        e = starts[i + 1] if i + 1 < len(starts) else file_size
        while j < len(nonempty) and nonempty[j] < s:
            prev = nonempty[j]
            j += 1
        out.append((s, e, prev))
    return out


def iter_lines_range(
    path: str, start: int, end: int, prev: int | None
) -> Iterator[tuple[bool, bytes]]:
    """Yield ``(owned, line)`` for complete lines (sans newline) of the
    decompressed stream beginning at block ``start``.

    ``owned`` is True iff the line STARTS within the decompressed bytes
    of blocks [start, end) — adjacent ranges agree on ownership because
    block boundaries are absolute. The stream continues past ``end``
    (yielding owned=False) until EOF or the caller stops, so a record
    straddling the boundary can finish. The first line is discarded
    when the preceding block (``prev``) does not end in a newline —
    that continuation belongs to the previous range, which reads past
    its own ``end`` to complete it (the seek-to-start−1 convention of
    ``parser.parse_fasta_range``, block-aligned).
    """
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        discard_first = False
        if start > 0 and prev is not None:
            _, pd = _read_block(f, prev)
            discard_first = bool(pd) and not pd.endswith(b"\n")
        off = start
        cum = 0                 # decompressed bytes appended so far
        owned_limit: int | None = None   # local offset where block `end` begins
        pending = b""
        pending_start = 0       # local offset of pending[0]
        while True:
            if owned_limit is None and off >= end:
                owned_limit = cum
            if off >= size:
                break
            bsize, data = _read_block(f, off)
            off += bsize
            cum += len(data)
            pending += data
            while True:
                i = pending.find(b"\n")
                if i < 0:
                    break
                line = pending[:i].rstrip(b"\r")
                line_start = pending_start
                pending = pending[i + 1 :]
                pending_start += i + 1
                if discard_first:
                    discard_first = False
                    continue
                yield (
                    owned_limit is None or line_start < owned_limit,
                    line,
                )
        if pending and not discard_first:
            yield (
                owned_limit is None or pending_start < owned_limit,
                pending.rstrip(b"\r"),
            )


def encode_block(chunk: bytes, level: int = 6) -> bytes:
    """One BGZF member for ≤``MAX_BLOCK_DATA`` bytes of payload."""
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    cdata = co.compress(chunk) + co.flush()
    bsize = 12 + 6 + len(cdata) + 8  # header+extra+deflate+crc/isize
    if bsize - 1 > 0xFFFF:
        raise ValueError("BGZF block overflow — lower the payload size")
    out = bytearray()
    out += _HDR_MAGIC
    out += struct.pack("<IBB", 0, 0, 0xFF)       # mtime, XFL, OS
    out += struct.pack("<H", 6)                  # XLEN
    out += b"BC" + struct.pack("<HH", 2, bsize - 1)
    out += cdata
    out += struct.pack("<II", zlib.crc32(chunk), len(chunk) & 0xFFFFFFFF)
    return bytes(out)


def compress(data: bytes, level: int = 6, block_data: int = MAX_BLOCK_DATA) -> bytes:
    """bgzip-compatible BGZF encoding of ``data`` (used by tests and
    sinks): independent ≤64 KiB members with the ``BC`` length
    subfield, terminated by the canonical EOF marker block."""
    out = bytearray()
    for i in range(0, len(data), block_data):
        out += encode_block(data[i : i + block_data], level)
    out += EOF_BLOCK
    return bytes(out)


def recompress_to_bgzf(
    src_path: str,
    dst_path: str,
    level: int = 6,
    block_data: int = MAX_BLOCK_DATA,
) -> int:
    """One-pass gzip→BGZF migration: stream-decompress a raw-gzip (or
    plain) file and re-emit it as independent BGZF blocks + the EOF
    marker. Returns the data-block count.

    Raw gzip is one DEFLATE stream — a scan gets exactly one task per
    file no matter how big it is. This utility is the one-time escape
    hatch: after migration the archive splits into byte-range
    partitions like any BGZF input (``scan_fastx`` detects it
    automatically), and ``build_gzi``/``read_fasta_regions`` can
    random-access it. Constant memory (one ≤64 KiB block in flight);
    run per-file, fan the file list out with a parallel driver loop or
    a binaryFile-listing job at archive scale.
    """
    from polars_fastx_spark.sources.parser import open_maybe_gzip

    if os.path.abspath(src_path) == os.path.abspath(dst_path):
        raise ValueError("recompress_to_bgzf must write to a different path")
    n = 0
    with open_maybe_gzip(src_path) as src, open(dst_path, "wb") as dst:
        while True:
            chunk = src.read(block_data)
            if not chunk:
                break
            dst.write(encode_block(chunk, level))
            n += 1
        dst.write(EOF_BLOCK)
    return n
