"""Pure-Python FASTA/FASTQ record parsing with needletail semantics.

The reference delegates byte-level parsing to needletail (Rust;
reference: src/polars_fastx/fastx_parsers.py:8,87,104). This module
re-implements the observable semantics in plain Python for the Spark
data source's executor-side readers:

- format autodetect from content ('>' → FASTA, '@' → FASTQ);
- transparent gzip decompression (magic-byte probe, not suffix);
- ``header`` = the **full** header line after '>' / '@' (needletail's
  ``record.id`` is the full header — FIXTURES.md B1);
- FASTA: multi-line sequences concatenated; CRLF tolerated; empty
  sequences (header immediately followed by next header) allowed;
- FASTQ: sequence may span lines until the '+' separator; quality is
  read by **length**, not line framing, so '@'/'+' inside quality
  strings cannot desync the parser (SURVEY.md §7.1).

Byte-range splitting (the 100 TB path, SURVEY.md §7 hard part #1): a
plain FASTA file is split into ranges using the classic Hadoop
convention — a reader for [start, end) seeks to ``start-1``, discards
one (possibly partial) line, then owns every record whose header line
begins at a byte offset < ``end``, reading past ``end`` to finish its
last record. Every record is parsed exactly once across partitions.
FASTQ and gzip inputs are whole-file partitions ('@' resync is unsafe;
gzip is not splittable).

This code runs inside Spark Python workers via the Data Source API —
data crosses executor↔Python once per Arrow batch, not once per record
like the reference's per-record FFI (SURVEY.md §3.1).
"""

from __future__ import annotations

import gzip
import os
from collections.abc import Iterator
from typing import BinaryIO

GZIP_MAGIC = b"\x1f\x8b"


def is_gzip_file(path: str) -> bool:
    with open(path, "rb") as probe:
        return probe.read(2) == GZIP_MAGIC


def open_maybe_gzip(path: str) -> BinaryIO:
    if is_gzip_file(path):
        return gzip.open(path, "rb")  # type: ignore[return-value]
    return open(path, "rb")


def sniff_is_fastq(path: str) -> bool:
    """Driver-side one-record sniff — FASTQ iff first record starts '@'.

    Mirrors the reference's ``next(reader).is_fastq()`` schema pick
    (reference: src/polars_fastx/fastx_parsers.py:87-93).
    """
    with open_maybe_gzip(path) as f:
        for raw in f:
            line = raw.strip()
            if not line:
                continue
            if line.startswith(b"@"):
                return True
            if line.startswith(b">"):
                return False
            raise ValueError(
                f"{path}: not FASTA/FASTQ (first record starts with "
                f"{line[:1]!r}, expected '>' or '@')"
            )
    raise ValueError(f"{path}: empty file, cannot sniff FASTA vs FASTQ")


def parse_fasta_stream(f: BinaryIO) -> Iterator[tuple[str, str]]:
    """Yield (header, sequence) from a whole FASTA byte stream."""
    header: str | None = None
    chunks: list[bytes] = []
    for raw in f:
        line = raw.rstrip(b"\r\n")
        if line.startswith(b">"):
            if header is not None:
                yield header, b"".join(chunks).decode("utf-8")
            header = line[1:].decode("utf-8")
            chunks = []
        elif header is not None and line:
            chunks.append(line)
    if header is not None:
        yield header, b"".join(chunks).decode("utf-8")


def parse_fasta_range(
    path: str, start: int, end: int
) -> Iterator[tuple[str, str]]:
    """Yield (header, sequence) for records owned by byte range [start, end)."""
    with open(path, "rb") as f:
        if start > 0:
            f.seek(start - 1)
            f.readline()  # discard the line containing byte start-1
        pos = f.tell()
        header: str | None = None
        chunks: list[bytes] = []
        for raw in f:
            line_start = pos
            pos += len(raw)
            line = raw.rstrip(b"\r\n")
            if line.startswith(b">"):
                if header is not None:
                    yield header, b"".join(chunks).decode("utf-8")
                    header = None
                if line_start >= end:
                    return
                header = line[1:].decode("utf-8")
                chunks = []
            elif header is not None and line:
                chunks.append(line)
        if header is not None:
            yield header, b"".join(chunks).decode("utf-8")


def parse_fastq_stream(f: BinaryIO) -> Iterator[tuple[str, str, str]]:
    """Yield (header, sequence, quality) from a FASTQ byte stream."""
    it = iter(f)
    for raw in it:
        line = raw.rstrip(b"\r\n")
        if not line:
            continue
        if not line.startswith(b"@"):
            raise ValueError(
                f"FASTQ framing error: expected '@', got {line[:20]!r}"
            )
        header = line[1:].decode("utf-8")
        seq_chunks: list[bytes] = []
        for raw in it:
            line = raw.rstrip(b"\r\n")
            if line.startswith(b"+"):
                break
            seq_chunks.append(line)
        seq = b"".join(seq_chunks)
        qual_chunks: list[bytes] = []
        qlen = 0
        while qlen < len(seq):
            raw = next(it, None)
            if raw is None:
                raise ValueError(
                    f"FASTQ truncated: quality < sequence for {header!r}"
                )
            line = raw.rstrip(b"\r\n")
            qual_chunks.append(line)
            qlen += len(line)
        yield header, seq.decode("utf-8"), b"".join(qual_chunks).decode("utf-8")


def probe_four_line_fastq(path: str, n_records: int = 8) -> bool:
    """True when the file's first ``n_records`` are strictly 4-line
    framed (header/seq/plus/quality, quality length == sequence length).

    Large sequencing FASTQ files are universally 4-line framed; the
    probe gates byte-range splitting so the rare multi-line FASTQ falls
    back to whole-file parsing instead of desyncing.
    """
    try:
        with open_maybe_gzip(path) as f:
            for _ in range(n_records):
                lines = [f.readline().rstrip(b"\r\n") for _ in range(4)]
                if lines[0] == b"" and all(not x for x in lines):
                    return True  # clean EOF
                if not (
                    lines[0].startswith(b"@")
                    and lines[2].startswith(b"+")
                    and len(lines[3]) == len(lines[1])
                ):
                    return False
        return True
    except OSError:
        return False


def _is_record_start(lines: list[bytes], i: int, depth: int = 3) -> bool:
    """Validated 4-line record start at ``lines[i]``: checks up to
    ``depth`` consecutive records for @/+ framing and quality-length
    match — the paranoid resync of SURVEY.md §7.1 ('@' and '+' are legal
    quality characters, so a single-line check can false-positive;
    a validated chain of length-matched records cannot in practice)."""
    if i + 3 >= len(lines):
        # can't see one full record from here: not an anchor (a tail
        # fragment shorter than a record belongs to the previous range)
        return False
    checked = 0
    while checked < depth and i + 3 < len(lines):
        if not (
            lines[i].startswith(b"@")
            and lines[i + 2].startswith(b"+")
            and len(lines[i + 3]) == len(lines[i + 1])
        ):
            return False
        i += 4
        checked += 1
    return True


def parse_fastq_range(
    path: str, start: int, end: int
) -> Iterator[tuple[str, str, str]]:
    """Yield (header, sequence, quality) for 4-line FASTQ records whose
    header line starts in byte range [start, end).

    Resync: seek to ``start-1``, discard the partial line, then anchor
    on the first line offset (among the next 4 non-blank line starts)
    that begins a validated record chain. Adjacent ranges anchor on the
    same true record boundaries, so every record is parsed exactly
    once. Callers must gate with :func:`probe_four_line_fastq`.

    Blank lines (interior separators from file concatenation, double
    trailing newlines) are skipped everywhere — both in the resync
    window and in the record stream — mirroring
    :func:`parse_fastq_stream`, so splitting a file never changes its
    parse. Ownership is still decided by the header line's original
    byte offset, which blank-skipping preserves.
    """
    with open(path, "rb") as f:
        if start > 0:
            f.seek(start - 1)
            f.readline()
        # buffer a lookahead window of (offset, line) for resync;
        # blank lines are dropped here so the 4-line framing the
        # validator expects is restored
        pos = f.tell()
        window: list[tuple[int, bytes]] = []
        while len(window) < 16:
            raw = f.readline()
            if not raw:
                break
            stripped = raw.rstrip(b"\r\n")
            if stripped:
                window.append((pos, stripped))
            pos += len(raw)
        lines_only = [ln for _, ln in window]
        anchor = None
        for i in range(min(4, len(window))):
            if window[i][0] >= end:
                return  # next range owns everything from here
            if _is_record_start(lines_only, i):
                anchor = i
                break
        if anchor is None:
            # No validated record start in view. For a mid-file range
            # that means the visible lines are the tail of the previous
            # range's last record — own nothing. From byte 0 it means
            # the file itself is malformed.
            if start == 0 and window:
                raise ValueError(f"{path}: not 4-line FASTQ at byte 0")
            return

        def line_iter():
            yield from window[anchor:]
            p = pos
            while True:
                raw = f.readline()
                if not raw:
                    return
                stripped = raw.rstrip(b"\r\n")
                if stripped:
                    yield p, stripped
                p += len(raw)

        it = line_iter()
        while True:
            rec = []
            for _ in range(4):
                item = next(it, None)
                if item is None:
                    break
                rec.append(item)
            if not rec or (len(rec) == 1 and not rec[0][1]):
                return  # clean EOF (possibly one trailing empty line)
            if rec[0][0] >= end:
                return  # next range owns this record
            if len(rec) < 4:
                raise ValueError(f"{path}: FASTQ truncated near byte {rec[0][0]}")
            (_, h), (_, s), (_, plus), (_, q) = rec
            if not h.startswith(b"@") or not plus.startswith(b"+"):
                raise ValueError(
                    f"{path}: FASTQ framing error near byte {rec[0][0]}"
                )
            yield h[1:].decode("utf-8"), s.decode("utf-8"), q.decode("utf-8")


def parse_fasta_bgzf_range(
    path: str, start: int, end: int, prev: int | None
) -> Iterator[tuple[str, str]]:
    """FASTA records whose header line begins inside BGZF blocks
    [start, end) — the block-compressed twin of
    :func:`parse_fasta_range`, driven by the ownership-aware line
    stream (sources/bgzf.py)."""
    from polars_fastx_spark.sources import bgzf

    header: str | None = None
    chunks: list[bytes] = []
    for owned, line in bgzf.iter_lines_range(path, start, end, prev):
        if line.startswith(b">"):
            if header is not None:
                yield header, b"".join(chunks).decode("utf-8")
                header = None
            if not owned:
                return
            header = line[1:].decode("utf-8")
            chunks = []
        elif header is not None and line:
            chunks.append(line)
    if header is not None:
        yield header, b"".join(chunks).decode("utf-8")


def parse_fastq_bgzf_range(
    path: str, start: int, end: int, prev: int | None
) -> Iterator[tuple[str, str, str]]:
    """4-line FASTQ records whose header line begins inside BGZF blocks
    [start, end) — same validated-anchor resync as
    :func:`parse_fastq_range`, over the decompressed ownership-aware
    line stream. Callers must gate with :func:`probe_four_line_fastq`
    (which reads through gzip transparently)."""
    from polars_fastx_spark.sources import bgzf

    # Skip blank lines (interior separators from file concatenation)
    # BEFORE the 4-line framing loop, mirroring parse_fastq_range's
    # blank-tolerance — bgzip-compressing a corpus must not change its
    # parse. The ownership flag of each surviving line is untouched.
    it = (
        item
        for item in bgzf.iter_lines_range(path, start, end, prev)
        if item[1]
    )
    window: list[tuple[bool, bytes]] = []
    for item in it:
        window.append(item)
        if len(window) >= 16:
            break
    lines_only = [ln for _, ln in window]
    anchor = None
    for i in range(min(4, len(window))):
        if not window[i][0]:
            return  # first candidate already past end → next range owns
        if _is_record_start(lines_only, i):
            anchor = i
            break
    if anchor is None:
        if start == 0 and window:
            raise ValueError(f"{path}: not 4-line FASTQ at block 0")
        return

    def stream():
        yield from window[anchor:]
        yield from it

    rows = stream()
    while True:
        rec = []
        for _ in range(4):
            item = next(rows, None)
            if item is None:
                break
            rec.append(item)
        if not rec or (len(rec) == 1 and not rec[0][1]):
            return  # clean EOF (possibly one trailing empty line)
        if not rec[0][0]:
            return  # header past end → next range owns this record
        if len(rec) < 4:
            raise ValueError(f"{path}: FASTQ truncated in BGZF range")
        (_, h), (_, s), (_, plus), (_, q) = rec
        if not h.startswith(b"@") or not plus.startswith(b"+"):
            raise ValueError(f"{path}: FASTQ framing error in BGZF range")
        yield h[1:].decode("utf-8"), s.decode("utf-8"), q.decode("utf-8")


def parse_file(
    path: str, is_fastq: bool, start: int = 0, end: int | None = None,
    prev_block: int | None = None,
) -> Iterator[tuple]:
    """Parse one file, or one byte-range of an uncompressed or
    BGZF-compressed FASTX file."""
    ranged = start != 0 or end is not None
    if is_gzip_file(path):
        if ranged:
            from polars_fastx_spark.sources import bgzf

            if not bgzf.is_bgzf_file(path):
                raise ValueError("raw gzip inputs use whole-file partitions")
            stop = os.path.getsize(path) if end is None else end
            if is_fastq:
                yield from parse_fastq_bgzf_range(path, start, stop, prev_block)
            else:
                yield from parse_fasta_bgzf_range(path, start, stop, prev_block)
            return
        with open_maybe_gzip(path) as f:
            yield from (parse_fastq_stream(f) if is_fastq else parse_fasta_stream(f))
        return
    size = os.path.getsize(path)
    stop = size if end is None else end
    if is_fastq:
        if ranged:
            yield from parse_fastq_range(path, start, stop)
        else:
            with open(path, "rb") as f:
                yield from parse_fastq_stream(f)
        return
    yield from parse_fasta_range(path, start, stop)
