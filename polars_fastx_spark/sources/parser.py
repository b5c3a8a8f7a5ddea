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


def parse_file(
    path: str, is_fastq: bool, start: int = 0, end: int | None = None
) -> Iterator[tuple]:
    """Parse one file, or one byte-range of an uncompressed FASTA file."""
    if is_fastq or is_gzip_file(path):
        if start != 0 or end is not None:
            raise ValueError("FASTQ/gzip inputs use whole-file partitions")
        with open_maybe_gzip(path) as f:
            if is_fastq:
                yield from parse_fastq_stream(f)
            else:
                yield from parse_fasta_stream(f)
        return
    size = os.path.getsize(path)
    yield from parse_fasta_range(path, start, size if end is None else end)
