"""samtools-faidx-style indexed random access into FASTA files.

A ``.fai`` index is the genomics-standard 5-column TSV
``name  length  offset  linebases  linewidth`` (samtools faidx):
``offset`` is the byte position of the record's first sequence
character, ``linebases`` the bases per full sequence line, and
``linewidth`` the bytes per line including the terminator. With it,
any subsequence of a 100 GB reference resolves to one byte-range read
— no parse of anything outside the requested window.

Division of labor at scale:

- :func:`build_fai` is ONE sequential pass over the file (what
  ``samtools faidx`` itself is), run once per reference on the driver
  and persisted next to the FASTA.
- :func:`read_fasta_regions` is the DISTRIBUTED side: the regions
  table (millions of loci) partitions normally; each task seeks
  directly to its regions' byte ranges via Arrow-batched
  ``mapInPandas`` — work scales with bases REQUESTED, not file size.

Indexing requires the standard faidx constraint: within a record all
sequence lines except the last have identical width (``samtools``
rejects ragged records too; :func:`build_fai` raises ``ValueError``).

BGZF composition (the actual samtools deployment layout — references
ship bgzip-compressed with a ``.fai`` + ``.gzi`` pair): for a
BGZF-compressed FASTA, :func:`build_fai` indexes DECOMPRESSED
coordinates (what samtools writes), :func:`build_gzi` materializes
the block map ``(compressed offset, uncompressed offset)`` in the
htslib ``.gzi`` binary format, and :func:`read_fasta_regions` routes
each task's byte-range reads through the block map — decompressing
only the ≤64 KiB blocks a region touches, so bytes read still scale
with bases requested. Raw (non-BGZF) gzip has no block structure to
seek into; region reads over it raise (recompress with
``bgzf.compress`` / ``recompress_to_bgzf`` first).

Reference parity: extends the reference's FASTA surface
(src/polars_fastx/fastx_parsers.py:70-129 parses whole files only);
random access is new capability in the same domain.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: .fai column schema (samtools order)
FAI_SCHEMA = "name string, length long, offset long, linebases long, linewidth long"


def build_fai(fasta_path: str, fai_path: str | None = None) -> list[tuple]:
    """One sequential pass → faidx tuples; optionally write ``.fai``.

    Returns ``[(name, length, offset, linebases, linewidth), ...]`` in
    file order. ``name`` is the header token up to the first
    whitespace (samtools convention). Raises ``ValueError`` on ragged
    interior line widths or an empty/invalid FASTA. A gzip/BGZF input
    is read through transparently and indexed in DECOMPRESSED
    coordinates — the samtools convention for bgzipped references
    (pair the ``.fai`` with :func:`build_gzi` to seek).
    """
    records: list[tuple] = []
    name = None
    length = 0
    offset = 0
    linebases = None
    linewidth = None
    prev_len = None  # bases on the previous seq line (ragged check)
    blank_in_record = False  # blank seen after seq lines of open record

    def _close() -> None:
        if name is None:
            return
        records.append(
            (name, length, offset, linebases or 0, linewidth or 0)
        )

    from polars_fastx_spark.sources.parser import open_maybe_gzip

    with open_maybe_gzip(fasta_path) as f:
        pos = 0
        for raw in f:
            line_start = pos
            pos += len(raw)
            line = raw.rstrip(b"\r\n")
            if not line:
                # A blank line's newline byte has no home in the
                # (offset, linebases, linewidth) addressing model, so a
                # blank BETWEEN sequence lines would silently misaddress
                # every base after it. Legal only at a record boundary
                # (between records / before the first header / trailing
                # EOF whitespace) — samtools faidx likewise rejects
                # blanks inside a record. Remember we saw one; raise
                # only if more sequence follows the same record.
                blank_in_record = name is not None and prev_len is not None
                continue
            if line.startswith(b">"):
                _close()
                name = line[1:].split()[0].decode()
                length, offset = 0, pos
                linebases = linewidth = prev_len = None
                blank_in_record = False
            else:
                if name is None:
                    raise ValueError(
                        f"{fasta_path}: sequence data before any '>' header"
                    )
                if blank_in_record:
                    raise ValueError(
                        f"{fasta_path}: record {name!r} has a blank "
                        "line between sequence lines — its newline "
                        "byte is unaddressable in the faidx "
                        "(offset, linebases, linewidth) model; "
                        "samtools faidx rejects such files"
                    )
                if linebases is None:
                    linebases, linewidth = len(line), len(raw)
                    offset = line_start
                else:
                    if len(line) > linebases:
                        # longer than the established width: offsets
                        # computed with `linebases` would silently
                        # misaddress every base after this line
                        raise ValueError(
                            f"{fasta_path}: record {name!r} has a "
                            f"{len(line)}-base line after "
                            f"{linebases}-base lines — faidx requires "
                            "uniform interior lines"
                        )
                    if prev_len is not None and prev_len != linebases:
                        # a SHORT line is only legal as the last line
                        raise ValueError(
                            f"{fasta_path}: record {name!r} has ragged "
                            f"line widths ({prev_len} then another "
                            "line) — faidx requires uniform interior "
                            "lines"
                        )
                prev_len = len(line)
                length += len(line)
        _close()
    if not records:
        raise ValueError(f"{fasta_path}: no FASTA records found")
    if fai_path:
        with open(fai_path, "w") as out:
            for r in records:
                out.write("\t".join(str(x) for x in r) + "\n")
    return records


def read_fai(spark: SparkSession, fai_path: str) -> DataFrame:
    """Load a ``.fai`` file as a DataFrame (FAI_SCHEMA)."""
    return (
        spark.read.csv(fai_path, sep="\t", schema=FAI_SCHEMA)
    )


def build_gzi(
    bgzf_path: str, gzi_path: str | None = None
) -> list[tuple[int, int]]:
    """Block map of a BGZF file: ``[(compressed_offset,
    uncompressed_offset), ...]`` for every block, derived from one
    header-only walk (``bgzf.block_index`` — no decompression).
    Optionally writes the htslib ``.gzi`` binary sidecar: LE uint64
    entry count, then (compressed, uncompressed) uint64 pairs for
    every block AFTER the first (block 0 is implicitly (0, 0))."""
    from polars_fastx_spark.sources import bgzf

    if not bgzf.is_bgzf_file(bgzf_path):
        raise ValueError(
            f"{bgzf_path}: not BGZF — .gzi block maps require "
            "block-compressed gzip (bgzip); recompress raw gzip first"
        )
    blocks = []
    uoff = 0
    for coff, isize in bgzf.block_index(bgzf_path):
        blocks.append((coff, uoff))
        uoff += isize
    if gzi_path:
        with open(gzi_path, "wb") as out:
            out.write(struct.pack("<Q", len(blocks) - 1))
            for coff, u in blocks[1:]:
                out.write(struct.pack("<QQ", coff, u))
    return blocks


def read_gzi(gzi_path: str) -> list[tuple[int, int]]:
    """Load an htslib-format ``.gzi`` sidecar back into the block map
    (re-prepending the implicit (0, 0) first block)."""
    with open(gzi_path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        blocks = [(0, 0)]
        for _ in range(n):
            blocks.append(struct.unpack("<QQ", f.read(16)))
    return blocks


class _BGZFRangeReader:
    """Random access into the DECOMPRESSED stream of a BGZF file via
    its block map: ``read(uoffset, length)`` bisects to the first
    touching block, then decompresses only the blocks the range
    covers (≤64 KiB each). A one-block cache makes the per-region
    loop cheap when consecutive regions land in the same block."""

    def __init__(self, f, blocks: list[tuple[int, int]]):
        self._f = f
        self._blocks = blocks
        self._uoffs = [u for _, u in blocks]
        self._cached: tuple[int, bytes] | None = None

    def _block(self, i: int) -> bytes:
        if self._cached is not None and self._cached[0] == i:
            return self._cached[1]
        from polars_fastx_spark.sources import bgzf

        _, data = bgzf._read_block(self._f, self._blocks[i][0])
        self._cached = (i, data)
        return data

    def read(self, uoffset: int, length: int) -> bytes:
        import bisect

        out = []
        need = length
        i = bisect.bisect_right(self._uoffs, uoffset) - 1
        pos = uoffset
        while need > 0 and i < len(self._blocks):
            data = self._block(i)
            lo = pos - self._uoffs[i]
            if lo >= len(data):  # zero-length block / EOF marker
                i += 1
                continue
            take = data[lo : lo + need]
            out.append(take)
            need -= len(take)
            pos += len(take)
            i += 1
        return b"".join(out)


def read_fasta_regions(
    spark: SparkSession,
    fasta_path: str,
    regions: DataFrame,
    fai: DataFrame | None = None,
    gzi: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """Distributed random-access slice read: for each region row
    ``(name, start, end)`` (0-based, half-open, clamped to the record)
    return ``(name, start, end, seq)``.

    The ≤-few-KB index broadcasts onto the regions table; each task
    then opens the FASTA once per Arrow batch and ``seek``s straight
    to ``offset + start//linebases*linewidth + start%linebases`` —
    bytes read scale with the requested window (plus its interior
    newlines), never with the file. Regions whose ``name`` is not in
    the index are dropped (inner join), mirroring ``samtools faidx``
    failing on unknown sequence names.

    A BGZF-compressed FASTA works the same way through its block map
    (``gzi``, built on demand via :func:`build_gzi` or loaded with
    :func:`read_gzi`): the ``.fai`` coordinates address the
    DECOMPRESSED stream and each task decompresses only the ≤64 KiB
    blocks its regions touch. Raw gzip cannot seek — raises.
    """
    from polars_fastx_spark.sources.parser import is_gzip_file

    compressed = is_gzip_file(fasta_path)
    if compressed and gzi is None:
        gzi = build_gzi(fasta_path)  # raises on raw (non-BGZF) gzip
    if fai is None:
        fai = spark.createDataFrame(build_fai(fasta_path), FAI_SCHEMA)
    r = (
        regions.select(
            F.col("name"),
            F.col("start").cast("long").alias("start"),
            F.col("end").cast("long").alias("end"),
        )
        .join(F.broadcast(fai), "name")
        .select(
            "name",
            F.greatest(F.lit(0), F.col("start")).alias("start"),
            F.least(F.col("length"), F.col("end")).alias("end"),
            "offset", "linebases", "linewidth",
        )
    )

    def _fetch(batches):
        import pandas as pd

        with open(fasta_path, "rb") as f:
            rdr = _BGZFRangeReader(f, gzi) if compressed else None

            def _range_read(byte_from, byte_to):
                if rdr is not None:
                    return rdr.read(byte_from, byte_to - byte_from)
                f.seek(byte_from)
                return f.read(byte_to - byte_from)

            for pdf in batches:
                seqs = []
                for name, start, end, off, lb, lw in zip(
                    pdf["name"], pdf["start"], pdf["end"],
                    pdf["offset"], pdf["linebases"], pdf["linewidth"],
                ):
                    start, end = int(start), int(end)
                    if end <= start or int(lb) == 0:
                        seqs.append("")
                        continue
                    lb, lw = int(lb), int(lw)
                    byte_from = int(off) + (start // lb) * lw + start % lb
                    byte_to = int(off) + ((end - 1) // lb) * lw + (end - 1) % lb + 1
                    raw = _range_read(byte_from, byte_to)
                    seqs.append(
                        raw.replace(b"\n", b"").replace(b"\r", b"").decode()
                    )
                yield pd.DataFrame(
                    {
                        "name": pdf["name"],
                        "start": pdf["start"],
                        "end": pdf["end"],
                        "seq": seqs,
                    }
                )

    return r.mapInPandas(
        _fetch, schema="name string, start long, end long, seq string"
    )
