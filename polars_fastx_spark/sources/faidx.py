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

Reference parity: extends the reference's FASTA surface
(src/polars_fastx/fastx_parsers.py:70-129 parses whole files only);
random access is new capability in the same domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: .fai column schema (samtools order)
FAI_SCHEMA = "name string, length long, offset long, linebases long, linewidth long"


def build_fai(fasta_path: str, fai_path: str | None = None) -> list[tuple]:
    """One sequential pass → faidx tuples; optionally write ``.fai``.

    Returns ``[(name, length, offset, linebases, linewidth), ...]`` in
    file order. ``name`` is the header token up to the first
    whitespace (samtools convention). Raises ``ValueError`` on ragged
    interior line widths or an empty/invalid FASTA.
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

    with open(fasta_path, "rb") as f:
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


def read_fasta_regions(
    spark: SparkSession,
    fasta_path: str,
    regions: DataFrame,
    fai: DataFrame | None = None,
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
    """
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
                    f.seek(byte_from)
                    raw = f.read(byte_to - byte_from)
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
