"""BGZF (bgzip) splittable compressed FASTX — sources/bgzf.py.

The load-bearing claims: (1) a bgzip file yields MULTIPLE byte-range
partitions where raw gzip yields one; (2) a split scan returns exactly
the same records as the whole-file scan (no dup, no loss, for any
block/range alignment — records straddle block boundaries on purpose);
(3) the writer emits files the stock gzip module reads (bgzip
compatibility).
"""

from __future__ import annotations

import gzip
import os

import pytest

from polars_fastx_spark.sources import bgzf, parser
from polars_fastx_spark.sources.fastx import scan_fastx


def _mk_fasta(n=400, seed=1):
    """Multi-line FASTA with varied record lengths so records straddle
    the small BGZF blocks used in these tests."""
    out = []
    for i in range(n):
        seq = ("ACGT" * (10 + (i * seed) % 37))[: 17 + (i * 13) % 211]
        lines = [seq[j : j + 60] for j in range(0, len(seq), 60)]
        out.append(f">rec{i} d{i % 7}\n" + "\n".join(lines) + "\n")
    return "".join(out).encode()


def _write(tmp_path, name, payload, block_data):
    p = tmp_path / name
    p.write_bytes(bgzf.compress(payload, block_data=block_data))
    return str(p)


def test_compress_is_stock_gzip_readable(tmp_path):
    payload = _mk_fasta(50)
    path = _write(tmp_path, "a.fasta.gz", payload, block_data=512)
    assert gzip.open(path, "rb").read() == payload
    assert bgzf.is_bgzf_file(path)
    assert parser.is_gzip_file(path)


def test_raw_gzip_is_not_bgzf(tmp_path):
    p = tmp_path / "raw.fasta.gz"
    with gzip.open(p, "wb") as f:
        f.write(_mk_fasta(50))
    assert not bgzf.is_bgzf_file(str(p))


def test_block_index_covers_file(tmp_path):
    payload = _mk_fasta(100)
    path = _write(tmp_path, "b.fasta.gz", payload, block_data=1024)
    idx = bgzf.block_index(path)
    assert len(idx) > 3                       # many blocks + EOF marker
    assert idx[0][0] == 0
    assert sum(isize for _, isize in idx) == len(payload)
    # offsets strictly increasing and chain ends exactly at file size
    offs = [o for o, _ in idx]
    assert offs == sorted(set(offs))


def test_iter_lines_range_partitions_lines_exactly_once(tmp_path):
    payload = _mk_fasta(120)
    path = _write(tmp_path, "c.fasta.gz", payload, block_data=700)
    size = os.path.getsize(path)
    idx = bgzf.block_index(path)
    want = payload.decode().splitlines()
    for split in (900, 2000, 10**9):
        ranges = bgzf.split_ranges(idx, split, size)
        got = []
        for s, e, prev in ranges:
            for owned, line in bgzf.iter_lines_range(path, s, e, prev):
                if owned:
                    got.append(line.decode())
        assert got == want, f"split={split}"


def test_fasta_bgzf_range_parser_no_dup_no_loss(tmp_path):
    payload = _mk_fasta(200)
    path = _write(tmp_path, "d.fasta.gz", payload, block_data=600)
    size = os.path.getsize(path)
    idx = bgzf.block_index(path)
    whole = list(parser.parse_file(path, is_fastq=False))
    assert len(whole) == 200
    for split in (1000, 3000, 7777):
        got = []
        for s, e, prev in bgzf.split_ranges(idx, split, size):
            got.extend(parser.parse_fasta_bgzf_range(path, s, e, prev))
        assert got == whole, f"split={split}"


def test_bgzf_fasta_scan_splits_and_matches_whole(spark, tmp_path):
    payload = _mk_fasta(400)
    path = _write(tmp_path, "big.fasta.gz", payload, block_data=800)
    whole = scan_fastx(spark, path)
    split = scan_fastx(spark, path, split_bytes=4096)
    assert whole.rdd.getNumPartitions() == 1  # under default 128 MB target
    assert split.rdd.getNumPartitions() > 1
    a = sorted((r["header"], r["sequence"]) for r in split.collect())
    b = sorted((r["header"], r["sequence"]) for r in whole.collect())
    assert a == b and len(a) == 400


def test_bgzf_fastq_scan_splits_and_matches_whole(spark, tmp_path):
    rows = []
    for i in range(500):
        seq = "ACGTN" * (4 + i % 9)
        rows.append(f"@q{i} m\n{seq}\n+\n{'@' + 'J' * (len(seq) - 1)}\n")
    payload = "".join(rows).encode()
    path = tmp_path / "big.fastq.gz"
    path.write_bytes(bgzf.compress(payload, block_data=700))
    split = scan_fastx(spark, str(path), split_bytes=3000)
    assert split.rdd.getNumPartitions() > 1
    got = {r["header"]: (r["sequence"], r["quality"]) for r in split.collect()}
    assert len(got) == 500 and split.count() == 500
    assert got["q7 m"][0] == "ACGTN" * (4 + 7 % 9)


def test_bgzf_fastq_tolerates_blank_separator_lines(tmp_path):
    """Interior blank lines (file-concatenation separators) parse
    identically through the plain-text ranged path and the BGZF ranged
    path — compressing a corpus must not change its parse."""
    recs = []
    for i in range(80):
        seq = "ACGT" * (3 + i % 5)
        sep = "\n" if i % 7 == 3 else ""  # blank line after some records
        recs.append(f"@r{i}\n{seq}\n+\n{'F' * len(seq)}\n{sep}")
    payload = "".join(recs).encode()
    plain = tmp_path / "cat.fastq"
    plain.write_bytes(payload)
    whole = list(parser.parse_file(str(plain), is_fastq=True))
    assert len(whole) == 80
    path = str(tmp_path / "cat.fastq.gz")
    (tmp_path / "cat.fastq.gz").write_bytes(
        bgzf.compress(payload, block_data=400)
    )
    size = os.path.getsize(path)
    idx = bgzf.block_index(path)
    for split in (600, 1500, 10**9):
        got = []
        for s, e, prev in bgzf.split_ranges(idx, split, size):
            got.extend(parser.parse_fastq_bgzf_range(path, s, e, prev))
        assert got == whole, f"split={split}"


def test_raw_gzip_still_whole_file_partition(spark, tmp_path):
    p = tmp_path / "raw.fasta.gz"
    with gzip.open(p, "wb") as f:
        f.write(_mk_fasta(400))
    df = scan_fastx(spark, str(p), split_bytes=1024)
    assert df.rdd.getNumPartitions() == 1
    assert df.count() == 400


def test_bgzf_multiline_fastq_not_split(spark, tmp_path):
    payload = b"".join(
        f"@m{i}\nACGT\nACGT\n+\nIIII\nIIII\n".encode() for i in range(300)
    )
    p = tmp_path / "ml.fastq.gz"
    p.write_bytes(bgzf.compress(payload, block_data=512))
    df = scan_fastx(spark, str(p), split_bytes=1024)
    assert df.rdd.getNumPartitions() == 1          # 4-line probe fails → whole
    assert df.count() == 300


def test_write_fastx_bgzf_roundtrip_splittable(spark, tmp_path):
    """write_fastx(compression='bgzf') parts read back through the
    splittable scan path: multiple byte-range partitions, exact rows."""
    # big enough that each part holds several 64 KiB BGZF blocks, so the
    # read-back scan can split WITHIN part files
    rows = [(f"r{i}", "ACGT" * (200 + i % 300)) for i in range(2000)]
    df = spark.createDataFrame(rows, "header string, sequence string")
    out = str(tmp_path / "sink")
    from polars_fastx_spark.sources.sinks import write_fastx

    write_fastx(df.repartition(6), out, compression="bgzf")

    import glob

    parts = glob.glob(out + "/part-*.fasta.gz")
    assert len(parts) >= 1
    assert all(bgzf.is_bgzf_file(p) for p in parts)

    back = scan_fastx(spark, out + "/part-*.fasta.gz", split_bytes=1024)
    assert back.rdd.getNumPartitions() > len(parts)  # ranges within parts
    got = sorted((r["header"], r["sequence"]) for r in back.collect())
    assert got == sorted(rows)


def test_write_fastx_bgzf_fastq_roundtrip(spark, tmp_path):
    rows = [
        (f"q{i}", "ACGTN" * (2 + i % 5), "J" * (5 * (2 + i % 5)))
        for i in range(800)
    ]
    df = spark.createDataFrame(rows, "header string, sequence string, quality string")
    out = str(tmp_path / "sinkq")
    from polars_fastx_spark.sources.sinks import write_fastx

    write_fastx(df.repartition(3), out, compression="bgzf")
    back = scan_fastx(spark, out + "/part-*.fastq.gz", split_bytes=2048)
    got = sorted(
        (r["header"], r["sequence"], r["quality"]) for r in back.collect()
    )
    assert got == sorted(rows)
