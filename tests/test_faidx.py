"""sources/faidx.py: samtools-faidx-style indexed FASTA region reads.

Index build is hand-checked against the faidx spec; region reads run a
randomized differential against substrings of the fully-parsed file."""

from __future__ import annotations

import random

import pytest

from polars_fastx_spark.sources import faidx


FASTA = (
    ">chr1 description text\n"
    "ACGTACGTAC\n"
    "GTACGTACGT\n"
    "ACG\n"
    ">chr2\n"
    "TTTTGGGGCC\n"
    "AA\n"
    ">empty_tail\n"
    "CCCCCCCCCC\n"
)


@pytest.fixture()
def fasta(tmp_path):
    p = tmp_path / "ref.fasta"
    p.write_text(FASTA)
    return str(p)


def test_build_fai_matches_spec(fasta):
    idx = faidx.build_fai(fasta)
    # name, length, offset(first seq byte), linebases, linewidth
    # ">chr1 description text\n" is 23 bytes -> chr1 seq at 23; its
    # 11+11+4 seq bytes end at 49; ">chr2\n" -> seq at 55; 11+3 bytes
    # -> ">empty_tail\n" -> seq at 81
    assert idx[0] == ("chr1", 23, 23, 10, 11)
    assert idx[1] == ("chr2", 12, 55, 10, 11)
    assert idx[2] == ("empty_tail", 10, 81, 10, 11)


def test_build_fai_writes_tsv_roundtrip(spark, fasta, tmp_path):
    fai_path = str(tmp_path / "ref.fasta.fai")
    built = faidx.build_fai(fasta, fai_path)
    loaded = [
        (r.name, r.length, r.offset, r.linebases, r.linewidth)
        for r in faidx.read_fai(spark, fai_path).collect()
    ]
    assert sorted(loaded) == sorted(built)


def test_build_fai_rejects_ragged_records(tmp_path):
    p = tmp_path / "bad.fasta"
    p.write_text(">x\nACGTACGT\nACG\nACGTACGT\n")  # short INTERIOR line
    with pytest.raises(ValueError, match="ragged"):
        faidx.build_fai(str(p))
    p.write_text(">x\nACG\nACGTACGT\n")  # LONGER-than-first line
    with pytest.raises(ValueError, match="base line after"):
        faidx.build_fai(str(p))


def test_build_fai_rejects_headerless(tmp_path):
    p = tmp_path / "bad.fasta"
    p.write_text("ACGT\n")
    with pytest.raises(ValueError, match="before any"):
        faidx.build_fai(str(p))


def test_build_fai_rejects_blank_inside_record(tmp_path):
    """A blank line BETWEEN sequence lines is unaddressable in the
    (offset, linebases, linewidth) model — silently skipping it would
    misread every base after it ('ACGT\\n\\nACGT' indexes as lb=4/lw=5
    but bases 4..8 land on the blank). samtools faidx also rejects."""
    p = tmp_path / "bad.fasta"
    p.write_text(">x\nACGT\n\nACGT\n")
    with pytest.raises(ValueError, match="blank line between"):
        faidx.build_fai(str(p))


def test_build_fai_accepts_blanks_at_record_boundaries(tmp_path):
    """Blanks BETWEEN records, before the first header, and trailing at
    EOF don't touch any record's addressing — still legal."""
    p = tmp_path / "ok.fasta"
    p.write_text("\n>x\nACGT\nAC\n\n\n>y\nGGGG\n\n")
    idx = faidx.build_fai(str(p))
    assert [(r[0], r[1]) for r in idx] == [("x", 6), ("y", 4)]


def test_region_reads_match_full_parse_substrings(spark, fasta):
    """Randomized differential: every region slice equals the substring
    of the record parsed whole — including line-boundary straddles,
    whole records, clamped overshoots, and empty windows."""
    full = {}
    for block in FASTA.split(">")[1:]:
        lines = block.splitlines()
        full[lines[0].split()[0]] = "".join(lines[1:])

    rng = random.Random(20260815)
    cases = [
        ("chr1", 0, 23), ("chr1", 9, 11), ("chr1", 10, 20),
        ("chr1", 19, 23), ("chr2", 0, 12), ("chr2", 5, 5),
        ("chr1", 20, 99), ("chr1", -3, 4), ("empty_tail", 3, 7),
        ("nope", 0, 5),  # unknown name: dropped
    ]
    for _ in range(40):
        name = rng.choice(list(full))
        a = rng.randint(0, len(full[name]))
        b = rng.randint(0, len(full[name]))
        cases.append((name, min(a, b), max(a, b)))
    regions = spark.createDataFrame(cases, "name string, start long, end long")
    got = {
        (r.name, r.start, r.end): r.seq
        for r in faidx.read_fasta_regions(spark, fasta, regions).collect()
    }
    assert ("nope", 0, 5) not in got
    for name, start, end in cases:
        if name not in full:
            continue
        lo = max(0, start)
        hi = min(len(full[name]), end)
        want = full[name][lo:hi] if hi > lo else ""
        assert got[(name, lo, hi)] == want, (name, start, end)


def test_region_reads_accept_prebuilt_index(spark, fasta, tmp_path):
    fai_path = str(tmp_path / "ref.fasta.fai")
    faidx.build_fai(fasta, fai_path)
    fai = faidx.read_fai(spark, fai_path)
    regions = spark.createDataFrame(
        [("chr2", 8, 12)], "name string, start long, end long"
    )
    rows = faidx.read_fasta_regions(spark, fasta, regions, fai=fai).collect()
    assert [(r.name, r.seq) for r in rows] == [("chr2", "CCAA")]


def test_cli_faidx_and_regions(fasta, tmp_path, capsys):
    """CLI: `faidx` writes the index, `regions` slices through it."""
    from polars_fastx_spark.__main__ import main

    fai_path = str(tmp_path / "ref.fai")
    assert main(["faidx", fasta, "-o", fai_path]) == 0
    lines = open(fai_path).read().splitlines()
    assert len(lines) == 3 and lines[0].startswith("chr1\t23\t23\t10\t11")
    capsys.readouterr()
    assert main(
        ["regions", fasta, "chr1:0-10", "chr2:8-12", "--fai", fai_path]
    ) == 0
    out = capsys.readouterr().out.splitlines()
    assert out == ["chr1\t0\t10\tACGTACGTAC", "chr2\t8\t12\tCCAA"]


def _mk_big_fasta(n=60, seed=3):
    out = []
    import random as _r

    rng = _r.Random(seed)
    for i in range(n):
        seq = "".join(rng.choice("ACGT") for _ in range(50 + (i * 37) % 400))
        lines = [seq[j : j + 60] for j in range(0, len(seq), 60)]
        out.append(f">ctg{i} meta{i}\n" + "\n".join(lines) + "\n")
    return "".join(out)


def test_gzi_roundtrip_matches_block_index(tmp_path):
    from polars_fastx_spark.sources import bgzf

    payload = _mk_big_fasta().encode()
    p = tmp_path / "ref.fasta.gz"
    p.write_bytes(bgzf.compress(payload, block_data=1000))
    gzi_path = str(tmp_path / "ref.fasta.gz.gzi")
    blocks = faidx.build_gzi(str(p), gzi_path)
    assert blocks[0] == (0, 0)
    # uncompressed offsets are the running sum of block isizes
    assert blocks[-1][1] + dict(
        (o, s) for o, s in bgzf.block_index(str(p))
    )[blocks[-1][0]] == len(payload)
    assert faidx.read_gzi(gzi_path) == blocks


def test_bgzf_region_reads_match_plain_text_reads(spark, tmp_path):
    """The samtools deployment layout: .fai (decompressed coords) +
    .gzi over a bgzip-compressed reference. Randomized differential:
    every region read through the block map equals the same read on
    the uncompressed file."""
    from polars_fastx_spark.sources import bgzf

    text = _mk_big_fasta()
    plain = tmp_path / "ref.fasta"
    plain.write_text(text)
    comp = tmp_path / "ref.fasta.gz"
    comp.write_bytes(bgzf.compress(text.encode(), block_data=700))
    # identical .fai either way: decompressed coordinates
    assert faidx.build_fai(str(plain)) == faidx.build_fai(str(comp))

    full = {}
    for block in text.split(">")[1:]:
        lines = block.splitlines()
        full[lines[0].split()[0]] = "".join(lines[1:])
    rng = random.Random(5)
    cases = []
    for _ in range(80):
        name = rng.choice(list(full))
        a, b = rng.randint(0, len(full[name])), rng.randint(0, len(full[name]))
        cases.append((name, min(a, b), max(a, b)))
    regions = spark.createDataFrame(cases, "name string, start long, end long")
    got_c = {
        (r.name, r.start, r.end): r.seq
        for r in faidx.read_fasta_regions(
            spark, str(comp), regions
        ).collect()
    }
    got_p = {
        (r.name, r.start, r.end): r.seq
        for r in faidx.read_fasta_regions(
            spark, str(plain), regions
        ).collect()
    }
    assert got_c == got_p
    for name, start, end in cases:
        assert got_c[(name, start, end)] == full[name][start:end]


def test_bgzf_region_reads_accept_prebuilt_gzi(spark, tmp_path):
    from polars_fastx_spark.sources import bgzf

    text = _mk_big_fasta(10)
    comp = tmp_path / "r.fa.gz"
    comp.write_bytes(bgzf.compress(text.encode(), block_data=500))
    gzi_path = str(tmp_path / "r.fa.gz.gzi")
    faidx.build_gzi(str(comp), gzi_path)
    regions = spark.createDataFrame(
        [("ctg3", 5, 25)], "name string, start long, end long"
    )
    rows = faidx.read_fasta_regions(
        spark, str(comp), regions, gzi=faidx.read_gzi(gzi_path)
    ).collect()
    full = {}
    for block in text.split(">")[1:]:
        lines = block.splitlines()
        full[lines[0].split()[0]] = "".join(lines[1:])
    assert [(r.name, r.seq) for r in rows] == [("ctg3", full["ctg3"][5:25])]


def test_raw_gzip_region_reads_raise(spark, tmp_path):
    import gzip as _gz

    p = tmp_path / "raw.fa.gz"
    with _gz.open(p, "wb") as f:
        f.write(_mk_big_fasta(5).encode())
    regions = spark.createDataFrame(
        [("ctg0", 0, 5)], "name string, start long, end long"
    )
    with pytest.raises(ValueError, match="not BGZF"):
        faidx.read_fasta_regions(spark, str(p), regions)


def test_recompress_to_bgzf_splits_and_preserves_content(spark, tmp_path):
    """gzip→BGZF migration e2e: a raw-gzip archive (1 task forever)
    recompresses in one pass, scans with >1 partition, parses to the
    identical records, and becomes region-readable."""
    import gzip as _gz

    from polars_fastx_spark.sources import bgzf
    from polars_fastx_spark.sources.fastx import scan_fastx

    text = _mk_big_fasta(400)
    raw = tmp_path / "arch.fasta.gz"
    with _gz.open(raw, "wb") as f:
        f.write(text.encode())
    dst = tmp_path / "arch.bgzf.fasta.gz"
    nblocks = bgzf.recompress_to_bgzf(str(raw), str(dst), block_data=2000)
    assert nblocks > 3 and bgzf.is_bgzf_file(str(dst))
    assert _gz.open(dst, "rb").read() == text.encode()  # stock-readable
    split = scan_fastx(spark, str(dst), split_bytes=4096)
    assert split.rdd.getNumPartitions() > 1
    whole = scan_fastx(spark, str(raw))
    a = sorted((r["header"], r["sequence"]) for r in split.collect())
    b = sorted((r["header"], r["sequence"]) for r in whole.collect())
    assert a == b and len(a) == 400


def test_cli_bgzip_and_gzi(spark, tmp_path, capsys):
    """CLI: `bgzip` migrates raw gzip to BGZF, `gzi` writes the block
    map, and `regions` then slices the compressed reference."""
    import gzip as _gz

    from polars_fastx_spark.__main__ import main
    from polars_fastx_spark.sources import bgzf

    text = _mk_big_fasta(8)
    raw = str(tmp_path / "r.fa.gz")
    with _gz.open(raw, "wb") as f:
        f.write(text.encode())
    dst = str(tmp_path / "r.bgzf.fa.gz")
    assert main(["bgzip", raw, dst]) == 0
    assert bgzf.is_bgzf_file(dst)
    assert main(["gzi", dst]) == 0
    assert faidx.read_gzi(dst + ".gzi")[0] == (0, 0)
    capsys.readouterr()
    assert main(["regions", dst, "ctg1:2-12"]) == 0
    out = capsys.readouterr().out.strip()
    full = {}
    for block in text.split(">")[1:]:
        lines = block.splitlines()
        full[lines[0].split()[0]] = "".join(lines[1:])
    assert out == f"ctg1\t2\t12\t{full['ctg1'][2:12]}"
