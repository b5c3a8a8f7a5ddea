"""CLI for the ``fasta_stats`` pipeline — the working version of the
entry point the reference intended (its ``__init__`` imports a
``scan_fastx`` symbol that never existed and the pipeline is only
reachable as a Python function; reference:
src/polars_fastx/__init__.py:1, src/polars_fastx/fastx_parsers.py:137).

    python -m polars_fastx_spark input.fasta[.gz] \
        [-o OUT_DIR] [--min-length N] [--max-length N] \
        [--fields header,length,gc_content,...] [--kmer-length K]

Writes TSV to OUT_DIR (distributed) or stdout when no -o.

faidx subcommands (sources/faidx.py):

    python -m polars_fastx_spark faidx ref.fasta [-o ref.fasta.fai]
    python -m polars_fastx_spark regions ref.fasta chr1:0-100 chr2:5-12

``faidx`` builds the samtools-style index (default output:
``<input>.fai``); ``regions`` slices 0-based half-open windows through
the index and prints ``name<TAB>start<TAB>end<TAB>seq``.

BGZF subcommands (sources/bgzf.py, sources/faidx.py):

    python -m polars_fastx_spark bgzip in.fastq.gz out.fastq.gz
    python -m polars_fastx_spark gzi ref.fasta.gz [-o ref.fasta.gz.gzi]

``bgzip`` recompresses a raw-gzip (or plain) file to splittable BGZF;
``gzi`` writes the htslib-format block map that pairs with ``.fai``
for random access into a bgzip-compressed reference.
"""

from __future__ import annotations

import argparse
import sys


def _main_faidx(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="polars_fastx_spark faidx")
    p.add_argument("input", help="FASTA file")
    p.add_argument("-o", "--output", default=None, help="index path (default <input>.fai)")
    args = p.parse_args(argv)
    from polars_fastx_spark.sources.faidx import build_fai

    out = args.output or args.input + ".fai"
    records = build_fai(args.input, out)
    print(f"{out}: {len(records)} records indexed", file=sys.stderr)
    return 0


def _main_regions(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="polars_fastx_spark regions")
    p.add_argument("input", help="FASTA file (indexed on the fly if no --fai)")
    p.add_argument("regions", nargs="+", help="name:start-end (0-based half-open)")
    p.add_argument("--fai", default=None, help="existing .fai path")
    args = p.parse_args(argv)

    from polars_fastx_spark.session import get_spark
    from polars_fastx_spark.sources import faidx

    rows = []
    for spec in args.regions:
        name, _, rng = spec.rpartition(":")
        lo, _, hi = rng.partition("-")
        if not name or not lo or not hi:
            p.error(f"bad region {spec!r}; expected name:start-end")
        rows.append((name, int(lo), int(hi)))
    spark = get_spark("faidx-regions-cli")
    spark.sparkContext.setLogLevel("ERROR")
    fai = faidx.read_fai(spark, args.fai) if args.fai else None
    regions = spark.createDataFrame(rows, "name string, start long, end long")
    for r in faidx.read_fasta_regions(
        spark, args.input, regions, fai=fai
    ).orderBy("name", "start").collect():
        print(f"{r['name']}\t{r.start}\t{r.end}\t{r.seq}")
    return 0


def _main_bgzip(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="polars_fastx_spark bgzip")
    p.add_argument("input", help="raw-gzip or plain file")
    p.add_argument("output", help="BGZF output path")
    p.add_argument("--level", type=int, default=6)
    args = p.parse_args(argv)
    from polars_fastx_spark.sources.bgzf import recompress_to_bgzf

    n = recompress_to_bgzf(args.input, args.output, level=args.level)
    print(f"{args.output}: {n} BGZF blocks", file=sys.stderr)
    return 0


def _main_gzi(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="polars_fastx_spark gzi")
    p.add_argument("input", help="BGZF-compressed file")
    p.add_argument("-o", "--output", default=None,
                   help="block-map path (default <input>.gzi)")
    args = p.parse_args(argv)
    from polars_fastx_spark.sources.faidx import build_gzi

    out = args.output or args.input + ".gzi"
    blocks = build_gzi(args.input, out)
    print(f"{out}: {len(blocks)} blocks mapped", file=sys.stderr)
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "faidx":
        return _main_faidx(argv[1:])
    if argv and argv[0] == "regions":
        return _main_regions(argv[1:])
    if argv and argv[0] == "bgzip":
        return _main_bgzip(argv[1:])
    if argv and argv[0] == "gzi":
        return _main_gzi(argv[1:])
    p = argparse.ArgumentParser(
        prog="polars_fastx_spark",
        description="FASTA/FASTQ stats pipeline (Spark)",
    )
    p.add_argument("input", help="FASTX file, glob, or directory")
    p.add_argument("-o", "--output", default=None, help="output dir (TSV); stdout if omitted")
    p.add_argument("--min-length", type=int, default=None)
    p.add_argument("--max-length", type=int, default=None)
    p.add_argument(
        "--fields",
        default="header,length,gc_content,n_count,hash,codon_usage,kmer_freq",
    )
    p.add_argument("--kmer-length", type=int, default=3)
    args = p.parse_args(argv)

    from polars_fastx_spark.pipeline import fasta_stats
    from polars_fastx_spark.session import get_spark

    spark = get_spark("fasta-stats-cli")
    spark.sparkContext.setLogLevel("ERROR")
    fasta_stats(
        spark,
        args.input,
        args.output,
        min_length=args.min_length,
        max_length=args.max_length,
        fields=args.fields,
        kmer_length=args.kmer_length,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
