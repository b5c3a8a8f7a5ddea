"""CLI for the ``fasta_stats`` pipeline — the working version of the
entry point the reference intended (its ``__init__`` imports a
``scan_fastx`` symbol that never existed and the pipeline is only
reachable as a Python function; reference:
src/polars_fastx/__init__.py:1, src/polars_fastx/fastx_parsers.py:137).

    python -m polars_fastx_spark input.fasta[.gz] \
        [-o OUT_DIR] [--min-length N] [--max-length N] \
        [--fields header,length,gc_content,...] [--kmer-length K]

Writes TSV to OUT_DIR (distributed) or stdout when no -o.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
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
