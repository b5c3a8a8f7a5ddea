"""fasta_stats end-to-end (reference fastx_parsers.py:137-223 mirror)."""

from __future__ import annotations

import csv
import glob
import json

import pytest

from tests.conftest import FIXTURES

from polars_fastx_spark.pipeline import fasta_stats, fasta_stats_frame
from polars_fastx_spark.sources.fastx import scan_fastx


@pytest.fixture(scope="module")
def golden():
    return {
        g["header"]: g
        for g in json.loads((FIXTURES / "golden_stats.json").read_text())
    }


def test_default_fields_tsv(spark, tmp_path, golden):
    out = tmp_path / "stats_tsv"
    fasta_stats(spark, str(FIXTURES / "basic.fasta"), str(out))
    files = glob.glob(str(out / "*.csv"))
    assert files
    rows = []
    for fp in files:
        with open(fp) as f:
            rows.extend(csv.DictReader(f, delimiter="\t"))
    assert len(rows) == len(golden)
    for r in rows:
        g = golden[r["header"]]
        assert int(r["length"]) == g["length"]
        assert r["hash"] == g["hash"]
        if g["gc_content"] is None:
            assert r["gc_content"] == ""
        else:
            assert abs(float(r["gc_content"]) - g["gc_content"]) < 1e-8
        # nested map columns land as JSON strings
        got = json.loads(r["codon_usage"]) if r["codon_usage"] else {}
        want = json.loads(g["codon_usage_json"])
        assert got.keys() == want.keys()


def test_length_filters_and_field_selection(spark, golden):
    df = scan_fastx(spark, str(FIXTURES / "basic.fasta"))
    out = fasta_stats_frame(df, min_length=10, max_length=100, fields="header,length")
    assert out.columns == ["header", "length"]
    for r in out.collect():
        assert 10 <= r["length"] <= 100
    expected = [h for h, g in golden.items() if 10 <= g["length"] <= 100]
    assert out.count() == len(expected)


def test_invalid_fields_warn_and_drop(spark):
    df = scan_fastx(spark, str(FIXTURES / "basic.fasta"))
    with pytest.warns(UserWarning, match="Unknown field"):
        out = fasta_stats_frame(df, fields="header,bogus,length")
    assert out.columns == ["header", "length"]


def test_stdout_write(spark, capsys):
    fasta_stats(spark, str(FIXTURES / "empty_seq.fasta"), None, fields="header,length")
    captured = capsys.readouterr().out
    lines = captured.strip().splitlines()
    assert lines[0] == "header\tlength"
    assert len(lines) == 4


def test_cli_main_stdout(spark, tmp_path, capsys):
    """python -m polars_fastx_spark parity: stdout TSV with selected fields."""
    from polars_fastx_spark.__main__ import main

    fa = tmp_path / "c.fasta"
    fa.write_text(">h1 d\nGGCC\n>h2\nNNNN\n")
    assert main([str(fa), "--fields", "header,length,gc_content,n_count"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == ["header", "length", "gc_content", "n_count"]
    assert out[1].split("\t") == ["h1 d", "4", "1.0", "0"]
    assert out[2].split("\t") == ["h2", "4", "0.0", "4"]


def test_corpus_clean_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    from polars_fastx_spark.pipeline import corpus_clean

    out = str(tmp_path / "corpus")
    got = corpus_clean(
        spark, "/root/testdata/sf0.001/documents.parquet", out,
        min_chars=100, max_top_word_ratio=0.5,
    )
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert 0 < got.count() <= src.count()
    # every surviving doc has a split, unique doc_id, and gated length
    assert got.filter(F.col("split").isNull()).count() == 0
    assert got.select("doc_id").distinct().count() == got.count()
    assert got.filter(F.col("n_chars") < 100).count() == 0
    # partition layout: split=*/lang=* directories exist for pruning
    import glob
    assert glob.glob(f"{out}/split=*/lang=*")
    # partition pruning proof: the split predicate lands in
    # PartitionFilters (directory-level skip), not a data filter
    one = spark.read.parquet(out).filter(F.col("split") == "train")
    plan = one._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("split" in ln for ln in pf), plan[:800]
    assert one.count() > 0
