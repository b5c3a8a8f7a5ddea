"""The ``seq`` namespace — sequence-analysis functions, Spark-first.

Mirrors the reference's Polars expression namespace
(reference: src/polars_fastx/fastx_parsers.py:11-67) with **pure Column
expressions** — everything runs JVM-side inside whole-stage codegen;
no Python UDF is on the hot path. The reference implements codon_usage,
generate_hash and kmer frequencies as per-row Python callbacks
(``map_elements`` at fastx_parsers.py:41,50,65-67), which re-enter Python
per record; here the same semantics compile to Catalyst higher-order
functions over arrays/maps, so they scale with executor parallelism.

Exact semantics preserved (SURVEY.md §2.8):

- ``gc_content`` is **case-sensitive** ('G' + 'C' literal counts,
  fastx_parsers.py:19) with char length as the denominator (including
  N's); empty sequence → null (Polars yields NaN from 0/0; we document
  null — the ANSI-safe choice).
- ``n_count`` counts literal uppercase 'N' only (fastx_parsers.py:24).
- ``codon_usage``: non-overlapping 3-mers from frame 0
  (``range(0, len-2, 3)``, fastx_parsers.py:34), uppercased; codons
  containing 'N' skipped; relative frequencies over kept codons; empty
  map when nothing kept.
- ``kmer_frequencies``: overlapping k-mers (fastx_parsers.py:58),
  uppercased, 'N'-containing skipped, relative frequencies, empty map
  when ``len < k``.
- ``generate_hash``: md5 hexdigest of UTF-8 bytes truncated to the first
  ``length`` hex chars (fastx_parsers.py:47-48).

The ragged per-row dicts the reference shoehorns into ``pl.Struct``
(fastx_parsers.py:41,66) are modeled as ``MapType(string, double)`` —
Spark structs need fixed fields, maps are the faithful representation
(SURVEY.md §1.2).

A ``pandas_udf`` transliteration of the reference's Python lives in
:mod:`polars_fastx_spark.functions.seq_udf_ref` purely as a cross-check
twin for tests (SURVEY.md §5.3); never use it in pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def length(c: Column | str) -> Column:
    """Sequence character length (reference fastx_parsers.py:26-28)."""
    return F.length(_col(c)).cast("bigint")


def count_matches(c: Column | str, literal: str) -> Column:
    """Count non-overlapping occurrences of a 1-char literal (K7).

    Implemented as length delta under ``translate`` — stays in codegen,
    no regex engine.
    """
    if len(literal) != 1:
        # general literal: regexp-based count with the literal quoted
        import re

        return F.regexp_count(_col(c), F.lit(re.escape(literal))).cast("bigint")
    col = _col(c)
    return (F.length(col) - F.length(F.translate(col, literal, ""))).cast("bigint")


def gc_content(c: Column | str) -> Column:
    """(count('G') + count('C')) / char_length, case-sensitive (K2).

    Empty sequence → null (guarded division; ANSI mode would otherwise
    raise on 0/0).
    """
    col = _col(c)
    gc = F.length(col) - F.length(F.translate(col, "GC", ""))
    return gc / F.nullif(F.length(col), F.lit(0))


def n_count(c: Column | str) -> Column:
    """Count of literal uppercase 'N' (K3)."""
    col = _col(c)
    return (F.length(col) - F.length(F.translate(col, "N", ""))).cast("bigint")


def generate_hash(c: Column | str, hash_length: int = 32) -> Column:
    """md5 hexdigest truncated to ``hash_length`` hex chars (K4).

    Pure built-in (``F.md5`` over UTF-8 bytes) — the reference does this
    per-row in Python (fastx_parsers.py:47-50).
    """
    return F.substring(F.md5(F.encode(_col(c), "UTF-8")), 1, hash_length)


def _freq_map(tokens: Column) -> Column:
    """tokens array<string> → map<token, relative_frequency>.

    Run-length counting over a sorted copy: O(n log n) per row and ~4n
    lambda evaluations (higher-order functions are interpreted, not
    codegen'd, so per-element cost matters — a naive
    count-each-distinct scheme is O(n·d) and collapses on
    high-cardinality token sets like text k-mers). Row-local and
    shuffle-free, so it parallelizes embarrassingly at any scale; keys
    come out sorted, giving deterministic to_json renderings.
    """
    srt_expr = F.array_sort(F.filter(tokens, lambda x: ~x.contains("N")))

    # Run-length over the sorted array in O(n): boundary positions →
    # zip starts with ends → one struct per distinct token.
    #
    # CRITICAL let-binding: higher-order lambdas re-evaluate their
    # input EXPRESSION tree per element, so element_at(srt_expr, i)
    # inside a lambda would re-sort the array n times (O(n² log n),
    # measured ~0.2 s/row). Lambda VARIABLES are bound values — so the
    # whole computation is wrapped in a single-element transform whose
    # lambda receives the sorted array once; inner element_at calls
    # against that bound variable are O(1). (A fold-based alternative
    # avoids the binding but copies its accumulator array per element —
    # O(n·d) — measured 2.4x slower on 4-mers at sf0.1.)
    def _build(srt: Column) -> Column:
        total = F.size(srt)
        idx = F.when(total > 0, F.sequence(F.lit(1), total)).otherwise(
            F.array().cast("array<int>")
        )
        # when() (not boolean or) so element_at(srt, 0) is never evaluated
        starts_expr = F.filter(
            idx,
            lambda i: F.when(i == 1, F.lit(True)).otherwise(
                F.element_at(srt, i) != F.element_at(srt, i - 1)
            ),
        )

        # Second let-binding, same reason as the outer one: ``starts``
        # is referenced three times below (slice, size, zip_with), and
        # a lambda EXPRESSION is re-evaluated per reference — three
        # O(n) boundary filters per row instead of one. Binding it
        # through a 1-element transform makes the references read a
        # bound value.
        def _emit(starts: Column) -> Column:
            ends = F.concat(
                F.slice(starts, 2, F.greatest(F.size(starts) - 1, F.lit(0))),
                F.array(total + 1),
            )
            entries = F.zip_with(
                starts,
                ends,
                lambda s, e: F.struct(
                    F.element_at(srt, s).alias("key"),
                    ((e - s) / total).alias("value"),
                ),
            )
            return F.map_from_entries(entries)

        empty = F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<double>")
        )
        return F.when(
            total > 0,
            F.element_at(F.transform(F.array(starts_expr), _emit), 1),
        ).otherwise(empty)

    return F.element_at(F.transform(F.array(srt_expr), _build), 1)


def codon_usage(c: Column | str) -> Column:
    """Relative frequencies of non-overlapping frame-0 codons (K5).

    map<string,double>; uppercased; codons containing 'N' skipped; empty
    map when the sequence holds no complete codon.
    """
    col = _col(c)
    n = F.floor(F.length(col) / 3).cast("int")
    idx = F.when(n >= 1, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    codons = F.transform(idx, lambda i: F.upper(F.substring(col, i * 3 + 1, 3)))
    return _freq_map(codons)


def kmer_frequencies(c: Column | str, k: int = 3) -> Column:
    """Relative frequencies of overlapping k-mers (K6).

    map<string,double>; empty map when ``len(seq) < k``.
    """
    col = _col(c)
    last = F.length(col) - F.lit(k) + 1  # 1-based start of last kmer
    idx = F.when(last >= 1, F.sequence(F.lit(1), last)).otherwise(
        F.array().cast("array<int>")
    )
    kmers = F.transform(idx, lambda i: F.upper(F.substring(col, i, k)))
    return _freq_map(kmers)


def reverse_complement(c: Column | str) -> Column:
    """Reverse complement of a DNA sequence — the strand flip every
    FASTX pipeline needs (the reference's seq namespace lacks it; a
    needletail-backed engine gets it from Rust, here it is two codegen
    string ops): ``translate`` swaps complement pairs (case-preserving,
    IUPAC ambiguity codes included; characters outside the alphabet —
    e.g. N, gaps — map to themselves where undefined pairs exist) and
    ``reverse`` flips the order.
    """
    fwd = "ACGTacgtRYKMrykmBVDHbvdh"
    rev = "TGCAtgcaYRMKyrmkVBHDvbhd"
    return F.reverse(F.translate(_col(c), fwd, rev))


def transcribe(c: Column | str) -> Column:
    """DNA → RNA transcription of the coding strand (T→U, case kept)."""
    return F.translate(_col(c), "Tt", "Uu")


#: standard genetic code (NCBI table 1), codon -> amino acid, '*' = stop
CODON_TABLE: dict[str, str] = {"AAA": "K", "AAC": "N", "AAG": "K", "AAT": "N", "ACA": "T", "ACC": "T", "ACG": "T", "ACT": "T", "AGA": "R", "AGC": "S", "AGG": "R", "AGT": "S", "ATA": "I", "ATC": "I", "ATG": "M", "ATT": "I", "CAA": "Q", "CAC": "H", "CAG": "Q", "CAT": "H", "CCA": "P", "CCC": "P", "CCG": "P", "CCT": "P", "CGA": "R", "CGC": "R", "CGG": "R", "CGT": "R", "CTA": "L", "CTC": "L", "CTG": "L", "CTT": "L", "GAA": "E", "GAC": "D", "GAG": "E", "GAT": "D", "GCA": "A", "GCC": "A", "GCG": "A", "GCT": "A", "GGA": "G", "GGC": "G", "GGG": "G", "GGT": "G", "GTA": "V", "GTC": "V", "GTG": "V", "GTT": "V", "TAA": "*", "TAC": "Y", "TAG": "*", "TAT": "Y", "TCA": "S", "TCC": "S", "TCG": "S", "TCT": "S", "TGA": "*", "TGC": "C", "TGG": "W", "TGT": "C", "TTA": "L", "TTC": "F", "TTG": "L", "TTT": "F"}


def translate_protein(c: Column | str) -> Column:
    """Frame-0 protein translation under the standard genetic code:
    non-overlapping uppercase codons index a 64-element array literal
    by base-4 codon value (O(1) ``element_at`` — JVM codegen, no UDF);
    codons containing N/other ambiguity translate to 'X'; stops render
    '*' and translation does NOT halt at them (whole-frame translation
    — the caller slices ORFs first if stop-terminated products are
    wanted). Trailing 1-2 leftover bases are ignored, like
    :func:`codon_usage`.
    """
    # Let-bind the (possibly expensive) input expression via a 1-element
    # array + transform lambda so it evaluates ONCE per row: substring
    # inside the per-codon transform would otherwise re-evaluate the
    # whole input tree per codon — O(len²) per row when callers pass a
    # computed chain (longest_orf feeds reverse-complement frames;
    # measured 137 s → ~20 s for the 6-frame ORF scan at sf0.1).
    # Amino acids indexed by base-4 codon value (A=0, C=1, G=2, T=3):
    # one O(1) array lookup per codon instead of a linear scan through
    # a 64-entry MAP literal, and O(1) char access through a split-once
    # char array instead of substring(s, i*3+1, 3) — UTF8 substring
    # walks bytes to the char offset, so per-codon substrings into the
    # full sequence are O(position) each, O(len²) per row in total.
    aa_by_index = F.array(
        *[
            F.lit(CODON_TABLE[b1 + b2 + b3])
            for b1 in "ACGT"
            for b2 in "ACGT"
            for b3 in "ACGT"
        ]
    )

    # Ambiguity codes map to a large sentinel, NOT null: a null index
    # reaching element_at inside a higher-order-function lambda hits a
    # codegen NullPointerException (only constant folding saves the
    # non-lambda case), so the invalid-codon branch must be selected by
    # an ordinary comparison instead of null propagation.
    def _base4(ch: Column) -> Column:
        return (
            F.when(ch == "A", 0)
            .when(ch == "C", 1)
            .when(ch == "G", 2)
            .when(ch == "T", 3)
            .otherwise(1000)
        )

    def body(s: Column) -> Column:
        from polars_fastx_spark.functions.exprs import let

        n_codons = F.floor(F.length(s) / 3).cast("int")

        def with_chars(chars: Column) -> Column:
            def codon_aa(i: Column) -> Column:
                idx = (
                    _base4(F.element_at(chars, i * 3 + 1)) * 16
                    + _base4(F.element_at(chars, i * 3 + 2)) * 4
                    + _base4(F.element_at(chars, i * 3 + 3))
                )
                # any non-ACGT base pushes idx past 63 via the sentinel
                return F.when(
                    idx <= 63, F.element_at(aa_by_index, idx + 1)
                ).otherwise(F.lit("X"))

            aa = F.transform(F.sequence(F.lit(0), n_codons - 1), codon_aa)
            return F.when(n_codons >= 1, F.array_join(aa, "")).otherwise(
                F.lit("")
            )

        # NULL in -> NULL out (Spark/Polars null semantics); '' only
        # for non-null inputs shorter than one codon. Tested on the
        # LET-BOUND s (upper() propagates NULL) — an outer
        # _col(c).isNull() would re-evaluate the whole input tree per
        # row, undoing the let for computed chains like longest_orf's
        # per-frame substrings. The char array is let-bound for the
        # same reason: a bare split(s,'') referenced inside the
        # per-codon lambda would re-split once per codon.
        return F.when(s.isNull(), F.lit(None).cast("string")).otherwise(
            let(F.split(s, ""), with_chars)
        )

    from polars_fastx_spark.functions.exprs import let

    return let(F.upper(_col(c)), body)


def longest_orf(c: Column | str) -> Column:
    """Length (in nucleotides, incl. the stop codon) of the longest
    open reading frame across all 6 frames (3 forward + 3 on the
    reverse complement); 0 when no complete ATG→stop ORF exists.

    Found in PROTEIN space: each frame translates via
    :func:`translate_protein` and ORFs are ``M[^*]*\\*`` matches — the
    regex cannot cross a stop, so within a frame every maximal ORF is
    found (an in-frame ATG inside another ORF shares its stop and is
    never longer), and frames are scanned independently so no
    cross-frame overlap is missed. Codons with ambiguity translate to
    'X' which [^*] happily spans — an ORF may contain unknown residues
    but start/stop must be certain. Pure codegen: 6 translate calls +
    6 regexp scans, zero shuffles.
    """
    up = F.upper(_col(c))
    rc = reverse_complement(up)
    pat = F.lit(r"M[^*]*\*")

    def frame_max(seq_col: Column, f: int) -> Column:
        prot = translate_protein(F.substring(seq_col, f, F.length(seq_col) - f + 1))
        lens = F.transform(
            F.regexp_extract_all(prot, pat, 0), lambda m: F.length(m)
        )
        return F.coalesce(F.array_max(lens), F.lit(0))

    best_aa = F.greatest(
        *[frame_max(up, f) for f in (1, 2, 3)],
        *[frame_max(rc, f) for f in (1, 2, 3)],
    )
    # NULL in -> NULL out; 0 means "no ORF", not "no sequence"
    return F.when(_col(c).isNull(), F.lit(None).cast("bigint")).otherwise(
        (best_aa * 3).cast("bigint")
    )


def gc_skew(c: Column | str) -> Column:
    """GC skew (G − C)/(G + C) — the strand-asymmetry signal used to
    locate replication origins; null when the sequence has no G or C
    (division guarded with nullif, ANSI-safe). Case-sensitive like
    :func:`gc_content` (reference parity: fastx_parsers.py:31-38
    counts uppercase only)."""
    col = _col(c)
    g = count_matches(col, "G")
    cc = count_matches(col, "C")
    return (g - cc) / F.nullif((g + cc).cast("double"), F.lit(0.0))


def map_as_sorted_json(m: Column | str, scale: int = 9) -> Column:
    """Canonical JSON rendering of a map<string,double> with sorted keys.

    Oracle-parity helper (SURVEY.md §4.4.7): ragged maps are compared as
    sorted-key JSON with values rounded to ``scale`` decimals.
    """
    col = _col(m)
    keys = F.array_sort(F.map_keys(col))
    parts = F.transform(
        keys,
        lambda k: F.concat(
            F.lit('"'), k, F.lit('":'),
            F.format_string(f"%.{scale}f", F.element_at(col, k)),
        ),
    )
    return F.concat(F.lit("{"), F.array_join(parts, ","), F.lit("}"))


def mean_quality(q: Column | str, offset: int = 33) -> Column:
    """Mean phred score of a FASTQ quality string (phred+33 default).

    Pure Column fold over ASCII codes — null for empty/null quality.
    (Quality analysis is the half of the FASTQ schema the reference
    parses but never computes on; reference fastx_parsers.py:91.)
    """
    col = _col(q)
    chars = F.filter(F.split(col, ""), lambda ch: ch != "")
    total = F.aggregate(
        F.transform(chars, lambda ch: F.ascii(ch) - offset),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return total / F.nullif(F.length(col), F.lit(0))


def q_at_least_fraction(q: Column | str, threshold: int = 20,
                        offset: int = 33) -> Column:
    """Fraction of bases with phred quality ≥ ``threshold`` (Q20/Q30
    metrics). Null for empty/null quality."""
    col = _col(q)
    chars = F.filter(F.split(col, ""), lambda ch: ch != "")
    hits = F.size(
        F.filter(chars, lambda ch: (F.ascii(ch) - offset) >= threshold)
    )
    return hits / F.nullif(F.length(col), F.lit(0))


class SeqAccessor:
    """Fluent accessor mirroring Polars' ``pl.col("sequence").seq.*``.

    >>> from polars_fastx_spark.functions.seq import seq
    >>> df.select(seq("sequence").gc_content().alias("gc"))
    """

    def __init__(self, c: Column | str):
        self._c = _col(c)

    def length(self) -> Column:
        return length(self._c)

    def gc_content(self) -> Column:
        return gc_content(self._c)

    def n_count(self) -> Column:
        return n_count(self._c)

    def generate_hash(self, hash_length: int = 32) -> Column:
        return generate_hash(self._c, hash_length)

    def codon_usage(self) -> Column:
        return codon_usage(self._c)

    def reverse_complement(self) -> Column:
        return reverse_complement(self._c)

    def transcribe(self) -> Column:
        return transcribe(self._c)

    def translate_protein(self) -> Column:
        return translate_protein(self._c)

    def longest_orf(self) -> Column:
        return longest_orf(self._c)

    def gc_skew(self) -> Column:
        return gc_skew(self._c)

    def calculate_kmer_frequencies(self, k: int = 3) -> Column:
        return kmer_frequencies(self._c, k)

    def mean_quality(self, offset: int = 33) -> Column:
        return mean_quality(self._c, offset)

    def q_at_least_fraction(self, threshold: int = 20, offset: int = 33) -> Column:
        return q_at_least_fraction(self._c, threshold, offset)


def seq(c: Column | str) -> SeqAccessor:
    return SeqAccessor(c)


def per_cycle_quality(df, quality_col: str = "quality", offset: int = 33):
    """FastQC-style per-cycle quality: mean/min/max phred score at each
    read position across all reads — the plot that catches cycle-end
    chemistry decay. posexplode over the quality string's bytes, then
    one aggregation keyed on position: reads of any length mix freely
    (short reads simply stop contributing), and the shuffle key is the
    position, so parallelism is the read length — combine with a
    sampled input at very large scale. Returns
    (cycle 1-based, n, mean_q, min_q, max_q).
    """
    q = F.col(quality_col) if isinstance(quality_col, str) else quality_col
    ex = df.select(
        F.posexplode(
            F.transform(
                F.split(q, ""), lambda ch: F.ascii(ch) - offset
            )
        ).alias("pos", "phred")
    ).filter(F.col("phred").isNotNull())
    return (
        ex.groupBy((F.col("pos") + 1).alias("cycle"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("phred"), 4).alias("mean_q"),
            F.min("phred").alias("min_q"),
            F.max("phred").alias("max_q"),
        )
        .orderBy(F.col("cycle").asc_nulls_first())
    )
