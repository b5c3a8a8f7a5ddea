"""Deterministic FASTX fixture generator (FIXTURES.md §B, seed=42).

Run once: ``python tests/make_fixtures.py`` — writes tests/fixtures/.
Checked-in outputs; tests only read them.
"""

from __future__ import annotations

import gzip
import json
import random
from pathlib import Path

FIXTURES = Path(__file__).parent / "fixtures"

ALPHABET = list("A" * 30 + "C" * 20 + "G" * 20 + "T" * 25 + "N" * 3 + "a" + "c")


def random_seq(rng: random.Random, n: int) -> str:
    return "".join(rng.choice(ALPHABET) for _ in range(n))


def edge_rows(rng: random.Random) -> list[tuple[str, str]]:
    """The 8 deterministic edge cases of FIXTURES.md B1."""
    return [
        ("seq_0 desc=empty", ""),
        ("seq_1 desc=len1", "G"),
        ("seq_2 desc=len2", "AC"),
        ("seq_3 desc=len3", "ACG"),
        ("seq_4 desc=allN", "N" * 30),
        ("seq_5 desc=lower", "acgtacgtacgt"),
        ("seq_6 desc=wrapped", random_seq(rng, 347)),
        ("seq_7 desc=gconly", "GC" * 20),
    ]


def make_rows(n_random: int = 12, seed: int = 42) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    rows = edge_rows(rng)
    for i in range(len(rows), len(rows) + n_random):
        rows.append((f"seq_{i} desc=rand", random_seq(rng, rng.randint(1, 200))))
    return rows


def quality_for(rng: random.Random, seq: str) -> str:
    # printable phred33 '!'..'I', forced to include '@' and '+' when long enough
    q = [chr(rng.randint(33, 73)) for _ in seq]
    if len(q) >= 2:
        q[0] = "@"
        q[1] = "+"
    return "".join(q)


def wrap(s: str, width: int = 70) -> list[str]:
    return [s[i : i + width] for i in range(0, len(s), width)] or [""]


def main() -> None:
    FIXTURES.mkdir(exist_ok=True)
    rows = make_rows()
    rng = random.Random(43)

    basic = "".join(f">{h}\n{s}\n" for h, s in rows)
    (FIXTURES / "basic.fasta").write_text(basic)

    multiline = "".join(
        f">{h}\n" + "".join(f"{chunk}\n" for chunk in wrap(s)) for h, s in rows
    )
    (FIXTURES / "multiline.fasta").write_text(multiline)

    fastq_rows = [(h, s, quality_for(rng, s)) for h, s in rows if s]
    fastq = "".join(f"@{h}\n{s}\n+\n{q}\n" for h, s, q in fastq_rows)
    (FIXTURES / "basic.fastq").write_text(fastq)

    with open(FIXTURES / "basic.fasta.gz", "wb") as raw:
        with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as f:
            f.write(basic.encode())

    (FIXTURES / "crlf.fasta").write_text(basic.replace("\n", "\r\n"))

    empty_seq = ">only_header desc=empty\n>second desc=empty\n>third desc=x\nACGT\n"
    (FIXTURES / "empty_seq.fasta").write_text(empty_seq)

    # golden expectations (independent pure-python transliteration of the
    # reference, reference fastx_parsers.py:16-67)
    import hashlib
    from collections import defaultdict

    def codons(s: str) -> dict:
        d: dict = defaultdict(int)
        for i in range(0, len(s) - 2, 3):
            c = s[i : i + 3].upper()
            if "N" not in c:
                d[c] += 1
        t = sum(d.values())
        return {k: v / t for k, v in d.items()} if t else {}

    def kmers(s: str, k: int = 3) -> dict:
        if not s or len(s) < k:
            return {}
        d: dict = defaultdict(int)
        for i in range(len(s) - k + 1):
            km = s[i : i + k].upper()
            if "N" not in km:
                d[km] += 1
        t = sum(d.values())
        return {k2: v / t for k2, v in d.items()} if t else {}

    golden = []
    for i, (h, s) in enumerate(rows):
        golden.append(
            {
                "seq_id": i,
                "header": h,
                "sequence": s,
                "length": len(s),
                "gc_content": None
                if not s
                else round((s.count("G") + s.count("C")) / len(s), 9),
                "n_count": s.count("N"),
                "hash": hashlib.md5(s.encode()).hexdigest(),
                "codon_usage_json": json.dumps(
                    {k: round(v, 9) for k, v in sorted(codons(s).items())},
                    separators=(",", ":"),
                ),
                "kmer_freq_json": json.dumps(
                    {k: round(v, 9) for k, v in sorted(kmers(s).items())},
                    separators=(",", ":"),
                ),
            }
        )
    (FIXTURES / "golden_stats.json").write_text(json.dumps(golden, indent=1))
    print(f"wrote {len(rows)} rows → {FIXTURES}")


if __name__ == "__main__":
    main()
