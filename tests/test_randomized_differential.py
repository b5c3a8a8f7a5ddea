"""Randomized differential tests for round-1 extension operators.

One deterministic RNG builds hundreds of adversarial cases, they ship
to Spark as a SINGLE DataFrame per operator (one job, constant
overhead), and results compare against a plain-Python reference
implementation — the same oracle discipline as the DuckDB gate, but
over generated edge-case-dense inputs (boundary hits, degenerate
intervals, unicode, whitespace runs).
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from polars_fastx_spark.operators import sampling, text
from polars_fastx_spark.operators.rangejoin import point_in_interval_join

SEED = 20260813


def test_binned_join_random_intervals_match_reference(spark):
    rng = random.Random(SEED)
    pts = [(i, rng.randint(-50, 1050)) for i in range(400)]
    ivs = []
    for j in range(120):
        lo = rng.randint(-60, 1000)
        # mix: empty, tiny, bin-aligned, huge
        hi = lo + rng.choice([0, 1, 2, 64, 128, rng.randint(0, 500)])
        ivs.append((j, lo, hi))
    pdf = spark.createDataFrame(pts, "pid int, p long")
    idf = spark.createDataFrame(ivs, "iid int, lo long, hi long")
    for width in (1, 7, 64, 1000):
        got = {
            (r.pid, r.iid)
            for r in point_in_interval_join(
                pdf, "p", idf, "lo", "hi", width
            ).collect()
        }
        ref = {
            (pid, iid)
            for pid, p in pts
            for iid, lo, hi in ivs
            if lo <= p < hi
        }
        assert got == ref, f"width={width}"


def test_chunk_text_random_strings_match_reference(spark):
    rng = random.Random(SEED)
    alphabet = "ab \tλ\n."
    docs = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80))))
        for i in range(300)
    ]
    df = spark.createDataFrame(docs, "id int, text string")
    out = text.chunk_text(df, "text", size=10, overlap=3)
    got = {}
    for r in out.collect():
        got.setdefault(r.id, {})[r.chunk_idx] = r.chunk
    for i, s in docs:
        expect = {}
        # offsets stop at len-overlap: a chunk starting later is wholly
        # contained in its predecessor and must not be emitted
        offs = range(0, max(len(s) - 3, 1), 7)
        for k, o in enumerate(offs):
            expect[k] = s[o : o + 10]
        assert got[i] == expect, (i, repr(s))


def test_split_assignment_proportions_and_stability(spark):
    df = spark.range(20_000).withColumnRenamed("id", "k")
    out = sampling.assign_splits(df, "k", salt="prop")
    counts = {
        r.split: r.n
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(counts.values()) == 20_000
    # md5 is uniform: 80/10/10 within a generous ±2% absolute band
    assert abs(counts["train"] / 20_000 - 0.8) < 0.02
    assert abs(counts["valid"] / 20_000 - 0.1) < 0.02
    assert abs(counts["test"] / 20_000 - 0.1) < 0.02
    # sampling at f and 2f nests for arbitrary ids (negative too)
    neg = spark.range(-5_000, 5_000).withColumnRenamed("id", "k")
    small = {r.k for r in sampling.deterministic_sample(neg, "k", 0.07).collect()}
    big = {r.k for r in sampling.deterministic_sample(neg, "k", 0.14).collect()}
    assert small <= big


def test_weighted_take_random_matches_reference(spark):
    """Priority-sampling keys replicated bit-for-bit in plain Python
    (md5 → 52-bit uniform → u/w) over adversarial weights."""
    import hashlib

    rng = random.Random(SEED + 1)
    rows = [
        (i, rng.choice([0.0, -1.0, 1e-9, 1.0, 2.5, 1e9, float(rng.randint(1, 99))]))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id long, w double")
    got = [(r.id, r.priority_key) for r in
           sampling.weighted_take(df, "id", "w", 40, salt="rd").collect()]

    def key(i, w):
        h = int(hashlib.md5(f"{i}:rd".encode()).hexdigest()[:13], 16)
        return (h + 1) / float((1 << 52) + 1) / w

    ref = sorted(
        ((i, key(i, w)) for i, w in rows if w > 0),
        key=lambda t: (t[1], t[0]),
    )[:40]
    assert got == ref


def test_rrf_fuse_random_matches_reference(spark):
    from polars_fastx_spark.operators.retrieval import rrf_fuse

    rng = random.Random(SEED + 2)
    a = [(i, float(rng.randint(0, 20))) for i in rng.sample(range(300), 120)]
    b = [(i, float(rng.randint(0, 20))) for i in rng.sample(range(300), 150)]
    da = spark.createDataFrame(a, "id long, s double")
    db = spark.createDataFrame(b, "id long, s double")
    got = {r.id: (round(r.rrf, 12), r.n_sources) for r in
           rrf_fuse([(da, "s"), (db, "s")], "id", top_n=60, k=60).collect()}

    ref: dict = {}
    for rows in (a, b):
        ranked = sorted(rows, key=lambda t: (-t[1], t[0]))[:60]
        for rank, (i, _) in enumerate(ranked, start=1):
            c, n = ref.get(i, (0.0, 0))
            ref[i] = (c + 1.0 / (60 + rank), n + 1)
    assert got == {i: (round(c, 12), n) for i, (c, n) in ref.items()}


def test_bigram_score_random_matches_reference(spark):
    import math
    from collections import Counter

    rng = random.Random(SEED + 3)
    vocab = ["a", "b", "cc", "d"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 8))))
        for i in range(200)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_bigrams, r.avg_logprob) for r in
           text.bigram_logprob_score(df, "doc_id", "text").collect()}

    grams, heads, per_doc = Counter(), Counter(), {}
    for i, t in docs:
        ws = t.split()
        bg = list(zip(ws, ws[1:]))
        per_doc[i] = bg
        grams.update(bg)
        heads.update(w1 for w1, _ in bg)
    for i, bg in per_doc.items():
        if not bg:
            assert got[i] == (0, None), i
            continue
        want = round(
            sum(math.log(grams[g] / heads[g[0]]) for g in bg) / len(bg), 6
        )
        assert got[i][0] == len(bg) and got[i][1] == pytest.approx(want), i


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_join_random_words_match_bruteforce(spark):
    """Deletion-neighborhood blocking vs a pure-Python levenshtein
    brute force over an adversarial vocabulary: short words (dense
    lev<=1 neighborhoods), repeated chars, unicode, and near-identical
    long strings."""
    from polars_fastx_spark.operators.fuzzyjoin import fuzzy_join_k1

    rng = random.Random(SEED)
    alpha = "abcé"
    words = {""}
    while len(words) < 220:
        n = rng.randint(1, 6)
        words.add("".join(rng.choice(alpha) for _ in range(n)))
    words = sorted(words)

    df = spark.createDataFrame([(w,) for w in words], "w string")
    a = df.select(F.col("w").alias("wa"))
    b = df.select(F.col("w").alias("wb"))
    got = {
        (r["wa"], r["wb"])
        for r in fuzzy_join_k1(a, b, "wa", "wb").collect()
    }
    want = {
        (x, y) for x in words for y in words if _lev(x, y) <= 1
    }
    assert got == want


def test_merge_intervals_random_match_reference(spark):
    """Random interval soups vs a pure-Python sweep-line reference:
    islands must be disjoint, ordered, cover every input interval, and
    n_merged must partition the input count."""
    from polars_fastx_spark.operators.timeseries import merge_intervals

    rng = random.Random(SEED + 1)
    rows = []
    for key in ("a", "b", "c"):
        for _ in range(150):
            s = rng.randint(0, 500)
            rows.append((key, s, s + rng.randint(0, 40)))
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {
        (r["k"], r["island_start"], r["island_end"], r["n_merged"])
        for r in merge_intervals(df, "k", "s", "e").collect()
    }

    want = set()
    bykey = {}
    for k, s, e in rows:
        bykey.setdefault(k, []).append((s, e))
    for k, ivs in bykey.items():
        ivs.sort()
        cur_s, cur_e, n = ivs[0][0], ivs[0][1], 1
        for s, e in ivs[1:]:
            if s > cur_e:
                want.add((k, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
            else:
                cur_e = max(cur_e, e)
                n += 1
        want.add((k, cur_s, cur_e, n))
    assert got == want


def test_duplicated_span_stats_random_match_reference(spark):
    """Random word documents vs a pure-Python window-count reference."""
    from polars_fastx_spark.operators import text as T

    rng = random.Random(SEED + 2)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 30))))
        for i in range(60)
    ]
    n = 4
    df = spark.createDataFrame(docs, "doc_id long, text string")
    w = T.ngram_windows(df, n=n)
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
        for r in T.duplicated_span_stats(w).collect()
    }

    wins = {}
    for i, t in docs:
        toks = t.split()
        wins[i] = [
            " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
        ]
    from collections import defaultdict
    owners = defaultdict(set)
    for i, ws in wins.items():
        for x in ws:
            owners[x].add(i)
    want = {
        i: (len(ws), sum(1 for x in ws if len(owners[x]) >= 2))
        for i, ws in wins.items()
        if ws
    }
    assert got == want


def test_kmv_random_sets_match_python_reference(spark):
    """KMV bottom-k, union, and intersection against a plain-Python
    reference over adversarial random string sets (duplicates, unicode,
    empty strings, heavy overlap), at saturating and non-saturating k
    and across shardings — hash-for-hash and estimate-for-estimate."""
    import hashlib

    from polars_fastx_spark.functions import sketches

    rng = random.Random(SEED)
    pool = (
        [f"v{i}" for i in range(300)]
        + ["", " ", "naïve", "☃", "0", "00"]
        + [f"dup{i % 7}" for i in range(50)]
    )
    a_vals = [rng.choice(pool) for _ in range(500)]
    b_vals = [rng.choice(pool) for _ in range(400)] + a_vals[:100]

    def h(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)

    def ref_bottomk(vals, k):
        return sorted({h(v) for v in vals})[:k]

    def ref_estimate(ks, k):
        n = len(ks)
        if n < k:
            return n, 1.0, n
        theta = (ks[-1] + 1) / 4294967296.0
        est = round(63.0 / theta) if k == 64 else round((k - 1) / theta)
        return n, theta, est

    adf = spark.createDataFrame([(i, v) for i, v in enumerate(a_vals)], "i long, v string")
    bdf = spark.createDataFrame([(i, v) for i, v in enumerate(b_vals)], "i long, v string")
    for k in (16, 64, 1024):
        for shard in (F.lit(0), F.expr("i % 5")):
            ka = sketches.kmv_merge(sketches.kmv_partials(adf, "v", k, shard), k)
            got = sorted(r.h for r in ka.collect())
            assert got == ref_bottomk(a_vals, k), k
        kb = sketches.kmv_merge(sketches.kmv_partials(bdf, "v", k, F.lit(0)), k)
        est = sketches.kmv_estimate(ka, k).collect()[0]
        n, theta, e = ref_estimate(ref_bottomk(a_vals, k), k)
        assert (est.n_retained, est.ndv_est) == (n, e), k
        assert est.theta == pytest.approx(theta)
        # union sketch == bottom-k of the combined value sets
        got_u = sorted(
            r.h for r in sketches.kmv_union(ka, kb, k).collect()
        )
        assert got_u == ref_bottomk(a_vals + b_vals, k), k
        # intersection estimate == the reference theta-clip formula
        ref_a, ref_b = ref_bottomk(a_vals, k), ref_bottomk(b_vals, k)
        _, ta, _ = ref_estimate(ref_a, k)
        _, tb, _ = ref_estimate(ref_b, k)
        theta_i = min(ta, tb)
        common = [
            x for x in set(ref_a) & set(ref_b)
            if (x + 1) / 4294967296.0 < theta_i
        ]
        row = sketches.kmv_intersect_estimate(ka, kb, k).collect()[0]
        assert row.n_common == len(common), k
        assert row.inter_est == round(len(common) / theta_i), k


def test_containment_random_corpus_matches_reference(spark):
    """containment_pairs over an adversarial random corpus (repeats,
    shared prefixes, unicode, short/empty/None docs, duplicate texts)
    equals a plain-Python all-pairs reference, with and without a df
    cap, across two shingle widths."""
    from polars_fastx_spark.operators import dedup

    rng = random.Random(SEED + 7)
    vocab = ["abc", "déjà", "xy", "qqq", "na", "  ", "zz9"]
    docs = []
    for i in range(60):
        kind = rng.random()
        if kind < 0.1:
            t = ""
        elif kind < 0.15:
            t = None
        elif kind < 0.3 and docs:  # exact duplicate of an earlier doc
            t = rng.choice(docs)[1]
        else:
            t = "".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))
        docs.append((i, t))
    df = spark.createDataFrame(docs, "doc_id int, text string")

    def sh(t, k):
        if t is None:
            return set()
        return {t[i : i + k] for i in range(len(t) - k + 1)}

    for k in (3, 8):
        for cap in (None, 5):
            got = {
                (r["id_a"], r["id_b"]): (
                    r["common"], r["size_a"], r["size_b"]
                )
                for r in dedup.containment_pairs(
                    df, "doc_id", "text", k=k, threshold=0.0,
                    max_shingle_df=cap,
                ).collect()
            }
            dfreq = {}
            for _, t in docs:
                for s in sh(t, k):
                    dfreq[s] = dfreq.get(s, 0) + 1
            want = {}
            for a in range(60):
                for b in range(a + 1, 60):
                    sa, sb = sh(docs[a][1], k), sh(docs[b][1], k)
                    inter = sa & sb
                    if cap is not None:
                        inter = {s for s in inter if dfreq[s] <= cap}
                    if inter:
                        want[(a, b)] = (len(inter), len(sa), len(sb))
            assert got == want, (k, cap)


def test_dhash_random_pixels_match_loop_reference(spark):
    """dhash_bits (numpy) equals a from-the-definition pure-loop
    reference over random images of awkward shapes, including images
    smaller than the hash grid."""
    import numpy as np

    from polars_fastx_spark.operators import multimodal

    rng = np.random.RandomState(SEED % (2**31))
    for w, h, c in [(32, 32, 3), (9, 8, 1), (5, 3, 4), (100, 7, 2),
                    (1, 1, 1), (17, 64, 3)]:
        px = rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)
        got = multimodal.dhash_bits(px, w, h, c)

        gray = [[sum(int(px[y][x][ch]) for ch in range(c)) / c
                 for x in range(w)] for y in range(h)]
        rows, cols = 8, 9
        grid = [[0.0] * cols for _ in range(rows)]
        for r in range(rows):
            ylo, yhi = r * h // rows, max(r * h // rows + 1, (r + 1) * h // rows)
            for cc in range(cols):
                xlo = cc * w // cols
                xhi = max(xlo + 1, (cc + 1) * w // cols)
                vals = [gray[y][x] for y in range(ylo, yhi)
                        for x in range(xlo, xhi)]
                grid[r][cc] = sum(vals) / len(vals)
        want = [int(grid[r][cc] < grid[r][cc + 1])
                for r in range(rows) for cc in range(cols - 1)]
        assert got == want, (w, h, c)
