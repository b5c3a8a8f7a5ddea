"""Fuzzy (edit-distance) string join via deletion-neighborhood blocking.

The naive fuzzy join is a cartesian product with ``levenshtein(a, b)
<= k`` — O(n*m) comparisons, a guaranteed non-starter at corpus scale.
This module implements the FastSS scheme (Bocek et al., "Fast Similarity
Search in Large Dictionaries", 2007): for edit distance <= 1, two
strings match **iff** their deletion neighborhoods intersect, where the
neighborhood of ``s`` is ``{s} ∪ {s with one character deleted}``.

That turns the fuzzy join into a plain **equi-join** on neighborhood
keys — len(s)+1 keys per row, hash-partitioned like any other join, no
cartesian anywhere. Candidates sharing a key are then verified with the
built-in ``levenshtein`` (JVM codegen) and deduped. The blocking is
*complete* (no false negatives: if lev(a,b)<=1 then either a=b, or one
is a deletion of the other, or both share the variant with the edited
position deleted) and *sound* after the verify filter.

Scale notes (100 TB): key fan-out is O(avg_len) rows per input row —
bounded for token/name-like columns (the intended use: vocabulary
matching, entity resolution on names/codes). The join is an ordinary
shuffled hash join; skewed hot keys (very common short variants) are
AQE-splittable. For k = 2 the neighborhood is O(len²/2) keys per
DISTINCT string — key LENGTH, not row count, is the steep axis.
Measured (SCALE.md, 100k×100k distinct keys, local[32]): len 8 →
15.7 s (37 keys/string), len 16 → 18.0 s (137), len 24 → 39.3 s
(301), len 32 → 55.4 s (529) — a smooth ~len² slope, no cliff, all
planted ≤2-edit pairs found. Past ~64 chars the fan-out (~2k
keys/string) stops being the right blocking scheme: switch to the
n-gram/LSH tier (``dedup.minhash_lsh_candidates`` /
``containment_pairs``), which is built for long strings.

Reference parity: the reference exposes Polars' ``str`` namespace at
its call sites but has no fuzzy join; this is north-star extension
surface (BASELINE.json:6) — entity resolution / typo-tolerant joins are
a standard training-data-pipeline need (e.g. matching noisy metadata).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def deletion_variants(col: Column | str) -> Column:
    """Array of the string plus every single-character deletion.

    ``"abc" -> ["abc", "bc", "ac", "ab"]``. Pure higher-order-function
    expression (sequence + transform + substring concat) — JVM codegen,
    no UDF. Empty string maps to ``[""]``.
    """
    s = _col(col)
    dels = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            s.substr(F.lit(1), i - 1),
            s.substr(i + 1, F.length(s) - i),
        ),
    )
    return F.array_union(F.array(s), dels)


def _verified_pairs(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    variant_fn,
    max_dist: int,
    keep_equal: bool,
) -> DataFrame:
    """Equi-join the two deletion-neighborhood key streams, VERIFY the
    edit distance on the string pairs, then join the row payloads back.

    Only the DISTINCT key strings travel through the explode (the
    len(s)+1 — len²/2 for k=2 — fan-out): exploding full rows would
    shuffle every payload column once per variant, making the variant
    count a multiplier on row width. Verification is two-staged around
    the pair dedup: an O(1) length-difference prefilter runs on the raw
    candidate key stream (|len(a)-len(b)| > k can never be within
    distance k), the dedup then collapses the shared-key multiplicity
    (similar strings share MANY variant keys, so each surviving pair
    would otherwise pay the O(len²) ``levenshtein`` once per shared
    key), and the full ``levenshtein`` verify runs once per distinct
    pair. The verified pairs table is small, so AQE broadcasts it into
    the two payload joins. N identical left rows × M identical right
    rows re-expand to the documented N×M output pairs through the
    payload join-back."""
    # Pin the two shuffles to the session's configured width with
    # EXPLICIT repartitions. AQE sizes reduce stages by shuffle BYTES,
    # and this operator's stages are byte-small but compute-heavy: the
    # variant-key join fans out quadratically inside hot buckets, and
    # the verify runs an O(len²) levenshtein per pair — measured on
    # 1k near-identical names, AQE coalesced both to 1-2 tasks and the
    # whole join ran ~3x slower. User-specified repartition counts are
    # exempt from AQE coalescing, and the join / dedup-aggregate reuse
    # the hash partitioning, so no extra exchanges appear.
    try:
        width = int(left.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        width = left.sparkSession.sparkContext.defaultParallelism
    ls = left.select(_col(left_col).alias("__ls")).distinct()
    rs = right.select(_col(right_col).alias("__rs")).distinct()
    lk = ls.withColumn("__v", F.explode(variant_fn(F.col("__ls"))))
    rk = rs.withColumn("__v", F.explode(variant_fn(F.col("__rs"))))
    dist = F.levenshtein(F.col("__ls"), F.col("__rs"))
    cond = dist <= max_dist
    if not keep_equal:
        cond = cond & (dist > 0)
    len_gap = F.abs(F.length("__ls") - F.length("__rs")) <= max_dist
    pairs = (
        lk.repartition(width, "__v")
        .join(rk.repartition(width, "__v"), "__v")
        .select("__ls", "__rs")
        .filter(len_gap)
        .repartition(width, "__ls", "__rs")
        .dropDuplicates(["__ls", "__rs"])
        .filter(cond)
    )
    return (
        left.join(pairs, _col(left_col) == F.col("__ls"))
        .join(right, _col(right_col) == F.col("__rs"))
        .drop("__ls", "__rs")
    )


def fuzzy_join_k1(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    keep_equal: bool = True,
) -> DataFrame:
    """All (left, right) row pairs with ``levenshtein(left_col,
    right_col) <= 1``, computed without a cartesian product.

    Dataflow: each side's DISTINCT strings explode their deletion
    neighborhood (row-local fan-out of short keys only — payloads never
    ride the fan-out), the two key streams equi-join on the variant key
    (one hash-shuffle join, AQE-managed), the built-in ``levenshtein``
    verifies each candidate key pair (blocking admits distance-2 pairs
    like "ab"~"cb"? no — but it does admit same-length
    substitution-at-two-positions false candidates only when they share
    a deletion variant, which distance >1 pairs cannot; the verify
    filter is kept anyway as the soundness guarantee and is O(1) per
    candidate), duplicate survivors from multiple shared keys collapse
    per (left string, right string) pair, and payloads join back by
    string (one shuffle per side, usually AQE-broadcast since the
    verified pairs table is small — duplicate INPUT rows keep their
    multiplicity through it).

    ``keep_equal=False`` drops exact matches (distance 0), returning
    only true near-misses.

    Column collision: callers must ensure disjoint output columns
    (alias beforehand), as with any Spark join.
    """
    return _verified_pairs(
        left, right, left_col, right_col, deletion_variants, 1, keep_equal
    )


def deletion_variants_k2(col: Column | str) -> Column:
    """The string plus every 1- and 2-character deletion — the k=2
    FastSS neighborhood. Still a pure higher-order expression: the
    double-deletion set comes from a flattened nested transform over
    position pairs i < j (O(len²/2) variants per row — the caller's
    explicit cost decision; for name/code/token columns len ≤ ~30 this
    is ≤ ~450 keys/row, shuffled as short strings)."""
    s = _col(col)
    n = F.length(s)
    singles = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(
            s.substr(F.lit(1), i - 1),
            s.substr(i + 1, n - i),
        ),
    )
    doubles = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, n),
                lambda j: F.concat(
                    s.substr(F.lit(1), i - 1),
                    s.substr(i + 1, j - i - 1),
                    s.substr(j + 1, n - j),
                ),
            ),
        )
    )
    base = F.array_union(F.array(s), singles)
    return F.when(n >= 2, F.array_union(base, doubles)).otherwise(base)


def fuzzy_join_k2(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    keep_equal: bool = True,
) -> DataFrame:
    """All (left, right) pairs with ``levenshtein <= 2`` without a
    cartesian product — the k=2 extension of :func:`fuzzy_join_k1`
    (FastSS: lev(a,b) <= k ⇒ the ≤k-deletion neighborhoods intersect;
    the built-in ``levenshtein`` verify removes blocking false
    positives). Same plan shape: row-local key fan-out, one shuffled
    equi-join, codegen verify, distinct, payload join-back. The verify
    runs before the pair dedup — at k=2 false candidates dominate the
    key-join output, so dropping them first keeps the dedup shuffle and
    the payload joins proportional to true matches."""
    return _verified_pairs(
        left, right, left_col, right_col, deletion_variants_k2, 2,
        keep_equal
    )
