"""Vector-similarity tiers (L3): the three implementations agree where
they should, and the approximate ones keep useful recall."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_fastx_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _pairs(df):
    return [(r["id_a"], r["id_b"], round(r["cosine"], 4)) for r in df.collect()]


def test_sql_and_numpy_paths_agree(spark, emb):
    a = _pairs(sim.cosine_topk_pairs_sql(emb, "vec_id", "embedding", k=5))
    b = _pairs(sim.cosine_topk_numpy(emb, "vec_id", "embedding", k=5))
    assert a == b


def test_ivf_recall_vs_exact(spark, emb):
    exact = set(
        (r[0], r[1]) for r in _pairs(sim.cosine_topk_pairs_sql(emb, "vec_id", "embedding", k=5))
    )
    approx = sim.ivf_topk(emb, "vec_id", "embedding", k=5, num_cells=8)
    rows = _pairs(approx)
    assert len(rows) == 5
    # approximate: requires only useful recall, not equality
    assert len(exact & {(a, b) for a, b, _ in rows}) >= 1
    # every reported cosine must be exact for its pair (re-rank is exact)
    n = emb.count()
    allp = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 4)
        for r in sim.cosine_topk_pairs_sql(
            emb, "vec_id", "embedding", k=n * (n - 1) // 2
        ).collect()
    }
    for a, b, c in rows:
        assert allp[(a, b)] == c


def test_ivf_assignment_covers_all_vectors(spark, emb):
    assigned, centroids = sim.ivf_assign(emb, "vec_id", "embedding", num_cells=8)
    n = emb.count()
    assert assigned.count() == n
    assert assigned.select("__id").distinct().count() == n
    cells = {r["cell"] for r in centroids.collect()}
    used = {r["cell"] for r in assigned.select("cell").distinct().collect()}
    assert used <= cells and len(cells) == 8


def test_knn_query_side(spark, emb):
    """cosine_topk_numpy with a distinct query side: k best matches per
    overall ranking for external query vectors."""
    queries = emb.limit(3).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    out = sim.cosine_topk_numpy(emb, "vec_id", "embedding", k=3, query_df=queries)
    rows = out.collect()
    assert len(rows) == 3
    # each query vector is a copy of an index vector -> top matches
    # include its twin at cosine ~1
    assert max(r["cosine"] for r in rows) > 0.9999


def test_string_ids_roundtrip(spark, emb):
    """Ids keep their Spark type: string ids through the blocked-gemm
    path (incl. the numpy orient/flip) match the SQL brute-force twin,
    multi-block and single-block alike."""
    sdf = emb.select(
        F.concat(F.lit("doc-"), F.format_string("%05d", "vec_id")).alias("sid"),
        "embedding",
    )
    want = _pairs(sim.cosine_topk_pairs_sql(sdf, "sid", "embedding", k=5))
    got_multi = _pairs(
        sim.cosine_topk_numpy(sdf, "sid", "embedding", k=5, block_rows=64)
    )
    got_single = _pairs(sim.cosine_topk_numpy(sdf, "sid", "embedding", k=5))
    assert got_multi == want and got_single == want
    assert all(isinstance(a, str) and a < b for a, b, _ in got_multi)

    thr = sim.cosine_pairs_above_numpy(
        sdf, "sid", "embedding", threshold=0.3, block_rows=64
    )
    rows = [(r["id_a"], r["id_b"]) for r in thr.collect()]
    assert rows and all(a < b for a, b in rows)


def test_per_query_topk_matches_bruteforce(spark, emb):
    """Batch search: per-query exact top-3 equals a numpy brute force,
    including with multi-block packing forced."""
    import numpy as np

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    mat = mat / np.linalg.norm(mat, axis=1)[:, None]
    sims = mat @ mat.T

    def brute(qid, k=3):
        qi = int(np.where(ids == qid)[0][0])
        cands = [(round(-sims[qi, j], 9), int(ids[j])) for j in range(len(ids))
                 if ids[j] != qid]
        return [(qid, i, round(-s, 4)) for s, i in sorted(cands)[:k]]

    q = emb.filter(F.col("vec_id") < 5)
    for br in (None, 37):  # auto single-block AND forced multi-block
        out = sim.cosine_topk_per_query(
            emb, "vec_id", "embedding", q, k=3, block_rows=br
        )
        got = sorted(
            (r["id_q"], r["id_i"], round(r["cosine"], 4)) for r in out.collect()
        )
        want = sorted(t for qid in range(5) for t in brute(qid))
        assert got == want, f"block_rows={br}"


def test_semdedup_drop_decision(spark, emb):
    """Every dropped vector really has a smaller-id within-cell
    neighbor at >= threshold, dup_of is the minimum one, and no
    qualifying vector is missed."""
    assigned, _ = sim.ivf_assign(emb, "vec_id", "embedding", num_cells=8)
    import numpy as np

    rows = assigned.collect()
    cell_of = {r["__id"]: r["cell"] for r in rows}
    v = {r["__id"]: np.asarray(r["__v"]) / r["__n"] for r in rows}
    want = {}
    for i in cell_of:
        dups = [
            j for j in cell_of
            if j < i and cell_of[j] == cell_of[i]
            and float(v[i] @ v[j]) >= 0.35
        ]
        if dups:
            want[i] = min(dups)
    got = {
        r["vec_id"]: r["dup_of"]
        for r in sim.semdedup(
            emb, "vec_id", "embedding", threshold=0.35, num_cells=8
        ).collect()
    }
    assert got == want


def test_blocked_paths_agree_at_sf001(spark):
    """Scale sanity: at 500 vectors the fused single-cell path, a
    2-block split, and an 8-block split must produce the identical
    exact top-10 — the multi-block machinery (pair table, orientation,
    per-cell top-k) cannot change results, only distribute them."""
    emb1 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    want = _pairs(sim.cosine_topk_numpy(emb1, "vec_id", "embedding", k=10))
    for br in (256, 64):
        got = _pairs(
            sim.cosine_topk_numpy(emb1, "vec_id", "embedding", k=10, block_rows=br)
        )
        assert got == want, f"block_rows={br}"


def test_blocked_knn_multi_block_at_8k_vectors(spark):
    """The multi-block distributed path at 2x the block cap (8k
    vectors = 32M pairs, 2 hash blocks, 3 gemm cells): exact top-10
    equality with a dense numpy brute force. At 20k x 64 the same path
    measured 6.4s vs 44.7s single-threaded numpy (2026-08-13)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n, d = 8_000, 64
    mat = rng.standard_normal((n, d)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(n), "embedding": list(mat)})
    df = spark.createDataFrame(pdf).repartition(8)

    got = [
        (r["id_a"], r["id_b"], round(r["cosine"], 6))
        for r in sim.cosine_topk_numpy(df, "vec_id", "embedding", k=10).collect()
    ]

    m = mat.astype(np.float64)
    m /= np.linalg.norm(m, axis=1)[:, None]
    iu = np.triu_indices(n, 1)
    s = (m @ m.T)[iu]
    top = np.argpartition(-s, 10)[:12]
    order = sorted(top, key=lambda i: (-s[i], iu[0][i], iu[1][i]))[:10]
    want = [(int(iu[0][i]), int(iu[1][i]), round(float(s[i]), 6)) for i in order]
    assert got == want


def test_null_and_zero_vectors_excluded_not_crashing(spark):
    """A null vector used to crash np.stack inside the gemm stage, and
    a zero vector was ranked at cosine 0.0 ABOVE genuinely negative
    pairs. Both are now excluded from candidate generation (cosine
    undefined — the SQL twin yields NULL, which no threshold matches)."""
    rows = [
        (1, [1.0, 0.0]),
        (2, [-1.0, 0.0]),   # cosine(1,2) = -1.0: the only defined pair
        (3, [0.0, 0.0]),    # zero vector
        (4, None),          # missing vector
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")

    got = _pairs(sim.cosine_topk_numpy(df, "id", "v", k=10, block_rows=2))
    assert got == [(1, 2, -1.0)]

    # threshold <= 0 must not resurrect zero-vector pairs
    above = sim.cosine_pairs_above_numpy(df, "id", "v", threshold=-2.0)
    assert [(r["id_a"], r["id_b"]) for r in above.collect()] == [(1, 2)]

    # single-cell fused path: same contract
    one = sim._self_topk_single_cell(df, "id", "v", k=10, id_type="bigint")
    assert _pairs(one) == [(1, 2, -1.0)]


def test_ivf_assign_tie_break_deterministic(spark):
    """Equal-similarity centroid ties resolve to the greatest cell id —
    stable across runs/retries (max over (sim, cell) structs, not
    max_by), which semdedup's re-runnable drop decision requires."""
    # two identical vectors → if both are seeds, their centroids tie
    # for every assignment
    rows = [(i, [1.0, 0.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    assigned, cents = sim.ivf_assign(df, "id", "v", num_cells=3)
    cells = {r["__id"]: r["cell"] for r in assigned.collect()}
    top = max(r["cell"] for r in cents.collect())
    assert all(c == top for c in cells.values())
    # and a second run gives the identical assignment
    assigned2, _ = sim.ivf_assign(df, "id", "v", num_cells=3)
    assert cells == {r["__id"]: r["cell"] for r in assigned2.collect()}


def test_hard_negatives_mismatch_labels_and_rank_contiguously(spark):
    """Every mined negative carries a label different from its
    anchor's, and ranks run 1..3 per anchor (catalog composition
    l_hard_negatives; value parity is pinned by the 3-scale oracle)."""
    from pyspark.sql import functions as F

    from polars_fastx_spark.catalog import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["l_hard_negatives"].fn(spark, sf)
    emb = spark.read.parquet(sf + "/embeddings.parquet").select(
        "vec_id", "label"
    )
    joined = (
        out.join(emb, "vec_id")
        .join(
            emb.select(
                F.col("vec_id").alias("anchor_id"),
                F.col("label").alias("anchor_label"),
            ),
            "anchor_id",
        )
        .collect()
    )
    assert joined and all(r.label != r.anchor_label for r in joined)
    ranks = {}
    for r in joined:
        ranks.setdefault(r.anchor_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3] for v in ranks.values())
    assert set(ranks) == {0, 1, 2, 3, 4}
