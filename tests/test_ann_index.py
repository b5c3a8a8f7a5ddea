"""Persisted IVF-PQ ANN index (operators/ann_index.py): build/search
parity with the in-query ivfpq_topk, incremental add == rebuild under
frozen quantizers, multi-epoch search, crash-retry epoch reuse, and
the per-cell stats surface."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from polars_fastx_spark.operators import ann_index
from polars_fastx_spark.operators.vectors import ivfpq_topk

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def _query(e):
    return [float(x) for x in e.filter(F.col("vec_id") == 0).first()["v"]]


def test_persisted_search_matches_in_query_ivfpq(spark, tmp_path):
    """index_build → parquet → index_search must reproduce
    ivfpq_topk(pinned_books=True) result-for-result: same cells, same
    md5-seeded books, same ADC ranking (adc_search is literally the
    shared code path; doubles round-trip parquet exactly)."""
    e = _emb(spark)
    q = _query(e)
    path = str(tmp_path / "idx")
    ann_index.index_build(
        e, "vec_id", "v", path, num_cells=16, m=8, pq_k=8, pinned=True
    )
    got = [
        (r["vec_id"], round(r["adc_dist"], 9))
        for r in ann_index.index_search(spark, path, q, k=10, nprobe=4).collect()
    ]
    want = [
        (r["vec_id"], round(r["adc_dist"], 9))
        for r in ivfpq_topk(
            e, "vec_id", "v", q, k=10, num_cells=16, nprobe=4, m=8,
            pq_k=8, pinned_books=True,
        ).collect()
    ]
    assert got == want and len(got) == 10


def _seed_safe_tail(rows, num_cells=16, m=8, pq_k=8, frac_tail=0.2):
    """Split ids into (head, tail) such that NO tail id is a coarse
    centroid seed (num_cells smallest md5(id)) or a PQ codebook seed
    (pq_k smallest md5(id:j) per subspace) — the precondition under
    which build(head)+add(tail) must equal build(all) exactly."""
    ids = [r[0] for r in rows]
    seeds = set(
        sorted(ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())[
            :num_cells
        ]
    )
    for j in range(m):
        seeds |= set(
            sorted(
                ids,
                key=lambda i: hashlib.md5(f"{i}:{j}".encode()).hexdigest(),
            )[:pq_k]
        )
    non_seed = [i for i in ids if i not in seeds]
    tail = set(non_seed[: int(len(ids) * frac_tail)])
    return tail


def test_incremental_add_equals_rebuild(spark, tmp_path):
    """build(head) + add(tail) == build(head+tail) when the tail holds
    no centroid/codebook seed: the frozen-quantizer routing of
    index_add is the same assignment+encode math the build ran, so the
    persisted code tables and every search agree exactly."""
    e = _emb(spark)
    rows = [(r["vec_id"], list(r["v"])) for r in e.collect()]
    tail_ids = _seed_safe_tail(rows)
    assert len(tail_ids) >= 10
    head = e.filter(~F.col("vec_id").isin(list(tail_ids)))
    tail = e.filter(F.col("vec_id").isin(list(tail_ids)))

    p_full = str(tmp_path / "full")
    p_incr = str(tmp_path / "incr")
    ann_index.index_build(e, "vec_id", "v", p_full, pinned=True)
    ann_index.index_build(head, "vec_id", "v", p_incr, pinned=True)
    epoch = ann_index.index_add(tail, "v", p_incr)
    assert epoch == 1

    def codes(path):
        return {
            r["__id"]: (r["cell"], list(r["codes"]))
            for r in spark.read.option("basePath", f"{path}/codes")
            .parquet(f"{path}/codes/epoch=*")
            .collect()
        }

    assert codes(p_incr) == codes(p_full)
    q = _query(e)
    a = [
        (r["vec_id"], round(r["adc_dist"], 9))
        for r in ann_index.index_search(spark, p_incr, q, k=10).collect()
    ]
    b = [
        (r["vec_id"], round(r["adc_dist"], 9))
        for r in ann_index.index_search(spark, p_full, q, k=10).collect()
    ]
    assert a == b


def test_search_spans_epochs_and_stats_count_them(spark, tmp_path):
    e = _emb(spark)
    rows = [(r["vec_id"], list(r["v"])) for r in e.collect()]
    tail_ids = _seed_safe_tail(rows)
    head = e.filter(~F.col("vec_id").isin(list(tail_ids)))
    tail = e.filter(F.col("vec_id").isin(list(tail_ids)))
    path = str(tmp_path / "idx")
    ann_index.index_build(head, "vec_id", "v", path, pinned=True)
    ann_index.index_add(tail, "v", path)
    # a tail vector is findable: search with ITS vector, full probe
    probe_id = sorted(tail_ids)[0]
    qv = [
        float(x)
        for x in e.filter(F.col("vec_id") == probe_id).first()["v"]
    ]
    hits = {
        r["vec_id"]
        for r in ann_index.index_search(
            spark, path, qv, k=10, nprobe=16
        ).collect()
    }
    assert probe_id in hits
    st = ann_index.index_stats(spark, path)
    tot = st.agg(F.sum("n_vectors")).first()[0]
    assert tot == e.count()
    assert st.agg(F.max("n_epochs")).first()[0] >= 1


def test_crashed_add_epoch_is_reused_on_retry(spark, tmp_path):
    """An uncommitted epoch dir (no _SUCCESS — a crashed add) must be
    OVERWRITTEN by the retry, not stranded beside a duplicate epoch."""
    e = _emb(spark).limit(40)
    path = str(tmp_path / "idx")
    ann_index.index_build(e, "vec_id", "v", path, num_cells=4, pinned=True)
    # simulate a crashed epoch-1 add: data landed, no _SUCCESS marker
    crash = tmp_path / "idx" / "codes" / "epoch=1"
    crash.mkdir(parents=True)
    (crash / "part-garbage.parquet").write_bytes(b"")
    assert ann_index._next_epoch(spark, f"{path}/codes") == 1
    tail = _emb(spark).filter(
        (F.col("vec_id") >= 40) & (F.col("vec_id") < 60)
    )
    epoch = ann_index.index_add(tail, "v", path)
    assert epoch == 1  # reused, not skipped
    n = (
        spark.read.option("basePath", f"{path}/codes")
        .parquet(f"{path}/codes/epoch=*")
        .count()
    )
    assert n == 60  # no duplicates, no stranded partial


def test_search_many_matches_single_query_search(spark, tmp_path):
    """The relational batch search with a 1-row queries table must
    reproduce index_search exactly (same tie-breaks, same math); with
    3 queries, each partition of the output matches its own
    single-query run."""
    e = _emb(spark)
    path = str(tmp_path / "idx")
    ann_index.index_build(e, "vec_id", "v", path, pinned=True)
    qrows = [
        (i, [float(x) for x in e.filter(F.col("vec_id") == i).first()["v"]])
        for i in (0, 1, 2)
    ]
    qdf = spark.createDataFrame(qrows, "query_id long, qvec array<double>")
    many = ann_index.index_search_many(spark, path, qdf, k=7, nprobe=4)
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], round(r["adc_dist"], 9))
        for r in many.collect()
    }
    assert len(got) == 21
    for qid, qv in qrows:
        single = [
            (r["vec_id"], round(r["adc_dist"], 9))
            for r in ann_index.index_search(
                spark, path, qv, k=7, nprobe=4
            ).collect()
        ]
        assert [got[(qid, rk)] for rk in range(1, 8)] == single, qid


def test_index_compact_folds_epochs_search_unchanged(spark, tmp_path):
    e = _emb(spark)
    rows = [(r["vec_id"], list(r["v"])) for r in e.collect()]
    tail_ids = sorted(_seed_safe_tail(rows))
    half = set(tail_ids[: len(tail_ids) // 2])
    rest = set(tail_ids) - half
    path = str(tmp_path / "idx")
    ann_index.index_build(
        e.filter(~F.col("vec_id").isin(tail_ids)), "vec_id", "v", path,
        pinned=True,
    )
    ann_index.index_add(e.filter(F.col("vec_id").isin(list(half))), "v", path)
    ann_index.index_add(e.filter(F.col("vec_id").isin(list(rest))), "v", path)
    q = _query(e)
    before = [
        (r["vec_id"], round(r["adc_dist"], 9))
        for r in ann_index.index_search(spark, path, q, k=10).collect()
    ]
    import os

    assert len([d for d in os.listdir(f"{path}/codes")
                if d.startswith("epoch=")]) == 3
    ann_index.index_compact(spark, path)
    assert [d for d in os.listdir(f"{path}/codes")
            if d.startswith("epoch=")] == ["epoch=2"]
    after = [
        (r["vec_id"], round(r["adc_dist"], 9))
        for r in ann_index.index_search(spark, path, q, k=10).collect()
    ]
    assert after == before


def test_redelivered_pinned_epoch_add_is_idempotent(spark, tmp_path):
    """A committed-but-redelivered batch (explicit epoch id) must
    overwrite itself: duplicate codes would DOUBLE the summed ADC
    distance for its vectors, silently corrupting every search."""
    e = _emb(spark)
    path = str(tmp_path / "idx")
    ann_index.index_build(e.filter("vec_id < 100"), "vec_id", "v", path,
                          num_cells=8, pinned=True)
    batch = e.filter("vec_id >= 100 and vec_id < 130")
    ann_index.index_add(batch, "v", path, epoch=1)
    ann_index.index_add(batch, "v", path, epoch=1)  # redelivery
    coded = spark.read.option("basePath", f"{path}/codes").parquet(
        f"{path}/codes/epoch=*"
    )
    assert coded.count() == 130
    assert coded.select("__id").distinct().count() == 130
