#!/usr/bin/env python
"""Scale-probe the iterative tier at ~10x the bench scale (sf1-equivalent).

Generates a deterministic synthetic corpus 10x the sf0.1 testdata
(50k documents with planted near-dup families, 50k 64-dim embeddings,
a 50k-node / ~200k-edge skewed graph), then times the operators whose
cost is per-round shuffles — the ones that would expose a plan blowup
or a lost parallelism invariant at 100x:

- production MinHash LSH candidate generation (perm family)
- connected components (pointer doubling) over the LSH candidates
- end-to-end dedup keep decision (candidates -> components -> drop rows)
- PageRank (20 power rounds) on the skewed graph
- blocked-gemm exact kNN over the embeddings (one BLAS pass per block pair)

Also asserts the invariants the round-3 verdict asked to confirm:
AQE + localCheckpoint keep the per-round plan size BOUNDED (no
4^rounds lineage growth), and ensure_min_parallelism is a NO-OP on a
warehouse-layout input (multi-row-group parquet).

Usage: python scripts/scale_probe.py [workdir]   (default /tmp/scale_sf1)
Prints one table; paste/record into SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

N_DOCS = 50_000
N_VECS = 50_000
N_EDGES = 200_000
VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window row table stream merge "
    "data join scan shard block codec page split plan stage task core"
).split()


def generate(workdir: str) -> None:
    rng = np.random.RandomState(1234)
    os.makedirs(workdir, exist_ok=True)

    # documents: 80% unique word salad, 20% near-dup families (a base doc
    # plus 1-4 mutated copies — the workload LSH exists for)
    texts: list[str] = []
    doc_ids: list[int] = []
    i = 0
    while i < N_DOCS:
        words = [VOCAB[j] for j in rng.randint(0, len(VOCAB), 60)]
        base = " ".join(words)
        fam = 1 + int(rng.rand() < 0.2) * rng.randint(1, 5)
        for k in range(min(fam, N_DOCS - i)):
            if k == 0:
                t = base
            else:  # mutate a couple of words -> high-Jaccard near-dup
                w = words[:]
                for _ in range(2):
                    w[rng.randint(0, len(w))] = VOCAB[rng.randint(0, len(VOCAB))]
                t = " ".join(w)
            texts.append(t)
            doc_ids.append(i)
            i += 1
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "text": texts,
                "lang": [("en", "zh", "de", "fr")[d % 4] for d in doc_ids],
                "source": [f"src{d % 5}" for d in doc_ids],
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(workdir, "documents.parquet"),
        row_group_size=4096,  # warehouse layout: many row groups
    )

    emb = rng.randn(N_VECS, 64).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(N_VECS), pa.int64()),
                "embedding": pa.array(list(emb), pa.list_(pa.float32())),
                "label": pa.array(
                    (np.arange(N_VECS) % 10).astype(np.int32), pa.int32()
                ),
            }
        ),
        os.path.join(workdir, "embeddings.parquet"),
        row_group_size=4096,
    )

    # skewed graph: dst ~ (uniform^2 * n) concentrates edges on low ids
    src = rng.randint(0, N_DOCS, N_EDGES)
    dst = (rng.rand(N_EDGES) ** 2 * N_DOCS).astype(np.int64)
    keep = src != dst
    pq.write_table(
        pa.table({"u": pa.array(src[keep], pa.int64()),
                  "v": pa.array(dst[keep], pa.int64())}),
        os.path.join(workdir, "edges.parquet"),
        row_group_size=8192,
    )


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf1"
    if not os.path.exists(os.path.join(workdir, "edges.parquet")):
        t0 = time.time()
        generate(workdir)
        print(f"generated {workdir} in {time.time() - t0:.1f}s")

    import polars_fastx_spark as pfs
    from pyspark.sql import functions as F
    from polars_fastx_spark.operators import dedup, similarity
    from polars_fastx_spark.operators.graph import connected_components, pagerank
    from polars_fastx_spark.operators.partitioning import ensure_min_parallelism

    spark = pfs.get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(workdir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(workdir, "embeddings.parquet"))
    edges = spark.read.parquet(os.path.join(workdir, "edges.parquet"))

    # invariant: at a warehouse layout (scan splits >= cores) the
    # min-parallelism helper is a no-op. The probe file is only ~18 MB,
    # so emulate the splits-per-core ratio of a big table by shrinking
    # the split size below the row-group size for this one check.
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    wide = spark.read.parquet(os.path.join(workdir, "documents.parquet"))
    n_parts = wide.rdd.getNumPartitions()
    assert n_parts >= spark.sparkContext.defaultParallelism, n_parts
    assert ensure_min_parallelism(wide) is wide, (
        "ensure_min_parallelism repartitioned an already-parallel scan"
    )
    spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    print(f"warehouse-layout no-op check: {n_parts} scan partitions, pass-through OK")

    rows = []

    def probe(name, fn):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        rows.append((name, dt, out))
        print(f"{name:34s} {dt:8.1f}s   {out}")

    probe(
        "lsh_candidates(perm)",
        lambda: f"{dedup.minhash_lsh_candidates(docs, 'doc_id', 'text', family='perm', collapse_exact=False).count():,} pairs",
    )
    pairs = dedup.minhash_lsh_candidates(
        docs, "doc_id", "text", family="perm", collapse_exact=False
    ).persist()
    pairs.count()
    probe(
        "connected_components",
        lambda: f"{connected_components(pairs).filter(F.col('node') != F.col('component')).count():,} non-root nodes",
    )
    probe(
        "dedup_keep end-to-end",
        lambda: (
            lambda cc: f"{cc.filter(F.col('node') != F.col('component')).count():,} dropped"
        )(
            connected_components(
                dedup.minhash_lsh_candidates(
                    docs, "doc_id", "text", family="perm"
                )
            )
        ),
    )
    # flood probe: 200k DISTINCT-but-near-identical docs would all-pairs
    # to ~20B candidates (uncapped is not runnable); bucket_cap must
    # keep the candidate volume linear and the wall-clock bounded
    flood = spark.range(200_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("shared near identical document body " * 3),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    probe(
        "lsh flood 200k near-dup, cap=8",
        lambda: f"{dedup.minhash_lsh_candidates(flood, 'doc_id', 'text', family='perm', collapse_exact=False, bucket_cap=8).count():,} pairs",
    )
    probe(
        "pagerank(20 rounds, skewed)",
        lambda: f"top mass {pagerank(edges, 'u', 'v', iterations=20).agg(F.max('rank')).first()[0]:.4f}",
    )
    probe(
        "blocked-gemm kNN (50k x 50k)",
        lambda: f"{similarity.cosine_topk_numpy(emb, 'vec_id', 'embedding', k=5).count():,} pairs",
    )
    pairs.unpersist()

    # KMV at volume: 10M values, 7M distinct — the distinct-first
    # pre-aggregate gets map-side combine and the post-shuffle state is
    # 64 shards x k rows; the estimate must land within ~3 RSE
    from polars_fastx_spark.functions import sketches

    def _kmv_10m():
        vals = spark.range(10_000_000).select(
            (F.col("id") % 7_000_000).alias("v"), F.col("id").alias("i")
        )
        est = sketches.kmv_estimate(
            sketches.kmv_merge(
                sketches.kmv_partials(vals, "v", 1024, F.expr("i % 64")),
                1024,
            ),
            1024,
        ).first()
        err = abs(est.ndv_est - 7_000_000) / 7_000_000
        assert err < 3.0 / (1024 - 2) ** 0.5, est
        return f"ndv_est {est.ndv_est:,} (true 7,000,000, err {err:.2%})"

    probe("kmv sketch (10M rows, k=1024)", _kmv_10m)

    from polars_fastx_spark.operators import bpe

    probe(
        "bpe train 6 merges (50k docs)",
        lambda: f"{bpe.bpe_train(docs, 'text', 6).count()} rules",
    )

    print("\n| probe | seconds | result |")
    print("|---|---|---|")
    for name, dt, out in rows:
        print(f"| {name} | {dt:.1f} | {out} |")


if __name__ == "__main__":
    main()
