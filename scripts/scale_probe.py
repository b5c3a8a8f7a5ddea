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
    generate_clustered(workdir)


def generate_clustered(workdir: str) -> None:
    """Planted-cluster embeddings for the ANN recall probe: 5000
    well-separated centers x 10 members, so the exact top-10 of a
    member query IS its cluster — recall then measures whether IVF+PQ
    routes to and ranks the right CLUSTER, robust to intra-cluster ADC
    ties (quantization collapses near-identical residuals to identical
    codes, so a finer-than-cluster ranking is not the contract). The
    i.i.d. gaussian table is the WRONG recall substrate — with random
    vectors all distances concentrate and recall@k is meaningless by
    construction, the same argument as tests/test_pq.py."""
    path = os.path.join(workdir, "embeddings_clustered.parquet")
    if os.path.exists(path):
        return
    rng = np.random.RandomState(77)
    centers = rng.randn(5000, 64).astype(np.float32) * 10.0
    vecs = centers.repeat(10, axis=0) + 0.05 * rng.randn(
        50_000, 64
    ).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(50_000), pa.int64()),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            }
        ),
        path,
        row_group_size=4096,
    )


def fuzzy_probe() -> None:
    """j_fuzzy2's key-length cliff (VERDICT r5 task 5): the k=2
    deletion neighborhood is O(len²/2) keys per DISTINCT string, so
    key length — not row count — is the steep axis. Probe 100k×100k
    distinct keys (10× the catalog join's distinct-key volume) at
    realistic entity-resolution lengths 8/16/24/32, with 5k planted
    ≤2-edit matches per side. Prints a SCALE.md-ready table."""
    import random
    import string

    import polars_fastx_spark as pfs
    from polars_fastx_spark.operators.fuzzyjoin import fuzzy_join_k2

    spark = pfs.get_spark("fuzzy-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rnd = random.Random(42)
    rows = []
    print("| probe | seconds | result |")
    print("|---|---|---|")
    for L in (8, 16, 24, 32):
        alphabet = string.ascii_lowercase + string.digits

        def _key():
            return "".join(rnd.choice(alphabet) for _ in range(L))

        left = [_key() for _ in range(100_000)]
        planted = []
        for i in range(5_000):  # right-side near-misses of left keys
            s = list(left[i])
            for _ in range(rnd.choice((1, 2))):
                s[rnd.randrange(L)] = rnd.choice(alphabet)
            planted.append("".join(s))
        right = planted + [_key() for _ in range(95_000)]
        l_df = spark.createDataFrame(
            [(s,) for s in left], ["lk"]
        ).repartition(32)
        r_df = spark.createDataFrame(
            [(s,) for s in right], ["rk"]
        ).repartition(32)
        t0 = time.time()
        n = fuzzy_join_k2(l_df, r_df, "lk", "rk").count()
        dt = time.time() - t0
        keys = L * (L - 1) // 2 + L + 1
        res = f"{n:,} pairs (≥5k planted), {keys} keys/string"
        rows.append((f"fuzzy_join_k2 100k×100k len={L}", dt, res))
        print(f"| fuzzy_join_k2 100k×100k len={L} | {dt:.1f} | {res} |")


def jpeg_probe() -> None:
    """Decode throughput of the new builtin baseline JPEG codec
    (operators/jpeg.py) through the near-dup pipeline: 2,000 64×64
    q85 4:2:0 JPEGs (100 planted light edits), Arrow mapInPandas
    decode + dHash + banded hamming join. The pure-Python per-block
    decode is the modality's cost — this measures it honestly."""
    import numpy as np

    import polars_fastx_spark as pfs
    from polars_fastx_spark.operators import jpeg as _jpeg
    from polars_fastx_spark.operators import multimodal as mm

    spark = pfs.get_spark("jpeg-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.RandomState(9)
    rows = []
    base_px = {}
    for i in range(1_900):
        # distinct smooth image per i: random 8×8 low-frequency field
        # upscaled ×8 — JPEG-friendly and dHash-distinct
        lo = rng.randint(0, 256, size=(8, 8, 3))
        im = np.repeat(np.repeat(lo, 8, axis=0), 8, axis=1).astype(
            np.uint8
        )
        base_px[i] = im
        rows.append((
            f"img{i:05d}.jpg",
            bytearray(_jpeg.encode_jpeg_baseline(
                im.reshape(-1), 64, 64, 3, quality=85, subsample="420"
            )),
        ))
    for j in range(100):  # light edits of the first 100
        im = base_px[j].copy()
        im[0:6, 0:6] = 255
        rows.append((
            f"dup{j:05d}.jpg",
            bytearray(_jpeg.encode_jpeg_baseline(
                im.reshape(-1), 64, 64, 3, quality=85, subsample="420"
            )),
        ))
    df = spark.createDataFrame(
        rows, "path string, content binary"
    ).repartition(32).persist()
    df.count()
    t0 = time.time()
    pairs = mm.image_near_duplicates(df, max_distance=6)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    dt = time.time() - t0
    planted = sum(
        1 for a, b in got
        if a.startswith("dup") != b.startswith("dup") and a[3:8] == b[3:8]
    )
    print("| probe | seconds | result |")
    print("|---|---|---|")
    print(
        f"| jpeg near-dup (2k 64×64 q85 4:2:0, builtin decoder) | "
        f"{dt:.1f} | {len(got):,} pairs, {planted}/100 planted edits "
        f"found |"
    )


def warc_probe(workdir: str = "/tmp/scale_sf1") -> None:
    """Crawl-ingest throughput: a ~0.5 GB per-record-gzip WARC archive
    (60k HTML response records) through scan → HTTP-200 filter →
    visible-text + title + canonical URL — the l_crawl_pipeline column
    tiers over the real source. Pins that byte-range member-split
    parallelism holds at archive scale (one file, many partitions) and
    measures records/s end-to-end."""
    import polars_fastx_spark as pfs
    from pyspark.sql import functions as F
    from polars_fastx_spark.functions import html as H
    from polars_fastx_spark.functions import urls
    from polars_fastx_spark.sources import warc

    os.makedirs(workdir, exist_ok=True)
    path = os.path.join(workdir, "crawl_60k.warc.gz")
    n = 60_000
    if not os.path.exists(path):
        t0 = time.time()
        filler = " ".join(f"w{j}" for j in range(120))
        with open(path, "wb") as out:
            import gzip as _gzip

            for i in range(n):
                body = (
                    f"<html><head><title>Page {i}</title>"
                    f"<style>b{{x}}</style></head><body>"
                    f"<script>var x=1;</script><h1>Doc {i}</h1>"
                    f"<p>{filler} tail {i}</p></body></html>"
                ).encode()
                rec = warc.render_warc_record(
                    f"<urn:uuid:r-{i:06d}>", "response",
                    f"HTTPS://WWW.site{i % 97}.NET:443/a/{i}?utm_source=x",
                    "2026-08-15T00:00:00Z",
                    warc.http_response_block(body),
                )
                out.write(_gzip.compress(rec))
        print(f"generated {path} "
              f"({os.path.getsize(path) / 1e6:.0f} MB) "
              f"in {time.time() - t0:.1f}s")
    spark = pfs.get_spark("warc-probe")
    spark.sparkContext.setLogLevel("ERROR")
    df = warc.scan_warc(spark, path, split_bytes=8 * 1024 * 1024)
    parts = df.rdd.getNumPartitions()
    t0 = time.time()
    got = (
        df.filter(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
        )
        .select(
            urls.normalize_url("target_uri").alias("url"),
            H.html_title(F.col("payload").cast("string")).alias("t"),
            F.length(
                H.strip_html(F.col("payload").cast("string"))
            ).alias("n"),
        )
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.count_distinct("url").alias("urls"),
            F.sum("n").alias("chars"),
        )
        .first()
    )
    dt = time.time() - t0
    assert got["rows"] == n and got["urls"] == n, got
    print("| probe | seconds | result |")
    print("|---|---|---|")
    print(
        f"| warc scan+extract (60k records, "
        f"{os.path.getsize(path) / 1e6:.0f} MB gz, {parts} splits) | "
        f"{dt:.1f} | {got['rows']:,} records, {got['rows'] / dt:,.0f} "
        f"rec/s, {got['chars'] / 1e6:.0f} MB visible text |"
    )


def crawl_e2e_probe(
    workdir: str = "/tmp/scale_sf1", n: int = 30_000
) -> None:
    """The crawl FRONT DOOR end-to-end: ``n`` records (30k default;
    round-7 re-runs at 100k) with planted revisits (5%), noindex
    pages (5%), URL variants of the same page (10%) and near-dup
    content pairs (10%) through ``pipeline.crawl_to_corpus`` — mint →
    scan → gates → dedups → cap → splits → partitioned parquet, with
    the row accounting asserted exactly AND per-tier seconds (the
    ``timings=`` phase accounting — round-6 attributed the
    composition's cost by narrative; this measures it, and flags any
    tier over 60% of the wall)."""
    import gzip as _gzip

    import polars_fastx_spark as pfs
    from polars_fastx_spark.sources import warc

    os.makedirs(workdir, exist_ok=True)
    path = os.path.join(workdir, f"crawl_e2e_{n // 1000}k.warc.gz")
    rng = np.random.RandomState(42)
    if not os.path.exists(path):
        t0 = time.time()
        with open(path, "wb") as out:
            for i in range(n):
                # classes per 20 records: 0 revisit, 1 noindex,
                # 2 the page P, 3 a NEAR-DUP of P's text elsewhere,
                # 4 a URL VARIANT re-capture of P (same body) —
                # 2/3/4 collapse to ONE surviving row for P
                cls = i % 20
                words = " ".join(
                    f"{v:08x}" for v in rng.randint(0, 2**31, 90)
                )
                if cls == 0:
                    rec = warc.render_warc_record(
                        f"<urn:uuid:e-{i:06d}>", "revisit",
                        f"https://s{i % 301}.net/re/{i}",
                        "2026-08-15T00:00:00Z", b"",
                        content_type="application/http; msgtype=response",
                        payload_digest=f"sha1:D{i - 20}",
                    )
                    out.write(_gzip.compress(rec))
                    continue
                meta = (
                    '<meta name="robots" content="noindex">'
                    if cls == 1 else ""
                )
                if cls == 2:
                    uri = f"https://s{i % 301}.net/p/{i}"
                    body_words = words
                    _LAST_BODY[0] = (i, words)
                elif cls == 3:
                    p_i, p_words = _LAST_BODY[0]
                    uri = f"https://mirror{i % 7}.org/m/{i}"
                    body_words = p_words + " tiny-edit"
                elif cls == 4:
                    p_i, p_words = _LAST_BODY[0]
                    uri = (
                        f"HTTPS://WWW.s{p_i % 301}.NET:443/p/"
                        f"{p_i}?utm_source=x"
                    )
                    body_words = p_words + " re-crawl"
                else:
                    uri = f"https://s{i % 301}.net/p/{i}"
                    body_words = words
                body = (
                    f"<html><head><title>P{i}</title>{meta}</head>"
                    f"<body><p>{body_words}</p></body></html>"
                ).encode()
                rec = warc.render_warc_record(
                    f"<urn:uuid:e-{i:06d}>", "response", uri,
                    "2026-08-15T00:00:00Z",
                    warc.http_response_block(body),
                    payload_digest=f"sha1:D{i}",
                )
                out.write(_gzip.compress(rec))
        print(
            f"generated {path} ({os.path.getsize(path) / 1e6:.0f} MB) "
            f"in {time.time() - t0:.1f}s"
        )
    spark = pfs.get_spark("crawl-e2e")
    spark.sparkContext.setLogLevel("ERROR")
    from polars_fastx_spark.pipeline import crawl_to_corpus

    out_dir = os.path.join(workdir, "crawl_e2e_corpus")
    timings: dict = {}
    t0 = time.time()
    got = crawl_to_corpus(
        spark, path, out_dir, min_chars=80, domain_cap_n=1000,
        timings=timings,
    )
    rows = got.count()
    dt = time.time() - t0
    # expected: n − 5% revisits − 5% noindex − 5% url-variant
    # re-captures (collapse into their page) − 5% near-dups = 0.8n
    planted = n // 20
    print("| probe | seconds | result |")
    print("|---|---|---|")
    print(
        f"| crawl_to_corpus e2e ({n:,} records, "
        f"{os.path.getsize(path) / 1e6:.0f} MB gz) | {dt:.1f} | "
        f"{rows:,} corpus docs from {n:,} records "
        f"({n / dt:,.0f} rec/s; revisits/noindex/variants gone exactly; "
        f"near-dup LSH removed {n - 3 * planted - rows:,}/"
        f"{planted:,} planted pairs) |"
    )
    print()
    print("| tier | seconds | % wall | rows out | note |")
    print("|---|---|---|---|---|")
    t_sum = sum(v["seconds"] for v in timings.values()) or 1.0
    for name, v in timings.items():
        pct = 100.0 * v["seconds"] / t_sum
        note = "DOMINANT (>60% wall)" if pct > 60 else ""
        r = f"{v['rows']:,}" if v["rows"] is not None else "—"
        print(
            f"| {name} | {v['seconds']:.1f} | {pct:.0f}% | {r} | {note} |"
        )
    # LSH is probabilistic: a straggler pair per few thousand is the
    # operator's documented contract, not a pipeline bug
    assert n * 4 // 5 <= rows <= n * 4 // 5 + n // 3000 + 1, rows
    spark.stop()


_LAST_BODY = [(0, "")]


def containment_sweep(workdir: str = "/tmp/scale_sf1",
                      tier: str = "all",
                      caps: tuple = (0.01, 0.02, 0.04)) -> None:
    """Containment cap/size frontier (VERDICT r5 task 6): sweep the
    fractional df cap ∈ {1%, 2%, 4%} × corpus {50k, 150k docs} and
    record cost + recall of the planted quote cliques, next to the
    Σ df² join-cost number shingle_df_profile predicts. Prints a
    SCALE.md-ready table."""
    import polars_fastx_spark as pfs
    from pyspark.sql import functions as F
    from polars_fastx_spark.operators import dedup

    spark = pfs.get_spark("containment-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    cont_path = os.path.join(workdir, "documents_containment.parquet")
    if not os.path.exists(cont_path):
        raise SystemExit(
            "containment substrate missing — run the full probe once "
            "first: python scripts/scale_probe.py"
        )
    base = spark.read.parquet(cont_path).filter("doc_id < 1000000")
    n50 = base.count()
    # 150k = the 50k substrate verbatim-tripled with distinct ids —
    # same planted structure at 3× volume, so the SAME quote cliques
    # exist (×3 members) and df fractions are preserved exactly.
    tripled = base
    for shift in (1, 2):
        tripled = tripled.unionByName(
            base.withColumn(
                "doc_id", F.col("doc_id") + F.lit(shift * 10_000_000)
            )
        )
    print(f"substrate: {n50:,} docs (planted quote cliques + boilerplate)")
    print("| probe | seconds | result |")
    print("|---|---|---|")
    tiers = (("50k", base), ("150k", tripled))
    if tier != "all":
        tiers = tuple(t for t in tiers if t[0] == tier)
    for label, corpus in tiers:
        prof = dedup.shingle_df_profile(corpus, "doc_id", "text", k=8)
        ndocs = corpus.count()
        for cap in caps:
            cut = int(cap * ndocs)
            cost = prof.filter(F.col("doc_freq") <= cut).agg(
                F.sum("join_pairs")
            ).first()[0]
            t0 = time.time()
            n = dedup.containment_pairs(
                corpus, "doc_id", "text", k=8, threshold=0.5,
                max_shingle_df=cap,
            ).count()
            dt = time.time() - t0
            res = f"{n:,} pairs, Σdf² join volume {cost:,}"
            print(
                f"| containment {label} docs, cap {cap:.0%} | {dt:.1f} "
                f"| {res} |"
            )


def containment_composition_probe(
    workdir: str = "/tmp/scale_sf1"
) -> None:
    """Round-7 task 4 measurement: how much containment join volume
    (Σ df² over surviving shingles) the UPSTREAM dedup tiers remove
    before the containment stage runs — the quantified version of the
    LSH-before-containment composition rule now wired as
    ``crawl_to_corpus(containment_threshold=...)``. Substrate = the
    cap-sweep corpus (planted quote cliques + boilerplate + exact
    clone mass added here): Σdf² and containment_pairs wall time are
    measured RAW vs AFTER exact dedup + MinHash-LSH keep-one."""
    import polars_fastx_spark as pfs
    from pyspark.sql import functions as F
    from polars_fastx_spark.operators import dedup
    from polars_fastx_spark.operators.graph import connected_components

    spark = pfs.get_spark("containment-composition")
    spark.sparkContext.setLogLevel("ERROR")
    # substrate: 20k docs of random hex words (md5-derived — truly
    # DISTINCT text, so the upstream tiers only remove what was
    # planted; the sf documents table's template vocabulary makes
    # random docs near-dups of each other and poisons the recall
    # read), plus the dup mass a crawl actually carries: every 10th
    # doc in 4 verbatim copies (mirrors/reposts — the clone families
    # whose df² the composition rule says must never reach the
    # containment join) and a 30-word excerpt of every 25th doc (what
    # containment is FOR — it must survive the upstream tiers and be
    # caught after)
    base = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(89)),
                lambda i: F.substring(
                    F.md5(
                        F.concat_ws(":", F.col("id").cast("string"),
                                    i.cast("string"))
                    ), 1, 8,
                ),
            ),
            " ",
        ).alias("text"),
    )
    clones = base.filter("doc_id % 10 = 0")
    excerpts = base.filter("doc_id % 25 = 0").select(
        (F.col("doc_id") + F.lit(40_000_000)).alias("doc_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, 30), " "
        ).alias("text"),
    )
    corpus = base
    for shift in (1, 2, 3):
        corpus = corpus.unionByName(
            clones.withColumn(
                "doc_id", F.col("doc_id") + F.lit(shift * 10_000_000)
            )
        )
    corpus = corpus.unionByName(excerpts).persist()
    n0 = corpus.count()

    def _sigma_df2(df):
        prof = dedup.shingle_df_profile(df, "doc_id", "text", k=8)
        return prof.agg(F.sum("join_pairs")).first()[0]

    def _pairs_time(df):
        # no df cap: the synthetic vocabulary is so small that a
        # relative cap cuts nearly every shingle (measured — recall
        # went to zero); the probe's subject is the UNCAPPED join
        # volume the upstream tiers remove, and excerpt recall
        t0 = time.time()
        pr = dedup.containment_pairs(
            df, "doc_id", "text", k=8, threshold=0.5,
            max_shingle_df=None,
        ).persist()
        n = pr.count()
        n_exc = pr.filter(
            (F.col("id_a") >= 40_000_000) | (F.col("id_b") >= 40_000_000)
        ).count()
        dt = time.time() - t0
        pr.unpersist()
        return n, n_exc, dt

    s_raw = _sigma_df2(corpus)
    p_raw, e_raw, t_raw = _pairs_time(corpus)

    # tier 1: exact dedup (hash keep-min)
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5("text")).orderBy(F.col("doc_id"))
    t0 = time.time()
    exact = (
        corpus.withColumn("_rk", F.row_number().over(w))
        .filter("_rk = 1").drop("_rk").persist()
    )
    n1 = exact.count()
    t_exact = time.time() - t0
    # tier 2: MinHash-LSH keep-one
    t0 = time.time()
    cand = dedup.minhash_lsh_candidates(
        exact, "doc_id", "text", family="perm"
    )
    dropped = (
        connected_components(cand)
        .filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias("doc_id"))
    )
    lsh = exact.join(dropped, "doc_id", "left_anti").persist()
    n2 = lsh.count()
    t_lsh = time.time() - t0
    s_post = _sigma_df2(lsh)
    p_post, e_post, t_post = _pairs_time(lsh)
    n_exc_total = excerpts.count()
    print("| probe | seconds | result |")
    print("|---|---|---|")
    print(
        f"| containment RAW ({n0:,} docs incl. clone mass) | "
        f"{t_raw:.1f} | {p_raw:,} pairs ({e_raw:,} excerpt hits), "
        f"Σdf² {s_raw:,} |"
    )
    print(
        f"| upstream exact dedup | {t_exact:.1f} | {n0:,} → {n1:,} |"
    )
    print(
        f"| upstream MinHash-LSH keep-one | {t_lsh:.1f} | "
        f"{n1:,} → {n2:,} |"
    )
    print(
        f"| containment POST-dedup ({n2:,} docs) | {t_post:.1f} | "
        f"{p_post:,} pairs — {e_post:,}/{n_exc_total:,} planted "
        f"excerpts still caught, Σdf² {s_post:,} "
        f"(volume ÷{s_raw / max(s_post, 1):.1f}, "
        f"time ÷{t_raw / max(t_post, 1e-9):.1f}) |"
    )
    corpus.unpersist(); exact.unpersist(); lsh.unpersist()
    spark.stop()


def linkgraph_incr_probe(n: int = 1_000_000) -> None:
    """Round-7 task 6 measurement: incremental edge-index maintenance
    cost vs full re-extraction at a 1% release delta. n synthetic
    pages × 3 outlinks; release 2 changes 0.5%, removes 0.25%, adds
    0.25%. The sync's writes must be delta-sized and its wall a small
    fraction of the rebuild's."""
    import tempfile

    import polars_fastx_spark as pfs
    from pyspark.sql import functions as F
    from polars_fastx_spark.operators import linkgraph
    from polars_fastx_spark.operators.diffing import snapshot_diff

    spark = pfs.get_spark("linkgraph-incr")
    spark.sparkContext.setLogLevel("ERROR")

    def pages(release):
        d = spark.range(n).withColumnRenamed("id", "page_key")
        if release == 1:
            d = d.filter("page_key % 400 != 1")   # 0.25% added later
        else:
            d = d.filter("page_key % 400 != 2")   # 0.25% removed
        body = F.when(
            (F.lit(release) == 2) & (F.col("page_key") % 200 == 3),
            F.concat(F.lit("v2-"), F.col("page_key").cast("string")),
        ).otherwise(F.concat(F.lit("v1-"), F.col("page_key").cast("string")))
        return d.withColumn("body", body)

    def edges_of(p):
        return p.select(
            "page_key",
            F.explode(
                F.array(*[
                    F.concat(
                        F.lit(f"d{i}-"),
                        (F.col("page_key") % 1000).cast("string"),
                    )
                    for i in range(3)
                ])
            ).alias("dst"),
        ).select(
            "page_key",
            F.concat(
                F.lit("s"), (F.col("page_key") % 997).cast("string")
            ).alias("src"),
            "dst",
        )

    path = tempfile.mkdtemp(prefix="pfs_lg_probe_")
    print("| probe | seconds | result |")
    print("|---|---|---|")
    t0 = time.time()
    linkgraph.edge_index_build(edges_of(pages(1)), path)
    t_build = time.time() - t0
    e1 = len(spark.read.parquet(f"{path}/edges/epoch=0").take(1))
    t0 = time.time()
    d = snapshot_diff(pages(1), pages(2), ["page_key"], ["body"])
    got = linkgraph.edge_index_sync(path, d, edges_of(pages(2)))
    t_sync = time.time() - t0
    t0 = time.time()
    live_n = linkgraph.live_edges(spark, path).count()
    t_live = time.time() - t0
    t0 = time.time()
    direct_n = edges_of(pages(2)).count()
    t_direct = time.time() - t0
    assert live_n == direct_n, (live_n, direct_n)
    delta_rows = (
        spark.read.parquet(f"{path}/edges/epoch=2").count()
        if os.path.exists(f"{path}/edges/epoch=2")
        else spark.read.parquet(f"{path}/edges/epoch=1").count()
    )
    print(
        f"| edge_index_build ({n:,} pages × 3 links) | {t_build:.1f} "
        f"| full extraction |"
    )
    print(
        f"| edge_index_sync (1% delta: {got}) | {t_sync:.1f} | "
        f"appended {delta_rows:,} edge rows (delta-sized, "
        f"{100.0 * delta_rows / (3 * n):.2f}% of corpus); "
        f"maintained live == from-scratch ({live_n:,} rows, "
        f"read {t_live:.1f}s vs re-extract {t_direct:.1f}s) |"
    )
    spark.stop()


def snapshot_diff_probe(n: int = 2_000_000) -> None:
    """Diff two n-row snapshots differing by ~2.5% — the sparse-change
    release shape. The cost to watch at 100 TB is the two key
    shuffles of the full-outer join; output must stay change-sized."""
    import polars_fastx_spark as pfs
    from pyspark.sql import functions as F
    from polars_fastx_spark.operators import diffing

    spark = pfs.get_spark("scale-snapdiff")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.range(n).select(
        F.col("id"),
        (F.col("id") * 3).cast("double").alias("v"),
        F.md5(F.col("id").cast("string")).alias("s"),
    )
    old = base.filter(F.col("id") % 199 != 0)  # ~0.5% added later
    new = base.filter(F.col("id") % 97 != 0).withColumn(  # ~1% removed
        "v",
        F.when(F.col("id") % 89 == 0, F.col("v") + 1.0).otherwise(
            F.col("v")
        ),  # ~1.1% changed
    )
    t0 = time.time()
    summ = {
        r["change_type"]: r["n"]
        for r in diffing.snapshot_diff_summary(old, new, ["id"]).collect()
    }
    t_sum = time.time() - t0
    t0 = time.time()
    n_rows = diffing.snapshot_diff(old, new, ["id"]).count()
    t_diff = time.time() - t0
    exp_added = len([i for i in range(0, n, 199) if i % 97 != 0])
    exp_removed = len([i for i in range(0, n, 97) if i % 199 != 0])
    exp_changed = len(
        [i for i in range(0, n, 89) if i % 97 != 0 and i % 199 != 0]
    )
    assert summ["added"] == exp_added, (summ, exp_added)
    assert summ["removed"] == exp_removed, (summ, exp_removed)
    assert summ["changed"] == exp_changed, (summ, exp_changed)
    assert n_rows == exp_added + exp_removed + exp_changed
    print(
        f"snapshot_diff_summary {n:,} rows        {t_sum:6.1f}s   {summ}"
    )
    print(
        f"snapshot_diff {n:,} rows                {t_diff:6.1f}s   "
        f"{n_rows:,} change rows ({n_rows / n:.2%} of corpus) — all "
        f"three counts exact"
    )
    spark.stop()


def domain_cap_probe(n: int = 10_000_000) -> None:
    """Cap a crawl with ONE mega-domain holding half the rows — the
    SEO-farm shape domain_cap exists for. The two-phase selection's
    largest window partition is ~mega/65,536 rows; the naive
    whole-domain window (timed alongside as the anti-pattern) sorts
    the mega-domain in ONE task."""
    import polars_fastx_spark as pfs
    from pyspark.sql import functions as F
    from pyspark.sql import Window
    from polars_fastx_spark.functions import urls

    spark = pfs.get_spark("scale-domaincap")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 2 == 0,
            F.concat(F.lit("https://megafarm.com/p/"), F.col("id")),
        )
        .otherwise(
            F.concat(
                F.lit("https://site"), (F.col("id") % 100000).cast("string"),
                F.lit(".org/a/"), F.col("id"),
            )
        )
        .alias("url"),
    )
    cap = 1000
    t0 = time.time()
    kept = urls.domain_cap(df, "url", cap=cap, order_col="doc_id")
    n_kept = kept.count()
    n_mega = kept.filter(F.col("url").startswith("https://megafarm")).count()
    t_two = time.time() - t0
    assert n_mega == cap, n_mega
    t0 = time.time()
    key = F.col("doc_id").cast("string")
    w = Window.partitionBy(urls.url_domain(F.col("url"))).orderBy(
        F.md5(key).asc(), key.asc()
    )
    n_naive = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .count()
    )
    t_naive = time.time() - t0
    assert n_naive == n_kept, (n_naive, n_kept)
    print(
        f"domain_cap two-phase {n:,} rows (1 mega-domain @50%)   "
        f"{t_two:6.1f}s   kept {n_kept:,} ({cap} from the mega-domain)"
    )
    print(
        f"domain_cap naive whole-domain window (anti-pattern)    "
        f"{t_naive:6.1f}s   same survivor count — but the mega-domain "
        f"sorts in ONE task ({n // 2:,} rows)"
    )
    spark.stop()


def gopher_probe(n: int = 100_000) -> None:
    """The Gopher/C4 rule-pack at corpus scale: ``n`` documents (85%
    engineered to pass, 15% spread across the rule-tripping lanes),
    gated in ONE projection. Measures the pack's wall vs a trivial
    length-only scan of the same data — the 100 TB question is how
    much per-row work the 11 rules add to a scan stage, since the
    plan adds zero exchanges and zero Python (plan asserted)."""
    import polars_fastx_spark as pfs
    from polars_fastx_spark.operators import gopher as G
    from pyspark.sql import functions as F

    spark = pfs.get_spark("gopher-probe")
    spark.sparkContext.setLogLevel("ERROR")
    clean = (
        "the quick brown fox jumps over and that is fine to have with "
    )
    docs = spark.range(n).selectExpr(
        "id",
        f"""CASE CAST(id % 20 AS INT)
          WHEN 0 THEN repeat('- bullet item ' || id || '\\n', 20)
          WHEN 1 THEN repeat('the line ' || id || ' trails off...\\n', 12)
          WHEN 2 THEN repeat('# tag ', 40) || 'num ' || id
          ELSE repeat('{clean}', 6) || 'doc ' || id
        END AS text""",
    ).persist()
    n_real = docs.count()
    gated = G.gopher_gates(docs)
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
    t0 = time.time()
    verdicts = (
        gated.groupBy("passes_quality").count().collect()
    )
    dt = time.time() - t0
    t1 = time.time()
    docs.select(F.sum(F.length("text"))).collect()
    base = time.time() - t1
    passed = {r["passes_quality"]: r["count"] for r in verdicts}
    print("| probe | seconds | result |")
    print("|---|---|---|")
    print(
        f"| gopher_gates ({n_real:,} docs, 11 rules, one projection) | "
        f"{dt:.1f} | {passed.get(True, 0):,} pass / "
        f"{passed.get(False, 0):,} fail ({n_real / dt:,.0f} docs/s; "
        f"trivial length-scan of same data {base:.1f}s -> rule pack "
        f"adds {dt / max(base, 1e-9):.1f}x scan cost, 0 exchanges, "
        f"0 Python) |"
    )
    docs.unpersist()
    spark.stop()


def charset_probe(n: int = 200_000) -> None:
    """The charset seam's cost CURVE: decode n payloads at several
    legacy-charset fractions and against the blind-cast baseline. The
    100 TB claim is that Arrow cost scales with the NON-UTF-8
    fraction, not the corpus — this measures it."""
    import polars_fastx_spark as pfs
    from polars_fastx_spark.functions.charset import decode_payloads
    from pyspark.sql import functions as F

    spark = pfs.get_spark("charset-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sjis = "日本語の本文 ".encode("shift_jis").hex()
    cp = "smart \u201cq\u201d text ".encode("cp1252").hex()
    rows = []
    for frac in (0.0, 0.05, 0.2, 0.5):
        cut = int(1 / frac) if frac else 0
        legacy_ct = (
            f"CASE WHEN id % {cut} = 0 AND id % {2 * cut} = 0 "
            f"THEN 'text/html' "
            f"WHEN id % {cut} = 0 THEN 'text/html; charset=iso-8859-1' "
            f"ELSE 'text/html; charset=utf-8' END"
            if cut
            else "'text/html; charset=utf-8'"
        )
        # every lane ~same byte volume, so the curve isolates the
        # FRACTION axis instead of confounding it with payload size
        legacy_pay = (
            f"CASE WHEN id % {cut} = 0 AND id % {2 * cut} = 0 "
            f"THEN encode('<meta charset=" + '"' + "shift_jis" + '"'
            + f">', 'UTF-8') || unhex(repeat('{sjis}', 20)) "
            f"|| encode('t' || id, 'UTF-8') "
            f"WHEN id % {cut} = 0 THEN unhex(repeat('{cp}', 20)) "
            f"|| encode('t' || id, 'UTF-8') "
            f"ELSE encode(repeat('utf8 body ', 40) || id, 'UTF-8') END"
            if cut
            else "encode(repeat('utf8 body ', 40) || id, 'UTF-8')"
        )
        df = spark.range(n).selectExpr(
            "id", f"{legacy_ct} AS http_content_type",
            f"{legacy_pay} AS payload",
        ).persist()
        df.count()
        out = decode_payloads(df)
        out.agg(F.sum(F.length("text"))).collect()  # warm
        t0 = time.time()
        out.agg(F.sum(F.length("text"))).collect()
        dt = time.time() - t0
        t1 = time.time()
        df.select(F.col("payload").cast("string").alias("t")).agg(
            F.sum(F.length("t"))
        ).collect()
        base = time.time() - t1
        rows.append((frac, dt, base))
        df.unpersist()
    print("| legacy fraction | decode s | blind-cast s | ratio |")
    print("|---|---|---|---|")
    for frac, dt, base in rows:
        print(
            f"| {frac:.0%} | {dt:.2f} | {base:.2f} | "
            f"{dt / max(base, 1e-9):.1f}x |"
        )
    spark.stop()


def fetch_schedule_probe(n: int = 100_000) -> None:
    """The politeness loop at frontier scale (round-9 #6): ``n`` URLs
    over a realistic domain mixture (one mega-domain, a mid tier, a
    long tail), budgeted by ``domain_cap`` and scheduled by
    ``fetch_schedule``, then the same frontier streamed as two
    micro-batch epochs through ``_fetch_frontier_epoch``. Measures
    wall for each path and the per-domain schedule SKEW (the horizon
    — each domain's last fetch offset): the 100 TB question is
    whether one domain's backlog stretches the fetch horizon while
    the long tail drains instantly, and whether the cross-batch
    continuation holds the per-domain pace at scale (asserted
    distributedly, never collected)."""
    import polars_fastx_spark as pfs
    from polars_fastx_spark.functions.robots import fetch_schedule
    from polars_fastx_spark.functions.urls import domain_cap
    from polars_fastx_spark.streaming.pipelines import (
        _fetch_frontier_epoch,
    )
    from pyspark.sql import functions as F

    spark = pfs.get_spark("fetch-schedule-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # 20% mega.example.com, 30% over 100 mid-N.net, 50% over 10k
    # tail-N.org
    urls = spark.range(n).selectExpr(
        """CASE
             WHEN id % 10 < 2 THEN 'https://mega.example.com/p/' || id
             WHEN id % 10 < 5 THEN 'https://mid-' || (id % 100)
               || '.net/p/' || id
             ELSE 'https://tail-' || (id % 10000) || '.org/p/' || id
           END AS url""",
    ).persist()
    urls.count()
    delays = spark.range(101).selectExpr(
        "CASE WHEN id = 100 THEN 'mega.example.com' "
        "ELSE 'mid-' || id || '.net' END AS domain",
        "CASE WHEN id = 100 THEN 0.5 ELSE 2.0 END AS crawl_delay",
    )  # tail domains absent -> default 1.0

    cap = 200
    t0 = time.time()
    sched = fetch_schedule(
        domain_cap(urls, "url", cap=cap), delays
    ).persist()
    kept = sched.count()
    dt = time.time() - t0

    per_dom = sched.groupBy("domain").agg(
        F.count("*").alias("n"),
        F.max("fetch_offset_s").alias("horizon"),
        F.count_distinct("fetch_offset_s").alias("n_off"),
    ).persist()
    # pacing invariant, checked distributedly: offsets are exactly
    # 0..(n-1)*delay per domain (distinct count == row count and the
    # horizon is (n-1)*delay for the known tiers)
    bad = per_dom.filter(F.col("n_off") != F.col("n")).count()
    horizons = per_dom.agg(
        F.expr("percentile(horizon, 0.5)").alias("p50"),
        F.expr("percentile(horizon, 0.99)").alias("p99"),
        F.max("horizon").alias("mx"),
        F.count("*").alias("domains"),
    ).first()
    print("| probe | seconds | result |")
    print("|---|---|---|")
    print(
        f"| fetch_schedule batch ({n:,} urls -> {kept:,} after "
        f"cap={cap}, {horizons['domains']:,} domains) | {dt:.1f} | "
        f"horizon p50 {horizons['p50']:.0f}s / p99 "
        f"{horizons['p99']:.0f}s / max {horizons['mx']:.0f}s; "
        f"{bad} domains with colliding offsets |"
    )

    # streaming continuation: the same frontier in two 50/50 epochs
    import tempfile

    out = tempfile.mkdtemp(prefix="pfs_sched_probe_")
    halves = [
        urls.filter(F.col("id") % 2 == i).drop("id") for i in (0, 1)
    ]
    t1 = time.time()
    _fetch_frontier_epoch(halves[0], 0, delays, out, cap=cap)
    e0 = time.time() - t1
    t2 = time.time()
    _fetch_frontier_epoch(halves[1], 1, delays, out, cap=cap)
    e1 = time.time() - t2
    allrows = spark.read.parquet(out)
    # cross-batch pace, asserted distributedly: within every domain
    # consecutive offsets differ by >= the domain's delay
    from pyspark.sql import Window

    w = Window.partitionBy("domain").orderBy("fetch_offset_s")
    gaps = allrows.withColumn(
        "__gap", F.col("fetch_offset_s") - F.lag("fetch_offset_s").over(w)
    ).filter(F.col("__gap").isNotNull())
    viol = gaps.filter(
        F.col("__gap") < F.col("crawl_delay_s") - F.lit(1e-9)
    ).count()
    n_stream = allrows.count()
    print(
        f"| stream_fetch_frontier 2 epochs ({n_stream:,} scheduled) | "
        f"{e0:.1f} + {e1:.1f} | {viol} pace violations across the "
        f"epoch boundary (per-domain gap >= crawl_delay everywhere) |"
    )
    urls.unpersist(); sched.unpersist(); per_dom.unpersist()
    spark.stop()


def zonemap_probe(n: int = 2_000_000, parts: int = 200) -> None:
    """Zone-map data skipping at table scale (round 9): ``n`` rows
    range-bucketed into ``parts`` partitions, then a narrow range
    read three ways — full scan + filter, manifest zone-map pruning
    (``read_table(range_filter=…)``), and the pruning DECISION cost
    alone. The 100 TB question is the read amplification: a narrow
    probe on a clustered column should open O(1) partitions, not
    O(parts), and the decision must come from the manifest alone
    (no storage listing)."""
    import tempfile

    import polars_fastx_spark as pfs
    from polars_fastx_spark.operators import manifest as mf
    from pyspark.sql import functions as F

    spark = pfs.get_spark("zonemap-probe")
    spark.sparkContext.setLogLevel("ERROR")
    per = n // parts
    path = tempfile.mkdtemp(prefix="pfs_zm_probe_")
    df = spark.range(n).selectExpr(
        "id", f"CAST(id DIV {per} AS STRING) AS part",
        "id * 3 AS val",
    )
    t0 = time.time()
    mf.create_table(spark, path, df, "part", stats_cols=["id"])
    t_build = time.time() - t0
    lo, hi = 5 * per + 10, 5 * per + 500  # inside one bucket
    man = mf.read_manifest(spark, path)
    t1 = time.time()
    sel = mf._select_partitions(man, range_filter={"id": (lo, hi)})
    t_decide = time.time() - t1
    t2 = time.time()
    n_pruned = mf.read_table(
        spark, path, range_filter={"id": (lo, hi)}
    ).count()
    t_pruned = time.time() - t2
    t3 = time.time()
    n_full = mf.read_table(spark, path).filter(
        (F.col("id") >= lo) & (F.col("id") <= hi)
    ).count()
    t_full = time.time() - t3
    assert n_pruned == n_full == hi - lo + 1
    print("| probe | seconds | result |")
    print("|---|---|---|")
    print(
        f"| zone-map range read ({n:,} rows, {parts} partitions, "
        f"{hi - lo + 1}-row probe) | build {t_build:.1f} | "
        f"pruned read {t_pruned:.2f}s opens {len(sel)}/{parts} "
        f"partitions vs full-scan filter {t_full:.2f}s "
        f"({t_full / max(t_pruned, 1e-9):.1f}x); decision "
        f"{t_decide * 1000:.1f}ms from the manifest alone |"
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--zonemap":
        zonemap_probe(
            int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000,
            int(sys.argv[3]) if len(sys.argv) > 3 else 200,
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--fetch-schedule":
        fetch_schedule_probe(
            int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--charset":
        charset_probe(int(sys.argv[2]) if len(sys.argv) > 2 else 200_000)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--gopher":
        gopher_probe(int(sys.argv[2]) if len(sys.argv) > 2 else 100_000)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--fuzzy":
        fuzzy_probe()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--domain-cap":
        domain_cap_probe(
            int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--snapshot-diff":
        snapshot_diff_probe(
            int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--jpeg":
        jpeg_probe()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--warc":
        warc_probe(sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_sf1")
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--crawl-e2e":
        crawl_e2e_probe(
            sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_sf1",
            n=int(sys.argv[3]) if len(sys.argv) > 3 else 30_000,
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--linkgraph-incr":
        linkgraph_incr_probe(
            int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--containment-composition":
        containment_composition_probe(
            sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_sf1"
        )
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--containment-sweep":
        containment_sweep(
            sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_sf1",
            tier=sys.argv[3] if len(sys.argv) > 3 else "all",
            caps=tuple(
                float(c) for c in sys.argv[4].split(",")
            ) if len(sys.argv) > 4 else (0.01, 0.02, 0.04),
        )
        return
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf1"
    if not os.path.exists(os.path.join(workdir, "edges.parquet")):
        t0 = time.time()
        generate(workdir)
        print(f"generated {workdir} in {time.time() - t0:.1f}s")
    generate_clustered(workdir)  # self-guarded; fills in older workdirs

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

    # ---- text tier: the (doc,word)/(band,key)-shuffle family --------
    from polars_fastx_spark.operators import text

    probe(
        "tokenize_to_ids (50k docs, 3M words)",
        lambda: (
            lambda out: f"{out.count():,} docs, "
            f"{out.agg(F.sum('n_tokens')).first()[0]:,} tokens"
        )(text.tokenize_to_ids(docs, "doc_id", "text", min_count=2)),
    )
    qt = spark.createDataFrame(
        [(i, VOCAB[(i * 7 + j) % len(VOCAB)]) for i in range(50) for j in range(3)],
        "query_id int, term string",
    )
    probe(
        "bm25_multi (50 queries x 50k docs)",
        lambda: f"{text.bm25_multi(docs, qt, 'doc_id', 'text').count():,} (q,doc) pairs",
    )
    probe(
        "winnow_fingerprints (50k docs)",
        lambda: f"{docs.select(F.explode(text.winnow_fingerprints('text')).alias('f')).count():,} fingerprints",
    )

    def _line_dedup():
        segs = text.chunk_tokens(docs, "text", size=20).select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("pos"),
            F.col("chunk").alias("seg"),
        )
        out = text.line_dedup(
            segs, id_col="doc_id", seg_col="seg", pos_col="pos",
            min_docs=2, joiner=" ",
        )
        kept = out.agg(
            F.sum("n_segments").alias("s"), F.sum("n_kept").alias("k")
        ).first()
        return f"{kept['s']:,} segs -> {kept['k']:,} kept"

    probe("line_dedup (50k docs, 20-word segs)", _line_dedup)

    # ---- persisted ANN index: build / incremental add / search ------
    # recall measured on planted clusters (500 centers x 100) — the
    # substrate where exact-NN gaps exceed quantization distortion
    import shutil
    import tempfile

    from polars_fastx_spark.operators import ann_index

    embc = spark.read.parquet(
        os.path.join(workdir, "embeddings_clustered.parquet")
    ).select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    idx_path = tempfile.mkdtemp(prefix="scale_ann_")
    try:
        probe(
            "ann index_build (45k vecs, trained)",
            lambda: (
                ann_index.index_build(
                    embc.filter("vec_id < 45000"), "vec_id", "v", idx_path,
                    num_cells=64, m=8, pq_k=16, pinned=False, iterations=3,
                ),
                "64 cells, 8x16 books",
            )[1],
        )
        probe(
            "ann index_add (5k vec batch)",
            lambda: f"epoch {ann_index.index_add(embc.filter('vec_id >= 45000'), 'v', idx_path)}",
        )

        def _search_recall():
            qv = [float(x) for x in embc.filter("vec_id = 123").first()["v"]]
            approx = {
                r["vec_id"]
                for r in ann_index.index_search(
                    spark, idx_path, qv, k=10, nprobe=8
                ).collect()
            }
            lit_q = F.array(*[F.lit(x) for x in qv])
            d2 = F.aggregate(
                F.zip_with(F.col("v"), lit_q, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            exact = {
                r["vec_id"]
                for r in embc.select("vec_id", d2.alias("d"))
                .orderBy(F.col("d").asc(), F.col("vec_id").asc())
                .limit(10)
                .collect()
            }
            rec = len(approx & exact) / 10
            assert rec >= 0.8, (sorted(approx), sorted(exact))
            return f"recall@10 {rec:.0%} vs exact L2"

        probe("ann index_search (persisted, nprobe=8)", _search_recall)
    finally:
        shutil.rmtree(idx_path, ignore_errors=True)

    # ---- containment tier: inverted shingle index at 10× ------------
    # Substrate matters here: containment's cost is Σ df² over the
    # shingle index, so the probe corpus is the shape the operator is
    # FOR — 50k mostly-unique docs, 5% of which quote one of 100 source
    # passages, and EVERY doc carrying the same boilerplate header
    # (df = 50k). Uncapped, the header alone would join ~50k²/2 ≈ 1.2B
    # pairs per header shingle; the fractional df cap must cut it and
    # keep the join linear in the planted-quote volume.
    cont_path = os.path.join(workdir, "documents_containment.parquet")
    if not os.path.exists(cont_path):
        rng = np.random.RandomState(77)
        passages = [
            " ".join(f"passage{p}word{w}" for w in range(12))
            for p in range(100)
        ]
        texts, ids = [], []
        for i in range(N_DOCS):
            body = " ".join(f"u{i}x{j}" for j in range(40))
            quote = passages[(i // 20) % 100] + " " if i % 20 == 0 else ""
            texts.append("standard corpus license header line " + quote + body)
            ids.append(i)
        # the passage pool itself rides along as docs 1M+ (the
        # "benchmark" side of the between probe)
        for p, t in enumerate(passages):
            ids.append(1_000_000 + p)
            texts.append(t)
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts)}),
            cont_path,
        )
    cdocs = spark.read.parquet(cont_path).filter("doc_id < 1000000")
    cbench = spark.read.parquet(cont_path).filter("doc_id >= 1000000")

    def _containment():
        out = dedup.containment_pairs(
            cdocs, "doc_id", "text", k=8, threshold=0.5,
            max_shingle_df=0.04,
        )
        n = out.count()
        # every planted (quoting, quoting) same-passage pair is found:
        # 2.5k quoting docs in 100 passage groups of 25 -> 25*24/2 per
        # group is the candidate clique; threshold 0.5 keeps pairs
        # whose shared quote dominates the smaller doc — spot-check
        # volume is in the planted order of magnitude, not ~1.2B
        assert n < 1_000_000, n
        return f"{n:,} pairs (header df=50k cut by 4% cap)"

    probe("containment 50k docs (frac cap)", _containment)

    def _containment_between():
        # NO corpus-df cap here, deliberately: the decontam join's
        # fan-out is bounded by the BENCHMARK postings side (only
        # bench shingles join; the df-50k header never enters), so
        # uncapped is the correct default — and a cap would cut quote
        # shingles shared across popular passages, dropping recall
        # (measured: threshold-0.9 hits fall to 0 with cap=2000).
        out = dedup.containment_pairs_between(
            cdocs, cbench, "doc_id", "text", k=8, threshold=0.9,
        )
        n = out.count()
        assert n == 2_500, n  # exactly the planted quoting docs
        return f"{n:,} (doc, passage) hits == planted 2,500"

    probe("containment_between (100 bench)", _containment_between)

    # ---- multimodal tier: image dHash near-dup at volume ------------
    # 20k 32×32 BMPs (1k of them lightly-edited copies of other
    # corpus members), binary column through Arrow mapInPandas decode
    # + the shared pigeonhole hamming engine. Measures the Python
    # decode throughput (the modality's real cost) and pins that the
    # banded join stays linear in the planted-pair volume.
    img_path = os.path.join(workdir, "images.parquet")
    if not os.path.exists(img_path):
        import struct as _struct

        def _bmp(px):
            h, w, _ = px.shape
            stride = (w * 3 + 3) // 4 * 4
            body = b"".join(
                r.tobytes() + b"\x00" * (stride - w * 3) for r in px[::-1]
            )
            hdr = b"BM" + _struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
            hdr += _struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0
            )
            return hdr + body

        rng = np.random.RandomState(21)
        paths, blobs = [], []
        originals = []
        for i in range(19_000):
            px = rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
            originals.append(px)
            paths.append(f"img{i:05d}.bmp")
            blobs.append(_bmp(px))
        for i in range(1_000):  # planted near-dups of the first 1k
            px = originals[i].copy()
            px[10:14, 10:14] = 255
            paths.append(f"dup{i:05d}.bmp")
            blobs.append(_bmp(px))
        pq.write_table(
            pa.table({"path": pa.array(paths),
                      "content": pa.array(blobs, pa.binary())}),
            img_path,
        )

    from polars_fastx_spark.operators import multimodal

    imgs = spark.read.parquet(img_path)

    def _image_neardup():
        pairs = multimodal.image_near_duplicates(imgs, max_distance=6)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        planted = sum(
            1 for a, b in got
            if a.startswith("dup") != b.startswith("dup")
            and a[3:8] == b[3:8]
        )
        return f"{len(got):,} pairs, {planted:,}/1,000 planted edits found"

    probe("image dhash near-dup (20k BMPs)", _image_neardup)

    print("\n| probe | seconds | result |")
    print("|---|---|---|")
    for name, dt, out in rows:
        print(f"| {name} | {dt:.1f} | {out} |")


if __name__ == "__main__":
    main()
