"""Physical-plan pins (SURVEY.md §4.3) — the 100 TB posture, testable.

One expectation per headline pattern: pushdown reaches the parquet
scan, column pruning works, dimension joins broadcast, the as-of join
costs exactly one shuffle, and nothing in the headline suite degrades
to a cartesian product.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_fastx_spark import plans
from polars_fastx_spark.catalog import QUERIES

SF = "/root/testdata/sf0.001"


def test_filter_pushed_to_parquet_scan(spark):
    df = QUERIES["p_filter_project"].fn(spark, SF)
    assert plans.has_pushed_filters(df, "l_quantity")


def test_column_pruning(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_quantity") > 30)
        .select("l_orderkey")
    )
    cols = plans.pruned_columns(df)
    assert set(cols) == {"l_orderkey", "l_quantity"}  # 2 of 11 columns read


def test_dim_join_broadcasts(spark):
    df = QUERIES["j_inner_3way"].fn(spark, SF)
    assert plans.has_broadcast_join(df)


def test_asof_join_single_shuffle(spark):
    """The union+window as-of join must cost exactly one exchange —
    that's its whole advantage over a range join at scale."""
    from polars_fastx_spark.operators.asof import join_asof

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    left = orders.select("o_custkey", F.col("o_orderdate").alias("t"))
    right = orders.select(
        "o_custkey", F.col("o_orderdate").alias("t"), "o_totalprice"
    )
    df = join_asof(left, right, on="t", by="o_custkey")
    assert plans.shuffle_count(df) == 1


def test_agg_keeps_whole_stage_codegen(spark):
    df = QUERIES["q_agg_tpch1"].fn(spark, SF)
    assert plans.has_whole_stage_codegen(df)


#: queries whose SEMANTICS are a nested-loop/cross join — everything
#: else in the catalog must plan without a cartesian product.
ALLOWED_NESTED_LOOP = {
    "j_cross",            # explicit cross join
    "l_cosine_topk",      # brute-force pair generation (oracle tier)
    "l_embed_neardup",    # id_a < id_b pair scan (exact, small side)
    "l_ngram_jaccard",    # deterministic pair subset via inequality join
    "l_ivf_topk",         # centroid assignment = broadcast × tiny centroid table
    "l_semdedup",         # centroid assignment = broadcast × tiny centroid table
    "l_knn_per_query",    # block-pair table = cross of bare block ids (ints)
    "sq_scalar_avg",      # scalar subquery = 1-row broadcast build side
    "q_funnel",           # final report = 1-row × 1-row scalar cross join
    "l_kmeans",           # assignment = broadcast × k-row centroid table
    "l_unigram_quality",  # corpus total = 1-row broadcast cross join
    "l_quantize_int8",    # dim-scale array = 1-row broadcast cross join
    "l_bm25",             # corpus stats = 1-row broadcast cross join
    "l_rrf_hybrid",       # BM25 stats + query vector = 1-row broadcast cross joins
    "l_tfidf",            # doc-count N = 1-row broadcast cross join
    "l_source_mix",       # lang-count = 1-row broadcast cross join
    "q_tpch11",           # HAVING-fraction scalar = 1-row broadcast cross join
    "q_tpch22",           # avg-acctbal scalar = 1-row broadcast cross join
    "l_dsir_sample",      # model totals = two 1-row broadcast cross joins
    "l_distinctive_terms",  # corpus total = 1-row broadcast cross join
    "l_ivfpq_topk",       # IVF centroid assignment = broadcast × tiny centroid table
    "l_ivfpq_topk_pinned",  # same shape as l_ivfpq_topk, frozen books
    "l_bm25_multi",       # corpus stats = 1-row broadcast cross join
    "l_temperature_mix",  # power-sum total = 1-row broadcast cross join
    "k_n50",              # totals/n50 = 1-row broadcast cross joins
    "x_sketch_kmv",       # est/exact assembly = 1-row broadcast cross joins
    "x_sketch_join_size",  # est/exact assembly = 1-row broadcast cross join
    "l_mmr_rerank",       # relevance pool = tiny broadcast query cross join
    "l_hard_negatives",   # anchor set = tiny broadcast theta join
    "l_ann_index_search",  # IVF assignment in build = broadcast × centroids
    "l_ann_index_stats",  # same build shape, stats read side
    "l_ann_index_add",    # same build shape + frozen-centroid assignment
    "l_ann_index_search_many",  # queries × ≤num_cells centroids and
    # probed × m·pq_k books: both broadcast crosses of bounded tables
    "l_containment",      # corpus doc-count = 1-row broadcast cross join
    "l_containment_drop",  # same corpus doc-count broadcast shape
    "l_ann_index_delete",  # same build shape as l_ann_index_search
    "l_ann_index_search_filtered",  # same build shape as l_ann_index_search
    "l_ann_index_recall",  # build shape + deliberate brute-force exact side
    "l_ann_index_drift",  # IVF assignment = broadcast × tiny centroid table
    "l_containment_gate",  # history doc-count = 1-row broadcast cross join
    "l_release_drift",    # release totals = 1-row broadcast cross join
    "l_ann_index_sync",   # same build shape as l_ann_index_search
    "l_ann_index_sync_fp",  # same build shape, fingerprint lane
    "l_containment_delete",  # history doc-count = 1-row broadcast cross join
}


def test_whole_catalog_avoids_cartesian(spark):
    offenders = []
    for name, spec in sorted(QUERIES.items()):
        df = spec.fn(spark, SF)
        if plans.has_cartesian(df) and name not in ALLOWED_NESTED_LOOP:
            offenders.append(name)
    assert not offenders, f"unexpected cartesian/nested-loop plans: {offenders}"


def test_tpch5_broadcasts_dims(spark):
    """The 6-way Q5 join: supplier/nation/region must broadcast and the
    lineitem⋈orders⋈customer backbone must stay hash-partitioned —
    the plan that survives 100 TB."""
    df = QUERIES["q_tpch5"].fn(spark, SF)
    plan = plans.explain_str(df)
    assert plan.count("BroadcastHashJoin") >= 3
    assert not plans.has_cartesian(df)


def test_exists_subquery_plans_as_semi_join(spark):
    df = QUERIES["sq_exists_corr"].fn(spark, SF)
    assert "LeftSemi" in plans.explain_str(df)


def test_not_exists_subquery_plans_as_anti_join(spark):
    df = QUERIES["sq_not_exists_corr"].fn(spark, SF)
    assert "LeftAnti" in plans.explain_str(df)


def test_scalar_subquery_is_single_row_broadcast(spark):
    """The global-average filter must plan as a broadcast of the 1-row
    aggregate — never a driver-side collect of the average."""
    df = QUERIES["sq_scalar_avg"].fn(spark, SF)
    assert "BroadcastNestedLoopJoin" in plans.explain_str(df)


def test_minhash_lsh_no_cartesian(spark):
    """LSH candidate generation must join on (band, band_key) equality —
    never a cross product of documents."""
    from polars_fastx_spark.operators.dedup import minhash_lsh_candidates

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cand = minhash_lsh_candidates(docs, "doc_id", "text")
    assert not plans.has_cartesian(cand)


def _relation_count(df, marker_col: str) -> int:
    """Leaf relations in the optimized logical plan whose schema has
    ``marker_col`` (relation leaves print columns, not file paths)."""
    s = df._jdf.queryExecution().optimizedPlan().toString()
    return sum(
        1
        for ln in s.splitlines()
        if "Relation" in ln and f"{marker_col}#" in ln
    )


def test_tpch6_all_predicates_reach_scan(spark):
    df = QUERIES["q_tpch6"].fn(spark, SF)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert plans.has_pushed_filters(df, col), col


def test_tpch18_single_fact_scan(spark):
    """The IN-subquery rewrite must reference lineitem ONCE — the
    textbook HAVING-subquery form reads the fact twice."""
    df = QUERIES["q_tpch18"].fn(spark, SF)
    assert _relation_count(df, "l_partkey") == 1


def test_rollup_reuses_fact_exchange(spark):
    """Hierarchical staging references the minute level three times in
    the logical plan; at runtime AQE must collapse those into one
    materialized fact pass (ReusedExchange for the hour and day
    branches) — the property that makes multi-resolution rollup a
    single 100 TB scan."""
    df = QUERIES["t_rollup_hier"].fn(spark, SF)
    df.collect()
    final = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert final.count("ReusedExchange") >= 2


#: queries allowed to cross into Python — Arrow-batched ONLY
#: (FlatMapGroupsInPandas / MapInPandas / ArrowEvalPython / pandas
#: grouped-agg); every other catalog query must stay fully JVM-side.
ALLOWED_ARROW_PYTHON = {
    "t_ewma",                 # applyInPandas EWMA recursion
    "l_pack_ffd",             # mapInPandas FFD packing
    "l_pack_ffd_1p",          # mapInPandas FFD packing (oracle variant)
    "l_knn_per_query",        # numpy per-query top-k cells
    "x_applyinpandas_zscore", # applyInPandas
    "x_udaf_entropy",         # pandas grouped-agg UDAF
    "l_multimodal_features",  # mapInPandas builtin decode
    "l_audio_features",       # mapInPandas WAV decode
    "l_charset_decode",       # mapInPandas legacy-charset decode
                              # (UTF-8 branch stays codegen)
    "l_embed_neardup",        # numpy block-matmul
    "l_cosine_topk",          # numpy top-k
    "l_ann_lsh_topk",         # numpy re-rank
    "l_ivf_topk",             # numpy cells
    "l_kmeans",               # pandas centroid loop
    "x_udtf_ngrams",          # Python UDTF (arrow-optimized)
}


def test_no_row_at_a_time_python_in_catalog(spark):
    """BatchEvalPython (row-at-a-time Python UDF) must appear NOWHERE:
    the 10-100x penalty it carries is the one regression this engine
    bans outright. Arrow-batched Python is allowed only on the
    explicit allowlist above."""
    offenders, rogue_python = [], []
    for name, spec in sorted(QUERIES.items()):
        plan = plans.explain_str(QUERIES[name].fn(spark, SF))
        if "BatchEvalPython" in plan:
            offenders.append(name)
        if name not in ALLOWED_ARROW_PYTHON and (
            "InPandas" in plan or "ArrowEvalPython" in plan or "EvalPython" in plan
        ):
            rogue_python.append(name)
    assert not offenders, f"row-at-a-time Python UDFs: {offenders}"
    assert not rogue_python, f"undeclared Python stages: {rogue_python}"


def test_catalog_builders_never_collect():
    """No catalog query builder may materialize rows on the driver —
    driver-side loops don't scale. (Iterative OPERATORS may move ≤k
    rows/scalars per round; that lives in operators/, documented, not
    here.)"""
    import inspect

    import polars_fastx_spark.catalog as cat

    src = inspect.getsource(cat)
    assert ".collect()" not in src
    assert ".toPandas()" not in src


def test_similarity_never_collects():
    """The exact-kNN tier must be fully distributed: blocked gemm, not
    a driver-collected broadcast index (a driver OOM at 100 TB). Only
    count() (block sizing) may touch the driver."""
    import inspect

    from polars_fastx_spark.operators import similarity

    src = inspect.getsource(similarity)
    assert ".collect()" not in src
    assert ".toPandas()" not in src
    assert "broadcast(" not in src.replace("F.broadcast(", "")  # no sc.broadcast


def test_ivf_has_no_global_window(spark):
    """IVF centroid seeding must be TakeOrdered (per-partition top-k),
    never a single-partition global window over the whole table."""
    df = QUERIES["l_ivf_topk"].fn(spark, SF)
    plan = plans.explain_str(df)
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan


def test_rrf_hybrid_cuts_sources_before_ranking(spark):
    """Each retriever must be cut to top-N via TakeOrderedAndProject
    BEFORE the rank window — the windows then run over ≤ N rows per
    source, never the corpus."""
    df = QUERIES["l_rrf_hybrid"].fn(spark, SF)
    plan = plans.explain_str(df)
    assert plan.count("TakeOrderedAndProject") >= 2


def test_quota_take_broadcasts_quota_table(spark):
    """The (stratum, quota) table is tiny and must ride a broadcast
    join, not shuffle the corpus."""
    from polars_fastx_spark.operators import sampling

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    quotas = spark.createDataFrame([("en", 5)], "lang string, quota long")
    df = sampling.quota_take(docs, "lang", "doc_id", quotas)
    assert "BroadcastHashJoin" in plans.explain_str(df)


def test_semdedup_broadcasts_centroids(spark):
    """Cell assignment must broadcast the tiny centroid table — the
    corpus side never shuffles for it."""
    df = QUERIES["l_semdedup"].fn(spark, SF)
    assert "BroadcastNestedLoopJoin" in plans.explain_str(df)


def test_rank_topk_group_limits_before_shuffle(spark):
    """The rank<=3 filter must plan as WindowGroupLimit with a Partial
    pass BEFORE the exchange — only the per-key top-3 rows shuffle,
    which is what keeps ranked top-k viable on a 100 TB fact."""
    df = QUERIES["w_rank_topk"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") >= 2


def test_fuzzy_join_query_no_cartesian(spark):
    """j_fuzzy's oracle IS the cartesian definition; the Spark plan must
    instead be the deletion-neighborhood equi-join."""
    df = QUERIES["j_fuzzy"].fn(spark, SF)
    assert not plans.has_cartesian(df)


def test_salted_skew_replicates_dim_per_salt(spark):
    """j_salted_skew must plan the salt fan-out (explode/generate on the
    dim side) and join on (key, salt) — no cartesian, no unsalted
    single-partition hot key."""
    df = QUERIES["j_salted_skew"].fn(spark, SF)
    plan = plans.explain_str(df)
    assert "Generate explode" in plan or "Generate" in plan
    assert not plans.has_cartesian(df)


def test_triangles_plans_as_equi_joins(spark):
    df = QUERIES["l_triangles"].fn(spark, SF)
    assert not plans.has_cartesian(df)


def test_runtime_bloom_filter_injected_for_selective_dim(spark):
    """The 100 TB shuffle-join regime (dim too big to broadcast):
    Spark's runtime row-level Bloom filter must be injected from the
    filtered dim side into the fact scan — the non-partitioned-column
    analog of dynamic partition pruning. Pinned with broadcast joins
    disabled so the shuffle path (where the filter matters) is what's
    planned."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        part = spark.read.parquet(f"{SF}/part.parquet").filter(
            F.col("p_size") == 1
        )
        j = li.join(part, li.l_partkey == part.p_partkey).select(
            "l_orderkey", "p_name"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom" in plan.lower(), plan[:1500]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_shuffle_count_counts_roundrobin(spark):
    df = spark.read.parquet(f"{SF}/nation.parquet").repartition(4)
    assert plans.shuffle_count(df) == 1


def test_pruned_columns_decimal_and_nested(spark, tmp_path):
    """ReadSchema parsing must survive decimal(p,s) commas and nested
    array<>/struct<> angle brackets."""
    p = str(tmp_path / "t")
    spark.range(10).select(
        F.col("id"),
        F.col("id").cast("decimal(15,2)").alias("amount"),
        F.array(F.col("id").cast("float")).alias("emb"),
        F.struct(F.col("id").alias("a"), F.lit("x").alias("b")).alias("s"),
    ).write.parquet(p)
    df = spark.read.parquet(p).select("amount", "emb", "s", "id")
    assert set(plans.pruned_columns(df)) == {"amount", "emb", "s", "id"}


def test_builder_respects_spark_submit_gateway(monkeypatch):
    """Under spark-submit (gateway env present) the builder must NOT
    force a local master over the submitted one."""
    import importlib

    from polars_fastx_spark import session as S

    monkeypatch.setenv("PYSPARK_GATEWAY_PORT", "12345")
    b = S.builder("t")
    assert "spark.master" not in b._options
    monkeypatch.delenv("PYSPARK_GATEWAY_PORT")
    b2 = S.builder("t")
    assert str(b2._options.get("spark.master", "")).startswith("local[")
