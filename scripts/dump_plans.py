"""Regenerate PLANS.md — annotated physical plans for headline queries.

Usage: python scripts/dump_plans.py [sf_dir]   (default sf0.001)

Each entry prints the executed plan AFTER an action so AQE's final
plan (broadcast decisions, coalesced shuffles, reused exchanges) is
what's shown — the plan that actually ran, not the static guess.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HEADLINE = {
    "q_agg_tpch1": "TPC-H Q1 scan+agg: predicate pushed to parquet, "
    "two-phase partial aggregation, whole-stage codegen end to end.",
    "q_tpch5": "6-way join: supplier/nation/region broadcast; the "
    "lineitem⋈orders⋈customer backbone shuffles on join keys only.",
    "q_tpch18": "Aggregate-filtered IN rewritten to a single lineitem "
    "scan; AQE broadcasts the collapsed (~100-row) aggregate side.",
    "t_rollup_hier": "Minute→hour→day staging: ReusedExchange collapses "
    "the three logical references to ONE materialized fact pass.",
    "j_binned_range": "Keyless range join as explode-to-bins + hash "
    "equi-join on _bin — no BroadcastNestedLoop anywhere.",
    "l_corpus_pipeline": "Length gate pushed to scan; one shuffle for "
    "the md5(text) dedup window; split assignment stays a map.",
    "l_det_sample": "Content-addressed sample: filter-only plan, no "
    "Sample node, no exchange.",
    "q_tpch19": "Disjunctive join filter: Catalyst derives per-side "
    "prefilters — quantity envelope in the lineitem scan, brand/size "
    "disjunction in the part scan (see PushedFilters).",
    "t_interpolate": "Linear gap fill: both window passes share one "
    "shuffle on the per-key ordering; spine explode from one "
    "aggregated row per key.",
    "l_cosine_topk": "Distributed exact kNN: hash-blocked sides meet in "
    "equi-joins against a spark.range pair table (no monolithic "
    "broadcast), one BLAS gemm per cell in mapInPandas, global "
    "TakeOrdered of per-cell winners. No driver collect anywhere.",
    "l_decontaminate": "Benchmark n-gram set reduces, broadcasts, and "
    "left-semi-joins the exploded corpus grams — the corpus side "
    "streams; one groupBy per doc.",
    "l_minhash_perm": "Production MinHash: ONE xxhash-class base hash "
    "per shingle, 16 permutations folded in a single aggregate pass; "
    "banding joins on (band, band_key) equality — no cartesian.",
    "l_rrf_hybrid": "Hybrid retrieval: each retriever cut to top-N by "
    "TakeOrderedAndProject BEFORE its rank window, so the windows see "
    "≤N rows; fusion is one bounded groupBy.",
    "l_semdedup": "SemDeDup: tiny centroid table broadcast for cell "
    "assignment; the near-dup pair scan is an equi-join on cell — "
    "candidate volume Σ|cell|², never n².",
    "w_rank_topk": "Ranked top-k: WindowGroupLimit runs a Partial pass "
    "BEFORE the exchange — only per-key top-3 rows shuffle.",
    "l_weighted_sample": "Priority sampling: pure row-local key "
    "arithmetic + TakeOrderedAndProject; no global sort, no RNG.",
    "j_fuzzy": "Fuzzy (lev<=1) join: deletion-neighborhood keys make it "
    "a plain equi-join + levenshtein verify — the oracle's cartesian "
    "definition never appears in the plan.",
    "j_salted_skew": "Explicit hot-key salting: Generate(explode) "
    "replicates the dim per salt; the join key is (source, salt) so "
    "the hot key spreads over 8 sub-partitions.",
    "l_span_dedup": "ExactSubstr-style span stats: windows md5-keyed "
    "row-locally, ONE groupBy(win_key) for cross-corpus counts, dup "
    "set joins back, ONE groupBy(doc) — hashes shuffle, text never.",
    "l_dsir_sample": "DSIR reweighting: 256-row bucket models + 1-row "
    "totals all broadcast; the only corpus-wide shuffles are the "
    "feature groupBys; ranking is TakeOrderedAndProject.",
    "l_triangles": "Triangle counting: wedge-close as two shuffled "
    "equi-joins on vertex ids; per-vertex rollup is explode+groupBy — "
    "no cartesian, AQE splits skewed hubs.",
    "q_profile": "One-pass profile: every per-column aggregate in one "
    "agg job (Expand for multi-distinct); stack() unpivot — a single "
    "leaf scan feeds all statistics.",
    "t_islands": "Gaps-and-islands: running-max flag + cumsum + "
    "groupBy all share ONE hash partitioning on the key — a single "
    "exchange for the whole merge.",
    "l_bm25_multi": "Batch retrieval: corpus postings computed once; "
    "the query table rides broadcasts; per-(query, doc) scoring is one "
    "groupBy — query count never touches corpus cost.",
    "l_ivfpq_topk": "IVF-PQ: broadcast centroid assignment, residual "
    "PQ codes, ADC via broadcast (cell, j, c) distance-table join — "
    "candidates restricted to probed cells BY the join key itself.",
    "l_containment": "Asymmetric containment: inverted-index self-join "
    "ON SHINGLE (pairs only materialize where a shingle is shared), "
    "df cap co-partitioned on the same key, corpus count a 1-row "
    "broadcast — never n².",
    "l_containment_decontam": "Graded decontamination: benchmark "
    "postings broadcast; the corpus side streams — the only exchange "
    "is the per-(doc, bench) count groupBy.",
    "l_crawl_pipeline": "Crawl ingest in one plan: HTML strip, URL "
    "canonicalization and the quality gate FUSE into the scan "
    "projection (pure codegen expressions); the only exchanges are "
    "the two keyed windows (canonical-URL dedup, domain cap) and the "
    "output sort.",
    "l_containment_gate": "Incremental containment: batch postings "
    "broadcast onto the on-disk history postings scan; history is "
    "read, never re-shingled; df cap joins the maintained per-epoch "
    "dfreq tables, history count a 1-row broadcast.",
    "l_snapshot_diff": "Release diff: ONE null-safe full-outer "
    "sort-merge join on the key; unchanged rows filter before the "
    "output sort, so the materialized result is change-sized.",
    "l_domain_cap": "Mega-domain-safe cap: per-domain totals "
    "(map-side combined) split hot from cold via broadcast "
    "anti/semi-joins; only over-cap rows shuffle to the (domain, "
    "bucket) histogram + threshold-bucket ranking window — no task "
    "ever holds a whole domain.",
}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import polars_fastx_spark as pfs
    from polars_fastx_spark.catalog import QUERIES

    spark = pfs.get_spark("plans-dump")
    spark.sparkContext.setLogLevel("ERROR")
    out = ["# PLANS — executed physical plans for headline queries",
           "",
           f"Generated by `python scripts/dump_plans.py {sf}` "
           "(re-run after plan-affecting changes).", ""]
    for name, note in HEADLINE.items():
        df = QUERIES[name].fn(spark, sf)
        df.collect()  # force AQE's final plan
        plan = (
            df._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
            .rstrip()
        )
        out += [f"## {name}", "", note, "", "```", plan, "```", ""]
    Path(__file__).resolve().parent.parent.joinpath("PLANS.md").write_text(
        "\n".join(out)
    )
    print(f"PLANS.md written ({len(HEADLINE)} plans at {sf})")
    spark.stop()


if __name__ == "__main__":
    main()
