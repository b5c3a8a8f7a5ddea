"""Hybrid retrieval primitives (L4+/RAG surface): rank fusion over
multiple retrievers.

Reciprocal Rank Fusion (Cormack et al., SIGIR 2009): each retriever
contributes ``1 / (k + rank)`` for its top-N candidates; documents sum
contributions across retrievers. RRF is the standard way to combine a
lexical scorer (BM25, ``text.bm25_scores``) with a semantic one
(embedding cosine) without score calibration.

Scale shape: each retriever is cut to its top-N FIRST via
``orderBy().limit(N)`` — a TakeOrderedAndProject (per-partition top-N,
one tiny merge; no global sort) — so the only global window ever runs
over ≤ N rows per source. Candidate union and the fusion groupBy move
≤ ``sources × N`` rows total, independent of corpus size.

Reference parity: the reference has no retrieval surface; this is
north-star extension surface per /root/repo/BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def rrf_fuse(
    sources: list[tuple[DataFrame, str]],
    id_col: str,
    top_n: int = 100,
    k: int = 60,
) -> DataFrame:
    """Fuse retriever outputs by Reciprocal Rank Fusion.

    ``sources`` is a list of (df, score_col); each df carries ``id_col``
    and a relevance score (higher = better). Ranks break ties by id
    ascending, so the fusion is fully deterministic. Returns
    (id, rrf, n_sources) for every candidate surfaced by ≥1 retriever.
    """
    if not sources:
        raise ValueError("rrf_fuse needs at least one (df, score_col) source")
    contribs = []
    for df, score_col in sources:
        order = [F.col(score_col).desc(), F.col(id_col).asc()]
        top = df.select(id_col, score_col).orderBy(*order).limit(top_n)
        # window over ≤ top_n rows (bounded by the limit above) — the
        # single-partition sort is on a driver-sized candidate set
        ranked = top.select(
            id_col, F.row_number().over(Window.orderBy(*order)).alias("__r")
        )
        contribs.append(
            ranked.select(
                id_col, (F.lit(1.0) / (F.lit(float(k)) + F.col("__r"))).alias("__c")
            )
        )
    all_c = contribs[0]
    for c in contribs[1:]:
        all_c = all_c.unionByName(c)
    return all_c.groupBy(id_col).agg(
        F.sum("__c").alias("rrf"), F.count("*").alias("n_sources")
    )
