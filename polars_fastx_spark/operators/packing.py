"""Sequence packing — fill fixed token budgets with whole documents.

Training pipelines pack variable-length documents into fixed context
windows to avoid padding waste. Optimal bin packing is NP-hard and
inherently sequential, so the scalable design is PARTITION-LOCAL
first-fit-decreasing: shuffle docs by a stable hash of the id (any
partitioning works — packing quality, not correctness, depends on it),
run FFD inside each partition via ``mapInPandas`` (one Arrow batch in,
one out), and namespace bin ids by ``spark_partition_id``. No global
coordination, no driver state; waste vs. global FFD is small because
every partition sees a representative length mix at scale.

A document longer than the budget gets a singleton bin (it must be
truncated/split upstream — see ``text.chunk_text``); packing never
drops or cuts rows.

Reference parity: the reference has no packing surface; north-star
extension per /root/repo/BASELINE.json:6.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def pack_ffd(
    df: DataFrame,
    id_col: str,
    len_col: str,
    budget: int,
    partitions: int | None = None,
) -> DataFrame:
    """Assign each doc a ``bin_id`` so per-bin total length ≤ budget
    (oversize docs bin alone). Returns (id, length, bin_id, bin_fill);
    bin_fill is the bin's final total, repeated on each member row."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField(len_col, df.schema[len_col].dataType),
            StructField("bin_id", LongType()),
            StructField("bin_fill", LongType()),
        ]
    )

    def _pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        pdf = pd.concat(list(batches), ignore_index=True)
        if pdf.empty:
            return
        pdf = pdf.sort_values(
            [len_col, id_col], ascending=[False, True], kind="mergesort"
        )
        # First-fit via a max-segment-tree over per-bin remaining
        # capacity: leftmost bin with rem >= len in O(log bins) — the
        # naive per-doc scan over open bins is O(docs·bins), quadratic
        # when most docs open fresh bins (e.g. lengths > budget/2).
        # Leftmost-fit order is preserved exactly, so the recursive-CTE
        # oracle (l_pack_ffd_1p) replays unchanged.
        n = len(pdf)
        cap = 1
        while cap < n:
            cap *= 2
        tree = [-1] * (2 * cap)  # -1 = bin not opened yet

        def _update(i: int, val: int) -> None:
            i += cap
            tree[i] = val
            i //= 2
            while i:
                tree[i] = max(tree[2 * i], tree[2 * i + 1])
                i //= 2

        def _leftmost(need: int) -> int:
            if tree[1] < need:
                return -1
            i = 1
            while i < cap:
                i = 2 * i if tree[2 * i] >= need else 2 * i + 1
            return i - cap

        n_bins = 0
        assign = []
        for ln in pdf[len_col].to_numpy():
            ln = int(ln)
            b = _leftmost(ln)
            if b == -1:
                b = n_bins
                n_bins += 1
                _update(b, max(budget - ln, 0))
            else:
                _update(b, tree[cap + b] - ln)
            assign.append(b)
        pdf = pdf[[id_col, len_col]].copy()
        # partition-namespaced global bin id: 40 bits of bin index per
        # partition (a partition cannot open more bins than its rows,
        # and 2^40 rows in ONE task is beyond any sane layout; the
        # guard turns a namespace overflow into an error instead of
        # silently merging bins across partitions)
        if n_bins >= 1 << 40:
            raise ValueError("pack_ffd: >2^40 bins in one partition")
        pdf["bin_id"] = [(pid << 40) | b for b in assign]
        sizes = pdf.groupby("bin_id")[len_col].sum().to_dict()
        pdf["bin_fill"] = pdf["bin_id"].map(sizes).astype("int64")
        yield pdf

    base = df.select(id_col, len_col)
    if partitions:
        base = base.repartition(partitions, id_col)
    return base.mapInPandas(_pack, schema=out_schema)
