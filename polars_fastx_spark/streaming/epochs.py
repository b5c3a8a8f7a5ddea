"""The streaming epoch-base discipline — ONE implementation.

Every streaming ingest gate in this package (ANN index add, MinHash
near-dup gate, containment gate, media gate, decontamination gate)
lands its per-micro-batch output as epoch-partitioned parquet
(``.../epoch=<id>``) with three invariants:

1. **pinned-epoch overwrite**: micro-batch N always writes epoch
   ``base + N`` with ``mode("overwrite")`` on that one partition, so
   an at-least-once RETRY of the same batch replaces its own failed
   attempt instead of duplicating it;
2. **``epoch < current`` retry-exclusion**: the gate's read side only
   consults partitions strictly below the batch's own epoch, so a
   retry never self-collides with its failed attempt's own append
   (the round-5 data-loss lesson);
3. **fresh-restart isolation**: a stream restarted with a FRESH
   checkpoint resets micro-batch ids to 0; its base must land ABOVE
   every committed epoch or batch 0 silently overwrites the previous
   stream's history.

Round 6 fixed (3) per-lane and the per-lane copies immediately
diverged (commits 4baaf2d/039e9b8); this module is the round-7
centralization — the ``{identity: base}`` map, its crash-safe
persistence, and the identity derivation live HERE and every gate
calls :func:`stream_epoch_base`.

**Identity, not path**: the base map is keyed by the checkpoint's
query id (the ``id`` field Spark writes into ``<checkpoint>/metadata``
when the checkpoint is created). Wiping the checkpoint dir and
restarting at the SAME path — the canonical fresh restart — generates
a new query id, so the wiped stream gets a new base instead of
inheriting the dead one (keying by path string had exactly that
hazard). A restart that KEEPS the checkpoint keeps its metadata file,
hence its id, hence its base — retried batches land on their original
epochs.

**Corruption never bricks the stream**: the base file is written via
tmp-file + atomic rename, and a file that still fails to parse (torn
write on a non-atomic FS, manual edit) is treated as ABSENT — the
base recomputes from the next free committed epoch, which can never
overwrite history. The recompute can orphan an in-flight retry onto a
fresh epoch (duplication, reconciled by the gates' dedup semantics)
but can never lose committed data.

Single-maintainer assumption throughout: one live stream per index
(Spark itself enforces one query per checkpoint).
"""

from __future__ import annotations

import json
from typing import Callable


def _hadoop_path(spark, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p, p.getFileSystem(spark._jsc.hadoopConfiguration())


def _read_small(spark, path: str) -> str | None:
    """Whole small file as text, None when absent/unreadable."""
    p, fs = _hadoop_path(spark, path)
    try:
        if not fs.exists(p):
            return None
        stream_in = fs.open(p)
        try:
            return bytes(stream_in.readAllBytes()).decode()
        finally:
            stream_in.close()
    except Exception:
        return None


def _write_small_atomic(spark, path: str, text: str) -> None:
    """tmp + rename so a crash mid-write never leaves a torn file at
    the canonical path (rename is atomic on HDFS/local/ABFS; on
    rename-as-copy object stores the parse-failure fallback in
    :func:`stream_epoch_base` still recovers)."""
    tmp = f"{path}.tmp"
    tp, fs = _hadoop_path(spark, tmp)
    p, _ = _hadoop_path(spark, path)
    out = fs.create(tp, True)
    try:
        out.write(bytearray(text.encode()))
    finally:
        out.close()
    if fs.exists(p):
        fs.delete(p, False)
    fs.rename(tp, p)


def checkpoint_identity(spark, checkpoint: str | None) -> str:
    """Stable identity of a streaming checkpoint: the query id Spark
    wrote into ``<checkpoint>/metadata`` at checkpoint creation. A
    wiped-and-recreated checkpoint dir gets a NEW id (that is the
    point); an unreadable/absent metadata file (foreachBatch running
    before Spark lands it, tests driving gates by hand) falls back to
    the path string — same-path restarts then share a base, which is
    only ever the legacy behavior, never an overwrite (the base map
    keeps historical entries forever)."""
    if not checkpoint:
        return "__default__"
    raw = _read_small(spark, f"{checkpoint}/metadata")
    if raw:
        try:
            qid = json.loads(raw).get("id")
            if qid:
                return str(qid)
        except ValueError:
            pass
    return str(checkpoint)


def stream_epoch_base(
    spark,
    base_dir: str,
    checkpoint: str | None = None,
    next_epoch: Callable[[], int] | None = None,
) -> int:
    """The stream's epoch-id offset: micro-batch N of the stream
    identified by ``checkpoint`` writes epoch ``base + N`` under
    ``base_dir``'s index family. First call for a given checkpoint
    identity allocates ``next_epoch()`` (the next free epoch across
    the family's committed dirs — lane-specific, hence a callable) and
    persists it in the ``_stream_base`` JSON map; every later call —
    retries, restarts with the same checkpoint — returns the recorded
    base. See module docstring for the three invariants.

    **Identity-flip continuity**: :func:`checkpoint_identity` can
    resolve to the PATH string early in a stream's life (foreachBatch
    batch 0 often runs before Spark lands ``<checkpoint>/metadata``)
    and to the QUERY ID afterwards. If those were independent keys, a
    retried early micro-batch arriving after the flip would allocate
    a fresh base and DUPLICATE its rows instead of idempotently
    replacing them. So the first query-id resolution CLAIMS a base
    recorded under the path-fallback key: the entry moves from the
    path key to the query-id key (one base, both identities). Moving
    (not copying) it also keeps the wiped-checkpoint semantics — a
    fresh stream at the same path that races its own metadata write
    finds no path entry left to inherit and allocates a fresh base,
    exactly the fresh-restart isolation invariant."""
    key = checkpoint_identity(spark, checkpoint)
    path_key = str(checkpoint) if checkpoint else "__default__"
    base_path = f"{base_dir}/_stream_base"
    bases: dict[str, int] = {}
    raw = _read_small(spark, base_path)
    if raw is not None and raw.strip():
        raw = raw.strip()
        try:
            bases = {str(k): int(v) for k, v in json.loads(raw).items()}
        except (ValueError, AttributeError, TypeError):
            try:
                # legacy single-int format (pre-map indexes)
                bases = {key: int(raw)}
            except ValueError:
                # torn/corrupt file: recompute (safe — next_epoch is
                # always above committed history), never raise
                bases = {}
    if key not in bases:
        if key != path_key and path_key in bases:
            # identity flipped path → query id mid-stream: claim the
            # base the pre-metadata batches recorded under the path
            bases[key] = bases.pop(path_key)
        else:
            bases[key] = next_epoch()
        _write_small_atomic(spark, base_path, json.dumps(bases))
    return bases[key]


def next_epoch_of(spark, *dirs: str) -> int:
    """Next free epoch id across several epoch-partitioned dirs — the
    fresh-checkpoint base for gates whose index and output epochs must
    both stay clear of history (a crashed batch can leave an output
    epoch with no index twin, and vice versa)."""
    from polars_fastx_spark.sources.sinks import committed_epochs

    eps: list[int] = []
    for d in dirs:
        eps += committed_epochs(spark, d)
    return (max(eps) + 1) if eps else 0
