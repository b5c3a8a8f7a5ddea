"""streaming/epochs.py — the centralized epoch-base discipline.

Regression tests for the round-6 ADVICE findings: the base map must
key on checkpoint IDENTITY (the query id in the checkpoint's
metadata, which changes when the dir is wiped), not the path string,
and a corrupt base file must recompute rather than brick the stream.
"""

from __future__ import annotations

import json
import os

import pytest

from polars_fastx_spark.streaming.epochs import (
    checkpoint_identity,
    next_epoch_of,
    stream_epoch_base,
)


def _mk_checkpoint(tmp_path, name: str, qid: str) -> str:
    ck = tmp_path / name
    ck.mkdir(parents=True, exist_ok=True)
    (ck / "metadata").write_text(json.dumps({"id": qid}))
    return str(ck)


def test_identity_is_query_id_not_path(spark, tmp_path):
    ck = _mk_checkpoint(tmp_path, "ck", "q-aaa")
    assert checkpoint_identity(spark, ck) == "q-aaa"
    # wipe-and-recreate at the SAME path: Spark generates a new query
    # id in metadata; identity must follow it
    (tmp_path / "ck" / "metadata").write_text(json.dumps({"id": "q-bbb"}))
    assert checkpoint_identity(spark, ck) == "q-bbb"


def test_identity_falls_back_to_path(spark, tmp_path):
    # no metadata yet (hand-driven gates, pre-start races)
    ck = tmp_path / "bare"
    ck.mkdir()
    assert checkpoint_identity(spark, str(ck)) == str(ck)
    # unparseable metadata
    (ck / "metadata").write_text("{torn")
    assert checkpoint_identity(spark, str(ck)) == str(ck)


def test_wiped_checkpoint_same_path_gets_new_base(spark, tmp_path):
    """THE round-6 advice scenario: rm -rf the checkpoint dir and
    restart at the same path. The old implementation keyed by path and
    reused the dead stream's base, so micro-batch 0 overwrote its
    committed epochs; identity-keying allocates a fresh base."""
    base_dir = str(tmp_path / "idx")
    os.makedirs(base_dir)
    ck = _mk_checkpoint(tmp_path, "ck", "first-run")
    assert stream_epoch_base(spark, base_dir, ck, lambda: 3) == 3
    # canonical fresh restart: wipe, recreate, new query id, SAME path
    (tmp_path / "ck" / "metadata").write_text(
        json.dumps({"id": "second-run"})
    )
    assert stream_epoch_base(spark, base_dir, ck, lambda: 11) == 11
    # the first stream's entry survives in the map (a late retry of
    # the old query would still find its base)
    bases = json.loads(open(f"{base_dir}/_stream_base").read())
    assert bases == {"first-run": 3, "second-run": 11}


def test_same_identity_reuses_base_without_next_epoch(spark, tmp_path):
    base_dir = str(tmp_path / "idx")
    os.makedirs(base_dir)
    ck = _mk_checkpoint(tmp_path, "ck", "q-1")
    assert stream_epoch_base(spark, base_dir, ck, lambda: 7) == 7

    def _boom():
        raise AssertionError("next_epoch consulted on a recorded base")

    assert stream_epoch_base(spark, base_dir, ck, _boom) == 7


def test_corrupt_base_file_recomputes_instead_of_raising(
    spark, tmp_path
):
    """A crash mid-overwrite can leave content json.loads rejects; the
    old fallback int(raw) then raised an uncaught ValueError and
    bricked the stream. Now: treat as absent, recompute from
    next_epoch (always above committed history), rewrite valid."""
    base_dir = str(tmp_path / "idx")
    os.makedirs(base_dir)
    with open(f"{base_dir}/_stream_base", "w") as fh:
        fh.write('{"q-1": 4')  # torn JSON — neither map nor int
    ck = _mk_checkpoint(tmp_path, "ck", "q-1")
    assert stream_epoch_base(spark, base_dir, ck, lambda: 9) == 9
    assert json.loads(open(f"{base_dir}/_stream_base").read()) == {
        "q-1": 9
    }


def test_legacy_single_int_format_still_reads(spark, tmp_path):
    base_dir = str(tmp_path / "idx")
    os.makedirs(base_dir)
    with open(f"{base_dir}/_stream_base", "w") as fh:
        fh.write("6")
    ck = _mk_checkpoint(tmp_path, "ck", "q-legacy")
    assert stream_epoch_base(
        spark, base_dir, ck, lambda: pytest.fail("should reuse legacy")
    ) == 6


def test_base_write_is_tmp_plus_rename(spark, tmp_path):
    base_dir = str(tmp_path / "idx")
    os.makedirs(base_dir)
    ck = _mk_checkpoint(tmp_path, "ck", "q-1")
    stream_epoch_base(spark, base_dir, ck, lambda: 1)
    # no tmp residue after a clean write
    assert not os.path.exists(f"{base_dir}/_stream_base.tmp")
    assert os.path.exists(f"{base_dir}/_stream_base")


def test_next_epoch_of_spans_dirs(spark, tmp_path):
    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")
    spark.range(3).write.parquet(f"{out}/epoch=2")
    spark.range(3).write.parquet(f"{idx}/epoch=5")
    assert next_epoch_of(spark, out, idx) == 6
    assert next_epoch_of(spark, str(tmp_path / "missing")) == 0


def test_pipelines_aliases_point_at_shared_module(spark):
    """Task-5 centralization: the gates' in-module names must BE the
    shared implementation, not per-lane copies (it was the per-lane
    copy that diverged in round 6)."""
    from polars_fastx_spark.streaming import pipelines

    assert pipelines._stream_epoch_base is stream_epoch_base
    assert pipelines._next_epoch_of is next_epoch_of


def test_identity_flip_claims_path_base(spark, tmp_path):
    """round-7 ADVICE low #5: batch 0 often runs before Spark lands
    <checkpoint>/metadata, so its base records under the PATH key;
    once the query id becomes readable the same stream must keep that
    base (claimed under the query-id key), or a retried early batch
    would land on a fresh epoch and duplicate instead of replace."""
    base_dir = str(tmp_path / "idx")
    os.makedirs(base_dir)
    ck = tmp_path / "ck"
    ck.mkdir()
    # metadata not yet written: identity falls back to the path
    assert stream_epoch_base(spark, base_dir, str(ck), lambda: 5) == 5
    # Spark lands metadata; the SAME stream resolves its query id —
    # the base must carry over, never reallocate
    (ck / "metadata").write_text(json.dumps({"id": "q-live"}))

    def _boom():
        raise AssertionError("identity flip reallocated the base")

    assert stream_epoch_base(spark, base_dir, str(ck), _boom) == 5
    bases = json.loads(open(f"{base_dir}/_stream_base").read())
    # the entry MOVED to the query-id key (path key released, so a
    # wiped restart racing its metadata cannot inherit a dead base)
    assert bases == {"q-live": 5}
    # wiped restart at the same path, racing its own metadata write:
    # no path entry left to inherit -> fresh base above history
    (ck / "metadata").unlink()
    assert stream_epoch_base(spark, base_dir, str(ck), lambda: 9) == 9
    (ck / "metadata").write_text(json.dumps({"id": "q-second"}))
    assert stream_epoch_base(spark, base_dir, str(ck), _boom) == 9
