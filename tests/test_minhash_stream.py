"""Streaming MinHash near-dup filter: cross-batch band state, kill-resume,
pin rejection, shingle-less docs."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from scylla_cdc_source_connector_ray.pipelines.minhash_stream import MinHashStreamRunner


def _write_log(tmp, frames):
    log = os.path.join(tmp, "log")
    os.makedirs(log, exist_ok=True)
    for i, df in enumerate(frames):
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            os.path.join(log, f"window-{i:05d}.parquet"),
        )
    return log


def _runner(tmp, log, name="r", **kw):
    return MinHashStreamRunner(
        log,
        num_shards=4,
        sink_dir=os.path.join(tmp, name, "out"),
        checkpoint_dir=os.path.join(tmp, name, "ckpt"),
        **kw,
    )


def _mk(ids, texts):
    return pd.DataFrame({"doc_id": np.array(ids, np.int64), "text": texts})


_LONG = "the quick brown fox jumps over the lazy dog again and again " * 3


def test_cross_batch_near_dup_is_dropped(tmp_path):
    tmp = str(tmp_path)
    # doc 10 (batch 1) is identical to doc 0 (batch 0) -> all bands collide;
    # doc 11 is unrelated; doc 12 has empty text (no shingles -> always kept)
    log = _write_log(
        tmp,
        [
            _mk([0, 1], [_LONG, "completely different short text here"]),
            _mk([10, 11, 12], [_LONG, "another unrelated document body entirely", ""]),
        ],
    )
    r = _runner(tmp, log)
    totals = r.run(files_per_batch=1)
    got = sorted(r.read_output()["doc_id"].to_pylist())
    assert got == [0, 1, 11, 12]
    assert totals["dups"] == 1


def test_within_batch_arrival_order(tmp_path):
    tmp = str(tmp_path)
    # two identical docs in ONE batch: the lower doc_id wins
    log = _write_log(tmp, [_mk([5, 3], [_LONG, _LONG])])
    r = _runner(tmp, log)
    r.run()
    assert sorted(r.read_output()["doc_id"].to_pylist()) == [3]


def test_kill_resume_no_duplicates(tmp_path):
    tmp = str(tmp_path)
    frames = [
        _mk([0], [_LONG]),
        _mk([1], ["unrelated body with zero overlapping vocabulary at all"]),
        _mk([2], [_LONG]),  # dup of batch-0 doc
        _mk([3], ["yet another thing entirely different words"]),
    ]
    log = _write_log(tmp, frames)
    r = _runner(tmp, log, name="crash")
    totals = r.run(files_per_batch=1, crash_before_commit_at=2)
    assert totals["crashed"]
    resumed = _runner(tmp, log, name="crash")
    resumed.run(files_per_batch=1)  # replays batch 2, finishes 3
    got = sorted(resumed.read_output()["doc_id"].to_pylist())
    assert got == [0, 1, 3]


def test_minhash_param_change_is_rejected(tmp_path):
    tmp = str(tmp_path)
    log = _write_log(tmp, [_mk([0], [_LONG]), _mk([1], [_LONG])])
    _runner(tmp, log).run(files_per_batch=1, max_batches=1)
    with pytest.raises(ValueError, match="minhash_impl"):
        _runner(tmp, log, bands=8).run(files_per_batch=1)
