"""Streaming element-level collection capture: split-invariance vs the batch
fold, kill-resume, and the three collection semantics through the runner."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from scylla_cdc_source_connector_ray.pipelines.element_stream import ElementStreamRunner
from scylla_cdc_source_connector_ray.stages.element_ops import (
    fold_element_ops,
    fold_map_element_ops,
    fold_set_element_ops,
)

TS = pa.timestamp("us")


def _list_log(rows):
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "ts": pa.array([r[2] for r in rows], TS),
            "seq": pa.array([r[3] for r in rows], pa.int64()),
            "kind": pa.array([r[4] for r in rows], pa.string()),
            "add_elems": pa.array([r[5] for r in rows], pa.list_(pa.string())),
            "rem_elems": pa.array([r[6] for r in rows], pa.list_(pa.string())),
        }
    )


def _write_windows(tmp, t: pa.Table, n_files: int) -> str:
    """ts-ordered window files (the runner's in-order contract)."""
    t = t.sort_by([("ts", "ascending"), ("seq", "ascending")])
    log = os.path.join(tmp, "log")
    os.makedirs(log, exist_ok=True)
    n = t.num_rows
    for i in range(n_files):
        lo, hi = i * n // n_files, (i + 1) * n // n_files
        pq.write_table(t.slice(lo, hi - lo), os.path.join(log, f"window-{i:05d}.parquet"))
    return log


def _run(tmp, log, collection="list", name="r", **kw):
    r = ElementStreamRunner(
        log,
        num_shards=4,
        sink_dir=os.path.join(tmp, name, "out"),
        checkpoint_dir=os.path.join(tmp, name, "ckpt"),
        collection=collection,
    )
    r.run(**kw)
    return r


def _norm(t: pa.Table) -> pd.DataFrame:
    return (
        t.to_pandas()
        .sort_values(["conv_id", "turn_idx", "seq"])
        .reset_index(drop=True)
    )


FOLDS = {"list": fold_element_ops, "set": fold_set_element_ops, "map": fold_map_element_ops}


@pytest.mark.parametrize("collection", ["list", "set"])
def test_stream_equals_batch_fold(tmp_path, collection):
    rows = [
        ("c1", 0, 10, 0, "add", ["a", "b"], []),
        ("c1", 0, 20, 1, "add", ["c"], []),
        ("c1", 0, 30, 2, "remove", [], ["a"]),
        ("c1", 0, 40, 3, "add", ["a"], []),
        ("c1", 0, 50, 4, "wipe", ["z"], []),
        ("c1", 0, 60, 5, "add", ["b", "b"], []),
        ("c2", 1, 15, 6, "add", ["x"], []),
        ("c2", 1, 45, 7, "remove", [], ["x"]),
        ("c2", 1, 55, 8, "add", ["x"], []),
    ]
    t = _list_log(rows)
    log = _write_windows(str(tmp_path), t, n_files=4)
    r = _run(str(tmp_path), log, collection, files_per_batch=1)
    got = _norm(r.read_output())
    want = _norm(FOLDS[collection](t))
    pd.testing.assert_frame_equal(got, want)


def test_map_stream_equals_batch_fold(tmp_path):
    rows = [
        ("m1", 0, 10, 0, "add", ["k1", "k2"], ["v1", "v2"], []),
        ("m1", 0, 20, 1, "add", ["k1"], ["v9"], []),  # upsert k1
        ("m1", 0, 30, 2, "remove", [], [], ["k2"]),
        ("m1", 0, 40, 3, "wipe", ["k3"], ["v3"], []),
        ("m1", 0, 50, 4, "add", ["k2"], ["v2b"], []),
    ]
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "ts": pa.array([r[2] for r in rows], TS),
            "seq": pa.array([r[3] for r in rows], pa.int64()),
            "kind": pa.array([r[4] for r in rows], pa.string()),
            "add_keys": pa.array([r[5] for r in rows], pa.list_(pa.string())),
            "add_vals": pa.array([r[6] for r in rows], pa.list_(pa.string())),
            "rem_keys": pa.array([r[7] for r in rows], pa.list_(pa.string())),
        }
    )
    log = _write_windows(str(tmp_path), t, n_files=3)
    r = _run(str(tmp_path), log, "map", files_per_batch=1)
    pd.testing.assert_frame_equal(_norm(r.read_output()), _norm(fold_map_element_ops(t)))


@settings(max_examples=15, deadline=None)
@given(
    ops=st.lists(
        st.tuples(
            st.integers(0, 2),  # key
            st.sampled_from(["add", "remove", "wipe", "none"]),
            st.lists(st.sampled_from(["a", "b", "c"]), max_size=2),
            st.lists(st.sampled_from(["a", "b", "c"]), max_size=1),
        ),
        min_size=1,
        max_size=24,
    ),
    cuts=st.integers(1, 5),
)
def test_property_split_invariance(tmp_path_factory, ops, cuts):
    rows = [
        (f"k{key}", key, 10 * i, i, kind, adds if kind in ("add", "wipe") else [], rems if kind == "remove" else [])
        for i, (key, kind, adds, rems) in enumerate(ops)
    ]
    t = _list_log(rows)
    tmp = str(tmp_path_factory.mktemp("estream"))
    log = _write_windows(tmp, t, n_files=min(cuts, len(rows)))
    r = _run(tmp, log, "list", files_per_batch=1)
    pd.testing.assert_frame_equal(_norm(r.read_output()), _norm(fold_element_ops(t)))


def test_kill_resume_replays_byte_identical(tmp_path):
    rows = [
        (f"c{i % 3}", i % 3, 10 * i, i, ["add", "remove", "wipe", "add"][i % 4],
         [f"e{i % 5}"] if i % 4 != 1 else [], [f"e{(i + 1) % 5}"] if i % 4 == 1 else [])
        for i in range(40)
    ]
    t = _list_log(rows)
    tmp = str(tmp_path)
    log = _write_windows(tmp, t, n_files=4)

    crash = _run(tmp, log, "list", name="crash", files_per_batch=1, crash_before_commit_at=2)
    resumed = _run(tmp, log, "list", name="crash", files_per_batch=1)
    clean = _run(tmp, log, "list", name="clean", files_per_batch=1)
    pd.testing.assert_frame_equal(_norm(resumed.read_output()), _norm(clean.read_output()))
    pd.testing.assert_frame_equal(_norm(clean.read_output()), _norm(fold_element_ops(t)))


def test_collection_change_is_rejected(tmp_path):
    t = _list_log([("c", 0, 1, 0, "add", ["x"], [])])
    tmp = str(tmp_path)
    log = _write_windows(tmp, t, n_files=1)
    _run(tmp, log, "list")
    with pytest.raises(ValueError, match="collection"):
        _run(tmp, log, "set")


def test_cumulative_events_survive_resume(tmp_path):
    import json

    t = _list_log([(f"c{i}", i, 10 * i, i, "add", [f"e{i}"], []) for i in range(8)])
    tmp = str(tmp_path)
    log = _write_windows(tmp, t, n_files=4)
    r = _run(tmp, log, "list", files_per_batch=1, max_batches=2)
    r2 = _run(tmp, log, "list", files_per_batch=1)  # resume, 2 more batches
    last = r2.ckpt.last_committed()
    assert last["cum"]["events"] == 8  # stream total, not count-since-resume


def test_hash_impl_pin_rejects_mismatch(tmp_path):
    import glob
    import json

    t = _list_log([("c", 0, 1, 0, "add", ["x"], [])])
    tmp = str(tmp_path)
    log = _write_windows(tmp, t, n_files=1)
    r = _run(tmp, log, "list")
    # simulate a polars upgrade: rewrite the committed manifest's hash pin
    [mf] = glob.glob(os.path.join(tmp, "r", "ckpt", "manifest", "*.json"))
    m = json.load(open(mf))
    m["hash_impl"] = "polars-0.0.0"
    open(mf, "w").write(json.dumps(m))
    with pytest.raises(ValueError, match="hash_impl"):
        _run(tmp, log, "list")
