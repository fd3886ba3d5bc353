"""Streaming grouped histogram runner: additive state across batches,
kill-resume, pin rejection."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from scylla_cdc_source_connector_ray.pipelines.hist_stream import HistStreamRunner


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
    kw.setdefault("bin_width", 5.0)
    return HistStreamRunner(
        log,
        num_shards=4,
        checkpoint_dir=os.path.join(tmp, name, "ckpt"),
        key_col="k",
        value_col="v",
        **kw,
    )


def _mk(ks, vs):
    return pd.DataFrame({"k": ks, "v": np.array(vs, np.float64)})


def _reference(df, qs=(25, 50, 95), W=5.0):
    out = {}
    for k, g in df.dropna(subset=["v"]).groupby("k"):
        v = np.sort(g["v"].to_numpy())
        n = len(v)
        out[k] = (n, *[int(np.floor(v[(n - 1) * q // 100] / W)) for q in qs])
    return out


def test_stream_hist_matches_batch_reference(tmp_path):
    tmp = str(tmp_path)
    rng = np.random.default_rng(31)
    frames = [
        _mk(rng.choice(["a", "b", "c"], 80), rng.normal(0, 30, 80)) for _ in range(4)
    ]
    frames[1].loc[::13, "v"] = np.nan  # NULLs dropped like SQL
    log = _write_log(tmp, frames)
    r = _runner(tmp, log)
    r.run(files_per_batch=1)
    got = {
        row["k"]: (row["n"], row["p25_bin"], row["p50_bin"], row["p95_bin"])
        for row in r.read_quantiles().to_pylist()
    }
    assert got == _reference(pd.concat(frames))


def test_stream_hist_keeps_null_key_group(tmp_path):
    """SQL GROUP BY keeps one NULL-key group; the runner must too (batch 0
    is ALL-null keys — the column-retype edge)."""
    tmp = str(tmp_path)
    frames = [
        pd.DataFrame({"k": [None, None], "v": np.array([2.0, 4.0])}),
        pd.DataFrame({"k": ["a", None], "v": np.array([9.0, 7.0])}),
    ]
    log = _write_log(tmp, frames)
    r = _runner(tmp, log)
    r.run(files_per_batch=1)
    rows = {row["k"]: row["n"] for row in r.read_quantiles().to_pylist()}
    assert rows == {None: 3, "a": 1}


def test_stream_hist_kill_resume(tmp_path):
    tmp = str(tmp_path)
    rng = np.random.default_rng(37)
    frames = [_mk(rng.choice(["x", "y"], 50), rng.normal(0, 20, 50)) for _ in range(3)]
    log = _write_log(tmp, frames)
    r = _runner(tmp, log, name="crash")
    totals = r.run(files_per_batch=1, crash_before_commit_at=1)
    assert totals["crashed"]
    resumed = _runner(tmp, log, name="crash")
    resumed.run(files_per_batch=1)  # replays batch 1, finishes 2
    got = {
        row["k"]: (row["n"], row["p25_bin"], row["p50_bin"], row["p95_bin"])
        for row in resumed.read_quantiles().to_pylist()
    }
    assert got == _reference(pd.concat(frames))


def test_stream_hist_bin_width_change_is_rejected(tmp_path):
    tmp = str(tmp_path)
    log = _write_log(tmp, [_mk(["a"], [1.0]), _mk(["a"], [2.0])])
    _runner(tmp, log).run(files_per_batch=1, max_batches=1)
    with pytest.raises(ValueError, match="bin_width"):
        _runner(tmp, log, bin_width=2.0).run(files_per_batch=1)
