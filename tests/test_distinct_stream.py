"""Streaming exact windowed distinct: cross-batch no-recount, kill-resume,
null keys."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from scylla_cdc_source_connector_ray.pipelines.distinct_stream import (
    DistinctStreamRunner,
)

W = 1000  # window_us for tests


def _write_log(tmp, frames):
    log = os.path.join(tmp, "log")
    os.makedirs(log, exist_ok=True)
    for i, df in enumerate(frames):
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            os.path.join(log, f"window-{i:05d}.parquet"),
        )
    return log


def _runner(tmp, log, name="r"):
    return DistinctStreamRunner(
        log,
        num_shards=4,
        checkpoint_dir=os.path.join(tmp, name, "ckpt"),
        window_us=W,
        key_col="conv_id",
        ts_col="ts_us",
    )


def _mk(keys, ts):
    return pd.DataFrame(
        {"conv_id": keys, "ts_us": np.array(ts, np.int64)}
    )


def test_rearrivals_across_batches_never_recount(tmp_path):
    tmp = str(tmp_path)
    # window 0: a,b (a repeats in batch 1 — no recount); window 1: a again
    # (a NEW window counts it again), c
    log = _write_log(
        tmp,
        [
            _mk(["a", "b", "a"], [0, 10, 20]),
            _mk(["a", "a", "c"], [30, W + 5, W + 9]),
        ],
    )
    r = _runner(tmp, log)
    totals = r.run(files_per_batch=1)
    assert totals["batches"] == 2 and totals["new_distinct"] == 4
    out = r.read_counts().to_pandas()
    assert out["window_start_us"].tolist() == [0, W]
    assert out["n_distinct"].tolist() == [2, 2]


def test_equals_batch_answer_any_split_and_null_keys(tmp_path):
    tmp = str(tmp_path)
    rng = np.random.default_rng(11)
    keys = [
        None if rng.random() < 0.1 else f"c{int(rng.integers(0, 15))}"
        for _ in range(200)
    ]
    ts = np.sort(rng.integers(0, 5 * W, size=200))
    df = _mk(keys, ts)
    # SQL count(DISTINCT conv_id) semantics: NULL keys are NOT counted
    want = (
        df.assign(w=(df["ts_us"] // W) * W)
        .groupby("w", dropna=False)["conv_id"]
        .nunique(dropna=True)
    )
    for nf, fpb, name in [(1, 1, "one"), (4, 1, "four"), (4, 2, "two")]:
        frames = [
            df.iloc[i * 200 // nf : (i + 1) * 200 // nf].reset_index(drop=True)
            for i in range(nf)
        ]
        log = _write_log(os.path.join(tmp, name), frames)
        r = _runner(os.path.join(tmp, name), log, name=name)
        r.run(files_per_batch=fpb)
        out = r.read_counts().to_pandas()
        got = dict(zip(out["window_start_us"], out["n_distinct"]))
        assert got == {int(w): int(n) for w, n in want.items()}, name


def test_kill_resume_counts_identical(tmp_path):
    tmp = str(tmp_path)
    frames = [
        _mk([f"c{j % 7}" for j in range(12)], range(i * 12 * 50, (i + 1) * 12 * 50, 50))
        for i in range(4)
    ]
    log = _write_log(tmp, frames)
    ref = _runner(tmp, log, name="ref")
    ref.run(files_per_batch=2)
    want = ref.read_counts().to_pandas()

    r = _runner(tmp, log, name="crash")
    crashed = r.run(files_per_batch=2, crash_before_commit_at=1)
    assert crashed["crashed"]
    r.run(files_per_batch=2)
    got = r.read_counts().to_pandas()
    pd.testing.assert_frame_equal(got, want)


def _runner_approx(tmp, log, name="a", p=12):
    return DistinctStreamRunner(
        log,
        num_shards=4,
        checkpoint_dir=os.path.join(tmp, name, "ckpt"),
        window_us=W,
        key_col="conv_id",
        ts_col="ts_us",
        mode="approx",
        hll_p=p,
    )


def test_approx_mode_error_bound_vs_exact(tmp_path):
    # ~3000 distinct keys over 3 windows; p=12 → ~1.6% stderr, assert 6%
    tmp = str(tmp_path)
    rng = np.random.default_rng(5)
    n = 6000
    keys = [f"k{int(rng.integers(0, 3000))}" for _ in range(n)]
    ts = np.sort(rng.integers(0, 3 * W, size=n))
    frames = [
        _mk(keys[i * n // 3 : (i + 1) * n // 3], ts[i * n // 3 : (i + 1) * n // 3])
        for i in range(3)
    ]
    log = _write_log(tmp, frames)
    ex = _runner(tmp, log, name="ex")
    ex.run(files_per_batch=1)
    want = ex.read_counts().to_pandas()
    ap = _runner_approx(tmp, log, name="ap")
    ap.run(files_per_batch=1)
    got = ap.read_counts().to_pandas()
    assert got["window_start_us"].tolist() == want["window_start_us"].tolist()
    for g, w in zip(got["n_distinct"], want["n_distinct"]):
        assert abs(int(g) - int(w)) <= max(3, int(0.06 * int(w))), (g, w)


def test_approx_kill_resume_counts_identical(tmp_path):
    # replay must be byte-stable: a crash + resume yields the IDENTICAL
    # estimates as an uninterrupted run (registers are deterministic)
    tmp = str(tmp_path)
    frames = [
        _mk([f"c{j % 29}" for j in range(40)], range(i * 2000, i * 2000 + 2000, 50))
        for i in range(4)
    ]
    log = _write_log(tmp, frames)
    ref = _runner_approx(tmp, log, name="ref")
    ref.run(files_per_batch=2)
    want = ref.read_counts().to_pandas()

    r = _runner_approx(tmp, log, name="crash")
    crashed = r.run(files_per_batch=2, crash_before_commit_at=1)
    assert crashed["crashed"]
    r.run(files_per_batch=2)
    got = r.read_counts().to_pandas()
    pd.testing.assert_frame_equal(got, want)
    # state is bounded: one 2^p register blob per (shard, window)
    from scylla_cdc_source_connector_ray.pipelines._microbatch import (
        read_committed_state,
    )

    for t in read_committed_state(r.ckpt, r.state_kind):
        assert t.schema.names == ["w", "reg"]
        for blob in t["reg"].to_pylist():
            assert len(blob) == 1 << 12


def test_approx_exact_mode_state_kinds_disjoint(tmp_path):
    # mode is pinned: resuming an exact checkpoint with mode=approx fails loudly
    import pytest

    tmp = str(tmp_path)
    log = _write_log(tmp, [_mk(["a", "b"], [0, 10])])
    r = _runner(tmp, log, name="same")
    r.run(files_per_batch=1)
    bad = DistinctStreamRunner(
        log,
        num_shards=4,
        checkpoint_dir=os.path.join(tmp, "same", "ckpt"),
        window_us=W,
        key_col="conv_id",
        ts_col="ts_us",
        mode="approx",
    )
    with pytest.raises(ValueError):
        bad.run(files_per_batch=1)


def test_all_null_key_window_reports_zero(tmp_path):
    # SQL GROUP BY emits a window whose only rows carry NULL keys with
    # count(DISTINCT key)=0 — the presence marker mirrors that
    tmp = str(tmp_path)
    log = _write_log(
        tmp,
        [
            _mk(["a", None], [0, 10]),
            _mk([None, None], [W + 1, W + 2]),  # window 1: only NULL keys
            _mk(["b"], [2 * W + 1]),
        ],
    )
    for name, mode in [("ex", "exact"), ("ap", "approx")]:
        r = DistinctStreamRunner(
            log,
            num_shards=4,
            checkpoint_dir=os.path.join(tmp, name, "ckpt"),
            window_us=W,
            key_col="conv_id",
            ts_col="ts_us",
            mode=mode,
        )
        totals = r.run(files_per_batch=1)
        assert totals["new_distinct"] == 2, mode
        out = r.read_counts().to_pandas()
        assert out["window_start_us"].tolist() == [0, W, 2 * W], mode
        assert out["n_distinct"].tolist() == [1, 0, 1], mode


def test_null_key_and_null_ts_row_does_not_crash(tmp_path):
    # pandas delivers nullable int ts as float64+NaN; the presence marker
    # must skip NULL ts (a row with no ts belongs to no window) instead of
    # crashing the int64 conversion
    tmp = str(tmp_path)
    f = pd.DataFrame(
        {
            "conv_id": pd.array(["a", None], dtype=object),
            "ts_us": pd.array([100, None], dtype="Int64"),
        }
    )
    log = _write_log(tmp, [f])
    r = _runner(tmp, log)
    totals = r.run(files_per_batch=1)
    assert totals["new_distinct"] == 1
    out = r.read_counts().to_pandas()
    assert out["window_start_us"].tolist() == [0]
    assert out["n_distinct"].tolist() == [1]


def test_non_null_key_with_null_ts_dropped_not_crash(tmp_path):
    # the review repro: key present, ts NULL — must be dropped (no window)
    # BEFORE the int64 conversion, not raise on missing values; both modes
    tmp = str(tmp_path)
    f = pd.DataFrame(
        {
            "conv_id": pd.array(["a", "b"], dtype=object),
            "ts_us": pd.array([100, None], dtype="Int64"),
        }
    )
    log = _write_log(tmp, [f])
    r = _runner(tmp, log)
    totals = r.run(files_per_batch=1)
    assert totals["new_distinct"] == 1  # only 'a' lands in window 0
    out = r.read_counts().to_pandas()
    assert out["window_start_us"].tolist() == [0]
    assert out["n_distinct"].tolist() == [1]
