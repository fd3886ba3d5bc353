"""SessionStreamRunner: streaming session assignment must equal the batch
sessionize on a ts-ordered windowed log, survive kill-resume, and fail
loudly on out-of-order windows / pin drift."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from scylla_cdc_source_connector_ray.pipelines import relational as R
from scylla_cdc_source_connector_ray.pipelines.session_stream import (
    SessionStreamRunner,
)

GAP = 3_600_000_000  # 1h in us


def _events(seed: int, n_users: int = 7, n: int = 300) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01").value // 1000
    ts = base + np.sort(rng.integers(0, 3_600_000_000 * 50, n))
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, n_users, n).astype(np.int64),
            "ts": pd.to_datetime(ts, unit="us"),
            "event_type": ["x"] * n,
            "value": np.zeros(n),
            "props": ["{}"] * n,
        }
    )
    # a couple of NULL rows (dropped on both sides) + equal-ts ties
    df.loc[5, "user_id"] = None
    df.loc[9, "ts"] = None
    df.loc[20, "ts"] = df.loc[19, "ts"]
    return df


def _write_log(df: pd.DataFrame, base: str, nf: int = 4) -> str:
    log = os.path.join(base, "log")
    os.makedirs(log)
    # ingest contract: the log is written from a (ts, event_id)-sorted
    # table, split into consecutive windows (NULL ts rows ride window 0)
    t = pa.Table.from_pandas(
        df.sort_values(["ts", "event_id"], na_position="first"),
        preserve_index=False,
    )
    n = t.num_rows
    for i in range(nf):
        lo, hi = i * n // nf, (i + 1) * n // nf
        pq.write_table(
            t.slice(lo, hi - lo), os.path.join(log, f"window-{i:05d}.parquet")
        )
    return log


def _runner(base, log, tag="a", **kw) -> SessionStreamRunner:
    return SessionStreamRunner(
        log,
        num_shards=4,
        sink_dir=os.path.join(base, f"out-{tag}"),
        checkpoint_dir=os.path.join(base, f"ckpt-{tag}"),
        gap_us=kw.pop("gap_us", GAP),
        **kw,
    )


def _sorted_pd(t) -> pd.DataFrame:
    df = t.to_pandas() if hasattr(t, "to_pandas") else t
    return df.sort_values("event_id").reset_index(drop=True)


def _batch_ref(df: pd.DataFrame, tmp: str) -> pd.DataFrame:
    d = os.path.join(tmp, "batchdir")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        os.path.join(d, "events.parquet"),
    )
    return _sorted_pd(R.sessionize(d).to_pandas())


def test_stream_equals_batch_and_kill_resume(tmp_path):
    df = _events(3)
    base = str(tmp_path)
    log = _write_log(df, base)
    want = _batch_ref(df, base)

    r1 = _runner(base, log, "a")
    r1.run(files_per_batch=1)
    pd.testing.assert_frame_equal(_sorted_pd(r1.read_output()), want)

    # batch-size invariance
    r2 = _runner(base, log, "b")
    r2.run(files_per_batch=4)
    pd.testing.assert_frame_equal(_sorted_pd(r2.read_output()), want)

    # kill-resume byte-identical
    r3 = _runner(base, log, "c")
    res = r3.run(files_per_batch=1, crash_before_commit_at=2)
    assert res["crashed"] and res["batches"] == 2
    r4 = _runner(base, log, "c")
    r4.run(files_per_batch=1)
    pd.testing.assert_frame_equal(_sorted_pd(r4.read_output()), want)


def test_out_of_order_windows_and_pin_drift_fail_loudly(tmp_path):
    df = _events(5)
    base = str(tmp_path)
    log = os.path.join(base, "log")
    os.makedirs(log)
    t = pa.Table.from_pandas(
        df.dropna(subset=["ts"]).sort_values(["ts", "event_id"]),
        preserve_index=False,
    )
    n = t.num_rows
    # window 1 holds EARLIER ts than window 0 -> guard must fire
    pq.write_table(t.slice(n // 2, n - n // 2), os.path.join(log, "window-00000.parquet"))
    pq.write_table(t.slice(0, n // 2), os.path.join(log, "window-00001.parquet"))
    r = _runner(base, log, "a")
    with pytest.raises(ValueError, match="non-decreasing"):
        r.run(files_per_batch=1)

    log2 = _write_log(df, os.path.join(base, "ok"))
    r2 = _runner(base, log2, "b")
    r2.run(files_per_batch=2, max_batches=1)
    with pytest.raises(Exception, match="pin|manifest|sess_impl"):
        _runner(base, log2, "b", gap_us=GAP * 2).run(files_per_batch=2)
