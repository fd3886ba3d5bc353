"""AnalyticStreamRunner: streamed running rn/lag/first_value must equal the
batch analytic kernel's answer on the full log, under any batch split, and
replay byte-identically after a kill."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from scylla_cdc_source_connector_ray.pipelines.analytic_stream import (
    AnalyticStreamRunner,
)

SQL = """
SELECT k, seq, v,
  row_number() OVER w AS rn,
  lag(v) OVER w AS lag_value,
  first_value(v) OVER w AS first_value
FROM df WINDOW w AS (PARTITION BY k ORDER BY seq)
ORDER BY seq
"""


def _mk(n=5_000, seed=13):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c", "d"], n),
            "seq": np.arange(n, dtype=np.int64),
            "v": rng.integers(0, 100, n),
        }
    )


def _write_log(tmp, df, n_files=5):
    log = os.path.join(tmp, "log")
    os.makedirs(log, exist_ok=True)
    t = pa.Table.from_pandas(df, preserve_index=False)
    n = t.num_rows
    for i in range(n_files):
        lo, hi = i * n // n_files, (i + 1) * n // n_files
        pq.write_table(t.slice(lo, hi - lo), os.path.join(log, f"window-{i:05d}.parquet"))
    return log


def _run(tmp, log, name, **kw):
    r = AnalyticStreamRunner(
        log, num_shards=4, sink_dir=os.path.join(tmp, name, "out"),
        checkpoint_dir=os.path.join(tmp, name, "ckpt"),
        key_col="k", order_col="seq", value_col="v",
    )
    totals = r.run(**kw)
    return r, totals


def test_stream_equals_sql_window(tmp_path):
    tmp = str(tmp_path)
    df = _mk()
    log = _write_log(tmp, df)
    r, totals = _run(tmp, log, "clean", files_per_batch=2)
    assert totals["rows"] == len(df)
    got = r.read_output().to_pandas().sort_values("seq").reset_index(drop=True)
    want = duckdb.sql(SQL).df()
    pd.testing.assert_frame_equal(
        got[["k", "seq", "v", "rn"]], want[["k", "seq", "v", "rn"]],
        check_dtype=False,
    )
    for c in ("lag_value", "first_value"):
        a, b = got[c], want[c]
        assert ((a.isna() & b.isna()) | (a == b)).all(), c


def test_split_invariance(tmp_path):
    """1-file batches and 5-file batches must produce identical output."""
    tmp = str(tmp_path)
    df = _mk(seed=7)
    log = _write_log(tmp, df)
    r1, _ = _run(tmp, log, "fine", files_per_batch=1)
    r2, _ = _run(tmp, log, "coarse", files_per_batch=5)
    a = r1.read_output().to_pandas().sort_values("seq").reset_index(drop=True)
    b = r2.read_output().to_pandas().sort_values("seq").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_kill_resume_identical(tmp_path):
    tmp = str(tmp_path)
    df = _mk(seed=21)
    log = _write_log(tmp, df)
    rc, _ = _run(tmp, log, "clean", files_per_batch=1)

    r = AnalyticStreamRunner(
        log, num_shards=4, sink_dir=os.path.join(tmp, "crash", "out"),
        checkpoint_dir=os.path.join(tmp, "crash", "ckpt"),
        key_col="k", order_col="seq", value_col="v",
    )
    totals = r.run(files_per_batch=1, crash_before_commit_at=3)
    assert totals["crashed"] and totals["batches"] == 3
    r2 = AnalyticStreamRunner(
        log, num_shards=4, sink_dir=os.path.join(tmp, "crash", "out"),
        checkpoint_dir=os.path.join(tmp, "crash", "ckpt"),
        key_col="k", order_col="seq", value_col="v",
    )
    r2.run(files_per_batch=1)
    a = rc.read_output().to_pandas().sort_values("seq").reset_index(drop=True)
    b = r2.read_output().to_pandas().sort_values("seq").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_null_keys_stream(tmp_path):
    """NULL partition keys form the SQL single-NULL group across batches
    (regression: searchsorted over object arrays with None raised TypeError,
    and the untouched-state is_in filter silently dropped the NULL row)."""
    tmp = str(tmp_path)
    df = _mk(2_000, seed=5)
    rng = np.random.default_rng(9)
    df["k"] = df["k"].where(rng.random(len(df)) > 0.2, None)
    log = _write_log(tmp, df)
    r, totals = _run(tmp, log, "nulls", files_per_batch=2)
    assert totals["rows"] == len(df)
    got = r.read_output().to_pandas().sort_values("seq").reset_index(drop=True)
    want = duckdb.sql(SQL).df()
    pd.testing.assert_frame_equal(
        got[["k", "seq", "v", "rn"]], want[["k", "seq", "v", "rn"]],
        check_dtype=False,
    )
    for c in ("lag_value", "first_value"):
        a, b = got[c], want[c]
        assert ((a.isna() & b.isna()) | (a == b)).all(), c


def test_pin_rejection(tmp_path):
    tmp = str(tmp_path)
    df = _mk(1_000)
    log = _write_log(tmp, df, n_files=2)
    _run(tmp, log, "run", files_per_batch=1, max_batches=1)
    with pytest.raises(ValueError):
        AnalyticStreamRunner(
            log, num_shards=8, sink_dir=os.path.join(tmp, "run", "out"),
            checkpoint_dir=os.path.join(tmp, "run", "ckpt"),
            key_col="k", order_col="seq", value_col="v",
        ).run(files_per_batch=1)
