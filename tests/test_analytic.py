"""Distributed SQL window (analytic) functions vs the DuckDB reference."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from scylla_cdc_source_connector_ray.stages.analytic import (
    analytic_functions,
    analytic_kernel,
)

SQL = """
SELECT user_id, event_id,
  row_number() OVER w AS rn,
  rank() OVER (PARTITION BY user_id ORDER BY value) AS rnk,
  dense_rank() OVER (PARTITION BY user_id ORDER BY value) AS drnk,
  cume_dist() OVER (PARTITION BY user_id ORDER BY value) AS cd,
  lag(value) OVER w AS lag_value,
  lead(value) OVER w AS lead_value,
  ntile(4) OVER w AS nt,
  first_value(value) OVER w AS first_value
FROM df WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
"""

COLS = ["rn", "rnk", "drnk", "cd", "lag_value", "lead_value", "nt", "first_value"]


def _mk(n=4_000, seed=3):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "user_id": rng.choice([1, 2, 3, 4, 5, None], n),
            "event_id": np.arange(n, dtype=np.int64),
            "ts": rng.integers(0, 200, n),
            # 1-decimal rounding forces rank/dense_rank/cume_dist tie groups
            "value": np.round(rng.normal(size=n), 1),
        }
    )
    df.loc[rng.choice(n, n // 20, replace=False), "value"] = None
    return df


def _check(got: pd.DataFrame, df: pd.DataFrame):
    got = got.sort_values("event_id").reset_index(drop=True)
    want = duckdb.sql(SQL).df()
    assert len(got) == len(want)
    for c in COLS:
        a, b = got[c], want[c]
        if c in ("rn", "rnk", "drnk", "nt"):
            assert (a.astype("int64") == b.astype("int64")).all(), c
        else:
            assert ((a.isna() & b.isna()) | (a == b)).all(), c


def test_kernel_matches_duckdb():
    """Single-task kernel: all six functions incl. NULL partition key, NULL
    values (peer groups, NULLS LAST), and value ties."""
    df = _mk()
    t = pa.Table.from_pandas(df, preserve_index=False)
    got = analytic_kernel(t, ["user_id"], ["ts", "event_id"], "value").to_pandas()
    _check(got, df)


def test_distributed_matches_duckdb(tmp_path):
    """Full operator: one keyed exchange, many shards, results identical to
    DuckDB regardless of block splits."""
    df = _mk(n=6_000, seed=11)
    p = os.path.join(str(tmp_path), "events.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), p)
    ds = ray.data.read_parquet(p, override_num_blocks=7)
    out = analytic_functions(
        ds, keys=["user_id"], order_cols=["ts", "event_id"], value_col="value",
        num_shards=8,
    )
    _check(out.to_pandas(), df)


def test_kernel_empty_and_singleton():
    t = pa.Table.from_pandas(_mk(1), preserve_index=False)
    one = analytic_kernel(t, ["user_id"], ["ts", "event_id"], "value")
    assert one.num_rows == 1
    assert one["rn"][0].as_py() == 1 and one["rnk"][0].as_py() == 1
    assert one["cd"][0].as_py() == 1.0
    assert one["lag_value"][0].as_py() is None

    empty = analytic_kernel(t.slice(0, 0), ["user_id"], ["ts", "event_id"], "value")
    assert empty.num_rows == 0
    for c in COLS:
        assert c in empty.column_names


def test_multi_key_partition():
    """Composite partition keys route through the mixed hash and stay
    SQL-correct."""
    df = _mk(2_000, seed=7)
    df["grp"] = np.where(df["event_id"] % 3 == 0, "a", "b")
    t = pa.Table.from_pandas(df, preserve_index=False)
    got = (
        analytic_kernel(t, ["user_id", "grp"], ["ts", "event_id"], "value")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        SQL.replace("PARTITION BY user_id", "PARTITION BY user_id, grp")
    ).df()
    for c in COLS:
        a, b = got[c], want[c]
        if c in ("rn", "rnk", "drnk", "nt"):
            assert (a.astype("int64") == b.astype("int64")).all(), c
        else:
            assert ((a.isna() & b.isna()) | (a == b)).all(), c
