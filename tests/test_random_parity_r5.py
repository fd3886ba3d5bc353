"""Seeded-random parity for the round-5 operators: random event soups WITH
NULL injection, engine vs the exact DuckDB twin — the adversarial net that
caught the quantile_cont operand-order and half-even rounding divergences."""

import os

import duckdb
import hypothesis
import hypothesis.strategies as st
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from scylla_cdc_source_connector_ray.pipelines import relational as R
from scylla_cdc_source_connector_ray.stages.topk import quantile_cont_value


def _rand_events(seed: int, n: int = 400) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    ts_us = rng.integers(0, 10_800_000_000, n)  # 3h span: windows interact
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(ts_us, unit="us"),
            "user_id": pd.array(rng.integers(0, 12, n), dtype="Int64"),
            "event_type": rng.choice(
                ["view", "click", "purchase", "error", "signup"], n
            ),
            "value": np.round(rng.normal(0, 80, n), 3),
            "props": [""] * n,
        }
    )
    # NULL injection: ~5% each of user_id / value (ts NULLs break pandas
    # parquet round-trip of datetime64 only in exotic cases; covered by the
    # dedicated unit tests)
    df.loc[rng.random(n) < 0.05, "user_id"] = pd.NA
    df.loc[rng.random(n) < 0.05, "value"] = np.nan
    return df


def _write(tmp_path, df) -> str:
    d = str(tmp_path)
    t = pa.Table.from_pandas(df, preserve_index=False)
    # the driver contract shape stores ts as timestamp[us]
    i = t.column_names.index("ts")
    t = t.set_column(i, "ts", t["ts"].cast(pa.timestamp("us")))
    pq.write_table(t, os.path.join(d, "events.parquet"))
    return d


def _oracle(sf_dir, sql):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{os.path.join(sf_dir, 'events.parquet')}'"
    )
    return con.sql(sql).df()


def _norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[ns]")
        elif df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_random_event_soup_parity(tmp_path, seed):
    from scylla_cdc_source_connector_ray import oracles as O

    d = _write(tmp_path, _rand_events(seed))
    cases = [
        (lambda: R.event_moving_sum(d).to_pandas(), O.EVENT_MOVING_SUM),
        (lambda: R.event_type_corr(d), O.EVENT_TYPE_CORR),
        (lambda: R.event_type_regression(d), O.EVENT_TYPE_REGRESSION),
        (lambda: R.cohort_retention(d).to_pandas(), O.COHORT_RETENTION),
        (lambda: R.user_gap_stats(d).to_pandas(), O.USER_GAP_STATS),
        (lambda: R.funnel_conversion(d), O.FUNNEL_CONVERSION),
        (
            lambda: R.event_value_percentiles_cont(d).to_pandas(),
            O.EVENT_VALUE_PERCENTILES_CONT,
        ),
        (lambda: R.event_transitions(d), O.EVENT_TRANSITIONS),
    ]
    for fn, sql in cases:
        got, want = _norm(fn()), _norm(_oracle(d, sql))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


@hypothesis.given(
    vals=st.lists(st.integers(-10**9, 10**9), min_size=1, max_size=60),
    q=st.sampled_from([0.25, 0.5, 0.61, 0.95, 0.0, 1.0]),
)
@hypothesis.settings(max_examples=120, deadline=None)
def test_quantile_cont_value_bit_exact_vs_duckdb(vals, q):
    v = np.sort(np.array(vals, np.float64))
    got = quantile_cont_value(v, q)
    rows = ",".join(f"({x})" for x in vals)
    want = duckdb.sql(
        f"SELECT quantile_cont(x, {q!r}) FROM (VALUES {rows}) t(x)"
    ).fetchone()[0]
    assert got == want, (vals, q, got, want)


@pytest.mark.parametrize("seed", [44, 55])
def test_random_event_soup_parity_older_ops(tmp_path, seed):
    # extend the net to the pre-round-5 events-table gates: random inputs
    # exercise tie/NULL paths the fixed sf corpora never hit
    from scylla_cdc_source_connector_ray import oracles as O

    rng = np.random.default_rng(seed * 7 + 1)
    df = _rand_events(seed, n=300)
    # random JSON-ish props for the extraction gate: valid, missing-key,
    # malformed, NULL
    props = rng.choice(
        ['{"k": 5}', '{"k": -17}', '{"j": 1}', "{bad", ""], size=len(df)
    ).astype(object)
    props[rng.random(len(df)) < 0.05] = None
    df["props"] = props
    d = _write(tmp_path, df)
    cases = [
        (lambda: R.event_type_stats(d).to_pandas(), O.EVENT_TYPE_STATS),
        (lambda: R.event_rollup(d).to_pandas(), O.EVENT_ROLLUP),
        (lambda: R.event_value_quantiles(d).to_pandas(), O.EVENT_VALUE_QUANTILES),
        (lambda: R.event_type_pivot(d).to_pandas(), O.EVENT_TYPE_PIVOT),
        (lambda: R.event_props_extract(d).to_pandas(), O.EVENT_PROPS_EXTRACT),
    ]
    for fn, sql in cases:
        got, want = _norm(fn()), _norm(_oracle(d, sql))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("seed", [66, 77])
def test_random_soup_parity_window_analytic_family(tmp_path, seed):
    # run the DRIVER pair (queries() entry + its oracle_sql() twin) for the
    # window/analytics/CEP family over random events — ties and random ts
    # collisions exercise the pane/rank edge paths the fixed corpus may not
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    d = _write(tmp_path, _rand_events(seed, n=350))
    qs, sqls = e.queries(), e.oracle_sql()
    for name in [
        "win_tumbling_role",
        "win_sliding",
        "win_ops_by_window",
        "win_distinct_convs",
        "event_analytics",
        "cep_pattern_match",
    ]:
        res = qs[name](d)
        got = _norm(res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res))
        want = _norm(_oracle(d, sqls[name]))
        pd.testing.assert_frame_equal(got, want, check_dtype=False), name
