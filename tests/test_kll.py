"""KLL quantile sketch: error bounds vs exact quantiles, merge semantics,
grouped batch operator, and the checkpointed streaming runner."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from scylla_cdc_source_connector_ray.functions.sketches import KLLSketch
from scylla_cdc_source_connector_ray.pipelines.kll_stream import KllStreamRunner
from scylla_cdc_source_connector_ray.stages.topk import grouped_quantiles_kll

QS = (1, 5, 25, 50, 75, 95, 99)


def _rank_err(vals: np.ndarray, q: int, est: float) -> float:
    srt = np.sort(vals)
    return abs(np.searchsorted(srt, est) - (len(vals) - 1) * q // 100) / len(vals)


def test_exact_below_capacity():
    rng = np.random.default_rng(5)
    v = rng.normal(size=100)
    s = KLLSketch(k=200).update(v)
    srt = np.sort(v)
    for q in QS:
        assert s.quantiles((q,))[0] == srt[(len(v) - 1) * q // 100]


@pytest.mark.parametrize("dist", ["uniform", "lognormal"])
def test_error_bound_vs_exact(dist):
    """The verdict's bar: estimated quantiles within a bounded rank error of
    the exact ones — including a heavy-tailed distribution, where the
    fixed-width histogram sketch degrades and KLL must not."""
    rng = np.random.default_rng(11)
    vals = rng.uniform(0, 1, 200_000) if dist == "uniform" else rng.lognormal(0, 2, 200_000)
    s = KLLSketch(k=200)
    for chunk in np.array_split(vals, 37):
        s.update(chunk)
    assert s.n == len(vals)
    for q, est in zip(QS, s.quantiles(QS)):
        assert _rank_err(vals, q, est) < 0.02, (dist, q)


def test_merge_is_multiset_invariant():
    """combine_rows over partial-sketch rows must not depend on row order."""
    rng = np.random.default_rng(3)
    parts = [KLLSketch(k=64).update(rng.normal(size=n)) for n in (500, 3000, 7, 900)]
    rows = []
    for p in parts:
        lv, par, vals = p.to_rows()
        rows += list(zip(lv, par, vals))
    fwd = KLLSketch.combine_rows(64, *zip(*rows))
    rev = KLLSketch.combine_rows(64, *zip(*rows[::-1]))
    assert fwd.n == rev.n == sum(p.n for p in parts)
    assert fwd.quantiles(QS) == rev.quantiles(QS)


def test_update_order_invariant():
    rng = np.random.default_rng(9)
    v = rng.normal(size=20_000)
    a = KLLSketch(k=100).update(v)
    b = KLLSketch(k=100).update(v[::-1].copy())
    assert a.quantiles(QS) == b.quantiles(QS)


def test_grouped_batch_operator():
    rng = np.random.default_rng(21)
    n = 60_000
    keys = rng.choice(["a", "b", None], n, p=[0.5, 0.4, 0.1])
    vals = np.where(keys == "a", rng.lognormal(0, 1, n), rng.uniform(0, 10, n))
    df = pd.DataFrame({"k": keys, "v": vals})
    df.loc[rng.choice(n, 500, replace=False), "v"] = np.nan  # SQL-dropped
    ds = ray.data.from_pandas(df).repartition(6)
    out = grouped_quantiles_kll(ds, ["k"], "v", k=200, quantiles=(50, 95)).to_pandas()
    assert len(out) == 3  # NULL key group kept
    ref = df.dropna(subset=["v"])
    for _, row in out.iterrows():
        kv = row["k"]
        grp = ref[ref["k"].isna()] if pd.isna(kv) else ref[ref["k"] == kv]
        v = grp["v"].to_numpy()
        assert row["n"] == len(v)  # counts exact
        for q in (50, 95):
            assert _rank_err(v, q, row[f"p{q}_est"]) < 0.02, (kv, q)


def _write_log(tmp, df, n_files=4):
    log = os.path.join(tmp, "log")
    os.makedirs(log, exist_ok=True)
    t = pa.Table.from_pandas(df, preserve_index=False)
    n = t.num_rows
    for i in range(n_files):
        lo, hi = i * n // n_files, (i + 1) * n // n_files
        pq.write_table(t.slice(lo, hi - lo), os.path.join(log, f"window-{i:05d}.parquet"))
    return log


def _mk_df(rng, n=20_000):
    return pd.DataFrame(
        {
            "k": rng.choice(["x", "y", "z"], n),
            "v": rng.lognormal(0, 1.5, n),
        }
    )


def test_stream_runner_bounds_and_counts(tmp_path):
    tmp = str(tmp_path)
    rng = np.random.default_rng(31)
    df = _mk_df(rng)
    log = _write_log(tmp, df)
    r = KllStreamRunner(log, num_shards=4, checkpoint_dir=os.path.join(tmp, "ckpt"),
                        key_col="k", value_col="v", k=200)
    totals = r.run(files_per_batch=1)
    assert totals["rows"] == len(df)
    out = r.read_quantiles((50, 95)).to_pandas()
    assert sorted(out["k"]) == ["x", "y", "z"]
    for _, row in out.iterrows():
        v = df[df["k"] == row["k"]]["v"].to_numpy()
        assert row["n"] == len(v)
        for q in (50, 95):
            assert _rank_err(v, q, row[f"p{q}_est"]) < 0.02


def test_stream_null_values_keep_key_alignment(tmp_path):
    """Regression: dropna(v) left a gapped index and the key re-assignment
    aligned by index, silently crediting values to the wrong keys whenever a
    batch contained NULL values (and spilling rows into a spurious NULL-key
    group)."""
    tmp = str(tmp_path)
    rng = np.random.default_rng(17)
    df = _mk_df(rng, n=12_000)
    df.loc[rng.choice(len(df), 2_000, replace=False), "v"] = np.nan
    log = _write_log(tmp, df)
    r = KllStreamRunner(log, num_shards=4, checkpoint_dir=os.path.join(tmp, "ckpt"),
                        key_col="k", value_col="v", k=200)
    totals = r.run(files_per_batch=1)
    ref = df.dropna(subset=["v"])
    assert totals["rows"] == len(ref)
    out = r.read_quantiles((50, 95)).to_pandas()
    assert sorted(out["k"]) == ["x", "y", "z"]  # no spurious NULL-key group
    for _, row in out.iterrows():
        v = ref[ref["k"] == row["k"]]["v"].to_numpy()
        assert row["n"] == len(v)
        for q in (50, 95):
            assert _rank_err(v, q, row[f"p{q}_est"]) < 0.02


def test_stream_kill_resume_identical(tmp_path):
    """Replay from the pre-batch snapshot must reproduce the sketch state
    EXACTLY — estimates after kill+resume equal the clean run's."""
    tmp = str(tmp_path)
    rng = np.random.default_rng(41)
    df = _mk_df(rng, n=8_000)
    log = _write_log(tmp, df)

    clean = KllStreamRunner(log, 4, os.path.join(tmp, "clean"), "k", "v", k=100)
    clean.run(files_per_batch=1)

    crash = KllStreamRunner(log, 4, os.path.join(tmp, "crash"), "k", "v", k=100)
    totals = crash.run(files_per_batch=1, crash_before_commit_at=2)
    assert totals["crashed"] and totals["batches"] == 2
    resumed = KllStreamRunner(log, 4, os.path.join(tmp, "crash"), "k", "v", k=100)
    resumed.run(files_per_batch=1)

    a = clean.read_quantiles(QS).to_pandas().sort_values("k").reset_index(drop=True)
    b = resumed.read_quantiles(QS).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_stream_pin_rejection(tmp_path):
    tmp = str(tmp_path)
    df = _mk_df(np.random.default_rng(2), n=400)
    log = _write_log(tmp, df, n_files=2)
    KllStreamRunner(log, 4, os.path.join(tmp, "c"), "k", "v", k=100).run(
        files_per_batch=1, max_batches=1
    )
    with pytest.raises(ValueError, match="kll_impl"):
        KllStreamRunner(log, 4, os.path.join(tmp, "c"), "k", "v", k=200).run(
            files_per_batch=1
        )


def test_stream_runner_int64_keys(tmp_path):
    """Non-string key columns must flow end-to-end with their native dtype
    (pre-fix: project() force-cast to pa.string() and crashed with
    ArrowTypeError on int64 keys)."""
    tmp = str(tmp_path)
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {"k": rng.choice([10, 20, 30], 6_000), "v": rng.lognormal(0, 1.0, 6_000)}
    )
    log = _write_log(tmp, df)
    r = KllStreamRunner(log, num_shards=4, checkpoint_dir=os.path.join(tmp, "ckpt"),
                        key_col="k", value_col="v", k=200)
    totals = r.run(files_per_batch=2)
    assert totals["rows"] == len(df)
    out = r.read_quantiles((50,)).to_pandas()
    assert sorted(out["k"]) == [10, 20, 30]
    assert out["k"].dtype == np.int64
    for _, row in out.iterrows():
        v = df[df["k"] == row["k"]]["v"].to_numpy()
        assert row["n"] == len(v)
        assert _rank_err(v, 50, row["p50_est"]) < 0.02
