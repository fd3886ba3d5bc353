"""CEP pattern matching: batch regex operator + streaming literal counter
(cross-batch carry, kill-resume, pin rejection)."""

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from scylla_cdc_source_connector_ray.pipelines.cep_stream import CepStreamRunner
from scylla_cdc_source_connector_ray.stages.cep import match_pattern, role_symbols


def _mk_events(rng, n_convs=12, n_rows=400, seed_ts=1_700_000_000_000_000):
    conv = rng.integers(0, n_convs, n_rows)
    roles = rng.choice(["user", "assistant", "tool", "system", "__tombstone__"], n_rows)
    return pd.DataFrame(
        {
            "conv_id": [f"conv{c}" for c in conv],
            "role": roles,
            "ts": pd.to_datetime(seed_ts + np.arange(n_rows) * 1_000_000, unit="us"),
            "seq": np.arange(n_rows, dtype=np.int64),
        }
    )


_SYM = {"user": "u", "assistant": "a", "tool": "t", "system": "s", "__tombstone__": "d"}


def _ref_strings(df):
    df = df.sort_values(["conv_id", "ts", "seq"])
    return {
        k: "".join(_SYM[r] for r in g["role"]) for k, g in df.groupby("conv_id")
    }


def test_match_pattern_vs_python_re():
    rng = np.random.default_rng(7)
    df = _mk_events(rng)
    ds = ray.data.from_pandas(df).repartition(5)

    def syms(t: pa.Table) -> pa.Table:
        return t.append_column("sym", role_symbols(t["role"])).drop_columns(["role"])

    out = (
        match_pattern(
            ds.map_batches(syms, batch_format="pyarrow"),
            "ut+a",
            keys=["conv_id"],
            num_shards=4,
        )
        .to_pandas()
        .set_index("conv_id")
        .sort_index()
    )
    want = {}
    for k, s in _ref_strings(df).items():
        ms = re.findall("ut+a", s)
        want[k] = (len(ms), ms[0] if ms else None)
    assert len(out) == len(want)
    for k, (n, first) in want.items():
        assert out.loc[k, "n_matches"] == n, k
        got_first = out.loc[k, "first_match"]
        assert (got_first is None or pd.isna(got_first)) if first is None else got_first == first


def test_match_pattern_sessions_vs_reference():
    """Sessionized CEP: gaps split a conversation into sessions; each match
    is counted in its own session (a pattern spanning a gap must NOT match)."""
    from scylla_cdc_source_connector_ray.stages.cep import match_pattern_sessions

    GAP = 1_000_000  # 1s
    rows = []
    # conv A: u t a | (gap) | u t t a  -> two sessions, one match each
    for i, (role, off) in enumerate(
        [("user", 0), ("tool", 1), ("assistant", 2),
         ("user", 100), ("tool", 101), ("tool", 102), ("assistant", 103)]
    ):
        rows.append(("A", role, off * 1_000_000, i))
    # conv B: u t (1s apart = within gap) | (4s gap) | a -> the match is
    # split by the gap: two sessions, zero matches
    rows += [("B", "user", 0, 10), ("B", "tool", 1_000_000, 11), ("B", "assistant", 5_000_000, 12)]
    df = pd.DataFrame(rows, columns=["conv_id", "role", "ts_us", "seq"])
    ds = ray.data.from_pandas(
        df.assign(sym=df["role"].map(_SYM))[["conv_id", "sym", "ts_us", "seq"]]
    ).repartition(3)
    out = (
        match_pattern_sessions(ds, "ut+a", gap_us=GAP, num_shards=2)
        .to_pandas()
        .sort_values(["conv_id", "session_start_us"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "conv_id": ["A", "A", "B", "B"],
            "session_start_us": [0, 100_000_000, 0, 5_000_000],
            "n_matches": [1, 1, 0, 0],
        }
    )
    pd.testing.assert_frame_equal(out, want)


def test_match_pattern_sessions_null_sym_still_sessionizes():
    """A NULL-symbol event contributes no characters but its timestamp still
    splits sessions (string_agg-skip over the FULL sessionization)."""
    from scylla_cdc_source_connector_ray.stages.cep import match_pattern_sessions

    GAP = 1_000_000
    df = pd.DataFrame(
        {
            "conv_id": ["K"] * 3,
            "sym": ["u", None, "a"],
            # each consecutive pair is within the gap, but dropping the NULL
            # row would make the 0 -> 2*GAP diff exceed it
            "ts_us": np.array([0, GAP, 2 * GAP], np.int64),
            "seq": np.arange(3, dtype=np.int64),
        }
    )
    out = match_pattern_sessions(
        ray.data.from_pandas(df), "ua", gap_us=GAP, num_shards=2
    ).to_pandas()
    # one session (no gap exceeded), symbols 'ua' -> one match
    assert len(out) == 1 and int(out["n_matches"].iloc[0]) == 1


def _write_windows(tmp, df, n_files=4):
    """ts-ordered window files (the in-order CDC log layout)."""
    log = os.path.join(tmp, "log")
    os.makedirs(log, exist_ok=True)
    df = df.sort_values(["ts", "seq"])
    t = pa.Table.from_pandas(df, preserve_index=False)
    n = t.num_rows
    for i in range(n_files):
        lo, hi = i * n // n_files, (i + 1) * n // n_files
        pq.write_table(t.slice(lo, hi - lo), os.path.join(log, f"window-{i:05d}.parquet"))
    return log


def _runner(tmp, log, literal="uta", name="r"):
    return CepStreamRunner(
        log,
        num_shards=4,
        checkpoint_dir=os.path.join(tmp, name, "ckpt"),
        literal=literal,
    )


def test_stream_counts_match_global_split(tmp_path):
    tmp = str(tmp_path)
    rng = np.random.default_rng(11)
    df = _mk_events(rng, n_convs=8, n_rows=300)
    log = _write_windows(tmp, df, n_files=5)
    r = _runner(tmp, log)
    totals = r.run(files_per_batch=1)  # 5 batches -> real cross-batch carries
    got = {
        k: n
        for k, n in zip(*[c.to_pylist() for c in r.read_counts().columns])
    }
    want = {k: len(s.split("uta")) - 1 for k, s in _ref_strings(df).items()}
    assert got == want
    assert totals["matches"] == sum(want.values())


def test_stream_boundary_crossing_literal(tmp_path):
    """An occurrence split across batch files must still be counted once."""
    tmp = str(tmp_path)
    roles = ["user", "tool", "assistant", "user", "tool", "assistant"]
    df = pd.DataFrame(
        {
            "conv_id": ["c"] * 6,
            "role": roles,
            "ts": pd.to_datetime(np.arange(6) * 1_000_000, unit="us"),
            "seq": np.arange(6, dtype=np.int64),
        }
    )
    # 6 files of 1 row each: every occurrence spans two or three batches
    log = _write_windows(tmp, df, n_files=6)
    r = _runner(tmp, log)
    r.run(files_per_batch=1)
    got = r.read_counts().to_pydict()
    assert got == {"conv_id": ["c"], "n_matches": [2]}


def test_stream_kill_resume_no_double_count(tmp_path):
    tmp = str(tmp_path)
    rng = np.random.default_rng(13)
    df = _mk_events(rng, n_convs=6, n_rows=200)
    log = _write_windows(tmp, df, n_files=4)
    r = _runner(tmp, log, name="crash")
    totals = r.run(files_per_batch=1, crash_before_commit_at=2)
    assert totals["crashed"] and totals["batches"] == 2
    resumed = _runner(tmp, log, name="crash")
    resumed.run(files_per_batch=1)  # replays batch 2, finishes 3
    got = {
        k: n
        for k, n in zip(*[c.to_pylist() for c in resumed.read_counts().columns])
    }
    want = {k: len(s.split("uta")) - 1 for k, s in _ref_strings(df).items()}
    assert got == want


def test_stream_int64_key_col(tmp_path):
    """key_col need not be a string: state files keep the key's own type."""
    tmp = str(tmp_path)
    df = pd.DataFrame(
        {
            "conv_id": np.array([7, 7, 7, 9, 9, 9], np.int64),
            "role": ["user", "tool", "assistant"] * 2,
            "ts": pd.to_datetime(np.arange(6) * 1_000_000, unit="us"),
            "seq": np.arange(6, dtype=np.int64),
        }
    )
    log = _write_windows(tmp, df, n_files=3)
    r = _runner(tmp, log)
    r.run(files_per_batch=1)
    got = dict(zip(*[c.to_pylist() for c in r.read_counts().columns]))
    assert got == {7: 1, 9: 1}


def test_stream_literal_change_is_rejected(tmp_path):
    tmp = str(tmp_path)
    df = _mk_events(np.random.default_rng(3), n_convs=3, n_rows=40)
    log = _write_windows(tmp, df, n_files=2)
    _runner(tmp, log).run(files_per_batch=1, max_batches=1)
    with pytest.raises(ValueError, match="cep_impl"):
        _runner(tmp, log, literal="ua").run(files_per_batch=1)


# --- streaming REGEX carry (DFA-pruned; pipelines/cep_stream.py) ------------


def _regex_runner(tmp, log, pattern="ut+a", name="rx"):
    return CepStreamRunner(
        log,
        num_shards=4,
        checkpoint_dir=os.path.join(tmp, name, "ckpt"),
        pattern=pattern,
    )


def test_stream_regex_counts_match_global(tmp_path):
    tmp = str(tmp_path)
    rng = np.random.default_rng(17)
    df = _mk_events(rng, n_convs=8, n_rows=300)
    log = _write_windows(tmp, df, n_files=5)
    r = _regex_runner(tmp, log, pattern="ut+a")
    totals = r.run(files_per_batch=1)
    got = dict(zip(*[c.to_pylist() for c in r.read_counts().columns]))
    want = {k: len(re.findall("ut+a", s)) for k, s in _ref_strings(df).items()}
    assert got == want
    assert totals["matches"] == sum(want.values())


def test_stream_regex_boundary_crossing(tmp_path):
    """A greedy-quantifier match split across EVERY batch boundary counts
    once — the in-progress 'utt…' run is carried, not flushed."""
    tmp = str(tmp_path)
    roles = ["user", "tool", "tool", "tool", "assistant", "user", "tool", "assistant"]
    df = pd.DataFrame(
        {
            "conv_id": ["c"] * 8,
            "role": roles,
            "ts": pd.to_datetime(np.arange(8) * 1_000_000, unit="us"),
            "seq": np.arange(8, dtype=np.int64),
        }
    )
    log = _write_windows(tmp, df, n_files=8)  # 1 row per batch
    r = _regex_runner(tmp, log)
    r.run(files_per_batch=1)
    assert r.read_counts().to_pydict() == {"conv_id": ["c"], "n_matches": [2]}


def test_stream_regex_kill_resume(tmp_path):
    tmp = str(tmp_path)
    rng = np.random.default_rng(23)
    df = _mk_events(rng, n_convs=6, n_rows=200)
    log = _write_windows(tmp, df, n_files=4)
    r = _regex_runner(tmp, log, name="crash")
    totals = r.run(files_per_batch=1, crash_before_commit_at=2)
    assert totals["crashed"] and totals["batches"] == 2
    resumed = _regex_runner(tmp, log, name="crash")
    resumed.run(files_per_batch=1)
    got = dict(zip(*[c.to_pylist() for c in resumed.read_counts().columns]))
    want = {k: len(re.findall("ut+a", s)) for k, s in _ref_strings(df).items()}
    assert got == want


def test_stream_mode_switch_rejected(tmp_path):
    """literal→regex resume must fail loudly: the carried tails were pruned
    under different rules, silently merging them would corrupt counts."""
    tmp = str(tmp_path)
    df = _mk_events(np.random.default_rng(3), n_convs=3, n_rows=40)
    log = _write_windows(tmp, df, n_files=2)
    _runner(tmp, log, name="mode").run(files_per_batch=1, max_batches=1)
    r2 = CepStreamRunner(
        log,
        num_shards=4,
        checkpoint_dir=os.path.join(tmp, "mode", "ckpt"),
        pattern="uta",
    )
    with pytest.raises(ValueError, match="cep_impl"):
        r2.run(files_per_batch=1)


def test_stream_constructor_validation(tmp_path):
    with pytest.raises(ValueError, match="exactly one"):
        CepStreamRunner("x", 4, str(tmp_path), literal="uta", pattern="ut+a")
    with pytest.raises(ValueError, match="exactly one"):
        CepStreamRunner("x", 4, str(tmp_path))
    with pytest.raises(ValueError, match="empty string"):
        CepStreamRunner("x", 4, str(tmp_path), pattern="t*")


def test_cep_stream_crash_before_first_commit_keeps_totals(tmp_path):
    # crash_before_commit_at=0 on a FRESH checkpoint: no batch committed,
    # _final_totals must not raise "no committed batches"
    import os
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from scylla_cdc_source_connector_ray.pipelines.cep_stream import CepStreamRunner

    log = os.path.join(str(tmp_path), "log")
    os.makedirs(log)
    df = pd.DataFrame(
        {
            "conv_id": ["c1"] * 4,
            "role": ["user", "assistant", "user", "assistant"],
            "ts": np.arange(4, dtype=np.int64),
            "seq": np.arange(4, dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(log, "window-00000.parquet"))
    r = CepStreamRunner(
        log,
        num_shards=2,
        checkpoint_dir=os.path.join(str(tmp_path), "ckpt"),
        pattern="ua",
    )
    res = r.run(files_per_batch=1, crash_before_commit_at=0)
    assert res["crashed"]
    # resume completes and reports the global count
    res2 = r.run(files_per_batch=1)
    assert res2["matches"] == 2
