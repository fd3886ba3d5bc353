"""Streaming SpaceSaving heavy hitters: ε-bounds vs exact, kill-resume
byte-identical state, split invariance under pinned file order."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from scylla_cdc_source_connector_ray.pipelines.hh_stream import (
    HeavyHittersStreamRunner,
)


def _write_log(tmp, frames):
    log = os.path.join(tmp, "log")
    os.makedirs(log, exist_ok=True)
    for i, df in enumerate(frames):
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            os.path.join(log, f"window-{i:05d}.parquet"),
        )
    return log


def _zipf_corpus(n_docs=120, seed=3):
    rng = np.random.default_rng(seed)
    vocab = [f"tok{i}" for i in range(400)]
    probs = 1.0 / np.arange(1, 401)
    probs /= probs.sum()
    texts = [
        " ".join(rng.choice(vocab, size=40, p=probs)) for _ in range(n_docs)
    ]
    return pd.DataFrame({"doc_id": range(n_docs), "text": texts})


def _runner(tmp, log, name="r", m=256):
    return HeavyHittersStreamRunner(
        log, checkpoint_dir=os.path.join(tmp, name, "ckpt"), m=m
    )


def test_hh_stream_bounds_vs_exact(tmp_path):
    tmp = str(tmp_path)
    df = _zipf_corpus()
    frames = [df.iloc[i * 30 : (i + 1) * 30].reset_index(drop=True) for i in range(4)]
    log = _write_log(tmp, frames)
    r = _runner(tmp, log, m=256)
    r.run(files_per_batch=2)
    got = r.read_topk(20).to_pandas()

    # exact truth from the same tokenizer
    import polars as pl

    toks = (
        pl.Series(df["text"])
        .str.extract_all(r.pattern)
        .explode()
        .drop_nulls()
    )
    true = toks.value_counts().to_pandas().set_index(toks.name or "text")["count"]
    n = int(true.sum())
    # every reported count brackets the truth
    for _, row in got.iterrows():
        t = true.get(row["token"], 0)
        assert row["cnt_lower"] <= t <= row["cnt_upper"], row["token"]
    # every token with true frequency > n/m is tracked
    tracked = set(r.read_topk(r.m)["token"].to_pylist())
    for tok, c in true.items():
        if c > n / r.m:
            assert tok in tracked, tok


def test_hh_stream_kill_resume_state_identical(tmp_path):
    tmp = str(tmp_path)
    df = _zipf_corpus(seed=9)
    frames = [df.iloc[i * 20 : (i + 1) * 20].reset_index(drop=True) for i in range(6)]
    log = _write_log(tmp, frames)
    ref = _runner(tmp, log, name="ref")
    ref.run(files_per_batch=2)
    want = ref.read_topk(50).to_pandas()

    r = _runner(tmp, log, name="crash")
    crashed = r.run(files_per_batch=2, crash_before_commit_at=1)
    assert crashed["crashed"]
    r.run(files_per_batch=2)
    got = r.read_topk(50).to_pandas()
    pd.testing.assert_frame_equal(got, want)
    # state files byte-stable: same committed summary table
    from scylla_cdc_source_connector_ray.pipelines._microbatch import (
        read_committed_state,
    )

    a = read_committed_state(ref.ckpt, ref.STATE_KIND)[0]
    b = read_committed_state(r.ckpt, r.STATE_KIND)[0]
    assert a.equals(b)


def test_hh_stream_split_invariant_and_pins(tmp_path):
    # file split must not change the committed answer (merge order is the
    # pinned file order, and summaries are exact-truncated per file)
    import pytest

    tmp = str(tmp_path)
    df = _zipf_corpus(n_docs=60, seed=5)
    want = None
    for nf, fpb, name in [(1, 1, "one"), (6, 2, "six"), (3, 3, "three")]:
        frames = [
            df.iloc[i * 60 // nf : (i + 1) * 60 // nf].reset_index(drop=True)
            for i in range(nf)
        ]
        log = _write_log(os.path.join(tmp, name), frames)
        r = _runner(os.path.join(tmp, name), log, name=name, m=10_000)
        r.run(files_per_batch=fpb)
        # with m >= vocab the summary is EXACT -> any split identical
        got = r.read_topk(30).to_pandas()
        if want is None:
            want = got
        else:
            pd.testing.assert_frame_equal(got, want, obj=name)
    # resume pins: a different m must fail loudly
    log = _write_log(os.path.join(tmp, "pin"), [df])
    r = _runner(os.path.join(tmp, "pin"), log, name="pin", m=64)
    r.run(files_per_batch=1)
    with pytest.raises(ValueError, match="replay"):
        HeavyHittersStreamRunner(
            log, checkpoint_dir=os.path.join(tmp, "pin", "pin", "ckpt"), m=128
        ).run(files_per_batch=1)


def test_read_topk_before_any_commit(tmp_path):
    # empty log dir: run() commits nothing; read_topk must return the empty
    # summary, not raise 'no committed batches' (the CLI calls it blindly)
    tmp = str(tmp_path)
    log = os.path.join(tmp, "log")
    os.makedirs(log, exist_ok=True)
    r = _runner(tmp, log, m=8)
    res = r.run()
    assert res.get("batches", 0) == 0
    t = r.read_topk(5)
    assert t.num_rows == 0
    assert t.column_names == ["token", "cnt_upper", "err", "cnt_lower"]
