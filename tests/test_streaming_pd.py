"""Streaming conversation tombstones in the runner (reference M2 consumed
mid-stream): markers wipe the checkpointed state store, expansion deletes are
emitted against seeded state, replay stays byte-stable."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from scylla_cdc_source_connector_ray.config import EngineConfig
from scylla_cdc_source_connector_ray.pipelines.runner import CaptureRunner
from scylla_cdc_source_connector_ray.stages.envelope import flatten_envelope

US = 1_000_000


def _rows(specs):
    """specs: (conv, turn|None, text|None, ts_s, seq)"""
    return pa.table(
        {
            "conv_id": pa.array([s[0] for s in specs], pa.string()),
            "turn_idx": pa.array([s[1] for s in specs], pa.int32()),
            "role": pa.array(
                [None if s[1] is None else "user" for s in specs], pa.string()
            ),
            "text": pa.array([s[2] for s in specs], pa.string()),
            "tool": pa.array([None] * len(specs), pa.string()),
            "ts": pa.array([s[3] * US for s in specs], pa.timestamp("us")),
            "seq": pa.array([s[4] for s in specs], pa.int64()),
        }
    )


def _cfg(tmp_path, sub=""):
    return EngineConfig(
        num_shards=4,
        partition_deletes=True,
        sink_dir=str(tmp_path / f"out{sub}"),
        checkpoint_dir=str(tmp_path / f"ckpt{sub}"),
    )


def _write(log, name, tbl):
    os.makedirs(log, exist_ok=True)
    pq.write_table(tbl, os.path.join(log, name))


def _flat(runner) -> pd.DataFrame:
    df = flatten_envelope(runner.read_output()).to_pandas()
    return df.sort_values(["seq", "op", "conv_id"]).reset_index(drop=True)


def test_marker_wipes_seeded_state(tmp_path):
    log = str(tmp_path / "log")
    _write(log, "window-00000.parquet", _rows([
        ("c1", 0, "a", 10, 1),
        ("c1", 1, "b", 11, 2),
        ("c1", 2, None, 12, 3),   # row tombstone: key 2 not live
        ("c2", 0, "x", 13, 4),
    ]))
    _write(log, "window-00001.parquet", _rows([
        ("c1", None, None, 20, 5),  # conversation tombstone
    ]))
    _write(log, "window-00002.parquet", _rows([
        ("c1", 0, "re", 30, 6),     # re-insert after the wipe
    ]))
    r = CaptureRunner(log, _cfg(tmp_path))
    assert r.run(files_per_batch=1)["batches"] == 3

    out = _flat(r)
    # expansion deletes for the LIVE seeded keys only (0 and 1, not 2)
    exp = out[(out.op == "d") & (out.seq == 5)]
    assert sorted(exp.turn_idx.tolist()) == [0, 1]
    assert sorted(exp.before_text.tolist()) == ["a", "b"]
    assert exp.after_text.isna().all()
    # the marker record
    mk = out[out.op == "pd"]
    assert len(mk) == 1 and mk.iloc[0].seq == 5 and pd.isna(mk.iloc[0].turn_idx)
    # re-insert sees a wiped (tombstone) state: op 'u', before NULL
    re_row = out[out.seq == 6].iloc[0]
    assert re_row.op == "u" and pd.isna(re_row.before_text)
    # state store: only c2 turn 0 and the re-inserted c1 turn 0 live
    state = r.read_current_state().to_pandas()
    assert sorted(zip(state.conv_id, state.turn_idx)) == [("c1", 0), ("c2", 0)]
    assert state[state.conv_id == "c1"].iloc[0].text == "re"


def test_marker_and_rows_same_batch(tmp_path):
    log = str(tmp_path / "log")
    _write(log, "window-00000.parquet", _rows([
        ("c1", 0, "a", 10, 1),
        ("c1", None, None, 20, 2),
        ("c1", 0, "b", 30, 3),   # after the marker, same batch
    ]))
    r = CaptureRunner(log, _cfg(tmp_path))
    r.run()
    out = _flat(r)
    assert out[(out.op == "d") & (out.seq == 2)].iloc[0].before_text == "a"
    row = out[out.seq == 3].iloc[0]
    assert row.op == "u" and pd.isna(row.before_text) and row.after_text == "b"
    state = r.read_current_state().to_pandas()
    assert state.text.tolist() == ["b"]


def test_replay_is_byte_stable(tmp_path):
    log = str(tmp_path / "log")
    _write(log, "window-00000.parquet", _rows([
        ("c%d" % (i % 3), i % 4, "t%d" % i, 10 + i, i) for i in range(24)
    ]))
    _write(log, "window-00001.parquet", _rows([
        ("c0", None, None, 50, 100),
        ("c1", 2, "upd", 51, 101),
    ]))
    _write(log, "window-00002.parquet", _rows([
        ("c0", 1, "back", 60, 200),
    ]))
    cfg_a = _cfg(tmp_path, "a")
    ra = CaptureRunner(log, cfg_a)
    ra.run(files_per_batch=1)
    # resumed run: first two batches, crash-free stop, then resume
    cfg_b = _cfg(tmp_path, "b")
    rb = CaptureRunner(log, cfg_b)
    rb.run(files_per_batch=1, max_batches=2)
    rb2 = CaptureRunner(log, cfg_b)
    rb2.run(files_per_batch=1)
    pd.testing.assert_frame_equal(_flat(ra), _flat(rb2))


def test_config_conflicts(tmp_path):
    log = str(tmp_path / "log")
    _write(log, "window-00000.parquet", _rows([("c1", 0, "a", 10, 1)]))
    cfg = EngineConfig(
        num_shards=2,
        partition_deletes=True,
        enrich_conv_state=True,
        sink_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    with pytest.raises(ValueError, match="partition_deletes"):
        CaptureRunner(log, cfg).run()


def test_pd_with_evolved_column(tmp_path):
    """Evolution and streaming tombstones compose: the expansion delete's
    before image carries the evolved column from state."""
    log = str(tmp_path / "log")
    _write(log, "window-00000.parquet", _rows([("c1", 0, "a", 10, 1)]))
    t2 = _rows([("c1", 0, "b", 20, 2)]).append_column(
        "lang", pa.array(["en"], pa.string())
    )
    _write(log, "window-00001.parquet", t2)
    _write(log, "window-00002.parquet", _rows([("c1", None, None, 30, 3)]))
    r = CaptureRunner(log, _cfg(tmp_path))
    r.run(files_per_batch=1)
    out = _flat(r)
    exp = out[(out.op == "d") & (out.seq == 3)].iloc[0]
    assert exp.before_text == "b" and exp.before_lang == "en"
    assert pd.isna(exp.after_lang)
    assert out[out.op == "pd"].iloc[0].seq == 3
    assert r.read_current_state().num_rows == 0


def test_property_streaming_matches_reference(tmp_path):
    """Random multi-batch logs with interleaved conversation tombstones: the
    runner's seed-first fold must match the brute-force reference processing
    events in (batch, ts, seq) order with carried state."""
    import random

    from tests.test_partition_delete import _brute_force_pd

    rng = random.Random(99)
    for trial in range(5):
        rows = []
        seq = 0
        for _ in range(rng.randint(10, 40)):
            conv = "c%d" % rng.randint(0, 3)
            kind = rng.random()
            if kind < 0.1:
                rows.append((conv, None, None, None, None, rng.randint(0, 50), seq))
            else:
                turn = rng.randint(0, 2)
                text = None if kind < 0.22 else "t%d" % seq
                rows.append((conv, turn, "user", text, None, rng.randint(0, 50), seq))
            seq += 1
        # split into batches by arrival (seq) — the runner consumes one file
        # per batch; within a batch it folds by (ts, seq), across batches by
        # arrival. The reference must see the same composite order: re-stamp
        # ts with a batch-epoch offset so (ts, seq) == (batch, ts, seq).
        n_b = rng.randint(1, 3)
        bounds = sorted(rng.sample(range(1, len(rows)), n_b - 1)) if n_b > 1 else []
        bounds = [0] + bounds + [len(rows)]
        log = str(tmp_path / f"log{trial}")
        stamped = []
        for b in range(n_b):
            chunk = rows[bounds[b] : bounds[b + 1]]
            chunk_st = [(c, t, r, x, tl, ts + 1000 * b, s) for (c, t, r, x, tl, ts, s) in chunk]
            from tests.test_partition_delete import _log as _mklog

            _write(log, "window-%05d.parquet" % b, _mklog(chunk_st))
            stamped.extend(chunk_st)
        r = CaptureRunner(log, _cfg(tmp_path, sub=str(trial)))
        r.run(files_per_batch=1)
        out = flatten_envelope(r.read_output()).to_pylist()

        def norm(t):
            c, turn, op, br, bt, s = t
            return (c, -1 if turn is None else turn, op, br or "", bt or "", s)

        got = sorted(
            norm((x["conv_id"], x["turn_idx"], x["op"], x["before_role"], x["before_text"], x["seq"]))
            for x in out
        )
        want = sorted(norm(t) for t in _brute_force_pd(stamped))
        assert got == want, f"trial {trial}"


def _pd_log_many(log):
    """Three-batch log: a long hot conversation (ch, 24 turns) + two small
    ones, with a mid-stream conversation tombstone on the hot conv and a
    post-wipe re-insert. seq strictly increasing in file/ts order."""
    _write(log, "window-00000.parquet", _rows(
        [("ch", i, "h%d" % i, 10 + i, i) for i in range(12)]
        + [("c1", 0, "a", 15, 50), ("c2", 0, "b", 16, 51)]
    ))
    _write(log, "window-00001.parquet", _rows(
        [("ch", i, "H%d" % i, 40 + i, 100 + i) for i in range(12, 24)]
        + [("ch", None, None, 60, 200)]     # wipe the hot conversation
        + [("c1", 1, "a2", 61, 201)]
    ))
    _write(log, "window-00002.parquet", _rows(
        [("ch", 3, "re", 70, 300), ("c2", 0, None, 71, 301)]
    ))


def test_salted_pd_equals_unsalted(tmp_path):
    """Partition deletes compose with hot-conv salting: the tombstone marker
    is broadcast to every shard (each folds the wipe over its own keys), the
    'pd' record is emitted exactly once (base shard), and the flattened
    output + state store equal the unsalted runner's byte for byte."""
    log = str(tmp_path / "log")
    _pd_log_many(log)

    ra = CaptureRunner(log, _cfg(tmp_path, "a"))
    ra.run(files_per_batch=1)
    rb = CaptureRunner(log, _cfg(tmp_path, "b"))
    rb_totals = rb.run(files_per_batch=1, hot_convs=["ch"])
    assert rb_totals["batches"] == 3

    a, b = _flat(ra), _flat(rb)
    pd.testing.assert_frame_equal(a, b)
    # exactly one pd record despite the broadcast
    assert (b.op == "pd").sum() == 1
    # state stores agree
    sa = ra.read_current_state().to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    sb = rb.read_current_state().to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(sa[sorted(sa.columns)], sb[sorted(sb.columns)])
    # the hot conversation really was salted across >1 shard before the wipe
    import pyarrow.parquet as _pq
    import glob as _glob

    shards_touched = set()
    for p in _glob.glob(os.path.join(rb.out_dir, "batch-*", "shard=*.parquet")):
        t = _pq.read_table(p, columns=["key"])
        convs = set(t["key"].combine_chunks().field("conv_id").to_pylist())
        if "ch" in convs:
            shards_touched.add(p.rsplit("shard=", 1)[1])
    assert len(shards_touched) > 1, "hot conv was not split across sub-shards"


def test_salted_pd_kill_resume(tmp_path):
    """Crash mid-run with salted pd: replay regenerates the broadcast markers
    and the home-shard filter deterministically."""
    log = str(tmp_path / "log")
    _pd_log_many(log)

    cfg = _cfg(tmp_path, "k")
    r1 = CaptureRunner(log, cfg)
    assert r1.run(files_per_batch=1, hot_convs=["ch"], crash_before_commit_at=1).get("crashed")
    r2 = CaptureRunner(log, cfg)
    r2.run(files_per_batch=1)  # hot set restored from the manifest

    clean = CaptureRunner(log, _cfg(tmp_path, "c"))
    clean.run(files_per_batch=1, hot_convs=["ch"])
    pd.testing.assert_frame_equal(_flat(r2), _flat(clean))
