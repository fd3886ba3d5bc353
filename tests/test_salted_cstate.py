"""Hierarchical salted conv-state enrichment (north_star skew clause composed
with the stream-state join): hot conversations are split across salted
sub-shards, each sub-shard ships only a ~40 B/row slim projection to a
per-BASE-shard merge stage that owns the hot conversations' state, and the
already-written envelope files are patched in place. The result must equal
the unsalted runner's enrichment exactly, and replay must be byte-stable."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from scylla_cdc_source_connector_ray.config import EngineConfig
from scylla_cdc_source_connector_ray.pipelines.runner import CaptureRunner
from scylla_cdc_source_connector_ray.sources.synthetic import generate, write_windowed

FEATS = ["prior_turns", "prior_chars", "prev_role"]


def _cfg(tmp_path, sub="", **kw):
    kw.setdefault("num_shards", 8)
    kw.setdefault("enrich_conv_state", True)
    return EngineConfig(
        sink_dir=str(tmp_path / f"out{sub}"),
        checkpoint_dir=str(tmp_path / f"ckpt{sub}"),
        **kw,
    )


def _hot_log(tmp_path, num_files=3):
    hot = generate(num_convs=1, turns_per_conv=600, update_pct=20, delete_pct=5)
    cold = generate(num_convs=25, turns_per_conv=6, update_pct=20, delete_pct=5)
    cold = cold.set_column(
        cold.column_names.index("conv_id"),
        "conv_id",
        pc.binary_join_element_wise(
            pa.array(["z"] * cold.num_rows), cold["conv_id"].combine_chunks(), ""
        ),
    )
    t = pa.concat_tables([hot, cold]).sort_by(
        [("ts", "ascending"), ("seq", "ascending")]
    )
    t = t.set_column(
        t.column_names.index("seq"), "seq", pa.array(np.arange(t.num_rows), pa.int64())
    )
    log = str(tmp_path / "log")
    write_windowed(t, log, num_files=num_files)
    return log


def _features(runner) -> pd.DataFrame:
    env = runner.read_output()
    key = env["key"].combine_chunks()
    df = pa.table(
        {
            "conv_id": pc.struct_field(key, "conv_id"),
            "turn_idx": pc.struct_field(key, "turn_idx"),
            "seq": env["seq"].combine_chunks(),
            "op": env["op"].combine_chunks(),
            **{c: env[c].combine_chunks() for c in FEATS},
        }
    ).to_pandas()
    return df.sort_values(["seq", "op", "conv_id"]).reset_index(drop=True)


def test_salted_cstate_equals_unsalted(tmp_path):
    log = _hot_log(tmp_path)

    ra = CaptureRunner(log, _cfg(tmp_path, "a"))
    ra.run(files_per_batch=1)
    rb = CaptureRunner(log, _cfg(tmp_path, "b", hot_key_threshold=200, salt_factor=4))
    rb.run(files_per_batch=1, hot_convs=["conv0"])

    a, b = _features(ra), _features(rb)
    pd.testing.assert_frame_equal(a, b)
    # enrichment really happened: the hot conv's features climb monotonically
    hot = b[b.conv_id == "conv0"].sort_values("seq")
    assert hot.prior_turns.iloc[-1] > 100
    assert hot.prior_turns.isna().sum() == 0

    # the hot conversation really was split across >1 sub-shard
    shards = set()
    for p in glob.glob(os.path.join(rb.out_dir, "batch-*", "shard=*.parquet")):
        t = pq.read_table(p, columns=["key"])
        if "conv0" in set(t["key"].combine_chunks().field("conv_id").to_pylist()):
            shards.add(p.rsplit("shard=", 1)[1])
    assert len(shards) > 1, "hot conv was not split across sub-shards"

    # scratch partial dirs were GC'd after commit
    assert not glob.glob(os.path.join(rb.out_dir, "_cstate_partials", "*"))
    assert not glob.glob(os.path.join(rb.out_dir, "_cstate_features", "*"))


def test_salted_cstate_kill_resume(tmp_path):
    """Crash after batch 0's fixup but before its commit: replay regenerates
    partials → merge → fixup deterministically; output equals a clean run."""
    log = _hot_log(tmp_path)

    cfg = _cfg(tmp_path, "k", hot_key_threshold=200, salt_factor=4)
    r1 = CaptureRunner(log, cfg)
    assert r1.run(
        files_per_batch=1, hot_convs=["conv0"], crash_before_commit_at=1
    ).get("crashed")
    r2 = CaptureRunner(log, cfg)
    r2.run(files_per_batch=1)  # hot set restored from the manifest

    clean = CaptureRunner(log, _cfg(tmp_path, "c", hot_key_threshold=200, salt_factor=4))
    clean.run(files_per_batch=1, hot_convs=["conv0"])
    pd.testing.assert_frame_equal(_features(r2), _features(clean))
