"""End-to-end capture pipeline tests over Ray Data (golden-compare discipline:
strip dynamic fields then exact-compare, like the reference's JSONAssert usage
in ScyllaTypesIT.java:48-55)."""

import pandas as pd
import pyarrow as pa

import ray.data

from scylla_cdc_source_connector_ray.config import EngineConfig, IncludeMode
from scylla_cdc_source_connector_ray.pipelines import capture as cap
from scylla_cdc_source_connector_ray.sources.synthetic import generate
from scylla_cdc_source_connector_ray.stages.envelope import build_envelope
from scylla_cdc_source_connector_ray.stages.op_derive import derive_ops
from tests.oracle import cdc_oracle


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["conv_id", "turn_idx", "seq"]).reset_index(drop=True)
    for c in df.columns:
        if c.endswith("_ts"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[ns]")
    return df


def test_capture_flat_matches_oracle_over_ray():
    t = generate(num_convs=40, turns_per_conv=12, update_pct=35, delete_pct=15)
    cfg = EngineConfig(num_shards=8)
    ds = ray.data.from_arrow(t)
    # split into many blocks so the shuffle actually moves rows
    ds = ds.repartition(6)
    out = cap.capture_flat(ds, cfg).to_pandas()
    golden = cdc_oracle(t.to_pandas())
    cols = sorted(golden.columns)
    pd.testing.assert_frame_equal(
        _norm(out[cols]), _norm(golden[cols]), check_dtype=False
    )
    # per-turn text equality under stable turn ordering (BASELINE invariant)
    assert (
        _norm(out)["after_text"].fillna("~").tolist()
        == _norm(golden)["after_text"].fillna("~").tolist()
    )


def test_envelope_struct_shapes():
    t = generate(num_convs=4, turns_per_conv=6, update_pct=50, delete_pct=20)
    cfg = EngineConfig(num_shards=4)
    flat = derive_ops(t)
    env = build_envelope(flat, cfg, window_start_us=0)
    assert env.schema.field("before").type.num_fields == 6
    dels = env.filter(pa.compute.equal(env["op"], "d"))
    assert dels["after"].null_count == dels.num_rows  # DELETE → after NULL
    ins = env.filter(pa.compute.equal(env["op"], "c"))
    assert ins["after"].null_count == 0
    src = env["source"].combine_chunks()
    assert pa.compute.struct_field(src, "epoch").to_pylist() == [0] * env.num_rows


def test_only_updated_mode_excludes_untouched_columns():
    """only-updated must exclude unchanged columns from the image structs
    (reference CdcIncludeBeforeAfterOnlyUpdatedIT / CdcIncludeBeforeAfterBase
    'untouched_' columns)."""
    rows = pa.table(
        {
            "conv_id": pa.array(["a", "a"], pa.string()),
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": pa.array(["user", "user"], pa.string()),
            "text": pa.array(["v1", "v2"], pa.string()),
            "tool": pa.array(["search", "search"], pa.string()),
            "ts": pa.array([1, 2], pa.timestamp("us")),
            "seq": pa.array([0, 1], pa.int64()),
        }
    )
    cfg = EngineConfig(include_after=IncludeMode.ONLY_UPDATED, include_before=IncludeMode.ONLY_UPDATED)
    env = build_envelope(derive_ops(rows), cfg)
    upd = env.filter(pa.compute.equal(env["op"], "u"))
    after = upd["after"].combine_chunks()
    # text changed → present; role/tool untouched → NULLed out; pk always kept
    assert pa.compute.struct_field(after, "text").to_pylist() == ["v2"]
    assert pa.compute.struct_field(after, "role").to_pylist() == [None]
    assert pa.compute.struct_field(after, "tool").to_pylist() == [None]
    assert pa.compute.struct_field(after, "conv_id").to_pylist() == ["a"]


def test_include_none_mode():
    t = generate(num_convs=3, turns_per_conv=4, update_pct=50, delete_pct=0)
    cfg = EngineConfig(include_before=IncludeMode.NONE)
    env = build_envelope(derive_ops(t), cfg)
    assert env["before"].null_count == env.num_rows


def test_events_adapter_pipeline_runs():
    ds = cap.read_transcripts_from_events("/root/testdata/sf0.001")
    out = cap.capture_flat(ds, EngineConfig(num_shards=8)).to_pandas()
    assert len(out) == 1000
    assert set(out["op"].unique()) <= {"c", "u", "d"}


import itertools

import pytest


@pytest.mark.parametrize(
    "before_mode,after_mode",
    list(itertools.product(["none", "full", "only-updated"], repeat=2)),
)
def test_include_mode_matrix(before_mode, after_mode):
    """Every cdc.include.before × cdc.include.after combination (reference
    CdcIncludeBeforeAfter{None,Full,OnlyUpdated,...}IT matrix)."""
    t = generate(num_convs=5, turns_per_conv=6, update_pct=50, delete_pct=20)
    cfg = EngineConfig(include_before=before_mode, include_after=after_mode)
    flat = derive_ops(t)
    env = build_envelope(flat, cfg)
    pc = pa.compute
    before = env["before"].combine_chunks()
    after = env["after"].combine_chunks()
    ops = env["op"].to_pylist()
    if before_mode == "none":
        assert before.null_count == env.num_rows
    else:
        # creates (no prior state) have NULL before; updates/deletes have one
        n_with_before = sum(1 for i, op in enumerate(ops) if before.is_valid()[i].as_py())
        assert n_with_before == sum(1 for i, op in enumerate(ops) if op in ("u", "d") and flat["before_ts"][i].is_valid)
    if after_mode == "none":
        assert after.null_count == env.num_rows
    else:
        assert all(
            (not after.is_valid()[i].as_py()) == (op == "d") for i, op in enumerate(ops)
        )
    if after_mode == "only-updated":
        # untouched payload fields are NULLed inside present structs
        mods = flat["modified_cols"].to_pylist()
        vals = pc.struct_field(after, "role").to_pylist()
        for i, op in enumerate(ops):
            if op == "u" and "role" not in mods[i]:
                assert vals[i] is None
