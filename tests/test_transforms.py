"""SMT-analogue transforms: extract-new-record-state, legacy Cell format,
flatten-columns (reference M10/M11 + legacy schema Cell semantics)."""

import pandas as pd
import pyarrow as pa

import ray.data

from scylla_cdc_source_connector_ray.config import EngineConfig
from scylla_cdc_source_connector_ray.pipelines import capture as cap
from scylla_cdc_source_connector_ray.sources.synthetic import generate
from scylla_cdc_source_connector_ray.stages import transforms as TR
from scylla_cdc_source_connector_ray.stages.op_derive import derive_ops


def test_extract_new_record_state():
    t = generate(num_convs=6, turns_per_conv=6, update_pct=40, delete_pct=20)
    cfg = EngineConfig(num_shards=4)
    env = cap.capture(ray.data.from_arrow(t), cfg)
    flat = TR.apply_post_transforms(env, [TR.extract_new_record_state]).to_pandas()
    assert {"conv_id", "turn_idx", "role", "text", "tool", "ts", "op", "ts_ms"} <= set(flat.columns)
    assert len(flat) == derive_ops(t).num_rows
    # deletes present with NULL state unless dropped
    dels = flat[flat["op"] == "d"]
    assert dels["text"].isna().all()
    flat2 = TR.apply_post_transforms(
        env, [lambda b: TR.extract_new_record_state(b, drop_deletes=True)]
    ).to_pandas()
    assert (flat2["op"] != "d").all()
    assert len(flat2) == len(flat) - len(dels)


def test_cell_format_distinguishes_unmodified_from_null():
    """Cell NULL = not modified; Cell{value: NULL} = set to NULL — the legacy
    encoding's whole point (ScyllaSchemaLegacy.java:112-127)."""
    rows = pa.table(
        {
            "conv_id": pa.array(["a", "a"], pa.string()),
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": pa.array(["user", "user"], pa.string()),
            "text": pa.array(["v1", "v2"], pa.string()),
            "tool": pa.array(["search", None], pa.string()),  # tool set to NULL
            "ts": pa.array([1, 2], pa.timestamp("us")),
            "seq": pa.array([0, 1], pa.int64()),
        }
    )
    flat = derive_ops(rows)
    cells = TR.to_cell_format(flat)
    upd = cells.filter(pa.compute.equal(cells["op"], "u"))
    after_text = upd["after_text_cell"].combine_chunks()
    after_role = upd["after_role_cell"].combine_chunks()
    after_tool = upd["after_tool_cell"].combine_chunks()
    # text modified → cell present with value
    assert after_text.is_valid().to_pylist() == [True]
    assert pa.compute.struct_field(after_text, "value").to_pylist() == ["v2"]
    # role untouched → cell NULL
    assert after_role.is_valid().to_pylist() == [False]
    # tool modified to NULL → cell present, value NULL
    assert after_tool.is_valid().to_pylist() == [True]
    assert pa.compute.struct_field(after_tool, "value").to_pylist() == [None]


def test_flatten_columns_roundtrip():
    t = generate(num_convs=5, turns_per_conv=5, update_pct=40, delete_pct=10)
    flat = derive_ops(t)
    cells = TR.to_cell_format(flat)
    back = TR.flatten_columns(cells).to_pandas()
    orig = flat.to_pandas()
    # flattening discards the modified-vs-null distinction: cells that were
    # "not modified" flatten to NULL; modified values round-trip exactly
    for img in ("after", "before"):
        got = back[f"{img}_text"]
        want = orig[f"{img}_text"].where(
            orig["modified_cols"].str.contains("text"), other=pd.NA
        )
        assert got.fillna("~").tolist() == want.fillna("~").tolist()
