"""Unit tests for op classification + image synthesis (no Ray needed).

Mirrors the reference's TaskInfo/consumer unit coverage
(``TaskInfoTest.java``, ``ScyllaChangesConsumerTest.java`` — SURVEY.md §5).
"""

import pandas as pd
import pyarrow as pa
import pytest

from scylla_cdc_source_connector_ray.sources.synthetic import generate
from scylla_cdc_source_connector_ray.stages.op_derive import derive_ops
from tests.oracle import cdc_oracle

TS = pa.timestamp("us")


def _log(rows):
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([r[4] for r in rows], pa.string()),
            "ts": pa.array([r[5] for r in rows], TS),
            "seq": pa.array(list(range(len(rows))), pa.int64()),
        }
    )


def test_insert_update_delete_lifecycle():
    t = _log(
        [
            ("a", 0, "user", "hi", None, 1),
            ("a", 0, "user", "hi2", None, 2),
            ("a", 0, "__tombstone__", None, None, 3),
            ("a", 0, "user", "hi3", None, 4),  # re-insert after delete
        ]
    )
    out = derive_ops(t).to_pandas()
    assert list(out["op"]) == ["c", "u", "d", "u"]
    # state machine: before of re-emission after delete is NULL
    assert out["before_text"].tolist() == [None, "hi", "hi2", None]
    assert out["after_text"].tolist() == ["hi", "hi2", None, "hi3"]


def test_delete_of_never_inserted_key():
    t = _log([("a", 5, "__tombstone__", None, None, 1)])
    out = derive_ops(t).to_pandas()
    assert list(out["op"]) == ["d"]
    assert out["before_text"].isna().all() and out["after_text"].isna().all()


def test_modified_cols_only_changed():
    t = _log(
        [
            ("a", 0, "user", "x", "search", 1),
            ("a", 0, "user", "y", "search", 2),  # only text changed
            ("a", 0, "assistant", "y", None, 3),  # role + tool changed
        ]
    )
    out = derive_ops(t).to_pandas()
    assert out["modified_cols"].tolist() == ["role,text,tool", "text", "role,tool"]


def test_type_grouped_misalignment_analogue():
    """Events for several turn_idx of one conv interleaved out of per-key
    order within a batch must still correlate per (conv_id, turn_idx) —
    the analogue of CdcBatchPreimageMisalignmentIT (RowKey.java:17-25)."""
    rows = [
        ("a", 0, "user", "a0v0", None, 1),
        ("a", 1, "user", "a1v0", None, 2),
        ("a", 2, "user", "a2v0", None, 3),
        ("a", 0, "user", "a0v1", None, 11),
        ("a", 1, "user", "a1v1", None, 12),
        ("a", 2, "user", "a2v1", None, 13),
    ]
    import random

    rng = random.Random(7)
    shuffled = rows[:]
    rng.shuffle(shuffled)
    # keep seq = original arrival order regardless of batch layout
    seq_of = {r: i for i, r in enumerate(rows)}
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in shuffled], pa.string()),
            "turn_idx": pa.array([r[1] for r in shuffled], pa.int32()),
            "role": pa.array([r[2] for r in shuffled], pa.string()),
            "text": pa.array([r[3] for r in shuffled], pa.string()),
            "tool": pa.array([r[4] for r in shuffled], pa.string()),
            "ts": pa.array([r[5] for r in shuffled], TS),
            "seq": pa.array([seq_of[r] for r in shuffled], pa.int64()),
        }
    )
    out = derive_ops(t).to_pandas()
    by_key = out.set_index(["conv_id", "turn_idx", "op"])
    for k in (0, 1, 2):
        assert by_key.loc[("a", k, "c"), "after_text"] == f"a{k}v0"
        assert by_key.loc[("a", k, "u"), "before_text"] == f"a{k}v0"
        assert by_key.loc[("a", k, "u"), "after_text"] == f"a{k}v1"


@pytest.mark.parametrize("update_pct,delete_pct", [(0, 0), (30, 10), (100, 100)])
def test_matches_python_oracle(update_pct, delete_pct):
    t = generate(num_convs=7, turns_per_conv=9, update_pct=update_pct, delete_pct=delete_pct)
    ours = derive_ops(t).to_pandas()
    golden = cdc_oracle(t.to_pandas())
    ours = ours.drop(columns=["modified_cols", "ts"]).reset_index(drop=True)
    cols = sorted(golden.columns)
    ours = ours[cols].sort_values(["conv_id", "turn_idx", "seq"]).reset_index(drop=True)
    golden = golden[cols].sort_values(["conv_id", "turn_idx", "seq"]).reset_index(drop=True)
    for c in ("before_ts", "after_ts"):
        golden[c] = pd.to_datetime(golden[c]).astype("datetime64[ns]")
        ours[c] = pd.to_datetime(ours[c]).astype("datetime64[ns]")
    pd.testing.assert_frame_equal(ours, golden, check_dtype=False)


def test_null_empty_value_matrix():
    """value→null→""→value transitions are distinguished (reference type
    matrix ScyllaTypesAllBase.java:1272-1340): empty string is a value, NULL
    text is a tombstone, NULL tool inside a live row is just a NULL cell."""
    t = _log(
        [
            ("a", 0, "user", "v", "x", 1),
            ("a", 0, "user", "", "x", 2),  # text -> empty string: update
            ("a", 0, "user", "v2", None, 3),  # tool -> NULL cell: update
            ("a", 0, "user", None, "x", 4),  # text NULL: tombstone
        ]
    )
    out = derive_ops(t).to_pandas()
    assert list(out["op"]) == ["c", "u", "u", "d"]
    assert out.loc[1, "after_text"] == ""
    assert out.loc[1, "modified_cols"] == "text"
    assert pd.isna(out.loc[2, "after_tool"]) and out.loc[2, "modified_cols"] == "text,tool"


def test_modified_cols_many_columns_fallback():
    """>16 payload columns: the 2^k lookup would explode — the occurring-combo
    fallback must produce identical strings."""
    n = 4
    cols = {
        "conv_id": pa.array(["a"] * n, pa.string()),
        "turn_idx": pa.array([0] * n, pa.int32()),
        "text": pa.array(["v0", "v1", "v1", "v2"], pa.string()),
        "ts": pa.array([1, 2, 3, 4], TS),
        "seq": pa.array([1, 2, 3, 4], pa.int64()),
    }
    extra = [f"x{i:02d}" for i in range(17)]
    for i, name in enumerate(extra):
        # column x_i changes at row i%3+1 (and stays changed)
        j = i % 3 + 1
        cols[name] = pa.array(["a"] * j + ["b"] * (n - j), pa.string())
    t = pa.table(cols)
    out = derive_ops(t, value_cols=("text", *extra, "ts")).to_pandas()
    # row 0 is a create: every non-null column counts modified
    assert out.loc[0, "modified_cols"] == ",".join(sorted(["text", *extra]))
    for row in (1, 2, 3):
        want = sorted(nm for i, nm in enumerate(extra) if i % 3 + 1 == row)
        if row in (1, 3):
            want = sorted(want + ["text"])
        assert out.loc[row, "modified_cols"] == ",".join(want), row
