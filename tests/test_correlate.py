"""Image-mode correlation (reference ST1/ST2: TaskInfo completion machine,
RowKey-based matching, straggler GC) — fixture T3 misalignment analogue."""

import numpy as np
import pandas as pd
import pyarrow as pa

from scylla_cdc_source_connector_ray.schema import SEQ_COL
from scylla_cdc_source_connector_ray.sources.synthetic import generate, to_image_log
from scylla_cdc_source_connector_ray.stages.correlate import correlate_images
from scylla_cdc_source_connector_ray.stages.op_derive import derive_ops


def _ground_truth(t: pa.Table) -> pd.DataFrame:
    ev = derive_ops(t).to_pandas()
    cols = ["conv_id", "turn_idx", "op", "after_text", "before_text", "after_role", "before_role"]
    return ev[cols].sort_values(["conv_id", "turn_idx", "op", "after_text"]).reset_index(drop=True)


def _got(events: pa.Table) -> pd.DataFrame:
    df = events.to_pandas()
    cols = ["conv_id", "turn_idx", "op", "after_text", "before_text", "after_role", "before_role"]
    return df[cols].sort_values(["conv_id", "turn_idx", "op", "after_text"]).reset_index(drop=True)


def test_correlation_equals_row_mode_events():
    t = generate(num_convs=10, turns_per_conv=8, update_pct=40, delete_pct=20)
    img = to_image_log(t)
    events, residual, dropped = correlate_images(img)
    assert residual.num_rows == 0 and dropped == 0
    pd.testing.assert_frame_equal(_got(events), _ground_truth(t), check_dtype=False)


def test_misalignment_type_grouped_order():
    """Images shuffled arbitrarily within the window (worse than the
    reference's type-grouped case) must still correlate per key."""
    t = generate(num_convs=6, turns_per_conv=6, update_pct=50, delete_pct=20)
    img = to_image_log(t, shuffle_seed=7)
    events, residual, dropped = correlate_images(img)
    assert residual.num_rows == 0 and dropped == 0
    pd.testing.assert_frame_equal(_got(events), _ground_truth(t), check_dtype=False)


def _img_rows(rows):
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "op_kind": pa.array([r[2] for r in rows], pa.string()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([None] * len(rows), pa.string()),
            "ts": pa.array([r[4] for r in rows], pa.timestamp("us")),
            SEQ_COL: pa.array(range(len(rows)), pa.int64()),
        }
    )


def test_straggler_timeout_drops_old_incomplete():
    """A lone PRE_IMAGE older than the timeout is dropped+counted; a recent
    incomplete change is carried over (ScyllaChangesConsumer.java:147-174,
    rebased to event time)."""
    S = 15_000_000
    img = _img_rows(
        [
            ("a", 0, "PRE_IMAGE", "old", 0),  # stale straggler (no delta)
            ("a", 1, "PRE_IMAGE", "new", 90_000_000),  # recent, incomplete
            ("a", 2, "INSERT", "x", 100_000_000),
            ("a", 2, "POST_IMAGE", "x", 100_000_000),
        ]
    )
    events, residual, dropped = correlate_images(img, straggler_timeout_us=S)
    assert dropped == 1
    assert residual.num_rows == 1
    assert residual["text"].to_pylist() == ["new"]
    assert events.num_rows == 1 and events["op"].to_pylist() == ["c"]


def test_carry_over_completes_next_batch():
    img1 = _img_rows([("a", 0, "PRE_IMAGE", "v0", 100)])
    events1, res1, d1 = correlate_images(img1)
    assert events1.num_rows == 0 and res1.num_rows == 1 and d1 == 0
    img2 = _img_rows([("a", 0, "UPDATE", "v1", 100), ("a", 0, "POST_IMAGE", "v1", 100)])
    events2, res2, d2 = correlate_images(img2, carry=res1)
    assert events2.num_rows == 1
    assert events2["op"].to_pylist() == ["u"]
    assert events2["before_text"].to_pylist() == ["v0"]
    assert events2["after_text"].to_pylist() == ["v1"]
    assert res2.num_rows == 0


def test_no_preimage_mode():
    t = generate(num_convs=4, turns_per_conv=5, update_pct=40, delete_pct=20)
    img = to_image_log(t)
    import pyarrow.compute as pc

    img_nopre = img.filter(pc.not_equal(img["op_kind"], "PRE_IMAGE"))
    events, residual, dropped = correlate_images(img_nopre, want_preimage=False)
    assert residual.num_rows == 0 and dropped == 0
    assert events["before_text"].null_count == events.num_rows  # no preimages
    truth = _ground_truth(t)
    got = _got(events)
    assert got["op"].tolist() == truth["op"].tolist()
    assert got["after_text"].fillna("~").tolist() == truth["after_text"].fillna("~").tolist()
