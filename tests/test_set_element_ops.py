"""Set element-level ops (the set half of the reference's non-frozen
collection scenarios: ``ScyllaTypesAllBase`` set add/remove transitions;
``ScyllaChangeRecordEmitter.java:683-746`` emit). Cell key IS the element:
re-adds are idempotent, removes kill by value, wipes clear prior content,
and post-images are the distinct live elements in VALUE order."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from scylla_cdc_source_connector_ray.stages.element_ops import fold_set_element_ops

TS = pa.timestamp("us")


def _log(rows):
    """rows: (conv, turn, ts, seq, kind, add_elems, rem_elems)"""
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "ts": pa.array([r[2] for r in rows], TS),
            "seq": pa.array([r[3] for r in rows], pa.int64()),
            "kind": pa.array([r[4] for r in rows], pa.string()),
            "add_elems": pa.array([r[5] for r in rows], pa.list_(pa.string())),
            "rem_elems": pa.array([r[6] for r in rows], pa.list_(pa.string())),
        }
    )


def _brute_force(rows):
    """O(n²) reference: per key a plain python set; wipe clears BEFORE the
    row's own adds; removes apply before adds; after = sorted(set)."""
    out = []
    last = {}
    by_key = {}
    for r in sorted(rows, key=lambda r: (r[0], r[1], r[2], r[3])):
        key = (r[0], r[1])
        s = by_key.setdefault(key, set())
        if r[4] == "wipe":
            s.clear()
        for v in r[6]:
            s.discard(v)
        for v in r[5]:
            s.add(v)
        after = ",".join(sorted(s))
        out.append(
            {
                "conv_id": r[0],
                "turn_idx": r[1],
                "seq": r[3],
                "kind": r[4],
                "after_csv": after,
                "n_after": len(s),
                "before_csv": last.get(key),
                "elems_modified": r[4] != "none",
            }
        )
        last[key] = after
    return out


def _check(rows):
    got = fold_set_element_ops(_log(rows)).to_pandas()
    got = got.sort_values(["conv_id", "turn_idx", "seq"]).reset_index(drop=True)
    want = _brute_force(rows)
    assert len(got) == len(want)
    for i, w in enumerate(want):
        for k, v in w.items():
            g = got.loc[i, k]
            if v is None:
                assert g is None or (isinstance(g, float) and np.isnan(g)), (i, k, g)
            else:
                assert g == v, (i, k, g, v)


def test_set_transitions():
    """Idempotent re-add, remove, re-add-after-remove, overwrite, remove of
    an absent value (still modified), value-ordered images."""
    rows = [
        ("a", 0, 1, 1, "add", ["y"], []),
        ("a", 0, 2, 2, "add", ["x", "y"], []),  # re-add y: idempotent
        ("a", 0, 3, 3, "remove", [], ["y"]),
        ("a", 0, 4, 4, "add", ["y"], []),       # re-add after remove
        ("a", 0, 5, 5, "none", [], []),
        ("a", 0, 6, 6, "wipe", ["z"], []),      # overwrite → {z}
        ("a", 0, 7, 7, "remove", [], ["nope"]),
        ("a", 0, 8, 8, "add", ["a"], []),       # value order: a before z
    ]
    got = fold_set_element_ops(_log(rows)).to_pandas()
    assert list(got["after_csv"]) == [
        "y", "x,y", "x", "x,y", "x,y", "z", "z", "a,z",
    ]
    assert list(got["elems_modified"]) == [
        True, True, True, True, False, True, True, True,
    ]
    _check(rows)


def test_same_row_add_survives_remove_and_wipe():
    rows = [
        ("a", 0, 1, 1, "add", ["x"], []),
        ("a", 0, 2, 2, "remove", ["x"], ["x"]),  # remove + re-add same row
        ("a", 0, 3, 3, "wipe", ["x"], []),       # wipe + add same row
    ]
    got = fold_set_element_ops(_log(rows)).to_pandas()
    assert list(got["after_csv"]) == ["x", "x", "x"]


def test_cross_key_isolation_and_empty():
    rows = [
        ("a", 0, 1, 1, "add", ["x"], []),
        ("b", 0, 2, 2, "remove", [], ["x"]),
        ("a", 1, 3, 3, "wipe", ["q"], []),
        ("a", 0, 4, 4, "wipe", [], []),
    ]
    got = fold_set_element_ops(_log(rows)).to_pandas()
    byseq = {r.seq: r for r in got.itertuples()}
    assert byseq[1].after_csv == "x"
    assert byseq[2].after_csv == "" and byseq[2].n_after == 0
    assert byseq[3].after_csv == "q"
    assert byseq[4].after_csv == "" and byseq[4].n_after == 0
    _check(rows)


def test_empty_input():
    out = fold_set_element_ops(_log([]))
    assert out.num_rows == 0
    assert out.schema.field("after_csv").type == pa.string()


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(0, 1),
        st.sampled_from(["add", "remove", "wipe", "none"]),
        st.lists(st.sampled_from(["x", "y", "z"]), max_size=2),
    ),
    max_size=24,
))
def test_property_vs_brute_force(ops):
    rows = []
    for i, (conv, turn, kind, elems) in enumerate(ops):
        add = elems if kind in ("add", "wipe") else []
        rem = elems[:1] if kind == "remove" else []
        rows.append((conv, turn, i + 1, i + 1, kind, add, rem))
    _check(rows)
