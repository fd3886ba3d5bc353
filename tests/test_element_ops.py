"""Element-level non-frozen collection ops (reference M8 tail:
``ScyllaChangeRecordEmitter.java:683-746`` timeuuid merge+reorder,
``:361-398`` cdc$deleted_elements in modified-columns,
``ScyllaTypesAllBase.java`` add/remove/overwrite transition scenarios)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from scylla_cdc_source_connector_ray.stages.element_ops import fold_element_ops

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
    """O(n²) reference: per key, cells = [(add_ord, pos, val)]; wipe kills
    earlier cells, remove kills live cells by value; after = live cells in
    (add_ord, pos) order."""
    out = {}
    by_key = {}
    for ordinal, r in enumerate(sorted(rows, key=lambda r: (r[0], r[1], r[2], r[3]))):
        key = (r[0], r[1])
        cells = by_key.setdefault(key, [])
        if r[4] == "wipe":
            cells.clear()
        for v in r[6]:
            cells[:] = [c for c in cells if c[2] != v]
        for pos, v in enumerate(r[5]):
            cells.append((ordinal, pos, v))
        prev = out.get(key)
        after = ",".join(c[2] for c in cells)
        out.setdefault("rows", []).append(
            {
                "conv_id": r[0],
                "turn_idx": r[1],
                "seq": r[3],
                "kind": r[4],
                "after_csv": after,
                "n_after": len(cells),
                "before_csv": prev,
                "elems_modified": r[4] != "none",
            }
        )
        out[key] = after
    return out.get("rows", [])


def _check(rows):
    got = fold_element_ops(_log(rows)).to_pandas()
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


def test_add_remove_readd_wipe_transitions():
    """The ScyllaTypesAllBase-style matrix: add, add-dup-value, remove (kills
    every live cell of that value), re-add after remove, overwrite (wipe
    kills only earlier cells; same-row adds survive), remove-nonexistent
    (still marks the column modified), untouched rows."""
    rows = [
        ("a", 0, 1, 1, "add", ["x"], []),
        ("a", 0, 2, 2, "add", ["y", "x"], []),  # x now has two live cells
        ("a", 0, 3, 3, "remove", [], ["x"]),  # kills BOTH x cells
        ("a", 0, 4, 4, "add", ["x"], []),  # re-add after remove
        ("a", 0, 5, 5, "none", [], []),  # untouched: images carry over
        ("a", 0, 6, 6, "wipe", ["z"], []),  # overwrite: [z]
        ("a", 0, 7, 7, "remove", [], ["nope"]),  # remove of absent value
        ("a", 0, 8, 8, "add", ["w"], []),
    ]
    got = fold_element_ops(_log(rows)).to_pandas()
    assert list(got["after_csv"]) == [
        "x", "x,y,x", "y", "y,x", "y,x", "z", "z", "z,w",
    ]
    assert list(got["before_csv"])[1:] == ["x", "x,y,x", "y", "y,x", "y,x", "z", "z"]
    assert got["before_csv"][0] is None or got.loc[0, "before_csv"] != got.loc[0, "before_csv"]
    assert list(got["elems_modified"]) == [True, True, True, True, False, True, True, True]
    _check(rows)


def test_empty_and_cross_key_isolation():
    rows = [
        ("a", 0, 1, 1, "add", ["x"], []),
        ("b", 0, 2, 2, "remove", [], ["x"]),  # other key: no effect on a/0
        ("a", 1, 3, 3, "wipe", ["q"], []),  # other turn: isolated
        ("a", 0, 4, 4, "add", ["y"], []),
        ("a", 0, 5, 5, "wipe", [], []),  # wipe with no adds → emptied
        ("a", 0, 6, 6, "add", [], []),  # add with no elements
    ]
    got = fold_element_ops(_log(rows)).to_pandas()
    byseq = {r.seq: r for r in got.itertuples()}
    assert byseq[1].after_csv == "x"
    assert byseq[2].after_csv == "" and byseq[2].n_after == 0
    assert byseq[3].after_csv == "q"
    assert byseq[4].after_csv == "x,y"
    assert byseq[5].after_csv == "" and byseq[5].n_after == 0
    assert byseq[6].after_csv == ""
    _check(rows)


def test_out_of_order_arrival_reorders_by_timeuuid():
    """Rows may arrive in any physical order; the fold orders by (ts, seq) —
    the timeuuid analogue — like the reference's sorted-by-key emit."""
    rows = [
        ("a", 0, 3, 3, "remove", [], ["x"]),
        ("a", 0, 1, 1, "add", ["x"], []),
        ("a", 0, 2, 2, "add", ["y"], []),
    ]
    got = fold_element_ops(_log(rows)).to_pandas()
    assert list(got["after_csv"]) == ["x", "x,y", "y"]
    _check(rows)


def test_empty_input():
    out = fold_element_ops(_log([]))
    assert out.num_rows == 0
    assert out.schema.field("after_csv").type == pa.string()


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),        # conv
        st.integers(0, 1),                  # turn
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
