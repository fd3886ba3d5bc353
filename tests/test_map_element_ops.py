"""Map element-level non-frozen collection ops (the map half of the
reference's scenarios: ``ScyllaChangeRecordEmitter.java:719-735`` emits maps
key-ordered; ``:361-398`` cdc$deleted_elements carries removed KEYS;
``ScyllaTypesAllBase.java`` map upsert/remove/overwrite transitions)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from scylla_cdc_source_connector_ray.stages.element_ops import fold_map_element_ops

TS = pa.timestamp("us")


def _log(rows):
    """rows: (conv, turn, ts, seq, kind, add_pairs, rem_keys) where
    add_pairs is a list of (key, val)."""
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "ts": pa.array([r[2] for r in rows], TS),
            "seq": pa.array([r[3] for r in rows], pa.int64()),
            "kind": pa.array([r[4] for r in rows], pa.string()),
            "add_keys": pa.array([[k for k, _ in r[5]] for r in rows], pa.list_(pa.string())),
            "add_vals": pa.array([[v for _, v in r[5]] for r in rows], pa.list_(pa.string())),
            "rem_keys": pa.array([r[6] for r in rows], pa.list_(pa.string())),
        }
    )


def _brute_force(rows):
    """O(n²) reference: per key-group, cells = [(key, val, add_ord)]; wipe
    kills earlier cells, remove kills live cells by KEY, an add of an existing
    key kills its earlier cells (upsert); after = live cells in key order."""
    out = []
    prev_csv = {}
    cells_by = {}
    for ordinal, r in enumerate(sorted(rows, key=lambda r: (r[0], r[1], r[2], r[3]))):
        grp = (r[0], r[1])
        cells = cells_by.setdefault(grp, [])
        if r[4] == "wipe":
            cells.clear()
        for k in r[6]:
            cells[:] = [c for c in cells if c[0] != k]
        for k, v in r[5]:
            cells[:] = [c for c in cells if not (c[0] == k and c[2] < ordinal)]
            cells.append((k, v, ordinal))
        live = sorted(cells, key=lambda c: c[0])  # stable: same-row dups keep order
        after = ",".join(f"{k}:{v}" for k, v, _ in live)
        out.append(
            {
                "conv_id": r[0],
                "turn_idx": r[1],
                "seq": r[3],
                "kind": r[4],
                "after_csv": after,
                "n_after": len(live),
                "before_csv": prev_csv.get(grp),
                "entries_modified": r[4] != "none",
            }
        )
        prev_csv[grp] = after
    return out


def _check(rows):
    got = fold_map_element_ops(_log(rows)).to_pandas()
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


def test_upsert_remove_wipe_transitions():
    """Map matrix: insert, upsert-overwrites, delete-by-key, re-add after
    delete, overwrite (wipe kills only earlier entries; same-row adds
    survive), delete-nonexistent-key (still modified), untouched rows,
    key-ordered emit regardless of insertion order."""
    rows = [
        ("a", 0, 1, 1, "add", [("b", "1")], []),
        ("a", 0, 2, 2, "add", [("a", "2")], []),      # emits key-ordered: a,b
        ("a", 0, 3, 3, "add", [("b", "9")], []),      # upsert overwrites b
        ("a", 0, 4, 4, "remove", [], ["a"]),          # delete by key
        ("a", 0, 5, 5, "add", [("a", "7")], []),      # re-add after delete
        ("a", 0, 6, 6, "none", [], []),               # untouched: images carry
        ("a", 0, 7, 7, "wipe", [("z", "0")], []),     # overwrite: {z:0}
        ("a", 0, 8, 8, "remove", [], ["nope"]),       # remove of absent key
    ]
    got = fold_map_element_ops(_log(rows)).to_pandas()
    assert list(got["after_csv"]) == [
        "b:1", "a:2,b:1", "a:2,b:9", "b:9", "a:7,b:9", "a:7,b:9", "z:0", "z:0",
    ]
    assert list(got["before_csv"])[1:] == [
        "b:1", "a:2,b:1", "a:2,b:9", "b:9", "a:7,b:9", "a:7,b:9", "z:0",
    ]
    assert list(got["entries_modified"]) == [True] * 5 + [False, True, True]
    _check(rows)


def test_multi_entry_rows_and_cross_key_isolation():
    rows = [
        ("a", 0, 1, 1, "add", [("k1", "1"), ("k2", "2")], []),
        ("b", 0, 2, 2, "remove", [], ["k1"]),         # other conv: isolated
        ("a", 1, 3, 3, "wipe", [("q", "5")], []),     # other turn: isolated
        ("a", 0, 4, 4, "add", [("k2", "8"), ("k3", "3")], []),  # upsert + new
        ("a", 0, 5, 5, "wipe", [], []),               # wipe with no adds
        ("a", 0, 6, 6, "add", [], []),                # add with no entries
    ]
    got = fold_map_element_ops(_log(rows)).to_pandas()
    byseq = {r.seq: r for r in got.itertuples()}
    assert byseq[1].after_csv == "k1:1,k2:2"
    assert byseq[2].after_csv == "" and byseq[2].n_after == 0
    assert byseq[3].after_csv == "q:5"
    assert byseq[4].after_csv == "k1:1,k2:8,k3:3"
    assert byseq[5].after_csv == "" and byseq[5].n_after == 0
    assert byseq[6].after_csv == ""
    _check(rows)


def test_out_of_order_arrival_reorders_by_timeuuid():
    rows = [
        ("a", 0, 3, 3, "remove", [], ["x"]),
        ("a", 0, 1, 1, "add", [("x", "1")], []),
        ("a", 0, 2, 2, "add", [("y", "2")], []),
    ]
    got = fold_map_element_ops(_log(rows)).to_pandas()
    assert list(got["after_csv"]) == ["x:1", "x:1,y:2", "y:2"]
    _check(rows)


def test_empty_input():
    out = fold_map_element_ops(_log([]))
    assert out.num_rows == 0
    assert out.schema.field("after_csv").type == pa.string()


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),        # conv
        st.integers(0, 1),                  # turn
        st.sampled_from(["add", "remove", "wipe", "none"]),
        st.lists(
            st.tuples(st.sampled_from(["x", "y", "z"]), st.sampled_from(["1", "2"])),
            max_size=2,
            unique_by=lambda kv: kv[0],     # no same-row duplicate keys
        ),
    ),
    max_size=24,
))
def test_property_vs_brute_force(ops):
    rows = []
    for i, (conv, turn, kind, pairs) in enumerate(ops):
        add = pairs if kind in ("add", "wipe") else []
        rem = [k for k, _ in pairs[:1]] if kind == "remove" else []
        rows.append((conv, turn, i + 1, i + 1, kind, add, rem))
    _check(rows)
