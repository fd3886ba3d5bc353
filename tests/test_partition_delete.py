"""Partition-delete (conversation-tombstone) semantics — reference M2
(``ScyllaChangesConsumer.java:271-283``): expansion deletes, before-image
wipes, marker records, compaction drops."""

import pyarrow as pa
import pytest

from scylla_cdc_source_connector_ray.stages.partition_delete import (
    compact_pd,
    derive_flat_pd,
)

US = 1_000_000


def _log(rows):
    """rows: (conv, turn|None, role, text, tool, ts_s, seq)"""
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([r[4] for r in rows], pa.string()),
            "ts": pa.array([r[5] * US for r in rows], pa.timestamp("us")),
            "seq": pa.array([r[6] for r in rows], pa.int64()),
        }
    )


def _by_op(tbl):
    d = {}
    for row in tbl.to_pylist():
        d.setdefault(row["op"], []).append(row)
    return d


def test_expansion_deletes_live_keys_only():
    # turn 0 live, turn 1 row-tombstoned before the pd, turn 2 created after
    log = _log(
        [
            ("c1", 0, "user", "a", None, 10, 1),
            ("c1", 1, "user", "b", None, 11, 2),
            ("c1", 1, None, None, None, 12, 3),  # row tombstone
            ("c1", None, None, None, None, 20, 4),  # conversation tombstone
            ("c1", 2, "user", "c", None, 30, 5),
        ]
    )
    out = _by_op(derive_flat_pd(log))
    # expansion: only turn 0 was live at the pd
    exp = [r for r in out["d"] if r["seq"] == 4]
    assert [(r["conv_id"], r["turn_idx"]) for r in exp] == [("c1", 0)]
    assert exp[0]["before_text"] == "a" and exp[0]["after_text"] is None
    # the marker record
    assert [(r["conv_id"], r["turn_idx"], r["seq"]) for r in out["pd"]] == [("c1", None, 4)]
    # the post-pd row is a first-ever 'c' with NULL before
    c_rows = {r["seq"]: r for r in out["c"]}
    assert c_rows[5]["before_text"] is None


def test_before_image_wiped_after_pd():
    log = _log(
        [
            ("c1", 0, "user", "a", None, 10, 1),
            ("c1", None, None, None, None, 20, 2),
            ("c1", 0, "user", "b", None, 30, 3),  # re-insert after wipe
        ]
    )
    rows = {r["seq"]: r for r in derive_flat_pd(log).to_pylist()}
    # op stays 'u' (not first-ever, same as after a row tombstone) but the
    # before image is wiped
    assert rows[3]["op"] == "u"
    assert rows[3]["before_text"] is None and rows[3]["before_role"] is None
    assert rows[3]["after_text"] == "b"


def test_second_pd_does_not_reemit():
    log = _log(
        [
            ("c1", 0, "user", "a", None, 10, 1),
            ("c1", None, None, None, None, 20, 2),
            ("c1", None, None, None, None, 30, 3),  # nothing live: no expansion
        ]
    )
    out = _by_op(derive_flat_pd(log))
    dels = out.get("d", [])
    assert [(r["turn_idx"], r["seq"]) for r in dels] == [(0, 2)]
    assert len(out["pd"]) == 2


def test_pd_only_affects_its_conversation():
    log = _log(
        [
            ("c1", 0, "user", "a", None, 10, 1),
            ("c2", 0, "user", "x", None, 15, 2),
            ("c1", None, None, None, None, 20, 3),
        ]
    )
    out = _by_op(derive_flat_pd(log))
    assert [(r["conv_id"], r["seq"]) for r in out["d"]] == [("c1", 3)]
    comp = compact_pd(log).to_pylist()
    assert [(r["conv_id"], r["text"]) for r in comp] == [("c2", "x")]


def test_pd_before_any_rows_is_noop_marker():
    log = _log(
        [
            ("c1", None, None, None, None, 5, 1),
            ("c1", 0, "user", "a", None, 10, 2),
        ]
    )
    out = _by_op(derive_flat_pd(log))
    assert "d" not in out
    assert out["c"][0]["seq"] == 2 and out["c"][0]["before_text"] is None
    assert compact_pd(log).num_rows == 1


def test_compaction_drops_conv_behind_final_pd():
    log = _log(
        [
            ("c1", 0, "user", "a", None, 10, 1),
            ("c1", 1, "user", "b", None, 11, 2),
            ("c1", None, None, None, None, 20, 3),
            ("c1", 2, "user", "c", None, 30, 4),  # survives: after the pd
        ]
    )
    comp = compact_pd(log).to_pylist()
    assert [(r["turn_idx"], r["text"]) for r in comp] == [(2, "c")]


def test_no_pd_degenerates_to_plain_capture():
    from scylla_cdc_source_connector_ray.stages.envelope import flatten_envelope
    from scylla_cdc_source_connector_ray.stages.op_derive import derive_ops

    log = _log(
        [
            ("c1", 0, "user", "a", None, 10, 1),
            ("c1", 0, "user", "b", None, 20, 2),
            ("c1", 1, None, None, None, 30, 3),
        ]
    )
    pd_out = derive_flat_pd(log).sort_by([("seq", "ascending")])
    plain = derive_ops(log)
    keep = pd_out.column_names
    plain = pa.table({c: plain[c] for c in keep}).sort_by([("seq", "ascending")])
    assert pd_out.equals(plain)


def test_empty_block():
    assert derive_flat_pd(_log([])).num_rows == 0
    assert compact_pd(_log([])).num_rows == 0


@pytest.mark.usefixtures("ray_session")
def test_capture_pd_pipeline_matches_kernel():
    import ray.data

    from scylla_cdc_source_connector_ray.config import EngineConfig
    from scylla_cdc_source_connector_ray.pipelines.capture import capture_pd

    log = _log(
        [
            ("c%d" % (i % 7), (i % 5) if i % 13 else None, "user", ("t%d" % i) if i % 11 else None, None, 10 + i, i)
            for i in range(200)
        ]
    )
    expected = derive_flat_pd(log)
    got = capture_pd(ray.data.from_arrow(log), EngineConfig(num_shards=4)).take_all()
    assert len(got) == expected.num_rows
    key = lambda r: (r["conv_id"], r["seq"], r["op"], r["turn_idx"] if r["turn_idx"] is not None else -1)  # noqa: E731
    assert sorted((key(r) for r in got)) == sorted(key(r) for r in expected.to_pylist())


# --- property: vectorized kernel ≡ brute-force reference -------------------


def _brute_force_pd(rows):
    """O(n²) reference of the partition-delete spec over
    (conv, turn|None, text|None, ts, seq) rows."""
    out = []
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r[0], []).append(r)
    for conv, evs in by_conv.items():
        evs = sorted(evs, key=lambda r: (r[5], r[6]))  # (ts, seq)
        state = {}  # turn -> last row (after image) or None if tombstoned
        first_seen = set()
        for r in evs:
            conv_id, turn, role, text, tool, ts, seq = r
            if turn is None:  # conversation tombstone
                for k in sorted(state):
                    prev = state[k]
                    if prev is not None:
                        out.append((conv_id, k, "d", prev[2], prev[3], seq))
                state = {}
                out.append((conv_id, None, "pd", None, None, seq))
                continue
            prev = state.get(turn)
            before_role = prev[2] if prev else None
            before_text = prev[3] if prev else None
            op = "d" if text is None else ("c" if turn not in first_seen else "u")
            first_seen.add(turn)
            out.append((conv_id, turn, op, before_role, before_text, seq))
            state[turn] = None if text is None else (conv_id, turn, role, text, tool)
    return sorted(out, key=lambda x: (x[0], x[5], x[2], -1 if x[1] is None else x[1]))


def test_property_random_logs_match_reference():
    import random

    rng = random.Random(1234)
    for trial in range(25):
        rows = []
        seq = 0
        for _ in range(rng.randint(1, 60)):
            conv = "c%d" % rng.randint(0, 4)
            kind = rng.random()
            if kind < 0.08:
                rows.append((conv, None, None, None, None, rng.randint(0, 50), seq))
            else:
                turn = rng.randint(0, 3)
                text = None if kind < 0.2 else "t%d" % seq
                rows.append((conv, turn, "user", text, None, rng.randint(0, 50), seq))
            seq += 1
        log = _log(rows)

        def norm(t):  # None-safe total order
            c, turn, op, br, bt, s = t
            return (c, -1 if turn is None else turn, op, br or "", bt or "", s)

        got = derive_flat_pd(log).to_pylist()
        got_k = sorted(
            norm((r["conv_id"], r["turn_idx"], r["op"], r["before_role"], r["before_text"], r["seq"]))
            for r in got
        )
        want_k = sorted(norm(t) for t in _brute_force_pd(rows))
        assert got_k == want_k, f"trial {trial}"
