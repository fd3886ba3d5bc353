"""Per-row TTL deletes (CdcPerRowTtlDeleteIT analogue) and M9 headers
placement."""

import pyarrow as pa

from scylla_cdc_source_connector_ray.stages.ttl import ttl_delete_events

US = 1_000_000


def _log(rows):
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
            "tool": pa.array([None] * len(rows), pa.string()),
            "ts": pa.array([r[3] * US for r in rows], pa.timestamp("us")),
            "seq": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


def test_ttl_expiry_rules():
    ttl = 10 * US
    log = _log(
        [
            ("c1", 0, "a", 0, 1),     # refreshed at t=5 (< expiry 10) → no expiry
            ("c1", 0, "b", 5, 2),     # next write at 30 > 15 → expires at 15
            ("c1", 0, "c", 30, 3),    # 40 > horizon(35) → no expiry
            ("c1", 1, None, 2, 4),    # tombstone: never expires
            ("c2", 0, "x", 20, 5),    # no next, 30 <= 35 → expires at 30
            ("c2", 1, "y", 34, 6),    # 44 > horizon → no expiry
            ("c3", 0, "z", 35, 7),    # horizon row itself: 45 > 35 → no
        ]
    )
    horizon = 35 * US
    out = ttl_delete_events(log, ttl, horizon).to_pylist()
    got = sorted((r["conv_id"], r["turn_idx"], r["seq"], r["expire_ts_us"]) for r in out)
    assert got == [("c1", 0, 2, 15 * US), ("c2", 0, 5, 30 * US)]
    assert all(r["op"] == "d" and r["before_text"] is not None for r in out)


def test_ttl_refresh_chain_no_expiry():
    ttl = 10 * US
    log = _log([("c1", 0, f"t{i}", i * 5, i) for i in range(5)])  # 0,5,10,15,20
    # every write refreshed within ttl; last write (t=20) expires at 30 > horizon 20
    assert ttl_delete_events(log, ttl, 20 * US).num_rows == 0
    # extend horizon: only the final write expires
    out = ttl_delete_events(log, ttl, 30 * US).to_pylist()
    assert [(r["seq"], r["expire_ts_us"]) for r in out] == [(4, 30 * US)]


def test_headers_placement():
    from scylla_cdc_source_connector_ray.config import EngineConfig, PkPlacement
    from scylla_cdc_source_connector_ray.stages.envelope import build_envelope
    from scylla_cdc_source_connector_ray.stages.op_derive import derive_ops

    log = _log([("c1", 3, "a", 0, 1), ("c2", 4, None, 1, 2)])
    cfg = EngineConfig(
        num_shards=4, pk_placements=(PkPlacement.KAFKA_KEY, PkPlacement.HEADERS)
    )
    env = build_envelope(derive_ops(log), cfg)
    hdr = env["headers"].combine_chunks()
    import pyarrow.compute as pc

    assert pc.struct_field(hdr, "pk.conv_id").to_pylist() == ["c1", "c2"]
    assert pc.struct_field(hdr, "ck.turn_idx").to_pylist() == [3, 4]
    # without the placement, no headers column
    env2 = build_envelope(derive_ops(log), EngineConfig(num_shards=4))
    assert "headers" not in env2.column_names
