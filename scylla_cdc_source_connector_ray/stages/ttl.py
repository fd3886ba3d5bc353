"""Per-row TTL delete synthesis — reference M2/TTL semantics
(``CdcPerRowTtlDeleteIT.java:121-218``): a row written at ``t`` with TTL
expires at ``t + ttl`` unless a later write for the same key lands first; the
expiry surfaces as a delete event with ``before`` = the expiring state.

Batch semantics over a complete log: an expiry materializes only inside the
observed timespan (``t + ttl <= max(ts)`` over the whole log) — the horizon is
computed once by the caller (one column-pruned aggregate) and broadcast, so
the per-shard kernel stays a pure vectorized lead-scan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import SEQ_COL


def ttl_delete_events(tbl: pa.Table, ttl_us: int, horizon_us: int) -> pa.Table:
    """One co-located block → its TTL delete events: non-tombstone rows whose
    next same-key event is absent or later than ``t + ttl``, with
    ``t + ttl`` inside the log's timespan."""
    empty = pa.table(
        {
            "conv_id": pa.nulls(0, pa.string()),
            "turn_idx": pa.nulls(0, pa.int32()),
            "op": pa.nulls(0, pa.string()),
            "before_role": pa.nulls(0, pa.string()),
            "before_text": pa.nulls(0, pa.string()),
            "before_tool": pa.nulls(0, pa.string()),
            "before_ts": pa.nulls(0, pa.timestamp("us")),
            "expire_ts_us": pa.nulls(0, pa.int64()),
            SEQ_COL: pa.nulls(0, pa.int64()),
        }
    )
    if tbl.num_rows == 0:
        return empty
    tbl = tbl.sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending"), ("ts", "ascending"), (SEQ_COL, "ascending")]
    )
    n = tbl.num_rows
    conv = tbl["conv_id"].combine_chunks()
    turn = tbl["turn_idx"].combine_chunks()
    ts_us = tbl["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)

    nxt_same = np.zeros(n, dtype=bool)
    if n > 1:
        nxt_same[:-1] = (
            pc.and_(
                pc.equal(conv.slice(0, n - 1), conv.slice(1)),
                pc.equal(turn.slice(0, n - 1), turn.slice(1)),
            )
            .to_numpy(zero_copy_only=False)
        )
    next_ts = np.empty(n, dtype=np.int64)
    next_ts[:-1] = ts_us[1:]
    next_ts[-1] = 0

    expire = ts_us + ttl_us
    live = pc.is_valid(tbl["text"]).to_numpy(zero_copy_only=False)
    emit = live & (expire <= horizon_us) & (~nxt_same | (next_ts > expire))
    if not emit.any():
        return empty
    sel = pa.array(emit)
    rows = tbl.filter(sel)
    k = rows.num_rows
    return pa.table(
        {
            "conv_id": rows["conv_id"].combine_chunks().cast(pa.string()),
            "turn_idx": rows["turn_idx"].combine_chunks().cast(pa.int32()),
            "op": pa.array(["d"] * k, pa.string()),
            "before_role": rows["role"].combine_chunks().cast(pa.string()),
            "before_text": rows["text"].combine_chunks().cast(pa.string()),
            "before_tool": rows["tool"].combine_chunks().cast(pa.string()),
            "before_ts": rows["ts"].combine_chunks(),
            "expire_ts_us": pa.array(expire[emit], pa.int64()),
            SEQ_COL: rows[SEQ_COL].combine_chunks(),
        }
    )
