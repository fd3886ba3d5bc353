"""Deterministic ``events`` → transcript-CDC-log adapter.

The driver's correctness gate compares Ray pipelines against DuckDB SQL over
the pre-registered testdata views. There is no transcripts view, so both sides
derive the transcript CDC log from the ``events`` table with THIS mapping —
pure column arithmetic, so Ray (Arrow kernels) and DuckDB (SQL CTE) produce
byte-identical inputs:

    conv_id  = 'conv' || user_id
    turn_idx = int32(event_id % 20)        -- re-used keys ⇒ updates
    role     = click→user, view→assistant, purchase→tool,
               signup→system, error→'__tombstone__'
    text     = NULL when event_type='error' (tombstone ⇒ delete), else props
    tool     = 'search' when event_type='purchase' else NULL
    ts       = ts
    seq      = event_id                    -- arrival order

``error`` events therefore act as DELETE tombstones, ``purchase`` as
tool-call turns, everything else as ordinary turns.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..schema import SEQ_COL

_EVENT_TYPES = pa.array(["click", "view", "purchase", "signup", "error"])
_ROLE_FOR = pa.array(["user", "assistant", "tool", "system", "__tombstone__"])

#: SQL CTE body — prefix oracle queries with ``WITH transcripts AS ({TRANSCRIPTS_SQL})``.
TRANSCRIPTS_SQL = """
    SELECT
        'conv' || CAST(user_id AS VARCHAR)            AS conv_id,
        CAST(event_id % 20 AS INTEGER)                AS turn_idx,
        CASE event_type
            WHEN 'click' THEN 'user'
            WHEN 'view' THEN 'assistant'
            WHEN 'purchase' THEN 'tool'
            WHEN 'signup' THEN 'system'
            ELSE '__tombstone__'
        END                                           AS role,
        CASE WHEN event_type = 'error' THEN NULL ELSE props END AS text,
        CASE WHEN event_type = 'purchase' THEN 'search' ELSE NULL END AS tool,
        ts                                            AS ts,
        event_id                                      AS seq
    FROM events
"""


def events_to_transcripts(batch: pa.Table) -> pa.Table:
    """Vectorized Arrow implementation of :data:`TRANSCRIPTS_SQL`.

    Use as ``ray.data.read_parquet(events).map_batches(events_to_transcripts,
    batch_format="pyarrow")``.
    """
    et = batch["event_type"]
    idx = pc.index_in(et, value_set=_EVENT_TYPES)
    role = pc.take(_ROLE_FOR, idx)
    is_err = pc.equal(et, "error")
    is_buy = pc.equal(et, "purchase")
    n = batch.num_rows
    return pa.table(
        {
            "conv_id": pc.binary_join_element_wise(
                pa.array(["conv"] * n, type=pa.string()),
                batch["user_id"].cast(pa.string()),
                "",
            ),
            "turn_idx": pa.array(
                (batch["event_id"].to_numpy(zero_copy_only=False) % 20).astype("int32")
            ),
            "role": role,
            "text": pc.if_else(is_err, pa.nulls(n, pa.string()), batch["props"]),
            "tool": pc.if_else(is_buy, pa.scalar("search"), pa.nulls(n, pa.string())),
            "ts": batch["ts"],
            SEQ_COL: batch["event_id"].cast(pa.int64()),
        }
    )
