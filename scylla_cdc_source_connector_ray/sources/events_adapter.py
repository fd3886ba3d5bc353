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


def events_to_transcripts(batch: pa.Table, columns: list[str] | None = None) -> pa.Table:
    """Vectorized Arrow implementation of :data:`TRANSCRIPTS_SQL`.

    ``columns`` restricts the output (and the work) to the requested
    transcript columns — pair with a pruned events read.
    """
    n = batch.num_rows
    want = columns or ["conv_id", "turn_idx", "role", "text", "tool", "ts", SEQ_COL]
    cols: dict[str, object] = {}
    if "conv_id" in want:
        cols["conv_id"] = pc.binary_join_element_wise(
            pa.array(["conv"] * n, type=pa.string()),
            batch["user_id"].cast(pa.string()),
            "",
        )
    if "turn_idx" in want:
        cols["turn_idx"] = pa.array(
            (batch["event_id"].to_numpy(zero_copy_only=False) % 20).astype("int32")
        )
    if "role" in want:
        idx = pc.index_in(batch["event_type"], value_set=_EVENT_TYPES)
        cols["role"] = pc.take(_ROLE_FOR, idx)
    if "text" in want:
        is_err = pc.equal(batch["event_type"], "error")
        cols["text"] = pc.if_else(is_err, pa.nulls(n, pa.string()), batch["props"])
    if "tool" in want:
        is_buy = pc.equal(batch["event_type"], "purchase")
        cols["tool"] = pc.if_else(is_buy, pa.scalar("search"), pa.nulls(n, pa.string()))
    if "tags" in want:
        cols["tags"] = _tags_col(batch)
    if "attrs" in want:
        cols["attrs"] = _attrs_col(batch)
    if "meta" in want:
        cols["meta"] = _meta_col(batch)
    if "pair" in want:
        cols["pair"] = _pair_col(batch)
    if "ts" in want:
        # normalize the storage unit: every downstream µs-epoch computation
        # (windows, watermarks, gaps) assumes timestamp[us] — an ns-stored
        # parquet would silently yield 1000× window numbers otherwise
        cols["ts"] = batch["ts"].cast(pa.timestamp("us"))
    if SEQ_COL in want:
        cols[SEQ_COL] = batch["event_id"].cast(pa.int64())
    return pa.table(cols)


#: every ``event_id % PD_MOD == 0`` event becomes a conversation tombstone
#: (partition-delete marker, reference M2) in the pd-variant log
PD_MOD = 97

#: pd-variant transcripts CTE: same mapping, but marker events carry
#: ``turn_idx IS NULL`` and NULL values — the conv-tombstone encoding
#: :mod:`..stages.partition_delete` consumes.
TRANSCRIPTS_PD_SQL = f"""
    SELECT
        'conv' || CAST(user_id AS VARCHAR)            AS conv_id,
        CASE WHEN event_id % {PD_MOD} = 0 THEN NULL
             ELSE CAST(event_id % 20 AS INTEGER) END  AS turn_idx,
        CASE WHEN event_id % {PD_MOD} = 0 THEN NULL
             WHEN event_type = 'click' THEN 'user'
             WHEN event_type = 'view' THEN 'assistant'
             WHEN event_type = 'purchase' THEN 'tool'
             WHEN event_type = 'signup' THEN 'system'
             ELSE '__tombstone__'
        END                                           AS role,
        CASE WHEN event_id % {PD_MOD} = 0 OR event_type = 'error'
             THEN NULL ELSE props END                 AS text,
        CASE WHEN event_id % {PD_MOD} = 0 THEN NULL
             WHEN event_type = 'purchase' THEN 'search' ELSE NULL END AS tool,
        ts                                            AS ts,
        event_id                                      AS seq
    FROM events
"""


def events_to_transcripts_pd(batch: pa.Table) -> pa.Table:
    """Vectorized :data:`TRANSCRIPTS_PD_SQL`: the plain mapping with marker
    events (``event_id % PD_MOD == 0``) turned into conversation tombstones."""
    out = events_to_transcripts(batch)
    eid = batch["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
    mask = (eid % PD_MOD) == 0
    from ..stages.op_derive import _mask_to_null

    cols = {name: out[name].combine_chunks() for name in out.column_names}
    for c in ("turn_idx", "role", "text", "tool"):
        cols[c] = _mask_to_null(cols[c], mask)
    return pa.table(cols)


def _tags_col(batch: pa.Table) -> pa.Array:
    """``list<string>`` value column (M8 collection widening), three distinct
    states by construction: NULL (tombstone), [] (value < 1), 1-2 elements.

        tags = NULL                  when event_type = 'error'
             = []                    when value < 1
             = [event_type, 'high']  when value >= 10
             = [event_type]          otherwise
    """
    import numpy as np

    et = batch["event_type"].combine_chunks().to_numpy(zero_copy_only=False)
    val = batch["value"].combine_chunks().to_numpy(zero_copy_only=False)
    err = et == "error"
    counts = np.where(err | (val < 1), 0, np.where(val >= 10, 2, 1))
    offsets = np.zeros(len(et) + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    values: list[str] = []
    for e, c in zip(et, counts):
        if c >= 1:
            values.append(e)
        if c == 2:
            values.append("high")
    return pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(values, pa.string()), mask=pa.array(err)
    )


def _attrs_col(batch: pa.Table) -> pa.Array:
    """``map<int64, string>`` value column as the reference emits maps — an
    array of {key, value} structs in key order with NON-string keys
    (``ScyllaSchema.java:340-389``). Three distinct states by construction:

        attrs = NULL                            when event_type = 'error'
              = {}                              when value < 1
              = {0: event_type}                 when 1 <= value < 10
              = {0: event_type, 7: 'high'}      when value >= 10
    """
    import numpy as np

    et = batch["event_type"].combine_chunks().to_numpy(zero_copy_only=False)
    val = batch["value"].combine_chunks().to_numpy(zero_copy_only=False)
    err = et == "error"
    counts = np.where(err | (val < 1), 0, np.where(val >= 10, 2, 1))
    offsets = np.zeros(len(et) + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    keys: list[int] = []
    values: list[str] = []
    for e, c in zip(et, counts):
        if c >= 1:
            keys.append(0)
            values.append(e)
        if c == 2:
            keys.append(7)
            values.append("high")
    entries = pa.StructArray.from_arrays(
        [pa.array(keys, pa.int64()), pa.array(values, pa.string())], names=["key", "value"]
    )
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), entries, mask=pa.array(err))


def _meta_col(batch: pa.Table) -> pa.Array:
    """``struct<k int64, src string>`` value column (M8 UDT analogue):
    NULL struct on tombstone, else k = first digit-run of props, src = the
    event type."""
    et = batch["event_type"].combine_chunks()
    err = pc.equal(et, "error")
    k = pc.struct_field(
        pc.extract_regex(batch["props"].combine_chunks(), r"(?P<d>[0-9]+)"), "d"
    ).cast(pa.int64())
    return pa.StructArray.from_arrays([k, et], names=["k", "src"], mask=err)


# ---------------------------------------------------------------------------
# Element-op log (non-frozen collection deltas, reference M8 tail)
# ---------------------------------------------------------------------------

#: element-op kind mapping (deterministic from event_id):
#:   wipe   when event_id % 11 == 0      (collection overwrite, cdc$deleted_<col>)
#:   remove when event_id %  7 == 0      (cdc$deleted_elements_<col>)
#:   none   when event_id %  5 == 3      (row doesn't touch the collection)
#:   add    otherwise                    (new cells; 2 cells when value >= 10)
ELEMENT_OPS_SQL = """
    SELECT
        'conv' || CAST(user_id AS VARCHAR)            AS conv_id,
        CAST(event_id % 20 AS INTEGER)                AS turn_idx,
        ts                                            AS ts,
        event_id                                      AS seq,
        CASE WHEN event_id % 11 = 0 THEN 'wipe'
             WHEN event_id % 7 = 0 THEN 'remove'
             WHEN event_id % 5 = 3 THEN 'none'
             ELSE 'add' END                           AS kind,
        event_type, value
    FROM events
"""


def events_to_element_log(batch: pa.Table) -> pa.Table:
    """Vectorized :data:`ELEMENT_OPS_SQL` plus the element lists:

    * add rows:  ``add_elems = [event_type, 'high' if value >= 10]``
    * wipe rows: ``add_elems = [event_type]`` (overwrite: clear + set)
    * remove rows: ``rem_elems = [event_type]``
    """
    import numpy as np

    n = batch.num_rows
    eid = batch["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
    et = batch["event_type"].combine_chunks().to_numpy(zero_copy_only=False)
    val = batch["value"].combine_chunks().to_numpy(zero_copy_only=False)
    kind = np.where(
        eid % 11 == 0, "wipe", np.where(eid % 7 == 0, "remove", np.where(eid % 5 == 3, "none", "add"))
    )
    add_counts = np.where(
        kind == "add", np.where(val >= 10, 2, 1), np.where(kind == "wipe", 1, 0)
    ).astype(np.int64)
    add_off = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(add_counts, out=add_off[1:])
    # rows with 2 cells carry [event_type, 'high']: cell values built from
    # the position of each cell within its row, fully vectorized
    row_of_cell = np.repeat(np.arange(n), add_counts)
    pos_in_row = np.arange(len(row_of_cell)) - np.repeat(add_off[:-1], add_counts)
    cell_vals = np.where(pos_in_row == 0, et[row_of_cell], "high")
    add_elems = pa.ListArray.from_arrays(
        pa.array(add_off, pa.int32()), pa.array(cell_vals, pa.string())
    )
    rem_counts = (kind == "remove").astype(np.int64)
    rem_off = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(rem_counts, out=rem_off[1:])
    rem_elems = pa.ListArray.from_arrays(
        pa.array(rem_off, pa.int32()), pa.array(et[kind == "remove"], pa.string())
    )
    return pa.table(
        {
            "conv_id": pc.binary_join_element_wise(
                pa.array(["conv"] * n, pa.string()), batch["user_id"].cast(pa.string()), ""
            ),
            "turn_idx": pa.array((eid % 20).astype("int32")),
            "ts": batch["ts"],
            SEQ_COL: pa.array(eid, pa.int64()),
            "kind": pa.array(kind, pa.string()),
            "add_elems": add_elems,
            "rem_elems": rem_elems,
        }
    )


def _pair_col(batch: pa.Table) -> pa.Array:
    """``tuple<int64, string>`` value column (M8 tuple widening,
    ``ScyllaChangeRecordEmitter.java:749-764``): struct<field_0, field_1>
    with FOUR distinct states by construction:

        pair = NULL                          when event_type = 'error'
                                             or 5 <= value < 10
             = (NULL, NULL)                  when value < 1   (all-NULL tuple
                                             — a VALUE, unlike a UDT)
             = (floor(value), event_type)    otherwise
    """
    import numpy as np

    et = batch["event_type"].combine_chunks()
    val = batch["value"].combine_chunks().to_numpy(zero_copy_only=False)
    err = pc.equal(et, "error").to_numpy(zero_copy_only=False)
    # NULL value (NaN after to_numpy) must mean pair = NULL, mirroring the
    # oracle's CASE ... THEN TRUE ELSE FALSE (NULL condition -> FALSE); a
    # bare comparison would leave nullpair False and floor(NaN) garbage f0
    isnull = np.isnan(val) if val.dtype.kind == "f" else np.zeros(len(val), bool)
    nullpair = err | isnull | ((val >= 5) & (val < 10))
    fieldnull = (val < 1) | isnull
    f0 = pa.array(
        np.floor(np.where(isnull, 0.0, val)).astype("int64"), mask=fieldnull
    )
    from ..stages.op_derive import _mask_to_null

    f1 = _mask_to_null(et, fieldnull)
    return pa.StructArray.from_arrays([f0, f1], names=["field_0", "field_1"], mask=pa.array(nullpair))


#: map element-op kind mapping — same rule as ELEMENT_OPS_SQL; entry values
#: derive from floor(value) so both sides compute identical strings
MAP_ELEMENT_OPS_SQL = """
    SELECT
        'conv' || CAST(user_id AS VARCHAR)            AS conv_id,
        CAST(event_id % 20 AS INTEGER)                AS turn_idx,
        ts                                            AS ts,
        event_id                                      AS seq,
        CASE WHEN event_id % 11 = 0 THEN 'wipe'
             WHEN event_id % 7 = 0 THEN 'remove'
             WHEN event_id % 5 = 3 THEN 'none'
             ELSE 'add' END                           AS kind,
        event_type,
        CAST(CAST(floor(value) AS BIGINT) AS VARCHAR) AS entry_val,
        value
    FROM events
"""


def events_to_map_element_log(batch: pa.Table) -> pa.Table:
    """Vectorized :data:`MAP_ELEMENT_OPS_SQL` plus the entry lists:

    * add rows:  upsert ``{event_type: floor(value)}`` (+ ``{xtra: high}``
      when value >= 10)
    * wipe rows: clear, then ``{event_type: floor(value)}``
    * remove rows: delete key ``event_type``
    """
    import numpy as np

    n = batch.num_rows
    eid = batch["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
    et = batch["event_type"].combine_chunks().to_numpy(zero_copy_only=False)
    val = batch["value"].combine_chunks().to_numpy(zero_copy_only=False)
    kind = np.where(
        eid % 11 == 0, "wipe", np.where(eid % 7 == 0, "remove", np.where(eid % 5 == 3, "none", "add"))
    )
    vstr = np.floor(val).astype("int64").astype(str)
    add_counts = np.where(
        kind == "add", np.where(val >= 10, 2, 1), np.where(kind == "wipe", 1, 0)
    ).astype(np.int64)
    add_off = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(add_counts, out=add_off[1:])
    row_of_cell = np.repeat(np.arange(n), add_counts)
    pos_in_row = np.arange(len(row_of_cell)) - np.repeat(add_off[:-1], add_counts)
    add_keys = np.where(pos_in_row == 0, et[row_of_cell], "xtra")
    add_vals = np.where(pos_in_row == 0, vstr[row_of_cell], "high")
    rem_counts = (kind == "remove").astype(np.int64)
    rem_off = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(rem_counts, out=rem_off[1:])
    off32 = pa.array(add_off, pa.int32())
    return pa.table(
        {
            "conv_id": pc.binary_join_element_wise(
                pa.array(["conv"] * n, pa.string()), batch["user_id"].cast(pa.string()), ""
            ),
            "turn_idx": pa.array((eid % 20).astype("int32")),
            "ts": batch["ts"],
            SEQ_COL: pa.array(eid, pa.int64()),
            "kind": pa.array(kind, pa.string()),
            "add_keys": pa.ListArray.from_arrays(off32, pa.array(add_keys, pa.string())),
            "add_vals": pa.ListArray.from_arrays(off32, pa.array(add_vals, pa.string())),
            "rem_keys": pa.ListArray.from_arrays(
                pa.array(rem_off, pa.int32()), pa.array(et[kind == "remove"], pa.string())
            ),
        }
    )
