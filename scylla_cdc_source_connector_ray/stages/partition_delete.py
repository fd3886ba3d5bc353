"""Partition-delete (conversation-tombstone) semantics — reference M2.

The reference emits partition-delete records when a whole Scylla partition is
deleted (``ScyllaChangesConsumer.java:271-283``; partition deletes surface on
ck-less keys, ``README.md:1290-1341``). The transcript analogue: a CDC log row
with ``turn_idx IS NULL`` is a *conversation tombstone* — at its ``(ts, seq)``
point the whole conversation is dropped.

Semantics (the spec the SQL oracle mirrors):

* the tombstone itself is emitted as one ``op='pd'`` record with key
  ``(conv_id, NULL)`` — the reference's single partition-delete record;
* **expansion** (engine capability beyond the reference, possible because we
  hold per-key state): every key of the conversation that is *live* at the
  tombstone point (its last prior event is not a row delete and not already
  wiped by an earlier conversation tombstone) additionally gets a synthetic
  ``op='d'`` event with ``before`` = its last state, ``after`` = NULL,
  ``seq`` = the tombstone's seq;
* rows arriving *after* a conversation tombstone see a wiped state: their
  ``before`` image is NULL (op classification is unchanged — ``'c'`` only for
  the first row of a key ever, matching how a row-tombstone also leaves op
  ``'u'`` for a later re-insert);
* compaction drops every key whose last event precedes the conversation's
  final tombstone.

All kernels are vectorized (numpy segmented scans over the time-ordered
block + the proven :func:`..stages.op_derive.derive_ops` state machine);
the caller co-locates whole conversations per block exactly as for capture.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import SEQ_COL, VALUE_COLS
from .op_derive import AFTER_PREFIX, BEFORE_PREFIX, _mask_to_null, derive_ops

#: output columns of the flattened pd-aware capture stream
_FLAT_COLS = (
    "conv_id",
    "turn_idx",
    "op",
    *(BEFORE_PREFIX + c for c in VALUE_COLS),
    *(AFTER_PREFIX + c for c in VALUE_COLS),
    SEQ_COL,
)


def _empty_flat() -> pa.Table:
    types = {
        "conv_id": pa.string(),
        "turn_idx": pa.int32(),
        "op": pa.string(),
        SEQ_COL: pa.int64(),
    }
    for c in VALUE_COLS:
        t = pa.timestamp("us") if c == "ts" else pa.string()
        types[BEFORE_PREFIX + c] = t
        types[AFTER_PREFIX + c] = t
    return pa.table({name: pa.nulls(0, types[name]) for name in _FLAT_COLS})


_IN_TYPES = {
    "conv_id": pa.string(),
    "turn_idx": pa.int32(),
    "role": pa.string(),
    "text": pa.string(),
    "tool": pa.string(),
    "ts": pa.timestamp("us"),
    SEQ_COL: pa.int64(),
}


def _canonical(tbl: pa.Table) -> pa.Table:
    """Pin known column types (polars-backed sort exchanges rewrite
    string→large_string per worker, which would poison the concat of the
    three output tables); pass every other column through unchanged."""
    cols = {}
    for name in tbl.column_names:
        col = tbl[name].combine_chunks()
        want = _IN_TYPES.get(name)
        if want is not None and col.type != want:
            col = col.cast(want)
        elif want is None and pa.types.is_large_string(col.type):
            col = col.cast(pa.string())
        cols[name] = col
    return pa.table(cols)


def _time_frame(tbl: pa.Table, arrival: np.ndarray | None = None):
    """Sort the block into per-conversation timeline order and compute the
    segmented partition-delete scans.

    The timeline is ``(ts, seq)`` for the batch semantics, or the runner's
    seed-first fold order ``(arrival, ts, seq)`` when ``arrival`` is given —
    a conversation tombstone then applies to everything folded before it.

    Returns (perm, is_pd, last_pd_pos, next_pd_pos) where positions index the
    ordered frame; ``last_pd_pos[i]`` is the position of the latest
    conversation tombstone strictly before row ``i`` in the same conversation
    (-1 if none), ``next_pd_pos[i]`` the earliest one strictly after (n if
    none).
    """
    n = tbl.num_rows
    conv_codes = (
        tbl["conv_id"].combine_chunks().dictionary_encode().indices.to_numpy(zero_copy_only=False)
    )
    ts = tbl["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    seq = tbl[SEQ_COL].combine_chunks().to_numpy(zero_copy_only=False)
    if arrival is not None:
        perm = np.lexsort((seq, ts, arrival, conv_codes))
    else:
        perm = np.lexsort((seq, ts, conv_codes))

    cc = conv_codes[perm]
    first = np.empty(n, dtype=bool)
    first[0] = True
    np.not_equal(cc[1:], cc[:-1], out=first[1:])
    pos = np.arange(n, dtype=np.int64)
    conv_start = np.maximum.accumulate(np.where(first, pos, 0))

    is_pd = pc.is_null(tbl["turn_idx"]).combine_chunks().to_numpy(zero_copy_only=False)[perm]

    # last tombstone at-or-before each position, clipped to the conversation;
    # for non-tombstone rows this is "strictly before" (they are never pd)
    last_pd = np.maximum.accumulate(np.where(is_pd, pos, -1))
    last_pd = np.where(last_pd >= conv_start, last_pd, -1)

    # next tombstone at-or-after, via the reversed scan
    last_of_conv = np.empty(n, dtype=bool)
    last_of_conv[-1] = True
    last_of_conv[:-1] = first[1:]
    conv_end = np.flip(np.minimum.accumulate(np.flip(np.where(last_of_conv, pos, n))))
    next_pd = np.flip(np.minimum.accumulate(np.flip(np.where(is_pd, pos, n))))
    next_pd = np.where(next_pd <= conv_end, next_pd, n)
    return perm, is_pd, last_pd, next_pd


def derive_flat_pd(
    tbl: pa.Table,
    value_cols: tuple[str, ...] = VALUE_COLS,
    arrival_col: str | None = None,
    full: bool = False,
) -> pa.Table:
    """One co-located block (with conv-tombstone rows) → flattened pd-aware
    capture rows: normal events with wiped before-images, synthetic expansion
    deletes, and the ``'pd'`` marker records.

    ``arrival_col``: runner fold-order column (seed-first) — tombstones then
    apply to everything folded before them, matching the streaming state
    machine. ``full``: additionally emit ``ts``, ``modified_cols`` and
    ``_foldpos`` (the row's position in the conversation timeline; expansion
    deletes carry their tombstone's position) for the runner's state fold.
    """
    out_cols = (
        "conv_id",
        "turn_idx",
        "op",
        *(BEFORE_PREFIX + c for c in value_cols),
        *(AFTER_PREFIX + c for c in value_cols),
        SEQ_COL,
        *(("ts", "modified_cols", "_foldpos") if full else ()),
    )
    if tbl.num_rows == 0:
        base = _empty_flat()
        if full or tuple(value_cols) != VALUE_COLS:
            cols = {}
            for name in out_cols:
                if name in base.column_names:
                    cols[name] = base[name]
                elif name == "modified_cols":
                    cols[name] = pa.nulls(0, pa.string())
                elif name == "_foldpos":
                    cols[name] = pa.nulls(0, pa.int64())
                elif name == "ts":
                    cols[name] = pa.nulls(0, pa.timestamp("us"))
                else:  # evolved/extra value column: type from the input
                    vc = name.removeprefix(BEFORE_PREFIX).removeprefix(AFTER_PREFIX)
                    cols[name] = pa.nulls(0, tbl.schema.field(vc).type if vc in tbl.column_names else pa.string())
            return pa.table(cols)
        return base
    tbl = _canonical(tbl)
    n = tbl.num_rows
    arrival = (
        tbl[arrival_col].combine_chunks().to_numpy(zero_copy_only=False)
        if arrival_col is not None
        else None
    )
    perm, is_pd, last_pd, next_pd = _time_frame(tbl, arrival)
    ordered = tbl.take(pa.array(perm))
    seq_t = ordered[SEQ_COL].combine_chunks().to_numpy(zero_copy_only=False)
    ts_t = ordered["ts"].combine_chunks()
    text_valid_t = pc.is_valid(ordered["text"]).combine_chunks().to_numpy(zero_copy_only=False)

    # --- per-key prev/next positions among the normal rows -----------------
    sub = np.flatnonzero(~is_pd)  # timeline positions of normal rows
    cc = (
        ordered["conv_id"]
        .combine_chunks()
        .dictionary_encode()
        .indices.to_numpy(zero_copy_only=False)[sub]
    )
    turn = (
        pc.fill_null(ordered["turn_idx"].combine_chunks(), -1).to_numpy(zero_copy_only=False)[sub]
    )
    # within a key, timeline order == position order by construction
    korder = np.lexsort((sub, turn, cc))
    kpos = sub[korder]
    m = len(kpos)
    kfirst = np.empty(m, dtype=bool)
    klast = np.empty(m, dtype=bool)
    if m:
        kfirst[0] = True
        same = (cc[korder][1:] == cc[korder][:-1]) & (turn[korder][1:] == turn[korder][:-1])
        np.logical_not(same, out=kfirst[1:])
        klast[-1] = True
        np.logical_not(same, out=klast[:-1])
    prev_pos = np.concatenate(([np.int64(-1)], kpos[:-1])) if m else kpos
    prev_pos = np.where(kfirst, -1, prev_pos)
    next_pos = np.concatenate((kpos[1:], [np.int64(n)])) if m else kpos
    next_pos = np.where(klast, n, next_pos)

    # flags per normal row, POSITIONALLY aligned with the key order (seq is
    # not unique in runner blocks — state seeds all carry seq=-1)
    d_wiped = (prev_pos >= 0) & (last_pd[kpos] > prev_pos)
    d_emit = text_valid_t[kpos] & (next_pd[kpos] < n) & (next_pos > next_pd[kpos])
    marker_pos = np.minimum(next_pd[kpos], n - 1)
    d_del_seq = np.where(d_emit, seq_t[marker_pos], 0)

    # --- base state machine over the normal rows (fed in key order, which
    # within a key IS the timeline order), then apply the wipes -------------
    normal_sorted = ordered.take(pa.array(kpos))
    derived = derive_ops(normal_sorted, sorted_input=True, value_cols=value_cols)

    cols: dict[str, pa.Array] = {
        "conv_id": derived["conv_id"].combine_chunks(),
        "turn_idx": derived["turn_idx"].combine_chunks(),
        "op": derived["op"].combine_chunks(),
    }
    for c in value_cols:
        cols[BEFORE_PREFIX + c] = _mask_to_null(
            derived[BEFORE_PREFIX + c].combine_chunks(), d_wiped
        )
        cols[AFTER_PREFIX + c] = derived[AFTER_PREFIX + c].combine_chunks()
    cols[SEQ_COL] = derived[SEQ_COL].combine_chunks()
    if full:
        cols["ts"] = derived["ts"].combine_chunks()
        # recompute modified_cols against the WIPED before image
        cols["modified_cols"] = _modified_from(cols, value_cols)
        cols["_foldpos"] = pa.array(kpos, pa.int64())
    normal_out = pa.table({name: cols[name] for name in out_cols})

    # --- synthetic expansion deletes: before = the row's after state -------
    sel = pa.array(d_emit)
    n_exp = int(d_emit.sum())
    exp_cols: dict[str, pa.Array] = {
        "conv_id": cols["conv_id"].filter(sel),
        "turn_idx": cols["turn_idx"].filter(sel),
        "op": pa.array(["d"] * n_exp, pa.string()),
        SEQ_COL: pa.array(d_del_seq[d_emit], pa.int64()),
    }
    for c in value_cols:
        after = cols[AFTER_PREFIX + c].filter(sel)
        exp_cols[BEFORE_PREFIX + c] = after
        exp_cols[AFTER_PREFIX + c] = pa.nulls(len(after), after.type)
    if full:
        exp_cols["ts"] = ts_t.take(pa.array(marker_pos[d_emit]))
        exp_cols["modified_cols"] = _modified_from(exp_cols, value_cols)
        exp_cols["_foldpos"] = pa.array(next_pd[kpos][d_emit], pa.int64())
    expanded = pa.table({name: exp_cols[name] for name in out_cols})

    # --- the 'pd' marker records -------------------------------------------
    pd_rows = ordered.filter(pa.array(is_pd))
    k = pd_rows.num_rows
    mk_cols: dict[str, pa.Array] = {
        "conv_id": pd_rows["conv_id"].combine_chunks(),
        "turn_idx": pa.nulls(k, pa.int32()),
        "op": pa.array(["pd"] * k, pa.string()),
        SEQ_COL: pd_rows[SEQ_COL].combine_chunks(),
    }
    for c in value_cols:
        t = tbl.schema.field(c).type
        mk_cols[BEFORE_PREFIX + c] = pa.nulls(k, t)
        mk_cols[AFTER_PREFIX + c] = pa.nulls(k, t)
    if full:
        mk_cols["ts"] = pd_rows["ts"].combine_chunks()
        mk_cols["modified_cols"] = pa.array([""] * k, pa.string())
        mk_cols["_foldpos"] = pa.array(np.flatnonzero(is_pd), pa.int64())
    markers = pa.table({name: mk_cols[name] for name in out_cols})

    return pa.concat_tables([normal_out, expanded, markers])


def _modified_from(cols: dict, value_cols: tuple[str, ...]) -> pa.Array:
    """modified_cols recomputed from (possibly wiped) before/after images —
    comma-joined sorted payload column names, same combo-lookup vectorization
    as derive_ops."""
    from .op_derive import _values_neq

    payload = sorted(c for c in value_cols if c != "ts")
    n = len(cols["op"])
    combo = np.zeros(n, dtype=np.int64)
    for bit, vc in enumerate(payload):
        neq = _values_neq(cols[AFTER_PREFIX + vc], cols[BEFORE_PREFIX + vc])
        combo |= neq.to_numpy(zero_copy_only=False).astype(np.int64) << bit
    lookup = np.array(
        [",".join(nm for b, nm in enumerate(payload) if i & (1 << b)) for i in range(1 << len(payload))],
        dtype=object,
    )
    return pa.array(lookup[combo], type=pa.string())


def compact_pd(tbl: pa.Table) -> pa.Table:
    """Materialized current state honouring conversation tombstones: the last
    row per key survives iff it is not a row delete and not wiped by the
    conversation's final tombstone."""
    empty = pa.table(
        {
            "conv_id": pa.nulls(0, pa.string()),
            "turn_idx": pa.nulls(0, pa.int32()),
            "role": pa.nulls(0, pa.string()),
            "text": pa.nulls(0, pa.string()),
            "tool": pa.nulls(0, pa.string()),
            "ts_us": pa.nulls(0, pa.int64()),
        }
    )
    if tbl.num_rows == 0:
        return empty
    tbl = _canonical(tbl)
    n = tbl.num_rows
    perm, is_pd, last_pd, next_pd = _time_frame(tbl)
    ordered = tbl.take(pa.array(perm))
    text_valid_t = pc.is_valid(ordered["text"]).combine_chunks().to_numpy(zero_copy_only=False)

    sub = np.flatnonzero(~is_pd)
    cc = (
        ordered["conv_id"]
        .combine_chunks()
        .dictionary_encode()
        .indices.to_numpy(zero_copy_only=False)[sub]
    )
    turn = pc.fill_null(ordered["turn_idx"].combine_chunks(), -1).to_numpy(zero_copy_only=False)[
        sub
    ]
    korder = np.lexsort((sub, turn, cc))
    kpos = sub[korder]
    m = len(kpos)
    if m == 0:
        return empty
    klast = np.empty(m, dtype=bool)
    klast[-1] = True
    same = (cc[korder][1:] == cc[korder][:-1]) & (turn[korder][1:] == turn[korder][:-1])
    np.logical_not(same, out=klast[:-1])
    # last row of its key, live text, and no conversation tombstone after it
    keep_pos = kpos[klast & text_valid_t[kpos] & (next_pd[kpos] >= n)]
    live = ordered.take(pa.array(np.sort(keep_pos)))
    return pa.table(
        {
            "conv_id": live["conv_id"],
            "turn_idx": live["turn_idx"],
            "role": live["role"],
            "text": live["text"],
            "tool": live["tool"],
            "ts_us": live["ts"].combine_chunks().cast(pa.int64()),
        }
    )
