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
    """Pin input column types: polars-backed sort exchanges rewrite
    string→large_string per worker, which would poison the concat of the
    three output tables."""
    cols = {}
    for name in _IN_TYPES:
        col = tbl[name].combine_chunks()
        if col.type != _IN_TYPES[name]:
            col = col.cast(_IN_TYPES[name])
        cols[name] = col
    return pa.table(cols)


def _time_frame(tbl: pa.Table):
    """Sort the block into per-conversation time order and compute the
    segmented partition-delete scans.

    Returns (perm, is_pd, last_pd_pos, next_pd_pos) where positions index the
    time-ordered frame; ``last_pd_pos[i]`` is the position of the latest
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


def derive_flat_pd(tbl: pa.Table) -> pa.Table:
    """One co-located block (with conv-tombstone rows) → flattened pd-aware
    capture rows: normal events with wiped before-images, synthetic expansion
    deletes, and the ``'pd'`` marker records."""
    if tbl.num_rows == 0:
        return _empty_flat()
    tbl = _canonical(tbl)
    n = tbl.num_rows
    perm, is_pd, last_pd, next_pd = _time_frame(tbl)
    ordered = tbl.take(pa.array(perm))
    seq_t = ordered[SEQ_COL].combine_chunks().to_numpy(zero_copy_only=False)
    text_valid_t = pc.is_valid(ordered["text"]).combine_chunks().to_numpy(zero_copy_only=False)

    # --- per-key prev/next positions among the normal rows -----------------
    sub = np.flatnonzero(~is_pd)  # time positions of normal rows
    cc = (
        ordered["conv_id"]
        .combine_chunks()
        .dictionary_encode()
        .indices.to_numpy(zero_copy_only=False)[sub]
    )
    turn = (
        pc.fill_null(ordered["turn_idx"].combine_chunks(), -1).to_numpy(zero_copy_only=False)[sub]
    )
    # within a key, (ts, seq) order == time order, so position order suffices
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

    # flags per normal row, keyed by its (unique) seq for alignment
    wiped = (prev_pos >= 0) & (last_pd[kpos] > prev_pos)
    emit_del = text_valid_t[kpos] & (next_pd[kpos] < n) & (next_pos > next_pd[kpos])
    del_seq = np.where(emit_del, seq_t[np.minimum(next_pd[kpos], n - 1)], 0)
    flag_seq = seq_t[kpos]
    order = np.argsort(flag_seq)
    flag_seq, wiped, emit_del, del_seq = (
        flag_seq[order],
        wiped[order],
        emit_del[order],
        del_seq[order],
    )

    # --- base state machine over the normal rows, then apply the wipes -----
    normal_tbl = ordered.filter(pa.array(~is_pd))
    derived = derive_ops(normal_tbl)
    dseq = derived[SEQ_COL].combine_chunks().to_numpy(zero_copy_only=False)
    ix = np.searchsorted(flag_seq, dseq)
    d_wiped, d_emit, d_del_seq = wiped[ix], emit_del[ix], del_seq[ix]

    cols: dict[str, pa.Array] = {
        "conv_id": derived["conv_id"].combine_chunks(),
        "turn_idx": derived["turn_idx"].combine_chunks(),
        "op": derived["op"].combine_chunks(),
    }
    for c in VALUE_COLS:
        cols[BEFORE_PREFIX + c] = _mask_to_null(
            derived[BEFORE_PREFIX + c].combine_chunks(), d_wiped
        )
        cols[AFTER_PREFIX + c] = derived[AFTER_PREFIX + c].combine_chunks()
    cols[SEQ_COL] = derived[SEQ_COL].combine_chunks()
    normal_out = pa.table({name: cols[name] for name in _FLAT_COLS})

    # --- synthetic expansion deletes: before = the row's after state -------
    sel = pa.array(d_emit)
    exp_cols: dict[str, pa.Array] = {
        "conv_id": cols["conv_id"].filter(sel),
        "turn_idx": cols["turn_idx"].filter(sel),
        "op": pa.array(["d"] * int(d_emit.sum()), pa.string()),
        SEQ_COL: pa.array(d_del_seq[d_emit], pa.int64()),
    }
    for c in VALUE_COLS:
        after = cols[AFTER_PREFIX + c].filter(sel)
        exp_cols[BEFORE_PREFIX + c] = after
        exp_cols[AFTER_PREFIX + c] = pa.nulls(len(after), after.type)
    expanded = pa.table({name: exp_cols[name] for name in _FLAT_COLS})

    # --- the 'pd' marker records -------------------------------------------
    pd_rows = ordered.filter(pa.array(is_pd))
    k = pd_rows.num_rows
    mk_cols: dict[str, pa.Array] = {
        "conv_id": pd_rows["conv_id"].combine_chunks(),
        "turn_idx": pa.nulls(k, pa.int32()),
        "op": pa.array(["pd"] * k, pa.string()),
        SEQ_COL: pd_rows[SEQ_COL].combine_chunks(),
    }
    for c in VALUE_COLS:
        t = pa.timestamp("us") if c == "ts" else pa.string()
        mk_cols[BEFORE_PREFIX + c] = pa.nulls(k, t)
        mk_cols[AFTER_PREFIX + c] = pa.nulls(k, t)
    markers = pa.table({name: mk_cols[name] for name in _FLAT_COLS})

    return pa.concat_tables([normal_out, expanded, markers])


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
