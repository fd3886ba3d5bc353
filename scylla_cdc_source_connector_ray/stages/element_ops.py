"""Element-level non-frozen collection ops (reference M8 tail).

The reference processes per-element deltas of non-frozen collections: added
cells arrive in the column value keyed by timeuuid, removed elements arrive in
``cdc$deleted_elements_<col>``, and a whole-collection overwrite sets
``cdc$deleted_<col>`` (``ScyllaChangeRecordEmitter.java:683-746`` reorders
live cells by timeuuid on emit; ``:361-398`` counts a column modified when its
value is non-null, its deleted flag is true, OR its deleted_elements set is
non-null; ``ScyllaTypesAllBase.java`` dedicates dozens of scenarios to
add/remove-element transitions).

The transcript-log analogue implemented here: each log row may carry

* ``add_elems``  — elements appended at this row; each becomes a *cell* whose
  timeuuid is ``(ts, seq, position-in-row)``
* ``rem_elems``  — values removed at this row (kills every live cell holding
  one of those values — CQL ``l = l - ['v']`` semantics)
* ``kind = 'wipe'`` — collection overwrite: kills every cell added *before*
  this row (``cdc$deleted_<col> = true``); the row's own ``add_elems`` become
  the new content

and the fold reconstructs, per change row, the post-image (live cells in
timeuuid order) and the lagged pre-image — exactly the merge+reorder the
reference performs per change.

Everything is vectorized: cells live on a contiguous range of the key's
row-ordinals ``[add_row, kill_row)``, so per-event membership is an interval
stab computed with ``np.searchsorted`` over sorted kill candidates and
expanded with the ranges trick — no per-row or per-group Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_INF = np.iinfo(np.int64).max


def _first_of_key(conv: pa.Array, turn: pa.Array, n: int) -> np.ndarray:
    prev_c = pa.concat_arrays([conv.slice(0, 1), conv.slice(0, n - 1)])
    prev_t = pa.concat_arrays([turn.slice(0, 1), turn.slice(0, n - 1)])
    same = pc.and_(pc.equal(conv, prev_c), pc.equal(turn, prev_t))
    first = same.to_numpy(zero_copy_only=False).copy()
    np.logical_not(first, out=first)
    first[0] = True
    return first


def _segmented_next(
    cand_rows: np.ndarray, cand_gid: np.ndarray, q_rows: np.ndarray, q_gid: np.ndarray
) -> np.ndarray:
    """For each query (gid, row): the smallest candidate row > query row with
    the same gid, else _INF. Candidates must be given row-sorted; gids fit in
    int64 alongside rows."""
    out = np.full(len(q_rows), _INF, dtype=np.int64)
    if len(cand_rows) == 0 or len(q_rows) == 0:
        return out
    span = int(max(cand_rows.max(), q_rows.max())) + 2
    ckey = cand_gid.astype(np.int64) * span + cand_rows
    order = np.argsort(ckey, kind="stable")
    ckey = ckey[order]
    crow = cand_rows[order]
    cg = cand_gid[order]
    qkey = q_gid.astype(np.int64) * span + q_rows
    i = np.searchsorted(ckey, qkey, side="right")
    ok = i < len(ckey)
    sel = i[ok]
    same = cg[sel] == q_gid[ok]
    hit = np.flatnonzero(ok)[same]
    out[hit] = crow[sel[same]]
    return out


def fold_element_ops(t: pa.Table, with_final_state: bool = False):
    """One co-located block (all rows of its keys) → per-row element-op
    capture: ``(conv_id, turn_idx, seq, kind, after_csv, n_after, before_csv,
    elems_modified)``. Input columns: conv_id, turn_idx, ts, seq, kind
    (add|remove|wipe|none), add_elems list<string>, rem_elems list<string>.

    List semantics = the shared cell fold with NO overwrite-kill (every add
    is a fresh timeuuid cell, duplicates coexist) and add (timeuuid) order
    on emit."""
    if t.num_rows == 0:
        return (_empty(), _empty_state(False)) if with_final_state else _empty()
    return _fold_keyed_cells(
        t,
        add_col="add_elems",
        vals_col=None,
        rem_col="rem_elems",
        modified_name="elems_modified",
        overwrite_kills=False,
        key_order=False,
        with_final_state=with_final_state,
    )


def _empty() -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.nulls(0, pa.string()),
            "turn_idx": pa.nulls(0, pa.int32()),
            "seq": pa.nulls(0, pa.int64()),
            "kind": pa.nulls(0, pa.string()),
            "after_csv": pa.nulls(0, pa.string()),
            "n_after": pa.nulls(0, pa.int64()),
            "before_csv": pa.nulls(0, pa.string()),
            "elems_modified": pa.nulls(0, pa.bool_()),
        }
    )


def _empty_state(with_vals: bool) -> pa.Table:
    cols = {
        "conv_id": pa.nulls(0, pa.string()),
        "turn_idx": pa.nulls(0, pa.int32()),
        "elems": pa.nulls(0, pa.list_(pa.string())),
    }
    if with_vals:
        cols["vals"] = pa.nulls(0, pa.list_(pa.string()))
    return pa.table(cols)


def _fold_keyed_cells(
    t: pa.Table,
    *,
    add_col: str,
    vals_col: str | None,
    rem_col: str,
    modified_name: str,
    overwrite_kills: bool = True,
    key_order: bool = True,
    with_final_state: bool = False,
) -> pa.Table | tuple[pa.Table, pa.Table]:
    """Shared cell fold behind ALL three element-op variants: each added
    element is a *cell* identified by its (map key | set element | list
    value); ``rem_col`` kills by that identity (``cdc$deleted_elements``),
    ``kind='wipe'`` clears earlier cells, and — when ``overwrite_kills`` —
    adding an existing key OVERWRITES its cell (map upsert; set re-add
    idempotence). Post-images emit live cells in KEY order when
    ``key_order`` (maps/sets cluster by key — reference emitter :719-735)
    else in add (timeuuid) order (non-frozen lists — :683-746). Everything
    is one vectorized interval stab per kill candidate.

    With ``with_final_state`` returns ``(events, state)`` where ``state`` has
    one row per key — ``(conv_id, turn_idx, elems, vals)`` list columns of
    the cells still alive after the key's LAST row, in emission order — the
    carry needed to resume the fold in a later micro-batch (streaming
    element ops)."""
    t = t.sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending"), ("ts", "ascending"), ("seq", "ascending")]
    )
    n = t.num_rows
    conv = t["conv_id"].combine_chunks()
    turn = t["turn_idx"].combine_chunks()
    kind = t["kind"].combine_chunks()
    first = _first_of_key(conv, turn, n)
    kid = np.cumsum(first, dtype=np.int64) - 1
    starts = np.flatnonzero(first)
    ends = np.append(starts[1:], n)

    is_wipe = pc.equal(kind, "wipe").to_numpy(zero_copy_only=False)

    adds = t[add_col].combine_chunks()
    add_lens = pc.list_value_length(adds).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
    cell_row = np.repeat(np.arange(n, dtype=np.int64), add_lens)
    cell_key = adds.flatten().cast(pa.string())
    if vals_col is not None:
        cell_val = t[vals_col].combine_chunks().flatten().cast(pa.string())
        if len(cell_val) != len(cell_key):
            raise ValueError(f"{add_col} and {vals_col} must have identical list lengths")
    cell_kid = kid[cell_row]

    wipe_rows = np.flatnonzero(is_wipe).astype(np.int64)
    wipe_kill = _segmented_next(wipe_rows, kid[wipe_rows], cell_row, cell_kid)

    rems = t[rem_col].combine_chunks()
    rem_lens = pc.list_value_length(rems).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
    rem_row = np.repeat(np.arange(n, dtype=np.int64), rem_lens)
    rem_key = rems.flatten().cast(pa.string())

    both = pa.concat_arrays([cell_key, rem_key])
    codes = pc.index_in(both, value_set=both.unique()).to_numpy(zero_copy_only=False).astype(np.int64)
    span_codes = codes.max() + 1 if len(codes) else 1
    nv = len(cell_key)
    cell_gid = cell_kid * span_codes + codes[:nv]
    rem_gid = kid[rem_row] * span_codes + codes[nv:]
    rem_kill = _segmented_next(rem_row, rem_gid, cell_row, cell_gid)
    kill = np.minimum(wipe_kill, rem_kill)
    if overwrite_kills:
        # overwrite: the NEXT add of the same (key-group, cell key) kills it
        ovw_kill = _segmented_next(cell_row, cell_gid, cell_row, cell_gid)
        kill = np.minimum(kill, ovw_kill)
    hi = np.minimum(kill, ends[cell_kid])
    lo = cell_row
    counts = hi - lo

    total = int(counts.sum())
    pair_cell = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    base = np.repeat(np.cumsum(counts) - counts, counts)
    pair_event = np.arange(total, dtype=np.int64) - base + np.repeat(lo, counts)
    if key_order:
        # within an event: KEY order (codes are factorization order, so order
        # by the actual string key via a sorted-code remap)
        order_of_code = np.empty(span_codes, dtype=np.int64)
        uniq_keys = both.unique()
        rank = pc.array_sort_indices(uniq_keys).to_numpy(zero_copy_only=False)
        order_of_code[rank] = np.arange(len(rank))
        cell_keyrank = order_of_code[codes[:nv]]
        order = np.lexsort((cell_keyrank[pair_cell], pair_event))
    else:
        # within an event: add order — cell index is (row, position)-major,
        # i.e. exactly timeuuid order
        order = np.lexsort((pair_cell, pair_event))
    lens_out = np.bincount(pair_event, minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens_out, out=offsets[1:])
    kv = (
        pc.binary_join_element_wise(cell_key, cell_val, ":")
        if vals_col is not None
        else cell_key
    )
    values = kv.take(pa.array(pair_cell[order]))
    lst = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), values)
    after_csv = pc.binary_join(lst.cast(pa.list_(pa.string())), ",")

    ac = after_csv.combine_chunks() if isinstance(after_csv, pa.ChunkedArray) else after_csv
    shifted = pa.concat_arrays([pa.nulls(1, pa.string()), ac.slice(0, n - 1)])
    idx = pa.array(np.arange(n, dtype=np.int64), mask=first)
    before_csv = shifted.take(idx)

    result = pa.table(
        {
            "conv_id": conv,
            "turn_idx": turn,
            "seq": t["seq"].combine_chunks(),
            "kind": kind,
            "after_csv": after_csv,
            "n_after": pa.array(lens_out.astype(np.int64), pa.int64()),
            "before_csv": before_csv,
            modified_name: pc.not_equal(kind, "none"),
        }
    )
    if not with_final_state:
        return result
    # cells alive past the key's last row (kill is same-key or _INF, so
    # >= ends ⇔ never killed) in emission order — the next batch's carry
    alive_sel = np.flatnonzero(kill >= ends[cell_kid])
    crit = cell_keyrank[alive_sel] if key_order else alive_sel  # (row,pos) order
    alive_sel = alive_sel[np.lexsort((crit, cell_kid[alive_sel]))]
    skid = cell_kid[alive_sel]
    nkeys = len(starts)
    soff = np.concatenate(
        ([0], np.cumsum(np.bincount(skid, minlength=nkeys)))
    ).astype(np.int32)
    take = pa.array(alive_sel)
    state_cols = {
        "conv_id": conv.take(pa.array(starts)),
        "turn_idx": turn.take(pa.array(starts)),
        "elems": pa.ListArray.from_arrays(pa.array(soff, pa.int32()), cell_key.take(take)),
    }
    if vals_col is not None:
        state_cols["vals"] = pa.ListArray.from_arrays(
            pa.array(soff, pa.int32()), cell_val.take(take)
        )
    return result, pa.table(state_cols)


def fold_map_element_ops(t: pa.Table, with_final_state: bool = False):
    """Map element-op fold (the map half of the reference's non-frozen
    collection scenarios): per row, ``add_keys``/``add_vals`` upsert entries
    (adding an existing key OVERWRITES its cell), ``rem_keys`` delete by key
    (``cdc$deleted_elements``), ``kind='wipe'`` clears earlier entries."""
    if t.num_rows == 0:
        return (_empty_map(), _empty_state(True)) if with_final_state else _empty_map()
    return _fold_keyed_cells(
        t,
        add_col="add_keys",
        vals_col="add_vals",
        rem_col="rem_keys",
        modified_name="entries_modified",
        with_final_state=with_final_state,
    )


def fold_set_element_ops(t: pa.Table, with_final_state: bool = False):
    """Set element-op fold (the set half of the reference's non-frozen
    collection scenarios, ``ScyllaTypesAllBase`` set add/remove transitions):
    the cell key IS the element, so re-adding an element is idempotent
    (overwrite of an identical cell), ``rem_elems`` removes by value, and the
    post-image is the distinct live elements in VALUE order (CQL sets cluster
    by element). Same log shape as :func:`fold_element_ops` — only the fold
    semantics differ from the list variant."""
    if t.num_rows == 0:
        return (_empty(), _empty_state(False)) if with_final_state else _empty()
    # same-row duplicate adds are one element in CQL (s + {'x','x'} == {'x'});
    # the overwrite-kill only covers strictly-later rows, so dedupe in-row
    adds = t["add_elems"].combine_chunks().cast(pa.list_(pa.string()))
    lens = pc.list_value_length(adds).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
    if lens.sum():
        row = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        vals = adds.flatten()
        codes = pc.index_in(vals, value_set=vals.unique()).to_numpy(zero_copy_only=False).astype(np.int64)
        _, keep = np.unique(row * (codes.max() + 1) + codes, return_index=True)
        if len(keep) != len(row):
            keep.sort()
            new_lens = np.bincount(row[keep], minlength=len(lens))
            off = np.zeros(len(lens) + 1, dtype=np.int32)
            np.cumsum(new_lens, out=off[1:])
            deduped = pa.ListArray.from_arrays(
                pa.array(off, pa.int32()), vals.take(pa.array(keep))
            )
            t = t.set_column(t.column_names.index("add_elems"), "add_elems", deduped)
    return _fold_keyed_cells(
        t,
        add_col="add_elems",
        vals_col=None,
        rem_col="rem_elems",
        modified_name="elems_modified",
        with_final_state=with_final_state,
    )


def _empty_map() -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.nulls(0, pa.string()),
            "turn_idx": pa.nulls(0, pa.int32()),
            "seq": pa.nulls(0, pa.int64()),
            "kind": pa.nulls(0, pa.string()),
            "after_csv": pa.nulls(0, pa.string()),
            "n_after": pa.nulls(0, pa.int64()),
            "before_csv": pa.nulls(0, pa.string()),
            "entries_modified": pa.nulls(0, pa.bool_()),
        }
    )
