"""Op classification + before/after image synthesis (reference M1/M3/M5/M6).

Deterministic CDC semantics over the transcript log (the spec every oracle
query mirrors):

    Partition rows by key ``(conv_id, turn_idx)`` and order each partition by
    ``(ts, seq)``. A row with ``text IS NULL`` is a tombstone. Then, per row:

    * ``op``     = ``'d'`` if tombstone, ``'c'`` if first row for the key,
                   else ``'u'``                      (≙ ScyllaChangesConsumer.java:195-249)
    * ``after``  = the row's value columns, or NULL state for ``'d'``
                   (≙ ScyllaChangeRecordEmitter.java:145-343: DELETE → after=null)
    * ``before`` = previous ``after`` for the key (NULL if none)
                   — the per-key state machine ``state -> (before=state, state=after)``,
                   the full-row analogue of the reference's preimage synthesis
                   ``before = pre[modified] ∪ post[unchanged]``
                   (ScyllaChangeRecordEmitter.java:529-575): our log re-emits
                   full rows, so the previous full state IS that union.

    ``modified_cols`` = comma-joined sorted list of value columns whose value
    differs between before and after (reference M3,
    ``ScyllaChangeRecordEmitter.java:361-398``: NULL-to-NULL is unmodified).

All kernels are vectorized (pyarrow.compute / numpy over the sorted block) —
no per-row Python in the hot path. The caller guarantees each input block
contains *all* rows of the keys it holds (hash-sharded by ``conv_id``), which
is the same co-location contract the reference gets from stream-id → task
assignment (``ConfigSerializerUtil.java:39-52``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import SEQ_COL, VALUE_COLS

#: columns produced per value column
BEFORE_PREFIX = "before_"
AFTER_PREFIX = "after_"


def sort_log(tbl: pa.Table) -> pa.Table:
    """Stable total order: (conv_id, turn_idx, ts, seq)."""
    keys = [("conv_id", "ascending"), ("turn_idx", "ascending"), ("ts", "ascending")]
    if SEQ_COL in tbl.column_names:
        keys.append((SEQ_COL, "ascending"))
    return tbl.sort_by(keys)


def _mask_to_null(arr: pa.Array, mask_np: np.ndarray) -> pa.Array:
    """Rows where ``mask_np`` is True become NULL — works for ANY type
    (list/struct included) via take-with-null-indices; ``pc.if_else`` only has
    kernels for flat types."""
    idx = pa.array(np.arange(len(arr), dtype=np.int64), mask=mask_np)
    return arr.take(idx)


def _lag(arr: pa.ChunkedArray | pa.Array, first_np: np.ndarray) -> pa.Array:
    """Vectorized per-partition lag over a key-sorted column: shift down one,
    NULL where the row is the first of its key partition."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    shifted = pa.concat_arrays([pa.nulls(1, arr.type), arr.slice(0, n - 1)])
    return _mask_to_null(shifted, first_np)


def _scalar_neq(a: pa.Array, b: pa.Array) -> pa.Array:
    """Null-aware inequality for flat types: NULL==NULL, NULL≠value."""
    neq = pc.fill_null(pc.not_equal(a, b), False)
    return pc.or_(neq, pc.xor(pc.is_null(a), pc.is_null(b)))


def _values_neq(a: pa.Array, b: pa.Array) -> pa.Array:
    """Null-aware inequality for ANY value-column type (reference M3 over the
    full type table, ``ScyllaChangeRecordEmitter.java:361-398``):

    * list<string>: canonical \\x1f-joined encoding, so NULL, [] and [x] are
      three distinct states ("set-to-NULL" ≠ "emptied" ≠ "unmodified")
    * struct: null-ness differs, or any field differs (recursively null-aware)
    * flat: plain null-aware ``not_equal``
    """
    t = a.type
    if (pa.types.is_list(t) or pa.types.is_large_list(t)) and pa.types.is_struct(t.value_type):
        # map column (array of key/value structs in key order): canonical
        # injective entry encoding, so NULL / {} / entries are distinct states
        from ..schema import map_entries_joined

        return _scalar_neq(map_entries_joined(a), map_entries_joined(b))
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        if not pa.types.is_string(t.value_type):
            raise TypeError(f"list value compare only supports list<string>, got {t}")
        from ..schema import join_counted

        # count-prefixed join: injective even for [] vs [""]
        return _scalar_neq(join_counted(a), join_counted(b))
    if pa.types.is_struct(t):
        from ..schema import is_tuple_struct

        if is_tuple_struct(t):
            # TUPLE semantics (ScyllaChangeRecordEmitter.java:749-764): an
            # all-NULL tuple is a VALUE, distinct from a NULL tuple — no
            # empty→NULL normalization, plain set-ness xor + field diffs
            va, vb = pc.is_valid(a), pc.is_valid(b)
            res = pc.xor(va, vb)
            both = pc.and_(va, vb)
            for f in t:
                fa, fb = pc.struct_field(a, f.name), pc.struct_field(b, f.name)
                res = pc.or_(res, pc.and_(both, _values_neq(fa, fb)))
            return res
        # empty-UDT → NULL (reference ScyllaSchema.java:297-430: a UDT with
        # no set fields surfaces as NULL, at ANY nesting level): a struct
        # whose fields are all effectively NULL compares equal to a NULL
        # struct
        def eff_valid(x):
            xt = x.type
            if not pa.types.is_struct(xt):
                return pc.is_valid(x)
            any_field = pa.array([False] * len(x))  # zero-field struct ⇒ NULL
            for f in xt:
                any_field = pc.or_(any_field, eff_valid(pc.struct_field(x, f.name)))
            return pc.and_(pc.is_valid(x), any_field)

        va, vb = eff_valid(a), eff_valid(b)
        res = pc.xor(va, vb)
        both = pc.and_(va, vb)
        for f in t:
            fa, fb = pc.struct_field(a, f.name), pc.struct_field(b, f.name)
            res = pc.or_(res, pc.and_(both, _values_neq(fa, fb)))
        return res
    return _scalar_neq(a, b)


def derive_ops(
    tbl: pa.Table, sorted_input: bool = False, value_cols: tuple[str, ...] = VALUE_COLS
) -> pa.Table:
    """Classify ops and synthesize before/after images for one co-located block.

    Input: transcript CDC-log columns (+ optional ``seq``). Output: input key
    columns + ``op`` + ``after_*`` / ``before_*`` flat value columns +
    ``modified_cols`` + ``ts``/``seq`` passthrough, sorted by
    (conv_id, turn_idx, ts, seq). ``value_cols`` may include list/struct
    columns (see :func:`_values_neq`).
    """
    if tbl.num_rows == 0:
        return _empty_out(tbl, value_cols)
    if not sorted_input:
        tbl = sort_log(tbl)

    conv = tbl["conv_id"].combine_chunks()
    turn = tbl["turn_idx"].combine_chunks()
    n = tbl.num_rows

    # first-row-of-key mask: row 0, or key differs from previous row.
    # NULL-SAFE equality (NULL == NULL is true here): a NULL conv/turn —
    # SQL's single NULL group — must form one run, and a bare pc.equal
    # would yield NULL, poisoning the boolean mask (object-dtype numpy).
    def _nseq(a: pa.Array, b: pa.Array) -> pa.Array:
        both_null = pc.and_(pc.is_null(a), pc.is_null(b))
        return pc.or_(both_null, pc.fill_null(pc.equal(a, b), False))

    prev_conv = pa.concat_arrays([conv.slice(0, 1), conv.slice(0, n - 1)])
    prev_turn = pa.concat_arrays([turn.slice(0, 1), turn.slice(0, n - 1)])
    same = pc.and_(_nseq(conv, prev_conv), _nseq(turn, prev_turn))
    first = same.to_numpy(zero_copy_only=False).copy()
    np.logical_not(first, out=first)
    first[0] = True
    first_mask = pa.array(first)

    is_del = pc.is_null(tbl["text"]).combine_chunks()

    op = pc.if_else(
        is_del,
        pa.scalar("d"),
        pc.if_else(first_mask, pa.scalar("c"), pa.scalar("u")),
    )

    cols: dict[str, pa.Array | pa.ChunkedArray] = {
        "conv_id": conv,
        "turn_idx": turn,
        "op": op,
    }

    del_np = is_del.to_numpy(zero_copy_only=False)  # after-NULL state rows
    modified_parts = []
    for vc in value_cols:
        col = tbl[vc].combine_chunks()
        after = _mask_to_null(col, del_np)
        before = _lag(after, first)
        cols[AFTER_PREFIX + vc] = after
        cols[BEFORE_PREFIX + vc] = before
        if vc != "ts":  # ts always "changes"; modified set tracks payload cols
            modified_parts.append((vc, _values_neq(after, before)))

    cols["modified_cols"] = modified_cols_string(modified_parts, n)

    cols["ts"] = tbl["ts"].combine_chunks()
    for passthrough in (SEQ_COL, "shard"):
        if passthrough in tbl.column_names:
            cols[passthrough] = tbl[passthrough].combine_chunks()
    return pa.table(cols)


def modified_cols_string(modified_parts: list[tuple[str, pa.Array]], n: int) -> pa.Array:
    """Comma-joined sorted modified-column names per row. With k payload
    columns there are only 2^k combinations — precompute them and index with
    a bitmask (fully vectorized; no per-row string building); beyond 16
    columns build strings only for combos that actually occur."""
    modified_parts = sorted(modified_parts)
    if len(modified_parts) > 63:
        raise ValueError(f"too many payload columns for the bitmask ({len(modified_parts)} > 63)")
    combo = np.zeros(n, dtype=np.int64)
    for bit, (_, mask) in enumerate(modified_parts):
        m = mask.to_numpy(zero_copy_only=False).astype(np.int64)
        combo |= m << bit
    names = [vc for vc, _ in modified_parts]
    if len(names) <= 16:
        lookup = np.array(
            [",".join(nm for b, nm in enumerate(names) if i & (1 << b)) for i in range(1 << len(names))],
            dtype=object,
        )
        return pa.array(lookup[combo], type=pa.string())
    uniq, inv = np.unique(combo, return_inverse=True)
    lookup = np.array(
        [",".join(nm for b, nm in enumerate(names) if i & (1 << b)) for i in uniq],
        dtype=object,
    )
    return pa.array(lookup[inv], type=pa.string())


def _empty_out(tbl: pa.Table, value_cols: tuple[str, ...] = VALUE_COLS) -> pa.Table:
    fields = [("conv_id", pa.string()), ("turn_idx", pa.int32()), ("op", pa.string())]
    for vc in value_cols:
        t = tbl.schema.field(vc).type
        fields.append((AFTER_PREFIX + vc, t))
        fields.append((BEFORE_PREFIX + vc, t))
    fields.append(("modified_cols", pa.string()))
    fields.append(("ts", pa.timestamp("us")))
    for passthrough in (SEQ_COL, "shard"):
        if passthrough in tbl.column_names:
            fields.append((passthrough, tbl.schema.field(passthrough).type))
    return pa.table({name: pa.nulls(0, t) for name, t in fields})
