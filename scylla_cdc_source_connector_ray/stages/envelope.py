"""Debezium-envelope builder (reference M4/M5/M7/M9 —
``ScyllaChangeRecordEmitter.java:93-343,435-460,816-901``).

Packs the flat op-derived columns (``op``, ``before_*``, ``after_*``) into the
envelope schema ``{key, op, before, after, source, ts_ms}`` as Arrow struct
columns — a single vectorized ``map_batches`` stage, no per-row work.

Include modes (``cdc.include.before/after``, reference
``README.md:1184-1198``):

* ``full``         — full row struct (delete→after NULL, insert→before NULL)
* ``only-updated`` — NULL-out value fields not listed in ``modified_cols``
  (primary-key fields stay, matching the reference's "untouched" exclusion
  proved by ``CdcIncludeBeforeAfterBase.java:30-77``)
* ``none``         — the struct column is entirely NULL
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import EngineConfig, IncludeMode, PkPlacement
from ..schema import ROW_STRUCT, SEQ_COL, VALUE_COLS, row_struct_for
from .op_derive import AFTER_PREFIX, BEFORE_PREFIX, _mask_to_null


def _row_struct(
    tbl: pa.Table,
    prefix: str,
    mode: IncludeMode,
    present_mask: np.ndarray,
    row_type: pa.StructType = ROW_STRUCT,
) -> pa.Array:
    """Build the before/after struct column.

    ``present_mask``: rows where the struct itself is non-NULL (e.g. after is
    NULL for deletes). Struct-level validity carries the reference's
    "row absent" semantics; field-level NULLs inside a present struct mean
    "column value is NULL / not included".
    """
    n = tbl.num_rows
    if mode is IncludeMode.NONE:
        return pa.nulls(n, row_type)

    modified = (
        tbl["modified_cols"].combine_chunks() if "modified_cols" in tbl.column_names else None
    )
    children = []
    for field in row_type:
        name = field.name
        if name in ("conv_id", "turn_idx"):
            arr = tbl[name].combine_chunks().cast(field.type)
        else:
            arr = tbl[prefix + name].combine_chunks().cast(field.type)
            if mode is IncludeMode.ONLY_UPDATED and name != "ts":
                # keep only columns whose value changed in this event
                # (take-with-null-indices: if_else has no list/struct kernel)
                is_mod = pc.fill_null(
                    pc.match_substring_regex(modified, rf"(^|,){name}(,|$)"), False
                ).to_numpy(zero_copy_only=False)
                arr = _mask_to_null(arr, ~is_mod)
        children.append(arr)
    mask = pa.array(~present_mask)  # True = struct NULL
    return pa.StructArray.from_arrays(children, fields=list(row_type), mask=mask)


def build_envelope(
    tbl: pa.Table,
    cfg: EngineConfig,
    window_start_us: int | None = None,
    value_cols: tuple[str, ...] = VALUE_COLS,
) -> pa.Table:
    """Flat op-derived block → envelope-shaped change-event block."""
    n = tbl.num_rows
    op_np = tbl["op"].combine_chunks().to_numpy(zero_copy_only=False)
    has_after = (op_np != "d") & (op_np != "pd")  # DELETE/partition-delete → after NULL
    has_before = ~pc.is_null(tbl[BEFORE_PREFIX + "ts"]).combine_chunks().to_numpy(zero_copy_only=False)
    # a 'c' after a delete has before NULL; first event has before NULL

    key = pa.StructArray.from_arrays(
        [tbl["conv_id"].combine_chunks(), tbl["turn_idx"].combine_chunks().cast(pa.int32())],
        names=["conv_id", "turn_idx"],
    )

    shard = (
        tbl["shard"].combine_chunks().cast(pa.int32())
        if "shard" in tbl.column_names
        else pa.nulls(n, pa.int32())
    )
    ts_us = tbl["ts"].combine_chunks().cast(pa.int64())
    ws = (
        pa.array(np.full(n, window_start_us, dtype=np.int64), type=pa.timestamp("us"))
        if window_start_us is not None
        else pa.nulls(n, pa.timestamp("us"))
    )
    source = pa.StructArray.from_arrays(
        [
            shard,
            pa.array(np.full(n, cfg.epoch, dtype=np.int64)),
            ws,
            ts_us,
            pa.array([cfg.table_name] * n, type=pa.string()),
        ],
        names=["shard", "epoch", "window_start", "ts_us", "table"],
    )

    if tuple(value_cols) == VALUE_COLS:
        row_type = ROW_STRUCT
    else:
        # evolved columns (reference ST4) take their type from the block
        from ..schema import _VALUE_TYPES

        extra_types = {
            c: tbl.schema.field(AFTER_PREFIX + c).type
            for c in value_cols
            if c not in _VALUE_TYPES and AFTER_PREFIX + c in tbl.column_names
        }
        row_type = row_struct_for(tuple(value_cols), extra_types)
    out = {
        "key": key,
        "op": tbl["op"].combine_chunks(),
        "before": _row_struct(tbl, BEFORE_PREFIX, cfg.include_before, has_before, row_type),
        "after": _row_struct(tbl, AFTER_PREFIX, cfg.include_after, has_after, row_type),
        "source": source,
        # processing time: event-time-derived for determinism (stripped in
        # golden compares anyway, like DYNAMIC_ENVELOPE_FIELDS in the
        # reference ScyllaTypesIT.java:48-55)
        "ts_ms": pc.divide(ts_us, 1000),
    }

    # extra PK placements (reference M9, ScyllaConnectorConfig.java:909-959)
    if PkPlacement.PAYLOAD_KEY in cfg.pk_placements:
        out["payload_key"] = key
    if PkPlacement.HEADERS in cfg.pk_placements:
        # one header per pk/ck column, named like the reference's record
        # headers (ScyllaChangeRecordEmitter.java:816-901)
        out["headers"] = pa.StructArray.from_arrays(
            [
                tbl["conv_id"].combine_chunks(),
                tbl["turn_idx"].combine_chunks().cast(pa.int32()),
            ],
            names=["pk.conv_id", "ck.turn_idx"],
        )
    cols = pa.table(out)
    if SEQ_COL in tbl.column_names:
        cols = cols.append_column(SEQ_COL, tbl[SEQ_COL].combine_chunks())
    return cols


def flatten_envelope(tbl: pa.Table) -> pa.Table:
    """Inverse of :func:`build_envelope` for compare/oracle purposes:
    envelope → flat columns (the shape the DuckDB oracle emits).

    ≙ the SMT ``ScyllaExtractNewRecordState`` applied to both images
    (reference M10, ``transforms/ScyllaExtractNewRecordState.java:74-117``).
    """
    key = tbl["key"].combine_chunks()
    out: dict[str, pa.Array] = {
        "conv_id": pc.struct_field(key, "conv_id"),
        "turn_idx": pc.struct_field(key, "turn_idx"),
        "op": tbl["op"].combine_chunks(),
    }
    for img, prefix in (("before", BEFORE_PREFIX), ("after", AFTER_PREFIX)):
        s = tbl[img].combine_chunks()
        # introspect the struct type: works for extended value-column sets too
        for f in s.type:
            if f.name in ("conv_id", "turn_idx"):
                continue
            out[prefix + f.name] = pc.struct_field(s, f.name)
    if SEQ_COL in tbl.column_names:
        out[SEQ_COL] = tbl[SEQ_COL].combine_chunks()
    return pa.table(out)
