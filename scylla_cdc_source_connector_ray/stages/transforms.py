"""Post-pipeline transforms — the analogue of the reference's Kafka Connect
SMT plugins (SURVEY.md §2.2 M10/M11), applied as extra ``map_batches`` stages
via ``apply_post_transforms``.

* :func:`extract_new_record_state` ≙ ``ScyllaExtractNewRecordState``
  (``transforms/ScyllaExtractNewRecordState.java:74-117``): envelope → flat
  after-state record (+``op``/``ts_ms``), optionally dropping delete
  tombstones.
* :func:`flatten_columns` ≙ ``ScyllaFlattenColumns``
  (``transforms/ScyllaFlattenColumns.java:39-132``): unwrap the legacy
  ``{value: X}`` Cell structs inside before/after while preserving the rest
  of the envelope.
* :func:`to_cell_format` produces that legacy Cell encoding in the first
  place (``ScyllaSchemaLegacy.java:112-127``, ``README.md:203-246``): a Cell
  struct that is NULL means "column not modified"; ``{value: NULL}`` means
  "column set to NULL" — the distinction the flat encoding can't carry.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..schema import VALUE_COLS

CELL_COLS = tuple(c for c in VALUE_COLS if c != "ts")  # payload cells


def extract_new_record_state(batch: pa.Table, drop_deletes: bool = False) -> pa.Table:
    """Envelope → flat after-state rows: key fields + after.* + op + ts_ms."""
    if drop_deletes:
        batch = batch.filter(pc.not_equal(batch["op"], "d"))
    key = batch["key"].combine_chunks()
    after = batch["after"].combine_chunks()
    cols = {
        "conv_id": pc.struct_field(key, "conv_id"),
        "turn_idx": pc.struct_field(key, "turn_idx"),
    }
    for vc in VALUE_COLS:
        cols[vc] = pc.struct_field(after, vc)
    cols["op"] = batch["op"].combine_chunks()
    cols["ts_ms"] = batch["ts_ms"].combine_chunks()
    return pa.table(cols)


def to_cell_format(batch: pa.Table) -> pa.Table:
    """Wrap each payload column of before/after in the legacy one-field Cell
    struct. Cell NULL ⇔ column not modified in this event; Cell{value: NULL}
    ⇔ column set to NULL. Requires the ``modified_cols`` bookkeeping column
    (present on the flat op-derived layout) — so this transform composes on
    the flat stage, mirroring how the legacy schema wraps cells at emit time
    (``ScyllaChangeRecordEmitterLegacy.java``)."""
    n = batch.num_rows
    modified = batch["modified_cols"].combine_chunks()
    out_cols: dict[str, pa.Array] = {
        "conv_id": batch["conv_id"].combine_chunks(),
        "turn_idx": batch["turn_idx"].combine_chunks(),
        "op": batch["op"].combine_chunks(),
    }
    for img in ("after", "before"):
        for vc in CELL_COLS:
            col = batch[f"{img}_{vc}"].combine_chunks()
            is_mod = pc.fill_null(
                pc.match_substring_regex(modified, rf"(^|,){vc}(,|$)"), False
            )
            mask = pc.invert(is_mod)
            if isinstance(mask, pa.ChunkedArray):
                mask = mask.combine_chunks()
            cell = pa.StructArray.from_arrays([col], names=["value"], mask=mask)
            out_cols[f"{img}_{vc}_cell"] = cell
    out_cols["ts"] = batch["ts"].combine_chunks()
    if "seq" in batch.column_names:
        out_cols["seq"] = batch["seq"].combine_chunks()
    return pa.table(out_cols)


def flatten_columns(batch: pa.Table) -> pa.Table:
    """Unwrap ``*_cell`` Cell structs back to plain columns (NULL cell and
    NULL value both flatten to NULL — exactly the information the reference's
    ``ScyllaFlattenColumns`` SMT discards, ``README.md:258-357``)."""
    cols: dict[str, pa.Array] = {}
    for name in batch.column_names:
        col = batch[name].combine_chunks()
        if name.endswith("_cell") and pa.types.is_struct(col.type):
            cols[name[: -len("_cell")]] = pc.struct_field(col, "value")
        else:
            cols[name] = col
    return pa.table(cols)


def apply_post_transforms(
    ds: ray.data.Dataset, transforms: list[Callable[[pa.Table], pa.Table]]
) -> ray.data.Dataset:
    """Compose SMT-style transforms after a pipeline (the reference chains
    arbitrary Connect ``Transformation``s the same way)."""
    for fn in transforms:
        ds = ds.map_batches(fn, batch_format="pyarrow")
    return ds


def explode_list(
    batch: pa.Table,
    list_col: str,
    keep: list[str],
    out_col: str,
    pos_col: str = "pos",
) -> pa.Table:
    """UNNEST: one output row per element of ``list_col`` (NULL lists and
    empty lists contribute none), with 1-based ``pos_col`` and the ``keep``
    columns repeated — fully vectorized (list_parent_indices / list_flatten),
    embarrassingly parallel (no exchange: each batch explodes locally, the
    flat-map family of SURVEY §2.2)."""
    import numpy as np

    for name in (out_col, pos_col):
        if name in keep:
            raise ValueError(f"output column {name!r} collides with a keep column")
    arr = batch[list_col].combine_chunks()
    flat = pc.list_flatten(arr)
    counts = (
        pc.fill_null(pc.list_value_length(arr), 0)
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    # parent indices derived from the SAME counts as list_flatten: a
    # null-masked list whose offsets still span values would make
    # pc.list_parent_indices disagree with list_flatten's element count
    parent = pa.array(np.repeat(np.arange(len(counts), dtype=np.int64), counts))
    total = int(counts.sum())
    starts_at = np.cumsum(counts) - counts
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts_at, counts) + 1
    cols = {c: batch[c].take(parent) for c in keep}
    cols[out_col] = flat
    cols[pos_col] = pa.array(pos, pa.int64())
    return pa.table(cols)
