"""Core data model: input transcript schema, change-event envelope schema, sharding.

Mirrors the reference connector's data model (SURVEY.md §1):

* input transcript row  ≙ ScyllaDB CDC log row (``RawChange``), with
  ``conv_id`` the partition key and ``turn_idx`` the clustering key
  (reference ``RowKey.java:26-58``);
* the output envelope ≙ the Debezium envelope the reference emits per change
  (``{source, before, after, op, ts_ms}``, reference ``ScyllaSchema.java:79-105``);
* ``shard`` ≙ the CDC stream-id / Vnode a row belongs to
  (reference ``ConfigSerializerUtil.java:39-52``): ``hash(conv_id) % num_shards``.

Everything here is plain pyarrow — schemas are tiny and are captured by closure
into ``map_batches`` stages (no need for an object-store broadcast).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# Input: transcript CDC log
# ---------------------------------------------------------------------------

#: Canonical input schema (BASELINE.json ``input_hint``).
TRANSCRIPTS = pa.schema(
    [
        ("conv_id", pa.string()),  # partition key (≙ Scylla pk)
        ("turn_idx", pa.int32()),  # clustering key (≙ Scylla ck)
        ("role", pa.string()),  # "user" | "assistant" | "system" | "tool"
        ("text", pa.string()),  # turn payload; NULL ⇒ tombstone (delete)
        ("tool", pa.string()),  # tool name or NULL
        ("ts", pa.timestamp("us")),  # event time
    ]
)

#: Extra bookkeeping column: arrival sequence number (unique, monotone in
#: arrival order). The analogue of the CDC log's ``cdc$time`` timeuuid used as
#: the total order per stream. Synthetic sources generate it; the windowed
#: reader derives it from (file order, row index) when absent.
SEQ_COL = "seq"

#: Non-key value columns of the transcript row (≙ the reference's non-PK
#: columns whose cells appear in before/after images).
VALUE_COLS = ("role", "text", "tool", "ts")

KEY_COLS = ("conv_id", "turn_idx")

# ---------------------------------------------------------------------------
# Output: change-event envelope
# ---------------------------------------------------------------------------

ROW_STRUCT = pa.struct(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

KEY_STRUCT = pa.struct([("conv_id", pa.string()), ("turn_idx", pa.int32())])

SOURCE_STRUCT = pa.struct(
    [
        ("shard", pa.int32()),
        ("epoch", pa.int64()),
        ("window_start", pa.timestamp("us")),
        ("ts_us", pa.int64()),
        ("table", pa.string()),
    ]
)

#: Debezium-envelope-shaped change event (reference ``ScyllaSchema.java:79-105``;
#: op codes ``c``/``u``/``d`` as in ``ScyllaChangeRecordEmitter.java:93-110``).
EVENTS = pa.schema(
    [
        ("key", KEY_STRUCT),
        ("op", pa.string()),
        ("before", ROW_STRUCT),
        ("after", ROW_STRUCT),
        ("source", SOURCE_STRUCT),
        ("ts_ms", pa.int64()),
    ]
)


# ---------------------------------------------------------------------------
# Sharding
# ---------------------------------------------------------------------------


def shard_of(conv_id: pa.ChunkedArray | pa.Array, num_shards: int) -> pa.Array:
    """Vectorized ``hash(conv_id) % num_shards`` (≙ stream-id → Vnode mapping).

    Uses polars' vectorized stable string hash (fixed seed) so the mapping is
    identical across processes and worker restarts (Python's builtin ``hash``
    is salted per process — never use it for partitioning). The shard id is
    engine-internal: no oracle/SQL result may depend on it.
    """
    import polars as pl

    if isinstance(conv_id, pa.ChunkedArray):
        conv_id = conv_id.combine_chunks()
    h = pl.from_arrow(conv_id.cast(pa.string())).hash(seed=0)
    return pl.Series(h % num_shards).cast(pl.Int32).to_arrow()


def with_shard(batch: pa.Table, num_shards: int, col: str = "shard") -> pa.Table:
    """Append the shard column to a transcript batch (vectorized)."""
    if col in batch.column_names:
        batch = batch.drop_columns([col])
    return batch.append_column(col, shard_of(batch["conv_id"], num_shards))


def select_agg(tbl: pa.Table, keys: list[str], renames: list[tuple[str, str]]) -> pa.Table:
    """Select + rename a ``group_by().aggregate()`` result by the GENERATED
    column names (``{col}_{func}``), never by position — pyarrow's output
    column order (keys-first vs aggregates-first) is a version-dependent
    contract this engine must not depend on (nothing pins pyarrow the way the
    manifest pins hash_impl)."""
    out = tbl.select([*keys, *[src for src, _ in renames]])
    return out.rename_columns([*keys, *[dst for _, dst in renames]])
