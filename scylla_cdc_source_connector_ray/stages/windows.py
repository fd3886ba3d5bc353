"""Event-time windowed aggregation: tumbling, sliding, session (north_star;
the reference's only windows are its query windows — SURVEY.md §2.9 — so the
semantics here follow the standard dataflow/stream-slicing model, PAPERS.md).

Design for scale:

* **Tumbling/sliding** pre-aggregate per Arrow batch (``Table.group_by`` inside
  ``map_batches`` — one partial row per (key, window) per batch) and only then
  run the global ``groupby().aggregate`` — the shuffle moves partials, not
  rows (ray_guide: "Aggregation at scale"). Caveat: pyarrow's multi-key
  group_by emits one row per NULL-key *run*, so NULL grouping keys degrade the
  pre-aggregation (results stay correct via the global merge) — fill NULL
  keys with a sentinel upstream if they are common.
* **Sliding** explodes each partial into ``size/slide`` window copies
  *after* partial aggregation (cheap: copies of partials, not of rows).
* **Session** windows need per-key gap detection: hash-shard by ``conv_id``,
  one vectorized pass per shard block (sorted, numpy islands) — the same
  single-shuffle contract as op-derive.

Window identity is ``window_start_us`` (int64 µs since epoch) — integer
arithmetic, identical in SQL (``epoch_us(ts) - epoch_us(ts) % size``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Max, Min, Sum

from ..schema import with_shard


def _ts_us(batch: pa.Table, ts_col: str) -> pa.Array:
    return batch[ts_col].combine_chunks().cast(pa.int64())


def _partial_tumbling(batch: pa.Table, size_us: int, keys: list[str], ts_col: str) -> pa.Table:
    ts = _ts_us(batch, ts_col)
    ts_np = ts.to_numpy(zero_copy_only=False)
    win = pa.array(ts_np - (ts_np % size_us), type=pa.int64())
    cols = {k: batch[k] for k in keys}
    cols["window_start_us"] = win
    n = batch.num_rows
    cols["n"] = pa.array(np.ones(n, dtype=np.int64))
    txt = batch["text"] if "text" in batch.column_names else batch["after_text"] if "after_text" in batch.column_names else None
    cols["chars"] = (
        pc.fill_null(pc.utf8_length(txt.combine_chunks()), 0).cast(pa.int64())
        if txt is not None
        else pa.array(np.zeros(n, dtype=np.int64))
    )
    cols["min_ts_us"] = ts
    cols["max_ts_us"] = ts
    t = pa.table(cols)
    from ..schema import select_agg

    return select_agg(
        t.group_by([*keys, "window_start_us"]).aggregate(
            [("n", "sum"), ("chars", "sum"), ("min_ts_us", "min"), ("max_ts_us", "max")]
        ),
        [*keys, "window_start_us"],
        [
            ("n_sum", "n"),
            ("chars_sum", "chars"),
            ("min_ts_us_min", "min_ts_us"),
            ("max_ts_us_max", "max_ts_us"),
        ],
    )


def tumbling(
    ds: ray.data.Dataset,
    size_us: int,
    keys: list[str] | None = None,
    ts_col: str = "ts",
) -> ray.data.Dataset:
    """Tumbling-window aggregate: per (keys..., window) → n_events, n_chars,
    min/max ts. Partial-aggregated per batch before the global shuffle."""
    keys = list(keys or [])
    partial = ds.map_batches(
        lambda b: _partial_tumbling(b, size_us, keys, ts_col), batch_format="pyarrow"
    )
    out = partial.groupby([*keys, "window_start_us"]).aggregate(
        Sum("n", alias_name="n_events"),
        Sum("chars", alias_name="n_chars"),
        Min("min_ts_us", alias_name="min_ts_us"),
        Max("max_ts_us", alias_name="max_ts_us"),
    )
    return out


def _explode_sliding(partial: pa.Table, size_us: int, slide_us: int) -> pa.Table:
    """Each tumbling(slide)-grained partial joins every sliding window that
    covers its slide: window starts  base − i·slide  for i in 0..size/slide−1."""
    n_copies = size_us // slide_us
    parts = []
    base = partial["window_start_us"].combine_chunks().to_numpy(zero_copy_only=False)
    for i in range(n_copies):
        t = partial.set_column(
            partial.column_names.index("window_start_us"),
            "window_start_us",
            pa.array(base - i * slide_us, type=pa.int64()),
        )
        parts.append(t)
    return pa.concat_tables(parts)


def sliding(
    ds: ray.data.Dataset,
    size_us: int,
    slide_us: int,
    keys: list[str] | None = None,
    ts_col: str = "ts",
) -> ray.data.Dataset:
    """Sliding-window aggregate (size multiple of slide). Rows are first
    partial-aggregated at slide granularity, then each partial is exploded
    into the size/slide windows covering it — the classic panes/slicing
    optimization: row volume is touched once."""
    if size_us % slide_us:
        raise ValueError("size_us must be a multiple of slide_us")
    keys = list(keys or [])
    partial = ds.map_batches(
        lambda b: _explode_sliding(
            _partial_tumbling(b, slide_us, keys, ts_col), size_us, slide_us
        ),
        batch_format="pyarrow",
    )
    return partial.groupby([*keys, "window_start_us"]).aggregate(
        Sum("n", alias_name="n_events"),
        Sum("chars", alias_name="n_chars"),
        Min("min_ts_us", alias_name="min_ts_us"),
        Max("max_ts_us", alias_name="max_ts_us"),
    )


def _sessions_in_shard(t: pa.Table, gap_us: int, ts_col: str) -> pa.Table:
    """Vectorized gaps-and-islands per (conv_id) within one shard block."""
    t = t.sort_by([("conv_id", "ascending"), (ts_col, "ascending")])
    n = t.num_rows
    if n == 0:
        return pa.table(
            {
                "conv_id": pa.nulls(0, pa.string()),
                "session_start_us": pa.nulls(0, pa.int64()),
                "session_end_us": pa.nulls(0, pa.int64()),
                "n_turns": pa.nulls(0, pa.int64()),
            }
        )
    conv = t["conv_id"].combine_chunks()
    ts = _ts_us(t, ts_col).to_numpy(zero_copy_only=False)
    conv_np = conv.to_numpy(zero_copy_only=False)
    new_conv = np.ones(n, dtype=bool)
    new_conv[1:] = conv_np[1:] != conv_np[:-1]
    gap_break = np.ones(n, dtype=bool)
    gap_break[1:] = (ts[1:] - ts[:-1]) > gap_us
    start = new_conv | gap_break
    sess_id = np.cumsum(start) - 1
    # per-session reduce via np.add.reduceat on session boundaries
    idx = np.flatnonzero(start)
    counts = np.diff(np.append(idx, n))
    return pa.table(
        {
            "conv_id": pc.take(conv, pa.array(idx, pa.int64())),
            "session_start_us": pa.array(ts[idx], pa.int64()),
            "session_end_us": pa.array(ts[np.append(idx[1:] - 1, n - 1)], pa.int64()),
            "n_turns": pa.array(counts, pa.int64()),
        }
    )


def session(
    ds: ray.data.Dataset,
    gap_us: int,
    num_shards: int = 64,
    ts_col: str = "ts",
) -> ray.data.Dataset:
    """Session windows per conv_id: a new session starts when the gap since
    the previous turn exceeds ``gap_us``. One shuffle (hash by conv_id) —
    projected down to (conv_id, ts) FIRST so the exchange never moves the
    text payload (~10× fewer shuffled bytes on transcript data)."""
    slim = ds.map_batches(
        lambda b: with_shard(b.select(["conv_id", ts_col]), num_shards),
        batch_format="pyarrow",
    )
    return slim.groupby("shard").map_groups(
        lambda g: _sessions_in_shard(g, gap_us, ts_col), batch_format="pyarrow"
    )


def merge_session_intervals(df, gap_us: int):
    """Gap-merge partial session intervals per conv (pandas DataFrame with
    SESSION-shaped columns; extra aggregate columns are summed). Correctness:
    sessionization of a point set equals gap-merging the partial sessions of
    ANY partition of that set — within a partial session consecutive points
    have gap ≤ g (still ≤ g in the union), and the sweep joins intervals whose
    gap ≤ g, including bridges across partials. Same full-sweep-with-cummax
    the streaming merge uses (an out-of-order partial can bridge two others)."""
    import pandas as pd

    if not len(df):
        return df
    df = df.sort_values(["conv_id", "session_start_us", "session_end_us"]).reset_index(drop=True)
    g = df.groupby("conv_id", sort=False)
    prev_end_cummax = g["session_end_us"].transform(lambda x: x.cummax().shift())
    new_sess = prev_end_cummax.isna() | (df["session_start_us"] > prev_end_cummax + gap_us)
    sid = new_sess.cumsum()
    sums = {
        c: (c, "sum")
        for c in df.columns
        if c not in ("conv_id", "session_start_us", "session_end_us")
    }
    return (
        df.assign(_sid=sid)
        .groupby(["conv_id", "_sid"], as_index=False, sort=False)
        .agg(
            session_start_us=("session_start_us", "min"),
            session_end_us=("session_end_us", "max"),
            **sums,
        )
        .drop(columns=["_sid"])
    )


def session_salted(
    ds: ray.data.Dataset,
    gap_us: int,
    num_shards: int,
    hot_convs: frozenset[str] | set[str],
    salt_chunk: int,
    ts_col: str = "ts",
) -> ray.data.Dataset:
    """Hierarchical session windows under hot-conversation salting (the
    north_star skew clause composed with a conversation-level stateful stage):

    1. salted sub-shards compute *partial* sessions over their row subset
       (same vectorized islands pass as :func:`session`);
    2. a second keyed exchange re-shards the partial INTERVALS (O(sessions),
       not O(rows)) by plain ``hash(conv_id)`` and gap-merges them per conv.

    Output equals :func:`session` exactly — salting changes placement and the
    interval-volume of the second exchange, never content."""
    from .salt import with_salted_shard

    hot = frozenset(hot_convs)
    slim = ds.map_batches(
        lambda b: with_salted_shard(
            b.select(["conv_id", "turn_idx", ts_col]), num_shards, hot, salt_chunk
        ),
        batch_format="pyarrow",
    )
    partials = slim.groupby("shard").map_groups(
        lambda g: _sessions_in_shard(g, gap_us, ts_col), batch_format="pyarrow"
    )

    def _merge(g: pa.Table) -> pa.Table:
        merged = merge_session_intervals(
            g.drop_columns(["shard"]).to_pandas(), gap_us
        )
        out = pa.Table.from_pandas(merged, preserve_index=False)
        return pa.table(
            {
                "conv_id": out["conv_id"].cast(pa.string()) if out.num_rows else pa.nulls(0, pa.string()),
                "session_start_us": out["session_start_us"].cast(pa.int64()),
                "session_end_us": out["session_end_us"].cast(pa.int64()),
                "n_turns": out["n_turns"].cast(pa.int64()),
            }
        )

    resharded = partials.map_batches(
        lambda b: with_shard(b, num_shards), batch_format="pyarrow"
    )
    return resharded.groupby("shard").map_groups(_merge, batch_format="pyarrow")
