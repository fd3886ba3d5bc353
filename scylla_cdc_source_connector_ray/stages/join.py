"""Joins (SURVEY.md §2.4).

The reference's only join is the pre/delta/post image correlation (ST1), which
our op-derive kernel subsumes. The north_star adds two more:

1. **Stream-state join** (:func:`enrich_with_conv_state`): every turn event is
   joined against the *per-conversation state store* — the running aggregate
   of all PRIOR turns of its conversation (n_prior_turns, n_prior_chars,
   last_role, last_ts). Expressed Ray-Data-first as the same single
   hash-shuffle as op-derive: shard by ``conv_id``, one vectorized
   sort + exclusive-prefix pass per shard block. In the micro-batch runner the
   store persists across batches as a per-shard Parquet state table (the
   RocksDB-style sorted map of the north_star, but lineage-friendly).

2. **Broadcast enrichment join** (:func:`broadcast_join`): small dimension
   table shipped once via ``ray.put`` and hash-joined inside ``map_batches``
   (no shuffle) — ray_guide "Joins and lookups".
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..schema import SEQ_COL, with_shard

CONV_STATE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("n_turns", pa.int64()),
        ("n_chars", pa.int64()),
        ("last_role", pa.string()),
        ("last_ts_us", pa.int64()),
    ]
)


def conv_state_prefix(
    t: pa.Table, seed: pa.Table | None = None
) -> tuple[pa.Table, pa.Table]:
    """One shard block of transcript rows → (enriched rows, new conv state).

    Enriched columns are the *exclusive* prefix per conversation in
    ``(ts, seq)`` order: the state as it stood before each turn arrived.
    ``seed``: CONV_STATE_SCHEMA rows carried in from the previous micro-batch.
    """
    sort_keys = [("conv_id", "ascending"), ("ts", "ascending")]
    if SEQ_COL in t.column_names:
        sort_keys.append((SEQ_COL, "ascending"))
    t = t.sort_by(sort_keys)
    n = t.num_rows
    conv = t["conv_id"].combine_chunks()
    conv_np = conv.to_numpy(zero_copy_only=False)
    new_conv = np.ones(n, dtype=bool)
    if n:
        new_conv[1:] = conv_np[1:] != conv_np[:-1]

    # a pre-projected block carries "chars" instead of the text payload
    if "chars" in t.column_names:
        chars = t["chars"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    else:
        chars = (
            pc.fill_null(pc.utf8_length(t["text"].combine_chunks()), 0)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
    ts_us = t["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    role_np = t["role"].combine_chunks().to_numpy(zero_copy_only=False)

    # seed lookup per first-row-of-conv
    seed_map: dict[str, tuple[int, int, str | None, int | None]] = {}
    if seed is not None and seed.num_rows:
        sd = seed.to_pandas()
        seed_map = {
            r.conv_id: (r.n_turns, r.n_chars, r.last_role, r.last_ts_us)
            for r in sd.itertuples(index=False)
        }

    # exclusive prefix counts/sums per conv: cumsum minus each conv's base
    ones = np.ones(n, dtype=np.int64)
    cum_n = np.cumsum(ones)
    cum_c = np.cumsum(chars)
    starts = np.flatnonzero(new_conv)
    # base at conv start = cumulative value just before the conv's first row
    base_n = np.zeros(n, dtype=np.int64)
    base_c = np.zeros(n, dtype=np.int64)
    idx = np.maximum.accumulate(np.where(new_conv, np.arange(n), 0)) if n else None
    if n:
        base_n[starts] = cum_n[starts] - 1
        base_c[starts] = cum_c[starts] - chars[starts]
        # propagate each conv's base forward across its rows
        base_n = base_n[idx]
        base_c = base_c[idx]
    prior_turns = cum_n - 1 - base_n
    prior_chars = cum_c - chars - base_c

    # seed offsets + last_role/last_ts via shift-within-conv
    seed_n = np.zeros(n, dtype=np.int64)
    seed_c = np.zeros(n, dtype=np.int64)
    last_role = np.empty(n, dtype=object)
    last_ts = np.full(n, np.nan)
    if n:
        last_role[1:] = role_np[:-1]
        last_ts[1:] = ts_us[:-1]
        for s in starts:
            cid = conv_np[s]
            if cid in seed_map:
                sn, sc, sr, st_ = seed_map[cid]
                seed_n[s] = sn
                seed_c[s] = sc
                last_role[s] = sr
                last_ts[s] = st_ if st_ is not None else np.nan
            else:
                last_role[s] = None
                last_ts[s] = np.nan
        # propagate seed offsets across the conv's rows (idx computed above)
        seed_n = seed_n[idx]
        seed_c = seed_c[idx]

    prior_turns = prior_turns + seed_n
    prior_chars = prior_chars + seed_c

    enriched = (
        t.append_column("prior_turns", pa.array(prior_turns, pa.int64()))
        .append_column("prior_chars", pa.array(prior_chars, pa.int64()))
        .append_column("prev_role", pa.array(last_role, pa.string()))
        .append_column(
            "prev_ts_us",
            pa.array([None if np.isnan(x) else int(x) for x in last_ts], pa.int64()),
        )
    )

    # new state: totals per conv (inclusive), last row's role/ts
    if n:
        ends = np.append(starts[1:] - 1, n - 1)
        new_state = pa.table(
            {
                "conv_id": pc.take(conv, pa.array(starts, pa.int64())),
                "n_turns": pa.array(prior_turns[ends] + 1, pa.int64()),
                "n_chars": pa.array(prior_chars[ends] + chars[ends], pa.int64()),
                "last_role": pc.take(t["role"].combine_chunks(), pa.array(ends, pa.int64())),
                "last_ts_us": pa.array(ts_us[ends], pa.int64()),
            }
        )
        # carry forward seeded convs not present in this block
        if seed is not None and seed.num_rows:
            present = set(new_state["conv_id"].to_pylist())
            missing = seed.filter(
                pa.array([c not in present for c in seed["conv_id"].to_pylist()])
            )
            if missing.num_rows:
                new_state = pa.concat_tables([new_state.select(CONV_STATE_SCHEMA.names), missing.select(CONV_STATE_SCHEMA.names)])
    else:
        new_state = seed if seed is not None else CONV_STATE_SCHEMA.empty_table()
    return enriched, new_state


def enrich_with_conv_state(ds: ray.data.Dataset, num_shards: int = 64) -> ray.data.Dataset:
    """Batch-mode stream-state join: each turn row + the state of its
    conversation as of just before the turn. One hash shuffle by conv_id."""
    sharded = ds.map_batches(lambda b: with_shard(b, num_shards), batch_format="pyarrow")
    return sharded.groupby("shard").map_groups(
        lambda g: conv_state_prefix(g)[0], batch_format="pyarrow"
    )


def conv_state_features(ds: ray.data.Dataset, num_shards: int = 64) -> ray.data.Dataset:
    """Lean variant of :func:`enrich_with_conv_state` for feature extraction:
    the text payload is reduced to its length BEFORE the shuffle, so the
    exchange moves ~10× fewer bytes. Output: key/order columns + the prior
    state features only."""
    import pyarrow as pa_

    def slim(b: pa.Table) -> pa.Table:
        chars = pc.fill_null(pc.utf8_length(b["text"].combine_chunks()), 0).cast(pa_.int64())
        out = b.select(["conv_id", "turn_idx", "role", "ts", SEQ_COL])
        return with_shard(out.append_column("chars", chars), num_shards)

    sharded = ds.map_batches(slim, batch_format="pyarrow")
    enriched = sharded.groupby("shard").map_groups(
        lambda g: conv_state_prefix(g)[0], batch_format="pyarrow"
    )
    return enriched.select_columns(
        ["conv_id", "turn_idx", SEQ_COL, "prior_turns", "prior_chars", "prev_role", "prev_ts_us"]
    )


def default_join_partitions(cap: int = 16) -> int:
    """Join partition count sized to the cluster: each hash-join partition is
    backed by an aggregator actor, and a pipeline chaining several joins can
    DEADLOCK if the actor demand far exceeds the CPU supply (observed: two
    chained 32-partition joins hang at 8 CPUs; 8-partition joins run fine).
    cpus/2 capped at ``cap`` leaves headroom for two concurrent join stages;
    pass ``num_partitions`` explicitly on a large cluster."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, min(cap, cpus // 2))


def shuffle_hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_on: str | tuple[str, ...],
    right_on: str | tuple[str, ...] | None = None,
    how: str = "inner",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Generic co-partitioned large–large hash join: both sides hash-shuffle
    on the key into ``num_partitions`` partitions, each partition joins
    independently (Ray Data's hash-shuffle join operator underneath).

    This is the scale path when neither side is a dimension: bytes moved =
    both inputs once, memory per aggregator = partition size (raise
    ``num_partitions`` to shrink it). Prune columns BEFORE calling — the
    exchange ships every column you keep. For a small right side prefer
    :func:`broadcast_join` (no shuffle at all).

    Caveat: Arrow ``list``-typed payload columns are not supported by the
    underlying join kernel — encode them (e.g. a binary blob) first, as
    ``functions.dedup.minhash_lsh_dedup`` does for shingle sets.
    """
    if num_partitions is None:
        num_partitions = default_join_partitions()
    left_on = (left_on,) if isinstance(left_on, str) else tuple(left_on)
    right_on = left_on if right_on is None else (
        (right_on,) if isinstance(right_on, str) else tuple(right_on)
    )
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=left_on,
        right_on=right_on,
    )


def broadcast_join(
    ds: ray.data.Dataset,
    small: pd.DataFrame,
    left_on: str,
    right_on: str,
    columns: list[str],
) -> ray.data.Dataset:
    """Broadcast hash join: ship the small side once (``ray.put``), merge
    inside each batch. No shuffle; the pattern for dimension enrichment."""
    ref = ray.put(small[[right_on, *columns]])

    class Joiner:
        def __init__(self):
            self.small = ray.get(ref).set_index(right_on)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.join(self.small, on=left_on)

    return ds.map_batches(Joiner, batch_format="pandas", concurrency=(1, 8))
