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
                # blocks off the Ray exchange carry large_string while a
                # parquet-read seed carries string — pin both to the schema
                new_state = pa.concat_tables(
                    [
                        new_state.select(CONV_STATE_SCHEMA.names).cast(CONV_STATE_SCHEMA),
                        missing.select(CONV_STATE_SCHEMA.names).cast(CONV_STATE_SCHEMA),
                    ]
                )
    else:
        new_state = (
            seed.select(CONV_STATE_SCHEMA.names).cast(CONV_STATE_SCHEMA)
            if seed is not None
            else CONV_STATE_SCHEMA.empty_table()
        )
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


# ---------------------------------------------------------------------------
# As-of and interval (range) joins — custom ordered-join operators Ray Data
# has no native kernel for (SURVEY §2.4 extension; round-3 brief "custom
# operators": as-of join / range join). Both follow the same distributed
# shape: tag each side, hash-co-partition on the equality key, union the two
# streams, and run the vectorized ordered-join kernel (pandas C merge_asof /
# merge+filter) once per partition via groupby().map_groups(). Shuffle cost =
# both inputs moved exactly once; no barrier beyond the one keyed exchange.
# Partitioning assumption: the by-key cardinality ≫ num_partitions and no
# single key dominates (a hot key lands whole in one partition — salt the key
# upstream if one key exceeds a worker's heap, as stages/salt.py does for
# conversations).
# ---------------------------------------------------------------------------

_SIDE_COL = "__oj_side"
_PART_COL = "__oj_part"
_BUCKET_COL = "__oj_bucket"


def _arrow_schema(ds: ray.data.Dataset) -> pa.Schema:
    """Dataset schema as a real ``pa.Schema``. ``ds.schema().base_schema`` is
    a ``PandasBlockSchema`` (parallel names/types lists) for pandas-backed
    datasets — normalize both representations."""
    schema = ds.schema()
    if schema is None:
        raise ValueError(
            "ordered join: input dataset has no recoverable schema (an empty "
            "pandas-block dataset loses its schema through repartition; read "
            "from parquet or pass the empty side un-repartitioned)"
        )
    s = schema.base_schema
    if isinstance(s, pa.Schema):
        return s
    return pa.schema(
        [
            pa.field(n, t if isinstance(t, pa.DataType) else pa.from_numpy_dtype(t))
            for n, t in zip(s.names, s.types)
        ]
    )


def _null_pad(t: pa.Table, target: pa.Schema) -> pa.Table:
    """Conform a batch to ``target``: missing columns become typed nulls, and
    column order matches — the two tagged sides must share one exact schema
    for the union + keyed exchange."""
    cols = []
    for f in target:
        if f.name in t.column_names:
            c = t[f.name]
            if c.type != f.type:
                c = c.cast(f.type)
            cols.append(c)
        else:
            cols.append(pa.nulls(t.num_rows, f.type))
    return pa.table(dict(zip(target.names, cols)))


def _part_of(key_arr: pa.ChunkedArray | pa.Array, num_partitions: int) -> pa.Array:
    """Stable cross-process partition id for any castable-to-string key
    (reuses the pinned polars hash from schema.shard_of)."""
    from ..schema import shard_of

    return shard_of(key_arr, num_partitions)


def _restore_int_dtypes(df: pd.DataFrame, schema: pa.Schema) -> pd.DataFrame:
    """Outer/left ordered joins surface unmatched rows as NaN, silently
    promoting int64 payload columns to float64; restore pandas nullable Int64
    so the Arrow output keeps the input's integer types (oracle parity)."""
    for f in schema:
        if (
            f.name in df.columns
            and pa.types.is_integer(f.type)
            and df[f.name].dtype.kind == "f"
        ):
            df[f.name] = df[f.name].astype("Int64")
    return df


def _to_arrow_exact(df: pd.DataFrame, schema: pa.Schema) -> pa.Table:
    """Group-fn output → Arrow at EXACTLY ``schema``. Per-group pandas frames
    drift (all-NaN object columns infer null type, int-with-null promotes to
    float); emitting a pinned schema from every group keeps Ray's block
    concatenation and the downstream consumer schema-stable."""
    df = _restore_int_dtypes(df.reindex(columns=schema.names), schema)
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    cols = []
    for f in schema:
        c = tbl[f.name]
        cols.append(c if c.type == f.type else c.cast(f.type))
    return pa.table(dict(zip(schema.names, cols)))


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    by: str,
    on: str,
    direction: str = "backward",
    suffix: str = "_r",
    tolerance: int | None = None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Distributed as-of join: for every left row, attach the right row with
    the same ``by`` key and the nearest ``on`` value (``backward``: greatest
    right ``on`` <= left ``on``; ``forward``/``nearest`` as in pandas).
    Left-outer semantics — unmatched left rows keep typed nulls.

    ``on`` must be a numeric or timestamp column with identical type on both
    sides; right payload columns (everything except ``by``) are renamed with
    ``suffix``. ``tolerance`` bounds the match distance in ``on`` units.

    Scale shape: one hash exchange of both inputs keyed on ``by``; each
    partition sorts its slice and runs ``pandas.merge_asof`` (a vectorized C
    merge over two sorted runs — no per-row Python). Prune columns before
    calling; the exchange ships everything you keep.
    """
    if num_partitions is None:
        num_partitions = default_join_partitions()
    lschema, rschema = _arrow_schema(left), _arrow_schema(right)
    if on not in lschema.names or on not in rschema.names or by not in lschema.names:
        raise ValueError(f"asof_join: by={by!r}/on={on!r} missing from inputs")
    on_r = on + suffix
    r_renames = {n: (n if n == by else n + suffix) for n in rschema.names}
    left_names = list(lschema.names)
    right_out = [r_renames[n] for n in rschema.names if n != by]
    clash = set(left_names) & set(right_out)
    if clash:
        raise ValueError(f"asof_join: suffixed right columns clash with left: {clash}")
    target = pa.schema(
        [*lschema, *[pa.field(r_renames[f.name], f.type) for f in rschema if f.name != by]]
        + [pa.field(_SIDE_COL, pa.int8()), pa.field(_PART_COL, pa.int32())]
    )

    def tag(side: int, rename: dict[str, str] | None):
        def fn(t: pa.Table) -> pa.Table:
            if rename:
                t = t.rename_columns([rename[n] for n in t.column_names])
            t = _null_pad(t, pa.schema([f for f in target if f.name not in (_SIDE_COL, _PART_COL)]))
            t = t.append_column(_SIDE_COL, pa.array(np.full(t.num_rows, side, np.int8)))
            return t.append_column(_PART_COL, _part_of(t[by], num_partitions))

        return fn

    tagged = left.map_batches(tag(0, None), batch_format="pyarrow").union(
        right.map_batches(tag(1, r_renames), batch_format="pyarrow")
    )

    out_cols = [*left_names, *right_out]
    int_schema = pa.schema([target.field(n) for n in out_cols])

    def join_group(df: pd.DataFrame) -> pa.Table:
        l = df[df[_SIDE_COL] == 0]
        r = df[df[_SIDE_COL] == 1]
        if not len(l):
            return int_schema.empty_table()
        l = l[left_names].sort_values(on, kind="mergesort")
        l_nullkey = l[l[by].isna()]  # merge_asof rejects null keys; keep unmatched
        if len(l_nullkey):
            l = l[l[by].notna()]
        if not len(r) or not len(l):
            out = pd.concat([l, l_nullkey]).reindex(columns=out_cols)
        else:
            r = r[[by, *right_out]].dropna(subset=[by])
            # merge_asof keeps the LAST right row among equal `on` values and
            # a plain on-sort is only stable w.r.t. Ray's nondeterministic
            # block arrival order — total-order the right side so tied
            # (by, on) rows resolve identically across runs (greatest row in
            # column order wins); fall back if some column is unsortable
            try:
                r = r.sort_values(
                    [on_r, *[c for c in right_out if c != on_r]], kind="mergesort"
                )
            except TypeError:
                r = r.sort_values(on_r, kind="mergesort")
            tol = tolerance
            if tol is not None and l[on].dtype.kind == "f":
                tol = float(tol)  # null-padding promoted on to float64 in this group
            out = pd.merge_asof(
                l,
                r,
                left_on=on,
                right_on=on_r,
                by=by,
                direction=direction,
                tolerance=tol,
            )
            if len(l_nullkey):
                out = pd.concat([out, l_nullkey.reindex(columns=out_cols)])
        return _to_arrow_exact(out[out_cols], int_schema)

    return tagged.groupby(_PART_COL).map_groups(join_group, batch_format="pandas")


def interval_join(
    points: ray.data.Dataset,
    intervals: ray.data.Dataset,
    by: str,
    ts: str,
    start: str,
    end: str,
    bucket_width: int,
    suffix: str = "_r",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Distributed range (interval) join: emit one row per (point, interval)
    pair with equal ``by`` key and ``start <= ts < end`` (inner semantics;
    a point inside k intervals yields k rows).

    ``ts``/``start``/``end`` are int64 (e.g. epoch-µs). The classic shuffle
    trick for inequality predicates: time is cut into ``bucket_width`` cells;
    every interval is REPLICATED to each cell it overlaps (np.repeat — no
    Python loop), every point goes to its single cell, and the exchange
    co-partitions on hash((by, cell)). Each partition then runs one hash
    merge + vectorized band filter. Replication factor = avg interval length
    / bucket_width + 1, so pick ``bucket_width`` ≈ the typical interval
    length; shuffle cost = points once + intervals × replication.
    """
    if num_partitions is None:
        num_partitions = default_join_partitions()
    pschema, ischema = _arrow_schema(points), _arrow_schema(intervals)
    i_renames = {n: (n if n == by else n + suffix if n in pschema.names else n) for n in ischema.names}
    ivl_out = [i_renames[n] for n in ischema.names if n != by]
    start_o, end_o = i_renames[start], i_renames[end]
    target = pa.schema(
        [*pschema, *[pa.field(i_renames[f.name], f.type) for f in ischema if f.name != by]]
        + [
            pa.field(_BUCKET_COL, pa.int64()),
            pa.field(_SIDE_COL, pa.int8()),
            pa.field(_PART_COL, pa.int32()),
        ]
    )
    data_schema = pa.schema([f for f in target if f.name not in (_SIDE_COL, _PART_COL)])

    def finish(t: pa.Table, side: int) -> pa.Table:
        t = _null_pad(t, data_schema)
        key = pc.binary_join_element_wise(
            pc.cast(t[by], pa.string()), pc.cast(t[_BUCKET_COL], pa.string()), ":"
        )
        t = t.append_column(_SIDE_COL, pa.array(np.full(t.num_rows, side, np.int8)))
        return t.append_column(_PART_COL, _part_of(key, num_partitions))

    def tag_points(t: pa.Table) -> pa.Table:
        # numpy floor division, NOT pc.divide: pc.divide truncates toward
        # zero, so negative timestamps would land one cell off the interval
        # side's `s // bucket_width` flooring and matching pairs vanish
        tv = t[ts].combine_chunks().to_numpy(zero_copy_only=False)
        b = pa.array(tv // bucket_width, pa.int64())
        return finish(t.append_column(_BUCKET_COL, b), 0)

    def tag_intervals(t: pa.Table) -> pa.Table:
        from ..functions.dedup import _ranges

        t = t.rename_columns([i_renames[n] for n in t.column_names])
        s = t[start_o].combine_chunks().to_numpy(zero_copy_only=False)
        e = t[end_o].combine_chunks().to_numpy(zero_copy_only=False)
        b0 = s // bucket_width
        b1 = np.maximum((e - 1) // bucket_width, b0)  # end exclusive
        counts = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(s), dtype=np.int64), counts)
        buckets = b0[idx] + _ranges(counts)
        rep = t.take(pa.array(idx))
        return finish(rep.append_column(_BUCKET_COL, pa.array(buckets, pa.int64())), 1)

    tagged = points.map_batches(tag_points, batch_format="pyarrow").union(
        intervals.map_batches(tag_intervals, batch_format="pyarrow")
    )

    out_cols = [*pschema.names, *ivl_out]
    int_schema = pa.schema([target.field(n) for n in out_cols])

    def join_group(df: pd.DataFrame) -> pa.Table:
        l = df[df[_SIDE_COL] == 0]
        r = df[df[_SIDE_COL] == 1]
        if not len(l) or not len(r):
            return int_schema.empty_table()
        m = l[[*pschema.names, _BUCKET_COL]].merge(
            r[[by, _BUCKET_COL, *ivl_out]], on=[by, _BUCKET_COL]
        )
        m = m[(m[start_o] <= m[ts]) & (m[ts] < m[end_o])]
        return _to_arrow_exact(m[out_cols], int_schema)

    return tagged.groupby(_PART_COL).map_groups(join_group, batch_format="pandas")


def full_outer_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str | tuple[str, ...],
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """FULL OUTER co-partitioned hash join (multi-key): unmatched rows from
    BOTH sides survive with NULL payload from the other side. Key columns
    must share names on both sides (rename upstream); payload column names
    must be disjoint.

    Why not ``Dataset.join(join_type='full_outer')``: Ray's hash-shuffle
    join aggregator builds a partition that received no shards from one side
    as a SCHEMA-LESS empty table (``ray/data/_internal/execution/operators/
    join.py::finalize`` → ``ArrowBlockBuilder().build()``), and the Arrow
    join then dies with "No match ... for key field" — any small or skewed
    input whose hash leaves one side of a partition empty crashes. The
    tagged-union shape sidesteps it structurally: groupby only materializes
    partitions that exist, the union pins ONE schema for both sides, and the
    per-partition Arrow join always sees typed (possibly 0-row) tables.

    Scale shape: identical to the other ordered/relational joins here — both
    (pre-projected) inputs cross the one keyed exchange exactly once, each
    partition joins independently (pyarrow hash join, keys coalesced).

    NULL keys follow SQL semantics: a NULL key never matches (each NULL-key
    row emits as an unmatched outer row — pyarrow's join behavior, pinned by
    test). The exchange routes all NULL-first-key rows to one partition via
    the pinned shard hash, so they stay co-located but unpaired."""
    keys = [on] if isinstance(on, str) else list(on)
    if num_partitions is None:
        num_partitions = default_join_partitions()

    ls, rs = _arrow_schema(left), _arrow_schema(right)
    for reserved in (_SIDE_COL, _PART_COL):
        if reserved in ls.names or reserved in rs.names:
            raise ValueError(f"input dataset already has a {reserved!r} column")
    for k in keys:
        if k not in ls.names or k not in rs.names:
            raise ValueError(f"join key {k!r} must exist on both sides")
    left_payload = [n for n in ls.names if n not in keys]
    right_payload = [n for n in rs.names if n not in keys]
    clash = set(left_payload) & set(right_payload)
    if clash:
        raise ValueError(f"payload columns must be disjoint, both sides have {sorted(clash)}")
    target = pa.schema(
        [
            *[ls.field(k) for k in keys],
            *[ls.field(n) for n in left_payload],
            *[rs.field(n) for n in right_payload],
            pa.field(_SIDE_COL, pa.int8()),
        ]
    )

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            t = t.append_column(
                _SIDE_COL, pa.array(np.full(t.num_rows, side, np.int8))
            )
            t = _null_pad(t, target)
            return t.append_column(
                _PART_COL, _part_of(t[keys[0]], num_partitions)
            )

        return fn

    def per_part(g: pa.Table) -> pa.Table:
        side = g[_SIDE_COL].combine_chunks()
        l = g.filter(pc.equal(side, 0)).select([*keys, *left_payload])
        r = g.filter(pc.equal(side, 1)).select([*keys, *right_payload])
        return l.combine_chunks().join(
            r.combine_chunks(), keys=keys, join_type="full outer"
        ).select(target.names[:-1])

    tagged = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )
    return tagged.groupby(_PART_COL).map_groups(per_part, batch_format="pyarrow")


def semi_anti_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_on: str,
    right_on: str | None = None,
    anti: bool = False,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Distributed SEMI (EXISTS) / ANTI (NOT EXISTS) join: keep left rows
    whose key does (semi) or does not (anti) appear in ``right``.

    Scale shape: the right side is projected to DISTINCT KEYS PER BATCH
    before the exchange (the probe needs membership only — right payload and
    right duplicates never ship), both sides co-partition once on the pinned
    key hash, and each partition task answers membership with one vectorized
    ``pc.is_in``. No pairing, no row multiplication — bytes moved = left
    once + right's unique keys once.

    Reference anchor: the relational family SURVEY §2.4 implies but
    Dataset.join does not provide (inner/outer only)."""
    right_on = right_on or left_on
    if num_partitions is None:
        num_partitions = default_join_partitions()

    left_schema = _arrow_schema(left)
    for reserved in (_SIDE_COL, _PART_COL):
        if reserved in left_schema.names:
            raise ValueError(f"left dataset already has a {reserved!r} column")
    target = pa.schema([*left_schema, pa.field(_SIDE_COL, pa.int8())])

    def tag_left(t: pa.Table) -> pa.Table:
        t = t.append_column(_SIDE_COL, pa.array(np.zeros(t.num_rows, np.int8)))
        t = _null_pad(t, target)
        return t.append_column(_PART_COL, _part_of(t[left_on], num_partitions))

    def tag_right(t: pa.Table) -> pa.Table:
        # drop null right keys: SQL `o.k = c.k` never matches NULL, while
        # is_in with a null in the value_set would match null left keys
        keys = pc.drop_null(pc.unique(t[right_on].combine_chunks()))
        t = pa.table({left_on: keys.cast(left_schema.field(left_on).type)})
        t = t.append_column(_SIDE_COL, pa.array(np.ones(len(keys), np.int8)))
        t = _null_pad(t, target)
        return t.append_column(_PART_COL, _part_of(t[left_on], num_partitions))

    def per_part(g: pa.Table) -> pa.Table:
        side = g[_SIDE_COL].combine_chunks()
        is_right = pc.equal(side, 1)
        probe = pc.unique(g.filter(is_right)[left_on].combine_chunks())
        lrows = g.filter(pc.equal(side, 0)).drop_columns([_SIDE_COL, _PART_COL])
        member = pc.is_in(lrows[left_on].combine_chunks(), value_set=probe)
        keep = pc.invert(member) if anti else member
        return lrows.filter(keep)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )
    return tagged.groupby(_PART_COL).map_groups(per_part, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Bloom-prefiltered join
# ---------------------------------------------------------------------------
def _bloom_hashes(keys: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent stable 64-bit hashes per key (polars fixed-seed hash
    of the string-cast key — the same engine-wide stable-hash choice as
    ``schema.shard_of``), combined downstream by double hashing
    (h1 + i·h2, Kirsch & Mitzenmacher 2006)."""
    import polars as pl

    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    s = pl.from_arrow(keys.cast(pa.string()))
    return (
        s.hash(seed=1).to_numpy().astype(np.uint64),
        s.hash(seed=2).to_numpy().astype(np.uint64),
    )


def _bloom_set(words: np.ndarray, h1: np.ndarray, h2: np.ndarray, k: int, m: int):
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
        np.bitwise_or.at(words, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))


def _bloom_test(words: np.ndarray, h1: np.ndarray, h2: np.ndarray, k: int, m: int):
    hit = np.ones(len(h1), dtype=bool)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
        bit = (words[(idx >> np.uint64(6)).astype(np.int64)]
               >> (idx & np.uint64(63))) & np.uint64(1)
        hit &= bit.astype(bool)
    return hit


def bloom_prefilter_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_on: str,
    right_on: str | None = None,
    m_bits: int = 1 << 22,
    k_hashes: int = 4,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Inner join where the LEFT side is pre-filtered by a Bloom filter of
    the right side's keys before anything is shuffled — the classic
    selective-join optimization: when only a few percent of left rows have
    a partner, the exchange ships those few percent instead of the whole
    fact table. The result is EXACT (bloom false positives survive the
    prefilter but are dropped by the exact co-partitioned join behind it),
    so the SQL twin is a plain inner join.

    Scale shape: the filter is built distributed (one ``m_bits/8``-byte
    bitmap per right block, OR-merged on the driver — bitmaps are key-count
    independent) and broadcast once via ``ray.put``; every left task tests
    its batch vectorized (two stable hashes + double hashing, no Python per
    row). Driver state = one bitmap (512 KB at the default m_bits), NOT the
    key set. Size ``m_bits ≈ 10–16 bits per distinct right key`` to keep
    the false-positive rate ~1% — oversizing only costs broadcast bytes,
    never correctness.
    """
    right_on = left_on if right_on is None else right_on
    n_words = (m_bits + 63) // 64
    # the right side is consumed twice (bloom build + the join behind it);
    # materialize once so its upstream read/transforms don't re-execute —
    # the function's premise is that the right side is small
    right = right.materialize()

    def block_bloom(t: pa.Table) -> pa.Table:
        words = np.zeros(n_words, dtype=np.uint64)
        if t.num_rows:
            h1, h2 = _bloom_hashes(t[right_on])
            _bloom_set(words, h1, h2, k_hashes, m_bits)
        return pa.table({"bloom": pa.array([words.tobytes()], pa.binary())})

    merged = np.zeros(n_words, dtype=np.uint64)
    for row in (
        right.select_columns([right_on])
        .map_batches(block_bloom, batch_format="pyarrow")
        .take_all()
    ):
        merged |= np.frombuffer(row["bloom"], dtype=np.uint64)
    bloom_ref = ray.put(merged)

    def prefilter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        words = ray.get(bloom_ref)  # zero-copy view from the object store
        h1, h2 = _bloom_hashes(t[left_on])
        return t.filter(pa.array(_bloom_test(words, h1, h2, k_hashes, m_bits)))

    pruned = left.map_batches(prefilter, batch_format="pyarrow")
    return shuffle_hash_join(
        pruned, right, left_on, right_on, num_partitions=num_partitions
    )
