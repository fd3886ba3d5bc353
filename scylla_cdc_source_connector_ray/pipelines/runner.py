"""Micro-batch capture runner: the streaming control plane.

≙ the reference's task lifecycle (``ScyllaConnectorTask.java`` §3.2 of
SURVEY.md): restore offsets → loop windows → consume → advance offsets, with
our upgrades — exactly-once idempotent sink and event-time watermarks.

Each micro-batch is one Ray Data pipeline::

    read_parquet(batch files) → map_batches(with_shard)
    → groupby("shard").map_groups(_ShardTask)       # the one keyed shuffle
    → tiny per-shard metrics rows → driver commit

``_ShardTask`` (a Ray task per shard, scheduled by the streaming executor)
does, fully vectorized:

1. read the shard's checkpointed state (last CDC-log row per key) and inject
   it as *seed rows* (``seq = -1``) — the cross-batch analogue of the
   reference's image-correlation accumulator map
   (``ScyllaChangesConsumer.java:104-139``), but stored as Parquet so any
   worker on any node can pick up any shard (no actor affinity problem);
2. run the same :func:`..stages.op_derive.derive_ops` kernel used in batch
   mode — seeds make the per-key state machine continue seamlessly;
3. write the change events to a deterministic ``batch-K/shard=S.parquet``
   (temp + rename) — replays overwrite byte-identically ⇒ exactly-once;
4. write the shard's new state file, return a one-row metrics table.

The driver then atomically commits the manifest (offsets + per-shard
watermarks). Crash anywhere before the commit ⇒ next run replays the batch
onto the same file names. Empty batches still commit (heartbeat semantics,
``ScyllaConnectorConfig.java:350-363``).

Scale notes: state I/O is per-shard and proportional to live keys per shard —
choose ``num_shards ≫ cores`` so state files stay small and the executor can
pipeline shards; the per-batch shuffle moves only that batch's rows, never
the accumulated state.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..config import EngineConfig
from ..schema import SEQ_COL, with_shard
from ..sources.windowed import discover, discover_bucketed, is_bucketed, plan_batches
from ..stages.envelope import build_envelope
from ..stages.op_derive import derive_ops
from ..state.checkpoint import Checkpoint

_STATE_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", SEQ_COL, "shard"]


def _shard_task_from_files(
    item_batch,
    *,
    batch_id: int,
    cfg: EngineConfig,
    ckpt_dir: str,
    out_dir: str,
    prev_watermarks: dict[str, int],
    extras: tuple[tuple[str, str], ...] = (),
) -> pa.Table:
    """Bucketed fast path: one work item = one shard's files for this batch.
    The task reads only its own shard's Parquet (column-pruned, no shuffle) —
    the direct analogue of a reference task SELECTing only its streams."""
    from ..state.retry import RetryPolicy

    retry = RetryPolicy()
    outs = []
    for shard_id, item_paths in zip(item_batch["shard"], item_batch["paths"]):
        paths = list(item_paths)
        tables = [retry.call(lambda p=p: pq.read_table(p)) for p in paths]
        group = pa.concat_tables(tables, promote_options="default")
        if "shard" not in group.column_names:
            group = group.append_column(
                "shard", pa.array([int(shard_id)] * group.num_rows, pa.int32())
            )
        outs.append(
            _shard_task(
                group,
                batch_id=batch_id,
                cfg=cfg,
                ckpt_dir=ckpt_dir,
                out_dir=out_dir,
                prev_watermarks=prev_watermarks,
                extras=extras,
            )
        )
    return pa.concat_tables(outs)


def _pin_strings(tbl: pa.Table) -> pa.Table:
    """Cast large_string→string: polars-backed sort blocks rewrite the string
    encoding per worker, which breaks concat with parquet-read state seeds."""
    for i, f in enumerate(tbl.schema):
        if pa.types.is_large_string(f.type):
            tbl = tbl.set_column(i, f.name, tbl[f.name].cast(pa.string()))
    return tbl


def _with_extras(tbl: pa.Table, extras: tuple[tuple[str, str], ...]) -> pa.Table:
    """Conform a block to the batch's evolved schema: append NULL columns for
    evolved value columns the block predates, pin drifted encodings
    (large_string from promotion) to the manifest type."""
    from ..schema import evolved_type

    for name, type_str in extras:
        typ = evolved_type(type_str)
        if name not in tbl.column_names:
            tbl = tbl.append_column(name, pa.nulls(tbl.num_rows, typ))
        elif tbl.schema.field(name).type != typ:
            i = tbl.column_names.index(name)
            tbl = tbl.set_column(i, name, tbl[name].cast(typ))
    return tbl


#: conv-state feature columns appended to the envelope, with their types —
#: shared by the local enrichment, the salted merge stage and the fixup.
_CSTATE_FEATURES: tuple[tuple[str, pa.DataType], ...] = (
    ("prior_turns", pa.int64()),
    ("prior_chars", pa.int64()),
    ("prev_role", pa.string()),
)


def _append_aligned_features(
    env: pa.Table, enriched: pa.Table, env_seq
) -> pa.Table:
    """Append the conv-state feature columns to ``env``, aligned by ``seq``
    via vectorized searchsorted. Env rows whose seq is absent from
    ``enriched`` (hot rows routed to the salted merge stage) get typed NULLs.
    """
    import numpy as np

    ex_seq = enriched[SEQ_COL].combine_chunks().to_numpy(zero_copy_only=False)
    n_ex, n_env = ex_seq.size, len(env_seq)
    if n_ex == 0:
        for c, typ in _CSTATE_FEATURES:
            env = env.append_column(c, pa.nulls(n_env, typ))
        return env
    order = np.argsort(ex_seq)
    pos = np.minimum(np.searchsorted(ex_seq[order], env_seq), n_ex - 1)
    valid = ex_seq[order][pos] == env_seq
    idx = pa.array(order[pos], pa.int64())
    all_valid = bool(valid.all())
    vmask = pa.array(valid)
    for c, typ in _CSTATE_FEATURES:
        col = pc.take(enriched[c].combine_chunks().cast(typ), idx)
        if not all_valid:
            col = pc.if_else(vmask, col, pa.nulls(n_env, typ))
        env = env.append_column(c, col)
    return env


def _shard_task(
    group: pa.Table,
    *,
    batch_id: int,
    cfg: EngineConfig,
    ckpt_dir: str,
    out_dir: str,
    prev_watermarks: dict[str, int],
    extras: tuple[tuple[str, str], ...] = (),
    salted_sessions: bool = False,
    salted_panes: bool = False,
    salted_pd: bool = False,
    salted_cstate: bool = False,
    hot_convs: frozenset[str] = frozenset(),
) -> pa.Table:
    shard = group["shard"][0].as_py()
    ckpt = Checkpoint(ckpt_dir)
    # schema evolution (reference ST4, ScyllaSchema.java:467-472): the driver
    # derives the batch's evolved value-column set from the file footers; every
    # shard conforms blocks, state seeds and the envelope to that one schema
    extra_names = tuple(n for n, _ in extras)
    value_cols = ("role", "text", "tool", *extra_names, "ts")
    state_cols = [*_STATE_COLS[:5], *extra_names, *_STATE_COLS[5:]]
    if extras:
        group = _with_extras(group, extras)

    # --- late-row metric vs the shard watermark of the previous commit -----
    ts_us = group["ts"].cast(pa.int64())
    wm_prev = prev_watermarks.get(str(shard))
    n_late = 0
    if wm_prev is not None:
        import pyarrow.compute as pc

        n_late = pc.sum(
            pc.less(ts_us, wm_prev - cfg.allowed_lateness_us).cast(pa.int8())
        ).as_py() or 0

    if SEQ_COL in group.column_names and group[SEQ_COL].null_count:
        # schema promotion (some files lack seq) yields NULL seq values that
        # would be misread as state seeds — regenerate for the whole block
        group = group.drop_columns([SEQ_COL])
    if SEQ_COL not in group.column_names:
        # DETERMINISTIC fallback seq: post-shuffle row order is not stable, so
        # derive it from a full-column sort (ties = identical rows, for which
        # any order yields the same fold). Replays then regenerate identical
        # bytes, preserving the exactly-once commit protocol.
        sortable = [
            (c, "ascending")
            for c in ("ts", "conv_id", "turn_idx", "role", "text", "tool", "op_kind", "row_ts")
            if c in group.column_names
        ]
        group = group.sort_by(sortable)
        group = group.append_column(SEQ_COL, pa.array(range(group.num_rows), pa.int64()))

    n_stragglers = 0
    if cfg.image_mode:
        # --- image-mode: correlate PRE/delta/POST; incomplete changes carry
        # over as residual state (reference ST1/ST3) -------------------------
        from ..stages.correlate import correlate_images

        carry_path = ckpt.latest_state_path(shard, batch_id, kind="imgstate")
        carry = pq.read_table(carry_path) if carry_path else None
        derived, residual, n_stragglers = correlate_images(
            group,
            straggler_timeout_us=cfg.straggler_timeout_us,
            carry=carry,
        )
        ckpt.write_state(shard, batch_id, residual, kind="imgstate")
    else:
        # --- row-mode: seed with checkpointed per-key state -----------------
        # Seeds must fold FIRST per key regardless of event time (arrival-order
        # semantics, like the reference consuming cdc\$time order): a late row
        # whose ts precedes the stored state would otherwise sort before the
        # seed and re-emit a spurious 'c'. We sort with an explicit
        # arrival-rank column (seed=0, batch=1) and hand derive_ops the
        # pre-sorted block.
        seed_path = ckpt.latest_state_path(shard, batch_id)
        log = _pin_strings(group.select(state_cols))
        if seed_path is not None:
            # state written before an evolution lacks the new columns → NULLs
            seed = _with_extras(pq.read_table(seed_path), extras).select(state_cols)
            log = pa.concat_tables([seed, log])
        import numpy as np

        arrival = (log[SEQ_COL].combine_chunks().to_numpy(zero_copy_only=False) >= 0).astype(
            "int8"
        )
        log = log.append_column("_arrival", pa.array(arrival))
        log = log.sort_by(
            [
                ("conv_id", "ascending"),
                ("turn_idx", "ascending"),
                ("_arrival", "ascending"),
                ("ts", "ascending"),
                (SEQ_COL, "ascending"),
            ]
        )

        if cfg.partition_deletes and log["turn_idx"].null_count:
            # streaming conversation tombstones (reference M2): markers in
            # this batch apply to everything folded before them — including
            # the checkpointed seeds. Expansion deletes become tombstone
            # state entries, so later rows see a wiped before-image.
            from ..stages.partition_delete import derive_flat_pd

            flat = derive_flat_pd(
                log, value_cols=value_cols, arrival_col="_arrival", full=True
            )
            flat = flat.append_column(
                "shard", pa.array([shard] * flat.num_rows, pa.int32())
            )
            import pyarrow.compute as _pc

            if salted_pd and flat.num_rows:
                # markers were broadcast to every shard (a hot conversation's
                # turn-buckets span an unknown shard set) so each shard's keys
                # fold the wipe; the ``op='pd'`` record itself is emitted only
                # by the conversation's BASE shard — exactly-once like unsalted
                from ..schema import shard_of

                is_marker = _pc.equal(flat["op"], "pd")
                if _pc.any(is_marker).as_py():
                    home = _pc.equal(
                        shard_of(flat["conv_id"], cfg.num_shards),
                        pa.scalar(shard, pa.int32()),
                    )
                    flat = flat.filter(_pc.or_(_pc.invert(is_marker), home))

            derived = flat.filter(_pc.not_equal(flat["op"], "pd")).sort_by(
                [("conv_id", "ascending"), ("turn_idx", "ascending"), ("_foldpos", "ascending")]
            )
            events_src = flat.drop_columns(["_foldpos"])
        else:
            log = log.drop_columns(["_arrival"])
            derived = derive_ops(log, sorted_input=True, value_cols=value_cols)
            events_src = derived

    # --- roll state forward: last row per key, stored log-shaped -----------
    # derived is key-contiguous in fold order ⇒ last row per key is where the
    # next row's key differs (vectorized mask). (Image mode keeps its
    # residual as imgstate instead — preimages travel in the log.)
    import numpy as np
    import pyarrow.compute as pc

    if cfg.image_mode:
        events_src = derived
    n = derived.num_rows if not cfg.image_mode else 0
    conv = derived["conv_id"].combine_chunks()
    turn = derived["turn_idx"].combine_chunks()
    if n:
        nxt_same = pc.and_(
            pc.equal(conv.slice(0, n - 1), conv.slice(1)),
            pc.equal(turn.slice(0, n - 1), turn.slice(1)),
        ).to_numpy(zero_copy_only=False)
        is_last = np.ones(n, dtype=bool)
        is_last[:-1] = ~nxt_same
    else:
        is_last = np.zeros(0, dtype=bool)
    last = derived.filter(pa.array(is_last)) if not cfg.image_mode else derived.slice(0, 0)
    state_cols_out = {
        "conv_id": last["conv_id"],
        "turn_idx": last["turn_idx"],
        # tombstone state keeps role marker + NULL text; live state keeps after image
        "role": pc.if_else(
            pc.equal(last["op"], "d"),
            pa.scalar("__tombstone__"),
            last["after_role"].combine_chunks(),
        ),
        "text": last["after_text"],
        "tool": last["after_tool"],
    }
    for name in extra_names:
        state_cols_out[name] = last["after_" + name]
    state_cols_out["ts"] = last["ts"]  # event ts (tombstones too: keeps seed order)
    state_cols_out[SEQ_COL] = pa.array(np.full(last.num_rows, -1, dtype=np.int64))
    state_cols_out["shard"] = last["shard"]
    new_state = pa.table(state_cols_out)
    if not cfg.image_mode:
        ckpt.write_state(shard, batch_id, new_state)

    # --- emit change events for real rows only (drop seed re-derivations) --
    real = events_src.filter(pc.greater_equal(events_src[SEQ_COL], 0))
    env = build_envelope(real, cfg, value_cols=value_cols)

    if cfg.score_text:
        from ..functions.textops import quality_score

        scored = quality_score(
            real.select(["conv_id"]).append_column("text", real["after_text"]), "text"
        )
        for c in ("stat_chars", "stat_words", "stat_punct", "stat_stop", "quality"):
            env = env.append_column(c, scored[c])

    # --- watermark-gated window aggregation (north_star windows) -----------
    n_late_dropped = 0
    if cfg.window_agg and real.num_rows:
        if salted_panes:
            # hierarchical path: this salted sub-shard only computes partial
            # panes; the per-base-shard merge stage owns state/emission
            from .stream_agg import window_partials

            n_late_dropped += window_partials(
                real, shard, batch_id, cfg, out_dir, prev_watermarks
            )
        else:
            n_late_dropped += _window_panes(
                real, shard, batch_id, cfg, ckpt, out_dir, wm_prev
            )
    if cfg.sliding_window_us is not None and real.num_rows:
        from .stream_agg import sliding_panes

        size, slide = cfg.sliding_window_us
        n_late_dropped += sliding_panes(
            real, shard, batch_id, cfg, ckpt, out_dir, wm_prev, size, slide
        )
    if cfg.session_gap_us is not None and real.num_rows:
        if salted_sessions:
            # hierarchical path: this salted sub-shard only computes partial
            # intervals; the per-conversation merge stage owns state/emission
            from .stream_agg import session_partials

            n_late_dropped += session_partials(
                real, shard, batch_id, cfg, out_dir, prev_watermarks, cfg.session_gap_us
            )
        else:
            from .stream_agg import session_state

            n_late_dropped += session_state(
                real, shard, batch_id, cfg, ckpt, out_dir, wm_prev, cfg.session_gap_us
            )

    # --- persistent per-conversation state join (north_star join) ----------
    if cfg.enrich_conv_state:
        from ..stages.join import CONV_STATE_SCHEMA, conv_state_prefix

        import numpy as np

        genrich = group
        if salted_cstate and hot_convs:
            # hierarchical salted conv-state (north_star skew clause × the
            # stream-state join): this salted sub-shard enriches only its
            # NON-hot conversations; hot rows are slimmed to ~40 B/row
            # (conv_id, ts, seq, role, chars) and handed to the per-BASE-shard
            # merge stage (CaptureRunner._merge_cstate_partials), which owns
            # the hot conversations' cstate store and computes the prefix in
            # global (ts, seq) order. The envelope keeps typed NULLs here;
            # _fixup_cstate_env patches them in place before commit.
            from ..schema import shard_of

            conv_np = group["conv_id"].combine_chunks().to_numpy(zero_copy_only=False)
            hot_np = np.isin(conv_np, list(hot_convs))
            if hot_np.any():
                from .stream_agg import _atomic_pq as _apq

                hot_rows = group.filter(pa.array(hot_np))
                part = pa.table(
                    {
                        "conv_id": hot_rows["conv_id"].combine_chunks().cast(pa.string()),
                        "ts": hot_rows["ts"].combine_chunks(),
                        SEQ_COL: hot_rows[SEQ_COL].combine_chunks().cast(pa.int64()),
                        "role": hot_rows["role"].combine_chunks().cast(pa.string()),
                        "chars": pc.fill_null(
                            pc.utf8_length(hot_rows["text"].combine_chunks()), 0
                        ).cast(pa.int64()),
                        "sub_shard": pa.array(
                            np.full(hot_rows.num_rows, shard, np.int32), pa.int32()
                        ),
                        "base_shard": shard_of(hot_rows["conv_id"], cfg.num_shards),
                    }
                )
                _apq(
                    part,
                    os.path.join(
                        out_dir,
                        "_cstate_partials",
                        f"batch-{batch_id:06d}",
                        f"shard={shard}.parquet",
                    ),
                )
                genrich = group.filter(pa.array(~hot_np))

        cseed_path = ckpt.latest_state_path(shard, batch_id, kind="cstate")
        cseed = pq.read_table(cseed_path) if cseed_path else None
        enriched, new_cstate = conv_state_prefix(genrich, seed=cseed)
        ckpt.write_state(
            shard, batch_id, new_cstate.select(CONV_STATE_SCHEMA.names), kind="cstate"
        )
        # align by seq with a vectorized searchsorted (pyarrow join can't
        # carry struct payload columns); env rows NOT enriched here (hot rows
        # under salting) get typed NULLs for the fixup stage to fill
        env_seq = env[SEQ_COL].combine_chunks().to_numpy(zero_copy_only=False)
        env = _append_aligned_features(env, enriched, env_seq)
    from .stream_agg import _atomic_pq

    _atomic_pq(env, os.path.join(out_dir, f"batch-{batch_id:06d}", f"shard={shard}.parquet"))

    max_ts = pc.max(real["ts"].cast(pa.int64())).as_py() if real.num_rows else None
    # capture-latency distribution (event time): how far behind the batch
    # frontier the events were when committed — p50/p95 of (max_ts − ts).
    # A distribution, not a single batch-lag estimate: skewed shards show a
    # long p95 even when the median is fresh.
    lag_p50 = lag_p95 = None
    if real.num_rows and max_ts is not None:
        lags = max_ts - real["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        lag_p50 = int(np.percentile(lags, 50))
        lag_p95 = int(np.percentile(lags, 95))
    return pa.table(
        {
            "shard": pa.array([shard], pa.int32()),
            "n_events": pa.array([real.num_rows], pa.int64()),
            "n_late": pa.array([int(n_late)], pa.int64()),
            "n_late_dropped": pa.array([int(n_late_dropped)], pa.int64()),
            "n_stragglers": pa.array([int(n_stragglers)], pa.int64()),
            "max_ts_us": pa.array([max_ts], pa.int64()),
            "lag_p50_us": pa.array([lag_p50], pa.int64()),
            "lag_p95_us": pa.array([lag_p95], pa.int64()),
        }
    )


def _conform_envelope_to(p: pa.Table, target: pa.StructType) -> pa.Table:
    """Widen one envelope table's before/after structs to ``target`` (NULL
    child arrays for evolved fields the table predates)."""
    import pyarrow.compute as pc

    for img in ("before", "after"):
        s = p[img].combine_chunks()
        if s.type == target:
            continue
        have = {f.name for f in s.type}
        children = [
            pc.struct_field(s, f.name) if f.name in have else pa.nulls(len(s), f.type)
            for f in target
        ]
        rebuilt = pa.StructArray.from_arrays(
            children, names=[f.name for f in target], mask=pc.is_null(s)
        )
        p = p.set_column(p.column_names.index(img), img, rebuilt)
    return p


def _conform_envelopes(parts: list[pa.Table]) -> list[pa.Table]:
    """Unify envelope tables written before/after a schema evolution: the
    widest before/after row struct wins; older parts get NULL child arrays for
    the evolved fields (the reference re-reads old records under the new
    schema the same way, ScyllaSchema.java:467-472)."""
    target = None
    for p in parts:
        if "before" not in p.column_names:
            return parts
        t = p.schema.field("before").type
        if target is None or t.num_fields > target.num_fields:
            target = t
    if all(p.schema.field("before").type == target for p in parts):
        return parts
    return [_conform_envelope_to(p, target) for p in parts]


def _pane_cols(cfg) -> list[str]:
    return [*cfg.window_agg_keys, "window_start_us", "n_events", "n_chars"]


def _window_panes(
    real: pa.Table,
    shard: int,
    batch_id: int,
    cfg: EngineConfig,
    ckpt: Checkpoint,
    out_dir: str,
    wm_prev: int | None,
) -> int:
    """Merge this batch's rows into the shard's tumbling-window pane state,
    emit panes finalized by the new watermark, route too-late rows aside.

    Deterministic on replay: inputs are (batch rows, pane state from the
    previous COMMITTED batch, manifest watermark) — all stable under replay.
    Returns the number of late-dropped rows (reference analogue: straggler
    drop + error log, ``ScyllaChangesConsumer.java:147-174``; ours routes
    them to a ``late/`` side output instead of losing them).
    """
    import numpy as np
    import pyarrow.compute as pc

    W = cfg.window_size_us
    ts_us = real["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
    win = ts_us - (ts_us % W)

    # rows whose window was finalized before this batch → late side-output
    prev_thr = (wm_prev - cfg.allowed_lateness_us) if wm_prev is not None else None
    late_mask = (win + W <= prev_thr) if prev_thr is not None else np.zeros(len(win), dtype=bool)
    n_late_dropped = int(late_mask.sum())
    from .stream_agg import _chars, _write_late

    if n_late_dropped:
        _write_late(real.filter(pa.array(late_mask)), out_dir, "tumbling", batch_id, shard)

    ontime = real.filter(pa.array(~late_mask)) if n_late_dropped else real
    win_ok = win[~late_mask]
    chars = _chars(ontime)
    pane_cols = _pane_cols(cfg)
    group_keys = [*cfg.window_agg_keys, "window_start_us"]
    raw = {k: ontime[k] for k in cfg.window_agg_keys}
    raw["window_start_us"] = pa.array(win_ok, pa.int64())
    raw["n_events"] = pa.array(np.ones(len(win_ok), dtype=np.int64))
    raw["n_chars"] = pa.array(chars, pa.int64())
    from ..schema import select_agg

    pane_renames = [("n_events_sum", "n_events"), ("n_chars_sum", "n_chars")]
    partial = select_agg(
        pa.table(raw).group_by(group_keys).aggregate([("n_events", "sum"), ("n_chars", "sum")]),
        group_keys,
        pane_renames,
    )
    new_wm = max(wm_prev or 0, int(ts_us.max()))
    _fold_pane_state(partial, new_wm, shard, batch_id, cfg, ckpt, out_dir)
    return n_late_dropped


def _fold_pane_state(
    partial: pa.Table,
    new_wm: int,
    shard: int,
    batch_id: int,
    cfg: EngineConfig,
    ckpt: Checkpoint,
    out_dir: str,
) -> None:
    """Seed-merge + watermark-finalize + emit + state roll-forward for one
    shard's tumbling panes. Shared by the in-shard path (:func:`_window_panes`)
    and the salted per-base-shard merge stage
    (:meth:`CaptureRunner._merge_window_partials`) — the merge stage hands in
    UN-merged partials from several sub-shards, so the fold always
    re-aggregates (sum is idempotent over already-merged panes)."""
    from ..schema import select_agg

    W = cfg.window_size_us
    pane_cols = _pane_cols(cfg)
    group_keys = [*cfg.window_agg_keys, "window_start_us"]
    pane_renames = [("n_events_sum", "n_events"), ("n_chars_sum", "n_chars")]
    parts = [partial.select(pane_cols)]
    seed_path = ckpt.latest_state_path(shard, batch_id, kind="wstate")
    if seed_path is not None:
        parts.insert(0, pq.read_table(seed_path).select(pane_cols))
    partial = select_agg(
        pa.concat_tables(parts)
        .group_by(group_keys)
        .aggregate([("n_events", "sum"), ("n_chars", "sum")]),
        group_keys,
        pane_renames,
    )
    thr = new_wm - cfg.allowed_lateness_us
    ws = partial["window_start_us"].to_numpy(zero_copy_only=False)
    final_mask = ws + W <= thr
    finalized = partial.filter(pa.array(final_mask)).sort_by(
        [(k, "ascending") for k in group_keys]
    )
    remaining = partial.filter(pa.array(~final_mask))
    if finalized.num_rows:
        from .stream_agg import _atomic_pq

        finalized = finalized.append_column(
            "shard", pa.array([shard] * finalized.num_rows, pa.int32())
        )
        _atomic_pq(
            finalized,
            os.path.join(out_dir, "windows", f"batch-{batch_id:06d}", f"shard={shard}.parquet"),
        )
    ckpt.write_state(shard, batch_id, remaining, kind="wstate")


class CaptureRunner:
    """Checkpointed micro-batch CDC capture over an append-only log dir."""

    def __init__(
        self,
        log_dir: str,
        cfg: EngineConfig,
        out_dir: str | None = None,
        ckpt_dir: str | None = None,
    ):
        self.log_dir = log_dir
        self.cfg = cfg
        self.out_dir = out_dir or cfg.sink_dir
        self.ckpt = Checkpoint(ckpt_dir or cfg.checkpoint_dir)
        self.metrics: list[dict] = []

    def run(
        self,
        max_batches: int | None = None,
        files_per_batch: int = 1,
        crash_before_commit_at: int | None = None,
        log_complete: bool = True,
        hot_convs: list[str] | None = None,
        auto_detect_hot: bool = False,
    ) -> dict:
        """Consume unconsumed log files; returns run totals.

        ``crash_before_commit_at=k``: simulate a hard kill after the k-th
        processed batch's data+state writes but BEFORE its manifest commit
        (the worst-case crash point for exactly-once).

        ``auto_detect_hot``: on a FRESH start over an unpartitioned log,
        pre-scan the first batch's ``conv_id`` column (single-column read)
        and salt conversations exceeding ``cfg.hot_key_threshold`` rows.

        ``hot_convs``: conversations to salt across sub-shards (north_star
        skew clause). Recorded in the manifest at the first commit and FIXED
        for the epoch (keyed state lives per shard — reassigning a key's
        shard mid-epoch would orphan its state; changing the hot set is a
        generation change, like ``num_shards``). Only meaningful for the
        unpartitioned (shuffle) log layout — a pre-bucketed log fixed its
        placement at write time.
        """
        import fcntl

        # single-writer guard: two runners on one checkpoint would interleave
        # state files nondeterministically (≙ Kafka Connect's single task
        # ownership per partition). Advisory flock held for the run.
        os.makedirs(self.ckpt.dir, exist_ok=True)  # dir may vanish between
        # Checkpoint construction and run() (tests, operator cleanup)
        self._lock_f = open(os.path.join(self.ckpt.dir, "runner.lock"), "w")
        try:
            fcntl.flock(self._lock_f, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            self._lock_f.close()
            raise RuntimeError(
                f"another runner holds the checkpoint lock at {self.ckpt.dir}"
            ) from None
        try:
            return self._run_locked(
                max_batches,
                files_per_batch,
                crash_before_commit_at,
                log_complete,
                hot_convs,
                auto_detect_hot,
            )
        finally:
            self._release_lock()

    def _run_locked(
        self,
        max_batches,
        files_per_batch,
        crash_before_commit_at,
        log_complete,
        hot_convs,
        auto_detect_hot,
    ) -> dict:
        # 2/7) config combinations the data plane cannot compute correctly
        if self.cfg.image_mode and self.cfg.enrich_conv_state:
            raise ValueError(
                "image_mode treats each PRE/delta/POST row as a physical row; "
                "conv-state enrichment would triple-count turns — disable one"
            )
        if self.cfg.partition_deletes and self.cfg.image_mode:
            raise ValueError(
                "partition_deletes needs the row-mode state store; image_mode "
                "correlates preimages instead — disable one"
            )
        if self.cfg.partition_deletes and self.cfg.enrich_conv_state:
            raise ValueError(
                "partition_deletes synthesizes expansion deletes that share the "
                "marker's seq; conv-state enrichment aligns by seq — disable one"
            )

        from ..state.checkpoint import current_hash_impl

        hash_impl = current_hash_impl()
        last = self.ckpt.last_committed()
        if last is not None and last.get("hash_impl", hash_impl) != hash_impl:
            # the stable shard hash is stable per polars version; a different
            # version could remap keys to other shards and orphan their state
            raise ValueError(
                f"checkpoint used shard hash {last.get('hash_impl')} but this "
                f"session has {hash_impl}; bump cfg.epoch and re-shard"
            )
        self._hash_impl = hash_impl
        if last is not None and (
            last.get("num_shards") != self.cfg.num_shards
            or last.get("epoch") != self.cfg.epoch
        ):
            # ≙ the reference's generation change: a different stream/topology
            # layout must start a new epoch, never silently mix shard layouts
            # (stale shard=K state/output files would survive a re-shard)
            raise ValueError(
                f"checkpoint was written with num_shards={last.get('num_shards')} "
                f"epoch={last.get('epoch')} but config has num_shards="
                f"{self.cfg.num_shards} epoch={self.cfg.epoch}; bump cfg.epoch "
                "and use a fresh sink/checkpoint dir to re-shard"
            )
        consumed = last["consumed_files"] if last else 0
        next_batch = (last["batch_id"] + 1) if last else 0
        # sticky evolved-column set survives resume via the manifest (a replay
        # must re-derive byte-identical schemas)
        self._extras: dict[str, str] = dict(last.get("value_cols_extra", {})) if last else {}
        watermarks: dict[str, int] = dict(last["watermarks"]) if last else {}
        if last is not None:
            committed_hot = last.get("hot_convs", [])
            if hot_convs is not None and sorted(hot_convs) != committed_hot:
                raise ValueError(
                    "hot_convs differs from the checkpointed set; changing the "
                    "hot set is an epoch bump (fresh checkpoint dir)"
                )
            hot_convs = committed_hot
        elif hot_convs is None and auto_detect_hot and not is_bucketed(self.log_dir):
            # fresh start: cheap pre-scan of the FIRST batch's conv_id column
            # (footer-pruned read, one column) to pick the hot set BEFORE any
            # state is placed — detection after batch 0 would orphan keys
            hot_convs = self._detect_hot_first_batch(files_per_batch)
        self._hot = frozenset(hot_convs or [])
        # Every conversation-level stateful stage now COMPOSES with salting:
        # session windows and conv-keyed panes via the hierarchical
        # partial→merge paths (session_partials / window_partials + the
        # per-base-shard merge stages); partition deletes via marker
        # broadcast + base-shard-only 'pd' emission; conv-state enrichment
        # via the slim-row merge + in-place envelope fixup
        # (_merge_cstate_partials / _fixup_cstate_env).

        def _lookback_skip(maxes: list[int | None]) -> int:
            """Cold-start lookback (≙ scylla.initial.lookback.ms,
            ScyllaConnectorTask.java:153-213): count of LEADING files/windows
            whose footer max-ts predates (log frontier − lookback). Only the
            prefix is skipped — positional offsets can't hole-punch, and the
            windowed log is time-ordered by construction."""
            known = [x for x in maxes if x is not None]
            if not known:
                return 0
            cutoff = max(known) - self.cfg.initial_lookback_us
            skip = 0
            for mx in maxes:
                if mx is not None and mx < cutoff:
                    skip += 1
                else:
                    break
            return skip

        fresh_lookback = last is None and self.cfg.initial_lookback_us is not None
        bucketed = is_bucketed(self.log_dir)
        frontier_us = None
        if bucketed:
            windows = discover_bucketed(self.log_dir)

            # tail mode must survive a concurrent writer's in-flight shard
            # file (footer written last): treat it as "window not yet
            # arrived" (max_ts None stalls eligibility from that window on)
            # rather than crashing the poll. Complete logs keep raising.
            def _wmax(by_shard: dict) -> int | None:
                from ..sources.windowed import _ts_stats, ts_stats_or_none

                stats = _ts_stats if log_complete else ts_stats_or_none
                mx = None
                for p in by_shard.values():
                    lf = stats(p)
                    if lf is None:
                        return None
                    if lf.max_ts_us is not None:
                        mx = lf.max_ts_us if mx is None else max(mx, lf.max_ts_us)
                return mx

            if fresh_lookback and windows:
                consumed = max(
                    consumed,
                    _lookback_skip([_wmax(by_shard) for _name, by_shard in windows]),
                )
            if not log_complete and windows:
                # confidence-window holdback at window granularity: a window's
                # max ts = max over its per-shard files' footer stats (cached)
                wmax = [_wmax(by_shard) for _name, by_shard in windows]
                known = [x for x in wmax if x is not None]
                frontier = max(known) if known else None
                eligible = consumed
                for i in range(consumed, len(windows)):
                    mx = wmax[i]
                    if (
                        frontier is not None
                        and mx is not None
                        and mx <= frontier - self.cfg.confidence_window_us
                    ):
                        eligible = i + 1
                    else:
                        break
                tail = windows[consumed:eligible]
            else:
                tail = windows[consumed:]
            batches = [
                tail[i : i + files_per_batch] for i in range(0, len(tail), files_per_batch)
            ]
        else:
            files = discover(self.log_dir, tail=not log_complete)
            stats = [f.max_ts_us for f in files if f.max_ts_us is not None]
            frontier_us = max(stats) if stats else None
            if fresh_lookback and files:
                consumed = max(consumed, _lookback_skip([f.max_ts_us for f in files]))
            batches = plan_batches(
                files,
                consumed,
                files_per_batch,
                self.cfg.confidence_window_us,
                log_complete,
            )
        if max_batches is not None:
            batches = batches[:max_batches]

        totals = {"batches": 0, "events": 0, "late": 0}
        return self._run_batches(
            batches, next_batch, consumed, watermarks, frontier_us, totals,
            crash_before_commit_at, bucketed,
        )

    def _run_batches(
        self, batches, next_batch, consumed, watermarks, frontier_us, totals,
        crash_before_commit_at, bucketed,
    ) -> dict:
        from ..schema import detect_evolved_cols

        for i, bwork in enumerate(batches):
            batch_id = next_batch + i
            if self.cfg.min_batch_interval_s > 0:
                # reader throttle (≙ scylla.minimal.wait.for.window.size.ms):
                # pace consecutive windows to at least the configured
                # interval. The timestamp lives on self so pacing spans
                # run() calls — follow() consumes one batch per poll, the
                # exact continuous-reader scenario the throttle targets.
                prev = getattr(self, "_last_batch_t0", None)
                if prev is not None:
                    elapsed = time.perf_counter() - prev
                    if elapsed < self.cfg.min_batch_interval_s:
                        time.sleep(self.cfg.min_batch_interval_s - elapsed)
                self._last_batch_t0 = time.perf_counter()
            t0 = time.perf_counter()
            # schema evolution (ST4): union the batch's file footers into the
            # sticky evolved-column set — once a column appears it stays (its
            # values live in checkpointed state), and every shard of a batch
            # sees the SAME schema, like the reference's per-generation
            # schema recompute (ScyllaSchema.java:467-472). Bucketed windows
            # share one schema; probe one footer per window.
            if bucketed:
                probe = [next(iter(by_shard.values())) for _name, by_shard in bwork]
            else:
                probe = [f.path for f in bwork]
            allow = self.cfg.evolved_col_allowlist
            for p in probe:
                for name, type_str in detect_evolved_cols(pq.read_schema(p)).items():
                    if allow is not None and name not in allow:
                        continue  # stray/metadata column: never adopt silently
                    if name not in self._extras and len(self._extras) >= self.cfg.max_evolved_cols:
                        raise ValueError(
                            f"log file {p} would adopt evolved column {name!r} "
                            f"beyond max_evolved_cols={self.cfg.max_evolved_cols}; "
                            "adoption is sticky (manifest) — set "
                            "evolved_col_allowlist to the intended columns or "
                            "raise max_evolved_cols"
                        )
                    self._extras.setdefault(name, type_str)
            extras = tuple(sorted(self._extras.items()))
            if bucketed:
                shard_paths: dict[int, list[str]] = {}
                for _name, by_shard in bwork:
                    for k, p in by_shard.items():
                        shard_paths.setdefault(k, []).append(p)
                stats = self._process_batch_bucketed(batch_id, shard_paths, watermarks, extras)
            else:
                stats = self._process_batch(
                    batch_id, [f.path for f in bwork], watermarks, extras
                )
            for row in stats:
                if row["max_ts_us"] is not None:
                    k = str(row["shard"])
                    watermarks[k] = max(watermarks.get(k, 0), row["max_ts_us"])
                totals["events"] += row["n_events"]
                totals["late"] += row["n_late"]
                totals["late_dropped"] = totals.get("late_dropped", 0) + row.get(
                    "n_late_dropped", 0
                )
            if self._hot and self.cfg.session_gap_us is not None:
                # hierarchical salted sessions: merge stage runs before the
                # commit so its state/emissions replay with the batch
                for row in self._merge_session_partials(batch_id, watermarks):
                    k = f"sess:{row['base_shard']}"
                    watermarks[k] = max(watermarks.get(k, 0), row["max_ts_us"])
            if self._hot and self.cfg.window_agg and "conv_id" in self.cfg.window_agg_keys:
                # hierarchical salted conv-keyed panes: same replay contract
                for row in self._merge_window_partials(batch_id, watermarks):
                    k = f"win:{row['base_shard']}"
                    watermarks[k] = max(watermarks.get(k, 0), row["max_ts_us"])
            if self._hot and self.cfg.enrich_conv_state:
                # hierarchical salted conv-state: slim-row merge per base
                # shard, then in-place envelope fixup — both before the
                # commit so a replayed batch regenerates them byte-stable
                self._merge_cstate_partials(batch_id)
                self._fixup_cstate_env(batch_id)
            if crash_before_commit_at is not None and i >= crash_before_commit_at:
                totals["crashed"] = True
                return totals
            consumed += len(bwork)
            self.ckpt.commit(
                batch_id,
                {
                    "consumed_files": consumed,
                    "watermarks": watermarks,
                    "epoch": self.cfg.epoch,
                    "num_shards": self.cfg.num_shards,
                    "hot_convs": sorted(self._hot),
                    "hash_impl": self._hash_impl,
                    "events": totals["events"],
                    "value_cols_extra": dict(sorted(self._extras.items())),
                },
            )
            self.ckpt.gc_state(keep_batches=2)
            if self._hot:
                # partials are scratch: a replay regenerates them before the
                # merge re-runs, so they are safe to drop once committed
                import shutil

                for scratch in ("_session_partials", "_window_partials", "_cstate_partials", "_cstate_features"):
                    shutil.rmtree(
                        os.path.join(self.out_dir, scratch, f"batch-{batch_id:06d}"),
                        ignore_errors=True,
                    )
            totals["batches"] += 1
            sec = time.perf_counter() - t0
            m = {
                "batch_id": batch_id,
                "events": sum(r["n_events"] for r in stats),
                "late": sum(r["n_late"] for r in stats),
                "late_dropped": sum(r.get("n_late_dropped", 0) for r in stats),
                "stragglers": sum(r.get("n_stragglers", 0) for r in stats),
                "shards_active": len(stats),
                "sec": round(sec, 3),
                "events_per_sec": round(sum(r["n_events"] for r in stats) / max(sec, 1e-9), 1),
                "watermark_min_us": min(watermarks.values()) if watermarks else None,
                "watermark_max_us": max(watermarks.values()) if watermarks else None,
                # worst-shard capture-latency distribution (event time)
                "capture_lag_p50_us": max(
                    (r["lag_p50_us"] for r in stats if r.get("lag_p50_us") is not None),
                    default=None,
                ),
                "capture_lag_p95_us": max(
                    (r["lag_p95_us"] for r in stats if r.get("lag_p95_us") is not None),
                    default=None,
                ),
                # catch-up lag: newest event available in the log vs newest
                # event consumed (event-time capture latency proxy)
                "frontier_lag_us": (
                    frontier_us - max(watermarks.values())
                    if frontier_us is not None and watermarks
                    else None
                ),
            }
            self.metrics.append(m)
            # per-batch metrics file (north_rule: lineage + metrics); atomic
            import json as _json

            from ..state.checkpoint import _atomic_write

            _atomic_write(
                os.path.join(self.ckpt.dir, "metrics", f"batch-{batch_id:06d}.json"),
                _json.dumps(m, sort_keys=True).encode(),
            )
        return totals

    def _release_lock(self) -> None:
        import fcntl

        f = getattr(self, "_lock_f", None)
        if f is not None and not f.closed:
            fcntl.flock(f, fcntl.LOCK_UN)
            f.close()

    def follow(
        self,
        poll_interval_s: float = 0.5,
        idle_polls: int = 10,
        files_per_batch: int = 1,
        max_wall_s: float | None = None,
    ) -> dict:
        """Live tailing (≙ the reference's continuous worker loop with
        ``poll.interval.ms``): repeatedly discover + consume new log files,
        holding back the confidence window (``log_complete=False``). Stops
        after ``idle_polls`` consecutive polls with no new data, or after
        ``max_wall_s``. Resumable like any run — offsets advance per batch."""
        totals = {"batches": 0, "events": 0, "late": 0, "polls": 0}
        idle = 0
        t0 = time.monotonic()
        while idle < idle_polls:
            if max_wall_s is not None and time.monotonic() - t0 > max_wall_s:
                break
            tot = self.run(files_per_batch=files_per_batch, log_complete=False)
            totals["polls"] += 1
            if tot["batches"] == 0:
                idle += 1
                time.sleep(poll_interval_s)
            else:
                idle = 0
                totals["batches"] += tot["batches"]
                totals["events"] += tot["events"]
                totals["late"] += tot["late"]
        return totals

    def _detect_hot_first_batch(self, files_per_batch: int) -> list[str]:
        from collections import Counter

        files = discover(self.log_dir)[:files_per_batch]
        counts: Counter = Counter()
        for f in files:
            t = pq.read_table(f.path, columns=["conv_id"])
            import pyarrow.compute as pc

            vc = pc.value_counts(t["conv_id"].combine_chunks())
            for rec in vc.to_pylist():
                counts[rec["values"]] += rec["counts"]
        return sorted(c for c, n in counts.items() if n >= self.cfg.hot_key_threshold)

    def _process_batch_bucketed(
        self,
        batch_id: int,
        shard_paths: dict[int, list[str]],
        watermarks: dict,
        extras: tuple[tuple[str, str], ...] = (),
    ) -> list[dict]:
        """Shuffle-free path for pre-partitioned logs: one Ray Data work item
        per shard, each task reads only its shard's files."""
        if not shard_paths:
            return []
        cfg, ckpt_dir, out_dir = self.cfg, self.ckpt.dir, self.out_dir
        wm = dict(watermarks)
        # flat item schema (no nested dicts): dict-typed columns defeat the
        # executor's schema hashing and spam per-batch warnings
        items = [
            {"shard": k, "paths": paths} for k, paths in sorted(shard_paths.items())
        ]
        ds = ray.data.from_items(items)
        stats_ds = ds.map_batches(
            lambda b: _shard_task_from_files(
                b,
                batch_id=batch_id,
                cfg=cfg,
                ckpt_dir=ckpt_dir,
                out_dir=out_dir,
                prev_watermarks=wm,
                extras=extras,
            ),
            batch_size=1,
            batch_format="pandas",
        )
        return stats_ds.take_all()

    def _process_batch(
        self,
        batch_id: int,
        paths: list[str],
        watermarks: dict,
        extras: tuple[tuple[str, str], ...] = (),
    ) -> list[dict]:
        if not paths:
            return []
        cfg, ckpt_dir, out_dir = self.cfg, self.ckpt.dir, self.out_dir
        ds = ray.data.read_parquet(paths)

        def normalize(b: pa.Table) -> pa.Table:
            # blocks from files with/without seq (or predating an evolved
            # column) must share one schema or the sort-shuffle merge fails;
            # NULL seqs are regenerated per shard
            if SEQ_COL not in b.column_names:
                b = b.append_column(SEQ_COL, pa.nulls(b.num_rows, pa.int64()))
            if extras:
                # canonical column order: a pre-evolution block appends the
                # new columns at the end, a post-evolution file may carry them
                # mid-schema — the shuffle needs one block schema
                b = _with_extras(b, extras).select(
                    ["conv_id", "turn_idx", "role", "text", "tool", "ts", SEQ_COL]
                    + [n for n, _ in extras]
                )
            return b

        ds = ds.map_batches(normalize, batch_format="pyarrow")
        hot = self._hot
        salted_pd = bool(hot) and cfg.partition_deletes
        if hot:
            from ..stages.salt import with_salted_shard

            salt_chunk = max(1, cfg.hot_key_threshold // cfg.salt_factor)

            def assign(b: pa.Table) -> pa.Table:
                import numpy as np
                import pyarrow.compute as pc

                if salted_pd and b["turn_idx"].null_count:
                    # conversation tombstones are CONTROL messages: a hot
                    # conversation's turn-buckets span an unknown shard set
                    # (state from any earlier batch), so the marker is
                    # broadcast to every shard — rare by definition, O(shards)
                    # tiny rows. Each shard folds the wipe over its own keys;
                    # only the base shard emits the 'pd' record (see
                    # _shard_task's home filter).
                    is_m = pc.is_null(b["turn_idx"])
                    markers = b.filter(is_m)
                    rows = with_salted_shard(
                        b.filter(pc.invert(is_m)), cfg.num_shards, hot, salt_chunk
                    )
                    k = markers.num_rows
                    rep = markers.take(
                        pa.array(np.repeat(np.arange(k), cfg.num_shards), pa.int64())
                    ).append_column(
                        "shard",
                        pa.array(np.tile(np.arange(cfg.num_shards), k).astype("int32")),
                    )
                    return pa.concat_tables([rows, rep.select(rows.column_names)])
                return with_salted_shard(b, cfg.num_shards, hot, salt_chunk)

            ds = ds.map_batches(assign, batch_format="pyarrow")
        else:
            ds = ds.map_batches(lambda b: with_shard(b, cfg.num_shards), batch_format="pyarrow")
        wm = dict(watermarks)  # tiny; captured by closure (ray.put for huge shard counts)
        salted_sessions = bool(hot) and cfg.session_gap_us is not None
        salted_panes = bool(hot) and cfg.window_agg and "conv_id" in cfg.window_agg_keys
        salted_cstate = bool(hot) and cfg.enrich_conv_state
        stats_ds = ds.groupby("shard").map_groups(
            lambda g: _shard_task(
                g,
                batch_id=batch_id,
                cfg=cfg,
                ckpt_dir=ckpt_dir,
                out_dir=out_dir,
                prev_watermarks=wm,
                extras=extras,
                salted_sessions=salted_sessions,
                salted_panes=salted_panes,
                salted_pd=salted_pd,
                salted_cstate=salted_cstate,
                hot_convs=hot,
            ),
            batch_format="pyarrow",
        )
        return stats_ds.take_all()

    def _merge_cstate_partials(self, batch_id: int) -> list[dict]:
        """Stage 2 of the hierarchical salted conv-state path: concatenate
        the sub-shard slim rows per BASE shard (``hash(conv_id) % num_shards``),
        fold the exclusive prefix in global (ts, seq) order against the hot
        conversations' own ``cstate_hot`` store, and write the per-row feature
        table partitioned by the SUB-shard that holds the full envelope row.
        The exchange moves the slim projection only (~40 B/row vs the full
        text-bearing envelope) — the streaming analogue of
        :func:`..stages.join.conv_state_features`'s pre-shuffle slimming."""
        pdir = os.path.join(self.out_dir, "_cstate_partials", f"batch-{batch_id:06d}")
        if not os.path.isdir(pdir) or not os.listdir(pdir):
            return []
        cfg, ckpt_dir, out_dir = self.cfg, self.ckpt.dir, self.out_dir

        def merge_task(g: pa.Table) -> pa.Table:
            from ..stages.join import CONV_STATE_SCHEMA, conv_state_prefix
            from .stream_agg import _atomic_pq

            b = int(g["base_shard"][0].as_py())
            ckpt = Checkpoint(ckpt_dir)
            seed_path = ckpt.latest_state_path(b, batch_id, kind="cstate_hot")
            seed = pq.read_table(seed_path) if seed_path else None
            enriched, new_state = conv_state_prefix(g.drop_columns(["base_shard"]), seed=seed)
            ckpt.write_state(
                b, batch_id, new_state.select(CONV_STATE_SCHEMA.names), kind="cstate_hot"
            )
            feats = enriched.select(
                ["sub_shard", SEQ_COL, *[c for c, _ in _CSTATE_FEATURES]]
            )
            _atomic_pq(
                feats,
                os.path.join(
                    out_dir, "_cstate_features", f"batch-{batch_id:06d}", f"base={b}.parquet"
                ),
            )
            return pa.table({"base_shard": pa.array([b], pa.int32())})

        ds = ray.data.read_parquet(pdir)
        return ds.groupby("base_shard").map_groups(merge_task, batch_format="pyarrow").take_all()

    def _fixup_cstate_env(self, batch_id: int) -> None:
        """Stage 3 of the hierarchical salted conv-state path: patch each
        sub-shard's already-written envelope file in place (atomic temp +
        rename), filling the typed-NULL feature columns of its hot rows from
        the merge stage's feature table. Only files that contain hot rows are
        rewritten; replay regenerates partials → merge → fixup
        deterministically, so resumed batches stay byte-stable."""
        fdir = os.path.join(self.out_dir, "_cstate_features", f"batch-{batch_id:06d}")
        if not os.path.isdir(fdir) or not os.listdir(fdir):
            return
        out_dir = self.out_dir

        def fix_task(g: pa.Table) -> pa.Table:
            import numpy as np

            from .stream_agg import _atomic_pq

            s = int(g["sub_shard"][0].as_py())
            path = os.path.join(out_dir, f"batch-{batch_id:06d}", f"shard={s}.parquet")
            env = pq.read_table(path)
            env_seq = env[SEQ_COL].combine_chunks().to_numpy(zero_copy_only=False)
            f_seq = g[SEQ_COL].combine_chunks().to_numpy(zero_copy_only=False)
            order = np.argsort(f_seq)
            pos = np.minimum(np.searchsorted(f_seq[order], env_seq), f_seq.size - 1)
            hit = f_seq[order][pos] == env_seq
            idx = pa.array(order[pos], pa.int64())
            hmask = pa.array(hit)
            for c, typ in _CSTATE_FEATURES:
                vals = pc.take(g[c].combine_chunks().cast(typ), idx)
                merged = pc.if_else(hmask, vals, env[c].combine_chunks().cast(typ))
                env = env.set_column(env.column_names.index(c), c, merged)
            _atomic_pq(env, path)
            return pa.table({"sub_shard": pa.array([s], pa.int32())})

        ds = ray.data.read_parquet(fdir)
        ds.groupby("sub_shard").map_groups(fix_task, batch_format="pyarrow").take_all()

    def _merge_session_partials(self, batch_id: int, watermarks: dict) -> list[dict]:
        """Stage 2 of the hierarchical salted-session path: gap-merge the
        sub-shard partial intervals per conversation, keyed by the BASE shard
        ``hash(conv_id) % num_shards``. The exchange moves O(sessions) interval
        rows, not O(rows) — the streaming analogue of
        :func:`..stages.windows.session_salted`'s second stage. Watermarks
        live in the ``sess:<base>`` namespace of the manifest dict."""
        pdir = os.path.join(self.out_dir, "_session_partials", f"batch-{batch_id:06d}")
        if not os.path.isdir(pdir) or not os.listdir(pdir):
            return []
        cfg, ckpt_dir, out_dir = self.cfg, self.ckpt.dir, self.out_dir
        wm = dict(watermarks)
        gap_us = cfg.session_gap_us

        def merge_task(g: pa.Table) -> pa.Table:
            from .stream_agg import merge_and_emit_sessions

            b = int(g["base_shard"][0].as_py())
            sessions = g.drop_columns(["base_shard"]).to_pandas()
            new_wm = max(wm.get(f"sess:{b}") or 0, int(sessions["session_end_us"].max()))
            merge_and_emit_sessions(
                sessions, b, batch_id, cfg, Checkpoint(ckpt_dir), out_dir, new_wm, gap_us
            )
            return pa.table(
                {"base_shard": pa.array([b], pa.int32()), "max_ts_us": pa.array([new_wm], pa.int64())}
            )

        ds = ray.data.read_parquet(pdir)
        return ds.groupby("base_shard").map_groups(merge_task, batch_format="pyarrow").take_all()

    def _merge_window_partials(self, batch_id: int, watermarks: dict) -> list[dict]:
        """Stage 2 of the hierarchical salted conv-keyed tumbling path:
        sum-merge the sub-shard pane partials per BASE shard
        (``hash(conv_id) % num_shards``) and run the normal seed/watermark/
        emit fold there. The exchange moves O(panes) rows, not O(rows) — the
        tumbling analogue of :meth:`_merge_session_partials`. Watermarks live
        in the ``win:<base>`` namespace of the manifest dict."""
        pdir = os.path.join(self.out_dir, "_window_partials", f"batch-{batch_id:06d}")
        if not os.path.isdir(pdir) or not os.listdir(pdir):
            return []
        cfg, ckpt_dir, out_dir = self.cfg, self.ckpt.dir, self.out_dir
        wm = dict(watermarks)

        def merge_task(g: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            b = int(g["base_shard"][0].as_py())
            new_wm = max(wm.get(f"win:{b}") or 0, pc.max(g["max_ts_us"]).as_py())
            _fold_pane_state(
                g.drop_columns(["base_shard", "max_ts_us"]),
                new_wm,
                b,
                batch_id,
                cfg,
                Checkpoint(ckpt_dir),
                out_dir,
            )
            return pa.table(
                {
                    "base_shard": pa.array([b], pa.int32()),
                    "max_ts_us": pa.array([new_wm], pa.int64()),
                }
            )

        ds = ray.data.read_parquet(pdir)
        return ds.groupby("base_shard").map_groups(merge_task, batch_format="pyarrow").take_all()

    def flush_windows(self) -> None:
        """End-of-log flush: once the (complete) log is fully consumed, emit
        every residual tumbling pane / sliding window / open session — the
        batch-mode equivalent of the watermark advancing to +∞.

        Idempotent under resumed consumption: every ``final/`` directory is
        rebuilt from the CURRENT residual state on each flush, so a pane that
        was flushed as a residual and later re-emitted into a ``batch-K/``
        file (because more log arrived and the watermark passed it) never
        survives as a stale duplicate ``final/`` copy — even when the shard's
        new residual is empty.

        Crash-atomic: the rebuild writes into a temp sibling OUTSIDE the kind
        tree and is swapped in with ``os.rename`` at the end — a crash
        mid-flush leaves the previous ``final/`` intact, never a partial one
        (and readers walking the kind dir never see the temp)."""
        import shutil

        last = self.ckpt.last_committed()
        if last is None:
            return
        kinds = ("windows", "windows_sliding", "windows_session")
        tmp_root = os.path.join(self.out_dir, ".final_tmp")
        old_root = os.path.join(self.out_dir, ".final_old")
        shutil.rmtree(tmp_root, ignore_errors=True)  # leftovers from a crash
        shutil.rmtree(old_root, ignore_errors=True)
        nb = last["batch_id"] + 1
        wms = last.get("watermarks", {})

        def shards_of(kind):
            d = os.path.join(self.ckpt.dir, kind)
            if not os.path.isdir(d):
                return []
            return sorted(int(s.split("=", 1)[1]) for s in os.listdir(d) if s.startswith("shard="))

        def emit(table: pa.Table, kind_dir: str, shard: int):
            if table.num_rows == 0:
                return
            from .stream_agg import _atomic_pq

            table = table.append_column("shard", pa.array([shard] * table.num_rows, pa.int32()))
            _atomic_pq(table, os.path.join(tmp_root, kind_dir, f"shard={shard}.parquet"))

        for shard in shards_of("wstate"):
            path = self.ckpt.latest_state_path(shard, nb, kind="wstate")
            if path:
                emit(pq.read_table(path).sort_by([("window_start_us", "ascending")]), "windows", shard)

        if self.cfg.sliding_window_us is not None:
            from .stream_agg import _emit_sliding

            size, slide = self.cfg.sliding_window_us
            for shard in shards_of("sstate"):
                path = self.ckpt.latest_state_path(shard, nb, kind="sstate")
                if path is None:
                    continue
                wm = wms.get(str(shard))
                thr_last = (wm - self.cfg.allowed_lateness_us) if wm is not None else None
                emit(
                    _emit_sliding(pq.read_table(path), size, slide, thr_last, 2**62),
                    "windows_sliding",
                    shard,
                )

        if self.cfg.session_gap_us is not None:
            from .stream_agg import SESSION_COLS

            for shard in shards_of("sessstate"):
                path = self.ckpt.latest_state_path(shard, nb, kind="sessstate")
                if path:
                    emit(
                        pq.read_table(path)
                        .select(SESSION_COLS)
                        .sort_by([("conv_id", "ascending"), ("session_start_us", "ascending")]),
                        "windows_session",
                        shard,
                    )

        # swap the rebuilt final/ dirs in: previous finals survive any crash
        # up to here; the rename pair is the only non-atomic window and it
        # leaves recoverable dirs, never a partial final/
        for kind_dir in kinds:
            tmp = os.path.join(tmp_root, kind_dir)
            final = os.path.join(self.out_dir, kind_dir, "final")
            if os.path.isdir(final):
                os.makedirs(old_root, exist_ok=True)
                os.rename(final, os.path.join(old_root, kind_dir))
            if os.path.isdir(tmp):
                os.makedirs(os.path.dirname(final), exist_ok=True)
                os.rename(tmp, final)
        shutil.rmtree(tmp_root, ignore_errors=True)
        shutil.rmtree(old_root, ignore_errors=True)

    def read_current_state(self) -> pa.Table:
        """The compacted current-state table — a free byproduct of the
        checkpoint: the per-shard key-state files ARE the materialized view
        of the changelog (live keys only; tombstoned keys drop out). The
        streaming twin of ``pipelines.capture.compaction``."""
        last = self.ckpt.last_committed()
        if last is None:
            return pa.table({})
        nb = last["batch_id"] + 1
        sdir = os.path.join(self.ckpt.dir, "state")
        parts = []
        if os.path.isdir(sdir):
            for sd in sorted(os.listdir(sdir)):
                shard = int(sd.split("=", 1)[1])
                path = self.ckpt.latest_state_path(shard, nb)
                if path:
                    t = pq.read_table(path)
                    import pyarrow.compute as pc

                    live = t.filter(pc.is_valid(t["text"]))  # drop tombstones
                    parts.append(live.select(["conv_id", "turn_idx", "role", "text", "tool", "ts"]))
        return pa.concat_tables(parts) if parts else pa.table({})

    # --- output inspection (tests / small results only) --------------------

    def read_windows(self, kind: str = "windows") -> pa.Table:
        """kind: "windows" (tumbling) | "windows_sliding" | "windows_session"."""
        parts = []
        wroot = os.path.join(self.out_dir, kind)
        for root, _d, fnames in os.walk(wroot):
            for f in sorted(fnames):
                if f.endswith(".parquet"):
                    parts.append(pq.read_table(os.path.join(root, f)))
        return (
            pa.concat_tables(parts)
            if parts
            else pa.table(
                {
                    "window_start_us": pa.nulls(0, pa.int64()),
                    "n_events": pa.nulls(0, pa.int64()),
                    "n_chars": pa.nulls(0, pa.int64()),
                    "shard": pa.nulls(0, pa.int32()),
                }
            )
        )

    def read_late(self) -> pa.Table:
        parts = []
        lroot = os.path.join(self.out_dir, "late")
        for root, _d, fnames in os.walk(lroot):
            for f in sorted(fnames):
                if f.endswith(".parquet"):
                    parts.append(pq.read_table(os.path.join(root, f)))
        return pa.concat_tables(parts) if parts else pa.table({})

    def read_output_ds(self) -> "ray.data.Dataset":
        """Dataset-returning twin of :meth:`read_output` for large outputs:
        streams the ``batch-*/`` parquet instead of concatenating on the
        driver. Schema evolution is handled by probing footers once (cheap)
        and widening each block to the widest envelope struct inside
        ``map_batches``."""
        paths = []
        if os.path.isdir(self.out_dir):
            for d in sorted(os.listdir(self.out_dir)):
                if not d.startswith("batch-"):
                    continue
                bd = os.path.join(self.out_dir, d)
                paths.extend(
                    os.path.join(bd, f) for f in sorted(os.listdir(bd)) if f.endswith(".parquet")
                )
        if not paths:
            return ray.data.from_arrow(pa.table({}))
        target = None
        mixed = False
        for p in paths:
            sch = pq.read_schema(p)
            if "before" not in sch.names:
                target = None
                break
            t = sch.field("before").type
            if target is None:
                target = t
            elif t != target:
                mixed = True
                if t.num_fields > target.num_fields:
                    target = t
        ds = ray.data.read_parquet(paths)
        if target is None or not mixed:
            return ds
        tgt = target
        return ds.map_batches(
            lambda b: _conform_envelope_to(b, tgt), batch_format="pyarrow"
        )

    def read_output(self) -> pa.Table:
        """Change-event output only (batch-*/ dirs; windows/ and late/ side
        outputs have their own readers). Driver-side concat — tests and small
        results; large outputs should use :meth:`read_output_ds`."""
        parts = []
        if os.path.isdir(self.out_dir):
            for d in sorted(os.listdir(self.out_dir)):
                if not d.startswith("batch-"):
                    continue
                bd = os.path.join(self.out_dir, d)
                for f in sorted(os.listdir(bd)):
                    if f.endswith(".parquet"):
                        parts.append(pq.read_table(os.path.join(bd, f)))
        if not parts:
            return pa.table({})
        return pa.concat_tables(_conform_envelopes(parts))
