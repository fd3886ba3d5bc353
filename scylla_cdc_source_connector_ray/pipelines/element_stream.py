"""Streaming element-level collection capture: the M8 element-op folds
(list / set / map) running in the checkpointed micro-batch model.

Each micro-batch is folded with the SAME kernels as the batch path
(``stages/element_ops.py``); cross-batch continuity comes from per-shard
state holding each key's live cells in emission order plus the key's last
post-image. A state row is replayed into the next batch as one synthetic
``kind='seed'`` row sorted before every real row of its key (ts = -2^62 µs,
seq = -1): the fold's own lagging then yields the correct pre-image for the
batch's first real event, removes/wipes/overwrites kill seed cells exactly
like cells added in-batch, and seed rows are dropped from the emitted
envelope. Output is SPLIT-INVARIANT: any windowing of an in-order log
produces byte-identical events to the single-batch fold (property-tested).

Ordering contract: the log must be (ts, seq)-ordered across window files per
key — the same in-order contract as the capture runner's windowed layout.

Scale shape: rows exchange once per batch on the key shard (same
``with_shard`` hash as batch capture); state I/O per shard ∝ its keys' LIVE
cells only (killed cells leave the state). Exactly-once: deterministic
per-(batch, shard) sink files + manifest-gated ``read_output``, replay
regenerates both state and output byte-identically (``Checkpoint``
primitives shared with ``CaptureRunner`` / ``DedupStreamRunner``).
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..state.checkpoint import Checkpoint, _atomic_write

#: sorts before any real event's timestamp (timestamp[us] int64 range)
_SEED_TS_US = -(2**62)

_KINDS = {
    # kind -> (fold name, add/vals/rem columns, has vals)
    "list": ("fold_element_ops", ("add_elems", None, "rem_elems")),
    "set": ("fold_set_element_ops", ("add_elems", None, "rem_elems")),
    "map": ("fold_map_element_ops", ("add_keys", "add_vals", "rem_keys")),
}


class ElementStreamRunner:
    """Micro-batch element-op capture over ``log_dir/window-*.parquet``."""

    def __init__(
        self,
        log_dir: str,
        num_shards: int,
        sink_dir: str,
        checkpoint_dir: str,
        collection: str = "list",
    ):
        if collection not in _KINDS:
            raise ValueError(f"collection must be one of {sorted(_KINDS)}")
        self.log_dir = log_dir
        self.num_shards = num_shards
        self.sink_dir = sink_dir
        self.collection = collection
        self.ckpt = Checkpoint(checkpoint_dir)

    def run(
        self,
        files_per_batch: int = 4,
        max_batches: int | None = None,
        crash_before_commit_at: int | None = None,
    ) -> dict:
        files = sorted(
            os.path.join(self.log_dir, f)
            for f in os.listdir(self.log_dir)
            if f.endswith(".parquet")
        )
        last = self.ckpt.last_committed()
        for pin, mine in (
            ("num_shards", self.num_shards),
            ("collection", self.collection),
            ("files_per_batch", files_per_batch),
        ):
            if last is not None and last.get(pin) != mine:
                raise ValueError(
                    f"checkpoint has {pin}={last.get(pin)!r}, run has {mine!r}: "
                    "replay identity would change — use a fresh checkpoint dir"
                )
        consumed = last["consumed_files"] if last else 0
        next_batch = (last["batch_id"] + 1) if last else 0
        todo = files[consumed:]
        batches = [
            todo[i : i + files_per_batch] for i in range(0, len(todo), files_per_batch)
        ]
        if max_batches is not None:
            batches = batches[:max_batches]

        totals = {"batches": 0, "events": 0, "crashed": False}
        for i, bfiles in enumerate(batches):
            batch_id = next_batch + i
            t0 = time.perf_counter()
            stats = self._process_batch(batch_id, bfiles)
            totals["events"] += sum(r["n_events"] for r in stats)
            if crash_before_commit_at is not None and i >= crash_before_commit_at:
                totals["crashed"] = True
                return totals
            consumed += len(bfiles)
            self.ckpt.commit(
                batch_id,
                {
                    "consumed_files": consumed,
                    "num_shards": self.num_shards,
                    "collection": self.collection,
                    "files_per_batch": files_per_batch,
                    "events": totals["events"],
                },
            )
            self.ckpt.gc_state(keep_batches=2)
            _atomic_write(
                os.path.join(self.ckpt.dir, "metrics", f"batch-{batch_id:06d}.json"),
                json.dumps(
                    {
                        "batch_id": batch_id,
                        "events": sum(r["n_events"] for r in stats),
                        "sec": round(time.perf_counter() - t0, 3),
                    },
                    sort_keys=True,
                ).encode(),
            )
            totals["batches"] += 1
        return totals

    # -------------------------------------------------------------- internal
    def _process_batch(self, batch_id: int, bfiles: list[str]) -> list[dict]:
        from ..schema import decode_nested, encode_nested
        from ..pipelines.capture import with_shard
        from ..stages import element_ops

        fold_name, (add_col, vals_col, rem_col) = _KINDS[self.collection]
        fold = getattr(element_ops, fold_name)
        num_shards = self.num_shards
        ckpt_dir = self.ckpt.dir
        sink_dir = self.sink_dir
        in_schema = pq.read_schema(bfiles[0])

        def shard_task(t: pa.Table) -> pa.Table:
            shard = int(t["shard"][0].as_py())
            t = decode_nested(t.drop_columns(["shard"]))
            ck = Checkpoint(ckpt_dir)
            prev = ck.latest_state_path(shard, before_batch=batch_id, kind="estate")
            if prev is not None:
                st = pq.read_table(prev)
                seeds = _seed_rows(st, in_schema, add_col, vals_col, rem_col)
                t = pa.concat_tables([seeds, t], promote_options="permissive")
            events, state = fold(t, with_final_state=True)
            real = pc.not_equal(events["kind"], "seed")
            out = events.filter(real)
            ck.write_state(shard, batch_id, state, kind="estate")
            d = os.path.join(sink_dir, f"batch-{batch_id:06d}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(out, os.path.join(d, f"shard-{shard:05d}.parquet"))
            return pa.table({"shard": [shard], "n_events": [out.num_rows]})

        ds = ray.data.read_parquet(bfiles, override_num_blocks=2 * num_shards)
        sharded = ds.map_batches(
            lambda b: encode_nested(with_shard(b, num_shards)), batch_format="pyarrow"
        )
        return (
            sharded.groupby("shard")
            .map_groups(shard_task, batch_format="pyarrow")
            .take_all()
        )

    # --------------------------------------------------------------- output
    def read_output(self) -> pa.Table:
        last = self.ckpt.last_committed()
        if last is None:
            raise ValueError("no committed batches")
        parts = []
        for b in range(last["batch_id"] + 1):
            d = os.path.join(self.sink_dir, f"batch-{b:06d}")
            if not os.path.isdir(d):
                continue
            for f in sorted(os.listdir(d)):
                if f.endswith(".parquet"):
                    parts.append(pq.read_table(os.path.join(d, f)))
        return pa.concat_tables(parts) if parts else pa.table({})


def _seed_rows(
    state: pa.Table, in_schema: pa.Schema, add_col: str, vals_col: str | None, rem_col: str
) -> pa.Table:
    """One synthetic ``kind='seed'`` row per state key, carrying the key's
    live cells as its adds — sorted before every real row (ts = -2^62 µs,
    seq = -1) so the fold replays them as pre-existing cells."""
    n = state.num_rows
    ts_type = in_schema.field("ts").type
    ts = pa.array([_SEED_TS_US] * n, pa.int64())
    if pa.types.is_timestamp(ts_type):
        ts = ts.cast(ts_type)
    cols = {
        "conv_id": state["conv_id"].combine_chunks(),
        "turn_idx": state["turn_idx"].combine_chunks(),
        "ts": ts,
        "seq": pa.array([-1] * n, pa.int64()),
        "kind": pa.array(["seed"] * n, pa.string()),
        add_col: state["elems"].combine_chunks(),
        rem_col: pa.array([[]] * n, pa.list_(pa.string())),
    }
    if vals_col is not None:
        cols[vals_col] = state["vals"].combine_chunks()
    return pa.table(cols)
