"""Streaming exact dedup: checkpointed first-occurrence filter over a
document stream.

The training-data composition of §2.7 (exactly-once sink) with the exact-dedup
operator: a micro-batch runner that consumes a windowed document log and emits
only the FIRST occurrence of each normalized text, where "first" is global
across micro-batches — the seen-hash set is per-shard checkpointed state, so a
resumed run never re-admits a duplicate and a replayed batch regenerates
byte-identical output (same exactly-once contract as ``CaptureRunner``;
``state/checkpoint.py`` primitives are shared).

Scale shape (100 TB): rows are exchanged ONCE per batch, hash-partitioned on
the 16-byte content hash (uniform by construction — no skew, no salt needed);
each shard task touches only its own seen-set slice, proportional to unique
docs / num_shards and stored sorted so the membership probe is one
``np.isin`` over sorted arrays. The seen set is content hashes only (~16
B/doc → ~1.6 TB state for 100 G docs, spread over shards); a longer-lived
deployment would tier it into sorted runs with periodic merge (LSM-style) —
the per-batch union write here is the simple variant of that and is the only
state I/O.

Reference anchor: the connector itself offers at-least-once delivery with a
downstream idempotent sink (README.md:9,18); this runner strengthens the same
micro-batch loop to exactly-once and reuses it for corpus dedup.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..state.checkpoint import Checkpoint, _atomic_write


def _norm_hash(texts: pd.Series) -> list[str]:
    from ..functions.textops import md5_normalized

    return md5_normalized(texts)


class DedupStreamRunner:
    """Micro-batch first-occurrence dedup over ``log_dir/window-*.parquet``.

    Output: ``sink_dir/batch-B/shard-K.parquet`` — surviving rows, original
    columns, ordered by ``order_col`` inside each shard file (deterministic
    for replay). ``read_output`` returns only COMMITTED batches."""

    def __init__(
        self,
        log_dir: str,
        num_shards: int,
        sink_dir: str,
        checkpoint_dir: str,
        text_col: str = "text",
        order_col: str = "doc_id",
    ):
        self.log_dir = log_dir
        self.num_shards = num_shards
        self.sink_dir = sink_dir
        self.text_col = text_col
        self.order_col = order_col
        self.ckpt = Checkpoint(checkpoint_dir)

    # ------------------------------------------------------------------ run
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
        if last is not None and last.get("num_shards") != self.num_shards:
            raise ValueError(
                f"checkpoint has num_shards={last.get('num_shards')}, config "
                f"{self.num_shards}: the hash layout would orphan seen-set "
                "state — use a fresh checkpoint/sink dir"
            )
        consumed = last["consumed_files"] if last else 0
        next_batch = (last["batch_id"] + 1) if last else 0
        todo = files[consumed:]
        batches = [
            todo[i : i + files_per_batch] for i in range(0, len(todo), files_per_batch)
        ]
        if max_batches is not None:
            batches = batches[:max_batches]

        totals = {"batches": 0, "rows": 0, "kept": 0, "dups": 0, "crashed": False}
        for i, bfiles in enumerate(batches):
            batch_id = next_batch + i
            t0 = time.perf_counter()
            stats = self._process_batch(batch_id, bfiles)
            for r in stats:
                totals["rows"] += r["n_in"]
                totals["kept"] += r["n_kept"]
                totals["dups"] += r["n_in"] - r["n_kept"]
            if crash_before_commit_at is not None and i >= crash_before_commit_at:
                totals["crashed"] = True
                return totals
            consumed += len(bfiles)
            self.ckpt.commit(
                batch_id,
                {
                    "consumed_files": consumed,
                    "num_shards": self.num_shards,
                    "rows": totals["rows"],
                    "kept": totals["kept"],
                },
            )
            self.ckpt.gc_state(keep_batches=2)
            sec = time.perf_counter() - t0
            _atomic_write(
                os.path.join(self.ckpt.dir, "metrics", f"batch-{batch_id:06d}.json"),
                __import__("json")
                .dumps(
                    {
                        "batch_id": batch_id,
                        "rows": sum(r["n_in"] for r in stats),
                        "kept": sum(r["n_kept"] for r in stats),
                        "sec": round(sec, 3),
                    },
                    sort_keys=True,
                )
                .encode(),
            )
            totals["batches"] += 1
        return totals

    # -------------------------------------------------------------- batches
    def _process_batch(self, batch_id: int, bfiles: list[str]) -> list[dict]:
        text_col, order_col = self.text_col, self.order_col
        num_shards = self.num_shards
        ckpt_dir = self.ckpt.dir
        sink_dir = self.sink_dir

        def add_hash(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            h = _norm_hash(b[text_col])
            b["_ch"] = h
            # first 8 hex chars → uniform int shard (md5 is the partitioner)
            b["_shard"] = np.array(
                [int(x[:8], 16) % num_shards for x in h], dtype=np.int32
            )
            return b

        # sink schema pinned from the log footer: an empty (or all-null) kept
        # frame must not degrade string columns to null type through pandas
        out_schema = pq.read_schema(bfiles[0])

        def shard_task(g: pd.DataFrame) -> pd.DataFrame:
            shard = int(g["_shard"].iloc[0])
            g = g.sort_values(order_col, kind="mergesort")
            ck = Checkpoint(ckpt_dir)  # path math only; no driver state
            prev_path = ck.latest_state_path(shard, before_batch=batch_id, kind="seen")
            seen = (
                pq.read_table(prev_path)["h"].to_numpy(zero_copy_only=False)
                if prev_path
                else np.array([], dtype=object)
            )
            h = g["_ch"].to_numpy()
            # first occurrence within the batch, in arrival order
            first_in_batch = ~pd.Series(h).duplicated().to_numpy()
            unseen = ~np.isin(h, seen)
            keep = first_in_batch & unseen
            out = g[keep].drop(columns=["_ch", "_shard"])
            # state = prev ∪ this batch's new hashes, sorted (np.isin fast path)
            new_seen = np.unique(np.concatenate([seen.astype(object), h[keep]]))
            ck.write_state(
                shard, batch_id, pa.table({"h": pa.array(new_seen, pa.string())}),
                kind="seen",
            )
            d = os.path.join(sink_dir, f"batch-{batch_id:06d}")
            os.makedirs(d, exist_ok=True)
            tbl = pa.Table.from_pandas(
                out[out_schema.names], schema=out_schema, preserve_index=False
            )
            pq.write_table(tbl, os.path.join(d, f"shard-{shard:05d}.parquet"))
            return pd.DataFrame(
                {"shard": [shard], "n_in": [len(g)], "n_kept": [int(keep.sum())]}
            )

        ds = ray.data.read_parquet(bfiles, override_num_blocks=2 * num_shards)
        stats = (
            ds.map_batches(add_hash, batch_format="pandas")
            .groupby("_shard")
            .map_groups(shard_task, batch_format="pandas")
            .take_all()
        )
        return stats

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

    def read_output_ds(self) -> ray.data.Dataset:
        last = self.ckpt.last_committed()
        if last is None:
            raise ValueError("no committed batches")
        dirs = [
            os.path.join(self.sink_dir, f"batch-{b:06d}")
            for b in range(last["batch_id"] + 1)
            if os.path.isdir(os.path.join(self.sink_dir, f"batch-{b:06d}"))
        ]
        return ray.data.read_parquet(dirs)
