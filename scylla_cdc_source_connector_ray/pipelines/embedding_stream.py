"""Streaming embedding near-dup filter: checkpointed arrival-order SRP-LSH
candidate suppression over a windowed vector log — the embedding twin of
``MinHashStreamRunner``.

Semantics (SQL-expressible, hence gate-able): a vector is DROPPED iff any
EARLIER vector (by arrival order = ``order_col``) shares at least one
sign-random-projection table signature with it — earlier vectors count
whether or not they were themselves kept (the order-robust one-anti-join
rule shared with the minhash stream). This is the ingest-time form of the
batch ``dedup.embedding_lsh_near_dups`` CANDIDATE stage: admit a vector
only if nothing seen before it SRP-collides.

State: the set of all (table, signature) keys ever seen — and unlike the
text runners this key is SMALL AND EXACT by construction: ``(t <<
n_planes) | sig`` fits one int64 with no hashing at all, so state is a
sorted int64 column per shard, bounded by ``n_tables × 2^n_planes`` keys
TOTAL (for the default 4×8-plane configuration: ≤ 1024 int64s across the
whole stream — the cheapest state family in the repo). The flip side of a
small signature space is aggressive suppression; raise ``n_planes`` for a
finer filter (state grows as 2^n_planes).

Scale shape: the hyperplane matrix is built once per actor (deterministic
literals — nothing ships); signature rows (n_tables/vec, two int64s each)
are exchanged once, partitioned by signature key; the survivor pass reads
ONLY the id column of the batch files (column-pruned, no exchange) and
writes id-list sink files — vectors themselves never move.

Reference anchor: the connector's micro-batch offset/replay contract
(``_microbatch.py``) composed with the embedding near-dup family.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..state.checkpoint import Checkpoint


class EmbeddingLshStreamRunner:
    """Micro-batch arrival-order SRP-LSH filter over
    ``log_dir/window-*.parquet`` vector files (columns ``order_col``,
    ``vec_col``). Windows must be ordered by ``order_col``. Sink:
    ``batch-B/part-*.parquet`` with the admitted ``order_col`` ids."""

    STATE_KIND = "srp"

    def __init__(
        self,
        log_dir: str,
        num_shards: int,
        sink_dir: str,
        checkpoint_dir: str,
        vec_col: str = "embedding",
        order_col: str = "vec_id",
        n_tables: int = 4,
        n_planes: int = 8,
        dim: int = 64,
    ):
        self.log_dir = log_dir
        self.num_shards = num_shards
        self.sink_dir = sink_dir
        self.vec_col = vec_col
        self.order_col = order_col
        self.n_tables = n_tables
        self.n_planes = n_planes
        self.dim = dim
        self.ckpt = Checkpoint(checkpoint_dir)

    # ------------------------------------------------------------------ run
    def _loop(self):
        def process(batch_id: int, bfiles: list[str]) -> dict:
            return self._process_batch(batch_id, bfiles)

        pins = {
            "num_shards": self.num_shards,
            # hyperplanes are deterministic from (dim, tables, planes); all
            # three are replay identity, as are the measured columns
            "srp_impl": f"{self.dim}/{self.n_tables}/{self.n_planes}"
            f"/{self.vec_col}/{self.order_col}",
        }
        return pins, process

    def run(
        self,
        files_per_batch: int = 4,
        max_batches: int | None = None,
        crash_before_commit_at: int | None = None,
    ) -> dict:
        from ._microbatch import run_microbatches

        pins, process = self._loop()
        return run_microbatches(
            self.ckpt,
            self.log_dir,
            pins=pins,
            process_batch=process,
            files_per_batch=files_per_batch,
            max_batches=max_batches,
            crash_before_commit_at=crash_before_commit_at,
        )

    def follow(
        self,
        files_per_batch: int = 4,
        poll_interval_s: float = 1.0,
        idle_polls: int = 3,
    ) -> dict:
        """Live tail: drain new window files until ``idle_polls`` empty
        polls (same manifest/replay contract as ``run``)."""
        from ._microbatch import follow_microbatches

        pins, process = self._loop()
        return follow_microbatches(
            self.ckpt,
            self.log_dir,
            pins=pins,
            process_batch=process,
            files_per_batch=files_per_batch,
            poll_interval_s=poll_interval_s,
            idle_polls=idle_polls,
        )

    # -------------------------------------------------------------- batches
    def _process_batch(self, batch_id: int, bfiles: list[str]) -> dict:
        vec_col, order_col = self.vec_col, self.order_col
        num_shards = self.num_shards
        n_tables, n_planes, dim = self.n_tables, self.n_planes, self.dim
        ckpt_dir = self.ckpt.dir
        state_kind = self.STATE_KIND

        class SigRows:
            """Signatures from the actor-held hyperplane matrix: one
            (vec, key) row per table, key = (t << n_planes) | sig."""

            def __init__(self):
                from ..functions.dedup import lsh_hyperplanes

                self.H = lsh_hyperplanes(dim, n_tables, n_planes)

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                if len(b) == 0 or vec_col not in b.columns:
                    return pd.DataFrame(
                        {
                            "vid": pd.Series(dtype="int64"),
                            "_key": pd.Series(dtype="int64"),
                            "_shard": pd.Series(dtype="int32"),
                        }
                    )
                M = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in b[vec_col].values]
                )
                ids = b[order_col].to_numpy(dtype=np.int64)
                weights = 1 << np.arange(n_planes, dtype=np.int64)
                frames = []
                for t in range(n_tables):
                    sig = ((M @ self.H[t].T) > 0) @ weights
                    key = (np.int64(t) << np.int64(n_planes)) | sig
                    frames.append(pd.DataFrame({"vid": ids, "_key": key}))
                out = pd.concat(frames, ignore_index=True)
                out["_shard"] = (
                    out["_key"].to_numpy().astype(np.uint64) % np.uint64(num_shards)
                ).astype(np.int32)
                return out

        def shard_task(g: pd.DataFrame) -> pd.DataFrame:
            shard = int(g["_shard"].iloc[0])
            ck = Checkpoint(ckpt_dir)  # path math only; no driver state
            prev = ck.latest_state_path(shard, before_batch=batch_id, kind=state_kind)
            seen = (
                pq.read_table(prev)["key"].to_numpy(zero_copy_only=False)
                if prev
                else np.array([], np.int64)
            )
            key = g["_key"].to_numpy(dtype=np.int64)
            vid = g["vid"].to_numpy(dtype=np.int64)
            # arrival-first holder per key within the batch
            order = np.lexsort((vid, key))
            ok = key[order]
            run_start = np.ones(len(g), dtype=bool)
            run_start[1:] = ok[1:] != ok[:-1]
            first = np.zeros(len(g), dtype=bool)
            first[order[run_start]] = True
            idx = np.searchsorted(seen, key)
            idx = np.clip(idx, 0, max(len(seen) - 1, 0))
            in_prev = (seen[idx] == key) if len(seen) else np.zeros(len(g), bool)
            collided = ~first | in_prev
            new_keys = np.unique(key[first & ~in_prev])
            merged = np.union1d(seen, new_keys)
            ck.write_state(
                shard,
                batch_id,
                pa.table({"key": pa.array(merged, pa.int64())}),
                kind=state_kind,
            )
            return pd.DataFrame({"vid": np.unique(vid[collided])})

        ds = ray.data.read_parquet(
            bfiles, columns=[order_col, vec_col], override_num_blocks=2 * num_shards
        )
        ds = ds.repartition(2 * num_shards, shuffle=False)
        dropped_tbl = (
            ds.map_batches(SigRows, batch_format="pandas", concurrency=(1, 8))
            .groupby("_shard")
            .map_groups(shard_task, batch_format="pandas")
            .take_all()
        )
        dropped = np.unique(
            np.fromiter((int(r["vid"]) for r in dropped_tbl), np.int64)
        )

        # survivor pass: column-pruned id read per file, no exchange; the
        # vectors themselves never move (downstream filters by id)
        sink_dir = self.sink_dir
        dropped_ref = ray.put(dropped)

        def keep_ids(path: str) -> int:
            drop = ray.get(dropped_ref)
            ids = (
                pq.read_table(path, columns=[order_col])[order_col]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            kept = np.sort(ids[~np.isin(ids, drop)])
            d = os.path.join(sink_dir, f"batch-{batch_id:06d}")
            os.makedirs(d, exist_ok=True)
            stem = os.path.splitext(os.path.basename(path))[0]
            pq.write_table(
                pa.table({order_col: pa.array(kept, pa.int64())}),
                os.path.join(d, f"part-{stem}.parquet"),
            )
            return len(kept)

        kept = sum(
            r["n"]
            for r in ray.data.from_items(
                [{"path": f} for f in bfiles], override_num_blocks=len(bfiles)
            )
            .map_batches(
                lambda b: pd.DataFrame({"n": [keep_ids(p) for p in b["path"]]}),
                batch_format="pandas",
                batch_size=None,
            )
            .take_all()
        )
        return {"rows": kept + len(dropped), "kept": kept, "dups": int(len(dropped))}

    # --------------------------------------------------------------- output
    def read_output(self) -> pa.Table:
        from ._microbatch import read_committed_output

        return read_committed_output(self.ckpt, self.sink_dir)
