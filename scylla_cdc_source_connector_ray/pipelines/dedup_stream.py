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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..state.checkpoint import Checkpoint


def _hash128(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Full 16-byte md5 of the normalized text as two uint64 words — the
    128-bit key keeps the stream EXACT (a bare 64-bit key expects ~n²/2^65
    birthday collisions; real at 10^11 docs). One fromhex over the joined
    digest string, no per-row parsing."""
    from ..functions.textops import md5_normalized

    hexes = md5_normalized(texts)
    if not hexes:
        return np.array([], np.uint64), np.array([], np.uint64)
    u = np.frombuffer(bytes.fromhex("".join(hexes)), dtype=np.uint64).reshape(-1, 2)
    return u[:, 0].copy(), u[:, 1].copy()


def _member128(h1s: np.ndarray, h2s: np.ndarray, h1q: np.ndarray, h2q: np.ndarray) -> np.ndarray:
    """Exact membership of (h1q, h2q) in the state sorted by (h1, h2):
    searchsorted on the first word, second-word equality inside the run
    (runs longer than 1 are h1 collisions — essentially never)."""
    out = np.zeros(len(h1q), dtype=bool)
    if len(h1s) == 0 or len(h1q) == 0:
        return out
    lo = np.searchsorted(h1s, h1q, "left")
    hi = np.searchsorted(h1s, h1q, "right")
    single = (hi - lo) == 1
    out[single] = h2s[lo[single]] == h2q[single]
    for i in np.flatnonzero((hi - lo) > 1):
        out[i] = h2q[i] in h2s[lo[i] : hi[i]]
    return out


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
    def _loop(self):
        def process(batch_id: int, bfiles: list[str]) -> dict:
            stats = self._process_batch(batch_id, bfiles)
            rows = sum(r["n_in"] for r in stats)
            kept = sum(r["n_kept"] for r in stats)
            return {"rows": rows, "kept": kept, "dups": rows - kept}

        # shard key is the md5 first word (hashlib) — version-independent —
        # but the NORMALIZATION feeding the md5 is not: pin its version so a
        # checkpoint written under different \s semantics fails loudly
        # instead of silently re-admitting previously-seen docs.
        from ..functions.textops import NORM_IMPL

        pins = {
            "num_shards": self.num_shards,
            "norm_impl": NORM_IMPL,
            # the deduped quantity is replay identity too
            "dedup_cols": f"{self.text_col}/{self.order_col}",
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
    def _process_batch(self, batch_id: int, bfiles: list[str]) -> list[dict]:
        text_col, order_col = self.text_col, self.order_col
        num_shards = self.num_shards
        ckpt_dir = self.ckpt.dir
        sink_dir = self.sink_dir

        def add_hash(b: pd.DataFrame) -> pd.DataFrame:
            """Hash + route + LOCAL COMBINER: pre-dedup within the block,
            keeping the min-``order_col`` row per (h1, h2) and carrying the
            dropped count as a weight column ``_w``. The block-local min
            preserves the global arrival-first winner, so output is
            byte-identical — but only unique-per-block rows cross the
            exchange (at real web-corpus dup rates of 30-60% that halves the
            all-to-all bytes; state merge still happens in the shard task).

            ADAPTIVE: a hashtable ``duplicated`` probe on h2 (a superset of
            (h1, h2) duplicates) gates the fold — on low-dup corpora the
            combiner is pure lexsort overhead (A/B on sf0.1 transcripts:
            unconditional fold 15.8 s vs 12.8 s without), so blocks with no
            hash collisions pass through untouched and the O(d log d) fold
            runs only over the collided rows. Measured on the same 2.2M-row
            job with text truncated to a high-dup pool: 6.3 s adaptive vs
            8.3 s no-combiner (−24%); low-dup transcripts 13.4 s vs 12.8 s
            (~5% probe+weight overhead)."""
            b = b.copy()
            h1, h2 = _hash128(b[text_col])
            b["_h1"] = h1
            b["_h2"] = h2
            b["_shard"] = (h1 % np.uint64(num_shards)).astype(np.int32)
            b["_w"] = np.int64(1)
            dup = pd.Series(h2).duplicated(keep=False).to_numpy()
            if not dup.any():
                return b
            idx = np.flatnonzero(dup)  # fold only the collided rows
            sh1, sh2 = h1[idx], h2[idx]
            ordv = b[order_col].to_numpy()[idx]
            order = np.lexsort((ordv, sh2, sh1))
            oh1, oh2 = sh1[order], sh2[order]
            rs = np.ones(len(idx), dtype=bool)
            rs[1:] = (oh1[1:] != oh1[:-1]) | (oh2[1:] != oh2[:-1])
            rid = np.cumsum(rs) - 1
            w = np.bincount(rid)  # rows folded into each hash-run
            ww = np.zeros(len(b), np.int64)
            ww[idx[order[rs]]] = w
            keep = ~dup
            keep[idx[order[rs]]] = True
            out = b[keep].copy()
            # kept rows are either collision-free (ww == 0 → weight 1) or winners
            out["_w"] = np.where(ww[keep] > 0, ww[keep], 1)
            return out

        # sink schema pinned from the log footer: an empty (or all-null) kept
        # frame must not degrade string columns to null type through pandas
        out_schema = pq.read_schema(bfiles[0])

        def shard_task(g: pd.DataFrame) -> pd.DataFrame:
            shard = int(g["_shard"].iloc[0])
            g = g.sort_values(order_col, kind="mergesort")
            n_in = int(g["_w"].sum())  # combiner-folded rows count as seen
            ck = Checkpoint(ckpt_dir)  # path math only; no driver state
            prev_path = ck.latest_state_path(shard, before_batch=batch_id, kind="seen")
            if prev_path:
                st = pq.read_table(prev_path)
                s1 = st["h1"].to_numpy(zero_copy_only=False).astype(np.uint64)
                s2 = st["h2"].to_numpy(zero_copy_only=False).astype(np.uint64)
            else:
                s1 = s2 = np.array([], np.uint64)
            h1 = g["_h1"].to_numpy().astype(np.uint64)
            h2 = g["_h2"].to_numpy().astype(np.uint64)
            # first occurrence within the batch, in arrival order: group equal
            # (h1, h2) with arrival position as the final lexsort key — run
            # starts are the arrival-first representatives
            pos = np.arange(len(g), dtype=np.int64)
            order = np.lexsort((pos, h2, h1))
            oh1, oh2 = h1[order], h2[order]
            run_start = np.ones(len(g), dtype=bool)
            run_start[1:] = (oh1[1:] != oh1[:-1]) | (oh2[1:] != oh2[:-1])
            first_in_batch = np.zeros(len(g), dtype=bool)
            first_in_batch[order[run_start]] = True
            keep = first_in_batch & ~_member128(s1, s2, h1, h2)
            out = g[keep].drop(columns=["_h1", "_h2", "_shard", "_w"])
            # state = prev ∪ this batch's new hashes, (h1, h2)-sorted so the
            # next batch's searchsorted probe stays O(log n)
            n1 = np.concatenate([s1, h1[keep]])
            n2 = np.concatenate([s2, h2[keep]])
            so = np.lexsort((n2, n1))
            ck.write_state(
                shard,
                batch_id,
                pa.table({"h1": pa.array(n1[so]), "h2": pa.array(n2[so])}),
                kind="seen",
            )
            d = os.path.join(sink_dir, f"batch-{batch_id:06d}")
            os.makedirs(d, exist_ok=True)
            tbl = pa.Table.from_pandas(
                out[out_schema.names], schema=out_schema, preserve_index=False
            )
            pq.write_table(tbl, os.path.join(d, f"shard-{shard:05d}.parquet"))
            return pd.DataFrame(
                {"shard": [shard], "n_in": [n_in], "n_kept": [int(keep.sum())]}
            )

        ds = ray.data.read_parquet(bfiles, override_num_blocks=2 * num_shards)
        # a batch of few files (or single-row-group files) cannot split at
        # read time, which would fuse the hash stage onto one core —
        # shuffle-FREE repartition slices the blocks so normalization+md5
        # parallelize before the one keyed exchange
        ds = ds.repartition(2 * num_shards, shuffle=False)
        stats = (
            ds.map_batches(add_hash, batch_format="pandas")
            .groupby("_shard")
            .map_groups(shard_task, batch_format="pandas")
            .take_all()
        )
        return stats

    # --------------------------------------------------------------- output
    def read_output(self) -> pa.Table:
        from ._microbatch import read_committed_output

        return read_committed_output(self.ckpt, self.sink_dir)

    def read_output_ds(self) -> ray.data.Dataset:
        from ._microbatch import read_committed_output_ds

        return read_committed_output_ds(self.ckpt, self.sink_dir)
