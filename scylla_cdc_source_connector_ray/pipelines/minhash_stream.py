"""Streaming MinHash/LSH near-dup filter: checkpointed arrival-order
candidate suppression over a windowed document log.

Semantics (exactly SQL-expressible, hence gate-able): a document is DROPPED
iff any EARLIER document (by arrival order = ``order_col``) shares at least
one LSH band signature with it — earlier documents count whether or not they
themselves were kept, which makes the rule order-robust (no transitive
kept-set recursion) and lets the oracle state it as one anti-join. This is
the streaming analogue of the batch ``dedup_minhash_lsh`` CANDIDATE stage:
an arrival-order online filter that admits a document only if nothing seen
before it minhash-collides.

State: the set of all band signatures ever seen, stored per shard as
md5-128 of the exact ``band:band_key`` string (two sorted uint64 columns —
the same exact-membership layout as ``DedupStreamRunner``; crypto-hash
collisions are the accepted 2^-128 risk, the band_key string itself is
collision-free vs the SQL twin). State size is O(unique band signatures) ≈
bands × unique docs — ~256 B/doc across all shards.

Scale shape: signatures are computed in the vectorized ``FastMinHasher``
actor stage; band rows (16/doc) are exchanged once, hash-partitioned on the
band-signature hash (uniform, no salt needed); each shard task probes and
updates only its own sorted state slice. The per-batch dropped-id set
returned to the driver is bounded by the batch's document count (micro-batch
sized, never corpus sized).

Reference anchor: composes the connector's micro-batch offset/replay
contract (``_microbatch.py``) with the corpus near-dup family the reference
lacks.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..state.checkpoint import Checkpoint
from .dedup_stream import _member128


def _band_hashes(band: np.ndarray, band_key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """md5-128 of 'band:band_key' as two uint64 words (band index prefixed so
    equal key strings in different bands never collide)."""
    if len(band) == 0:
        return np.array([], np.uint64), np.array([], np.uint64)
    # string build vectorized; the md5 itself is the per-row loop (hashlib
    # has no batch API) at ~16 digests/doc — bounded well below the minhash
    # signature stage's cost (64 permutations × shingles per doc)
    strs = np.char.add(
        np.char.add(band.astype("U3"), ":"), band_key.astype("U")
    )
    hexes = [hashlib.md5(s.encode()).hexdigest() for s in strs.tolist()]
    u = np.frombuffer(bytes.fromhex("".join(hexes)), dtype=np.uint64).reshape(-1, 2)
    return u[:, 0].copy(), u[:, 1].copy()


class MinHashStreamRunner:
    """Micro-batch arrival-order near-dup filter over
    ``log_dir/window-*.parquet`` document files (columns ``order_col``,
    ``text_col``). Log windows must be ordered by ``order_col`` (arrival
    order); shingle-less documents (empty normalized text) have no bands and
    are always kept, mirroring the batch LSH pipeline."""

    STATE_KIND = "bands"

    def __init__(
        self,
        log_dir: str,
        num_shards: int,
        sink_dir: str,
        checkpoint_dir: str,
        text_col: str = "text",
        order_col: str = "doc_id",
        num_perm: int = 64,
        ngram: int = 3,
        seed: int = 42,
        bands: int = 16,
    ):
        self.log_dir = log_dir
        self.num_shards = num_shards
        self.sink_dir = sink_dir
        self.text_col = text_col
        self.order_col = order_col
        self.num_perm = num_perm
        self.ngram = ngram
        self.seed = seed
        self.bands = bands
        self.ckpt = Checkpoint(checkpoint_dir)

    # ------------------------------------------------------------------ run
    def _loop(self):
        def process(batch_id: int, bfiles: list[str]) -> dict:
            return self._process_batch(batch_id, bfiles)

        pins = {
            "num_shards": self.num_shards,
            "minhash_impl": f"{self.num_perm}/{self.ngram}/{self.seed}/{self.bands}"
            # the measured columns are replay identity too
            f"/{self.text_col}/{self.order_col}",
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
        from ..functions.dedup import FastMinHasher, band_key_strings, lsh_bucket_rows

        text_col, order_col = self.text_col, self.order_col
        num_shards, bands = self.num_shards, self.bands
        num_perm, ngram, seed = self.num_perm, self.ngram, self.seed
        ckpt_dir = self.ckpt.dir
        state_kind = self.STATE_KIND

        out_schema = pq.read_schema(bfiles[0])
        if not pa.types.is_integer(out_schema.field(order_col).type):
            raise ValueError(
                f"order_col {order_col!r} must be an integer column "
                f"(got {out_schema.field(order_col).type}); arrival order "
                "and the sink shard layout are derived from it"
            )

        class BandRows:
            """Signature + band explosion + band-hash, one actor-held hasher."""

            def __init__(self):
                self.mh = FastMinHasher(num_perm=num_perm, ngram=ngram, seed=seed)

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                b = b.rename(columns={order_col: "doc_id", text_col: "text"})
                rows = lsh_bucket_rows(
                    self.mh(b[["doc_id", "text"]]),
                    bands=bands,
                    rows_per_band=num_perm // bands,
                )
                # the manifest pins md5('band:band_key-string') as the state
                # representation — rebuild the exact decimal string from the
                # packed bk columns (lossless int64 decimal join)
                h1, h2 = _band_hashes(rows["band"].to_numpy(), band_key_strings(rows))
                return pd.DataFrame(
                    {
                        "doc_id": rows["doc_id"].to_numpy(dtype=np.int64),
                        "_h1": h1,
                        "_h2": h2,
                        "_shard": (h1 % np.uint64(num_shards)).astype(np.int32),
                    }
                )

        def shard_task(g: pd.DataFrame) -> pd.DataFrame:
            shard = int(g["_shard"].iloc[0])
            ck = Checkpoint(ckpt_dir)  # path math only; no driver state
            prev = ck.latest_state_path(shard, before_batch=batch_id, kind=state_kind)
            if prev:
                st = pq.read_table(prev)
                s1 = st["h1"].to_numpy(zero_copy_only=False).astype(np.uint64)
                s2 = st["h2"].to_numpy(zero_copy_only=False).astype(np.uint64)
            else:
                s1 = s2 = np.array([], np.uint64)
            h1 = g["_h1"].to_numpy().astype(np.uint64)
            h2 = g["_h2"].to_numpy().astype(np.uint64)
            doc = g["doc_id"].to_numpy(dtype=np.int64)
            # arrival-first holder per equal band hash within the batch
            order = np.lexsort((doc, h2, h1))
            oh1, oh2 = h1[order], h2[order]
            run_start = np.ones(len(g), dtype=bool)
            run_start[1:] = (oh1[1:] != oh1[:-1]) | (oh2[1:] != oh2[:-1])
            first = np.zeros(len(g), dtype=bool)
            first[order[run_start]] = True
            # collided: a non-first row shares with an earlier in-batch doc;
            # a first row collides iff the hash was seen in a PRIOR batch
            collided = ~first | _member128(s1, s2, h1, h2)
            # state := prev ∪ this batch's new hashes (first holders only)
            new = first & ~collided
            n1 = np.concatenate([s1, h1[new]])
            n2 = np.concatenate([s2, h2[new]])
            so = np.lexsort((n2, n1))
            ck.write_state(
                shard,
                batch_id,
                pa.table({"h1": pa.array(n1[so]), "h2": pa.array(n2[so])}),
                kind=state_kind,
            )
            return pd.DataFrame({"doc_id": np.unique(doc[collided])})

        ds = ray.data.read_parquet(bfiles, override_num_blocks=2 * num_shards)
        ds = ds.repartition(2 * num_shards, shuffle=False)
        dropped_tbl = (
            ds.map_batches(BandRows, batch_format="pandas", concurrency=(1, 8))
            .groupby("_shard")
            .map_groups(shard_task, batch_format="pandas")
            .take_all()
        )
        # a doc colliding in several shards is reported once per shard
        dropped = np.unique(
            np.fromiter((int(r["doc_id"]) for r in dropped_tbl), np.int64)
        )

        # second distributed pass: filter survivors (tiny dropped-id set in
        # the closure) and write one deterministic sink file per doc-shard
        sink_dir = self.sink_dir

        def filt(b: pd.DataFrame) -> pd.DataFrame:
            keep = ~np.isin(b[order_col].to_numpy(dtype=np.int64), dropped)
            b = b[keep].copy()
            b["_oshard"] = (b[order_col].to_numpy(dtype=np.int64) % num_shards).astype(
                np.int32
            )
            return b

        def write_task(g: pd.DataFrame) -> pd.DataFrame:
            shard = int(g["_oshard"].iloc[0])
            g = g.sort_values(order_col, kind="mergesort").drop(columns=["_oshard"])
            d = os.path.join(sink_dir, f"batch-{batch_id:06d}")
            os.makedirs(d, exist_ok=True)
            tbl = pa.Table.from_pandas(
                g[out_schema.names], schema=out_schema, preserve_index=False
            )
            pq.write_table(tbl, os.path.join(d, f"shard-{shard:05d}.parquet"))
            return pd.DataFrame({"shard": [shard], "n_kept": [len(g)]})

        ds2 = ray.data.read_parquet(bfiles, override_num_blocks=2 * num_shards)
        stats = (
            ds2.map_batches(filt, batch_format="pandas")
            .groupby("_oshard")
            .map_groups(write_task, batch_format="pandas")
            .take_all()
        )
        kept = sum(r["n_kept"] for r in stats)
        return {"rows": kept + len(dropped), "kept": kept, "dups": int(len(dropped))}

    # --------------------------------------------------------------- output
    def read_output(self) -> pa.Table:
        from ._microbatch import read_committed_output

        return read_committed_output(self.ckpt, self.sink_dir)

    def read_output_ds(self) -> ray.data.Dataset:
        from ._microbatch import read_committed_output_ds

        return read_committed_output_ds(self.ckpt, self.sink_dir)
