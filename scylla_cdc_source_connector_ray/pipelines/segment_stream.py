"""Streaming segment-level (sub-document) exact dedup: checkpointed
first-occurrence filter over fixed word spans of a document stream — the
micro-batch form of :func:`functions.dedup.segment_dedup` (RefinedWeb/CCNet
line-dedup with a fixed span standing in for the line).

Semantics: a segment survives iff it was never seen in ANY earlier committed
batch and is the (doc_id, seg_idx)-minimal occurrence within its own batch —
with doc ids monotone across windows (the ingest contract every runner here
shares) that is exactly the batch operator's global first-occurrence order,
so batching never changes the result. Output per doc: (doc_id, text_dedup,
n_segs_kept, n_segs_total), NULL text_dedup when every segment was seen.

Scale shape (100 TB): per batch, ONE segment-hash exchange of 24 B/segment
decision rows (md5-128 + packed (doc,seg) key — segment text never crosses
it) into per-shard sorted seen-state (the ``dedup_stream`` state family:
state ∝ unique segments / num_shards, one ``searchsorted`` probe), then ONE
coarse doc-keyed exchange carrying each doc's text once plus its kept pairs
for partition-local reassembly. Replay of a committed batch reads the state
as-of the batch start, so output is byte-identical (same exactly-once
contract as ``CaptureRunner``).

Reference anchor: the connector's at-least-once delivery + idempotent sink
(README.md:9,18) strengthened to exactly-once, reused for corpus curation.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..state.checkpoint import Checkpoint
from .dedup_stream import _member128


class SegmentDedupStreamRunner:
    """Micro-batch segment dedup over ``log_dir/window-*.parquet``.

    Output: ``sink_dir/batch-B/part-K.parquet`` — one row per non-empty doc
    of the batch, doc_id-ordered inside each part file (deterministic for
    replay). ``read_output`` returns only COMMITTED batches."""

    STATE_KIND = "segs"

    def __init__(
        self,
        log_dir: str,
        num_shards: int,
        sink_dir: str,
        checkpoint_dir: str,
        seg_words: int = 20,
        text_col: str = "text",
        id_col: str = "doc_id",
        num_parts: int = 16,
    ):
        self.log_dir = log_dir
        self.num_shards = num_shards
        self.sink_dir = sink_dir
        self.seg_words = seg_words
        self.text_col = text_col
        self.id_col = id_col
        self.num_parts = num_parts
        self.ckpt = Checkpoint(checkpoint_dir)

    # ------------------------------------------------------------------ run
    def _loop(self):
        def process(batch_id: int, bfiles: list[str]) -> dict:
            stats = self._process_batch(batch_id, bfiles)
            return {
                "docs": int(sum(r["n_docs"] for r in stats)),
                "segs_kept": int(sum(r["n_segs_kept"] for r in stats)),
                "segs_total": int(sum(r["n_segs_total"] for r in stats)),
            }

        pins = {
            "num_shards": self.num_shards,
            # segment boundaries, hash, and the reassembly file layout are
            # all replay identity: a checkpoint written under a different
            # span width / tokenizer / part fan-out must fail loudly.
            # ws-re2 = the RE2-exact [\t\n\f\r ] whitespace class;
            # md5-2x64 = little-endian md5 halves (DuckDB md5_number_*).
            "seg_impl": f"{self.seg_words}/{self.text_col}/{self.id_col}"
            f"/ws-re2/md5-2x64",
            "sink_layout": f"part-v1/{self.num_parts}",
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
        from ..functions.dedup import (
            _seg_decision_arrays,
            _seg_doc_rows_table,
            _seg_reassemble_part,
            _seg_unpack_table,
        )

        text_col, id_col = self.text_col, self.id_col
        seg_words, num_shards = self.seg_words, self.num_shards
        num_parts = self.num_parts
        ckpt_dir = self.ckpt.dir
        sink_dir = self.sink_dir
        state_kind = self.STATE_KIND
        self._check_monotone_ids(batch_id, bfiles)

        def decisions(b: pd.DataFrame) -> pa.Table:
            h1, h2, pk = _seg_decision_arrays(b, text_col, id_col, seg_words)
            return pa.table(
                {
                    "_h1": pa.array(h1, pa.int64()),
                    "_h2": pa.array(h2, pa.int64()),
                    "_pk": pa.array(pk, pa.int64()),
                    "_shard": pa.array(
                        (h1.view(np.uint64) % np.uint64(num_shards)).astype(
                            np.int32
                        )
                    ),
                }
            )

        def shard_task(g: pd.DataFrame) -> pa.Table:
            """First occurrence per segment hash: batch-min packed key vs
            the shard's seen-state; state = prev ∪ newly-kept, (h1,h2)-sorted.
            Returns the kept packed keys (ints only — text never enters the
            decision plane)."""
            if len(g) == 0:  # schema-inference call: no state, no keeps
                return pa.table({"_keep": pa.array([], pa.int64())})
            shard = int(g["_shard"].iloc[0])
            ck = Checkpoint(ckpt_dir)  # path math only; no driver state
            prev_path = ck.latest_state_path(
                shard, before_batch=batch_id, kind=state_kind
            )
            if prev_path:
                st = pq.read_table(prev_path)
                s1 = st["h1"].to_numpy(zero_copy_only=False)
                s2 = st["h2"].to_numpy(zero_copy_only=False)
            else:
                s1 = s2 = np.array([], np.int64)
            from ..functions.dedup import _first_pk_per_hash

            h1, h2, pk = _first_pk_per_hash(
                g["_h1"].to_numpy(), g["_h2"].to_numpy(), g["_pk"].to_numpy()
            )
            # batch winners vs prior state: the probe is one searchsorted
            # over the (h1, h2)-sorted state (h1-run scan for collisions)
            seen = _member128_i64(s1, s2, h1, h2)
            kh1, kh2, kpk = h1[~seen], h2[~seen], pk[~seen]
            n1 = np.concatenate([s1, kh1])
            n2 = np.concatenate([s2, kh2])
            so = np.lexsort((n2, n1))
            ck.write_state(
                shard,
                batch_id,
                pa.table(
                    {"h1": pa.array(n1[so], pa.int64()), "h2": pa.array(n2[so], pa.int64())}
                ),
                kind=state_kind,
            )
            return pa.table({"_keep": pa.array(kpk, pa.int64())})

        def part_task(b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:  # schema-inference call: write nothing
                return pd.DataFrame(
                    {
                        "n_docs": pd.Series([], dtype="int64"),
                        "n_segs_kept": pd.Series([], dtype="int64"),
                        "n_segs_total": pd.Series([], dtype="int64"),
                    }
                )
            out = _seg_reassemble_part(b.drop(columns=["_pid"]), seg_words)
            out = out.sort_values("doc_id", kind="mergesort")
            pid = int(b["_pid"].iloc[0])
            d = os.path.join(sink_dir, f"batch-{batch_id:06d}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(
                pa.Table.from_pandas(out, schema=_OUT_SCHEMA, preserve_index=False),
                os.path.join(d, f"part-{pid:05d}.parquet"),
            )
            return pd.DataFrame(
                {
                    "n_docs": [len(out)],
                    "n_segs_kept": [int(out["n_segs_kept"].sum())],
                    "n_segs_total": [int(out["n_segs_total"].sum())],
                }
            )

        ds = ray.data.read_parquet(bfiles, override_num_blocks=2 * num_shards)
        # few/unsplittable batch files would fuse the segment+md5 stage onto
        # one core; shuffle-free repartition slices the blocks first
        ds = ds.repartition(2 * num_shards, shuffle=False)
        kept = (
            ds.map_batches(decisions, batch_format="pandas")
            .groupby("_shard")
            .map_groups(shard_task, batch_format="pandas")
            .map_batches(
                lambda t: _seg_unpack_table(
                    t["_keep"].to_numpy(zero_copy_only=False), num_parts
                ),
                batch_format="pyarrow",
            )
            # coalesce the per-shard tiny blocks before the reassembly
            # shuffle (many-small-blocks sort pathology; see segment_dedup)
            .repartition(num_parts, shuffle=False)
        )
        docs = ds.map_batches(
            lambda b: _seg_doc_rows_table(b, text_col, id_col, num_parts),
            batch_format="pandas",
        )
        stats = (
            kept.union(docs)
            .groupby("_pid")
            .map_groups(part_task, batch_format="pandas")
            .take_all()
        )
        return stats

    def _check_monotone_ids(self, batch_id: int, bfiles: list[str]) -> None:
        """Fail loudly when a batch's min doc id does not exceed every prior
        batch's max — the monotone-id ingest contract the stream≡batch
        equivalence rests on. A duplicate id arriving in a LATER batch would
        otherwise emit a second output row for the same doc (the batch
        operator raises instead). Footer stats only (no data read); the
        running max rides the checkpoint as a one-row ``idrg`` state on
        shard 0, so the guard survives kill-resume. Files without id stats
        skip the check for that boundary (carried max unchanged)."""
        lo = hi = None
        for f in bfiles:
            md = pq.ParquetFile(f).metadata
            try:
                ci = md.schema.names.index(self.id_col)
            except ValueError:
                return
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    continue
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
        prev_path = self.ckpt.latest_state_path(0, before_batch=batch_id, kind="idrg")
        prev_max = None
        if prev_path:
            col = pq.read_table(prev_path)["max_id"]
            prev_max = col[0].as_py() if len(col) else None
        if prev_max is not None and lo is not None and lo <= prev_max:
            raise ValueError(
                f"batch {batch_id} contains doc ids from {lo} but an earlier "
                f"batch reached {prev_max}: window files must carry "
                f"monotonically increasing {self.id_col} (a repeated id would "
                "emit duplicate output rows)"
            )
        carried = hi if hi is not None else prev_max
        self.ckpt.write_state(
            0,
            batch_id,
            pa.table({"max_id": pa.array([carried], pa.int64())}),
            kind="idrg",
        )

    # --------------------------------------------------------------- output
    def read_output(self) -> pa.Table:
        from ._microbatch import read_committed_output

        return read_committed_output(self.ckpt, self.sink_dir)

    def read_output_ds(self) -> ray.data.Dataset:
        from ._microbatch import read_committed_output_ds

        return read_committed_output_ds(self.ckpt, self.sink_dir)


#: pinned sink schema: an empty or all-dropped part must not let pandas
#: degrade text_dedup to null type in the file (the round-4 spill lesson:
#: state/sink parquet is always written with an explicit schema)
_OUT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("text_dedup", pa.string()),
        pa.field("n_segs_kept", pa.int64()),
        pa.field("n_segs_total", pa.int64()),
    ]
)

#: the sorted-state membership probe is dtype-agnostic (searchsorted +
#: within-run equality): ONE definition, shared with the text-level runner
#: (state here is int64 end-to-end because the keys ride Arrow tables;
#: each runner sorts and probes with its own dtype consistently)
_member128_i64 = _member128
