"""Streaming per-source admission cap: checkpointed quota filter over a
document stream.

The ingest-time form of the per-domain cap (RefinedWeb-style): admit at most
``k`` documents per ``key_col`` value, where "first k" is global across
micro-batches in arrival order — the admitted-count per key is per-shard
checkpointed state, so a resumed run never over-admits and a replayed batch
regenerates byte-identical output (same exactly-once contract and
``_microbatch`` protocol as ``DedupStreamRunner``).

Scale shape (100 TB): rows are exchanged ONCE per batch, hash-partitioned on
the key; each shard task touches only its own count slice — O(keys seen /
num_shards) integers, the smallest state of any runner here (a count per
domain, not per doc). Keys already at quota are dropped BEFORE the exchange:
each batch broadcasts the saturated-key set from the pre-batch committed
state (``ray.put`` once, probed with a vectorized ``is_in`` in the routing
stage — the ``stages.join.bloom_prefilter_join`` pattern, but with the exact
key set since a false positive here would wrongly drop an admissible row).
Replay stays byte-identical: the saturated set derives from the same
pre-batch state snapshot a replayed batch reads.

Reference anchor: the connector's micro-batch loop + idempotent sink
(README.md:9,18); the cap semantics are training-data curation surface with
no connector analogue.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..state.checkpoint import Checkpoint


class SourceCapRunner:
    """Micro-batch per-key admission cap over ``log_dir/window-*.parquet``.

    Output: ``sink_dir/batch-B/shard-K.parquet`` — admitted rows, original
    columns, ordered by ``order_col`` inside each shard file (deterministic
    for replay). Arrival order within a batch is ``order_col`` ascending;
    across batches it is batch order — i.e. with an ``order_col``-ordered
    log the admitted set is exactly "the k lowest ``order_col`` per key"."""

    STATE_KIND = "cap"

    def __init__(
        self,
        log_dir: str,
        num_shards: int,
        sink_dir: str,
        checkpoint_dir: str,
        k: int,
        key_col: str = "source",
        order_col: str = "doc_id",
    ):
        self.log_dir = log_dir
        self.num_shards = num_shards
        self.sink_dir = sink_dir
        self.k = int(k)
        self.key_col = key_col
        self.order_col = order_col
        self.ckpt = Checkpoint(checkpoint_dir)

    # ------------------------------------------------------------------ run
    def _loop(self):
        def process(batch_id: int, bfiles: list[str]) -> dict:
            stats = self._process_batch(batch_id, bfiles)
            # input rows from footers: the saturated-key prefilter drops rows
            # BEFORE the exchange, so per-shard n_in no longer sees them
            rows = sum(pq.read_metadata(f).num_rows for f in bfiles)
            kept = sum(r["n_kept"] for r in stats)
            exchanged = sum(r["n_in"] for r in stats)
            return {
                "rows": rows,
                "admitted": kept,
                "rejected": rows - kept,
                "exchanged": exchanged,
            }

        # cap + key/order columns are replay identity: resuming under a
        # different quota or key would silently change the admitted set
        pins = {
            "num_shards": self.num_shards,
            "cap_k": self.k,
            "cap_cols": f"{self.key_col}/{self.order_col}",
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

    # ----------------------------------------------------------- prefilter
    def _saturated_keys(self, batch_id: int) -> pa.Array | None:
        """Keys already at quota in the pre-batch COMMITTED state — the
        routing stage drops their rows before the exchange. The EXACT key
        set (not a bloom bitmap): a false positive would wrongly drop an
        admissible row. Size is bounded by total-admitted / k."""
        import pyarrow.compute as pc

        arrs: list[pa.Array] = []
        for shard in range(self.num_shards):
            p = self.ckpt.latest_state_path(
                shard, before_batch=batch_id, kind=self.STATE_KIND
            )
            if not p:
                continue
            st = pq.read_table(p)
            sat = st.filter(pc.greater_equal(st["n_admitted"], self.k))[self.key_col]
            if len(sat):
                arrs.append(sat.combine_chunks())
        if not arrs:
            return None
        return pa.concat_arrays(arrs)

    # -------------------------------------------------------------- batches
    def _process_batch(self, batch_id: int, bfiles: list[str]) -> list[dict]:
        key_col, order_col, k = self.key_col, self.order_col, self.k
        num_shards = self.num_shards
        ckpt_dir = self.ckpt.dir
        sink_dir = self.sink_dir
        state_kind = self.STATE_KIND

        sat = self._saturated_keys(batch_id)
        sat_ref = ray.put(sat) if sat is not None else None

        def route(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            from ..schema import shard_of

            # arrow-native: pandas would round-trip nullable int keys
            # through float64 (same rationale as KllStreamRunner.project)
            if pa.types.is_large_string(t.schema.field(key_col).type):
                i = t.schema.get_field_index(key_col)
                t = t.set_column(i, key_col, t[key_col].cast(pa.string()))
            if sat_ref is not None:
                sat_keys = ray.get(sat_ref)  # broadcast once, local after
                drop = pc.is_in(
                    t[key_col], value_set=sat_keys.cast(t.schema.field(key_col).type)
                )
                t = t.filter(pc.invert(pc.fill_null(drop, False)))
            return t.append_column("_shard", shard_of(t[key_col], num_shards))

        # sink schema pinned from the log footer: an empty admitted frame
        # must not degrade string columns to null type through pandas
        out_schema = pq.read_schema(bfiles[0])

        def shard_task(gt: pa.Table) -> pa.Table:
            shard = int(gt["_shard"][0].as_py())
            g = gt.to_pandas(integer_object_nulls=True)
            g = g.sort_values(order_col, kind="mergesort").reset_index(drop=True)
            n_in = len(g)
            ck = Checkpoint(ckpt_dir)  # path math only; no driver state
            prev_path = ck.latest_state_path(
                shard, before_batch=batch_id, kind=state_kind
            )
            kt = None
            prior: dict[object, int] = {}
            if prev_path:
                st = pq.read_table(prev_path)
                f = st.schema.field(key_col).type
                if not pa.types.is_null(f):
                    kt = f
                sk = st[key_col].to_pandas(integer_object_nulls=True).astype(object)
                sn = st["n_admitted"].to_numpy(zero_copy_only=False)
                prior = dict(zip(sk, (int(x) for x in sn)))
            # position within key, in arrival (order_col) order — via
            # factorize codes, NOT the raw object values: sorting/uniquing
            # an object array mixing None and str raises, and SQL's
            # PARTITION BY treats NULL as one ordinary group
            keys = g[key_col].astype(object).where(g[key_col].notna(), None)
            codes, uniq = pd.factorize(keys, use_na_sentinel=True)  # null → -1
            order = np.argsort(codes, kind="stable")
            ok = codes[order]
            rs = np.ones(len(g), dtype=bool)
            if len(g) > 1:
                rs[1:] = ok[1:] != ok[:-1]
            rid = np.cumsum(rs) - 1
            pos_sorted = np.arange(len(g), dtype=np.int64) - np.repeat(
                np.flatnonzero(rs), np.bincount(rid)
            )
            pos = np.empty(len(g), dtype=np.int64)
            pos[order] = pos_sorted
            # prior count per UNIQUE key (not per row), code -1 = the null key
            key_of = [None, *uniq]  # index by code+1
            base_per_code = np.array(
                [prior.get(s, 0) for s in key_of], dtype=np.int64
            )
            keep = (base_per_code[codes + 1] + pos) < k
            out = g[keep].drop(columns=["_shard"])
            # state = prior counts + this batch's admissions per key
            cnt = np.bincount(codes[keep] + 1, minlength=len(key_of))
            new = dict(prior)
            for ci in np.flatnonzero(cnt):
                s = key_of[ci]
                new[s] = new.get(s, 0) + int(cnt[ci])
            if kt is None:
                kt = gt.schema.field(key_col).type
                if pa.types.is_large_string(kt) or pa.types.is_null(kt):
                    kt = pa.string()
            # canonical key order (null first) → byte-stable state files
            # independent of dict insertion history
            skeys = sorted(new.keys(), key=lambda s: (s is not None, s))
            ck.write_state(
                shard,
                batch_id,
                pa.table(
                    {
                        key_col: pa.array(skeys, kt),
                        "n_admitted": pa.array([new[s] for s in skeys], pa.int64()),
                    }
                ),
                kind=state_kind,
            )
            d = os.path.join(sink_dir, f"batch-{batch_id:06d}")
            os.makedirs(d, exist_ok=True)
            tbl = pa.Table.from_pandas(
                out[out_schema.names], schema=out_schema, preserve_index=False
            )
            pq.write_table(tbl, os.path.join(d, f"shard-{shard:05d}.parquet"))
            return pa.table(
                {
                    "shard": pa.array([shard], pa.int64()),
                    "n_in": pa.array([n_in], pa.int64()),
                    "n_kept": pa.array([int(keep.sum())], pa.int64()),
                }
            )

        ds = ray.data.read_parquet(bfiles, override_num_blocks=2 * num_shards)
        ds = ds.repartition(2 * num_shards, shuffle=False)
        return (
            ds.map_batches(route, batch_format="pyarrow")
            .groupby("_shard")
            .map_groups(shard_task, batch_format="pyarrow")
            .take_all()
        )

    # --------------------------------------------------------------- output
    def read_output(self) -> pa.Table:
        from ._microbatch import read_committed_output

        return read_committed_output(self.ckpt, self.sink_dir)

    def read_output_ds(self) -> ray.data.Dataset:
        from ._microbatch import read_committed_output_ds

        return read_committed_output_ds(self.ckpt, self.sink_dir)
