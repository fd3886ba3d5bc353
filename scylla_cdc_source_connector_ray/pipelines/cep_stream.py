"""Streaming CEP: checkpointed per-conversation pattern counting over a
windowed transcript log — the micro-batch composition of ``stages/cep.py``.

Detects a symbol pattern in each conversation's event stream, counting
non-overlapping occurrences left-to-right across micro-batch boundaries.
Two modes sharing one state layout (key, n_matches, tail):

- ``literal=`` (e.g. ``uta`` = user → tool → assistant): after splitting a
  conversation's symbols on the literal, no part can contain an occurrence,
  so a straddling occurrence must start within the last ``len(literal) - 1``
  symbols of the final part — that suffix is the entire carry.
- ``pattern=`` (general RE2 regex, e.g. ``ut+a``): RE2 sentinel-replacement
  yields the exact unconsumed suffix (non-overlapping scanning is memoryless
  past the consumption point), and a compiled DFA (``stages/redfa.py``)
  prunes every prefix position that provably cannot start a match extending
  into future batches. Carry is O(longest in-progress match) per key.

Scale shape: state is O(live conversations × pattern length) bytes per
shard; rows are exchanged once per batch on ``hash(conv_id)`` (the same
stream-id → Vnode mapping as the capture runner, so a conversation never
straddles shards); the fold inside a shard is all Arrow kernels
(``split_pattern`` + offset math), no per-row Python. Replay of a batch
reads the pre-batch state snapshot, so a killed run resumes without double
counting (same exactly-once contract as ``CaptureRunner``).

Reference anchor: the connector emits per-row SourceRecords only; this is
the "CEP engine" half of the north_rule, built on the shared micro-batch
protocol (``_microbatch.py``).
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..state.checkpoint import Checkpoint, current_hash_impl


def fold_literal(full: pa.Array, literal: str) -> tuple[np.ndarray, pa.Array]:
    """The carry fold kernel: split each (carried-tail + new-symbols) string
    on the literal; return (#occurrences per row, next tail per row = last
    ≤len-1 chars of the final occurrence-free part). Property-tested for
    split-invariance against the global count at arbitrary cut points."""
    parts = pc.split_pattern(full, literal)
    delta = pc.add(pc.list_value_length(parts).cast(pa.int64()), -1)
    last_idx = parts.offsets.to_numpy(zero_copy_only=False)[1:] - 1
    last = pc.take(parts.values, pa.array(last_idx))
    tail = pc.utf8_reverse(
        pc.utf8_slice_codeunits(pc.utf8_reverse(last), 0, len(literal) - 1)
    )
    return delta.to_numpy(zero_copy_only=False), tail


#: match-consumption sentinel for the regex fold — outside every symbol
#: alphabet (role_symbols emits [uatsd]); patterns containing it are rejected
SENTINEL = "\x00"


def fold_regex(full: pa.Array, pattern: str, dfa) -> tuple[np.ndarray, pa.Array]:
    """General-regex carry fold (the literal fold's big sibling): RE2
    replaces every non-overlapping match with a sentinel — so the text after
    the LAST sentinel is exactly RE2's unconsumed suffix, match-free by
    construction — then the compiled :class:`~..stages.redfa.SymbolDFA`
    prunes the dead prefix of that suffix (positions that cannot start a
    match extending into future batches). Returns (#matches per row, pruned
    next tail per row).

    Exactness: non-overlapping scanning is memoryless past the consumption
    point, so counting on ``carry + next_batch`` equals counting on the
    whole stream; pruning keeps every position whose DFA run stays live.
    State is O(longest in-progress match) per key — bounded for bounded
    quantifiers, and for unbounded ones (``ut*``-style) exactly the data a
    correct answer requires.

    Boundary rule: a match that ends flush against the batch end is NOT
    consumed when a strictly longer match could exist from the same start
    (``t+`` on ``"t"|"t"`` would otherwise stream 2 vs the global 1) — the
    match text itself becomes the carry (exactly the global scanner's
    resume position) and the count is deferred to the re-scan. The carry
    may therefore contain one completed match; the invariant is
    ``sum(deltas) + count(final tail) == global count``, and
    :meth:`CepStreamRunner.read_counts` adds that final-tail count.
    """
    from ..stages.redfa import slice_strings

    replaced = pc.replace_substring_regex(full, pattern=pattern, replacement=SENTINEL)
    parts = pc.split_pattern(replaced, SENTINEL)
    delta = pc.add(pc.list_value_length(parts).cast(pa.int64()), -1)
    last_idx = parts.offsets.to_numpy(zero_copy_only=False)[1:] - 1
    last = pc.take(parts.values, pa.array(last_idx))
    starts = dfa.earliest_viable_starts(last)
    delta_np = delta.to_numpy(zero_copy_only=False).copy()
    tail = slice_strings(last, starts)

    # batch-boundary fix: rows whose LAST match ends exactly at the end of
    # the buffer (trailing gap empty). If the DFA says a longer match could
    # exist from that match's start, un-consume it: decrement the count and
    # carry the match text (RE2 re-decides on carry + next batch).
    gap_len = pc.utf8_length(last).to_numpy(zero_copy_only=False)
    at_end = (gap_len == 0) & (delta_np > 0)
    if at_end.any():
        idx = np.flatnonzero(at_end)
        sub = pc.take(full, pa.array(idx))
        # sentinel BEFORE each match, match text kept: the final split part
        # is exactly the last match (its trailing gap is empty)
        rep2 = pc.replace_substring_regex(
            sub, pattern=pattern, replacement=SENTINEL + "\\0"
        )
        parts2 = pc.split_pattern(rep2, SENTINEL)
        if isinstance(parts2, pa.ChunkedArray):
            parts2 = parts2.combine_chunks()
        last_idx2 = parts2.offsets.to_numpy(zero_copy_only=False)[1:] - 1
        lastm = pc.take(parts2.values, pa.array(last_idx2))
        ext = dfa.can_extend(lastm)
        if ext.any():
            sel = idx[ext]
            delta_np[sel] -= 1
            tail_np = tail.to_numpy(zero_copy_only=False).astype(object)
            tail_np[sel] = lastm.to_numpy(zero_copy_only=False)[ext]
            tail = pa.array(tail_np, pa.string())
    return delta_np, tail


class CepStreamRunner:
    """Micro-batch literal-pattern counter over ``log_dir/window-*.parquet``
    transcript files. Log windows must be event-time-ordered (the standard
    in-order CDC log layout); within a batch rows are ordered by
    ``(ts, seq)``.

    Final per-conversation counts live in the checkpointed state
    (``read_counts``); per-batch metrics flow through the shared manifest.
    """

    STATE_KIND = "cep"

    def __init__(
        self,
        log_dir: str,
        num_shards: int,
        checkpoint_dir: str,
        literal: str | None = None,
        key_col: str = "conv_id",
        role_col: str = "role",
        pattern: str | None = None,
    ):
        if (literal is None) == (pattern is None):
            raise ValueError("give exactly one of literal= or pattern=")
        if literal is not None and len(literal) < 1:
            raise ValueError("literal pattern must be non-empty")
        if pattern is not None:
            if SENTINEL in pattern:
                raise ValueError("pattern must not contain the \\x00 sentinel")
            from ..stages.redfa import SymbolDFA

            # compile eagerly: rejects unsupported syntax / empty-matching
            # patterns at construction, not mid-run
            self._dfa = SymbolDFA.compile(pattern)
        else:
            self._dfa = None
        self.log_dir = log_dir
        self.num_shards = num_shards
        self.literal = literal
        self.pattern = pattern
        self.key_col = key_col
        self.role_col = role_col
        self.ckpt = Checkpoint(checkpoint_dir)

    # ------------------------------------------------------------------ run
    def _loop(self):
        def process(batch_id: int, bfiles: list[str]) -> dict:
            stats = self._process_batch(batch_id, bfiles)
            return {
                "rows": sum(r["n_in"] for r in stats),
                "matches": sum(r["n_matches"] for r in stats),
            }

        pins = {
            "num_shards": self.num_shards,
            "hash_impl": current_hash_impl(),
            # the measured quantity is replay identity: resuming with a
            # different key/role column (or switching literal↔regex mode,
            # whose tails are pruned differently) would merge counts of
            # different things into one state
            "cep_impl": (
                f"re2:{self.pattern}" if self.pattern is not None else self.literal
            )
            + f"/{self.key_col}/{self.role_col}",
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
        key_col, role_col = self.key_col, self.role_col
        num_shards, literal = self.num_shards, self.literal
        pattern, dfa = self.pattern, self._dfa  # dfa is tiny + picklable
        ckpt_dir = self.ckpt.dir
        state_kind = self.STATE_KIND

        def project(t: pa.Table) -> pa.Table:
            from ..schema import shard_of
            from ..stages.cep import role_symbols

            out = pa.table(
                {
                    key_col: t[key_col],
                    "sym": role_symbols(t[role_col]),
                    "ts": t["ts"],
                    "seq": t["seq"],
                }
            )
            return out.append_column("shard", shard_of(out[key_col], num_shards))

        def shard_task(g: pa.Table) -> pa.Table:
            from ..stages.cep import join_symbols

            # canonical key type for the state file: the exchange may promote
            # string → large_string per worker; pin string so replay is
            # byte-stable. Non-string keys (e.g. int64) keep their own type.
            kt = g.schema.field(key_col).type
            if pa.types.is_large_string(kt):
                kt = pa.string()

            shard = int(g["shard"][0].as_py())
            g = g.sort_by([(key_col, "ascending"), ("ts", "ascending"), ("seq", "ascending")])
            key_rows, strs = join_symbols(g, [key_col], "sym")
            keys = key_rows[key_col].to_pandas()  # native dtype: merges with state

            ck = Checkpoint(ckpt_dir)  # path math only; no driver state
            prev = ck.latest_state_path(shard, before_batch=batch_id, kind=state_kind)
            if prev:
                st = pq.read_table(prev).to_pandas()
            else:
                st = pd.DataFrame(
                    {
                        key_col: keys.iloc[:0],  # empty, same dtype as batch keys
                        "n_matches": pd.Series(dtype="int64"),
                        "tail": pd.Series(dtype=object),
                    }
                )

            bt = pd.DataFrame({key_col: keys, "s": strs.to_pandas().astype(object)})
            m = bt.merge(st, on=key_col, how="left")
            full = pa.array(
                (m["tail"].fillna("") + m["s"]).to_numpy(dtype=object), pa.string()
            )
            if pattern is not None:
                delta, tail = fold_regex(full, pattern, dfa)
            else:
                delta, tail = fold_literal(full, literal)
            n_new = m["n_matches"].fillna(0).to_numpy(dtype=np.int64) + delta
            touched = pd.DataFrame(
                {
                    key_col: m[key_col],
                    "n_matches": n_new,
                    "tail": tail.to_pandas().astype(object),
                }
            )
            untouched = st[~st[key_col].isin(bt[key_col])]
            out = (
                pd.concat([touched, untouched[[key_col, "n_matches", "tail"]]])
                .sort_values(key_col, kind="mergesort")
                .reset_index(drop=True)
            )
            ck.write_state(
                shard,
                batch_id,
                pa.table(
                    {
                        key_col: pa.array(out[key_col], kt),
                        "n_matches": pa.array(out["n_matches"].astype(np.int64)),
                        "tail": pa.array(out["tail"], pa.string()),
                    }
                ),
                kind=state_kind,
            )
            return pa.table(
                {
                    "shard": pa.array([shard], pa.int32()),
                    "n_in": pa.array([g.num_rows], pa.int64()),
                    "n_matches": pa.array([int(delta.sum())], pa.int64()),
                }
            )

        ds = ray.data.read_parquet(bfiles, override_num_blocks=2 * num_shards)
        ds = ds.repartition(2 * num_shards, shuffle=False)
        return (
            ds.map_batches(project, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(shard_task, batch_format="pyarrow")
            .take_all()
        )

    # --------------------------------------------------------------- output
    def read_counts(self) -> pa.Table:
        """Final (key, n_matches) across all shards — the latest COMMITTED
        state snapshot per shard, plus any completed match still sitting in
        the carried tail (the regex fold defers a boundary-flush match whose
        greedy extension is still open; at stream end it must be counted)."""
        from ._microbatch import read_committed_state

        tables = [
            t.select([self.key_col, "n_matches", "tail"])
            for t in read_committed_state(self.ckpt, self.STATE_KIND)
        ]
        if not tables:
            return pa.table(
                {self.key_col: pa.array([], pa.string()), "n_matches": pa.array([], pa.int64())}
            )
        t = pa.concat_tables(tables)
        if self.pattern is not None:
            pending = pc.count_substring_regex(t["tail"], self.pattern)
        else:
            pending = pc.count_substring(t["tail"], self.literal)
        n = pc.add(t["n_matches"], pending.cast(pa.int64()))
        return pa.table({self.key_col: t[self.key_col], "n_matches": n})
