"""Hot-key salting + re-merge (north_star skew clause; SURVEY.md §4 "Skew").

The reference balances only task *counts*, never load
(``TaskConfigBuilder.java:38-42``) — long conversations would pin one task.
Here a conversation whose row count exceeds ``cfg.hot_key_threshold`` is
*salted*: its rows shard on ``hash(conv_id, turn_idx // chunk)`` instead of
``hash(conv_id)``, spreading the conversation over up to ``salt_factor``
sub-shards. Correctness holds because every stage keyed on the full
``(conv_id, turn_idx)`` row key (op-derive image correlation, keyed dedup)
only needs *key*-level co-location, which salting by ``turn_idx`` preserves.
Conversation-level stages (session windows, conv-state join) must not see
salted sharding — they use plain :func:`..schema.with_shard`.

The hot set must be STABLE across micro-batches (a key's state lives in its
shard's state file), so the runner records it in the manifest; changing it is
an epoch bump — exactly the reference's generation-change semantics
(SURVEY.md §1.1 "Generation").

Per-conversation output order is restored by the final keyed sort
(``sort_by (conv_id, turn_idx, ts, seq)``), which every consumer of capture
output already applies — salting changes placement, never content.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data
from ray.data.aggregate import Count

from ..schema import shard_of, with_shard


def detect_hot_convs(ds: ray.data.Dataset, threshold: int) -> list[str]:
    """Row counts per conv (partial-agg'd by Ray) → convs above threshold.
    The result is tiny (hot keys are rare by definition) — safe to collect."""
    import pyarrow.compute as pc

    counts = ds.groupby("conv_id").aggregate(Count(alias_name="n"))
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], threshold)), batch_format="pyarrow"
    )
    return sorted(r["conv_id"] for r in hot.take_all())


def with_salted_shard(
    batch: pa.Table,
    num_shards: int,
    hot_convs: frozenset[str],
    salt_chunk: int,
) -> pa.Table:
    """Shard column with hot conversations salted by ``turn_idx // salt_chunk``.

    Salted key = ``conv_id + "#" + bucket`` run through the same stable hash,
    so placement stays deterministic across batches and processes.
    """
    import numpy as np
    import pyarrow.compute as pc

    conv = batch["conv_id"].combine_chunks()
    if not hot_convs:
        return with_shard(batch, num_shards)
    conv_np = conv.to_numpy(zero_copy_only=False)
    is_hot = np.isin(conv_np, list(hot_convs))
    if not is_hot.any():
        return with_shard(batch, num_shards)
    bucket = (
        batch["turn_idx"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        // salt_chunk
    )
    salted_key = np.where(
        is_hot, np.char.add(np.char.add(conv_np.astype(str), "#"), bucket.astype(str)), conv_np
    )
    shard = shard_of(pa.array(salted_key, pa.string()), num_shards)
    if "shard" in batch.column_names:
        batch = batch.drop_columns(["shard"])
    return batch.append_column("shard", shard)


