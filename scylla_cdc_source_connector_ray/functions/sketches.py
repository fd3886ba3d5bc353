"""Mergeable sketches for distinct counting at scale.

Exact distinct-per-group is a two-level groupby (dedup pairs, then count) —
fine when the pair set fits the shuffle. At 100 TB the scale path is a
**mergeable HyperLogLog** per batch: one 2^p-byte register array per group
per batch, max-merged in a tiny second stage (ray_guide "Aggregation at
scale": sketches are designed to be mergeable).

Deterministic: hashes are the same stable polars hash used for sharding.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count


def distinct_per_group_exact(
    ds: ray.data.Dataset, group_col: str, value_col: str
) -> ray.data.Dataset:
    """Exact COUNT(DISTINCT value) per group: dedup (group, value) pairs with
    one groupby, count pairs per group with a second (both shuffle only the
    pair columns)."""
    pairs = ds.select_columns([group_col, value_col])
    dedup = pairs.groupby([group_col, value_col]).aggregate(Count(alias_name="_n"))
    return (
        dedup.select_columns([group_col])
        .groupby(group_col)
        .aggregate(Count(alias_name="n_distinct"))
    )


class HyperLogLog:
    """Plain HLL (Flajolet et al.): p-bit bucket index, rank of remaining bits.

    ``add_hashed`` is fully vectorized over a uint64 hash array; ``merge`` is
    an elementwise max — the property that makes per-batch sketches cheap to
    combine in a reduce stage.
    """

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashed(self, h: np.ndarray) -> "HyperLogLog":
        h = h.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of the remaining bits + 1 (≤ 64-p+1)
        lz = np.zeros(len(h), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        cur = rest.copy()
        # vectorized leading-zero count via 6-step binary search
        shift = 32
        while shift >= 1:
            top = cur >> np.uint64(64 - shift)
            zero_top = top == 0
            lz[zero_top] += shift
            cur[zero_top] = cur[zero_top] << np.uint64(shift)
            shift //= 2
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        s = np.sum(2.0 ** (-self.registers.astype(np.float64)))
        e = alpha * m * m / s
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # small-range correction
        return float(e)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(b, dtype=np.uint8).copy()
        return h


def _stable_hash(values: pa.Array) -> np.ndarray:
    import polars as pl

    return pl.from_arrow(values).hash(seed=7).to_numpy().astype(np.uint64)


def distinct_per_group_hll(
    ds: ray.data.Dataset, group_col: str, value_col: str, p: int = 12
) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT value) per group: one HLL sketch per group
    per batch (map side), merged per group on the driver (sketches are tiny:
    groups × 2^p bytes). Accuracy ~1.04/sqrt(2^p) ≈ 1.6% at p=12."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        out_groups, out_sketches = [], []
        gcol = batch[group_col].combine_chunks()
        vcol = batch[value_col].combine_chunks()
        import pyarrow.compute as pc

        for g in pc.unique(gcol).to_pylist():
            mask = pc.equal(gcol, g)
            vals = vcol.filter(mask)
            hll = HyperLogLog(p).add_hashed(_stable_hash(vals))
            out_groups.append(g)
            out_sketches.append(hll.to_bytes())
        return pa.table(
            {group_col: pa.array(out_groups), "sketch": pa.array(out_sketches, pa.binary())}
        )

    partials = ds.map_batches(sketch_batch, batch_format="pyarrow").to_pandas()
    merged: dict = {}
    for g, blob in zip(partials[group_col], partials["sketch"]):
        if g in merged:
            merged[g].merge(HyperLogLog.from_bytes(blob, p))
        else:
            merged[g] = HyperLogLog.from_bytes(blob, p)
    return pd.DataFrame(
        {group_col: list(merged), "n_distinct_est": [h.estimate() for h in merged.values()]}
    )
