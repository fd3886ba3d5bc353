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
    pair columns). NULL values are dropped first — SQL ``count(DISTINCT x)``
    ignores them, and Ray's polars sort shuffle CRASHES on actual nulls in a
    string group key ('<' NoneType/str). ``group_col`` is assumed non-null
    (here: derived windows of non-null ts); use null-safe companion columns
    (stages.topk.null_safe_group_cols) if a nullable group key is ever needed."""
    import pyarrow.compute as _pc

    pairs = ds.select_columns([group_col, value_col]).map_batches(
        lambda t: t.filter(_pc.is_valid(t[value_col])), batch_format="pyarrow"
    )
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


# ---------------------------------------------------------------------------
# KLL quantile sketch (deterministic compaction)
# ---------------------------------------------------------------------------
class KLLSketch:
    """Mergeable quantile sketch (Karnin–Lang–Liberty, FOCS'16) with
    DETERMINISTIC alternating-parity compaction instead of coin flips —
    replay/exactly-once state must be byte-stable, and the alternating
    variant (each level flips its keep-offset per compaction) keeps the
    O(1/k) average rank error in exchange for a worse worst-case constant.

    Level ``l`` holds items of weight ``2^l``; capacities shrink
    geometrically from the top level (ratio 2/3, floor 2). ``update`` is an
    array append + compress (compaction sorts, so input ORDER never affects
    the result — only the value multiset does); ``merge`` is a level-wise
    multiset union + compress, making per-block partial sketches safe to
    combine in any grouping. State is O(k) values per key regardless of n —
    the adaptive complement to the fixed-width histogram sketch
    (``stages/topk.py::grouped_quantiles_hist``), which needs a bin width
    chosen in advance.
    """

    RATIO = 2.0 / 3.0

    def __init__(self, k: int = 200):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.parity: list[int] = [0]
        self.n = 0  # total weight (item count)

    # ------------------------------------------------------------ internals
    def _cap(self, lvl: int) -> int:
        h = len(self.levels)
        return max(2, int(np.ceil(self.k * self.RATIO ** (h - 1 - lvl))))

    def _compress(self) -> None:
        lvl = 0
        while lvl < len(self.levels):
            buf = self.levels[lvl]
            if len(buf) <= self._cap(lvl):
                lvl += 1
                continue
            buf = np.sort(buf)
            m2 = (len(buf) // 2) * 2
            off = self.parity[lvl] & 1
            self.parity[lvl] += 1
            promoted = buf[off:m2:2]
            grew = lvl + 1 == len(self.levels)
            if grew:
                self.levels.append(np.empty(0, np.float64))
                self.parity.append(0)
            self.levels[lvl] = buf[m2:]  # odd remainder stays (≤1 item)
            self.levels[lvl + 1] = np.concatenate([self.levels[lvl + 1], promoted])
            if grew:
                # height growth shrinks EVERY level's cap — levels already
                # passed may now be over-cap; restart the scan so the O(k)
                # memory bound holds immediately, not at the next update
                lvl = 0

    # --------------------------------------------------------------- update
    def update(self, values: np.ndarray) -> "KLLSketch":
        values = np.asarray(values, np.float64)
        values = values[~np.isnan(values)]
        if len(values) == 0:
            return self
        self.levels[0] = np.concatenate([self.levels[0], values])
        self.n += len(values)
        self._compress()
        return self

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if other.k != self.k:
            raise ValueError("cannot merge sketches with different k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.float64))
            self.parity.append(0)
        for lvl, buf in enumerate(other.levels):
            if len(buf):
                self.levels[lvl] = np.concatenate([self.levels[lvl], buf])
            self.parity[lvl] += other.parity[lvl]
        self.n += other.n
        self._compress()
        return self

    # --------------------------------------------------------------- query
    def quantiles(self, qs: tuple[int, ...]) -> list[float]:
        """Estimates at integer percentiles ``qs`` — same rank convention as
        the exact operator: rank = (n-1) * q // 100, smallest value whose
        cumulative weight exceeds the rank."""
        vals = np.concatenate(self.levels)
        if len(vals) == 0:
            return [float("nan")] * len(qs)
        wts = np.concatenate(
            [np.full(len(b), 1 << l, np.int64) for l, b in enumerate(self.levels)]
        )
        order = np.argsort(vals, kind="stable")
        vals, cum = vals[order], np.cumsum(wts[order])
        out = []
        for q in qs:
            rank = (self.n - 1) * q // 100
            out.append(float(vals[np.searchsorted(cum, rank + 1, side="left")]))
        return out

    # -------------------------------------------------------- serialization
    def to_rows(self) -> tuple[np.ndarray, np.ndarray, list[np.ndarray]]:
        """(level, parity, values[]) per non-trivial level — the parquet
        state layout (one row per level, values as list<double>)."""
        lv, par, vals = [], [], []
        for l, b in enumerate(self.levels):
            if len(b) or self.parity[l]:
                lv.append(l)
                par.append(self.parity[l])
                vals.append(np.sort(b))  # canonical order: byte-stable state
        return np.array(lv, np.int32), np.array(par, np.int64), vals

    @classmethod
    def combine_rows(cls, k: int, levels, parities, values) -> "KLLSketch":
        """Multiset-combine (level, parity, values[]) rows from MANY partial
        sketches of the same key — duplicate levels concatenate (order-free),
        parities add — then compress once. The grouped-operator merge path."""
        s = cls(k)
        for l, p, v in zip(levels, parities, values):
            l = int(l)
            while len(s.levels) <= l:
                s.levels.append(np.empty(0, np.float64))
                s.parity.append(0)
            v = np.asarray(v, np.float64)
            s.levels[l] = np.concatenate([s.levels[l], v])
            s.parity[l] += int(p)
            s.n += len(v) * (1 << l)
        s._compress()
        return s

    @classmethod
    def from_rows(cls, k: int, levels, parities, values) -> "KLLSketch":
        s = cls(k)
        for l, p, v in zip(levels, parities, values):
            l = int(l)
            while len(s.levels) <= l:
                s.levels.append(np.empty(0, np.float64))
                s.parity.append(0)
            s.levels[l] = np.asarray(v, np.float64)
            s.parity[l] = int(p)
            s.n += len(s.levels[l]) * (1 << l)
        return s
