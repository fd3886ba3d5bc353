"""Per-group top-k: the distributed "top N rows per key" operator (SURVEY
§2.6 ordering family — the grouped analogue of the global ``top_orders``).

Scale shape: a vectorized PARTIAL top-k inside every batch first (sort +
run-position prune, no Python per row), so at most k rows per (key, batch)
enter the one keyed exchange; the per-group finisher then ranks the
survivors. Shuffle volume is bounded by k × keys × batches regardless of how
many rows a hot key has — the pre-aggregation pattern the ray_guide
prescribes for skewed groupbys.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _rank_in_key(
    t: pa.Table,
    keys: list[str],
    value_col: str,
    tiebreak: list[str],
    descending: bool,
) -> tuple[pa.Table, np.ndarray]:
    """Sort by (keys asc, value desc|asc, tiebreak asc) and return the table
    with each row's 0-based position within its key run."""
    order = (
        [(c, "ascending") for c in keys]
        + [(value_col, "descending" if descending else "ascending")]
        + [(c, "ascending") for c in tiebreak]
    )
    t = t.sort_by(order)
    comb = t[keys[0]].combine_chunks().cast(pa.string())
    for c in keys[1:]:
        comb = pc.binary_join_element_wise(
            comb, t[c].combine_chunks().cast(pa.string()), "\x1f"
        )
    arr = comb.to_numpy(zero_copy_only=False)
    first = np.ones(len(arr), dtype=bool)
    first[1:] = arr[1:] != arr[:-1]
    run_id = np.cumsum(first) - 1
    starts = np.flatnonzero(first)
    pos = np.arange(len(arr), dtype=np.int64) - starts[run_id]
    return t, pos


def top_k_per_group(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    k: int,
    tiebreak: list[str] = (),
    descending: bool = True,
) -> ray.data.Dataset:
    """Top ``k`` rows per ``keys`` group ordered by ``value_col`` (ties broken
    by ``tiebreak`` ascending — supply enough columns for a total order or
    the result is nondeterministic across block layouts). Output = input
    columns + int64 ``rank`` (1-based)."""
    keys = list(keys)
    tiebreak = list(tiebreak)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        t, pos = _rank_in_key(t, keys, value_col, tiebreak, descending)
        return t.filter(pa.array(pos < k))

    def final(t: pa.Table) -> pa.Table:
        t, pos = _rank_in_key(t, keys, value_col, tiebreak, descending)
        t = t.append_column("rank", pa.array(pos + 1, pa.int64()))
        return t.filter(pc.less_equal(t["rank"], k))

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .map_groups(final, batch_format="pyarrow")
    )
