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
    n = t.num_rows
    # Per-column null-safe boundary detection (never a joined composite
    # string: a NULL in any key column would null the join and merge distinct
    # groups, and a separator char inside a string key would collide them).
    first = np.zeros(n, dtype=bool)
    if n:
        first[0] = True
    for c in keys:
        a = t[c].combine_chunks()
        cur, prev = a.slice(1), a.slice(0, n - 1)
        neq = pc.fill_null(pc.not_equal(cur, prev), False)
        vdiff = pc.xor(pc.is_null(cur), pc.is_null(prev))
        first[1:] |= pc.or_(neq, vdiff).to_numpy(zero_copy_only=False)
    run_id = np.cumsum(first) - 1
    starts = np.flatnonzero(first)
    pos = np.arange(n, dtype=np.int64) - starts[run_id]
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


def grouped_quantiles(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    quantiles: tuple[int, ...] = (25, 50, 95),
) -> ray.data.Dataset:
    """EXACT per-group quantiles of an int64 value column. Convention (shared
    with the SQL twin so no library-specific interpolation leaks in): the
    ascending element at 0-based index ``(n-1)*q // 100``. NULL values are
    dropped, like SQL aggregates.

    Scale shape: only ``(keys, value)`` pairs cross the exchange (project
    before the groupby) and the per-group task is one numpy sort — the honest
    cost of EXACT quantiles. When an approximation is acceptable at 100 TB,
    pre-bin values per batch into histograms or a mergeable t-digest instead;
    this operator is the exact baseline those would be validated against."""
    keys = list(keys)

    def project(t: pa.Table) -> pa.Table:
        t = t.select([*keys, value_col])
        return t.filter(pc.is_valid(t[value_col]))

    def per_group(t: pa.Table) -> pa.Table:
        v = np.sort(t[value_col].combine_chunks().to_numpy(zero_copy_only=False))
        n = len(v)
        cols = {k: t[k].slice(0, 1) for k in keys}
        cols["n"] = pa.array([n], pa.int64())
        for q in quantiles:
            cols[f"p{q}"] = pa.array([int(v[(n - 1) * q // 100])], pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby(keys)
        .map_groups(per_group, batch_format="pyarrow")
    )
