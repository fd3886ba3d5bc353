"""Trivially-correct single-threaded Python oracle for the CDC semantics
(FIXTURES.md §2): sort by (conv_id, turn_idx, ts, seq), fold ops per key with
an explicit per-key state machine. Deliberately slow and row-by-row — the
engine is compared against THIS."""

from __future__ import annotations

import pandas as pd


def cdc_oracle(df: pd.DataFrame) -> pd.DataFrame:
    """Input: transcript CDC log (conv_id, turn_idx, role, text, tool, ts[, seq]).
    Output: flat change events (op, before_*, after_*) in sorted order."""
    df = df.copy()
    if "seq" not in df.columns:
        df["seq"] = range(len(df))
    df = df.sort_values(["conv_id", "turn_idx", "ts", "seq"], kind="mergesort")
    state: dict[tuple, dict | None] = {}
    seen: set[tuple] = set()
    rows = []
    for r in df.itertuples(index=False):
        key = (r.conv_id, r.turn_idx)
        is_del = pd.isna(r.text)
        if is_del:
            op = "d"
        elif key not in seen:
            op = "c"
        else:
            op = "u"
        seen.add(key)
        before = state.get(key)
        after = None if is_del else {"role": r.role, "text": r.text, "tool": r.tool, "ts": r.ts}
        rows.append(
            {
                "conv_id": r.conv_id,
                "turn_idx": r.turn_idx,
                "op": op,
                **{f"before_{c}": (before or {}).get(c) for c in ("role", "text", "tool", "ts")},
                **{f"after_{c}": (after or {}).get(c) for c in ("role", "text", "tool", "ts")},
                "seq": r.seq,
            }
        )
        state[key] = after
    return pd.DataFrame(rows)
