"""Mimic the driver's correctness gate locally: run every ``queries()`` entry
and its ``oracle_sql()`` twin on the same sf dir, compare row count, column
names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd
import ray


def to_pandas(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[ns]")
        elif df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().use_polars_sort = True

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = normalize(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"[FAIL] {name}: query raised {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        if name not in os_:
            print(f"[rows-only] {name}: {len(mine)} rows")
            continue
        try:
            oracle = normalize(con.sql(os_[name]).df())
        except Exception as ex:
            print(f"[FAIL] {name}: oracle raised {ex}")
            failed.append(name)
            continue
        ok_cols = list(mine.columns) == list(oracle.columns)
        ok_rows = len(mine) == len(oracle)
        ok_vals = False
        if ok_cols and ok_rows:
            try:
                # dtype-strict: the driver's value hash distinguishes int64 from
                # float64 (DuckDB HUGEINT -> float64 burned round 1) — after the
                # int-width normalization above, any remaining dtype gap is real.
                pd.testing.assert_frame_equal(mine, oracle, check_dtype=True, check_exact=True)
                ok_vals = True
            except AssertionError as ex:
                print(f"  value diff: {str(ex).splitlines()[0]}")
        status = "OK" if (ok_cols and ok_rows and ok_vals) else "FAIL"
        if status == "FAIL":
            failed.append(name)
            print(f"[{status}] {name}: rows {len(mine)}/{len(oracle)} cols_match={ok_cols}")
            if not ok_cols:
                print(f"   mine:   {list(mine.columns)}\n   oracle: {list(oracle.columns)}")
        else:
            print(f"[OK] {name}: {len(mine)} rows")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
