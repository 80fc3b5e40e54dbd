"""Driver-contract self-check: run every queries() entry at a given sf
and compare against oracle_sql() via DuckDB (row count + schema names +
order-insensitive value equality), mimicking CORRECTNESS_r{N}.json.

Usage: python tools/check_queries.py [sf_dir] [query ...]
       python tools/check_queries.py [sf_dir] --window   # first-50 only
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype) == "object":
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--window"]
    window_only = "--window" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    if window_only:
        qs = dict(list(qs.items())[:50])  # the driver's exact window
    sqls = e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok   {name}: rows-only, {len(mine)} rows ({dt:.1f}s)")
            continue
        ref = canon(con.sql(sqls[name]).df())
        if list(mine.columns) != list(ref.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} != {list(ref.columns)}")
            failed.append(name)
            continue
        if len(mine) != len(ref):
            print(f"FAIL {name}: rows {len(mine)} != {len(ref)}")
            failed.append(name)
            continue
        try:
            pd.testing.assert_frame_equal(mine, ref, check_dtype=False)
            print(f"ok   {name}: {len(mine)} rows match ({dt:.1f}s)")
        except AssertionError as ex:
            print(f"FAIL {name}: values differ: {str(ex)[:300]}")
            failed.append(name)
    ray.shutdown()
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
