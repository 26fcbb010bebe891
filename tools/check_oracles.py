"""Local mirror of the driver's correctness harness.

Runs every ``queries()`` entry and compares against ``oracle_sql()``
via DuckDB: row count, column names, order-insensitive value hash
(columns sorted by name, rows sorted, values stringified).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ours: pd.DataFrame, oracle: pd.DataFrame) -> list:
    problems = []
    if sorted(ours.columns) != sorted(oracle.columns):
        problems.append(f"schema {sorted(ours.columns)} vs {sorted(oracle.columns)}")
        return problems
    if len(ours) != len(oracle):
        problems.append(f"rows {len(ours)} vs {len(oracle)}")
    a, b = canon(ours), canon(oracle)
    if len(a) == len(b) and not a.equals(b):
        diff = (a != b).any(axis=1)
        idx = diff[diff].index[:3].tolist()
        for i in idx:
            problems.append(f"row {i}: ours={a.loc[i].to_dict()} "
                            f"oracle={b.loc[i].to_dict()}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, sqls = entry.queries(), entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ROWS {name}: {len(ours)} rows, cols={list(ours.columns)} "
                  f"({dt:.1f}s) [rows-only]")
            continue
        try:
            oracle = con.execute(sqls[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {e}")
            failures += 1
            continue
        problems = compare(name, ours, oracle)
        if problems:
            failures += 1
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems))
        else:
            print(f"OK   {name}: {len(ours)} rows ({dt:.1f}s)")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
