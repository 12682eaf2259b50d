#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view, runs every oracle SQL
from <verifyOutDir>/oracle_sql.json, and compares against the Spark
parquet dumps: schema (column names), row count, and cell-exact values
after sorting columns by name and rows by all columns. Dev-only tool —
NOT part of the graft library (driver-side python is allowed for
validation only).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = canon(con.sql(sql).df())
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: cols want={list(want.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            n_fail += 1
            continue
        mismatched = []
        for c in want.columns:
            a, b = want[c], got[c]
            try:
                eq = (a.astype(str) == b.astype(str))
            except Exception:
                eq = pd.Series([False] * len(a))
            if not eq.all():
                i = int(eq.idxmin())
                mismatched.append((c, i, a.iloc[i], b.iloc[i]))
        if mismatched:
            c, i, av, bv = mismatched[0]
            print(f"FAIL {name}: col {c} row {i}: oracle={av!r} spark={bv!r} "
                  f"({len(mismatched)} cols differ)")
            n_fail += 1
        else:
            # dtype note (schema-level) — warn only
            dt = [(c, str(want[c].dtype), str(got[c].dtype))
                  for c in want.columns if str(want[c].dtype) != str(got[c].dtype)]
            note = f"  [dtype diff: {dt}]" if dt else ""
            print(f"PASS {name} ({len(want)} rows){note}")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
