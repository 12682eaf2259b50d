#!/usr/bin/env python3
"""parity.py with a skip-list and a bounded DuckDB spill — for sweeps at
SFs where individual oracles exceed the machine (sf1: the containment /
jaccard postings self-joins spill past the free disk). Dev-only.

Usage: python3 tools/parity_subset.py <sfDir> <verifyOutDir> [skip1,skip2,...]
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


def main(sf_dir: str, out_dir: str, skip: set) -> int:
    con = duckdb.connect()
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    con.sql("SET max_temp_directory_size='40GB'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if name in skip:
            print(f"SKIP {name}")
            continue
        try:
            want = canon(con.sql(sql).df())
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)
            n_fail += 1
            continue
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: cols want={list(want.columns)} got={list(got.columns)}", flush=True)
            n_fail += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}", flush=True)
            n_fail += 1
            continue
        bad = None
        for c in want.columns:
            a, b = want[c], got[c]
            try:
                eq = (a.astype(str) == b.astype(str))
            except Exception:
                eq = pd.Series([False] * len(a))
            if not eq.all():
                i = int(eq.idxmin())
                bad = (c, i, a.iloc[i], b.iloc[i])
                break
        if bad:
            c, i, av, bv = bad
            print(f"FAIL {name}: col {c} row {i}: oracle={av!r} spark={bv!r}", flush=True)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(want)} rows)", flush=True)
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {len(skip)} skipped")
    return 1 if n_fail else 0


if __name__ == "__main__":
    skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
    sys.exit(main(sys.argv[1], sys.argv[2], skip))
