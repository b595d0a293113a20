#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run each oracle
SQL in DuckDB over the same parquet tables and compare with the Verify
output parquet (columns sorted by name, rows sorted, exact values).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = norm(con.execute(sql).df())
            got = norm(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs oracle {list(want.columns)}")
            n_fail += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows {len(got)} vs oracle {len(want)}")
            n_fail += 1
            continue
        mismatch = []
        for c in want.columns:
            a, b = got[c], want[c]
            try:
                same = (a.isna() & b.isna()) | (a == b)
                # timestamps/objects may need repr compare
                if not bool(same.all()):
                    if a.astype(str).equals(b.astype(str)):
                        continue
                    mismatch.append(c)
            except Exception:
                if not a.astype(str).equals(b.astype(str)):
                    mismatch.append(c)
        if mismatch:
            print(f"FAIL {name}: value mismatch in {mismatch}")
            for c in mismatch[:2]:
                diff = got[c] != want[c]
                idx = diff[diff].index[:3]
                for i in idx:
                    print(f"   [{i}] got={got[c][i]!r} want={want[c][i]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
