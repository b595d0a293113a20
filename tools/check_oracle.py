#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run each oracle
SQL in DuckDB over the same parquet tables and compare with the Verify
output parquet (columns sorted by name, rows sorted, exact values).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import numpy as np
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
    # Hash-fragility audit: any float64 column in a hash-checked query
    # is exactly the class the driver's DuckDB version can flip — its
    # ROUND(double, n) lands on a different last-ulp double than local
    # DuckDB/Spark for some inputs. A green compare HERE does not imply
    # the driver's hash passes THERE. Hashed columns should be
    # integers, strings, or DECIMALs by construction.
    float_warn = {}
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
        # Fatal tier: any array/struct-typed output column — the
        # driver's pandas harness row-sorts the frame and dies on
        # unhashable cells (the q_pca_project r11/r12 failure class).
        # Hashed outputs must be scalar columns; explode instead.
        nested = [c for c in got.columns
                  if got[c].map(lambda v: isinstance(
                      v, (list, tuple, dict, np.ndarray))).any()]
        if nested:
            print(f"FAIL {name}: array/struct output columns {nested} "
                  "(driver harness cannot row-sort them; emit scalars)")
            n_fail += 1
            continue
        # Fatal tier: dtype-kind mismatch between the Spark parquet and
        # the oracle frame where one side is float and the other
        # integer. DuckDB returns HUGEINT for SUM(BIGINT) and pandas
        # renders HUGEINT as float64 — `3.0 == 3` passes the value
        # compare below, but the driver's hash is dtype-sensitive and
        # flips (the r13 q_vocab_oov / q_mix_temperature failure).
        # int32-vs-int64 is fine (driver-proven across many queries);
        # the fix for float-vs-int is CAST(... AS BIGINT) in the SQL.
        kind_bad = [
            c for c in want.columns
            if {want[c].dtype.kind, got[c].dtype.kind} == {"f", "i"}]
        if kind_bad:
            print(f"FAIL {name}: float-vs-int dtype mismatch in "
                  f"{kind_bad} (oracle "
                  f"{[str(want[c].dtype) for c in kind_bad]} vs spark "
                  f"{[str(got[c].dtype) for c in kind_bad]}; the "
                  "driver's hash is dtype-sensitive — CAST the oracle "
                  "expression AS BIGINT)")
            n_fail += 1
            continue
        floats = [c for c in got.columns if str(got[c].dtype) == "float64"]
        # Fatal tier: a float64 column whose defining SQL expression is
        # ROUND(...) — i.e. the surfaced double IS an engine-ROUND
        # output. Raw floats and exact-DECIMAL->DOUBLE casts are
        # bit-identical by construction and only informational.
        import re as _re
        fatal = []
        for c in floats:
            for m in _re.finditer(r"\bAS\s+" + _re.escape(c) + r"\b",
                                  sql, _re.I):
                ctx = sql[max(0, m.start() - 160):m.start()]
                # ROUND over DECIMAL operands is exact decimal
                # arithmetic — engine-independent, not the fatal class
                if (_re.search(r"\bROUND\s*\(", ctx, _re.I)
                        and "DECIMAL" not in ctx.upper()):
                    fatal.append(c)
                    break
        if fatal:
            float_warn[name] = fatal
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
    if float_warn:
        print(f"\nWARN hash-fragile float64 columns in {len(float_warn)} "
              "hash-checked queries (engine ROUND(double,n) can flip the "
              "driver's hash even when this local compare is green):")
        for name, cols in sorted(float_warn.items()):
            print(f"  {name}: {cols}")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(float_warn)} float64-warn")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
