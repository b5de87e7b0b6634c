#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Loads each query result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same sf tables, sorts
columns by name, and compares row counts and per-cell values (floats to a
tolerance-free exact repr after normalization). Dev tool only — the real
gate is driver-side.

Usage: check_oracle.py <sfDir> <verifyOutDir> [queryName ...]
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_df(df):
    df = df[sorted(df.columns)]
    sort_cols = list(df.columns)
    df = df.sort_values(by=sort_cols, kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = set(sys.argv[3:])
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
            g, w = norm_df(got), norm_df(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
                n_fail += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
                n_fail += 1
                continue
            # exact cell compare with dtype normalization
            import pandas as pd
            mism = None
            for c in g.columns:
                a, b = g[c], w[c]
                try:
                    a2 = a.astype("float64") if a.dtype.kind in "if" else a.astype(str)
                    b2 = b.astype("float64") if b.dtype.kind in "if" else b.astype(str)
                except Exception:
                    a2, b2 = a.astype(str), b.astype(str)
                if a2.dtype.kind == "f":
                    neq = ~((a2 == b2) | (a2.isna() & b2.isna()))
                else:
                    neq = a2 != b2
                if neq.any():
                    i = neq.idxmax()
                    mism = (c, i, a2[i], b2[i])
                    break
            if mism:
                print(f"FAIL {name}: col {mism[0]} row {mism[1]}: got {mism[2]!r} want {mism[3]!r}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(g)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
