#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result) and runs
<verifyOutDir>/oracle_sql.json[name] in DuckDB with views over
<sfDir>/*.parquet, then compares order-insensitively (columns sorted by
name, rows sorted by all columns) and exactly (values stringified).
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify to dodge dtype-only diffs but keep values exact
    df = df.astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        spark_df = pd.read_parquet(d)
        if name not in oracle:
            print(f"{name:28s} rows-only: {len(spark_df)} rows")
            continue
        duck_df = con.execute(oracle[name]).df()
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"{name:28s} FAIL cols spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"{name:28s} FAIL rows spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        eq = a.equals(b)
        if not eq:
            diff = (a != b).any(axis=1)
            print(f"{name:28s} FAIL {int(diff.sum())}/{len(a)} rows differ; first:")
            idx = diff[diff].index[:3]
            for i in idx:
                print("   spark:", a.loc[i].to_dict())
                print("   duck :", b.loc[i].to_dict())
            n_fail += 1
        else:
            print(f"{name:28s} OK   {len(a)} rows")
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
