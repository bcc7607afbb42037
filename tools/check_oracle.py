#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Registers each fixture parquet as a DuckDB view, runs every oracle_sql.json
entry, and compares against the Spark parquet dump: columns sorted by name,
rows sorted by all columns, values compared exactly (after normalizing
timestamps to UTC-naive microseconds).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].dt.floor("us")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            expected = norm(con.sql(sql).df())
            actual = norm(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL  {name}: {e}")
            n_bad += 1
            continue
        if list(expected.columns) != list(actual.columns):
            print(f"FAIL  {name}: columns {list(actual.columns)} != {list(expected.columns)}")
            n_bad += 1
        elif len(expected) != len(actual):
            print(f"FAIL  {name}: rows {len(actual)} != {len(expected)}")
            n_bad += 1
        elif not expected.equals(actual):
            neq = (expected != actual) & ~(expected.isna() & actual.isna())
            bad_cols = [c for c in expected.columns if neq[c].any()]
            print(f"FAIL  {name}: value mismatch in {bad_cols} "
                  f"({int(neq.any(axis=1).sum())}/{len(expected)} rows)")
            for c in bad_cols[:2]:
                i = neq[c].idxmax()
                print(f"      {c}[{i}]: spark={actual[c][i]!r} duckdb={expected[c][i]!r}")
            n_bad += 1
        else:
            print(f"ok    {name} ({len(expected)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
