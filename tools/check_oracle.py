#!/usr/bin/env python3
"""Local replay of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sf_dir> <verify_out_dir>

Loads each <verify_out_dir>/<name> parquet (Spark result), runs the
matching SQL from oracle_sql.json in DuckDB against the sf_dir parquet
tables, sorts columns by name and rows by value, and compares.
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for d in sorted(Path(out_dir).iterdir()):
        if not d.is_dir():
            continue
        name = d.name
        try:
            spark_df = duckdb.connect().execute(
                f"SELECT * FROM '{d}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"✗ NO-OUTPUT  {name}: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"  rows-only  {name}: {len(spark_df)} rows")
            continue
        try:
            oracle_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"✗ ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        s, o = canon(spark_df), canon(oracle_df)
        if list(s.columns) != list(o.columns):
            print(f"✗ SCHEMA     {name}: spark={list(s.columns)} oracle={list(o.columns)}")
            n_fail += 1
            continue
        if len(s) != len(o):
            print(f"✗ ROWCOUNT   {name}: spark={len(s)} oracle={len(o)}")
            n_fail += 1
            continue
        if s.equals(o):
            print(f"✓ MATCH      {name}: {len(s)} rows")
            n_pass += 1
        else:
            neq = (s != o) & ~(s.isna() & o.isna())
            bad_cols = [c for c in s.columns if neq[c].any()]
            print(f"✗ VALUES     {name}: mismatched cols {bad_cols}")
            for c in bad_cols[:3]:
                idx = neq[c].idxmax()
                print(f"    {c}[{idx}]: spark={s[c][idx]!r} oracle={o[c][idx]!r}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
