#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (NOT shipped library
code — dev tooling only).

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet dir produced by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB against views named
after the testdata tables, and compares: row count, sorted-column
schema-free value hash, and first differing rows on mismatch.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main(out_dir: str, sf_dir: str) -> int:
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for qdir in sorted(p for p in out.iterdir() if p.is_dir()):
        name = qdir.name
        spark_df = pd.read_parquet(qdir)
        if name not in oracle:
            print(f"  {name:32s} rows-only: {len(spark_df)} rows")
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"✗ {name:32s} ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"✗ {name:32s} SCHEMA: spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"✗ {name:32s} ROWS: spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=True)
            print(f"✓ {name:32s} {len(a)} rows")
            n_pass += 1
        except AssertionError:
            # retry with tolerance to show whether it's float jitter
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                              rtol=1e-9, atol=1e-9)
                print(f"~ {name:32s} FLOAT-JITTER (would fail exact hash)")
            except AssertionError as e2:
                print(f"✗ {name:32s} VALUES differ: {str(e2).splitlines()[-1]}")
                diff = a.compare(b) if a.shape == b.shape else None
                if diff is not None and not diff.empty:
                    print(diff.head(5).to_string())
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
