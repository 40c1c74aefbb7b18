#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/local_verify.py <sfDir> <outDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

For each query output parquet under outDir, runs the corresponding oracle
SQL from oracle_sql.json in DuckDB over the sfDir tables, then compares:
row count, column names (sorted), and exact values (rows sorted by all
columns). Exact equality — stricter than any plausible driver hash.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    # oracle_sql.json carries each entry twice (bare + ".parquet"-suffixed
    # for the driver's filename-keyed lookup); iterate bare names only.
    oracles = {k: v for k, v in oracles.items() if not k.endswith(".parquet")}

    n_pass = n_fail = 0
    for name in sorted(oracles):
        files = (glob.glob(os.path.join(out_dir, name + ".parquet", "*.parquet"))
                 or glob.glob(os.path.join(out_dir, name, "*.parquet")))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet({files!r})").df())
            want = canon(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        # exact value compare (NaN == NaN)
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
        except AssertionError as e:
            print(f"FAIL {name}: values differ\n{str(e)[:800]}")
            # show first mismatching rows
            neq = (got != want) & ~(got.isna() & want.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                print("  spark:", got.loc[i].to_dict())
                print("  duck :", want.loc[i].to_dict())
            n_fail += 1
            continue
        # dtype report (informational; driver may or may not check)
        dt_note = ""
        spark_dt = list(map(str, got.dtypes))
        duck_dt = list(map(str, want.dtypes))
        if spark_dt != duck_dt:
            dt_note = f"  [dtype diff: {list(zip(got.columns, spark_dt, duck_dt))}]"
        print(f"PASS {name} ({len(got)} rows){dt_note}")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
