#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB over the
parquet tables in <sfDir>, loads the Spark result parquet written by
graft.Verify from <outDir>/<name>/, canonicalizes both sides (columns
sorted by name, rows sorted by all columns) and compares values.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            failures += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}")
            failures += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}")
            failures += 1
            continue
        # exact value compare, mirroring a hash equality check
        s_str = s.astype(str).reset_index(drop=True)
        d_str = d.astype(str).reset_index(drop=True)
        neq = (s_str != d_str)
        if neq.any().any():
            bad_cols = [c for c in s.columns if neq[c].any()]
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:2]:
                idx = neq[c].idxmax()
                print(f"  e.g. row {idx} col {c}: spark={s_str[c][idx]!r} duck={d_str[c][idx]!r}")
            failures += 1
            continue
        print(f"PASS {name} ({len(s)} rows, {len(s.columns)} cols)")
    print(f"== {len(oracle) - failures}/{len(oracle)} queries match ==")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
