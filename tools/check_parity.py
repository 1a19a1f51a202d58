#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_parity.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, runs the oracle SQL from
oracle_sql.json in DuckDB over the same parquet tables, and compares the
result with Spark's parquet output: columns sorted by name, rows in result
order, exact value equality (strings for timestamps, repr for floats).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            dt = df[c]
            if getattr(dt.dt, "tz", None) is not None:
                dt = dt.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = dt.astype("datetime64[us]")
        elif df[c].dtype == object:
            pass
        else:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                pass
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    import glob
    import os
    dumped = sorted(
        os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p))
    failures = []
    for name in dumped:
        spark_df = norm(pd.read_parquet(f"{out_dir}/{name}"))
        if name not in oracle:
            print(f"  {name:28s} rows-only: {len(spark_df)} rows"
                  + ("  ** EMPTY **" if len(spark_df) == 0 else ""))
            if len(spark_df) == 0:
                failures.append(name + " (empty rows-only result)")
            continue
        try:
            duck_df = norm(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"  {name:28s} ORACLE SQL ERROR: {e}")
            failures.append(name)
            continue
        ok = True
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"  {name:28s} COLUMN MISMATCH spark={list(spark_df.columns)} "
                  f"duck={list(duck_df.columns)}")
            ok = False
        elif len(spark_df) != len(duck_df):
            print(f"  {name:28s} ROWCOUNT spark={len(spark_df)} duck={len(duck_df)}")
            ok = False
        else:
            for c in spark_df.columns:
                a, b = spark_df[c], duck_df[c]
                try:
                    eq = (a.astype(str) == b.astype(str)) | (a.isna() & b.isna())
                except Exception:
                    eq = a == b
                if not eq.all():
                    i = int((~eq).idxmax())
                    print(f"  {name:28s} VALUE DIFF col={c} row={i}: "
                          f"spark={a.iloc[i]!r} duck={b.iloc[i]!r} "
                          f"({int((~eq).sum())} rows differ)")
                    ok = False
        if ok:
            print(f"  {name:28s} OK ({len(spark_df)} rows)")
        else:
            failures.append(name)
    print(f"\n{len(dumped) - len(failures)}/{len(dumped)} queries match")
    if failures:
        print("FAILURES:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
