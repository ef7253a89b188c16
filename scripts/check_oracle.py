#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB oracle gate.

Usage: python3 scripts/check_oracle.py <verify_out_dir> <sf_dir>

Mirrors the driver: for each query in oracle_sql.json, run the SQL in
DuckDB over the sf parquet tables, load the Spark-dumped parquet, sort
columns by name, and compare values (exact for ints/strings, atol for
floats). Reports both row-order-sensitive and row-sorted comparison.
"""
import json
import sys
import glob

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df


def compare(name, spark_df, duck_df):
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(f"columns differ: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return problems
    s, d = norm(spark_df), norm(duck_df)
    if len(s) != len(d):
        problems.append(f"row count differ: spark={len(s)} duck={len(d)}")
        return problems
    # The driver's hash gate serializes values, so an int column on one side
    # vs float on the other (e.g. DuckDB HUGEINT -> float64) hash-mismatches
    # even when allclose passes. Flag dtype-kind disagreement as a failure.
    for col in s.columns:
        ka, kb = s[col].dtype.kind, d[col].dtype.kind
        if {ka, kb} in ({"i", "f"}, {"u", "f"}):
            problems.append(
                f"dtype kind mismatch col {col}: spark={s[col].dtype} duck={d[col].dtype} "
                f"(int-vs-float hashes differently in the driver)")
    if problems:
        return problems
    for order_label, (ss, dd) in {
        "as-is": (s, d),
        "sorted": (s.sort_values(list(s.columns)).reset_index(drop=True),
                   d.sort_values(list(d.columns)).reset_index(drop=True)),
    }.items():
        for col in s.columns:
            a, b = ss[col], dd[col]
            if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
                ok = np.allclose(a.astype(float).fillna(-1e308),
                                 b.astype(float).fillna(-1e308), atol=1e-9, rtol=0)
            else:
                ok = (a.astype(str).values == b.astype(str).values).all()
            if not ok:
                mism = (ss[col].astype(str).values != dd[col].astype(str).values)
                idx = int(np.argmax(mism)) if mism.any() else 0
                problems.append(
                    f"[{order_label}] col {col} ({a.dtype}/{b.dtype}) mismatch @row {idx}: "
                    f"spark={ss[col].iloc[idx]!r} duck={dd[col].iloc[idx]!r}")
                break
    return problems


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = compare(name, spark_df, duck_df)
        if problems:
            print(f"FAIL {name}:")
            for p in problems:
                print(f"   {p}")
        else:
            n_ok += 1
            print(f"OK   {name} ({len(spark_df)} rows, {len(spark_df.columns)} cols)")
    print(f"== {n_ok}/{len(oracle)} oracle-checked queries pass")
    sys.exit(0 if n_ok == len(oracle) else 1)


if __name__ == "__main__":
    main()
