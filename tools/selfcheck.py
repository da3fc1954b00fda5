#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run each oracle SQL
in DuckDB over the fixture tables, compare (sort-normalized, float-rounded)
against the Verify parquet output. Dev tool only — the engine itself has no
Python dependency."""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")

oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            continue
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("float64")  # unify int widths
    return df.sort_values(by=list(df.columns), ignore_index=True)

ok, bad = [], []
for name in sorted(glob.glob(f"{OUT_DIR}/*/")):
    qname = os.path.basename(name.rstrip("/"))
    spark_df = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(f"{name}/*.parquet")],
        ignore_index=True) if glob.glob(f"{name}/*.parquet") else None
    if qname not in oracle:
        n = 0 if spark_df is None else len(spark_df)
        status = "ROWS_ONLY" if n > 0 else "EMPTY!"
        (ok if n > 0 else bad).append((qname, status, f"rows={n}"))
        continue
    try:
        duck_df = con.sql(oracle[qname]).df()
    except Exception as e:
        bad.append((qname, "ORACLE_SQL_ERROR", str(e).split(chr(10))[0][:120]))
        continue
    if spark_df is None:
        bad.append((qname, "NO_SPARK_OUTPUT", ""))
        continue
    a, b = normalize(spark_df), normalize(duck_df)
    if sorted(a.columns) != sorted(b.columns):
        bad.append((qname, "SCHEMA_MISMATCH",
                    f"spark={list(a.columns)} duck={list(b.columns)}"))
        continue
    if len(a) != len(b):
        bad.append((qname, "ROWCOUNT_MISMATCH", f"spark={len(a)} duck={len(b)}"))
        continue
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                      check_exact=False, rtol=1e-6, atol=1e-6)
        ok.append((qname, "MATCH", f"rows={len(a)}"))
    except AssertionError as e:
        bad.append((qname, "VALUE_MISMATCH", str(e).split(chr(10))[-1][:160]))

for q, s, d in ok:
    print(f"  OK {q:28s} {s:10s} {d}")
for q, s, d in bad:
    print(f"FAIL {q:28s} {s:18s} {d}")
print(f"\n{len(ok)} ok, {len(bad)} fail")
sys.exit(1 if bad else 0)
