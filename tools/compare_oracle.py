#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare_oracle.py <verify_out_dir> <sf_dir>
Reads <verify_out_dir>/<name>/ parquet (Spark result) and oracle_sql.json,
runs each SQL in DuckDB against views named after the parquet tables in
<sf_dir>, and compares: row count, sorted column names, and a hash of the
value multiset (columns sorted by name, rows sorted).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np
import hashlib

def canon(df: pd.DataFrame) -> tuple:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize numerics
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    rows = sorted(map(tuple, df.astype(str).itertuples(index=False, name=None)))
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return len(df), tuple(df.columns), h, rows[:3]

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(f).replace(".parquet", "")
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    fails = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        try:
            sdf = pd.concat([pd.read_parquet(p) for p in
                             glob.glob(os.path.join(spark_dir, "*.parquet"))])
        except Exception as e:
            print(f"FAIL {name}: read spark: {e}"); fails += 1; continue
        try:
            ddf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb: {e}"); fails += 1; continue
        sn, sc, sh, sr = canon(sdf)
        dn, dc, dh, dr = canon(ddf)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duckdb={dc}"); fails += 1
        elif sn != dn:
            print(f"FAIL {name}: rows spark={sn} duckdb={dn}"); fails += 1
        elif sh != dh:
            print(f"FAIL {name}: hash mismatch ({sn} rows)")
            print(f"  spark : {sr}")
            print(f"  duckdb: {dr}")
            # find first differing row
            srows = sorted(map(tuple, sdf.reindex(sorted(sdf.columns),axis=1).astype(str).itertuples(index=False, name=None)))
            drows = sorted(map(tuple, ddf.reindex(sorted(ddf.columns),axis=1).astype(str).itertuples(index=False, name=None)))
            for a, b in zip(srows, drows):
                if a != b:
                    print(f"  first diff:\n   spark : {a}\n   duckdb: {b}")
                    break
            fails += 1
        else:
            print(f"OK   {name}: {sn} rows")
    queries_without_oracle = [d for d in os.listdir(out_dir)
                              if os.path.isdir(os.path.join(out_dir, d)) and d not in oracle]
    for q in sorted(queries_without_oracle):
        n = sum(len(pd.read_parquet(p)) for p in glob.glob(os.path.join(out_dir, q, "*.parquet")))
        print(f"ROWS {q}: {n} rows (no oracle)")
    print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
    return fails

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
