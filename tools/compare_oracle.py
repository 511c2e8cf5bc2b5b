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
    # queries DuckDB SQL cannot express: independent pure-python oracles
    # (tools/pyoracles.py — own CDFs/exact tests/REML optimizer, no JVM)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyoracles import PY_ORACLES
    queries_without_oracle = [d for d in os.listdir(out_dir)
                              if os.path.isdir(os.path.join(out_dir, d)) and d not in oracle]
    for q in sorted(queries_without_oracle):
        spark_files = glob.glob(os.path.join(out_dir, q, "*.parquet"))
        if not spark_files:
            # pd.concat([]) raises; report the empty query and keep going
            print(f"FAIL {q}: 0 rows (no parquet part files)"); fails += 1
            continue
        sdf = pd.concat([pd.read_parquet(p) for p in spark_files])
        if q not in PY_ORACLES:
            print(f"ROWS {q}: {len(sdf)} rows (no oracle)")
            continue
        try:
            odf, opts = PY_ORACLES[q](con, sf_dir)
        except Exception as e:
            print(f"FAIL {q}: py-oracle: {e}"); fails += 1; continue
        fails += 0 if compare_py(q, sdf, odf, opts) else 1
    print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
    return fails


def compare_py(name, sdf, odf, opts):
    """Tolerant compare for the python oracles: exact on keys / ints /
    strings / bools, np.isclose on floats (NaN == NaN)."""
    keys = opts["keys"]
    rtol = opts.get("rtol", 1e-9)
    atol = opts.get("atol", 0.0)
    sdf = sdf.reindex(sorted(sdf.columns), axis=1).sort_values(keys).reset_index(drop=True)
    odf = odf.reindex(sorted(odf.columns), axis=1).sort_values(keys).reset_index(drop=True)
    if tuple(sdf.columns) != tuple(odf.columns):
        print(f"FAIL {name}: columns spark={tuple(sdf.columns)} py={tuple(odf.columns)}")
        return False
    if len(sdf) != len(odf):
        print(f"FAIL {name}: rows spark={len(sdf)} py={len(odf)}")
        return False
    for c in sdf.columns:
        s, o = sdf[c], odf[c]
        if pd.api.types.is_float_dtype(s) or pd.api.types.is_float_dtype(o):
            ok = np.isclose(s.astype(float), o.astype(float),
                            rtol=rtol, atol=atol, equal_nan=True).all()
        else:
            ok = (s.astype(str) == o.astype(str)).all()
        if not ok:
            bad = ~(np.isclose(s.astype(float), o.astype(float), rtol=rtol,
                               atol=atol, equal_nan=True)
                    if pd.api.types.is_float_dtype(s) or pd.api.types.is_float_dtype(o)
                    else (s.astype(str) == o.astype(str)))
            i = int(np.argmax(np.asarray(bad)))
            print(f"FAIL {name}: column {c} differs at row {i}: "
                  f"spark={s.iloc[i]} py={o.iloc[i]}")
            return False
    print(f"OK   {name}: {len(sdf)} rows (py-oracle)")
    return True

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
