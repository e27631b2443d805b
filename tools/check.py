#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: compare Verify output
parquet against DuckDB running SparkEntry.oracleSql on the same tables.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
try:
    expected = set(json.load(open(f"{out_dir}/queries.json")))
except FileNotFoundError:
    expected = set()
present = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
n_pass = n_fail = 0
for name in sorted(expected - present):
    print(f"FAIL {name}: NO OUTPUT (query failed before writing)")
    n_fail += 1
for name in sorted(present):
    d = os.path.join(out_dir, name)
    spark_df = pq.read_table(d).to_pandas()
    if name not in oracle:
        status = f"rows-only rows={len(spark_df)}"
        ok = len(spark_df) > 0
    else:
        duck_df = con.execute(oracle[name]).df()
        # driver sorts columns by name before hashing values
        s = spark_df[sorted(spark_df.columns)]
        k = duck_df[sorted(duck_df.columns)]
        ok = True
        notes = []
        if list(s.columns) != list(k.columns):
            ok = False
            notes.append(f"cols spark={list(s.columns)} duck={list(k.columns)}")
        elif len(s) != len(k):
            ok = False
            notes.append(f"rows spark={len(s)} duck={len(k)}")
        else:
            # row-order-insensitive exact compare
            def norm(df):
                import numpy as np
                df = df.copy()
                for c in df.columns:
                    if str(df[c].dtype).startswith("datetime"):
                        df[c] = df[c].astype("datetime64[us]")
                    elif df[c].dtype == object:
                        import datetime, math
                        def elem(v):
                            if v is None or (isinstance(v, float) and math.isnan(v)):
                                return None
                            if isinstance(v, float) and v.is_integer():
                                return int(v)
                            if isinstance(v, (int, np.integer)):
                                return int(v)
                            return v
                        def cell(v):
                            if isinstance(v, np.ndarray):
                                return tuple(elem(x) for x in v.tolist())
                            if isinstance(v, list):
                                return tuple(elem(x) for x in v)
                            if isinstance(v, datetime.datetime):
                                return pd.Timestamp(v)
                            if isinstance(v, datetime.date):
                                return pd.Timestamp(v)
                            return v
                        df[c] = df[c].map(cell)
                return df.sort_values(by=list(df.columns)).reset_index(drop=True)
            # the driver hashes raw values WITHOUT dtype coercion: a DuckDB
            # HUGEINT window-sum surfaces as float64 and hash-mismatches an
            # int64 Spark column even when values are equal — flag it here
            for c in s.columns:
                si, ki = str(s[c].dtype), str(k[c].dtype)
                int_f = {("int64", "float64"), ("float64", "int64")}
                if (si, ki) in int_f:
                    ok = False
                    notes.append(f"dtype drift col {c}: spark={si} duck={ki} (cast in oracle SQL)")
            s2, k2 = norm(s), norm(k)
            try:
                pd.testing.assert_frame_equal(s2, k2, check_dtype=False, check_exact=True)
            except AssertionError as e:
                ok = False
                notes.append(str(e).split("\n")[0])
                # show first diff
                for c in s2.columns:
                    neq = (s2[c] != k2[c]) & ~(s2[c].isna() & k2[c].isna())
                    if neq.any():
                        i = neq.idxmax()
                        notes.append(f"col {c} row {i}: spark={s2[c][i]!r} duck={k2[c][i]!r}")
                        break
        status = "MATCH" if ok else "MISMATCH " + "; ".join(notes)
    print(f"{'PASS' if ok else 'FAIL'} {name}: {status}")
    n_pass += ok
    n_fail += (not ok)
print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
