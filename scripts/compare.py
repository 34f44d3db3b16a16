#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dir in
the Verify output, run the oracle SQL in DuckDB over the same parquet
tables, sort columns by name, and compare row counts / schemas / value
hashes. Usage: compare.py <verify_out_dir> <sf_dir> [query ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(df):
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)

def canon(df):
    # stringify with rounding-stable float repr, like a hash compare
    out = []
    for _, row in df.iterrows():
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(f"{v:.10g}")
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    return out

fails = []
for qdir in sorted(glob.glob(f"{out_dir}/q*")):
    name = os.path.basename(qdir)
    if only and name not in only:
        continue
    spark_df = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
    if name not in oracles:
        print(f"{name}: NO_ORACLE ({len(spark_df)} rows)")
        continue
    try:
        ora_df = con.sql(oracles[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE_ERR {e}")
        fails.append(name)
        continue
    s, o = norm(spark_df), norm(ora_df)
    ok_rows = len(s) == len(o)
    ok_schema = list(s.columns) == list(o.columns)
    ok_hash = ok_rows and ok_schema and canon(s) == canon(o)
    status = "PASS" if (ok_rows and ok_schema and ok_hash) else "FAIL"
    if status == "FAIL":
        fails.append(name)
    print(f"{name}: {status} rows={len(s)}/{len(o)} schema={ok_schema} hash={ok_hash}")
    if status == "FAIL" and ok_rows and ok_schema:
        cs, co = canon(s), canon(o)
        diffs = [(i, cs[i], co[i]) for i in range(len(cs)) if cs[i] != co[i]][:5]
        for i, a, b in diffs:
            print(f"   row {i}: spark={a}")
            print(f"   row {i}: duck ={b}")
    elif status == "FAIL" and not ok_schema:
        print(f"   spark cols: {list(s.columns)}")
        print(f"   duck  cols: {list(o.columns)}")

seen = {os.path.basename(d) for d in glob.glob(f"{out_dir}/q*")}
expected = only if only else set(oracles)
missing = sorted(expected - seen)
for m in missing:
    print(f"{m}: MISSING (no Verify output)")
fails.extend(missing)
print("FAILS:", fails if fails else "none")
