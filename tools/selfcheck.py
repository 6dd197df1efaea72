#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness compare.

Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB over the
testdata parquet tables, loads the Spark result parquet from
<outdir>/<name>/, sorts columns by name and rows by all columns, and
compares values. Usage: tools/selfcheck.py [outdir] [sfdir]
"""
import duckdb, glob, json, os, sys
import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # stringify for engine-neutral value compare (mirrors hash compare)
    df = df.astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails, passes, skips = [], 0, 0
for name in sorted(oracle):
    sql = oracle[name]
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        skips += 1
        print(f"MISSING  {name} (no spark output)")
        continue
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        fails.append(name)
        print(f"ORACLE-ERR {name}: {e}")
        continue
    try:
        got = pd.read_parquet(spark_dir)
    except Exception as e:
        fails.append(name)
        print(f"READ-ERR {name}: {e}")
        continue
    if sorted(exp.columns) != sorted(got.columns):
        fails.append(name)
        print(f"SCHEMA   {name}: oracle={sorted(exp.columns)} spark={sorted(got.columns)}")
        continue
    e_n, g_n = norm(exp), norm(got)
    if len(e_n) != len(g_n):
        fails.append(name)
        print(f"ROWCOUNT {name}: oracle={len(e_n)} spark={len(g_n)}")
        continue
    if not e_n.equals(g_n):
        fails.append(name)
        diff = (e_n != g_n).any(axis=1)
        idx = diff[diff].index[:3]
        print(f"VALUES   {name}: first diffs at rows {list(idx)}")
        for i in idx:
            print(f"  oracle: {e_n.loc[i].to_dict()}")
            print(f"  spark : {g_n.loc[i].to_dict()}")
        continue
    passes += 1
    print(f"OK       {name} ({len(g_n)} rows)")

# queries without oracle get a rows-only note
extra = [os.path.basename(p) for p in glob.glob(f"{out}/*")
         if os.path.isdir(p) and os.path.basename(p) not in oracle]
for name in sorted(extra):
    print(f"NO-ORACLE {name}")

print(f"\n{passes} ok, {len(fails)} failed, {skips} missing, {len(extra)} no-oracle")
sys.exit(1 if fails or skips else 0)
