#!/usr/bin/env python3
# Emulates the driver correctness gate: run every SparkEntry.oracleSql in
# DuckDB over the sf parquet tables and compare (sorted columns + rows,
# exact values) against the graft.Verify parquet dumps.
# Usage: python3 scripts/compare_oracle.py [sfDir] [verifyOutDir]
# (driver-side python has duckdb+pandas; the library itself never uses them)
import duckdb, json, glob, os, sys
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
oracles = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d): continue
    spark_df = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
    if name not in oracles:
        print(f"{name:28s} NO_ORACLE rows={len(spark_df)}")
        continue
    try:
        oracle_df = con.sql(oracles[name]).df()
    except Exception as e:
        fails.append(name); print(f"{name:28s} ORACLE_SQL_ERROR {str(e)[:160]}"); continue
    sc = sorted(spark_df.columns); oc = sorted(oracle_df.columns)
    if sc != oc:
        fails.append(name); print(f"{name:28s} SCHEMA spark={sc} oracle={oc}"); continue
    a = spark_df[sc].sort_values(sc).reset_index(drop=True)
    b = oracle_df[oc].sort_values(oc).reset_index(drop=True)
    if len(a) != len(b):
        fails.append(name); print(f"{name:28s} ROWS spark={len(a)} oracle={len(b)}"); continue
    # exact value compare (incl. float bit equality like the driver's hash)
    import pandas as pd
    try:
        eq = a.astype(object).where(pd.notnull(a), None).values.tolist() == \
             b.astype(object).where(pd.notnull(b), None).values.tolist()
    except Exception as e:
        fails.append(name); print(f"{name:28s} CMP_ERR {e}"); continue
    if eq:
        print(f"{name:28s} OK rows={len(a)}")
    else:
        fails.append(name)
        diff = (a != b)
        cols = [c for c in sc if diff[c].any()]
        idx = diff.any(axis=1)
        print(f"{name:28s} HASH_MISMATCH rows={len(a)} cols={cols}")
        print("  spark :", a[idx].head(3).to_dict('records'))
        print("  oracle:", b[idx].head(3).to_dict('records'))
print("FAILS:", fails if fails else "none")
