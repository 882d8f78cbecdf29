#!/usr/bin/env python3
"""Driver-style correctness compare: Spark parquet dumps vs DuckDB oracle.

Mimics the round driver: for each query in oracle_sql.json, run the SQL in
DuckDB over the same sf tables, then compare to the Spark parquet output —
columns sorted by name, rows sorted, exact value equality.
"""
import json, sys, glob
import duckdb, pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name in sorted(glob.glob(f"{outdir}/q*")):
    q = name.split('/')[-1]
    spark_df = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{name}/*.parquet")],
                         ignore_index=True) if glob.glob(f"{name}/*.parquet") else pd.DataFrame()
    if q not in oracle:
        print(f"{q:28s} NO-ORACLE rows={len(spark_df)}")
        continue
    try:
        duck_df = con.sql(oracle[q]).df()
    except Exception as e:
        print(f"{q:28s} ORACLE-SQL-ERROR {e}"); fails += 1; continue
    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if df[c].dtype.kind in 'iu': df[c] = df[c].astype('int64')
            if df[c].dtype.kind == 'f': df[c] = df[c].round(9)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        print(f"{q:28s} COLUMN-MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
        fails += 1; continue
    if len(a) != len(b):
        print(f"{q:28s} ROWCOUNT spark={len(a)} duck={len(b)}"); fails += 1; continue
    if not a.equals(b):
        neq = (a != b) & ~(a.isna() & b.isna())
        bad = neq.any(axis=1)
        print(f"{q:28s} VALUE-MISMATCH rows={bad.sum()}/{len(a)}")
        print(pd.concat([a[bad].head(3).add_suffix('_spark'),
                         b[bad].head(3).add_suffix('_duck')], axis=1).to_string())
        fails += 1; continue
    print(f"{q:28s} OK rows={len(a)}")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
