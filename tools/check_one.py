#!/usr/bin/env python3
import sys, json, glob, os
import duckdb, pandas as pd
TABLES = ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]
def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df): df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df
sfdir, outdir, name, th, mem = sys.argv[1:6]
con = duckdb.connect()
con.execute(f"SET threads={th}")
con.execute(f"SET memory_limit='{mem}'")
for t in TABLES:
    p = os.path.join(sfdir, f"{t}.parquet")
    if os.path.exists(p): con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
sql = json.load(open(os.path.join(outdir, "oracle_sql.json")))[name]
files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
if not files:
    print(f"FAIL {name}: no spark output"); sys.exit(1)
try:
    got = pd.concat([pd.read_parquet(f) for f in files])
    want = con.sql(sql).df()
except Exception as e:
    print(f"FAIL {name}: {str(e)[:200]}"); sys.exit(1)
g, w = canon(got), canon(want)
if list(g.columns) != list(w.columns):
    print(f"FAIL {name}: cols {list(g.columns)} vs {list(w.columns)}"); sys.exit(1)
if len(g) != len(w):
    print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); sys.exit(1)
for c in g.columns:
    a, b = g[c].astype(str).values, w[c].astype(str).values
    bad = (a != b)
    if bad.any():
        i = bad.argmax()
        print(f"FAIL {name}: col {c} row {i}: spark={a[i]} oracle={b[i]}"); sys.exit(1)
print(f"PASS {name} ({len(g)} rows)")
