#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py [sfdir] [outdir]

Runs DuckDB on oracle_sql.json (written by graft.Verify) against the testdata
parquet tables, and compares each result with the Spark-written parquet in
outdir/<name>. Reports row-count, column-set, and exact value equality
(rows and columns sorted, like the driver)."""
import json, sys, glob, os
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
spark_results = {os.path.basename(d) for d in glob.glob(f"{OUT}/*") if os.path.isdir(d)}

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    return df.sort_values(cols).reset_index(drop=True), cols

n_pass = n_fail = 0
for name in sorted(spark_results):
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); n_fail += 1; continue
    got = con.execute(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").df()
    if name not in oracle:
        print(f"ROWS-ONLY {name}: {len(got)} rows")
        continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
    g, gc = canon(got); e, ec = canon(exp)
    if gc != ec:
        print(f"FAIL {name}: columns spark={gc} oracle={ec}"); n_fail += 1; continue
    if len(g) != len(e):
        print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}"); n_fail += 1; continue
    mism = []
    for c in gc:
        a, b = g[c], e[c]
        try:
            eq = (a == b) | (a.isna() & b.isna())
        except Exception:
            eq = a.astype(str) == b.astype(str)
        if not eq.all():
            bad = (~eq).idxmax()
            mism.append(f"{c}[row{bad}]: spark={a[bad]!r} oracle={b[bad]!r} (+{int((~eq).sum())-1} more)")
    if mism:
        print(f"FAIL {name}: " + "; ".join(mism)); n_fail += 1
    else:
        print(f"PASS {name}: {len(g)} rows"); n_pass += 1

missing = set(oracle) - spark_results
for name in sorted(missing):
    print(f"FAIL {name}: oracle declared but no spark output"); n_fail += 1
print(f"\n{n_pass} pass, {n_fail} fail, {len(spark_results - set(oracle))} rows-only")
sys.exit(1 if n_fail else 0)
