#!/usr/bin/env python3
"""Archive a full DuckDB-oracle sweep as CORRECTNESS_SF01_r{N}.json.

Same comparison as tools/check_oracle.py (the driver's: sorted columns,
sorted rows, exact values), emitted in the round-archive JSON shape so the
sf0.1 sweep is a standing per-round artifact instead of a one-off.

Usage: python3 tools/archive_correctness.py SFDIR OUTDIR ROUND SF ARCHIVE
e.g.   python3 tools/archive_correctness.py /root/testdata/sf0.1 \
          /tmp/verify_sf01 20 0.1 CORRECTNESS_SF01_r20.json
"""
import json, sys, glob, os
import duckdb

SF, OUT, ROUND, SFV, ARCHIVE = sys.argv[1], sys.argv[2], int(sys.argv[3]), float(sys.argv[4]), sys.argv[5]

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

queries, n_pass = {}, 0
for name in sorted(spark_results | set(oracle)):
    entry = {"status": "fail", "rows_match": False, "schema_match": False,
             "hash_match": False}
    queries[name] = entry
    if name not in spark_results:
        entry["err"] = "oracle declared but no spark output"; continue
    if not glob.glob(f"{OUT}/{name}/*.parquet"):
        entry["err"] = "no spark output files"; continue
    got = con.execute(f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").df()
    if name not in oracle:
        entry["status"] = "rows_only"; entry["rows"] = len(got); continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        entry["err"] = f"oracle SQL error: {e}"; continue
    g, gc = canon(got); e, ec = canon(exp)
    entry["schema_match"] = gc == ec
    entry["rows_match"] = len(g) == len(e)
    if not (entry["schema_match"] and entry["rows_match"]):
        continue
    ok = True
    for c in gc:
        a, b = g[c], e[c]
        try:
            eq = (a == b) | (a.isna() & b.isna())
        except Exception:
            eq = a.astype(str) == b.astype(str)
        if not eq.all():
            ok = False; break
    entry["hash_match"] = ok
    if ok:
        entry["status"] = "pass"; n_pass += 1

out = {"sf": SFV, "round": ROUND, "total": len(queries), "pass": n_pass,
       "note": f"full {len(queries)}-gate DuckDB-oracle hash run at sf={SFV} "
               "(standing per-round artifact since r20, per the r19 verdict)",
       "queries": queries}
json.dump(out, open(ARCHIVE, "w"), indent=None)
print(f"{ARCHIVE}: {n_pass}/{len(queries)} pass")
sys.exit(0 if n_pass == len(queries) else 1)
