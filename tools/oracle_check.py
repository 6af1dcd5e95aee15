#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate: run each oracle SQL in
DuckDB over the fixture parquet and compare against the Verify dump.
Usage: oracle_check.py <sfDir> <verifyOutDir>
(Dev tool only — the engine itself is pure Scala/Spark.)"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # driver fixtures are single files; ScaleUp fixtures are Spark
    # directory outputs — glob the part files in that case
    p = f"{sf}/{t}.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    got = pq.read_table(files[0]) if files else None
    if name not in oracle:
        n = got.num_rows if got is not None else -1
        print(f"{name:24s} NO-ORACLE rows={n}" + (" FAIL(empty)" if n <= 0 else ""))
        fails += 0 if n > 0 else 1
        continue
    exp = con.execute(oracle[name]).fetch_arrow_table()
    gotp = got.to_pandas().reindex(sorted(got.column_names), axis=1)
    expp = exp.to_pandas().reindex(sorted(exp.column_names), axis=1)
    ok_rows = len(gotp) == len(expp)
    ok_cols = list(gotp.columns) == list(expp.columns)
    ok_schema = ok_cols and all(str(a) == str(b) for a, b in zip(gotp.dtypes, expp.dtypes))
    ok_vals = False
    if ok_rows and ok_cols:
        gs = gotp.sort_values(by=list(gotp.columns)).reset_index(drop=True)
        es = expp.sort_values(by=list(expp.columns)).reset_index(drop=True)
        ok_vals = gs.equals(es)
    status = "OK" if (ok_rows and ok_schema and ok_vals) else "FAIL"
    if status == "FAIL":
        fails += 1
        print(f"{name:24s} {status} rows={ok_rows}({len(gotp)}/{len(expp)}) "
              f"schema={ok_schema} vals={ok_vals}")
        if ok_rows and ok_cols and not ok_vals:
            diff = (gs != es) & ~(gs.isna() & es.isna())
            bad = diff.any(axis=1)
            print("  spark:", gs[bad].head(3).to_dict("records"))
            print("  duck :", es[bad].head(3).to_dict("records"))
        elif not ok_schema:
            print("  spark dtypes:", dict(zip(gotp.columns, map(str, gotp.dtypes))))
            print("  duck  dtypes:", dict(zip(expp.columns, map(str, expp.dtypes))))
    else:
        print(f"{name:24s} OK rows={len(gotp)}")
print("FAILS:", fails)
sys.exit(1 if fails else 0)
