#!/usr/bin/env python3
"""Compare a subset of the sf1 Verify dumps against their DuckDB oracles
(direct path: the oracle SQL runs verbatim in DuckDB at sf1).
Usage: sf1_direct_compare.py <sfDir> <verifyOut> <names-file> <report-out> [threads]"""
import json, os, sys, glob
import duckdb, pandas as pd
import pyarrow.parquet as pq

SF, OUT = sys.argv[1], sys.argv[2]
names = [l.strip() for l in open(sys.argv[3]) if l.strip()]
report = sys.argv[4]
con = duckdb.connect()
if len(sys.argv) > 5:
    con.execute(f"SET threads={sys.argv[5]}")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    src = f"{SF}/{t}.parquet"
    if not os.path.exists(src):
        continue  # purpose-built fixture dirs (zipf corpus) ship a table subset
    if os.path.isdir(src): src += "/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
oracle = json.load(open(f"{OUT}/oracle_sql.json"))
results, fails = {}, []
for name in names:
    import time
    t0 = time.time()
    path = f"{OUT}/{name}"
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: oracle error: {e}", flush=True); continue
    got = con.execute(f"SELECT * FROM '{path}/*.parquet'").fetchdf()
    deccols = [f.name for pf in glob.glob(f"{path}/*.parquet")
               for f in pq.read_schema(pf) if "decimal" in str(f.type)]
    if deccols:
        fails.append(name); print(f"FAIL {name}: decimal cols {deccols}", flush=True); continue
    exp = exp[sorted(exp.columns)]; got = got[sorted(got.columns)]
    ok = list(exp.columns) == list(got.columns) and exp.shape == got.shape
    why = "" if ok else f"cols/shape exp={exp.shape} got={got.shape}"
    if ok:
        for c in exp.columns:
            e, g = exp[c], got[c]
            try: eq = (e.isna() & g.isna()) | (e == g)
            except Exception: eq = e.astype(str) == g.astype(str)
            if not eq.all():
                ok = False; i = eq.idxmin()
                why = f"{c} row{i}: exp={e[i]!r} got={g[i]!r}"; break
    dt = time.time() - t0
    if ok:
        results[name] = {"status":"pass","rows":int(exp.shape[0]),
                         "cols":int(exp.shape[1]),"oracle_sec":round(dt,1)}
        print(f"PASS {name} ({exp.shape[0]} rows, {dt:.1f}s)", flush=True)
    else:
        fails.append(name); print(f"FAIL {name}: {why}", flush=True)
for f in fails: results[f] = {"status":"fail"}
json.dump({"sf_dir": SF, "compared": len(names), "passed": len(names)-len(fails),
           "failed": sorted(fails),
           "queries": {k: results[k] for k in sorted(results)}},
          open(report,"w"), indent=1)
print(f"{len(names)-len(fails)}/{len(names)} pass -> {report}", flush=True)
