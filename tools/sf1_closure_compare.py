#!/usr/bin/env python3
"""sf1 evaluation of the recursive-closure oracles.
Usage: sf1_closure_compare.py <sfDir> <verifyOut> <report.json> <names-file>

The oracle SQL's transitive-closure CTE (reach) materializes sum(n_i^2)
label pairs; sf1's near-dup graph has a 43,650-doc component, so that is
~1.9e9 rows -- infeasible in DuckDB. Every closure oracle consumes reach
ONLY as min-id component labels (lab = SELECT id, MIN(comp) FROM reach
GROUP BY id), so this runner evaluates the SAME oracle text with the
closure replaced by exact union-find:
  1. run the oracle's own candidate/pair CTEs verbatim in DuckDB,
  2. label components with min-id union-find over those pairs (Python),
  3. run the oracle's own suffix (survivor policies, joins, ordering)
     verbatim in DuckDB against the labels.
Semantics are identical (min over reach == min id of the connected
component); only the quadratic materialization is gone.
"""
import json, re, sys, os, time
import duckdb, pandas as pd

SF, OUT = sys.argv[1], sys.argv[2]
report_path = sys.argv[3]

con = duckdb.connect()
con.execute("SET threads=24")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    src = f"{SF}/{t}.parquet"
    if not os.path.exists(src):
        continue  # purpose-built fixture dirs (zipf corpus) ship a table subset
    if os.path.isdir(src): src += "/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def unionfind_labels(edges_df):
    parent = {}
    def find(x):
        r = x
        while parent.get(r, r) != r: r = parent[r]
        while parent.get(x, x) != x: parent[x], x = r, parent[x]
        return r
    for a, b in edges_df.itertuples(index=False):
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-id representative, same labels as MIN(comp) over reach
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    ids = set(edges_df.iloc[:,0]) | set(edges_df.iloc[:,1])
    return pd.DataFrame({"id": sorted(ids)}).assign(
        comp=lambda d: d["id"].map(find))

def split_oracle(sql):
    """prefix CTE block (through the pair CTE), pair CTE name, suffix after reach."""
    m = re.search(r",\s*nodes AS \(SELECT id_a AS id FROM (\w+)", sql)
    pair = m.group(1)
    prefix = sql[:m.start()]
    # suffix: everything after the reach CTE's closing paren
    mr = re.search(r"reach AS \(.*?FROM reach r JOIN edges \w+ ON \w+\.src = r\.id\)\s*", sql, re.S)
    suffix = sql[mr.end():]
    return prefix, pair, suffix

results, fails = {}, []
names = [n for n in open(sys.argv[4]).read().split()]
pair_cache = {}
for name in names:
    t0 = time.time()
    sql = oracle[name]
    try:
        prefix, pair, suffix = split_oracle(sql)
        key = (prefix, pair)
        if key not in pair_cache:
            edges = con.execute(
                f"{prefix} SELECT id_a, id_b FROM {pair}").fetchdf()
            pair_cache[key] = unionfind_labels(edges)
        lab_py = pair_cache[key]
        con.register("lab_py", lab_py)
        if suffix.startswith(","):
            # shapes with a lab CTE: re-point lab at the union-find labels
            m2 = re.match(r",\s*lab AS \(SELECT id, MIN\(comp\) AS comp FROM reach GROUP BY id\)", suffix)
            assert m2, name
            rest = suffix[m2.end():]
            q = f"{prefix}, lab AS (SELECT id, comp FROM lab_py){rest}"
        else:
            # clusters shape: final select reads reach directly
            assert re.match(r"\s*SELECT id AS doc_id, MIN\(comp\) AS cluster_id\s*FROM reach GROUP BY id ORDER BY doc_id", suffix), name
            q = "SELECT id AS doc_id, comp AS cluster_id FROM lab_py ORDER BY doc_id"
        exp = con.execute(q).fetchdf()
        got = con.execute(f"SELECT * FROM '{OUT}/{name}/*.parquet'").fetchdf()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: {e}", flush=True); continue
    exp = exp[sorted(exp.columns)]; got = got[sorted(got.columns)]
    ok = list(exp.columns) == list(got.columns) and exp.shape == got.shape
    why = "" if ok else f"cols/shape exp={exp.shape}/{list(exp.columns)} got={got.shape}/{list(got.columns)}"
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
                         "cols":int(exp.shape[1]),"oracle_sec":round(dt,1),
                         "method":"duckdb pair CTEs verbatim + exact union-find labels (closure only)"}
        print(f"PASS {name} ({exp.shape[0]} rows, {dt:.1f}s)", flush=True)
    else:
        fails.append(name); print(f"FAIL {name}: {why}", flush=True)
for f in fails: results[f] = {"status":"fail"}
json.dump({"sf_dir": SF, "compared": len(names), "passed": len(names)-len(fails),
           "failed": sorted(fails),
           "queries": {k: results[k] for k in sorted(results)}},
          open(report_path,"w"), indent=1)
print(f"{len(names)-len(fails)}/{len(names)} pass -> {report_path}", flush=True)
