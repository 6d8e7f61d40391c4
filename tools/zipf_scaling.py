#!/usr/bin/env python3
"""LM-filter scaling on the REALISTIC-vocabulary fixture (round-12
verdict #3): the driver corpus's 30-word vocabulary saturates the bigram
table, so the LM filters' measured flattening (α 0.15/0.11 at sf1→sf10)
was partly fixture-specific. GenData --zipf draws tokens Zipf(≈1) over
100k types (validated ~1/r rank-frequency; observed vocabulary 97.6k →
100k across the decade, i.e. the Heaps regime where the model GROWS),
and this script re-measures the LM-filter exponents on it:

  zipf_sf1  =  50k docs (≈ 2.7 M tokens, bigram vocab ≈ corpus-sized)
  zipf_sf10 = 500k docs (≈ 27.5 M tokens)

Only the documents-table queries run (the zipf dirs ship documents
only). Writes tools/zipf_lm_r13.json.

Usage: python3 tools/zipf_scaling.py [--passes N] [--dedup]
  --dedup swaps in the dedup-family query list (see DEDUP_QUERIES) and
  writes tools/zipf_dedup_r13.json instead.
"""
import json, math, os, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
import benchdiff

QUERIES = ["q_text_unigram_ce", "q_text_bigram_ce", "q_text_bigram_ce_stored",
           "q_text_nb_logodds", "q_text_nb_stored", "q_text_dsir",
           "q_text_tfidf"]
# --dedup: the DEDUP families on the same realistic vocabulary. The
# saturated 30-word fixture overstates near-dup density (everything
# collides — the sf10 gate's 169 M-pair simhash lesson), so its measured
# dedup decades mix candidate-generation cost with output volume no real
# corpus would produce. Zipf(≈1) texts collide only via genuine shingle
# overlap, so these exponents isolate the banding/candidate machinery.
DEDUP_QUERIES = ["q_dedup_corpus", "q_dedup_minhash_lsh",
                 "q_dedup_jaccard_capped", "q_dedup_simhash_capped",
                 "q_dedup_spans", "q_dedup_clusters",
                 "q_text_heavy_hitters"]
SFS = {"zipf_sf1": f"{REPO}/testdata/zipf_sf1",
       "zipf_sf10": f"{REPO}/testdata/zipf_sf10"}


def run_sf(sfdir, passes):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sfdir,
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"),
               SPARK_GRAFT_BENCH_PASSES=str(passes),
               SPARK_GRAFT_ONLY=",".join(QUERIES))
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=7200)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + r.stderr[-2000:])
        sys.exit(f"bench at {sfdir} failed")
    return benchdiff.parse(r.stdout)["queries"]


def main():
    global QUERIES
    passes = 3
    queries, outname = QUERIES, "zipf_lm_r13.json"
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--passes":
            passes = int(next(it))
        elif a == "--dedup":
            queries, outname = DEDUP_QUERIES, "zipf_dedup_r13.json"
        else:
            sys.exit(f"unknown arg {a}")
    QUERIES = queries  # run_sf reads the module global via SPARK_GRAFT_ONLY
    results = {}
    for name, d in SFS.items():
        print(f"running {name} ({passes} passes)...", flush=True)
        results[name] = run_sf(d, passes)
    out = {"queries": queries, "passes": passes, "times": results,
           "alphas": {}}
    print(f"\n{'query':28s} {'zipf_sf1':>9s} {'zipf_sf10':>10s} {'alpha':>7s}")
    for q in queries:
        t1 = results["zipf_sf1"].get(q, -1.0)
        t10 = results["zipf_sf10"].get(q, -1.0)
        a = round(math.log10(t10 / t1), 4) if t1 > 0 and t10 > 0 else None
        out["alphas"][q] = a
        print(f"{q:28s} {t1:9.2f} {t10:10.2f} "
              + ("   none" if a is None else f"{a:7.2f}"))
    path = os.path.join(REPO, "tools", outname)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
