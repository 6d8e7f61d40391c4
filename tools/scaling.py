#!/usr/bin/env python3
"""Empirical scaling exponents for the heaviest query families
(round-7 verdict #4): run the named queries at sf0.001/0.01/0.1 and fit
time ~ rows^alpha between consecutive scale factors (rows grow 10x per
step, so alpha = log10(t_next/t_prev)). SCALE.md argues the 100x posture
from plan shapes; this measures it. Near-linear (alpha <= ~1.1) is the
expected steady state once per-run fixed overhead stops dominating;
alpha well below 1 at the small end means the query is overhead-bound
there (state-store commits, session setup), which is itself evidence
that the data-dependent term is small.

Usage:
  python3 tools/scaling.py                # 3 passes per sf, prints table
  python3 tools/scaling.py --passes 1     # quicker, noisier
Writes tools/scaling_rN.json next to the bench baselines.
"""
import json, math, os, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
import benchdiff

QUERIES = ["q_stream_neardup", "q_dedup_semantic", "q_dedup_clusters",
           "q_pipeline_corpus_prep", "q_text_tfidf",
           # round-8 additions: the decode-bound banded pair search and
           # the 3-batch covariance merge
           "q_multimodal_audio_neardup", "q_sim_covariance_incremental",
           # round-9 (verdict #1): the remaining heaviest families, now
           # measurable on a DATA-dominated decade via the generated sf1
           "q_dedup_corpus", "q_dedup_clusters_incremental",
           "q_stream_neardup_ttl", "q_sim_ivfpq_adc",
           "q_multimodal_image_neardup",
           # r9 sweep extension (recorded in scaling_r09.json)
           "q_multimodal_dedup_clusters", "q_drift_numeric",
           "q_drift_report", "q_text_heavy_hitters",
           "q_text_heavy_hitters_by_lang",
           # round-10 additions: residual IVFADC, the capped pair-budget
           # variant (vs the uncapped a=0.90 output-bound family), and
           # the AQE skew-split join
           "q_sim_ivfpq_residual", "q_multimodal_image_neardup_capped",
           "q_skew_join_aqe",
           # round-11 (verdict #8): the two new corpus-sized operators
           # with documented shapes but no measured exponents yet
           "q_text_bm25", "q_sim_hard_negatives_ivf",
           # round-11 third wave: the statistical quality filters (bigram
           # LM, NB log-odds, DSIR hashed-bucket LLR) — corpus-sized tf
           # aggregates + model joins
           "q_text_bigram_ce", "q_text_nb_logodds", "q_text_dsir",
           # fourth wave: the composed mix, the merged-model dual, and
           # the streaming scorer
           "q_pipeline_training_mix", "q_text_dsir_incremental",
           "q_stream_dsir",
           # round-12: the stored/merged LM-filter faces (train-once/
           # score-many) and the distributed-threshold training mix
           "q_text_bigram_ce_stored", "q_text_nb_stored",
           "q_pipeline_training_mix_threshold",
           # round-13: the mergeable quantile sketch (bucket-count agg —
           # expected flat: the exchange is O(buckets) by construction)
           # and the sketch-edged drift consuming it
           "q_quantile_sketch", "q_drift_numeric_sketch"]
# sf1 is repo-generated (graft.GenData; the driver dirs are read-only) —
# 6M lineitem / 50k documents / 20k embeddings, same recipe, measured
# distribution match in SCALE.md. Its decade (0.1 -> 1) is the first one
# where data, not per-run fixed overhead, dominates.
SFS = ["0.001", "0.01", "0.1", "1", "10"]
SF_DIRS = {sf: (f"/root/repo/testdata/sf{sf}" if sf in ("1", "10")
                else f"/root/testdata/sf{sf}") for sf in SFS}
# sf10 (round-11 verdict #3, the SECOND measured decade): generated at
# mult=100 (600M-row-scale is past the sandbox disk budget; 60M lineitem /
# 500k documents / 200k embeddings / 10M events is the largest full-table
# set that fits comfortably). Only the flattest-claim heavy families run
# there — the judge's list plus the round-12 additions — so the leg stays
# within a bench-harness budget while converting every headline "α is
# flat" claim from one measured decade into two.
SF10_QUERIES = ["q_text_bm25", "q_text_dsir", "q_text_nb_logodds",
                "q_text_bigram_ce", "q_sim_ivfpq_residual",
                "q_sim_hard_negatives_ivf", "q_dedup_corpus",
                "q_multimodal_image_neardup_capped",
                "q_pipeline_training_mix", "q_text_dsir_incremental",
                "q_text_bigram_ce_stored", "q_text_nb_stored",
                "q_pipeline_training_mix_threshold",
                "q_quantile_sketch", "q_drift_numeric_sketch"]


def run_sf(sf, passes):
    queries = SF10_QUERIES if sf == "10" else QUERIES
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=SF_DIRS[sf],
               SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"),
               SPARK_GRAFT_BENCH_PASSES=str(passes),
               SPARK_GRAFT_ONLY=",".join(queries))
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=3600)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + r.stderr[-2000:])
        sys.exit(f"bench at sf{sf} failed")
    return benchdiff.parse(r.stdout)["queries"]


def main():
    passes = 3
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--passes":
            passes = int(next(it))
        else:
            sys.exit(f"unknown arg {a}")
    results = {}
    for sf in SFS:
        nq = len(SF10_QUERIES if sf == "10" else QUERIES)
        print(f"running sf{sf} ({passes} passes over {nq} queries)...",
              flush=True)
        results[sf] = run_sf(sf, passes)

    # sf10_queries is recorded so a reader can tell "skipped at sf10 by
    # design" (absent from the subset) from "failed" (-1/null); alphas
    # use None, not NaN — bare NaN tokens are not RFC-8259 JSON and
    # break jq/JSON.parse consumers (round-12 review find)
    out = {"queries": QUERIES, "sf10_queries": SF10_QUERIES,
           "passes": passes, "times": results}
    hdr = (f"{'query':32s} " + " ".join(f"sf{sf:>6s}" for sf in SFS)
           + "  " + " ".join(f"a(->{sf})" for sf in SFS[1:]))
    print("\n" + hdr)
    print("-" * len(hdr))
    alphas = {}
    for q in QUERIES:
        ts = [results[sf].get(q, -1.0) for sf in SFS]
        row = f"{q:32s} " + " ".join(f"{t:8.2f}" for t in ts)
        al = []
        for i in range(1, len(SFS)):
            if ts[i - 1] > 0 and ts[i] > 0:
                al.append(round(math.log10(ts[i] / ts[i - 1]), 4))
            else:
                al.append(None)
        alphas[q] = al
        print(row + "  " + " ".join(
            "          none" if a is None else f"{a:14.2f}" for a in al))
    out["alphas"] = alphas
    path = os.path.join(REPO, "tools",
                        os.environ.get("SPARK_GRAFT_SCALING_OUT",
                                       "scaling_r12.json"))
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
