#!/usr/bin/env python3
"""sf10 correctness gate (round-12 verdict #2): hash-verify the heaviest
query families against DuckDB on the repo-generated sf10 corpus
(60 M lineitem / 500 k documents / 200 k embeddings — the second
generated decade).

Rationale: each decade step so far caught a REAL cross-engine divergence
class invisible below it (DECIMAL→DOUBLE double-rounding ×2 and round()
HALF_UP at the sf1 step), so the sf10 data that tools/scaling.py already
times over should also carry hash evidence. The family list is the
DIRECT tier only — oracle SQL runs verbatim in DuckDB:

  - the CLOSURE families' union-find replacement would work at sf10, but
    their DuckDB pair CTEs (banded minhash over 500 k docs) dominate the
    gate's budget for no new arithmetic surface — the closure suffix is
    decade-invariant integer work, already pinned at sf1;
  - the NUMPY families' exact pair-rescoring replicates a 64-way
    exploded self-join driver-side; at sf10 that is ~1.25e9 scored pairs
    — out of single-process budget, and again the arithmetic was pinned
    exactly at sf1.

The families below (33 at round 13 start, +5 round-13 additions —
quantile-sketch faces and the sketch-edged drift — then the round-14
widening to 78: window/SCD2/sessionize/upsert, the stateful streaming
drains, as-of/range/cohort joins, heavy aggregates, agent SQL + one
fuzz case per block) are chosen for NEW-decade risk: every operator
whose sums/rounding/hashing touches corpus-scale numerics (the DECIMAL
routing, LM filters incl. the round-13 in-row tf forms, DSIR, dedup
banding, window suites, skew/salting, quantiles) plus, since round 14,
the state-machine tier the DIRECT-heavy first tranche left out.

Usage: python3 tools/check_sf10.py [sfDir] [--skip-verify]
  sfDir default /root/repo/testdata/sf10 (regenerate if absent:
  sbt "runMain graft.GenData /root/repo/testdata/sf10 100").
Writes CORRECTNESS_sf10.json in the repo root. Recommended env for the
Verify leg: SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g.
"""
import json, os, subprocess, sys

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
    else "/root/repo/testdata/sf10"
OUT = "/tmp/graft_verify_sf10"
TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS)

DIRECT = [
    # decimal-routed aggregate arithmetic over the 60 M-row fact table
    "q1_pricing_summary", "q9_product_type_profit", "q18_large_volume",
    "q_skew_salted_sum", "q_skew_join_aqe", "q_zscore_group",
    "q_percentiles", "q_histogram_equidepth", "q_correlation",
    "q_quantile_sketch", "q_quantile_sketch_merged",
    "q_quantile_sketch_stored",
    "q_quantile_sketch_signed", "q_drift_numeric_sketch",
    "q_robust_scale",
    # LM-filter / DSIR path — incl. every round-13 in-row tf rewrite and
    # the shared-oracle stored/threshold equalities
    "q_text_unigram_ce", "q_text_bigram_ce", "q_text_bigram_ce_stored",
    "q_text_nb_logodds", "q_text_nb_stored", "q_text_tfidf",
    "q_text_dsir", "q_text_dsir_incremental", "q_stream_dsir",
    "q_pipeline_training_mix", "q_pipeline_training_mix_threshold",
    "q_text_divergence",
    # dedup banding / hashing over 500 k documents
    # (q_dedup_simhash_pairs runs in the STAGED tier below, not here)
    "q_dedup_exact", "q_dedup_minhash_lsh",
    "q_dedup_spans", "q_dedup_index_build",
    # embedding numerics over 200 k vectors
    "q_sim_cosine_topk", "q_sim_covariance", "q_sim_ivf_topk",
    # window machinery over the scaled fact tables
    "q_w1_latest_per_key", "q_w3_window_suite", "q_w2_lag_cumsum",
    # --- round-14 widening (round-13 verdict #7): the window/SCD2/
    # sessionize/upsert tier, the streaming drains on the sf10 session,
    # the round-14 sketch faces, and a fuzz-representative set — the
    # machinery the 39-family gate left unexercised at 60 M rows.
    # TPC-H join-heavy trio (shuffle joins over 60 M lineitem)
    "q3_shipping_priority", "q5_local_supplier_volume",
    "q21_waiting_supplier",
    # windows / SCD2 / sessionize over the 15 M-order, 10 M-event facts
    "q_w2_daily_rank", "q_scd2_versions", "q_scd2_from_cdc",
    "q_sessionize", "q_stream_sessionize",
    # upsert / CDC / stateful streaming drains
    "q_u1_upsert", "q_stream_upsert", "q_stream_latest_per_key",
    "q_stream_windowed_counts", "q_stream_interval_join",
    "q_stream_incremental_agg", "q_stream_quantile_sketch",
    # round-14 sketch faces
    "q_quantile_sketch_overflow",
    # as-of / range / cohort joins
    "q_asof_latest_value", "q_range_join_week", "q_retention_cohorts",
    "q_funnel_stages",
    # heavy aggregates / selection / profiling
    "q_a3_topk_customers", "q_rollup_region", "q_pivot_priority",
    "q_sample_stratified", "q_mix_temperature", "q_profile_columns",
    "q_sketch_distinct", "q_incremental_agg",
    # arbitrary-SELECT surface: agent queries + one fuzz case per block
    "q_sql_agent_topk", "q_sql_agent_window", "q_sql_exists",
    "q_sql_fuzz_00", "q_sql_fuzz_31", "q_sql_fuzz_56", "q_sql_fuzz_81",
    "q_sql_fuzz_113", "q_sql_fuzz_136", "q_sql_fuzz_159",
    "q_sql_fuzz_181",
    # --- round-15 widening (round-14 verdict #3): the remaining
    # DIRECT-eligible sf1 families — scalar/source/pipeline suites,
    # join long tail, light dedup/text/sample/split/drift/multimodal,
    # the rest of the streaming drains, and two more fuzz cases per
    # block. Still sf1-pinned, with the same budget rationale as the
    # closure/numpy tiers: the PQ-stack oracles (q_sim_ivfpq_*,
    # q_sim_pq_adc, q_sim_hard_negatives_ivf) replicate k-means×ADC in
    # SQL — at 200k×64 that is DuckDB-hours for arithmetic already
    # pinned exactly at 20k vectors.
    # scalar / schema / source suites over the scaled tables
    "q_f1_snake_schema", "q_f2_json_props", "q_f2_json_roundtrip",
    "q_f5_ship_delay", "q_f_scalar_suite", "q_f11_alias_normalize",
    "q_f15_stock_status", "q_a2_freshness", "q_a4_top_days",
    "q_a6_genre_rollup", "q_o7_shortest_name", "q_p6_multi_filter",
    "q_p_scan_filter_sort", "q_t1_union_names", "q_t3_set_ops",
    "q_zorder_key", "q_unpivot_metrics", "q_histogram",
    "q_cube_region_segment", "q_st1_date_spine", "q_timeseries_fill",
    # pipeline lifecycle (store DDL/append/backfill/CSV/corpus-prep)
    "q_pipeline_store_lifecycle", "q_pipeline_csv_roundtrip",
    "q_pipeline_corpus_prep",
    # join long tail
    "q_j1_dim_rollup", "q_j2_customers_no_orders",
    "q_j2b_customers_with_orders", "q_j4_enrich_fallback",
    "q_j_full_outer", "q_j6_fuzzy_title", "q_j6_fuzzy_title_phased",
    "q_j6_fuzzy_levenshtein", "q_asof_next_value",
    # light dedup / decontamination (banded pair CTEs proved feasible
    # at 500k docs by the zipf_sf10 gate and q_dedup_minhash_lsh here)
    "q_dedup_containment", "q_dedup_ngram_jaccard",
    "q_dedup_jaccard_capped", "q_dedup_top_grams", "q_dedup_span_removal",
    "q_dedup_incremental", "q_dedup_incremental_stored",
    "q_decontaminate", "q_decontaminate_bloom",
    # text stats / packing / retrieval over 500k documents
    "q_text_tokens", "q_text_quality", "q_text_langid",
    "q_text_fingerprint", "q_text_chunks", "q_text_novelty",
    "q_text_packing", "q_text_packing_sharded", "q_text_redact",
    "q_text_repetition", "q_text_simhash", "q_text_bm25",
    "q_text_inverted_index", "q_text_heavy_hitters",
    "q_text_heavy_hitters_by_lang", "q_text_divergence_group",
    "q_text_corpus_gate",
    # quality / sampling / split
    "q_quality_corpus", "q_quality_expectations", "q_quality_quarantine",
    "q_sample_deterministic", "q_sample_mix", "q_sample_weighted",
    "q_sample_weighted_group", "q_curriculum_order",
    "q_split_leakage", "q_split_train_test",
    # drift (exact-percentile + report faces; sketch face above)
    "q_drift_numeric", "q_drift_report",
    # embedding numerics long tail (brute-force shapes the cosine-topk
    # row above already proved DuckDB-feasible at 200k×64)
    "q_sim_int8_topk", "q_sim_meanpool", "q_sim_recall_eval",
    "q_sim_ann_lsh", "q_sim_ann_hadamard", "q_sim_covariance_incremental",
    "q_sim_hard_negatives",
    # multimodal (real JDK codecs; banded near-dup joins)
    "q_multimodal_decode", "q_multimodal_meta", "q_multimodal_unknown",
    "q_multimodal_chunks", "q_multimodal_ahash", "q_multimodal_audio",
    "q_multimodal_audio_fp", "q_multimodal_audio_neardup",
    "q_multimodal_image_neardup", "q_multimodal_image_neardup_capped",
    # remaining streaming drains + CDC
    "q_stream_cdc_merge", "q_stream_corpus_gate",
    "q_stream_dedup_firstseen", "q_stream_drift", "q_stream_funnel",
    "q_stream_heavy_hitters", "q_stream_interval_join_outer",
    "q_stream_latest_rocksdb", "q_stream_static_enrich",
    "q_stream_timeseries_fill", "q_stream_neardup", "q_stream_neardup_ttl",
    "q_u2_cdc_merge",
    # round-15 bucketed O(delta) fold store (re-delivery + compaction)
    "q_fold_bucketed_store",
    # fuzz: two more cases per block
    "q_sql_fuzz_15", "q_sql_fuzz_23", "q_sql_fuzz_40", "q_sql_fuzz_48",
    "q_sql_fuzz_65", "q_sql_fuzz_73", "q_sql_fuzz_97", "q_sql_fuzz_105",
    "q_sql_fuzz_120", "q_sql_fuzz_128", "q_sql_fuzz_145", "q_sql_fuzz_152",
    "q_sql_fuzz_165", "q_sql_fuzz_173", "q_sql_fuzz_190", "q_sql_fuzz_200",
]

# STAGED tier (sf10 finding, round 13): q_dedup_simhash_pairs's oracle is
# ONE statement whose banding self-join references the simhash CTE twice;
# DuckDB (1.0) inlines the reference, so the whole tokens×64 bit pipeline
# (1.76e9 rows at sf10) runs TWICE concurrently into a 169M-pair DISTINCT
# — out of memory even at a 60 GB limit with spill enabled. The query is
# also OUTPUT-BOUND at this fixture (the 30-word vocabulary saturates
# simhashes: 169,325,322 pairs at hamming<=8), so the pandas value-compare
# would be the next wall. Staged evaluation fixes both without touching
# semantics: the sim CTE is materialized once as a temp table (the oracle
# text SPLIT at the sim boundary, both halves verbatim — the sf1 gate's
# CLOSURE/NUMPY exact-replacement discipline), and the compare is multiset
# equality via EXCEPT ALL inside DuckDB (spillable), which is exactly what
# the hash compare checks.
STAGED = ["q_dedup_simhash_pairs", "q_dedup_simhash_capped"]
STAGED_CAP = {"q_dedup_simhash_capped": 12}
STAGED_SIM = """
    WITH toks AS (SELECT doc_id,
                         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
                  FROM documents),
         js AS (SELECT unnest(generate_series(0, 63)) AS j),
         bits AS (SELECT doc_id, j,
                         ((strpos('0123456789abcdef', substring(md5(tok), 1 + (j // 4), 1)) - 1)
                          >> (3 - (j % 4))) % 2 AS bit
                  FROM toks CROSS JOIN js),
         bal AS (SELECT doc_id, j, SUM(bit * 2 - 1) AS bal FROM bits GROUP BY 1, 2),
         sb AS (SELECT doc_id, j, CASE WHEN bal >= 0 THEN '1' ELSE '0' END AS b FROM bal)
    SELECT doc_id, string_agg(b, '' ORDER BY j) AS simhash FROM sb GROUP BY doc_id"""
def staged_pairs_sql(cap):
    """The pair half of the oracle, verbatim from the `sim` boundary on;
    with `cap` set, the hot-bucket df-cap CTEs are mirrored (round-13
    q_dedup_simhash_capped)."""
    hot = (""",
         hot AS (SELECT band, key FROM ch GROUP BY band, key
                 HAVING COUNT(*) > %d),
         chc AS (SELECT ch.doc_id, ch.simhash, ch.band, ch.key
                 FROM ch LEFT JOIN hot ON ch.band = hot.band
                                      AND ch.key = hot.key
                 WHERE hot.band IS NULL)""" % cap) if cap else ""
    src = "chc" if cap else "ch"
    return f"""
    WITH ch AS (SELECT doc_id, simhash, c AS band,
                       substring(simhash, c * 16 + 1, 16) AS key
                FROM sim CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS c)){hot},
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                         a.simhash AS sim_a, b.simhash AS sim_b
                  FROM {src} a JOIN {src} b ON a.band = b.band AND a.key = b.key
                                           AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, CAST(hamming(sim_a, sim_b) AS INTEGER) AS hamming
    FROM cand WHERE hamming(sim_a, sim_b) <= 8"""


def staged_compare(name):
    import duckdb
    con = duckdb.connect()
    con.execute("SET threads=16")
    con.execute("SET memory_limit='60GB'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    con.execute("SET preserve_insertion_order=false")
    src = f"{SF}/documents.parquet"
    if os.path.isdir(src):
        src += "/*.parquet"
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{src}'")
    con.execute("CREATE TEMP TABLE sim AS " + STAGED_SIM)
    con.execute("CREATE TEMP TABLE exp AS "
                + staged_pairs_sql(STAGED_CAP.get(name)))
    con.execute(
        f"CREATE VIEW got AS SELECT * FROM '{OUT}/{name}/*.parquet'")
    n_exp = con.execute("SELECT COUNT(*) FROM exp").fetchone()[0]
    n_got = con.execute("SELECT COUNT(*) FROM got").fetchone()[0]
    d1 = con.execute("SELECT COUNT(*) FROM (SELECT id_a, id_b, hamming FROM exp "
                     "EXCEPT ALL SELECT id_a, id_b, hamming FROM got)").fetchone()[0]
    d2 = con.execute("SELECT COUNT(*) FROM (SELECT id_a, id_b, hamming FROM got "
                     "EXCEPT ALL SELECT id_a, id_b, hamming FROM exp)").fetchone()[0]
    ok = n_exp == n_got and d1 == 0 and d2 == 0
    detail = {"status": "pass" if ok else "fail", "rows": int(n_exp),
              "compare": "staged-multiset (EXCEPT ALL both directions)",
              "exp_rows": int(n_exp), "got_rows": int(n_got),
              "exp_minus_got": int(d1), "got_minus_exp": int(d2)}
    print(("PASS" if ok else "FAIL") + f" {name} ({n_exp} rows, staged)",
          flush=True)
    con.close()
    return detail


if "--skip-verify" not in sys.argv:
    env = dict(os.environ,
               SPARK_GRAFT_ONLY=",".join(sorted(DIRECT + STAGED)))
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    env.setdefault("SPARK_DRIVER_MEM", "48g")
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {SF} {OUT}"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=14400)
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        sys.exit("verify run failed")

names_path = "/tmp/sf10_direct.txt"
open(names_path, "w").write("\n".join(DIRECT) + "\n")
report = "/tmp/sf10_direct_report.json"
p = subprocess.run(
    [sys.executable, os.path.join(TOOLS, "sf1_direct_compare.py"),
     SF, OUT, names_path, report, "16"], cwd=REPO)
if p.returncode != 0:
    sys.exit("sf1_direct_compare.py failed at sf10")

d = json.load(open(report))
merged = d["queries"]
for name in STAGED:
    merged[name] = staged_compare(name)
failed = sorted(n for n, r in merged.items() if r.get("status") != "pass")
out = {
    "sf_dir": SF,
    "note": ("sf10 correctness gate: the DIRECT tier of the heaviest "
             "families hashed vs DuckDB on the repo-generated sf10 corpus "
             "(60M lineitem / 500k documents / 200k embeddings). Columns "
             "sorted by name, exact value equality. Closure/numpy "
             "replacement tiers are pinned at sf1 (see the docstring for "
             "why their sf10 re-run adds budget, not surface)."),
    "compared": len(merged),
    "passed": len(merged) - len(failed),
    "failed": failed,
    "queries": {n: merged[n] for n in sorted(merged)},
}
dest = os.path.join(REPO, "CORRECTNESS_sf10.json")
json.dump(out, open(dest, "w"), indent=1)
print(f"{out['passed']}/{out['compared']} pass -> {dest}")
sys.exit(1 if failed else 0)
