#!/usr/bin/env python3
"""sf1 correctness gate: hash-verify the heaviest non-fuzz query families
against DuckDB on the repo-generated sf1 corpus.

The sf0.01 gate (tools/check.py) runs every oracle verbatim; at sf1 three
oracle shapes are infeasible in DuckDB and get exact replacements that
preserve semantics bit-for-bit:
  - DIRECT (41 queries): oracle SQL verbatim (tools/sf1_direct_compare.py);
  - CLOSURE (5): the transitive-closure CTE would materialize ~1.9e9 label
    pairs; pair CTEs + suffix run verbatim, the closure itself is exact
    min-id union-find (tools/sf1_closure_compare.py);
  - NUMPY (2): the 64-way exploded pair-scoring self-join (~12.5M x 64 rows)
    is replicated with exact Decimal/Fraction/integer arithmetic plus a
    float64 screen whose boundary band is re-decided exactly
    (tools/sf1_numpy_compare.py).

Usage: python3 tools/check_sf1.py [sfDir] [--skip-verify]
  sfDir default /root/repo/testdata/sf1 (regenerate if absent:
  sbt "runMain graft.GenData /root/repo/testdata/sf1 10").
Writes CORRECTNESS_sf1.json in the repo root.
"""
import json, os, subprocess, sys

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
    else "/root/repo/testdata/sf1"
OUT = "/tmp/graft_verify_sf1"
TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TOOLS)

CLOSURE = ["q_dedup_clusters", "q_dedup_clusters_incremental",
           "q_dedup_corpus", "q_dedup_corpus_best",
           "q_multimodal_dedup_clusters", "q_split_by_cluster"]
NUMPY = ["q_dedup_embedding_cosine", "q_dedup_semantic"]
DIRECT = ["q_dedup_containment", "q_dedup_exact", "q_dedup_incremental",
          "q_dedup_incremental_stored", "q_dedup_index_build",
          "q_dedup_jaccard_capped", "q_dedup_minhash_lsh",
          "q_dedup_ngram_jaccard", "q_dedup_simhash_pairs",
          "q_dedup_span_removal", "q_dedup_spans", "q_dedup_top_grams",
          "q_drift_numeric", "q_drift_numeric_sketch", "q_drift_report",
          "q_multimodal_ahash", "q_multimodal_audio",
          "q_multimodal_audio_fp", "q_multimodal_audio_neardup",
          "q_multimodal_chunks", "q_multimodal_decode",
          "q_multimodal_image_neardup", "q_multimodal_image_neardup_capped",
          "q_multimodal_meta", "q_multimodal_unknown",
          "q_sim_ann_hadamard", "q_sim_ann_lsh", "q_sim_cosine_topk",
          "q_sim_covariance", "q_sim_covariance_incremental",
          "q_sim_hard_negatives", "q_sim_hard_negatives_ivf",
          "q_sim_int8_topk", "q_sim_ivf_topk", "q_sim_ivfpq_adc",
          "q_sim_ivfpq_rerank", "q_sim_ivfpq_residual", "q_sim_meanpool",
          "q_sim_pq_adc", "q_sim_recall_eval",
          "q_stream_neardup", "q_stream_neardup_ttl",
          "q_text_bm25", "q_text_heavy_hitters",
          "q_text_heavy_hitters_by_lang",
          # round-11 widening (r10 verdict #4): the stateful streaming +
          # pipeline families — where watermark/batch-size interactions
          # and state-format edge cases would hide at scale. All are
          # sf-scaled (events=1M, orders=1.5M rows at sf1) except
          # q_stream_cdc_merge, whose fixture is bounded to 700 keys by
          # the shared batch/stream oracle; it still exercises the
          # 3-batch CDC drain on the sf1 session/provider configuration.
          "q_stream_sessionize", "q_stream_interval_join",
          "q_stream_interval_join_outer", "q_stream_windowed_counts",
          "q_stream_static_enrich", "q_stream_funnel",
          "q_stream_timeseries_fill", "q_stream_dedup_firstseen",
          "q_stream_latest_per_key", "q_stream_latest_rocksdb",
          "q_stream_upsert", "q_stream_cdc_merge",
          "q_stream_incremental_agg",
          "q_pipeline_store_lifecycle", "q_pipeline_csv_roundtrip",
          # round-11 second widening: the remaining operator long tail —
          # every non-fixture family now carries at-scale hash evidence.
          # (A few keep fixture-bounded inputs by their shared oracle's
          # construction — q_u2/q_scd2's 700-key CDC feed, LOCF fill's
          # 40-customer slice — noted, not scale signal, kept for the
          # drain/merge machinery they exercise at the sf1 session.)
          "q1_pricing_summary", "q3_shipping_priority",
          "q5_local_supplier_volume", "q9_product_type_profit",
          "q18_large_volume", "q21_waiting_supplier",
          "q_a2_freshness", "q_a3_topk_customers", "q_a4_top_days",
          "q_a6_genre_rollup", "q_asof_latest_value", "q_asof_next_value",
          "q_correlation", "q_cube_region_segment", "q_curriculum_order",
          "q_decontaminate", "q_decontaminate_bloom",
          "q_f1_snake_schema", "q_f2_json_props", "q_f2_json_roundtrip",
          "q_f5_ship_delay", "q_f_scalar_suite", "q_f11_alias_normalize",
          "q_f15_stock_status", "q_funnel_stages",
          "q_histogram", "q_histogram_equidepth", "q_incremental_agg",
          "q_j1_dim_rollup", "q_j2_customers_no_orders",
          "q_j2b_customers_with_orders", "q_j4_enrich_fallback",
          "q_j6_fuzzy_title", "q_j6_fuzzy_title_phased",
          "q_j6_fuzzy_levenshtein",
          "q_j_full_outer", "q_mix_temperature", "q_o7_shortest_name",
          "q_p6_multi_filter", "q_p_scan_filter_sort", "q_percentiles",
          "q_pipeline_corpus_prep", "q_pivot_priority",
          "q_profile_columns", "q_quality_corpus",
          "q_quality_expectations", "q_quality_quarantine",
          "q_range_join_week", "q_retention_cohorts", "q_robust_scale",
          "q_rollup_region", "q_sample_deterministic", "q_sample_mix",
          "q_sample_stratified", "q_sample_weighted",
          "q_sample_weighted_group", "q_scd2_from_cdc",
          "q_scd2_versions", "q_sessionize", "q_sketch_distinct",
          "q_quantile_sketch", "q_quantile_sketch_merged",
          "q_quantile_sketch_stored",
          "q_quantile_sketch_signed",
          # round-14 faces: overflow routing + the streaming fold dual
          "q_quantile_sketch_overflow", "q_stream_quantile_sketch",
          "q_skew_join_aqe", "q_skew_salted_sum",
          "q_split_leakage", "q_split_train_test",
          "q_sql_agent_topk", "q_sql_agent_window", "q_sql_exists",
          "q_st1_date_spine", "q_stream_drift", "q_stream_heavy_hitters",
          "q_stream_corpus_gate", "q_t1_union_names", "q_t3_set_ops",
          "q_text_chunks", "q_text_corpus_gate", "q_text_divergence",
          "q_text_divergence_group", "q_text_fingerprint",
          "q_text_inverted_index", "q_text_langid", "q_text_novelty",
          "q_text_packing", "q_text_packing_sharded", "q_text_quality",
          "q_text_redact", "q_text_repetition", "q_text_simhash",
          "q_text_tfidf", "q_text_tokens", "q_text_unigram_ce",
          "q_text_bigram_ce", "q_text_nb_logodds", "q_text_dsir",
          "q_pipeline_training_mix", "q_text_dsir_incremental",
          "q_stream_dsir",
          # round-12: the stored/merged LM-filter faces and the
          # distributed-threshold draw (shared-oracle equalities must
          # hold at scale too — threshold discovery and model merging
          # are exactly the machinery whose edges show up off-toy)
          "q_text_bigram_ce_stored", "q_text_nb_stored",
          "q_pipeline_training_mix_threshold",
          "q_timeseries_fill", "q_u1_upsert", "q_u2_cdc_merge",
          "q_unpivot_metrics", "q_w1_latest_per_key", "q_w2_daily_rank",
          "q_w2_lag_cumsum", "q_w3_window_suite", "q_zorder_key",
          "q_zscore_group"]
ALL = sorted(CLOSURE + NUMPY + DIRECT)

if "--skip-verify" not in sys.argv:
    env = dict(os.environ, SPARK_GRAFT_ONLY=",".join(ALL))
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {SF} {OUT}"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=7200)
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:])
        sys.exit("verify run failed")

reports = []
def run(script, args, report):
    p = subprocess.run([sys.executable, os.path.join(TOOLS, script)] + args,
                       cwd=REPO)
    if p.returncode != 0:
        sys.exit(f"{script} failed")
    reports.append(report)

def nf(path, names):
    open(path, "w").write("\n".join(names) + "\n")
    return path

run("sf1_direct_compare.py",
    [SF, OUT, nf("/tmp/sf1_direct.txt", DIRECT), "/tmp/sf1_direct_report.json", "16"],
    "/tmp/sf1_direct_report.json")
run("sf1_closure_compare.py",
    [SF, OUT, "/tmp/sf1_closure_report.json", nf("/tmp/sf1_closure.txt", CLOSURE)],
    "/tmp/sf1_closure_report.json")
run("sf1_numpy_compare.py", [SF, OUT, "/tmp/sf1_numpy_report.json"],
    "/tmp/sf1_numpy_report.json")

merged, failed = {}, []
for rp in reports:
    d = json.load(open(rp))
    merged.update(d["queries"])
failed = sorted(n for n, r in merged.items() if r.get("status") != "pass")
out = {
    "sf_dir": SF,
    "note": ("sf1 correctness gate: heaviest non-fuzz families hashed vs "
             "DuckDB on the repo-generated sf1 corpus. Exact compare: "
             "columns sorted by name, exact value equality; closure and "
             "pair-scoring oracles evaluated with exact semantics-preserving "
             "replacements (see tools/check_sf1.py docstring)."),
    "compared": len(merged),
    "passed": len(merged) - len(failed),
    "failed": failed,
    "queries": {n: merged[n] for n in sorted(merged)},
}
dest = os.path.join(REPO, "CORRECTNESS_sf1.json")
json.dump(out, open(dest, "w"), indent=1)
print(f"{out['passed']}/{out['compared']} pass -> {dest}")
sys.exit(1 if failed else 0)
