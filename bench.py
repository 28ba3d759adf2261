"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with the noop sink (computes everything, writes
nothing) so timings measure full plan execution, not driver collection.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from elasticsearch_drift_plugin_spark import clear_result_memos
from elasticsearch_drift_plugin_spark.session import get_spark

BENCH_QUERIES = [
    "psum_fixed_1h",
    "psum_cal_day",
    "psum_cal_week",
    "psum_cal_month_lineitem",
    "psum_grouped_subagg",
    "psum_empty_fill",
    "psum_cal_year_lineitem",
    "psum_day_lineitem",
    "psum_grouped_distinct",
    "pipe_cum_derivative",
    "flow_sessions",
    "stats_quantiles",
    "stats_quantiles_approx",
    "stats_top_docs",
    "rel_flows_by_nation",
    "rel_asof_latest_order",
    "rel_json_props",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_sig",
    "dedup_minhash_pairs",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_cosine_topk",
    "ann_lsh_histogram",
    "ann_ivf_topk",
    "text_lang_id",
    "text_quality",
    "text_tokens",
    "text_fingerprint",
    "text_rolling_fp",
    "text_repetition",
    "text_pii_scan",
    "text_gopher_filter",
    "corpus_tfidf_top",
    "corpus_manifest",
    "train_mix_tokens",
    "es_significant_jlh",
    "es_search_retriever",
    "corpus_contamination",
    "corpus_span_dedup",
    "es_terms_top_users",
    "es_range_value",
    "es_histogram_value",
    "es_extended_stats",
    "es_composite_page",
    "es_filters_buckets",
    "es_auto_date_histogram",
    "es_significant_terms",
    "es_matrix_stats",
    "dedup_components",
    "mm_metadata",
    "mm_decode",
    "mm_resize",
    "mm_features",
    "es_mad",
    "es_boxplot",
    "es_string_stats",
    "es_rate_month",
    "es_diversified_sampler",
    "pipe_selector_topk",
    "corpus_boilerplate",
    "train_pack_sequences",
    "train_domain_mix",
    # r4 additions: the end-to-end curation story (SCALE.md walkthrough,
    # tracked round-over-round), the tz-rounding extension, and the
    # geo / sketch / clustering agg families
    "train_curate_pipeline",
    "psum_cal_day_tz",
    "es_geotile_grid",
    "es_geohash_grid",
    "es_geo_distance",
    "es_variable_width_histogram",
    "es_categorize_text",
    "es_cardinality_approx",
    "es_ip_range",
    "train_pack_sharded",
    "corpus_lm_score",
    # session-2 additions: market-basket FIS (map-side combinations),
    # geo_line track assembly, the scripted_metric Arrow harness, SemDeDup,
    # the fuzzy decon screen, and the int8 embedding compactor
    "es_frequent_item_sets",
    "es_geo_line",
    "es_scripted_metric",
    "dedup_semantic",
    "corpus_fuzzy_decon",
    "emb_quantize_int8",
    "pipe_moving_fn",
    "es_random_sampler",
    "ann_knn_join",
    "pipe_change_point",
    "pipe_ks_test",
    "pipe_bucket_correlation",
    "ann_knn_cells",
    "corpus_topic_terms",
    "pipe_zscore",
    "mm_phash_dedup",
    "stream_zscore_day",
    "train_epoch_plan",
    "text_readability",
    "emb_cluster_purity",
    "corpus_sample_exact",
    # session-3 additions: ES top_hits, BPE merge-step pair counting,
    # the bucketed interval join, curriculum staging, signed random
    # projection
    "es_top_hits",
    "corpus_bpe_pairs",
    "rel_interval_join",
    "train_curriculum",
    "emb_rp_project",
    "es_terms_shard_error",
    "corpus_weighted_sample",
    "corpus_decon_hashed",
    "pipe_js_divergence",
    "dedup_containment",
    "corpus_log_odds",
    "es_has_child",
    "pipe_holt_forecast",
    "stream_js_divergence",
    "es_rrf_fusion",
    "corpus_zipf_slope",
    "graph_pagerank",
    "es_geo_polygon",
    "psum_hard_bounds",
    "dedup_lsh_eval",
    "rel_data_quality",
    "es_percolate",
    "es_more_like_this",
    "es_intervals_near",
    "es_term_suggest",
    "stream_percolate",
    "text_hash_embed",
    "emb_pq_codes",
    "ann_pq_topk",
    "ann_pq_rerank",
    "train_pack_bfd",
    "train_neg_samples",
    "stream_data_quality",
    "train_shard_by_tokens",
    # r5 additions: the REAL PNG codec path (encode → inflate/defilter
    # decode → nearest-neighbor thumbnail) and the ES nested-agg pair
    "mm_png_roundtrip",
    "mm_resize_png",
    "es_nested",
    "es_reverse_nested",
    "es_time_series_rate",
    "stream_time_series_rate",
    "corpus_bpe_encode",
    "mm_frames_png",
    "es_dsl_query",
    "es_search_body",
    "es_search_grouped",
    "es_dsl_geo",
    "es_search_body2",
    "es_search_pctl",
    "es_search_top_hits",
    "es_search_geo",
    "es_dsl_geo_dateline",
    "corpus_bpe_train",
    "corpus_chunk",
    "es_search_filter",
    "es_search_terms_order",
    "es_search_grouped_pctl",
    "es_search_metrics3",
    "es_search_sampler",
    "es_search_terms_dh",
    "es_search_pipe2",
    "es_search_cumcard",
    "es_search_change_point",
    "es_search_nested",
    "es_search_ip_range",
    "es_search_knn",
    "es_search_collapse",
    "es_search_highlight",
    "es_search_script_fields",
    "es_search_terms_filtered",
    "text_pii_redact",
    "es_phrase_suggest",
    "emb_vector_percolate",
    "stream_vector_percolate",
    "ann_rank_eval",
    "es_search_knn_facets",
    "es_search_inference",
    "es_composite_month",
    "es_dsl_sqs",
    "es_search_post_filter",
    "es_filters_metric",
    "es_delete_by_query",
    "es_update_by_query",
    # r7 additions: the compiler-corner body (significant_text
    # background_filter), terms-under-histogram, collapse inner_hits,
    # the indexed-knn serving tier, and the shared-session msearch
    "es_search_body3",
    "es_search_hist_subagg",
    "es_search_collapse_inner",
    "es_search_knn_indexed",
    "es_msearch_shared",
    "mm_audio_features",
    "es_dsl_msm",
    "train_span_corruption",
    "es_dsl_terms_set",
    "mm_audio_frames",
    "mm_scene_changes",
    "emb_matryoshka_eval",
    "train_span_ul2x",
    # r8 additions: DSIR importance resampling + the pure-JVM BPE loop
    "corpus_dsir_weights",
    "corpus_dsir_sample",
    "corpus_bpe_train_dist",
    # r9 additions: the finished trained quality gate + clf-gated curate
    "corpus_quality_clf",
    "train_curate_clf",
    # r10 additions: the zero-fill-with-metrics compiler corner, the
    # minimum_should_match spec grammar, and the train-on-sample clf
    # serving path
    "es_search_body4",
    "es_search_hist_fill_terms",
    "es_search_dh_fill_terms",
    "es_dsl_msm_pct",
    "corpus_quality_clf_sampled",
    "es_top_hits_asc",
    "es_composite_week",
    "es_matrix_stats_multi",
    "es_search_hl_frag",
    "es_geo_line_desc",
    "es_completion_suggest",
    "es_search_cumcard_cal",
    "es_search_knn_l2",
    "stream_new_users",
    "es_dsl_range_tz",
    # r11 graduations
    "es_dsl_date_math",
    "es_ip_prefix_v6",
    "es_search_cumcard_cal_off",
    # r11 second pass: zone-aware cumcard + the compound/Lucene DSL tier
    "es_search_cumcard_cal_tz",
    "es_dsl_multi_match",
    "es_dsl_compound",
    "es_dsl_query_string",
    "es_search_slice",
    "es_dsl_nested",
    "corpus_domain_cap",
    "corpus_clf_calibration",
    # r12 additions: the parent/child JOIN query kinds (+ inner_hits),
    # the zone-shifted fixed grids (operator + full-compiler routes),
    # and the geo-distance hits sort
    "es_dsl_has_child",
    "es_dsl_has_parent",
    "es_search_has_child_inner",
    "pipe_cumcard_fixed_tz",
    "es_search_cumcard_fixed_tz",
    "es_search_geo_sort",
    "es_search_date_range_tz",
    # r13 additions: the zone-shifted fixed grid over DURATION rows +
    # the SQL-dialect script_score retriever
    "psum_fixed_tz",
    "es_search_script_score",
    "es_search_rank_feature",
    "stream_psum_fixed_tz",
    "es_dsl_intervals",
    "es_search_script_sort",
    "es_dsl_span_near",
    "es_dsl_span_not",
    "es_search_children_agg",
    "es_search_parent_agg",
    "es_dsl_knn_query",
    "es_time_series",
    "es_dsl_geo_shape",
    "es_search_linear_retr",
    "es_dsl_terms_lookup",
    "es_rank_eval",
    "es_search_rescore",
    "stream_span_matches",
    "train_hard_negatives",
    "es_termvectors",
    "es_percolate_doc",
    "es_explain",
    "es_composite_geotile",
    "es_composite_geohash",
    "es_terms_partition",
    "es_search_template",
    "dedup_containment_dir",
    "es_ingest_pipeline",
    "stream_ingest_pipeline",
    # r14 additions: the sketch/iterative verdict twins (oracle-paired
    # tolerance checks) and the now-exact theta set algebra
    "es_theta_set_ops",
    "es_cardinality_tol",
    "stats_quantiles_kll_rank",
    "emb_kmeans_recall",
    "corpus_bpe_bounds",
    "es_percolate_batch",
    "stream_percolate_batch",
    "es_search_template_cond",
]

# Queries in their FIRST committed bench window get one UNTIMED warmup
# execution before the timed best-of-N loop (VERDICT r12 item 3:
# es_search_knn_facets landed a 6.2 s first-execution JIT/codegen
# artifact in the permanent trail vs 1.0 s warm — best-of-2 in one
# window failed to dampen it). Rotate this list each round: only the
# round's new registrations belong here, so the warmup cost stays
# bounded while established queries keep their cheap 2-shot timing.
FIRST_WINDOW_WARMUP = [
    # r15 adds no new registrations; these three run their first committed
    # window under structurally NEW plans (BPE driver routing + Arrow
    # literal frames; the single-pass more_like_this seed collect)
    "corpus_bpe_train_dist",
    "corpus_bpe_train",
    "es_more_like_this",
]


def _msearch_amortization(spark, sf_dir: str) -> dict[str, float]:
    """Dispatch-floor evidence (VERDICT r6 item 6): the SAME three metric
    bodies executed (a) fused — one union plan, ONE job — vs (b) as three
    separate jobs. At sf0.1 each body's work is sub-second, so the
    separate form pays the per-job dispatch floor three times; the fused
    form shares one scan/session dispatch. SCALE.md documents the
    measured ratio as the serving recipe."""
    from elasticsearch_drift_plugin_spark.functions.es_search import (
        run_msearch,
    )
    from elasticsearch_drift_plugin_spark.sources.flows import load_table

    ev = load_table(spark, sf_dir, "events")
    reqs = [
        {"index": "events",
         "body": {"aggs": {"m": {"value_count": {"field": "value"}}}}},
        {"index": "events",
         "body": {"aggs": {"m": {"max": {"field": "value"}}}}},
        {"index": "events",
         "body": {"aggs": {"m": {"min": {"field": "value"}}}}},
    ]
    parts = [r["m"] for r in run_msearch({"events": ev}, reqs)]
    # warm BOTH forms untimed before either timing window, so neither
    # probe pays the first-execution codegen/scan warmup for the other
    # (ADVICE r7: the fused form previously ran first and ate it)
    fused = parts[0]
    for p in parts[1:]:
        fused = fused.unionByName(p)
    fused.write.format("noop").mode("overwrite").save()
    for p in parts:
        p.write.format("noop").mode("overwrite").save()
    t0 = time.time()
    fused.write.format("noop").mode("overwrite").save()
    t_fused = time.time() - t0
    t0 = time.time()
    for p in parts:
        p.write.format("noop").mode("overwrite").save()
    t_separate = time.time() - t0
    return {
        "msearch_fused_3": round(t_fused, 3),
        "msearch_separate_3": round(t_separate, 3),
    }


def _dispatch_floor(spark, n: int = 5) -> float:
    """Per-job dispatch floor: best-of-``n`` wall time of a trivial
    1-row job (range(1) → noop sink). Everything slower than this is
    query work; a HIGH floor in an artifact flags hypervisor steal /
    CPU contention in that measurement window (VERDICT r11 item 5 —
    the calibration probe that lets weak-set classification normalize
    honestly across windows instead of re-litigating host variance)."""
    best = None
    for _ in range(max(n, 1)):
        t0 = time.time()
        spark.range(1).write.format("noop").mode("overwrite").save()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    return round(best, 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("spark-drift-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # untimed warmup: JVM/codegen/parquet-footer caches, not query work
    qs["dedup_exact"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # first-window registrations: absorb their one-off JIT/codegen cost
    # OUTSIDE the timing loop so the committed trail never records a
    # cold-start phantom (VERDICT r12 item 3)
    for name in FIRST_WINDOW_WARMUP:
        if name in BENCH_QUERIES:
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
    floor_start = _dispatch_floor(spark)
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2"))
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best = None
        for _ in range(max(repeat, 1)):
            # every timed repetition starts memo-cold (VERDICT r14 item 2):
            # cross-invocation memos of collected job results (ANN seed
            # centroids / probe vectors, psum width sample, GEMM hot-block
            # stat, clf/DSIR model weights) would otherwise let run 2 — the
            # recorded best — skip real per-query work that run 1 paid
            clear_result_memos()
            # construction INSIDE the window: eager operators (iterative
            # components, k-means) do real jobs before the sink runs
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        timings[name] = round(best, 3)
    # kept OUT of `queries`/total: both probes re-run es_msearch_shared's
    # work, so folding them in would double-count the headline metric
    amortization = _msearch_amortization(spark, sf_dir)
    # floor probed at BOTH ends: a start/end divergence localizes a host
    # slowdown to part of the window
    dispatch_floor = {"start": floor_start, "end": _dispatch_floor(spark)}
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    total = round(sum(timings.values()), 3)
    # Full per-query map goes to a sidecar file (the driver's stdout tail
    # capture is finite; a 126-entry map broke its parser in round 4 —
    # BENCH_r04.json came back "parsed": null).
    self_path = os.environ.get(
        "SPARK_GRAFT_BENCH_SELF",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_SELF_latest.json"),
    )
    with open(self_path, "w") as fh:
        json.dump(
            {
                "metric": "spark-drift headline queries, total wall sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "amortization": amortization,
                "dispatch_floor": dispatch_floor,
                "sf": sf_val,
            },
            fh,
            indent=1,
        )
    # Final stdout line stays compact and machine-parseable: the required
    # keys plus a small headline subset of per-query timings (<2 KB).
    headline = {k: timings[k] for k in BENCH_QUERIES[:12] if k in timings}
    print(
        json.dumps(
            {
                "metric": "spark-drift headline queries, total wall sec",
                "value": total,
                "unit": "sec",
                "queries": headline,
                "n_queries": len(timings),
                "amortization": amortization,
                "dispatch_floor": dispatch_floor,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
