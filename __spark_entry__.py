"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` expose the engine's operator registry
(``mtg_bulk_database_spark.queries``); ``entry`` runs the flagship
multi-way join + aggregation at sf0.001.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mtg_bulk_database_spark.registry import load_registry  # noqa: E402

QUERIES, ORACLE_SQL = load_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q22_revenue_by_nation"](spark, "/root/testdata/sf0.001")


# Latest round in which each name was exercised by an external driver
# run (CORRECTNESS_r01..r09: every oracled sample hash-green, rows-only
# entries executed with rows returned).  The driver checks the FIRST
# ~50 entries of ``queries()``, so surface (a) queries it has never
# seen — oracled ones first, newest first — then (b) the already-
# proven block ordered OLDEST external evidence first, so with no
# fresh names left each round re-verifies the stalest greens instead
# of last round's (VERDICT r8 directive #1; r9 #1 keeps the map
# current each round — tests pin that it stays a subset of the live
# registry).
_EVIDENCE_ROUND = {
        # latest external evidence: round 6 (49 names)
        "q118_remove_boilerplate": 6,
        "q119_soft_dedup_weights": 6, "q120_crosscorpus_lm_score": 6,
        "q121_quality_classifier": 6, "q122_gapfill_locf": 6,
        "q123_weighted_moving_avg": 6, "q125_table_checksum": 6,
        "q126_nfc_normalize": 6, "q127_cheapest_supplier": 6,
        "q128_waiting_suppliers": 6, "q129_top_supplier": 6,
        "q131_length_histogram": 6, "q133_session_window": 6,
        "q134_argmax_longest_doc": 6, "q135_url_extraction": 6,
        "q138_table_profile": 6, "q139_time_range_window": 6,
        "q140_constraint_report": 6, "q141_funnel_counts": 6,
        "q142_unpivot_measures": 6, "q143_order_reconciliation": 6,
        "q144_supplier_triangles": 6, "q145_grouped_percentiles": 6,
        "q146_fuzzy_name_match": 6, "q147_cohort_retention": 6,
        "q150_market_basket": 6, "q151_rfm_scores": 6,
        "q152_first_digit_profile": 6, "q153_outlier_events": 6,
        "q154_revenue_share": 6, "q155_event_transitions": 6,
        "q156_spatial_neighbor_join": 6, "q158_join_cardinality": 6,
        "q159_key_skew_report": 6, "q160_ohlc_bars": 6,
        "q170_iqr_outliers": 6, "q172_cumulative_uniques": 6,
        "q175_reactivation_census": 6, "q180_minhash_eval_portable": 6,
        "q208_kaplan_meier": 6, "q213_quality_gate_scoring": 6,
        "q214_source_token_kl": 6, "q215_readability": 6,
        "q216_hll_set_algebra": 6, "q217_ivf_assign_portable": 6,
        "q218_cohort_retention": 6, "q219_retrieval_ndcg": 6,
        "q220_packing_efficiency": 6, "q221_ivf_probe_portable": 6,
        # latest external evidence: round 7 (50 names)
        "q34_simhash_near_pairs": 7, "q37_lsh_ann_topk": 7,
        "q45_embedding_near_dup_lsh": 7, "q60_moving_sum": 7,
        "q66_token_doc_frequency": 7, "q67_array_agg": 7, "q68_stats_agg": 7,
        "q69_distribution_ranks": 7, "q70_string_agg": 7,
        "q72_approx_distinct": 7, "q73_shipping_priority": 7,
        "q74_returned_item_ranking": 7, "q76_sliding_window": 7,
        "q77_multiset_ops": 7, "q89_bm25_topk": 7, "q90_cluster_canonical": 7,
        "q91_label_centroids": 7, "q92_volume_shipping": 7,
        "q93_source_mix_report": 7, "q94_hybrid_search": 7,
        "q97_source_quota_cap": 7, "q98_token_commonness": 7,
        "q99_repeated_passages": 7, "q100_heavy_hitter_tokens": 7,
        "q101_cross_corpus_near_dup": 7, "q102_pack_sequences": 7,
        "q103_sq_refine_topk": 7, "q104_pq_ann_topk": 7,
        "q105_incremental_matview": 7, "q106_gopher_quality_rules": 7,
        "q107_bpe_tokenize": 7, "q108_semantic_dedup": 7,
        "q109_leakage_safe_split": 7, "q110_bigram_lm_score": 7,
        "q111_temperature_mix": 7, "q112_novel_against_corpus": 7,
        "q113_small_qty_revenue": 7, "q115_hll_distinct_tokens": 7,
        "q116_cms_heavy_hitters": 7, "q166_minhash_param_sweep": 7,
        "q222_grouped_ndcg": 7, "q223_pq_adc_probe_portable": 7,
        "q224_shingle_containment": 7, "q225_vocab_coverage": 7,
        "q226_dsir_importance": 7, "q227_k_anonymity_census": 7,
        "q228_embedding_dim_qa": 7, "q229_classifier_auc": 7,
        "q230_cluster_balanced_sample": 7, "q231_source_token_fingerprint": 7,
        # latest external evidence: round 8 (50 names)
        "q01_pk_point_lookup": 8, "q02_secondary_equality": 8,
        "q03_containment_single": 8, "q04_containment_all": 8,
        "q05_ilike_substring": 8, "q06_numeric_range": 8,
        "q07_fts_match_all": 8, "q08_fts_match_any": 8,
        "q09_enum_equality": 8, "q10_enrichment_join": 8,
        "q11_pricing_summary": 8, "q12_window_topk": 8, "q13_rollup": 8,
        "q14_cube": 8, "q15_distinct_counts": 8, "q16_sort_limit": 8,
        "q17_semi_join": 8, "q18_anti_join": 8, "q19_intersect": 8,
        "q20_except": 8, "q21_pivot": 8, "q22_revenue_by_nation": 8,
        "q23_tumbling_window": 8, "q24_sessionize": 8, "q30_dedup_exact": 8,
        "q117_dup_pagerank": 8, "q124_audio_features": 8,
        "q130_video_frame_sample": 8, "q132_image_phash_pairs": 8,
        "q137_minhash_eval": 8, "q148_cross_format_image_dedup": 8,
        "q149_mjpeg_frame_sample": 8, "q161_compression_quality": 8,
        "q165_dedup_ensemble": 8, "q200_quality_classifier": 8,
        "q203_dup_communities": 8, "q206_video_near_dup": 8,
        "q232_semdedup_serving_portable": 8, "q233_pagerank_unrolled": 8,
        "q234_bpe_encode_frozen": 8, "q235_kmeans_step_portable": 8,
        "q236_logreg_step_portable": 8, "q237_source_overlap_minhash": 8,
        "q238_tokenizer_fertility": 8, "q239_domain_reweight_eg": 8,
        "q240_epoch_capped_allocation": 8, "q241_ivf_nprobe_sweep": 8,
        "q242_dedup_adjusted_mix": 8, "q243_quality_budget_curve": 8,
        "q244_ivf_workload_recall": 8,
        # latest external evidence: round 9 (50 names)
        "q31_dedup_fingerprint": 9, "q32_ngram_jaccard_pairs": 9,
        "q33_minhash_lsh_pairs": 9, "q35_embedding_top_pairs": 9,
        "q36_cosine_topk": 9, "q38_language_id": 9, "q39_token_counts": 9,
        "q40_quality_score": 9, "q41_multimodal_metadata": 9,
        "q42_multimodal_decode": 9, "q43_json_extract": 9,
        "q44_udaf_weighted_quality": 9, "q50_correlated_subquery": 9,
        "q51_in_subquery": 9, "q52_grouping_sets": 9,
        "q53_string_functions": 9, "q54_date_functions": 9,
        "q55_conditional_expr": 9, "q56_asof_join": 9, "q57_percentiles": 9,
        "q58_fts_ranked": 9, "q59_window_suite": 9, "q61_dup_clusters": 9,
        "q62_normalize_text": 9, "q63_repetition_metrics": 9,
        "q64_train_split": 9, "q65_attribution_counts": 9,
        "q71_curate_corpus": 9, "q75_ivf_ann_topk": 9, "q78_latest_by_key": 9,
        "q79_scd2_intervals": 9, "q80_doc_chunks": 9, "q81_decontaminate": 9,
        "q82_pii_redaction": 9, "q83_stratified_sample": 9,
        "q84_winnow_fingerprints": 9, "q85_quantize_embeddings": 9,
        "q86_length_outlier_filter": 9, "q87_approx_quantiles": 9,
        "q88_global_interval_join": 9, "q95_ngram_jaccard_prefix": 9,
        "q245_paragraph_dedup": 9, "q246_paragraph_near_dup": 9,
        "q247_top_repeated_paragraphs": 9, "q248_mix_manifest": 9,
        "q249_fertility_capped_allocation": 9, "q250_paragraph_rewrite": 9,
        "q251_paragraph_near_dup_lsh": 9, "q252_budget_to_threshold": 9,
        "q253_decontaminated_manifest": 9,
        # latest external evidence: round 10 (50 names — the 6 new r10
        # gates plus the re-greened stalest r4/r5/r6 evidence)
        "q114_large_qty_orders": 10, "q157_nearest_event_match": 10,
        "q162_ewma_smoothing": 10, "q163_cusum_alerts": 10,
        "q164_session_journeys": 10, "q167_weighted_median_price": 10,
        "q168_revenue_gini": 10, "q169_mad_by_lang": 10,
        "q171_mom_growth": 10, "q173_abc_classification": 10,
        "q174_interarrival_histogram": 10, "q176_scale_exact_percentiles": 10,
        "q177_minhash_lsh_portable": 10, "q178_hll_portable_distinct": 10,
        "q179_cms_portable_heavy_hitters": 10,
        "q181_dedup_ensemble_portable": 10,
        "q182_order_priority_check": 10, "q183_forecast_revenue": 10,
        "q184_national_market_share": 10, "q185_product_profit": 10,
        "q186_returned_item_customers": 10, "q187_important_parts": 10,
        "q188_shipmode_priority": 10, "q189_customer_order_distribution": 10,
        "q190_promo_revenue_share": 10, "q191_part_supplier_counts": 10,
        "q192_disjunctive_revenue": 10, "q193_promotion_suppliers": 10,
        "q194_dormant_rich_customers": 10, "q195_duplicate_substrings": 10,
        "q196_duplicated_char_coverage": 10, "q197_url_canonical_dedup": 10,
        "q198_weighted_sample": 10, "q199_tfidf_keywords": 10,
        "q201_hard_negatives": 10, "q202_quantile_sketch": 10,
        "q204_ingest_drift": 10, "q205_variant_extract": 10,
        "q207_multitouch_attribution": 10, "q209_revenue_trend_ols": 10,
        "q210_classifier_calibration": 10, "q211_ab_test_zstat": 10,
        "q212_bootstrap_ci": 10, "q254_incremental_paragraph_near_dup": 10,
        "q255_shortfall_reallocation": 10,
        "q256_structural_paragraph_dedup": 10,
        "q257_artifact_paragraph_stats": 10,
        "q258_incremental_paragraph_dedup": 10,
        "q259_paragraph_near_dup_rewrite": 10, "q96_dup_clusters_star": 10,
}

_EXTERNALLY_VERIFIED = frozenset(_EVIDENCE_ROUND)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _qnum(name: str) -> int:
        digits = "".join(c for c in name[1:4] if c.isdigit())
        return int(digits) if digits else 0

    def _rank(name: str) -> tuple[int, int, int, str]:
        fresh = name not in _EXTERNALLY_VERIFIED
        oracled = name in ORACLE_SQL
        # fresh+oracled < fresh rows-only < already-verified; within
        # the fresh-oracled block, NEWEST first (highest query number)
        # so each round's additions land inside the driver's sample
        # prefix; within the verified tail, OLDEST external evidence
        # first so stale greens get re-checked before recent ones
        return (
            0 if fresh and oracled else 1 if fresh else 2,
            0 if fresh else _EVIDENCE_ROUND.get(name, 0),
            -_qnum(name) if fresh and oracled else _qnum(name),
            name,
        )

    return {n: QUERIES[n] for n in sorted(QUERIES, key=_rank)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable SQL twin for each oracle-expressible query."""
    return dict(ORACLE_SQL)
