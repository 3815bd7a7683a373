"""Query registry: every implemented operator as a named
(PySpark builder, DuckDB oracle SQL) pair.

This is the single source of truth consumed by ``__spark_entry__.py``
(the driver contract) and by ``tests/`` (which mirror the driver's
row-count + schema + order-insensitive value-hash comparison).

Oracle-exactness conventions (FIXTURES.md §C):
- window starts are BIGINT epoch seconds: Spark ``unix_timestamp`` floor
  ≡ DuckDB ``floor(epoch(ts))::BIGINT``; both epoch-0 aligned.
- float sums accumulate in DECIMAL(28,6) and cast the final value to
  DOUBLE on both sides — bit-exact regardless of shuffle/scan order.
- no raw TIMESTAMP output columns (timezone-proof); ids/epoch seconds
  instead.
- every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered fixture views
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = Query(name, fn, oracle, tags, (fn.__doc__ or "").strip())
        return fn

    return deco


# The driver verifies only the FIRST 50 entries of ``queries()`` per round
# (each CORRECTNESS_r*.json is exactly the 50-name prefix of the order
# we expose at that round).  Registration order is an import-order accident, so we pin
# an explicit verification priority instead: queries that have never had
# a green driver CORRECTNESS row come first, then stale-green names
# oldest-round-first (driver freshness is the one evidence class the repo
# can't self-produce).  Names not listed keep registration order after
# the priority block, so the registry surface itself is unchanged — only
# the iteration order of queries()/oracle_sql() moves.
#
# Round-16 window, regenerated PURELY mechanically by
# tools/regen_priority.py from CORRECTNESS_r01..r15.json AFTER the
# round's registrations (the r15 advice item: regen after prepends so
# the 50-slot marker is placed mechanically, never by hand): the 15
# never-checked round-16 names lead (7 first wave + 8 second wave),
# then the r11 tier to the boundary; remainder oldest-first.
_PRIORITY: tuple[str, ...] = (
    # slot 1+: no green driver row yet
    "http_parse_response",
    "charset_quality_gate",
    "web_pipeline_warc_to_shards",
    "unigram_seed_vocab",
    "unigram_encode_viterbi",
    "unigram_em_reestimate",
    "frontier_politeness",
    "crawl_snapshot_delta",
    "host_pagerank",
    "wordpiece_vocab",
    "wordpiece_encode",
    "quality_probe_train",
    "quality_probe_score",
    "kn_trigram_perplexity",
    "frontier_authority",
    "host_hits",
    "anchor_text_index",
    "domain_reweight_excess_loss",
    "bitext_mine_margin",
    "tokenizer_fertility_compare",
    # slot 21+: latest green driver row is r11
    "kmeans_embeddings_2iter",
    "pagerank_word_graph",
    "mix_langs_temperature",
    "scd2_user_event_type",
    "trend_slope_per_user",
    "acf_daily_value_lag7",
    "dedup_prefix_filter",
    "basket_pair_lift",
    "bfs_hops_copurchase",
    "snapshot_diff_users",
    "negative_sample_user_items",
    "grouping_sets_event_stats",
    "label_propagation_communities",
    "corr_matrix_event_types",
    "hard_negatives_topk",
    "skyline_parts",
    "drift_binned_ks_value",
    "zorder_file_stats",
    "event_ngram_next",
    "referential_audit",
    "inverted_index_postings",
    "dedup_cluster_canonical",
    "pq_codes_embeddings",
    "twap_user_value",
    "rank_normalize_value",
    "attribution_linear",
    "ab_test_value_by_variant",
    "basket_triple_support",
    "session_path_topk",
    "entity_resolution_parts",  # --- driver window ends here (50) ---
    # slot 51+: latest green driver row is r12
    "sample_domain_quota",
    "churn_training_set",
    "item_similarity_jaccard",
    "dedup_exact_normalized",
    "supplier_lead_time",
    "survival_km_error",
    "backtest_seasonal_naive",
    "doc_sentiment_frozen_margin",
    "bpe_encode_documents",
    "semdedup_embeddings",
    "sample_token_budget",
    "dedup_cdc_chunks",
    "daily_median_value",
    "asof_view_next_purchase",
    "gopher_quality_gate",
    "session_concurrency",
    "hll_sliding_distinct_7d",
    "percentile_order_value",
    "winsorize_event_value",
    "anomaly_robust_events",
    "bpe_merges",
    "tpch_q6_forecast",
    "tpch_q14_promo",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_quantity",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive",
    "semi_late_orders",
    "anti_customers_no_orders",
    "doc_sentiment",
    "doc_entities",
    "doc_categories",
    "doc_sentiment_mllib",
    "dedup_exact",
    "dedup_simhash",
    "dedup_keep_set",
    "dedup_components",
    "similarity_topk_brute",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "similarity_topk_multiprobe",
    "text_stats",
    "text_fingerprint",
    "text_distinctive_terms",
    "text_normalize",
    "text_bigram_lift",
    "multimodal_features",
    "multimodal_image_headers",
    "embedding_centroids",
    "embedding_quantize_error",
    # slot 101+: latest green driver row is r13
    "seq_packing_bpe_512",
    "sample_token_budget_bpe",
    "quality_gate_per_lang_head",
    "dedup_cluster_sizes",
    "bpe_fertility_per_lang",
    "packing_efficiency_bpe_512",
    "quality_tiers_per_lang",
    "dedup_chunks_exact",
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "session_concurrency_capped",
    "corpus_curation_pipeline",
    "dedup_span_8gram",
    "dsir_importance_weights",
    "sample_cluster_balanced",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_ngram_containment",
    "dedup_embedding_cosine",
    "graph_triangle_counts",
    "decontaminate_5gram",
    "multimodal_resize_plan",
    "multimodal_frame_sample",
    "pii_redaction",
    "boilerplate_removal",
    "lang_id_confusion",
    "bloom_semijoin_customers",
    "tpch_q2_min_cost_supplier",
    "tpch_q4_priority_check",
    "tpch_q5_regional",
    "tpch_q7_nation_trade",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returns",
    "tpch_q11_important_stock",
    "tpch_q15_top_supplier",
    "tpch_q20_excess_suppliers",
    "tpch_q21_waiting_supplier",
    "tpch_q22_global_sales_opportunity",
    "outer_order_count_distribution",
    "topn_orders_per_priority",
    "rangejoin_price_bands",
    "parse_lines",
    "window_concat_1s",
    "window_concat_100s",
    "topic_count_10s",
    "trending_10s",
    "channel_mood_sliding_90_60",
    "user_mood_cumulative",
    "toxic_user_cw10",
    # slot 151+: latest green driver row is r14
    "url_canonicalize",
    "url_domain_topk",
    "dedup_url_exact",
    "sample_domain_quota_canonical",
    "retrieval_rrf_fusion",
    "curriculum_quality_phases",
    "dedup_chunks_minhash",
    "warc_parse_records",
    "robots_disallow_audit",
    "toxic_topic_cw25",
    "toxic_channel_cw50",
    "toxic_user_literal_cw10",
    "toxic_channel_literal_cw50",
    "toxic_topic_literal_cw25",
    "user_mood_nlp_cumulative",
    "entity_opinion_30s",
    "category_opinion_cumulative",
    "toxic_user_nlp_cw10",
    "json_field_stats",
    "similarity_topk_ivf_trained",
    "multimodal_resample_pixels",
    "multimodal_frame_decode_sampled",
    "similarity_topk_ivfpq_adc",
    "similarity_topk_ivfpq_refine",
    "multimodal_resize_bilinear",
    "hll_distinct_users",
    "sample_bernoulli_events",
    "sample_stratified_events",
    "cmsketch_heavy_hitters",
    "grouped_mode_event_type",
    "seq_packing_512",
    "repetition_stats",
    "rare_word_stats",
    "multimodal_decode_pixels",
    "sample_weighted_tickets",
    "split_train_valid_test",
    "dedup_tf_cosine",
    "quantile_sketch_value",
    "hll_merge_rollup",
    "tpch_q12_late_shipments",
    "setop_user_cohorts",
    "rollup_event_value",
    "session_agg_30m",
    "asof_purchase_last_view",
    "skew_distinct_users",
    "pivot_event_counts",
    "event_gap_stats",
    "cube_event_value",
    "hist_event_value",
    "decile_user_value",
    # slot 201+: latest green driver row is r15
    "url_registrable_domain",
    "sample_domain_quota_registrable",
    "html_extract_text",
    "warc_parse_gzip",
    "write_training_shards",
    "quality_gate_extracted",
    "html_link_graph",
    "robots_txt_parse",
    "robots_audit_parsed",
    "sitemap_parse",
    "url_frontier",
    "event_session_ids",
    "fullouter_user_activity",
    "user_behavior_features",
    "funnel_view_click_purchase",
    "retention_cohorts",
    "event_transition_matrix",
    "chunk_documents_128_96",
    "multimodal_decode_audio",
    "column_stats_events",
    "weekly_value_wow",
    "multimodal_decode_png",
    "multimodal_decode_gif",
    "multimodal_decode_jpeg",
    "multimodal_decode_video",
    "multimodal_video_index",
    "bpe_word_vocab",
    "fuzzy_name_pairs",
    "lm_bigram_score",
    "bm25_topk",
    "dedup_image_phash",
    "dedup_span_extents",
    "multimodal_embed_topk",
    "dedup_audio_fingerprint",
    "dedup_video_framehash",
    "dedup_multimodal_keep_set",
    "multimodal_quality_gate",
    "dedup_winnowing",
    "similarity_topk_sq8",
    "dedup_span_rewrite",
    "graph_kcore_parts",
    "epoch_shuffle_batches",
    "decontaminate_semantic",
    "kmv_intersection_users",
    "k_anonymity_audit",
    "theilsen_slope_per_user",
    "ewma_user_value",
    "attribution_first_touch",
    "unpivot_user_metrics",
    "rolling_60s_user_stats",
)


def _ordered() -> list[Query]:
    _ensure_loaded()
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:  # a typo here would silently shrink the checked surface
        raise KeyError(f"_PRIORITY names not registered: {missing}")
    prioritized = [REGISTRY[n] for n in _PRIORITY]
    rest = [q for q in REGISTRY.values() if q.name not in set(_PRIORITY)]
    return prioritized + rest


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (side-effect imports)."""
    global _LOADED
    if _LOADED:
        return
    # A broken query module must fail loudly: swallowing ImportError here
    # silently shrinks the driver's checked surface (whole families would
    # vanish from queries()/oracle_sql() with no signal).
    from . import queries_reference  # noqa: F401
    from . import queries_nlp  # noqa: F401
    from . import queries_ext  # noqa: F401
    from . import queries_tpch  # noqa: F401
    from . import queries_relational  # noqa: F401
    from . import queries_mining  # noqa: F401
    _LOADED = True
