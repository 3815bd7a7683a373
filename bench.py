#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <sf>}

Each query materializes fully via the noop sink (no driver-side
collection, all columns computed).

Stdout shape (round-17 revision, VERDICT r16 ask #1): stdout carries
EXACTLY ONE JSON line, printed last.  The driver records a 2000-char
merged stdout+stderr tail and parses the last JSON line in it; the
250-name per-query map (~6 KB serialized) can never fit that tail
(r01-r02, with <= 50 queries, are the only BENCH artifacts whose
"parsed" has "queries" — from r03 the map line was truncated from the
left and the parse yielded {}).  So the "queries" map is inlined in
the stdout line ONLY when the whole line still fits comfortably inside
the tail (_STDOUT_BUDGET); otherwise the line carries n_queries + a
"queries_artifact" pointer, and the full map goes to stderr and to
BENCH_FULL_r<k>.json (committed every round).  No number is dropped:
per-query history lives in the BENCH_FULL artifacts either way.

Methodology (round-3 revision, after the r02 regression diagnosis):
- Per-query time is the BEST OF 2 full materializations after a shared
  session warm-up. The box this runs on shows 2-3x wall-clock variance
  on multi-second queries across fresh sessions with identical code and
  plans (r02 postmortem: dedup_minhash_lsh timed 4.0s and 9.6s cold on
  the same commit, isolated; dedup_exact — a single unchanged
  hash-aggregate — "doubled"). Min-of-2 measures the plan, not the
  neighbor's GC pause; both runs do all the work.
- A box-degradation SENTINEL (round 13): a constant-plan,
  data-independent query timed best-of-3 before and after the suite,
  recorded as sentinel_pre_sec / sentinel_post_sec in every artifact.
  Drift triage order: if post/pre >> 1, suspect the box before any
  query's plan — the watch-item protocol (isolated best-of-3 vs
  BASELINE_BENCH pin) now starts by reading these two fields.
- MID-SUITE sentinel samples + per-query start timestamps (round 14,
  after the r13 finding that two same-round full suites disagreed up to
  8x per query with clean pre/post sentinels BOTH times — endpoint
  probes cannot see a degradation window in the middle). Every ~25
  queries the sentinel runs once more; each sample is recorded with its
  position and wall-clock in "sentinel_samples", and every query's
  start epoch lands in "query_starts", so an elevated reading is now
  attributable to a TIME SPAN of named queries instead of argued.
- A second, PYTHON-WORKER sentinel (py_sentinel_*): the JVM sentinel
  never touches Python workers, so a degraded reused-daemon pool is a
  blind spot it cannot see — the one degradation mode consistent with
  r13's "Arrow-heavy queries elevated, JVM sentinel clean both times".
  The py sentinel is a constant-plan 1M-row trivial mapInPandas whose
  time measures worker-pool + Arrow-path health; it runs pre/post
  (best-of-3) and inside every mid-suite sample (single-rep).
- A "micro" block times the ranks machinery (with_group_ranks /
  with_group_prefix_sums over a synthetic constant-plan frame) so the
  mechanism's own cost is tracked directly rather than folded into
  each consumer query's pin (ADVICE r13).
- Two tiers. HEADLINE is plan-shaped engine queries only — its sum is
  the reported "value" and the regression-gate metric. CAPABILITY holds
  queries whose cost is a documented Python/ML constant (applyInPandas
  escape-hatch proof, in-query LBFGS training); they are still timed
  and reported under "queries" (so per-query history tracks them) but
  excluded from the headline sum, so the gate tracks engine
  regressions, not training constants.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Representative slice of the registry: every operator family, weighted
# toward the heavy shapes (window aggs, LSH joins, top-k, TPC-H joins).
HEADLINE = [
    "window_concat_1s",
    "topic_count_10s",
    "trending_10s",
    "channel_mood_sliding_90_60",
    "user_mood_cumulative",
    "toxic_user_cw10",
    "toxic_user_literal_cw10",
    "doc_sentiment",
    "doc_entities",
    "user_mood_nlp_cumulative",
    "toxic_user_nlp_cw10",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "similarity_topk_brute",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "similarity_topk_multiprobe",
    "graph_triangle_counts",
    "text_stats",
    "text_fingerprint",
    "json_field_stats",
    "multimodal_features",
    "multimodal_image_headers",
    "multimodal_resize_plan",
    "multimodal_frame_sample",
    "tpch_q1_pricing",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping",
    "tpch_q4_priority_check",
    "tpch_q5_regional",
    "tpch_q6_forecast",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returns",
    "tpch_q11_important_stock",
    "tpch_q12_late_shipments",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive",
    "tpch_q20_excess_suppliers",
    "tpch_q21_waiting_supplier",
    "tpch_q22_global_sales_opportunity",
    "semi_late_orders",
    "outer_order_count_distribution",
    "fullouter_user_activity",
    "rollup_event_value",
    "topn_orders_per_priority",
    "rangejoin_price_bands",
    "session_agg_30m",
    "asof_purchase_last_view",
    "skew_distinct_users",
    "percentile_order_value",
    "pivot_event_counts",
    "event_gap_stats",
    "cube_event_value",
    "hist_event_value",
    "decile_user_value",
    "event_session_ids",
    "cmsketch_heavy_hitters",
    "seq_packing_512",
    "seq_packing_bpe_512",
    "sample_token_budget_bpe",
    "quality_gate_per_lang_head",
    "quality_tiers_per_lang",
    "dedup_cluster_sizes",
    "dedup_chunks_exact",
    "bpe_fertility_per_lang",
    "packing_efficiency_bpe_512",
    "decontaminate_5gram",
    "repetition_stats",
    "rare_word_stats",
    "text_normalize",
    "pii_redaction",
    "boilerplate_removal",
    "lang_id_confusion",
    "sample_weighted_tickets",
    "split_train_valid_test",
    "anomaly_robust_events",
    "dedup_ngram_containment",
    "bloom_semijoin_customers",
    "quantile_sketch_value",
    "hll_merge_rollup",
    "user_behavior_features",
    "hll_distinct_users",
    "sample_stratified_events",
    "embedding_centroids",
    "embedding_quantize_error",
    "text_bigram_lift",
    # round-4 additions
    "multimodal_decode_pixels",
    "dedup_tf_cosine",
    "funnel_view_click_purchase",
    "retention_cohorts",
    "event_transition_matrix",
    "chunk_documents_128_96",
    "multimodal_decode_audio",
    "column_stats_events",
    "weekly_value_wow",
    # round-5 additions
    "multimodal_decode_png",
    "multimodal_decode_gif",
    "multimodal_decode_jpeg",
    "multimodal_decode_video",
    "multimodal_video_index",
    "bpe_word_vocab",
    "fuzzy_name_pairs",
    "lm_bigram_score",
    "bm25_topk",
    "ewma_user_value",
    "attribution_first_touch",
    "winsorize_event_value",
    "unpivot_user_metrics",
    "rolling_60s_user_stats",
    # round-5 second wave
    "kmeans_embeddings_2iter",
    "pagerank_word_graph",
    "mix_langs_temperature",
    "scd2_user_event_type",
    "trend_slope_per_user",
    "acf_daily_value_lag7",
    "dedup_prefix_filter",
    # round-5 fourth wave
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
    "entity_resolution_parts",
    "churn_training_set",
    "item_similarity_jaccard",
    "dedup_exact_normalized",
    "supplier_lead_time",
    "survival_km_error",
    "backtest_seasonal_naive",
    # round-6 additions: registry names that previously had no bench
    # pin (a regression there was invisible to the BENCH gate) — the
    # headline tier covers the registry minus the 3 capability-tier
    # queries.
    "parse_lines",
    "window_concat_100s",
    "toxic_topic_cw25",
    "toxic_topic_literal_cw25",
    "toxic_channel_cw50",
    "toxic_channel_literal_cw50",
    "category_opinion_cumulative",
    "entity_opinion_30s",
    "doc_categories",
    "anti_customers_no_orders",
    "setop_user_cohorts",
    "sample_bernoulli_events",
    "text_distinctive_terms",
    "tpch_q7_nation_trade",
    "tpch_q14_promo",
    "tpch_q16_supplier_cnt",
    "dedup_components",
    "dedup_keep_set",
    "corpus_curation_pipeline",
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
    # round-8 additions
    "session_concurrency_capped",
    "dedup_span_8gram",
    "dsir_importance_weights",
    "sample_cluster_balanced",
    # round-9 additions
    "similarity_topk_ivf_trained",
    "multimodal_resample_pixels",
    "multimodal_frame_decode_sampled",
    "similarity_topk_ivfpq_adc",
    "similarity_topk_ivfpq_refine",
    "multimodal_resize_bilinear",
    # round-10 additions (pinned round 11)
    "dedup_image_phash",
    "dedup_span_extents",
    # round-11 additions
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
    # round-12 additions
    "sample_domain_quota",
    # round-14 additions
    "url_canonicalize",
    "url_domain_topk",
    "dedup_url_exact",
    "sample_domain_quota_canonical",
    "retrieval_rrf_fusion",
    "curriculum_quality_phases",
    "dedup_chunks_minhash",
    "warc_parse_records",
    "robots_disallow_audit",
    # round-15 additions
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
    # round-16 additions
    "http_parse_response",
    "charset_quality_gate",
    "web_pipeline_warc_to_shards",
    "unigram_seed_vocab",
    "unigram_encode_viterbi",
    "unigram_em_reestimate",
    "frontier_politeness",
    # round-16 second wave
    "crawl_snapshot_delta",
    "host_pagerank",
    "wordpiece_vocab",
    "wordpiece_encode",
    "quality_probe_train",
    "quality_probe_score",
    "kn_trigram_perplexity",
    "frontier_authority",
    # round-16 third wave
    "host_hits",
    "anchor_text_index",
    "tokenizer_fertility_compare",
    "bitext_mine_margin",
    "domain_reweight_excess_loss",
]

# Timed and reported, but excluded from the headline sum: cost dominated
# by a documented non-engine constant (see module docstring).
CAPABILITY = [
    "grouped_mode_event_type",  # deliberate applyInPandas escape-hatch proof
    "doc_sentiment_mllib",  # in-query LBFGS training (maxIter=16)
    "bpe_merges",  # driver-side merge loop over the collected vocab
]


def _run(qs, name: str) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        qs[name](SPARK, SF_DIR).write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


SENTINEL_EVERY = 25  # queries between mid-suite sentinel samples


def _sentinel_once() -> float:
    """One sentinel repetition — the mid-suite probe.  Single-rep by
    design: interleaved samples exist to LOCALIZE a degradation window,
    and averaging across it would blur exactly the signal we want."""
    t0 = time.perf_counter()
    (
        SPARK.range(256_000_000)
        .select(F_xxhash64("id").alias("h"))
        .agg({"h": "max"})
        .collect()
    )
    return round(time.perf_counter() - t0, 3)


def _py_sentinel_once() -> float:
    """PYTHON-WORKER sentinel (round 14).  The JVM sentinel above never
    touches Python workers, so a degraded reused-daemon pool (grown
    RSS, fragmented heaps after ~200 Arrow-heavy queries) is invisible
    to it — the exact blind spot consistent with r13's 'Arrow-heavy
    queries elevated, JVM sentinel clean both times' driver artifact.
    This probe is constant-plan Arrow round-trip work: 1M rows through
    a trivial mapInPandas over 32 partitions — no file reads, no real
    computation, so its time measures worker-pool + Arrow-path health."""
    t0 = time.perf_counter()
    (
        SPARK.range(1_000_000)
        .repartition(32)
        .mapInPandas(lambda it: it, "id long")
        .write.mode("overwrite")
        .format("noop")
        .save()
    )
    return round(time.perf_counter() - t0, 3)


def _py_sentinel() -> float:
    return round(min(_py_sentinel_once() for _ in range(3)), 3)


def _micro_ranks() -> dict[str, float]:
    """Mechanism micro-benchmark (ADVICE r13): the ranks machinery's
    own cost over a synthetic constant-plan frame — 2M rows, 8 groups
    — so drift in with_group_ranks / with_group_prefix_sums shows up
    here directly instead of only inside each consumer's pin."""
    from pyspark.sql import functions as F

    from sparksent.ext.ranks import with_group_prefix_sums, with_group_ranks

    base = SPARK.range(2_000_000).select(
        F.col("id"),
        (F.col("id") % 8).cast("string").alias("g"),
        (F_xxhash64("id") % 1000).alias("v"),
    )
    out: dict[str, float] = {}
    for key, fn in (
        ("ranks_group_ranks_sec",
         lambda: with_group_ranks(base, ["g"], ["v", "id"])),
        ("ranks_prefix_sums_sec",
         lambda: with_group_prefix_sums(base, ["g"], ["v", "id"], "v", "ps")),
    ):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn().write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        out[key] = round(best, 3)
    return out


def _sentinel() -> float:
    """Box-degradation sentinel (VERDICT r12 ask #3): a constant-plan,
    data-independent CPU burn — 256M xxhash64 rows through one map-side
    aggregate, no file reads, no Python workers.  Timed before AND
    after the suite; a post/pre ratio well above 1 is machine evidence
    the BOX degraded during the run (GC pressure, noisy neighbor),
    so a 'queries regressed late in the suite' artifact is
    self-identifying instead of argued in ROUND*.md prose.  Best-of-3
    for the same reason per-query times are best-of-2: measure the
    machine's capability, not one scheduling hiccup."""
    # max, not sum: ANSI mode aborts a 64M-row BIGINT hash sum on
    # overflow; max forces the identical per-row hash work (inside
    # _sentinel_once, shared with the mid-suite samples).
    return round(min(_sentinel_once() for _ in range(3)), 3)


def main() -> None:
    global SPARK, F_xxhash64
    from pyspark.sql.functions import xxhash64 as F_xxhash64

    from sparksent.session import get_spark
    from sparksent.registry import queries

    SPARK = get_spark("sparksent-bench")
    qs = queries()
    # warm-up: JVM/codegen/file-listing paths, plus the Python worker
    # pool (reused across queries; its one-time spawn cost is not a
    # property of any query)
    qs["topic_count_10s"](SPARK, SF_DIR).write.mode("overwrite").format("noop").save()
    SPARK.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()

    sentinel_pre = _sentinel()
    py_sentinel_pre = _py_sentinel()
    print(
        f"  [sentinel pre-suite]: jvm {sentinel_pre:.2f}s"
        f" py {py_sentinel_pre:.2f}s",
        file=sys.stderr,
    )
    suite_start = round(time.time(), 3)

    timings: dict[str, float] = {}
    query_starts: dict[str, float] = {}
    sentinel_samples: list[dict] = []
    for i, name in enumerate(HEADLINE + CAPABILITY):
        query_starts[name] = round(time.time(), 3)
        timings[name] = _run(qs, name)
        print(f"  {name}: {timings[name]:.2f}s", file=sys.stderr)
        if (i + 1) % SENTINEL_EVERY == 0:
            s = _sentinel_once()
            ps = _py_sentinel_once()
            sentinel_samples.append(
                {"after_n": i + 1, "after": name, "t": round(time.time(), 3),
                 "sec": s, "py_sec": ps}
            )
            print(f"  [sentinel @{i + 1} after {name}]: jvm {s:.2f}s"
                  f" py {ps:.2f}s",
                  file=sys.stderr)

    sentinel_post = _sentinel()
    py_sentinel_post = _py_sentinel()
    print(
        f"  [sentinel post-suite]: jvm {sentinel_post:.2f}s"
        f" py {py_sentinel_post:.2f}s",
        file=sys.stderr,
    )
    micro = _micro_ranks()
    print(f"  [micro] {micro}", file=sys.stderr)

    headline_total = sum(timings[n] for n in HEADLINE)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    vs = None
    try:
        with open(os.path.join(os.path.dirname(__file__), "BASELINE_BENCH.json")) as f:
            base = json.load(f)
        if float(base.get("sf", -1)) == float(sf):
            pinned = {n: t for n, t in base["queries"].items() if n in HEADLINE}
            ours = sum(timings[n] for n in pinned)
            vs = round(ours / sum(pinned.values()), 3) if pinned else None
    except (OSError, ValueError, KeyError, ZeroDivisionError):
        pass
    # Full per-query map: ALWAYS on stderr (human record in the driver's
    # merged tail window) and in the BENCH_FULL artifact below — never a
    # second stdout JSON line (module docstring, round-17 revision).
    print(json.dumps({"queries": timings}), file=sys.stderr)
    # Persistent full-suite artifact (VERDICT r6 ask #7 / r7 ask #5):
    # the driver's stdout capture keeps only a ~2000-char tail, which
    # truncates the per-query map — so the complete name -> best-of-2
    # seconds table is ALSO written to BENCH_FULL_r<k>.json in the repo
    # root, where <k> is the current round (max recorded BENCH round
    # + 1, or $SPARK_GRAFT_ROUND).  The inference is correct for every
    # in-round run because the driver records BENCH_r<k>.json only at
    # round END; a manual re-run AFTER that record exists is round-k+1
    # context by definition — to re-pin late inside a round anyway, set
    # SPARK_GRAFT_ROUND explicitly.  tools/bench_diff.py compares two
    # such artifacts (or one vs BASELINE_BENCH.json).
    here = os.path.dirname(os.path.abspath(__file__))
    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    if rnd is None:
        import glob as _glob
        import re as _re

        rounds = [
            int(m.group(1))
            for p in _glob.glob(os.path.join(here, "BENCH_r*.json"))
            if (m := _re.search(r"BENCH_r(\d+)\.json$", p))
        ]
        rnd = str(max(rounds, default=0) + 1)
    full_path = os.path.join(here, f"BENCH_FULL_r{int(rnd):02d}.json")
    with open(full_path, "w") as f:
        json.dump(
            {
                "metric": "per-query best-of-2 wall clock, full suite",
                "unit": "sec",
                "sf": float(sf),
                "headline_total": round(headline_total, 3),
                "n_headline": len(HEADLINE),
                "capability_tier": CAPABILITY,
                "sentinel_pre_sec": sentinel_pre,
                "sentinel_post_sec": sentinel_post,
                "py_sentinel_pre_sec": py_sentinel_pre,
                "py_sentinel_post_sec": py_sentinel_post,
                "sentinel_samples": sentinel_samples,
                "suite_start_epoch": suite_start,
                "query_starts": query_starts,
                "micro": micro,
                "queries": timings,
            },
            f,
            indent=1,
        )
    print(f"full per-query artifact: {full_path}", file=sys.stderr)
    # THE one stdout JSON line, printed last so the driver's tail parse
    # always lands on it.
    print(
        _stdout_line(
            timings,
            headline_total,
            float(sf),
            vs,
            sentinel_pre,
            sentinel_post,
            os.path.basename(full_path),
        )
    )


# Budget for the single stdout line: the driver keeps a 2000-char merged
# stdout+stderr tail, and the stderr lines printed after the suite
# (post-sentinel, micro, artifact path: ~250 chars) share it.
_STDOUT_BUDGET = 1700


def _stdout_line(
    timings: dict[str, float],
    headline_total: float,
    sf: float,
    vs: float | None,
    sentinel_pre: float,
    sentinel_post: float,
    artifact: str,
) -> str:
    """The single stdout JSON line (module docstring, round-17 revision).

    Self-describing (metric/value/unit/sf) for a last-line JSON parse;
    includes the full "queries" map inline only when the whole line
    still fits the driver's tail window, else points at the BENCH_FULL
    artifact that carries it.
    """
    record = {
        "metric": "headline_total",
        "value": round(headline_total, 3),
        "unit": "sec",
        "sf": sf,
        "n_queries": len([n for n in timings if n in set(HEADLINE)]),
        "vs_baseline_common_queries": vs,
        "sentinel_pre_sec": sentinel_pre,
        "sentinel_post_sec": sentinel_post,
        "queries": timings,
    }
    line = json.dumps(record)
    if len(line) <= _STDOUT_BUDGET:
        return line
    del record["queries"]
    record["queries_artifact"] = artifact
    return json.dumps(record)


if __name__ == "__main__":
    main()
