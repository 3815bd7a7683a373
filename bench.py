#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <sf>}

Each query materializes fully via the noop sink (no driver-side
collection, all columns computed). Times are wall-clock per query after
a shared session warm-up.
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
    "text_stats",
    "text_fingerprint",
    "json_field_stats",
    "multimodal_features",
    "multimodal_image_headers",
    "doc_sentiment_mllib",
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "tpch_q5_regional",
    "tpch_q6_forecast",
    "tpch_q10_returns",
    "tpch_q17_small_quantity",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive",
    "semi_late_orders",
    "outer_order_count_distribution",
    "rangejoin_price_bands",
    "session_agg_30m",
    "asof_purchase_last_view",
    "event_gap_stats",
    "cube_event_value",
    "hist_event_value",
    "decile_user_value",
    "event_session_ids",
    "cmsketch_heavy_hitters",
    "text_normalize",
    "hll_distinct_users",
    "sample_stratified_events",
    "embedding_centroids",
    "embedding_quantize_error",
    "grouped_mode_event_type",
    "text_bigram_lift",
]


def main() -> None:
    from sparksent.session import get_spark
    from sparksent.registry import queries

    spark = get_spark("sparksent-bench")
    qs = queries()
    # warm-up: JVM/codegen/file-listing paths, plus the Python worker
    # pool (reused across queries; its one-time spawn cost is not a
    # property of any query)
    qs["topic_count_10s"](spark, SF_DIR).write.mode("overwrite").format("noop").save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"  {name}: {timings[name]:.2f}s", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "sparksent headline suite wall-clock",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
