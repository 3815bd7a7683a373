#!/usr/bin/env python
"""Round-14 scale probes: the IVF-PQ refinement cascade (the one ANN
family without a x20 SCALE.md row — VERDICT r13 ask #2) and the four
round-13 report-layer registrations that shipped without rows (ask #8:
dedup_cluster_sizes, bpe_fertility_per_lang, packing_efficiency_bpe_512,
dedup_chunks_exact).

Claims measured (SCALE.md):

- ivfpq_refine: the at-rest search index is codes, not vectors — the
  ADC stage's shuffle carries (query_id, sub, cent, d) ints and the
  refine stage fetches raw vectors for a BOUNDED n_queries x refine
  set only (eager-localCheckpointed candidate frame, round-14 fix), so
  shuffle volume must stay signature-sized while input grows 20x; the
  centroid count self-scales via n_centroids_for, keeping per-cell
  occupancy constant.
- dedup_cluster_sizes: the report is a two-level count over the CC
  output — cost tracks the underlying components, shuffle carries
  (root, size) pairs only.
- bpe_fertility_per_lang / packing_efficiency_bpe_512: per-lang /
  per-bin aggregates over the BPE encode output; the encode engine is
  the constant-plan-depth nested fold, so x20 cost is the linear token
  volume, not plan growth.
- dedup_chunks_exact: scan-side chunk expansion, keep-first window on
  the 60-bit chunk hash — shuffle carries ids+offsets+8-byte hashes,
  never text.

Reuses the x20 derivations of tools/scale_demo.py (documents: per-
replica token prefixes keep true-pair growth linear; embeddings:
deterministic sign-decorrelation preserves within-replica cosines).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_bpe import SF_DIR_X1, X20_BASE, ensure_x20_documents
from tools.scale_demo import REPLICAS, SRC, build_session, stage_metrics

QUERIES = (
    "similarity_topk_ivfpq_refine",
    "dedup_cluster_sizes",
    "bpe_fertility_per_lang",
    "packing_efficiency_bpe_512",
    "dedup_chunks_exact",
    # round-14 registrations (second wave): the URL family, the
    # canonical-host quota composition, hybrid retrieval, curriculum
    "url_canonicalize",
    "url_domain_topk",
    "dedup_url_exact",
    "sample_domain_quota_canonical",
    "retrieval_rrf_fusion",
    "curriculum_quality_phases",
    "dedup_chunks_minhash",
    "warc_parse_records",
    "robots_disallow_audit",
)


def _ivfpq_refine(spark, sf_dir):
    """The ivfpq cascade on the SELF-SCALING centroid path
    (n_centroids=None -> n_centroids_for(count)): the registered query
    pins n_centroids to the pre-generated DuckDB oracle branches,
    whose ceiling (12 cells / 36,864 vectors) is an oracle-
    PREGENERATION constraint, not an engine one — at x20 (40k vectors)
    the engine's own rule resolves to 13 cells and that is the plan
    whose scale behavior this row measures."""
    from pyspark.sql import functions as F

    from sparksent.ext import similarity
    from sparksent.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ivfpq_refine_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5
    )


def ensure_x20_embeddings(spark) -> None:
    from pyspark.sql import functions as F

    from sparksent.ext.similarity import _plane

    if os.path.isdir(f"{X20_BASE}/embeddings.parquet"):
        return
    os.makedirs(X20_BASE, exist_ok=True)
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    n = emb.count()
    parts = []
    for k in range(REPLICAS):
        d = emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * n))
        if k:
            signs = F.array(*[F.lit(float(s)) for s in _plane(10_000 + k)])
            d = d.withColumn(
                "embedding",
                F.zip_with("embedding", signs, lambda x, s: (x * s).cast("float")),
            )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(64).write.mode("overwrite").parquet(
        f"{X20_BASE}/embeddings.parquet"
    )


def main() -> None:
    from sparksent.registry import queries

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app_id = spark.sparkContext.applicationId
    ensure_x20_documents(spark)
    ensure_x20_embeddings(spark)
    qs = queries()
    # warm-up (bench convention)
    qs["seq_packing_512"](spark, SF_DIR_X1).write.mode("overwrite").format(
        "noop"
    ).save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()

    report: dict[str, dict] = {}
    sc = spark.sparkContext
    for scale, sf_dir in (("x1", SF_DIR_X1), ("x20", X20_BASE)):
        results, group_of = {}, {}
        for qname in QUERIES:
            name = f"{qname}_{scale}"
            sc.setJobGroup(name, name)
            t0 = time.perf_counter()
            if qname == "similarity_topk_ivfpq_refine":
                df = _ivfpq_refine(spark, sf_dir)
            else:
                df = qs[qname](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            wall = time.perf_counter() - t0
            sc.setJobGroup(f"count_{name}", "row count")
            results[name] = {"wall_s": round(wall, 2), "rows_out": df.count()}
            group_of[name] = name
            print(f"  {name}: {wall:.1f}s", file=sys.stderr)
        metrics = stage_metrics(port, app_id, group_of)
        for name in results:
            results[name].update(metrics.get(name, {}))
        report[scale] = results
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
