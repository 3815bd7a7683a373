#!/usr/bin/env python
"""x40 scale push (VERDICT r7 ask #8): documents + embeddings at FORTY
replicas of sf0.1 (2x the standing x20 corpus) for the three heaviest
bounded designs — semdedup_embeddings, dedup_prefix_filter,
dedup_cdc_chunks — recording wall, shuffle bytes, and skew so SCALE.md
can state whether shuffle keeps tracking candidate pairs (linear-ish)
rather than corpus^2 as the corpus doubles again.

Derivation rules are scale_demo's (linearity tricks unchanged):
- documents: replica k>0 prefixes every token with r<k>_ — within-
  replica near-dup structure repeats exactly, cross-replica shingle
  sets are disjoint, so true pairs scale LINEARLY in replicas.
- embeddings: replica k>0 multiplies elementwise by a deterministic
  +-1 sign pattern — within-replica cosines preserved exactly, cross-
  replica similarities decorrelate to ~0.

Usage: python tools/scale_x40.py [--base /tmp/sparksent-scale40]
                                 [--replicas 40] [--skip-generate]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_demo import SRC, build_session, stage_metrics

TARGETS = ("semdedup_embeddings", "dedup_prefix_filter", "dedup_cdc_chunks")
# semdedup runs via the LIBRARY entry point (k=None self-scaling): the
# registered query routes through semdedup_k_oracle_checked, which
# refuses corpora past the oracle branch ceiling — the scale corpus has
# no oracle, so the library path is the production-faithful one.


def generate(spark, base: str, replicas: int) -> None:
    from pyspark.sql import functions as F

    from sparksent.ext.similarity import _plane

    os.makedirs(base, exist_ok=True)

    def replicate(df, offsets, transform):
        parts = []
        for k in range(replicas):
            d = df
            for col, off in offsets.items():
                d = d.withColumn(col, F.col(col) + F.lit(k * off))
            if k:
                d = transform(d, k)
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    replicate(
        docs,
        {"doc_id": docs.count()},
        lambda d, k: d.withColumn(
            "text", F.regexp_replace("text", r"(\S+)", f"r{k}_$1")
        ),
    ).repartition(64).write.mode("overwrite").parquet(f"{base}/documents.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")

    def decorrelate(e, k):
        signs = F.array(*[F.lit(float(s)) for s in _plane(10_000 + k)])
        return e.withColumn(
            "embedding",
            F.zip_with("embedding", signs, lambda x, s: (x * s).cast("float")),
        )

    replicate(emb, {"vec_id": emb.count()}, decorrelate).repartition(
        64
    ).write.mode("overwrite").parquet(f"{base}/embeddings.parquet")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/tmp/sparksent-scale40")
    ap.add_argument("--replicas", type=int, default=40)
    ap.add_argument("--skip-generate", action="store_true")
    args = ap.parse_args()

    spark = build_session()
    sc = spark.sparkContext
    port = int(sc.uiWebUrl.rsplit(":", 1)[1]) if sc.uiWebUrl else 4050
    app_id = sc.applicationId

    if not args.skip_generate:
        t0 = time.perf_counter()
        generate(spark, args.base, args.replicas)
        print(f"generate: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    from sparksent.registry import queries

    qs = queries()

    def semdedup_scale(spark_, sf_dir):
        from sparksent.ext.similarity import semdedup_keep_flags
        from sparksent.tables import load_table

        return semdedup_keep_flags(load_table(spark_, sf_dir, "embeddings"))

    fns = {**{n: qs[n] for n in TARGETS}, "semdedup_embeddings": semdedup_scale}
    # warm-up the python worker pool + codegen
    qs["text_stats"](spark, args.base).write.mode("overwrite").format("noop").save()

    results, group_of = {}, {}
    for name in TARGETS:
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        df = fns[name](spark, args.base)
        df.write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup("count_" + name, "row count")
        n_out = df.count()
        results[name] = {"wall_s": round(wall, 2), "rows_out": n_out}
        group_of[name] = name
        print(f"  {name}: {wall:.1f}s, {n_out} rows", file=sys.stderr)

    metrics = stage_metrics(port, app_id, group_of)
    report = {
        "replicas": args.replicas,
        "base": args.base,
        "rows": {
            t: spark.read.parquet(f"{args.base}/{t}.parquet").count()
            for t in ("documents", "embeddings")
        },
        "queries": {n: {**results[n], **metrics.get(n, {})} for n in TARGETS},
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
