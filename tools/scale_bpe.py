#!/usr/bin/env python
"""Round-13 continuation scale probe: the two BPE-count compositions
(``seq_packing_bpe_512``, ``sample_token_budget_bpe``) at x1 vs x20.

Claims measured (SCALE.md round-13 row):

- each composition shuffles the corpus ONCE (the shard / per-language
  admission window) and that shuffle carries (id, group, n_tokens)
  ints — shuffle bytes must track ROWS, not text bytes;
- the encode stage is bounded by the DISTINCT WORD domain.  The x20
  derivation prefixes every token per replica (``r<k>_``), so distinct
  words grow ~20x here — the WORST case for the dictionary trick
  (real corpora reuse vocabulary across shards, so the domain grows
  sublinearly); even so the encode cost must stay a small constant of
  the total, because the per-word fold runs once per distinct word;
- the driver vocab collect obeys the production caps: record the x20
  distinct-word count, and the capped vocab row count at the
  documented production settings (min_count=2, max_vocab=1_000_000) —
  the hard driver-bytes bound `learn_merges` promises.

Uses the x20 documents derivation of tools/scale_demo.py (generated
here if absent, documents only — this probe doesn't need the
embeddings/events replicas).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_demo import REPLICAS, SRC, build_session, stage_metrics

X20_BASE = "/tmp/sparksent-scale"
SF_DIR_X1 = os.environ.get("SPARKSENT_SF_DIR", SRC)


def ensure_x20_documents(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.isdir(f"{X20_BASE}/documents.parquet"):
        return
    os.makedirs(X20_BASE, exist_ok=True)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n = docs.count()
    parts = []
    for k in range(REPLICAS):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * n))
        if k:
            d = d.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", f"r{k}_$1")
            )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(64).write.mode("overwrite").parquet(
        f"{X20_BASE}/documents.parquet"
    )


def main() -> None:
    from pyspark.sql import functions as F

    from sparksent.ext import bpe
    from sparksent.registry import queries
    from sparksent.tables import load_table

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app_id = spark.sparkContext.applicationId

    ensure_x20_documents(spark)
    qs = queries()
    # warm-up (the bench convention: JVM/codegen paths are not a
    # property of any query)
    qs["seq_packing_512"](spark, SF_DIR_X1).write.mode("overwrite").format(
        "noop"
    ).save()

    report: dict[str, dict] = {}
    for scale, sf_dir in (("x1", SF_DIR_X1), ("x20", X20_BASE)):
        docs = load_table(spark, sf_dir, "documents")
        words = docs.select(
            F.explode(F.split("text", " ")).alias("word")
        ).where(F.col("word") != "")
        stats = {
            "docs": docs.count(),
            "distinct_words": words.select("word").distinct().count(),
            "capped_vocab_rows_minc2_max1m": bpe.word_vocab_capped(
                docs, min_count=2, max_vocab=1_000_000
            ).count(),
        }
        fns = {
            f"seq_packing_bpe_{scale}": lambda d=sf_dir: qs[
                "seq_packing_bpe_512"
            ](spark, d),
            f"token_budget_bpe_{scale}": lambda d=sf_dir: qs[
                "sample_token_budget_bpe"
            ](spark, d),
        }
        sc = spark.sparkContext
        results, group_of = {}, {}
        for name, fn in fns.items():
            sc.setJobGroup(name, name)
            t0 = time.perf_counter()
            df = fn()
            df.write.mode("overwrite").format("noop").save()
            wall = time.perf_counter() - t0
            sc.setJobGroup(f"count_{name}", "row count")
            results[name] = {
                "wall_s": round(wall, 2),
                "rows_out": df.count(),
            }
            group_of[name] = name
            print(f"  {name}: {wall:.1f}s", file=sys.stderr)
        metrics = stage_metrics(port, app_id, group_of)
        for name in fns:
            results[name].update(metrics.get(name, {}))
        report[scale] = {"corpus": stats, "queries": results}

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
