#!/usr/bin/env python
"""bpe_merges in-suite slowdown bisect (round 15, VERDICT r14 ask #5).

The standing observation: isolated warmed reps read ~0.8-1.6 s, but the
reading inside a full bench suite is ~2.9 s, and two hypotheses (JVM
heap pressure, Python GC pressure) were directly refuted in round 14.
This probe splits the query into its FOUR phases and times each before
and after running a configurable prefix of the HEADLINE suite in the
same session:

  1. vocab     — the distributed word-vocab aggregate + driver collect
  2. pyloop    — learn_merges_py, pure driver-side Python
  3. createdf  — spark.createDataFrame(merges, ...) (py4j + parallelize)
  4. action    — the noop materialization of the tiny merges frame

Whichever phase carries the post-prefix delta names the mechanism:
vocab/action => executor- or scheduler-side session state; pyloop =>
driver CPU contention; createdf => py4j gateway / driver JVM latency.

Usage: python tools/bpe_probe.py [K]   (default K=60 suite-prefix queries)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def phases(spark, reps: int = 3) -> dict[str, float]:
    from sparksent.ext import bpe
    from sparksent.tables import load_table

    best = {
        "trivial_job": 9e9,
        "analyze": 9e9,
        "vocab": 9e9,
        "pyloop": 9e9,
        "createdf": 9e9,
        "action": 9e9,
    }
    for _ in range(reps):
        tj = time.perf_counter()
        spark.range(1_000_000).selectExpr("max(id)").collect()
        best["trivial_job"] = min(
            best["trivial_job"], time.perf_counter() - tj
        )
        ta = time.perf_counter()
        docs = load_table(spark, SF, "documents")
        vdf = bpe.word_vocab_capped(docs, "text", 1, None)
        vdf.schema  # force analysis outside the collect timer
        best["analyze"] = min(best["analyze"], time.perf_counter() - ta)
        t0 = time.perf_counter()
        vocab = [(r["word"], r["n"]) for r in vdf.collect()]
        t1 = time.perf_counter()
        vocab.sort()
        merges = bpe.learn_merges_py(vocab, bpe.N_MERGES)
        t2 = time.perf_counter()
        mdf = spark.createDataFrame(
            merges, "step int, left string, right string, pair_count bigint"
        )
        t3 = time.perf_counter()
        mdf.write.mode("overwrite").format("noop").save()
        t4 = time.perf_counter()
        for k, v in (
            ("vocab", t1 - t0),
            ("pyloop", t2 - t1),
            ("createdf", t3 - t2),
            ("action", t4 - t3),
        ):
            best[k] = min(best[k], v)
    return {k: round(v, 3) for k, v in best.items()}


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import bench
    from sparksent.registry import queries

    qs = queries()
    qs["topic_count_10s"](spark, SF).write.mode("overwrite").format("noop").save()
    spark.range(32).repartition(4).mapInPandas(lambda it: it, "id long").write.mode(
        "overwrite"
    ).format("noop").save()

    pre = phases(spark)
    print("pre-prefix :", pre, flush=True)
    t0 = time.perf_counter()
    for name in bench.HEADLINE[:k]:
        qs[name](spark, SF).write.mode("overwrite").format("noop").save()
    print(f"prefix     : {k} queries in {time.perf_counter() - t0:.0f}s", flush=True)
    post = phases(spark)
    print("post-prefix:", post, flush=True)
    delta = {p: round(post[p] - pre[p], 3) for p in pre}
    print("delta      :", delta, flush=True)


if __name__ == "__main__":
    main()
