#!/usr/bin/env python
"""A/B for VERDICT r16 ask #4: per-round pin of the k-core peel's keep
frame (the degree aggregate is referenced by BOTH endpoint joins, so
its union-scan + Exchange + HashAggregate subtree runs twice per round
at HEAD).  Variants, alternated in one session to cancel box drift:

  head     — peel_round as committed (duplicate degree subtree)
  pin      — keep localCheckpoint-pinned eagerly per round (one extra
             job per round, degree aggregate once)
  lazypin  — keep localCheckpoint(eager=False) (no extra job; first
             consumer materializes, second reads blocks)

Usage: PYTHONPATH=. python tools/ab_kcore.py [reps]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def peel(e: DataFrame, k: int, mode: str) -> DataFrame:
    deg = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    keep = deg.filter(F.col("deg") >= k).select("node")
    if mode == "pin":
        from sparksent.tables import pinned

        keep = pinned(keep)
    elif mode == "lazypin":
        keep = keep.localCheckpoint(eager=False)
    return (
        e.join(keep.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
        .join(keep.withColumnRenamed("node", "dst").hint("shuffle_hash"), "dst")
        .select("src", "dst")
    )


def kcore(edges: DataFrame, mode: str, k: int = 2, rounds: int = 10) -> DataFrame:
    e = edges.select("src", "dst").localCheckpoint()
    prev = e.count()
    for _ in range(rounds):
        e = peel(e, k, mode).localCheckpoint(eager=False)
        n = e.count()
        if n == prev:
            break
        prev = n
    return (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("core_deg"))
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from sparksent import tables

    SF = "/root/testdata/sf0.1"
    li = tables.load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    pairs = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= 2)
        .select("src", "dst")
    )
    pairs.count()  # warm
    res: dict[str, list[float]] = {"head": [], "pin": [], "lazypin": []}
    checks: dict[str, int] = {}
    for _ in range(reps):
        for mode in ("head", "pin", "lazypin"):
            t0 = time.perf_counter()
            out = kcore(pairs, mode)
            out.write.mode("overwrite").format("noop").save()
            res[mode].append(round(time.perf_counter() - t0, 3))
    # result equivalence across modes (cheap invariant: row count + deg sum)
    for mode in ("head", "pin", "lazypin"):
        r = kcore(pairs, mode).agg(
            F.count("*"), F.sum("core_deg"), F.sum("node")
        ).collect()[0]
        checks[mode] = (r[0], r[1], r[2])
    print(json.dumps({"timings": res, "checks": {m: list(v) for m, v in checks.items()}}))


if __name__ == "__main__":
    main()
