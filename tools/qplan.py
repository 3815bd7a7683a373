#!/usr/bin/env python
"""Round-16 optimization workbench: isolated warmed best-of-N timing +
``explain("formatted")`` capture for named registry queries.

Writes ``plans/<round>/<name>_<tag>.txt`` (default r17) (tag = before/after/...) and
prints one JSON line of timings — the per-query evidence the
optimization round commits alongside each change (guide §1.4/§7.2:
noop-sink timing, formatted plans).

Usage: PYTHONPATH=. python tools/qplan.py --tag before <name> [...]
       [--reps 2] [--no-plan]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--round", default="r17", help="plans/<round> output dir")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from sparksent.registry import queries

    qs = queries()
    # standard warm-up (pin protocol): JVM + Python worker paths
    qs["topic_count_10s"](spark, SF).write.mode("overwrite").format("noop").save()
    spark.range(32).repartition(4).mapInPandas(lambda it: it, "id long").write.mode(
        "overwrite"
    ).format("noop").save()

    # box-health sentinels (bench.py's pre-suite probe): the box
    # oscillates between clean and ~2x-degraded phases on ~15-min
    # cycles (ROUND16.md postmortem) — a measurement session is only
    # comparable to another if BOTH probed clean (jvm <= ~0.3 s,
    # py <= ~1.0 s).
    from pyspark.sql.functions import xxhash64

    def _sent() -> float:
        t0 = time.perf_counter()
        (spark.range(256_000_000).select(xxhash64("id").alias("h"))
         .agg({"h": "max"}).collect())
        return round(time.perf_counter() - t0, 3)

    def _psent() -> float:
        t0 = time.perf_counter()
        (spark.range(1_000_000).repartition(32)
         .mapInPandas(lambda it: it, "id long")
         .write.mode("overwrite").format("noop").save())
        return round(time.perf_counter() - t0, 3)

    sent = min(_sent() for _ in range(3))
    psent = min(_psent() for _ in range(3))
    print(f"  [sentinel] jvm {sent:.3f} py {psent:.3f}", file=sys.stderr)

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.round)
    os.makedirs(plans_dir, exist_ok=True)
    out = {}
    for n in args.names:
        df = qs[n](spark, SF)
        if not args.no_plan:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{n}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        best = float("inf")
        ts = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"qplan:{n}")
            t0 = time.perf_counter()
            qs[n](spark, SF).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            ts.append(round(dt, 3))
            best = min(best, dt)
        out[n] = {"best": round(best, 3), "reps": ts}
        print(f"  {n}: {out[n]}", file=sys.stderr)
    out["_sentinel"] = {"jvm": sent, "py": psent,
                        "post_jvm": min(_sent() for _ in range(3)),
                        "post_py": min(_psent() for _ in range(3))}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
