#!/usr/bin/env python
"""Per-query CONSTRUCTION cost profile (driver plan-build, guide §7.3).

bench.py's timed region is `qs[name](SPARK, SF).write...save()` — the
DataFrame build (py4j round trips, Catalyst analysis, any eager
localCheckpoint) is inside it, twice per query.  This tool times the
build step alone for every registered query so py4j-heavy builders are
rankable.  NOTE: for queries with eager checkpoints the number includes
the pinned compute — cross-check against the plan before attributing.

Usage: PYTHONPATH=. python tools/construct_profile.py [--top 40] [names...]
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
    ap.add_argument("names", nargs="*")
    ap.add_argument("--top", type=int, default=40)
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
    names = args.names or list(qs)
    # warm-up: JVM + Python worker paths (pin protocol)
    qs["topic_count_10s"](spark, SF).write.mode("overwrite").format("noop").save()
    spark.range(32).repartition(4).mapInPandas(lambda it: it, "id long").write.mode(
        "overwrite"
    ).format("noop").save()

    out = {}
    for n in names:
        t0 = time.perf_counter()
        df = qs[n](spark, SF)
        t1 = time.perf_counter()
        # second build: the bench's best-of-2 pays construction twice
        qs[n](spark, SF)
        t2 = time.perf_counter()
        out[n] = round(min(t1 - t0, t2 - t1), 3)
        del df
    ranked = sorted(out.items(), key=lambda kv: -kv[1])
    for n, t in ranked[: args.top]:
        print(f"{t:8.3f}s  {n}", file=sys.stderr)
    print(json.dumps({"construct_sec": out, "total": round(sum(out.values()), 3)}))


if __name__ == "__main__":
    main()
