#!/usr/bin/env python
"""Box-health probe: the bench's JVM + Python-worker sentinels in a
fresh throwaway session, printed as one JSON line.  Timing sessions are
only comparable when BOTH read clean (jvm <= ~0.3 s, py <= ~1.0 s —
ROUND16.md postmortem); run this before any isolated A/B.

Usage: PYTHONPATH=. python tools/box_probe.py
"""

from __future__ import annotations

import json
import time


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql.functions import xxhash64

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

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

    _psent()  # worker-pool warm-up
    jvm = min(_sent() for _ in range(3))
    py = min(_psent() for _ in range(3))
    print(json.dumps({"jvm": jvm, "py": py, "clean": jvm <= 0.35 and py <= 1.0}))


if __name__ == "__main__":
    main()
