#!/usr/bin/env python
"""Stage-timeline profile for one registry query (watch-item protocol,
VERDICT r16 ask #3): run the query ``--reps`` times in one session and
print, per rep, the wall plus every stage's duration/shuffle bytes from
the UI REST API — so cross-session variance can be attributed to a
named stage family instead of argued.

Usage: PYTHONPATH=. python tools/profile_query.py <name> [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
UI_PORT = int(os.environ.get("SPILL_AUDIT_UI_PORT", "4049"))


def _stages(app_id: str) -> list[dict]:
    url = (
        f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}"
        "/stages?status=complete&withSummaries=false"
    )
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    from pyspark.sql import SparkSession
    from pyspark.sql.functions import xxhash64

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    from sparksent.registry import queries

    qs = queries()
    qs["topic_count_10s"](spark, SF).write.mode("overwrite").format("noop").save()
    spark.range(32).repartition(4).mapInPandas(lambda it: it, "id long").write.mode(
        "overwrite"
    ).format("noop").save()

    def _sent() -> float:
        t0 = time.perf_counter()
        (spark.range(256_000_000).select(xxhash64("id").alias("h"))
         .agg({"h": "max"}).collect())
        return round(time.perf_counter() - t0, 3)

    print(json.dumps({"sentinel_pre": min(_sent() for _ in range(3))}))
    for rep in range(args.reps):
        seen = {s["stageId"] for s in _stages(app_id)}
        t0 = time.perf_counter()
        qs[args.name](spark, SF).write.mode("overwrite").format("noop").save()
        wall = round(time.perf_counter() - t0, 3)
        time.sleep(0.5)
        new = sorted(
            (s for s in _stages(app_id) if s["stageId"] not in seen),
            key=lambda s: s["stageId"],
        )
        stages = [
            {
                "id": s["stageId"],
                "ms": s.get("executorRunTime", 0),
                "wall_ms": (
                    int(
                        (
                            time.mktime(
                                time.strptime(
                                    s["completionTime"][:19], "%Y-%m-%dT%H:%M:%S"
                                )
                            )
                            - time.mktime(
                                time.strptime(
                                    s["firstTaskLaunchedTime"][:19],
                                    "%Y-%m-%dT%H:%M:%S",
                                )
                            )
                        )
                        * 1000
                    )
                    if s.get("completionTime") and s.get("firstTaskLaunchedTime")
                    else None
                ),
                "tasks": s.get("numCompleteTasks", 0),
                "shufR": s.get("shuffleReadBytes", 0),
                "desc": s.get("description") or s.get("name", "")[:40],
            }
            for s in new
        ]
        top = sorted(stages, key=lambda x: -(x["ms"] or 0))[:8]
        print(json.dumps({"rep": rep, "wall": wall, "n_stages": len(new), "top_stages": top}))
    print(json.dumps({"sentinel_post": min(_sent() for _ in range(3))}))


if __name__ == "__main__":
    main()
