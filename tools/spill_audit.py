#!/usr/bin/env python
"""Spill/memory audit (VERDICT r16 ask #6, guide §5): run named registry
queries at $SPARK_GRAFT_SF_DIR with the driver-default session conf
(sparksent.session.get_spark shape, shuffle.partitions=$SPARK_GRAFT_CPUS)
and record, PER QUERY, the stage-level spill and memory metrics from the
UI REST API: memory/disk bytes spilled, peak execution memory, shuffle
read/write bytes, and the worst task-level spill.

Prints one JSON line; SCALE.md rows are written from it.

Usage: PYTHONPATH=. python tools/spill_audit.py <name> [...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
UI_PORT = int(os.environ.get("SPILL_AUDIT_UI_PORT", "4049"))


def _stages(app_id: str) -> list[dict]:
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1:]
    if not names:
        sys.exit("usage: spill_audit.py <registry name> [...]")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_CPUS", "32"),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
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

    out = {}
    for n in names:
        seen = {s["stageId"] for s in _stages(app_id)}
        spark.sparkContext.setJobDescription(f"spill_audit:{n}")
        t0 = time.perf_counter()
        qs[n](spark, SF).write.mode("overwrite").format("noop").save()
        wall = round(time.perf_counter() - t0, 3)
        time.sleep(0.5)  # let the status store settle
        new = [s for s in _stages(app_id) if s["stageId"] not in seen]
        spill_mem = sum(s.get("memoryBytesSpilled", 0) for s in new)
        spill_disk = sum(s.get("diskBytesSpilled", 0) for s in new)
        worst = max(
            new,
            key=lambda s: (s.get("memoryBytesSpilled", 0), s.get("shuffleReadBytes", 0)),
            default=None,
        )
        out[n] = {
            "wall_sec": wall,
            "n_stages": len(new),
            "memory_spilled_bytes": spill_mem,
            "disk_spilled_bytes": spill_disk,
            "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in new),
            "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in new),
            "peak_execution_memory": max(
                (s.get("peakExecutionMemory", 0) for s in new), default=0
            ),
            "worst_stage": (
                {
                    "stageId": worst["stageId"],
                    "name": worst.get("name", "")[:80],
                    "memoryBytesSpilled": worst.get("memoryBytesSpilled", 0),
                    "shuffleReadBytes": worst.get("shuffleReadBytes", 0),
                }
                if worst
                else None
            ),
        }
        print(f"  {n}: {out[n]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
