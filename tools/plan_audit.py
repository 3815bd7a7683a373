#!/usr/bin/env python
"""Sweep every registered query's optimized plan for scale-hazard
predicates — the mechanized form of the round-6 audit that found the
broadcast-over-localCheckpoint class (a checkpointed frame's
LogicalRDD stats read SMALL, so the planner can broadcast a
corpus-sized frame: instant driver OOM at 100 TB).

Predicates per query:
- bcast_rdd:   BroadcastExchange whose input columns come from a
               Scan ExistingRDD (the stats-less hazard); queries with
               bounded-by-construction broadcasts are expected here
               and allow-listed in tests/test_plans.py
- nested_loop: BroadcastNestedLoopJoin / CartesianProduct anywhere
               (allow-listed: the documented one-row-totals
               broadcast cross joins)
- global_sort: a rangepartitioning exchange (global sort) anywhere

Usage: python tools/plan_audit.py [--sf /root/testdata/sf0.01]
Prints one line per flagged query and a summary; exit code 0 always
(the pytest sweep test is the gate — this tool is for the per-round
eyeball + extending the allowlist deliberately).
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def broadcast_over_existing_rdd(plan: str) -> list:
    scans = re.findall(
        r"\(\d+\) Scan ExistingRDD[^\n]*\nOutput \[\d+\]: \[([^\]]*)\]", plan
    )
    bes = re.findall(
        r"\(\d+\) BroadcastExchange\s*\nInput \[\d+\]: \[([^\]]*)\]", plan
    )

    def cols(s):
        return {c.split("#")[0].strip() for c in s.split(",")}

    return sorted(
        {
            tuple(sorted(cols(b)))
            for b in bes
            for sc in scans
            if cols(b) <= cols(sc) and len(cols(b) & cols(sc)) >= 1
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from sparksent.session import get_spark
    from sparksent.registry import queries

    spark = get_spark("plan-audit", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    n_flagged = 0
    for name, fn in queries().items():
        try:
            plan = fn(spark, args.sf)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001 — audit must cover the rest
            print(f"{name}: PLAN ERROR {str(e)[:90]}")
            n_flagged += 1
            continue
        flags = []
        b = broadcast_over_existing_rdd(plan)
        if b:
            flags.append(f"bcast_rdd={b}")
        if "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan:
            flags.append("nested_loop")
        if "rangepartitioning" in plan:
            flags.append("global_sort")
        if flags:
            n_flagged += 1
            print(f"{name}: {'; '.join(flags)}")
    print(f"-- audited {len(queries())} queries, {n_flagged} flagged")


if __name__ == "__main__":
    main()
