#!/usr/bin/env python
"""Regenerate tests/plan_census.json — the standing formatted-plan
census (VERDICT r16 ask #8).

For every registered query, record the compact plan-shape counters the
round-16 manual census tracked by hand: parquet scans, data Exchanges,
join strategies, Python-eval nodes.  tests/test_plan_census.py asserts
each query's counters stay within the snapshot (<=), so a rewrite that
silently re-grows a plan (extra corpus scan, extra shuffle, a
row-at-a-time BatchEvalPython) fails the suite instead of waiting for
the next round's manual sweep.  After a DELIBERATE plan improvement,
re-run this tool and commit the smaller snapshot.

Usage: PYTHONPATH=. python tools/regen_census.py
(uses the tests' SF: $SPARKSENT_TEST_SF, default /root/testdata/sf0.01)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("SPARKSENT_TEST_SF", "/root/testdata/sf0.01")


def census_of(plan: str) -> dict[str, int]:
    """The compact per-query plan-shape counters.  Shared text between
    the regen tool and the gate (the gate imports this)."""
    return {
        "parquet_scans": len(re.findall(r"Scan parquet", plan)),
        "exchanges": len(re.findall(r"\(\d+\) Exchange\b", plan)),
        "broadcast_hash_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "sort_merge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "shuffled_hash_joins": len(re.findall(r"ShuffledHashJoin", plan)),
        "nested_loop_joins": len(
            re.findall(r"BroadcastNestedLoopJoin|CartesianProduct", plan)
        ),
        "python_evals": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython", plan)
        ),
        "row_udf_evals": len(re.findall(r"BatchEvalPython", plan)),
    }


def main() -> None:
    from sparksent.registry import queries
    from sparksent.session import get_spark

    spark = get_spark("sparksent-census")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    out: dict[str, dict[str, int]] = {}
    for i, name in enumerate(sorted(qs)):
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        out[name] = census_of(plan)
        print(f"  [{i + 1}/{len(qs)}] {name}: {out[name]}", file=sys.stderr)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "plan_census.json",
    )
    with open(path, "w") as f:
        json.dump({"sf_dir": SF_DIR, "census": out}, f, indent=1, sort_keys=True)
    print(f"wrote {path} ({len(out)} queries)")


if __name__ == "__main__":
    main()
