#!/usr/bin/env python
"""Focused x20 measurement for the interval-overlap concurrency pair
(VERDICT r7 ask #2): run session_concurrency_capped — and optionally the
exact form for a same-session baseline — against the scale_demo-derived
events table (20x event density in the same time range, the regime where
the exact answer is ~157M true pairs) and record wall + shuffle rows
from the Spark status REST API.

Usage:
  python tools/scale_concurrency.py [--base /tmp/sparksent-scale]
                                    [--with-exact]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_demo import build_session, generate, stage_metrics


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/tmp/sparksent-scale")
    ap.add_argument("--with-exact", action="store_true")
    args = ap.parse_args()

    spark = build_session()
    sc = spark.sparkContext
    port = int(sc.uiWebUrl.rsplit(":", 1)[1]) if sc.uiWebUrl else 4050
    app_id = sc.applicationId

    if not os.path.exists(f"{args.base}/events.parquet"):
        generate(spark, args.base)

    from sparksent.registry import queries

    qs = queries()
    targets = ["session_concurrency_capped"]
    if args.with_exact:
        targets.append("session_concurrency")

    results, group_of = {}, {}
    for name in targets:
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        df = qs[name](spark, args.base)
        df.write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup("count_" + name, "row count")
        n_out = df.count()
        results[name] = {"wall_s": round(wall, 2), "rows_out": n_out}
        group_of[name] = name
        print(f"  {name}: {wall:.1f}s, {n_out} rows", file=sys.stderr)

    metrics = stage_metrics(port, app_id, group_of)
    report = {
        "base": args.base,
        "events_rows": spark.read.parquet(f"{args.base}/events.parquet").count(),
        "queries": {n: {**results[n], **metrics.get(n, {})} for n in targets},
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
