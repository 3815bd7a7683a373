#!/usr/bin/env python
"""Compare two bench artifacts query-by-query (VERDICT r6 ask #7):

    python tools/bench_diff.py NEW.json [OLD.json]

NEW is a BENCH_FULL_r<k>.json (or any JSON with a "queries" map of
name -> seconds).  OLD defaults to BASELINE_BENCH.json in the repo
root.  Prints the worst regressions and improvements over the common
query set, the common-set total ratio, and names present on only one
side — the regression check the driver's truncated stdout tail can't
give.  Sub-second entries are reported but never counted as
regressions (the box's documented session scatter swamps them,
BASELINE_BENCH.json "note")."""

from __future__ import annotations

import json
import os
import sys

SUBSEC_FLOOR = 1.0  # ignore ratio noise below this many seconds (max side)
REGRESSION_RATIO = 1.5


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' map")
    return d


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    new = load(sys.argv[1])
    old_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(__file__), "..", "BASELINE_BENCH.json")
    )
    old = load(old_path)
    nq, oq = new["queries"], old["queries"]
    common = sorted(set(nq) & set(oq))
    only_new = sorted(set(nq) - set(oq))
    only_old = sorted(set(oq) - set(nq))

    rows = []
    for n in common:
        a, b = float(nq[n]), float(oq[n])
        ratio = a / b if b > 0 else float("inf")
        rows.append((ratio, n, a, b))
    rows.sort(reverse=True)

    tot_new = sum(float(nq[n]) for n in common)
    tot_old = sum(float(oq[n]) for n in common)
    print(
        f"common queries: {len(common)}  total {tot_new:.1f}s vs "
        f"{tot_old:.1f}s  ratio {tot_new / tot_old:.3f}"
    )
    regressions = [
        r
        for r in rows
        if r[0] > REGRESSION_RATIO and max(r[2], r[3]) >= SUBSEC_FLOOR
    ]
    print(f"\nregressions (> {REGRESSION_RATIO}x, >= {SUBSEC_FLOOR}s): "
          f"{len(regressions)}")
    for ratio, n, a, b in regressions[:20]:
        print(f"  {n}: {b:.2f}s -> {a:.2f}s  ({ratio:.2f}x)")
    print("\nbiggest improvements:")
    improvements = [
        r for r in rows[::-1] if r[0] < 1 and max(r[2], r[3]) >= SUBSEC_FLOOR
    ]
    for ratio, n, a, b in improvements[:10]:
        print(f"  {n}: {b:.2f}s -> {a:.2f}s  ({ratio:.2f}x)")
    if only_new:
        print(f"\nonly in new ({len(only_new)}): {', '.join(only_new)}")
    if only_old:
        print(f"only in old ({len(only_old)}): {', '.join(only_old)}")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
