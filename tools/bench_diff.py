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

# Deliberate-regression pins (VERDICT r8 ask #6): queries whose cost was
# knowingly re-baselined get an absolute watch pin here, checked against
# every NEW artifact independent of the OLD side — so the accepted bump
# can't silently compound round over round.  corpus_curation_pipeline was
# re-pinned in round 8 (+0.4 s for the fused Gopher gate, a semantics
# change) at 1.40 s.
WATCH_PINS = {"corpus_curation_pipeline": 1.40}
WATCH_RATIO = 1.2


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
    not_comparable = []
    for n in common:
        a, b = float(nq[n]), float(oq[n])
        if b <= 0:
            # a zero/placeholder old timing makes the ratio inf — noise,
            # not a regression; report separately (ADVICE r8)
            not_comparable.append((n, a, b))
            continue
        rows.append((a / b, n, a, b))
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
    if not_comparable:
        print(f"\nnot comparable (old time <= 0, {len(not_comparable)}): "
              + ", ".join(f"{n} (new {a:.2f}s)" for n, a, _ in not_comparable))
    if only_new:
        print(f"\nonly in new ({len(only_new)}): {', '.join(only_new)}")
    if only_old:
        print(f"only in old ({len(only_old)}): {', '.join(only_old)}")
    watch_fails = []
    for n, pin in WATCH_PINS.items():
        if n in nq and float(nq[n]) > WATCH_RATIO * pin:
            watch_fails.append((n, float(nq[n]), pin))
    if watch_fails:
        print(f"\nwatch-pin violations (> {WATCH_RATIO}x pinned):")
        for n, a, pin in watch_fails:
            print(f"  {n}: pinned {pin:.2f}s, now {a:.2f}s ({a / pin:.2f}x)")
    sys.exit(1 if (regressions or watch_fails) else 0)


if __name__ == "__main__":
    main()
