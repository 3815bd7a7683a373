#!/usr/bin/env python
"""Regenerate the driver-verification priority order from the round
record (the VERDICT-prescribed policy, made mechanical):

1. registered queries with NO green driver row in any CORRECTNESS_r*.json
   (never checked), in current-priority order so new registrations keep
   their deliberate ordering;
2. stale-green names, oldest latest-green-round first (driver freshness
   is the one evidence class the repo cannot self-produce);
3. everything else in current order.

Prints the replacement ``_PRIORITY`` tuple body (with slot comments and
the 50-slot window boundary marked) plus a window summary. It does NOT
edit registry.py — paste the output and review the diff, so the
deliberate-ordering escape hatch (e.g. "heaviest plans first within a
staleness tier") stays a human decision. Round 5 precedent: hand
renumbering these comments produced off-by-two slot arithmetic twice;
the tool exists so round 6+ regenerations start from computed truth.

Usage: python tools/regen_priority.py [--window 50]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def latest_green_round(repo_root: str) -> dict[str, int]:
    """query name -> latest round with a hash-green (or rows-green for
    no-oracle queries) driver row."""
    green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            ok = row.get("hash_match")
            if ok is None:
                # no-oracle queries get the driver's weak check: the
                # row records err='no_oracle' with the produced row
                # count (r03 precedent for bpe_merges)
                ok = (
                    row.get("err") == "no_oracle"
                    and (row.get("spark_rows") or 0) >= 0
                )
            if ok:
                green[name] = max(green.get(name, 0), rnd)
    return green


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()
    repo_root = os.path.join(os.path.dirname(__file__), "..")

    from sparksent import registry

    current = list(registry.queries())  # current priority order
    green = latest_green_round(repo_root)

    never = [n for n in current if n not in green]
    stale = sorted(
        (n for n in current if n in green),
        key=lambda n: (green[n], current.index(n)),
    )
    ordered = never + stale

    print("_PRIORITY: tuple[str, ...] = (")
    slot = 0
    last_tier: object = None
    for n in ordered:
        tier = "never" if n not in green else f"r{green[n]:02d}"
        if tier != last_tier:
            label = (
                "no green driver row yet"
                if tier == "never"
                else f"latest green driver row is {tier}"
            )
            print(f"    # slot {slot + 1}+: {label}")
            last_tier = tier
        slot += 1
        marker = ""
        if slot == args.window:
            marker = f"  # --- driver window ends here ({args.window}) ---"
        print(f'    "{n}",{marker}')
    print(")")

    in_window = ordered[: args.window]
    print(
        f"\n# window summary: {len([n for n in in_window if n not in green])} "
        f"never-checked + {len([n for n in in_window if n in green])} stale "
        f"(oldest tier inside: "
        f"{min((green[n] for n in in_window if n in green), default='-')}); "
        f"{len(ordered) - args.window} names spill past the window",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
