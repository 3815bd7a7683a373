"""Bench stdout contract (VERDICT r16 ask #1, round-17 revision).

The driver records a 2000-char merged stdout+stderr tail of a bench run
and parses the LAST JSON line in it.  These gates pin the two halves of
the fix: the single stdout line always fits that window (per-query maps
beyond the budget go to stderr + the BENCH_FULL artifact), and bench.py
emits exactly one stdout print so nothing can land after the line.
"""

from __future__ import annotations

import ast
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_stdout_line_fits_driver_tail_with_full_suite():
    """At the current 250-query scale, the per-query map (~6 KB) cannot
    fit the 2000-char tail — the line must drop it, point at the
    artifact, and stay parseable and within budget."""
    timings = {n: 1.234 for n in bench.HEADLINE + bench.CAPABILITY}
    line = bench._stdout_line(
        timings, 288.4, 0.1, 0.91, 0.25, 0.19, "BENCH_FULL_r17.json"
    )
    assert len(line) <= bench._STDOUT_BUDGET
    rec = json.loads(line)
    assert rec["metric"] == "headline_total"
    assert rec["unit"] == "sec"
    assert rec["value"] == 288.4
    assert rec["sf"] == 0.1
    assert rec["n_queries"] == len(bench.HEADLINE)
    assert "queries" not in rec
    assert rec["queries_artifact"] == "BENCH_FULL_r17.json"


def test_stdout_line_inlines_queries_when_small():
    """A small suite (the r01/r02 regime, <= ~50 names) keeps the full
    contract shape — "queries" inline in the one line."""
    timings = {f"q{i}": 0.5 for i in range(30)}
    line = bench._stdout_line(timings, 15.0, 0.1, None, 0.2, 0.2, "x.json")
    assert len(line) <= bench._STDOUT_BUDGET
    rec = json.loads(line)
    assert rec["queries"] == timings


def test_bench_module_prints_exactly_one_stdout_line():
    """Static gate: every print() in bench.py except one routes to
    sys.stderr, so the stdout contract is one JSON line by construction
    (a second stdout print would push the real line out of the driver's
    tail window — the r16 PERF failure mode)."""
    src = open(os.path.join(os.path.dirname(bench.__file__), "bench.py")).read()
    tree = ast.parse(src)
    stdout_prints = [
        node
        for node in ast.walk(tree)
        if isinstance(node, ast.Call)
        and isinstance(node.func, ast.Name)
        and node.func.id == "print"
        and not any(kw.arg == "file" for kw in node.keywords)
    ]
    assert len(stdout_prints) == 1, (
        f"bench.py must print exactly one stdout line, found "
        f"{len(stdout_prints)} at lines {[n.lineno for n in stdout_prints]}"
    )
