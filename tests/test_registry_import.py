"""Registry loading must fail loudly: a broken query module silently
shrinking queries()/oracle_sql() would invisibly narrow the driver's
checked surface (VERDICT r1, "What's wrong" #3)."""

from __future__ import annotations

import importlib
import sys

import pytest


def test_broken_query_module_fails_loudly():
    saved = {k: v for k, v in sys.modules.items() if k.startswith("sparksent")}
    for k in list(sys.modules):
        if k.startswith("sparksent"):
            del sys.modules[k]
    # None in sys.modules makes `import sparksent.queries_tpch` raise
    # ImportError — simulates a module whose import fails
    sys.modules["sparksent.queries_tpch"] = None
    try:
        reg = importlib.import_module("sparksent.registry")
        with pytest.raises(ImportError):
            reg.queries()
    finally:
        for k in list(sys.modules):
            if k.startswith("sparksent"):
                del sys.modules[k]
        sys.modules.update(saved)


def test_registry_full_surface_loads():
    from sparksent.registry import oracle_sql, queries

    qs, osql = queries(), oracle_sql()
    assert len(qs) >= 58
    # every oracle belongs to a registered query
    assert set(osql) <= set(qs)


def test_bench_names_are_registered():
    """bench.py's HEADLINE/CAPABILITY lists are plain strings, so a typo
    (or a renamed query) would crash the driver's BENCH run at timing
    time — the one artifact pytest otherwise never exercises.  Pin:
    every benched name resolves in the registry, and every registered
    query is either benched or deliberately absent from both tiers."""
    import bench
    from sparksent.registry import queries

    qs = queries()
    benched = set(bench.HEADLINE) | set(bench.CAPABILITY)
    missing = benched - set(qs)
    assert not missing, f"bench names not in registry: {sorted(missing)}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))  # no dupes


def test_every_registered_query_is_benched_and_pinned():
    """Pin-coverage gate (round-11 continuation): a fresh full bench
    revealed six round-9 registrations had NEVER received
    BASELINE_BENCH pins — each round's regression tracking silently
    excluded them.  Enforce the two invariants that would have caught
    it: every registered query is timed by bench.py (HEADLINE or
    CAPABILITY), and every registered query has a pin in
    BASELINE_BENCH.json."""
    import json
    import os

    import bench
    from sparksent.registry import queries

    qs = set(queries())
    benched = set(bench.HEADLINE) | set(bench.CAPABILITY)
    unbenched = qs - benched
    assert not unbenched, f"registered but never timed: {sorted(unbenched)}"
    base = json.load(
        open(os.path.join(os.path.dirname(bench.__file__), "BASELINE_BENCH.json"))
    )
    unpinned = qs - set(base["queries"])
    assert not unpinned, f"registered but never pinned: {sorted(unpinned)}"
