"""Standing formatted-plan census gate (VERDICT r16 ask #8).

The round-16 optimization round ran a manual census over all 250
registered queries (scans / Exchanges / join strategies / Python-eval
nodes per formatted plan) to find duplicate-subtree and shuffle
regressions.  This test makes that census a standing gate: every
query's counters must stay within the committed snapshot
(tests/plan_census.json), so plan growth is caught by CI instead of
rediscovered next round.  Improvements (smaller counters) pass; after
a deliberate improvement, refresh the snapshot with
``PYTHONPATH=. python tools/regen_census.py`` and commit the diff.

Hard invariants independent of the snapshot: zero ``BatchEvalPython``
(row-at-a-time Python UDF) nodes anywhere in the registry.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from regen_census import census_of  # noqa: E402

from conftest import SF_DIR  # noqa: E402

SNAPSHOT_PATH = os.path.join(os.path.dirname(__file__), "plan_census.json")


def _snapshot() -> dict:
    with open(SNAPSHOT_PATH) as f:
        return json.load(f)


def test_census_snapshot_covers_every_registered_query():
    from sparksent.registry import queries

    snap = _snapshot()
    missing = set(queries()) - set(snap["census"])
    assert not missing, (
        f"queries missing from plan_census.json (run tools/regen_census.py): "
        f"{sorted(missing)}"
    )


def test_plan_census_within_snapshot_bounds(spark):
    """One pass over every registered query's formatted plan: each
    counter must be <= the snapshot's, and row-at-a-time Python UDF
    nodes must be zero everywhere."""
    from sparksent.registry import queries

    snap = _snapshot()
    if snap.get("sf_dir") != SF_DIR:
        pytest.skip(
            f"snapshot generated at {snap.get('sf_dir')}, tests run at "
            f"{SF_DIR} — plan shapes are only comparable at the same SF; "
            f"regenerate with SPARKSENT_TEST_SF={SF_DIR}"
        )
    qs = queries()
    grown: list[str] = []
    row_udfs: list[str] = []
    for name in sorted(qs):
        if name not in snap["census"]:
            continue  # coverage asserted separately
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        got = census_of(plan)
        if got["row_udf_evals"] > 0:
            row_udfs.append(name)
        bound = snap["census"][name]
        for key, val in got.items():
            if val > bound.get(key, 0):
                grown.append(f"{name}.{key}: {bound.get(key, 0)} -> {val}")
    assert not row_udfs, f"row-at-a-time BatchEvalPython appeared in: {row_udfs}"
    assert not grown, (
        "plan shape grew beyond the committed census (deliberate? "
        "regen tools/regen_census.py and justify in the round log):\n  "
        + "\n  ".join(grown)
    )
