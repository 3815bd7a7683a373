"""The driver-mirroring correctness gate: run every registered query on
Spark and its DuckDB oracle on the same sf0.01 fixtures; assert
row-count + schema + order-insensitive value equality."""

from __future__ import annotations

import pytest

from sparksent.registry import REGISTRY, _ensure_loaded

from conftest import SF_DIR, assert_oracle_match

_ensure_loaded()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, ducks):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver's weak gate
        return
    assert_oracle_match(df, ducks, q.oracle)
