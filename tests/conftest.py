"""Shared fixtures: one SparkSession per test session, a DuckDB
connection with the fixture tables registered as views, and a compare
helper mirroring the driver's correctness gate (row count + schema +
order-insensitive values)."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from sparksent.session import get_spark
from sparksent.tables import TABLE_NAMES

SF_DIR = os.environ.get("SPARKSENT_TEST_SF", "/root/testdata/sf0.01")
SF_DIR_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("sparksent-tests")
    yield s


@pytest.fixture(scope="session")
def ducks():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = df[c].dtype
        if pd.api.types.is_integer_dtype(dt):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(dt):
            df[c] = df[c].astype("float64")
        elif dt == object:
            # DuckDB HUGEINT / Decimal come back as objects
            try:
                df[c] = pd.to_numeric(df[c])
                if pd.api.types.is_integer_dtype(df[c].dtype):
                    df[c] = df[c].astype("int64")
                else:
                    df[c] = df[c].astype("float64")
            except (ValueError, TypeError):
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _dtype_family(dt) -> str:
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    return "other"  # strings, Decimal/HUGEINT objects, structs...


def assert_oracle_match(spark_df, con, sql: str, exact: bool = True) -> None:
    """Mirror the driver's t2 gate: same row count, same column-name set,
    order-insensitive value equality (exact by default — our queries are
    engineered for bit-exact float agreement via decimal accumulation).

    RAW dtype families must also agree BEFORE normalization: the driver
    hashes un-coerced values, so a DuckDB HUGEINT (``sum(CASE...)``
    un-cast) or DOUBLE (``//``, window sums) against a Spark BIGINT
    hash-mismatches there even when every value is numerically equal.
    Round 3 lost four queries to exactly this — our normalization hid
    it. The registry convention (registry.py module docstring) is to
    cast oracle aggregates ``::BIGINT`` to match Spark's type."""
    ap = spark_df.toPandas()
    bp = con.execute(sql).fetchdf()
    for c in sorted(set(ap.columns) & set(bp.columns)):
        fa, fb = _dtype_family(ap[c].dtype), _dtype_family(bp[c].dtype)
        assert fa == fb, (
            f"dtype-family mismatch in column {c!r}: spark={ap[c].dtype} "
            f"({fa}) vs oracle={bp[c].dtype} ({fb}) — the driver's value "
            f"hash will differ even if values are equal; cast the oracle "
            f"expression (::BIGINT/::DOUBLE) to match the Spark type"
        )
    a = _normalize(ap)
    b = _normalize(bp)
    assert sorted(a.columns) == sorted(b.columns), (
        f"schema mismatch: spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    )
    assert len(a) == len(b), f"row count mismatch: spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating):
            if exact:
                mism = ~((av == bv) | (np.isnan(av) & np.isnan(bv)))
            else:
                mism = ~(np.isclose(av, bv, rtol=1e-9, atol=1e-12)
                         | (np.isnan(av) & np.isnan(bv)))
        else:
            mism = av != bv
        if mism.any():
            i = int(np.argmax(mism))
            raise AssertionError(
                f"value mismatch in column {c!r}: {int(mism.sum())}/{len(av)} rows differ; "
                f"first at sorted-row {i}: spark={av[i]!r} oracle={bv[i]!r}\n"
                f"spark row: {a.iloc[i].to_dict()}\noracle row: {b.iloc[i].to_dict()}"
            )
