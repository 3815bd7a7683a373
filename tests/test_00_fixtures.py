"""Fixture-drift canary — first in the suite, fails in seconds.

Round 3 lost ~40% of its verified surface because the driver regenerated
the ``events`` fixture with a new physical ``ts`` type and no test caught
the drift until the driver's own correctness run.  This module pins every
assumption the loaders make about the fixture parquet files:

* physical/logical column types per table (metadata read via DuckDB's
  ``parquet_schema`` — no Spark session needed, runs in <1 s), and
* a first-contact smoke test that ``load_table`` + ``entry()`` actually
  run at sf0.001.

If the driver regenerates fixtures with new types, the canary names the
exact table/column that moved instead of 80 downstream tests going red.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from conftest import SF_DIR, SF_DIR_SMALL

# Logical column types the loaders and oracle SQL assume, per table.
# (DuckDB logical names; `events.ts` is special-cased below because the
# loader adapts to either TIMESTAMP(NANOS)-as-int64 or TIMESTAMP_MICROS.)
EXPECTED = {
    "region": {"r_regionkey": "INTEGER", "r_name": "VARCHAR"},
    "nation": {
        "n_nationkey": "INTEGER",
        "n_name": "VARCHAR",
        "n_regionkey": "INTEGER",
    },
    "customer": {
        "c_custkey": "BIGINT",
        "c_name": "VARCHAR",
        "c_nationkey": "INTEGER",
        "c_acctbal": "DOUBLE",
        "c_mktsegment": "VARCHAR",
    },
    "supplier": {
        "s_suppkey": "BIGINT",
        "s_name": "VARCHAR",
        "s_nationkey": "INTEGER",
        "s_acctbal": "DOUBLE",
    },
    "part": {
        "p_partkey": "BIGINT",
        "p_name": "VARCHAR",
        "p_brand": "VARCHAR",
        "p_type": "VARCHAR",
        "p_size": "INTEGER",
        "p_retailprice": "DOUBLE",
    },
    "orders": {
        "o_orderkey": "BIGINT",
        "o_custkey": "BIGINT",
        "o_orderstatus": "VARCHAR",
        "o_totalprice": "DOUBLE",
        "o_orderdate": "TIMESTAMP",
        "o_orderpriority": "VARCHAR",
    },
    "lineitem": {
        "l_orderkey": "BIGINT",
        "l_partkey": "BIGINT",
        "l_suppkey": "BIGINT",
        "l_linenumber": "INTEGER",
        "l_quantity": "DOUBLE",
        "l_extendedprice": "DOUBLE",
        "l_discount": "DOUBLE",
        "l_tax": "DOUBLE",
        "l_returnflag": "VARCHAR",
        "l_linestatus": "VARCHAR",
        "l_shipdate": "TIMESTAMP",
    },
    "events": {
        "event_id": "BIGINT",
        "user_id": "BIGINT",
        "event_type": "VARCHAR",
        "value": "DOUBLE",
        "props": "VARCHAR",
    },
    "documents": {
        "doc_id": "BIGINT",
        "text": "VARCHAR",
        "lang": "VARCHAR",
        "source": "VARCHAR",
        "n_chars": "BIGINT",
    },
    "embeddings": {
        "vec_id": "BIGINT",
        "embedding": "FLOAT[]",
        "label": "INTEGER",
    },
}

SF_DIRS = sorted({SF_DIR, SF_DIR_SMALL, "/root/testdata/sf0.1"})


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_logical_types(sf_dir, table):
    path = os.path.join(sf_dir, f"{table}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    got = dict(
        duckdb.sql(
            f"SELECT column_name, column_type FROM "
            f"(DESCRIBE SELECT * FROM read_parquet('{path}'))"
        ).fetchall()
    )
    for col, want in EXPECTED[table].items():
        assert col in got, f"{table}.{col} missing from fixture"
        assert got[col] == want, (
            f"{table}.{col} drifted: fixture has {got[col]}, loaders assume "
            f"{want} — update sparksent/tables.py and the oracle SQL together"
        )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_physical_type_is_handled(sf_dir):
    """The loader adapts to exactly two physical encodings of events.ts:
    INT64 TIMESTAMP(NANOS) (read as long via nanosAsLong) and INT64
    TIMESTAMP(MICROS) (read as TIMESTAMP or TIMESTAMP_NTZ).  Anything
    else (MILLIS, INT96, string...) needs a loader change — fail fast."""
    path = os.path.join(sf_dir, "events.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    rows = duckdb.sql(
        f"SELECT type, logical_type FROM parquet_schema('{path}') "
        f"WHERE name = 'ts'"
    ).fetchall()
    assert len(rows) == 1, "events.ts column missing"
    phys, logical = rows[0]
    assert phys == "INT64", f"events.ts physical type drifted to {phys}"
    logical = logical or ""
    assert ("NANOS=Nano" in logical) or ("MICROS=Micro" in logical), (
        f"events.ts logical unit drifted: {logical!r} — "
        "sparksent/tables.py:load_table only handles NANOS and MICROS"
    )


def test_load_table_and_entry_smoke(spark):
    """First-contact smoke: every table loads and the flagship entry()
    returns rows at sf0.001.  This is the one-second check that would
    have caught the round-3 loader break before any feature work."""
    from sparksent import tables

    for name in tables.TABLE_NAMES:
        df = tables.load_table(spark, SF_DIR_SMALL, name)
        assert len(df.schema) > 0
    ts_type = tables.load_table(spark, SF_DIR_SMALL, "events").schema[
        "ts"
    ].dataType.typeName()
    assert ts_type == "timestamp", f"events.ts loads as {ts_type}"

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.entry(spark)
    assert out.count() >= 0


@pytest.mark.parametrize("sf_dir", [SF_DIR_SMALL, SF_DIR, "/root/testdata/sf0.1"])
def test_documents_text_is_single_spaced(sf_dir):
    """The gram-construction contract (ext/hashing.py:overlapping_gram_re):
    Spark builds overlapping word grams with a lookahead regex that needs
    exactly ONE literal space between words, while the DuckDB oracles use
    ``string_split(text, ' ')`` — the two agree only on single-space-
    separated text with no tabs/newlines/leading/trailing/double spaces.
    Every shingle, n-gram, bigram-lift, LM-score, and repetition query
    rests on this, so a regenerated documents fixture with irregular
    whitespace must fail HERE (named, in <1 s) rather than as a driver
    hash mismatch across a dozen queries."""
    con = duckdb.connect()
    n_bad = con.execute(
        f"""
        SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet')
        WHERE regexp_matches(text, '\t|\n|\r|  ')
           OR text LIKE ' %' OR text LIKE '% '
        """
    ).fetchone()[0]
    assert n_bad == 0, (
        f"{n_bad} documents in {sf_dir} have irregular whitespace - the "
        "regex/string_split gram equivalence no longer holds; see "
        "overlapping_gram_re's contract note"
    )


@pytest.mark.parametrize("sf_dir", [SF_DIR_SMALL, SF_DIR, "/root/testdata/sf0.1"])
def test_percentile_measures_have_no_null_groups(sf_dir):
    """Contract of sparksent/oracles.py::spark_percentile_select (its
    module docstring, pinned here per ADVICE r7): a group whose measure
    is ALL NULL would silently drop out of the oracle's window+CASE SQL
    while Spark's percentile() emits a NULL row — a row-count mismatch
    the oracle pair would blame on the query. The registered callers'
    measures are orders.o_totalprice (by o_orderpriority) and
    events.value (by event_type / (event_type, day)); a regenerated
    fixture that introduces NULL measures must fail HERE, named, not as
    a driver hash mismatch on four percentile queries."""
    con = duckdb.connect()
    n_null_price = con.execute(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/orders.parquet')"
        " WHERE o_totalprice IS NULL"
    ).fetchone()[0]
    n_null_value = con.execute(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/events.parquet')"
        " WHERE value IS NULL"
    ).fetchone()[0]
    assert n_null_price == 0 and n_null_value == 0, (
        f"{sf_dir}: {n_null_price} NULL o_totalprice / {n_null_value} "
        "NULL event values - the percentile oracles' non-NULL contract "
        "no longer holds; add a LEFT JOIN + explicit NULL row to "
        "spark_percentile_select callers or regenerate the fixture"
    )
