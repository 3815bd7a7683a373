"""Storage-layout proofs: bucketed co-located joins skip the shuffle;
partitioned writes prune directories."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from sparksent import tables
from sparksent.storage import read_table, write_bucketed, write_partitioned

from conftest import SF_DIR


def _formatted(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # a fresh session's metastore doesn't know tables a previous run
    # left in the warehouse dir — drop both name and location first
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("li_b", "o_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)

    li = tables.load_table(spark, SF_DIR, "lineitem")
    o = tables.load_table(spark, SF_DIR, "orders")
    write_bucketed(li, "li_b", 8, ["l_orderkey"], ["l_orderkey"])
    write_bucketed(o, "o_b", 8, ["o_orderkey"], ["o_orderkey"])

    joined = read_table(spark, "li_b").join(
        read_table(spark, "o_b").hint("merge"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = _formatted(joined)
    assert "SortMergeJoin" in plan
    # both sides read pre-bucketed data: no shuffle anywhere in the join
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 0
    assert "SelectedBucketsCount: 8 out of 8" in plan

    # same answer as the plain (shuffled) join
    direct = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    assert joined.count() == direct.count()


def test_partitioned_write_prunes(spark, tmp_path):
    ev = tables.load_table(spark, SF_DIR, "events")
    path = str(tmp_path / "ev_part")
    write_partitioned(ev, path, ["event_type"])

    back = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    plan = _formatted(back)
    # partition filter resolved at scan planning, not as a data filter
    assert re.search(r"PartitionFilters: \[.*event_type.*\]", plan)
    assert back.count() == ev.filter(F.col("event_type") == "purchase").count()
