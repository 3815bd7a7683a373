"""Salted two-phase aggregation == direct single-phase results."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparksent import tables
from sparksent.skew import salted_distinct_count, salted_sorted_concat

from conftest import SF_DIR


def test_salted_distinct_equals_direct(spark):
    ev = tables.load_table(spark, SF_DIR, "events")
    got = salted_distinct_count(ev, ["event_type"], "user_id")
    want = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_distinct")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_salted_concat_equals_direct(spark):
    ev = tables.load_table(spark, SF_DIR, "events").select(
        "event_type", "ts", "event_id", F.col("props").alias("text")
    )
    got = salted_sorted_concat(ev, ["event_type"], "text", ["ts", "event_id"])
    direct = (
        ev.groupBy("event_type")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", F.col("text")))
            ).alias("a")
        )
        .select(
            "event_type",
            F.array_join(F.transform("a", lambda s: s["text"]), "\n").alias("texts"),
        )
    )
    assert got.exceptAll(direct).count() == 0
    assert direct.exceptAll(got).count() == 0
