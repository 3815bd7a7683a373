"""Salted two-phase aggregation == direct single-phase results."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparksent import tables
from sparksent.skew import salted_distinct_count, salted_sorted_concat

from conftest import SF_DIR, SF_DIR_SMALL


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


def test_pair_intersection_strategies_identical(spark):
    """The map-side bucket-pair expansion (bounded=True) and the classic
    inverted-index self-join produce the identical (id_a, id_b, inter)
    set — the documented single-node/cluster trade in
    dedup._pair_intersections is purely physical."""
    from pyspark.sql import functions as F

    from sparksent.ext.dedup import _pair_intersections
    from sparksent.ext.hashing import h60, shingles
    from sparksent.tables import load_table

    docs = load_table(spark, SF_DIR_SMALL, "documents")
    sh = (
        docs.select(F.col("doc_id").alias("id"), F.explode(shingles("text")).alias("g"))
        .select("id", h60("g").alias("shingle"))
    )
    a = _pair_intersections(sh, bounded=True).toPandas()
    b = _pair_intersections(sh, bounded=False).toPandas()
    a = a.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    b = b.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a.to_numpy() == b.to_numpy()).all()
