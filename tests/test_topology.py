"""Pipeline-parity test (SURVEY.md §5.2.2): the full reference topology
as one batch DAG over events-derived wire lines, with cross-stream
invariants the reference itself never checked."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparksent import nlp
from sparksent.parse import to_raw_lines
from sparksent.tables import load_table
from sparksent.topology import build_topology

from conftest import SF_DIR_SMALL


@pytest.fixture(scope="module")
def streams(spark):
    ev = load_table(spark, SF_DIR_SMALL, "events").select(
        "event_id", "ts", F.col("user_id").cast("string").alias("user"),
        F.col("event_type").alias("channel"),
    )
    docs = load_table(spark, SF_DIR_SMALL, "documents").select("doc_id", "text")
    msgs = ev.join(F.broadcast(docs), ev.event_id % 500 == docs.doc_id).drop("doc_id")
    lines = to_raw_lines(msgs)
    return build_topology(lines), msgs


def test_all_streams_materialize(streams):
    topo, msgs = streams
    n_msgs = msgs.count()
    counts = {name: df.count() for name, df in topo.items()}
    assert counts["sentimentStream"] == n_msgs  # map preserves cardinality
    assert counts["userMoodStream"] == n_msgs  # per-record running emit
    assert counts["parsedStream"] <= n_msgs  # windows only merge
    assert counts["aggregateStream"] <= counts["parsedStream"]
    assert counts["entityStream"] >= counts["topicStream"]
    assert counts["trendingStream"] == counts["topicStream"]
    for name, n in counts.items():
        assert n >= 0, name


def test_parse_roundtrip(streams):
    topo, msgs = streams
    sent = topo["sentimentStream"]
    # parse(to_raw_lines(msgs)) reproduces channel/user/text exactly
    orig = msgs.select("event_id", "channel", "user", "text")
    rt = sent.select("event_id", "channel", "user", "text")
    assert orig.exceptAll(rt).count() == 0
    assert rt.exceptAll(orig).count() == 0


def test_trending_shares_sum_to_one(streams):
    topo, _ = streams
    bad = (
        topo["trendingStream"]
        .groupBy("window_start_s")
        .agg(F.sum("share").alias("s"))
        .filter(F.abs(F.col("s") - 1.0) > 1e-9)
    )
    assert bad.count() == 0


def test_toxicity_below_threshold(streams):
    topo, _ = streams
    assert topo["toxicUserStream"].filter(F.col("value") > -10.0).count() == 0
    assert topo["toxicTopicStream"].filter(F.col("value") > -20.0).count() == 0
    assert topo["toxicChannelStream"].filter(F.col("value") > -30.0).count() == 0


def test_count_window_partition_property(streams):
    """Property (SURVEY.md §5.2.4): count-window bucket sums of the user
    mood concatenate to the total per-user sum."""
    topo, msgs = streams
    total_from_buckets = (
        topo["toxicUserStream"].groupBy("key").agg(F.sum("value"))
    )
    # toxicUserStream is filtered, so instead check bucket sizes directly
    from sparksent.windows import count_window_agg

    scored = nlp.with_sentiment(msgs)
    buckets = count_window_agg(
        scored.select(F.col("user").alias("key"), "score_raw", "ts", "event_id"),
        ["key"], 10, [F.sum("score_raw").alias("s"), F.count("*").alias("n")],
    )
    per_user = buckets.groupBy("key").agg(F.sum("s").alias("bucket_total"))
    direct = scored.groupBy(F.col("user").alias("key")).agg(
        F.sum("score_raw").alias("direct_total")
    )
    joined = per_user.join(direct, "key")
    assert joined.filter(F.col("bucket_total") != F.col("direct_total")).count() == 0
    # every bucket except possibly the last per key has exactly 10 rows
    from pyspark.sql import Window as W

    last = W.partitionBy("key")
    partial = buckets.withColumn("maxb", F.max("bucket").over(last)).filter(
        (F.col("n") != 10) & (F.col("bucket") != F.col("maxb"))
    )
    assert partial.count() == 0
