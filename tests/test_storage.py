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


def test_lsh_bucket_partitioned_corpus_prunes(spark, tmp_path):
    """The cosine near-dup scale claim made concrete: an embedding
    corpus written partitioned by its LSH (tbl, bucket) key is read with
    PARTITION pruning when a probe touches one bucket — only co-bucketed
    files are scanned, which is what makes the bucket equi-join read
    nprobe/2^num_planes of the corpus at rest."""
    from sparksent.ext.similarity import lsh_bucket

    emb = tables.load_table(spark, SF_DIR, "embeddings").withColumn(
        "bucket", lsh_bucket("embedding")
    )
    path = str(tmp_path / "emb_bucketed")
    write_partitioned(emb, path, ["bucket"])

    back = spark.read.parquet(path).filter(F.col("bucket") == 3)
    plan = _formatted(back)
    assert re.search(r"PartitionFilters: \[[^\]]*bucket", plan)
    # pruned read returns exactly the bucket's rows
    want = emb.filter(F.col("bucket") == 3).count()
    assert back.count() == want


def test_jsonl_and_csv_roundtrip(spark, tmp_path):
    """Source-format breadth beyond parquet: the events table written as
    JSONL and quoted CSV reads back value-identical with an explicit
    schema (no inference in production paths — inference samples the
    data and can flip types between runs)."""
    ev = tables.load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value", "props"
    )
    schema = ev.schema

    jpath = str(tmp_path / "ev_jsonl")
    ev.write.mode("overwrite").json(jpath)
    jback = spark.read.schema(schema).json(jpath)
    assert jback.count() == ev.count()
    assert jback.exceptAll(ev).count() == 0 and ev.exceptAll(jback).count() == 0

    cpath = str(tmp_path / "ev_csv")
    # props is a JSON string containing commas/quotes: quote-all proves
    # the escaping path, unlike the reference's naive split-on-comma
    ev.write.mode("overwrite").option("header", True).option(
        "quoteAll", True
    ).csv(cpath)
    cback = spark.read.schema(schema).option("header", True).csv(cpath)
    assert cback.count() == ev.count()
    assert cback.exceptAll(ev).count() == 0 and ev.exceptAll(cback).count() == 0


def test_parquet_aggregate_pushdown(spark, tmp_path):
    # MIN/MAX/COUNT over parquet can resolve entirely from footer
    # statistics — at 100 TB that's the difference between reading
    # metadata and scanning the table. Session-settable conf; the plan
    # advertises what was pushed.
    p = f"{tmp_path}/ev"
    tables.load_table(spark, SF_DIR, "events").select(
        "event_id", "value"
    ).write.parquet(p)
    # pushdown lives in the v2 parquet source (v1, the default, plans a
    # normal scan + aggregate); both confs are session-settable
    v1_prev = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try:
        df = spark.read.parquet(p).agg(
            F.count("*").alias("n"),
            F.min("event_id").alias("lo"),
            F.max("event_id").alias("hi"),
        )
        plan = _formatted(df)
        assert "PushedAggregation: [COUNT(*), MIN(event_id), MAX(event_id)]" in plan
        row = df.collect()[0]
        # footer stats agree with a full scan
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
        truth = spark.read.parquet(p).agg(
            F.count("*"), F.min("event_id"), F.max("event_id")
        ).collect()[0]
        assert tuple(row) == tuple(truth)
    finally:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
        spark.conf.set("spark.sql.sources.useV1SourceList", v1_prev)


def test_schema_evolution_merge(spark, tmp_path):
    # a corpus written over time gains columns; mergeSchema reads old
    # and new files as one table with NULLs where the column predates
    p = f"{tmp_path}/docs"
    d = tables.load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    d.where(F.col("doc_id") % 2 == 0).write.parquet(f"{p}/batch=a")
    d.where(F.col("doc_id") % 2 == 1).withColumn(
        "quality", F.length("text").cast("double")
    ).write.parquet(f"{p}/batch=b")
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert "quality" in merged.columns
    n_total = d.count()
    assert merged.count() == n_total
    assert merged.where(F.col("quality").isNull()).count() == d.where(
        F.col("doc_id") % 2 == 0
    ).count()


def test_orc_roundtrip(spark, tmp_path):
    # ORC is the other columnar format Spark ships natively; a corpus
    # engine should read/write it loss-free (schema + values), with
    # predicate pushdown available on read
    p = f"{tmp_path}/docs_orc"
    d = tables.load_table(spark, SF_DIR, "documents")
    d.write.orc(p)
    back = spark.read.orc(p)
    assert back.schema == d.schema
    assert back.count() == d.count()
    assert back.exceptAll(d).count() == 0
    filtered = back.where(F.col("doc_id") < 100)
    plan = _formatted(filtered)
    assert "PushedFilters" in plan and "LessThan(doc_id,100)" in plan


def test_ivf_trained_cells_at_rest_prune_and_match(spark, tmp_path):
    """The trained-IVF at-rest claim, end to end: the corpus written
    PARTITIONED BY its trained Lloyd cell is read with partition
    pruning for a query's probed cells (only nprobe/K directories
    scanned), and the search over the at-rest layout returns EXACTLY
    the in-memory ivf_trained_topk result — layout is an optimization,
    never a semantics change."""
    from pyspark.sql import Window

    from sparksent.ext.similarity import (
        dot_arrow,
        ivf_trained_parts,
        ivf_trained_topk,
    )

    emb = tables.load_table(spark, SF_DIR, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 10)
    cells, probes = ivf_trained_parts(emb, queries_df, n_centroids=8)
    path = str(tmp_path / "emb_ivf_cells")
    write_partitioned(cells, path, ["cell"])

    # the probe list is n_queries x nprobe rows — bounded, driver-legal
    probe_rows = probes.select("query_id", "cell", "qv", "nq").collect()
    probed_cells = sorted({r.cell for r in probe_rows})

    at_rest = spark.read.parquet(path).filter(F.col("cell").isin(probed_cells))
    plan = _formatted(at_rest)
    assert re.search(r"PartitionFilters: \[[^\]]*cell", plan)
    # pruned read touches only the probed cells' rows
    want_rows = cells.filter(F.col("cell").isin(probed_cells)).count()
    assert at_rest.count() == want_rows

    # full search over the at-rest layout == the in-memory query
    probe_df = spark.createDataFrame(probe_rows)
    scored = (
        at_rest.join(F.broadcast(probe_df), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim", dot_arrow(F.col("qv"), F.col("cv")) / (F.col("nq") * F.col("nc"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_trained_topk(emb, queries_df, k=5, n_centroids=8).collect()
    }
    assert got == want
