#!/usr/bin/env python
"""Round-13 continuation soak: the windowed admission operators' state
bound over a long stream.

The windowed quota/budget variants buffer rows in state until the
watermark closes their window; the classic watermark claim is that the
in-flight buffer is bounded by arrival rate x (window + lateness) and
NEVER by stream age.  This soak replays 48 micro-batches (one tumbling
window of event time per batch, file-per-trigger) through
``streaming_token_budget_windowed`` with a budget that never saturates
(so admission keeps writing state all run) and reads the state-store
row counts and batch walls from the query progress log.

Pass = state numRowsTotal and per-batch wall are FLAT between the
first and last dozen batches (the buffer holds only the currently-open
windows' rows + one counter per group), and every in-bound row is
admitted (the budget never binds).
"""

from __future__ import annotations

import json
import statistics
import sys

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_demo import build_session

N_BATCHES = 48
DOCS_PER_BATCH = 400
WINDOW_S = 10
LANGS = ("en", "de", "fr", "ja")
# Event times start at a realistic epoch, NOT 0: an event time of
# exactly epoch 0 is swallowed by Spark's EventTimeTimeout plumbing
# (measured: the row reaches a NoTimeout stateful op but never an
# EventTimeTimeout one; rows BELOW the watermark still arrive, so this
# is a 0-sentinel edge, not late filtering — pinned by
# tests/test_streaming_equivalence.py::test_epoch_zero_event_time_edge).
T0 = 1_000_000


def main() -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from sparksent.streaming import streaming_token_budget_windowed
    from sparksent.streaming.sources import append_flat_file, file_replay_source

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="soak_wadm_")
    replay = os.path.join(root, "replay")
    os.makedirs(replay, exist_ok=True)

    rows_per_batch = []
    for b in range(N_BATCHES):
        rows = []
        for i in range(DOCS_PER_BATCH):
            doc = b * DOCS_PER_BATCH + i
            sec = T0 + b * WINDOW_S + (doc * 7) % WINDOW_S
            rows.append(
                (doc, LANGS[doc % len(LANGS)], sec, "w " * (5 + doc % 20))
            )
        df = (
            spark.createDataFrame(
                rows, "doc_id long, lang string, sec long, text string"
            )
            .withColumn("ts", F.col("sec").cast("timestamp"))
            .drop("sec")
            .select("doc_id", "lang", "ts", "text")
        )
        append_flat_file(df, replay, f"chunk_{b:04d}.parquet")
        rows_per_batch.append(len(rows))
    # watermark sentinel closes the tail windows
    sentinel = (
        spark.createDataFrame(
            [(10_000_000, "zz", 11_000_000, "w")],
            "doc_id long, lang string, sec long, text string",
        )
        .withColumn("ts", F.col("sec").cast("timestamp"))
        .drop("sec")
        .select("doc_id", "lang", "ts", "text")
    )
    append_flat_file(sentinel, replay, "chunk_9999.parquet")

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("text", T.StringType()),
        ]
    )
    q = (
        streaming_token_budget_windowed(
            file_replay_source(spark, replay, schema=schema),
            budget=1_000_000_000,  # never binds: every in-bound row admits
            window_dur=f"{WINDOW_S} seconds",
            lateness="10 seconds",
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("soak_wadm")
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1800)
    prog = [json.loads(p.json) for p in q.recentProgress]
    admitted = spark.table("soak_wadm").where(F.col("lang") != "zz").count()

    walls = [p["batchDuration"] / 1000.0 for p in prog if p["numInputRows"] > 0]
    state = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in prog
        if p.get("stateOperators")
    ]

    def seg(xs, a, b):
        xs = xs[a:b]
        return (round(statistics.mean(xs), 2), max(xs)) if xs else (None, None)

    report = {
        "batches": len(walls),
        "rows_in": sum(rows_per_batch),
        "rows_admitted": admitted,
        "wall_mean_first12": seg(walls, 0, 12)[0],
        "wall_mean_last12": seg(walls, -12, None)[0],
        "state_rows_first12_mean_max": seg(state, 0, 12),
        "state_rows_last12_mean_max": seg(state, -12, None),
        "state_rows_global_max": max(state) if state else None,
    }
    print(json.dumps(report, indent=1))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
