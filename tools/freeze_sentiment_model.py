#!/usr/bin/env python
"""Train the sentiment LogisticRegression ONCE and freeze its weights
as integer micro-units into ``sparksent/ext/frozen_sentiment.py``.

Why freezing (vs training inside the query): the LBFGS gradient is a
``treeAggregate`` whose double-summation order depends on the partition
layout, so the learned coefficients are not bit-stable across driver
session configs — measured max |Δcoef| ≈ 4.5e-10 between
repartition(4) and repartition(13) on identical data (round 6).  Any
in-query quantization therefore risks boundary flips (~2 of 4096
hashed coefficients would sit within jitter of a 1e-6 boundary).  A
frozen, committed weight table has no such problem, and frozen-model
batch inference is the realistic 100-TB shape anyway: models train
once, then score petabytes via a broadcast join.

Token-keyed (CountVectorizer), not hash-bucket-keyed: the weights then
mirror into the DuckDB oracle as a plain VALUES join table with no
MurmurHash reimplementation, and the margin sum is exact BIGINT
arithmetic on both engines.

Usage: python tools/freeze_sentiment_model.py [sf_dir]
Rewrites sparksent/ext/frozen_sentiment.py; rerun only deliberately
(the committed weights are a fixture, not a build artifact).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(__file__), "..", "sparksent", "ext", "frozen_sentiment.py"
)


def main() -> None:
    from pyspark.sql import functions as F

    from sparksent import nlp, tables
    from sparksent.session import get_spark

    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import CountVectorizer

    spark = get_spark("freeze-sentiment", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = tables.load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    labeled = (
        nlp.with_sentiment(docs, "text")
        .withColumn("label", (F.col("score_raw") > 0).cast("double"))
        .withColumn(
            "toks",
            F.filter(F.split(F.lower("text"), " "), lambda t: t != F.lit("")),
        )
    )
    cv = CountVectorizer(inputCol="toks", outputCol="features").fit(labeled)
    lr = LogisticRegression(maxIter=30, regParam=0.0).fit(cv.transform(labeled))
    weights = {
        tok: int(round(c * 1_000_000))
        for tok, c in zip(cv.vocabulary, lr.coefficients.toArray())
    }
    intercept = int(round(lr.intercept * 1_000_000))

    lines = [
        '"""Frozen sentiment model — committed fixture, not a build artifact.',
        "",
        "Token-keyed LogisticRegression weights in integer micro-units",
        "(round(coef * 1e6)), trained ONCE by tools/freeze_sentiment_model.py",
        f"on {SF_DIR} documents against the deterministic lexicon labels",
        "(maxIter=30, regParam=0, CountVectorizer features over the",
        "lowercased whitespace tokens).  Frozen because live-trained",
        "coefficients are not bit-stable across partition layouts (LBFGS",
        "treeAggregate summation order); see the tool docstring for the",
        'measurement."""',
        "",
        "INTERCEPT_E6 = %d" % intercept,
        "",
        "WEIGHTS_E6 = {",
    ]
    for tok in sorted(weights):
        lines.append(f"    {tok!r}: {weights[tok]},")
    lines.append("}")
    lines.append("")
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {len(weights)} weights, intercept {intercept} -> {OUT}")


if __name__ == "__main__":
    main()
