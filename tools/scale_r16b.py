#!/usr/bin/env python
"""Round-16 second-wave scale probes: the eight new registrations'
x20 rows.

Claims measured (SCALE.md):

- crawl_snapshot_delta: the FULL OUTER diff shuffles only (curl, fp)
  pairs — shuffle linear in URL count, wall linear-with-parallelism.
- host_pagerank / frontier_authority: the host-pair edge aggregate and
  the rank rounds run on HOST cardinality, which the x20 derivation
  holds fixed — model wall must be FLAT while the edge-build scan is
  20x.
- wordpiece_vocab / wordpiece_encode: bounded by the DISTINCT-WORD
  domain (sublinear under the x20 derivation) — the unigram family's
  claim, re-checked for the new family.
- quality_probe_train / quality_probe_score: per epoch one scan of the
  feature frame + bounded-cardinality gradient aggregate; wall linear
  in corpus, weight vector constant.
- kn_trigram_perplexity: corpus-sized work is the (doc, trigram) tf
  aggregate + per-doc score; the model frames are trigram-TYPE
  cardinality (vocab-bounded here — near-flat under x20).

Reuses the x20 document derivation of tools/scale_bpe.py.
"""

from __future__ import annotations

import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_bpe import SF_DIR_X1, X20_BASE, ensure_x20_documents
from tools.scale_demo import build_session, stage_metrics

QUERIES = (
    "crawl_snapshot_delta",
    "host_pagerank",
    "frontier_authority",
    "wordpiece_vocab",
    "wordpiece_encode",
    "quality_probe_train",
    "quality_probe_score",
    "kn_trigram_perplexity",
)


def main() -> None:
    from sparksent.registry import queries

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app_id = spark.sparkContext.applicationId
    ensure_x20_documents(spark)
    qs = queries()
    qs["seq_packing_512"](spark, SF_DIR_X1).write.mode("overwrite").format(
        "noop"
    ).save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()

    report: dict[str, dict] = {}
    sc = spark.sparkContext
    for scale, sf_dir in (("x1", SF_DIR_X1), ("x20", X20_BASE)):
        results, group_of = {}, {}
        for qname in QUERIES:
            name = f"{qname}_{scale}"
            sc.setJobGroup(name, name)
            t0 = time.perf_counter()
            df = qs[qname](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            wall = time.perf_counter() - t0
            sc.setJobGroup(f"count_{name}", "row count")
            results[name] = {"wall_s": round(wall, 2), "rows_out": df.count()}
            group_of[name] = name
            print(f"  {name}: {wall:.1f}s", file=sys.stderr)
        metrics = stage_metrics(port, app_id, group_of)
        for name in results:
            results[name].update(metrics.get(name, {}))
        report[scale] = results
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
