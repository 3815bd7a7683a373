#!/usr/bin/env python
"""Round-16 scale probes: the seven new registrations' x20 rows.

Claims measured (SCALE.md):

- http_parse_response: the HTTP field extraction is scan projection
  behind the fixture pack's one exchange — shuffle linear in envelope
  bytes, wall flat-to-linear with parallelism.
- charset_quality_gate: zero shuffle at any size; wall tracks the scan.
- web_pipeline_warc_to_shards: the capstone's two corpus shuffles
  (canonical-URL dedup window, extractor block window) both carry
  survivor pages only; shard-count grows linearly and byte balance
  stays flat (the write_training_shards structural bound).
- unigram_seed_vocab / encode_viterbi / em_reestimate: every stage is
  bounded by the DISTINCT-WORD domain, which the x20 derivation grows
  sublinearly — wall must be FLAT-ish while the corpus is 20x (the
  whole point of the domain trick).
- frontier_politeness: frontier rows grow with URLs; the per-domain
  rank is the range-partitioned machinery, so no single-reducer stage
  appears even though the law collapses to ~3 registrable domains.

Reuses the x20 document derivation of tools/scale_bpe.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_bpe import SF_DIR_X1, X20_BASE, ensure_x20_documents
from tools.scale_demo import build_session, stage_metrics

QUERIES = (
    "http_parse_response",
    "charset_quality_gate",
    "unigram_seed_vocab",
    "unigram_encode_viterbi",
    "unigram_em_reestimate",
    "frontier_politeness",
    "web_pipeline_warc_to_shards",
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
