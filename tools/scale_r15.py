#!/usr/bin/env python
"""Round-15 scale probes: the four new registrations' x20 rows.

Claims measured (SCALE.md):

- url_registrable_domain: the PSL match is literal-CASE scan
  projection — zero shuffle at any size; wall tracks the scan.
- sample_domain_quota_registrable: WindowGroupLimit keeps the window
  shuffle capped per (domain x task); x20 shuffle growth must track
  the capped take, not the corpus.
- html_extract_text: ONE corpus shuffle (pages keyed by doc_id), all
  block work behind it; wall and shuffle volume both linear in pages.
- warc_parse_gzip: the Arrow inflate is per-blob and parallel; the
  member gzip/inflate round-trip cost is linear, and the only shuffle
  is the fixture blob pack (operator itself shuffle-free after it).
- write_training_shards: shard byte totals stay within one document
  of target at both scales (flat skew), shard count grows linearly,
  and the prefix-sum machinery adds no corpus-sized serial stage.

Reuses the x20 document derivation of tools/scale_bpe.py (per-replica
token prefixes keep dedup-law structure linear).
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
    "url_registrable_domain",
    "sample_domain_quota_registrable",
    "html_extract_text",
    "warc_parse_gzip",
    "write_training_shards",
    "quality_gate_extracted",
    "html_link_graph",
    "robots_txt_parse",
    "robots_audit_parsed",
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
