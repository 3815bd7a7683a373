#!/usr/bin/env python
"""Round-13 continuation scale probe #2: the per-language adaptive
quality gate (``quality_gate_per_lang_head``) and the rewritten
token-budget admission (``sample_token_budget``) at x1 vs x20.

Claims measured (SCALE.md):

- the gate's ranking and the budget's prefix sum are RANGE-PARTITIONED
  per-group forms (ext/ranks.py) — no one-task-per-language stage, so
  worst-stage skew must stay low even though the corpus has only a
  handful of language groups (the x20 derivation keeps the same ~5
  langs over 20x the rows: each group IS 20x bigger, exactly the
  few-huge-groups regime the rewrite targets);
- gate shuffle grows with the bigram tf frame (the score's own cost),
  budget shuffle with (id, lang, n_tokens, lottery) ints — never text.

Reuses the x20 documents derivation of tools/scale_bpe.py.
"""

from __future__ import annotations

import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_bpe import SF_DIR_X1, X20_BASE, ensure_x20_documents
from tools.scale_demo import build_session, stage_metrics


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

    report: dict[str, dict] = {}
    sc = spark.sparkContext
    for scale, sf_dir in (("x1", SF_DIR_X1), ("x20", X20_BASE)):
        results, group_of = {}, {}
        for qname in ("quality_gate_per_lang_head", "sample_token_budget"):
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
