#!/usr/bin/env python
"""Round-9 scale battery (VERDICT r8 asks #5 / #7 / #8), one command
per part so each can rerun independently:

  python tools/scale_r9.py hotkey    # adversarial hot-term dedup skew
  python tools/scale_r9.py neardup   # streaming near-dup per-batch cost
  python tools/scale_r9.py x80       # span dedup + DSIR at 80 replicas

hotkey — ask #5: the dedup inverted indexes' df caps are CLAIMED to
neutralize pathological hot keys; measure it. Derive the standing x20
documents corpus (100 k docs) with an adversarial hot phrase appended
to HALF the corpus ("zzhot" x 4 -> one shingle in 50 k docs, one term
in 50 k docs — uncapped, the self-join would build a ~2.5e9-row
partition for that single key), then run the registered
dedup_ngram_jaccard (max_df=25) and dedup_tf_cosine (relative cap) and
record wall / shuffle / max-task skew.  Pass = skew <= 3 and sane
output (the hot key is anti-joined out map-side BEFORE any shuffle).

neardup — ask #7: streaming/neardup.py's stream-static band join has
equivalence tests at sf0.01 but no scale row.  Build the corpus
MinHash band index at x1 (5 k docs) and x20 (100 k docs), then measure
the PER-BATCH candidate join cost for a fixed 1,000-doc micro-batch
against each index, broadcast and shuffled variants — the claim being
that per-batch cost tracks the BATCH (x bands), not the corpus, once
the index is built (built once per corpus version, amortized across
batches).  The batch is replica-0 text re-id'd, so true matches exist.

x80 — ask #8: one more doubling for the two round-8 operators
(dedup_span_8gram, dsir_importance_weights) on the scale_x40
derivation at 80 replicas (400 k docs): linearity holds if wall and
shuffle stay ~2x the x40 row (ratio <= 2.1 per the ask).

All metrics from the Spark status REST API of the live run, local[32],
AQE on (build_session from tools/scale_demo).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_demo import build_session, stage_metrics

X20_BASE = "/tmp/sparksent-scale"
HOT_BASE = "/tmp/sparksent-scale-hot"
X80_BASE = "/tmp/sparksent-scale80"
# x1 fixture dir: overridable like the conftest SF_DIR convention so
# the battery runs on machines where the fixtures live elsewhere
# (ADVICE r9 — cmd_neardup used to hardcode the absolute path).
SF_DIR_X1 = os.environ.get("SPARKSENT_SF_DIR", "/root/testdata/sf0.1")
HOT_PHRASE = " zzhot zzhot zzhot zzhot"  # 4 repeats -> interior 3-gram repeats


def _run_measured(spark, fns: dict, port: int, app_id: str) -> dict:
    sc = spark.sparkContext
    results, group_of = {}, {}
    for name, fn in fns.items():
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        df = fn()
        df.write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup("count_" + name, "row count")
        n_out = df.count()
        results[name] = {"wall_s": round(wall, 2), "rows_out": n_out}
        group_of[name] = name
        print(f"  {name}: {wall:.1f}s, {n_out} rows", file=sys.stderr)
    metrics = stage_metrics(port, app_id, group_of)
    return {n: {**results[n], **metrics.get(n, {})} for n in fns}


def cmd_hotkey(spark, port, app_id) -> dict:
    from pyspark.sql import functions as F

    if not os.path.isdir(f"{X20_BASE}/documents.parquet"):
        from tools.scale_demo import generate

        generate(spark, X20_BASE)
    os.makedirs(HOT_BASE, exist_ok=True)
    docs = spark.read.parquet(f"{X20_BASE}/documents.parquet")
    docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.col("text"), F.lit(HOT_PHRASE))
        ).otherwise(F.col("text")),
    ).repartition(64).write.mode("overwrite").parquet(
        f"{HOT_BASE}/documents.parquet"
    )
    n_hot = spark.read.parquet(f"{HOT_BASE}/documents.parquet").filter(
        F.col("text").contains("zzhot")
    ).count()
    print(f"hot docs: {n_hot}", file=sys.stderr)

    from sparksent.registry import queries

    qs = queries()
    # warm-up python workers + codegen before timed runs
    qs["text_stats"](spark, HOT_BASE).write.mode("overwrite").format("noop").save()
    fns = {
        "dedup_ngram_jaccard_hot": lambda: qs["dedup_ngram_jaccard"](spark, HOT_BASE),
        "dedup_tf_cosine_hot": lambda: qs["dedup_tf_cosine"](spark, HOT_BASE),
    }
    out = _run_measured(spark, fns, port, app_id)
    return {"hot_docs": n_hot, "queries": out}


def cmd_neardup(spark, port, app_id) -> dict:
    from pyspark.sql import functions as F

    from sparksent.streaming import (
        minhash_band_index,
        streaming_neardup_candidates,
    )
    from sparksent.tables import load_table

    if not os.path.isdir(f"{X20_BASE}/documents.parquet"):
        from tools.scale_demo import generate

        generate(spark, X20_BASE)

    corpora = {
        "x1": load_table(spark, SF_DIR_X1, "documents").select(
            "doc_id", "text"
        ),
        "x20": spark.read.parquet(f"{X20_BASE}/documents.parquet").select(
            "doc_id", "text"
        ),
    }
    # fixed micro-batch: 1,000 replica-0 docs re-id'd (verbatim text ->
    # true matches against both corpora)
    batch = (
        corpora["x1"]
        .filter(F.col("doc_id") < 1000)
        .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
        .localCheckpoint()
    )
    report = {}
    for tag, corpus in corpora.items():
        t0 = time.perf_counter()
        index = minhash_band_index(corpus).localCheckpoint()  # once per corpus
        build_s = time.perf_counter() - t0
        index_rows = index.count()
        fns = {
            f"neardup_batch_{tag}_bcast": lambda idx=index: (
                streaming_neardup_candidates(batch, idx, broadcast_index=True)
            ),
            f"neardup_batch_{tag}_shuffle": lambda idx=index: (
                streaming_neardup_candidates(batch, idx, broadcast_index=False)
            ),
        }
        out = _run_measured(spark, fns, port, app_id)
        report[tag] = {
            "index_build_s": round(build_s, 2),
            "index_rows": index_rows,
            "batches": out,
        }
    return report


def cmd_x80(spark, port, app_id, replicas: int = 80) -> dict:
    from tools.scale_x40 import generate

    if not os.path.isdir(f"{X80_BASE}/documents.parquet"):
        t0 = time.perf_counter()
        generate(spark, X80_BASE, replicas)
        print(f"generate x{replicas}: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

    from sparksent.registry import queries

    qs = queries()
    qs["text_stats"](spark, X80_BASE).write.mode("overwrite").format("noop").save()
    fns = {
        "dedup_span_8gram_x80": lambda: qs["dedup_span_8gram"](spark, X80_BASE),
        "dsir_importance_weights_x80": lambda: qs["dsir_importance_weights"](
            spark, X80_BASE
        ),
    }
    return _run_measured(spark, fns, port, app_id)


def cmd_annserve(spark, port, app_id) -> dict:
    """Round-11 continuation: the streaming ANN serve loop's scale
    claim — per-batch cost tracks the PROBED CELLS (~nprobe/K of the
    corpus via partition pruning on the cell layout), not the corpus.
    Method: build the at-rest trained-IVF index over the x1 (2k) and
    x20 (40k) embedding corpora, then serve the SAME fixed 10-query
    batch against each; per-batch wall + input bytes from the status
    REST API, vs the at-rest cells size a full scan would pay."""
    from pyspark.sql import functions as F

    from sparksent.ext.similarity import n_centroids_for
    from sparksent.streaming import ivf_serve_batch, write_ivf_index
    from sparksent.tables import load_table

    if not os.path.isdir(f"{X20_BASE}/embeddings.parquet"):
        from tools.scale_demo import generate

        generate(spark, X20_BASE)
    corpora = {
        "x1": load_table(spark, SF_DIR_X1, "embeddings"),
        "x20": spark.read.parquet(f"{X20_BASE}/embeddings.parquet"),
    }
    batch = corpora["x1"].filter(F.col("vec_id") < 10).localCheckpoint()
    report = {}
    for tag, emb in corpora.items():
        idx = f"/tmp/annserve-{tag}"
        out = f"/tmp/annserve-{tag}-out"
        kc = n_centroids_for(emb.count())
        t0 = time.perf_counter()
        write_ivf_index(emb, idx, n_centroids=kc)
        build_s = time.perf_counter() - t0
        cells_mb = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fs in os.walk(f"{idx}/cells")
            for f in fs
        ) / 1e6
        sc = spark.sparkContext
        name = f"serve_{tag}"
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        ivf_serve_batch(batch, idx, out, batch_id=0)
        wall = time.perf_counter() - t0
        m = stage_metrics(port, app_id, {name: name}).get(name, {})
        report[tag] = {
            "n_vectors": emb.count(),
            "n_centroids": kc,
            "index_build_s": round(build_s, 2),
            "cells_at_rest_mb": round(cells_mb, 2),
            "serve_batch_wall_s": round(wall, 2),
            **m,
        }
    return report


def cmd_admission(spark, port, app_id) -> dict:
    """Round-11 (VERDICT r10 ask #3, the round-9 ask #2 done-criterion):
    measure the BUCKETED at-rest admission index.  The round-9
    append-only layout re-read the ENTIRE index every micro-batch
    (~113 MB input/batch at x20); the kbucket layout
    (write_neardup_index + neardup_admit_batch's pruned probe) should
    read only the batch's touched bucket partitions — per-batch input
    ~batch-sized and flat as batches accumulate, corpus-independent.

    Method: seed the index over the x20 corpus (100k docs), then run
    three disjoint re-id'd micro-batches (vs-index matches exist —
    replica copies are in the corpus) through neardup_admit_batch;
    per-batch wall + input/shuffle bytes from the status REST API, vs
    the at-rest index size a full scan would pay.  Two legs:

    - ``defaults``: 1,000-doc batches, n_buckets=64 — the batch's
      ~4,000 band keys touch EVERY bucket, so pruning is vacuous and
      each batch reads+rewrites the whole index (the sizing-rule
      counterexample, kept as the comparison figure);
    - ``pruned``: 100-doc batches, n_buckets=4096 — ~400 band keys
      touch ~1/10 of the buckets; per-batch input should be a
      corresponding fraction of the index and FLAT across batches."""
    import shutil

    from pyspark.sql import functions as F

    from sparksent.streaming import (
        minhash_band_index,
        neardup_admit_batch,
        write_neardup_index,
    )

    if not os.path.isdir(f"{X20_BASE}/documents.parquet"):
        from tools.scale_demo import generate

        generate(spark, X20_BASE)
    corpus = spark.read.parquet(f"{X20_BASE}/documents.parquet").select(
        "doc_id", "text"
    )
    sc = spark.sparkContext
    report = {}
    for leg, batch_docs, n_buckets in (
        ("defaults", 1000, 64),
        ("pruned", 100, 4096),
    ):
        idx_path = f"/tmp/sparksent-admit-idx-{leg}"
        out_path = f"/tmp/sparksent-admit-out-{leg}"
        for p in (idx_path, out_path):
            shutil.rmtree(p, ignore_errors=True)
        t0 = time.perf_counter()
        write_neardup_index(minhash_band_index(corpus), idx_path, n_buckets)
        seed_s = time.perf_counter() - t0
        idx_bytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(idx_path)
            for f in fs
        )
        leg_report = {
            "batch_docs": batch_docs,
            "n_buckets": n_buckets,
            "seed_index_s": round(seed_s, 2),
            "index_at_rest_mb": round(idx_bytes / 1e6, 1),
            "batches": {},
        }
        group_of = {}
        for b in range(3):
            batch = (
                corpus.filter(
                    (F.col("doc_id") >= b * batch_docs)
                    & (F.col("doc_id") < (b + 1) * batch_docs)
                )
                .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
                .localCheckpoint()  # batch bytes don't pollute input_mb
            )
            name = f"admit_{leg}_{b}"
            sc.setJobGroup(name, name)
            t0 = time.perf_counter()
            neardup_admit_batch(
                batch, idx_path, out_path, batch_id=b, n_buckets=n_buckets
            )
            wall = time.perf_counter() - t0
            leg_report["batches"][name] = {"wall_s": round(wall, 2)}
            group_of[name] = name
            print(f"  {name}: {wall:.1f}s", file=sys.stderr)
        metrics = stage_metrics(port, app_id, group_of)
        for name in group_of:
            leg_report["batches"][name].update(metrics.get(name, {}))
        pairs = spark.read.parquet(out_path)
        leg_report["pairs_emitted"] = pairs.count()
        leg_report["pair_batches"] = pairs.select("ingest_batch").distinct().count()
        report[leg] = leg_report
    return report


def cmd_longstream(spark, port, app_id, n_batches: int = 12) -> dict:
    """Round-12 (VERDICT r11 ask #5): the LONG-stream admission claim —
    per-batch read cost stays FLAT after 4× more batches than the
    round-11 measurement (12 batches of 100 docs vs 3), and the index
    never fragments: files per touched bucket stay exactly 1 after
    every merge (the repartition("kbucket") guard), so there is
    nothing for compaction to do on the in-repo writers — verified by
    asserting compact_bucketed_store() returns [] at the end.  Pruned
    leg configuration from the r11 measurement (n_buckets=4096)."""
    import shutil

    from pyspark.sql import functions as F

    from sparksent.streaming import (
        compact_bucketed_store,
        minhash_band_index,
        neardup_admit_batch,
        write_neardup_index,
    )

    if not os.path.isdir(f"{X20_BASE}/documents.parquet"):
        from tools.scale_demo import generate

        generate(spark, X20_BASE)
    corpus = spark.read.parquet(f"{X20_BASE}/documents.parquet").select(
        "doc_id", "text"
    )
    sc = spark.sparkContext
    batch_docs, n_buckets = 100, 4096
    idx_path = "/tmp/sparksent-admit-idx-long"
    out_path = "/tmp/sparksent-admit-out-long"
    for p in (idx_path, out_path):
        shutil.rmtree(p, ignore_errors=True)
    write_neardup_index(minhash_band_index(corpus), idx_path, n_buckets)

    def max_files_per_bucket() -> int:
        worst = 0
        for entry in os.listdir(idx_path):
            if entry.startswith("kbucket="):
                d = os.path.join(idx_path, entry)
                worst = max(
                    worst, sum(1 for f in os.listdir(d) if f.endswith(".parquet"))
                )
        return worst

    report = {"batch_docs": batch_docs, "n_buckets": n_buckets, "batches": {}}
    group_of = {}
    for b in range(n_batches):
        batch = (
            corpus.filter(
                (F.col("doc_id") >= b * batch_docs)
                & (F.col("doc_id") < (b + 1) * batch_docs)
            )
            .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
            .localCheckpoint()
        )
        name = f"long_{b}"
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        neardup_admit_batch(
            batch, idx_path, out_path, batch_id=b, n_buckets=n_buckets
        )
        report["batches"][name] = {
            "wall_s": round(time.perf_counter() - t0, 2),
            "max_files_per_bucket": max_files_per_bucket(),
            "index_mb": round(
                sum(
                    os.path.getsize(os.path.join(r, f))
                    for r, _, fs in os.walk(idx_path)
                    for f in fs
                )
                / 1e6,
                1,
            ),
        }
        group_of[name] = name
        print(f"  {name}: {report['batches'][name]}", file=sys.stderr)
    metrics = stage_metrics(port, app_id, group_of)
    for name in group_of:
        report["batches"][name].update(metrics.get(name, {}))
    report["pairs_emitted"] = spark.read.parquet(out_path).count()
    report["compaction_offenders"] = compact_bucketed_store(
        spark, idx_path, max_files_per_bucket=4
    )
    return report


def cmd_r12ops(spark, port, app_id) -> dict:
    """Round-12 linearity check for this round's changes: the fused
    multimodal keep-set (one decode pass + pointer-doubling CC) and
    sample_domain_quota at ×1 (sf0.1, 5k docs) vs ×20 (100k docs) —
    the claims being ~linear wall, shuffle tracking candidate pairs
    (not corpus bytes), and the CC round count staying logarithmic in
    component diameter however the corpus grows."""
    if not os.path.isdir(f"{X20_BASE}/documents.parquet"):
        from tools.scale_demo import generate

        generate(spark, X20_BASE)
    from sparksent.registry import queries

    qs = queries()
    names = ["dedup_multimodal_keep_set", "sample_domain_quota"]
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()
    report = {}
    for tag, base in (("x1", SF_DIR_X1), ("x20", X20_BASE)):
        fns = {f"{n}_{tag}": (lambda n=n, b=base: qs[n](spark, b)) for n in names}
        report[tag] = _run_measured(spark, fns, port, app_id)
    return report


def cmd_annrecall(spark, port, app_id) -> dict:
    """Round-12 (VERDICT r11 ask #7): recall-at-scale evidence for the
    quantized ANN family.  At ×20 (40k embeddings — 20× the sf0.1
    corpus the registered queries run on), measure recall@5 against
    exact brute force for the 10-query set:

    - ``similarity_topk_ivf_trained`` across nprobe = 1, 2, 4, 8
      (cells self-scale ~sqrt(N) via n_centroids_for, so the probe
      fraction per rung is nprobe/K of the corpus);
    - ``similarity_topk_sq8`` across refine = 10, 40, 160 (the
      exact-re-rank budget per query).

    The claim this pins: recall is a TUNABLE of probe/refine budget
    that holds at 20× the fixture size — recall 1.0 at sf0.1 alone is
    weak evidence for the 100× story."""
    from pyspark.sql import functions as F

    from sparksent.ext import similarity

    if not os.path.isdir(f"{X20_BASE}/embeddings.parquet"):
        from tools.scale_demo import generate

        generate(spark, X20_BASE)
    emb = spark.read.parquet(f"{X20_BASE}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).localCheckpoint()
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < 10).localCheckpoint()
    k = 5
    # Python-worker warm-up (the Arrow dot) so rung walls compare
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()
    t0 = time.perf_counter()
    truth = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(emb, queries, k=k).collect()
    }
    brute_s = round(time.perf_counter() - t0, 2)
    report = {"corpus_rows": n, "k": k, "brute_wall_s": brute_s,
              "n_truth": len(truth), "ivf_trained": {}, "sq8": {}}
    kc = similarity.n_centroids_for(n)
    for nprobe in (1, 2, 4, 8):
        t0 = time.perf_counter()
        got = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ivf_trained_topk(
                emb, queries, k=k, nprobe=nprobe, n_centroids=kc
            ).collect()
        }
        report["ivf_trained"][f"nprobe={nprobe}"] = {
            "recall": round(len(got & truth) / len(truth), 3),
            "wall_s": round(time.perf_counter() - t0, 2),
            "probe_fraction": round(nprobe / kc, 4),
        }
        print(f"  ivf nprobe={nprobe}: {report['ivf_trained'][f'nprobe={nprobe}']}",
              file=sys.stderr)
    for refine in (10, 40, 160):
        t0 = time.perf_counter()
        got = {
            (r.query_id, r.neighbor_id)
            for r in similarity.sq8_refine_topk(
                emb, queries, k=k, refine=refine
            ).collect()
        }
        report["sq8"][f"refine={refine}"] = {
            "recall": round(len(got & truth) / len(truth), 3),
            "wall_s": round(time.perf_counter() - t0, 2),
        }
        print(f"  sq8 refine={refine}: {report['sq8'][f'refine={refine}']}",
              file=sys.stderr)
    return report


def cmd_r11ops(spark, port, app_id) -> dict:
    """Round-11 linearity check for the round-10/11 registrations:
    run each at x1 (sf0.1, 5k docs) and x20 (100k docs) and record
    wall / shuffle / rows / skew — the claim being ~linear wall and
    shuffle tracking candidate output, never corpus^2."""
    if not os.path.isdir(f"{X20_BASE}/documents.parquet"):
        from tools.scale_demo import generate

        generate(spark, X20_BASE)
    from sparksent.registry import queries

    qs = queries()
    names = [
        "dedup_image_phash",
        "dedup_audio_fingerprint",
        "dedup_video_framehash",
        "dedup_span_extents",
        "multimodal_embed_topk",
    ]
    # Python-worker warm-up (Arrow path) so x1 rows aren't charged for it
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()
    report = {}
    for tag, base in (("x1", SF_DIR_X1), ("x20", X20_BASE)):
        fns = {f"{n}_{tag}": (lambda n=n, b=base: qs[n](spark, b)) for n in names}
        report[tag] = _run_measured(spark, fns, port, app_id)
    return report


def cmd_r11ops2(spark, port, app_id) -> dict:
    """Round-11 continuation linearity check for the session's three
    new registrations (dedup_winnowing, similarity_topk_sq8,
    dedup_span_rewrite): x1 (sf0.1) vs x20 (100k docs / 40k vectors),
    wall / shuffle / rows / skew — winnowing's claim is the ~2/(w+1)
    winnowed index keeping the pair stage planted-pairs-linear; SQ8's
    that the integer search scales with corpus x queries and the float
    stage stays bounded; the rewrite's that covered-index work tracks
    DUPLICATED positions, not the corpus."""
    if not os.path.isdir(f"{X20_BASE}/documents.parquet"):
        from tools.scale_demo import generate

        generate(spark, X20_BASE)
    from sparksent.registry import queries

    qs = queries()
    names = [
        "dedup_winnowing",
        "similarity_topk_sq8",
        "dedup_span_rewrite",
        # second wave of the continuation session (x20 lineitem = 12M rows)
        "graph_kcore_parts",
        "epoch_shuffle_batches",
    ]
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()
    report = {}
    for tag, base in (("x1", SF_DIR_X1), ("x20", X20_BASE)):
        fns = {f"{n}_{tag}": (lambda n=n, b=base: qs[n](spark, b)) for n in names}
        report[tag] = _run_measured(spark, fns, port, app_id)
    return report


def cmd_ivfpq_rest(spark, port, app_id) -> dict:
    """IVF-PQ split into its production phases at x20: INGEST (train
    cells + PQ-code the corpus + persist the index: cells, codes,
    centroid frame, codebook — all parquet) vs SEARCH-ONLY (probe
    ranking + LUT build + candidate/code join + ADC rank reading ONLY
    the at-rest index, no raw corpus vectors).  The registered query
    times all phases fused (nothing is at rest in a one-shot query);
    this measures the claim that coding is a once-per-corpus cost and
    the per-query-batch search is cheap and code-only."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sparksent.ext.iterative import _kmeans_fit, _scaled_vec
    from sparksent.ext.similarity import (
        NPROBE,
        PQ_N_CENT,
        PQ_SUB_DIM,
        n_centroids_for,
        pq_assignments,
    )

    if not os.path.isdir(f"{X20_BASE}/embeddings.parquet"):
        from tools.scale_demo import generate

        generate(spark, X20_BASE)
    emb = spark.read.parquet(f"{X20_BASE}/embeddings.parquet")
    n = emb.count()
    k = n_centroids_for(n)
    base = "/tmp/sparksent-ivfpq-rest"
    os.makedirs(base, exist_ok=True)

    t0 = time.perf_counter()
    final, cents = _kmeans_fit(emb, k, 2, "vec_id", "embedding")
    final.select(F.col("id").alias("neighbor_id"), F.col("cl").alias("cell")) \
        .write.mode("overwrite").partitionBy("cell").parquet(f"{base}/cells")
    pq_assignments(emb, PQ_SUB_DIM, PQ_N_CENT).select(
        F.col("id").alias("neighbor_id"), "sub", F.col("b.cent").alias("cent")
    ).write.mode("overwrite").parquet(f"{base}/codes")
    cents.write.mode("overwrite").parquet(f"{base}/cents")
    ingest_s = time.perf_counter() - t0

    sc = spark.sparkContext
    queries = emb.filter(F.col("vec_id") < 10).localCheckpoint()
    codebook = emb.filter(F.col("vec_id") < PQ_N_CENT).select(
        F.col("vec_id").alias("cent"),
        F.posexplode(_scaled_vec("embedding")).alias("pos", "c"),
    ).localCheckpoint()  # 16 x 64 rows — part of the at-rest index

    def search():
        cents_r = spark.read.parquet(f"{base}/cents")
        qxs = queries.select(
            F.col("vec_id").cast("long").alias("query_id"),
            _scaled_vec("embedding").alias("v"),
        )
        per = (
            qxs.select("query_id", F.posexplode("v").alias("pos", "x"))
            .join(F.broadcast(cents_r), "pos")
            .groupBy("query_id", "j")
            .agg(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).alias("d"))
        )
        wq = Window.partitionBy("query_id").orderBy("d", "j")
        probes = (
            per.withColumn("crank", F.row_number().over(wq))
            .filter(F.col("crank") <= NPROBE)
            .select("query_id", F.col("j").alias("cell"))
        )
        lut = (
            qxs.select("query_id", F.posexplode("v").alias("pos", "x"))
            .join(F.broadcast(codebook), "pos")
            .groupBy(
                "query_id",
                F.expr(f"CAST(pos div {PQ_SUB_DIM} AS BIGINT)").alias("sub"),
                "cent",
            )
            .agg(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).alias("d"))
        )
        cand = (
            spark.read.parquet(f"{base}/cells")
            .join(F.broadcast(probes), "cell")
            .filter(F.col("neighbor_id") != F.col("query_id"))
        )
        adc = (
            cand.join(spark.read.parquet(f"{base}/codes"), "neighbor_id")
            .join(F.broadcast(lut), ["query_id", "sub", "cent"])
            .groupBy("query_id", "neighbor_id")
            .agg(F.sum("d").cast("long").alias("adc_d"))
        )
        w = Window.partitionBy("query_id").orderBy("adc_d", "neighbor_id")
        return (
            adc.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("query_id", "neighbor_id", "rank", "adc_d")
        )

    search().write.mode("overwrite").format("noop").save()  # warm-up
    sc.setJobGroup("ivfpq_search", "ivfpq_search")
    t0 = time.perf_counter()
    df = search()
    df.write.mode("overwrite").format("noop").save()
    search_s = time.perf_counter() - t0
    rows = df.count()
    m = stage_metrics(port, app_id, {"ivfpq_search": "ivfpq_search"})
    return {
        "corpus": n,
        "cells": k,
        "ingest_s": round(ingest_s, 2),
        "search_only_s": round(search_s, 2),
        "rows_out": rows,
        **m.get("ivfpq_search", {}),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "part", choices=["hotkey", "neardup", "x80", "ivfpq_rest", "admission", "r11ops", "r11ops2", "annserve", "longstream", "annrecall", "r12ops"]
    )
    ap.add_argument("--batches", type=int, default=12,
                    help="longstream soak length (VERDICT r12 ask #9: 48)")
    args = ap.parse_args()
    spark = build_session()
    sc = spark.sparkContext
    port = int(sc.uiWebUrl.rsplit(":", 1)[1]) if sc.uiWebUrl else 4050
    report = {
        "hotkey": cmd_hotkey,
        "neardup": cmd_neardup,
        "x80": cmd_x80,
        "ivfpq_rest": cmd_ivfpq_rest,
        "admission": cmd_admission,
        "r11ops": cmd_r11ops,
        "r11ops2": cmd_r11ops2,
        "annserve": cmd_annserve,
        "longstream": cmd_longstream,
        "annrecall": cmd_annrecall,
        "r12ops": cmd_r12ops,
    }
    if args.part == "longstream":
        report = report[args.part](spark, port, sc.applicationId, args.batches)
    else:
        report = report[args.part](spark, port, sc.applicationId)
    print(json.dumps({args.part: report}, indent=1))


if __name__ == "__main__":
    main()
