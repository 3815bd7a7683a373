"""Learned quality classifier — a fastText-style hashed-feature
linear probe trained by exact-integer full-batch gradient descent.

Rule gates (Gopher, CCNet tiers — ``ext/curation.py``) are one half of
real curation; the other half is a LEARNED classifier (the GPT-3
quality filter, CCNet's fastText, FineWeb-Edu's distilled scorer).
The standard industrial move is DISTILLATION: run an expensive gate
on a slice, train a cheap linear probe to imitate it, score the whole
corpus with the probe.  This module implements that distributed
training shape with the repo's oracle-exactness discipline:

- **Features**: hashed bag-of-words COUNTS — token -> one of
  ``N_BUCKETS`` buckets by the shared md5-derived ``h28`` hash (the
  cross-engine hash), value = occurrence count (counts, not presence:
  the fixture corpus' 31-token vocabulary saturates presence bits,
  measured AUC 0.46; counts carry the distribution and reach 0.88).
- **Labels**: the Gopher rule gate's own ``pass`` bit
  (``textstats.gopher_quality_gate``) — the distillation law; the
  probe must reconstruct the gate from hashed counts alone.
- **Training**: ``EPOCHS`` rounds of full-batch squared-loss GD, ALL
  arithmetic integer.  Weights live in micro-units; the per-round
  gradient ``g_j = sum_d (pred_d - y_d*1e6) * x_dj`` is an integer
  sum (order-insensitive — shuffle-proof); the learning-rate division
  is SIGN-EXPLICIT (``-((-g) div den)`` for negative g) so both
  engines floordiv positives only — the repo's div-parity rule.
  ``den = n_docs * Lmax`` where ``Lmax = max_d ||x_d||^2`` is computed
  IN-PLAN (one aggregate, mirrored as an oracle CTE):
  ``lambda_max(X^T X) <= trace <= n_docs * Lmax``, so the step is
  inside the classical stability bound for EVERY corpus — no tuning.

Corpus-scale split (the bpe/unigram discipline): per epoch one scan
of the localCheckpoint-pinned feature frame joined with broadcast
weights + doc-error frames, and a map-side-combined aggregate down to
``N_BUCKETS`` rows; only the bounded weight vector crosses to the
driver (the BPE merge-table precedent).  Overflow headroom: |err| <=
~1e6 and counts are doc-length-bounded, so |g_j| <= ~1e6 * total
token mass of the j-bucket — BIGINT-safe far past fixture scale; at
extreme corpus sizes the same loop shards the gradient aggregate
without changing semantics.

Measured on the sf0.01 fixture: AUC 0.88, accuracy-at-1/2 0.79
against a 0.776 pass prior — the probe genuinely ranks (the
separation is pinned in tests, not just the arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import h28, h28_sql
from .textstats import gopher_quality_gate, gopher_quality_gate_sql

N_BUCKETS = 4096
Y_SCALE = 1_000_000
EPOCHS = 8


def _sdiv(g: int, den: int) -> int:
    """Sign-explicit positive floordiv — the exact operation the SQL
    CASE mirrors (and for positives, Spark div == DuckDB //)."""
    return -((-g) // den) if g < 0 else g // den


def doc_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, bucket, c): hashed-token occurrence counts per doc."""
    return (
        docs.select(
            "doc_id",
            F.explode(F.split(F.col(text_col), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select("doc_id", (h28(F.col("tok")) % N_BUCKETS).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )


def doc_labels(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, y): the distillation label — the Gopher gate's pass
    bit over the same documents."""
    gate = gopher_quality_gate(docs.select("doc_id", F.col(text_col).alias("text")))
    return gate.select("doc_id", F.col("pass").cast("long").alias("y"))


def _train(feat: DataFrame, lab: DataFrame) -> dict[int, int]:
    """The exact-integer GD loop: {bucket: weight_micro} after EPOCHS
    full-batch rounds.  Per round one distributed gradient aggregate
    (<= N_BUCKETS rows) crosses to the driver; the update is
    driver-side over the bounded weight vector.  den = n_docs * Lmax
    comes from one aggregate over the feature frame (module
    docstring)."""
    spark = feat.sparkSession
    stats = (
        feat.groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("l2"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.max("l2").cast("long").alias("lmax"),
        )
        .collect()[0]
    )
    den = stats.n_docs * stats.lmax
    w: dict[int, int] = {}
    for _ in range(EPOCHS):
        if w:
            wdf = F.broadcast(
                spark.createDataFrame(
                    [(b, v) for b, v in sorted(w.items())], "bucket long, wv long"
                )
            )
            preds = (
                feat.join(wdf, "bucket")
                .groupBy("doc_id")
                .agg(F.sum(F.col("wv") * F.col("c")).cast("long").alias("pred"))
            )
            err = lab.join(preds, "doc_id", "left").select(
                "doc_id",
                (
                    F.coalesce(F.col("pred"), F.lit(0))
                    - F.col("y") * F.lit(Y_SCALE)
                ).alias("e"),
            )
        else:
            err = lab.select(
                "doc_id", (-F.col("y") * F.lit(Y_SCALE)).alias("e")
            )
        # err is hinted shuffle_hash (build side): the planner otherwise
        # BROADCASTS feat — a corpus-derived frame whose RDD stats read
        # small (the round-6 hazard; collected to the driver and shipped
        # once PER EPOCH).  Both sides are doc_id-co-partitioned RDDs
        # (_pinned_inputs), so the SHJ inserts no Exchange and builds
        # only the one-row-per-doc err partition.
        grad_rows = (
            feat.join(err.hint("shuffle_hash"), "doc_id")
            .groupBy("bucket")
            .agg(F.sum(F.col("e") * F.col("c")).cast("long").alias("g"))
            .collect()
        )
        for r in grad_rows:
            w[r.bucket] = w.get(r.bucket, 0) - _sdiv(r.g, den)
    return w


def _pinned_inputs(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """feat and lab pinned HASH-PARTITIONED ON doc_id (round 17, guide
    §2.4): every epoch job aggregates preds by doc_id, left-joins lab
    with preds on doc_id, and joins feat with err on doc_id — three
    doc_id-keyed operations per epoch that each re-Exchanged the
    feature frame when the pin carried the groupBy's (doc_id, bucket)
    partitioning.  One extra compact shuffle at pin time (the feature
    frame is already aggregated to distinct (doc, bucket) rows) makes
    all EPOCHS x 3 of them exchange-free; only the <= N_BUCKETS-row
    gradient aggregate still shuffles.  Per-doc_id load is bounded by
    construction (<= min(N_BUCKETS, doc tokens) feature rows, 1 label
    row), so the pinned_by skew caveat is satisfied.

    The pin's partition count is SIZE-DERIVED, not the session
    shuffle-partition constant (guide §2.2: partitions in the
    100 MB - 1 GB band; scope rule: scale-dependent settings
    parameterised with sane local defaults).  ~65k docs per partition
    x <= ~64 distinct feature rows/doc x ~50 B/row ~= 200 MB, capped
    at the session's shuffle partitions (the cluster-sized knob at
    scale) and FLOORED AT 2: Spark does not record a 1-partition hash
    partitioning on the checkpointed RDD (measured: the epoch plan
    re-Exchanges at n=1, and is exchange-free at any n >= 2).
    Measured A/B at sf0.1 (alternating x4 in one session, identical
    weights asserted): plain-pin 5.42 s median, pinned at the
    session's 32 partitions 6.88 s (32 overhead-dominated tasks per
    epoch stage on ~90 KB), size-derived n=2 3.91 s / n=4 3.97 s —
    the co-partitioned loop wins locally AND at scale once the
    partition count tracks the data.

    The label pin also keeps the round-16 property: every epoch's
    gradient job joins `lab`, and an unpinned frame re-runs the WHOLE
    Gopher gate (a regex-heavy corpus scan) once per epoch — 9 gate
    passes for an 8-epoch train (guide §1.2; measured 10.2 s -> see
    OPTIMIZATION_r16.md)."""
    from ..tables import pinned

    spark = docs.sparkSession
    cap = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    n_parts = max(2, min(cap, docs.count() // 65536 + 1))
    return (
        pinned(doc_features(docs).repartition(n_parts, F.col("doc_id"))),
        pinned(doc_labels(docs).repartition(n_parts, F.col("doc_id"))),
    )


def quality_probe_train(docs: DataFrame) -> DataFrame:
    """(bucket, weight_micro): the trained weight vector — the
    auditable model artifact (fastText publishes exactly this)."""
    feat, lab = _pinned_inputs(docs)
    w = _train(feat, lab)
    return docs.sparkSession.createDataFrame(
        [(b, v) for b, v in sorted(w.items())],
        "bucket long, weight_micro long",
    )


def quality_probe_score(docs: DataFrame) -> DataFrame:
    """(doc_id, y, score_micro, pred_pass): every document scored by
    the trained probe; pred_pass = score > 1/2 in micro-units.  The
    scoring pass is the feature scan joined with the BROADCAST weight
    vector + one map-side-combined per-doc aggregate — the shape that
    gates a 100 TB corpus in one pass."""
    # same doc_id-co-partitioned pins as quality_probe_train; the final
    # scoring aggregate and the lab outer join below are then
    # exchange-free too
    feat, lab = _pinned_inputs(docs)
    w = _train(feat, lab)
    wdf = F.broadcast(
        docs.sparkSession.createDataFrame(
            [(b, v) for b, v in sorted(w.items())], "bucket long, wv long"
        )
    )
    scores = (
        feat.join(wdf, "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("wv") * F.col("c")).cast("long").alias("score_micro"))
    )
    return lab.join(scores, "doc_id", "left").select(
        "doc_id",
        "y",
        F.coalesce(F.col("score_micro"), F.lit(0)).alias("score_micro"),
        (F.coalesce(F.col("score_micro"), F.lit(0)) * 2 > Y_SCALE).alias(
            "pred_pass"
        ),
    )


# ---------------------------------------------------------------------------
# oracle SQL — the unrolled epochs
# ---------------------------------------------------------------------------


def _sdiv_sql(g: str, den: str) -> str:
    return (
        f"(CASE WHEN {g} < 0 THEN -((-({g})) // ({den}))"
        f" ELSE ({g}) // ({den}) END)"
    )


def _train_ctes_sql(table: str, text_col: str) -> tuple[str, str]:
    """(CTE chain, final-weights CTE name): epochs unrolled; weight /
    feature frames MATERIALIZED (multiply referenced)."""
    parts = [
        f"""feat AS MATERIALIZED (
      SELECT doc_id,
             ({h28_sql("tok")} % {N_BUCKETS}) AS bucket,
             count(*)::BIGINT AS c
      FROM (
        SELECT doc_id, unnest(string_split({text_col}, ' ')) AS tok
        FROM {table}
      ) WHERE tok <> ''
      GROUP BY 1, 2
    )""",
        f"""lab AS MATERIALIZED (
      SELECT doc_id, "pass"::BIGINT AS y
      FROM ({gopher_quality_gate_sql(table)}) gate
    )""",
        """den AS (
      SELECT (count(*)::BIGINT * max(l2))::BIGINT AS d
      FROM (SELECT doc_id, sum(c * c)::BIGINT AS l2 FROM feat GROUP BY 1)
    )""",
    ]
    prev_w = None
    for ep in range(1, EPOCHS + 1):
        if prev_w is None:
            parts.append(
                f"""err{ep} AS (
          SELECT doc_id, (-y * {Y_SCALE})::BIGINT AS e FROM lab
        )"""
            )
        else:
            parts.append(
                f"""pred{ep} AS (
          SELECT f.doc_id, sum(w.wv * f.c)::BIGINT AS pred
          FROM feat f JOIN {prev_w} w USING (bucket)
          GROUP BY f.doc_id
        ),
        err{ep} AS (
          SELECT l.doc_id,
                 (coalesce(p.pred, 0) - l.y * {Y_SCALE})::BIGINT AS e
          FROM lab l LEFT JOIN pred{ep} p USING (doc_id)
        )"""
            )
        parts.append(
            f"""grad{ep} AS (
          SELECT f.bucket, sum(e.e * f.c)::BIGINT AS g
          FROM feat f JOIN err{ep} e USING (doc_id)
          GROUP BY f.bucket
        )"""
        )
        upd = _sdiv_sql("g.g", "(SELECT d FROM den)")
        if prev_w is None:
            parts.append(
                f"""w{ep} AS MATERIALIZED (
          SELECT bucket, (-{upd})::BIGINT AS wv FROM grad{ep} g
        )"""
            )
        else:
            parts.append(
                f"""w{ep} AS MATERIALIZED (
          SELECT coalesce(w.bucket, g.bucket) AS bucket,
                 (coalesce(w.wv, 0) - coalesce({upd}, 0))::BIGINT AS wv
          FROM {prev_w} w FULL OUTER JOIN grad{ep} g USING (bucket)
        )"""
            )
        prev_w = f"w{ep}"
    return ",\n".join(parts), prev_w


def quality_probe_train_sql(table: str = "documents", text_col: str = "text") -> str:
    chain, wname = _train_ctes_sql(table, text_col)
    return f"""
    WITH {chain}
    SELECT bucket, wv AS weight_micro FROM {wname}
    """


def quality_probe_score_sql(table: str = "documents", text_col: str = "text") -> str:
    chain, wname = _train_ctes_sql(table, text_col)
    return f"""
    WITH {chain},
    scores AS (
      SELECT f.doc_id, sum(w.wv * f.c)::BIGINT AS score_micro
      FROM feat f JOIN {wname} w USING (bucket)
      GROUP BY f.doc_id
    )
    SELECT l.doc_id, l.y,
           coalesce(s.score_micro, 0)::BIGINT AS score_micro,
           (coalesce(s.score_micro, 0) * 2 > {Y_SCALE}) AS pred_pass
    FROM lab l LEFT JOIN scores s USING (doc_id)
    """
