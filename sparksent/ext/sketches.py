"""Sketch + deterministic-sampling operators for corpus-scale profiling.

Reference scope: traubad/FlinkSentimentAnalysis has no sketches; these
are the "training-data pipeline at 100 TB" extensions (SURVEY.md §7.1
M5 family) where exact global aggregates stop being affordable:

- ``hll_distinct``: a HyperLogLog distinct-count sketch expressed in
  pure relational algebra, cross-engine **bit-exact** (no libm, no
  float accumulation — see below). Register state is 256 small ints
  per group; both aggregates are map-side combinable, so the shuffle
  carries ~256 rows per (group, partition) instead of the raw values.
- ``bernoulli_sample``: deterministic hash-threshold sampling — a pure
  scan-side filter (no shuffle, no RNG state, reproducible across
  retries/speculative tasks, which ``rand()`` sampling is not).
- ``stratified_sample``: exact per-group top-k by hash order in TWO
  phases (local per-salt top-k, then global top-k) so no single
  reducer ever sees a whole hot group — the one-window form has a
  per-group straggler at 100 TB.

Cross-engine exactness strategy for HLL (FIXTURES.md §C spirit):
the usual estimator ``alpha*m^2 / sum(2^-M_j)`` sums negative powers
of two in float — order-sensitive once registers differ by > 53. We
instead sum ``2^(53 - M_j)`` as BIGINT (M_j <= 53, 256 registers:
max sum < 2^62 — exact, order-insensitive), and divide the float
constant ``alpha*m^2*2^53`` (one literal, identical in both plans) by
that integer: one float op, identical operands, identical result.
The standard small/large-range corrections need ``ln`` (libm — not
bit-portable); production applies them driver-side on the returned
scalar state (n_zero is emitted for exactly that purpose).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .hashing import h60, h60_sql

HLL_P = 8  # 2^8 = 256 registers
HLL_M = 1 << HLL_P
HLL_REST_BITS = 60 - HLL_P  # h60 yields 60 hash bits
# alpha_256 * m^2 * 2^(REST_BITS + 1): the numerator of the estimator,
# computed once here and embedded as the SAME literal in both engines.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
HLL_NUMER = HLL_ALPHA * HLL_M * HLL_M * float(1 << (HLL_REST_BITS + 1))

# ln(m/V) for V in 1..m, computed ONCE in Python and embedded as
# literals in both engines' plans (linear-counting correction; see
# hll_sliding_distinct) — the lookup sidesteps java-vs-libm log.
import math as _math

_LC_LN = {v: _math.log(HLL_M / v) for v in range(1, HLL_M + 1)}


def _rho(rest: F.Column) -> F.Column:
    """Position (1-based) of the leftmost 1-bit in the REST_BITS-wide
    field, via binary-string length — integer-exact in both engines
    (probed: Spark ``length(bin(x))`` == DuckDB ``length(bin(x))``)."""
    return F.when(
        rest > 0, F.lit(HLL_REST_BITS + 1) - F.length(F.bin(rest))
    ).otherwise(F.lit(HLL_REST_BITS + 1))


def hll_distinct(
    df: DataFrame, group_col: str, value_col: str, with_exact: bool = True
) -> DataFrame:
    """Per-group HLL distinct estimate of ``value_col``.

    Plan shape: two map-side-combined hash aggregates —
    (group, bucket) -> max(rho), then group -> integer register sum.
    Nothing wider than 256 rows per group ever shuffles. The optional
    ``exact_distinct`` column (a real count-distinct, i.e. the
    expensive thing the sketch replaces) is joined on for accuracy
    reporting at test SFs; drop it at production scale.
    """
    h = h60(F.col(value_col).cast("string"))
    regs = (
        df.select(
            F.col(group_col).alias("grp"),
            (h % HLL_M).alias("bucket"),
            _rho(F.shiftright(h, HLL_P)).alias("rho"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("mj"))
    )
    shift = f"shiftleft(cast(1 as bigint), cast({HLL_REST_BITS + 1} - mj as int))"
    per_grp = regs.groupBy("grp").agg(
        F.count("*").alias("n_present"),
        F.sum(F.expr(shift)).alias("sum_present"),
    )
    n_zero = F.lit(HLL_M) - F.col("n_present")
    sum_scaled = (
        F.col("sum_present") + n_zero * F.lit(1 << (HLL_REST_BITS + 1))
    ).alias("sum_scaled")
    est = (F.lit(HLL_NUMER) / sum_scaled).alias("est_hll")
    out = per_grp.select(
        F.col("grp").alias(group_col),
        n_zero.cast("int").alias("n_zero"),
        sum_scaled,
        est,
    )
    if with_exact:
        exact = df.groupBy(F.col(group_col)).agg(
            F.countDistinct(value_col).alias("exact_distinct")
        )
        out = out.join(F.broadcast(exact), group_col)
    return out


def hll_distinct_sql(
    table: str, group_col: str, value_col: str, with_exact: bool = True
) -> str:
    h = h60_sql(f"{value_col}::VARCHAR")
    rb = HLL_REST_BITS
    exact_cte = (
        f", exact AS (SELECT {group_col} AS grp, "
        f"count(DISTINCT {value_col}) AS exact_distinct FROM {table} GROUP BY 1)"
        if with_exact
        else ""
    )
    exact_sel = ", exact.exact_distinct" if with_exact else ""
    exact_join = " JOIN exact USING (grp)" if with_exact else ""
    return f"""
    WITH hashed AS (
      SELECT {group_col} AS grp, h % {HLL_M} AS bucket, h >> {HLL_P} AS rest
      FROM (SELECT {group_col}, {h} AS h FROM {table})
    ),
    regs AS (
      SELECT grp, bucket,
             max(CASE WHEN rest > 0 THEN {rb + 1} - length(bin(rest))
                      ELSE {rb + 1} END) AS mj
      FROM hashed GROUP BY 1, 2
    ),
    per_grp AS (
      SELECT grp, count(*) AS n_present,
             sum(1::BIGINT << ({rb + 1} - mj))::BIGINT AS sum_present
      FROM regs GROUP BY 1
    ){exact_cte}
    SELECT grp AS {group_col},
           ({HLL_M} - n_present)::INT AS n_zero,
           sum_present + ({HLL_M} - n_present) * (1::BIGINT << {rb + 1})
             AS sum_scaled,
           {HLL_NUMER!r} / (sum_present
             + ({HLL_M} - n_present) * (1::BIGINT << {rb + 1})) AS est_hll
           {exact_sel}
    FROM per_grp{exact_join}
    """


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

CM_D = 4  # hash rows
CM_W = 64  # counters per row


def _cm_probes(item: F.Column) -> F.Column:
    """The d (row, bucket) probe pairs for an item — row i hashes
    ``"i:<item>"`` so the d hash functions are independent md5 slices,
    reproducible in SQL."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row_i"),
                (h60(F.concat(F.lit(f"{i}:"), item.cast("string"))) % CM_W).alias(
                    "bucket"
                ),
            )
            for i in range(CM_D)
        ]
    )


def cm_heavy_hitters(df: DataFrame, item_col: str, k: int = 20) -> DataFrame:
    """Count-Min sketch (d=4, w=64) frequency estimates next to true
    counts for the top-k items — ``cm_est >= true_n`` always, with the
    overestimate bounded by collisions (N/w per row, min over d rows).

    Plan shape: the sketch builds in ONE pass — explode each occurrence
    into its d probes, then a map-side-combined aggregate whose key
    space is d*w = 256, so every map task emits at most 256 partial
    rows regardless of input size. The 256-row counter table broadcasts
    back onto the candidate probes; candidates here are the exact
    per-item counts (also the truth column — at production scale the
    candidate set comes from a sample or a threshold, and the exact
    count side is dropped; the sketch is what remains affordable).
    Integer-only: bit-exact across engines.
    """
    counters = (
        df.select(F.explode(_cm_probes(F.col(item_col))).alias("rb"))
        .select("rb.row_i", "rb.bucket")
        .groupBy("row_i", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    items = df.groupBy(item_col).agg(F.count("*").alias("true_n"))
    probes = items.select(
        item_col, "true_n", F.explode(_cm_probes(F.col(item_col))).alias("rb")
    ).select(item_col, "true_n", "rb.row_i", "rb.bucket")
    return (
        probes.join(F.broadcast(counters), ["row_i", "bucket"])
        .groupBy(item_col, "true_n")
        .agg(F.min("cnt").alias("cm_est"))
        .orderBy(F.col("true_n").desc(), item_col)
        .limit(k)
    )


def cm_heavy_hitters_sql(table: str, item_col: str, k: int = 20) -> str:
    h = h60_sql(f"row_i::VARCHAR || ':' || {item_col}::VARCHAR")
    rows = ", ".join(str(i) for i in range(CM_D))
    return f"""
    WITH occ AS (
      SELECT {item_col}, row_i, {h} % {CM_W} AS bucket
      FROM {table} CROSS JOIN (SELECT unnest([{rows}]) AS row_i)
    ),
    counters AS (
      SELECT row_i, bucket, count(*) AS cnt FROM occ GROUP BY 1, 2
    ),
    items AS (
      SELECT {item_col}, count(*) AS true_n FROM {table} GROUP BY 1
    ),
    probes AS (
      SELECT {item_col}, true_n, row_i, {h} % {CM_W} AS bucket
      FROM items CROSS JOIN (SELECT unnest([{rows}]) AS row_i)
    )
    SELECT {item_col}, true_n, min(cnt) AS cm_est
    FROM probes JOIN counters USING (row_i, bucket)
    GROUP BY 1, 2
    ORDER BY true_n DESC, {item_col}
    LIMIT {k}
    """


# ---------------------------------------------------------------------------
# deterministic sampling
# ---------------------------------------------------------------------------

SAMPLE_MOD = 1_000_000


def bernoulli_sample(
    df: DataFrame, key_col: str, rate_ppm: int, cols: list[str]
) -> DataFrame:
    """Keep rows whose md5-derived hash of ``key_col`` lands below
    ``rate_ppm``/1e6 — a deterministic Bernoulli sample. Pure per-row
    filter at the scan: no shuffle, no RNG, stable under task retries
    and across engines (unlike ``df.sample``, whose per-partition RNG
    ties results to the physical split)."""
    keep = (h60(F.col(key_col).cast("string")) % SAMPLE_MOD) < rate_ppm
    return df.filter(keep).select(*cols)


def bernoulli_sample_sql(
    table: str, key_col: str, rate_ppm: int, cols: list[str]
) -> str:
    h = h60_sql(f"{key_col}::VARCHAR")
    return (
        f"SELECT {', '.join(cols)} FROM {table} "
        f"WHERE {h} % {SAMPLE_MOD} < {rate_ppm}"
    )


def stratified_sample(
    df: DataFrame, group_col: str, key_col: str, k: int, n_salt: int = 32
) -> DataFrame:
    """Exact per-group sample of the k smallest hash values (a fixed-k
    stratified sample that every engine reproduces). Two-phase so no
    reducer sorts a whole group: phase 1 ranks within (group, salt)
    partitions and keeps k candidates per salt (>= the true global
    top-k by pigeonhole), phase 2 ranks the <= k*n_salt survivors per
    group. At 100 TB the single-window form makes one task per group
    sort the entire group; here the per-reducer working set is bounded
    by group_size/n_salt, then k*n_salt.
    """
    hk = h60(F.col(key_col).cast("string"))
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(key_col).alias("key"),
        hk.alias("hk"),
        (hk % n_salt).alias("salt"),
    )
    w1 = Window.partitionBy("grp", "salt").orderBy("hk", "key")
    w2 = Window.partitionBy("grp").orderBy("hk", "key")
    return (
        base.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= k)
        .withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .select(
            F.col("grp").alias(group_col), F.col("key").alias(key_col), "rk"
        )
    )


def stratified_sample_sql(table: str, group_col: str, key_col: str, k: int) -> str:
    """Oracle: the single-window form — semantically identical to the
    two-phase plan (phase 1 only discards rows that cannot be in the
    global per-group top-k)."""
    h = h60_sql(f"{key_col}::VARCHAR")
    return f"""
    SELECT {group_col}, {key_col}, rk FROM (
      SELECT {group_col}, {key_col},
             row_number() OVER (PARTITION BY {group_col}
                                ORDER BY {h}, {key_col}) AS rk
      FROM {table})
    WHERE rk <= {k}
    """


def weighted_ticket_sample(
    df: DataFrame, key_col: str, weight: F.Column, k: int
) -> DataFrame:
    """Weighted sampling without replacement with INTEGER weights, done
    exactly in integer arithmetic: a row with weight w holds w lottery
    tickets h(key, 1..w); its sampling key is the smallest ticket, and
    the k rows with the smallest keys win — equivalent to drawing
    without replacement from the expanded ticket pool, with zero
    floating point (the float A-Res scheme — u^(1/w) — needs pow/log,
    which are not bit-portable across engines).

    Scale: ticket keys are computed at the scan (w <= a few md5s per
    row, no explode); the global top-k is a TakeOrdered — per-partition
    heaps of size k, never a full sort shuffle.
    """
    kc = F.col(key_col).cast("string")
    key = F.array_min(
        F.transform(
            F.sequence(F.lit(1), weight),
            lambda j: h60(F.concat(F.lit("wsamp:"), kc, F.lit(":"), j.cast("string"))),
        )
    )
    return (
        df.withColumn("w", weight.cast("long"))
        .withColumn("key", key)
        .orderBy("key", key_col)
        .limit(k)
    )


def weighted_ticket_sample_sql(
    table: str, key_col: str, weight_sql: str, k: int, cols: list[str]
) -> str:
    h = h60_sql(f"'wsamp:'||{key_col}||':'||j")
    return f"""
    SELECT {', '.join(cols)}, w, key FROM (
      SELECT *, CAST({weight_sql} AS BIGINT) AS w,
             list_min([{h} FOR j IN generate_series(1, {weight_sql})]) AS key
      FROM {table})
    ORDER BY key, {key_col} LIMIT {k}
    """


def group_split(
    df: DataFrame,
    group_col: str,
    pct_train: int = 80,
    pct_valid: int = 10,
) -> DataFrame:
    """Leakage-free train/valid/test assignment: the hash BUCKET is
    computed from the group key (e.g. user_id), so every row of a group
    lands in the same split — the standard guard against train/test
    contamination when rows of one entity correlate. Deterministic
    md5 bucketing (no RNG, engine-portable); pure scan-side column."""
    bucket = h60(F.concat(F.lit("split:"), F.col(group_col).cast("string"))) % 100
    return df.withColumn(
        "split",
        F.when(bucket < pct_train, "train")
        .when(bucket < pct_train + pct_valid, "valid")
        .otherwise("test"),
    )


def group_split_bucket_sql(group_col: str, pct_train: int = 80, pct_valid: int = 10) -> str:
    h = h60_sql(f"'split:'||{group_col}")
    return (
        f"CASE WHEN {h} % 100 < {pct_train} THEN 'train' "
        f"WHEN {h} % 100 < {pct_train + pct_valid} THEN 'valid' "
        f"ELSE 'test' END"
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi-join pruning (explicit runtime-filter pattern)
# ---------------------------------------------------------------------------

BLOOM_BITS = 16384  # m: filter size in bits (512 x 32-bit words)
BLOOM_WORD = 32  # bits per word; 32 keeps every mask positive in a long
BLOOM_K = 4  # hash functions


def _bloom_positions(key: F.Column) -> list[F.Column]:
    return [
        h60(F.concat(F.lit(f"bloom{j}:"), key.cast("string"))) % BLOOM_BITS
        for j in range(BLOOM_K)
    ]


def _pow2_long(k: F.Column) -> F.Column:
    """2^k as a long for 0 <= k < 32 (exact: powers of two are exactly
    representable and F.shiftleft only takes literal shift amounts)."""
    return F.pow(F.lit(2.0), k.cast("double")).cast("long")


def bloom_build(df: DataFrame, key_col: str) -> DataFrame:
    """Build a Bloom filter over a key column as ONE row holding a
    map<word_idx, bits>: per-row bit positions explode map-side, the
    distinct-position set collapses through a map-side-combined bit_or
    aggregate (<= m/32 = 512 rows on the wire), and the final row is
    broadcast-sized (~4 KiB) regardless of input row count."""
    pos = F.explode(F.array(*_bloom_positions(F.col(key_col)))).alias("pos")
    words = (
        df.select(pos)
        .select(
            (F.col("pos") / BLOOM_WORD).cast("int").alias("word_idx"),
            _pow2_long(F.col("pos") % BLOOM_WORD).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word_idx", "bits"))).alias(
            "bloom"
        )
    )


def bloom_prefilter(df: DataFrame, key_col: str, bloom: DataFrame) -> DataFrame:
    """Keep rows whose key MIGHT be in the built set (no false
    negatives): all k bits present. The bloom broadcasts as one row;
    the probe is a scan-side flat expression (md5 + map lookup + bit
    test), so rows failing the filter never reach any shuffle — the
    explicit form of the runtime row-level filtering Spark applies
    adaptively, here made deterministic and plan-visible."""
    out = df.crossJoin(F.broadcast(bloom))
    cond = F.lit(True)
    for p in _bloom_positions(F.col(key_col)):
        widx = (p / BLOOM_WORD).cast("int")
        mask = _pow2_long(p % BLOOM_WORD)
        cond = cond & (
            F.coalesce(F.try_element_at("bloom", widx), F.lit(0))
            .bitwiseAND(mask)
            != 0
        )
    return out.filter(cond).drop("bloom")


# ---------------------------------------------------------------------------
# mergeable histogram quantile sketch
# ---------------------------------------------------------------------------

QSKETCH_BINS = 4096


def hist_quantiles(
    df: DataFrame, value_col: str, qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99)
) -> DataFrame:
    """Quantile estimates from a fixed-width histogram sketch: one
    min/max/count pass, one bounded (<= QSKETCH_BINS rows) bin-count
    aggregate, linear interpolation inside the rank's bin. The per-task
    state is a bounded bin array that merges by addition — the property
    that lets this run as a single map-side-combined pass at any scale,
    where exact quantiles would need a full sort. Error is bounded by
    the bin width ((max-min)/4096); every arithmetic step uses the same
    IEEE operations on both engines, so the ESTIMATE itself is
    bit-exact against the oracle (approximate vs the true quantile,
    exact as a computation)."""
    v = F.col(value_col)
    stats = df.agg(
        F.min(v).alias("lo"), F.max(v).alias("hi"), F.count("*").alias("n")
    )
    width = (F.col("hi") - F.col("lo")) / QSKETCH_BINS
    binned = (
        df.crossJoin(F.broadcast(stats))
        .select(
            F.least(
                F.lit(QSKETCH_BINS - 1),
                F.floor((v - F.col("lo")) / width).cast("int"),
            ).alias("bin")
        )
    )
    cum = (
        binned.groupBy("bin")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "cum",
            F.sum("c").over(
                Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    ranks = (
        df.sparkSession.range(1)
        .select(F.explode(F.array(*[F.lit(q) for q in qs])).alias("q"))
        .crossJoin(F.broadcast(stats))
        .select("q", "lo", "hi", "n", F.ceil(F.col("q") * F.col("n")).alias("r"))
    )
    w2 = (F.col("hi") - F.col("lo")) / QSKETCH_BINS
    return (
        cum.join(
            F.broadcast(ranks),
            (F.col("cum") >= F.col("r")) & (F.col("cum") - F.col("c") < F.col("r")),
        )
        .select(
            "q",
            "r",
            (
                F.col("lo")
                + w2 * F.col("bin")
                + w2 * (F.col("r") - (F.col("cum") - F.col("c"))) / F.col("c")
            ).alias("est"),
        )
    )


def hist_quantiles_sql(
    table: str, value_col: str, qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99)
) -> str:
    qlist = ", ".join(repr(q) for q in qs)
    b = QSKETCH_BINS
    return f"""
    WITH stats AS (
      SELECT min({value_col}) AS lo, max({value_col}) AS hi, count(*) AS n
      FROM {table}),
    binned AS (
      SELECT least({b - 1},
                   CAST(floor(({value_col} - lo) / ((hi - lo) / {b})) AS INT))
               AS bin
      FROM {table}, stats),
    cum AS (
      SELECT bin, c, sum(c) OVER (ORDER BY bin) AS cum
      FROM (SELECT bin, count(*) AS c FROM binned GROUP BY 1)),
    ranked AS (
      SELECT q, CAST(ceil(q * n) AS BIGINT) AS r, lo, hi FROM
        (SELECT unnest([{qlist}]) AS q), stats)
    SELECT q, r,
           lo + ((hi - lo) / {b}) * bin
              + ((hi - lo) / {b}) * (r - (cum - c)) / c AS est
    FROM cum JOIN ranked ON cum >= r AND cum - c < r
    """


def hll_merge_rollup(
    df: DataFrame, group_col: str, sub_col: F.Column, value_col: str
) -> DataFrame:
    """The property that makes sketches OLAP-cube material: HLL
    registers MERGE losslessly (register-wise max is associative), so a
    coarse rollup computed from pre-aggregated fine-grained sketches is
    bit-identical to one computed from raw data. Here: per-(group, day)
    register tables max-merge up to per-group and the estimate is
    emitted beside an independently computed direct per-group estimate
    — ``merge_exact`` proves equality. At 100 TB this is the difference
    between re-scanning the corpus per rollup level and reusing
    day-partition sketch tables (256 rows per partition per group)."""
    h = h60(F.col(value_col).cast("string"))
    base = df.select(
        F.col(group_col).alias("grp"),
        sub_col.alias("sub"),
        (h % HLL_M).alias("bucket"),
        _rho(F.shiftright(h, HLL_P)).alias("rho"),
    )
    fine = base.groupBy("grp", "sub", "bucket").agg(F.max("rho").alias("mj"))
    merged = fine.groupBy("grp", "bucket").agg(F.max("mj").alias("mj"))
    direct = base.groupBy("grp", "bucket").agg(F.max("rho").alias("mj"))

    def estimate(regs: DataFrame, tag: str) -> DataFrame:
        shift = f"shiftleft(cast(1 as bigint), cast({HLL_REST_BITS + 1} - mj as int))"
        per = regs.groupBy("grp").agg(
            F.count("*").alias("n_present"),
            F.sum(F.expr(shift)).alias("sum_present"),
        )
        scaled = F.col("sum_present") + (
            F.lit(HLL_M) - F.col("n_present")
        ) * F.lit(1 << (HLL_REST_BITS + 1))
        return per.select(
            "grp",
            scaled.alias(f"sum_scaled_{tag}"),
            (F.lit(HLL_NUMER) / scaled).alias(f"est_{tag}"),
        )

    m = estimate(merged, "merged")
    d = estimate(direct, "direct")
    return (
        m.join(d, "grp")
        .select(
            F.col("grp").alias(group_col),
            "sum_scaled_merged",
            "est_merged",
            "est_direct",
            (F.col("sum_scaled_merged") == F.col("sum_scaled_direct")).alias(
                "merge_exact"
            ),
        )
    )


def hll_merge_rollup_sql(
    table: str, group_col: str, sub_sql: str, value_col: str
) -> str:
    h = h60_sql(f"{value_col}::VARCHAR")
    rb = HLL_REST_BITS
    return f"""
    WITH base AS (
      SELECT grp, sub,
             h % {HLL_M} AS bucket,
             CASE WHEN (h >> {HLL_P}) > 0
                  THEN {rb + 1} - length(bin(h >> {HLL_P}))
                  ELSE {rb + 1} END AS rho
      FROM (SELECT {group_col} AS grp, {sub_sql} AS sub, {h} AS h
            FROM {table})),
    fine AS (SELECT grp, sub, bucket, max(rho) AS mj
             FROM base GROUP BY 1, 2, 3),
    merged AS (SELECT grp, bucket, max(mj) AS mj FROM fine GROUP BY 1, 2),
    direct AS (SELECT grp, bucket, max(rho) AS mj FROM base GROUP BY 1, 2),
    est_m AS (
      SELECT grp,
             sum(1::BIGINT << ({rb + 1} - mj))::BIGINT
               + ({HLL_M} - count(*)) * (1::BIGINT << {rb + 1}) AS sum_scaled
      FROM merged GROUP BY 1),
    est_d AS (
      SELECT grp,
             sum(1::BIGINT << ({rb + 1} - mj))::BIGINT
               + ({HLL_M} - count(*)) * (1::BIGINT << {rb + 1}) AS sum_scaled
      FROM direct GROUP BY 1)
    SELECT m.grp AS {group_col},
           m.sum_scaled AS sum_scaled_merged,
           {HLL_NUMER!r} / m.sum_scaled AS est_merged,
           {HLL_NUMER!r} / d.sum_scaled AS est_direct,
           m.sum_scaled = d.sum_scaled AS merge_exact
    FROM est_m m JOIN est_d d USING (grp)
    """


def hll_finalize(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Registers -> estimate (the read-time half of a stored-sketch
    layout; pairs with ``streaming_hll_registers`` and any register
    table produced by ``hll_distinct``'s first aggregate). Input needs
    columns ``mj`` plus the grouping columns."""
    shift = f"shiftleft(cast(1 as bigint), cast({HLL_REST_BITS + 1} - mj as int))"
    per = regs.groupBy(*group_cols).agg(
        F.count("*").alias("n_present"),
        F.sum(F.expr(shift)).alias("sum_present"),
    )
    scaled = F.col("sum_present") + (
        F.lit(HLL_M) - F.col("n_present")
    ) * F.lit(1 << (HLL_REST_BITS + 1))
    return per.select(
        *group_cols,
        scaled.alias("sum_scaled"),
        (F.lit(HLL_NUMER) / scaled).alias("est_hll"),
    )


def hll_sliding_distinct(
    df: DataFrame,
    value_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Rolling ``window_days``-day distinct counts per day — the classic
    OLAP problem distinct counts cannot answer by summation, solved the
    way production systems do: daily HLL REGISTER tables, then a
    register-wise max over a RANGE window frame (max is associative, so
    the frame merge is a true sketch union). The frame runs over a
    dense (day x 256-bucket) grid so a bucket's register carries into
    days where it saw no new data. The EXACT rolling distinct is
    computed alongside (each (day, value) pair explodes to the
    window_days target days it serves — precisely the blow-up the
    sketch exists to avoid) so every row shows estimate vs truth.

    Scale: the raw stage is one (day, bucket) partial-max aggregate —
    256 rows per day regardless of corpus size; the window runs on the
    days x 256 grid (tiny). The exact side is fixture-scale
    self-demonstration; at 100 TB you keep only the register path."""
    from .hashing import h60

    day = F.expr(f"CAST(unix_micros({ts_col}) div 86400000000 AS BIGINT)")
    h = h60(F.col(value_col).cast("string"))
    base = df.select(
        day.alias("day"),
        (h % HLL_M).alias("bucket"),
        _rho(F.shiftright(h, HLL_P)).alias("rho"),
    )
    # lazy pin: the register table is 256 rows/day and has TWO
    # consumers (the grid join + the day domain below) — and deriving
    # the day domain from `daily` instead of `base` drops the second
    # corpus scan entirely (same day set: a day is in `daily` iff it
    # had a row in `base`).  One corpus pass total for the sketch path
    # (guide §1.2/§2.4).
    daily = (
        base.groupBy("day", "bucket")
        .agg(F.max("rho").alias("mj"))
        .localCheckpoint(eager=False)
    )
    days = daily.select("day").distinct()
    spark = df.sparkSession
    buckets = spark.range(HLL_M).select(F.col("id").cast("long").alias("bucket"))
    grid = days.crossJoin(F.broadcast(buckets))
    w = (
        Window.partitionBy("bucket")
        .orderBy("day")
        .rangeBetween(-(window_days - 1), 0)
    )
    g = (
        grid.join(daily, ["day", "bucket"], "left")
        .withColumn("mj7", F.max("mj").over(w))
    )
    shift = (
        f"shiftleft(cast(1 as bigint), cast({HLL_REST_BITS + 1} - mj7 as int))"
    )
    per_day = g.groupBy("day").agg(
        F.count("mj7").cast("long").alias("n_present"),
        F.coalesce(
            F.sum(F.when(F.col("mj7").isNotNull(), F.expr(shift))), F.lit(0)
        )
        .cast("long")
        .alias("sum_present"),
    )
    scaled = F.col("sum_present") + (F.lit(HLL_M) - F.col("n_present")) * F.lit(
        1 << (HLL_REST_BITS + 1)
    )
    # Small-cardinality (linear counting) correction, cross-engine
    # bit-exact by construction: ln(m/V) has only m possible inputs
    # (V = zero-register count in 1..m), so both engines read the SAME
    # Python-computed lookup table — no libm divergence. Standard HLL
    # switching rule: raw <= 2.5 m and V > 0 -> m * ln(m/V).
    lut = F.array(*[F.lit(_LC_LN[v]) for v in range(1, HLL_M + 1)])
    raw = F.lit(HLL_NUMER) / scaled
    n_zero = F.lit(HLL_M) - F.col("n_present")
    est = per_day.select(
        "day",
        "n_present",
        scaled.cast("long").alias("sum_scaled"),
        F.when(
            (n_zero > 0) & (raw <= F.lit(2.5 * HLL_M)),
            F.lit(float(HLL_M)) * F.element_at(lut, n_zero.cast("int")),
        )
        .otherwise(raw)
        .alias("est_hll"),
    )
    dv = df.select(day.alias("day"), F.col(value_col).alias("v")).distinct()
    contrib = (
        dv.select(
            F.explode(
                F.sequence(F.col("day"), F.col("day") + (window_days - 1))
            ).alias("day"),
            "v",
        )
        .distinct()
        .groupBy("day")
        .agg(F.count("*").cast("long").alias("n_exact"))
    )
    return (
        est.join(contrib, "day")
        .select("day", "n_present", "sum_scaled", "est_hll", "n_exact")
    )


def hll_sliding_distinct_sql(
    table: str = "events",
    value_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> str:
    h = h60_sql(f"{value_col}::VARCHAR")
    rb = HLL_REST_BITS
    wd = window_days
    lut_sql = ", ".join(repr(_LC_LN[v]) for v in range(1, HLL_M + 1))
    return f"""
    WITH base AS (
      SELECT epoch_us({ts_col}) // 86400000000 AS day,
             h % {HLL_M} AS bucket,
             CASE WHEN (h >> {HLL_P}) > 0
                  THEN {rb + 1} - length(bin(h >> {HLL_P}))
                  ELSE {rb + 1} END AS rho
      FROM (SELECT {ts_col}, {h} AS h FROM {table})
    ),
    daily AS (SELECT day, bucket, max(rho) AS mj FROM base GROUP BY 1, 2),
    grid AS (
      SELECT d.day, b.bucket
      FROM (SELECT DISTINCT day FROM base) d
      CROSS JOIN (SELECT unnest(range(0, {HLL_M})) AS bucket) b
    ),
    g AS (
      SELECT grid.day, grid.bucket,
             max(daily.mj) OVER (PARTITION BY grid.bucket ORDER BY grid.day
                                 RANGE BETWEEN {wd - 1} PRECEDING
                                       AND CURRENT ROW) AS mj7
      FROM grid LEFT JOIN daily USING (day, bucket)
    ),
    per_day AS (
      SELECT day, count(mj7)::BIGINT AS n_present,
             coalesce(sum(CASE WHEN mj7 IS NOT NULL
                          THEN 1::BIGINT << ({rb + 1} - mj7) END), 0)::BIGINT
               AS sum_present
      FROM g GROUP BY 1
    ),
    est AS (
      SELECT day, n_present,
             (sum_present
              + ({HLL_M} - n_present) * (1::BIGINT << {rb + 1}))::BIGINT
               AS sum_scaled,
             CASE WHEN ({HLL_M} - n_present) > 0
                   AND {HLL_NUMER!r} / (sum_present
                       + ({HLL_M} - n_present) * (1::BIGINT << {rb + 1}))
                       <= {2.5 * HLL_M!r}
                  THEN {float(HLL_M)!r} * ([{lut_sql}])[({HLL_M} - n_present)::INT]
                  ELSE {HLL_NUMER!r} / (sum_present
                       + ({HLL_M} - n_present) * (1::BIGINT << {rb + 1}))
             END AS est_hll
      FROM per_day
    ),
    dv AS (SELECT DISTINCT epoch_us({ts_col}) // 86400000000 AS day,
                  {value_col} AS v FROM {table}),
    contrib AS (
      SELECT day, count(*)::BIGINT AS n_exact FROM (
        SELECT DISTINCT unnest(range(day, day + {wd})) AS day, v FROM dv
      ) GROUP BY 1
    )
    SELECT e.day, e.n_present, e.sum_scaled, e.est_hll, c.n_exact
    FROM est e JOIN contrib c USING (day)
    """


# ---------------------------------------------------------------------------
# KMV / theta sketch: distinct counts WITH set-intersection estimation —
# the operation HLL registers cannot give you (register merges only
# express unions; intersections via inclusion-exclusion explode the
# relative error when |A∩B| << |A∪B|).  The k-minimum-values sketch
# (Bar-Yossef et al. 2002; the DataSketches theta sketch) keeps the k
# smallest key hashes per set; the kth value estimates density, and
# membership flags on the UNION's k smallest give a direct intersection
# estimate at theta = v_k / 2^60.
# ---------------------------------------------------------------------------

KMV_K = 64


def _kmv_est(n_col, vk_col, k: int):
    """(k-1) / theta with theta = v_k / 2^60, exact-count fallback when
    the set has fewer than k members (then the "sketch" IS the set).
    One double division on identical operands in both engines; the
    int64 -> double cast of v_k is IEEE round-to-nearest, identical."""
    return F.when(n_col < k, n_col.cast("double")).otherwise(
        F.lit(float((k - 1) * (1 << 60))) / vk_col.cast("double")
    )


def kmv_intersection(
    events: DataFrame,
    type_a: str = "view",
    type_b: str = "purchase",
    type_col: str = "event_type",
    key_col: str = "user_id",
    k: int = KMV_K,
) -> DataFrame:
    """ONE row comparing the KMV estimates against exact counts for two
    keyed sets (users who {type_a}, users who {type_b}): distinct
    estimates for each side, their union, and — the sketch's reason to
    exist — their INTERSECTION (theta form: membership-flag count rho
    on the union's k smallest hashes, divided by theta).  Exact counts
    ride along for accuracy reporting at test SFs, the hll_distinct
    convention.

    Plan/scale: each side's sketch is a distinct + TakeOrderedAndProject
    (distributed top-k by hash — per-partition heads then one bounded
    merge, never a single-reducer global sort); membership flags come
    from a full-outer join of the two distinct-hash sets keyed on the
    hash; every estimator input is a one-row aggregate broadcast into
    the final crossJoin (the one-row-totals pattern).  At 100 TB the
    wire carries distinct hashes (8 B/key) and three k-row sketches."""
    uh = h60(F.col(key_col).cast("string"))
    # ONE corpus pass builds the flagged union directly: group the
    # filtered events by key hash and take max() membership flags —
    # the same (uh, in_a, in_b) rows the previous two-distincts +
    # full-outer-join form produced (in_a = 1 iff the key has a
    # type_a event), but with ONE scan and ONE shuffle instead of six
    # scans and three shuffles (the old frames ua/ub/both each had
    # two consumers, so every reference re-ran its corpus subtree —
    # guide §1.2/§2.4).  The lazy pin makes the four consumers below
    # (union sketch, both side sketches via the membership flags,
    # exact totals) read the one materialization (key-cardinality).
    both = (
        events.filter(F.col(type_col).isin(type_a, type_b))
        .select(
            uh.alias("uh"),
            F.when(F.col(type_col) == type_a, F.lit(1))
            .otherwise(F.lit(0))
            .alias("fa"),
            F.when(F.col(type_col) == type_b, F.lit(1))
            .otherwise(F.lit(0))
            .alias("fb"),
        )
        .groupBy("uh")
        .agg(
            F.max("fa").alias("in_a"),
            F.max("fb").alias("in_b"),
        )
        .localCheckpoint(eager=False)
    )
    # the union sketch carries the membership flags, so rho (members of
    # BOTH sets among the union's k smallest) needs no further join
    sk_u = both.orderBy("uh").limit(k)
    sk_a = both.filter(F.col("in_a") == 1).orderBy("uh").limit(k)
    sk_b = both.filter(F.col("in_b") == 1).orderBy("uh").limit(k)
    agg_u = sk_u.agg(
        F.count("*").alias("nu"),
        F.max("uh").alias("vku"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("rho"),
    )
    agg_a = sk_a.agg(F.count("*").alias("na"), F.max("uh").alias("vka"))
    agg_b = sk_b.agg(F.count("*").alias("nb"), F.max("uh").alias("vkb"))
    exact = both.agg(
        F.count("*").cast("long").alias("n_union_exact"),
        F.sum("in_a").cast("long").alias("n_a_exact"),
        F.sum("in_b").cast("long").alias("n_b_exact"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_inter_exact"),
    )
    inter_est = F.when(
        F.col("nu") < k, F.col("rho").cast("double")
    ).otherwise(
        F.col("rho").cast("double")
        * F.lit(float(1 << 60))
        / F.col("vku").cast("double")
    )
    return (
        exact.crossJoin(F.broadcast(agg_a))
        .crossJoin(F.broadcast(agg_b))
        .crossJoin(F.broadcast(agg_u))
        .select(
            "n_a_exact",
            "n_b_exact",
            "n_union_exact",
            "n_inter_exact",
            F.round(_kmv_est(F.col("na"), F.col("vka"), k), 4).alias("a_est"),
            F.round(_kmv_est(F.col("nb"), F.col("vkb"), k), 4).alias("b_est"),
            F.round(_kmv_est(F.col("nu"), F.col("vku"), k), 4).alias("union_est"),
            F.round(inter_est, 4).alias("inter_est"),
        )
    )


def kmv_intersection_sql(
    table: str = "events",
    type_a: str = "view",
    type_b: str = "purchase",
    type_col: str = "event_type",
    key_col: str = "user_id",
    k: int = KMV_K,
) -> str:
    """DuckDB mirror: identical hashes, identical top-k-by-hash
    sketches, identical one-float-division estimators."""
    est = (
        "(CASE WHEN {n} < " + str(k) + " THEN {n}::DOUBLE "
        "ELSE " + repr(float((k - 1) * (1 << 60))) + " / {vk}::DOUBLE END)"
    )
    return f"""
    WITH ua AS (
      SELECT DISTINCT {h60_sql(f"{key_col}::VARCHAR")} AS uh
      FROM {table} WHERE {type_col} = '{type_a}'
    ),
    ub AS (
      SELECT DISTINCT {h60_sql(f"{key_col}::VARCHAR")} AS uh
      FROM {table} WHERE {type_col} = '{type_b}'
    ),
    mem AS (
      SELECT coalesce(a.uh, b.uh) AS uh,
             CASE WHEN a.uh IS NULL THEN 0 ELSE 1 END AS in_a,
             CASE WHEN b.uh IS NULL THEN 0 ELSE 1 END AS in_b
      FROM ua a FULL JOIN ub b ON a.uh = b.uh
    ),
    sk_u AS (SELECT * FROM mem ORDER BY uh LIMIT {k}),
    sk_a AS (SELECT * FROM ua ORDER BY uh LIMIT {k}),
    sk_b AS (SELECT * FROM ub ORDER BY uh LIMIT {k}),
    agg_u AS (SELECT count(*) AS nu, max(uh) AS vku,
                     sum(in_a * in_b)::BIGINT AS rho FROM sk_u),
    agg_a AS (SELECT count(*) AS na, max(uh) AS vka FROM sk_a),
    agg_b AS (SELECT count(*) AS nb, max(uh) AS vkb FROM sk_b),
    exact AS (
      SELECT count(*)::BIGINT AS n_union_exact,
             sum(in_a)::BIGINT AS n_a_exact,
             sum(in_b)::BIGINT AS n_b_exact,
             sum(in_a * in_b)::BIGINT AS n_inter_exact
      FROM mem)
    SELECT n_a_exact, n_b_exact, n_union_exact, n_inter_exact,
           round({est.format(n='na', vk='vka')}, 4) AS a_est,
           round({est.format(n='nb', vk='vkb')}, 4) AS b_est,
           round({est.format(n='nu', vk='vku')}, 4) AS union_est,
           round(CASE WHEN nu < {k} THEN rho::DOUBLE
                 ELSE rho::DOUBLE * {repr(float(1 << 60))} / vku::DOUBLE END,
                 4) AS inter_est
    FROM exact, agg_a, agg_b, agg_u
    """
