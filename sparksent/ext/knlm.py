"""Interpolated Kneser-Ney trigram LM + per-document perplexity —
the CCNet-style LM filter with every probability and every logarithm
in EXACT INTEGER arithmetic.

CCNet scores documents with a corpus LM's perplexity and keeps the
low-perplexity head; ``lm_bigram_score`` (ext/matching.py) implements
the frequency-ratio shortcut.  This module implements the real thing
— an interpolated Kneser-Ney trigram model (Kneser & Ney 1995, Chen &
Goodman 1999) trained on the corpus itself — under the repo's
oracle-exactness discipline, which required solving two determinism
problems:

1. **Probabilities as integers.**  Every KN level quantizes to parts
   per billion with positive-integer floordiv only (Spark ``div`` ==
   DuckDB ``//`` on positives).  Discount D = 3/4 is absorbed into
   the numerators (``max(c-0.75, 0)/z == (4c-3)/(4z)`` for c >= 1):

   - unigram continuation: ``p1 = (N1+(.w) * S) div N1+(..)``
   - bigram: ``p2 = ((4*N1+(.vw) - 3) * S) div (4 * N1+(.v.))
              + (lam2(v) * p1) div S``,
     ``lam2(v) = (3 * N1+(v.) * S) div (4 * N1+(.v.))``
   - trigram: ``p3 = ((4*c3 - 3) * S) div (4*c2)
              + (lam3(u,v) * p2) div S``,
     ``lam3(u,v) = (3 * N1+(uv.) * S) div (4*c2)``

   All counts come from the trigram TYPE table (N1+ quantities are
   its group sizes — the defining trick of KN).  Floors only ever
   shrink terms, so ``p3 <= S`` always; ``greatest(p3, 1)`` guards
   the (astronomically rare at fixture scale) all-floors-to-zero row.

2. **Logarithms without libm.**  The per-document score is
   ``sum -log2(p3/S)``; instead of ``ln``/``log2`` (libm ulp drift —
   the `bigram_lift` lesson) the log is a FIXED-POINT SHIFT-AND-SQUARE
   integer algorithm: ``ilog = floor(log2 x)`` from the binary-string
   length (``length(bin(x)) - 1``, identical in both engines), the
   20-bit mantissa is squared ``FRAC_BITS`` times emitting one
   fraction bit per squaring.  Every intermediate fits 2^42 and every
   division is by a power of two (exact even through a double, which
   is how the Spark lambda computes it — binary FP is lossless on
   power-of-two divides below 2^53).  Result: log2 in 1/1024-bit
   units, bit-identical across Spark, DuckDB, and the Python
   reference ``_log2fp`` (property-tested).  The Spark side runs the
   loop as ONE ``F.aggregate`` over a literal sequence — constant
   plan size (the bpe fold-depth lesson: a chained-withColumn form
   would CollapseProject into a 2^10-term expression).

Plan shape (100 TB): the corpus-sized stages are the (doc, trigram)
tf aggregate and the final per-doc score aggregate — both map-side
combined.  Every model frame in between lives on the trigram-TYPE
domain (vocab-bounded here, broadcastable; at open-web scale the
same joins co-partition on their gram keys — noted per join).
Overflow headroom: ``(4*c3 - 3) * S`` requires c3 < 2.3e9; beyond
that (a single trigram seen 2.3 billion times) drop S to 1e6 or
split the multiply — a documented constant change, not a redesign.

Scoring-vs-training note: the model is trained ON the corpus it
scores (CCNet trains on Wikipedia and scores CommonCrawl; the fixture
has one corpus — self-scoring is the same plan with two table
parameters, and the oracle takes ``train_table``/``score_table`` to
make that explicit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import word_grams

S = 1_000_000_000  # probability scale: parts per billion
K = 20  # mantissa bits
FRAC_BITS = 10  # log2 fraction bits -> 1/1024-bit units
LOG_UNIT = 1 << FRAC_BITS


def _log2fp(x: int) -> int:
    """Python reference of the fixed-point log2 (tests + the LG_S
    constant); both engine forms are bit-identical to this."""
    assert x >= 1
    ilog = x.bit_length() - 1
    m = (x << K) // (1 << ilog)
    acc = 0
    for _ in range(FRAC_BITS):
        m = (m * m) >> K
        if m >= 1 << (K + 1):
            acc = acc * 2 + 1
            m >>= 1
        else:
            acc *= 2
    return ilog * LOG_UNIT + acc


LG_S = _log2fp(S)  # log2(S) in 1/1024-bit units — the zero point


def _log2fp_col(x: F.Column) -> F.Column:
    """The same algorithm as a constant-size Spark expression: ilog
    from bin-string length, then FRAC_BITS squarings via ONE aggregate
    over a literal sequence (runtime loop — no expression blowup).
    Divisions are by powers of two through doubles: exact below 2^53
    (module docstring)."""
    ilog = (F.length(F.bin(x)) - 1).cast("long")
    m0 = F.floor((x * F.lit(1 << K)) / F.pow(F.lit(2.0), ilog)).cast("long")
    init = F.struct(m0.alias("m"), F.lit(0).cast("long").alias("acc"))

    def step(a: F.Column, _: F.Column) -> F.Column:
        m2 = F.floor((a["m"] * a["m"]) / F.lit(float(1 << K))).cast("long")
        hi = m2 >= F.lit(1 << (K + 1))
        return F.struct(
            F.when(hi, F.floor(m2 / F.lit(2.0)).cast("long"))
            .otherwise(m2)
            .alias("m"),
            F.when(hi, a["acc"] * 2 + 1).otherwise(a["acc"] * 2).alias("acc"),
        )

    folded = F.aggregate(
        F.sequence(F.lit(1), F.lit(FRAC_BITS)), init, step
    )
    return ilog * F.lit(LOG_UNIT) + folded["acc"]


def _doc_trigrams(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, gram, tf): per-doc trigram term frequencies."""
    return (
        docs.select(
            "doc_id", F.explode(word_grams(text_col, 3)).alias("gram")
        )
        .groupBy("doc_id", "gram")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def kn_trigram_perplexity(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_trigrams, nll_millibits, bits_per_tok_milli): every
    document's negative log-likelihood under the corpus-trained
    interpolated-KN trigram LM, in 1/1024-bit units; docs with < 3
    tokens carry the -1 sentinel (0 would claim a perfect score).
    bits_per_tok_milli is the CCNet gate key — low = head tier."""
    doc_tri = _doc_trigrams(docs, text_col).localCheckpoint()
    g = F.split(F.col("gram"), " ")
    tri = (
        doc_tri.groupBy("gram")
        .agg(F.sum("tf").cast("long").alias("c3"))
        .select(
            "gram",
            g.getItem(0).alias("u"),
            g.getItem(1).alias("v"),
            g.getItem(2).alias("w"),
            "c3",
        )
        .localCheckpoint()  # feeds ctx2 + bgt + the p3 join
    )
    ctx2 = tri.groupBy("u", "v").agg(
        F.sum("c3").cast("long").alias("c2"),
        F.count("*").cast("long").alias("n1p_uv"),
    )
    bgt = (
        tri.groupBy("v", "w")
        .agg(F.count("*").cast("long").alias("n1_vw"))
        .localCheckpoint()  # feeds vstats + uni + n1_all + the p2 join
    )
    vstats = bgt.groupBy("v").agg(
        F.sum("n1_vw").cast("long").alias("n1_ctx_v"),
        F.count("*").cast("long").alias("n1_v_dot"),
    )
    uni = bgt.groupBy("w").agg(F.count("*").cast("long").alias("n1_dot_w"))
    n1_all = bgt.agg(F.count("*").cast("long").alias("n1_all"))
    # bigram-level KN over the continuation counts (all frames here
    # are <= bigram-type cardinality; broadcast at fixture, gram-key
    # co-partition at open-web scale)
    p2 = (
        bgt.join(F.broadcast(vstats), "v")
        .join(F.broadcast(uni), "w")
        .crossJoin(F.broadcast(n1_all))
        .select(
            "v",
            "w",
            F.expr(
                f"CAST(((4 * n1_vw - 3) * CAST({S} AS BIGINT))"
                f" div (4 * n1_ctx_v)"
                f" + (((3 * n1_v_dot * CAST({S} AS BIGINT))"
                f"     div (4 * n1_ctx_v))"
                f"    * ((n1_dot_w * CAST({S} AS BIGINT)) div n1_all))"
                f"   div CAST({S} AS BIGINT) AS BIGINT)"
            ).alias("p2q"),
        )
    )
    p3 = (
        tri.join(F.broadcast(ctx2), ["u", "v"])
        .join(F.broadcast(p2), ["v", "w"])
        .select(
            "gram",
            F.expr(
                f"CAST(((4 * c3 - 3) * CAST({S} AS BIGINT)) div (4 * c2)"
                f" + (((3 * n1p_uv * CAST({S} AS BIGINT)) div (4 * c2))"
                f"    * p2q) div CAST({S} AS BIGINT) AS BIGINT)"
            ).alias("p3q"),
        )
        .select(
            "gram",
            (
                F.lit(LG_S) - _log2fp_col(F.greatest(F.col("p3q"), F.lit(1)))
            ).alias("bits_milli"),
        )
    )
    per_doc = (
        doc_tri.join(F.broadcast(p3), "gram")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_trigrams"),
            F.sum(F.col("tf") * F.col("bits_milli"))
            .cast("long")
            .alias("nll_millibits"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_trigrams", F.lit(0)).cast("long").alias("n_trigrams"),
            F.coalesce("nll_millibits", F.lit(-1))
            .cast("long")
            .alias("nll_millibits"),
            F.when(F.col("n_trigrams").isNull(), F.lit(-1))
            .otherwise(
                F.expr("CAST(nll_millibits div n_trigrams AS BIGINT)")
            )
            .cast("long")
            .alias("bits_per_tok_milli"),
        )
    )


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------


def _log2fp_ctes(src: str, x: str, carry: str) -> tuple[str, str]:
    """Chained-CTE DuckDB form of the fixed-point log2 over relation
    ``src``: input expression ``x``, carried columns ``carry``; ends in
    a CTE exposing (carry, lg) — linear chain, one reference each."""
    parts = [
        f"""lg0 AS (
      SELECT {carry}, length(bin({x})) - 1 AS ilog,
             (({x}) * {1 << K}) // (1::BIGINT << (length(bin({x})) - 1)) AS m,
             0::BIGINT AS acc
      FROM {src}
    )"""
    ]
    prev = "lg0"
    for i in range(1, FRAC_BITS + 1):
        parts.append(
            f"""lgs{i} AS (
      SELECT {carry}, ilog, (m * m) // {1 << K} AS m2, acc FROM {prev}
    ),
    lg{i} AS (
      SELECT {carry}, ilog,
             CASE WHEN m2 >= {1 << (K + 1)} THEN m2 // 2 ELSE m2 END AS m,
             CASE WHEN m2 >= {1 << (K + 1)} THEN acc * 2 + 1
                  ELSE acc * 2 END AS acc
      FROM lgs{i}
    )"""
        )
        prev = f"lg{i}"
    parts.append(
        f"""lgout AS (
      SELECT {carry}, (ilog * {LOG_UNIT} + acc)::BIGINT AS lg FROM {prev}
    )"""
    )
    return ",\n".join(parts), "lgout"


def kn_trigram_perplexity_sql(
    table: str = "documents", text_col: str = "text"
) -> str:
    toks = f"string_split({text_col}, ' ')"
    grams = (
        f"[array_to_string({toks}[i:i+2], ' ')"
        f" FOR i IN generate_series(1, len({toks}) - 2)]"
    )
    lg_chain, lg_out = _log2fp_ctes("p3", "greatest(p3q, 1)", "gram")
    return f"""
    WITH doc_tri AS MATERIALIZED (
      SELECT doc_id, gram, count(*)::BIGINT AS tf FROM (
        SELECT doc_id,
               unnest(CASE WHEN len({toks}) >= 3 THEN {grams}
                      ELSE [] END) AS gram
        FROM {table}
      ) GROUP BY 1, 2
    ),
    tri AS MATERIALIZED (
      SELECT gram,
             string_split(gram, ' ')[1] AS u,
             string_split(gram, ' ')[2] AS v,
             string_split(gram, ' ')[3] AS w,
             sum(tf)::BIGINT AS c3
      FROM doc_tri GROUP BY gram
    ),
    ctx2 AS (
      SELECT u, v, sum(c3)::BIGINT AS c2, count(*)::BIGINT AS n1p_uv
      FROM tri GROUP BY 1, 2
    ),
    bgt AS MATERIALIZED (
      SELECT v, w, count(*)::BIGINT AS n1_vw FROM tri GROUP BY 1, 2
    ),
    vstats AS (
      SELECT v, sum(n1_vw)::BIGINT AS n1_ctx_v, count(*)::BIGINT AS n1_v_dot
      FROM bgt GROUP BY 1
    ),
    uni AS (
      SELECT w, count(*)::BIGINT AS n1_dot_w FROM bgt GROUP BY 1
    ),
    nall AS (SELECT count(*)::BIGINT AS n1_all FROM bgt),
    p2 AS (
      SELECT b.v, b.w,
             (((4 * b.n1_vw - 3) * {S}::BIGINT) // (4 * s.n1_ctx_v)
              + (((3 * s.n1_v_dot * {S}::BIGINT) // (4 * s.n1_ctx_v))
                 * ((un.n1_dot_w * {S}::BIGINT) // na.n1_all))
                // {S}::BIGINT)::BIGINT AS p2q
      FROM bgt b
      JOIN vstats s USING (v)
      JOIN uni un USING (w)
      CROSS JOIN nall na
    ),
    p3 AS (
      SELECT t.gram,
             (((4 * t.c3 - 3) * {S}::BIGINT) // (4 * c.c2)
              + (((3 * c.n1p_uv * {S}::BIGINT) // (4 * c.c2)) * p.p2q)
                // {S}::BIGINT)::BIGINT AS p3q
      FROM tri t
      JOIN ctx2 c ON t.u = c.u AND t.v = c.v
      JOIN p2 p ON t.v = p.v AND t.w = p.w
    ),
    {lg_chain},
    bits AS (
      SELECT gram, ({LG_S} - lg)::BIGINT AS bits_milli FROM {lg_out}
    ),
    per_doc AS (
      SELECT d.doc_id, sum(d.tf)::BIGINT AS n_trigrams,
             sum(d.tf * b.bits_milli)::BIGINT AS nll_millibits
      FROM doc_tri d JOIN bits b USING (gram)
      GROUP BY 1
    )
    SELECT t.doc_id,
           coalesce(p.n_trigrams, 0)::BIGINT AS n_trigrams,
           coalesce(p.nll_millibits, -1)::BIGINT AS nll_millibits,
           (CASE WHEN p.n_trigrams IS NULL THEN -1
                 ELSE p.nll_millibits // p.n_trigrams END)::BIGINT
             AS bits_per_tok_milli
    FROM {table} t LEFT JOIN per_doc p USING (doc_id)
    """


# ---------------------------------------------------------------------------
# domain reweighting from excess LM loss (DoReMi-flavored)
# ---------------------------------------------------------------------------

EXCESS_EPS_MILLI = 1  # uniform-fallback floor, in milli-bits


def domain_excess_weights(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(source, n_docs, n_trigrams, bits_per_tok_milli, excess_milli,
    weight_ppm): domain mixture weights tilted toward EXCESS LM loss —
    the DoReMi idea (Xie et al. 2023: upweight domains whose loss
    exceeds a reference model's, i.e. hard-but-underfit data)
    collapsed to its one-model form: the corpus-trained KN trigram LM
    is the reference, a domain's excess is its bits/token above the
    corpus-wide mean, and weights are the excess (+1 milli-bit floor,
    so all-zero excess degrades to uniform) normalized to ppm.  The
    full group-DRO proxy-training loop is out of scope and documented
    as such — this is the deterministic reweighting STEP that loop
    iterates.

    All arithmetic positive-integer: per-domain and corpus bits are
    BIGINT floordivs of millibit sums over trigram counts; weights are
    one more floordiv over the excess totals.  Sentinel docs
    (< 3 tokens) are excluded from every sum on both engines.

    100 TB shape: rides the per-doc KN scores (the heavy, already
    scale-shaped stage); the rollup is one map-side-combined aggregate
    at domain cardinality plus two broadcast scalars."""
    scored = kn_trigram_perplexity(docs, text_col).filter(F.col("n_trigrams") > 0)
    dom = (
        docs.select("doc_id", "source")
        .join(scored, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_trigrams").cast("long").alias("n_trigrams"),
            F.sum("nll_millibits").cast("long").alias("nll"),
        )
        .select(
            "source",
            "n_docs",
            "n_trigrams",
            F.expr("CAST(nll div n_trigrams AS BIGINT)").alias(
                "bits_per_tok_milli"
            ),
            "nll",
        )
        # pin the domain-cardinality rollup: it is consumed by the
        # corpus-mean scalar AND the excess frame (which is itself
        # consumed twice: the weight total + the final select), so the
        # unpinned plan re-ran the ENTIRE per-doc KN scoring chain
        # ~6x — measured 1645 plan lines / 54 exchanges collapsing to
        # one chain pass (guide §1.2/§3.3; rows = |domains|, trivially
        # cheap to materialize at any scale).
        .localCheckpoint()
    )
    corpus = dom.agg(
        F.expr("CAST(sum(nll) div sum(n_trigrams) AS BIGINT)").alias(
            "corpus_milli"
        )
    )
    ex = dom.crossJoin(F.broadcast(corpus)).select(
        "source",
        "n_docs",
        "n_trigrams",
        "bits_per_tok_milli",
        F.greatest(
            F.col("bits_per_tok_milli") - F.col("corpus_milli"), F.lit(0)
        )
        .cast("long")
        .alias("excess_milli"),
    )
    tot = ex.agg(
        F.sum(F.col("excess_milli") + F.lit(EXCESS_EPS_MILLI))
        .cast("long")
        .alias("tot")
    )
    return ex.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_trigrams",
        "bits_per_tok_milli",
        "excess_milli",
        F.expr(
            f"CAST(((excess_milli + {EXCESS_EPS_MILLI}) * CAST(1000000 AS BIGINT))"
            f" div tot AS BIGINT)"
        ).alias("weight_ppm"),
    )


def domain_excess_weights_sql(
    table: str = "documents", text_col: str = "text"
) -> str:
    """DuckDB mirror: the per-doc KN oracle as a derived table, then
    the identical integer rollup chain."""
    return f"""
    WITH scored AS MATERIALIZED (
      SELECT * FROM ({kn_trigram_perplexity_sql(table, text_col)}) s
      WHERE n_trigrams > 0
    ),
    dom AS (
      SELECT t.source, count(*)::BIGINT AS n_docs,
             sum(s.n_trigrams)::BIGINT AS n_trigrams,
             (sum(s.nll_millibits) // sum(s.n_trigrams))::BIGINT
               AS bits_per_tok_milli,
             sum(s.nll_millibits)::BIGINT AS nll
      FROM scored s JOIN {table} t USING (doc_id)
      GROUP BY 1
    ),
    corpus AS (
      SELECT (sum(nll) // sum(n_trigrams))::BIGINT AS corpus_milli FROM dom
    ),
    ex AS (
      SELECT source, n_docs, n_trigrams, bits_per_tok_milli,
             greatest(bits_per_tok_milli - corpus_milli, 0)::BIGINT
               AS excess_milli
      FROM dom CROSS JOIN corpus
    ),
    tot AS (
      SELECT sum(excess_milli + {EXCESS_EPS_MILLI})::BIGINT AS tot FROM ex
    )
    SELECT source, n_docs, n_trigrams, bits_per_tok_milli, excess_milli,
           (((excess_milli + {EXCESS_EPS_MILLI}) * 1000000) // tot)::BIGINT
             AS weight_ppm
    FROM ex CROSS JOIN tot
    """
