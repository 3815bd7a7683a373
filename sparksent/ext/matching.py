"""Record linkage, corpus LM scoring, and query-time ranking — three
training-data-pipeline surfaces the curation stack needs beyond dedup:

- blocked fuzzy matching (edit-distance entity resolution),
- n-gram LM quality scoring (the CCNet-style "how corpus-typical is
  this document" filter signal),
- BM25 top-k retrieval (query-time ranking over the corpus, the IR
  complement to `top_distinctive_terms`' corpus-side tf-idf).

All three follow the repo's exactness conventions: integer counts until
the final ratio, no libm transcendentals (rational idf instead of
``ln``), float sums accumulated in DECIMAL(28,6), every computed column
aliased identically in the Spark and DuckDB forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..tables import rebalance
from .hashing import word_grams

# ---------------------------------------------------------------------------
# blocked fuzzy matching (entity resolution)
# ---------------------------------------------------------------------------

FUZZY_MAX_DIST = 3
FUZZY_LEN_BAND = 2


def fuzzy_name_pairs(
    df: DataFrame,
    name_col: str = "p_name",
    max_dist: int = FUZZY_MAX_DIST,
    len_band: int = FUZZY_LEN_BAND,
    names: DataFrame | None = None,
) -> DataFrame:
    """Edit-distance record linkage over a name column, dictionary-first.

    Shape (the 100-TB design, in order):

    1. **Collapse to the value domain**: ``GROUP BY name`` first, so the
       pair stage sees distinct values (64 at this fixture) instead of
       rows (2 000 here; billions at scale). Row multiplicity survives
       as ``n_a``/``n_b`` so match cardinality is recoverable.
    2. **Blocking keys bound the join**: candidates must share the
       first character AND sit within ``len_band`` of each other in
       length — an equi-join on the block key plus a residual length
       predicate, never an all-pairs cross join. At scale the block key
       widens (more prefix chars, q-gram keys, multi-pass OR-blocking
       for prefix-edit recall); the plan shape is unchanged.
    3. **Band-limited DP**: Spark's 3-arg ``levenshtein(l, r, t)``
       abandons a pair once distance exceeds ``t`` (O(t·len) instead of
       O(len²)) and returns -1, which the filter drops. The oracle's
       plain ``levenshtein() <= t`` is semantically identical on the
       survivors.

    ``name_a < name_b`` canonicalizes pair order (no mirror dupes, no
    self-pairs).  A caller that already holds the pinned (name, n_rows)
    value-domain frame passes it via ``names`` so the corpus scan +
    aggregate — the only data-sized stage — runs exactly once (the
    entity-resolution pipeline shares it with its join-back).
    """
    if names is None:
        # One corpus scan + aggregate, reused by both join sides —
        # localCheckpoint (repo multi-consumer convention, dedup
        # modules) or the self-join would scan and aggregate the raw
        # rows twice.
        names = (
            rebalance(df)
            .groupBy(F.col(name_col).alias("name"))
            .agg(F.count("*").alias("n_rows"))
            .localCheckpoint()
        )
    a = names.select(
        F.col("name").alias("name_a"),
        F.col("n_rows").alias("n_a"),
        F.substring("name", 1, 1).alias("blk"),
        F.length("name").alias("len_a"),
    )
    b = names.select(
        F.col("name").alias("name_b"),
        F.col("n_rows").alias("n_b"),
        F.substring("name", 1, 1).alias("blk"),
        F.length("name").alias("len_b"),
    )
    return (
        a.join(b, "blk")
        .filter(
            (F.abs(F.col("len_a") - F.col("len_b")) <= len_band)
            & (F.col("name_a") < F.col("name_b"))
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b", max_dist))
        .filter(F.col("dist") >= 0)
        .select("name_a", "name_b", "dist", "n_a", "n_b")
    )


def fuzzy_name_pairs_sql(
    table: str = "part",
    name: str = "p_name",
    max_dist: int = FUZZY_MAX_DIST,
    len_band: int = FUZZY_LEN_BAND,
) -> str:
    return f"""
    WITH names AS (
      SELECT {name} AS name, count(*) AS n_rows FROM {table} GROUP BY 1
    )
    SELECT a.name AS name_a, b.name AS name_b,
           levenshtein(a.name, b.name) AS dist,
           a.n_rows AS n_a, b.n_rows AS n_b
    FROM names a JOIN names b
      ON substr(a.name, 1, 1) = substr(b.name, 1, 1)
     AND abs(length(a.name) - length(b.name)) <= {len_band}
     AND a.name < b.name
     AND levenshtein(a.name, b.name) <= {max_dist}
    """


# ---------------------------------------------------------------------------
# corpus-LM document scoring
# ---------------------------------------------------------------------------


# Per-row word-bigram construction: the shared codegen'd regex pass
# (ext/hashing.py:word_grams; single-space contract pinned by the
# fixture canary — see overlapping_gram_re).
_word_bigrams = word_grams


def lm_bigram_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """CCNet-style corpus-typicality score: how frequent are this
    document's word bigrams in the corpus overall? Low average bigram
    frequency flags boilerplate/garbled outliers the perplexity filter
    of CCNet-like pipelines would drop. Frequency is used directly
    instead of a log-prob sum so the score stays a ratio of exact
    integers (no ``ln`` — libm ulp drift; see `bigram_lift`).

    Plan: one explode -> (doc, bigram) tf aggregate; corpus counts are
    a second aggregate OVER the tf frame (no second scan of the raw
    text); one vocab-keyed join (AQE picks broadcast when the vocab is
    small); one per-doc aggregate; documents with <2 tokens re-enter
    via a left join with the -1.0 sentinel (NULL-free convention).
    All counts BIGINT-exact; the single division is IEEE-deterministic.

    100-TB note: when the bigram vocabulary outgrows broadcast, swap
    the string join key for ``hashing.h60(bigram)`` (the dedup modules'
    convention — the oracle mirrors collisions identically via
    ``h60_sql``) to cut checkpoint and join-shuffle bytes; kept as
    strings here because at fixture scale the md5 cost exceeds the
    shuffle saving.
    """
    base = rebalance(df)
    # (doc, bigram) tf is consumed twice (corpus counts + the per-doc
    # join); localCheckpoint materializes the explode+aggregate once —
    # at scale this frame is the natural pipeline checkpoint (vocab-keyed,
    # far smaller than the exploded token stream that builds it).
    doc_bg = (
        base.select(F.col(id_col).alias("id"), F.explode(_word_bigrams(text_col)).alias("bigram"))
        .groupBy("id", "bigram")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint()
    )
    bg = doc_bg.groupBy("bigram").agg(F.sum("tf").alias("c_ab"))
    per_doc = (
        doc_bg.join(bg, "bigram")
        .groupBy("id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.sum(F.col("tf") * F.col("c_ab")).alias("sum_freq"),
        )
    )
    return (
        base.select(F.col(id_col).alias("id"), *carry_cols)
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            *carry_cols,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("sum_freq", F.lit(0)).alias("sum_freq"),
            F.when(
                F.col("n_bigrams").isNull(), F.lit(-1.0)
            )
            .otherwise(F.col("sum_freq") / F.col("n_bigrams"))
            .alias("avg_bigram_freq"),
        )
    )


def _lm_bigram_ctes(table: str, id_col: str, text: str) -> str:
    """Shared CTE text of the corpus-typicality score — ends with
    ``per_doc`` (id, n_bigrams, sum_freq); used by the score oracle and
    the per-language head gate built on it."""
    toks = f"string_split({text}, ' ')"
    return f"""grams AS (
      SELECT {id_col} AS id,
             unnest(CASE WHEN len({toks}) >= 2 THEN
               [array_to_string({toks}[i:i+1], ' ')
                FOR i IN generate_series(1, len({toks}) - 1)]
             ELSE [] END) AS bigram
      FROM {table}
    ),
    doc_bg AS (SELECT id, bigram, count(*) AS tf FROM grams GROUP BY 1, 2),
    bg AS (SELECT bigram, sum(tf)::BIGINT AS c_ab FROM doc_bg GROUP BY 1),
    per_doc AS (
      SELECT id, sum(tf)::BIGINT AS n_bigrams,
             sum(tf * c_ab)::BIGINT AS sum_freq
      FROM doc_bg JOIN bg USING (bigram)
      GROUP BY 1
    )"""


def lm_bigram_score_sql(
    table: str = "documents", id_col: str = "doc_id", text: str = "text"
) -> str:
    return f"""
    WITH {_lm_bigram_ctes(table, id_col, text)}
    SELECT d.{id_col},
           coalesce(p.n_bigrams, 0) AS n_bigrams,
           coalesce(p.sum_freq, 0) AS sum_freq,
           CASE WHEN p.n_bigrams IS NULL THEN -1.0
                ELSE p.sum_freq::DOUBLE / p.n_bigrams END AS avg_bigram_freq
    FROM {table} d LEFT JOIN per_doc p ON p.id = d.{id_col}
    """


def quality_tiers_per_lang_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    group_col: str = "lang",
    text: str = "text",
) -> str:
    """DuckDB oracle for the CCNet head/middle/tail bucketing: every
    document tagged with its per-language typicality tier by exact
    integer rank thirds (head: 3*rk <= n; middle: 3*rk <= 2n; else
    tail) — same deterministic (score DESC, id) order as the head
    gate."""
    return f"""
    WITH {_lm_bigram_ctes(table, id_col, text)},
    scored AS (
      SELECT d.{id_col}, d.{group_col},
             CASE WHEN p.n_bigrams IS NULL THEN -1.0
                  ELSE p.sum_freq::DOUBLE / p.n_bigrams END AS avg_bigram_freq
      FROM {table} d LEFT JOIN per_doc p ON p.id = d.{id_col}
    ),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY {group_col}
                                ORDER BY avg_bigram_freq DESC, {id_col}) AS rk,
             count(*) OVER (PARTITION BY {group_col}) AS n_lang
      FROM scored
    )
    SELECT {id_col}, {group_col}, avg_bigram_freq,
           rk::BIGINT AS rk, n_lang::BIGINT AS n_lang,
           CASE WHEN 3 * rk <= n_lang THEN 'head'
                WHEN 3 * rk <= 2 * n_lang THEN 'middle'
                ELSE 'tail' END AS tier
    FROM r
    """


def quality_gate_per_lang_head_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    group_col: str = "lang",
    text: str = "text",
) -> str:
    """DuckDB oracle for the per-language head gate: rank each
    language's documents by (avg_bigram_freq DESC, id) and keep the
    head half (rank <= ceil(n/2), the exact-integer form
    2*rk <= n + 1).  The score division is the same single IEEE double
    division on both engines, so the order — and therefore membership —
    is deterministic; ranks break score ties on the unique id."""
    return f"""
    WITH {_lm_bigram_ctes(table, id_col, text)},
    scored AS (
      SELECT d.{id_col}, d.{group_col},
             coalesce(p.n_bigrams, 0) AS n_bigrams,
             coalesce(p.sum_freq, 0) AS sum_freq,
             CASE WHEN p.n_bigrams IS NULL THEN -1.0
                  ELSE p.sum_freq::DOUBLE / p.n_bigrams END AS avg_bigram_freq
      FROM {table} d LEFT JOIN per_doc p ON p.id = d.{id_col}
    ),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY {group_col}
                                ORDER BY avg_bigram_freq DESC, {id_col}) AS rk,
             count(*) OVER (PARTITION BY {group_col}) AS n_lang
      FROM scored
    )
    SELECT {id_col}, {group_col}, n_bigrams, sum_freq, avg_bigram_freq,
           rk::BIGINT AS rk, n_lang::BIGINT AS n_lang
    FROM r WHERE 2 * rk <= n_lang + 1
    """


# ---------------------------------------------------------------------------
# BM25 top-k retrieval
# ---------------------------------------------------------------------------

BM25_QUERY_TERMS = ("spark", "query", "stream")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


def bm25_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    terms: tuple[str, ...] = BM25_QUERY_TERMS,
    k: int = BM25_TOPK,
) -> DataFrame:
    """Query-time BM25 ranking: top-k documents for a fixed term set.

    Rational-idf variant: ``idf = (N - df + 0.5) / (df + 0.5)`` — the
    Robertson idf WITHOUT the log wrap, keeping the same df ordering
    while avoiding libm (`bigram_lift` precedent). Per-term scores are
    IEEE-deterministic (identical expression tree over exact-integer
    tf/df/dl and one shared avgdl division); the per-document sum
    accumulates in DECIMAL(28,6) so shuffle order can't move the hash.

    Plan: tokens are filtered to the query terms BEFORE the exploded
    aggregate, so only query-term occurrences ever enter a shuffle —
    at 100 TB this is the difference between an inverted-index probe
    and building the full index. df (|terms| rows) and the N/avgdl
    scalar broadcast back; final top-k is TakeOrdered, not a global
    sort.
    """
    base = rebalance(df)
    toks = F.split(F.col(text_col), " ")
    # (id, dl) feeds both the N/avgdl totals and the score join.
    # Deliberately NOT localCheckpoint'ed (round-6 revision): a
    # checkpointed frame's LogicalRDD stats read as small, and the
    # planner then BROADCAST this corpus-sized frame into the score
    # join (the audited driver-OOM shape). Kept as a plain
    # parquet-derived plan, its stats are REAL, so the planner
    # broadcasts at fixture scale and sort-merges at corpus scale —
    # self-optimizing where a join hint would freeze one choice. The
    # price is a second column-pruned text scan for the totals.
    docs = base.select(F.col(id_col).alias("id"), F.size(toks).alias("dl"))
    # tf is tiny (≤ |docs|·|terms| rows) and feeds both df and the score
    # join — localCheckpoint so the explode over the corpus runs once.
    tf = (
        base.select(
            F.col(id_col).alias("id"),
            F.explode(F.filter(toks, lambda t: t.isin(*terms))).alias("term"),
        )
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint()
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    totals = docs.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
    )
    term_score = (F.col("idf") * (F.col("tf") * (1.0 + BM25_K1))) / (
        F.col("tf")
        + BM25_K1 * ((1.0 - BM25_B) + ((BM25_B * F.col("dl")) / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(docs, "id")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "idf",
            ((F.col("n_docs") - F.col("df")) + 0.5) / (F.col("df") + 0.5),
        )
        .groupBy("id")
        .agg(
            F.sum(term_score.cast("decimal(28,6)")).cast("double").alias("score"),
            F.count("*").alias("n_terms_hit"),
        )
    )
    return (
        scored.orderBy(F.col("score").desc(), "id")
        .limit(k)
        .select(F.col("id").alias(id_col), "score", "n_terms_hit")
    )


def bm25_topk_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text: str = "text",
    terms: tuple[str, ...] = BM25_QUERY_TERMS,
    k: int = BM25_TOPK,
) -> str:
    toks = f"string_split({text}, ' ')"
    term_set = ", ".join(f"'{t}'" for t in terms)
    # DuckDB parses bare float literals as DECIMAL, which would make
    # sub-expressions exact-decimal where Spark computes IEEE doubles
    # (e.g. decimal (1.0+1.2)=2.2 vs double 2.2000000000000002) — every
    # constant is therefore pinned ::DOUBLE so both engines evaluate the
    # identical double expression tree.
    k1, b = f"{BM25_K1}::DOUBLE", f"{BM25_B}::DOUBLE"
    half = "0.5::DOUBLE"
    return f"""
    WITH docs AS (
      SELECT {id_col} AS id, len({toks}) AS dl FROM {table}
    ),
    tf AS (
      SELECT id, term, count(*) AS tf
      FROM (SELECT {id_col} AS id,
                   unnest(list_filter({toks}, t -> t IN ({term_set}))) AS term
            FROM {table})
      GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    tot AS (SELECT count(*) AS n_docs, sum(dl)::DOUBLE / count(*) AS avgdl FROM docs)
    SELECT id AS {id_col},
           sum((
             (((n_docs - df) + {half}) / (df + {half}))
             * (tf * (1.0::DOUBLE + {k1}))
             / (tf + {k1} * ((1.0::DOUBLE - {b}) + (({b} * dl) / avgdl)))
           )::DECIMAL(28,6))::DOUBLE AS score,
           count(*) AS n_terms_hit
    FROM tf
    JOIN dfreq USING (term)
    JOIN docs USING (id)
    CROSS JOIN tot
    GROUP BY id
    ORDER BY score DESC, id
    LIMIT {k}
    """


# ---------------------------------------------------------------------------
# hybrid retrieval: reciprocal-rank fusion of sparse (BM25) and dense
# (embedding cosine) rankings — the standard production combiner
# ---------------------------------------------------------------------------

RRF_K = 60  # the Cormack et al. 2009 constant; industry default
RRF_POOL = 20  # per-system candidate pool feeding the fusion
RRF_TOPK = 10


def rrf_fusion_topk(
    docs: DataFrame,
    emb: DataFrame,
    pool: int = RRF_POOL,
    k: int = RRF_TOPK,
    rrf_k: int = RRF_K,
    query_vec_id: int = 0,
) -> DataFrame:
    """Hybrid retrieval by Reciprocal Rank Fusion (Cormack et al.
    2009): fuse the BM25 term ranking and the dense cosine ranking of
    the SAME query — ``rrf(d) = sum over systems 1/(rrf_k + rank_d)``
    over the union of each system's top-``pool``, missing-from-a-list
    contributing 0 — and keep the fused top-``k``.  This is how
    production RAG retrieval actually combines lexical and vector
    search: rank fusion needs no score calibration between systems
    (scores live on incomparable scales; ranks don't).

    Determinism: ranks are exact integers, each contribution is ONE
    double division with integer operands and the fused score one
    fixed-order addition — bit-identical across engines; ties break
    on doc id.  Missing ranks surface as 0 BIGINT (not NULL — a
    nullable int column round-trips the driver norm as NaN).

    Scale shape: each system's top-pool is already bounded (BM25's
    TakeOrdered, ANN's per-query rank window), so everything past the
    two retrievals — the full-outer union, the fusion arithmetic, the
    final rank — runs on <= 2*pool rows.  At corpus scale the dense
    side swaps brute force for the registered IVF/LSH paths with the
    same (neighbor_id, rank) contract; the fusion tail is unchanged."""
    from pyspark.sql import Window

    from .similarity import brute_force_topk

    sparse = bm25_topk(docs, k=pool)
    ws = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    sr = sparse.select(
        "doc_id", F.row_number().over(ws).cast("long").alias("r_sparse")
    )
    dense = brute_force_topk(
        emb, emb.filter(F.col("vec_id") == query_vec_id), k=pool
    )
    dr = dense.select(
        F.col("neighbor_id").cast("long").alias("doc_id"),
        F.col("rank").cast("long").alias("r_dense"),
    )
    fused = (
        sr.join(dr, "doc_id", "full_outer")
        .withColumn(
            "rrf_score",
            F.coalesce(
                F.lit(1.0) / (F.lit(rrf_k) + F.col("r_sparse")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(rrf_k) + F.col("r_dense")), F.lit(0.0)
            ),
        )
    )
    wf = Window.orderBy(F.col("rrf_score").desc(), F.col("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(wf).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            "rrf_score",
            F.coalesce(F.col("r_sparse"), F.lit(0)).cast("long").alias("r_sparse"),
            F.coalesce(F.col("r_dense"), F.lit(0)).cast("long").alias("r_dense"),
            "rank",
        )
    )


def rrf_fusion_topk_sql(
    doc_table: str = "documents",
    emb_table: str = "embeddings",
    pool: int = RRF_POOL,
    k: int = RRF_TOPK,
    rrf_k: int = RRF_K,
    query_vec_id: int = 0,
) -> str:
    """DuckDB mirror of :func:`rrf_fusion_topk`: the two systems'
    top-pool CTEs (the registered bm25/brute oracles' own SQL), a full
    outer join, the identical one-division-per-system fused double."""
    from .similarity import brute_force_topk_sql

    bm25 = bm25_topk_sql(doc_table, k=pool)
    dense = brute_force_topk_sql(emb_table, k=pool, n_queries=query_vec_id + 1)
    return f"""
    WITH sparse AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score DESC, doc_id) AS r_sparse
      FROM ({bm25})
    ),
    dense AS (
      SELECT neighbor_id AS doc_id, rank AS r_dense
      FROM ({dense})
      WHERE query_id = {query_vec_id}
    ),
    fused AS (
      SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id, s.r_sparse, d.r_dense,
             COALESCE(1.0::DOUBLE / ({rrf_k} + s.r_sparse), 0.0::DOUBLE)
             + COALESCE(1.0::DOUBLE / ({rrf_k} + d.r_dense), 0.0::DOUBLE)
               AS rrf_score
      FROM sparse s FULL OUTER JOIN dense d USING (doc_id)
    )
    SELECT doc_id, rrf_score,
           COALESCE(r_sparse, 0)::BIGINT AS r_sparse,
           COALESCE(r_dense, 0)::BIGINT AS r_dense,
           rank
    FROM (SELECT *, row_number() OVER (ORDER BY rrf_score DESC, doc_id)::BIGINT
                 AS rank
          FROM fused)
    WHERE rank <= {k}
    """
