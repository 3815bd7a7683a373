"""Text analytics for training-data curation (SURVEY.md §7.1 M5):
language-ID heuristic, quality scoring, token counting, document
fingerprinting. All pure column expressions (codegen, no shuffle), all
integer-exact until final ratios, all SQL-mirrorable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..tables import rebalance
from .hashing import MERSENNE31 as P, h28, h28_sql, word_grams

STOPWORDS = ("the", "a")
BPE_ISH_PATTERN = "[a-z]+|[0-9]+"  # identical RE2/Java semantics
EN_STOPWORD_MIN_RATIO = 0.03


def text_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document statistics:

    - n_tokens (whitespace), n_types (distinct), sum_len (total chars in
      tokens) — exact integers
    - ttr (type/token ratio), avg_token_len, stop_ratio — exact int
      ratios
    - n_bpe_tokens: regex token count (the BPE-ish lower bound)
    - lang_pred: stopword-ratio heuristic ('en' iff ratio >= 3%)
    - quality: ttr damped outside the 20..80-token sweet spot — the
      length/stopword-style quality gate of C4-like pipelines

    ``keep`` passes extra input columns through the projection, so a
    pipeline can CHAIN this after another per-row stage (e.g. the
    gopher gate) and Catalyst collapses the chained projections into
    one ProjectExec over one scan — the no-self-join composition rule.
    """
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_types = F.size(F.array_distinct(toks))
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0).cast("long"), lambda a, b: a + b
    )
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    n_bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), F.lit(0)))
    stop_ratio = n_stop / n
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        n_types.alias("n_types"),
        sum_len.alias("sum_len"),
        n_bpe.alias("n_bpe_tokens"),
        (n_types / n).alias("ttr"),
        (sum_len / n).alias("avg_token_len"),
        stop_ratio.alias("stop_ratio"),
        F.when(stop_ratio >= EN_STOPWORD_MIN_RATIO, F.lit("en"))
        .otherwise(F.lit("unknown"))
        .alias("lang_pred"),
        (
            (n_types / n)
            * F.when((n >= 20) & (n <= 80), F.lit(1.0)).otherwise(F.lit(0.5))
        ).alias("quality"),
        *[F.col(c) for c in keep],
    )


def text_stats_sql(table: str = "documents", id_col: str = "doc_id", text: str = "text") -> str:
    toks = f"string_split({text}, ' ')"
    stop_set = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
    SELECT {id_col},
           len({toks}) AS n_tokens,
           len(list_distinct({toks})) AS n_types,
           list_sum([strlen(t) FOR t IN {toks}])::BIGINT AS sum_len,
           len(regexp_extract_all({text}, '{BPE_ISH_PATTERN}')) AS n_bpe_tokens,
           len(list_distinct({toks})) / len({toks}) AS ttr,
           list_sum([strlen(t) FOR t IN {toks}])::BIGINT / len({toks}) AS avg_token_len,
           len(list_filter({toks}, t -> t IN ({stop_set}))) / len({toks}) AS stop_ratio,
           CASE WHEN len(list_filter({toks}, t -> t IN ({stop_set}))) / len({toks})
                     >= {EN_STOPWORD_MIN_RATIO} THEN 'en' ELSE 'unknown' END AS lang_pred,
           (len(list_distinct({toks})) / len({toks}))
             * (CASE WHEN len({toks}) BETWEEN 20 AND 80 THEN 1.0 ELSE 0.5 END) AS quality
    FROM {table}
    """


def rolling_fingerprint(text: Column | str) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash over
    token hashes, mod 2^31-1. Distinguishes permuted documents (md5 of
    the text does too, but this is the streamable/shardable form)."""
    toks = F.split(F.col(text) if isinstance(text, str) else text, " ")
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + h28(t)) % P,
    )


def rolling_fingerprint_sql(text: str = "text") -> str:
    toks = f"string_split({text}, ' ')"
    return (
        f"list_reduce(list_prepend(0::BIGINT, [{h28_sql('t')} FOR t IN {toks}]), "
        f"(a, b) -> (a * 31 + b) % {P})"
    )


def normalize_text(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """C4-style text normalization: lowercase, map non-[a-z0-9 ] bytes
    to spaces (so punctuation splits rather than joins words), squeeze
    whitespace runs, trim. Pure per-row string expressions — codegen,
    no shuffle; patterns restricted to literal classes that Java regex
    and RE2 (DuckDB) interpret identically."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return df.select(
        F.col(id_col),
        norm.alias("norm_text"),
        F.when(norm == "", F.lit(0))
        .otherwise(F.size(F.split(norm, " ")))
        .alias("n_tokens_norm"),
    )


def normalize_text_sql(
    table: str = "documents", id_col: str = "doc_id", text: str = "text"
) -> str:
    norm = (
        f"trim(regexp_replace(regexp_replace(lower({text}), "
        f"'[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
    )
    return f"""
    SELECT {id_col}, {norm} AS norm_text,
           CASE WHEN {norm} = '' THEN 0
                ELSE len(string_split({norm}, ' ')) END AS n_tokens_norm
    FROM {table}
    """


def bigram_lift(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Corpus-level collocation mining: top-k word bigrams by lift
    (observed/expected co-occurrence). Lift instead of log-PMI because
    ``N_uni^2 * c_ab / (N_bi * c_a * c_b)`` is float division over
    exact integer counts in a fixed association order — bit-identical
    across engines, where ``ln``-based PMI inherits libm ulp drift.

    Plan: per-row bigram arrays (no shuffle), explode -> ONE hash
    aggregate each for bigram and unigram counts (map-side combined);
    unigram counts broadcast back onto bigram counts (vocab << corpus);
    scalar totals broadcast via a 1-row cross join; global top-k is
    TakeOrdered (no single-reducer full sort).
    """
    toks = F.split(F.col(text_col), " ")
    # shared codegen'd regex bigram pass (ext/hashing.py:word_grams;
    # single-space fixture contract pinned by the canary there)
    grams = word_grams(text_col, 2)
    base = rebalance(df)
    # lazy pins: `bg` has TWO consumers (scalar total + the scored
    # join) and `uni` THREE (total + both unigram broadcasts), so the
    # unpinned plan ran FIVE corpus explode-aggregates instead of two
    # (guide §1.2; both frames are vocabulary-cardinality).
    bg = (
        base.select(F.explode(grams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("c_ab"))
        .localCheckpoint(eager=False)
    )
    uni = (
        base.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    totals = uni.agg(F.sum("c").alias("n_uni")).crossJoin(
        bg.agg(F.sum("c_ab").alias("n_bi"))
    )
    parts = F.split(F.col("bigram"), " ")
    scored = (
        bg.filter(F.col("c_ab") >= min_count)
        .withColumn("w1", parts[0])
        .withColumn("w2", parts[1])
        .join(F.broadcast(uni.select(F.col("term").alias("w1"), F.col("c").alias("c_a"))), "w1")
        .join(F.broadcast(uni.select(F.col("term").alias("w2"), F.col("c").alias("c_b"))), "w2")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "lift",
            (F.col("c_ab").cast("double") * F.col("n_uni") * F.col("n_uni"))
            / (F.col("n_bi").cast("double") * F.col("c_a") * F.col("c_b")),
        )
    )
    return (
        scored.orderBy(F.col("lift").desc(), "bigram")
        .limit(k)
        .select("bigram", "c_ab", "c_a", "c_b", F.round("lift", 6).alias("lift_r"))
    )


def bigram_lift_sql(
    table: str = "documents", text: str = "text", min_count: int = 5, k: int = 20
) -> str:
    toks = f"string_split({text}, ' ')"
    return f"""
    WITH grams AS (
      SELECT unnest(CASE WHEN len({toks}) >= 2 THEN
               [array_to_string({toks}[i:i+1], ' ')
                FOR i IN generate_series(1, len({toks}) - 1)]
             ELSE [] END) AS bigram
      FROM {table}
    ),
    bg AS (SELECT bigram, count(*) AS c_ab FROM grams GROUP BY 1),
    uni AS (SELECT unnest({toks}) AS term FROM {table}),
    uc AS (SELECT term, count(*) AS c FROM uni GROUP BY 1),
    tot AS (SELECT (SELECT sum(c) FROM uc) AS n_uni,
                   (SELECT sum(c_ab) FROM bg) AS n_bi)
    SELECT bigram, c_ab, c_a, c_b, round(lift, 6) AS lift_r
    FROM (
      SELECT bg.bigram, bg.c_ab, a.c AS c_a, b.c AS c_b,
             (bg.c_ab::DOUBLE * tot.n_uni * tot.n_uni)
               / (tot.n_bi::DOUBLE * a.c * b.c) AS lift
      FROM bg
      CROSS JOIN tot
      JOIN uc a ON a.term = string_split(bg.bigram, ' ')[1]
      JOIN uc b ON b.term = string_split(bg.bigram, ' ')[2]
      WHERE bg.c_ab >= {min_count}
    )
    ORDER BY lift DESC, bigram
    LIMIT {k}
    """


def top_distinctive_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-document top-k distinctive terms by tf/df ratio (a
    rational-idf TF-IDF variant chosen because tf/df division is
    IEEE-exact and therefore bit-reproducible across engines, unlike
    ln-based idf which can differ in the last ulp between libm
    implementations). Ties break on the term string.

    Plan: explode -> (doc, term) tf counts -> term df counts (broadcast
    back: #distinct terms << corpus) -> rank. Two aggregations, one
    broadcast join, one analytic rank — no cross join anywhere."""
    toks = rebalance(df).select(
        F.col(id_col).alias("id"), F.explode(F.split(text_col, " ")).alias("term")
    )
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("id").orderBy(
        (F.col("tf") / F.col("df")).desc(), F.col("term")
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "term", "tf", "df", "rank")
    )


def top_distinctive_terms_sql(
    table: str = "documents", id_col: str = "doc_id", text: str = "text", k: int = 3
) -> str:
    return f"""
    WITH toks AS (
      SELECT {id_col} AS id, unnest(string_split({text}, ' ')) AS term FROM {table}
    ),
    tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
    SELECT id, term, tf, df, rank
    FROM (SELECT tf.id, tf.term, tf.tf, dfreq.df,
                 row_number() OVER (PARTITION BY tf.id
                                    ORDER BY (tf.tf::DOUBLE / dfreq.df) DESC,
                                             tf.term) AS rank
          FROM tf JOIN dfreq USING (term))
    WHERE rank <= {k}
    """

# ---------------------------------------------------------------------------
# composite quality gate (Gopher-rule shape, fixture-scaled thresholds)
# ---------------------------------------------------------------------------

GATE_MIN_WORDS, GATE_MAX_WORDS = 10, 1_000  # Gopher: 50..100k
GATE_MIN_LEN_MILLI, GATE_MAX_LEN_MILLI = 3_000, 10_000  # mean word len 3..10
GATE_MIN_STOP_HITS = 2  # Gopher: >=2 of an 8-word list (ours: STOPWORDS)
GATE_MIN_ALPHA_PPM = 800_000  # >=80% purely-alphabetic words
GATE_MIN_TTR_PPM = 200_000  # repetition floor (the n-gram dup rules
#                             live in repetition_stats; this is the
#                             cheap single-scan proxy)


def gopher_quality_gate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """The composite document-quality gate every curation pipeline runs
    (the Gopher §A1.1 rule shape; thresholds scaled to the fixture
    corpus, named above): word-count band, mean-word-length band,
    minimum stopword hits, alphabetic-word fraction, and a
    type-token-ratio floor — each failure a bit in ``fail_mask`` so
    downstream reports WHY documents drop, not just how many. All
    metrics are exact integer floordivs (milli / ppm), so the gate is
    bit-identical cross-engine. One scan, zero shuffles, pure codegen."""
    words = F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
    counts = df.select(
        F.col(id_col),
        F.size(words).cast("long").alias("n_words"),
        F.aggregate(
            F.transform(words, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda a, b: a + b,
        ).alias("sum_len"),
        F.size(F.filter(words, lambda t: t.isin(*STOPWORDS)))
        .cast("long")
        .alias("n_stop"),
        F.size(F.filter(words, lambda t: t.rlike("^[a-z]+$")))
        .cast("long")
        .alias("n_alpha"),
        F.size(F.array_distinct(words)).cast("long").alias("n_types"),
        *[F.col(c) for c in keep],
    )
    m = counts.select(
        id_col,
        "n_words",
        "n_stop",
        F.expr(
            "CASE WHEN n_words > 0 THEN (sum_len * 1000) div n_words"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("mean_len_milli"),
        F.expr(
            "CASE WHEN n_words > 0 THEN (n_alpha * 1000000) div n_words"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("alpha_ppm"),
        F.expr(
            "CASE WHEN n_words > 0 THEN (n_types * 1000000) div n_words"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("ttr_ppm"),
        *[F.col(c) for c in keep],
    )
    fail_bits = (
        F.when(
            (F.col("n_words") < GATE_MIN_WORDS)
            | (F.col("n_words") > GATE_MAX_WORDS),
            1,
        ).otherwise(0)
        + F.when(
            (F.col("mean_len_milli") < GATE_MIN_LEN_MILLI)
            | (F.col("mean_len_milli") > GATE_MAX_LEN_MILLI),
            2,
        ).otherwise(0)
        + F.when(F.col("n_stop") < GATE_MIN_STOP_HITS, 4).otherwise(0)
        + F.when(F.col("alpha_ppm") < GATE_MIN_ALPHA_PPM, 8).otherwise(0)
        + F.when(F.col("ttr_ppm") < GATE_MIN_TTR_PPM, 16).otherwise(0)
    )
    return m.select(
        id_col,
        "n_words",
        "mean_len_milli",
        "n_stop",
        "alpha_ppm",
        "ttr_ppm",
        fail_bits.cast("long").alias("fail_mask"),
        F.when(fail_bits == 0, 1).otherwise(0).cast("int").alias("pass"),
        *[F.col(c) for c in keep],
    )


def gopher_quality_gate_sql(
    table: str = "documents", id_col: str = "doc_id", text: str = "text"
) -> str:
    stop_set = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
    WITH w AS (
      SELECT {id_col},
             list_filter(string_split({text}, ' '), t -> t <> '') AS words
      FROM {table}
    ),
    c AS (
      SELECT {id_col},
             len(words)::BIGINT AS n_words,
             coalesce(list_sum([strlen(t)::BIGINT FOR t IN words]), 0)::BIGINT
               AS sum_len,
             len(list_filter(words, t -> t IN ({stop_set})))::BIGINT AS n_stop,
             len(list_filter(words, t -> regexp_matches(t, '^[a-z]+$')))::BIGINT
               AS n_alpha,
             len(list_distinct(words))::BIGINT AS n_types
      FROM w
    ),
    m AS (
      SELECT {id_col}, n_words, n_stop,
             CASE WHEN n_words > 0 THEN (sum_len * 1000) // n_words
                  ELSE 0 END AS mean_len_milli,
             CASE WHEN n_words > 0 THEN (n_alpha * 1000000) // n_words
                  ELSE 0 END AS alpha_ppm,
             CASE WHEN n_words > 0 THEN (n_types * 1000000) // n_words
                  ELSE 0 END AS ttr_ppm
      FROM c
    )
    SELECT {id_col}, n_words, mean_len_milli, n_stop, alpha_ppm, ttr_ppm,
           ((CASE WHEN n_words < {GATE_MIN_WORDS} OR n_words > {GATE_MAX_WORDS}
                  THEN 1 ELSE 0 END)
          + (CASE WHEN mean_len_milli < {GATE_MIN_LEN_MILLI}
                    OR mean_len_milli > {GATE_MAX_LEN_MILLI} THEN 2 ELSE 0 END)
          + (CASE WHEN n_stop < {GATE_MIN_STOP_HITS} THEN 4 ELSE 0 END)
          + (CASE WHEN alpha_ppm < {GATE_MIN_ALPHA_PPM} THEN 8 ELSE 0 END)
          + (CASE WHEN ttr_ppm < {GATE_MIN_TTR_PPM} THEN 16 ELSE 0 END)
           )::BIGINT AS fail_mask,
           (CASE WHEN n_words BETWEEN {GATE_MIN_WORDS} AND {GATE_MAX_WORDS}
                  AND mean_len_milli BETWEEN {GATE_MIN_LEN_MILLI}
                                         AND {GATE_MAX_LEN_MILLI}
                  AND n_stop >= {GATE_MIN_STOP_HITS}
                  AND alpha_ppm >= {GATE_MIN_ALPHA_PPM}
                  AND ttr_ppm >= {GATE_MIN_TTR_PPM}
             THEN 1 ELSE 0 END)::INT AS pass
    FROM m
    """
