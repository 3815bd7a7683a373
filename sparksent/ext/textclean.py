"""Corpus-cleaning operators: PII redaction, boilerplate-line removal,
and corpus-profile language identification.

These are the scrubbing passes a web-scale pretraining pipeline runs
before dedup/quality gating (the reference — traubad/
FlinkSentimentAnalysis, SentimentAnalysis.scala:241-265 — tokenizes
chat text but never cleans it; these extend that surface to the 100 TB
curation setting):

- PII redaction: regex removal of emails / IPv4s / phone extensions,
  with per-document match counts. Pure per-row JVM regex — scan-side,
  zero shuffle. The fixture text contains no PII, so the query enriches
  each document with DETERMINISTIC synthetic PII derived from doc_id
  (identically on the Spark and DuckDB sides) — the operator is the
  redaction, the enrichment just gives it something real to find.
- boilerplate removal: the C4/CCNet frequent-line filter. Documents are
  chunked into fixed-width word "lines"; a corpus-wide line-frequency
  pass finds lines occurring >= max_df times; those lines are dropped
  from every document and the text reassembled in original order.
  Scale shape mirrors the stop-shingle cap (ext/dedup.py): one
  map-side-combined line-count aggregate, hot set broadcast into an
  anti-join, one reassembly aggregate.
- language ID: char-trigram profile scoring. A deterministic seed
  subset (doc_id % SEED_MOD == 0) plays the labeled training set; each
  language's top-K trigrams by document frequency form a broadcast
  profile; remaining documents score every language by integer profile
  overlap and predict the argmax (ties broken by language name). All
  integer arithmetic — the DuckDB oracle matches bit-for-bit.

Regex note: every pattern used here is written in the common subset of
Java regex (Spark) and RE2 (DuckDB) — character classes, bounded
repetition, non-capturing groups, and ``\\b`` behave identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..tables import rebalance

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}(?:\.\d{1,3}){3}\b"
PHONE_RE = r"\b\d{3}-\d{4}\b"

LINE_W = 2  # words per boilerplate "line" (fixture text has no newlines)
LINE_MAX_DF = 20

SEED_MOD = 5  # doc_id % 5 == 0 plays the labeled language-ID seed set
PROFILE_K = 200  # trigrams kept per language profile


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def enrich_with_pii(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> Column:
    """Deterministic synthetic PII suffix derived from the id column —
    one email, one IPv4, one phone extension per document. Exists only
    so the fixture (lowercase prose, no PII) gives the redactor real
    matches; both engines build the identical string."""
    i = F.col(id_col).cast("string")
    return F.concat(
        F.col(text_col),
        F.lit(" contact user"), i, F.lit("@mail.example.com node 10."),
        (F.col(id_col) % 240).cast("string"), F.lit("."),
        (F.col(id_col) % 250).cast("string"), F.lit(".7 ext 555-"),
        F.lpad((F.col(id_col) * 37 % 10000).cast("string"), 4, "0"),
    )


def pii_redact(df: DataFrame, id_col: str = "doc_id", text_col: str = "full_text") -> DataFrame:
    """Redact emails -> IPv4s -> phones (in that order: the email's
    dotted domain must be gone before the IP pass) and count matches of
    each class on the pre-redaction text. Scan-side per-row regex in
    whole-stage codegen; no shuffle, no UDF."""
    t = F.col(text_col)
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ),
        PHONE_RE,
        "<PHONE>",
    )
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)).cast("long").alias("n_email"),
        F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), 0)).cast("long").alias("n_ip"),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), 0)).cast("long").alias("n_phone"),
    )


def pii_redaction_sql(table: str = "documents", id_col: str = "doc_id", text: str = "text") -> str:
    return f"""
    WITH enriched AS (
      SELECT {id_col},
        {text} || ' contact user' || {id_col} || '@mail.example.com node 10.'
          || ({id_col} % 240) || '.' || ({id_col} % 250) || '.7 ext 555-'
          || lpad(CAST({id_col}*37 % 10000 AS VARCHAR), 4, '0') AS full_text
      FROM {table})
    SELECT {id_col},
      regexp_replace(regexp_replace(regexp_replace(full_text,
        '{EMAIL_RE}', '<EMAIL>', 'g'),
        '{IPV4_RE}', '<IP>', 'g'),
        '{PHONE_RE}', '<PHONE>', 'g') AS clean_text,
      len(regexp_extract_all(full_text, '{EMAIL_RE}', 0)) AS n_email,
      len(regexp_extract_all(full_text, '{IPV4_RE}', 0)) AS n_ip,
      len(regexp_extract_all(full_text, '{PHONE_RE}', 0)) AS n_phone
    FROM enriched
    """


# ---------------------------------------------------------------------------
# boilerplate-line removal (C4/CCNet frequent-line filter)
# ---------------------------------------------------------------------------


def _chunk_re(w: int) -> str:
    """Regex that greedily consumes w space-separated words per match —
    consecutive matches segment the text into w-word 'lines'. Common
    Java-regex/RE2 subset."""
    return r"\S+(?: \S+){0,%d}" % (w - 1)


def _chunk_lines(text_col: str, w: int) -> Column:
    """Split the text into consecutive w-word 'lines' (the fixture has
    no newlines; real corpora would split on '\\n' instead — the plan
    shape is identical). Segmentation runs as ONE codegen'd regex pass:
    the equivalent sequence+slice+concat_ws higher-order-function chain
    evaluates interpreted and measured 4x slower (the HOF pitfall)."""
    return F.regexp_extract_all(F.col(text_col), F.lit(_chunk_re(w)), 0)


def remove_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = LINE_W,
    max_df: int = LINE_MAX_DF,
) -> DataFrame:
    """Drop every line occurring >= max_df times corpus-wide, reassemble
    the survivors in original order.

    100 TB shape (same as the stop-shingle cap, ext/dedup.py): the line
    explode feeds ONE map-side-combined count aggregate; the hot set
    (bounded: <= |vocab|^w distinct lines, further bounded by the df
    threshold) broadcasts into an anti-join against the exploded lines;
    reassembly is one groupBy with an in-memory array_sort per document.
    Documents whose every line is boilerplate survive with empty text
    (left join + coalesce), so row count is stable.
    """
    chunked = df.select(id_col, _chunk_lines(text_col, w).alias("chunks"))
    # one narrow (id, pos, line) frame feeds the df-count aggregate, the
    # anti-join side, AND the per-doc totals; localCheckpoint stops the
    # chunk-explode from re-running per consumer (the ngram_jaccard
    # re-explode regression, dedup.py:408) and keeps every downstream
    # pass off the documents scan
    lines = (
        rebalance(chunked)
        .select(id_col, F.posexplode("chunks").alias("pos", "line"))
        .localCheckpoint()
    )
    hot = (
        lines.groupBy("line")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= max_df)
        .select("line")
    )
    kept = (
        lines.join(F.broadcast(hot), "line", "left_anti")
        .groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "line"))).alias("kl"),
        )
        .select(
            id_col,
            F.concat_ws(" ", F.transform("kl", lambda s: s.line)).alias("clean_text"),
            F.size("kl").cast("long").alias("n_kept"),
        )
    )
    totals = lines.groupBy(id_col).agg(F.count("*").cast("long").alias("n_total"))
    return (
        totals.join(kept, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            "n_total",
        )
    )


def remove_boilerplate_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text: str = "text",
    w: int = LINE_W,
    max_df: int = LINE_MAX_DF,
) -> str:
    chunks = f"regexp_extract_all({text}, '{_chunk_re(w)}', 0)"
    return f"""
    WITH chunked AS (SELECT {id_col}, {chunks} AS chunks FROM {table}),
    df AS (
      SELECT line, count(*) AS c
      FROM (SELECT unnest(chunks) AS line FROM chunked) GROUP BY line),
    hot AS (SELECT coalesce(list(line), []) AS hl FROM df WHERE c >= {max_df})
    SELECT {id_col},
      array_to_string([l FOR l IN chunks IF NOT list_contains(hl, l)], ' ') AS clean_text,
      CAST(len([l FOR l IN chunks IF NOT list_contains(hl, l)]) AS BIGINT) AS n_kept,
      CAST(len(chunks) AS BIGINT) AS n_total
    FROM chunked, hot
    """


# ---------------------------------------------------------------------------
# char-trigram language identification
# ---------------------------------------------------------------------------


def _char_trigrams(text_col: str) -> Column:
    t = F.col(text_col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(t) - 2),
            lambda i: t.substr(i, F.lit(3)),
        )
    )


def lang_id_confusion(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    seed_mod: int = SEED_MOD,
    profile_k: int = PROFILE_K,
) -> DataFrame:
    """Language-ID by char-trigram corpus profiles, reported as the
    (true lang, predicted lang, n_docs) confusion matrix.

    Seed docs (id % seed_mod == 0) supply per-language document
    frequencies of their distinct trigrams; each language keeps its
    profile_k most frequent (ties by trigram) as a broadcast profile.
    Every held-out document scores each language by the integer sum of
    matched profile frequencies and predicts the max-score language,
    ties broken by language name — row_number, mirrored exactly in the
    oracle. Integer arithmetic throughout.

    Scale: the profile aggregate runs over the seed fraction only; the
    scoring join broadcasts |langs| * profile_k rows; per-document
    argmax is a window over |langs| rows per doc. The held-out fact
    table is scanned once and shuffled twice (score agg, argmax) —
    acceptable because both shuffles carry (doc, lang) aggregates, not
    raw trigrams.
    """
    tri = rebalance(df.select(id_col, lang_col, text_col)).select(
        id_col, lang_col, F.explode(_char_trigrams(text_col)).alias("tg")
    )
    seed = tri.where(F.col(id_col) % seed_mod == 0)
    profile = (
        seed.groupBy(lang_col, "tg")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(lang_col).orderBy(
                    F.col("cnt").desc(), F.col("tg").asc()
                )
            ),
        )
        .where(F.col("rn") <= profile_k)
        .select(F.col(lang_col).alias("lang_cand"), "tg", "cnt")
    )
    scores = (
        tri.where(F.col(id_col) % seed_mod != 0)
        .join(F.broadcast(profile), "tg")
        .groupBy(id_col, lang_col, "lang_cand")
        .agg(F.sum("cnt").alias("score"))
    )
    pred = scores.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(id_col).orderBy(
                F.col("score").desc(), F.col("lang_cand").asc()
            )
        ),
    ).where(F.col("rn") == 1)
    return (
        pred.groupBy(F.col(lang_col).alias("lang"), F.col("lang_cand").alias("lang_pred"))
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def lang_id_confusion_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text: str = "text",
    lang: str = "lang",
    seed_mod: int = SEED_MOD,
    profile_k: int = PROFILE_K,
) -> str:
    return f"""
    WITH tri AS (
      SELECT {id_col}, {lang},
        unnest(list_distinct([substr({text}, i, 3)
                              FOR i IN generate_series(1, len({text})-2)])) AS tg
      FROM {table}),
    profile AS (
      SELECT {lang} AS lang_cand, tg, cnt FROM (
        SELECT {lang}, tg, count(*) AS cnt,
               row_number() OVER (PARTITION BY {lang}
                                  ORDER BY count(*) DESC, tg ASC) AS rn
        FROM tri WHERE {id_col} % {seed_mod} = 0 GROUP BY {lang}, tg)
      WHERE rn <= {profile_k}),
    scores AS (
      SELECT t.{id_col}, t.{lang} AS lang_true, p.lang_cand, sum(p.cnt) AS score
      FROM tri t JOIN profile p ON t.tg = p.tg
      WHERE t.{id_col} % {seed_mod} <> 0
      GROUP BY 1, 2, 3),
    pred AS (
      SELECT {id_col}, lang_true, lang_cand AS lang_pred FROM (
        SELECT *, row_number() OVER (PARTITION BY {id_col}
                                     ORDER BY score DESC, lang_cand ASC) AS rn
        FROM scores) WHERE rn = 1)
    SELECT lang_true AS lang, lang_pred, CAST(count(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY 1, 2
    """


K_ANON = 5
K_ANON_LEN_BUCKET = 50  # n_chars div 50: coarse length generalization


def k_anonymity_audit(
    docs: DataFrame,
    k: int = K_ANON,
    len_bucket: int = K_ANON_LEN_BUCKET,
) -> DataFrame:
    """k-anonymity audit over the release quasi-identifiers (Sweeney
    2002): group the corpus by (lang, source, length bucket) — the
    attributes a "de-identified" release would still carry — and emit
    every equivalence class smaller than ``k``, the classes where a
    member is re-identifiable by linking those attributes.  One row per
    risky class (the quasi-identifier values, its size, and the re-id
    risk ceiling in ppm = 1e6/size), ordered by size then keys so the
    audit is a stable artifact.

    Plan/scale: ONE map-side-combined aggregate over the generalized
    keys (class count is bounded by the QI domain, orders of magnitude
    below the corpus), then a scan-side filter on the class size —
    no join, no window, one shuffle."""
    classes = (
        docs.select(
            "lang",
            "source",
            F.expr(f"CAST(n_chars AS BIGINT) div {len_bucket}").alias(
                "len_bucket"
            ),
        )
        .groupBy("lang", "source", "len_bucket")
        .agg(F.count("*").cast("long").alias("class_size"))
    )
    return (
        classes.filter(F.col("class_size") < k)
        .select(
            "lang",
            "source",
            "len_bucket",
            "class_size",
            F.expr("1000000 div class_size").cast("long").alias("reid_risk_ppm"),
        )
        .orderBy("class_size", "lang", "source", "len_bucket")
    )


def k_anonymity_audit_sql(
    table: str = "documents",
    k: int = K_ANON,
    len_bucket: int = K_ANON_LEN_BUCKET,
) -> str:
    return f"""
    SELECT lang, source, len_bucket, class_size,
           (1000000 // class_size)::BIGINT AS reid_risk_ppm
    FROM (
      SELECT lang, source,
             (n_chars // {len_bucket})::BIGINT AS len_bucket,
             count(*)::BIGINT AS class_size
      FROM {table}
      GROUP BY 1, 2, 3)
    WHERE class_size < {k}
    ORDER BY class_size, lang, source, len_bucket
    """
