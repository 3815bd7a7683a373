"""Unigram-LM (SentencePiece-style) subword tokenizer — the tokenizer
family most modern LLM pipelines actually train (VERDICT r15 gap #4;
Kudo 2018, "Subword Regularization"; the `ext/bpe.py` complement).

The industrial split is the same one BPE uses and the one that scales
to 100 TB: **nothing here ever iterates the corpus**.  The corpus-sized
stages are (a) the word-vocabulary count (one map-side-combined
aggregate — shared with BPE via :func:`bpe.word_vocab`) and (b) the
substring-candidate count, which explodes substrings over the DISTINCT
WORD domain weighted by word counts — rows are bounded by
|distinct words| x O(len x MAX_PIECE_LEN), never by corpus size.
Everything downstream (seed selection, Viterbi segmentation, the
hard-EM re-estimation) runs on word-domain or vocab-domain frames.

Pipeline:

1. **Seed vocabulary** (:func:`seed_vocab`): all substrings of length
   <= ``MAX_PIECE_LEN`` of every distinct word, occurrence-weighted by
   word count; keep the top ``SEED_VOCAB`` under the total order
   (count DESC, piece ASC) PLUS every single-character piece (the
   coverage guarantee — Viterbi always has a path).
2. **Viterbi encode** (:func:`encode_viterbi`): per distinct word (the
   bounded domain trick again), the max-log-probability segmentation
   under piece scores ``floor((ln(cnt) - ln(total)) * 1e6)`` —
   **quantized to integer micro-nats BEFORE the DP**, so the dynamic
   program is pure integer arithmetic and the cross-engine compare is
   exact (ties break: fewer pieces, then lexicographically smaller
   piece string — total order, both engines).  The ln itself is one
   libm call per vocab row in each engine (CPython math.log and DuckDB
   ln both bind glibc log on this platform); only the quantized
   integer enters the DP.
3. **Hard-EM step** (:func:`em_reestimate`): the M-step over the
   Viterbi E-step — piece usage counts re-accumulated over the corpus
   (piece count = sum over words of word_count x uses-in-word), the
   frame a second training round would renormalize.  SentencePiece
   runs soft EM over the segmentation lattice; the hard (Viterbi) EM
   variant is the standard deterministic approximation and keeps the
   oracle exact.

Spark shapes: the candidate explode is one higher-order-function
projection over the word-vocab frame (bounded domain, so interpreted
HOF cost is bounded — the ext/bpe.py crossover note); Viterbi is ONE
Arrow ``mapInPandas`` over distinct words with the seed vocab riding
the closure (vocab is driver-sized by construction, the BPE
merge-table precedent); the EM step is explode + map-side-combined
aggregate.  The DuckDB oracle mirrors Viterbi as a LAYERED DP —
``MAX_WORD_LEN`` cumulative CTEs, each MATERIALIZED (the repo's
level-CTE rule: DuckDB inlines plain CTEs into every reference, and a
12-deep chain would otherwise expand exponentially).

Scope (documented): encode covers words of length <= ``MAX_WORD_LEN``
(12) — longer words are filtered from BOTH engines' word domain; a
production encoder would chunk them (the CDC precedent) without
changing the DP.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import word_vocab

MAX_PIECE_LEN = 6
MAX_WORD_LEN = 12
SEED_VOCAB = 512
SCORE_SCALE = 1_000_000  # micro-nats


# ---------------------------------------------------------------------------
# seed vocabulary
# ---------------------------------------------------------------------------


def candidate_counts(
    docs: DataFrame, text_col: str = "text", wv: DataFrame | None = None
) -> DataFrame:
    """(piece, cnt): occurrence-weighted substring counts over the
    distinct-word domain — every substring of length <= MAX_PIECE_LEN
    at every start position, weighted by the word's corpus count.  The
    explode is a flatten(transform(sequence...)) projection: bounded
    domain x bounded positions, all JVM-side.  ``wv``: optional
    prebuilt word-vocab frame — word_vocab is the one CORPUS-sized
    aggregate of the tokenizer family, so consumers that need it twice
    (encode: seed collect + word domain) compute it once and pass it
    in (guide §1.2)."""
    if wv is None:
        wv = word_vocab(docs, text_col)
    pieces = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(
                        F.lit(MAX_PIECE_LEN), F.length("word") - i + 1
                    ),
                ),
                lambda l: F.substring(F.col("word"), i, l),  # noqa: E741
            ),
        )
    )
    return (
        wv.select(F.col("n"), F.explode(pieces).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("n").cast("long").alias("cnt"))
    )


def seed_vocab(
    docs: DataFrame, text_col: str = "text", wv: DataFrame | None = None
) -> DataFrame:
    """(piece, cnt, in_topk): the top-``SEED_VOCAB`` candidates under
    (cnt DESC, piece ASC) plus ALL single-character pieces (coverage).
    The rank is a window over the AGGREGATED candidate frame — vocab
    cardinality, never corpus."""
    from pyspark.sql import Window

    cand = candidate_counts(docs, text_col, wv=wv)
    w = Window.orderBy(F.col("cnt").desc(), F.col("piece").asc())
    ranked = cand.withColumn("rk", F.row_number().over(w))
    return (
        ranked.filter(
            (F.col("rk") <= SEED_VOCAB) | (F.length("piece") == 1)
        )
        .select(
            "piece",
            "cnt",
            (F.col("rk") <= SEED_VOCAB).alias("in_topk"),
        )
    )


def candidate_counts_sql(table: str = "documents", text_col: str = "text") -> str:
    return f"""
    wv AS (
      SELECT word, count(*)::BIGINT AS n FROM (
        SELECT unnest(string_split({text_col}, ' ')) AS word FROM {table}
      ) WHERE word <> '' GROUP BY word
    ),
    cand AS (
      SELECT piece, sum(n)::BIGINT AS cnt FROM (
        SELECT w.n,
               unnest(flatten([[w.word[i:i+l-1]
                                FOR l IN range(1, least({MAX_PIECE_LEN},
                                                length(w.word) - i + 1) + 1)]
                               FOR i IN range(1, length(w.word) + 1)]))
                 AS piece
        FROM wv w
      ) GROUP BY piece
    )"""


def seed_vocab_sql(table: str = "documents", text_col: str = "text") -> str:
    return f"""
    WITH {candidate_counts_sql(table, text_col)},
    ranked AS (
      SELECT piece, cnt,
             row_number() OVER (ORDER BY cnt DESC, piece ASC) AS rk
      FROM cand
    )
    SELECT piece, cnt, (rk <= {SEED_VOCAB}) AS in_topk
    FROM ranked
    WHERE rk <= {SEED_VOCAB} OR length(piece) = 1
    """


# ---------------------------------------------------------------------------
# Viterbi encode
# ---------------------------------------------------------------------------


def _viterbi(word: str, scores: dict[str, int]) -> tuple[int, int, str]:
    """Integer-score Viterbi over one word: returns (n_pieces,
    score_micro, pieces-joined-by-space) under the total order
    (score DESC, n_pieces ASC, pieces ASC) — the exact argmax the
    layered SQL DP mirrors."""
    n = len(word)
    # best[j] = (neg_score, n_pieces, path) minimal tuple == argmax
    best: list[tuple[int, int, str] | None] = [None] * (n + 1)
    best[0] = (0, 0, "")
    for j in range(1, n + 1):
        cands = []
        for i in range(max(0, j - MAX_PIECE_LEN), j):
            b = best[i]
            if b is None:
                continue
            piece = word[i:j]
            s = scores.get(piece)
            if s is None:
                continue
            path = piece if b[2] == "" else b[2] + " " + piece
            cands.append((b[0] - s, b[1] + 1, path))
        if cands:
            best[j] = min(cands)
    assert best[n] is not None, f"no segmentation for {word!r}"
    neg, np, path = best[n]
    return np, -neg, path


def encode_viterbi(
    docs: DataFrame, text_col: str = "text", wv: DataFrame | None = None
) -> DataFrame:
    """(word, n_occurrences, n_pieces, pieces, score_micro): the
    Viterbi segmentation of every distinct word of length <=
    MAX_WORD_LEN under the seed-vocab unigram LM.

    The seed vocab is collected at plan-construction time (bounded by
    SEED_VOCAB + |alphabet| — the BPE merge-table precedent) and rides
    the Arrow stage's closure; the DP runs once per DISTINCT word.
    Scores quantize to integer micro-nats BEFORE the DP (module
    docstring), so the Arrow stage does integer arithmetic only.

    The word vocab — the family's one corpus-sized aggregate — is
    computed ONCE and localCheckpoint-pinned: both consumers (the seed
    collect and the Arrow stage's word domain) previously re-ran the
    full corpus explode+aggregate (guide §1.2).  ``wv`` lets a caller
    that already holds the frame (tokenizer_fertility_compare) share
    it across tokenizer families."""
    import pandas as pd

    if wv is None:
        wv = word_vocab(docs, text_col).localCheckpoint()
    vocab_rows = seed_vocab(docs, text_col, wv=wv).collect()
    total = sum(r.cnt for r in vocab_rows)
    log_total = math.log(total)
    scores = {
        r.piece: math.floor((math.log(r.cnt) - log_total) * SCORE_SCALE)
        for r in vocab_rows
    }

    words = wv.filter(F.length("word") <= MAX_WORD_LEN).select(
        "word", F.col("n").alias("n_occurrences")
    )

    def enc(it):
        for pdf in it:
            nps, scs, paths = [], [], []
            for w in pdf["word"]:
                np_, sc, path = _viterbi(w, scores)
                nps.append(np_)
                scs.append(sc)
                paths.append(path)
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "n_occurrences": pdf["n_occurrences"],
                    "n_pieces": nps,
                    "score_micro": scs,
                    "pieces": paths,
                }
            )

    return words.mapInPandas(
        enc,
        "word string, n_occurrences long, n_pieces long,"
        " score_micro long, pieces string",
    )


def _score_cte_sql(table: str, text_col: str) -> str:
    """CTEs through ``scores(piece, score)`` — the quantized-micro-nat
    score table (seed vocab + total mass), mirrored."""
    return f"""{candidate_counts_sql(table, text_col)},
    ranked AS (
      SELECT piece, cnt,
             row_number() OVER (ORDER BY cnt DESC, piece ASC) AS rk
      FROM cand
    ),
    seed AS MATERIALIZED (
      SELECT piece, cnt FROM ranked
      WHERE rk <= {SEED_VOCAB} OR length(piece) = 1
    ),
    scores AS MATERIALIZED (
      SELECT piece,
             floor((ln(cnt) - ln((SELECT sum(cnt) FROM seed)))
                   * {SCORE_SCALE})::BIGINT AS score
      FROM seed
    )"""


def encode_viterbi_sql(table: str = "documents", text_col: str = "text") -> str:
    """The layered-DP oracle: ``edges`` materializes every (word,
    start, end, piece-score) lattice edge; cumulative CTEs a1..a12
    (each MATERIALIZED — the level-CTE rule) extend the frontier one
    END POSITION at a time; the per-position argmax is a row_number
    window under the same (score DESC, n_pieces ASC, path ASC) total
    order the Python DP minimizes."""
    layers = []
    prev = "a0"
    for j in range(1, MAX_WORD_LEN + 1):
        layers.append(f"""
    c{j} AS (
      SELECT a.word, a.wn, {j} AS pos,
             a.score + e.score AS score, a.np + 1 AS np,
             CASE WHEN a.path = '' THEN e.piece
                  ELSE a.path || ' ' || e.piece END AS path
      FROM {prev} a
      JOIN edges e ON e.word = a.word AND e.i = a.pos + 1 AND e.j = {j}
    ),
    b{j} AS (
      SELECT word, wn, pos, score, np, path FROM (
        SELECT *, row_number() OVER (PARTITION BY word
                    ORDER BY score DESC, np ASC, path ASC) AS rk
        FROM c{j}
      ) WHERE rk = 1
    ),
    a{j} AS MATERIALIZED (
      SELECT * FROM {prev} UNION ALL SELECT * FROM b{j}
    )""")
        prev = f"a{j}"
    chain = ",".join(layers)
    return f"""
    WITH {_score_cte_sql(table, text_col)},
    words AS MATERIALIZED (
      SELECT word, n AS wn FROM wv WHERE length(word) <= {MAX_WORD_LEN}
    ),
    edges AS MATERIALIZED (
      SELECT w.word, t.i, t.i + t.l - 1 AS j, s.score, s.piece
      FROM words w,
           LATERAL (
             SELECT i, l FROM
               unnest(range(1, length(w.word) + 1)) AS ti(i),
               unnest(range(1, {MAX_PIECE_LEN} + 1)) AS tl(l)
             WHERE i + l - 1 <= length(w.word)
           ) t
      JOIN scores s ON s.piece = w.word[t.i:t.i+t.l-1]
    ),
    a0 AS (
      SELECT word, wn, 0 AS pos, 0::BIGINT AS score, 0::BIGINT AS np,
             '' AS path
      FROM words
    ),{chain}
    SELECT word, wn::BIGINT AS n_occurrences, np::BIGINT AS n_pieces,
           score::BIGINT AS score_micro, path AS pieces
    FROM {prev}
    WHERE pos = length(word)
    """


# ---------------------------------------------------------------------------
# hard-EM re-estimation
# ---------------------------------------------------------------------------


def em_reestimate(
    docs: DataFrame, text_col: str = "text", wv: DataFrame | None = None
) -> DataFrame:
    """(piece, em_cnt): the M-step counts — each Viterbi piece usage
    weighted by its word's corpus count.  One explode over the encoded
    word domain + one map-side-combined aggregate."""
    enc = encode_viterbi(docs, text_col, wv=wv)
    return (
        enc.select(
            "n_occurrences",
            F.explode(F.split("pieces", " ")).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("n_occurrences").cast("long").alias("em_cnt"))
    )


def em_reestimate_sql(table: str = "documents", text_col: str = "text") -> str:
    return f"""
    SELECT piece, sum(n_occurrences)::BIGINT AS em_cnt
    FROM (
      SELECT n_occurrences,
             unnest(string_split(pieces, ' ')) AS piece
      FROM ({encode_viterbi_sql(table, text_col)}) enc
    )
    GROUP BY piece
    """
