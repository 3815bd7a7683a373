"""WordPiece subword tokenizer — greedy longest-match-first encoding
(the BERT-family tokenizer; Schuster & Nakajima 2012, Devlin et al.
2019), completing the repo's tokenizer trio: BPE (``ext/bpe.py``,
merge-rule training), unigram-LM (``ext/unigram.py``, Viterbi under
piece scores), and WordPiece (this module, position-aware vocab +
greedy MaxMatch).

What distinguishes WordPiece from the other two at the data level is
the POSITION-AWARE piece form: a piece that starts a word is stored
bare (``pre``), a continuation piece carries the ``##`` prefix
(``##fix``) — the same string at different positions is two different
vocab entries with independent counts.  Encoding is deterministic
greedy MaxMatch: at each position consume the LONGEST vocab piece in
the correct positional form, never backtracking.  No scores, no DP —
membership is boolean, so unlike the unigram oracle no tie order is
needed (the longest match is unique by construction).

Corpus-scale split (the bpe/unigram discipline): the only corpus-sized
stage is the word-vocabulary count (shared ``bpe.word_vocab`` — one
map-side-combined aggregate); candidate counting explodes positional
substrings over the DISTINCT-WORD domain weighted by word counts, and
the encode runs once per distinct word with the driver-sized vocab
riding an Arrow stage's closure (the BPE merge-table precedent).

Coverage guarantee: the vocab keeps ALL single-character pieces in
BOTH positional forms alongside the top-``WP_VOCAB`` candidates, so
greedy MaxMatch always advances and no UNK token is needed (real
WordPiece vocabs make the same guarantee over their training
alphabet; bytes-fallback is the production extension).

Scope (documented, shared with unigram): encode covers words of
length <= ``MAX_WORD_LEN`` (12) — the greedy loop unrolls to at most
12 SQL layers in the oracle; production chunks longer words (the CDC
precedent) without changing the match rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import word_vocab
from .unigram import MAX_PIECE_LEN, MAX_WORD_LEN

WP_VOCAB = 512


# ---------------------------------------------------------------------------
# vocabulary
# ---------------------------------------------------------------------------


def candidate_counts(
    docs: DataFrame, text_col: str = "text", wv: DataFrame | None = None
) -> DataFrame:
    """(piece, cnt): occurrence-weighted POSITIONAL substring counts
    over the distinct-word domain — substrings starting at position 1
    count under their bare form, all others under ``##``-prefixed
    form.  One flatten(transform(sequence...)) projection over the
    bounded word-vocab frame, all JVM-side.  ``wv``: optional prebuilt
    word-vocab frame (the unigram-family sharing seam — see
    ``ext/unigram.py``)."""
    if wv is None:
        wv = word_vocab(docs, text_col)
    pieces = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(MAX_PIECE_LEN), F.length("word") - i + 1),
                ),
                lambda l: F.concat(  # noqa: E741
                    F.when(i == 1, F.lit("")).otherwise(F.lit("##")),
                    F.substring(F.col("word"), i, l),
                ),
            ),
        )
    )
    return (
        wv.select(F.col("n"), F.explode(pieces).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("n").cast("long").alias("cnt"))
    )


def wordpiece_vocab(
    docs: DataFrame, text_col: str = "text", wv: DataFrame | None = None
) -> DataFrame:
    """(piece, cnt, in_topk): top-``WP_VOCAB`` positional candidates
    under (cnt DESC, piece ASC) plus every single-character piece in
    both forms (the coverage guarantee).  Rank is a window over the
    AGGREGATED candidate frame — vocab cardinality, never corpus."""
    from pyspark.sql import Window

    cand = candidate_counts(docs, text_col, wv=wv)
    w = Window.orderBy(F.col("cnt").desc(), F.col("piece").asc())
    ranked = cand.withColumn("rk", F.row_number().over(w))
    is_char = (F.length("piece") == 1) | (
        F.col("piece").startswith("##") & (F.length("piece") == 3)
    )
    return ranked.filter((F.col("rk") <= WP_VOCAB) | is_char).select(
        "piece", "cnt", (F.col("rk") <= WP_VOCAB).alias("in_topk")
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
               unnest(flatten([[(CASE WHEN i = 1 THEN '' ELSE '##' END)
                                || w.word[i:i+l-1]
                                FOR l IN range(1, least({MAX_PIECE_LEN},
                                                length(w.word) - i + 1) + 1)]
                               FOR i IN range(1, length(w.word) + 1)]))
                 AS piece
        FROM wv w
      ) GROUP BY piece
    )"""


def wordpiece_vocab_sql(table: str = "documents", text_col: str = "text") -> str:
    return f"""
    WITH {candidate_counts_sql(table, text_col)},
    ranked AS (
      SELECT piece, cnt,
             row_number() OVER (ORDER BY cnt DESC, piece ASC) AS rk
      FROM cand
    )
    SELECT piece, cnt, (rk <= {WP_VOCAB}) AS in_topk
    FROM ranked
    WHERE rk <= {WP_VOCAB}
       OR length(piece) = 1
       OR (piece LIKE '##%' AND length(piece) = 3)
    """


# ---------------------------------------------------------------------------
# greedy MaxMatch encode
# ---------------------------------------------------------------------------


def _maxmatch(word: str, vocab: set[str]) -> tuple[int, str]:
    """Greedy longest-match-first over one word: (n_pieces,
    pieces-joined-by-space) — the exact loop the layered SQL oracle
    unrolls.  Coverage (all single chars in both forms) guarantees
    progress."""
    out = []
    pos = 0
    n = len(word)
    while pos < n:
        mark = "" if pos == 0 else "##"
        for l in range(min(MAX_PIECE_LEN, n - pos), 0, -1):  # noqa: E741
            cand = mark + word[pos : pos + l]
            if cand in vocab:
                out.append(cand)
                pos += l
                break
        else:  # pragma: no cover - coverage guarantee makes this dead
            raise AssertionError(f"no match in {word!r} at {pos}")
    return len(out), " ".join(out)


def encode_wordpiece(
    docs: DataFrame, text_col: str = "text", wv: DataFrame | None = None
) -> DataFrame:
    """(word, n_occurrences, n_pieces, pieces): greedy WordPiece
    segmentation of every distinct word of length <= MAX_WORD_LEN.
    The vocab is collected at plan-construction time (bounded by
    WP_VOCAB + 2x|alphabet|) and rides the Arrow stage's closure; the
    match loop runs once per DISTINCT word (the unigram/bpe encode
    shape).  The word vocab — the one corpus-sized aggregate — is
    computed once and localCheckpoint-pinned for its two consumers
    (vocab collect + Arrow word domain), same seam as
    ``unigram.encode_viterbi``."""
    import pandas as pd

    if wv is None:
        wv = word_vocab(docs, text_col).localCheckpoint()
    vocab = {r.piece for r in wordpiece_vocab(docs, text_col, wv=wv).collect()}

    words = wv.filter(F.length("word") <= MAX_WORD_LEN).select(
        "word", F.col("n").alias("n_occurrences")
    )

    def enc(it):
        for pdf in it:
            nps, paths = [], []
            for w in pdf["word"]:
                np_, path = _maxmatch(w, vocab)
                nps.append(np_)
                paths.append(path)
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "n_occurrences": pdf["n_occurrences"],
                    "n_pieces": nps,
                    "pieces": paths,
                }
            )

    return words.mapInPandas(
        enc, "word string, n_occurrences long, n_pieces long, pieces string"
    )


def encode_wordpiece_sql(table: str = "documents", text_col: str = "text") -> str:
    """The unrolled greedy oracle: ``edges`` holds every (word, start,
    end) span whose positional form is IN the vocab; layer k extends
    each unfinished word by its LONGEST matching edge (row_number by
    span length DESC — unique, no tie order needed) while finished
    words pass through; MAX_WORD_LEN layers guarantee termination
    (every layer advances >= 1 char).  Each layer MATERIALIZED — the
    level-CTE rule."""
    layers = []
    prev = "s0"
    for k in range(1, MAX_WORD_LEN + 1):
        layers.append(f"""
    g{k} AS (
      SELECT s.word, s.wn, e.j AS pos, s.np + 1 AS np,
             CASE WHEN s.path = '' THEN e.piece
                  ELSE s.path || ' ' || e.piece END AS path
      FROM {prev} s
      JOIN edges e ON e.word = s.word AND e.i = s.pos + 1
      WHERE s.pos < length(s.word)
      QUALIFY row_number() OVER (PARTITION BY s.word ORDER BY e.j DESC) = 1
    ),
    s{k} AS MATERIALIZED (
      SELECT word, wn, pos, np, path FROM {prev} WHERE pos = length(word)
      UNION ALL
      SELECT word, wn, pos, np, path FROM g{k}
    )""")
        prev = f"s{k}"
    chain = ",".join(layers)
    return f"""
    WITH {candidate_counts_sql(table, text_col)},
    ranked AS (
      SELECT piece, cnt,
             row_number() OVER (ORDER BY cnt DESC, piece ASC) AS rk
      FROM cand
    ),
    vocab AS MATERIALIZED (
      SELECT piece FROM ranked
      WHERE rk <= {WP_VOCAB}
         OR length(piece) = 1
         OR (piece LIKE '##%' AND length(piece) = 3)
    ),
    words AS MATERIALIZED (
      SELECT word, n AS wn FROM wv WHERE length(word) <= {MAX_WORD_LEN}
    ),
    edges AS MATERIALIZED (
      SELECT w.word, t.i, t.i + t.l - 1 AS j, v.piece
      FROM words w,
           LATERAL (
             SELECT i, l FROM
               unnest(range(1, length(w.word) + 1)) AS ti(i),
               unnest(range(1, {MAX_PIECE_LEN} + 1)) AS tl(l)
             WHERE i + l - 1 <= length(w.word)
           ) t
      JOIN vocab v
        ON v.piece = (CASE WHEN t.i = 1 THEN '' ELSE '##' END)
                     || w.word[t.i:t.i+t.l-1]
    ),
    s0 AS (
      SELECT word, wn, 0 AS pos, 0::BIGINT AS np, '' AS path
      FROM words
    ),{chain}
    SELECT word, wn::BIGINT AS n_occurrences, np::BIGINT AS n_pieces,
           path AS pieces
    FROM {prev}
    WHERE pos = length(word)
    """
