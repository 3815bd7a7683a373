"""Cross-family tokenizer comparison — BPE vs unigram-LM vs WordPiece
fertility on ONE shared word domain.

Choosing a tokenizer for a training run is a measured decision, not a
default: the standard procedure (SentencePiece's own eval, the BERT
and GPT-2 papers' appendices) encodes the same corpus under each
candidate and compares fertility (subword pieces per word,
occurrence-weighted).  This module composes the repo's three trained
tokenizer families on the SAME distinct-word domain — words of length
<= ``MAX_WORD_LEN`` (the unigram/WordPiece encode scope; BPE is
restricted to it here so the three numbers are comparable) — into one
three-row report.

Comparability note: BPE piece counts include the ``</w>`` end-of-word
marker (the original Sennrich formulation this repo's BPE implements),
so its fertility carries a +1-per-word offset by construction; the
report exposes raw sums precisely so a reader can normalize either
way.  All sums are BIGINT; the single fertility division is one IEEE
double division of two exact integers (both engines identical).

100-TB shape: every branch is bounded by the distinct-word domain
(the dictionary-first lever used by all three encode surfaces —
billions of occurrences, millions of distinct words); the three
aggregates are map-side-combined scalar rollups, and the final frame
is three rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import unigram, wordpiece
from .bpe import (
    END_MARK,
    N_MERGES,
    _apply_merges_fold,
    _recursion_ctes,
    learn_merges,
    word_vocab,
)
from .unigram import MAX_WORD_LEN


def _rollup(per_word: DataFrame, name: str) -> DataFrame:
    """(tokenizer, n_words, n_occurrences, n_pieces, fertility) from a
    per-distinct-word frame with (n_occurrences, n_pieces)."""
    so = F.sum("n_occurrences").cast("long")
    sp = F.sum(F.col("n_occurrences") * F.col("n_pieces")).cast("long")
    return per_word.agg(
        F.count("*").cast("long").alias("n_words"),
        so.alias("n_occurrences"),
        sp.alias("n_pieces"),
        F.when(so == 0, F.lit(-1.0))
        .otherwise(sp.cast("double") / so)
        .alias("fertility"),
    ).select(F.lit(name).alias("tokenizer"), "*")


def _bpe_word_pieces(
    docs: DataFrame, text_col: str = "text", wv_all: DataFrame | None = None
) -> DataFrame:
    """(word, n_occurrences, n_pieces): the BPE encode restricted to
    the shared <= MAX_WORD_LEN distinct-word domain — the JVM fold
    path of ``bpe.encode_token_counts`` (N_MERGES <= FOLD_DEPTH_LIMIT)
    over the occurrence-counted word vocabulary.  ``wv_all``: the
    report's one shared word-vocab frame (see
    :func:`tokenizer_fertility_compare`)."""
    merges = [
        (r["left"], r["right"])
        for r in learn_merges(docs, text_col, wv=wv_all).collect()
    ]
    if wv_all is None:
        wv_all = word_vocab(docs, text_col)
    wv = wv_all.filter(F.length("word") <= MAX_WORD_LEN)
    syms = F.concat(F.split(F.col("word"), ""), F.array(F.lit(END_MARK)))
    if merges:
        syms = _apply_merges_fold(
            syms, F.concat(F.col("word"), F.lit(END_MARK)), merges
        )
    return wv.select(
        "word",
        F.col("n").cast("long").alias("n_occurrences"),
        F.size(syms).cast("long").alias("n_pieces"),
    )


def tokenizer_fertility_compare(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The three-row report: one row per tokenizer family, each
    aggregated over the identical word domain.  The encode stages are
    the families' own production paths (JVM merge fold / integer
    Viterbi Arrow stage / greedy MaxMatch Arrow stage) — this operator
    adds only the shared restriction and the rollups."""
    # ONE word-vocab pass for all three families (guide §1.2): the
    # report previously re-ran the corpus explode+aggregate ~6x (BPE
    # merge collect + encode domain, unigram seed + domain, WordPiece
    # vocab + domain); every branch is a pure function of this frame
    wv_all = word_vocab(docs, text_col).localCheckpoint()
    rows = [
        _rollup(_bpe_word_pieces(docs, text_col, wv_all=wv_all), "bpe"),
        _rollup(
            unigram.encode_viterbi(docs, text_col, wv=wv_all).select(
                "n_occurrences", "n_pieces"
            ),
            "unigram",
        ),
        _rollup(
            wordpiece.encode_wordpiece(docs, text_col, wv=wv_all).select(
                "n_occurrences", "n_pieces"
            ),
            "wordpiece",
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def _rollup_sql(inner: str, name: str) -> str:
    return f"""
    SELECT '{name}' AS tokenizer,
           count(*)::BIGINT AS n_words,
           coalesce(sum(n_occurrences), 0)::BIGINT AS n_occurrences,
           coalesce(sum(n_occurrences * n_pieces), 0)::BIGINT AS n_pieces,
           CASE WHEN coalesce(sum(n_occurrences), 0) = 0 THEN -1.0
                ELSE sum(n_occurrences * n_pieces)::DOUBLE
                     / sum(n_occurrences) END AS fertility
    FROM ({inner}) {name}_side"""


def tokenizer_fertility_compare_sql(
    table: str = "documents", text_col: str = "text"
) -> str:
    """DuckDB mirror: each family's own encode oracle as a derived
    table (the BPE branch reuses the shared merge recursion, length-
    restricted to the common domain), one rollup each, UNION ALL."""
    bpe_inner = f"""
      WITH RECURSIVE {_recursion_ctes(table, text_col, N_MERGES)},
      final AS (
        SELECT word, n AS n_occurrences, len(syms)::BIGINT AS n_pieces
        FROM st WHERE lvl = (SELECT max(lvl) FROM st)
      )
      SELECT word, n_occurrences, n_pieces FROM final
      WHERE length(word) <= {MAX_WORD_LEN}"""
    uni_inner = unigram.encode_viterbi_sql(table, text_col)
    wp_inner = wordpiece.encode_wordpiece_sql(table, text_col)
    return (
        _rollup_sql(bpe_inner, "bpe")
        + "\n    UNION ALL\n"
        + _rollup_sql(uni_inner, "unigram")
        + "\n    UNION ALL\n"
        + _rollup_sql(wp_inner, "wordpiece")
    )
