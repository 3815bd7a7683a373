"""Byte-pair-encoding merge learning — tokenizer training as a corpus
operator.

The industrial shape (and the one that scales to 100 TB): BPE training
never iterates over the corpus — it iterates over the WORD VOCABULARY
with counts. The distributed part is the vocabulary count (one
map-side-combined aggregate over every token occurrence); the merge
loop then runs on the collected vocab table, whose size is bounded by
|distinct words| (a few million for web scale — driver-sized) no matter
how many petabytes produced it. This module keeps that split explicit:

- :func:`word_vocab` — the distributed aggregate (Spark plan).
- :func:`learn_merges` — the deterministic driver-side loop over the
  collected vocab (pure Python, exact integer counts, total-order tie
  break), returning the merge table as a DataFrame.

Determinism: pair counts are exact integers from the aggregate; ties
break on (count DESC, left ASC, right ASC), so the merge sequence is a
pure function of the corpus. Verified in pytest by recomputing the loop
from an independent DuckDB word count (tests/test_properties.py), and
since round 6 the loop itself is SQL-expressible after all: the driver
hash-checks it against :func:`merges_sql`, a recursive CTE whose level
k applies merge k to every word row (argmax pair via an aggregate
subquery over the working table, greedy leftmost rewrite via a
``list_reduce`` fold).

Reference: traubad/FlinkSentimentAnalysis tokenizes on whitespace only
(SentimentAnalysis.scala:241-265); this is the extension to learned
subword vocabularies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tables import rebalance

N_MERGES = 16
END_MARK = "</w>"  # end-of-word symbol, per the original BPE formulation

# Largest merge count the JVM fold encode engine is allowed.  Since
# round 13 the engine is ONE nested ``aggregate`` over a literal
# merge-struct array (plan depth CONSTANT in the merge count), so this
# is a cost crossover, not an analysis ceiling: higher-order functions
# evaluate interpreted, so per-word cost grows with every merge the
# fold walks, while the Arrow engine's Python scan skips absent merges
# with one C-speed substring check.  Measured on pyspark 4.1.2
# (20k-distinct-word domain, 1024 merges): nested JVM fold ~9.4 s vs
# Arrow ~0.7 s — so production merge tables (30k-50k) take the Arrow
# ``mapInPandas`` over the DISTINCT WORD domain (bounded rows — the
# same domain trick the vocab stage uses).  At the registered depth
# (16) the JVM fold wins: no Python worker, whole plan stays JVM-side,
# and plan analysis is a small constant (the round-11..13 bench creep
# of the old one-aggregate-layer-PER-MERGE chain — 1.31 -> 2.41 s of
# pure Catalyst analysis, which ABORTED outright at 128 chained layers
# with "Max iterations (100) reached for batch Resolution" — is gone).
FOLD_DEPTH_LIMIT = 16


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over every whitespace token occurrence — the ONLY
    corpus-sized stage of BPE training; map-side combine makes the
    shuffle carry one row per distinct word per partition."""
    return (
        rebalance(df)
        .select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def word_vocab_capped(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    max_vocab: int | None = None,
    wv: DataFrame | None = None,
) -> DataFrame:
    """:func:`word_vocab` with the production driver-bytes caps applied
    in-plan: ``min_count`` is a HAVING pushed into the same shuffle,
    ``max_vocab`` a distributed sort-limit under the total order
    (n DESC, word ASC) — deterministic because word is unique after the
    group-by.  This is the exact frame :func:`learn_merges` collects, so
    the driver can hash-check the only corpus-sized stage of BPE
    training (the merge loop stays the documented rows-only case)."""
    vdf = word_vocab(df, text_col) if wv is None else wv
    if min_count > 1:
        vdf = vdf.where(F.col("n") >= min_count)
    if max_vocab is not None:
        vdf = vdf.orderBy(F.col("n").desc(), F.col("word")).limit(max_vocab)
    return vdf


def word_vocab_sql(
    table: str = "documents",
    text_col: str = "text",
    min_count: int = 1,
    max_vocab: int | None = None,
) -> str:
    """DuckDB oracle for :func:`word_vocab_capped`: the same whitespace
    split (single-space delimiter, empties dropped — Spark ``split`` and
    DuckDB ``string_split`` agree on consecutive-delimiter behavior),
    the same HAVING cap, the same total-order LIMIT."""
    having = f"HAVING count(*) >= {min_count}" if min_count > 1 else ""
    limit = (
        f"ORDER BY n DESC, word LIMIT {max_vocab}" if max_vocab is not None else ""
    )
    return f"""
    SELECT word, count(*)::BIGINT AS n
    FROM (SELECT unnest(string_split({text_col}, ' ')) AS word FROM {table}) t
    WHERE word <> ''
    GROUP BY word
    {having}
    {limit}
    """


def merges_sql(
    table: str = "documents",
    text_col: str = "text",
    n_merges: int = N_MERGES,
) -> str:
    """DuckDB oracle for :func:`learn_merges`: the FULL merge loop as a
    recursive CTE, closing the registry's last rows-only exemption.

    Level k of the recursion holds one row per vocabulary word carrying
    its current symbol list plus the merge that produced the level.
    The recursive term references the working table twice — once for
    the rows, once inside the argmax-pair aggregate (both legal in
    DuckDB) — and the greedy leftmost non-overlapping rewrite is a
    ``list_reduce`` fold: append the next symbol, or collapse it into
    the accumulator's tail when (tail, next) is the chosen pair.  The
    fold is equivalent to the scan in :func:`learn_merges_py` because a
    collapsed symbol is strictly longer than the pair's left element,
    so it can never re-match as ``left`` within the same step.  Ties
    break on (count DESC, left, right): DuckDB's binary UTF-8 ORDER BY
    equals Python's code-point tuple order.
    """
    return f"""
    WITH RECURSIVE {_recursion_ctes(table, text_col, n_merges)}
    SELECT DISTINCT (lvl - 1)::INT AS step, m_left AS "left",
                    m_right AS "right", m_cnt AS pair_count
    FROM st WHERE m_left IS NOT NULL
    """


def _recursion_ctes(table: str, text_col: str, n_merges: int) -> str:
    """The shared ``vocab``/``st`` CTE text of the BPE merge recursion
    (used by both :func:`merges_sql` and :func:`encode_sql` — the same
    recursion yields the merge table from the per-level markers AND the
    encoded vocabulary from the deepest level's symbol lists)."""
    return f"""vocab AS (
      SELECT word, count(*)::BIGINT AS n
      FROM (SELECT unnest(string_split({text_col}, ' ')) AS word FROM {table}) t
      WHERE word <> ''
      GROUP BY word
    ),
    st AS (
      SELECT 0 AS lvl, word,
             list_append(string_split(word, ''), '{END_MARK}') AS syms, n,
             NULL::VARCHAR AS m_left, NULL::VARCHAR AS m_right,
             NULL::BIGINT AS m_cnt
      FROM vocab
      UNION ALL
      SELECT s.lvl + 1, s.word,
             list_reduce(
               list_transform(s.syms, x -> [x]),
               (acc, x) -> CASE WHEN acc[-1] = b.l AND x[1] = b.r
                                THEN acc[1:len(acc) - 1] || [b.l || b.r]
                                ELSE acc || x END) AS syms,
             s.n, b.l, b.r, b.c
      FROM st s
      CROSS JOIN (
        SELECT l, r, sum(c)::BIGINT AS c
        FROM (
          SELECT (u.p).l AS l, (u.p).r AS r, (u.p).c AS c
          FROM st t2, unnest(list_transform(
            range(1, len(t2.syms)),
            i -> {{'l': t2.syms[i], 'r': t2.syms[i + 1], 'c': t2.n}})) AS u(p)
        )
        GROUP BY l, r
        ORDER BY c DESC, l, r
        LIMIT 1
      ) b
      WHERE s.lvl < {n_merges}
    )"""


def _apply_merges_fold(syms0, stream, merges):
    """The whole merge table applied to a symbol array as ONE nested
    JVM-side ``aggregate``: the outer fold walks a LITERAL array of
    (l, r) merge structs in learned order; its step is the inner fold —
    the exact Spark analog of the oracle's ``list_reduce`` and of the
    scan in :func:`learn_merges_py` (equivalence argument in
    :func:`merges_sql`): append the next symbol, or collapse it into
    the accumulator tail when (tail, next) is this merge's pair.

    Two layers of ``aggregate`` TOTAL, whatever the merge count — the
    old shape (one chained ``aggregate`` layer per merge) made Catalyst
    analysis cost grow with the merge table and abort at 128 layers
    (FOLD_DEPTH_LIMIT docstring).  The ``contains`` pre-check skipping
    merges absent from the word is sound for the same reason as in
    :func:`apply_merges_py`: every symbol is a contiguous run of the
    original ``word + END_MARK`` stream, so (l, r) can only ever be
    adjacent if ``l + r`` occurs literally in that stream."""
    marr = F.array(
        *[
            F.struct(F.lit(l).alias("l"), F.lit(r).alias("r"))
            for l, r in merges
        ]
    )
    return F.aggregate(
        marr,
        syms0,
        lambda acc, m: F.when(
            ~F.contains(stream, F.concat(m["l"], m["r"])), acc
        ).otherwise(
            F.aggregate(
                acc,
                F.expr("CAST(array() AS array<string>)"),
                lambda a2, x: F.when(
                    (F.size(a2) > 0)
                    & (F.element_at(a2, -1) == m["l"])
                    & (x == m["r"]),
                    F.concat(
                        F.slice(a2, 1, F.size(a2) - 1),
                        F.array(F.concat(m["l"], m["r"])),
                    ),
                ).otherwise(F.concat(a2, F.array(x))),
            )
        ),
    )


def apply_merges_py(word: str, merges: list[tuple[str, str]]) -> int:
    """Sequential greedy-leftmost merge application to one word —
    byte-for-byte the semantics of :func:`_apply_merges_fold` walked in
    merge order (and of the rewrite loop in :func:`learn_merges_py`),
    returning the post-merge subword count.  The substring pre-check is
    sound because every symbol is a contiguous run of the original
    ``word + END_MARK`` stream, so a pair (l, r) can only ever match if
    ``l + r`` occurs literally in that stream — at a production merge
    count almost every merge skips in one C-speed ``in``."""
    stream = word + END_MARK
    syms = list(word) + [END_MARK]
    for left, right in merges:
        if left + right not in stream:
            continue
        out = []
        i, n = 0, len(syms)
        while i < n:
            if i < n - 1 and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


def _encode_distinct_words_arrow(words: DataFrame, merges) -> DataFrame:
    """(word) -> (word, n_subwords) via ONE Arrow ``mapInPandas`` over
    the distinct-word domain.  Plan depth is constant in the merge
    count (the merge table rides in the task closure, bounded by the
    ``learn_merges`` vocab caps), so this path has no Catalyst ceiling
    — see FOLD_DEPTH_LIMIT."""
    merges = list(merges)

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "n_subwords": [
                        apply_merges_py(w, merges) for w in pdf["word"]
                    ],
                }
            )

    return words.mapInPandas(enc, "word string, n_subwords long").select(
        "word", F.col("n_subwords").cast("long").alias("n_subwords")
    )


def encode_token_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = N_MERGES,
    fold_limit: int = FOLD_DEPTH_LIMIT,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Tokenizer APPLY — encode every document under the learned merge
    table and report real BPE token counts: (doc_id, n_words,
    n_tokens), where n_tokens counts post-merge subword symbols
    (including the </w> markers, merged or not).

    The 100-TB shape: encoding runs over the DISTINCT WORD domain only
    (dictionary-first, the fuzzy_name_pairs lever — billions of
    occurrences, millions of distinct words); the per-word subword
    counts then broadcast-join back onto the occurrence stream and one
    map-side-combinable doc_id sum finishes.  The per-word encode has
    two engines with identical semantics (pinned by
    tests/test_properties.py::test_bpe_encode_paths_agree):

    - ``n_merges <= fold_limit``: ONE nested JVM-side ``aggregate``
      over the literal merge array (:func:`_apply_merges_fold`) — zero
      Python, plan depth constant in the merge count (the pre-round-13
      chain of one ``aggregate`` layer per merge made Catalyst analysis
      a creeping per-run constant and aborted at 128 layers).
    - above: one Arrow ``mapInPandas`` over the distinct words —
      proven at n_merges=1024 by tests/test_properties.py::
      test_bpe_encode_production_merge_count.  Interpreted HOF
      evaluation walks every merge per word, so at production merge
      counts the Python scan with its C-speed substring skip wins ~10x
      (FOLD_DEPTH_LIMIT docstring); per-row Python on a BOUNDED
      domain, never on the occurrence stream."""
    # ONE word-vocab corpus pass (guide §1.2): learn_merges' vocab
    # collect and the encode word domain both need it, and the domain
    # previously re-derived it as a SECOND corpus explode + distinct
    # aggregate.  word_vocab already drops empty tokens, so its word
    # set IS the distinct-word domain; the pin makes the collect's
    # work reusable instead of recomputed (same seam as
    # unigram/wordpiece encode).
    wv = word_vocab(df, text_col).localCheckpoint()
    merges = [
        (r["left"], r["right"])
        for r in learn_merges(df, text_col, n_merges, wv=wv).collect()
    ]
    words = (
        df.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
    )
    distinct_words = wv.select("word")
    if len(merges) <= fold_limit:
        syms0 = F.concat(F.split(F.col("word"), ""), F.array(F.lit(END_MARK)))
        if merges:
            # a zero-element literal struct array wouldn't analyze, and
            # zero merges leave every word at its initial symbol split
            syms0 = _apply_merges_fold(
                syms0, F.concat(F.col("word"), F.lit(END_MARK)), merges
            )
        enc = distinct_words.select(
            "word", F.size(syms0).cast("long").alias("n_subwords")
        )
    else:
        enc = _encode_distinct_words_arrow(distinct_words, merges)
    per_doc = (
        words.join(F.broadcast(enc), "word")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_subwords").cast("long").alias("n_tokens"),
        )
    )
    return (
        df.select(id_col, *carry_cols)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            *carry_cols,
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        )
    )


def encode_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = N_MERGES,
) -> str:
    """DuckDB oracle for :func:`encode_token_counts`: the merge
    recursion of :func:`merges_sql` ALREADY carries every vocabulary
    word's rewritten symbol list at each level — every word advances
    together each level (the recursive term cross-joins all rows with
    the one chosen pair), so the deepest level holds the fully encoded
    vocabulary and ``len(syms)`` is the per-word token count."""
    return f"""
    WITH RECURSIVE {_recursion_ctes(table, text_col, n_merges)},
    final AS (
      SELECT word, len(syms)::BIGINT AS n_subwords
      FROM st WHERE lvl = (SELECT max(lvl) FROM st)
    ),
    doctoks AS (
      SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS word
      FROM {table}
    ),
    per_doc AS (
      SELECT t.{id_col}, count(*)::BIGINT AS n_words,
             sum(f.n_subwords)::BIGINT AS n_tokens
      FROM doctoks t JOIN final f USING (word)
      WHERE t.word <> ''
      GROUP BY 1
    )
    SELECT d.{id_col},
           coalesce(p.n_words, 0)::BIGINT AS n_words,
           coalesce(p.n_tokens, 0)::BIGINT AS n_tokens
    FROM {table} d LEFT JOIN per_doc p USING ({id_col})
    """


def _encode_counts_ctes(
    table: str,
    text_col: str,
    id_col: str,
    n_merges: int,
    carry_cols: tuple[str, ...] = (),
) -> str:
    """Shared CTE text producing ``counts`` — one row per ``table`` row
    with its real BPE token count under the learned merge table (the
    SQL twin of :func:`encode_token_counts`'s (id, n_tokens) frame).
    ``carry_cols`` ride through for downstream grouping.  Used by every
    BPE-count composition oracle (packing, token-budget sampling)."""
    carry = "".join(f"d.{c}, " for c in carry_cols)
    return f"""{_recursion_ctes(table, text_col, n_merges)},
    final AS (
      SELECT word, len(syms)::BIGINT AS n_subwords
      FROM st WHERE lvl = (SELECT max(lvl) FROM st)
    ),
    doctoks AS (
      SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS word
      FROM {table}
    ),
    per_doc AS (
      SELECT t.{id_col}, sum(f.n_subwords)::BIGINT AS n_tokens
      FROM doctoks t JOIN final f USING (word)
      WHERE t.word <> ''
      GROUP BY 1
    ),
    counts AS (
      SELECT d.{id_col}, {carry}coalesce(p.n_tokens, 0)::BIGINT AS n_tokens
      FROM {table} d LEFT JOIN per_doc p USING ({id_col})
    )"""


def seq_packing_bpe_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = N_MERGES,
    ctx_len: int = 512,
    n_shards: int = 64,
) -> str:
    """DuckDB oracle for the BPE-count packing composition
    (``seq_packing_bpe_512``): :func:`encode_sql`'s per-document token
    counts feeding :func:`sparksent.ext.curation.seq_packing_sql`'s
    shard-partitioned packing window."""
    return f"""
    WITH RECURSIVE {_encode_counts_ctes(table, text_col, id_col, n_merges)},
    sharded AS (
      SELECT {id_col}, {id_col} % {n_shards} AS shard, n_tokens
      FROM counts
    )
    SELECT {id_col}, shard, n_tokens,
           (COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY {id_col}
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            // {ctx_len})::BIGINT AS seq_id,
           (COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY {id_col}
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            % {ctx_len})::BIGINT AS "offset"
    FROM sharded
    """


def sample_token_budget_bpe_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "lang",
    n_merges: int = N_MERGES,
    budget: int = 8_000,
) -> str:
    """DuckDB oracle for greedy first-fit token-budget sampling under
    REAL BPE token counts (``sample_token_budget_bpe``): the encode
    counts CTE feeding the same md5-lottery running-sum admission as
    :func:`sparksent.ext.curation.sample_token_budget_sql`."""
    from .hashing import h60_sql

    lot = h60_sql(f"'tokbudget:'||{id_col}::VARCHAR")
    return f"""
    WITH RECURSIVE {_encode_counts_ctes(table, text_col, id_col, n_merges,
                                        carry_cols=(group_col,))},
    r AS (
      SELECT *, {lot} AS lottery FROM counts
    ),
    s AS (
      SELECT *, coalesce(sum(n_tokens) OVER (
               PARTITION BY {group_col} ORDER BY lottery, {id_col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
             AS prior_tokens
      FROM r
    )
    SELECT {id_col}, {group_col}, n_tokens, prior_tokens
    FROM s WHERE prior_tokens < {budget}
    """


def fertility_per_group_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "lang",
    n_merges: int = N_MERGES,
) -> str:
    """DuckDB oracle for ``bpe_fertility_per_lang``: per-group tokenizer
    fertility (subword tokens per whitespace word — the standard
    multilingual tokenizer-quality metric; >1.0x means the vocabulary
    splits that language's words more).  BIGINT sums, one IEEE
    division, -1.0 sentinel for a group with zero words."""
    return f"""
    WITH RECURSIVE {_recursion_ctes(table, text_col, n_merges)},
    final AS (
      SELECT word, len(syms)::BIGINT AS n_subwords
      FROM st WHERE lvl = (SELECT max(lvl) FROM st)
    ),
    doctoks AS (
      SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS word
      FROM {table}
    ),
    per_doc AS (
      SELECT t.{id_col}, count(*)::BIGINT AS n_words,
             sum(f.n_subwords)::BIGINT AS n_tokens
      FROM doctoks t JOIN final f USING (word)
      WHERE t.word <> ''
      GROUP BY 1
    )
    SELECT d.{group_col},
           count(*)::BIGINT AS n_docs,
           coalesce(sum(p.n_words), 0)::BIGINT AS n_words,
           coalesce(sum(p.n_tokens), 0)::BIGINT AS n_tokens,
           CASE WHEN coalesce(sum(p.n_words), 0) = 0 THEN -1.0
                ELSE sum(p.n_tokens)::DOUBLE / sum(p.n_words) END AS fertility
    FROM {table} d LEFT JOIN per_doc p USING ({id_col})
    GROUP BY 1
    """


def packing_efficiency_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = N_MERGES,
    ctx_len: int = 512,
    n_shards: int = 64,
) -> str:
    """DuckDB oracle for ``packing_efficiency_bpe_512``: per-shard
    capacity-planning report of the BPE-count packing — sequence count
    is the exact ceiling of the shard's token total over ctx_len, fill
    is an exact integer ppm of the allocated capacity (the waste is
    the final sequence's tail padding, since packing is head-to-tail
    contiguous by construction)."""
    return f"""
    WITH RECURSIVE {_encode_counts_ctes(table, text_col, id_col, n_merges)},
    shards AS (
      SELECT {id_col} % {n_shards} AS shard,
             count(*)::BIGINT AS n_docs,
             sum(n_tokens)::BIGINT AS n_tokens
      FROM counts GROUP BY 1
    )
    SELECT shard, n_docs, n_tokens,
           ((n_tokens + {ctx_len - 1}) // {ctx_len})::BIGINT AS n_seqs,
           (((n_tokens + {ctx_len - 1}) // {ctx_len}) * {ctx_len})::BIGINT
             AS capacity,
           CASE WHEN n_tokens = 0 THEN 0
                ELSE (n_tokens * 1000000)
                     // (((n_tokens + {ctx_len - 1}) // {ctx_len}) * {ctx_len})
           END::BIGINT AS fill_ppm
    FROM shards
    """


def learn_merges_py(vocab: list[tuple[str, int]], n_merges: int = N_MERGES):
    """The exact merge loop on a (word, count) vocabulary. Pure Python
    by design (see module docstring); deterministic total order."""
    symbols = {w: tuple(list(w) + [END_MARK]) for w, _ in vocab}
    counts = dict(vocab)
    merges: list[tuple[int, str, str, int]] = []
    for step in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, syms in symbols.items():
            c = counts[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        merges.append((step, left, right, cnt))
        joined = left + right
        new_symbols = {}
        for w, syms in symbols.items():
            out = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == left and syms[i + 1] == right:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_symbols[w] = tuple(out)
        symbols = new_symbols
    return merges


def learn_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = N_MERGES,
    min_count: int = 1,
    max_vocab: int | None = None,
    wv: DataFrame | None = None,
) -> DataFrame:
    """Distributed vocab count -> driver merge loop -> merge table
    (step, left, right, pair_count). The collect is bounded by distinct
    words, not corpus size — document-scale data never reaches the
    driver.

    At web scale "distinct words" is itself heavy-tailed (typos, URLs,
    hashes) and can exceed driver memory, so the collect is capped: rows
    below ``min_count`` are dropped in the aggregate (a HAVING, pushed
    into the same shuffle), and ``max_vocab`` keeps only the top-K words
    by (n DESC, word ASC) via a distributed sort-limit.  Both default to
    "off" (min_count=1, max_vocab=None) so fixture-scale results — and
    the exact pytest oracle — are unchanged; production callers set e.g.
    min_count=2, max_vocab=5_000_000 for a hard driver-bytes bound.
    Frequency truncation is the standard practical BPE compromise: words
    seen once cannot dominate any merge decision at corpus scale."""
    vdf = word_vocab_capped(df, text_col, min_count, max_vocab, wv=wv)
    vocab = [(r["word"], r["n"]) for r in vdf.collect()]
    vocab.sort()  # collect order is partition-dependent; the loop is not
    merges = learn_merges_py(vocab, n_merges)
    spark = df.sparkSession
    return spark.createDataFrame(
        merges, "step int, left string, right string, pair_count bigint"
    )
