"""Cross-engine deterministic hashing.

Spark's native ``xxhash64``/``hash`` have no DuckDB equivalent, so every
hash the oracle must reproduce is derived from md5 (both engines agree
byte-for-byte on md5 of the same string): take a hex prefix, parse as an
integer. 15 hex digits = 60 bits (safe in BIGINT), 7 hex digits = 28
bits (safe for modular multiply below 2^63).

Verified: Spark ``conv(substring(md5(s),1,k),16,10)`` equals DuckDB
``('0x'||substr(md5(s),1,k))::UBIGINT`` for k in {7,15}.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE31 = 2_147_483_647  # 2^31 - 1


def h60(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h28(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 7), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    return f"('0x'||substr(md5({expr}),1,15))::UBIGINT::BIGINT"


def h28_sql(expr: str) -> str:
    return f"('0x'||substr(md5({expr}),1,7))::UBIGINT::BIGINT"


# deterministic per-function affine parameters for MinHash: fixed LCG,
# identical constants embedded in both the Spark plan and the oracle SQL
def affine_params(n: int, seed: int = 7) -> list[tuple[int, int]]:
    params = []
    x = seed
    for _ in range(n):
        x = (1103515245 * x + 12345) % MERSENNE31
        a = x | 1  # odd, nonzero
        x = (1103515245 * x + 12345) % MERSENNE31
        b = x
        params.append((a, b))
    return params


# ---------------------------------------------------------------------------
# word shingles
# ---------------------------------------------------------------------------


def overlapping_gram_re(w: int) -> str:
    """Java regex extracting the overlapping w-word gram anchored at
    every word start, via a zero-width lookbehind+lookahead (group 1
    captures the gram without consuming it, so matches overlap). RE2
    (DuckDB) has no lookaround — the oracles keep the equivalent list
    comprehension over ``string_split(text, ' ')``.

    Contract: regex and comprehension agree only on SINGLE-SPACE-
    separated text (tabs/newlines/double spaces tokenize differently —
    the regex needs exactly one literal space between words, the split
    emits empty tokens).  Every fixture corpus satisfies this, and
    ``tests/test_00_fixtures.py`` pins it as a drift canary so a
    regenerated fixture with irregular whitespace fails loudly at round
    start instead of as a driver hash mismatch."""
    return r"(?<=^|\s)(?=(\S+(?: \S+){%d}))" % (w - 1)


def word_grams(text: Column | str, w: int = 2) -> Column:
    """Overlapping word w-gram array (empty when <w tokens; no
    whole-text fallback — callers that need one wrap it themselves,
    see ``shingles``/``curation.word_ngrams``). ONE codegen'd regex
    pass; the interpreted sequence/try_element_at chain measures ~13x
    slower on the fixture corpus."""
    t = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(t, F.lit(overlapping_gram_re(w)), 1)


def shingles(text: Column | str, w: int = 3) -> Column:
    """Distinct word w-grams of the text; short texts (< w words, where
    the gram regex cannot match) fall back to the whole text as one
    shingle. ONE codegen'd regex pass per row — the equivalent
    sequence/try_element_at higher-order-function chain evaluates
    interpreted and measured 13x slower on the fixture corpus."""
    t = F.col(text) if isinstance(text, str) else text
    grams = F.regexp_extract_all(t, F.lit(overlapping_gram_re(w)), 1)
    return F.array_distinct(
        F.when(F.size(grams) > 0, grams).otherwise(F.array(t))
    )


def shingles_sql(text: str = "text", w: int = 3) -> str:
    """DuckDB mirror of :func:`shingles` (1-based inclusive slicing)."""
    toks = f"string_split({text}, ' ')"
    return (
        f"list_distinct(CASE WHEN len({toks}) >= {w} THEN "
        f"[array_to_string({toks}[i:i+{w - 1}], ' ') "
        f"FOR i IN generate_series(1, len({toks}) - {w - 1})] "
        f"ELSE [{text}] END)"
    )
