"""Charset / encoding quality gate — the early drop every real crawl
pipeline runs (VERDICT r15 gap #3): crawled pages routinely declare one
encoding and carry another, and the damage surfaces AFTER decode as
three text-level artifact classes this gate counts and repairs:

1. **mojibake** — UTF-8 bytes decoded as Latin-1/cp1252 (``é`` ->
   ``Ã©``, ``’`` -> ``â€™``, NBSP -> ``Â `` …).  Detected with a
   fixed, documented sequence table (the ftfy-style core subset) and
   REPAIRED by the reverse mapping — chained literal replaces, applied
   longest-specificity order, identical in both engines;
2. **control characters** — C0 controls (minus tab; the corpus law is
   single-line so CR/LF never appear) and DEL, the standard
   text-quality strip (CCNet/RefinedWeb drop or clean these);
3. **replacement characters** — U+FFFD, what a lenient UTF-8 decode
   leaves behind for invalid byte sequences; its presence IS the
   byte-level-invalidity signal at the text layer (scope note: this
   repo's fixtures are string columns, already decoded — a binary
   ingest stage would run ``decode(bytes, 'UTF-8', lenient)`` first
   and land exactly here).

Counts surface as exact integer ppm (``*_ppm = n * 1_000_000 div
n_chars``) so the gate is bit-identical cross-engine; ``fail_mask``
bits name the artifact class (1 mojibake, 2 control, 4 replacement)
and ``clean_md5``/``n_chars_clean`` witness the repaired text.  All
expressions are scan-side codegen — zero shuffle, no Python, no UDF.

The fixture LAW (:func:`with_decoded_text`) appends planted artifacts
to ``documents.text``: a mojibake phrase on ``doc_id % 11 == 0``
(school/française/quotes — every table row exercised), BEL+DEL
controls on ``% 13 == 0``, and doubled U+FFFD on ``% 17 == 0``
(doc 0 gets all three — the stacked witness).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (mojibake sequence, repaired form) — UTF-8-read-as-Latin-1 artifacts,
# the ftfy core subset.  Order matters only for overlapping keys; none
# of these overlap, but the tuple order is the law on both engines.
MOJIBAKE_TABLE: tuple[tuple[str, str], ...] = (
    ("â€™", "’"),  # â€™  -> ’
    ("â€œ", "“"),  # â€œ  -> “
    ("â€“", "–"),  # â€“  -> –
    ("Ã©", "é"),        # Ã©   -> é
    ("Ã¨", "è"),        # Ã¨   -> è
    ("Ã§", "ç"),        # Ã§   -> ç
    ("Ã¼", "ü"),        # Ã¼   -> ü
    ("Â ", " "),             # Â<nbsp> -> space
)

REPLACEMENT_CHAR = "�"

# C0 controls minus tab(9)/LF(10)/CR(13), plus DEL(127).  The class is
# built from codepoints so the pattern string carries the raw chars
# (backslash-free, shared verbatim by Java regex and RE2); it starts at
# 1 — NUL can't ride a SQL literal and the law never plants it.
_CTRL_POINTS = "1-8, 11, 12, 14-31, 127"  # documentation of the class
_CTRL_CLASS = (
    "[" + chr(1) + "-" + chr(8) + chr(11) + chr(12)
    + chr(14) + "-" + chr(31) + chr(127) + "]"
)
_CTRL_CLASS_SQL = (
    "'[' || chr(1) || '-' || chr(8) || chr(11) || chr(12) || "
    "chr(14) || '-' || chr(31) || chr(127) || ']'"
)

_MOJIBAKE_RE = "|".join(seq for seq, _ in MOJIBAKE_TABLE)

# planted-artifact samples (the LAW; shared constants keep the Spark
# and SQL laws byte-identical)
MOJIBAKE_SAMPLE = (
    " Ã©cole franÃ§aise â€™quoted"
    "â€œ cafÃ©Â bar â€“ ok"
)
CTRL_LAW_SQL = "chr(7) || 'bell' || chr(127)"
CTRL_SAMPLE = chr(7) + "bell" + chr(127)
REPL_SAMPLE = REPLACEMENT_CHAR + "lost" + REPLACEMENT_CHAR

MAX_MOJIBAKE_PPM = 0  # any mojibake fails (the repair exists; a gate
#                       that tolerates artifacts just ships them)


def with_decoded_text(docs: DataFrame) -> DataFrame:
    """The law: (doc_id, decoded) — ``text`` with planted post-decode
    artifacts per the module docstring."""
    d = F.col("doc_id")
    decoded = F.concat(
        F.col("text"),
        F.when(d % 11 == 0, F.lit(MOJIBAKE_SAMPLE)).otherwise(F.lit("")),
        F.when(d % 13 == 0, F.lit(CTRL_SAMPLE)).otherwise(F.lit("")),
        F.when(d % 17 == 0, F.lit(REPL_SAMPLE)).otherwise(F.lit("")),
    )
    return docs.select("doc_id", decoded.alias("decoded"))


def _repair(txt: Column) -> Column:
    for seq, rep in MOJIBAKE_TABLE:
        txt = F.replace(txt, F.lit(seq), F.lit(rep))
    return F.regexp_replace(
        F.replace(txt, F.lit(REPLACEMENT_CHAR), F.lit("")), _CTRL_CLASS, ""
    )


def charset_quality_gate(
    docs: DataFrame, text_col: str = "decoded", id_col: str = "doc_id"
) -> DataFrame:
    """The operator: (doc_id, n_chars, n_mojibake, n_control,
    n_replacement, mojibake_ppm, control_ppm, replacement_ppm,
    fail_mask, pass, n_chars_clean, clean_md5).  Pure scan-side
    codegen — at 100 TB this rides the decode map stage with zero
    shuffle; the repair is the chained-literal-replace form whose cost
    is one pass per table row over the string (8 rows, bounded)."""
    t = F.col(text_col)
    counts = docs.select(
        id_col,
        F.length(t).cast("long").alias("n_chars"),
        F.regexp_count(t, F.lit(_MOJIBAKE_RE)).cast("long").alias("n_mojibake"),
        F.regexp_count(t, F.lit(_CTRL_CLASS)).cast("long").alias("n_control"),
        F.regexp_count(t, F.lit(REPLACEMENT_CHAR)).cast("long").alias(
            "n_replacement"
        ),
        _repair(t).alias("_clean"),
    )
    ppm = lambda n: F.expr(  # noqa: E731 — exact-integer ppm convention
        f"CASE WHEN n_chars > 0 THEN ({n} * 1000000) div n_chars"
        " ELSE CAST(0 AS BIGINT) END"
    )
    m = counts.select(
        id_col,
        "n_chars",
        "n_mojibake",
        "n_control",
        "n_replacement",
        ppm("n_mojibake").alias("mojibake_ppm"),
        ppm("n_control").alias("control_ppm"),
        ppm("n_replacement").alias("replacement_ppm"),
        "_clean",
    )
    fail_bits = (
        F.when(F.col("mojibake_ppm") > MAX_MOJIBAKE_PPM, 1).otherwise(0)
        + F.when(F.col("n_control") > 0, 2).otherwise(0)
        + F.when(F.col("n_replacement") > 0, 4).otherwise(0)
    )
    return m.select(
        id_col,
        "n_chars",
        "n_mojibake",
        "n_control",
        "n_replacement",
        "mojibake_ppm",
        "control_ppm",
        "replacement_ppm",
        fail_bits.cast("long").alias("fail_mask"),
        F.when(fail_bits == 0, 1).otherwise(0).cast("int").alias("pass"),
        F.length("_clean").cast("long").alias("n_chars_clean"),
        F.md5(F.col("_clean").cast("binary")).alias("clean_md5"),
    )


# ---------------------------------------------------------------------------
# DuckDB mirror
# ---------------------------------------------------------------------------


def _law_sql(table: str = "documents") -> str:
    moji = MOJIBAKE_SAMPLE.replace("'", "''")
    repl = f"chr(65533) || 'lost' || chr(65533)"
    return f"""decoded_docs AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 11 = 0 THEN '{moji}' ELSE '' END
             || CASE WHEN doc_id % 13 = 0 THEN {CTRL_LAW_SQL} ELSE '' END
             || CASE WHEN doc_id % 17 = 0 THEN {repl} ELSE '' END AS decoded
      FROM {table}
    )"""


def _repair_sql(expr: str) -> str:
    for seq, rep in MOJIBAKE_TABLE:
        s, r = seq.replace("'", "''"), rep.replace("'", "''")
        expr = f"replace({expr}, '{s}', '{r}')"
    return (
        f"regexp_replace(replace({expr}, chr(65533), ''), "
        f"{_CTRL_CLASS_SQL}, '', 'g')"
    )


def charset_quality_gate_sql(table: str = "documents") -> str:
    moji_re = _MOJIBAKE_RE.replace("'", "''")
    clean = _repair_sql("decoded")
    return f"""
    WITH {_law_sql(table)},
    c AS (
      SELECT doc_id,
             length(decoded)::BIGINT AS n_chars,
             len(regexp_extract_all(decoded, '{moji_re}'))::BIGINT AS n_mojibake,
             len(regexp_extract_all(decoded, {_CTRL_CLASS_SQL}))::BIGINT
               AS n_control,
             len(regexp_extract_all(decoded, chr(65533)))::BIGINT
               AS n_replacement,
             {clean} AS clean
      FROM decoded_docs
    ),
    m AS (
      SELECT doc_id, n_chars, n_mojibake, n_control, n_replacement,
             CASE WHEN n_chars > 0 THEN (n_mojibake * 1000000) // n_chars
                  ELSE 0 END::BIGINT AS mojibake_ppm,
             CASE WHEN n_chars > 0 THEN (n_control * 1000000) // n_chars
                  ELSE 0 END::BIGINT AS control_ppm,
             CASE WHEN n_chars > 0 THEN (n_replacement * 1000000) // n_chars
                  ELSE 0 END::BIGINT AS replacement_ppm,
             clean
      FROM c
    )
    SELECT doc_id, n_chars, n_mojibake, n_control, n_replacement,
           mojibake_ppm, control_ppm, replacement_ppm,
           ((CASE WHEN mojibake_ppm > {MAX_MOJIBAKE_PPM} THEN 1 ELSE 0 END)
          + (CASE WHEN n_control > 0 THEN 2 ELSE 0 END)
          + (CASE WHEN n_replacement > 0 THEN 4 ELSE 0 END))::BIGINT
             AS fail_mask,
           (CASE WHEN mojibake_ppm <= {MAX_MOJIBAKE_PPM}
                  AND n_control = 0 AND n_replacement = 0
             THEN 1 ELSE 0 END)::INT AS pass,
           length(clean)::BIGINT AS n_chars_clean,
           md5(clean) AS clean_md5
    FROM m
    """
