"""DuckDB oracle SQL generators that pin engine-specific float semantics.

Spark's exact ``percentile()`` (catalyst
``aggregate/percentiles.scala::getPercentile``) computes, over the
sorted non-null multiset of n values::

    pos   = q * (n - 1)                  # double
    l, h  = floor(pos), ceil(pos)        # indexes into the sorted values
    if l == h:            return v[l]
    if v[l] == v[h]:      return v[l]    # equal-keys shortcut (the
                                         # counts-map collapses ties)
    return (h - pos) * v[l] + (pos - l) * v[h]

DuckDB's ``quantile_cont`` computes the same weighted form but WITHOUT
the equal-keys shortcut, so when ``v[l] == v[h]`` the two engines can
differ by 1 ULP (``(h-pos)*v + (pos-l)*v`` need not round back to
``v``).  Hypothesis found the divergence at
``values=[0,0,0,999999.8749999999,999999.8749999999], q=0.95``
(tests/test_properties.py::test_percentile_cross_engine_agreement).

``spark_percentile_select`` therefore spells the Spark formula out as
plain window+CASE SQL — every float op (the q*(n-1) multiply, the two
products, the one add) appears exactly once in the same association
order Spark uses, so the oracle is bit-for-bit by construction instead
of by coincidence.  Contract: the value expression is non-NULL (groups
whose values are all NULL would drop out here but produce a NULL
percentile row in Spark — none of the registered fixtures has NULL
measures, and the callers filter or guarantee non-null).
"""

from __future__ import annotations


def _pos(q: float, n_col: str) -> str:
    """The Spark position expression ``q * (n - 1)`` as DuckDB SQL.

    ``repr(q)`` round-trips the exact double; DuckDB parses the literal
    to DECIMAL and the ``::DOUBLE`` cast is correctly rounded, so the
    SQL double equals the Python/JVM double for any q that itself
    round-trips (all registered quantiles do; the property test pins
    agreement on arbitrary doubles).
    """
    return f"(({q!r})::DOUBLE * ({n_col} - 1))"


def spark_percentile_select(
    source: str,
    group_col: str | list[str],
    value_col: str,
    qs: dict[str, float],
) -> str:
    """SQL computing Spark-exact percentiles of ``value_col`` per
    ``group_col`` (a column name, or a list for composite groups) over
    ``source`` (a table name or parenthesized subquery).  Output
    columns: the group column(s) plus one DOUBLE column per ``qs``
    alias.  Mirrors Spark ``percentile()`` bit-for-bit including the
    equal-keys shortcut (module docstring)."""
    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    glist = ", ".join(groups)
    lo_hi = []
    outs = []
    for alias, q in qs.items():
        p = _pos(q, "_cnt")
        pin = _pos(q, "_n")
        lo_hi.append(
            f"max(CASE WHEN _i = CAST(floor({pin}) AS BIGINT) THEN _v END)"
            f" AS _lo_{alias},\n"
            f"      max(CASE WHEN _i = CAST(ceil({pin}) AS BIGINT) THEN _v END)"
            f" AS _hi_{alias}"
        )
        outs.append(
            f"CASE WHEN _hi_{alias} = _lo_{alias} THEN _lo_{alias}\n"
            f"        ELSE (ceil({p}) - {p}) * _lo_{alias}"
            f" + ({p} - floor({p})) * _hi_{alias}\n"
            f"      END AS {alias}"
        )
    lo_hi_sql = ",\n      ".join(lo_hi)
    outs_sql = ",\n      ".join(outs)
    return f"""
    SELECT {glist},
      {outs_sql}
    FROM (
      SELECT {glist}, any_value(_n) AS _cnt,
      {lo_hi_sql}
      FROM (
        SELECT {glist}, {value_col} AS _v,
               row_number() OVER (PARTITION BY {glist} ORDER BY {value_col})
                 - 1 AS _i,
               count(*) OVER (PARTITION BY {glist}) AS _n
        FROM {source}
        WHERE ({value_col}) IS NOT NULL
      ) GROUP BY {glist}
    )"""
