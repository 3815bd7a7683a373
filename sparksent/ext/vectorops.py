"""Embedding-column vector operators beyond search: per-class centroids
and scalar quantization — the model-data side of a training pipeline
(class prototypes, ANN compression). No reference counterpart
(traubad/FlinkSentimentAnalysis has no vector columns); shaped for the
100-TB bar like ext/similarity.py.

Cross-engine exactness: element sums use the floor-scale trick —
``floor(x_double * 1e6)`` is one float multiply on identical operands
(identical result), then BIGINT summation (order-insensitive exact),
instead of decimal casts whose tie-rounding differs between engines
for binary fractions (e.g. 1/128 at 6 dp). Quantization avoids
``round`` entirely: ``floor(x/scale + 0.5)`` is the same
deterministic expression in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CENTROID_SCALE = 1_000_000  # 1e6: 6 fractional digits, |sum| << 2^53 at test SFs
QUANT_SCALE = 0.05  # int8 step: +-127 covers |x| <= 6.35
ERR_SCALE = 1_000_000_000  # 1e9 for reconstruction-error integer sums


def embedding_centroids(
    df: DataFrame, group_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-group elementwise mean of the embedding column, as
    (group, pos, n, centroid) rows.

    Plan: posexplode (64x narrow rows, no shuffle) -> ONE map-side-
    combined hash aggregate on (group, pos) — the shuffle carries only
    (n_groups x dims) partial sums per map task, never vectors. The
    BIGINT partial sums stay exact while |sum| < 2^53 (~9e9 scaled
    units; at larger corpora widen to DECIMAL for the sum column).
    posexplode emits 0-based positions; +1 aligns with the oracle's
    1-based ``generate_subscripts``.
    """
    xs = F.floor(F.col("x").cast("double") * F.lit(float(CENTROID_SCALE))).cast(
        "long"
    )
    return (
        df.select(F.col(group_col).alias("grp"), F.posexplode(vec_col).alias("pos", "x"))
        .select("grp", (F.col("pos") + 1).alias("pos"), xs.alias("xs"))
        .groupBy("grp", "pos")
        .agg(F.count("*").alias("n"), F.sum("xs").alias("sum_scaled"))
        .select(
            F.col("grp").alias(group_col),
            "pos",
            "n",
            "sum_scaled",
            (F.col("sum_scaled") / (F.col("n") * F.lit(float(CENTROID_SCALE))))
            .alias("centroid"),
        )
    )


def embedding_centroids_sql(
    table: str = "embeddings", group_col: str = "label", vec_col: str = "embedding"
) -> str:
    return f"""
    WITH expl AS (
      SELECT {group_col} AS grp,
             generate_subscripts({vec_col}, 1) AS pos,
             floor(unnest({vec_col})::DOUBLE * {float(CENTROID_SCALE)!r})::BIGINT AS xs
      FROM {table}
    )
    SELECT grp AS {group_col}, pos, count(*) AS n,
           sum(xs)::BIGINT AS sum_scaled,
           sum(xs)::BIGINT / (count(*) * {float(CENTROID_SCALE)!r}) AS centroid
    FROM expl GROUP BY 1, 2
    """


def quantize_error_stats(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric int8 scalar quantization round-trip, per vector:
    q_i = clamp(floor(x_i/scale + 0.5), -127, 127), reporting the
    summed absolute reconstruction error (floor-scaled integer — exact)
    plus the q range and clip count. Pure per-row array expressions:
    codegen'd map, zero shuffle, embarrassingly parallel at any scale.
    """
    xd = lambda x: x.cast("double")  # noqa: E731
    q = lambda x: F.greatest(  # noqa: E731
        F.lit(-127),
        F.least(F.lit(127), F.floor(xd(x) / F.lit(QUANT_SCALE) + F.lit(0.5)).cast("int")),
    )
    qarr = F.transform(vec_col, q)
    err = F.aggregate(
        F.zip_with(
            vec_col,
            qarr,
            lambda x, qi: F.floor(
                F.abs(xd(x) - qi.cast("double") * F.lit(QUANT_SCALE))
                * F.lit(float(ERR_SCALE))
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, e: acc + e,
    )
    n_clipped = F.size(
        F.filter(
            vec_col,
            lambda x: (F.floor(xd(x) / F.lit(QUANT_SCALE) + F.lit(0.5)) > 127)
            | (F.floor(xd(x) / F.lit(QUANT_SCALE) + F.lit(0.5)) < -127),
        )
    )
    return df.select(
        F.col(id_col),
        err.alias("sum_abs_err_scaled"),
        F.array_min(qarr).alias("q_min"),
        F.array_max(qarr).alias("q_max"),
        n_clipped.alias("n_clipped"),
    )


def quantize_error_stats_sql(
    table: str = "embeddings", id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    s = repr(QUANT_SCALE)
    qi = f"greatest(-127, least(127, floor(x::DOUBLE / {s} + 0.5)::INT))"
    raw = f"floor(x::DOUBLE / {s} + 0.5)"
    return f"""
    SELECT {id_col},
           list_sum([floor(abs(x::DOUBLE - {qi}::DOUBLE * {s})
                           * {float(ERR_SCALE)!r})::BIGINT
                     FOR x IN {vec_col}])::BIGINT AS sum_abs_err_scaled,
           list_min([{qi} FOR x IN {vec_col}]) AS q_min,
           list_max([{qi} FOR x IN {vec_col}]) AS q_max,
           len(list_filter({vec_col},
                           x -> {raw} > 127 OR {raw} < -127)) AS n_clipped
    FROM {table}
    """
