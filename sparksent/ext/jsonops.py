"""JSON scalar operators over the ``events.props`` column (SURVEY.md
§2.7 extension — the reference has no JSON surface; our fixtures do)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_json_field(
    df: DataFrame, json_col: str = "props", path: str = "k", out_col: str = "k"
) -> DataFrame:
    """Extract a scalar from a JSON string column. ``get_json_object``
    evaluates without full parse materialization; for wide extraction
    prefer one ``from_json`` with an explicit schema (one parse, many
    fields)."""
    return df.withColumn(
        out_col, F.get_json_object(F.col(json_col), f"$.{path}").cast("int")
    )


def json_field_stats(df: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Per-key stats of props.k: count, exact sum, avg — the standard
    "JSON measure rollup" shape with a single parse in the scan
    projection."""
    parsed = with_json_field(df)
    return parsed.groupBy(key_col).agg(
        F.count("*").alias("n"),
        F.sum("k").alias("sum_k"),
        (F.sum("k").cast("double") / F.count("*")).alias("avg_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


def json_field_stats_sql(table: str = "events", key: str = "event_type") -> str:
    return f"""
    SELECT {key} AS event_type, count(*) AS n,
           sum(json_extract({table}.props, '$.k')::INT)::BIGINT AS sum_k,
           sum(json_extract({table}.props, '$.k')::INT)::DOUBLE / count(*) AS avg_k,
           min(json_extract({table}.props, '$.k')::INT) AS min_k,
           max(json_extract({table}.props, '$.k')::INT) AS max_k
    FROM {table} GROUP BY 1
    """
