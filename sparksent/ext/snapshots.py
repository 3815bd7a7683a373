"""Crawl-snapshot delta — the incremental-ingestion front door.

A production web pipeline never re-processes a whole crawl: each new
snapshot (a CommonCrawl dump, a recrawl batch) is diffed against the
previous one by CANONICAL URL, and only `new` + `changed` pages enter
the expensive extract/dedup/gate chain while `gone` pages are
tombstoned out of the index.  This module implements that diff as one
operator: classify every canonical URL across two snapshots as
``unchanged`` / ``changed`` / ``new`` / ``gone`` by comparing content
fingerprints.

No reference counterpart (traubad/FlinkSentimentAnalysis is a
single-stream engine with no persistence between runs); this extends
the training-data-pipeline surface the brief makes first-class, and it
is the natural consumer of the round-14 URL canonicalizer: the diff
key is the canonical URL, so the six hostile raw shapes of the same
resource diff as ONE page, not six.

Fixture law (deterministic, mirrored in the oracle): snapshot A is the
whole ``documents`` table under the round-14 URL law with
``fp = md5(text)``.  Snapshot B derives from A by ``doc_id % 7``:

- ``doc_id % 7 == 0`` — the page is GONE from B;
- ``doc_id % 7 == 1`` — the page CHANGED (``text || ' rev2'``);
- ``doc_id % 7 == 2`` — the page is unchanged AND the site published a
  NEW page at ``https://<source>.example.org/docs/new-<doc_id>``
  (constructed directly in canonical form: lowercase https host, no
  default port, no trailing slash — the shape the canonicalizer would
  emit);
- otherwise — unchanged.

100-TB shape: each snapshot's fingerprint rides its own parquet scan
(md5 in the scan projection — no UDF, no Python); the FULL OUTER join
co-partitions both sides on ``curl``, so the shuffle carries only
(curl, 32-hex fp) pairs — never page text.  Status classification is
pure projection over the joined frame.  At 1000 executors this is two
linear scans + one hash-partitioned join; AQE handles dump-vs-delta
size asymmetry (a daily recrawl B is orders of magnitude smaller than
the full index A, and the planner is free to broadcast it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .urls import _fixture_url_sql, _parts_sql, canonical_url, with_fixture_urls

GONE_MOD = 0  # doc_id % 7 class removed from snapshot B
CHANGED_MOD = 1  # doc_id % 7 class whose text gains ' rev2' in B
NEW_MOD = 2  # doc_id % 7 class that also publishes a new page in B


def _snapshot_a(docs: DataFrame) -> DataFrame:
    """(curl, fp_a): the previous snapshot — every document under the
    URL law, fingerprinted."""
    return with_fixture_urls(docs.select("doc_id", "source", "text")).select(
        canonical_url(F.col("url")).alias("curl"),
        F.md5(F.col("text")).alias("fp_a"),
    )


def _snapshot_b(docs: DataFrame) -> DataFrame:
    """(curl, fp_b): the new snapshot under the B law (gone pages
    dropped, changed pages re-fingerprinted, new pages appended)."""
    base = with_fixture_urls(docs.select("doc_id", "source", "text"))
    survivors = base.filter(F.col("doc_id") % 7 != GONE_MOD).select(
        canonical_url(F.col("url")).alias("curl"),
        F.md5(
            F.when(
                F.col("doc_id") % 7 == CHANGED_MOD,
                F.concat(F.col("text"), F.lit(" rev2")),
            ).otherwise(F.col("text"))
        ).alias("fp_b"),
    )
    fresh = docs.filter(F.col("doc_id") % 7 == NEW_MOD).select(
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.org/docs/new-"),
            F.col("doc_id").cast("string"),
        ).alias("curl"),
        F.md5(
            F.concat(
                F.lit("new page "),
                F.col("doc_id").cast("string"),
                F.lit(" from "),
                F.col("source"),
            )
        ).alias("fp_b"),
    )
    return survivors.unionByName(fresh)


def crawl_snapshot_delta(docs: DataFrame) -> DataFrame:
    """(curl, status, fp_a, fp_b): every canonical URL present in
    either snapshot, classified ``unchanged`` / ``changed`` / ``new``
    / ``gone`` by fingerprint comparison; absent-side fingerprints are
    the ``''`` sentinel (never a NULL-vs-value ambiguity downstream).

    The join is 1:1 by construction (the URL law embeds ``doc_id`` in
    every path, and the B-side new pages use a ``/docs/new-`` prefix
    no A-side path carries)."""
    joined = _snapshot_a(docs).join(_snapshot_b(docs), "curl", "full_outer")
    status = (
        F.when(F.col("fp_a").isNull(), F.lit("new"))
        .when(F.col("fp_b").isNull(), F.lit("gone"))
        .when(F.col("fp_a") == F.col("fp_b"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        "curl",
        status.alias("status"),
        F.coalesce(F.col("fp_a"), F.lit("")).alias("fp_a"),
        F.coalesce(F.col("fp_b"), F.lit("")).alias("fp_b"),
    )


def _curls_sql(table: str = "documents") -> str:
    """CTE chain ending in ``curls(doc_id, curl)`` — the canonical URL
    of every document under the fixture law (the round-14 chain)."""
    return f"""{_fixture_url_sql(table)},
    {_parts_sql()},
    curls AS (
      SELECT doc_id,
             scheme || '://' || host ||
             CASE WHEN port = '' THEN '' ELSE ':' || port END ||
             path ||
             CASE WHEN qstr = '' THEN '' ELSE '?' || qstr END AS curl
      FROM parts
    )"""


def crawl_snapshot_delta_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`crawl_snapshot_delta`: same URL chain,
    same B law, same FULL OUTER + CASE classification."""
    return f"""
    WITH {_curls_sql(table)},
    snap_a AS (
      SELECT c.curl, md5(t.text) AS fp_a
      FROM curls c JOIN {table} t USING (doc_id)
    ),
    snap_b AS (
      SELECT c.curl,
             md5(CASE WHEN t.doc_id % 7 = {CHANGED_MOD}
                      THEN t.text || ' rev2' ELSE t.text END) AS fp_b
      FROM curls c JOIN {table} t USING (doc_id)
      WHERE t.doc_id % 7 <> {GONE_MOD}
      UNION ALL
      SELECT 'https://' || source || '.example.org/docs/new-' || doc_id AS curl,
             md5('new page ' || doc_id || ' from ' || source) AS fp_b
      FROM {table}
      WHERE doc_id % 7 = {NEW_MOD}
    )
    SELECT coalesce(a.curl, b.curl) AS curl,
           CASE WHEN a.curl IS NULL THEN 'new'
                WHEN b.curl IS NULL THEN 'gone'
                WHEN a.fp_a = b.fp_b THEN 'unchanged'
                ELSE 'changed' END AS status,
           coalesce(a.fp_a, '') AS fp_a,
           coalesce(b.fp_b, '') AS fp_b
    FROM snap_a a FULL OUTER JOIN snap_b b ON a.curl = b.curl
    """
