"""Host-level web-graph authority — PageRank over the extracted link
graph.

Real crawl pipelines rank HOSTS, not pages, for frontier
prioritization and spam triage (CommonCrawl publishes exactly this:
host- and domain-level ranks computed from the dump's link graph).
This module composes two existing surfaces into that operator: the
round-15 link-graph extraction (``ext/html.py:html_link_graph`` —
hrefs resolved + canonicalized per RFC 3986 subset) and the shared
integer-PageRank loop (``ext/iterative.py:pagerank_iterations`` — all
per-round arithmetic in positive-integer floordivs, bit-exact across
engines).

Graph law: nodes are canonical HOSTS; a directed edge src→dst with
weight w when pages on host src carry w resolved links to host dst,
SELF-EDGES EXCLUDED (same-host nav links say nothing about external
authority — the standard web-graph convention).  On the fixture corpus
every page host links to the two share-widget hosts
(``share.example.com``, ``cdn.example.net``), which have no out-links:
the externals are DANGLING sinks that accumulate rank far above
teleport while every source host stays at teleport level — the
asymmetry the test pins.

100-TB shape: the edge build is link-graph scan work + ONE
(src, dst) aggregate whose map-side combine collapses per-partition
duplicate host pairs before the shuffle (host-pair cardinality ≪ link
cardinality); the narrow aggregated edge frame is localCheckpoint-
pinned (consumed by out-weights + every round).  Ranks/out-weights are
host-cardinality and broadcast here; at web-scale node counts the same
round structure co-partitions edges and ranks on src — one shuffle per
iteration (see ``pagerank_iterations``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import html, urls
from .iterative import (
    hits_iterations,
    hits_rounds_sql,
    pagerank_iterations,
    pagerank_rounds_sql,
)

# canonical URLs are 'scheme://host[:port]/path[?q]' with lowercase
# host and no userinfo — one anchored group stops at ':' or '/'
_CURL_HOST_RE = "^[a-z]+://([^/:]+)"

PR_ITERS = 3
PR_DAMPING = 85


def host_link_edges(docs: DataFrame, lk: DataFrame | None = None) -> DataFrame:
    """(src, dst, w): the host-level edge list of the fixture corpus —
    link-graph edges keyed by the page's own canonical host, self-edges
    dropped, weights = link counts.  The doc→host join is
    doc_id-co-partitioned (both sides derive from one scan; Catalyst
    collapses it to scan-side projection work here).

    ``lk``: optional prebuilt link frame carrying (doc_id, dst_curl) —
    consumers that ALSO need the link graph for themselves
    (frontier_authority: frontier aggregate + this edge build) extract
    it once and pass it in, so the regex-heavy page synthesis +
    extraction scan runs a single time (guide §1.2: remove duplicate
    passes before anything else)."""
    if lk is None:
        pages = html.with_html_pages(
            urls.with_fixture_urls(docs.select("doc_id", "source", "text")),
            carry=("url",),
        )
        # src_host carried out of the one extraction pass (round 16):
        # the former page_hosts doc_id join re-derived the URL law +
        # canonical-host CASE from a SECOND scan, and the join+agg
        # stage fused with that CASE blew the JVM 64 KB method limit
        # (janino "Code grows beyond 64 KB" in the round-start bench
        # log for all three host-graph queries) — whole-stage codegen
        # fell back to interpreted for the edge build.  The lazy pin
        # ends the extraction's codegen stage before the aggregate;
        # the narrow link frame is edge-cardinality (guide §1.2/§7.2).
        lk = (
            html.html_link_graph(pages, src_host=True)
            .select("doc_id", "dst_curl", "src_host")
            .localCheckpoint(eager=False)
        )
    if "src_host" in lk.columns:
        keyed = lk.select(
            F.col("src_host").alias("src"),
            F.regexp_extract(F.col("dst_curl"), _CURL_HOST_RE, 1).alias("dst"),
        )
    else:
        # seam fallback for a caller-prebuilt (doc_id, dst_curl) frame
        page_hosts = urls.with_fixture_urls(docs.select("doc_id", "source")).select(
            "doc_id", urls.canonical_host(F.col("url")).alias("src")
        )
        keyed = lk.join(page_hosts, "doc_id").select(
            "src",
            F.regexp_extract(F.col("dst_curl"), _CURL_HOST_RE, 1).alias("dst"),
        )
    return (
        keyed.filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("w"))
    )


def host_pagerank(
    docs: DataFrame,
    iters: int = PR_ITERS,
    damping: int = PR_DAMPING,
    lk: DataFrame | None = None,
) -> DataFrame:
    """(host, out_weight, pr): integer PageRank over the host graph.
    Node set = every host appearing as a source OR destination (the
    dangling share/cdn hosts are first-class nodes — they receive
    mass, emit none, and leak the truncated remainder per the loop's
    documented dangling simplification).  ``lk`` as in
    :func:`host_link_edges` (a caller-shared link-graph pass)."""
    edges = host_link_edges(docs, lk=lk).localCheckpoint()  # outw + every round
    nodes = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint()
    )
    return pagerank_iterations(edges, nodes, iters, damping, node_col="host")


def _host_graph_parts(table: str = "documents") -> list[str]:
    """Shared oracle CTE parts building ``edges(src, dst, w)`` and
    ``nodes(host)`` from the link-graph + page-host chains — consumed
    by both the PageRank and HITS mirrors."""
    return [
        f"""lk AS MATERIALIZED (
          SELECT doc_id, dst_curl
          FROM ({html.html_link_graph_sql(table)}) lk_side
        )""",
        f"""ph AS MATERIALIZED (
          SELECT doc_id, host AS src
          FROM (WITH {urls._fixture_url_sql(table)},
                {urls._parts_sql()}
                SELECT doc_id, host FROM parts) ph_side
        )""",
        f"""e0 AS (
          SELECT ph.src,
                 regexp_extract(lk.dst_curl, '{_CURL_HOST_RE}', 1) AS dst
          FROM lk JOIN ph USING (doc_id)
        )""",
        """edges AS (
          SELECT src, dst, count(*)::BIGINT AS w
          FROM e0 WHERE src <> dst GROUP BY 1, 2
        )""",
        """nodes AS (
          SELECT src AS host FROM edges UNION SELECT dst FROM edges
        )""",
    ]


def host_pagerank_sql(
    table: str = "documents", iters: int = PR_ITERS, damping: int = PR_DAMPING
) -> str:
    """DuckDB mirror: the link-graph oracle chain as a derived table,
    the page-host parts chain as a second one, then the shared
    unrolled-round SQL from :func:`pagerank_rounds_sql`."""
    parts = _host_graph_parts(table)
    parts += pagerank_rounds_sql(iters, damping, node_col="host")
    joined = ",\n".join(parts)
    return f"""WITH {joined}
    SELECT r.host, coalesce(o.ow, 0)::BIGINT AS out_weight, r.pr
    FROM r{iters} r LEFT JOIN outw o ON r.host = o.src"""


HITS_ITERS = 2


def host_hits(docs: DataFrame, iters: int = HITS_ITERS) -> DataFrame:
    """(host, hub, auth): weighted HITS (Kleinberg 1999, the
    hubs-and-authorities counterpart of :func:`host_pagerank`) over
    the same extracted host graph — real crawl stacks compute both,
    because they disagree exactly where spam triage needs them to
    (a link farm is a strong hub and an empty authority; PageRank
    alone conflates the two mass flows).

    Fixture law: external links only ever point AT the two
    share-widget hosts, so after any round authorities concentrate
    entirely on ``share.example.com``/``cdn.example.net`` (hub 0) and
    every page host is pure hub (auth 0) — the sharp separation the
    witness test pins.

    100 TB shape: identical to :func:`host_pagerank` — the edge build
    is the one map-side-combined (src, dst) aggregate,
    localCheckpoint-pinned; per half-round the score side is
    host-cardinality (broadcast here, co-partitioned at web-scale) and
    the raw update partial-aggregates before its shuffle.  All
    arithmetic positive-integer (see ``hits_iterations``)."""
    edges = host_link_edges(docs).localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint()
    )
    return hits_iterations(edges, nodes, iters, node_col="host")


def host_hits_sql(table: str = "documents", iters: int = HITS_ITERS) -> str:
    """DuckDB mirror: shared host-graph CTEs + the unrolled HITS
    rounds from :func:`hits_rounds_sql`."""
    parts = _host_graph_parts(table)
    parts += hits_rounds_sql(iters, node_col="host")
    joined = ",\n".join(parts)
    return f"""WITH {joined}
    SELECT h.host, h.hub, a.auth
    FROM h{iters} h JOIN a{iters} a USING (host)"""
