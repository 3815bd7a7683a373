"""URL / domain canonicalization — the front door to per-domain
corpus curation (VERDICT r13 ask #6).

Web-corpus pipelines key their caps and stats on CANONICALIZED hosts:
RefinedWeb and C4 both dedupe and quota per registrable domain after
normalizing scheme, case, ``www.``, ports, and trailing slashes —
otherwise ``https://www.Example.org/a/`` and ``http://example.org/a``
count as different publishers and every per-domain rule (e.g.
``sample_domain_quota``) silently fragments.  This module provides the
canonicalization as pure codegen'd string expressions (anchored
regexes + lower/concat — no UDFs, no shuffle; Catalyst folds the whole
chain into the scan projection), plus the per-domain stats/top-k
report over the result.

The fixture ``documents`` table has no URL column, so the registered
queries derive one deterministically from ``(doc_id, source)`` — the
same fixture-law technique as the multimodal oracles (imagedup.py's
variant law): six URL shapes cycling by ``doc_id % 6``, chosen so the
canonicalizer must exercise every rule (mixed-case scheme/host,
userinfo, default and non-default ports, ``www.`` prefixes, trailing
host dots, scheme-relative and scheme-less forms, fragments, trailing
slashes) and so DISTINCT raw URLs collapse to equal canonical URLs
(variants 0 and 1 canonicalize identically — the dedup case the
operator exists for).

Cross-engine notes (the reason every pattern is ANCHORED and
backslash-free): Spark's regexp_replace replaces every match while
DuckDB's replaces the first, so each pattern anchors at ``^`` or ``$``
to have at most one match in either engine; literal dots appear as
``[.]`` so the same pattern string needs no escaping in SQL.

Canonicalization rules (one place, both engines):

1. scheme    := lower(scheme) if present, else ``http`` (scheme-less
   and ``//``-relative forms both default to http — the C4 choice);
2. authority := strip userinfo (``user:pw@``), then split port;
3. host      := lower, strip ONE trailing dot, strip ONE leading
   ``www.``;
4. port      := dropped when default for the scheme (http:80,
   https:443) or absent, else kept;
5. path      := strip trailing slashes (``/a/`` == ``/a``); empty
   path becomes ``/``;
6. query     := tracking parameters stripped (the documented
   ``TRACKING_PARAMS`` list: ``utm_*`` and the click-id family —
   round 15, VERDICT r14 ask #6; two URLs differing only in trackers
   are one resource, and C4-style URL dedup strips them for exactly
   that reason), remaining params kept verbatim in original order
   (no reordering — documented choice, matching C4);
7. fragment  := dropped.

The tracker strip is two global replaces sharing one alternation: a
non-anchored pass removes every NON-LEADING ``&tracker=value`` (Spark
replaces all matches natively; the SQL mirror passes the ``'g'``
flag), then an anchored pass removes the at-most-one LEADING
``tracker=value&?`` — so any run of trackers at any position
collapses in exactly two passes.  Scope: a bare ``tracker`` with no
``=`` is not stripped (real trackers are always assigned).  Matching
is CASE-INSENSITIVE (``(?i)`` — supported identically by Java regex
and RE2): ``UTM_SOURCE=x`` is the same tracker as ``utm_source=x``
in the wild, while param names are otherwise case-sensitive per the
URL spec, so only the tracker alternation carries the flag (round-15
advice item).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# anchored, backslash-free patterns shared verbatim by both engines
_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_SCHEME_STRIP_RE = "^[A-Za-z][A-Za-z0-9+.-]*://"
_REL_STRIP_RE = "^//"
_AUTH_RE = "^([^/?#]+)"
_AUTH_STRIP_RE = "^[^/?#]+"
_USERINFO_RE = "^[^@]*@"
_PORT_RE = ":([0-9]+)$"
_PORT_STRIP_RE = ":[0-9]+$"
_HOST_DOT_RE = "[.]$"
_WWW_RE = "^www[.]"
_FRAG_RE = "#.*$"
_QUERY_RE = "[?](.*)$"
_PATH_RE = "^([^?]*)"
_SLASH_RE = "/+$"

# tracking parameters stripped from query strings (rule 6) — the
# documented list; extending it is a data change, not a plan change
TRACKING_PARAMS = "utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid"
# (?i): tracker names match case-insensitively (UTM_SOURCE == utm_source;
# Java regex and RE2 agree on the inline flag) — values stay untouched
_TRACK_MID_RE = f"(?i)&({TRACKING_PARAMS})=[^&]*"  # every non-leading tracker
_TRACK_LEAD_RE = f"(?i)^({TRACKING_PARAMS})=[^&]*&?"  # the at-most-one leading

TOPK_DOMAINS = 10


def url_parts(url: Column) -> dict[str, Column]:
    """The shared decomposition: scheme/host/port/path/query columns
    from a raw URL column, canonicalized per the module rules.  All
    expressions are backslash-free anchored regexes — whole chain
    stays in the scan's codegen'd projection."""
    scheme_raw = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    rest = F.regexp_replace(
        F.regexp_replace(url, _SCHEME_STRIP_RE, ""), _REL_STRIP_RE, ""
    )
    auth = F.regexp_replace(
        F.regexp_extract(rest, _AUTH_RE, 1), _USERINFO_RE, ""
    )
    pathq = F.regexp_replace(
        F.regexp_replace(rest, _AUTH_STRIP_RE, ""), _FRAG_RE, ""
    )
    scheme = F.when(scheme_raw == "", F.lit("http")).otherwise(scheme_raw)
    port_raw = F.regexp_extract(auth, _PORT_RE, 1)
    host = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.regexp_replace(auth, _PORT_STRIP_RE, "")),
            _HOST_DOT_RE,
            "",
        ),
        _WWW_RE,
        "",
    )
    port = F.when(
        (port_raw == "")
        | ((scheme == "http") & (port_raw == "80"))
        | ((scheme == "https") & (port_raw == "443")),
        F.lit(""),
    ).otherwise(port_raw)
    path_norm = F.regexp_replace(
        F.regexp_extract(pathq, _PATH_RE, 1), _SLASH_RE, ""
    )
    path = F.when(path_norm == "", F.lit("/")).otherwise(path_norm)
    query = F.regexp_replace(
        F.regexp_replace(
            F.regexp_extract(pathq, _QUERY_RE, 1), _TRACK_MID_RE, ""
        ),
        _TRACK_LEAD_RE,
        "",
    )
    return {
        "scheme": scheme,
        "host": host,
        "port": port,
        "path": path,
        "query": query,
    }


def canonical_host(url: Column) -> Column:
    """Column: the canonicalized registrable host of a URL — the key
    every per-domain curation rule should group on."""
    return url_parts(url)["host"]


def canonical_url(url: Column) -> Column:
    """Column: the full canonical URL (rules in the module
    docstring)."""
    p = url_parts(url)
    return F.concat(
        p["scheme"],
        F.lit("://"),
        p["host"],
        F.when(p["port"] == "", F.lit("")).otherwise(
            F.concat(F.lit(":"), p["port"])
        ),
        p["path"],
        F.when(p["query"] == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), p["query"])
        ),
    )


def with_fixture_urls(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach the deterministic fixture URL law: six hostile URL
    shapes cycling by ``id_col % 6`` over ``(id_col, source)``.
    Variants 0 and 1 are DISTINCT raw strings that canonicalize to the
    same canonical URL (www+https vs uppercase-scheme+explicit :443 +
    trailing slash) — the collapse the canonicalizer exists to
    produce.  ``id_col`` defaults to ``doc_id``; the round-16 capstone
    keys it on the duplicate-pair id ``doc_id - doc_id % 2`` so two
    documents share one URL (the crawl-revisit law)."""
    d = F.col(id_col).cast("string")
    s = F.col("source")
    v = F.col(id_col) % 6
    url = (
        F.when(v == 0, F.concat(F.lit("https://www."), s, F.lit(".example.org/docs/"), d))
        .when(v == 1, F.concat(F.lit("HTTPS://"), F.upper(s), F.lit(".EXAMPLE.org:443/docs/"), d, F.lit("/")))
        .when(v == 2, F.concat(F.lit("http://"), s, F.lit(".example.org:8080/docs/"), d, F.lit("?q=1&utm_source=feed")))
        .when(v == 3, F.concat(F.lit("http://user:pw@www."), s, F.lit(".example.org:80/docs/"), d, F.lit("#top")))
        .when(v == 4, F.concat(F.lit("//cdn."), s, F.lit(".example.org./assets/"), d))
        .otherwise(F.concat(s, F.lit(".example.org/docs/"), d, F.lit("/")))
    )
    return docs.withColumn("url", url)


def url_canonicalize(docs: DataFrame) -> DataFrame:
    """Row-level canonicalization report: (doc_id, url, canonical_url,
    host, port, path) over the fixture URL law — the operator's value
    surface, one output row per document.  Entirely scan-projection
    work: no shuffle, no UDF (the plan is Project over the parquet
    scan)."""
    with_url = with_fixture_urls(docs.select("doc_id", "source"))
    p = url_parts(F.col("url"))
    # port surfaces as BIGINT with 0 = "no port" — NOT an empty
    # string: the driver's value-hash norm coerces numeric-looking
    # object columns with pd.to_numeric, turning '' into NaN, and
    # NaN != NaN fails the compare on BOTH engines' identical output
    return with_url.select(
        "doc_id",
        "url",
        canonical_url(F.col("url")).alias("curl"),
        p["host"].alias("host"),
        F.when(p["port"] == "", F.lit(0))
        .otherwise(p["port"].cast("long"))
        .cast("long")
        .alias("port"),
        p["path"].alias("path"),
    )


def url_domain_topk(docs: DataFrame, k: int = TOPK_DOMAINS) -> DataFrame:
    """Per-domain doc counts over canonical hosts, top-``k`` by count
    (ties to the lexically smaller host) — the publisher-concentration
    report that feeds ``sample_domain_quota``'s cap decisions.

    Scale shape: canonicalization happens in the scan projection, the
    aggregate map-side combines on the (bounded-cardinality) host key,
    and the top-k is a rank over the AGGREGATED per-host frame — rows
    = distinct hosts, never documents; no corpus-sized window."""
    from pyspark.sql import Window

    per_host = (
        with_fixture_urls(docs.select("doc_id", "source", "lang", "n_chars"))
        .select(
            canonical_host(F.col("url")).alias("host"),
            "lang",
            "n_chars",
        )
        .groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )
    w = Window.orderBy(F.col("n_docs").desc(), F.col("host").asc())
    return (
        per_host.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("host", "n_docs", "n_langs", "total_chars", "rk")
    )


def _fixture_url_sql(table: str = "documents") -> str:
    """The URL law as a SQL expression over ``{table}`` — one CTE
    ``u(doc_id, lang, n_chars, url)`` mirroring
    :func:`with_fixture_urls` exactly."""
    return f"""u AS (
      SELECT doc_id, lang, n_chars,
             CASE doc_id % 6
               WHEN 0 THEN 'https://www.' || source || '.example.org/docs/' || doc_id
               WHEN 1 THEN 'HTTPS://' || upper(source) || '.EXAMPLE.org:443/docs/' || doc_id || '/'
               WHEN 2 THEN 'http://' || source || '.example.org:8080/docs/' || doc_id || '?q=1&utm_source=feed'
               WHEN 3 THEN 'http://user:pw@www.' || source || '.example.org:80/docs/' || doc_id || '#top'
               WHEN 4 THEN '//cdn.' || source || '.example.org./assets/' || doc_id
               ELSE source || '.example.org/docs/' || doc_id || '/'
             END AS url
      FROM {table}
    )"""


def _parts_sql() -> str:
    """The canonical decomposition as a SQL CTE chain over ``u`` —
    ``parts(doc_id, lang, n_chars, url, scheme, host, port, path,
    query)`` using the SAME anchored backslash-free patterns as the
    Spark side (DuckDB regexp_replace replaces first match; every
    pattern matches at most once by anchoring, so engines agree)."""
    return f"""p0 AS (
      SELECT *,
             lower(regexp_extract(url, '{_SCHEME_RE}', 1)) AS scheme_raw,
             regexp_replace(regexp_replace(url, '{_SCHEME_STRIP_RE}', ''),
                            '{_REL_STRIP_RE}', '') AS rest
      FROM u
    ),
    p1 AS (
      SELECT *,
             regexp_replace(regexp_extract(rest, '{_AUTH_RE}', 1),
                            '{_USERINFO_RE}', '') AS auth,
             regexp_replace(regexp_replace(rest, '{_AUTH_STRIP_RE}', ''),
                            '{_FRAG_RE}', '') AS pathq
      FROM p0
    ),
    parts AS (
      SELECT doc_id, lang, n_chars, url,
             CASE WHEN scheme_raw = '' THEN 'http' ELSE scheme_raw END AS scheme,
             regexp_replace(regexp_replace(
                 lower(regexp_replace(auth, '{_PORT_STRIP_RE}', '')),
                 '{_HOST_DOT_RE}', ''), '{_WWW_RE}', '') AS host,
             CASE WHEN regexp_extract(auth, '{_PORT_RE}', 1) = '' THEN ''
                  WHEN (CASE WHEN scheme_raw = '' THEN 'http' ELSE scheme_raw END) = 'http'
                       AND regexp_extract(auth, '{_PORT_RE}', 1) = '80' THEN ''
                  WHEN (CASE WHEN scheme_raw = '' THEN 'http' ELSE scheme_raw END) = 'https'
                       AND regexp_extract(auth, '{_PORT_RE}', 1) = '443' THEN ''
                  ELSE regexp_extract(auth, '{_PORT_RE}', 1)
             END AS port,
             CASE WHEN regexp_replace(regexp_extract(pathq, '{_PATH_RE}', 1),
                                      '{_SLASH_RE}', '') = '' THEN '/'
                  ELSE regexp_replace(regexp_extract(pathq, '{_PATH_RE}', 1),
                                      '{_SLASH_RE}', '')
             END AS path,
             regexp_replace(
               regexp_replace(regexp_extract(pathq, '{_QUERY_RE}', 1),
                              '{_TRACK_MID_RE}', '', 'g'),
               '{_TRACK_LEAD_RE}', '') AS qstr
      FROM p1
    )"""


def url_canonicalize_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`url_canonicalize`."""
    return f"""
    WITH {_fixture_url_sql(table)},
    {_parts_sql()}
    SELECT doc_id, url,
           scheme || '://' || host ||
           CASE WHEN port = '' THEN '' ELSE ':' || port END ||
           path ||
           CASE WHEN qstr = '' THEN '' ELSE '?' || qstr END AS curl,
           host,
           CASE WHEN port = '' THEN 0 ELSE port::BIGINT END AS port,
           path
    FROM parts
    """


def url_domain_topk_sql(table: str = "documents", k: int = TOPK_DOMAINS) -> str:
    """DuckDB mirror of :func:`url_domain_topk`."""
    return f"""
    WITH {_fixture_url_sql(table)},
    {_parts_sql()},
    per_host AS (
      SELECT host, count(*)::BIGINT AS n_docs,
             count(DISTINCT lang)::BIGINT AS n_langs,
             sum(n_chars)::BIGINT AS total_chars
      FROM parts
      GROUP BY host
    )
    SELECT host, n_docs, n_langs, total_chars, rk
    FROM (SELECT *, row_number() OVER (ORDER BY n_docs DESC, host ASC) AS rk
          FROM per_host)
    WHERE rk <= {k}
    """


N_DEDUP_HOSTS = 25  # bounded host pool for the dedup URL law


def with_dedup_fixture_urls(docs: DataFrame) -> DataFrame:
    """The URL law for CROSS-document collapse: unlike
    :func:`with_fixture_urls` (whose path embeds the doc id, so every
    canonical URL is unique — right for the row-level report, useless
    for dedup), this law keys the PAGE on ``doc_id div 6`` and the
    shape on ``doc_id % 6``, so each 6-document block references one
    page through six raw shapes and the canonicalizer must merge
    exactly the shapes that ARE the same resource:

    - shapes 0 (https+www) and 1 (uppercase scheme/host + :443 +
      trailing slash) collapse to one https URL;
    - shapes 3 (userinfo + www + :80 + fragment) and 5 (scheme-less +
      trailing slash) collapse to one http URL;
    - shapes 2 and 4 (round 15) collapse to one :8080 URL that
      survives ONLY through tracker stripping: they differ by a
      middle ``utm_source``, a leading ``gclid``, a trailing
      ``utm_campaign`` (all three strip positions), plus shape 4's
      scheme-less + trailing-dot forms — and the three groups
      ({0,1} https, {2,4} :8080, {3,5} http) stay mutually distinct,
      so the law still proves non-merging across groups."""
    page = (F.col("doc_id") - F.col("doc_id") % 6) / 6
    pg = page.cast("long").cast("string")
    host_k = (page.cast("long") % N_DEDUP_HOSTS).cast("string")
    s = F.concat(F.lit("site"), host_k)
    v = F.col("doc_id") % 6
    url = (
        F.when(v == 0, F.concat(F.lit("https://www."), s, F.lit(".example.org/page/"), pg))
        .when(v == 1, F.concat(F.lit("HTTPS://"), F.upper(s), F.lit(".EXAMPLE.org:443/page/"), pg, F.lit("/")))
        .when(v == 2, F.concat(F.lit("http://"), s, F.lit(".example.org:8080/page/"), pg, F.lit("?q=1&utm_source=feed")))
        .when(v == 3, F.concat(F.lit("http://user:pw@www."), s, F.lit(".example.org:80/page/"), pg, F.lit("#top")))
        .when(v == 4, F.concat(F.lit("//"), s, F.lit(".example.org.:8080/page/"), pg, F.lit("?gclid=abc&q=1&utm_campaign=x")))
        .otherwise(F.concat(s, F.lit(".example.org/page/"), pg, F.lit("/")))
    )
    return docs.withColumn("url", url)


def dedup_url_exact(docs: DataFrame) -> DataFrame:
    """Exact dedup by CANONICAL URL — the standard web-corpus first
    pass (C4 removes exact-URL duplicates before any content dedup):
    group documents on their canonicalized URL and report every
    multi-document group, which here exists precisely because distinct
    raw URL shapes collapse (a raw-string dedup finds ZERO of these
    groups — every raw URL in the law is unique).  Since round 15 the
    law's third group ({2,4}) merges ONLY if tracking parameters strip
    (leading gclid, middle utm_source, trailing utm_campaign), so this
    query is also the tracker-normalization witness.  Output: (curl,
    n_docs, keep_id) with keep_id the group-minimum doc id — the
    keep-first convention of ``dedup_exact``.

    Scale shape: identical to ``dedup_exact`` — canonicalization rides
    the scan projection, then ONE map-side-combined hash aggregate on
    the canonical-URL key; shuffle carries (curl, partial count,
    partial min) per distinct URL per task.  Group sizes are bounded
    by the law (pairs), and real corpora's per-URL multiplicity is
    crawl-frequency-bounded — no hot keys."""
    with_url = with_dedup_fixture_urls(docs.select("doc_id"))
    return (
        with_url.select(
            "doc_id", canonical_url(F.col("url")).alias("curl")
        )
        .groupBy("curl")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _dedup_fixture_url_sql(table: str = "documents") -> str:
    """SQL mirror of :func:`with_dedup_fixture_urls` as a ``u`` CTE."""
    return f"""u AS (
      SELECT doc_id,
             CASE doc_id % 6
               WHEN 0 THEN 'https://www.site' || ((doc_id // 6) % {N_DEDUP_HOSTS})
                        || '.example.org/page/' || (doc_id // 6)
               WHEN 1 THEN 'HTTPS://' || upper('site' || ((doc_id // 6) % {N_DEDUP_HOSTS}))
                        || '.EXAMPLE.org:443/page/' || (doc_id // 6) || '/'
               WHEN 2 THEN 'http://site' || ((doc_id // 6) % {N_DEDUP_HOSTS})
                        || '.example.org:8080/page/' || (doc_id // 6)
                        || '?q=1&utm_source=feed'
               WHEN 3 THEN 'http://user:pw@www.site' || ((doc_id // 6) % {N_DEDUP_HOSTS})
                        || '.example.org:80/page/' || (doc_id // 6) || '#top'
               WHEN 4 THEN '//site' || ((doc_id // 6) % {N_DEDUP_HOSTS})
                        || '.example.org.:8080/page/' || (doc_id // 6)
                        || '?gclid=abc&q=1&utm_campaign=x'
               ELSE 'site' || ((doc_id // 6) % {N_DEDUP_HOSTS})
                        || '.example.org/page/' || (doc_id // 6) || '/'
             END AS url
      FROM {table}
    )"""


def dedup_url_exact_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`dedup_url_exact`.  The parts chain
    needs (doc_id, url) only, so this re-states the ``u`` CTE with
    dummy lang/n_chars columns to reuse :func:`_parts_sql`."""
    return f"""
    WITH {_dedup_fixture_url_sql(table)},
    {_parts_sql().replace("doc_id, lang, n_chars, url", "doc_id, url")},
    canon AS (
      SELECT doc_id,
             scheme || '://' || host ||
             CASE WHEN port = '' THEN '' ELSE ':' || port END ||
             path ||
             CASE WHEN qstr = '' THEN '' ELSE '?' || qstr END AS curl
      FROM parts
    )
    SELECT curl, count(*)::BIGINT AS n_docs, min(doc_id) AS keep_id
    FROM canon
    GROUP BY curl
    HAVING count(*) > 1
    """


# ---------------------------------------------------------------------------
# robots-style disallow audit — the respect-robots / blocklist filter
# ---------------------------------------------------------------------------


def fixture_robots_rules(spark) -> DataFrame:
    """The fixture rule law: a small (host, path_prefix) disallow
    table over the round-14 URL law's hosts — every cdn host disallows
    ``/assets`` (crawlers shouldn't index asset mirrors), and every
    5th source disallows ``/docs`` outright.  Real pipelines load this
    frame from parsed robots.txt / a curated blocklist; it is
    publisher-cardinality-sized and broadcasts."""
    from pyspark.sql import functions as F

    src = spark.range(20).select(
        F.concat(F.lit("src"), F.col("id").cast("string")).alias("s"),
        F.col("id"),
    )
    cdn = src.select(
        F.concat(F.lit("cdn."), F.col("s"), F.lit(".example.org")).alias("host"),
        F.lit("/assets").alias("path_prefix"),
    )
    docs_block = src.filter(F.col("id") % 5 == 0).select(
        F.concat(F.col("s"), F.lit(".example.org")).alias("host"),
        F.lit("/docs").alias("path_prefix"),
    )
    return cdn.unionByName(docs_block)


def robots_disallow_audit(docs: DataFrame, rules: DataFrame) -> DataFrame:
    """Per-document robots/blocklist audit: (doc_id, host, path,
    blocked) where ``blocked`` means some disallow rule's host matches
    the document's CANONICAL host and its path_prefix prefixes the
    canonical path — the respect-robots filter every compliant web
    corpus runs (C4 and RefinedWeb both honor robots at crawl or
    curation time).

    Plan shape: canonicalization rides the scan projection; the rule
    probe is a broadcast SEMI/ANTI pair on host (equi) with the prefix
    test as an extra join predicate — the two joins PARTITION the
    corpus exactly (blocked / not blocked), so the whole audit is two
    corpus scans against a publisher-cardinality broadcast with ZERO
    shuffles and no UDF (startswith is codegen); a doc matching many
    rules still appears once (semi join semantics).  Emitting the flag
    rather than filtering keeps the audit a report (corpus cards want
    block rates per host); ``.filter(NOT blocked)`` — or just the anti
    leg — is the enforcement form."""
    with_url = with_fixture_urls(docs.select("doc_id", "source"))
    p = url_parts(F.col("url"))
    c = with_url.select(
        "doc_id", p["host"].alias("host"), p["path"].alias("path")
    )
    r = rules.select(
        F.col("host").alias("r_host"), F.col("path_prefix").alias("r_prefix")
    )
    cond = (F.col("host") == F.col("r_host")) & F.col("path").startswith(
        F.col("r_prefix")
    )
    blocked = c.join(F.broadcast(r), cond, "left_semi").withColumn(
        "blocked", F.lit(True)
    )
    kept = c.join(F.broadcast(r), cond, "left_anti").withColumn(
        "blocked", F.lit(False)
    )
    return blocked.unionByName(kept)


def robots_disallow_audit_sql(table: str = "documents") -> str:
    """DuckDB mirror: the same rule law inline (20 sources, cdn hosts
    disallow /assets, every 5th source disallows /docs) and an EXISTS
    prefix probe over the canonical parts."""
    return f"""
    WITH {_fixture_url_sql(table)},
    {_parts_sql()},
    rules AS (
      SELECT 'cdn.src' || i || '.example.org' AS r_host,
             '/assets' AS r_prefix
      FROM (SELECT unnest(generate_series(0, 19)) AS i)
      UNION ALL
      SELECT 'src' || i || '.example.org' AS r_host, '/docs' AS r_prefix
      FROM (SELECT unnest(generate_series(0, 19)) AS i) WHERE i % 5 = 0
    )
    SELECT doc_id, host, path,
           EXISTS (SELECT 1 FROM rules r
                   WHERE r.r_host = parts.host
                     AND starts_with(parts.path, r.r_prefix)) AS blocked
    FROM parts
    """


# ---------------------------------------------------------------------------
# registrable-domain (public-suffix) extraction — VERDICT r14 ask #4
# ---------------------------------------------------------------------------

# Bounded public-suffix table: a committed, VERSIONED subset of the
# Mozilla Public Suffix List (publicsuffix.org — public data).  The real
# list is ~9k ICANN rules; it is publisher-cardinality-bounded, so at any
# corpus size it broadcasts — and because it is known at PLAN time it can
# go one step further and fold into the scan projection as a literal
# array, which is what the operator below does: the table's MAX SUFFIX
# DEPTH is also plan-time known, so the longest-match unrolls into a
# codegen'd CASE chain over the last-k-label joins (k = depth..1) —
# ZERO shuffle, no join, no UDF, and no interpreted higher-order
# functions (the transform/filter candidate-array form measured ~0.4s
# slower per query at sf0.1 purely from interpreted HOF evaluation).
# Scope: ICANN-style exact rules + the PSL default rule ("unlisted TLD
# => the TLD itself is the suffix") + — since round 15, closing the
# round-15a scope note — WILDCARD rules (`*.ck`: any single label under
# the base is itself a public suffix) and EXCEPTION rules (`!city.ck`:
# despite the wildcard, city.ck is NOT a suffix — it is a registrable
# domain whose public suffix is the rule minus its leftmost label).
# Exactly as predicted, each is one more literal table and one more
# CASE-arm family, not a new plan shape.
PSL_VERSION = "psl-subset-2025q3"
PUBLIC_SUFFIXES: tuple[str, ...] = (
    # gTLDs
    "com", "org", "net", "edu", "gov", "mil", "int",
    "io", "dev", "app", "info", "biz", "xyz",
    # ccTLDs with registrations at the second level
    "fr", "de", "it", "nl", "se", "ca", "ch", "es", "us",
    # multi-label ccTLD trees (the reason host-grouping fragments)
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk",
    "jp", "co.jp", "ne.jp", "or.jp", "ac.jp",
    "au", "com.au", "org.au", "net.au", "edu.au",
    "br", "com.br", "org.br",
    "in", "co.in", "org.in",
    "nz", "co.nz", "org.nz",
    "za", "co.za", "org.za",
)


# wildcard rule BASES (rule `*.<base>`): any one label under the base
# is a public suffix — the Cook Islands / Myanmar pattern
PSL_WILDCARDS: tuple[str, ...] = ("ck",)
# exception rules (`!<domain>`): carved OUT of a wildcard — the listed
# name is registrable and its public suffix is the name minus its
# leftmost label (publicsuffix.org's !www.ck family; 'city' here so the
# canonicalizer's www-stripping cannot erase the witness)
PSL_EXCEPTIONS: tuple[str, ...] = ("city.ck",)

# deepest rule in the committed tables — the unroll depth of the CASE
# chain below (the real PSL's deepest ICANN rule is 4 labels; swapping
# the tables in changes this constant and nothing else).  A wildcard
# base of B labels matches suffixes of B+1 labels.
MAX_SUFFIX_LABELS = max(
    max(s.count(".") + 1 for s in PUBLIC_SUFFIXES),
    max((w.count(".") + 2 for w in PSL_WILDCARDS), default=1),
)


def registrable_domain_cols(host: Column) -> tuple[Column, Column]:
    """(public_suffix, registrable_domain) columns for a canonical host.

    PSL longest-match, in-plan and HOF-free: the match needs only the
    last ``MAX_SUFFIX_LABELS`` label-suffixes of the host (longer
    candidates can never be in the tables), so it unrolls at PLAN time
    into a CASE chain — EXCEPTION arms first (PSL rule precedence: a
    host matching ``!city.ck`` gets suffix = the rule minus its
    leftmost label, and the generic suffix+one-label arithmetic then
    yields city.ck itself as the registrable domain); then for
    k = depth..2, "if the last k labels are an exact rule OR the last
    k-1 labels are a wildcard base, the suffix is the last k labels";
    the PSL default rule (last label) is the fallback for unlisted
    TLDs (and coincides with 1-label exact rules).  The registrable
    domain is suffix + one label; a host that IS a public suffix has
    no registrable domain (empty string — a typed sentinel, never
    NULL, so group keys stay total).  Every expression is codegen'd
    (split / slice / array_join / array_contains on foldable
    literals): no shuffle, no join, no Python, no interpreted
    higher-order functions."""
    labels = F.split(host, "[.]")
    n = F.size(labels)
    psl = F.array(*[F.lit(s) for s in PUBLIC_SUFFIXES])

    def last_k(k: int) -> Column:
        # greatest(...) keeps the start index legal when n < k; the
        # (n >= k) guard on the CASE arm makes the value irrelevant then
        return F.array_join(F.slice(labels, F.greatest(n - k + 1, F.lit(1)), k), ".")

    chain = None

    def arm(cond: Column, val: Column):
        nonlocal chain
        chain = chain.when(cond, val) if chain is not None else F.when(cond, val)

    for exc in PSL_EXCEPTIONS:
        b = exc.count(".") + 1
        arm(
            (n >= b) & (last_k(b) == exc),
            F.lit(exc.split(".", 1)[1]),
        )
    for k in range(MAX_SUFFIX_LABELS, 1, -1):
        wild_bases = [w for w in PSL_WILDCARDS if w.count(".") + 1 == k - 1]
        cond = (n >= k) & F.array_contains(psl, last_k(k))
        if wild_bases:
            wild = F.array(*[F.lit(w) for w in wild_bases])
            cond = cond | ((n >= k) & F.array_contains(wild, last_k(k - 1)))
        arm(cond, last_k(k))
    last = F.element_at(labels, -1)
    suffix = chain.otherwise(last) if chain is not None else last
    n_sfx = F.length(suffix) - F.length(F.replace(suffix, F.lit("."), F.lit(""))) + 1
    registrable = F.when(n <= n_sfx, F.lit("")).otherwise(
        F.concat(F.element_at(labels, (n - n_sfx).cast("int")), F.lit("."), suffix)
    )
    return suffix, registrable


def with_psl_fixture_urls(docs: DataFrame) -> DataFrame:
    """The PSL fixture URL law: ten host shapes cycling by
    ``doc_id % 10``, chosen so the registrable-domain key provably
    differs from the canonical-host key:

    - shapes 0 (``www.<s>pages.co.uk``) and 1 (``news.<s>pages.co.uk``)
      are DIFFERENT canonical hosts with the SAME registrable domain
      (``<s>pages.co.uk``) — host-level grouping fragments exactly here;
    - shape 3 nests two extra labels under ``ac.uk`` (deep multi-label);
    - shape 5 is an UNLISTED TLD (``.example``) — the PSL default rule;
    - shape 6's host IS a public suffix (``co.uk``) — no registrable
      domain (empty-string sentinel);
    - shapes 2/4/7 cover com, com.au, org.uk single-site hosts;
    - shape 8 (round 15b) sits under the WILDCARD rule ``*.ck``: the
      suffix is the wildcard-matched label pair (``<s>pages.ck``) and
      the registrable domain one label above it;
    - shape 9 (round 15b) is the EXCEPTION ``!city.ck``: city.ck is
      registrable despite the wildcard (suffix = ``ck``).

    The site key is ``(doc_id div 10) % 20`` — deliberately NOT the
    ``source`` label: a shape-aligned source key could never produce
    the cross-shape registrable collision the operator exists to merge
    (the round-15a law hit exactly this with mod-8 shapes vs mod-20
    sources, both fixed mod 4).  Keying on the 10-block gives every
    block one site, and shapes 0/1 of the SAME block share a
    registrable domain under different canonical hosts."""
    d = F.col("doc_id").cast("string")
    s = F.concat(
        F.lit("site"),
        (F.expr("doc_id div 10").cast("long") % 20).cast("string"),
    )
    v = F.col("doc_id") % 10
    url = (
        F.when(v == 0, F.concat(F.lit("https://www."), s, F.lit("pages.co.uk/a/"), d))
        .when(v == 1, F.concat(F.lit("http://news."), s, F.lit("pages.co.uk/b/"), d))
        .when(v == 2, F.concat(F.lit("http://blog."), s, F.lit("pages.com/c/"), d))
        .when(v == 3, F.concat(F.lit("https://a.b."), s, F.lit("pages.ac.uk/d/"), d))
        .when(v == 4, F.concat(F.lit("http://"), s, F.lit("pages.com.au/e/"), d))
        .when(v == 5, F.concat(F.lit("http://"), s, F.lit("pages.example/f/"), d))
        .when(v == 6, F.concat(F.lit("http://co.uk/g/"), d))
        .when(v == 7, F.concat(F.lit("http://x.y."), s, F.lit("pages.org.uk/h/"), d))
        .when(v == 8, F.concat(F.lit("http://w."), s, F.lit("pages.ck/i/"), d))
        .otherwise(F.concat(F.lit("http://city.ck/j/"), d))
    )
    return docs.withColumn("url", url)


def url_registrable_domain(docs: DataFrame) -> DataFrame:
    """Row-level registrable-domain report: (doc_id, host,
    public_suffix, registrable_domain) over the PSL fixture URL law.
    RefinedWeb/C4 key their per-publisher caps on the REGISTRABLE
    domain, not the host — ``www.x.co.uk`` and ``news.x.co.uk`` are one
    publisher — and this operator is that key.  Plan: the whole chain
    (canonicalization + candidate generation + literal-PSL longest
    match) folds into the scan projection — zero shuffle, no join, no
    Python."""
    with_url = with_psl_fixture_urls(docs.select("doc_id"))
    host = canonical_host(F.col("url"))
    suffix, registrable = registrable_domain_cols(host)
    return with_url.select(
        "doc_id",
        host.alias("host"),
        suffix.alias("public_suffix"),
        registrable.alias("registrable_domain"),
    )


def _psl_fixture_url_sql(table: str = "documents") -> str:
    """SQL mirror of :func:`with_psl_fixture_urls` as a ``u`` CTE
    (site key = ``'site' || ((doc_id // 10) % 20)``)."""
    s = "'site' || ((doc_id // 10) % 20)"
    return f"""u AS (
      SELECT doc_id,
             CASE doc_id % 10
               WHEN 0 THEN 'https://www.' || {s} || 'pages.co.uk/a/' || doc_id
               WHEN 1 THEN 'http://news.' || {s} || 'pages.co.uk/b/' || doc_id
               WHEN 2 THEN 'http://blog.' || {s} || 'pages.com/c/' || doc_id
               WHEN 3 THEN 'https://a.b.' || {s} || 'pages.ac.uk/d/' || doc_id
               WHEN 4 THEN 'http://' || {s} || 'pages.com.au/e/' || doc_id
               WHEN 5 THEN 'http://' || {s} || 'pages.example/f/' || doc_id
               WHEN 6 THEN 'http://co.uk/g/' || doc_id
               WHEN 7 THEN 'http://x.y.' || {s} || 'pages.org.uk/h/' || doc_id
               WHEN 8 THEN 'http://w.' || {s} || 'pages.ck/i/' || doc_id
               ELSE 'http://city.ck/j/' || doc_id
             END AS url
      FROM {table}
    )"""


def _psl_literal_sql() -> str:
    """The committed suffix subset as a SQL list literal."""
    return "[" + ", ".join(f"'{s}'" for s in PUBLIC_SUFFIXES) + "]"


def _registrable_sql(
    host_expr: str = "host", id_col: str = "doc_id", parts: str = "parts"
) -> str:
    """SQL CTE chain computing (public_suffix, registrable_domain) over
    a ``{parts}`` relation's host column — the SAME unrolled CASE chain
    as :func:`registrable_domain_cols` (built from the shared
    MAX_SUFFIX_LABELS/PUBLIC_SUFFIXES constants), ending in a CTE
    ``reg({id_col}, host, public_suffix, registrable_domain)``.
    ``id_col``/``parts`` parameterize the key and source relation (the
    frontier-politeness oracle keys on ``curl``)."""
    psl = _psl_literal_sql()
    arms = []
    for exc in PSL_EXCEPTIONS:
        b = exc.count(".") + 1
        cand = f"array_to_string(labels[-{b}:], '.')"
        arms.append(
            f"WHEN len(labels) >= {b} AND {cand} = '{exc}'"
            f" THEN '{exc.split('.', 1)[1]}'"
        )
    for k in range(MAX_SUFFIX_LABELS, 1, -1):
        cand = f"array_to_string(labels[-{k}:], '.')"
        wild_bases = [w for w in PSL_WILDCARDS if w.count(".") + 1 == k - 1]
        cond = f"list_contains({psl}, {cand})"
        if wild_bases:
            wl = "[" + ", ".join(f"'{w}'" for w in wild_bases) + "]"
            wcand = f"array_to_string(labels[-{k - 1}:], '.')"
            cond = f"({cond} OR list_contains({wl}, {wcand}))"
        arms.append(f"WHEN len(labels) >= {k} AND {cond} THEN {cand}")
    case = "CASE " + " ".join(arms) + " ELSE labels[-1] END"
    return f"""lab AS (
      SELECT {id_col}, host, string_split({host_expr}, '.') AS labels
      FROM {parts}
    ),
    sfx AS (
      SELECT {id_col}, host, labels, {case} AS public_suffix
      FROM lab
    ),
    reg AS (
      SELECT {id_col}, host, public_suffix,
             CASE WHEN len(labels) <=
                    length(public_suffix)
                    - length(replace(public_suffix, '.', '')) + 1
                  THEN ''
                  ELSE labels[len(labels)
                              - (length(public_suffix)
                                 - length(replace(public_suffix, '.', '')) + 1)]
                       || '.' || public_suffix
             END AS registrable_domain
      FROM sfx
    )"""


def url_registrable_domain_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`url_registrable_domain`."""
    return f"""
    WITH {_psl_fixture_url_sql(table)},
    {_parts_sql().replace("doc_id, lang, n_chars, url", "doc_id, url")},
    {_registrable_sql("host")}
    SELECT doc_id, host, public_suffix, registrable_domain
    FROM reg
    """


def registrable_table_sql(table: str = "documents") -> str:
    """A ``(doc_id, registrable_domain)`` derived-table SQL string over
    the PSL fixture law — the rekey feed for quota-style oracles."""
    return f"""(WITH {_psl_fixture_url_sql(table)},
    {_parts_sql().replace("doc_id, lang, n_chars, url", "doc_id, url")},
    {_registrable_sql("host")}
    SELECT doc_id, registrable_domain FROM reg)"""


# ---------------------------------------------------------------------------
# robots.txt parsing — the stage BEFORE the disallow audit (round 15):
# real pipelines fetch robots.txt per host and parse it into the
# (host, path_prefix) rule table the audit consumes; the round-14 audit
# took that table as a given.
# ---------------------------------------------------------------------------

_DIRECTIVE_RE = "^([A-Za-z-]+): "
_DIRECTIVE_VAL_RE = "^[A-Za-z-]+: (.*)$"  # lines are already newline-free


def with_robots_txt(docs: DataFrame) -> DataFrame:
    """The robots.txt fixture law: one (host, robots) row per DISTINCT
    document source.  Every file carries the parser's witnesses: a
    comment line and a blank line (skipped), a ``User-agent: *`` group
    with ``Disallow: /assets`` (+ ``Disallow: /docs`` for every 5th
    source) and an ``Allow`` line (parsed, not a disallow rule), a
    ``User-agent: badbot`` group whose ``Disallow: /`` must NOT leak
    into the ``*`` rules (the group-tracking witness), and a global
    ``Sitemap`` line whose value itself contains ``://``."""
    s = F.col("source")
    host = F.concat(s, F.lit(".example.org"))
    # try_cast, and nullif in the SQL mirror: a source WITHOUT trailing
    # digits must mean "no /docs rule" in BOTH engines — a plain cast
    # would error under Spark ANSI and raise a DuckDB Conversion Error,
    # making the two laws diverge outside the srcN fixture domain
    src_id = F.regexp_extract(s, "([0-9]+)$", 1).try_cast("long")
    extra = F.when(src_id % 5 == 0, F.lit("Disallow: /docs\n")).otherwise(
        F.lit("")
    )
    # Crawl-delay (round 16, the politeness witness): 1/3/5 s cycling
    # by source id in the '*' group; the badbot group's 10 s must NOT
    # leak into '*' (the same group-tracking law the Disallow witness
    # pins)
    delay = (F.coalesce(src_id, F.lit(0)) % 3) * 2 + 1
    robots = F.concat(
        F.lit("# robots for "), s, F.lit("\n"),
        F.lit("\n"),
        F.lit("User-agent: *\n"),
        F.lit("Disallow: /assets\n"),
        extra,
        F.lit("Allow: /assets/public\n"),
        F.lit("Crawl-delay: "), delay.cast("string"), F.lit("\n"),
        F.lit("\n"),
        F.lit("User-agent: badbot\n"),
        F.lit("Disallow: /\n"),
        F.lit("Crawl-delay: 10\n"),
        F.lit("\n"),
        F.lit("Sitemap: https://"), host, F.lit("/sitemap.xml\n"),
    )
    return docs.select("source").distinct().select(
        host.alias("host"), robots.alias("robots")
    )


def robots_txt_parse(robots: DataFrame) -> DataFrame:
    """The parser: (host, line_no, group_id, agent, directive, value)
    — one row per directive line, with the STATEFUL part of robots.txt
    semantics made relational: ``group_id`` is the running count of
    ``User-agent`` lines (an inclusive prefix sum over line order) and
    ``agent`` is the group's User-agent value (a per-(host, group)
    window max — groups are a handful of lines, the good case for
    PARTITION BY).  Comments and blank lines drop; ``Sitemap`` lines
    keep whatever group they lexically follow (per spec they are
    global — consumers filter on directive, not group).

    Plan shape: the line split + posexplode + directive regexes are
    scan-side; ONE shuffle on host keys both windows (same partition
    key, one exchange).  Rule extraction for the audit is then a
    filter: directive = 'Disallow' AND agent = '*'."""
    lines = robots.select(
        "host",
        F.posexplode(F.split(F.col("robots"), "\n", -1)).alias("line_no", "line"),
    ).filter((F.col("line") != "") & (~F.col("line").startswith("#")))
    d = F.regexp_extract(F.col("line"), _DIRECTIVE_RE, 1)
    v = F.regexp_extract(F.col("line"), _DIRECTIVE_VAL_RE, 1)
    parsed = lines.select(
        "host",
        F.col("line_no").cast("long").alias("line_no"),
        d.alias("directive"),
        v.alias("value"),
    ).filter(F.col("directive") != "")
    w_grp = (
        Window.partitionBy("host")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grouped = parsed.withColumn(
        "group_id",
        F.sum(
            F.when(F.col("directive") == "User-agent", 1).otherwise(0)
        ).over(w_grp).cast("long"),
    )
    w_agent = Window.partitionBy("host", "group_id")
    return grouped.withColumn(
        "agent",
        F.coalesce(
            F.max(
                F.when(F.col("directive") == "User-agent", F.col("value"))
            ).over(w_agent),
            F.lit(""),
        ),
    ).select("host", "line_no", "group_id", "agent", "directive", "value")


def parsed_disallow_rules(parsed: DataFrame) -> DataFrame:
    """(host, path_prefix): the audit-shaped rule table — the ``*``
    group's Disallow directives only (Allow/Sitemap and named-agent
    groups excluded by construction of the filter, which is exactly
    what the badbot witness tests)."""
    return parsed.filter(
        (F.col("directive") == "Disallow") & (F.col("agent") == "*")
    ).select("host", F.col("value").alias("path_prefix"))


def _robots_txt_law_sql(table: str = "documents") -> str:
    return f"""r AS (
      SELECT source || '.example.org' AS host,
             '# robots for ' || source || chr(10)
             || chr(10)
             || 'User-agent: *' || chr(10)
             || 'Disallow: /assets' || chr(10)
             || (CASE WHEN nullif(regexp_extract(source, '([0-9]+)$', 1), '')::BIGINT % 5 = 0
                      THEN 'Disallow: /docs' || chr(10) ELSE '' END)
             || 'Allow: /assets/public' || chr(10)
             || 'Crawl-delay: '
               || ((coalesce(nullif(regexp_extract(source, '([0-9]+)$', 1), '')::BIGINT, 0) % 3) * 2 + 1)
               || chr(10)
             || chr(10)
             || 'User-agent: badbot' || chr(10)
             || 'Disallow: /' || chr(10)
             || 'Crawl-delay: 10' || chr(10)
             || chr(10)
             || 'Sitemap: https://' || source || '.example.org/sitemap.xml'
             || chr(10) AS robots
      FROM (SELECT DISTINCT source FROM {table})
    )"""


def robots_txt_parse_sql(table: str = "documents") -> str:
    """DuckDB mirror of law + parser: same split, directive regexes,
    running-count group window, and per-group agent max."""
    return f"""
    WITH {_robots_txt_law_sql(table)},
    lines AS (
      SELECT host,
             generate_subscripts(string_split(robots, chr(10)), 1) - 1
               AS line_no,
             unnest(string_split(robots, chr(10))) AS line
      FROM r
    ),
    parsed AS (
      SELECT host, line_no::BIGINT AS line_no,
             regexp_extract(line, '{_DIRECTIVE_RE}', 1) AS directive,
             regexp_extract(line, '{_DIRECTIVE_VAL_RE}', 1) AS value
      FROM lines
      WHERE line <> '' AND line NOT LIKE '#%'
        AND regexp_extract(line, '{_DIRECTIVE_RE}', 1) <> ''
    ),
    grouped AS (
      SELECT *,
             sum(CASE WHEN directive = 'User-agent' THEN 1 ELSE 0 END)
               OVER (PARTITION BY host ORDER BY line_no
                     ROWS UNBOUNDED PRECEDING)::BIGINT AS group_id
      FROM parsed
    )
    SELECT host, line_no, group_id,
           coalesce(max(CASE WHEN directive = 'User-agent' THEN value END)
                    OVER (PARTITION BY host, group_id), '') AS agent,
           directive, value
    FROM grouped
    """


# ---------------------------------------------------------------------------
# sitemap.xml parsing — the crawl-frontier complement to robots.txt
# (round 15): robots' Sitemap directive points at these files; parsing
# them yields the publisher-declared URL set that seeds the frontier.
# ---------------------------------------------------------------------------

_USET = "\x01"  # sentinel appended after every </url> (the html pattern)
_LOC_RE = "<loc>([^<]*)</loc>"
_LASTMOD_RE = "<lastmod>([^<]*)</lastmod>"
_PRIORITY_RE = "<priority>0[.]([0-9]+)</priority>"


def with_sitemap_xml(docs: DataFrame) -> DataFrame:
    """The sitemap fixture law: one (host, xml) row per distinct
    source — a single-line urlset whose <url> entries are the host's
    own documents in doc_id order: loc (the clean canonical page URL),
    lastmod (a zero-padded date derived from doc_id % 28), priority
    (0.5 / 0.8 alternating — parsed to exact MILLI integers, never a
    float).  The per-host pack is one aggregate — fixture-build cost,
    like the WARC blob pack."""
    host = F.concat(F.col("source"), F.lit(".example.org"))
    day = F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0")
    pr = F.when(F.col("doc_id") % 2 == 0, F.lit("0.5")).otherwise(F.lit("0.8"))
    entry = F.concat(
        F.lit("<url><loc>https://"), host, F.lit("/docs/"),
        F.col("doc_id").cast("string"), F.lit("</loc>"),
        F.lit("<lastmod>2031-01-"), day, F.lit("</lastmod>"),
        F.lit("<priority>"), pr, F.lit("</priority></url>"),
    )
    packed = (
        docs.select("doc_id", "source", host.alias("host"), entry.alias("e"))
        .groupBy("host")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("doc_id", "e"))),
                    lambda s: s.e,
                ),
            ).alias("body")
        )
    )
    return packed.select(
        "host",
        F.concat(
            F.lit('<?xml version="1.0"?><urlset>'), F.col("body"), F.lit("</urlset>")
        ).alias("xml"),
    )


def sitemap_parse(sitemaps: DataFrame) -> DataFrame:
    """(host, uidx, curl, lastmod, priority_milli): the parsed,
    CANONICALIZED publisher-declared URL set.  Same in-plan shape as
    the WARC/html splits: a literal ``</url>`` sentinel + split +
    posexplode, anchored regex extraction per entry, the shared
    canonicalizer on loc, and priority as an exact milli integer (a
    DOUBLE 0.8 is not bit-stable across engines; '0.' || digits is).
    After the fixture pack's aggregate the parse is scan-side — no
    further shuffle, no Python."""
    marked = F.replace(F.col("xml"), F.lit("</url>"), F.lit("</url>" + _USET))
    entries = sitemaps.select(
        "host",
        F.posexplode(F.split(marked, _USET, -1)).alias("uidx", "entry"),
    ).filter(F.col("entry").contains("<loc>"))
    loc = F.regexp_extract(F.col("entry"), _LOC_RE, 1)
    return entries.select(
        "host",
        F.col("uidx").cast("long").alias("uidx"),
        canonical_url(loc).alias("curl"),
        F.regexp_extract(F.col("entry"), _LASTMOD_RE, 1).alias("lastmod"),
        F.rpad(F.regexp_extract(F.col("entry"), _PRIORITY_RE, 1), 3, "0")
        .cast("long")
        .alias("priority_milli"),
    )


def _sitemap_law_sql(table: str = "documents") -> str:
    return f"""sm AS (
      SELECT source || '.example.org' AS host,
             '<?xml version="1.0"?><urlset>' || string_agg(
               '<url><loc>https://' || source || '.example.org/docs/' || doc_id
               || '</loc><lastmod>2031-01-'
               || lpad(((doc_id % 28) + 1)::VARCHAR, 2, '0')
               || '</lastmod><priority>'
               || (CASE WHEN doc_id % 2 = 0 THEN '0.5' ELSE '0.8' END)
               || '</priority></url>', '' ORDER BY doc_id)
             || '</urlset>' AS xml
      FROM {table}
      GROUP BY source
    )"""


def sitemap_parse_sql(table: str = "documents") -> str:
    """DuckDB mirror of law + :func:`sitemap_parse` — same sentinel
    split, regexes, and the shared canonicalization chain over loc."""
    marked = "replace(xml, '</url>', '</url>' || chr(1))"
    dchain = (
        _parts_sql()
        .replace("p0 AS (", "sp0 AS (")
        .replace("p1 AS (", "sp1 AS (")
        .replace("parts AS (", "sparts AS (")
        .replace("FROM u\n", "FROM su\n")
        .replace("FROM p0\n", "FROM sp0\n")
        .replace("FROM p1\n", "FROM sp1\n")
        # smhost, not host: the chain computes its own canonical `host`
        # column from loc, and a duplicate name would be ambiguous
        .replace(
            "doc_id, lang, n_chars, url",
            "smhost, uidx, lastmod, priority_milli, url",
        )
    )
    return f"""
    WITH {_sitemap_law_sql(table)},
    ent AS (
      SELECT host,
             generate_subscripts(string_split({marked}, chr(1)), 1) - 1 AS uidx,
             unnest(string_split({marked}, chr(1))) AS entry
      FROM sm
    ),
    su AS MATERIALIZED (
      -- MATERIALIZED for the same DuckDB CTE-inlining binder error the
      -- link-graph oracle hit (see html.py)
      SELECT host AS smhost, uidx::BIGINT AS uidx,
             regexp_extract(entry, '{_LASTMOD_RE}', 1) AS lastmod,
             rpad(regexp_extract(entry, '{_PRIORITY_RE}', 1), 3, '0')::BIGINT
               AS priority_milli,
             regexp_extract(entry, '{_LOC_RE}', 1) AS url
      FROM ent
      WHERE contains(entry, '<loc>')
    ),
    {dchain}
    SELECT smhost AS host, uidx,
           scheme || '://' || host ||
           CASE WHEN port = '' THEN '' ELSE ':' || port END ||
           path ||
           CASE WHEN qstr = '' THEN '' ELSE '?' || qstr END AS curl,
           lastmod, priority_milli
    FROM sparts
    """


def crawl_delays(parsed: DataFrame) -> DataFrame:
    """(host, crawl_delay): the ``*`` group's Crawl-delay per host —
    the politeness feed (round 16).  The badbot group's delay is
    excluded by the same agent filter the Disallow witness pins."""
    return parsed.filter(
        (F.col("directive") == "Crawl-delay") & (F.col("agent") == "*")
    ).select("host", F.col("value").cast("long").alias("crawl_delay"))


def crawl_delays_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`crawl_delays` as a derived table."""
    from .urls import robots_txt_parse_sql  # self-import safe at call time

    return f"""(
      SELECT host, value::BIGINT AS crawl_delay
      FROM ({robots_txt_parse_sql(table)}) pr
      WHERE directive = 'Crawl-delay' AND agent = '*'
    )"""
