"""HTML-to-text main-content extraction — the missing stage of the
real web-corpus chain (VERDICT r14 ask #2): WARC -> **HTML -> text** ->
quality gates.

A jusText/trafilatura-class extractor, Spark-first: real pipelines
segment a page into BLOCKS at block-level tag boundaries, score each
block (words, link density, semantic tag), promote short blocks that
sit next to good content, and reassemble the good blocks as the
document text.  Everything here is codegen'd string expressions —
global regex/literal replaces, one split + posexplode, one
lag/lead window for the neighbor rule — no UDF, no Python stage; the
only shuffle is the per-document window, whose hash partitioning the
reassembly aggregate reuses (plan-gated: ONE exchange total).

Pipeline (one place, both engines — the DuckDB oracle mirrors every
step on the same pattern strings):

1. body      := regexp_extract '<body>(.*)</body>' (head — title,
   style, script — never reaches the extractor);
2. descript  := global non-greedy removal of '<script[^>]*>.*?</script>'
   and '<style[^>]*>.*?</style>' INSIDE the body — scripts may contain
   literal closing tags ('</div>' in a JS string — the fixture plants
   one) that would corrupt block segmentation if stripped later;
3. segment   := append a chr(1) sentinel after every BLOCK-closing tag
   (</p> </h1> </nav> </footer> </div> </aside> — literal global
   replaces, no regex), then split on the sentinel; each piece is one
   block, tagged by its FIRST opening tag;
4. text      := strip '<[^>]*>' -> ' ' (global), decode the HTML
   entities (&lt; &gt; &quot; &#39; &nbsp; first, &amp; LAST — the
   double-decode trap: '&amp;lt;' must yield literal '&lt;', never
   '<'), collapse whitespace, trim;
5. classify  := bad if the block tag is semantic boilerplate
   (nav/footer/aside) or the text is empty or 3*n_links > n_words
   (link density > 1/3); good if n_words >= MIN_GOOD_WORDS; else
   SHORT — promoted to good iff an immediate neighbor block is
   base-good (the jusText context rule; headings next to content
   survive, 'Back to top' between boilerplate dies);
6. reassemble := concat kept texts in block order per document.

The fixture LAW (:func:`with_html_pages`) synthesizes a single-line
page around ``documents.text``: nav with links, an in-body script
holding a literal '</p></div>' trap, a main div whose h1 is a SHORT
block adjacent to content (must be promoted), the text as 12-word
<p> chunks with inline <b> markup on the first, a constant short
block between content ('Read on now' — promoted), an entity block
(every entity + the double-decode trap), a link-farm share div
(density 1.0 — dropped), 'Back to top' between two bad blocks
(dropped), and a footer (dropped by tag).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textclean import _chunk_re

CHUNK_WORDS = 12  # words per synthesized <p> block in the fixture law
MAX_CHUNKS = 6  # fixture cap: at most 6 content chunks per page
MIN_GOOD_WORDS = 5  # blocks with >= this many words are content
# link-density rule: bad when n_links / n_words > 1/3, in exact
# integer form (3 * n_links > n_words)
LINK_DENSITY_NUM = 3

BLOCK_CLOSE_TAGS = ("p", "h1", "nav", "footer", "div", "aside")
BOILERPLATE_TAGS = ("nav", "footer", "aside")

_SENT = "\x01"
_BODY_RE = "<body>(.*)</body>"
_SCRIPT_RE = "<script[^>]*>.*?</script>"
_STYLE_RE = "<style[^>]*>.*?</style>"
_TAG_RE = "<[^>]*>"
_FIRST_TAG_RE = "<([a-z0-9]+)[^>]*>"
_WS_RE = "  *"  # backslash-free 'one or more spaces'

# (entity, replacement) — &amp; LAST so '&amp;lt;' single-decodes to
# literal '&lt;' (the standard double-decode bug this order prevents)
ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def with_html_pages(docs: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """The fixture law: (doc_id, html) — a deterministic single-line
    page wrapping ``documents.text`` (columns doc_id, text required).
    Every extractor rule has a planted witness; see the module
    docstring for the block inventory.  ``carry`` threads extra input
    columns through (the link graph carries the page url — a re-join
    would put a shuffle into an otherwise scan-side plan)."""
    d = F.col("doc_id").cast("string")
    chunks = F.slice(
        F.regexp_extract_all(F.col("text"), F.lit(_chunk_re(CHUNK_WORDS)), 0),
        1,
        MAX_CHUNKS,
    )
    first_p = F.concat_ws(
        "",
        F.transform(
            F.slice(chunks, 1, 1),
            lambda c: F.concat(F.lit("<p><b>"), c, F.lit("</b> opens</p>")),
        ),
    )
    rest_p = F.concat_ws(
        "",
        F.transform(
            F.slice(chunks, 2, MAX_CHUNKS - 1),
            lambda c: F.concat(F.lit("<p>"), c, F.lit("</p>")),
        ),
    )
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        d,
        F.lit('</title><style>p{margin:0}</style></head><body>'),
        F.lit('<nav><a href="/">Home</a> <a href="/s'),
        (F.col("doc_id") % 5).cast("string"),
        F.lit('">Section</a> <a href="/t">Tags</a></nav>'),
        F.lit('<script>var trap="</p> not a block </div>";</script>'),
        F.lit('<div id="main"><h1>Doc '),
        d,
        F.lit("</h1>"),
        first_p,
        F.lit("<p>Read on now</p>"),
        rest_p,
        F.lit(
            "<p>Q&amp;A on &lt;p&gt; tags &quot;quoted&quot; "
            "&amp;lt;escaped&amp;gt; today</p>"
        ),
        F.lit("</div>"),
        # the share div's three links keep density 1.0 (dropped by the
        # extractor) while giving the LINK GRAPH its external shapes:
        # an absolute https URL with case + a tracker (must
        # canonicalize + strip), a scheme-relative URL with trailing
        # host dot + trailing slash, and a fragment-only href (dropped)
        F.lit(
            '<div class="share">'
            '<a href="https://Share.Example.COM/ref?utm_source=share&q=1">Share</a> '
            '<a href="//cdn.example.net./img/">Tweet</a> '
            '<a href="#">Pin</a></div>'
        ),
        F.lit("<p>Back to top</p>"),
        F.lit("<footer>Copyright 2031 example site All rights reserved</footer>"),
        F.lit("</body></html>"),
    )
    return docs.select("doc_id", *carry, html.alias("html"))


def _decode_entities(txt: Column) -> Column:
    for ent, rep in ENTITIES:
        txt = F.replace(txt, F.lit(ent), F.lit(rep))
    return txt


def _block_frame(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(doc_id, bidx, tag, n_links, txt, n_words): the segmented,
    stripped, decoded block rows — all scan-side projection plus one
    posexplode; no shuffle yet."""
    body = F.regexp_extract(F.col(html_col), _BODY_RE, 1)
    descript = F.regexp_replace(
        F.regexp_replace(body, _SCRIPT_RE, ""), _STYLE_RE, ""
    )
    marked = descript
    for t in BLOCK_CLOSE_TAGS:
        close = f"</{t}>"
        marked = F.replace(marked, F.lit(close), F.lit(close + _SENT))
    blocks = pages.select(
        "doc_id",
        F.posexplode(F.split(marked, _SENT, -1)).alias("bidx", "raw"),
    ).filter(F.col("raw") != "")
    raw = F.col("raw")
    txt = F.trim(
        F.regexp_replace(
            _decode_entities(F.regexp_replace(raw, _TAG_RE, " ")), _WS_RE, " "
        )
    )
    n_links = ((F.length(raw) - F.length(F.replace(raw, F.lit("<a ")))) / 3).cast(
        "long"
    )
    # txt lands in its OWN projection: it feeds two output columns, and
    # CollapseProject would otherwise inline the whole strip/decode
    # chain into each use (non-cheap, multi-use aliases stay staged)
    staged = blocks.select(
        "doc_id",
        F.col("bidx").cast("long").alias("bidx"),
        F.regexp_extract(raw, _FIRST_TAG_RE, 1).alias("tag"),
        n_links.alias("n_links"),
        txt.alias("txt"),
    )
    return staged.select(
        "doc_id",
        "bidx",
        "tag",
        "n_links",
        "txt",
        F.when(F.col("txt") == "", F.lit(0))
        .otherwise(F.size(F.split(F.col("txt"), " ")))
        .cast("long")
        .alias("n_words"),
    )


def _base_class() -> Column:
    return (
        F.when(F.col("tag").isin(*BOILERPLATE_TAGS), F.lit("bad"))
        .when(F.col("n_words") == 0, F.lit("bad"))
        .when(
            F.lit(LINK_DENSITY_NUM) * F.col("n_links") > F.col("n_words"),
            F.lit("bad"),
        )
        .when(F.col("n_words") >= MIN_GOOD_WORDS, F.lit("good"))
        .otherwise(F.lit("short"))
    )


def html_extract_text(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """The operator: (doc_id, extracted_text, n_blocks, n_kept,
    n_words_kept) — main-content text per page.

    Plan shape: segmentation/stripping/decoding/classification are all
    scan-side codegen; the neighbor-promotion lag/lead window shuffles
    ONCE on doc_id and the reassembly groupBy reuses that exact hash
    partitioning (no second exchange; plan-gated).  Per-document block
    counts are page-structure-bounded (tens), so window groups are
    many-and-small — the good case for PARTITION BY.  At 100 TB this
    is one full-corpus shuffle keyed by document; the alternative
    zero-shuffle form (array higher-order functions per page) was
    rejected on the measured interpreted-HOF penalty (see
    ext/urls.py::registrable_domain_cols, same trade, ~1.5x).

    The one exchange is placed BEFORE the block pipeline, not at the
    window: repartitioning pages by doc_id satisfies the window's
    required distribution (no second exchange appears) while moving
    the regex-heavy block projection BEHIND the shuffle — on a
    few-split input (one parquet file) the scan-side placement ran the
    whole strip/decode chain in a single task (measured 2.7s -> 1.4s
    in-suite at sf0.1); the shuffle carries page html either way."""
    base = (
        _block_frame(pages.repartition(F.col("doc_id")), html_col)
        .withColumn("base", _base_class())
    )
    w = Window.partitionBy("doc_id").orderBy("bidx")
    promoted = base.withColumn(
        "kept",
        (F.col("base") == "good")
        | (
            (F.col("base") == "short")
            & (
                (F.coalesce(F.lag("base").over(w), F.lit("bad")) == "good")
                | (F.coalesce(F.lead("base").over(w), F.lit("bad")) == "good")
            )
        ),
    )
    return promoted.groupBy("doc_id").agg(
        F.coalesce(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("kept"), F.struct("bidx", "txt")
                            )
                        )
                    ),
                    lambda s: s.txt,
                ),
            ),
            F.lit(""),
        ).alias("extracted_text"),
        F.count("*").cast("long").alias("n_blocks"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(F.col("kept"), F.col("n_words")).otherwise(0))
        .cast("long")
        .alias("n_words_kept"),
    )


# ---------------------------------------------------------------------------
# DuckDB mirrors
# ---------------------------------------------------------------------------


def page_sql_expr() -> str:
    """The fixture-law page as a bare SQL EXPRESSION over ``doc_id`` /
    ``text`` columns — factored out (round 16) so the HTTP-envelope
    law can embed the page as a response body."""
    chunks = f"regexp_extract_all(text, '{_chunk_re(CHUNK_WORDS)}', 0)[1:{MAX_CHUNKS}]"
    return f"""'<html><head><title>Doc ' || doc_id
        || '</title><style>p{{margin:0}}</style></head><body>'
        || '<nav><a href="/">Home</a> <a href="/s' || (doc_id % 5)
        || '">Section</a> <a href="/t">Tags</a></nav>'
        || '<script>var trap="</p> not a block </div>";</script>'
        || '<div id="main"><h1>Doc ' || doc_id || '</h1>'
        || coalesce(array_to_string(
             [('<p><b>' || c || '</b> opens</p>') FOR c IN {chunks}[1:1]], ''),
             '')
        || '<p>Read on now</p>'
        || coalesce(array_to_string(
             [('<p>' || c || '</p>') FOR c IN {chunks}[2:{MAX_CHUNKS}]], ''),
             '')
        || '<p>Q&amp;A on &lt;p&gt; tags &quot;quoted&quot; '
        || '&amp;lt;escaped&amp;gt; today</p>'
        || '</div>'
        || '<div class="share">'
        || '<a href="https://Share.Example.COM/ref?utm_source=share&q=1">Share</a> '
        || '<a href="//cdn.example.net./img/">Tweet</a> '
        || '<a href="#">Pin</a></div>'
        || '<p>Back to top</p>'
        || '<footer>Copyright 2031 example site All rights reserved</footer>'
        || '</body></html>'"""


def _html_law_sql(table: str = "documents") -> str:
    """The fixture law as a ``pages(doc_id, html)`` CTE."""
    return f"""pages AS (
      SELECT doc_id, {page_sql_expr()} AS html
      FROM {table}
    )"""


def _entity_decode_sql(expr: str) -> str:
    for ent, rep in ENTITIES:
        r = rep.replace("'", "''")
        expr = f"replace({expr}, '{ent}', '{r}')"
    return expr


def extract_chain_sql(
    pages: str = "pages", out: str = "extracted", prefix: str = ""
) -> str:
    """The extraction pipeline as CTEs ``split``/``blocks``/``scored``/
    ``classed``/``kept``/``{out}`` over ANY ``(doc_id, html)`` source
    CTE — factored out (round 16) so the WARC->shards capstone can run
    the same chain over its post-HTTP-filter page set.  ``prefix``
    renames the internal CTEs (the capstone's WARC chain already owns
    the name ``split``)."""
    marked = "regexp_replace(regexp_replace(regexp_extract(html, '<body>(.*)</body>', 1), '<script[^>]*>.*?</script>', '', 'g'), '<style[^>]*>.*?</style>', '', 'g')"
    for t in BLOCK_CLOSE_TAGS:
        marked = f"replace({marked}, '</{t}>', '</{t}>' || chr(1))"
    strip = "regexp_replace(raw, '<[^>]*>', ' ', 'g')"
    txt = f"trim(regexp_replace({_entity_decode_sql(strip)}, '  *', ' ', 'g'))"
    boiler = ", ".join(f"'{t}'" for t in BOILERPLATE_TAGS)
    chain = f"""split AS (
      SELECT doc_id,
             generate_subscripts(string_split({marked}, chr(1)), 1) - 1 AS bidx,
             unnest(string_split({marked}, chr(1))) AS raw
      FROM {pages}
    ),
    blocks AS (
      SELECT doc_id, bidx::BIGINT AS bidx,
             regexp_extract(raw, '<([a-z0-9]+)[^>]*>', 1) AS tag,
             ((length(raw) - length(replace(raw, '<a ', ''))) / 3)::BIGINT
               AS n_links,
             {txt} AS txt
      FROM split
      WHERE raw <> ''
    ),
    scored AS (
      SELECT *,
             CASE WHEN txt = '' THEN 0
                  ELSE len(string_split(txt, ' ')) END::BIGINT AS n_words
      FROM blocks
    ),
    classed AS (
      SELECT *,
             CASE WHEN tag IN ({boiler}) THEN 'bad'
                  WHEN n_words = 0 THEN 'bad'
                  WHEN {LINK_DENSITY_NUM} * n_links > n_words THEN 'bad'
                  WHEN n_words >= {MIN_GOOD_WORDS} THEN 'good'
                  ELSE 'short' END AS base
      FROM scored
    ),
    kept AS (
      SELECT *,
             (base = 'good' OR (base = 'short' AND (
               coalesce(lag(base) OVER w, 'bad') = 'good'
               OR coalesce(lead(base) OVER w, 'bad') = 'good'))) AS keep
      FROM classed
      WINDOW w AS (PARTITION BY doc_id ORDER BY bidx)
    ),
    {out} AS (
      SELECT doc_id,
           coalesce(string_agg(CASE WHEN keep THEN txt END, ' '
                               ORDER BY bidx), '') AS extracted_text,
           count(*)::BIGINT AS n_blocks,
           sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           sum(CASE WHEN keep THEN n_words ELSE 0 END)::BIGINT AS n_words_kept
      FROM kept
      GROUP BY doc_id
    )"""
    if prefix:
        for n in ("split", "blocks", "scored", "classed", "kept"):
            chain = chain.replace(f"{n} AS (", f"{prefix}{n} AS (").replace(
                f"FROM {n}", f"FROM {prefix}{n}"
            )
    return chain


def html_extract_text_sql(table: str = "documents") -> str:
    """DuckDB mirror of fixture law + :func:`html_extract_text` — the
    same pattern strings, global ('g') replaces, sentinel split,
    lag/lead promotion, and ordered reassembly."""
    return f"""
    WITH {_html_law_sql(table)},
    {extract_chain_sql()}
    SELECT * FROM extracted
    """


# ---------------------------------------------------------------------------
# link-graph extraction — the hyperlink stage of the web front door
# ---------------------------------------------------------------------------

_HREF_RE = '<a href="([^"]*)"'
_ABS_SCHEME_RE = "^[A-Za-z][A-Za-z0-9+.-]*://"


def html_link_graph(pages: DataFrame, src_host: bool = False) -> DataFrame:
    """(doc_id, href, dst_curl, internal[, src_host]): the outlink
    edge list of
    every page — the stage that feeds link-graph quality signals
    (PageRank-style authority, spam neighborhoods) in a real web
    pipeline.  Requires columns (doc_id, html, url) — the page's own
    raw URL supplies the base for relative resolution.

    Resolution (RFC 3986 subset, documented): absolute URLs pass
    through; ``//host/...`` takes the base scheme; ``/path`` joins the
    base authority (canonical scheme/host/port); fragment-only and
    empty hrefs are dropped (same-page); bare-relative paths
    (``a/b``, needing dot-segment merging) are OUT of this subset and
    drop — the fixture law plants none.  Every resolved URL goes
    through the full canonicalizer (case, www, ports, trailing
    slashes, TRACKER STRIPPING — the share link's utm_source must not
    survive into the graph), and ``internal`` marks edges whose
    canonical destination host equals the page's own.

    Plan shape: hrefs are extracted from the script/style-stripped
    page in the scan projection, one posexplode expands edges, and
    resolution + canonicalization are further projection work — ZERO
    shuffle, no join, no Python (plan-gated)."""
    from .urls import canonical_url, url_parts

    from .urls import canonical_host as _chost

    p = url_parts(F.col("url"))
    stripped = F.regexp_replace(
        F.regexp_replace(F.col("html"), _SCRIPT_RE, ""), _STYLE_RE, ""
    )
    base_cols = [
        F.col("doc_id"),
        p["scheme"].alias("b_scheme"),
        p["host"].alias("b_host"),
        p["port"].alias("b_port"),
    ]
    if src_host:
        # evaluated below the explode: once per PAGE, not per link row
        # — the same canonical_host expression the host-graph
        # consumers' page_hosts side used to compute behind a doc_id
        # join (guide §1.2)
        base_cols.append(_chost(F.col("url")).alias("src_host"))
    edges = pages.select(
        *base_cols,
        F.posexplode(F.regexp_extract_all(stripped, F.lit(_HREF_RE), 1)).alias(
            "eidx", "href"
        ),
    )
    base_auth = F.concat(
        F.col("b_scheme"),
        F.lit("://"),
        F.col("b_host"),
        F.when(F.col("b_port") == "", F.lit("")).otherwise(
            F.concat(F.lit(":"), F.col("b_port"))
        ),
    )
    href = F.col("href")
    dst_abs = (
        F.when(href.startswith("#") | (href == ""), F.lit(None))
        .when(href.rlike(_ABS_SCHEME_RE), href)
        .when(href.startswith("//"), F.concat(F.col("b_scheme"), F.lit(":"), href))
        .when(href.startswith("/"), F.concat(base_auth, href))
        .otherwise(F.lit(None))
    )
    resolved = edges.withColumn("dst_abs", dst_abs).filter(
        F.col("dst_abs").isNotNull()
    )
    from .urls import canonical_host

    cols = [
        F.col("doc_id"),
        F.col("href"),
        canonical_url(F.col("dst_abs")).alias("dst_curl"),
        (canonical_host(F.col("dst_abs")) == F.col("b_host")).alias("internal"),
    ]
    if src_host:
        cols.append(F.col("src_host"))
    return resolved.select(*cols)


def html_link_graph_sql(table: str = "documents") -> str:
    """DuckDB mirror: base parts from the round-14 URL law, hrefs from
    the script-stripped page law, the same resolution CASE, then the
    shared canonicalization chain applied to the resolved URL (prefixed
    CTE copy)."""
    from .urls import _fixture_url_sql, _parts_sql

    strip = (
        "regexp_replace(regexp_replace(html, '<script[^>]*>.*?</script>', '', 'g'),"
        " '<style[^>]*>.*?</style>', '', 'g')"
    )
    # second canonicalization chain over the resolved edges: same text,
    # prefixed CTE names, carrying (doc_id, href, base_host)
    dchain = (
        _parts_sql()
        .replace("p0 AS (", "dp0 AS (")
        .replace("p1 AS (", "dp1 AS (")
        .replace("parts AS (", "dparts AS (")
        .replace("FROM u\n", "FROM u2\n")
        .replace("FROM p0\n", "FROM dp0\n")
        .replace("FROM p1\n", "FROM dp1\n")
        .replace("doc_id, lang, n_chars, url", "doc_id, href, base_host, url")
    )
    return f"""
    WITH {_fixture_url_sql(table)},
    {_parts_sql()},
    {_html_law_sql(table)},
    e0 AS (
      SELECT p.doc_id, p.scheme AS b_scheme, p.host AS b_host,
             p.port AS b_port,
             unnest(regexp_extract_all({strip}, '<a href="([^"]*)"', 1)) AS href
      FROM pages JOIN parts p USING (doc_id)
    ),
    e1 AS (
      SELECT doc_id, href, b_host,
             CASE
               WHEN href LIKE '#%' OR href = '' THEN NULL
               WHEN regexp_matches(href, '{_ABS_SCHEME_RE}') THEN href
               WHEN href LIKE '//%' THEN b_scheme || ':' || href
               WHEN href LIKE '/%' THEN b_scheme || '://' || b_host ||
                    (CASE WHEN b_port = '' THEN '' ELSE ':' || b_port END) || href
               ELSE NULL
             END AS dst_abs
      FROM e0
    ),
    u2 AS MATERIALIZED (
      -- MATERIALIZED: DuckDB inlines plain CTEs, and inlining this one
      -- into the d-chain's SELECT * trips an internal binder error
      -- ("Failed to bind column reference href"); materializing the
      -- 4-column edge frame sidesteps it (same convention as the
      -- unrolled iterative oracles — see the verify skill's gotchas)
      SELECT doc_id, href, b_host AS base_host, dst_abs AS url
      FROM e1 WHERE dst_abs IS NOT NULL
    ),
    {dchain}
    SELECT doc_id, href,
           scheme || '://' || host ||
           CASE WHEN port = '' THEN '' ELSE ':' || port END ||
           path ||
           CASE WHEN qstr = '' THEN '' ELSE '?' || qstr END AS dst_curl,
           (host = base_host) AS internal
    FROM dparts
    """


# ---------------------------------------------------------------------------
# anchor-text index — what the web calls each page (search/quality signal)
# ---------------------------------------------------------------------------

# Full anchor elements (href + inner text) — the fixture law's anchors
# are exactly this shape; elements whose inner text holds markup are
# out of the subset (the href-only link graph still sees them).
_ANCHOR_ELEM_RE = '<a href="[^"]*">[^<]*</a>'
_ANCHOR_TEXT_RE = ">([^<]*)</a>"


def html_anchor_graph(pages: DataFrame) -> DataFrame:
    """(doc_id, src_host, anchor, dst_curl, internal): the link graph
    WITH anchor text — what linking pages call the destination.  Real
    pipelines index anchor text per target (it is the strongest
    off-page relevance/spam signal; CommonCrawl ships it as a
    dedicated dataset).  Same RFC 3986 resolution subset +
    canonicalization as :func:`html_link_graph`; anchors are
    lowercased, whitespace-collapsed, trimmed.  Scan-side projection +
    one posexplode — ZERO shuffle, no Python."""
    from .urls import canonical_url, canonical_host, url_parts

    p = url_parts(F.col("url"))
    stripped = F.regexp_replace(
        F.regexp_replace(F.col("html"), _SCRIPT_RE, ""), _STYLE_RE, ""
    )
    edges = pages.select(
        "doc_id",
        p["scheme"].alias("b_scheme"),
        p["host"].alias("b_host"),
        p["port"].alias("b_port"),
        F.posexplode(
            F.regexp_extract_all(stripped, F.lit(_ANCHOR_ELEM_RE), 0)
        ).alias("eidx", "elem"),
    )
    base_auth = F.concat(
        F.col("b_scheme"),
        F.lit("://"),
        F.col("b_host"),
        F.when(F.col("b_port") == "", F.lit("")).otherwise(
            F.concat(F.lit(":"), F.col("b_port"))
        ),
    )
    href = F.regexp_extract(F.col("elem"), _HREF_RE, 1)
    anchor = F.trim(
        F.regexp_replace(
            F.lower(F.regexp_extract(F.col("elem"), _ANCHOR_TEXT_RE, 1)),
            _WS_RE,
            " ",
        )
    )
    dst_abs = (
        F.when(href.startswith("#") | (href == ""), F.lit(None))
        .when(href.rlike(_ABS_SCHEME_RE), href)
        .when(href.startswith("//"), F.concat(F.col("b_scheme"), F.lit(":"), href))
        .when(href.startswith("/"), F.concat(base_auth, href))
        .otherwise(F.lit(None))
    )
    resolved = (
        edges.withColumn("dst_abs", dst_abs)
        .withColumn("anchor", anchor)
        .filter(F.col("dst_abs").isNotNull())
    )
    return resolved.select(
        "doc_id",
        F.col("b_host").alias("src_host"),
        "anchor",
        canonical_url(F.col("dst_abs")).alias("dst_curl"),
        (canonical_host(F.col("dst_abs")) == F.col("b_host")).alias("internal"),
    )


def anchor_text_index(pages: DataFrame) -> DataFrame:
    """(dst_curl, n_links, n_hosts, n_anchors, anchors, top_anchor,
    top_anchor_cnt): the per-target anchor-text rollup.  Two
    aggregates, BOTH keyed on dst_curl (the per-anchor counts re-use
    the same hash partitioning — co-partitioned, one logical shuffle
    family): level 1 counts each (dst, anchor) pair, level 2 takes
    total links, distinct-anchor census, the '|'-joined sorted anchor
    vocabulary, and the modal anchor via the ``min(struct(-cnt,
    anchor))`` argmax (highest count, ties to the lexicographically
    smallest anchor — a total order, both engines).  n_hosts (distinct
    linking hosts — the signal that separates one spammy host shouting
    from many hosts agreeing) aggregates the raw edges on the same
    key.  At 100 TB this is exactly the production anchor-index shape:
    everything keyed by target URL, no all-pairs stage."""
    # lazy pin, projected narrow: the anchor graph is the WHOLE regex
    # extraction chain (strip + element explode + resolution +
    # canonicalization) and it has TWO consumers (the per-anchor
    # rollup and the distinct-host census) — unpinned, the extraction
    # ran twice per action (guide §1.2; the pinned frame is
    # edge-cardinality, a tiny fraction of the page bytes it derives
    # from).
    g = html_anchor_graph(pages).select(
        "dst_curl", "anchor", "src_host"
    ).localCheckpoint(eager=False)
    per_anchor = g.groupBy("dst_curl", "anchor").agg(
        F.count("*").cast("long").alias("cnt")
    )
    rolled = per_anchor.groupBy("dst_curl").agg(
        F.sum("cnt").cast("long").alias("n_links"),
        F.count("*").cast("long").alias("n_anchors"),
        F.array_join(F.sort_array(F.collect_list("anchor")), "|").alias("anchors"),
        F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("anchor"))).alias("top"),
    )
    hosts = g.groupBy("dst_curl").agg(
        F.countDistinct("src_host").cast("long").alias("n_hosts")
    )
    return rolled.join(hosts, "dst_curl").select(
        "dst_curl",
        "n_links",
        "n_hosts",
        "n_anchors",
        "anchors",
        F.col("top.anchor").alias("top_anchor"),
        (-F.col("top.neg")).cast("long").alias("top_anchor_cnt"),
    )


def anchor_text_index_sql(table: str = "documents") -> str:
    """DuckDB mirror of :func:`anchor_text_index` — element extraction,
    the shared resolution CASE, the prefixed canonicalization chain,
    then the two dst-keyed aggregates."""
    from .urls import _fixture_url_sql, _parts_sql

    strip = (
        "regexp_replace(regexp_replace(html, '<script[^>]*>.*?</script>', '', 'g'),"
        " '<style[^>]*>.*?</style>', '', 'g')"
    )
    dchain = (
        _parts_sql()
        .replace("p0 AS (", "dp0 AS (")
        .replace("p1 AS (", "dp1 AS (")
        .replace("parts AS (", "dparts AS (")
        .replace("FROM u\n", "FROM u2\n")
        .replace("FROM p0\n", "FROM dp0\n")
        .replace("FROM p1\n", "FROM dp1\n")
        .replace("doc_id, lang, n_chars, url", "doc_id, anchor, base_host, url")
    )
    return f"""
    WITH {_fixture_url_sql(table)},
    {_parts_sql()},
    {_html_law_sql(table)},
    e0 AS (
      SELECT p.doc_id, p.scheme AS b_scheme, p.host AS b_host,
             p.port AS b_port,
             unnest(regexp_extract_all({strip}, '{_ANCHOR_ELEM_RE}', 0)) AS elem
      FROM pages JOIN parts p USING (doc_id)
    ),
    e1 AS (
      SELECT doc_id, b_scheme, b_host, b_port,
             regexp_extract(elem, '{_HREF_RE}', 1) AS href,
             trim(regexp_replace(
               lower(regexp_extract(elem, '{_ANCHOR_TEXT_RE}', 1)),
               '{_WS_RE}', ' ', 'g')) AS anchor
      FROM e0
    ),
    e2 AS (
      SELECT doc_id, anchor, b_host,
             CASE
               WHEN href LIKE '#%' OR href = '' THEN NULL
               WHEN regexp_matches(href, '{_ABS_SCHEME_RE}') THEN href
               WHEN href LIKE '//%' THEN b_scheme || ':' || href
               WHEN href LIKE '/%' THEN b_scheme || '://' || b_host ||
                    (CASE WHEN b_port = '' THEN '' ELSE ':' || b_port END) || href
               ELSE NULL
             END AS dst_abs
      FROM e1
    ),
    u2 AS MATERIALIZED (
      -- MATERIALIZED for the same binder reason as html_link_graph_sql
      SELECT doc_id, anchor, b_host AS base_host, dst_abs AS url
      FROM e2 WHERE dst_abs IS NOT NULL
    ),
    {dchain},
    edges AS MATERIALIZED (
      SELECT base_host AS src_host, anchor,
             scheme || '://' || host ||
             CASE WHEN port = '' THEN '' ELSE ':' || port END ||
             path ||
             CASE WHEN qstr = '' THEN '' ELSE '?' || qstr END AS dst_curl
      FROM dparts
    ),
    pa AS (
      SELECT dst_curl, anchor, count(*)::BIGINT AS cnt
      FROM edges GROUP BY 1, 2
    ),
    rolled AS (
      SELECT dst_curl,
             sum(cnt)::BIGINT AS n_links,
             count(*)::BIGINT AS n_anchors,
             array_to_string(list_sort(list(anchor)), '|') AS anchors,
             min(struct_pack(neg := -cnt, anchor := anchor)) AS top
      FROM pa GROUP BY 1
    ),
    hosts AS (
      SELECT dst_curl, count(DISTINCT src_host)::BIGINT AS n_hosts
      FROM edges GROUP BY 1
    )
    SELECT r.dst_curl, r.n_links, h.n_hosts, r.n_anchors, r.anchors,
           struct_extract(r.top, 'anchor') AS top_anchor,
           (-struct_extract(r.top, 'neg'))::BIGINT AS top_anchor_cnt
    FROM rolled r JOIN hosts h USING (dst_curl)
    """
