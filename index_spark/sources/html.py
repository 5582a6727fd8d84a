"""HTML zone + link extraction — the reference engine's real ingest.

The reference indexes a parsed HTML page (``Index::addDocument``,
/root/reference/index.cpp:112-162): body words, head words ('<' marker),
title words ('@'), each link's anchor words ('$'), link URLs keyed
'#1' (same-host) / '#0' (cross-host), the page's own URL '##', and an
end-of-document marker '%' (markers at /root/reference/index.h:320-326).
The parser itself (``HtmlParser``) lives outside the reference snapshot,
so this module pins a deterministic grammar for the zones it feeds.

Spark-first: the whole parse is JVM-side regex (``regexp_extract`` /
``regexp_replace`` / ``regexp_extract_all`` + higher-order ``transform``)
inside whole-stage codegen — NO Python in the ingest path, filters and
column pruning push to the scan, and a 100 TB WARC-derived page table
parses at scan speed.  Zones come out as COLUMNS feeding
:func:`~index_spark.operators.build.build_zoned_index` (the engine's
first-class-zone analog of the reference's marker-prefix trick), and
links come out as an (src, dst, anchor_text, same_host) edge relation
feeding the graph operators (pagerank / HITS / label propagation).

Pinned grammar (a deterministic subset, NOT a browser parser —
synthesized and WARC-archived test pages obey it):

* ``title``  — first ``<title>...</title>`` content, tag-stripped.
* ``head``   — all ``<h1>``..``<h6>`` contents, space-joined (the
  reference's ``headWords`` stream).
* ``body``   — ``<body>...</body>`` content with every tag replaced by
  a space (anchor text INCLUDED — it is body text on the page).
* ``anchor`` — the page's OUTGOING link anchor texts, space-joined
  (the reference indexes them on the SOURCE page under '$').
* links      — every ``<a ... href="URL">text</a>``; no entity
  decoding, no relative-URL resolution.

Same-host rule ('#1' vs '#0') is byte-faithful to index.cpp:144-147::

    parser.pURL.Host ==
        link.substr(parser.pURL.Service.length() + 3, Host.length())

i.e. the first ``len(host)`` characters of the link after the PAGE's
``service://`` prefix must equal the page host.  Quirks preserved (and
pytest-pinned): a link host that merely EXTENDS the page host (e.g.
page ``http://a.com``, link ``http://a.comevil/x``) counts as
same-host, and a link whose scheme length differs from the page's
compares misaligned — the rule uses the page URL's service length,
not the link's.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TITLE_RE = r"(?s)<title[^>]*>(.*?)</title>"
HEADING_RE = r"(?s)<h[1-6][^>]*>(.*?)</h[1-6]>"
BODY_RE = r"(?s)<body[^>]*>(.*?)</body>"
ANCHOR_RE = r'(?s)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>'
TAG_RE = r"<[^>]*>"


def strip_tags(col: Column) -> Column:
    """Replace every tag with a space (token boundaries survive —
    ``a</p><p>b`` must not fuse into ``ab``) and trim."""
    return F.trim(F.regexp_replace(col, TAG_RE, " "))


def page_service(url: Column) -> Column:
    """Scheme of ``url`` (chars before ``://``), '' when schemeless."""
    return F.regexp_extract(url, r"^([a-z][a-z0-9+.-]*)://", 1)


def page_host(url: Column) -> Column:
    """Host of ``url`` (chars after ``://`` up to the first '/')."""
    return F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://([^/]*)", 1)


def same_host(src_url: Column, dst_url: Column) -> Column:
    """The reference's '#1'/'#0' rule (index.cpp:144-147), pinned:
    compare the page host against the link's characters at offset
    ``len(page service) + 3`` (0-based) for ``len(page host)`` chars.
    Spark ``substring`` is 1-based, hence the ``+ 4``."""
    svc, host = page_service(src_url), page_host(src_url)
    return (F.substring(dst_url, F.length(svc) + F.lit(4),
                        F.length(host)) == host) & (F.length(host) > 0)


def extract_zones(pages: DataFrame, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """One row per page with ``title / head / body / anchor`` zone text
    columns (pinned grammar above).  Pure codegen — each zone is a
    couple of JVM regex expressions over the html column; downstream
    ``build_zoned_index`` column-prunes to the zones it indexes."""
    html = F.col(html_col)
    return pages.select(
        F.col(url_col).alias("url"),
        strip_tags(F.regexp_extract(html, TITLE_RE, 1)).alias("title"),
        strip_tags(F.array_join(
            F.regexp_extract_all(html, F.lit(HEADING_RE), F.lit(1)),
            " ")).alias("head"),
        strip_tags(F.regexp_extract(html, BODY_RE, 1)).alias("body"),
        strip_tags(F.array_join(
            F.regexp_extract_all(html, F.lit(ANCHOR_RE), F.lit(2)),
            " ")).alias("anchor"),
    )


def extract_links(pages: DataFrame, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """The (src, dst, anchor_text, same_host) edge relation: one row
    per ``<a href>`` occurrence, in document order.

    Plan shape: ``regexp_extract_all`` grabs whole anchor matches, a
    higher-order ``transform`` re-extracts (href, text) per element —
    all inside one projection, then ONE explode.  No shuffle; the
    relation partitions like the page scan and feeds the graph
    operators' (src, dst) joins directly."""
    html = F.col(html_col)
    links = F.transform(
        F.regexp_extract_all(html, F.lit(ANCHOR_RE), F.lit(0)),
        lambda m: F.struct(
            F.regexp_extract(m, ANCHOR_RE, 1).alias("dst"),
            strip_tags(F.regexp_extract(m, ANCHOR_RE, 2))
            .alias("anchor_text")))
    out = (pages.select(F.col(url_col).alias("src"),
                        F.posexplode(links).alias("link_pos", "link"))
           .select("src", F.col("link.dst").alias("dst"),
                   F.col("link.anchor_text").alias("anchor_text"),
                   "link_pos"))
    return out.withColumn("same_host",
                          same_host(F.col("src"), F.col("dst")))


def pages_from_warc(records: DataFrame, uri_col: str = "target_uri",
                    text_col: str = "text") -> DataFrame:
    """Adapt parsed WARC records (``sources/warc.py parse_warc``
    output) to the (url, html) page relation the zone/link extractors
    consume — the Common Crawl shape: WARC archive files are the unit
    of parallelism, each record's Target-URI is the page URL and its
    payload the HTML."""
    return records.select(F.col(uri_col).alias("url"),
                          F.col(text_col).alias("html"))


def synthesize_pages(docs: DataFrame, host_col: str = "source",
                     pad: int = 0) -> DataFrame:
    """Deterministic HTML pages from the synthetic ``documents`` table
    (doc_id, text, lang, source) — the fixture for the zone/link
    entries and tests; no external data.  Pinned template::

        url  = http://{host}.example.com/doc{doc_id}
        html = <html><head><title>doc {doc_id} {lang}</title></head>
               <body><h1>{source} heading</h1><p>{clean}</p>
               <a href="{url of doc_id+1, same host}">intra {lang}</a>
               <a href="http://ext{doc_id%7}.example.org/p">extra link</a>
               </body></html>

    ``clean`` is ``text`` with ``[<>"&]`` blanked (the sanitizer a real
    HTML emitter applies), so parse-then-tokenize round-trips exactly
    to tokenize(reconstructed zone text) — which is what the DuckDB
    oracles restate.  ``pad`` zero-pads the doc ordinal in the URL
    (pad=8 + a constant ``host_col`` makes engine doc_ids coincide
    with table doc_ids, the zone-entry parity trick); the title keeps
    the raw doc_id either way."""
    did = (F.lpad(F.col("doc_id").cast("string"), pad, "0") if pad
           else F.col("doc_id").cast("string"))
    nid = ((F.lpad((F.col("doc_id") + 1).cast("string"), pad, "0"))
           if pad else (F.col("doc_id") + 1).cast("string"))
    host = F.concat(F.col(host_col), F.lit(".example.com"))
    clean = F.regexp_replace(F.col("text"), r'[<>"&]', " ")
    url = F.concat(F.lit("http://"), host, F.lit("/doc"), did)
    dst1 = F.concat(F.lit("http://"), host, F.lit("/doc"), nid)
    dst2 = F.concat(F.lit("http://ext"), (F.col("doc_id") % 7).cast("string"),
                    F.lit(".example.org/p"))
    html = F.concat(
        F.lit("<html><head><title>doc "), F.col("doc_id").cast("string"),
        F.lit(" "), F.col("lang"), F.lit("</title></head><body><h1>"),
        F.col("source"), F.lit(" heading</h1><p>"), clean,
        F.lit('</p><a href="'), dst1, F.lit('">intra '), F.col("lang"),
        F.lit('</a><a href="'), dst2,
        F.lit('">extra link</a></body></html>'))
    return docs.select(F.col("doc_id"), url.alias("url"),
                       html.alias("html"))


def html_zone_corpus(pages: DataFrame, url_col: str = "url",
                     html_col: str = "html") -> DataFrame:
    """Zone-extracted corpus shaped for ``build_zoned_index``: doc key
    (repo, path) = (page host, full URL) — the reference keys documents
    by URL (``documents.push_back(parser.base)``, index.cpp:160) — plus
    the four zone text columns.  Index it as::

        build_zoned_index(html_zone_corpus(pages),
                          [("title", "title"), ("head", "head"),
                           ("body", "body"), ("anchor", "anchor")])
    """
    z = extract_zones(pages, url_col=url_col, html_col=html_col)
    return z.select(page_host(F.col("url")).alias("repo"),
                    F.col("url").alias("path"),
                    "title", "head", "body", "anchor")
