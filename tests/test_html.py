"""HTML zone + link extraction (sources/html.py) — the reference's
ingest surface (Index::addDocument over HtmlParser zones,
/root/reference/index.cpp:112-162; '#1'/'#0' same-host rule at
index.cpp:144-147)."""

import pytest
from pyspark.sql import functions as F

from index_spark.sources.html import (extract_links, extract_zones,
                                      html_zone_corpus, synthesize_pages)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def _links(spark, rows):
    out = extract_links(_pages(spark, rows)).collect()
    return [(r.src, r.dst, r.anchor_text, r.link_pos, r.same_host)
            for r in out]


def test_same_host_rule_basic(spark):
    rows = [("http://a.example.com/p1",
             '<body><a href="http://a.example.com/p2">in</a>'
             '<a href="http://b.example.org/x">out</a></body>')]
    out = _links(spark, rows)
    assert out == [
        ("http://a.example.com/p1", "http://a.example.com/p2", "in", 0, True),
        ("http://a.example.com/p1", "http://b.example.org/x", "out", 1, False),
    ]


def test_same_host_rule_reference_quirks(spark):
    """Byte-faithful quirks of index.cpp:144-147: (a) a link host that
    merely EXTENDS the page host compares equal over len(host) chars ->
    same-host; (b) a link whose scheme length differs from the PAGE's
    compares misaligned -> cross-host even for the same real host."""
    rows = [("http://a.com/q",
             '<body><a href="http://a.comevil/x">evil</a>'
             '<a href="https://a.com/y">tls</a>'
             '<a href="http://a.com">bare</a>'
             '<a href="/rel">rel</a></body>')]
    got = {r[1]: r[4] for r in _links(spark, rows)}
    assert got["http://a.comevil/x"] is True      # (a) extends-host quirk
    assert got["https://a.com/y"] is False        # (b) scheme-length skew
    assert got["http://a.com"] is True
    assert got["/rel"] is False                   # relative: no host match


def test_zone_extraction_grammar(spark):
    html = ("<html><head><title>My <b>Page</b>\ntitle</title></head>"
            "<body class=x><h1>First</h1><p>alpha beta</p>"
            "<h2>Second</h2><a href=\"http://z.example.com/\">go "
            "<i>now</i></a>gamma</body></html>")
    z = extract_zones(_pages(spark, [("http://z.example.com/", html)])) \
        .collect()[0]
    assert z.title == "My  Page \ntitle"          # tags -> spaces, trim
    assert z.head == "First Second"               # h1..h6 joined in order
    assert "alpha beta" in z.body and "gamma" in z.body
    assert "First" in z.body                      # headings are body text
    assert z.anchor == "go  now"                  # anchor text tag-stripped
    assert "class=x" not in z.body                # attrs never leak


def test_zone_extraction_missing_sections(spark):
    z = extract_zones(_pages(spark, [("http://h.example.com/", "plain, no tags")])) \
        .collect()[0]
    assert (z.title, z.head, z.body, z.anchor) == ("", "", "", "")


def test_synthesized_pages_round_trip(spark):
    """Parsing a synthesized page recovers exactly the zone text the
    template injected (the property the DuckDB oracles lean on)."""
    docs = spark.createDataFrame(
        [(7, "alpha <b> & beta", "en", "src3"),
         (12, 'quote " here', "de", "src9")],
        "doc_id long, text string, lang string, source string")
    z = {r.url: r for r in
         extract_zones(synthesize_pages(docs)).collect()}
    r7 = z["http://src3.example.com/doc7"]
    assert r7.title == "doc 7 en"
    assert r7.head == "src3 heading"
    assert "alpha  b    beta" in r7.body           # [<>"&] blanked
    assert r7.anchor == "intra en extra link"
    links = _links(spark, [(r.url, r.html) for r in
                           synthesize_pages(docs).collect()])
    by_src = {}
    for s, d, a, p, h in links:
        by_src.setdefault(s, []).append((d, a, p, h))
    assert by_src["http://src9.example.com/doc12"] == [
        ("http://src9.example.com/doc13", "intra de", 0, True),
        ("http://ext5.example.org/p", "extra link", 1, False)]


def test_zone_corpus_indexes_and_ranks(spark):
    """End-to-end: synthesized pages -> zone corpus -> 4-zone build ->
    title terms outrank equal-tf body terms under title weighting."""
    from index_spark.operators.build import build_zoned_index
    from index_spark.operators.query import zone_search

    docs = spark.createDataFrame(
        [(i, ("special token here" if i == 2 else "filler words here"),
          "en", "corpus") for i in range(6)],
        "doc_id long, text string, lang string, source string")
    corpus = html_zone_corpus(synthesize_pages(docs, pad=8))
    assert corpus.columns == ["repo", "path", "title", "head", "body",
                              "anchor"]
    _, index, stats = build_zoned_index(
        corpus, [("title", "title"), ("head", "head"),
                 ("body", "body"), ("anchor", "anchor")],
        stem=False, camel=False, shard_size=64)
    assert set(stats) == {"title", "head", "body", "anchor"}
    assert all(s["n_docs"] == 6 for s in stats.values())
    top = zone_search(index, stats, "special", {"body": 1.0}, k=3,
                      stem=False, camel=False).collect()
    assert [r.doc_id for r in top] == [2]


def test_link_edges_feed_graph_ops(spark):
    """The (src, dst) edge relation drops straight into the link-graph
    operators — pagerank over a 3-page chain ranks the sink highest."""
    from index_spark.operators.graph import hits, pagerank

    rows = [(f"http://h.example.com/p{i}",
             f'<body><a href="http://h.example.com/p{i + 1}">n</a></body>')
            for i in range(3)]
    # graph ops key on long node ids — dictionary-encode the URLs
    # (here: the numeric path suffix; at scale: a url-dictionary join)
    page_id = lambda c: F.regexp_extract(c, r"p(\d+)$", 1).cast("long")
    edges = extract_links(_pages(spark, rows)).select(
        page_id(F.col("src")).alias("src"),
        page_id(F.col("dst")).alias("dst"))
    nodes = spark.range(4).select(F.col("id").alias("node"))
    pr = {r.node: r.rank for r in
          pagerank(nodes, edges, iters=5).collect()}
    assert pr[3] == max(pr.values())
    h = hits(edges, iters=2).collect()
    assert {c for c in h[0].asDict()} >= {"node", "hub", "auth"}


def test_html_over_warc_round_trip(spark):
    """The Common Crawl shape end-to-end: synthesized pages -> WARC
    archive blobs (text/html records keyed by page URL) -> parse_warc
    -> pages_from_warc -> zone/link extraction identical to parsing
    the pages directly."""
    from index_spark.sources.html import pages_from_warc
    from index_spark.sources.warc import build_warc_files, parse_warc

    docs = spark.createDataFrame(
        [(i, f"token{i} shared words here", "en", f"src{i % 3}")
         for i in range(7)],
        "doc_id long, text string, lang string, source string")
    pages = synthesize_pages(docs).persist()
    blobs = build_warc_files(
        pages.select("doc_id", F.col("html").alias("text"), "url"),
        docs_per_file=3, uri_col="url", content_type="text/html")
    recs = parse_warc(blobs)
    assert recs.count() == 7
    via_warc = pages_from_warc(recs)
    direct = sorted(map(tuple, extract_zones(pages).collect()))
    warced = sorted(map(tuple, extract_zones(via_warc).collect()))
    assert warced == direct
    le = sorted(map(tuple, extract_links(via_warc).collect()))
    assert le == sorted(map(tuple, extract_links(pages).collect()))
    pages.unpersist()
