"""Randomized differential sweeps over the round-5 surface: each
compares the Spark implementation against an INDEPENDENT plain-Python
restatement of the pinned contract on seeded random inputs (the same
strategy the golden/porter/varbyte suites use — different code path,
same spec, exact agreement)."""

import random
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

WORDS = ["alpha", "beta", "gamma", "delta", "code", "data", "x1", "y2",
         "fn", "merge", "index", "scan"]


def _rand_html(rng):
    """Random page obeying the pinned grammar (no nested same-tag)."""
    def words(n):
        return " ".join(rng.choice(WORDS) for _ in range(n))

    title = words(rng.randint(0, 4))
    heads = [f"<h{rng.randint(1, 6)}>{words(rng.randint(1, 3))}"
             f"</h{rng.randint(1, 6)}>" for _ in range(rng.randint(0, 3))]
    links = [(f"http://{rng.choice('abc')}.example.{rng.choice(['com', 'org'])}"
              f"/p{rng.randint(0, 9)}", words(rng.randint(1, 3)))
             for _ in range(rng.randint(0, 4))]
    body = (words(rng.randint(0, 6))
            + "".join(f'<a href="{u}">{t}</a>{words(rng.randint(0, 2))}'
                      for u, t in links))
    html = (f"<html><head><title>{title}</title></head>"
            f"<body>{''.join(heads)}{body}</body></html>")
    return html, title, links


def _ref_zones(html):
    """Independent regex reference for the pinned zone grammar."""
    strip = lambda s: re.sub(r"<[^>]*>", " ", s).strip()
    t = re.search(r"(?s)<title[^>]*>(.*?)</title>", html)
    b = re.search(r"(?s)<body[^>]*>(.*?)</body>", html)
    heads = re.findall(r"(?s)<h[1-6][^>]*>(.*?)</h[1-6]>", html)
    anchors = re.findall(r'(?s)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>',
                         html)
    return (strip(t.group(1)) if t else "",
            strip(" ".join(heads)),
            strip(b.group(1)) if b else "",
            strip(" ".join(a[1] for a in anchors)),
            [(u, strip(x)) for u, x in anchors])


def _ref_same_host(src, dst):
    m = re.match(r"^([a-z][a-z0-9+.-]*)://([^/]*)", src)
    if not m:
        return False
    svc, host = m.groups()
    if not host:
        return False
    return dst[len(svc) + 3: len(svc) + 3 + len(host)] == host


def test_html_extraction_randomized(spark):
    from index_spark.sources.html import extract_links, extract_zones

    rng = random.Random(20260821)
    rows = []
    expect = {}
    for i in range(120):
        url = f"http://{rng.choice('abc')}.example.com/page{i}"
        html, _, _ = _rand_html(rng)
        rows.append((url, html))
        expect[url] = _ref_zones(html)
    pages = spark.createDataFrame(rows, "url string, html string")
    for r in extract_zones(pages).collect():
        t, h, b, a, _ = expect[r.url]
        assert (r.title, r.head, r.body, r.anchor) == (t, h, b, a), r.url
    got_links = {}
    for r in extract_links(pages).collect():
        got_links.setdefault(r.src, []).append(
            (r.dst, r.anchor_text, r.same_host))
    for url, (_, _, _, _, anchors) in expect.items():
        want = [(u, x, _ref_same_host(url, u)) for u, x in anchors]
        assert got_links.get(url, []) == want, url


def test_export_round_trip_randomized(spark, tmp_path):
    from index_spark.operators.build import build_index
    from index_spark.plans.export import (export_reference_chunk,
                                          walk_reference_chunk)

    rng = random.Random(7)
    for trial in range(3):
        texts = [" ".join(rng.choice(WORDS)
                          for _ in range(rng.randint(1, 30)))
                 for _ in range(rng.randint(3, 20))]
        corpus = spark.createDataFrame(
            [("r", f"f{i:03d}", t) for i, t in enumerate(texts)],
            "repo string, path string, content string")
        docs, index, _ = build_index(corpus, stem=False, camel=False,
                                     positions=True, shard_size=64)
        p = str(tmp_path / f"chunk_t{trial}")
        export_reference_chunk(index, docs, p, shard=0)
        _, records, _ = walk_reference_chunk(p)
        eod = next(r for r in records if r[3] == "e")
        eod_locs = np.cumsum(eod[6])
        bases = np.concatenate(([0], eod_locs[:-1] + 2))
        slot = {}
        for key, use, dc, typ, lastloc, seeks, posts in records:
            if typ != "b":
                continue
            for loc in np.cumsum(np.asarray(posts) >> 1):
                slot[int(loc)] = key.decode()
        rebuilt = [" ".join(slot[int(bases[d] + i)]
                            for i in range(int(eod_locs[d] - bases[d])))
                   for d in range(len(texts))]
        assert rebuilt == texts, trial


def _ref_bm25(texts, query_terms, k):
    """Plain-Python BM25 over whitespace docs (stem=False contract)."""
    import math

    toks = [t.split() for t in texts]
    n = len(toks)
    avgdl = sum(map(len, toks)) / n
    df = {}
    for d in toks:
        for t in set(d):
            df[t] = df.get(t, 0) + 1
    scores = {}
    for term in sorted(set(query_terms)):
        if term not in df:
            continue
        w = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
        for i, d in enumerate(toks):
            tf = d.count(term)
            if tf:
                sat = tf / (tf + 1.2 * (1 - 0.75 + 0.75 * len(d) / avgdl))
                scores[i] = scores.get(i, 0.0) + w * sat
    out = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(d, round(s, 9)) for d, s in out]


def test_replica_randomized_vs_plain_python(spark):
    from index_spark.operators.build import build_index
    from index_spark.operators.serving import ServingReplica

    rng = random.Random(99)
    texts = [" ".join(rng.choice(WORDS) for _ in range(rng.randint(2, 40)))
             for _ in range(60)]
    corpus = spark.createDataFrame(
        [("r", f"f{i:03d}", t) for i, t in enumerate(texts)],
        "repo string, path string, content string")
    _, index, stats = build_index(corpus, stem=False, camel=False,
                                  shard_size=16)
    rep = ServingReplica.from_index(index, stats, stem=False, camel=False)
    for _ in range(25):
        q = " ".join(rng.choice(WORDS + ["absent9"])
                     for _ in range(rng.randint(1, 4)))
        got = [(d, round(s, 9)) for d, s in rep.search(q, k=10)]
        assert got == _ref_bm25(texts, q.split(), 10), q
