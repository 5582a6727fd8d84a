"""Styled zoned build end-to-end: build_zoned_index(style_spans=...)
packs the reference's 2-bit style channel into pos_blob
((gap << 2) | style, /root/reference/index.h:44-60); phrase/proximity
results are unaffected (shift-aware decode), and the per-term style
histogram reproduces the input spans exactly. The golden testPL repack
contract stays in tests/test_style.py."""

from collections import Counter

import pandas as pd
import pytest
from pyspark.sql import types as T

from index_spark.functions.style import (
    STYLE_BOLD,
    STYLE_HEADING,
    STYLE_ITALIC,
    STYLE_NORMAL,
    styles_from_spans,
)
from index_spark.functions.text import tokenize
from index_spark.operators.build import build_zoned_index
from index_spark.operators.phrase import (
    phrase_search,
    proximity_search,
    sloppy_phrase_search,
)

SHARD = 32

DOCS = [
    ("r", "a.py", "heading words import numpy import pandas tail words"),
    ("r", "b.py", "import numpy heading words and bold import return"),
    ("r", "c.py", "plain body text import numpy no styles at all here"),
    ("r", "d.py", "numpy import numpy import numpy import numpy import"),
]
# token-ordinal spans per doc: (start, end, style)
SPANS = [
    [(0, 2, STYLE_HEADING), (2, 4, STYLE_BOLD)],
    [(0, 1, STYLE_ITALIC), (5, 7, STYLE_BOLD)],
    [],
    [(0, 9, STYLE_HEADING)],
]

SPAN_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("start", T.LongType()),
    T.StructField("end", T.LongType()),
    T.StructField("style", T.LongType()),
]))


@pytest.fixture(scope="module")
def corpora(spark):
    pdf = pd.DataFrame(DOCS, columns=["repo", "path", "content"])
    schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("spans", SPAN_SCHEMA),
    ])
    rows = [(r, p, c, [tuple(s) for s in sp])
            for (r, p, c), sp in zip(DOCS, SPANS)]
    styled_corpus = spark.createDataFrame(rows, schema)
    docs_s, idx_s, stats_s = build_zoned_index(
        styled_corpus, [("body", "content")], shard_size=SHARD,
        style_spans={"body": "spans"})
    docs_u, idx_u, stats_u = build_zoned_index(
        spark.createDataFrame(pdf), [("body", "content")],
        shard_size=SHARD, positions=True)
    idx_s, idx_u = idx_s.persist(), idx_u.persist()
    idx_s.count(), idx_u.count()
    return idx_s, idx_u, stats_s, stats_u


def _rows(df):
    return [(r["doc_id"], r["n_matches"]) for r in df.collect()]


def test_styled_phrase_identical_to_unstyled(corpora):
    idx_s, idx_u, stats_s, _ = corpora
    for ph in ["import numpy", "heading words", "numpy import numpy",
               "absent phrase"]:
        a = _rows(phrase_search(idx_s, stats_s, ph, k=10, zone="body",
                                style_shift=2))
        b = _rows(phrase_search(idx_u, stats_s, ph, k=10, zone="body"))
        assert a == b, ph


def test_styled_sloppy_and_proximity_identical(corpora):
    idx_s, idx_u, stats_s, _ = corpora
    a = _rows(sloppy_phrase_search(idx_s, stats_s, "import return",
                                   gap=3, k=10, zone="body",
                                   style_shift=2))
    b = _rows(sloppy_phrase_search(idx_u, stats_s, "import return",
                                   gap=3, k=10, zone="body"))
    assert a == b
    a = _rows(proximity_search(idx_s, stats_s, "import", "numpy",
                               window=4, k=10, zone="body",
                               style_shift=2))
    b = _rows(proximity_search(idx_u, stats_s, "import", "numpy",
                               window=4, k=10, zone="body"))
    assert a == b


def test_style_histogram_matches_spans(corpora):
    from index_spark.operators.analytics import style_histogram

    idx_s, _, _, _ = corpora
    got = {(r["term"], r["style"]): r["n_occurrences"]
           for r in style_histogram(idx_s, style_shift=2,
                                    zone="body").collect()}
    want: Counter = Counter()
    for (_, _, content), spans in zip(DOCS, SPANS):
        toks = tokenize(content, stem=True)
        st = styles_from_spans(len(toks), spans, shift=2)
        for t, s in zip(toks, st):
            want[(t, int(s))] += 1
    assert got == dict(want)
    # sanity: the fixture exercises every style code
    assert {s for _, s in got} == {STYLE_NORMAL, STYLE_ITALIC,
                                   STYLE_BOLD, STYLE_HEADING}


def test_styled_blobs_survive_merge(corpora, spark):
    """merge_shards concatenates styled pos_blobs untouched (per-doc
    values) — phrase + histogram identical on the merged form."""
    from index_spark.operators.analytics import style_histogram
    from index_spark.operators.merge import merge_shards

    idx_s, _, stats_s, _ = corpora
    merged = merge_shards(idx_s, segment_bytes=None).persist()
    a = _rows(phrase_search(merged, stats_s, "import numpy", k=10,
                            zone="body", style_shift=2))
    b = _rows(phrase_search(idx_s, stats_s, "import numpy", k=10,
                            zone="body", style_shift=2))
    assert a == b
    ha = {(r["term"], r["style"]): r["n_occurrences"]
          for r in style_histogram(merged, style_shift=2,
                                   zone="body").collect()}
    hb = {(r["term"], r["style"]): r["n_occurrences"]
          for r in style_histogram(idx_s, style_shift=2,
                                   zone="body").collect()}
    assert ha == hb
    merged.unpersist()


def test_styled_build_unstyled_zone_mix(spark):
    """Only zones named in style_spans pack styles; other zones of the
    SAME build keep plain positional blobs (decode with shift=0)."""
    schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("spans", SPAN_SCHEMA),
    ])
    rows = [("r", "x.py", "alpha beta", "alpha beta gamma",
             [(0, 1, STYLE_BOLD)])]
    corpus = spark.createDataFrame(rows, schema)
    _, idx, stats = build_zoned_index(
        corpus, [("title", "title"), ("body", "body")],
        shard_size=SHARD, positions=True, style_spans={"title": "spans"})
    t = _rows(phrase_search(idx, None, "alpha beta", zone="title",
                            style_shift=2))
    b = _rows(phrase_search(idx, None, "alpha beta", zone="body"))
    assert t == [(0, 1)] and b == [(0, 1)]


def test_style_weighted_search(corpora):
    """Style-weighted BM25: all-ones weights reproduce standard search
    scores; heading/bold boosts match a hand-computed weighted-tf BM25
    oracle on the same spans."""
    import math

    from index_spark.operators.query import search, style_weighted_search

    idx_s, _, stats_s, _ = corpora
    stats = stats_s["body"]
    q = "import numpy"
    qterms = sorted(set(tokenize(q, stem=True)))

    # identity: uniform weights == plain BM25
    ones = style_weighted_search(idx_s, None, stats, q, k=10,
                                 style_weights=(1.0, 1.0, 1.0, 1.0),
                                 zone="body")
    plain = search(idx_s, None, stats, q, k=10, zone="body")
    a = [(r["doc_id"], r["score"]) for r in ones.collect()]
    b = [(r["doc_id"], r["score"]) for r in plain.collect()]
    assert [x[0] for x in a] == [x[0] for x in b]
    for (_, sa), (_, sb) in zip(a, b):
        assert sa == pytest.approx(sb, abs=1e-9)

    # hand oracle with real boosts
    W = (1.0, 1.1, 1.25, 1.5)
    toks = [tokenize(c, stem=True) for _, _, c in DOCS]
    styles = [styles_from_spans(len(t), sp, shift=2)
              for t, sp in zip(toks, SPANS)]
    n = len(DOCS)
    avgdl = sum(len(t) for t in toks) / n
    dfs = {t: sum(1 for tk in toks if t in tk) for t in qterms}
    expect = {}
    for d in range(n):
        sc = 0.0
        for t in qterms:
            if t not in toks[d]:
                continue
            wtf = sum(W[int(styles[d][i])]
                      for i, tk in enumerate(toks[d]) if tk == t)
            idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
            dl = len(toks[d])
            sc += idf * wtf / (wtf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        if sc > 0:
            expect[d] = sc
    want = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))
    got = [(r["doc_id"], r["score"]) for r in
           style_weighted_search(idx_s, None, stats, q, k=10,
                                 style_weights=W, zone="body").collect()]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9)
    # heading-boosted docs outrank their plain-BM25 position when the
    # query terms sit in styled spans (fixture doc 3 heads with numpy)
    assert got != b


def test_style_weighted_search_merged_form(corpora, spark):
    """Style-weighted scoring over the merged (shard-less) form matches
    the sharded form exactly — weighted tfs survive blob concatenation."""
    from index_spark.operators.merge import merge_shards
    from index_spark.operators.query import style_weighted_search

    idx_s, _, stats_s, _ = corpora
    stats = stats_s["body"]
    W = (1.0, 1.1, 1.25, 1.5)
    merged = merge_shards(idx_s, segment_bytes=None).persist()
    a = [(r["doc_id"], r["score"]) for r in
         style_weighted_search(merged, None, stats, "import numpy", k=10,
                               style_weights=W, zone="body").collect()]
    b = [(r["doc_id"], r["score"]) for r in
         style_weighted_search(idx_s, None, stats, "import numpy", k=10,
                               style_weights=W, zone="body").collect()]
    assert [x[0] for x in a] == [x[0] for x in b]
    for (_, sa), (_, sb) in zip(a, b):
        assert sa == pytest.approx(sb, abs=1e-9)
    merged.unpersist()
