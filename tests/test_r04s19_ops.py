"""Round-4 session-19 surface: TermRangeQuery (constant-score rewrite),
SpanMultiTermQueryWrapper (prefix-expanded phrase slot), and the
expansion primitive's Lucene top-terms order."""

from collections import Counter

import pytest


TEXTS = [
    (0, "data table scan and data tablet rows"),
    (1, "data tab stop then data table again"),
    (2, "tablet tab table data"),
    (3, "scan merge filter rows"),
    (4, "data query data table table"),
]


@pytest.fixture(scope="module")
def pos_ix(spark):
    from index_spark.operators.build import build_index

    corpus = spark.createDataFrame(
        [("r", f"d{i}", t) for i, t in TEXTS],
        "repo string, path string, content string")
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     positions=True, shard_size=16)
    return docs, index.persist(), stats


def _range_expected(lo, hi):
    per_doc = Counter()
    for i, t in TEXTS:
        per_doc[i] = len({w for w in t.split() if lo <= w < hi})
    return {d: float(n) for d, n in per_doc.items() if n}


def test_term_range_matches_brute_force(pos_ix):
    from index_spark.operators.query import term_range_search

    _, index, _ = pos_ix
    out = term_range_search(index, "ta", "tb", k=10)
    got = {r["doc_id"]: r["score"] for r in out.collect()}
    assert got == _range_expected("ta", "tb")


def test_term_range_open_and_exclusive_bounds(pos_ix):
    from index_spark.operators.query import term_range_search

    _, index, _ = pos_ix
    # open lower bound: every term < "e" (doc marker % is excluded)
    out = term_range_search(index, None, "e", k=10)
    got = {r["doc_id"]: r["score"] for r in out.collect()}
    exp = {i: float(len({w for w in t.split() if w < "e"}))
           for i, t in TEXTS}
    assert got == {d: n for d, n in exp.items() if n}
    # exclusive lower: term > "data" drops "data" itself
    out2 = term_range_search(index, "data", "e", include_lower=False,
                             k=10).collect()
    assert not out2  # nothing strictly between "data" and "e"
    with pytest.raises(ValueError):
        term_range_search(index, None, None)


def test_expand_prefix_lucene_order(pos_ix):
    from index_spark.operators.phrase import expand_prefix_terms

    _, index, _ = pos_ix
    # df: table=4 docs, tab=2, tablet=2 -> top-2 = table, then tab
    # (df desc, term asc tie-break)
    assert expand_prefix_terms(index, "ta", max_expansions=2) == \
        sorted(["table", "tab"])
    assert expand_prefix_terms(index, "ta", max_expansions=1) == ["table"]
    assert expand_prefix_terms(index, "zz") == []


def test_span_multi_prefix_slot(pos_ix):
    from index_spark.operators.phrase import span_multi_search

    _, index, stats = pos_ix
    out = span_multi_search(index, stats, ["data", {"prefix": "ta"}],
                            k=10, stem=False, camel=False,
                            shard_size=16)
    got = {r["doc_id"]: r["n_matches"] for r in out.collect()}
    # brute force: "data" followed by any ta* token
    exp = Counter()
    for i, t in TEXTS:
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            if a == "data" and b.startswith("ta"):
                exp[i] += 1
    assert got == dict(exp)


def test_span_multi_empty_expansion_matches_nothing(pos_ix):
    from index_spark.operators.phrase import span_multi_search

    _, index, stats = pos_ix
    out = span_multi_search(index, stats, ["data", {"prefix": "zz"}],
                            k=10, stem=False, camel=False, shard_size=16)
    assert out.count() == 0


def test_span_multi_max_expansions_gate(pos_ix):
    from index_spark.operators.phrase import span_multi_search

    _, index, stats = pos_ix
    # max_expansions=1 keeps only the highest-df expansion ("table"):
    # "data tab"/"data tablet" adjacencies no longer match
    out = span_multi_search(index, stats, ["data", {"prefix": "ta"}],
                            k=10, stem=False, camel=False,
                            max_expansions=1, shard_size=16)
    got = {r["doc_id"]: r["n_matches"] for r in out.collect()}
    exp = Counter()
    for i, t in TEXTS:
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            if a == "data" and b == "table":
                exp[i] += 1
    assert got == dict(exp)


def test_span_multi_literal_only_degrades_to_multi_phrase(pos_ix):
    from index_spark.operators.phrase import (
        multi_phrase_search,
        span_multi_search,
    )

    _, index, stats = pos_ix
    a = span_multi_search(index, stats, ["data", ["table", "tab"]],
                          k=10, stem=False, camel=False,
                          shard_size=16).collect()
    b = multi_phrase_search(index, stats, [["data"], ["table", "tab"]],
                            k=10, stem=False, camel=False,
                            shard_size=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# -------------------------------------------------- session-19 analytics


def test_categorize_text_templates(spark):
    from index_spark.operators.analytics import categorize_text

    rows = [("error user 87 connect failed code 500 retry now extra",),
            ("error user 12 connect failed code 404 retry now",),
            ("view page 3 ok",),
            ("view page 44 ok",),
            ("signup new user welcome",)]
    df = spark.createDataFrame(rows, "text string")
    out = {r["template"]: r["doc_count"]
           for r in categorize_text(df, max_tokens=8).collect()}
    assert out == {
        "error user <num> connect failed code <num> retry": 2,
        "view page <num> ok": 2,
        "signup new user welcome": 1,
    }


def test_variable_width_histogram_ntiles(spark):
    from index_spark.operators.analytics import variable_width_histogram

    df = spark.createDataFrame([(float(i), i) for i in range(1, 11)],
                               "v double, k int")
    out = variable_width_histogram(df, "v", buckets=3, key_col="k",
                                   round_at=4).collect()
    got = [(r["bucket"], r["min_val"], r["max_val"], r["doc_count"])
           for r in out]
    assert got == [(1, 1.0, 4.0, 4), (2, 5.0, 7.0, 3), (3, 8.0, 10.0, 3)]
    assert abs(out[0]["avg_val"] - 2.5) < 1e-9


def test_terms_facet_sharded_error_bounds(spark):
    from index_spark.operators.analytics import terms_facet_sharded

    # 2 shards via id % 2; shard 0 keys: a×3 b×2 c×1, shard 1: b×3 d×1
    rows = [("a", 0), ("a", 2), ("a", 4), ("b", 6), ("b", 8), ("c", 10),
            ("b", 1), ("b", 3), ("b", 5), ("d", 7)]
    df = spark.createDataFrame(rows, "key string, id long")
    out = {r["key"]: (r["doc_count"], r["doc_count_error_upper_bound"])
           for r in terms_facet_sharded(df, "key", "id", n_shards=2,
                                        size=5, shard_size=2).collect()}
    # shard 0 returns a:3, b:2 (c hidden; shard_min=2, 3 keys > 2)
    # shard 1 returns b:3, d:1 (exhausted: 2 keys = shard_size -> 0 err)
    # merged: a=3 (absent from shard1 tops, err 0), b=5 (both, err 0),
    #         d=1 (absent from shard0 tops, err 2)
    assert out == {"a": (3, 0), "b": (5, 0), "d": (1, 2)}


def test_random_sampler_agg_pinned_hash(spark):
    from index_spark.operators.sample import random_sampler_agg

    rows = [(i, "g" if i % 2 else "h", float(i)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    p = 0.25
    out = {r["g"]: (r["sampled_count"], r["est_count"], r["est_sum"])
           for r in random_sampler_agg(df, "id", "g", p,
                                       value_col="v").collect()}
    thresh = int(p * 4294967296)
    exp = {}
    for i, g, v in rows:
        if (i * 2654435761) % 4294967296 < thresh:
            c, s = exp.get(g, (0, 0.0))
            exp[g] = (c + 1, s + v)
    assert set(out) == set(exp)
    for g, (c, s) in exp.items():
        assert out[g][0] == c
        assert abs(out[g][1] - c / p) < 1e-9
        assert abs(out[g][2] - s / p) < 1e-6
    import pytest as _pt
    with _pt.raises(ValueError):
        random_sampler_agg(df, "id", "g", 0.0)


# -------------------------------------------------- session-19 phonetic


def test_phonetic_key_vectors_and_column_parity(spark):
    from index_spark.functions.phonetic import phonetic_key, phonetic_key_py

    # classic published soundex vectors (Russell core, no H/W rule)
    assert phonetic_key_py("robert") == "R163"
    assert phonetic_key_py("rupert") == "R163"
    assert phonetic_key_py("tymczak") == "T522"
    assert phonetic_key_py("pfister") == "P236"
    assert phonetic_key_py("table") == phonetic_key_py("tabel") == "T140"
    assert phonetic_key_py("123") is None
    words = ["robert", "rupert", "tymczak", "pfister", "table",
             "tabel", "ashcraft", "a", "x123y", "42"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r["w"]: r["k"]
           for r in df.select("w", phonetic_key("w").alias("k")).collect()}
    assert got == {w: phonetic_key_py(w) for w in words}


def test_phonetic_expand_and_sounds_like(pos_ix):
    from index_spark.operators.query import (
        phonetic_expand,
        search,
        sounds_like_search,
    )

    _, index, stats = pos_ix
    exp = phonetic_expand(index, ["tabel", "scann", "123"])
    assert exp["tabel"] == ["table"]     # T140 neighborhood
    assert exp["scann"] == ["scan"]      # S500
    assert exp["123"] == []              # no key
    out = sounds_like_search(index, None, stats, "tabel", k=10,
                             stem=False, camel=False,
                             shard_size=16).collect()
    ref = search(index, None, stats, "table", k=10, stem=False,
                 camel=False, shard_size=16).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, ref))
    # group-conjunctive: docs must contain a variant of BOTH terms
    both = {r.doc_id for r in sounds_like_search(
        index, None, stats, "tabel merje", k=10, mode="and",
        stem=False, camel=False, shard_size=16).collect()}
    assert both == set()  # 'merje' -> M620 = merge; no doc has both?


def test_sparse_vector_dot_product(pos_ix):
    import math

    from index_spark.operators.query import sparse_vector_search

    _, index, _ = pos_ix
    w = {"data": 2.0, "table": 1.0, "scan": 0.5}
    out = {r["doc_id"]: r["score"]
           for r in sparse_vector_search(index, None, w, k=10).collect()}
    exp = {}
    for i, t in TEXTS:
        toks = t.split()
        s = sum(wt * math.log(1 + toks.count(term))
                for term, wt in w.items() if term in toks)
        if s:
            exp[i] = s
    assert set(out) == set(exp)
    for d in exp:
        assert abs(out[d] - exp[d]) < 1e-9
    assert sparse_vector_search(index, None, {}, k=10).count() == 0


def test_collapse_inner_hits_consistency(spark, pos_ix):
    from index_spark.operators.query import (
        collapse_inner_hits,
        collapse_search,
    )

    _, index, stats = pos_ix
    # group dimension: parity of doc_id
    dim = spark.createDataFrame(
        [(i, f"g{i % 2}") for i, _ in TEXTS], "doc_id long, grp string")
    inner = collapse_inner_hits(index, dim, stats, "data table",
                                collapse="grp", k=5, inner_size=2,
                                stem=False, camel=False,
                                shard_size=16).collect()
    flat = collapse_search(index, dim, stats, "data table",
                           collapse="grp", k=5, stem=False, camel=False,
                           shard_size=16).collect()
    # rank-1 inner hits ARE the collapse winners (same groups/scores)
    rank1 = {(r["group_key"], r["doc_id"], round(r["score"], 6))
             for r in inner if r["inner_rank"] == 1}
    assert rank1 == {(r["group_key"], r["doc_id"], round(r["score"], 6))
                     for r in flat}
    # within a group: ranks contiguous from 1, scores non-increasing
    by_g = {}
    for r in inner:
        by_g.setdefault(r["group_key"], []).append(r)
    for g, rows in by_g.items():
        rows.sort(key=lambda r: r["inner_rank"])
        assert [r["inner_rank"] for r in rows] == \
            list(range(1, len(rows) + 1))
        assert len(rows) <= 2
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_facet_extended_stats_vs_python(spark, pos_ix):
    import math

    from index_spark.operators.analytics import facet_extended_stats

    _, index, _ = pos_ix
    meta = spark.createDataFrame(
        [(i, len(t), "g") for i, t in TEXTS],
        "doc_id long, n_ch long, grp string")
    out = facet_extended_stats(index, meta, "data", value="n_ch",
                               by="grp", sigma=2.0, stem=False,
                               camel=False).collect()
    assert len(out) == 1
    r = out[0]
    vals = [len(t) for i, t in TEXTS if "data" in t.split()]
    n = len(vals)
    avg = sum(vals) / n
    var = sum(v * v for v in vals) / n - avg * avg
    assert r["n_docs"] == n
    assert r["sum_of_squares"] == sum(v * v for v in vals)
    assert abs(r["variance"] - round(var, 4)) < 1e-9
    assert abs(r["std_upper"] - round(avg + 2 * math.sqrt(var), 4)) < 1e-9
