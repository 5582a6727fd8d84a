"""Round-3 session additions: conjunctive (AND) search, dictionary
prefix scan, snippet extraction, chunk compaction.

AND-mode is checked rank-identically against a conjunctive restatement
of the pinned oracle (filter to docs containing every query term, same
BM25 sum) on the sharded index, the segmented merged index, and the
serving QueryEngine path.
"""

import math

import pytest
from pyspark.sql import functions as F

from index_spark.functions.text import tokenize
from index_spark.operators.build import build_index
from index_spark.operators.merge import merge_shards
from index_spark.operators.query import (
    QueryEngine,
    search,
    snippets,
    term_prefix_stats,
)
from tests.oracle import OracleIndex

SHARD_SIZE = 64

AND_QUERIES = [
    "import return",          # two hot terms — large intersection
    "def class if",           # three hot terms
    "uniq7token import",      # rare + hot — intersection <= 1 doc
    "import numpy",           # hot + globally-absent => empty
    "public static void",
    "café import",            # non-ASCII fold + hot
    "zzzznotaterm",           # absent single term => empty
    "import",                 # single term: AND == OR
]


def oracle_and(oracle: OracleIndex, query: str, k: int = 10):
    """Conjunctive restatement of the pinned oracle: same BM25 sum,
    restricted to docs containing EVERY query term."""
    qterms = sorted(set(tokenize(query, stem=oracle.stem)))
    if not qterms or any(not oracle.tf.get(t) for t in qterms):
        return []
    docsets = [set(oracle.tf[t]) for t in qterms]
    hits = set.intersection(*docsets)
    scores = {}
    for d in hits:
        s = 0.0
        for t in qterms:  # ascending term order — pinned sum order
            tf = oracle.tf[t][d]
            dl = oracle.doc_len[d]
            s += oracle.idf(t) * tf / (
                tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / oracle.avgdl))
        scores[d] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


@pytest.fixture(scope="module")
def built(spark, tiny_corpus):
    corpus_df = spark.createDataFrame(tiny_corpus)
    docs, index, stats = build_index(corpus_df, stem=True,
                                     shard_size=SHARD_SIZE)
    docs, index = docs.persist(), index.persist()
    docs.count(), index.count()
    oracle = OracleIndex(
        list(tiny_corpus[["repo", "path", "content"]].itertuples(index=False)),
        stem=True)
    return docs, index, stats, oracle


def _check_and(index, docs, stats, oracle, **kw):
    for q in AND_QUERIES:
        expected = oracle_and(oracle, q, k=10)
        got = search(index, docs, stats, q, k=10, mode="and", **kw).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in expected], q
        for r, (ed, es) in zip(got, expected):
            assert r["score"] == pytest.approx(es, abs=1e-9), (q, ed)


def test_and_mode_rank_identity(built):
    docs, index, stats, oracle = built
    _check_and(index, docs, stats, oracle)


def test_and_mode_on_segmented_merged_index(built):
    """Conjunctive scoring composes over merged doc-range segments: a
    term's postings split across several segment rows must still count
    as ONE term for the conjunction."""
    docs, index, stats, oracle = built
    merged = merge_shards(index, segment_bytes=256).persist()
    merged.count()
    _check_and(merged, docs, stats, oracle)
    merged.unpersist()


def test_and_mode_subset_of_or(built):
    """Every AND hit is an OR hit with the identical score."""
    docs, index, stats, _ = built
    q = "import return def"
    or_rows = {r["doc_id"]: r["score"]
               for r in search(index, docs, stats, q, k=1000).collect()}
    and_rows = search(index, docs, stats, q, k=1000, mode="and").collect()
    assert and_rows, "conjunction of hot terms should be non-empty"
    for r in and_rows:
        assert r["doc_id"] in or_rows
        assert r["score"] == pytest.approx(or_rows[r["doc_id"]], abs=1e-9)


def test_and_mode_query_engine(built):
    _, index, stats, oracle = built
    eng = QueryEngine(index, stats)
    for q in AND_QUERIES:
        expected = oracle_and(oracle, q, k=10)
        got = eng.search(q, k=10, mode="and")
        assert [d for d, _ in got] == [d for d, _ in expected], q
        for (gd, gs), (ed, es) in zip(got, expected):
            assert gs == pytest.approx(es, abs=1e-9), (q, gd)
    # absent term short-circuits driver-side: no job, empty result
    assert eng.search("import zzzznotaterm", k=10, mode="and") == []


def oracle_not(oracle: OracleIndex, query: str, exclude: str,
               mode: str = "or", k: int = 10):
    """OR/AND oracle with docs containing any excluded term removed."""
    xterms = sorted(set(tokenize(exclude, stem=oracle.stem)))
    banned = set()
    for t in xterms:
        banned |= set(oracle.tf.get(t, {}))
    base = (oracle.search(query, k=10 ** 9) if mode == "or"
            else oracle_and(oracle, query, k=10 ** 9))
    return [(d, s) for d, s in base if d not in banned][:k]


EXCLUDE_CASES = [
    ("import return", "def", "or"),
    ("import return", "def class", "or"),
    ("import", "import", "or"),            # self-exclusion => empty
    ("def class", "zzznotaterm", "or"),    # absent exclusion => no-op
    ("import return", "def", "and"),
    ("café", "return", "or"),
]


def test_exclusion_rank_identity(built):
    docs, index, stats, oracle = built
    for q, x, m in EXCLUDE_CASES:
        expected = oracle_not(oracle, q, x, mode=m)
        got = search(index, docs, stats, q, k=10, mode=m,
                     exclude=x).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in expected], (q, x, m)
        for r, (ed, es) in zip(got, expected):
            assert r["score"] == pytest.approx(es, abs=1e-9), (q, x, ed)


def test_exclusion_on_merged_index(built):
    docs, index, stats, oracle = built
    merged = merge_shards(index, segment_bytes=256).persist()
    merged.count()
    for q, x, m in EXCLUDE_CASES[:3]:
        expected = oracle_not(oracle, q, x, mode=m)
        got = search(merged, docs, stats, q, k=10, mode=m,
                     exclude=x).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in expected], (q, x)
    merged.unpersist()


def oracle_dsl(oracle: OracleIndex, q: str, k: int = 10):
    from index_spark.operators.query import parse_query

    req, opt, exc, _, _ = parse_query(q, stem=oracle.stem)
    if req and any(not oracle.tf.get(t) for t in req):
        return []
    if req:
        docsets = [set(oracle.tf[t]) for t in req]
        hits = set.intersection(*docsets)
    else:
        hits = set()
        for t in opt:
            hits |= set(oracle.tf.get(t, {}))
    banned = set()
    for t in exc:
        banned |= set(oracle.tf.get(t, {}))
    hits -= banned
    scores = {}
    for d in hits:
        s = 0.0
        for t in sorted(set(req) | set(opt)):  # pinned sum order
            tf = oracle.tf.get(t, {}).get(d)
            if tf is None:
                continue
            dl = oracle.doc_len[d]
            s += oracle.idf(t) * tf / (
                tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / oracle.avgdl))
        scores[d] = s
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


DSL_QUERIES = [
    "+import return",          # required + optional
    "+import +return def",     # two required, one optional
    "+import -def",            # required + exclusion
    "+uniq7token import",      # rare required, hot optional
    "import return",           # no markers == plain OR
    "+zzznotaterm import",     # absent required => empty
    "data -data",              # optional excluded by itself => empty
    "+def +class -while uniq7token",
]


def test_search_dsl(built):
    from index_spark.operators.query import search_dsl

    docs, index, stats, oracle = built
    for q in DSL_QUERIES:
        expected = oracle_dsl(oracle, q, k=10)
        got = search_dsl(index, docs, stats, q, k=10).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in expected], q
        for r, (ed, es) in zip(got, expected):
            assert r["score"] == pytest.approx(es, abs=1e-9), (q, ed)


def test_search_dsl_plain_equals_or_search(built):
    from index_spark.operators.query import search_dsl

    docs, index, stats, _ = built
    a = search_dsl(index, docs, stats, "import return def", k=10).collect()
    b = search(index, docs, stats, "import return def", k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == \
           [(r["doc_id"], r["score"]) for r in b]


def test_search_many_and_mode(built):
    """Batch AND == per-query AND for the whole query set."""
    from index_spark.operators.query import search_many

    docs, index, stats, oracle = built
    queries = {i: q for i, q in enumerate(AND_QUERIES)}
    out = search_many(index, stats, queries, k=10, mode="and").collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"]))
    for qid, q in queries.items():
        expected = oracle_and(oracle, q, k=10)
        got = sorted(by_q.get(qid, []))
        assert [d for _, d, _ in got] == [d for d, _ in expected], q
        for (_, gd, gs), (ed, es) in zip(got, expected):
            assert gs == pytest.approx(es, abs=1e-9), (q, ed)


def test_engine_exclude_and_delete_parity(spark, built):
    """QueryEngine NOT + tombstones match the one-shot search paths."""
    docs, index, stats, oracle = built
    banned = [1, 4, 9, 16, 25]
    eng = QueryEngine(index, stats, shard_size=SHARD_SIZE)
    for q, x, m in EXCLUDE_CASES:
        exp = search(index, docs, stats, q, k=10, mode=m,
                     exclude=x).collect()
        got = eng.search(q, k=10, mode=m, exclude=x)
        assert got == [(r["doc_id"], pytest.approx(r["score"], abs=1e-9))
                       for r in exp], (q, x, m)
    eng.delete(banned)
    tomb = spark.createDataFrame([(d,) for d in banned], "doc_id long")
    for q in ["import return", "def class"]:
        exp = search(index, docs, stats, q, k=10, shard_size=SHARD_SIZE,
                     tombstones=tomb).collect()
        got = eng.search(q, k=10)
        assert got == [(r["doc_id"], pytest.approx(r["score"], abs=1e-9))
                       for r in exp], q
        assert not set(banned) & {d for d, _ in got}


def test_and_mode_bad_mode_raises(built):
    docs, index, stats, _ = built
    with pytest.raises(ValueError, match="mode"):
        search(index, docs, stats, "import", mode="not-a-mode").collect()


def test_term_prefix_stats(built):
    _, index, _, oracle = built
    for prefix in ["imp", "ge", "uniq1", "zzz"]:
        got = term_prefix_stats(index, prefix, limit=15).collect()
        exp = sorted(
            (t, len(p), sum(p.values()))
            for t, p in oracle.tf.items() if t.startswith(prefix))[:15]
        assert [(r["term"], r["df"], r["cf"]) for r in got] == exp, prefix


def test_snippets(spark, tiny_corpus, built):
    """Each snippet is the width-char window before/around the earliest
    query-term occurrence of the ORIGINAL content, verified per doc."""
    from index_spark.operators.build import assign_doc_ids

    docs, index, stats, _ = built
    corpus_df = assign_doc_ids(spark.createDataFrame(tiny_corpus))
    q = "import return"
    top = search(index, docs, stats, q, k=5)
    out = snippets(top, corpus_df, q, stem=True, before=20, width=80)
    rows = {r["doc_id"]: r for r in out.collect()}
    top_ids = [r["doc_id"] for r in top.collect()]
    assert sorted(rows) == sorted(top_ids)
    content = {r["doc_id"]: r["content"]
               for r in corpus_df.filter(
                   F.col("doc_id").isin(top_ids)).collect()}
    qterms = sorted(set(tokenize(q, stem=True)))
    for did, r in rows.items():
        hay = content[did].lower()
        positions = [hay.find(t) + 1 for t in qterms if hay.find(t) >= 0]
        exp_pos = min(positions) if positions else 1
        assert r["pos"] == exp_pos, did
        start = max(1, exp_pos - 20)
        assert r["snippet"] == content[did][start - 1:start - 1 + 80], did
        assert any(t in r["snippet"].lower() for t in qterms) or not positions


def test_compact_index_lifecycle(spark, tiny_corpus, tmp_path):
    """build_chunked -> compact_index: merged results rank-identical to
    the chunk union; recompaction with an unchanged chunk set is a
    skipped no-op; force re-merges."""
    from index_spark.plans.checkpoint import (
        build_chunked,
        compact_index,
        load_index,
        load_merged_index,
        load_stats,
    )

    out = str(tmp_path / "idx")
    corpus_df = spark.createDataFrame(tiny_corpus)
    build_chunked(spark, corpus_df, out, docs_per_chunk=64, shard_size=64)

    m1 = compact_index(spark, out, segment_bytes=512)
    assert not m1["skipped"] and m1["terms"] > 0
    merged = load_merged_index(spark, out)
    stats = load_stats(out)
    chunked = load_index(spark, out)
    for q in ["import return", "def class", "uniq7token"]:
        a = search(merged, None, stats, q, k=10).collect()
        b = search(chunked, None, stats, q, k=10).collect()
        assert [(r["doc_id"], round(r["score"], 9)) for r in a] == \
               [(r["doc_id"], round(r["score"], 9)) for r in b], q

    m2 = compact_index(spark, out, segment_bytes=512)
    assert m2["skipped"] and m2["chunks"] == m1["chunks"]
    m3 = compact_index(spark, out, segment_bytes=512, force=True)
    assert not m3["skipped"] and m3["rows"] == m1["rows"]


def test_compact_to_serving_table(spark, tiny_corpus, tmp_path):
    """compact_index(serving_table=...) publishes the merged index as a
    term-bucketed table in the same pass: point lookups bucket-prune and
    search over the table is rank-identical to the merged parquet."""
    from index_spark.plans.checkpoint import (
        build_chunked,
        compact_index,
        load_merged_index,
        load_stats,
    )
    from index_spark.plans.storage import load_serving_index

    out = str(tmp_path / "idx_serve")
    table = "t_compact_serving_test"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    corpus_df = spark.createDataFrame(tiny_corpus)
    build_chunked(spark, corpus_df, out, docs_per_chunk=64, shard_size=64)
    m = compact_index(spark, out, segment_bytes=512,
                      serving_table=table, serving_buckets=4)
    assert m["serving_table"] == table
    try:
        sv = load_serving_index(spark, table)
        stats = load_stats(out)
        merged = load_merged_index(spark, out)
        for q in ["import return", "uniq7token"]:
            a = search(sv, None, stats, q, k=10).collect()
            b = search(merged, None, stats, q, k=10).collect()
            assert [(r["doc_id"], round(r["score"], 9)) for r in a] == \
                   [(r["doc_id"], round(r["score"], 9)) for r in b], q
        plan = sv.filter(F.col("term") == "import")._sc._jvm \
            .PythonSQLUtils.explainString(
                sv.filter(F.col("term") == "import")._jdf.queryExecution(),
                "formatted")
        assert "SelectedBucketsCount: 1 out of 4" in plan, plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_complete_terms_popularity_order(built):
    from index_spark.operators.query import complete_terms

    docs, index, stats, oracle = built
    got = [(r["term"], r["df"])
           for r in complete_terms(index, "re", limit=5).collect()]
    cand = [(t, len(p)) for t, p in oracle.tf.items()
            if t.startswith("re")]
    cand.sort(key=lambda x: (-x[1], x[0]))
    assert got == cand[:5]


def test_resolve_topk_keys(built):
    from index_spark.operators.query import resolve_topk, search

    docs, index, stats, oracle = built
    top = search(index, docs, stats, "import return", k=5,
                 shard_size=SHARD_SIZE)
    out = resolve_topk(top, docs).collect()
    assert [r["doc_id"] for r in out] == \
        [r["doc_id"] for r in top.collect()]
    for r in out:
        assert (r["repo"], r["path"]) == oracle.doc_keys[r["doc_id"]]


def test_snippets_empty_query_returns_empty(spark, built):
    from index_spark.operators.build import assign_doc_ids
    from index_spark.operators.query import search, snippets

    docs, index, stats, oracle = built
    corpus = spark.createDataFrame(
        [("r", f"{i:04d}", "text") for i in range(3)],
        ["repo", "path", "content"])
    top = search(index, docs, stats, "import", k=3,
                 shard_size=SHARD_SIZE)
    out = snippets(top, assign_doc_ids(corpus), "!!!").collect()
    assert out == []
