"""Restricted (metadata-filtered) search: ``search(restrict=...)``.

The allow-set is the dual of tombstones — only docs IN the set may rank,
with their UNRESTRICTED full-query BM25 scores (global idf/avgdl; the
filter narrows candidates, never corpus statistics). Distribution is the
same shard-cogroup side-channel as tombstones, so a billion-row filter
result never collects or broadcasts.
"""

import pytest
from pyspark.sql import functions as F

from index_spark.functions.text import tokenize
from index_spark.operators.build import build_index
from index_spark.operators.merge import merge_shards
from index_spark.operators.query import search
from tests.oracle import OracleIndex
from tests.test_query_extras import oracle_and

SHARD_SIZE = 64


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


def oracle_restrict(oracle: OracleIndex, query: str, allowed: set[int],
                    mode: str = "or", k: int = 10):
    base = (oracle.search(query, k=10 ** 9) if mode == "or"
            else oracle_and(oracle, query, k=10 ** 9))
    return [(d, s) for d, s in base if d in allowed][:k]


def _ids_df(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "doc_id long")


def _check(index, docs, stats, oracle, spark, allowed, mode="or", **kw):
    kw.setdefault("shard_size", SHARD_SIZE)
    for q in ["import return", "def class if", "uniq7token import",
              "import"]:
        expected = oracle_restrict(oracle, q, allowed, mode=mode)
        got = search(index, docs, stats, q, k=10, mode=mode,
                     restrict=_ids_df(spark, allowed), **kw).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in expected], (q, mode)
        for r, (ed, es) in zip(got, expected):
            assert r["score"] == pytest.approx(es, abs=1e-9), (q, ed)


def test_restrict_rank_identity(spark, built):
    docs, index, stats, oracle = built
    evens = {d for d in range(oracle.n_docs) if d % 2 == 0}
    _check(index, docs, stats, oracle, spark, evens)


def test_restrict_and_mode(spark, built):
    docs, index, stats, oracle = built
    third = {d for d in range(oracle.n_docs) if d % 3 == 0}
    _check(index, docs, stats, oracle, spark, third, mode="and")


def test_restrict_on_merged_index(spark, built):
    docs, index, stats, oracle = built
    merged = merge_shards(index, segment_bytes=256).persist()
    merged.count()
    evens = {d for d in range(oracle.n_docs) if d % 2 == 0}
    _check(merged, docs, stats, oracle, spark, evens)
    merged.unpersist()


def test_restrict_scores_equal_unrestricted(spark, built):
    """The restriction filters; it never rescales a surviving doc."""
    docs, index, stats, oracle = built
    q = "import return def"
    full = {r["doc_id"]: r["score"]
            for r in search(index, docs, stats, q, k=1000).collect()}
    allowed = set(list(full)[::2])
    got = search(index, docs, stats, q, k=1000, shard_size=SHARD_SIZE,
                 restrict=_ids_df(spark, allowed)).collect()
    assert got and {r["doc_id"] for r in got} <= allowed
    for r in got:
        assert r["score"] == pytest.approx(full[r["doc_id"]], abs=1e-12)


def test_restrict_empty_set(spark, built):
    docs, index, stats, _ = built
    out = search(index, docs, stats, "import return", k=10,
                 shard_size=SHARD_SIZE, restrict=_ids_df(spark, [])).collect()
    assert out == []


def test_restrict_composes_with_tombstones_and_exclude(spark, built):
    """allowed ∩ tombstoned stays deleted; exclusion still applies."""
    docs, index, stats, oracle = built
    q, x = "import return", "def"
    full = (d for d, _ in oracle.search(q, k=10 ** 9))
    allowed = set(list(full)[:8])
    dead = set(list(allowed)[:2])
    xdocs = set(oracle.tf.get(tokenize(x, stem=True)[0], {}))
    expected = [
        (d, s) for d, s in oracle.search(q, k=10 ** 9)
        if d in allowed and d not in dead and d not in xdocs][:10]
    got = search(index, docs, stats, q, k=10, exclude=x,
                 shard_size=SHARD_SIZE, restrict=_ids_df(spark, allowed),
                 tombstones=_ids_df(spark, dead)).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in expected]
    for r, (ed, es) in zip(got, expected):
        assert r["score"] == pytest.approx(es, abs=1e-9), ed


def test_restrict_from_metadata_predicate(spark, built):
    """The intended usage: filter the doc dimension by an attribute
    predicate, feed the surviving doc_ids to search()."""
    docs, index, stats, oracle = built
    sub = docs.filter(F.col("doc_id") < 40).select("doc_id")
    allowed = {d for d in range(oracle.n_docs) if d < 40}
    expected = oracle_restrict(oracle, "import return", allowed)
    got = search(index, docs, stats, "import return", k=10,
                 shard_size=SHARD_SIZE, restrict=sub).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in expected]


def test_restrict_query_engine_parity(spark, built):
    """The serving engine honors restrict identically to one-shot
    search()."""
    from index_spark.operators.query import QueryEngine

    docs, index, stats, oracle = built
    eng = QueryEngine(index, stats, shard_size=SHARD_SIZE)
    evens = {d for d in range(oracle.n_docs) if d % 2 == 0}
    for q in ["import return", "def class if"]:
        expected = oracle_restrict(oracle, q, evens)
        got = eng.search(q, k=10, restrict=_ids_df(spark, evens))
        assert [d for d, _ in got] == [d for d, _ in expected], q
        for (gd, gs), (ed, es) in zip(got, expected):
            assert gs == pytest.approx(es, abs=1e-9), (q, gd)


def test_restrict_small_set_probe_path(spark, built):
    """A small allow-set rides the probe-driven kernel through the auto
    gate (size * RESTRICT_PROBE_RATIO < total postings) — results must
    be rank- and score-identical to the oracle."""
    docs, index, stats, oracle = built
    small = {d for d in range(0, oracle.n_docs, 17)}
    _check(index, docs, stats, oracle, spark, small)


def test_restrict_kernels_bit_identical(spark, built):
    """Probe-driven and exhaustive restricted scoring agree bit-for-bit
    (same ascending-(term, zone) float sum order)."""
    import numpy as np
    from pyspark.sql import functions as F

    from index_spark.operators.query import (
        _score_shard_exhaustive,
        _score_shard_restricted,
    )

    docs, index, stats, oracle = built
    qterms = ["import", "return", "def"]
    hits = index.filter(F.col("term").isin(qterms))
    dfs = hits.groupBy("term").agg(F.sum("df").alias("df_g"))
    n = float(stats["n_docs"])
    hits = hits.join(F.broadcast(dfs), "term").withColumn(
        "idf", F.log((F.lit(n) - F.col("df_g") + 0.5)
                     / (F.col("df_g") + 0.5) + 1.0))
    pdf = hits.filter(F.col("shard") == 0).toPandas()
    assert len(pdf)
    allowed = np.arange(0, SHARD_SIZE, 5, dtype=np.int64)
    a = _score_shard_restricted(pdf, stats["avgdl"], 1000, allowed)
    b = _score_shard_exhaustive(pdf, stats["avgdl"], 1000,
                                allowed=allowed)
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert all(x == y for x, y in zip(a["score"], b["score"]))
