"""Score explanation: per-(doc, term) BM25 contribution rows that sum
exactly to the search score."""

import pytest

from index_spark.functions.text import tokenize
from index_spark.operators.build import build_index
from index_spark.operators.merge import merge_shards
from index_spark.operators.query import explain_score, search
from tests.oracle import OracleIndex

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


def test_explain_matches_oracle(built):
    docs, index, stats, oracle = built
    q = "import return def"
    qterms = sorted(set(tokenize(q, stem=True)))
    targets = [0, 7, 42, 101]
    rows = explain_score(index, stats, q, targets).collect()
    got = {(r["doc_id"], r["term"]): r for r in rows}
    expected = {}
    for t in qterms:
        for d in targets:
            tf = oracle.tf.get(t, {}).get(d)
            if tf:
                expected[(d, t)] = tf
    assert set(got) == set(expected)
    for (d, t), r in got.items():
        assert r["tf"] == expected[(d, t)]
        assert r["doc_len"] == oracle.doc_len[d]
        assert r["df"] == oracle.df(t)
        assert r["idf"] == pytest.approx(oracle.idf(t), abs=1e-12)
        dl = oracle.doc_len[d]
        contrib = oracle.idf(t) * r["tf"] / (
            r["tf"] + 1.2 * (1 - 0.75 + 0.75 * dl / oracle.avgdl))
        assert r["contribution"] == pytest.approx(contrib, abs=1e-12)


def test_explain_sums_to_search_score(built):
    docs, index, stats, _ = built
    q = "import return def"
    top = search(index, docs, stats, q, k=5,
                 shard_size=SHARD_SIZE).collect()
    ids = [r["doc_id"] for r in top]
    rows = explain_score(index, stats, q, ids).collect()
    sums: dict[int, float] = {}
    for r in rows:
        sums[r["doc_id"]] = sums.get(r["doc_id"], 0.0) + r["contribution"]
    for r in top:
        assert sums[r["doc_id"]] == pytest.approx(r["score"], abs=1e-9)


def test_explain_on_merged_index(built):
    """Merged segment rows: a doc appears in exactly one row per term."""
    docs, index, stats, oracle = built
    merged = merge_shards(index, segment_bytes=256).persist()
    merged.count()
    rows = explain_score(merged, stats, "import return", [3, 99]).collect()
    seen = [(r["doc_id"], r["term"]) for r in rows]
    assert len(seen) == len(set(seen))
    for r in rows:
        assert r["tf"] == oracle.tf[r["term"]][r["doc_id"]]
    merged.unpersist()
