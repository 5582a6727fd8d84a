"""End-to-end: Spark build + BM25 search vs the pinned oracle.

Rank-identity (docID sequence equal, scores within 1e-9) for every pinned
query, with both the exhaustive scorer and block-max WAND; plus the
shard-merge roundtrip and the sha256 row invariant.
"""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from index_spark.functions import varbyte as vb
from index_spark.operators.build import build_index
from index_spark.operators.merge import merge_shards
from index_spark.operators.query import search
from tests.oracle import PINNED_QUERIES, OracleIndex

SHARD_SIZE = 64  # small so the tiny corpus spans multiple shards


@pytest.fixture(scope="module")
def built(spark, tiny_corpus):
    corpus_df = spark.createDataFrame(tiny_corpus)
    docs, index, stats = build_index(corpus_df, stem=True, shard_size=SHARD_SIZE)
    docs = docs.persist()
    index = index.persist()
    docs.count(), index.count()
    oracle = OracleIndex(
        list(tiny_corpus[["repo", "path", "content"]].itertuples(index=False)),
        stem=True,
    )
    return docs, index, stats, oracle


def test_stats_match_oracle(built):
    _, _, stats, oracle = built
    assert stats["n_docs"] == oracle.n_docs
    assert stats["avgdl"] == pytest.approx(oracle.avgdl, rel=1e-12)


def test_doc_ids_match_oracle(built):
    docs, _, _, oracle = built
    rows = docs.orderBy("doc_id").collect()
    assert [(r["repo"], r["path"]) for r in rows] == oracle.doc_keys
    assert [r["doc_len"] for r in rows] == oracle.doc_len


def test_term_df_matches_oracle(built):
    from index_spark.operators.build import DOC_MARKER

    _, index, _, oracle = built
    rows = (index.filter(F.col("term") != DOC_MARKER)
            .groupBy("term").agg(F.sum("df").alias("df")).collect())
    spark_df = {r["term"]: r["df"] for r in rows}
    assert len(spark_df) == len(oracle.tf)
    for term, postings in oracle.tf.items():
        assert spark_df[term] == len(postings), term


@pytest.mark.parametrize("use_wand", [False, True, "auto"],
                         ids=["exhaustive", "wand", "auto"])
def test_rank_identity(built, use_wand):
    docs, index, stats, oracle = built
    for q in PINNED_QUERIES:
        expected = oracle.search(q, k=10)
        got = search(index, docs, stats, q, k=10, use_wand=use_wand,
                     shard_size=SHARD_SIZE).collect()
        got_ids = [r["doc_id"] for r in got]
        exp_ids = [d for d, _ in expected]
        assert got_ids == exp_ids, f"query {q!r} ({'wand' if use_wand else 'exh'})"
        for (gid, gscore), (eid, escore) in zip(
            [(r["doc_id"], r["score"]) for r in got], expected
        ):
            assert gscore == pytest.approx(escore, abs=1e-9), (q, gid)


def test_query_engine_matches_oracle(built):
    """The cached-stats serving path is rank- and score-identical to the
    one-shot search() and the oracle."""
    from index_spark.operators.query import QueryEngine

    _, index, stats, oracle = built
    eng = QueryEngine(index, stats)
    eng.warm(PINNED_QUERIES)
    for q in PINNED_QUERIES:
        expected = oracle.search(q, k=10)
        got = eng.search(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in expected], q
        for (gd, gs), (ed, es) in zip(got, expected):
            assert gs == pytest.approx(es, abs=1e-9), (q, gd)


def test_merge_roundtrip(built):
    """Merged per-term blob decodes to the oracle's full posting list."""
    from index_spark.operators.build import DOC_MARKER

    _, index, _, oracle = built
    tindex = index.filter(F.col("term") != DOC_MARKER)
    merged = {r["term"]: r for r in merge_shards(tindex).collect()}
    assert set(merged) == set(oracle.tf)
    for term in sorted(oracle.tf)[:200]:
        row = merged[term]
        docs = np.cumsum(vb.decode(bytes(row["doc_blob"])).astype(np.int64))
        tfs = vb.decode(bytes(row["tf_blob"])).astype(np.int64)
        exp = sorted(oracle.tf[term].items())
        assert list(docs) == [d for d, _ in exp], term
        assert list(tfs) == [t for _, t in exp], term
        assert row["df"] == len(exp)
        assert row["cf"] == sum(t for _, t in exp)
        # skip pointers: doc value at each power-of-two crossing
        doc_arr = np.array([d for d, _ in exp])
        for s in row["skips"]:
            assert doc_arr[s["idx"]] == s["doc"]


def test_hot_term_skew_bounded(built):
    """Range-sharding IS the hot-term salting (north_rule): a term that
    appears in ~every doc ('import') is split across every shard with a
    bounded per-shard posting count; no reducer key ever exceeds the
    shard's doc capacity."""
    _, index, stats, oracle = built
    rows = index.select("term", "shard", "df").collect()
    per_row_max = max(r["df"] for r in rows)
    assert per_row_max <= SHARD_SIZE  # bounded regardless of term df
    hot = [r for r in rows if r["term"] == "import"]
    assert len(hot) > 1  # hot term split across shards
    assert sum(r["df"] for r in hot) == len(oracle.tf["import"])


def test_verify_corpus_operator(spark, tiny_corpus):
    """verify_corpus returns empty on intact corpus, flags tampering."""
    from index_spark.sources.corpus import corpus_manifest, verify_corpus

    corpus_df = spark.createDataFrame(tiny_corpus)
    manifest_df = spark.createDataFrame(corpus_manifest(tiny_corpus))
    assert verify_corpus(corpus_df, manifest_df).count() == 0

    tampered = corpus_df.withColumn(
        "content",
        F.when(F.col("path").contains("file0."), F.lit("EVIL"))
         .otherwise(F.col("content")))
    bad = verify_corpus(tampered, manifest_df).collect()
    assert len(bad) >= 1
    assert all("file0." in r["path"] for r in bad)


def test_sha256_row_invariant(spark, tiny_corpus):
    """Per-row content sha256 equality vs the generator manifest
    (input_hint invariant), computed Spark-side via F.sha2."""
    from index_spark.sources.corpus import corpus_manifest

    manifest = corpus_manifest(tiny_corpus)
    corpus_df = spark.createDataFrame(tiny_corpus)
    got = corpus_df.select(
        "repo", "path", F.sha2(F.col("content"), 256).alias("sha")
    ).collect()
    exp = {(r.repo, r.path): r.content_sha256 for r in manifest.itertuples(index=False)}
    assert len(got) == len(exp)
    for r in got:
        assert exp[(r["repo"], r["path"])] == r["sha"]
