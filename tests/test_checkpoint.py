"""Resumable chunked build: crash -> restart -> identical final index."""

import json
import os

import pytest
from pyspark.sql import functions as F

from index_spark.operators.query import search
from index_spark.plans import checkpoint as cp
from tests.oracle import OracleIndex

SHARD = 32
CHUNK = 64


@pytest.fixture(scope="module")
def corpus_df(spark, tiny_corpus):
    return spark.createDataFrame(tiny_corpus)


def _index_fingerprint(spark, out_dir):
    df = cp.load_index(spark, out_dir)
    rows = df.select("term", "shard", "df", "cf",
                     F.md5(F.base64("doc_blob")).alias("h1"),
                     F.md5(F.base64("tf_blob")).alias("h2")).collect()
    return sorted(tuple(r) for r in rows)


def test_crash_resume_identical(spark, corpus_df, tmp_path_factory):
    d_full = str(tmp_path_factory.mktemp("full"))
    d_resume = str(tmp_path_factory.mktemp("resume"))

    rep = cp.build_chunked(spark, corpus_df, d_full,
                           docs_per_chunk=CHUNK, shard_size=SHARD)
    assert rep["n_docs"] == 150 and len(rep["built"]) == rep["n_chunks"] >= 2

    # crash after the first chunk...
    with pytest.raises(RuntimeError, match="simulated crash"):
        cp.build_chunked(spark, corpus_df, d_resume, docs_per_chunk=CHUNK,
                         shard_size=SHARD, fail_after_chunk=0)
    assert cp.chunk_is_committed(d_resume, 0)
    assert not cp.chunk_is_committed(d_resume, 1)

    # ...restart: chunk 0 skipped, remainder built
    rep2 = cp.build_chunked(spark, corpus_df, d_resume,
                            docs_per_chunk=CHUNK, shard_size=SHARD)
    assert rep2["skipped"] == [0]
    assert _index_fingerprint(spark, d_resume) == _index_fingerprint(spark, d_full)


def test_lineage_metrics(spark, corpus_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("lin"))
    cp.build_chunked(spark, corpus_df, d, docs_per_chunk=CHUNK, shard_size=SHARD)
    lin = cp.lineage(d)
    assert [m["chunk_id"] for m in lin] == list(range(len(lin)))
    for m in lin:
        assert m["n_postings"] > 0 and m["blob_bytes"] > 0
        assert m["stages"]["build_write_s"] >= 0
    stats = cp.load_stats(d)
    assert stats["n_docs"] == sum(m["n_docs"] for m in lin) == 150
    assert stats["n_postings"] == sum(m["n_postings"] for m in lin)


def test_chunked_query_matches_oracle(spark, corpus_df, tiny_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("q"))
    cp.build_chunked(spark, corpus_df, d, docs_per_chunk=CHUNK, shard_size=SHARD)
    index = cp.load_index(spark, d).persist()
    stats = cp.load_stats(d)
    oracle = OracleIndex(
        list(tiny_corpus[["repo", "path", "content"]].itertuples(index=False)))
    for q in ["import numpy", "returning connections", "def class"]:
        got = search(index, None, stats, q, k=10).collect()
        exp = oracle.search(q, k=10)
        assert [r["doc_id"] for r in got] == [d_ for d_, _ in exp], q
        for r, (_, es) in zip(got, exp):
            assert r["score"] == pytest.approx(es, abs=1e-9)
