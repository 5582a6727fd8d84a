"""Store concatenation (plans/concat.py): appending a source store onto
a destination remaps one varbyte per blob, and the result is
indistinguishable — to fsck, BM25, and phrase search — from a single
store built over the union corpus."""

import os

import pytest
from pyspark.sql import functions as F

from index_spark.plans.checkpoint import (
    build_chunked,
    compact_index,
    load_docs,
    load_index,
    load_merged_index,
    load_stats,
    lineage,
)
from index_spark.plans.concat import concat_stores, shift_index
from index_spark.plans.fsck import verify_store

SHARD = 64


def _build(spark, pdf, out, **kw):
    build_chunked(spark, spark.createDataFrame(pdf), out,
                  docs_per_chunk=64, shard_size=SHARD, **kw)
    return out


@pytest.fixture()
def stores(spark, tiny_corpus, tmp_path):
    ordered = tiny_corpus.sort_values(["repo", "path"]).reset_index(drop=True)
    a = _build(spark, ordered.iloc[:100], str(tmp_path / "a"))
    b = _build(spark, ordered.iloc[100:], str(tmp_path / "b"))
    u = _build(spark, ordered, str(tmp_path / "u"))
    return a, b, u


def _ranking(spark, store, query, merged=False):
    """Full (path, score) ranking — path-keyed so doc-id spaces that
    differ between stores compare equal."""
    from index_spark.operators.query import search

    index = (load_merged_index(spark, store) if merged
             else load_index(spark, store))
    stats = load_stats(store)
    topk = search(index, None, stats, query, k=10**6, shard_size=SHARD)
    rows = (topk.join(load_docs(spark, store), "doc_id")
            .select("path", F.round("score", 8).alias("s")).collect())
    return sorted((r["path"], r["s"]) for r in rows)


def test_concat_matches_union_build(spark, stores):
    a, b, u = stores
    res = concat_stores(spark, a, b)
    assert res["chunks_appended"] == lineage(b)[-1]["chunk_id"] + 1
    assert res["doc_offset"] % SHARD == 0
    # the junction honors the shard-aligned contiguity contract and every
    # blob invariant — the integrity walk is the strongest single check
    rep = verify_store(spark, a)
    assert rep["ok"], rep["errors"]
    # doc spaces are disjoint: destination ids all below the offset
    ids = load_docs(spark, a).agg(
        F.sum(F.when(F.col("doc_id") < res["doc_offset"], 1)
              .otherwise(0)).alias("n_lo"),
        F.sum(F.when(F.col("doc_id") >= res["doc_offset"], 1)
              .otherwise(0)).alias("n_hi")).collect()[0]
    assert ids["n_lo"] == 100
    assert ids["n_hi"] == sum(m["n_docs"] for m in lineage(b))
    # stats now cover the union corpus
    assert load_stats(a)["n_docs"] == load_stats(u)["n_docs"]
    assert load_stats(a)["avgdl"] == pytest.approx(load_stats(u)["avgdl"])
    # full BM25 ranking is path-for-path identical to the union build
    assert _ranking(spark, a, "import numpy table") == \
        _ranking(spark, u, "import numpy table")


def test_concat_then_compact_folds(spark, stores):
    a, b, u = stores
    compact_index(spark, a, segment_bytes=512)
    concat_stores(spark, a, b)
    rep = verify_store(spark, a)
    assert not rep["ok"]  # merged form is stale until recompacted
    assert rep["checks"]["merged_covers_committed_chunks"] is False
    compact_index(spark, a, segment_bytes=512)
    rep = verify_store(spark, a)
    assert rep["ok"], rep["errors"]
    assert _ranking(spark, a, "return value", merged=True) == \
        _ranking(spark, u, "return value")


def test_concat_positions_phrase_parity(spark, tiny_corpus, tmp_path):
    from index_spark.operators.phrase import phrase_search

    ordered = tiny_corpus.sort_values(["repo", "path"]).reset_index(drop=True)
    a = _build(spark, ordered.iloc[:100], str(tmp_path / "pa"),
               positions=True)
    b = _build(spark, ordered.iloc[100:], str(tmp_path / "pb"),
               positions=True)
    u = _build(spark, ordered, str(tmp_path / "pu"), positions=True)
    concat_stores(spark, a, b)

    def rank(store):
        hits = phrase_search(load_index(spark, store), load_stats(store),
                             "split term", k=10**6, shard_size=SHARD)
        rows = (hits.join(load_docs(spark, store), "doc_id")
                .select("path", "n_matches").collect())
        return sorted((r["path"], r["n_matches"]) for r in rows)

    assert rank(a) == rank(u)
    assert len(rank(a)) > 0


def test_settings_mismatch_raises(spark, tiny_corpus, tmp_path):
    ordered = tiny_corpus.sort_values(["repo", "path"]).reset_index(drop=True)
    a = _build(spark, ordered.iloc[:100], str(tmp_path / "sa"))
    b = _build(spark, ordered.iloc[100:], str(tmp_path / "sb"), stem=False)
    with pytest.raises(ValueError, match="stem"):
        concat_stores(spark, a, b)


def test_shift_index_requires_alignment(spark, stores):
    a, _, _ = stores
    with pytest.raises(ValueError, match="multiple"):
        shift_index(load_index(spark, a), SHARD + 1, SHARD)


def test_concat_into_empty_raises(spark, stores, tmp_path):
    _, b, _ = stores
    with pytest.raises(ValueError, match="no committed chunks"):
        concat_stores(spark, str(tmp_path / "empty"), b)
