"""Snapshot retention (expire_snapshots): chunk index data already
folded into the merged form can be deleted; the store keeps serving,
appending, and folding — only reads that need the deleted data fail,
loudly."""

import os

import pytest
from pyspark.sql import functions as F

from index_spark.plans.checkpoint import (
    build_chunked,
    compact_index,
    expire_snapshots,
    load_docs,
    load_index,
    load_merged_index,
    load_store_index,
    load_stats,
    lineage,
)
from index_spark.plans.fsck import verify_store
from index_spark.streaming.ingest import ingest_batch

SHARD = 64


@pytest.fixture()
def store(spark, tiny_corpus, tmp_path):
    out = str(tmp_path / "store")
    ordered = tiny_corpus.sort_values(["repo", "path"]).reset_index(drop=True)
    build_chunked(spark, spark.createDataFrame(ordered), out,
                  docs_per_chunk=64, shard_size=SHARD)
    compact_index(spark, out, segment_bytes=512)
    return out


def _rank(spark, store, merged=True):
    from index_spark.operators.query import search

    idx = (load_merged_index(spark, store) if merged
           else load_index(spark, store))
    top = search(idx, None, load_stats(store), "import return value",
                 k=10**6, shard_size=SHARD)
    rows = (top.join(load_docs(spark, store), "doc_id")
            .select("path", F.round("score", 8).alias("s")).collect())
    return sorted((r["path"], r["s"]) for r in rows)


def test_expire_frees_data_keeps_serving(spark, store):
    before = _rank(spark, store)
    res = expire_snapshots(store, keep_last=1)
    n_chunks = len(lineage(store))
    assert res["expired"] == list(range(n_chunks - 1))
    assert res["index_bytes_freed"] > 0
    for cid in res["expired"]:
        assert not os.path.isdir(
            os.path.join(store, "chunks", f"{cid:05d}", "index"))
        assert os.path.isdir(
            os.path.join(store, "chunks", f"{cid:05d}", "docs"))
    # merged-form serving is untouched; stats survive via manifests
    assert _rank(spark, store) == before
    assert load_stats(store)["n_docs"] == 150
    rep = verify_store(spark, store)
    assert rep["ok"], rep["errors"]


def test_chunk_union_reads_fail_loudly(spark, store):
    expire_snapshots(store)
    with pytest.raises(ValueError, match="expired by retention"):
        load_index(spark, store)
    with pytest.raises(ValueError, match="expiry floor"):
        load_index(spark, store, as_of=0)
    # serving loader routes to the merged form instead
    assert load_store_index(spark, store).count() > 0


def test_expire_requires_current_merged(spark, store, tiny_corpus):
    extra = tiny_corpus.iloc[:20].copy()
    extra["path"] = extra["path"] + "_x"
    ingest_batch(spark, spark.createDataFrame(extra), store,
                 shard_size=SHARD)
    with pytest.raises(ValueError, match="compact_index before expiring"):
        expire_snapshots(store)


def test_append_and_fold_after_expiry(spark, store, tiny_corpus):
    expire_snapshots(store)
    extra = tiny_corpus.iloc[:20].copy()
    extra["path"] = extra["path"] + "_y"
    ingest_batch(spark, spark.createDataFrame(extra), store,
                 shard_size=SHARD)
    # stale merged + expired chunks: the serving loader refuses to
    # serve a stale snapshot silently
    with pytest.raises(ValueError, match="stale merged"):
        load_store_index(spark, store)
    res = compact_index(spark, store, segment_bytes=512)
    assert res["mode"] == "incremental"
    assert load_stats(store)["n_docs"] == 170
    # the folded merged form contains the appended docs
    after = _rank(spark, store)
    assert any(p.endswith("_y") for p, _ in after)
    rep = verify_store(spark, store)
    assert rep["ok"], rep["errors"]
    # a structural change cannot re-merge expired data
    with pytest.raises(ValueError, match="full re-merge"):
        compact_index(spark, store, segment_bytes=2048)


def test_expire_is_idempotent(spark, store):
    a = expire_snapshots(store, keep_last=1)
    b = expire_snapshots(store, keep_last=1)
    assert b["expired"] == [] and b["index_bytes_freed"] == 0
    assert a["retained"] == b["retained"]
