"""Upsert (Iceberg-style MERGE) over the chunk store: replaced keys'
old ids land in the tombstone log, replacement + new rows become one
fresh chunk, queries over index+tombstones see exactly the new truth,
and vacuum physically reclaims the replaced versions."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from index_spark.operators.build import stats_from_index
from index_spark.operators.maintenance import (
    delete_docs,
    load_tombstones,
    upsert_docs,
    vacuum_index,
)
from index_spark.operators.query import search
from index_spark.plans.checkpoint import build_chunked, load_docs, load_index

SHARD = 64


@pytest.fixture(scope="module")
def store(spark, tiny_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("upsert") / "store")
    ordered = tiny_corpus.sort_values(["repo", "path"]).reset_index(drop=True)
    build_chunked(spark, spark.createDataFrame(ordered), out,
                  docs_per_chunk=64, shard_size=SHARD)

    # replace two existing keys (new content with a unique v2 marker,
    # v1 body dropped) and add one brand-new doc
    k0 = ordered.iloc[0]
    k1 = ordered.iloc[10]
    batch = pd.DataFrame([
        {"repo": k0.repo, "path": k0.path,
         "content": "uniqv2zero replacement body import"},
        {"repo": k1.repo, "path": k1.path,
         "content": "uniqv2ten other replacement import"},
        {"repo": "newrepo", "path": "brand/new.py",
         "content": "uniqbrandnew fresh document import"},
    ])
    m = upsert_docs(spark, out, spark.createDataFrame(batch),
                    shard_size=SHARD)
    return out, ordered, m


def test_upsert_manifest(spark, store):
    out, ordered, m = store
    assert m["n_docs"] == 3
    assert m["n_replaced"] == 2
    tomb = load_tombstones(spark, out)
    assert tomb.count() == 2


def test_replaced_version_invisible_new_visible(spark, store):
    out, ordered, _ = store
    index = load_index(spark, out).persist()
    stats = stats_from_index(index)
    tomb = load_tombstones(spark, out)
    docs = load_docs(spark, out)

    # a v2-only marker finds exactly the replacement doc
    hits = search(index, None, stats, "uniqv2zero", k=10,
                  shard_size=SHARD, tombstones=tomb).collect()
    assert len(hits) == 1
    row = docs.filter(F.col("doc_id") == hits[0]["doc_id"]).collect()[0]
    assert (row["repo"], row["path"]) == (ordered.iloc[0].repo,
                                          ordered.iloc[0].path)

    # the old version's exclusive vocabulary no longer matches its key:
    # every hit for a v1 token must NOT be a tombstoned id
    dead = {r["doc_id"] for r in tomb.collect()}
    v1_tok = [t for t in ordered.iloc[0].content.split() if t.isalpha()]
    if v1_tok:
        got = search(index, None, stats, v1_tok[0], k=1000,
                     shard_size=SHARD, tombstones=tomb).collect()
        assert all(r["doc_id"] not in dead for r in got)

    # the brand-new doc is searchable
    assert len(search(index, None, stats, "uniqbrandnew", k=10,
                      shard_size=SHARD, tombstones=tomb).collect()) == 1
    index.unpersist()


def test_repeated_upsert_composes(spark, store):
    out, ordered, _ = store
    k0 = ordered.iloc[0]
    batch = pd.DataFrame([{"repo": k0.repo, "path": k0.path,
                           "content": "uniqv3zero third version import"}])
    m2 = upsert_docs(spark, out, spark.createDataFrame(batch),
                     shard_size=SHARD)
    # v2's id (live until now) joins the log; v1's id was already there
    assert m2["n_replaced"] >= 1
    index = load_index(spark, out)
    stats = stats_from_index(index)
    tomb = load_tombstones(spark, out)
    assert search(index, None, stats, "uniqv2zero", k=10,
                  shard_size=SHARD, tombstones=tomb).collect() == []
    assert len(search(index, None, stats, "uniqv3zero", k=10,
                      shard_size=SHARD, tombstones=tomb).collect()) == 1


def test_vacuum_reclaims_replaced(spark, store):
    out, ordered, _ = store
    index = load_index(spark, out)
    tomb = load_tombstones(spark, out)
    v = vacuum_index(index, tomb, shard_size=SHARD).persist()
    vstats = stats_from_index(v)
    live = load_docs(spark, out).join(tomb, "doc_id", "left_anti")
    assert vstats["n_docs"] == live.count()
    # vacuumed index needs no tombstones to hide old versions
    assert search(v, None, vstats, "uniqv2zero", k=10,
                  shard_size=SHARD).collect() == []
    v.unpersist()


def test_delete_docs_log_idempotent_read(spark, store):
    out, _, _ = store
    n0 = load_tombstones(spark, out).count()
    ids = spark.createDataFrame([(0,)], "doc_id long")
    delete_docs(spark, out, ids, tag="extra")
    delete_docs(spark, out, ids, tag="extra2")
    assert load_tombstones(spark, out).count() <= n0 + 1
