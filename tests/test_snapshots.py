"""Iceberg-style snapshot reads / time travel over the chunk-manifest
store: each committed chunk's _COMMIT.json is a snapshot; a reader
``as_of`` snapshot K opens only chunks 0..K and scores with that
snapshot's own stats."""

import pytest
from pyspark.sql import functions as F

from index_spark.operators.build import DOC_MARKER, build_index
from index_spark.operators.query import search
from index_spark.plans import checkpoint as cp


@pytest.fixture(scope="module")
def store(spark, tiny_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("snapstore"))
    corpus = spark.createDataFrame(tiny_corpus)
    cp.build_chunked(spark, corpus, out, docs_per_chunk=64, shard_size=64)
    return out, corpus


def test_snapshot_log_cumulative(store):
    out, _ = store
    snaps = cp.snapshots(out)
    assert [s["snapshot_id"] for s in snaps] == [0, 1, 2]  # 150 docs / 64
    # cumulative totals are nondecreasing and end at the store totals
    assert all(a["n_docs"] < b["n_docs"] for a, b in zip(snaps, snaps[1:]))
    assert all(a["committed_at"] <= b["committed_at"]
               for a, b in zip(snaps, snaps[1:]))
    assert snaps[-1]["n_docs"] == cp.load_stats(out)["n_docs"] == 150


def test_as_of_reads_prefix_only(spark, store):
    out, _ = store
    for k in (0, 1):
        idx = cp.load_index(spark, out, as_of=k)
        n = (idx.filter(F.col("term") == DOC_MARKER)
                .agg(F.sum("df")).collect()[0][0])
        assert n == cp.snapshots(out)[k]["n_docs"] == 64 * (k + 1)
        docs = cp.load_docs(spark, out, as_of=k)
        assert docs.agg(F.max("doc_id")).collect()[0][0] == 64 * (k + 1) - 1


def test_stats_as_of_matches_snapshot(store):
    out, _ = store
    snaps = cp.snapshots(out)
    st0 = cp.stats_as_of(out, 0)
    assert st0["n_docs"] == snaps[0]["n_docs"]
    assert st0["avgdl"] == snaps[0]["n_tokens"] / snaps[0]["n_docs"]
    # the full-store snapshot reproduces the at-rest stats.json
    full = cp.stats_as_of(out, snaps[-1]["snapshot_id"])
    at_rest = cp.load_stats(out)
    assert {k: full[k] for k in at_rest} == at_rest


def test_time_travel_search_identical_to_prefix_build(spark, store):
    # querying AS OF snapshot 0 is indistinguishable from an index that
    # was only ever built on the first 64 docs (scores included — the
    # snapshot stats pin idf/avgdl)
    out, corpus = store
    idx0 = cp.load_index(spark, out, as_of=0)
    got = search(idx0, None, cp.stats_as_of(out, 0), "import return",
                 k=10, shard_size=64).collect()
    prefix = corpus.orderBy("repo", "path").limit(64)
    _, pidx, pstats = build_index(prefix, shard_size=64)
    want = search(pidx, None, pstats, "import return",
                  k=10, shard_size=64).collect()
    assert [(r.doc_id, round(r.score, 9)) for r in got] == \
           [(r.doc_id, round(r.score, 9)) for r in want]
    assert got  # non-trivial query


def test_uncommitted_snapshot_rejected(spark, store):
    out, _ = store
    with pytest.raises(ValueError, match="not committed"):
        cp.load_index(spark, out, as_of=99)
    with pytest.raises(ValueError, match="not committed"):
        cp.stats_as_of(out, 99)


def test_crash_resume_extends_snapshot_log(spark, tiny_corpus, tmp_path):
    out = str(tmp_path / "resume_store")
    corpus = spark.createDataFrame(tiny_corpus)
    with pytest.raises(RuntimeError, match="simulated crash"):
        cp.build_chunked(spark, corpus, out, docs_per_chunk=64,
                         shard_size=64, fail_after_chunk=0)
    assert [s["snapshot_id"] for s in cp.snapshots(out)] == [0]
    snap0 = cp.snapshots(out)[0]
    cp.build_chunked(spark, corpus, out, docs_per_chunk=64, shard_size=64)
    snaps = cp.snapshots(out)
    assert [s["snapshot_id"] for s in snaps] == [0, 1, 2]
    # resuming appended snapshots; it did not rewrite snapshot 0
    assert snaps[0] == snap0
