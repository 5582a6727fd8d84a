"""ServingReplica (operators/serving.py): the driver-resident
point-lookup serving path must reproduce the DataFrame engine's
results exactly, partition cleanly across shard ranges, and bound
memory under champion_m."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from index_spark.operators.build import build_index
from index_spark.operators.query import search
from index_spark.operators.serving import ServingReplica, merge_topk

QUERIES = ["data table query", "import numpy", "scan filter merge",
           "zzz_absent_term", "the", "data data DATA", ""]


@pytest.fixture(scope="module")
def built(spark, tiny_corpus):
    docs, index, stats = build_index(
        spark.createDataFrame(tiny_corpus), stem=True, shard_size=64)
    index = index.persist()
    index.count()
    return docs.persist(), index, stats


@pytest.fixture(scope="module")
def replica(built):
    _, index, stats = built
    return ServingReplica.from_index(index, stats)


def _engine(built, q, k=10):
    docs, index, stats = built
    return [(r.doc_id, r.score) for r in
            search(index, docs, stats, q, k=k, shard_size=64).collect()]


def test_rank_and_score_identity_with_engine(built, replica):
    for q in QUERIES:
        eng = _engine(built, q)
        rep = replica.search(q, k=10)
        assert [d for d, _ in rep] == [d for d, _ in eng], q
        assert np.allclose([s for _, s in rep], [s for _, s in eng],
                           rtol=0, atol=1e-12), q


def test_deep_k_and_batch(built, replica):
    eng = _engine(built, "data table", k=50)
    rep = replica.search("data table", k=50)
    assert [d for d, _ in rep] == [d for d, _ in eng]
    out = replica.search_batch({0: "data table", 1: "zzz_absent"}, k=5)
    assert len(out[0]) == 5 and out[1] == []


def test_shard_partition_and_router_merge(built):
    """Two half-range replicas + merge_topk == the full engine — the
    fleet topology (each node loads one shard range; router merges
    k-row responses)."""
    docs, index, stats = built
    n_shards = index.select("shard").distinct().count()
    assert n_shards >= 2
    mid = n_shards // 2
    lo = ServingReplica.from_index(index, stats, shard_range=(0, mid - 1))
    hi = ServingReplica.from_index(index, stats,
                                   shard_range=(mid, n_shards - 1))
    for q in ["data table query", "import numpy"]:
        merged = merge_topk([lo.search(q, k=10), hi.search(q, k=10)],
                            k=10)
        assert [(d, round(s, 9)) for d, s in merged] == \
            [(d, round(s, 9)) for d, s in _engine(built, q)]


def test_champion_mode_bounds_memory_and_is_exact_at_full_m(built, replica):
    _, index, stats = built
    max_df = max(replica._dfs.values())
    full_m = ServingReplica.from_index(index, stats, champion_m=max_df)
    for q in ["data table query", "import numpy"]:
        assert full_m.search(q, k=10) == replica.search(q, k=10)
    small = ServingReplica.from_index(index, stats, champion_m=4)
    assert small.nbytes < replica.nbytes
    # approximate contract: every returned doc is a champion of at
    # least one query term, scores never exceed the exact ones
    exact = dict(replica.search("data table query", k=1000))
    for d, s in small.search("data table query", k=10):
        assert s <= exact[d] + 1e-12


def test_stats_guard(built):
    _, index, _ = built
    with pytest.raises(ValueError, match="n_docs"):
        ServingReplica.from_index(index, {"n_docs": 0, "avgdl": 0})


def test_and_mode_identity_with_engine(built, replica):
    for q in ["data table", "import numpy value", "data zzz_absent", "data"]:
        docs, index, stats = built
        eng = [(r.doc_id, r.score) for r in
               search(index, docs, stats, q, k=10, mode="and",
                      shard_size=64).collect()]
        rep = replica.search(q, k=10, mode="and")
        assert [d for d, _ in rep] == [d for d, _ in eng], q
        assert np.allclose([s for _, s in rep], [s for _, s in eng],
                           rtol=0, atol=1e-12), q
    with pytest.raises(ValueError, match="mode"):
        replica.search("x", mode="nope")


def test_phrase_identity_with_engine(spark, tiny_corpus):
    from index_spark.operators.phrase import phrase_search

    docs, index, stats = build_index(
        spark.createDataFrame(tiny_corpus), stem=True, positions=True,
        shard_size=64)
    index = index.persist()
    rep = ServingReplica.from_index(index, stats, positions=True)
    for ph in ["import numpy", "return the", "zzz missing", "import"]:
        eng = [(r.doc_id, r.n_matches) for r in
               phrase_search(index, stats, ph, k=10,
                             shard_size=64).collect()]
        assert rep.phrase(ph, k=10) == eng, ph
    with pytest.raises(ValueError, match="positions"):
        ServingReplica.from_index(index, stats).phrase("x")
    with pytest.raises(ValueError, match="champion"):
        ServingReplica.from_index(index, stats, positions=True,
                                  champion_m=4)


def test_snapshot_save_load_identity(replica, tmp_path):
    """save -> load round trip answers identically (the serving-node
    boot path: numpy/json only, no Spark)."""
    p = str(tmp_path / "replica_snapshot")
    meta = replica.save(p)
    assert meta["terms"] == len(replica._terms)
    loaded = ServingReplica.load(p)
    for q in ["data table query", "import numpy", "zzz"]:
        assert loaded.search(q, k=10) == replica.search(q, k=10), q
        assert loaded.search(q, k=10, mode="and") == \
            replica.search(q, k=10, mode="and"), q


def test_zoned_index_pins_one_zone(spark):
    """A zoned index must not silently merge zones into the replica:
    the load pins one validated zone (default body) and scores match a
    single-zone engine search over that zone."""
    from index_spark.operators.build import build_zoned_index

    docs = spark.createDataFrame(
        [("r", f"d{i}", f"body words common w{i}", f"title{i % 2} common")
         for i in range(8)],
        "repo string, path string, content string, head string")
    _, zidx, zstats = build_zoned_index(
        docs, [("body", "content"), ("title", "head")],
        stem=False, camel=False, shard_size=64)
    rep = ServingReplica.from_index(zidx, zstats["body"], stem=False,
                                    camel=False)          # default body
    eng = [(r.doc_id, r.score) for r in
           search(zidx, None, zstats["body"], "common", k=10,
                  stem=False, camel=False, shard_size=64).collect()]
    got = rep.search("common", k=10)
    assert [d for d, _ in got] == [d for d, _ in eng]
    assert np.allclose([s for _, s in got], [s for _, s in eng],
                       rtol=0, atol=1e-12)
    t = ServingReplica.from_index(zidx, zstats["title"], zone="title",
                                  stem=False, camel=False)
    assert t.search("title0", k=10)                      # title-only term
    with pytest.raises(Exception):
        ServingReplica.from_index(zidx, zstats["body"], zone="nope")
