"""Deletes: logical tombstones at query time + physical vacuum.

The vacuum oracle keeps ORIGINAL doc ids (vacuum never renumbers) and
recomputes df/N/avgdl over the surviving docs — exactly what
``stats_from_index`` on the vacuumed index must report.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from index_spark.functions import varbyte as vb
from index_spark.functions.text import tokenize
from index_spark.operators.build import (
    DOC_MARKER,
    build_index,
    stats_from_index,
)
from index_spark.operators.maintenance import vacuum_index
from index_spark.operators.query import search
from tests.oracle import OracleIndex

SHARD_SIZE = 64
BANNED = [2, 3, 5, 8, 13, 21, 34, 55, 89, 144]  # spans several shards


@pytest.fixture(scope="module")
def built(spark, tiny_corpus):
    corpus_df = spark.createDataFrame(tiny_corpus)
    docs, index, stats = build_index(corpus_df, stem=True,
                                     shard_size=SHARD_SIZE, positions=True)
    docs, index = docs.persist(), index.persist()
    docs.count(), index.count()
    oracle = OracleIndex(
        list(tiny_corpus[["repo", "path", "content"]].itertuples(index=False)),
        stem=True)
    return docs, index, stats, oracle


def oracle_minus(oracle: OracleIndex, banned: set[int], query: str,
                 refresh_stats: bool, k: int = 10):
    """BM25 over surviving docs. refresh_stats=False models tombstones
    (original N/avgdl/df), True models vacuum (recomputed)."""
    alive = [d for d in range(oracle.n_docs) if d not in banned]
    if refresh_stats:
        n = len(alive)
        avgdl = sum(oracle.doc_len[d] for d in alive) / n
        dfs = {t: sum(1 for d in p if d not in banned)
               for t, p in oracle.tf.items()}
    else:
        n, avgdl = oracle.n_docs, oracle.avgdl
        dfs = {t: len(p) for t, p in oracle.tf.items()}
    qterms = sorted(set(tokenize(query, stem=oracle.stem)))
    scores = {}
    for t in qterms:
        postings = oracle.tf.get(t)
        if not postings or dfs[t] == 0:
            continue
        idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
        for d, tf in postings.items():
            if d in banned:
                continue
            dl = oracle.doc_len[d]
            scores[d] = scores.get(d, 0.0) + idf * tf / (
                tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


QUERIES = ["import return", "def class", "uniq7token", "query score rank",
           "hash map tree"]


def test_tombstone_search(spark, built):
    docs, index, stats, oracle = built
    tomb = spark.createDataFrame([(d,) for d in BANNED], "doc_id long")
    for q in QUERIES:
        expected = oracle_minus(oracle, set(BANNED), q, refresh_stats=False)
        got = search(index, docs, stats, q, k=10, shard_size=SHARD_SIZE,
                     tombstones=tomb).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in expected], q
        for r, (ed, es) in zip(got, expected):
            assert r["score"] == pytest.approx(es, abs=1e-9), (q, ed)
        assert not set(BANNED) & {r["doc_id"] for r in got}


def test_tombstone_with_and_mode(spark, built):
    docs, index, stats, oracle = built
    tomb = spark.createDataFrame([(d,) for d in BANNED], "doc_id long")
    base = search(index, docs, stats, "import return", k=1000,
                  mode="and").collect()
    got = search(index, docs, stats, "import return", k=1000, mode="and",
                 shard_size=SHARD_SIZE, tombstones=tomb).collect()
    exp = [(r["doc_id"], r["score"]) for r in base
           if r["doc_id"] not in set(BANNED)]
    assert [(r["doc_id"], r["score"]) for r in got] == exp


@pytest.fixture(scope="module")
def vacuumed(spark, built):
    _, index, _, _ = built
    tomb = spark.createDataFrame([(d,) for d in BANNED], "doc_id long")
    v = vacuum_index(index, tomb, shard_size=SHARD_SIZE).persist()
    v.count()
    return v


def test_vacuum_stats_refresh(built, vacuumed):
    _, _, _, oracle = built
    stats = stats_from_index(vacuumed)
    alive = [d for d in range(oracle.n_docs) if d not in set(BANNED)]
    assert stats["n_docs"] == len(alive)
    exp_avgdl = sum(oracle.doc_len[d] for d in alive) / len(alive)
    assert stats["avgdl"] == pytest.approx(exp_avgdl, rel=1e-12)


def test_vacuum_df_cf(built, vacuumed):
    _, _, _, oracle = built
    rows = (vacuumed.filter(F.col("term") != DOC_MARKER)
            .groupBy("term").agg(F.sum("df").alias("df"),
                                 F.sum("cf").alias("cf")).collect())
    got = {r["term"]: (r["df"], r["cf"]) for r in rows}
    banned = set(BANNED)
    for term, p in oracle.tf.items():
        df = sum(1 for d in p if d not in banned)
        cf = sum(tf for d, tf in p.items() if d not in banned)
        if df == 0:
            assert term not in got, term
        else:
            assert got[term] == (df, cf), term


@pytest.mark.parametrize("use_wand", [False, True], ids=["exh", "wand"])
def test_vacuum_search_rank_identity(built, vacuumed, use_wand):
    """Post-vacuum search (refreshed stats) matches the recomputed-stats
    oracle — blocks/skips rebuilt by the vacuum stay WAND-correct."""
    docs, _, _, oracle = built
    stats = stats_from_index(vacuumed)
    for q in QUERIES:
        expected = oracle_minus(oracle, set(BANNED), q, refresh_stats=True)
        got = search(vacuumed, docs, stats, q, k=10, use_wand=use_wand,
                     shard_size=SHARD_SIZE).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in expected], q
        for r, (ed, es) in zip(got, expected):
            assert r["score"] == pytest.approx(es, abs=1e-9), (q, ed)


def test_vacuum_positions_survive(built, vacuumed):
    """Surviving postings' position runs are byte-identical (per-posting
    delta reset makes the vacuum a pure byte gather)."""
    _, index, _, _ = built
    banned = np.array(sorted(BANNED), np.int64)
    orig = {(r["term"], r["shard"]): r
            for r in index.filter(F.col("term") != DOC_MARKER).collect()}
    vac = {(r["term"], r["shard"]): r
           for r in vacuumed.filter(F.col("term") != DOC_MARKER).collect()}
    checked = 0
    for key, o in orig.items():
        if key not in vac or not len(o["pos_blob"]):
            continue
        docs = np.cumsum(vb.decode(bytes(o["doc_blob"])).astype(np.int64))
        tfs = vb.decode(bytes(o["tf_blob"])).astype(np.int64)
        keep = ~np.isin(docs, banned)
        if keep.all():
            continue
        v = vac[key]
        vals = vb.decode(bytes(o["pos_blob"]))
        lens = vb.encoded_lengths(vals.astype(np.uint64))
        b_cum = np.concatenate(([0], np.cumsum(lens)))
        v_cum = np.concatenate(([0], np.cumsum(tfs)))
        buf = np.frombuffer(bytes(o["pos_blob"]), np.uint8)
        exp = b"".join(
            buf[b_cum[v_cum[i]]: b_cum[v_cum[i + 1]]].tobytes()
            for i in np.flatnonzero(keep))
        assert bytes(v["pos_blob"]) == exp, key
        checked += 1
    assert checked > 0  # the banned set must actually exercise the path


def test_phrase_proximity_tombstones(spark, built):
    """Query-time tombstones on phrase/proximity == base results minus
    banned docs (masked BEFORE the local top-k, so k stays filled)."""
    from index_spark.operators.phrase import phrase_search, proximity_search

    _, index, stats, _ = built
    tomb = spark.createDataFrame([(d,) for d in BANNED], "doc_id long")
    base = phrase_search(index, stats, "import return", k=1000).collect()
    got = phrase_search(index, stats, "import return", k=1000,
                        tombstones=tomb, shard_size=SHARD_SIZE).collect()
    exp = [(r["doc_id"], r["n_matches"]) for r in base
           if r["doc_id"] not in set(BANNED)]
    assert [(r["doc_id"], r["n_matches"]) for r in got] == exp

    pbase = proximity_search(index, stats, "import", "return",
                             window=8, k=1000).collect()
    pgot = proximity_search(index, stats, "import", "return", window=8,
                            k=1000, tombstones=tomb,
                            shard_size=SHARD_SIZE).collect()
    pexp = [(r["doc_id"], r["n_matches"]) for r in pbase
            if r["doc_id"] not in set(BANNED)]
    assert [(r["doc_id"], r["n_matches"]) for r in pgot] == pexp


def test_vacuum_phrase_still_works(spark, built, vacuumed):
    from index_spark.operators.phrase import phrase_search

    stats = stats_from_index(vacuumed)
    rows = phrase_search(vacuumed, stats, "import return", k=10).collect()
    assert not set(BANNED) & {r["doc_id"] for r in rows}


def test_vacuum_noop_for_absent_ids(spark, built):
    _, index, _, _ = built
    tomb = spark.createDataFrame([(10 ** 9 + i,) for i in range(3)],
                                 "doc_id long")
    v = vacuum_index(index, tomb, shard_size=SHARD_SIZE)
    a = {(r["term"], r["shard"], r["df"], bytes(r["doc_blob"]))
         for r in index.collect()}
    b = {(r["term"], r["shard"], r["df"], bytes(r["doc_blob"]))
         for r in v.collect()}
    assert a == b


def test_vacuum_zoned_index(spark):
    """Vacuum preserves the zone column and per-zone stats refresh."""
    from index_spark.operators.build import build_zoned_index

    rows = [("r", f"{i:04d}", f"data table doc{i} term{i}", f"title{i} data")
            for i in range(12)]
    df = spark.createDataFrame(rows, ["repo", "path", "content", "ztext"])
    _, index, stats = build_zoned_index(
        df, [("body", "content"), ("title", "ztext")],
        stem=False, shard_size=4)
    index = index.persist()
    banned = [1, 5, 9]
    tomb = spark.createDataFrame([(d,) for d in banned], "doc_id long")
    v = vacuum_index(index, tomb, shard_size=4).persist()
    assert "zone" in v.columns
    for z in ("body", "title"):
        zstats = stats_from_index(v, zone=z)
        assert zstats["n_docs"] == 12 - len(banned), z
    # the per-doc unique terms of banned docs are gone
    terms = {r["term"] for r in v.select("term").distinct().collect()}
    for d in banned:
        assert f"doc{d}" not in terms and f"term{d}" not in terms
    # surviving docs intact in both zones
    body = {r["term"] for r in v.filter(
        (F.col("zone") == "body") & (F.col("term") == "doc0")).collect()}
    assert body == {"doc0"}
    v.unpersist()
    index.unpersist()


def test_vacuum_rejects_merged_index(built):
    from index_spark.operators.merge import merge_shards

    _, index, _, _ = built
    merged = merge_shards(index)
    with pytest.raises(ValueError, match="sharded"):
        vacuum_index(merged, index.sparkSession.createDataFrame(
            [(1,)], "doc_id long"))
