"""Trigram gram-posting artifact (plans/trigram.py): bounds fuzzy/spell
candidate generation so ``levenshtein`` never scans the whole dictionary.

The load-bearing property: the trigram path computes EXACTLY the same
edit-distance neighborhood as the full catalog scan — the q-gram count
filter is a necessary condition, and the final ``levenshtein`` verify is
exact — so every consumer is value-identical to the dictionary path.
"""

import random

import pytest
from pyspark.sql import functions as F

from index_spark.operators.build import build_index
from index_spark.operators.query import (
    fuzzy_expand,
    search_fuzzy,
    suggest_corrections,
)
from index_spark.plans.checkpoint import build_chunked, compact_index
from index_spark.plans.dictionary import dictionary_from_index
from index_spark.plans.trigram import (
    QGRAM_N,
    count_filter_bound,
    load_trigram_postings,
    qgrams,
    trigram_postings,
)

SHARD = 64


@pytest.fixture(scope="module")
def built(spark, tiny_corpus):
    docs, index, stats = build_index(
        spark.createDataFrame(tiny_corpus), stem=True, shard_size=SHARD)
    index = index.persist()
    index.count()
    return docs.persist(), index, stats


@pytest.fixture(scope="module")
def catalog(built):
    _, index, _ = built
    d = dictionary_from_index(index).persist()
    d.count()
    return d


@pytest.fixture(scope="module")
def trgm(catalog):
    t = trigram_postings(catalog).persist()
    t.count()
    return t


def test_qgrams_bag():
    # padded gram count is len(term) + QGRAM_N - 1
    for t in ["a", "ab", "data", "aaaa"]:
        assert len(qgrams(t)) == len(t) + QGRAM_N - 1
    # repeated grams get occurrence indexes (bag semantics)
    gs = qgrams("aaaa")  # ##aaaa## -> ##a #aa aaa aaa aa# a##
    assert gs.count(("aaa", 0)) == 1 and gs.count(("aaa", 1)) == 1
    # deterministic order, pads present
    assert gs[0] == ("##a", 0) and gs[-1] == ("a##", 0)


def test_count_filter_is_necessary():
    """Empirical necessity of the bound: one random edit never drops the
    bag intersection below count_filter_bound (the candidate filter can
    only over-generate, never lose a true neighbor)."""
    rng = random.Random(42)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    for _ in range(300):
        n = rng.randint(2, 12)
        s = "".join(rng.choice(alpha) for _ in range(n))
        op = rng.choice(["sub", "ins", "del"])
        i = rng.randrange(len(s))
        if op == "sub":
            t = s[:i] + rng.choice(alpha) + s[i + 1:]
        elif op == "ins":
            t = s[:i] + rng.choice(alpha) + s[i:]
        else:
            t = s[:i] + s[i + 1:]
        if not t:
            continue
        bag_s = {}
        for g, _ in qgrams(s):
            bag_s[g] = bag_s.get(g, 0) + 1
        common = 0
        for g, occ in qgrams(t):
            if bag_s.get(g, 0) > occ:
                common += 1
        assert common >= count_filter_bound(len(s), len(t), 1), (s, t)


def test_trigram_postings_shape(catalog, trgm):
    # every term contributes exactly length + 2 gram rows
    per_term = trgm.groupBy("term").agg(
        F.count("*").alias("n"), F.first("length").alias("length"))
    assert per_term.filter(
        F.col("n") != F.col("length") + QGRAM_N - 1).count() == 0
    # df carried through unchanged
    d = {r["term"]: r["df"] for r in catalog.collect()}
    for r in trgm.select("term", "df").distinct().collect():
        assert d[r["term"]] == r["df"]


def test_fuzzy_expand_trgm_identity(built, catalog, trgm):
    """The gram-bounded expansion equals the full catalog scan for
    typo'd, exact, repeated-gram, and absent query terms (index=None:
    neither path may touch the sharded index)."""
    for terms in [["dat", "tabl", "query"], ["aa", "filtr"],
                  ["zzzzqqq"], ["import", "retur"]]:
        via_dict = fuzzy_expand(None, terms, max_dist=1, max_expansions=8,
                                dictionary=catalog)
        via_trgm = fuzzy_expand(None, terms, max_dist=1, max_expansions=8,
                                trigram=trgm)
        assert via_trgm == via_dict, terms


def test_fuzzy_expand_trgm_dist2(catalog, trgm):
    via_dict = fuzzy_expand(None, ["datx", "quer"], max_dist=2,
                            max_expansions=5, dictionary=catalog)
    via_trgm = fuzzy_expand(None, ["datx", "quer"], max_dist=2,
                            max_expansions=5, trigram=trgm)
    assert via_trgm == via_dict


def test_search_fuzzy_and_suggest_via_trigram(built, catalog, trgm):
    docs, index, stats = built
    a = search_fuzzy(index, docs, stats, "dat tabl query", k=10,
                     shard_size=SHARD, dictionary=catalog).collect()
    b = search_fuzzy(index, docs, stats, "dat tabl query", k=10,
                     shard_size=SHARD, dictionary=catalog,
                     trigram=trgm).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == \
           [(r["doc_id"], r["score"]) for r in b]
    sa = suggest_corrections(None, "dat tabel query", dictionary=catalog)
    sb = suggest_corrections(None, "dat tabel query", dictionary=catalog,
                             trigram=trgm)
    assert sorted(map(tuple, sa.collect())) == \
           sorted(map(tuple, sb.collect()))


def test_compaction_publishes_trigram(spark, tiny_corpus, tmp_path_factory,
                                      catalog):
    out = str(tmp_path_factory.mktemp("trgmstore") / "store")
    ordered = tiny_corpus.sort_values(["repo", "path"]).reset_index(drop=True)
    build_chunked(spark, spark.createDataFrame(ordered), out,
                  docs_per_chunk=64, shard_size=SHARD)
    m = compact_index(spark, out, segment_bytes=512, trigram=True)
    assert m.get("trigram") is True
    t = load_trigram_postings(spark, out)
    # artifact equals the in-memory derivation
    mem = {(r["gram"], r["occ"], r["term"]) for r in
           trigram_postings(catalog).collect()}
    got = {(r["gram"], r["occ"], r["term"]) for r in t.collect()}
    assert got == mem
    # sorted by gram at rest: every parquet file covers an ascending
    # gram run (tight min/max -> the IN-list probe prunes row groups)
    part = (t.withColumn("_f", F.input_file_name())
            .select("_f", "gram").toPandas())
    for _, g in part.groupby("_f"):
        vals = g["gram"].tolist()
        assert vals == sorted(vals)
    # idempotent re-compaction keeps the artifact
    m2 = compact_index(spark, out, segment_bytes=512, trigram=True)
    assert m2["skipped"] is True
    load_trigram_postings(spark, out)


def test_trigram_probe_plan_pushes_gram_filter(spark, tmp_path_factory,
                                               catalog):
    """The query-side probe pushes a literal In(gram, ...) to the
    parquet scan of the artifact — structural proof the fuzzy family
    reads the probed gram neighborhood, not the whole artifact."""
    out = str(tmp_path_factory.mktemp("trgmplan"))
    from index_spark.plans.trigram import write_trigram_postings

    write_trigram_postings(trigram_postings(catalog), out)
    t = load_trigram_postings(spark, out)
    grams = [g for g, _ in qgrams("dat")]
    plan = (t.filter(F.col("gram").isin(grams))
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters" in plan and "In(gram" in plan
