"""Connected-component duplicate clustering + bigram-LM quality gate."""

import math
import random

import pytest
from pyspark.sql import functions as F

from index_spark.operators.dedup import (connected_components, dup_clusters,
                                         _large_star, _small_star)
from index_spark.operators.lm import bigram_lm_scores, doc_bigrams


# ------------------------------------------------------ connected components

def _pairs_df(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def test_cc_path_graph_needs_multiple_rounds(spark):
    # a 16-node path is the adversarial diameter case for min-label ops
    out = connected_components(_pairs_df(
        spark, [(i, i + 1) for i in range(1, 16)]))
    rows = out.collect()
    assert len(rows) == 16
    assert all(r.cluster == 1 for r in rows)


def test_cc_transitive_across_pair_families(spark):
    # A~B and B~C but never A~C: transitivity is the operator's point
    out = {r.node: r.cluster
           for r in connected_components(_pairs_df(
               spark, [(10, 20), (20, 30), (40, 50)])).collect()}
    assert out == {10: 10, 20: 10, 30: 10, 40: 40, 50: 40}


def test_cc_self_loops_and_duplicate_edges_ignored(spark):
    out = {r.node: r.cluster
           for r in connected_components(_pairs_df(
               spark, [(3, 3), (1, 2), (2, 1), (1, 2)])).collect()}
    assert out == {1: 1, 2: 1}


def test_cc_empty_pairs(spark):
    assert connected_components(
        _pairs_df(spark, []).where(F.lit(False))).count() == 0


def test_cc_random_graph_matches_union_find(spark):
    rng = random.Random(1234)
    n = 80
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(70)]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for x in range(n):
        comp.setdefault(find(x), []).append(x)
    in_pair = {x for a, b in edges if a != b for x in (a, b)}
    oracle = {x: min(comp[find(x)]) for x in in_pair}

    got = {r.node: r.cluster
           for r in connected_components(_pairs_df(spark, edges)).collect()}
    assert got == oracle


def test_cc_star_round_is_aggregate_join_plan(spark):
    # neighborhoods must never materialize as arrays: one star round is
    # aggregate + join-back, so the plan has no collect_list/collect_set
    e = _pairs_df(spark, [(2, 1), (3, 1)]).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    for step in (_large_star, _small_star):
        plan = step(e)._jdf.queryExecution().optimizedPlan().toString()
        assert "collect_list" not in plan and "collect_set" not in plan


def test_dup_clusters_fills_singletons(spark):
    docs = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    out = {r.doc_id: r.cluster
           for r in dup_clusters(docs, _pairs_df(spark, [(7, 3)])).collect()}
    assert out == {**{i: i for i in range(10)}, 7: 3}


# ------------------------------------------------------------- bigram LM

def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_doc_bigrams_adjacency(spark):
    docs = _docs_df(spark, ["a b c", "x", ""])
    got = sorted((r.doc_id, r.w1, r.w2) for r in doc_bigrams(docs).collect())
    assert got == [(0, "a", "b"), (0, "b", "c")]


def test_bigram_lm_hand_oracle(spark):
    # corpus: "a b a b" and "a c"; bigrams: ab, ba, ab, ac
    # c12: ab=2, ba=1, ac=1; c1: a=3, b=1; V=3 (a,b,c); alpha=1
    docs = _docs_df(spark, ["a b a b", "a c"])
    got = {r.doc_id: (r.n_bigrams, r.xent)
           for r in bigram_lm_scores(docs, alpha=1.0).collect()}
    p_ab = (2 + 1) / (3 + 3)
    p_ba = (1 + 1) / (1 + 3)
    p_ac = (1 + 1) / (3 + 3)
    x0 = -(math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3
    x1 = -math.log(p_ac)
    assert got[0] == (3, round(x0, 4))
    assert got[1] == (1, round(x1, 4))


def test_bigram_lm_short_docs_null(spark):
    docs = _docs_df(spark, ["a b", "solo", ""])
    got = {r.doc_id: (r.n_bigrams, r.xent)
           for r in bigram_lm_scores(docs).collect()}
    assert got[1] == (0, None)
    assert got[2] == (0, None)
    assert got[0][0] == 1


def test_bigram_lm_reference_corpus_smooths_unseen(spark):
    # trained on reference, scored corpus has an unseen bigram ("b z"):
    # unseen pair smooths to alpha/(c1 + alpha*V), unseen context to 1/V
    ref = _docs_df(spark, ["a b a b"])        # c12: ab=2, ba=1; c1 a=2,b=1; V=2
    tgt = _docs_df(spark, ["a b z"])          # bigrams: ab (seen), bz (unseen)
    got = bigram_lm_scores(tgt, reference=ref, alpha=1.0).collect()[0]
    p_ab = (2 + 1) / (2 + 2)
    p_bz = (0 + 1) / (1 + 2)
    assert got.n_bigrams == 2
    assert got.xent == round(-(math.log(p_ab) + math.log(p_bz)) / 2, 4)


def test_bigram_lm_flags_repetitive_doc_as_low_xent(spark):
    # the gate's direction: a pathological repetition scores LOWER
    # cross-entropy than natural-ish text (repetition gates pair with
    # repetition_stats; the CCNet cut drops the HIGH tail = gibberish)
    docs = _docs_df(spark, ["spam " * 50, "the quick brown fox jumps over"])
    got = {r.doc_id: r.xent for r in bigram_lm_scores(docs).collect()}
    assert got[0] < got[1]


def test_bigram_lm_plan_has_no_python_udf(spark):
    docs = _docs_df(spark, ["a b c d", "b c e"])
    plan = bigram_lm_scores(docs)._jdf.queryExecution().optimizedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------------------- pagerank

def _graph(spark):
    from index_spark.operators.graph import pagerank
    nodes = spark.range(0, 4).withColumnRenamed("id", "node")
    edges = spark.createDataFrame([(0, 1), (0, 2), (1, 2), (2, 0)],
                                  "src long, dst long")
    return pagerank, nodes, edges


def _numpy_pr(out, n, d=0.85, iters=3):
    import numpy as np
    r = np.full(n, 1 / n)
    for _ in range(iters):
        c = np.zeros(n)
        dm = 0.0
        for u, vs in out.items():
            if not vs:
                dm += r[u]
            for v in vs:
                c[v] += r[u] / len(vs)
        # isolated nodes missing from `out` are dangling too
        for u in range(n):
            if u not in out:
                dm += r[u]
        r = (1 - d) / n + d * (c + dm / n)
    return {i: round(float(r[i]), 6) for i in range(n)}


def test_pagerank_hand_graph_with_dangling(spark):
    pagerank, nodes, edges = _graph(spark)
    got = {r.node: r.rank for r in pagerank(nodes, edges, iters=3).collect()}
    assert got == _numpy_pr({0: [1, 2], 1: [2], 2: [0]}, 4)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_uniform_on_symmetric_cycle(spark):
    from index_spark.operators.graph import pagerank
    nodes = spark.range(0, 5).withColumnRenamed("id", "node")
    cyc = [(i, (i + 1) % 5) for i in range(5)]
    edges = spark.createDataFrame(cyc, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(nodes, edges, iters=4).collect()}
    assert all(v == 0.2 for v in got.values())


def test_pagerank_no_edges_is_uniform(spark):
    from index_spark.operators.graph import pagerank
    nodes = spark.range(0, 8).withColumnRenamed("id", "node")
    edges = spark.createDataFrame([], "src long, dst long")
    got = {r.node: r.rank for r in pagerank(nodes, edges, iters=2).collect()}
    # all mass dangles and redistributes uniformly: stays 1/N exactly
    assert all(v == 0.125 for v in got.values())


def test_pagerank_plan_stays_jvm_side(spark):
    pagerank, nodes, edges = _graph(spark)
    plan = (pagerank(nodes, edges, iters=1)
            ._jdf.queryExecution().optimizedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------- personalized pagerank

def _numpy_ppr(out, n, seeds, d=0.85, iters=3):
    import numpy as np
    p = np.zeros(n)
    p[list(seeds)] = 1 / len(seeds)
    r = p.copy()
    for _ in range(iters):
        c = np.zeros(n)
        dm = 0.0
        for u in range(n):
            vs = out.get(u, [])
            if not vs:
                dm += r[u]
            for v in vs:
                c[v] += r[u] / len(vs)
        r = (1 - d) * p + d * (c + dm * p)
    return {i: round(float(r[i]), 6) for i in range(n)}


def test_ppr_hand_graph_with_dangling_and_seed_restart(spark):
    from index_spark.operators.graph import pagerank
    nodes = spark.range(0, 4).withColumnRenamed("id", "node")
    edges = spark.createDataFrame([(0, 1), (0, 2), (1, 2), (2, 0)],
                                  "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.rank for r in pagerank(
        nodes, edges, iters=3, teleport=seeds).collect()}
    assert got == _numpy_ppr({0: [1, 2], 1: [2], 2: [0]}, 4, [0])
    # node 3 is disconnected from the seed: rank exactly 0
    assert got[3] == 0.0
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_ppr_two_seeds_and_mass_conservation(spark):
    from index_spark.operators.graph import pagerank
    nodes = spark.range(0, 5).withColumnRenamed("id", "node")
    cyc = [(i, (i + 1) % 5) for i in range(5)]
    edges = spark.createDataFrame(cyc, "src long, dst long")
    seeds = spark.createDataFrame([(1,), (3,)], "node long")
    got = {r.node: r.rank for r in pagerank(
        nodes, edges, iters=3, teleport=seeds).collect()}
    want = _numpy_ppr({i: [(i + 1) % 5] for i in range(5)}, 5, [1, 3])
    # node 0's exact value 0.0541875 sits ON the 6-decimal round-half
    # boundary (Spark HALF_UP vs Python banker's): tolerance compare
    for i in want:
        assert abs(got[i] - want[i]) <= 1.5e-6, (i, got[i], want[i])
    # rounded-at-6 values: per-node drift can stack, not exactly 1.0
    assert abs(sum(got.values()) - 1.0) < 1e-5
    # seed-adjacent nodes outrank the far node
    assert got[1] > got[0] and got[3] > got[0]


def test_ppr_seed_validation(spark):
    from index_spark.operators.graph import pagerank
    nodes = spark.range(0, 3).withColumnRenamed("id", "node")
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    # seeds entirely outside the node set: loud failure
    import pytest as _pytest
    with _pytest.raises(ValueError, match="teleport"):
        pagerank(nodes, edges, teleport=spark.createDataFrame(
            [(99,)], "node long"))
    # unknown seeds are dropped, known ones kept
    seeds = spark.createDataFrame([(0,), (99,)], "node long")
    got = {r.node: r.rank for r in pagerank(
        nodes, edges, iters=2, teleport=seeds).collect()}
    want = _numpy_ppr({0: [1]}, 3, [0], iters=2)
    assert got == want
