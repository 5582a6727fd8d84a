"""Session-7 operators: parent-child retrieval (has_child_search) and
per-group top hits (top_hits_by_group), both built on the shared
complete-match-scores helper that also backs collapse_search.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from index_spark.operators.build import build_index
from index_spark.operators.query import (
    collapse_search,
    has_child_search,
    search,
    top_hits_by_group,
)

SHARD = 64
QUERY = "import data table"


@pytest.fixture(scope="module")
def built(spark, tiny_corpus):
    docs, index, stats = build_index(
        spark.createDataFrame(tiny_corpus), stem=True, shard_size=SHARD)
    index = index.persist()
    index.count()
    return docs.persist(), index, stats


@pytest.fixture(scope="module")
def all_scores(built):
    """Reference: complete (doc_id, score) via plain search with k=N."""
    docs, index, stats = built
    n = int(stats["n_docs"])
    rows = search(index, docs, stats, QUERY, k=n, shard_size=SHARD,
                  use_wand=False).collect()
    return pd.DataFrame([(r["doc_id"], r["score"]) for r in rows],
                        columns=["doc_id", "score"])


@pytest.fixture(scope="module")
def parents(built):
    docs, _, _ = built
    return docs.select("doc_id",
                       (F.col("doc_id") / 10).cast("long")
                       .alias("parent_id")).persist()


def _expected_rollup(all_scores, mode):
    g = all_scores.assign(parent_id=all_scores.doc_id // 10) \
        .groupby("parent_id")
    n = g.size().rename("n_children")
    score = {"max": g.score.max(), "sum": g.score.sum(),
             "avg": g.score.mean()}.get(mode)
    if mode == "none":
        score = n * 0.0
    out = pd.concat([score.rename("score"), n], axis=1).reset_index()
    return out.sort_values(["score", "parent_id"],
                           ascending=[False, True])


@pytest.mark.parametrize("mode", ["max", "sum", "avg", "none"])
def test_has_child_matches_reference_rollup(built, parents, all_scores,
                                            mode):
    docs, index, stats = built
    got = has_child_search(index, parents, stats, QUERY, k=5,
                           score_mode=mode, shard_size=SHARD).collect()
    exp = _expected_rollup(all_scores, mode).head(5)
    assert [r["parent_id"] for r in got] == exp.parent_id.tolist()
    assert [r["n_children"] for r in got] == exp.n_children.tolist()
    for r, (_, e) in zip(got, exp.iterrows()):
        assert abs(r["score"] - e.score) < 1e-9


def test_has_child_min_children(built, parents, all_scores):
    docs, index, stats = built
    got = has_child_search(index, parents, stats, QUERY, k=100,
                           min_children=5, shard_size=SHARD).collect()
    exp = _expected_rollup(all_scores, "max")
    exp = exp[exp.n_children >= 5]
    assert {r["parent_id"] for r in got} == set(exp.parent_id)
    assert all(r["n_children"] >= 5 for r in got)


def test_has_child_rejects_bad_mode_and_empty_query(built, parents):
    docs, index, stats = built
    with pytest.raises(ValueError, match="score_mode"):
        has_child_search(index, parents, stats, QUERY, score_mode="best")
    assert has_child_search(index, parents, stats, "", k=5).count() == 0


def test_top_hits_matches_reference(built, all_scores):
    docs, index, stats = built
    got = top_hits_by_group(index, docs, stats, QUERY, by="repo",
                            per_group=2, shard_size=SHARD).collect()
    meta = {r["doc_id"]: r["repo"] for r in
            docs.select("doc_id", "repo").collect()}
    exp = all_scores.assign(group_key=all_scores.doc_id.map(meta))
    exp = exp.sort_values(["group_key", "score", "doc_id"],
                          ascending=[True, False, True])
    exp["rnk"] = exp.groupby("group_key").cumcount() + 1
    exp = exp[exp.rnk <= 2]
    assert [(r["group_key"], r["rnk"], r["doc_id"]) for r in got] == \
        list(zip(exp.group_key, exp.rnk, exp.doc_id))


def test_term_weights_all_ones_is_identity(built):
    docs, index, stats = built
    a = search(index, docs, stats, QUERY, k=10, shard_size=SHARD).collect()
    qt = sorted({r for r in ["import", "data", "tabl"]})
    b = search(index, docs, stats, QUERY, k=10, shard_size=SHARD,
               term_weights={t: 1.0 for t in qt}).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == \
           [(r["doc_id"], r["score"]) for r in b]


def test_term_weights_scale_linearly_and_wand_agrees(built):
    docs, index, stats = built
    base = search(index, docs, stats, "data", k=20, shard_size=SHARD,
                  use_wand=False).collect()
    scaled = search(index, docs, stats, "data", k=20, shard_size=SHARD,
                    use_wand=False, term_weights={"data": 2.5}).collect()
    wand = search(index, docs, stats, "data", k=20, shard_size=SHARD,
                  use_wand=True, term_weights={"data": 2.5}).collect()
    assert [r["doc_id"] for r in base] == [r["doc_id"] for r in scaled]
    for b, s in zip(base, scaled):
        assert abs(s["score"] - 2.5 * b["score"]) < 1e-12
    assert [(r["doc_id"], r["score"]) for r in scaled] == \
           [(r["doc_id"], r["score"]) for r in wand]


def test_term_weights_validation(built):
    docs, index, stats = built
    with pytest.raises(ValueError, match="not in the tokenized"):
        search(index, docs, stats, "data", term_weights={"zzz": 1.0})
    with pytest.raises(ValueError, match="positive finite"):
        search(index, docs, stats, "data", term_weights={"data": 0.0})


def test_multi_term_vectors_matches_single(built):
    from index_spark.operators.analytics import (
        multi_term_vectors,
        term_vector,
    )

    docs, index, stats = built
    ids = [3, 77, 141]
    multi = multi_term_vectors(index, ids, shard_size=SHARD).collect()
    got = {}
    for r in multi:
        got.setdefault(r["doc_id"], {})[r["term"]] = r["tf"]
    for d in ids:
        single = {r["term"]: r["tf"]
                  for r in term_vector(index, d, shard_size=SHARD).collect()}
        assert got.get(d, {}) == single


def test_rm3_uniform_weights_reduce_to_scaled_plain(built):
    """fb_terms=0 leaves only the uniform lambda/|q| original weights:
    ranking identical to plain search, scores scaled by lambda/|q|."""
    from index_spark.operators.query import rm3_search

    docs, index, stats = built
    plain = search(index, docs, stats, QUERY, k=10,
                   shard_size=SHARD).collect()
    rm3 = rm3_search(index, docs, stats, QUERY, k=10, fb_docs=5,
                     fb_terms=0, orig_weight=1.0,
                     shard_size=SHARD).collect()
    nq = 3  # import / data / tabl after stemming
    assert [r["doc_id"] for r in rm3] == [r["doc_id"] for r in plain]
    for p, r in zip(plain, rm3):
        assert abs(r["score"] - p["score"] / nq) < 1e-12


def test_rm3_expands_and_validates(built):
    from index_spark.operators.query import rm3_search

    docs, index, stats = built
    out = rm3_search(index, docs, stats, "import data", k=10,
                     fb_docs=5, fb_terms=8, shard_size=SHARD)
    assert out.count() == 10
    with pytest.raises(ValueError, match="orig_weight"):
        rm3_search(index, docs, stats, "data", orig_weight=0.0)
    assert rm3_search(index, docs, stats, "", k=5).count() == 0


def test_decay_boosts_pinned_values(spark):
    from index_spark.operators.query import decay_boosts

    meta = spark.createDataFrame(
        [(0, 500.0), (1, 800.0), (2, 200.0), (3, 1100.0)],
        "doc_id long, x double")
    for kind, at_scale in [("gauss", 0.5), ("exp", 0.5), ("linear", 0.5)]:
        b = {r["doc_id"]: r["boost"] for r in
             decay_boosts(meta, "x", origin=500.0, scale=300.0,
                          decay=0.5, kind=kind).collect()}
        assert b[0] == 1.0                      # at origin
        assert abs(b[1] - at_scale) < 1e-12    # exactly one scale away
        assert abs(b[2] - at_scale) < 1e-12    # symmetric
        assert b[3] < at_scale                 # farther decays more
    # linear hits zero at scale/(1-decay)
    lin = {r["doc_id"]: r["boost"] for r in
           decay_boosts(meta, "x", origin=500.0, scale=300.0, decay=0.5,
                        kind="linear").collect()}
    assert lin[3] == 0.0


def test_decay_validation():
    from index_spark.operators.query import decay_sql

    with pytest.raises(ValueError, match="kind"):
        decay_sql("x", 0, 1, kind="step")
    with pytest.raises(ValueError, match="scale"):
        decay_sql("x", 0, 0.0)
    with pytest.raises(ValueError, match="decay"):
        decay_sql("x", 0, 1, decay=1.0)


def test_decay_boosted_search_matches_manual(built, all_scores):
    from index_spark.operators.query import decay_boosts, search

    docs, index, stats = built
    meta = docs.select("doc_id",
                       (F.col("doc_id") * 7 % 997).cast("double")
                       .alias("x"))
    boosts = decay_boosts(meta, "x", origin=400.0, scale=250.0,
                          decay=0.5, kind="gauss")
    got = search(index, docs, stats, QUERY, k=10, shard_size=SHARD,
                 boosts=boosts).collect()
    xs = all_scores.assign(x=(all_scores.doc_id * 7 % 997).astype(float))
    d = (xs.x - 400.0).abs().clip(lower=0.0) / 250.0
    xs["boosted"] = xs.score * (0.5 ** (d * d))
    exp = xs.sort_values(["boosted", "doc_id"],
                         ascending=[False, True]).head(10)
    assert [r["doc_id"] for r in got] == exp.doc_id.tolist()
    for r, (_, e) in zip(got, exp.iterrows()):
        assert abs(r["score"] - e.boosted) < 1e-9


def test_temperature_rates_formula_and_extremes(spark):
    from index_spark.operators.sample import temperature_rates

    rows = ([("big", i) for i in range(900)]
            + [("mid", i) for i in range(90)]
            + [("rare", i) for i in range(10)])
    df = spark.createDataFrame(rows, "source string, doc_id long")
    # alpha=1 reproduces raw shares -> every rate is exactly 1.0
    r1 = {r["source"]: r["rate"]
          for r in temperature_rates(df, alpha=1.0).collect()}
    assert all(abs(v - 1.0) < 1e-12 for v in r1.values())
    # alpha=0.5: shares proportional to sqrt(n); the binding stratum
    # (largest n/t ratio minimizer) keeps rate 1.0, others downsample
    got = {r["source"]: (r["n_docs"], r["target_share"], r["rate"])
           for r in temperature_rates(df, alpha=0.5).collect()}
    import math

    z = math.sqrt(900) + math.sqrt(90) + math.sqrt(10)
    for s, n in [("big", 900), ("mid", 90), ("rare", 10)]:
        assert abs(got[s][1] - math.sqrt(n) / z) < 1e-12
    k = min(n / (math.sqrt(n) / z) for n in (900, 90, 10))
    for s, n in [("big", 900), ("mid", 90), ("rare", 10)]:
        assert abs(got[s][2] - (math.sqrt(n) / z) * k / n) < 1e-12
    assert max(v[2] for v in got.values()) == pytest.approx(1.0)
    # rare strata keep a LARGER fraction than common ones
    assert got["rare"][2] > got["mid"][2] > got["big"][2]
    with pytest.raises(ValueError, match="alpha"):
        temperature_rates(df, alpha=0.0)


def test_temperature_balance_draw_is_deterministic(spark):
    from index_spark.operators.sample import (
        balance_corpus,
        temperature_rates,
    )

    rows = [("a", i) for i in range(200)] + [("b", i + 200)
                                             for i in range(50)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    rates = temperature_rates(df, alpha=0.5)
    k1 = sorted(r["doc_id"] for r in
                balance_corpus(df, None, rates=rates).collect())
    k2 = sorted(r["doc_id"] for r in
                balance_corpus(df, None, rates=rates).collect())
    assert k1 == k2 and len(k1) > 0


def _py_dsir_bucket(gram: str, n_buckets: int = 64) -> int:
    import hashlib

    h = hashlib.md5(gram.encode()).hexdigest()
    return int(h[:2], 16) % n_buckets


def test_dsir_matches_python_reference(spark):
    import math
    from collections import Counter

    from index_spark.operators.dsir import dsir_logratios

    rows = [(0, "a b c a", "en"), (1, "x y z", "xx"),
            (2, "a b x", "en"), (3, "", "xx")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["doc_id"]: (r["n_feats"], r["log_ratio"]) for r in
           dsir_logratios(df, df.filter("lang = 'en'"),
                          n_buckets=64, alpha=1.0).collect()}

    def feats(text):
        toks = [t for t in text.lower().split() if t]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    raw = Counter(_py_dsir_bucket(g) for d, t, _ in rows for g in feats(t))
    tgt = Counter(_py_dsir_bucket(g) for d, t, lg in rows
                  if lg == "en" for g in feats(t))
    rt, tt = sum(raw.values()), sum(tgt.values())
    for d, t, _ in rows:
        fs = feats(t)
        exp = sum(math.log((tgt[_py_dsir_bucket(g)] + 1.0) / (tt + 64.0))
                  - math.log((raw[_py_dsir_bucket(g)] + 1.0) / (rt + 64.0))
                  for g in fs)
        assert got[d][0] == len(fs)
        assert abs(got[d][1] - exp) < 1e-9, (d, got[d], exp)


def test_dsir_self_target_is_zero_and_select(spark):
    from index_spark.operators.dsir import dsir_logratios, dsir_select

    rows = [(i, f"w{i} common text common w{i + 1}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lr = dsir_logratios(df, df).collect()
    assert all(abs(r["log_ratio"]) < 1e-12 for r in lr)
    sel = dsir_select(df, df.filter("doc_id < 5"), keep=5).collect()
    assert len(sel) == 5
    scores = [r["log_ratio"] for r in sel]
    assert scores == sorted(scores, reverse=True)
    with pytest.raises(ValueError, match="alpha"):
        dsir_logratios(df, df, alpha=0.0)


def test_top_hits_per_group_one_equals_collapse(built):
    docs, index, stats = built
    th = top_hits_by_group(index, docs, stats, QUERY, by="repo",
                           per_group=1, shard_size=SHARD).collect()
    cl = collapse_search(index, docs, stats, QUERY, collapse="repo",
                         k=1000, shard_size=SHARD).collect()
    th_map = {r["group_key"]: (r["doc_id"], r["score"]) for r in th}
    cl_map = {r["group_key"]: (r["doc_id"], r["score"]) for r in cl}
    assert th_map == cl_map
