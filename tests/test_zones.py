"""Zoned index + zone-weighted BM25: engine vs pinned python oracle."""

import math

import pytest
from pyspark.sql import functions as F

from index_spark.functions.text import tokenize

K1, B = 1.2, 0.75

CORPUS = [
    # (path_tokens_zone, body)
    ("alpha util", "data table query join data"),
    ("beta data", "scan filter merge sort"),
    ("gamma table", "data data table window"),
    ("delta misc", "group agg window stream"),
    ("data data", "nothing relevant here"),
]


@pytest.fixture(scope="module")
def zoned(spark):
    from index_spark.operators.build import build_zoned_index

    rows = [("r", f"{i:04d}", body, ztext)
            for i, (ztext, body) in enumerate(CORPUS)]
    df = spark.createDataFrame(rows, ["repo", "path", "content", "ztext"])
    docs, index, stats = build_zoned_index(
        df, [("body", "content"), ("zpath", "ztext")],
        stem=False, shard_size=4)
    return index.persist(), stats


def _naive_zone_bm25(query, weights):
    zones = {"body": [tokenize(b, stem=False) for _, b in CORPUS],
             "zpath": [tokenize(z, stem=False) for z, _ in CORPUS]}
    qterms = sorted(set(tokenize(query, stem=False)))
    scores = {}
    for z, docs in zones.items():
        n = len(docs)
        avgdl = sum(len(d) for d in docs) / n
        for t in qterms:
            df_t = sum(1 for d in docs if t in d)
            if df_t == 0:
                continue
            idf = math.log((n - df_t + 0.5) / (df_t + 0.5) + 1.0)
            for i, d in enumerate(docs):
                tf = d.count(t)
                if tf:
                    dl = len(d)
                    scores[i] = scores.get(i, 0.0) + weights[z] * idf * tf / (
                        tf + K1 * (1 - B + B * dl / avgdl))
    return sorted(scores.items(), key=lambda x: (-x[1], x[0]))


def test_zone_stats(zoned):
    _, stats = zoned
    assert stats["body"]["n_docs"] == 5
    assert stats["zpath"]["avgdl"] == 2.0


def test_zone_search_matches_oracle(zoned):
    from index_spark.operators.query import zone_search

    index, stats = zoned
    for query, weights in [
        ("data table", {"body": 1.0, "zpath": 3.0}),
        ("data", {"body": 1.0, "zpath": 10.0}),
        ("window util", {"body": 2.0, "zpath": 0.5}),
    ]:
        got = [(r["doc_id"], r["score"])
               for r in zone_search(index, stats, query, weights,
                                    stem=False).collect()]
        exp = _naive_zone_bm25(query, weights)
        assert [g[0] for g in got] == [e[0] for e in exp], (query, got, exp)
        for (_, gs), (_, es) in zip(got, exp):
            assert abs(gs - es) < 1e-9, (query, gs, es)


def test_zone_weight_changes_ranking(zoned):
    """Boosting the path zone must promote the doc whose path matches."""
    from index_spark.operators.query import zone_search

    index, stats = zoned
    low = [r["doc_id"] for r in zone_search(
        index, stats, "data", {"body": 1.0, "zpath": 0.01},
        stem=False).collect()]
    high = [r["doc_id"] for r in zone_search(
        index, stats, "data", {"body": 0.01, "zpath": 10.0},
        stem=False).collect()]
    # doc 4's path is "data data" but its body lacks 'data'
    assert high[0] == 4
    assert low[0] != 4


def test_zoned_merge_groups_by_zone_and_term(spark, zoned):
    """merge_shards on a zoned index must keep zones separate: one row
    per (zone, term), with per-zone df preserved."""
    from pyspark.sql import functions as F

    from index_spark.operators.merge import merge_shards

    index, _ = zoned
    merged = merge_shards(index)
    rows = merged.where(F.col("term") == "data") \
                 .select("zone", "term", "df").collect()
    got = {(r["zone"], r["term"]): r["df"] for r in rows}
    # body zone: docs 0, 1(no), 2... -> df from CORPUS bodies; zpath zone
    body_df = sum(1 for _, b in CORPUS if "data" in tokenize(b, stem=False))
    path_df = sum(1 for z, _ in CORPUS if "data" in tokenize(z, stem=False))
    assert got == {("body", "data"): body_df, ("zpath", "data"): path_df}
    assert merged.groupBy("zone", "term").count() \
                 .where(F.col("count") > 1).count() == 0


def test_zone_index_prunes_on_zone_and_term(spark, zoned, tmp_path):
    index, _ = zoned
    out = str(tmp_path / "zidx")
    index.write.parquet(out)
    df = (spark.read.parquet(out)
          .filter((F.col("zone") == "zpath") & F.col("term").isin("data")))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "PushedFilters" in plan
    assert "zone" in plan.split("PushedFilters")[1][:200], plan


def test_doclens_from_zoned_index_pins_one_zone(zoned):
    from index_spark.operators.build import doclens_from_index

    index, _ = zoned
    body = {r["doc_id"]: r["doc_len"]
            for r in doclens_from_index(index).collect()}
    zpath = {r["doc_id"]: r["doc_len"]
             for r in doclens_from_index(index, zone="zpath").collect()}
    assert len(body) == len(CORPUS) == len(zpath)
    for i, (ztext, b) in enumerate(CORPUS):
        assert body[i] == len(tokenize(b, stem=False))
        assert zpath[i] == len(tokenize(ztext, stem=False))


def test_plain_search_on_zoned_index_pins_body(spark, zoned):
    """search()/search_many() on a zoned index must pin ONE zone (default
    body) — never sum the same term's per-zone lists under global stats."""
    from index_spark.operators.build import build_index, stats_from_index
    from index_spark.operators.query import search, search_many

    index, stats = zoned
    rows = [("r", f"{i:04d}", body) for i, (_, body) in enumerate(CORPUS)]
    plain_df = spark.createDataFrame(rows, ["repo", "path", "content"])
    _, plain, _ = build_index(plain_df, stem=False, shard_size=4)
    pstats = stats_from_index(plain)
    a = [(r["doc_id"], round(r["score"], 9)) for r in
         search(index, None, stats["body"], "data table", stem=False).collect()]
    b = [(r["doc_id"], round(r["score"], 9)) for r in
         search(plain, None, pstats, "data table", stem=False).collect()]
    assert a == b and len(a) > 0
    got = search_many(index, stats["body"], {0: "data table"},
                      stem=False).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in
            sorted(got, key=lambda r: r["rank"])] == a


def test_zone_validation_raises_on_absent_zone(zoned):
    from index_spark.operators.build import stats_from_index
    from index_spark.operators.query import search

    index, _ = zoned
    with pytest.raises(ValueError, match="zone 'nope'"):
        stats_from_index(index, zone="nope")
    with pytest.raises(ValueError, match="zone 'nope'"):
        search(index, None, {"n_docs": 5, "avgdl": 4.0}, "data",
               stem=False, zone="nope")


def _naive_bm25f(query, weights, k1=1.2, b=0.75):
    """Textbook BM25F (simple variant): zone tfs combine via weighted
    length-normalized sum BEFORE one saturation; doc-level idf."""
    zones = {"body": [tokenize(b_, stem=False) for _, b_ in CORPUS],
             "zpath": [tokenize(z, stem=False) for z, _ in CORPUS]}
    qterms = sorted(set(tokenize(query, stem=False)))
    n = len(CORPUS)
    avgdl = {z: sum(len(d) for d in docs) / n for z, docs in zones.items()}
    scores = {}
    for t in qterms:
        dfd = sum(1 for i in range(n)
                  if any(t in zones[z][i] for z in zones))
        if dfd == 0:
            continue
        idf = math.log((n - dfd + 0.5) / (dfd + 0.5) + 1.0)
        for i in range(n):
            wtf = 0.0
            for z in zones:
                tf = zones[z][i].count(t)
                if tf:
                    dl = len(zones[z][i])
                    wtf += weights[z] * tf / (
                        (1 - b) + b * dl / avgdl[z])
            if wtf > 0:
                scores[i] = scores.get(i, 0.0) + idf * wtf / (k1 + wtf)
    return sorted(scores.items(), key=lambda x: (-x[1], x[0]))


def test_bm25f_matches_naive(zoned):
    from index_spark.operators.query import bm25f_search

    index, stats = zoned
    for query, weights in [
        ("data table", {"body": 1.0, "zpath": 3.0}),
        ("data", {"body": 1.0, "zpath": 10.0}),
        ("window util", {"body": 2.0, "zpath": 0.5}),
        ("nothing data window", {"body": 1.0, "zpath": 1.0}),
        ("zzzabsent", {"body": 1.0, "zpath": 1.0}),
    ]:
        got = [(r["doc_id"], r["score"])
               for r in bm25f_search(index, stats, query, weights,
                                     stem=False).collect()]
        exp = _naive_bm25f(query, weights)[:10]
        assert [g[0] for g in got] == [e[0] for e in exp], (query, got, exp)
        for (_, gs), (_, es) in zip(got, exp):
            assert abs(gs - es) < 1e-9, (query, gs, es)


def test_bm25f_differs_from_zone_sum(zoned):
    """The early weighted-tf combination saturates once per term —
    distinct from zone_search's sum of independent per-zone BM25s."""
    from index_spark.operators.query import bm25f_search, zone_search

    index, stats = zoned
    w = {"body": 1.0, "zpath": 1.0}
    f = {r["doc_id"]: r["score"]
         for r in bm25f_search(index, stats, "data", w,
                               stem=False).collect()}
    s = {r["doc_id"]: r["score"]
         for r in zone_search(index, stats, "data", w,
                              stem=False).collect()}
    # doc 4 ('data data' path, body without 'data') must appear in both,
    # but at least one doc's scores must differ between the two models
    assert 4 in f and 4 in s
    assert any(abs(f[d] - s[d]) > 1e-12 for d in f if d in s)


# ----------------------------------------------------------------- dis-max

def _naive_dismax(query, weights, tie):
    zones = {"body": [tokenize(b, stem=False) for _, b in CORPUS],
             "zpath": [tokenize(z, stem=False) for z, _ in CORPUS]}
    qterms = sorted(set(tokenize(query, stem=False)))
    per = {}  # (doc, term) -> [contrib per zone]
    for z, docs in zones.items():
        n = len(docs)
        avgdl = sum(len(d) for d in docs) / n
        for t in qterms:
            df_t = sum(1 for d in docs if t in d)
            if df_t == 0:
                continue
            idf = math.log((n - df_t + 0.5) / (df_t + 0.5) + 1.0)
            for i, d in enumerate(docs):
                tf = d.count(t)
                if tf:
                    dl = len(d)
                    c = weights[z] * idf * tf / (
                        tf + K1 * (1 - B + B * dl / avgdl))
                    per.setdefault((i, t), []).append(c)
    scores = {}
    for (i, _), cs in per.items():
        scores[i] = scores.get(i, 0.0) + max(cs) + tie * (sum(cs) - max(cs))
    return sorted(scores.items(), key=lambda x: (-x[1], x[0]))


@pytest.mark.parametrize("tie", [0.0, 0.3, 1.0])
def test_dismax_matches_naive(zoned, tie):
    from index_spark.operators.query import dismax_search

    index, stats = zoned
    for query, weights in [
        ("data table", {"body": 1.0, "zpath": 3.0}),
        ("data", {"body": 1.0, "zpath": 10.0}),
        ("window util", {"body": 2.0, "zpath": 0.5}),
    ]:
        got = [(r["doc_id"], r["score"])
               for r in dismax_search(index, stats, query, weights,
                                      tie=tie, stem=False).collect()]
        exp = _naive_dismax(query, weights, tie)
        assert [g[0] for g in got] == [e[0] for e in exp], (query, got, exp)
        for (_, gs), (_, es) in zip(got, exp):
            assert abs(gs - es) < 1e-9, (query, tie, gs, es)


def test_dismax_tie1_equals_zone_search(zoned):
    """tie=1.0 degenerates to zone_search's weighted sum."""
    from index_spark.operators.query import dismax_search, zone_search

    index, stats = zoned
    w = {"body": 1.0, "zpath": 3.0}
    a = dismax_search(index, stats, "data table window", w, tie=1.0,
                      stem=False).collect()
    b = zone_search(index, stats, "data table window", w,
                    stem=False).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    for ra, rb in zip(a, b):
        assert abs(ra["score"] - rb["score"]) < 1e-9


def test_dismax_prefers_best_field_over_sum(zoned):
    """The defining behavior: with tie=0, a doc matching ONE zone
    strongly can outrank a doc matching both zones weakly — and a doc
    duplicated across zones earns no double-count."""
    from index_spark.operators.query import dismax_search, zone_search

    index, stats = zoned
    w = {"body": 1.0, "zpath": 1.0}
    dis = {r["doc_id"]: r["score"] for r in
           dismax_search(index, stats, "table", w, tie=0.0,
                         stem=False).collect()}
    summed = {r["doc_id"]: r["score"] for r in
              zone_search(index, stats, "table", w, stem=False).collect()}
    # doc 2 says 'table' in BOTH zones ("gamma table" / "... table ...")
    # -> dis-max strictly below the double-counting sum; doc 0 says it
    # in the body only -> identical under both scorers
    assert abs(dis[0] - summed[0]) < 1e-12
    assert dis[2] < summed[2]


def test_dismax_empty_cases(zoned):
    from index_spark.operators.query import dismax_search

    index, stats = zoned
    assert dismax_search(index, stats, "", {"body": 1.0},
                         stem=False).count() == 0
    assert dismax_search(index, stats, "data", {"nozone": 1.0},
                         stem=False).count() == 0


# ------------------------------------------------------- fielded queries

def _naive_fielded(pairs, mode="or"):
    zones = {"body": [tokenize(b, stem=False) for _, b in CORPUS],
             "zpath": [tokenize(z, stem=False) for z, _ in CORPUS]}
    scores: dict[int, float] = {}
    matched: dict[int, int] = {}
    for z, t in sorted(set(pairs)):
        docs = zones[z]
        n = len(docs)
        avgdl = sum(len(d) for d in docs) / n
        df_t = sum(1 for d in docs if t in d)
        if df_t == 0:
            continue
        idf = math.log((n - df_t + 0.5) / (df_t + 0.5) + 1.0)
        for i, d in enumerate(docs):
            tf = d.count(t)
            if tf:
                dl = len(d)
                scores[i] = scores.get(i, 0.0) + idf * tf / (
                    tf + K1 * (1 - B + B * dl / avgdl))
                matched[i] = matched.get(i, 0) + 1
    if mode == "and":
        scores = {i: s for i, s in scores.items()
                  if matched.get(i, 0) == len(set(pairs))}
    return sorted(scores.items(), key=lambda x: (-x[1], x[0]))


def test_fielded_matches_hand_oracle(zoned):
    from index_spark.operators.query import fielded_search

    index, stats = zoned
    got = [(r.doc_id, r.score) for r in
           fielded_search(index, stats, "zpath:data table", k=10,
                          default_zone="body", stem=False).collect()]
    want = _naive_fielded([("zpath", "data"), ("body", "table")])
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, g), (_, w) in zip(got, want):
        assert g == pytest.approx(w, rel=1e-9)


def test_fielded_and_mode_gates_on_every_pair(zoned):
    from index_spark.operators.query import fielded_search

    index, stats = zoned
    # doc 1 has zpath "beta data" AND body "scan ..."; doc 4 matches
    # only the zpath pair — AND must keep 1 and drop 4
    pairs = [("zpath", "data"), ("body", "scan")]
    got = [(r.doc_id, r.score) for r in
           fielded_search(index, stats, "zpath:data scan", k=10,
                          default_zone="body", mode="and",
                          stem=False).collect()]
    want = _naive_fielded(pairs, mode="and")
    assert [d for d, _ in got] == [d for d, _ in want] and got
    for (_, g), (_, w) in zip(got, want):
        assert g == pytest.approx(w, rel=1e-9)
    # AND is a strict subset of OR with identical surviving scores
    osc = dict(_naive_fielded(pairs))
    for d, s in want:
        assert s == pytest.approx(osc[d], rel=1e-12)


def test_fielded_all_default_equals_zone_pinned_search(zoned):
    from index_spark.operators.query import fielded_search, search

    index, stats = zoned
    got = [(r.doc_id, round(r.score, 9)) for r in
           fielded_search(index, stats, "data table", k=10,
                          default_zone="body", stem=False).collect()]
    want = [(r.doc_id, round(r.score, 9)) for r in
            search(index, None, stats["body"], "data table", k=10,
                   stem=False, zone="body", shard_size=4).collect()]
    assert got == want


def test_fielded_guards(zoned, spark):
    from index_spark.operators.build import build_index
    from index_spark.operators.query import fielded_search

    index, stats = zoned
    with pytest.raises(ValueError, match="unknown zone"):
        fielded_search(index, stats, "title:data", stem=False)
    with pytest.raises(ValueError, match="unknown default zone"):
        fielded_search(index, stats, "data", default_zone="nope",
                       stem=False)
    with pytest.raises(ValueError, match="mode"):
        fielded_search(index, stats, "data", mode="not", stem=False)
    assert fielded_search(index, stats, "", stem=False).count() == 0
    flat = spark.createDataFrame([("r", "p", "data table")],
                                 ["repo", "path", "content"])
    _, fidx, fstats = build_index(flat, stem=False, shard_size=4)
    with pytest.raises(ValueError, match="zoned"):
        fielded_search(fidx, {"body": fstats}, "data", stem=False)


def test_fielded_kernel_choice_is_score_invariant(zoned):
    # forced WAND and forced exhaustive agree pair-for-pair (the pair
    # relabeling must keep per-term upper bounds and per-row avgdl
    # coherent inside the pruning kernel)
    from index_spark.operators.query import fielded_search

    index, stats = zoned
    kw = dict(k=10, default_zone="body", stem=False)
    a = [(r.doc_id, round(r.score, 9)) for r in
         fielded_search(index, stats, "zpath:data table query",
                        use_wand=True, **kw).collect()]
    b = [(r.doc_id, round(r.score, 9)) for r in
         fielded_search(index, stats, "zpath:data table query",
                        use_wand=False, **kw).collect()]
    assert a == b and a
