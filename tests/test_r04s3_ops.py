"""Round-4 session-3 surfaces: document chunking, deterministic
sampling/splits, hybrid RRF fusion, field collapsing, significant
terms, regex term queries — each checked against a brute-force or
hand-computed reference."""

import re

import pytest
from pyspark.sql import functions as F

from index_spark.functions.text import tokenize
from index_spark.operators.build import build_index
from index_spark.operators.chunk import chunk_documents
from index_spark.operators.hybrid import hybrid_search, rrf_fuse
from index_spark.operators.query import (
    _regex_literal_prefix,
    collapse_search,
    regex_expand,
    search,
    search_regex,
)
from index_spark.operators.sample import (
    assign_splits,
    rate_threshold,
    sample_stratified,
)


@pytest.fixture(scope="module")
def built(spark, tiny_corpus):
    corpus = spark.createDataFrame(tiny_corpus)
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     shard_size=32)
    return docs.persist(), index.persist(), stats


# --------------------------------------------------------------- chunking

def _py_chunks(text, size, overlap):
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    step = size - overlap
    starts = [s for s in range(0, len(toks), step)
              if s == 0 or s + overlap < len(toks)]
    out = []
    for cid, start in enumerate(starts):
        w = toks[start:start + size]
        out.append((cid, len(w), " ".join(w)))
    return out


def test_chunks_match_python_reference(spark):
    rows = [
        (0, "one two three four five six seven eight nine ten"),
        (1, "a b c d"),          # shorter than one chunk
        (2, ""),                  # zero tokens -> no chunks
        (3, "x " * 12),           # exact multiple of step
        (4, "Mixed CASE, punct!! and  42 numbers"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_id, r.chunk_id): (r.n_tokens, r.chunk_text)
           for r in chunk_documents(df, chunk_size=4, overlap=1).collect()}
    want = {}
    for doc_id, text in rows:
        for cid, n, txt in _py_chunks(text, 4, 1):
            want[(doc_id, cid)] = (n, txt)
    assert got == want
    assert not any(k[0] == 2 for k in got)  # empty doc emitted nothing


def test_chunks_overlap_and_tiling(spark, tiny_corpus):
    df = spark.createDataFrame(tiny_corpus).limit(20).select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("content").alias("text"))
    ch = chunk_documents(df, chunk_size=32, overlap=8).collect()
    by_doc: dict[int, list] = {}
    for r in ch:
        by_doc.setdefault(r.doc_id, []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r.chunk_id)
        assert [r.chunk_id for r in rows] == list(range(len(rows)))
        for a, b in zip(rows, rows[1:]):
            assert a.n_tokens == 32  # only the tail may be short
            # consecutive chunks share exactly `overlap` tokens
            assert a.chunk_text.split()[24:] == b.chunk_text.split()[:8]


def test_chunks_validation(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=8, overlap=8)


# --------------------------------------------------------------- sampling

@pytest.fixture(scope="module")
def keyed(spark):
    return spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.pmod("id", F.lit(4))).cast("string").alias("stratum")).persist()


def test_sample_deterministic_and_partition_invariant(keyed):
    rates = {"0": 0.5, "1": 0.25}
    a = set(r.doc_id for r in sample_stratified(
        keyed, rates, "stratum").collect())
    b = set(r.doc_id for r in sample_stratified(
        keyed.repartition(13), rates, "stratum").collect())
    assert a == b and a


def test_sample_rates_and_extremes(keyed):
    kept = sample_stratified(
        keyed, {"0": 1.0, "1": 0.5, "2": 0.0}, "stratum",
        default_rate=0.25)
    by = {r.stratum: r.n for r in
          kept.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert by.get("0") == 500           # rate 1.0 keeps everything
    assert "2" not in by                # rate 0.0 keeps nothing
    assert 200 <= by.get("1", 0) <= 300  # ~250 of 500
    assert 80 <= by.get("3", 0) <= 170   # default 0.25 -> ~125


def test_sample_rate_nesting(keyed):
    # raising a rate keeps a SUPERSET (threshold moves, draws don't)
    small = set(r.doc_id for r in sample_stratified(
        keyed, {}, "stratum", default_rate=0.2).collect())
    big = set(r.doc_id for r in sample_stratified(
        keyed, {}, "stratum", default_rate=0.6).collect())
    assert small < big


def test_splits_partition_and_weights(keyed):
    out = assign_splits(keyed)
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    assert counts.keys() == {"train", "val", "test"}
    assert 1500 <= counts["train"] <= 1700
    with pytest.raises(ValueError):
        assign_splits(keyed, [("a", 0.5), ("b", 0.2)])
    with pytest.raises(ValueError):
        assign_splits(keyed, [("only", 1.0)])


def test_rate_threshold_edges():
    assert rate_threshold(0.0) == "00000000"
    assert rate_threshold(1.0) == "g"      # above any hex digit
    assert rate_threshold(0.5) == "80000000"
    assert "ffffffff" < "g"


# ------------------------------------------------------------- hybrid RRF

def test_rrf_fuse_hand_example(spark):
    r1 = spark.createDataFrame([(1, 9.0), (2, 5.0), (3, 1.0)],
                               "doc_id long, score double")
    r2 = spark.createDataFrame([(2, 0.9), (4, 0.8)],
                               "doc_id long, score double")
    got = {r.doc_id: r.rrf for r in rrf_fuse([r1, r2], k=4).collect()}
    assert got == {
        1: round(1 / 61, 6),
        2: round(1 / 62 + 1 / 61, 6),
        3: round(1 / 63, 6),
        4: round(1 / 62, 6),
    }
    # fused order: doc2 (both rankings) first
    top = rrf_fuse([r1, r2], k=1).collect()[0]
    assert top.doc_id == 2


def test_hybrid_matches_driver_side_fusion(spark, built):
    import numpy as np

    docs, index, stats = built
    n = stats["n_docs"]
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((n, 8)).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>")
    qvec = [float(x) for x in vecs[0]]

    got = [(r.doc_id, r.rrf) for r in
           hybrid_search(index, docs, stats, emb, "import return",
                         qvec, k=10, window=None, shard_size=32,
                         stem=False, camel=False).collect()]

    # driver-side reference fusion over the full rankings
    lex = [(r.doc_id, round(r.score, 4)) for r in
           search(index, docs, stats, "import return", k=n,
                  stem=False, camel=False, shard_size=32).collect()]
    lex.sort(key=lambda t: (-t[1], t[0]))
    qn = np.sqrt((np.asarray(qvec) ** 2).sum())
    cos = (vecs.astype("float64") @ np.asarray(qvec)) / (
        np.sqrt((vecs.astype("float64") ** 2).sum(axis=1)) * qn)
    sem = sorted(((i, round(float(c), 4)) for i, c in enumerate(cos)),
                 key=lambda t: (-t[1], t[0]))
    rrf: dict[int, float] = {}
    for ranking in (lex, sem):
        for rank, (d, _) in enumerate(ranking, start=1):
            rrf[d] = rrf.get(d, 0.0) + 1.0 / (60 + rank)
    want = sorted(((d, round(s, 6)) for d, s in rrf.items()),
                  key=lambda t: (-t[1], t[0]))[:10]
    assert got == want


def test_hybrid_window_bounds_inputs(spark, built):
    import numpy as np

    docs, index, stats = built
    rng = np.random.default_rng(3)
    n = stats["n_docs"]
    vecs = rng.standard_normal((n, 4)).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>")
    out = hybrid_search(index, docs, stats, emb, "import", list(vecs[1]),
                        k=50, window=5, shard_size=32,
                        stem=False, camel=False).collect()
    # <= 2 retrievers x 5 rows can be fused
    assert 5 <= len(out) <= 10


# -------------------------------------------------------- field collapsing

def test_collapse_matches_brute_force(spark, built):
    docs, index, stats = built
    got = [(r.group_key, r.doc_id, round(r.score, 9)) for r in
           collapse_search(index, docs, stats, "import return",
                           collapse="repo", k=5, stem=False, camel=False,
                           shard_size=32).collect()]
    full = search(index, docs, stats, "import return", k=10 ** 6,
                  stem=False, camel=False, shard_size=32)
    joined = [(r.repo, r.doc_id, r.score) for r in
              full.join(docs.select("doc_id", "repo"), "doc_id").collect()]
    best: dict[str, tuple] = {}
    for g, d, s in joined:
        cur = best.get(g)
        if cur is None or (s, -d) > (cur[1], -cur[0]):
            best[g] = (d, s)
    want = sorted(((g, d, round(s, 9)) for g, (d, s) in best.items()),
                  key=lambda t: (-t[2], t[1]))[:5]
    assert got == want
    assert len({g for g, _, _ in got}) == len(got)  # one row per group


def test_collapse_winner_can_rank_deep(spark, built):
    # property that distinguishes collapsing from grouping the top-k:
    # every group's winner appears even when the global top-k is
    # dominated by one group
    docs, index, stats = built
    out = collapse_search(index, docs, stats, "import", collapse="repo",
                          k=10 ** 6, stem=False, camel=False,
                          shard_size=32)
    n_groups = (search(index, docs, stats, "import", k=10 ** 6,
                       stem=False, camel=False, shard_size=32)
                .join(docs.select("doc_id", "repo"), "doc_id")
                .select("repo").distinct().count())
    assert out.count() == n_groups


# -------------------------------------------------------- significant terms

def test_significant_terms_vs_python(spark, built, tiny_corpus):
    from index_spark.operators.analytics import significant_terms

    docs, index, stats = built
    # foreground: repos org0/* (doc ids assigned by build; join on repo)
    fg_docs = docs.filter(F.col("repo").startswith("org0")) \
                  .select("doc_id")
    got = [(r.term, r.fg_df, r.df, r.jlh) for r in
           significant_terms(index, fg_docs, stats["n_docs"], top=15,
                             min_fg_df=2, shard_size=32).collect()]

    # python reference over the same tokenization
    id_repo = {r.doc_id: r.repo for r in docs.collect()}
    doc_terms = {}
    rows = spark.createDataFrame(tiny_corpus).collect()
    # rebuild doc_id assignment via (repo, path) from the docs dimension
    key_to_id = {(r.repo, r.path): r.doc_id for r in docs.collect()}
    for row in rows:
        did = key_to_id[(row.repo, row.path)]
        doc_terms[did] = set(tokenize(row.content, stem=False, camel=False))
    fg_ids = {d for d, r in id_repo.items() if r.startswith("org0")}
    n, n_fg = stats["n_docs"], len(fg_ids)
    df_c: dict[str, int] = {}
    fg_c: dict[str, int] = {}
    for d, terms in doc_terms.items():
        for t in terms:
            df_c[t] = df_c.get(t, 0) + 1
            if d in fg_ids:
                fg_c[t] = fg_c.get(t, 0) + 1
    want = []
    for t, fgd in fg_c.items():
        if fgd < 2:
            continue
        fg_pct, bg_pct = fgd / float(n_fg), df_c[t] / float(n)
        want.append((t, fgd, df_c[t],
                     round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6)))
    want.sort(key=lambda x: (-x[3], x[0]))
    assert got == want[:15]
    assert got  # non-trivial


def test_significant_terms_shard_pruning_equivalence(spark, built):
    from index_spark.operators.analytics import significant_terms

    docs, index, stats = built
    fg = docs.filter(F.col("doc_id") < 32).select("doc_id")  # one shard
    pruned = significant_terms(index, fg, stats["n_docs"], top=10,
                               shard_size=32).collect()
    full = significant_terms(index, fg, stats["n_docs"], top=10,
                             shard_size=None).collect()
    assert [tuple(r) for r in pruned] == [tuple(r) for r in full]
    with pytest.raises(ValueError):
        significant_terms(index, docs.filter("doc_id < 0")
                          .select("doc_id"), stats["n_docs"]).collect()


# ------------------------------------------------------------ regex queries

def test_regex_literal_prefix():
    assert _regex_literal_prefix("dat.*") == "dat"
    assert _regex_literal_prefix("dat*") == "da"      # t is quantified
    assert _regex_literal_prefix("quer(y|ies)") == "quer"
    assert _regex_literal_prefix(".*x") == ""
    assert _regex_literal_prefix("ab+c") == "a"
    assert _regex_literal_prefix("import") == "import"


def test_regex_expand_is_anchored_full_match(spark, built):
    docs, index, stats = built
    from index_spark.operators.build import DOC_MARKER

    terms = sorted(r.term for r in
                   index.select("term").distinct().collect()
                   if r.term != DOC_MARKER)
    pats = ["import(s|ed)?", "re.*n", "x{40}"]
    exp = regex_expand(index, pats, max_expansions=1000)
    for p in pats:
        rx = re.compile(f"^(?:{p})$")
        assert exp[p] == sorted(t for t in terms if rx.match(t))
    assert exp["x{40}"] == []


def test_search_regex_or_equals_expanded_search(spark, built):
    docs, index, stats = built
    exp = regex_expand(index, ["s.*t"], max_expansions=1000)["s.*t"]
    assert len(exp) >= 2  # set, sort, split, static, ... — real expansion
    got = search_regex(index, docs, stats, "s.*t import", k=10,
                       stem=False, camel=False, shard_size=32).collect()
    want = search(index, docs, stats, " ".join(exp + ["import"]), k=10,
                  stem=False, camel=False, shard_size=32).collect()
    assert [(r.doc_id, r.score) for r in got] == \
           [(r.doc_id, r.score) for r in want]


def test_search_regex_and_is_group_conjunctive(spark, built, tiny_corpus):
    docs, index, stats = built
    pat = "uniq[0-9]token"   # matches uniq0token..uniq9token, one doc each
    out = search_regex(index, docs, stats, f"{pat} import", k=100,
                       mode="and", stem=False, camel=False,
                       shard_size=32).collect()
    exp = regex_expand(index, [pat], max_expansions=1000)[pat]
    # AND satisfied by ANY variant of the pattern group + 'import'
    hit_docs = {r.doc_id for r in out}
    assert hit_docs  # uniq tokens exist in docs that also say 'import'
    # every hit contains >=1 variant and 'import'
    key_to_id = {}
    for r in docs.collect():
        key_to_id[(r.repo, r.path)] = r.doc_id
    for row in spark.createDataFrame(tiny_corpus).collect():
        did = key_to_id[(row.repo, row.path)]
        if did in hit_docs:
            toks = set(tokenize(row.content, stem=False, camel=False))
            assert "import" in toks and toks & set(exp)
    # no-match pattern empties AND
    empty = search_regex(index, docs, stats, "zz+q import", k=10,
                         mode="and", stem=False, camel=False,
                         shard_size=32)
    assert empty.count() == 0


def test_search_regex_bad_pattern_raises(spark, built):
    docs, index, stats = built
    with pytest.raises(re.error):
        search_regex(index, docs, stats, "qu(er", k=5,
                     stem=False, camel=False, shard_size=32)


# ------------------------------------------------------------- plan shape

def test_chunk_plan_is_map_only_and_pruned(spark, tmp_path):
    """Chunking must be a map-side explode: no exchange anywhere, and
    the parquet scan reads ONLY (id, text) even off a wide table."""
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(0, "a b c d e f", "x", 9)],
        "doc_id long, text string, extra string, n long"
    ).write.parquet(p)
    out = chunk_documents(spark.read.parquet(p), chunk_size=4, overlap=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "extra" not in plan.split("ReadSchema")[-1]
    assert out.count() == 2


def test_sample_plan_is_map_only(spark, tmp_path):
    p = str(tmp_path / "docs2.parquet")
    spark.createDataFrame([(i, f"s{i % 3}") for i in range(100)],
                          "doc_id long, source string").write.parquet(p)
    df = spark.read.parquet(p)
    kept = sample_stratified(df, {"s0": 0.5}, "source", default_rate=0.1)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    out = assign_splits(kept)
    plan2 = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan2


# ------------------------------------------------------ mixture rebalancing

def _mix_docs(spark, sizes):
    rows = []
    i = 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_mixture_rates_formula(spark):
    from index_spark.operators.sample import mixture_rates

    docs = _mix_docs(spark, {"a": 100, "b": 50, "c": 30})
    # targets 60/40: K = min(100/0.6, 50/0.4) = 125
    got = {r["source"]: (r["n_docs"], r["rate"])
           for r in mixture_rates(docs, {"a": 0.6, "b": 0.4}).collect()}
    assert got["a"] == (100, 0.6 * 125 / 100)
    assert got["b"] == (50, 1.0)            # binding stratum keeps all
    assert got["c"] == (30, 0.0)            # untargeted drops


def test_mixture_rates_normalizes_shares(spark):
    from index_spark.operators.sample import mixture_rates

    docs = _mix_docs(spark, {"a": 10, "b": 10})
    r1 = {r["source"]: r["rate"]
          for r in mixture_rates(docs, {"a": 1, "b": 1}).collect()}
    r2 = {r["source"]: r["rate"]
          for r in mixture_rates(docs, {"a": 3, "b": 3}).collect()}
    assert r1 == r2 == {"a": 1.0, "b": 1.0}


def test_balance_corpus_hits_proportions(spark):
    from index_spark.operators.sample import balance_corpus

    docs = _mix_docs(spark, {"a": 4000, "b": 1000, "c": 500})
    kept = balance_corpus(docs, {"a": 0.5, "b": 0.5}).groupBy("source").count()
    got = {r["source"]: r["count"] for r in kept.collect()}
    assert "c" not in got
    assert got["b"] == 1000                  # binding: kept exactly
    # a's rate is 0.25; the md5 draw should land within ~5 sigma
    assert abs(got["a"] - 1000) < 150


def test_balance_corpus_deterministic_and_validates(spark):
    import pytest as _pytest

    from index_spark.operators.sample import balance_corpus, mixture_rates

    docs = _mix_docs(spark, {"a": 200, "b": 100})
    k1 = sorted(r["doc_id"] for r in
                balance_corpus(docs, {"a": 0.5, "b": 0.5}).collect())
    k2 = sorted(r["doc_id"] for r in
                balance_corpus(docs.repartition(7),
                               {"a": 0.5, "b": 0.5}).collect())
    assert k1 == k2                          # partitioning-invariant
    with _pytest.raises(ValueError):
        mixture_rates(docs, {})
    with _pytest.raises(ValueError):
        mixture_rates(docs, {"a": -0.1, "b": 1.1})
