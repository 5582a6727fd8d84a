"""Percolation: standing-query routing — batch vs naive oracle, and
stream-vs-batch parity (Kappa)."""

import pytest
from pyspark.sql import functions as F

from index_spark.functions.text import tokenize
from index_spark.operators.build import assign_doc_ids
from index_spark.operators.percolate import percolate, percolate_stream
from tests.oracle import OracleIndex

QUERIES = {
    0: "import return",
    1: "uniq7token",
    2: "def class if",
    3: "import numpy",          # absent term => no AND matches
    4: "café",
}


@pytest.fixture(scope="module")
def ids_and_oracle(spark, tiny_corpus):
    corpus_df = spark.createDataFrame(tiny_corpus)
    with_ids = assign_doc_ids(corpus_df).persist()
    with_ids.count()
    oracle = OracleIndex(
        list(tiny_corpus[["repo", "path", "content"]].itertuples(index=False)),
        stem=True)
    return with_ids, oracle


def naive_percolate(oracle: OracleIndex, queries, mode):
    out = set()
    for qid, q in queries.items():
        qterms = sorted(set(tokenize(q, stem=True)))
        if not qterms:
            continue
        sets = [set(oracle.tf.get(t, {})) for t in qterms]
        docs = (set.union(*sets) if mode == "or"
                else set.intersection(*sets))
        out |= {(qid, d) for d in docs}
    return out


@pytest.mark.parametrize("mode", ["and", "or"])
def test_percolate_matches_oracle(ids_and_oracle, mode):
    with_ids, oracle = ids_and_oracle
    got = {(r["query_id"], r["doc_id"])
           for r in percolate(with_ids, QUERIES, mode=mode).collect()}
    assert got == naive_percolate(oracle, QUERIES, mode)


def test_percolate_empty_queries(spark, ids_and_oracle):
    with_ids, _ = ids_and_oracle
    assert percolate(with_ids, {}).collect() == []


def test_percolate_stream_equals_batch(spark, tiny_corpus, tmp_path):
    """availableNow stream over two file batches routes exactly the
    docs the one-shot batch percolate routes."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ordered = tiny_corpus.sort_values(["repo", "path"]).reset_index(drop=True)
    half = len(ordered) // 2
    sub = ordered[["repo", "path", "content"]]
    spark.createDataFrame(sub.iloc[:half]).write.mode("append").parquet(src)
    spark.createDataFrame(sub.iloc[half:]).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    q = percolate_stream(spark, src, out, schema, QUERIES, mode="and")
    q.awaitTermination(120)

    got = {(r["query_id"], r["repo"], r["path"])
           for r in spark.read.parquet(f"{out}/matches").collect()}
    full = spark.createDataFrame(sub)
    b = percolate(assign_doc_ids(full), QUERIES, mode="and")
    docs = assign_doc_ids(full).select("doc_id", "repo", "path")
    expected = {(r["query_id"], r["repo"], r["path"])
                for r in b.join(docs, "doc_id").collect()}
    assert got == expected


DSL_QUERIES = {
    0: "+import +return -def",       # both required, def excluded
    1: "import return",              # bare OR
    2: "+uniq7token",                # rare required
    3: "+import -import",            # self-contradiction => empty
    4: "+import numpy",              # required + bare absent term
}


def naive_percolate_dsl(oracle, queries):
    from index_spark.operators.query import parse_query

    out = set()
    for qid, q in queries.items():
        req, opt, exc, _, _ = parse_query(q, stem=True)
        for d in range(oracle.n_docs):
            has = lambda t: d in oracle.tf.get(t, {})  # noqa: E731
            if any(has(t) for t in exc):
                continue
            if req:
                if all(has(t) for t in req):
                    out.add((qid, d))
            elif any(has(t) for t in opt):
                out.add((qid, d))
    return out


def test_percolate_dsl_matches_oracle(ids_and_oracle):
    from index_spark.operators.percolate import percolate_dsl

    with_ids, oracle = ids_and_oracle
    got = {(r["query_id"], r["doc_id"])
           for r in percolate_dsl(with_ids, DSL_QUERIES).collect()}
    assert got == naive_percolate_dsl(oracle, DSL_QUERIES)
    assert not any(q == 3 for q, _ in got)  # self-contradiction


def test_percolate_dsl_single_phrase_query(ids_and_oracle):
    """A lone quoted phrase routes (its terms gate as required; the
    positional check then narrows)."""
    from index_spark.operators.percolate import percolate_dsl

    with_ids, oracle = ids_and_oracle
    out = percolate_dsl(with_ids, {0: '"uniq7token import"'}).collect()
    assert isinstance(out, list)  # runs; content pinned in the big test


def naive_has_phrase(oracle_texts_tokens, d, ph):
    toks = oracle_texts_tokens[d]
    m = len(ph)
    return any(toks[i:i + m] == ph
               for i in range(len(toks) - m + 1))


def test_percolate_dsl_phrases(spark, tiny_corpus, ids_and_oracle):
    """Standing phrase queries: positive phrase gates consecutively,
    negated phrase excludes, both verified on candidates only."""
    from index_spark.operators.percolate import percolate_dsl

    with_ids, oracle = ids_and_oracle
    ordered = tiny_corpus.sort_values(["repo", "path"]).reset_index(drop=True)
    toks = [tokenize(t, stem=True) for t in ordered["content"]]
    queries = {0: '"import return"', 1: 'import -"import return"',
               2: '+return "def class"'}
    got = {(r["query_id"], r["doc_id"])
           for r in percolate_dsl(with_ids, queries).collect()}
    expected = set()
    ph_ir = tokenize("import return", stem=True)
    ph_dc = tokenize("def class", stem=True)
    for d in range(oracle.n_docs):
        has = lambda t: d in oracle.tf.get(t, {})  # noqa: E731
        if naive_has_phrase(toks, d, ph_ir):
            expected.add((0, d))
        if has("import") and not naive_has_phrase(toks, d, ph_ir):
            expected.add((1, d))
        if has("return") and naive_has_phrase(toks, d, ph_dc):
            expected.add((2, d))
    assert got == expected


def test_percolate_dsl_neg_phrase_only_raises(ids_and_oracle):
    import pytest as _pytest

    from index_spark.operators.percolate import percolate_dsl

    with_ids, _ = ids_and_oracle
    with _pytest.raises(ValueError, match="only negations"):
        percolate_dsl(with_ids, {0: '-"data table"'})
    # the SAME guard fires for an excluded-terms-only query (no
    # candidate selector either) — previously it silently matched nothing
    with _pytest.raises(ValueError, match="only negations"):
        percolate_dsl(with_ids, {0: "-data"})


def test_percolate_inverted_10k_standing(spark, ids_and_oracle):
    """Inverted percolation routes against a 10k-query standing set via
    the term->query posting relation: the standing set is a DataFrame
    (never a driver dict), the plan joins doc vocab to query postings
    (no 10k-term `isin` literal, no 10k-column aggregate), and matches
    agree with the bounded-dict path."""
    from pyspark.sql import functions as F

    from index_spark.operators.percolate import (
        build_query_postings,
        percolate,
        percolate_inverted,
    )

    with_ids, oracle = ids_and_oracle
    # 10k two-term conjunctive queries generated distributively from a
    # small term basis (100 x 100 combinations)
    basis = sorted(oracle.tf)[:100]
    arr = F.array(*[F.lit(t) for t in basis])
    standing = spark.range(10_000).select(
        F.col("id").alias("query_id"),
        F.concat_ws(" ",
                    F.element_at(arr, (F.col("id") % 100 + 1).cast("int")),
                    F.element_at(arr, (F.col("id") / 100 + 1).cast("int"))
                    ).alias("query"))
    qpost = build_query_postings(standing, stem=False, camel=False)
    got = percolate_inverted(with_ids, qpost, mode="and",
                             stem=False, camel=False)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert " IN (" not in plan, "driver-side vocabulary literal leaked"
    assert "hashjoin" in plan.lower() or "sortmergejoin" in plan.lower() \
        or "joi" in plan.lower()

    got_pairs = {(r["query_id"], r["doc_id"]) for r in got.collect()}
    # equivalence with the bounded-dict path on a 200-query sample
    sample_ids = list(range(0, 10_000, 50))
    qdict = {r["query_id"]: r["query"] for r in
             standing.filter(F.col("query_id").isin(sample_ids)).collect()}
    ref = {(r["query_id"], r["doc_id"]) for r in
           percolate(with_ids, qdict, mode="and",
                     stem=False, camel=False).collect()}
    got_sample = {(q, d) for q, d in got_pairs if q in set(sample_ids)}
    assert got_sample == ref
    assert got_pairs, "10k-query routing must produce matches"


def test_percolate_stream_inverted(spark, tiny_corpus, tmp_path):
    """Streaming routing against a pre-built term->query posting
    relation matches the batch inverted path exactly."""
    from index_spark.operators.percolate import (
        build_query_postings,
        percolate_inverted,
        percolate_stream,
    )

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    sub = tiny_corpus[["repo", "path", "content"]]
    spark.createDataFrame(sub).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    standing = spark.createDataFrame(
        [(i, q) for i, q in QUERIES.items()], "query_id long, query string")
    qpost = build_query_postings(standing).persist()
    qpost.count()

    q = percolate_stream(spark, src, out, schema, mode="and",
                         query_postings=qpost)
    q.awaitTermination(120)
    got = {(r["query_id"], r["repo"], r["path"])
           for r in spark.read.parquet(f"{out}/matches").collect()}
    full = assign_doc_ids(spark.createDataFrame(sub))
    b = percolate_inverted(full, qpost, mode="and")
    docs = full.select("doc_id", "repo", "path")
    expected = {(r["query_id"], r["repo"], r["path"])
                for r in b.join(docs, "doc_id").collect()}
    assert got == expected and got
    qpost.unpersist()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="exactly one"):
        percolate_stream(spark, src, out, schema, queries=QUERIES,
                         query_postings=qpost)
