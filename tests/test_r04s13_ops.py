"""Round-4 session-13 surfaces: the ES terms_set query (per-doc
minimum_should_match_field via the kind-3 shard-cogroup channel), the
adjacency_matrix pairwise filter-intersection aggregation, and the
watermarked streaming dedup gate — each pinned against a brute-force
python reference."""

import pytest
from pyspark.sql import functions as F

from index_spark.functions.text import tokenize
from index_spark.operators.analytics import adjacency_matrix
from index_spark.operators.build import build_index
from index_spark.operators.query import search


@pytest.fixture(scope="module")
def built(spark, tiny_corpus):
    corpus = spark.createDataFrame(tiny_corpus)
    docs, index, stats = build_index(corpus, stem=False, camel=False,
                                     shard_size=32)
    return tiny_corpus, docs.persist(), index.persist(), stats


QUERY = "import return def"


def _present(tiny_corpus, terms):
    out = {}
    for i, row in enumerate(tiny_corpus.itertuples(index=False)):
        toks = set(tokenize(row.content, stem=False, camel=False))
        out[i] = {t for t in terms if t in toks}
    return out


# ---------------------------------------------------------- terms_set

def test_terms_set_per_doc_thresholds_gate(spark, built):
    """required = 1 + doc_id % 3 — every doc gated by its OWN count."""
    tiny_corpus, docs, index, stats = built
    qterms = sorted(set(tokenize(QUERY, stem=False, camel=False)))
    present = _present(tiny_corpus, qterms)
    req = spark.createDataFrame(
        [(d, 1 + d % 3) for d in present], "doc_id long, required long")
    got = {r.doc_id for r in
           search(index, docs, stats, QUERY, k=10_000, stem=False,
                  camel=False, shard_size=32, min_match_df=req).collect()}
    want = {d for d, s in present.items() if len(s) >= 1 + d % 3}
    assert got == want
    assert want  # the gate actually separates (fixture sanity)
    assert got != {d for d, s in present.items() if s}  # not plain OR


def test_terms_set_scores_are_full_or_scores_and_population(spark, built):
    tiny_corpus, docs, index, stats = built
    or_rows = {r.doc_id: r.score
               for r in search(index, docs, stats, QUERY, k=10_000,
                               stem=False, camel=False, shard_size=32)
               .collect()}
    # absent docs never rank, required=0 rows are unconditionally
    # eligible (any doc with >= 1 matching term)
    some = sorted(or_rows)[: len(or_rows) // 2]
    req = spark.createDataFrame([(d, 0) for d in some],
                                "doc_id long, required long")
    rows = search(index, docs, stats, QUERY, k=10_000, stem=False,
                  camel=False, shard_size=32, min_match_df=req).collect()
    assert {r.doc_id for r in rows} == set(some)
    assert all(or_rows[r.doc_id] == r.score for r in rows)


def test_terms_set_composes_with_tombstones(spark, built):
    tiny_corpus, docs, index, stats = built
    qterms = sorted(set(tokenize(QUERY, stem=False, camel=False)))
    present = {d for d, s in _present(tiny_corpus, qterms).items()
               if len(s) >= 1}
    req = spark.createDataFrame([(d, 1) for d in sorted(present)],
                                "doc_id long, required long")
    dead = sorted(present)[:2]
    tomb = spark.createDataFrame([(d,) for d in dead], "doc_id long")
    got = {r.doc_id for r in
           search(index, docs, stats, QUERY, k=10_000, stem=False,
                  camel=False, shard_size=32, min_match_df=req,
                  tombstones=tomb).collect()}
    assert got == present - set(dead)


def test_terms_set_validation(spark, built):
    _, docs, index, stats = built
    req = spark.createDataFrame([(0, 1)], "doc_id long, required long")
    with pytest.raises(ValueError, match="mode='or'"):
        search(index, docs, stats, QUERY, mode="and", min_match_df=req,
               shard_size=32).collect()
    with pytest.raises(ValueError, match="mutually"):
        search(index, docs, stats, QUERY, min_match=2, min_match_df=req,
               shard_size=32).collect()


# ---------------------------------------------------- adjacency_matrix

def test_adjacency_matrix_pinned(spark):
    df = spark.createDataFrame(
        [("en", 10), ("en", 900), ("de", 900), ("en", 900), ("fr", 5)],
        "lang string, n long")
    got = [(r.key, r.doc_count) for r in adjacency_matrix(
        df, {"en": "lang = 'en'", "big": "n > 100"}).collect()]
    # en: rows 0,1,3; big: rows 1,2,3; en&big: rows 1,3 — keys ascending
    assert got == [("big", 3), ("big&en", 2), ("en", 3)]


def test_adjacency_matrix_matches_bruteforce(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    filters = {"en": "lang = 'en'", "long": "n_chars > 300",
               "s1": "source = 'src1'"}
    got = {r.key: r.doc_count
           for r in adjacency_matrix(docs, filters).collect()}
    rows = docs.select("lang", "n_chars", "source").collect()
    names = sorted(filters)
    import itertools
    want = {}
    for r in rows:
        m = [n for n in names
             if (n == "en" and r.lang == "en")
             or (n == "long" and r.n_chars > 300)
             or (n == "s1" and r.source == "src1")]
        for a in m:
            want[a] = want.get(a, 0) + 1
        for a, b in itertools.combinations(m, 2):
            want[f"{a}&{b}"] = want.get(f"{a}&{b}", 0) + 1
    assert got == {k: v for k, v in want.items() if v > 0}


def test_adjacency_matrix_validation(spark):
    df = spark.createDataFrame([("en",)], "lang string")
    with pytest.raises(ValueError, match="at least one"):
        adjacency_matrix(df, {})
    with pytest.raises(ValueError, match="must not contain"):
        adjacency_matrix(df, {"a&b": "lang = 'en'"})
    with pytest.raises(ValueError, match="too many"):
        adjacency_matrix(df, {f"f{i}": "1=1" for i in range(101)})


# ------------------------------------------------------- dedup (batch)

def test_dedup_events_stream_batch_form(spark):
    from index_spark.streaming.aggregate import dedup_events_stream

    ev = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:00:05"),
         (2, "2024-01-01 10:01:00")],
        "event_id long, ts string")
    out = dedup_events_stream(ev, ["event_id"], delay="10 minutes")
    assert sorted(r.event_id for r in out.collect()) == [1, 2]
    with pytest.raises(ValueError, match="at least one"):
        dedup_events_stream(ev, [])
