"""Exact-n-gram hygiene tier: decontamination, duplicated-span
coverage (operators/contamination.py), PII scrubbing (operators/
scrub.py) — hand-computable micro-corpora throughout."""

import pytest
from pyspark.sql import functions as F

from index_spark.operators.contamination import (decontaminate, doc_grams,
                                                 duplicated_spans)
from index_spark.operators.scrub import pii_stats, scrub_pii


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# doc_grams
# ---------------------------------------------------------------------------


def test_doc_grams_positions(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "x y"), (3, "")])
    got = {(r.doc_id, r.pos, r.gram)
           for r in doc_grams(df, 3, with_pos=True).collect()}
    # doc 2 (< n tokens) and doc 3 (empty) contribute nothing
    assert got == {(1, 1, "a b c"), (1, 2, "b c d")}


def test_doc_grams_tokenizer_parity(spark):
    # lower + [a-z0-9]+ runs, same spec as the engine tokenizer
    df = _docs(spark, [(1, "The Quick, Brown-Fox!")])
    got = [r.gram for r in doc_grams(df, 2).collect()]
    assert got == ["the quick", "quick brown", "brown fox"]


# ---------------------------------------------------------------------------
# decontaminate
# ---------------------------------------------------------------------------


def test_decontaminate_counts(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta")])
    train = _docs(spark, [
        (1, "alpha beta gamma delta epsilon"),  # 2 shared 3-grams
        (2, "zeta eta theta iota"),             # 0 shared
        (3, "x alpha beta gamma y"),            # 1 shared
    ])
    got = {r.doc_id: (r.n_overlap, r.contaminated)
           for r in decontaminate(train, bench, n=3).collect()}
    assert got == {1: (2, True), 2: (0, False), 3: (1, True)}


def test_decontaminate_distinct_grams_per_doc(spark):
    # a repeated overlapping gram in one train doc counts ONCE
    bench = _docs(spark, [(100, "a b c")])
    train = _docs(spark, [(1, "a b c z a b c")])
    [row] = decontaminate(train, bench, n=3).collect()
    assert (row.n_overlap, row.contaminated) == (1, True)


def test_decontaminate_min_overlap_threshold(spark):
    bench = _docs(spark, [(100, "a b c d")])
    train = _docs(spark, [(1, "a b c x"), (2, "a b c d x")])
    got = {r.doc_id: r.contaminated
           for r in decontaminate(train, bench, n=3, min_overlap=2).collect()}
    assert got == {1: False, 2: True}


# ---------------------------------------------------------------------------
# duplicated_spans
# ---------------------------------------------------------------------------


def test_duplicated_spans_union_coverage(spark):
    # "a b c d e" appears in docs 1 and 2 -> its two 4-grams are each
    # duplicated; doc 1's covered indexes are the UNION [1..5], not 8
    df = _docs(spark, [
        (1, "a b c d e p q r"),
        (2, "z a b c d e"),
        (3, "u v w x y"),
    ])
    got = {r.doc_id: (r.n_tokens, r.dup_tokens, r.dup_ratio)
           for r in duplicated_spans(df, n=4, min_count=2).collect()}
    assert got[1] == (8, 5, 0.625)
    assert got[2] == (6, 5, round(5 / 6, 4))
    assert got[3] == (5, 0, 0.0)


def test_duplicated_spans_within_doc_repeat(spark):
    # min_count counts OCCURRENCES, not docs: a span repeated inside one
    # doc is duplicated text too (Lee et al. count all suffix matches)
    df = _docs(spark, [(1, "a b c x a b c"), (2, "m n o p")])
    got = {r.doc_id: r.dup_tokens
           for r in duplicated_spans(df, n=3, min_count=2).collect()}
    assert got == {1: 6, 2: 0}  # [1..3] and [5..7]


def test_duplicated_spans_empty_and_short(spark):
    df = _docs(spark, [(1, ""), (2, "a b")])
    got = {r.doc_id: (r.n_tokens, r.dup_tokens, r.dup_ratio)
           for r in duplicated_spans(df, n=3).collect()}
    assert got == {1: (0, 0, 0.0), 2: (2, 0, 0.0)}


def test_remove_duplicated_spans_hand_example(spark):
    from index_spark.operators.contamination import remove_duplicated_spans

    df = _docs(spark, [
        (1, "a b c d e p q r"),
        (2, "z a b c d e"),
        (3, "u v w x y"),
    ])
    got = {r.doc_id: (r.n_tokens, r.kept_tokens, r.clean_text)
           for r in remove_duplicated_spans(df, n=4, min_count=2).collect()}
    # the shared "a b c d e" run is removed, the rest survives in order
    assert got[1] == (8, 3, "p q r")
    assert got[2] == (6, 1, "z")
    assert got[3] == (5, 5, "u v w x y")


def test_remove_duplicated_spans_consistent_with_coverage(spark):
    from index_spark.operators.contamination import remove_duplicated_spans

    df = _docs(spark, [(i, t) for i, t in enumerate(
        ["a b c d e f", "x a b c d y", "q r s t", "a b c d e f", ""])])
    cov = {r.doc_id: (r.n_tokens, r.dup_tokens)
           for r in duplicated_spans(df, n=4).collect()}
    rem = {r.doc_id: (r.n_tokens, r.kept_tokens)
           for r in remove_duplicated_spans(df, n=4).collect()}
    assert set(cov) == set(rem)
    for d, (nt, dup) in cov.items():
        assert rem[d] == (nt, nt - dup)


def test_remove_duplicated_spans_fully_duplicated_doc(spark):
    from index_spark.operators.contamination import remove_duplicated_spans

    df = _docs(spark, [(1, "a b c"), (2, "a b c")])
    got = {r.doc_id: (r.kept_tokens, r.clean_text)
           for r in remove_duplicated_spans(df, n=3, min_count=2).collect()}
    assert got == {1: (0, ""), 2: (0, "")}


def test_duplicated_spans_hashed_parity(spark):
    df = _docs(spark, [(i, t) for i, t in enumerate(
        ["a b c d e f", "x a b c d y", "q r s t", "a b c d e f"])])
    plain = sorted(map(tuple, duplicated_spans(df, n=4).collect()))
    hashed = sorted(map(tuple, duplicated_spans(df, n=4, hashed=True).collect()))
    assert plain == hashed


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------


def test_pii_stats_counts(spark):
    df = _docs(spark, [
        (1, "mail bob.smith+x@sub.example.org and carol@ex.io thanks"),
        (2, "host 192.168.0.1 peer 10.0.0.255"),
        (3, "call +15551234567 or +442079460000"),
        (4, "nothing here"),
    ])
    got = {r.doc_id: (r.n_email, r.n_ipv4, r.n_phone, r.n_pii)
           for r in pii_stats(df).collect()}
    assert got == {1: (2, 0, 0, 2), 2: (0, 2, 0, 2),
                   3: (0, 0, 2, 2), 4: (0, 0, 0, 0)}


def test_scrub_pii_redacts_in_order(spark):
    # the email contains dotted digits; email-first ordering keeps the
    # IP pattern from eating it ("bob.1.2.3.4@ex.io" stays one [EMAIL])
    df = _docs(spark, [(1, "bob.1.2.3.4@ex.io then 1.2.3.4 then +123456789")])
    [row] = scrub_pii(df).collect()
    assert row.scrubbed == "[EMAIL] then [IP] then [PHONE]"


def test_scrub_pii_passthrough(spark):
    df = _docs(spark, [(1, "plain text, no pii at all")])
    [row] = scrub_pii(df).collect()
    assert row.scrubbed == row.text


# ---------------------------------------------------------------------------
# randomized properties (brute-force references; small-vocab corpora
# maximize gram collisions, the interesting regime)
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_VOCAB = ["a", "b", "c"]
_doc = st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=12)
_corpus = st.lists(_doc, min_size=1, max_size=8)


def _brute_spans(texts, n, min_count):
    from collections import Counter
    toks = [t.split() for t in texts]
    occ = [[(i, " ".join(ts[i:i + n])) for i in range(len(ts) - n + 1)]
           for ts in toks]
    freq = Counter(g for doc in occ for _, g in doc)
    out = {}
    for d, ts in enumerate(toks):
        covered = set()
        for i, g in occ[d]:
            if freq[g] >= min_count:
                covered.update(range(i, i + n))
        ratio = round(len(covered) / len(ts), 4) if ts else 0.0
        out[d] = (len(ts), len(covered), ratio)
    return out


@settings(max_examples=8, deadline=None)
@given(_corpus, st.integers(2, 4))
def test_duplicated_spans_matches_brute_force(spark, docs, n):
    texts = [" ".join(d) for d in docs]
    df = _docs(spark, list(enumerate(texts)))
    got = {r.doc_id: (r.n_tokens, r.dup_tokens, r.dup_ratio)
           for r in duplicated_spans(df, n=n, min_count=2).collect()}
    assert got == _brute_spans(texts, n, 2)


@settings(max_examples=8, deadline=None)
@given(_corpus, _corpus, st.integers(2, 3))
def test_decontaminate_matches_brute_force(spark, train, bench, n):
    ttexts = [" ".join(d) for d in train]
    btexts = [" ".join(d) for d in bench]
    bgrams = {" ".join(d[i:i + n]) for d in bench
              for i in range(len(d) - n + 1)}
    want = {}
    for i, d in enumerate(train):
        mine = {" ".join(d[j:j + n]) for j in range(len(d) - n + 1)}
        k = len(mine & bgrams)
        want[i] = (k, k >= 1)
    got = {r.doc_id: (r.n_overlap, r.contaminated) for r in decontaminate(
        _docs(spark, list(enumerate(ttexts))),
        _docs(spark, list(enumerate(btexts))), n=n).collect()}
    assert got == want
