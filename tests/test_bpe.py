"""BPE vocabulary induction: pinned merge contract + tokenization."""

import pytest
from pyspark.sql import functions as F

from index_spark.operators.bpe import apply_bpe, learn_bpe, word_freqs


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _python_bpe(texts, n_merges):
    """Reference implementation of the pinned contract."""
    import re
    from collections import Counter

    freqs = Counter(w for t in texts
                    for w in re.split(r"[^a-z0-9]+", t.lower()) if w)
    state = {w: list(w) for w in freqs}
    rules = []
    for rank in range(1, n_merges + 1):
        counts = Counter()
        for w, syms in state.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += freqs[w]
        if not counts:
            break
        (lhs, rhs), c = min(counts.items(),
                            key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        rules.append((rank, lhs, rhs, c))
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out
    return rules


def test_learn_bpe_hand_corpus(spark):
    docs = _docs(spark, ["low low lower"])
    got = [(r.rank, r.lhs, r.rhs, r.pair_count)
           for r in learn_bpe(docs, n_merges=3).collect()]
    assert got == [(1, "l", "o", 3), (2, "lo", "w", 3), (3, "e", "r", 1)]


def test_learn_bpe_matches_python_reference(spark):
    texts = ["the cat sat on the mat", "the cats eat fat rats",
             "a mat a cat a rat", "seat the cat neatly"]
    got = [(r.rank, r.lhs, r.rhs, r.pair_count)
           for r in learn_bpe(_docs(spark, texts), n_merges=6).collect()]
    assert got == _python_bpe(texts, 6)


def test_learn_bpe_overlap_semantics(spark):
    # 'aaa': overlapping pair count 2, but the merge is left-to-right
    # non-overlapping -> 'aa a'
    docs = _docs(spark, ["aaa"])
    m = learn_bpe(docs, n_merges=1).collect()[0]
    assert (m.lhs, m.rhs, m.pair_count) == ("a", "a", 2)
    assert apply_bpe(docs, [("a", "a")]).collect()[0].tokens == ["aa", "a"]


def test_apply_bpe_repeated_pairs_merge_like_reference(spark):
    # the cases a single-space encoding gets WRONG: immediately repeated
    # pairs must all merge (scan resumes on the next delimiter)
    docs = _docs(spark, ["aaaa aaaaa abab ababab"])
    toks = apply_bpe(docs, [("a", "a")]).collect()[0].tokens
    assert toks == ["aa", "aa", "aa", "aa", "a",
                    "a", "b", "a", "b", "a", "b", "a", "b", "a", "b"]
    toks2 = apply_bpe(docs, [("a", "b")]).collect()[0].tokens
    assert toks2 == ["a", "a", "a", "a", "a", "a", "a", "a", "a",
                     "ab", "ab", "ab", "ab", "ab"]


def test_learn_bpe_matches_python_reference_on_repetitions(spark):
    texts = ["aaaa abab banana bananas", "aa ab ba anana", "banana aaaa"]
    got = [(r.rank, r.lhs, r.rhs, r.pair_count)
           for r in learn_bpe(_docs(spark, texts), n_merges=5).collect()]
    assert got == _python_bpe(texts, 5)


def test_learn_bpe_exhausts_pairs_early(spark):
    # single-char vocabulary: no adjacent pairs at all
    got = learn_bpe(_docs(spark, ["a b c a"]), n_merges=5).collect()
    assert got == []


def test_apply_bpe_preserves_word_order_and_is_map_only(spark):
    docs = _docs(spark, ["low lower lowest slow"])
    out = apply_bpe(docs, [("l", "o"), ("lo", "w")])
    assert out.collect()[0].tokens == [
        "low", "low", "e", "r", "low", "e", "s", "t", "s", "low"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # tokenization never shuffles


def test_apply_bpe_rejects_unsafe_symbols(spark):
    with pytest.raises(ValueError):
        apply_bpe(_docs(spark, ["x"]), [("a'", "b")])


def test_word_freqs_counts_occurrences(spark):
    got = {r.word: r.freq
           for r in word_freqs(_docs(spark, ["a b a", "b!a"])).collect()}
    assert got == {"a": 3, "b": 2}
