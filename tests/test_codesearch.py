"""Trigram substring/regex search over raw text (operators/
codesearch.py): the candidate gate must never lose a true match —
index-gated results are pinned equal to plain scans throughout."""

import random

import pytest
from pyspark.sql import functions as F

from index_spark.operators.codesearch import (
    build_substring_index,
    char_trigrams,
    grep_search,
    regex_literal_runs,
    substring_candidates,
    substring_search,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(7)
    words = ["data", "table", "query", "strcpy(", "tableName.x",
             "alpha", "beta", "SELECT *", "x += 1;"]
    rows = [(i, " ".join(rng.choice(words)
                         for _ in range(rng.randint(0, 30))))
            for i in range(300)]
    rows += [(300, ""), (301, "ab"), (302, "data tab")]
    df = spark.createDataFrame(rows, "doc_id long, text string").persist()
    df.count()
    return df


@pytest.fixture(scope="module")
def trgm(corpus):
    t = build_substring_index(corpus).persist()
    t.count()
    return t


def test_char_trigrams():
    assert char_trigrams("abcd") == ["abc", "bcd"]
    assert char_trigrams("aaaa") == ["aaa"]  # distinct, first-occurrence
    assert char_trigrams("ab") == []


def test_index_rows_are_distinct_grams(corpus, trgm):
    row = corpus.filter("doc_id = 302").first()
    got = sorted(r["gram"] for r in
                 trgm.filter("doc_id = 302").collect())
    assert got == sorted(char_trigrams(row["text"]))
    # per-doc distinctness
    assert trgm.count() == trgm.distinct().count()


@pytest.mark.parametrize("pat", ["data tab", "strcpy(", "tableName.x",
                                 "SELECT *", "e que"])
def test_indexed_equals_scan(corpus, trgm, pat):
    via_index = substring_search(corpus, pat, trgm=trgm).collect()
    via_scan = substring_search(corpus, pat).collect()
    assert [(r["doc_id"], r["n_occurrences"]) for r in via_index] == \
           [(r["doc_id"], r["n_occurrences"]) for r in via_scan]
    # occurrence counts match python's non-overlapping count
    texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
    for r in via_index:
        assert r["n_occurrences"] == texts[r["doc_id"]].count(pat) > 0


def test_short_pattern_falls_back_and_validates(corpus, trgm):
    got = substring_search(corpus, "ab", trgm=trgm).collect()
    texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
    assert {r["doc_id"] for r in got} == \
           {d for d, t in texts.items() if "ab" in t}
    with pytest.raises(ValueError, match="empty"):
        substring_search(corpus, "")
    with pytest.raises(ValueError, match="trigrams"):
        substring_candidates(trgm, "ab")


def test_regex_literal_runs():
    assert regex_literal_runs("table[0-9a-f]* quer") == ["table", " quer"]
    assert regex_literal_runs("tables?") == ["table"]
    assert regex_literal_runs(r"strcpy\(") == ["strcpy("]
    assert regex_literal_runs("a|btable") == []      # alternation defeats
    assert regex_literal_runs(r"\d+foo") == ["foo"]  # class escape ends run
    assert regex_literal_runs("ab") == []            # too short


@pytest.mark.parametrize("pat", [r"strcpy\(", "table[A-Za-z]*\\.x",
                                 "data (table|query)"])
def test_regex_grep_equals_scan(corpus, trgm, pat):
    via_index = [r["doc_id"] for r in
                 grep_search(corpus, pat, regex=True, trgm=trgm).collect()]
    via_scan = [r["doc_id"] for r in
                corpus.filter(F.col("text").rlike(pat))
                .select("doc_id").orderBy("doc_id").collect()]
    assert via_index == via_scan and via_scan  # non-empty by construction


def test_candidate_gate_prunes(corpus, trgm):
    """The gate really is a subset: candidates for a selective pattern
    are far fewer than the corpus, and every true match is inside."""
    cand = {r["doc_id"] for r in
            substring_candidates(trgm, "tableName.x").collect()}
    truth = {r["doc_id"] for r in
             corpus.filter(F.col("text").contains("tableName.x"))
             .select("doc_id").collect()}
    assert truth <= cand
    assert len(cand) < corpus.count()


# ------------------------------------------------------------ grep -n

@pytest.fixture(scope="module")
def multiline(spark):
    rng = random.Random(11)
    words = ["data", "table", "strcpy(", "SELECT *", "x += 1;", "beta"]
    rows = []
    for i in range(120):
        lines = [" ".join(rng.choice(words) for _ in range(rng.randint(1, 5)))
                 for _ in range(rng.randint(0, 6))]
        rows.append((i, "\n".join(lines)))
    rows += [(120, ""), (121, "data\n\ndata")]  # empty doc, empty line
    df = spark.createDataFrame(rows, "doc_id long, text string").persist()
    df.count()
    return df


def _grep_n_oracle(rows, pattern, regex=False):
    import re as _re
    out = []
    for doc_id, text in rows:
        for no, line in enumerate(text.split("\n"), start=1):
            hit = (_re.search(pattern, line) if regex
                   else pattern in line)
            if hit:
                out.append((doc_id, no, line))
    return sorted(out)


def test_grep_lines_matches_python_grep(multiline):
    from index_spark.operators.codesearch import grep_lines

    rows = [(r.doc_id, r.text) for r in multiline.collect()]
    trgm = build_substring_index(multiline)
    for pat in ["data", "strcpy(", "ab"]:
        got = sorted((r.doc_id, r.line_no, r.line) for r in
                     grep_lines(multiline, pat, trgm=trgm).collect())
        assert got == _grep_n_oracle(rows, pat), pat
        # identical without the gram gate (fallback path)
        ungated = sorted((r.doc_id, r.line_no, r.line) for r in
                         grep_lines(multiline, pat).collect())
        assert ungated == got, pat


def test_grep_lines_regex_and_line_numbering(multiline):
    from index_spark.operators.codesearch import grep_lines

    rows = [(r.doc_id, r.text) for r in multiline.collect()]
    trgm = build_substring_index(multiline)
    pat = r"data\s+table"
    got = sorted((r.doc_id, r.line_no, r.line) for r in
                 grep_lines(multiline, pat, regex=True,
                            trgm=trgm).collect())
    assert got == _grep_n_oracle(rows, pat, regex=True)
    # the doc with a leading/blank line numbers from 1 and skips the
    # empty line for a non-empty pattern
    d121 = sorted((r.line_no, r.line) for r in
                  grep_lines(multiline, "data").collect()
                  if r.doc_id == 121)
    assert d121 == [(1, "data"), (3, "data")]
