"""Tokenizer/normalizer pinned behavior."""

import pandas as pd

from index_spark.functions.text import normalize_text, simple_tokens, tokenize, tokenize_series


def test_normalize_nfkd_casefold_stripmark():
    assert normalize_text("café") == "cafe"
    assert normalize_text("naïve") == "naive"
    assert normalize_text("Größe") == "grosse"  # casefold ß -> ss, ö -> o
    assert normalize_text("Résumé") == "resume"


def test_identifier_splitting():
    assert tokenize("getNodeValue") == ["get", "node", "value"]
    assert tokenize("parse_tree33") == ["parse", "tree33"]
    assert tokenize("HTTPServer") == ["http", "server"]
    assert tokenize("camelCase snake_case") == ["camel", "case", "snake", "case"]


def test_tokenize_stemming():
    assert tokenize("returning connections", stem=True) == ["return", "connect"]


def test_tokenize_punct_and_empty():
    assert tokenize("") == []
    assert tokenize("  (a, b) -> c!  ") == ["a", "b", "c"]


def test_simple_tokens_sql_parity():
    # must equal: filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')
    assert simple_tokens("Foo, bar! baz42") == ["foo", "bar", "baz42"]
    assert simple_tokens("") == []
    assert simple_tokens("---") == []


def test_tokenize_series_matches_scalar():
    texts = pd.Series(["returning connections", "getNodeValue runs", ""])
    got = tokenize_series(texts, stem=True)
    assert list(got) == [tokenize(t, stem=True) for t in texts]
