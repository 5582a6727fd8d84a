"""Text normalization + tokenization (build-side and query-side share this).

Mirrors the capability of the reference normalizer
(/root/reference/stemmer/stemmer.cpp:89-113: utf8proc NFKD + compatibility
+ casefold + strip combining marks, then keep only [a-z0-9]) re-expressed
for Python/Arrow:

- ``normalize_text``: NFKD -> casefold -> drop combining marks (so
  ``café`` -> ``cafe``, ``Größe`` -> ``grosse``).
- ``tokenize``: split camelCase / snake_case identifiers (source-code
  corpus; FIXTURES.md §1 requires identifier splitting), then extract
  ``[a-z0-9]+`` runs.
- ``tokenize_simple``: the SQL-parity tokenizer — ``lower(text)`` split on
  ``[^a-z0-9]+`` — used by the DuckDB-oracle harness where both engines
  must agree exactly (no unicode folding, expressible in ANSI SQL).

The pandas UDF wrappers operate Series -> Series over Arrow batches; the
per-unique-vocabulary trick in :mod:`index_spark.functions.porter` keeps
stemming off the per-token path.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pandas as pd

_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])")
_TOKEN_RE = re.compile(r"[a-z0-9]+")
# single-pass equivalent of camel-split + lower + [a-z0-9]+ extraction,
# valid on ASCII text: an acronym run, a Capitalized run, or a lower run
_FAST_RE = re.compile(
    r"[A-Z]{2,}[0-9][a-z0-9]*|[A-Z]{2,}(?![a-z])|[A-Z][a-z0-9]*|[a-z0-9]+")


def normalize_text(s: str) -> str:
    """NFKD + casefold + strip combining marks (pinned normalizer).

    ASCII fast path: on ASCII input the full pipeline reduces to
    ``str.lower`` (NFKD and mark-stripping are identity, casefold ==
    lower), and source code is overwhelmingly ASCII — this skips the
    per-character combining scan for the common case."""
    if s.isascii():
        return s.lower()
    d = unicodedata.normalize("NFKD", s).casefold()
    return "".join(ch for ch in d if not unicodedata.combining(ch))


def tokenize(text: str, stem: bool = False) -> list[str]:
    """Full build tokenizer: identifier split -> normalize -> [a-z0-9]+ runs.

    ASCII fast path does it in one findall (source code is ~all ASCII);
    rows with non-ASCII take the full camel-split -> NFKD -> extract
    pipeline so ``café``/``Größe`` fold correctly."""
    from index_spark.functions.porter import stem_word

    if text.isascii():
        toks = [t.lower() for t in _FAST_RE.findall(text)]
    else:
        split = _CAMEL_RE.sub(" ", text)
        norm = normalize_text(split)
        toks = _TOKEN_RE.findall(norm)
    if stem:
        toks = [stem_word(t) for t in toks]
    return toks


def tokenize_flat(texts, stem: bool = True):
    """Tokenize a batch -> (flat_tokens ndarray[object], lens ndarray).

    Normalization runs per row (regex/str ops); stemming runs once per
    *unique* token of the whole batch via hash-based ``pd.factorize``
    (Zipf dedup — O(n), unlike sort-based np.unique which goes
    superlinear on multi-million-string object arrays)."""
    token_lists = [tokenize(t or "") for t in texts]
    lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64,
                       count=len(token_lists))
    flat = np.empty(int(lens.sum()), dtype=object)
    pos = 0
    for lst in token_lists:
        flat[pos : pos + len(lst)] = lst
        pos += len(lst)
    if stem and flat.size:
        from index_spark.functions.porter import stem_word

        codes, uniques = pd.factorize(flat)
        stemmed = np.array([stem_word(w) for w in uniques], dtype=object)
        flat = stemmed[codes]
    return flat, lens


def tokenize_series(texts: pd.Series, stem: bool = True) -> pd.Series:
    """Series[str] -> Series[list[str]] — body of the build pandas UDF."""
    flat, lens = tokenize_flat(texts, stem=stem)
    bounds = np.cumsum(lens)[:-1]
    out = [list(chunk) for chunk in np.split(flat, bounds)]
    return pd.Series(out, index=texts.index)


def simple_tokens(text: str) -> list[str]:
    """SQL-parity tokenizer: lower, split on non-[a-z0-9], drop empties.

    Equivalent Spark SQL:  filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')
    Equivalent DuckDB SQL: list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')
    """
    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]
