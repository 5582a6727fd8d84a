"""Pinned single-threaded oracle: tokenizer -> index -> BM25 top-k.

This is the executable spec that the Spark engine must match
rank-identically (docID sequence equal, scores within 1e-9). It is
deliberately simple scalar Python — dicts and sorted lists, no Spark, no
clever vectorization — so its correctness is auditable by eye.

Pinned scoring spec (SURVEY.md §3.4; the reference's C++ ranker is not in
the snapshot, so this oracle *is* the reference for rank-identity):

- doc_id  = 0-based rank of (repo, path) under lexicographic order
- doc_len = token count after the build tokenizer (stem setting matches)
- BM25: k1 = 1.2, b = 0.75
    idf(t)    = ln((N - df + 0.5) / (df + 0.5) + 1)
    score(D,Q)= sum_t idf(t) * tf / (tf + k1 * (1 - b + b * dl/avgdl))
  summed in ascending term order (float64) — the engine pins the same
  summation order so scores are bit-comparable.
- top-k: descending score, ties by ascending doc_id.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from index_spark.functions.text import tokenize

K1 = 1.2
B = 0.75


class OracleIndex:
    def __init__(self, corpus_rows, stem: bool = True):
        """corpus_rows: iterable of (repo, path, content)."""
        ordered = sorted(corpus_rows, key=lambda r: (r[0], r[1]))
        self.doc_keys = [(r[0], r[1]) for r in ordered]
        self.tf: dict[str, dict[int, int]] = defaultdict(dict)
        self.doc_len: list[int] = []
        self.stem = stem
        for doc_id, row in enumerate(ordered):
            toks = tokenize(row[2], stem=stem)
            self.doc_len.append(len(toks))
            for term, tf in Counter(toks).items():
                self.tf[term][doc_id] = tf
        self.n_docs = len(ordered)
        self.avgdl = sum(self.doc_len) / max(self.n_docs, 1)

    def df(self, term: str) -> int:
        return len(self.tf.get(term, {}))

    def idf(self, term: str) -> float:
        df = self.df(term)
        return math.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Exhaustive DAAT scoring; returns [(doc_id, score)] of length <=k."""
        qterms = sorted(set(tokenize(query, stem=self.stem)))
        scores: dict[int, float] = defaultdict(float)
        for term in qterms:  # ascending term order => pinned summation order
            postings = self.tf.get(term)
            if not postings:
                continue
            idf = self.idf(term)
            for doc_id, tf in postings.items():
                dl = self.doc_len[doc_id]
                denom = tf + K1 * (1.0 - B + B * dl / self.avgdl)
                scores[doc_id] += idf * tf / denom
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]


PINNED_QUERIES = [
    "import",                 # single hot term
    "return",                 # single hot term
    "def class",              # two hot terms
    "public static void",     # three-term conjunction
    "import numpy",           # hot + absent term
    "getNode42",              # identifier (camelCase split => get node 42)
    "parse_tree33",           # snake_case identifier
    "café",                   # non-ASCII, NFKD => cafe
    "Größe",                  # non-ASCII, strip mark + ss fold
    "zzzznotaterm",           # absent term => empty result
    "uniq7token",             # rare one-doc term
    "uniq11token import",     # rare + hot
    "returning connections",  # stem-sensitive => return connect
    "query score rank",
    "hash map tree",
    "struct interface",
    "read write scan",
    "token text data",
    "build flush chunk",
    "merge split index",
]
