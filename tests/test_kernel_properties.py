"""Randomized kernel-identity properties (no Spark in the loop):

* restricted probe kernel == exhaustive+filter on random shards;
* sloppy-phrase kernel == naive DP over a random small-vocab corpus
  (one Spark build, many random phrase/gap probes).
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from index_spark.operators.build import _blob_rows
from index_spark.operators.maintenance import (
    _as_dicts_blocks,
    _as_dicts_skips,
)
from index_spark.operators.query import (
    _score_shard_exhaustive,
    _score_shard_restricted,
)


def _shard_pdf(rng, n_docs, n_terms):
    rows = []
    for t in range(n_terms):
        docs = np.flatnonzero(rng.random(n_docs)
                              < rng.uniform(0.05, 0.9)).astype(np.int64)
        if docs.size == 0:
            continue
        tfs = rng.integers(1, 9, docs.size).astype(np.int64)
        dls = rng.integers(20, 300, docs.size).astype(np.int64)
        r = _blob_rows(np.array([f"t{t:02d}"], dtype=object),
                       np.zeros(docs.size, np.int64), docs, tfs, dls, 0)
        r["idf"] = float(np.log(n_docs / docs.size + 1.0))
        r["skips"] = _as_dicts_skips(r["skips"])
        r["blocks"] = _as_dicts_blocks(r["blocks"])
        rows.append(r)
    return pd.concat(rows, ignore_index=True) if rows else None


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 10 ** 6), st.integers(1, 5),
       st.integers(0, 3))
def test_restricted_kernel_matches_exhaustive(seed, n_terms, allow_kind):
    rng = np.random.default_rng(seed)
    n_docs = int(rng.integers(50, 2000))
    pdf = _shard_pdf(rng, n_docs, n_terms)
    if pdf is None:
        return
    if allow_kind == 0:
        allowed = np.sort(rng.choice(
            n_docs, min(n_docs, int(rng.integers(1, 50))),
            replace=False)).astype(np.int64)
    elif allow_kind == 1:
        allowed = np.arange(n_docs, dtype=np.int64)      # everything
    elif allow_kind == 2:
        allowed = np.array([n_docs + 5], dtype=np.int64)  # out of range
    else:
        allowed = np.sort(rng.choice(
            n_docs, max(1, n_docs // 2), replace=False)).astype(np.int64)
    a = _score_shard_restricted(pdf, 150.0, 10 ** 6, allowed)
    b = _score_shard_exhaustive(pdf, 150.0, 10 ** 6, allowed=allowed)
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert all(x == y for x, y in zip(a["score"], b["score"]))


@pytest.fixture(scope="module")
def random_pos_index(spark):
    from index_spark.operators.build import build_index

    rng = np.random.default_rng(1234)
    vocab = [f"w{i}" for i in range(6)]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 40)))
             for _ in range(40)]
    rows = [("r", f"{i:04d}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["repo", "path", "content"])
    _, index, stats = build_index(df, stem=False, positions=True,
                                  shard_size=8)
    return texts, index.persist(), stats


def test_sloppy_phrase_random_probes(random_pos_index):
    from index_spark.operators.phrase import sloppy_phrase_search
    from tests.test_phrase import _naive_sloppy

    texts, index, stats = random_pos_index
    rng = np.random.default_rng(99)
    vocab = [f"w{i}" for i in range(6)]
    for _ in range(12):
        m = int(rng.integers(2, 4))
        phrase = " ".join(rng.choice(vocab, m))
        gap = int(rng.integers(1, 5))
        got = [(r["doc_id"], r["n_matches"])
               for r in sloppy_phrase_search(
                   index, stats, phrase, gap=gap, k=1000,
                   stem=False).collect()]
        assert got == _naive_sloppy(texts, phrase, gap, k=1000), \
            (phrase, gap)


# ---------------------------------------------------------------------------
# SmallFloat norm codec properties (session 21)
# ---------------------------------------------------------------------------

@given(st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=300, deadline=None)
def test_smallfloat_props(i):
    from index_spark.functions.norms import int_to_byte4, quantize_norm

    b = int_to_byte4(i)
    q = quantize_norm(i)
    assert 0 <= b <= 0xFF
    assert q <= i                       # floors, never rounds up
    assert quantize_norm(q) == q        # idempotent (fixed point)
    if q < 24:
        assert q == i                   # NUM_FREE_VALUES: exact
    elif q - 24 >= 8:
        # at most 4 significant bits of the offset value survive
        x = q - 24
        shift = x.bit_length() - 4
        assert (x >> shift) << shift == x
    # loss strictly under one unit in the 4th significant bit of i-24
    assert i - q < (1 << max((i - 24).bit_length() - 4, 0) if i >= 24
                    else 1)


@given(st.integers(min_value=0, max_value=2**31 - 2))
@settings(max_examples=200, deadline=None)
def test_smallfloat_monotone_pairs(i):
    from index_spark.functions.norms import quantize_norm

    assert quantize_norm(i) <= quantize_norm(i + 1)


def test_tdi_coin_is_balanced():
    from index_spark.operators.evaluate import _tdi_coin

    flips = [_tdi_coin(q, r, 0) for q in range(200) for r in range(10)]
    frac = sum(flips) / len(flips)
    assert 0.45 < frac < 0.55
    # and varies within single drafts for most queries
    varied = sum(len({_tdi_coin(q, r, 0) for r in range(10)}) == 2
                 for q in range(200))
    assert varied > 150


def test_tdi_coin_seeds_are_independent():
    from index_spark.operators.evaluate import _tdi_coin

    # the regression: seed s must NOT reproduce seed 0's sequence
    # shifted by s rounds (the old additive mixing did exactly that)
    shifted_eq = sum(_tdi_coin(q, r, 1) == _tdi_coin(q, r + 1, 0)
                     for q in range(200) for r in range(10))
    assert shifted_eq < 1500        # ~half under independence, was 2000
    # each seed still yields a balanced, per-draft-varying coin
    for seed in (1, 7, 12345):
        flips = [_tdi_coin(q, r, seed)
                 for q in range(200) for r in range(10)]
        assert 0.45 < sum(flips) / len(flips) < 0.55
    # agreement between two seeds' full sequences is near-chance
    agree = sum(_tdi_coin(q, r, 0) == _tdi_coin(q, r, 1)
                for q in range(200) for r in range(10))
    assert 800 < agree < 1200
    # seed 0 is the exact pre-splitmix identity (pinned drafts hold)
    assert _tdi_coin(5, 3, 0) == (((5 * 4096 + 3) * 1103515245 + 12345)
                                  % 4294967296 < 2147483648)
