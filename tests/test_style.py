"""Styled post packing (index.h:44-60): unit roundtrips + fidelity to
the reference's shipped golden chunk, whose body-word posts carry the
style channel for real (tests/test_golden_blob.py pins value = 2*gap
for Normal — a one-bit shift in the artifact)."""

import os

import numpy as np
import pytest

from index_spark.functions import varbyte as vb
from index_spark.functions.style import (STYLE_BOLD, STYLE_HEADING,
                                         STYLE_ITALIC, STYLE_NORMAL,
                                         pack_styled, styles_from_spans,
                                         unpack_styled)

GOLDEN = "/root/reference/testPL"


def test_pack_unpack_roundtrip_2bit():
    rng = np.random.default_rng(7)
    gaps = rng.integers(1, 1 << 40, size=500).astype(np.uint64)
    gaps[0] = 0  # first post may be absolute position 0
    styles = rng.integers(0, 4, size=500).astype(np.uint64)
    blob = pack_styled(gaps, styles, shift=2)
    g2, s2 = unpack_styled(blob, shift=2)
    assert (g2 == gaps.astype(np.int64)).all()
    assert (s2 == styles.astype(np.int64)).all()


def test_pack_unpack_roundtrip_1bit():
    gaps = np.array([5, 1, 9, 3], dtype=np.uint64)
    styles = np.array([0, 1, 0, 1], dtype=np.uint64)
    g2, s2 = unpack_styled(pack_styled(gaps, styles, shift=1), shift=1)
    assert g2.tolist() == [5, 1, 9, 3]
    assert s2.tolist() == [0, 1, 0, 1]


def test_style_overflow_rejected():
    with pytest.raises(ValueError, match="bits"):
        pack_styled(np.array([1]), np.array([STYLE_HEADING]), shift=1)
    with pytest.raises(ValueError, match="align"):
        pack_styled(np.array([1, 2]), np.array([0]))


def test_normal_style_is_pure_shift():
    """All-Normal styled stream == plain varbyte of the shifted gaps —
    so a style-unaware consumer that shifts right still sees the gaps."""
    gaps = np.array([3, 4, 5], dtype=np.uint64)
    blob = pack_styled(gaps, np.zeros(3, np.uint64), shift=2)
    assert (vb.decode(blob) == gaps.astype(np.int64) * 4).all()


def test_styles_from_spans():
    s = styles_from_spans(10, [(2, 5, STYLE_BOLD), (4, 6, STYLE_ITALIC)])
    assert s.tolist() == [0, 0, 2, 2, 1, 1, 0, 0, 0, 0]
    assert styles_from_spans(3, []).tolist() == [STYLE_NORMAL] * 3
    with pytest.raises(ValueError):
        styles_from_spans(3, [(0, 1, 9)], shift=2)


@pytest.mark.skipif(not os.path.exists(GOLDEN),
                    reason="reference golden blob not present")
def test_golden_body_posts_decode_as_styled_stream():
    """The artifact's body-word posts ARE a shift=1 styled stream:
    unpacking every body list yields gaps summing to lastLocation for
    exactly the 501 all-Normal lists, and re-packing the (gap, style)
    pairs regenerates the decoded post values exactly."""
    from tests.test_golden_blob import walk

    with open(GOLDEN, "rb") as f:
        _, records, _ = walk(f.read())
    n_normal = n_body = 0
    for key, _, _, typ, lastloc, _, _, posts in records:
        if typ != "b" or not posts:
            continue
        n_body += 1
        v = np.array(posts, dtype=np.uint64)
        gaps, styles = unpack_styled(vb.encode(v), shift=1)
        if not styles.any():
            n_normal += 1
            assert gaps.sum() == lastloc, key
        repacked = pack_styled(gaps.astype(np.uint64),
                               styles.astype(np.uint64), shift=1)
        assert (vb.decode(repacked) == v.astype(np.int64)).all(), key
    assert n_body >= 520 - 1  # bare-key record may carry no posts
    assert n_normal == 501
