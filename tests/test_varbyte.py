"""Varbyte codec: pinned boundary vectors + roundtrip properties."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from index_spark.functions import varbyte as vb

BOUNDARIES = [
    0, 1, 127, 128, 2047, 2048, 65535, 65536,
    2**21 - 1, 2**21, 2**26 - 1, 2**26, 2**31 - 1, 2**31,
    2**36 - 1, 2**36, 2**63, 2**64 - 1,
]

# (value, expected byte length) per the pinned leading-ones spec
LENGTH_VECTORS = [
    (0, 1), (127, 1), (128, 2), (2047, 2), (2048, 3), (65535, 3),
    (65536, 4), (2**21 - 1, 4), (2**21, 5), (2**26 - 1, 5), (2**26, 6),
    (2**31 - 1, 6), (2**31, 7), (2**36 - 1, 7), (2**36, 12), (2**64 - 1, 12),
]

# pinned byte vectors (UTF-8-style): first-byte prefix + payload split
BYTE_VECTORS = [
    (0, b"\x00"),
    (1, b"\x01"),
    (127, b"\x7f"),
    (128, b"\xc2\x80"),          # 110 00010 | 10 000000
    (2047, b"\xdf\xbf"),         # max 2-byte
    (2048, b"\xe0\xa0\x80"),     # 1110 0000 | 10 100000 | 10 000000
]


def test_pinned_lengths():
    vals = np.array([v for v, _ in LENGTH_VECTORS], dtype=np.uint64)
    lens = vb.encoded_lengths(vals)
    assert list(lens) == [n for _, n in LENGTH_VECTORS]


def test_pinned_bytes():
    for v, expected in BYTE_VECTORS:
        assert vb.encode_one(v) == expected, hex(v)


def test_boundary_roundtrip():
    vals = np.array(BOUNDARIES, dtype=np.uint64)
    assert (vb.decode(vb.encode(vals)) == vals).all()


def test_empty():
    assert vb.encode([]) == b""
    assert vb.decode(b"").size == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
def test_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    enc = vb.encode(vals)
    dec = vb.decode(enc)
    assert dec.shape == vals.shape
    assert (dec == vals).all()
    assert vb.encode(dec) == enc  # canonical


def test_decode_prefix():
    vals = np.array([5, 300, 70000], dtype=np.uint64)
    enc = vb.encode(vals)
    got, consumed = vb.decode_prefix(enc, 2)
    assert list(got) == [5, 300]
    assert consumed == 1 + 2


def test_decode_first_o1():
    """decode_first reads only the first value's bytes (merge boundary
    patch must be O(1), not O(blob))."""
    for v in BOUNDARIES:
        tail = np.array([7, 99, 2**40], dtype=np.uint64)
        enc = vb.encode(np.concatenate(([v], tail)).astype(np.uint64))
        first_bytes = len(vb.encode_one(v))
        got, consumed = vb.decode_first(enc[: first_bytes])  # tail withheld
        assert got == v
        assert consumed == first_bytes


def test_first_len_matches_encoded_lengths():
    vals = np.array(BOUNDARIES, dtype=np.uint64)
    lens = vb.encoded_lengths(vals)
    for v, n in zip(BOUNDARIES, lens):
        assert vb.first_len(vb.encode_one(v)[0]) == n
