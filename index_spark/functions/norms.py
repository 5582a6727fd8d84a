"""Lucene SmallFloat norm codec — the lossy one-byte document-length
encoding behind Lucene's real BM25.

Lucene does not score with the exact document length: at index time the
field length is compressed to ONE BYTE per document with
``SmallFloat.intToByte4`` (4 significant bits — a 3-bit mantissa plus
the implicit leading 1 — and a shift "exponent"), and the similarity
decodes it back with ``byte4ToInt`` before computing the norm factor.
Values 0..15 round-trip exactly; larger lengths floor to 4 significant
bits (e.g. 17 -> 16, 19 -> 18), monotonically. The practical effect is
that two docs whose lengths quantize to the same bucket tie on the
length component — textbook BM25 and Lucene BM25 genuinely disagree on
long docs, and a rank-parity harness has to model it.

Pinned contract (public algorithm; Lucene's
``oal.util.SmallFloat.intToByte4`` / ``byte4ToInt``):

    numBits  = position of i's most significant bit (len(bin(i)))
    i < 8    -> encoded as-is ("subnormal")
    i >= 8   -> shift = numBits - 4
                byte  = ((i >>> shift) & 7) | ((shift + 1) << 3)
    decode     i < 8 -> i ; else ((byte & 7) | 8) << ((byte >>> 3) - 1)

so quantize(i) = decode(encode(i)) = ((i >> shift) & 7 | 8) << shift —
pure integer arithmetic that any SQL engine restates with bit ops and
``bin()`` for the bit length.
"""

from __future__ import annotations

import numpy as np

__all__ = ["int_to_byte4", "byte4_to_int", "quantize_norm",
           "quantize_norms_np"]


def int_to_byte4(i: int) -> int:
    """Encode a non-negative int to Lucene's 4-significant-bit byte."""
    if i < 0:
        raise ValueError(f"norm must be non-negative, got {i}")
    if i < 8:
        return i
    num_bits = i.bit_length()
    shift = num_bits - 4
    return ((i >> shift) & 0x07) | ((shift + 1) << 3)


def byte4_to_int(b: int) -> int:
    """Decode :func:`int_to_byte4`'s byte back to its (floored) int."""
    if not 0 <= b <= 0xFF:
        raise ValueError(f"byte out of range: {b}")
    if b < 8:
        return b
    shift = (b >> 3) - 1
    return ((b & 0x07) | 0x08) << shift


def quantize_norm(i: int) -> int:
    """The encode-decode round trip: the length Lucene actually scores
    with."""
    return byte4_to_int(int_to_byte4(i))


def quantize_norms_np(dls: np.ndarray) -> np.ndarray:
    """Vectorized :func:`quantize_norm` over an int-valued array
    (float input accepted; doc lengths are exact in float64).

    ``np.frexp`` yields the exact bit length for integer-valued floats
    (value = m * 2^e with 0.5 <= m < 1, so e = numBits) — no
    ``log2``-rounding hazards at powers of two."""
    n = np.asarray(dls).astype(np.int64)
    if n.size == 0:
        return n
    if (n < 0).any():
        raise ValueError("norms must be non-negative")
    _, e = np.frexp(n.astype(np.float64))
    shift = np.maximum(e - 4, 0)
    q = (((n >> shift) & 7) | 8) << shift
    return np.where(n < 8, n, q)
