"""Lucene SmallFloat norm codec — the lossy one-byte document-length
encoding behind Lucene's real BM25.

Lucene does not score with the exact document length: at index time the
field length is compressed to ONE BYTE per document with
``SmallFloat.intToByte4`` and the similarity decodes it back with
``byte4ToInt`` before computing the norm factor.  The codec has TWO
layers (Lucene ``oal.util.SmallFloat``):

* an inner 4-significant-bit float ``longToInt4`` / ``int4ToLong``
  (3-bit mantissa plus the implicit leading 1, shift "exponent"):

      x < 8   -> encoded as-is ("subnormal")
      x >= 8  -> shift = bitlength(x) - 4
                 nib   = ((x >>> shift) & 7) | ((shift + 1) << 3)
      decode    nib < 8 -> nib ; else ((nib & 7) | 8) << ((nib >>> 3) - 1)

* an outer offset that spends the byte's spare headroom on small exact
  values: ``MAX_INT4 = longToInt4(Integer.MAX_VALUE) = 231``, so
  ``NUM_FREE_VALUES = 255 - 231 = 24`` and

      intToByte4(i) = i                              for i < 24
                      24 + longToInt4(i - 24)        otherwise
      byte4ToInt(b) = b                              for b < 24
                      24 + int4ToLong(b - 24)        otherwise

The practical effect: lengths 0..39 round-trip exactly, the first lossy
value is 41 -> 40, and above that lengths floor to ``24 + (4
significant bits of (i - 24))`` — e.g. 1000 -> 984, 2048 -> 1944.  Two
docs whose lengths quantize to the same bucket tie on the length
component — textbook BM25 and Lucene BM25 genuinely disagree on long
docs, and a rank-parity harness has to model it.  Pure integer
arithmetic either way, so any SQL engine restates it with bit ops and
``bin()`` for the bit length.
"""

from __future__ import annotations

import numpy as np

__all__ = ["int_to_byte4", "byte4_to_int", "quantize_norm",
           "quantize_norms_np", "NUM_FREE_VALUES"]

#: 255 - longToInt4(Integer.MAX_VALUE): byte values below this encode
#: the integer exactly (Lucene SmallFloat.NUM_FREE_VALUES).
NUM_FREE_VALUES = 24


def _long_to_int4(x: int) -> int:
    if x < 8:
        return x
    shift = x.bit_length() - 4
    return ((x >> shift) & 0x07) | ((shift + 1) << 3)


def _int4_to_long(n: int) -> int:
    if n < 8:
        return n
    return ((n & 0x07) | 0x08) << ((n >> 3) - 1)


def int_to_byte4(i: int) -> int:
    """Encode a non-negative int to Lucene's one-byte norm
    (``SmallFloat.intToByte4``): exact below ``NUM_FREE_VALUES``,
    offset 4-significant-bit float above."""
    if i < 0:
        raise ValueError(f"norm must be non-negative, got {i}")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + _long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode :func:`int_to_byte4`'s byte back to its (floored) int."""
    if not 0 <= b <= 0xFF:
        raise ValueError(f"byte out of range: {b}")
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + _int4_to_long(b - NUM_FREE_VALUES)


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
    x = n - NUM_FREE_VALUES          # inner-codec operand (may be < 0)
    _, e = np.frexp(np.maximum(x, 0).astype(np.float64))
    shift = np.maximum(e - 4, 0)
    q4 = (((x >> shift) & 7) | 8) << shift
    inner = np.where(x < 8, x, q4)
    return np.where(n < NUM_FREE_VALUES, n, NUM_FREE_VALUES + inner)
