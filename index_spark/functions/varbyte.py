"""UTF-8-style leading-ones variable-byte codec for posting deltas.

Pinned spec (mirrors the intent of the reference encoding, which announces
the byte length with the count of leading 1-bits of the first byte exactly
like UTF-8 — reference: /root/reference/index.h:63-74, index.cpp:172-179):

- 1 byte : ``0xxxxxxx``                                  -> 7  payload bits
- n bytes (2<=n<=7): first byte = n leading ones, a zero, then payload
  high bits; each continuation byte = ``10xxxxxx`` (6 payload bits).
  capacities: 11, 16, 21, 26, 31, 36 bits for n = 2..7.
- 12 bytes: first byte ``0xFF`` + 11 continuation bytes (6 bits each,
  66 >= 64) — an extension beyond the reference's 6-byte cap so doc-id
  gaps at 10^12-document scale always fit. Continuation-coded (not raw)
  so the stream stays self-synchronizing: every byte outside
  ``[0x80,0xBF]`` is the start of a value, which makes decode fully
  vectorizable.

Values are encoded in their *minimal* width, so the coding is canonical:
``decode(encode(x)) == x`` and ``encode(decode(b)) == b``.

All hot paths are numpy-vectorized; these functions run inside Arrow
pandas UDFs on executors, never per-row Python in a Spark task loop.
"""

from __future__ import annotations

import numpy as np

# payload capacity (bits) by byte-length 1..7
_CAPACITY = np.array([7, 11, 16, 21, 26, 31, 36], dtype=np.int64)
# first-byte prefix by byte-length 1..7 (leading ones then zero)
_PREFIX = np.array([0x00, 0xC0, 0xE0, 0xF0, 0xF8, 0xFC, 0xFE], dtype=np.uint8)
# payload bits carried by the first byte, by byte-length 1..7
_FIRST_BITS = np.array([7, 5, 4, 3, 2, 1, 0], dtype=np.int64)

_BIG_LEN = 12  # 0xFF + 11 continuation bytes


def _bit_lengths(v: np.ndarray) -> np.ndarray:
    """Significant-bit count per uint64 (0 -> 0), via binary shift cascade."""
    bl = np.zeros(v.shape, dtype=np.int64)
    t = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = t >= (np.uint64(1) << np.uint64(shift))
        bl[mask] += shift
        t[mask] >>= np.uint64(shift)
    bl[v > 0] += 1
    return bl


def encoded_lengths(values: np.ndarray) -> np.ndarray:
    """Byte length each value will occupy (vectorized)."""
    v = np.asarray(values, dtype=np.uint64)
    bits = _bit_lengths(v)
    lengths = np.searchsorted(_CAPACITY, bits, side="left") + 1
    lengths[bits > 36] = _BIG_LEN
    return lengths


def encode(values) -> bytes:
    """Encode a sequence of non-negative ints to one packed byte string."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    lengths = encoded_lengths(v)
    total = int(lengths.sum())
    out = np.zeros(total, dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))

    big = lengths == _BIG_LEN
    if big.any():
        bv = v[big]
        bs = starts[big]
        out[bs] = 0xFF
        for j in range(11):
            sh = np.uint64(6 * (10 - j))
            out[bs + 1 + j] = 0x80 | ((bv >> sh) & np.uint64(0x3F)).astype(np.uint8)

    for n in range(1, 8):
        sel = lengths == n
        if not sel.any():
            continue
        sv = v[sel]
        ss = starts[sel]
        cont = n - 1
        out[ss] = _PREFIX[n - 1] | (sv >> np.uint64(6 * cont)).astype(np.uint8)
        for j in range(cont):
            sh = np.uint64(6 * (cont - 1 - j))
            out[ss + 1 + j] = 0x80 | ((sv >> sh) & np.uint64(0x3F)).astype(np.uint8)
    return out.tobytes()


def decode(buf) -> np.ndarray:
    """Decode a packed byte string back to a uint64 array (vectorized)."""
    if isinstance(buf, (bytes, bytearray, memoryview)):
        b = np.frombuffer(buf, dtype=np.uint8)
    else:
        b = np.asarray(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    # every byte outside [0x80, 0xBF] starts a value (self-synchronizing)
    is_start = (b < 0x80) | (b >= 0xC0)
    starts = np.flatnonzero(is_start)
    lens = np.diff(starts, append=b.size)
    vals = np.zeros(starts.size, dtype=np.uint64)

    big = b[starts] == 0xFF
    if big.any():
        bs = starts[big]
        acc = np.zeros(bs.size, dtype=np.uint64)
        for j in range(11):
            acc = (acc << np.uint64(6)) | (b[bs + 1 + j] & np.uint8(0x3F)).astype(np.uint64)
        vals[big] = acc

    for n in range(1, 8):
        sel = (lens == n) & ~big
        if not sel.any():
            continue
        ss = starts[sel]
        first_mask = np.uint8((1 << _FIRST_BITS[n - 1]) - 1) if n > 1 else np.uint8(0x7F)
        acc = (b[ss] & first_mask).astype(np.uint64)
        for j in range(n - 1):
            acc = (acc << np.uint64(6)) | (b[ss + 1 + j] & np.uint8(0x3F)).astype(np.uint64)
        vals[sel] = acc
    return vals


def encode_one(value: int) -> bytes:
    return encode(np.array([value], dtype=np.uint64))


def first_len(b0: int) -> int:
    """Byte length of the value whose first byte is ``b0`` (O(1)).

    The leading-ones count of the first byte announces the length
    (reference index.h:63-74 semantics); 0xFF marks the 12-byte
    extension. ``b0`` must be a value-start byte (outside [0x80,0xBF])."""
    if b0 < 0x80:
        return 1
    if b0 == 0xFF:
        return _BIG_LEN
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    return n


def decode_first(buf) -> tuple[int, int]:
    """Decode only the FIRST value of a blob; return (value, bytes_consumed).

    O(1) — reads the first byte's length prefix and decodes just those
    bytes, never touching the rest of the stream (the merge boundary
    patch runs this once per shard row; a full decode here would make
    merging a hot term O(total postings) per shard)."""
    n = first_len(buf[0])
    return int(decode(bytes(buf[:n]))[0]), n


def decode_prefix(buf: bytes, count: int) -> tuple[np.ndarray, int]:
    """Decode the first ``count`` values; return (values, bytes_consumed).

    O(count): walks length prefixes, then vector-decodes the exact slice."""
    consumed = 0
    for _ in range(count):
        if consumed >= len(buf):
            raise ValueError(f"buffer exhausted before {count} values")
        consumed += first_len(buf[consumed])
    return decode(buf[:consumed]), consumed
