"""Styled word posts: pack per-occurrence formatting into post values.

The reference reserves style bits inside each word post: "n bits to
encode the offset + 2 bits to encode style" with Normal=00, Italic=01,
Bold=10, Heading=11 (/root/reference/index.h:44-60). Its own decoder
never materializes them (``Post::getStyle`` is a TODO returning Normal,
index.h:128-131), so the bit packing is the only testable contract —
and the shipped golden chunk ``testPL`` pins it: body-word posts are
``value = gap * 2 + style_flag`` (a ONE-bit shift — 501 of its 520
body lists sum to exactly 2 x lastLocation, the rest carry set style
bits; tests/test_golden_blob.py::test_posts_are_location_deltas).

This module implements the packing as a pure value transform over the
existing canonical varbyte codec, parameterized by the shift width:

- ``shift=1`` reproduces the golden artifact byte-for-byte (style is a
  single emphasis flag);
- ``shift=2`` implements the header comment's 2-bit style channel
  (the four Style enum values).

Packing composes with every existing consumer because it is applied to
the DELTA VALUES before varbyte encoding: a styled stream is still a
valid varbyte stream, still delta-decodable, still mergeable by blob
concatenation (gaps scale linearly, so segment patching applies the
same shift). Phrase/proximity consumers recover gaps with
``unpack_styled``; ranking layers may weight hits by the style channel.

All functions are numpy-vectorized (no per-value Python in any path
that could land inside an executor task).
"""

from __future__ import annotations

import numpy as np

from index_spark.functions import varbyte as vb

# 2-bit style codes (index.h:44-49)
STYLE_NORMAL = 0b00
STYLE_ITALIC = 0b01
STYLE_BOLD = 0b10
STYLE_HEADING = 0b11


def pack_styled(gaps: np.ndarray, styles: np.ndarray,
                shift: int = 2) -> bytes:
    """Varbyte-encode ``(gap << shift) | style`` per occurrence.

    ``gaps`` are position deltas (first absolute), ``styles`` the
    per-occurrence style codes; both 1-D and equal length. Style codes
    must fit ``shift`` bits — a style that collides with gap payload
    would corrupt every later delta, so this validates loudly.
    """
    gaps = np.asarray(gaps, dtype=np.uint64)
    styles = np.asarray(styles, dtype=np.uint64)
    if gaps.shape != styles.shape:
        raise ValueError("gaps and styles must align per occurrence")
    if styles.size and int(styles.max()) >= (1 << shift):
        raise ValueError(
            f"style code {int(styles.max())} needs more than {shift} bits")
    return vb.encode((gaps << np.uint64(shift)) | styles)


def unpack_styled(blob: bytes, shift: int = 2
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Decode a styled post stream -> (gaps, styles), both int64."""
    v = vb.decode(blob).astype(np.uint64)
    gaps = (v >> np.uint64(shift)).astype(np.int64)
    styles = (v & np.uint64((1 << shift) - 1)).astype(np.int64)
    return gaps, styles


def styles_from_spans(n_tokens: int, spans, shift: int = 2) -> np.ndarray:
    """Per-token style codes from (start, end, style) token-ordinal spans
    — the shape an upstream markup parser (the reference's HTML parser
    module) hands the indexer. Later spans win on overlap; ordinals
    outside every span are Normal."""
    out = np.zeros(n_tokens, dtype=np.int64)
    for start, end, style in spans:
        if style >= (1 << shift):
            raise ValueError(f"style {style} needs more than {shift} bits")
        out[max(0, int(start)):max(0, int(end))] = int(style)
    return out
