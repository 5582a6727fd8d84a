"""Phonetic token filter: a pinned, engine-portable soundex.

The classic Russell/Odell soundex core (the mapping every phonetic
token filter — Lucene's ``PhoneticFilter``, Postgres fuzzystrmatch,
DuckDB — descends from): first letter kept, consonants classed into
six digit groups, adjacent equal classes collapsed, vowels dropped,
zero-padded to 4.  Pinned WITHOUT the H/W separator exception that
some implementations add (Java's ``Soundex`` treats codes separated
by h/w as adjacent; implementations disagree on it, so the portable
spec omits it) — any SQL engine can restate this one exactly, which
is what makes ``sounds_like_search`` driver-oracle-checkable.

Spec (over an analyzed lowercase token):
  1. letters = the [a-z] characters (digits and anything else drop);
     an empty result has no key (NULL).
  2. codes = per-letter class via one ``translate``:
     b f p v → 1; c g j k q s x z → 2; d t → 3; l → 4; m n → 5;
     r → 6; vowels + h w y → 0.
  3. collapse adjacent equal codes (over the whole sequence,
     including position 0).
  4. key = UPPER(first letter) + (collapsed codes after position 0,
     zeros removed), right-padded with '0' to exactly 4 chars.

"robert" → R163, "rupert" → R163, "tymczak" → T522.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_ALPHA = "abcdefghijklmnopqrstuvwxyz"
_CODES = "01230120022455012623010202"
_SDX_TABLE = str.maketrans(_ALPHA, _CODES)
_NON_ALPHA = re.compile(r"[^a-z]")


def phonetic_key_py(term: str) -> str | None:
    """Driver-side reference implementation (query-term keys, tests)."""
    s = _NON_ALPHA.sub("", term.lower())
    if not s:
        return None
    codes = s.translate(_SDX_TABLE)
    ded = [codes[0]]
    for c in codes[1:]:
        if c != ded[-1]:
            ded.append(c)
    tail = "".join(ded[1:]).replace("0", "")
    return (s[0].upper() + tail + "000")[:4]


def phonetic_key(col: Column | str) -> Column:
    """The same key as a pure-codegen Column expression (no UDF):
    translate + one backreference regex collapse + pad — row-local
    JVM work, so keying a billion-term catalog is scan-speed."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.regexp_replace(F.lower(c), "[^a-z]", "")
    codes = F.translate(s, _ALPHA, _CODES)
    ded = F.regexp_replace(codes, r"(.)\1+", "$1")
    tail = F.regexp_replace(ded.substr(F.lit(2), F.length(ded)), "0", "")
    key = F.substring(
        F.rpad(F.concat(F.upper(F.substring(s, 1, 1)), tail), 4, "0"),
        1, 4)
    return F.when(F.length(s) > 0, key)
