"""PII detection + redaction for training corpora — emails, IPv4
addresses, international-format phone numbers.

Pure JVM regex (``regexp_extract_all`` / ``regexp_replace`` inside
whole-stage codegen; no Python, no shuffle — a map-only transform that
scales linearly with corpus bytes). Patterns are deliberately RE2-safe
(no backrefs/lookaround) so the driver oracle can restate them verbatim
in DuckDB and so a production port to a linear-time engine is direct.

This is the cheap regex tier of a PII pipeline: an NER-model tier
would ride the same contract (text in, redacted text + counts out) as
an Arrow-batched ``mapInPandas``, exactly like operators/multimodal.py
gates its model-shaped stages.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# order matters: emails contain dots and digits, so they redact FIRST
# (an address like bob.1234@10cats.example would otherwise lose its
# digit runs to the looser patterns below)
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\+\d{9,13}\b", "[PHONE]"),
)


def pii_stats(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Per-doc PII match counts: (doc_id, n_email, n_ipv4, n_phone,
    n_pii). Counts are over the RAW text independently per pattern
    (no sequential redaction), so each column is directly the
    pattern's match count."""
    cols = [F.col(id_col).cast("long").alias("doc_id")]
    total = F.lit(0).cast("long")
    for name, pat, _ in PII_PATTERNS:
        c = F.size(F.regexp_extract_all(
            F.col(text_col), F.lit(pat), F.lit(0))).cast("long")
        cols.append(c.alias(f"n_{name}"))
        total = total + c
    return df.select(*cols, total.alias("n_pii"))


def scrub_pii(df: DataFrame, text_col: str = "text",
              out_col: str = "scrubbed") -> DataFrame:
    """Redact PII in place: appends ``out_col`` with every match
    replaced by its type token ([EMAIL]/[IP]/[PHONE]), applied in
    PII_PATTERNS order (emails first — see module note). All other
    columns pass through untouched."""
    scrubbed = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return df.withColumn(out_col, scrubbed)


# grok pattern library (the ingest-pipeline subset; RE2-safe like the
# PII tier so any engine restates them verbatim)
GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NUMBER": r"-?\d+(?:\.\d+)?",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "TIMESTAMP_ISO8601":
        r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?",
    "GREEDYDATA": r".*",
}

_GROK_REF = re.compile(r"%\{([A-Z0-9_]+):([A-Za-z0-9_]+)\}")


def _lit_escape(s: str) -> str:
    # re.escape also escapes spaces ('\ '), which Java regex accepts
    # but RE2 (DuckDB / Go ports) rejects — keep spaces literal so the
    # compiled regex is engine-portable
    return re.escape(s).replace("\\ ", " ")


def grok_compile(pattern: str) -> tuple[str, list[str]]:
    """Compile a grok expression (``literal %{NAME:field} literal …``)
    to an anchored regex plus the ordered field list. Literal spans are
    regex-escaped; ``%{NAME}`` without a field is rejected (use a
    named capture or drop the token into a literal)."""
    fields: list[str] = []
    out: list[str] = []
    pos = 0
    for m in _GROK_REF.finditer(pattern):
        out.append(_lit_escape(pattern[pos:m.start()]))
        name, field = m.group(1), m.group(2)
        if name not in GROK_PATTERNS:
            raise ValueError(f"unknown grok pattern %{{{name}}} "
                             f"(known: {sorted(GROK_PATTERNS)})")
        out.append(f"({GROK_PATTERNS[name]})")
        fields.append(field)
        pos = m.end()
    out.append(_lit_escape(pattern[pos:]))
    bare = re.search(r"%\{[A-Za-z0-9_]+\}", pattern)
    if bare:
        # without this check a field-less ref would be silently
        # regex-escaped into literal text and the pattern could never
        # match a real line
        raise ValueError(f"grok reference {bare.group(0)} has no "
                         "field name (use %{NAME:field})")
    if not fields:
        raise ValueError("grok pattern captures no fields")
    if len(set(fields)) != len(fields):
        raise ValueError(f"duplicate grok field names in {pattern!r}")
    return "^" + "".join(out) + "$", fields


def grok_parse(df: DataFrame, pattern: str,
               text_col: str = "text",
               keep_unmatched: bool = True) -> DataFrame:
    """Grok-style structured field extraction (the Elasticsearch ingest
    ``grok`` processor / Logstash grok filter) — parse semi-structured
    log lines into typed-ready string columns with a pinned, portable
    pattern library (:data:`GROK_PATTERNS`).

    The compiled regex is anchored whole-line; each ``%{NAME:field}``
    becomes one capture group extracted with ``regexp_extract`` at its
    group index. Non-matching rows keep NULL fields (and a false
    ``grok_matched`` flag) when ``keep_unmatched``, else drop.

    Plan shape: MAP-ONLY whole-stage codegen (one ``rlike`` + one
    ``regexp_extract`` per field over the original column; Catalyst
    dedups the common regex state) — no shuffle, no Python; the 100-TB
    ingest-parse is one embarrassingly parallel scan, and the field
    columns prune/push down like any other string column afterwards.
    """
    regex, fields = grok_compile(pattern)
    matched = F.col(text_col).rlike(regex)
    cols = [df[c] for c in df.columns]
    cols.append(matched.alias("grok_matched"))
    for i, field in enumerate(fields, start=1):
        cols.append(F.when(matched,
                           F.regexp_extract(F.col(text_col), regex, i))
                    .alias(field))
    out = df.select(*cols)
    return out if keep_unmatched else out.filter(F.col("grok_matched"))
