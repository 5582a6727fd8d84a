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
