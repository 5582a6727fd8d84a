"""Training-data curation: per-document keep/drop verdicts composing the
pipeline gates an LLM-corpus build runs before indexing — exact dedup
(keep-first), length floors/ceilings, and alphabetic-density floors.

Everything is JVM-side SQL expressions (whole-stage codegen; no Python
in the plan): the only shuffle is the content-hash aggregate for
keep-first dedup — grouped on sha256, a near-unique key with no skew by
construction — joined back on the hash. Gates apply in a PINNED order
(first failing gate names the reason), so verdicts are deterministic
and SQL-restatable; downstream, ``kept(df)`` is the filter to feed
``build_index``/``upsert_docs``.

The near-dup families (MinHash/SimHash/winnowing/embedding) remain
separate operators (operators/dedup.py, similarity.py) — they need
candidate generation; this module is the cheap exact/statistical tier
that runs on EVERY doc first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REASONS = ("duplicate", "too_short", "too_long", "low_alpha", "ok")


def curate_corpus(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", min_tokens: int = 5,
                  max_tokens: int = 100_000,
                  min_alpha: float = 0.4) -> DataFrame:
    """Verdict relation: (doc_id, n_tokens, alpha_ratio, dup_of, keep,
    reason) — one row per input doc.

    Gate order (first failure wins): exact duplicate (sha256 content
    hash; the group's MINIMUM doc_id is kept, others point at it via
    ``dup_of``), token count < ``min_tokens``, token count >
    ``max_tokens``, alphabetic ratio < ``min_alpha``; survivors are
    (keep=true, reason='ok'). Token/alpha definitions match the
    engine's SQL-parity tokenizer (lower → [a-z0-9]+ runs) and the
    ``alpha_ratio`` entry (4-decimal round)."""
    # NULL text folds to '' BEFORE hashing: a NULL sha2 key would never
    # match in the equi-join below and the doc would silently lose its
    # verdict row; as '' it dedups/gates like any empty doc (too_short)
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_text"),
        F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256).alias("_h"),
    )
    firsts = d.groupBy("_h").agg(F.min("doc_id").alias("_first"))
    d = d.join(firsts, "_h")
    n_tok = F.size(F.filter(
        F.split(F.lower("_text"), "[^a-z0-9]+"), lambda x: x != ""
    )).cast("long")
    alpha = F.when(F.length("_text") > 0, F.round(
        F.length(F.regexp_replace(F.lower("_text"), "[^a-z]", ""))
        / F.length("_text"), 4)).otherwise(F.lit(0.0))  # '' (ANSI /0)
    d = (d.withColumn("n_tokens", n_tok)
          .withColumn("alpha_ratio", alpha)
          .withColumn("dup_of", F.when(F.col("doc_id") != F.col("_first"),
                                       F.col("_first"))))
    reason = (
        F.when(F.col("dup_of").isNotNull(), F.lit("duplicate"))
         .when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
         .when(F.col("n_tokens") > max_tokens, F.lit("too_long"))
         .when(F.col("alpha_ratio") < min_alpha, F.lit("low_alpha"))
         .otherwise(F.lit("ok")))
    return (d.withColumn("reason", reason)
             .withColumn("keep", F.col("reason") == "ok")
             .select("doc_id", "n_tokens", "alpha_ratio", "dup_of",
                     "keep", "reason"))


def kept(docs: DataFrame, verdicts: DataFrame,
         id_col: str = "doc_id") -> DataFrame:
    """The curated corpus: input rows whose verdict is keep=true (a
    semi-join on doc_id — verdicts never widen the doc rows)."""
    keep_ids = verdicts.filter(F.col("keep")).select("doc_id")
    return docs.join(keep_ids, docs[id_col] == keep_ids["doc_id"],
                     "left_semi")
