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

import re

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


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

GOPHER_REASONS = (
    "too_few_words", "too_many_words", "short_words", "long_words",
    "symbol_ratio", "bullet_lines", "ellipsis_lines", "low_alpha_words",
    "few_stopwords", "dup_lines", "dup_line_chars", "ok")


def gopher_quality(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   min_words: int = 50, max_words: int = 100_000,
                   min_mean_word_len: float = 3.0,
                   max_mean_word_len: float = 10.0,
                   max_symbol_ratio: float = 0.1,
                   max_bullet_frac: float = 0.9,
                   max_ellipsis_frac: float = 0.3,
                   min_alpha_word_frac: float = 0.8,
                   min_stopwords: int = 2,
                   max_dup_line_frac: float = 0.3,
                   max_dup_line_char_frac: float = 0.2,
                   stopwords: tuple[str, ...] = GOPHER_STOPWORDS
                   ) -> DataFrame:
    """Gopher quality-rule battery (Rae et al. 2021, arXiv:2112.11446
    §A1.1) — the word-shape / line-shape / stopword gates that complete
    :func:`index_spark.operators.analytics.repetition_stats` (the
    n-gram repetition half of the same appendix) into a per-document
    keep/drop verdict.

    Returns one row per doc: (doc_id, n_words, mean_word_len,
    symbol_ratio, bullet_frac, ellipsis_frac, alpha_word_frac,
    n_stopwords, dup_line_frac, dup_line_char_frac, keep, reason) with
    all fractions rounded to 4 decimals and ``reason`` the FIRST
    failing gate in the pinned :data:`GOPHER_REASONS` order.

    Definitions (each SQL-restatable, so the whole battery sits under
    one DuckDB oracle):

    - *words* are whitespace runs (Gopher's unit — punctuation stays
      attached); *lines* are ``\\n`` splits with blank lines dropped;
      *stopword hits* count DISTINCT members of ``stopwords`` present
      in the engine-tokenized (lower, [a-z0-9]+) token set.
    - ``symbol_ratio`` = (occurrences of '#' + occurrences of '...')
      per word (Gopher's symbol-to-word ratio).
    - ``bullet_frac`` / ``ellipsis_frac`` = fraction of lines starting
      with a bullet ('-', '*', or U+2022) / ending with '...' or
      U+2026, after trimming.
    - ``dup_line_frac`` = occurrences beyond each line's first, over
      all lines (the occurrence-weighted restatement used by
      ``repetition_stats``); ``dup_line_char_frac`` weights those
      beyond-first occurrences by character length over total line
      characters.

    Scale shape: the whole battery is MAP-ONLY — every metric is a
    per-row Catalyst expression (split / filter / aggregate folds), no
    explode, no shuffle, whole-stage codegen end to end. Per-row cost
    is O(len log len) in the doc's own line count (one ``sort_array``
    for the duplicate-line folds). That is exactly the cost shape a
    100-TB first-pass gate needs: one scan, predicate-prunable, and
    embarrassingly parallel at any executor count.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(txt, r"\s+"), lambda x: x != "")
    lines = F.filter(F.split(txt, "\n"),
                     lambda x: F.trim(x) != "")
    toks = F.filter(F.split(F.lower(txt), "[^a-z0-9]+"),
                    lambda x: x != "")

    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        words.alias("_w"), lines.alias("_l"), toks.alias("_t"),
        txt.alias("_x"))

    n_words = F.size("_w").cast("long")
    n_lines = F.size("_l").cast("long")
    # mean word length over whitespace words
    word_chars = F.aggregate(
        "_w", F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x).cast("long"))
    mean_wl = F.when(n_words > 0,
                     F.round(word_chars / n_words, 4)).otherwise(F.lit(0.0))
    # '#' and '...' occurrence counts via length deltas (no regex scan)
    n_hash = F.length("_x") - F.length(F.expr("replace(_x, '#', '')"))
    n_ell = (F.length("_x")
             - F.length(F.expr("replace(_x, '...', '')"))) / F.lit(3)
    symbol_ratio = F.when(n_words > 0, F.round(
        (n_hash + n_ell) / n_words, 4)).otherwise(F.lit(0.0))

    bullet = F.size(F.filter(
        "_l", lambda x: F.ltrim(x).rlike("^[-*•]")))
    ellipsis = F.size(F.filter(
        "_l", lambda x: F.rtrim(x).rlike("(\\.\\.\\.|…)$")))
    bullet_frac = F.when(n_lines > 0,
                         F.round(bullet / n_lines, 4)).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(n_lines > 0, F.round(
        ellipsis / n_lines, 4)).otherwise(F.lit(0.0))

    alpha_words = F.size(F.filter("_w", lambda x: x.rlike("[a-zA-Z]")))
    alpha_frac = F.when(n_words > 0, F.round(
        alpha_words / n_words, 4)).otherwise(F.lit(0.0))

    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.array_intersect(F.array_distinct("_t"), stop_arr)) \
              .cast("long")

    # duplicate-line folds over the sorted line array: beyond-first
    # occurrence count and its char-length-weighted variant in one
    # O(n log n) per-row pass (prev-tracking fold, no explode)
    dup_cnt = F.expr("""
aggregate(sort_array(_l),
  struct(CAST('' AS STRING) AS prev, CAST(0 AS BIGINT) AS c,
         CAST(false AS BOOLEAN) AS seen),
  (a, x) -> struct(x AS prev,
                   a.c + IF(a.seen AND x = a.prev, CAST(1 AS BIGINT),
                            CAST(0 AS BIGINT)) AS c,
                   true AS seen),
  a -> a.c)""")
    dup_chars = F.expr("""
aggregate(sort_array(_l),
  struct(CAST('' AS STRING) AS prev, CAST(0 AS BIGINT) AS c,
         CAST(false AS BOOLEAN) AS seen),
  (a, x) -> struct(x AS prev,
                   a.c + IF(a.seen AND x = a.prev,
                            CAST(length(x) AS BIGINT),
                            CAST(0 AS BIGINT)) AS c,
                   true AS seen),
  a -> a.c)""")
    line_chars = F.aggregate(
        "_l", F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x).cast("long"))
    dup_line_frac = F.when(n_lines > 0, F.round(
        dup_cnt / n_lines, 4)).otherwise(F.lit(0.0))
    dup_char_frac = F.when(line_chars > 0, F.round(
        dup_chars / line_chars, 4)).otherwise(F.lit(0.0))

    d = d.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        alpha_frac.alias("alpha_word_frac"),
        n_stop.alias("n_stopwords"),
        dup_line_frac.alias("dup_line_frac"),
        dup_char_frac.alias("dup_line_char_frac"))

    reason = (
        F.when(F.col("n_words") < min_words, F.lit("too_few_words"))
         .when(F.col("n_words") > max_words, F.lit("too_many_words"))
         .when(F.col("mean_word_len") < min_mean_word_len,
               F.lit("short_words"))
         .when(F.col("mean_word_len") > max_mean_word_len,
               F.lit("long_words"))
         .when(F.col("symbol_ratio") > max_symbol_ratio,
               F.lit("symbol_ratio"))
         .when(F.col("bullet_frac") > max_bullet_frac,
               F.lit("bullet_lines"))
         .when(F.col("ellipsis_frac") > max_ellipsis_frac,
               F.lit("ellipsis_lines"))
         .when(F.col("alpha_word_frac") < min_alpha_word_frac,
               F.lit("low_alpha_words"))
         .when(F.col("n_stopwords") < min_stopwords,
               F.lit("few_stopwords"))
         .when(F.col("dup_line_frac") > max_dup_line_frac,
               F.lit("dup_lines"))
         .when(F.col("dup_line_char_frac") > max_dup_line_char_frac,
               F.lit("dup_line_chars"))
         .otherwise(F.lit("ok")))
    return (d.withColumn("reason", reason)
             .withColumn("keep", F.col("reason") == "ok"))


def c4_quality(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id",
               min_line_words: int = 5,
               min_sentences: int = 3,
               terminal_chars: tuple[str, ...] = (".", "!", "?", '"'),
               banned_substrings: tuple[str, ...] = ("lorem ipsum", "{"),
               line_drop_substrings: tuple[str, ...] = ("javascript",)
               ) -> DataFrame:
    """C4 cleaning battery (Raffel et al. 2020, arXiv:1910.10683 §2.2)
    — the LINE-level filter that produced the C4 corpus, completing
    :func:`gopher_quality`'s document-shape gates with C4's
    sentence-shape gates:

    - a line is KEPT iff (after trimming) it ends in a terminal
      punctuation mark (``terminal_chars``), has at least
      ``min_line_words`` whitespace words, and its lowercase form
      contains none of ``line_drop_substrings`` (C4 drops the
      JavaScript-warning lines);
    - the document is DROPPED if its lowercase text contains any of
      ``banned_substrings`` (C4's "lorem ipsum" / curly-brace code
      gates), or if fewer than ``min_sentences`` sentences survive in
      the kept lines (sentences = occurrences of '.', '!', '?' in the
      kept text — the pinned, restatable stand-in for C4's English
      sentence splitter);
    - ``clean_text`` = the kept lines re-joined with ``\\n`` (empty
      when the doc is dropped, so downstream builds can consume the
      column directly).

    Returns (doc_id, n_lines, n_kept_lines, n_sentences, keep, reason,
    clean_text); ``reason`` is the first failing gate in pinned order
    (banned substring gates in ``banned_substrings`` order, then
    ``too_few_sentences``, else ``ok``).

    Scale shape: MAP-ONLY like the Gopher battery — lines split, gate,
    count, and re-join as per-row Catalyst folds (no explode, no
    shuffle, no Python); a 100-TB first-pass clean is one
    embarrassingly parallel scan.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    low = F.lower(txt)
    lines = F.filter(F.split(txt, "\n"), lambda x: F.trim(x) != "")

    # re.escape every terminal char: a bare ')', '*' or '[' would
    # build an invalid (or silently wrong) line-keep regex
    term = "|".join(re.escape(c) for c in terminal_chars)
    # a line survives C4's three conditions
    def _kept(x):
        cond = F.rtrim(x).rlike(f"({term})$")
        cond = cond & (F.size(F.filter(F.split(F.trim(x), r"\s+"),
                                       lambda w: w != ""))
                       >= int(min_line_words))
        for s in line_drop_substrings:
            cond = cond & ~F.lower(x).contains(s.lower())
        return cond

    kept = F.filter(lines, _kept)
    kept_text = F.array_join(kept, "\n")

    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        low.alias("_low"),
        kept_text.alias("_kept"))
    # sentences = '.', '!', '?' occurrences in the kept text (length
    # deltas — no regex scan)
    n_sentences = sum(
        (F.length("_kept")
         - F.length(F.expr(f"replace(_kept, '{c}', '')")))
        for c in (".", "!", "?")).cast("long")
    d = d.withColumn("n_sentences", n_sentences)

    # innermost-out CASE build: sentence gate + ok default first, then
    # banned substrings wrap in reverse so the FIRST tuple entry wins;
    # an empty banned_substrings tuple (gates disabled) still works
    chain = F.when(F.col("n_sentences") < int(min_sentences),
                   F.lit("too_few_sentences")).otherwise(F.lit("ok"))
    for s in reversed(banned_substrings):
        esc = s.replace("'", "''")
        chain = F.when(F.col("_low").contains(s.lower()),
                       F.lit(f"banned:{esc}")).otherwise(chain)
    return (d.withColumn("reason", chain)
             .withColumn("keep", F.col("reason") == "ok")
             .select("doc_id", "n_lines", "n_kept_lines", "n_sentences",
                     "keep", "reason",
                     F.when(F.col("reason") == "ok",
                            F.col("_kept")).otherwise(F.lit(""))
                     .alias("clean_text")))
