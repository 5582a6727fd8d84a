"""Trigram posting artifact over the term dictionary: the fuzzy-match
scale path.

The compact dictionary (plans/dictionary.py) shrank fuzzy candidate
generation from "scan every index shard" to "scan the term catalog" —
but the catalog scan is still O(|vocabulary|) per query, because
``levenshtein`` cannot row-group-prune: every term row is read and the
JVM edit-distance predicate runs on all of them. At a 10^9-term
vocabulary (the 10^12-file source-code corpus the north rule targets)
that per-query scan is the wrong cost shape.

The classic fix (pg_trgm; Gravano et al., VLDB 2001 "Approximate
String Joins in a Database (Almost) for Free") is a q-gram inverted
index over the dictionary itself:

  * each term is padded with ``q-1`` sentinel chars on both sides
    (``'#'`` — the tokenizer emits only ``[a-z0-9]+``, so the sentinel
    never collides) and decomposed into its BAG of overlapping
    3-grams; occurrences are numbered so an equi-join on
    ``(gram, occ)`` computes exact bag intersection;
  * **count filter** (a necessary condition): if
    ``edit_distance(s, t) <= d`` then the padded-gram bag intersection
    is ``>= max(|s|, |t|) + (q-1) - d*q`` — each edit destroys at most
    ``q`` grams of the bag, and padding makes the bound positive for
    every ``|s| >= 2`` at ``d = 1``;
  * candidate generation becomes: broadcast the query's ~|q|+2 grams,
    equi-join against the gram postings (only terms SHARING a gram are
    ever touched — the posting relation is sorted by gram at rest so
    the join's scan row-group-prunes to the query's gram set), count
    matches per (qterm, term), keep pairs meeting the bound, then
    verify with the exact ``levenshtein`` predicate on that bounded
    candidate set.

Because the final ``levenshtein`` verification is exact, the trigram
path returns EXACTLY the same neighborhood as the full catalog scan
(pinned by test and by the driver oracle) — the gram index only bounds
how much of the dictionary a query reads.

Artifact layout: ``<store>/dictionary_trgm/`` — one row per
(gram, occ, term), range-partitioned + sorted by gram at rest, carrying
the term's ``length`` and global ``df`` so candidate ranking needs no
join back to the dictionary.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QGRAM_N = 3
PAD_CHAR = "#"
_PAD = PAD_CHAR * (QGRAM_N - 1)


def qgrams(term: str) -> list[tuple[str, int]]:
    """Padded 3-gram bag of ``term`` as (gram, occurrence-index) pairs
    — the driver-side (query) counterpart of :func:`trigram_postings`.
    ``len(result) == len(term) + QGRAM_N - 1``."""
    padded = _PAD + term + _PAD
    seen: dict[str, int] = {}
    out: list[tuple[str, int]] = []
    for i in range(len(padded) - QGRAM_N + 1):
        g = padded[i:i + QGRAM_N]
        occ = seen.get(g, 0)
        seen[g] = occ + 1
        out.append((g, occ))
    return out


def count_filter_bound(len_a, len_b, max_dist: int):
    """Minimum padded-gram bag intersection consistent with
    ``edit_distance <= max_dist`` (Column or int arithmetic)."""
    try:
        m = F.greatest(len_a, len_b)
    except Exception:  # plain ints (driver-side checks)
        m = max(len_a, len_b)
    return m + (QGRAM_N - 1) - max_dist * QGRAM_N


def trigram_postings(dictionary: DataFrame) -> DataFrame:
    """Decompose the term catalog into its gram-posting relation:
    ``(gram, occ, term, length, df)``.

    One pass: a codegen transform builds each term's padded gram array,
    posexplode emits (pos, gram), and the occurrence index is a
    row_number window over (term, gram) — partitions are single terms'
    gram lists (bounded by term length), so the window never sees
    unbounded state. Build-time cost is one shuffle of the gram
    relation, paid once per compaction, not per query.

    A zoned dictionary is collapsed to per-term global df first (the
    fuzzy family expands against the pinned-zone or global vocabulary;
    re-derive from a pinned dictionary for per-zone gram indexes).
    """
    d = dictionary
    if "zone" in d.columns:
        d = (d.groupBy("term")
             .agg(F.sum("df").alias("df"), F.max("length").alias("length")))
    grams = d.select(
        "term", "length", "df",
        F.expr(
            f"transform(sequence(1, length(term) + {QGRAM_N - 1}), "
            f"p -> substring(concat('{_PAD}', term, '{_PAD}'), p, {QGRAM_N}))"
        ).alias("grams"))
    exploded = grams.select(
        "term", "length", "df",
        F.posexplode("grams").alias("pos", "gram"))
    w = Window.partitionBy("term", "gram").orderBy("pos")
    return (exploded
            .withColumn("occ", F.row_number().over(w) - F.lit(1))
            .select("gram", "occ", "term", "length", "df"))


def trigram_path(out_dir: str) -> str:
    return os.path.join(out_dir, "dictionary_trgm")


def write_trigram_postings(trgm: DataFrame, out_dir: str,
                           n_partitions: int | None = None,
                           path: str | None = None) -> None:
    """Publish the gram postings sorted-by-gram at rest: each output
    file covers a contiguous gram range, so a fuzzy query's gram-set
    equi-join prunes row groups to the grams it actually probes."""
    out = (trgm.repartitionByRange(F.col("gram"), F.col("term"))
           if n_partitions is None
           else trgm.repartitionByRange(n_partitions, F.col("gram"),
                                        F.col("term")))
    (out.sortWithinPartitions("gram", "term", "occ")
        .write.mode("overwrite")
        .parquet(path or trigram_path(out_dir)))


def load_trigram_postings(spark: SparkSession, out_dir: str) -> DataFrame:
    p = trigram_path(out_dir)
    if not os.path.isdir(p):
        raise FileNotFoundError(
            f"no trigram postings under {p} — run compact_index with "
            "trigram=True (or write_trigram_postings) first")
    return spark.read.parquet(p)
