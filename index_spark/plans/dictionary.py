"""Compact term-dictionary artifact: one row per (zone,) term.

The fuzzy/spell/complete/prefix query family needs the TERM CATALOG —
(term, global df, global cf) — not the posting blobs. Deriving it from
the sharded index per query means a full term-column scan of every
shard for predicates that cannot row-group-prune (``levenshtein``); at
10^9+ term-rows that is the wrong cost shape. The reference's sorted
dictionary walk (/root/reference/index.cpp:51-52 — chunk keys serialize
in sorted order) implies the same first-class structure.

So compaction (:func:`~index_spark.plans.checkpoint.compact_index`,
which touches every term anyway) additionally publishes
``<out_dir>/dictionary/``: millions of rows, not billions —

  * one row per (zone,) term: ``df`` (global doc freq), ``cf`` (global
    collection freq), ``n_segs`` (merged doc-range segments),
    ``length`` (term length, the fuzzy length-band prune key);
  * RANGE-partitioned + sorted by term at rest, so prefix scans
    (``StartsWith``) row-group-prune exactly like the index shards;
  * the fuzzy length-band predicate (|len(t)-len(q)| <= dist) hits the
    stored ``length`` column min/max per row group before any
    ``levenshtein`` evaluates.

Query functions (``fuzzy_expand`` / ``suggest_corrections`` /
``complete_terms`` / ``term_prefix_stats``) accept ``dictionary=`` and
then never touch the sharded index for catalog work.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dictionary_from_index(index: DataFrame) -> DataFrame:
    """Derive the term catalog from any index form (sharded, merged, or
    zoned): one row per (zone,) term with global df/cf sums and the
    contributing row count. Map-side-combinable aggregate over the
    metadata columns only — blobs are pruned from the scan."""
    from index_spark.operators.build import DOC_MARKER

    from index_spark.functions.phonetic import phonetic_key

    gcols = ["zone", "term"] if "zone" in index.columns else ["term"]
    return (index.filter(F.col("term") != DOC_MARKER)
            .groupBy(*gcols)
            .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"),
                 F.count("*").alias("n_segs"))
            .withColumn("length", F.length("term"))
            # the phonetic catalog column: sounds-like expansion becomes
            # a stored-column equi-filter instead of per-row compute
            .withColumn("pkey", phonetic_key(F.col("term")))
            # the reversed term: a LEADING-wildcard pattern with a
            # literal suffix ('*ing') becomes a StartsWith on rterm —
            # prunable against the rterm-sorted companion projection
            # (the Solr ReversedWildcardFilter idea)
            .withColumn("rterm", F.reverse(F.col("term"))))


def dictionary_path(out_dir: str) -> str:
    return os.path.join(out_dir, "dictionary")


def reversed_dictionary_path(out_dir: str) -> str:
    """The rterm-sorted companion projection's directory: always the
    main catalog directory + ``_r`` (staging paths stay paired)."""
    return dictionary_path(out_dir) + "_r"


def write_dictionary(dictionary: DataFrame, out_dir: str,
                     n_partitions: int | None = None,
                     path: str | None = None,
                     reversed_too: bool = True) -> None:
    """Publish the catalog sorted-by-term at rest. Range partitioning
    keeps each output file a contiguous term range (tight row-group
    min/max for StartsWith pruning); ``n_partitions`` defaults to
    Spark's range-partition estimate. ``path`` overrides the target
    directory (staging for an atomic swap when the current catalog is
    an input of the rewrite).

    ``reversed_too``: additionally publish the SAME rows range-
    partitioned + sorted by ``rterm`` under ``<path>_r`` — the
    projection that makes leading-wildcard suffix scans
    (``rterm StartsWith``) row-group-prune.  Two sort orders cannot
    share one file set; duplicating a millions-row catalog is the
    same trade Solr's ReversedWildcardFilter makes in-index."""
    zoned = "zone" in dictionary.columns

    def publish(parts: list, target: str) -> None:
        out = (dictionary.repartitionByRange(*parts)
               if n_partitions is None
               else dictionary.repartitionByRange(n_partitions, *parts))
        (out.sortWithinPartitions(*parts)
            .write.mode("overwrite").parquet(target))

    main = path or dictionary_path(out_dir)
    zcol = [F.col("zone")] if zoned else []
    publish(zcol + [F.col("term")], main)
    if reversed_too and "rterm" in dictionary.columns:
        publish(zcol + [F.col("rterm")], main + "_r")


def heal_swapped_dir(target: str) -> bool:
    """Self-heal the fold's rename-aside crash window: the atomic
    catalog swap is rename(target, target_old); rename(stage, target);
    rmtree(target_old).  A crash between the first two renames leaves
    NO live directory but an intact ``<target>_old`` — restore it so
    readers (and the next fold) never see a missing catalog.  Returns
    True when a restore happened."""
    old = target + "_old"
    if not os.path.isdir(target) and os.path.isdir(old):
        os.rename(old, target)
        return True
    return False


def load_dictionary(spark: SparkSession, out_dir: str) -> DataFrame:
    """The published term catalog; raises if compaction never wrote one."""
    p = dictionary_path(out_dir)
    heal_swapped_dir(p)
    if not os.path.isdir(p):
        raise FileNotFoundError(
            f"no dictionary under {p} — run compact_index first")
    return spark.read.parquet(p)


def load_reversed_dictionary(spark: SparkSession, out_dir: str) -> DataFrame:
    """The rterm-sorted companion projection; raises if the store's
    catalog predates it (re-run compact_index with force=True)."""
    p = reversed_dictionary_path(out_dir)
    heal_swapped_dir(p)
    if not os.path.isdir(p):
        raise FileNotFoundError(
            f"no reversed dictionary under {p} — re-run compact_index "
            "(force=True) to publish it")
    return spark.read.parquet(p)
