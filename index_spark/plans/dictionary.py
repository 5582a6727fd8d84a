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


# ---------------------------------------------------------------------------
# front-coded dictionary blocks (IIR §5.2 "blocked storage with front
# coding"): consecutive sorted terms share long prefixes, so a block of
# B terms stores the head term verbatim and every other term as
# (lcp vs PREVIOUS term, suffix).  At rest this is the classic
# dictionary-compression artifact; the reference's sorted chunk keys
# (/root/reference/index.cpp:51-52) are the same sorted-at-rest idea.
#
# Scale shape: the encode is range-partition-local (terms range-
# partitioned, blocks never cross partitions, lcp via one lag window
# per partition — no global sequence), and the block relation stores
# (head, last) per block so prefix scans prune whole blocks through
# ordinary parquet min/max before any decode.  Decode is a bounded
# JVM aggregate per block row (B <= 128 entries).
# ---------------------------------------------------------------------------


def _lcp_expr(a, b):
    """Length of the longest common prefix of two string columns —
    prefix equality is monotone in i, so counting the i with equal
    prefixes IS the lcp (terms are short; the quadratic substr is
    bounded by max term length)."""
    n = F.least(F.length(a), F.length(b))
    return F.size(F.filter(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda i: (n > 0) & (F.substring(a, 1, i) == F.substring(b, 1, i))))


def front_code_dictionary(dictionary: DataFrame, block: int = 16,
                          n_parts: int | None = None) -> DataFrame:
    """(part, block_id, head, last, n_terms, entries) — entries =
    array<struct<lcp int, suffix string, df long>>; entry 0 is the
    block head (lcp = -1, suffix = the full term).  Sorted by
    (part, block_id) == term order.

    Note: Spark's range partitioner samples bounds, so BLOCK
    COMPOSITION can differ run to run at partition edges; the decoded
    CONTENT is identical regardless (round-trip pinned) — only the
    at-rest grouping varies, exactly like file splits."""
    from pyspark.sql.window import Window

    cols = dictionary.select("term", "df")
    parted = (cols.repartitionByRange(
        *( [n_parts] if n_parts else [] ), F.col("term"))
        .withColumn("part", F.spark_partition_id()))
    w = Window.partitionBy("part").orderBy("term")
    rows = (parted
            .withColumn("rn", F.row_number().over(w) - 1)
            .withColumn("prev", F.lag("term").over(w))
            .withColumn("block_id", (F.col("rn") / block).cast("long"))
            .withColumn("in_block", (F.col("rn") % block).cast("int")))
    ent = F.when(
        F.col("in_block") == 0,
        F.struct(F.lit(-1).alias("lcp"), F.col("term").alias("suffix"),
                 F.col("df").alias("df"))
    ).otherwise(
        F.struct(_lcp_expr(F.col("prev"), F.col("term")).alias("lcp"),
                 F.expr("substring(term, "
                        "size(filter(sequence(1, greatest(least(length(prev),"
                        "length(term)), 1)), i -> substring(prev, 1, i) = "
                        "substring(term, 1, i))) + 1)").alias("suffix"),
                 F.col("df").alias("df")))
    return (rows.select("part", "block_id", "in_block", "term",
                        ent.alias("e"))
            .groupBy("part", "block_id")
            .agg(F.min("term").alias("head"),
                 F.max("term").alias("last"),
                 F.count("*").alias("n_terms"),
                 F.array_sort(F.collect_list(
                     F.struct(F.col("in_block"), F.col("e"))))
                 .alias("_es"))
            .withColumn("entries", F.transform(F.col("_es"),
                                               lambda s: s["e"]))
            .drop("_es"))


def decode_front_coded(blocks: DataFrame) -> DataFrame:
    """Inverse of :func:`front_code_dictionary`: back to (term, df)
    rows.  The within-block sequential reconstruction (each term =
    prefix of the PREVIOUS term + suffix) is one JVM ``aggregate``
    fold per block row — no Python, no shuffle beyond the scan."""
    folded = F.aggregate(
        F.col("entries"),
        F.struct(F.lit("").alias("prev"),
                 F.array().cast("array<struct<term:string,df:bigint>>")
                 .alias("out")),
        lambda acc, e: F.struct(
            F.concat(F.substring(acc["prev"], 1,
                                 F.greatest(e["lcp"], F.lit(0))),
                     e["suffix"]).alias("prev"),
            F.concat(
                acc["out"],
                F.array(F.struct(
                    F.concat(F.substring(acc["prev"], 1,
                                         F.greatest(e["lcp"], F.lit(0))),
                             e["suffix"]).alias("term"),
                    e["df"].cast("bigint").alias("df")))).alias("out")),
        lambda acc: acc["out"])
    return (blocks.select(F.explode(folded).alias("r"))
            .select(F.col("r.term").alias("term"),
                    F.col("r.df").alias("df")))


def prefix_scan_front_coded(blocks: DataFrame, prefix: str) -> DataFrame:
    """Prefix lookup over the block relation: whole blocks prune via
    (head, last) range predicates (parquet min/max at rest) BEFORE any
    decode; only surviving blocks reconstruct."""
    hi = prefix + "￿"
    cand = blocks.filter((F.col("head") <= hi) & (F.col("last") >=
                                                  F.lit(prefix)))
    return (decode_front_coded(cand)
            .filter(F.col("term").startswith(prefix)))
