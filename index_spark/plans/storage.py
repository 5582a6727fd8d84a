"""At-rest serving layouts for the index table.

The reference serves lookups from an mmap'd hash blob
(`blob->Find(key)`, /root/reference/index.cpp:9-14). The columnar
equivalents, by access pattern:

- **plain parquet** (build output): term-sorted row groups per shard
  batch -> min/max stats prune term scans; good for analytics sweeps.
- **term-bucketed table** (`save_serving_index`): Spark bucketBy(term) +
  sortBy(term) -> an equality/IN term filter prunes to the matching
  BUCKET files before any row is read ("SelectedBucketsCount" in the
  plan) — the hash-probe analog: O(1) file selection by term hash, then
  sorted min/max pruning inside the bucket. At 10^12-doc scale this is
  the point-lookup layout; joins on term also co-locate without a
  shuffle.

Bucketed writes require a table (Spark's bucketing metadata lives in the
catalog), so these helpers use saveAsTable against the session catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_serving_index(index: DataFrame, table: str = "serving_index",
                       n_buckets: int = 64, path: str | None = None) -> None:
    """Write the index term-bucketed + term-sorted for point-lookup
    serving. ``n_buckets`` should scale with total index size (files per
    bucket stay near one per writing task).

    A ZONED index is PARTITIONED by zone and bucketed by term (Spark
    bucket-prunes only single-column bucket specs): the zone-pinned
    point lookup every zoned query path issues (``zone = 'body' AND term
    = 'x'``) then directory-prunes to the zone AND bucket-prunes to the
    term's files — the columnar analog of the reference's zone-prefixed
    hash keys ('@title' etc., index.h:320-326) pruning the key space.
    Zones are few and bounded, so zone directories never explode."""
    w = index.write.format("parquet").mode("overwrite")
    if "zone" in index.columns:
        w = w.partitionBy("zone")
    w = w.bucketBy(n_buckets, "term").sortBy("term")
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def load_serving_index(spark: SparkSession,
                       table: str = "serving_index") -> DataFrame:
    """Open the serving table with bucketed scans forced on: Spark's
    auto-bucketed-scan heuristic only keeps bucketing for joins and
    aggregates, but a serving session wants bucket PRUNING on term
    equality filters (the plan then shows ``SelectedBucketsCount: 1 out
    of N`` — only the matching bucket's files are listed/read)."""
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
                   "false")
    return spark.table(table)
