"""Incremental index ingest via Structured Streaming foreachBatch.

The reference's crawler pushes documents into IndexWriteHandler
(/root/reference/index.h:370-381) continuously; chunk rotation gives
bounded in-memory state. The Spark-native analog: a streaming source
(file drop / Kafka) feeding ``foreachBatch``, where every micro-batch is
built into one immutable index chunk with the SAME batch kernel as the
offline build — the chunk layout on disk is identical, so batch-built
and stream-built indexes are interchangeable and one query path serves
both (Kappa-style).

Doc ids for streamed chunks continue from the last committed chunk's
doc_hi (monotone, like the reference's insertion ordinal); within a
batch, order is pinned by (repo, path) as usual.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from index_spark.operators.build import (
    DEFAULT_SHARD_SIZE,
    build_sharded_index,
    doc_lengths,
    doc_term_counts,
    postings,
    tokenized_docs,
)
from index_spark.plans import checkpoint as cp


def _next_chunk_and_doc(out_dir: str) -> tuple[int, int]:
    lin = cp.lineage(out_dir) if os.path.isdir(os.path.join(out_dir, "chunks")) else []
    if not lin:
        return 0, 0
    last = lin[-1]
    return last["chunk_id"] + 1, last["doc_hi"]


def ingest_batch(spark: SparkSession, batch_df: DataFrame, out_dir: str,
                 shard_size: int = DEFAULT_SHARD_SIZE, stem: bool = True,
                 positions: bool = False) -> dict:
    """Index one micro-batch as a new immutable chunk. Used directly by
    tests and as the foreachBatch body."""
    os.makedirs(os.path.join(out_dir, "chunks"), exist_ok=True)
    chunk_id, doc_base = _next_chunk_and_doc(out_dir)
    # doc_base must sit on a shard boundary so shard ids stay global
    doc_base = ((doc_base + shard_size - 1) // shard_size) * shard_size

    t0 = time.time()
    ordered = batch_df.select("repo", "path", "content") \
        .repartitionByRange(max(spark.sparkContext.defaultParallelism, 2), "repo", "path") \
        .sortWithinPartitions("repo", "path")
    from index_spark.operators.build import assign_doc_ids

    with_ids = assign_doc_ids(ordered).withColumn(
        "doc_id", F.col("doc_id") + F.lit(doc_base))
    if positions:
        # position-carrying chunks use the (term, doc, tf, positions)
        # relation; doc count comes from the id assignment (the postings
        # relation drops token-less docs)
        counts = postings(tokenized_docs(with_ids, stem=stem),
                          positions=True).persist()
    else:
        counts = doc_term_counts(with_ids, stem=stem).persist()
    doclens = doc_lengths(counts)
    agg = doclens.agg(F.count("*").alias("n"), F.sum("doc_len").alias("tok")).collect()[0]
    n = int(with_ids.count()) if positions else int(agg["n"] or 0)
    if n == 0:
        counts.unpersist()
        return {"chunk_id": None, "n_docs": 0}

    index = build_sharded_index(counts, shard_size=shard_size)
    cdir = os.path.join(out_dir, "chunks", f"{chunk_id:05d}")
    index.write.mode("overwrite").parquet(os.path.join(cdir, "index"))
    with_ids.select("doc_id", "repo", "path") \
        .join(doclens, "doc_id") \
        .write.mode("overwrite").parquet(os.path.join(cdir, "docs"))
    idx_stats = spark.read.parquet(os.path.join(cdir, "index")).agg(
        F.count("*").alias("rows"), F.sum("df").alias("postings"),
        F.sum(F.length("doc_blob") + F.length("tf_blob") + F.length("dl_blob")).alias("blob_bytes"),
        F.countDistinct("term").alias("terms")).collect()[0]
    counts.unpersist()

    manifest = {
        "chunk_id": chunk_id, "doc_lo": doc_base, "doc_hi": doc_base + n,
        "n_docs": n, "n_tokens": int(agg["tok"] or 0),
        "n_terms": int(idx_stats["terms"]),
        "n_postings": int(idx_stats["postings"] or 0),
        "index_rows": int(idx_stats["rows"]),
        "blob_bytes": int(idx_stats["blob_bytes"] or 0),
        "shard_size": shard_size, "stem": stem, "positions": positions,
        "stages": {"streamed": True},
        "wall_s": round(time.time() - t0, 3),
    }
    tmp = os.path.join(cdir, "_COMMIT.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.rename(tmp, os.path.join(cdir, "_COMMIT.json"))
    cp._write_global_stats(out_dir)
    return manifest


def start_file_stream(spark: SparkSession, in_dir: str, out_dir: str,
                      schema, shard_size: int = DEFAULT_SHARD_SIZE,
                      stem: bool = True, trigger_once: bool = True,
                      positions: bool = False):
    """readStream(file source) -> foreachBatch(chunk build). Returns the
    StreamingQuery (caller awaits/stops)."""
    stream = spark.readStream.schema(schema).parquet(in_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(batch_df.sparkSession, batch_df, out_dir,
                     shard_size=shard_size, stem=stem, positions=positions)

    writer = stream.writeStream.foreachBatch(handle) \
        .option("checkpointLocation", os.path.join(out_dir, "_stream_checkpoint"))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
