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
    DOC_MARKER,
    _bucket_partition,
    _build_bucketed,
    _ids_from_parted,
    doclens_from_index,
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
                 positions: bool = False, camel: bool = True) -> dict:
    """Index one micro-batch as a new immutable chunk. Used directly by
    tests and as the foreachBatch body.

    The chunk is built with the SAME fused Arrow kernel as the offline
    build (checkpoint.py uses it too): the batch's ONLY wide exchange is
    the bucket repartition of the doc-id assignment; tokenize + count +
    compress (+ position deltas when ``positions=True``) happen in one
    mapInArrow pass, so streamed and batch-built chunks are
    byte-identical for identical input (Kappa). Round-2 note: the
    positions path previously ran posexplode + groupBy(term, doc) +
    groupBy(shard) — two extra wide exchanges per micro-batch — and the
    non-positions path one; both now ride the single-exchange plan."""
    os.makedirs(os.path.join(out_dir, "chunks"), exist_ok=True)
    chunk_id, doc_base = _next_chunk_and_doc(out_dir)
    # doc_base must sit on a shard boundary so shard ids stay global
    doc_base = ((doc_base + shard_size - 1) // shard_size) * shard_size

    t0 = time.time()
    parted, offsets, counts = _bucket_partition(
        batch_df.select("repo", "path", "content"))
    n = sum(counts.values()) if counts else 0
    if n == 0:
        return {"chunk_id": None, "n_docs": 0}
    # shifting every bucket offset by doc_base keeps the contiguity
    # invariant and lands this chunk's ids after the last committed chunk
    offsets = {b: off + doc_base for b, off in offsets.items()}

    index = _build_bucketed(parted, offsets, counts, stem, shard_size,
                            camel=camel, positions=positions)
    cdir = os.path.join(out_dir, "chunks", f"{chunk_id:05d}")
    index.write.mode("overwrite").parquet(os.path.join(cdir, "index"))
    idx_back = spark.read.parquet(os.path.join(cdir, "index"))
    _ids_from_parted(parted, offsets, counts, ["repo", "path"]) \
        .join(doclens_from_index(idx_back), "doc_id") \
        .write.mode("overwrite").parquet(os.path.join(cdir, "docs"))
    marker = idx_back.filter(F.col("term") == DOC_MARKER).agg(
        F.sum("cf").alias("tok")).collect()[0]
    idx_stats = idx_back.filter(F.col("term") != DOC_MARKER).agg(
        F.count("*").alias("rows"), F.sum("df").alias("postings"),
        F.sum(F.length("doc_blob") + F.length("tf_blob") + F.length("dl_blob")).alias("blob_bytes"),
        F.countDistinct("term").alias("terms")).collect()[0]

    manifest = {
        "chunk_id": chunk_id, "doc_lo": doc_base, "doc_hi": doc_base + n,
        "n_docs": n, "n_tokens": int(marker["tok"] or 0),
        "n_terms": int(idx_stats["terms"]),
        "n_postings": int(idx_stats["postings"] or 0),
        "index_rows": int(idx_stats["rows"]),
        "blob_bytes": int(idx_stats["blob_bytes"] or 0),
        "shard_size": shard_size, "stem": stem, "positions": positions,
        "camel": camel,
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
