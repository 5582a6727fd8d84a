"""Chunked, resumable index build with per-chunk checkpoints + lineage.

The Spark-scale analog of the reference's chunk rotation
(/root/reference/index.h:26-27,370-381: flush a chunk every MAX_DOCS docs
and open the next integer-named file; /root/reference/index.cpp:60-99):
the corpus is split into contiguous doc_id ranges ("chunks"); each chunk
is built as an independent Spark job and committed atomically to
``<out_dir>/chunks/<chunk_id>/`` with a ``_COMMIT.json`` manifest carrying
lineage (input range, counts, bytes, wall time, per-stage metrics).

Resumability (north_rule): a restart skips every chunk whose commit
manifest exists — the expensive tokenize/shuffle/blob work is never
redone. Chunk boundaries are multiples of ``shard_size``, so shard ids
are globally consistent across chunks and the chunked index can be
queried directly (a union of chunk tables) or concat-merged into the
global per-term index (operators/merge.py) without re-sorting — chunk
doc ranges are disjoint and ordered, exactly like the build shards.

Determinism: chunk contents depend only on (corpus order, chunk size) —
doc_ids come from the total (repo, path) order — so re-running a failed
chunk reproduces identical bytes (no nondeterministic UDFs, no
monotonically_increasing_id; SURVEY.md §7 "checkpoint semantics").
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
    assign_doc_ids,
    build_partition_index,
    doclens_from_index,
)

DEFAULT_DOCS_PER_CHUNK = 5000  # reference MAX_DOCS, index.h:27


def _chunk_dir(out_dir: str, chunk_id: int) -> str:
    return os.path.join(out_dir, "chunks", f"{chunk_id:05d}")


def _commit_path(out_dir: str, chunk_id: int) -> str:
    return os.path.join(_chunk_dir(out_dir, chunk_id), "_COMMIT.json")


def chunk_is_committed(out_dir: str, chunk_id: int) -> bool:
    return os.path.exists(_commit_path(out_dir, chunk_id))


def build_chunked(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    docs_per_chunk: int = DEFAULT_DOCS_PER_CHUNK,
    shard_size: int = DEFAULT_SHARD_SIZE,
    stem: bool = True,
    camel: bool = True,
    positions: bool = False,
    fail_after_chunk: int | None = None,  # test hook: simulate a crash
) -> dict:
    """Build (or resume) the chunked index under ``out_dir``.

    Returns the run report: chunks built / skipped and totals.
    """
    os.makedirs(os.path.join(out_dir, "chunks"), exist_ok=True)
    # align chunk boundary to shard boundary so shards never straddle chunks
    docs_per_chunk = max(shard_size, (docs_per_chunk // shard_size) * shard_size)

    with_ids = assign_doc_ids(corpus)
    with_ids = with_ids.persist()
    n_docs = with_ids.count()
    n_chunks = (n_docs + docs_per_chunk - 1) // docs_per_chunk

    report = {"n_docs": n_docs, "n_chunks": n_chunks, "built": [], "skipped": []}
    for cid in range(n_chunks):
        if chunk_is_committed(out_dir, cid):
            report["skipped"].append(cid)
            continue
        lo, hi = cid * docs_per_chunk, min((cid + 1) * docs_per_chunk, n_docs)
        t0 = time.time()
        chunk_corpus = with_ids.where(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi))

        # fused Arrow build per chunk (chunk partitions keep the
        # contiguous-doc_id invariant, so the zero-shuffle path applies)
        stage_t0 = time.time()
        index = build_partition_index(chunk_corpus, stem=stem,
                                      shard_size=shard_size, camel=camel,
                                      positions=positions)
        cdir = _chunk_dir(out_dir, cid)
        index.write.mode("overwrite").parquet(os.path.join(cdir, "index"))
        build_write_s = time.time() - stage_t0

        idx_back = spark.read.parquet(os.path.join(cdir, "index"))
        agg = idx_back.filter(F.col("term") == DOC_MARKER).agg(
            F.sum("df").alias("n"), F.sum("cf").alias("tok")).collect()[0]

        docs_dim = chunk_corpus.select("doc_id", "repo", "path") \
            .join(doclens_from_index(idx_back), "doc_id")
        docs_dim.write.mode("overwrite").parquet(os.path.join(cdir, "docs"))

        idx_stats = idx_back.filter(F.col("term") != DOC_MARKER).agg(
            F.count("*").alias("rows"),
            F.sum("df").alias("postings"),
            F.sum(F.length("doc_blob") + F.length("tf_blob") + F.length("dl_blob")).alias("blob_bytes"),
            F.countDistinct("term").alias("terms"),
        ).collect()[0]

        manifest = {
            "chunk_id": cid,
            "doc_lo": lo,
            "doc_hi": hi,
            "n_docs": int(agg["n"]),
            "n_tokens": int(agg["tok"] or 0),
            "n_terms": int(idx_stats["terms"]),
            "n_postings": int(idx_stats["postings"] or 0),
            "index_rows": int(idx_stats["rows"]),
            "blob_bytes": int(idx_stats["blob_bytes"] or 0),
            "shard_size": shard_size,
            "stem": stem,
            "camel": camel,
            "positions": positions,
            "stages": {"build_write_s": round(build_write_s, 3)},
            "wall_s": round(time.time() - t0, 3),
        }
        # atomic commit: manifest written last, via rename
        tmp = _commit_path(out_dir, cid) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.rename(tmp, _commit_path(out_dir, cid))
        report["built"].append(cid)

        if fail_after_chunk is not None and cid >= fail_after_chunk:
            with_ids.unpersist()
            raise RuntimeError(f"simulated crash after chunk {cid}")

    with_ids.unpersist()
    _write_global_stats(out_dir)
    return report


def _write_global_stats(out_dir: str) -> None:
    """Aggregate chunk manifests into global stats (N, avgdl, totals)."""
    chunks_dir = os.path.join(out_dir, "chunks")
    manifests = []
    for name in sorted(os.listdir(chunks_dir)):
        p = os.path.join(chunks_dir, name, "_COMMIT.json")
        if os.path.exists(p):
            with open(p) as f:
                manifests.append(json.load(f))
    n_docs = sum(m["n_docs"] for m in manifests)
    n_tokens = sum(m["n_tokens"] for m in manifests)
    stats = {
        "n_docs": n_docs,
        "avgdl": (n_tokens / n_docs) if n_docs else 0.0,
        "total_tokens": n_tokens,
        "n_chunks": len(manifests),
        "n_postings": sum(m["n_postings"] for m in manifests),
        "blob_bytes": sum(m["blob_bytes"] for m in manifests),
    }
    tmp = os.path.join(out_dir, "stats.json.tmp")
    with open(tmp, "w") as f:
        json.dump(stats, f, indent=1)
    os.rename(tmp, os.path.join(out_dir, "stats.json"))


def load_stats(out_dir: str) -> dict:
    with open(os.path.join(out_dir, "stats.json")) as f:
        return json.load(f)


def load_index(spark: SparkSession, out_dir: str) -> DataFrame:
    """Union of all committed chunk indexes (shard ids are global)."""
    return spark.read.parquet(os.path.join(out_dir, "chunks", "*", "index"))


def load_docs(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "chunks", "*", "docs"))


def compact_index(spark: SparkSession, out_dir: str,
                  segment_bytes: int | None = None,
                  force: bool = False,
                  serving_table: str | None = None,
                  serving_buckets: int = 64) -> dict:
    """Compact every committed chunk into the merged global index under
    ``<out_dir>/merged/`` — the background-merge step of the index
    lifecycle (build chunks online, serve the compacted form).

    Idempotent + incremental: the merge manifest records the chunk set
    it was built from; re-running with the same committed chunks is a
    no-op, while new chunks (or ``force=True``) trigger a re-merge.
    The merge itself is :func:`~index_spark.operators.merge.merge_shards`
    — hot terms split into bounded doc-range segments, so compaction has
    no unbounded reducer at any corpus size — and the commit is atomic
    (manifest written last, via rename), matching the chunk protocol.

    ``serving_table``: additionally publish the merged index as a
    term-bucketed serving table (:func:`~index_spark.plans.storage.
    save_serving_index`) — the point-lookup layout — in the same
    compaction pass; the table name is recorded in the manifest.

    Returns the manifest: {"chunks", "rows", "terms", "blob_bytes",
    "skipped", "wall_s"[, "serving_table"]}.
    """
    from index_spark.operators.merge import merge_shards

    chunks_dir = os.path.join(out_dir, "chunks")
    chunk_ids = sorted(
        int(name) for name in os.listdir(chunks_dir)
        if chunk_is_committed(out_dir, int(name)))
    if not chunk_ids:
        raise ValueError(f"no committed chunks under {chunks_dir}")
    mdir = os.path.join(out_dir, "merged")
    mpath = os.path.join(mdir, "_COMMIT.json")
    if os.path.exists(mpath) and not force:
        with open(mpath) as f:
            prev = json.load(f)
        if prev.get("chunks") == chunk_ids:
            prev["skipped"] = True
            return prev

    t0 = time.time()
    kwargs = {} if segment_bytes is None else {"segment_bytes": segment_bytes}
    merged = merge_shards(load_index(spark, out_dir), **kwargs)
    os.makedirs(mdir, exist_ok=True)
    merged.write.mode("overwrite").parquet(os.path.join(mdir, "index"))

    back = spark.read.parquet(os.path.join(mdir, "index"))
    agg = back.agg(
        F.count("*").alias("rows"),
        F.countDistinct("term").alias("terms"),
        F.sum(F.length("doc_blob") + F.length("tf_blob")
              + F.length("dl_blob")).alias("blob_bytes")).collect()[0]
    # publish the compact term-dictionary artifact in the same pass —
    # the merged form is already the smallest relation that has every
    # term (plans/dictionary.py; the fuzzy/spell/complete/prefix family
    # reads THIS, never the sharded index)
    from index_spark.plans.dictionary import (
        dictionary_from_index,
        write_dictionary,
    )

    write_dictionary(dictionary_from_index(back), out_dir)

    manifest = {
        "chunks": chunk_ids,
        "rows": int(agg["rows"]),
        "terms": int(agg["terms"]),
        "blob_bytes": int(agg["blob_bytes"] or 0),
        "skipped": False,
        "wall_s": round(time.time() - t0, 3),
    }
    if serving_table:
        from index_spark.plans.storage import save_serving_index

        save_serving_index(back, table=serving_table,
                           n_buckets=serving_buckets)
        manifest["serving_table"] = serving_table
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.rename(tmp, mpath)
    return manifest


def load_merged_index(spark: SparkSession, out_dir: str) -> DataFrame:
    """The compacted global index (compact_index output); raises if no
    compaction has been committed."""
    if not os.path.exists(os.path.join(out_dir, "merged", "_COMMIT.json")):
        raise FileNotFoundError(
            f"no committed compaction under {out_dir}/merged — "
            "run compact_index first")
    return spark.read.parquet(os.path.join(out_dir, "merged", "index"))


def lineage(out_dir: str) -> list[dict]:
    """All chunk manifests, ordered — the build's lineage/metrics log."""
    chunks_dir = os.path.join(out_dir, "chunks")
    out = []
    for name in sorted(os.listdir(chunks_dir)):
        p = os.path.join(chunks_dir, name, "_COMMIT.json")
        if os.path.exists(p):
            with open(p) as f:
                out.append(json.load(f))
    return out
