"""Store concatenation — Lucene's ``IndexWriter.addIndexes`` for the
chunked store: append every committed chunk of a SOURCE store onto a
DESTINATION store, remapping the source's doc-id space by one fixed
shard-aligned offset.  (The reference's chunks are independent immutable
blobs with their own docID spaces, /root/reference/index.cpp:60-99;
importing one engine's chunks into another is exactly this remap.)

Why it is cheap: build shards are doc-id RANGES and every posting blob
delta-encodes doc ids, so shifting an entire store by ``offset`` only
rewrites the FIRST varbyte of each blob (the gap from 0) — the rest of
the bytes are copied verbatim.  The whole operation is a map-only
Arrow-batched pass per chunk: no shuffle, no decode of posting tails,
O(rows + blob bytes) memcpy.  At 100 TB the per-row work is the same
O(1) patch; chunks stream through independently so the append
parallelizes file-per-task.

After the append the destination's merged form (if any) is stale by
construction; the next :func:`~index_spark.plans.checkpoint.compact_index`
sees a strictly-extended chunk set and folds the imported chunks
incrementally.  ``fsck`` (plans/fsck.py) validates the junction: the
first imported chunk's ``doc_lo`` is the destination's last ``doc_hi``
rounded up to the next shard boundary — the same contract streaming
ingest uses.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from index_spark.functions import varbyte as vb
from index_spark.plans import checkpoint as cp


def shift_index(index: DataFrame, offset_docs: int,
                shard_size: int) -> DataFrame:
    """Shift an index relation's entire doc-id space by ``offset_docs``
    (a multiple of ``shard_size`` so shard ids stay aligned).

    Per row: patch the first varbyte of ``doc_blob`` (the absolute
    first doc id), shift ``shard``/``first_doc``/``last_doc``, shift
    skip-entry doc values and block ``last_doc``s, and slide block byte
    offsets past the patched varbyte by its length change.  tf/dl/pos
    blobs are doc-local — copied untouched.  Map-only; schema preserved.
    """
    if offset_docs % shard_size:
        raise ValueError(f"offset_docs={offset_docs} must be a multiple "
                         f"of shard_size={shard_size}")
    if offset_docs == 0:
        return index
    offset_shards = offset_docs // shard_size
    schema = index.schema

    def _shift(batches):
        for pdf in batches:
            out = pdf.copy()
            doc_blobs, blocks_col, skips_col = [], [], []
            for row in pdf.itertuples(index=False):
                blob = bytes(row.doc_blob)
                if blob:
                    first, consumed = vb.decode_first(blob)
                    patched = vb.encode_one(first + offset_docs)
                    dlen = len(patched) - consumed
                    doc_blobs.append(patched + blob[consumed:])
                else:
                    dlen = 0
                    doc_blobs.append(blob)
                blocks_col.append([
                    {"start": int(b["start"]),
                     "last_doc": int(b["last_doc"]) + offset_docs,
                     "max_tf": int(b["max_tf"]),
                     "min_dl": float(b["min_dl"]),
                     # offset 0 == the patched varbyte itself (no shift);
                     # later offsets slide by its byte-length change
                     "doc_off": int(b["doc_off"])
                     + (dlen if int(b["doc_off"]) else 0),
                     "tf_off": int(b["tf_off"]),
                     "dl_off": int(b["dl_off"])}
                    for b in row.blocks])
                skips_col.append([
                    {"idx": int(s["idx"]), "doc": int(s["doc"]) + offset_docs}
                    for s in row.skips])
            out["doc_blob"] = doc_blobs
            out["blocks"] = blocks_col
            out["skips"] = skips_col
            out["shard"] = pdf["shard"] + offset_shards
            out["first_doc"] = pdf["first_doc"] + offset_docs
            out["last_doc"] = pdf["last_doc"] + offset_docs
            yield out

    return index.mapInPandas(_shift, schema=schema)


_SETTINGS = ("shard_size", "stem", "positions", "camel")


def concat_stores(spark: SparkSession, dst_dir: str, src_dir: str) -> dict:
    """Append every committed chunk of ``src_dir`` onto ``dst_dir``,
    shifting the source doc-id space past the destination's.  Both
    stores must share build settings (shard_size/stem/positions/camel —
    a stemmed and an unstemmed index have incompatible vocabularies).

    Chunk commit protocol matches the builders: data files first, then
    the atomic ``_COMMIT.json`` rename — a crash mid-append leaves only
    uncommitted (invisible) chunk dirs.  Returns the append summary.
    """
    def _lin(d: str) -> list:
        return (cp.lineage(d)
                if os.path.isdir(os.path.join(d, "chunks")) else [])

    dlin, slin = _lin(dst_dir), _lin(src_dir)
    if not slin:
        return {"chunks_appended": 0, "doc_offset": 0, "n_docs": 0}
    if not dlin:
        raise ValueError(f"destination {dst_dir} has no committed chunks "
                         "(build or ingest it first; concat extends an "
                         "existing store)")
    for k in _SETTINGS:
        if dlin[0].get(k) != slin[0].get(k):
            raise ValueError(
                f"store settings differ on {k!r}: destination="
                f"{dlin[0].get(k)!r} source={slin[0].get(k)!r} — "
                "indexes built under different settings cannot concat")
    shard_size = int(dlin[0]["shard_size"])
    prev_hi = int(dlin[-1]["doc_hi"])
    offset = ((prev_hi + shard_size - 1) // shard_size) * shard_size
    next_id = int(dlin[-1]["chunk_id"]) + 1

    appended, n_docs = [], 0
    for m in slin:
        src_c = cp._chunk_dir(src_dir, m["chunk_id"])
        dst_c = cp._chunk_dir(dst_dir, next_id)
        idx = spark.read.parquet(os.path.join(src_c, "index"))
        (shift_index(idx, offset, shard_size)
         .write.mode("overwrite").parquet(os.path.join(dst_c, "index")))
        # shifting can grow the patched first varbyte of each doc_blob,
        # so the source manifest's blob_bytes is stale — recount from
        # the written rows (one pruned-column scan per chunk)
        from index_spark.operators.build import DOC_MARKER
        bb = (spark.read.parquet(os.path.join(dst_c, "index"))
              .filter(F.col("term") != DOC_MARKER)
              .agg(F.sum(F.length("doc_blob") + F.length("tf_blob")
                         + F.length("dl_blob")).alias("b")).collect()[0]["b"])
        (spark.read.parquet(os.path.join(src_c, "docs"))
         .withColumn("doc_id", F.col("doc_id") + F.lit(offset))
         .write.mode("overwrite").parquet(os.path.join(dst_c, "docs")))
        man = dict(m)
        man.update(chunk_id=next_id,
                   blob_bytes=int(bb or 0),
                   doc_lo=int(m["doc_lo"]) + offset,
                   doc_hi=int(m["doc_hi"]) + offset,
                   stages={**(m.get("stages") or {}),
                           "concat_from": os.path.abspath(src_dir),
                           "src_chunk_id": m["chunk_id"],
                           "doc_offset": offset})
        tmp = os.path.join(dst_c, "_COMMIT.json.tmp")
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1)
        os.rename(tmp, os.path.join(dst_c, "_COMMIT.json"))
        appended.append(next_id)
        n_docs += int(m["n_docs"])
        next_id += 1
    # the source's tombstone log (delete_docs/upsert_docs) is part of
    # its logical state: remap it by the same offset and append it to
    # the destination's log, else logically-deleted source docs (or the
    # stale pre-upsert versions) would resurrect in the combined store
    from index_spark.operators.maintenance import (
        delete_docs,
        load_tombstones,
    )

    n_tombstones = 0
    src_tomb = load_tombstones(spark, src_dir)
    if src_tomb is not None:
        n_tombstones = delete_docs(
            spark, dst_dir,
            src_tomb.withColumn("doc_id", F.col("doc_id") + F.lit(offset)),
            tag="concat")
    cp._write_global_stats(dst_dir)
    return {"chunks_appended": len(appended), "chunk_ids": appended,
            "doc_offset": offset, "n_docs": n_docs,
            "tombstones_carried": n_tombstones}
