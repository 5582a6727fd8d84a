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


def _committed_chunk_ids(out_dir: str) -> list[int]:
    """Committed chunk ids — a cheap existence scan (no manifest parse),
    fit for the hot read path."""
    chunks_dir = os.path.join(out_dir, "chunks")
    if not os.path.isdir(chunks_dir):
        return []
    return sorted(int(n) for n in os.listdir(chunks_dir)
                  if n.isdigit() and chunk_is_committed(out_dir, int(n)))


def _snapshot_chunk_ids(out_dir: str, as_of: int) -> list[int]:
    """Committed chunk ids making up snapshot ``as_of`` (chunks commit
    in id order, so a snapshot is always the prefix 0..as_of)."""
    if not chunk_is_committed(out_dir, as_of):
        have = [m["chunk_id"] for m in lineage(out_dir)]
        raise ValueError(f"snapshot {as_of} is not committed under "
                         f"{out_dir} (committed: {have})")
    return list(range(as_of + 1))


def load_index(spark: SparkSession, out_dir: str,
               as_of: int | None = None) -> DataFrame:
    """Union of committed chunk indexes (shard ids are global).

    ``as_of`` time-travels: read the store exactly as it stood after
    chunk ``as_of`` committed (Iceberg snapshot-read semantics over the
    hand-rolled manifest log — each ``_COMMIT.json`` is a snapshot,
    and later chunks' files are simply not opened, so a reader is
    isolated from concurrent appends). Pair with :func:`stats_as_of`
    so BM25 idf/avgdl are snapshot-consistent too."""
    exp = set(expired_chunk_ids(out_dir))
    if as_of is None:
        if exp:
            raise ValueError(
                f"chunks {sorted(exp)} were expired by retention "
                "(expire_snapshots) — the chunk union no longer exists; "
                "serve from load_merged_index()")
        needed = _committed_chunk_ids(out_dir)
    else:
        needed = _snapshot_chunk_ids(out_dir, as_of)
        gone = sorted(exp & set(needed))
        if gone:
            raise ValueError(
                f"snapshot {as_of} needs chunks {gone} whose index data "
                "was expired by retention — time travel below the expiry "
                "floor is gone; serve current state from "
                "load_merged_index()")
    # explicit committed paths, never a chunks/*/ glob: an uncommitted
    # chunk dir (crash mid-build/mid-concat before its _COMMIT.json) must
    # stay invisible to readers, and a missing committed dir must fail
    # loudly instead of silently narrowing the union
    paths = [os.path.join(_chunk_dir(out_dir, cid), "index")
             for cid in needed]
    return spark.read.parquet(*paths)


def load_docs(spark: SparkSession, out_dir: str,
              as_of: int | None = None) -> DataFrame:
    needed = (_committed_chunk_ids(out_dir) if as_of is None
              else _snapshot_chunk_ids(out_dir, as_of))
    paths = [os.path.join(_chunk_dir(out_dir, cid), "docs")
             for cid in needed]
    return spark.read.parquet(*paths)


def snapshots(out_dir: str) -> list[dict]:
    """The store's snapshot log, oldest first: one entry per committed
    chunk with CUMULATIVE totals (the state a reader at that snapshot
    sees) and the manifest's commit time — the Iceberg snapshot-list
    equivalent over the chunk manifests."""
    out, docs, tokens, postings, bbytes = [], 0, 0, 0, 0
    for m in lineage(out_dir):
        docs += m["n_docs"]
        tokens += m["n_tokens"]
        postings += m["n_postings"]
        bbytes += m["blob_bytes"]
        out.append({
            "snapshot_id": m["chunk_id"],
            "committed_at": os.path.getmtime(
                _commit_path(out_dir, m["chunk_id"])),
            "doc_hi": m["doc_hi"],
            "n_docs": docs,
            "n_tokens": tokens,
            "n_postings": postings,
            "blob_bytes": bbytes,
        })
    return out


def stats_as_of(out_dir: str, as_of: int) -> dict:
    """Global stats as they stood at snapshot ``as_of`` — same math as
    the at-rest stats.json, restricted to the snapshot's manifests, so
    time-traveled queries score with the idf/avgdl of that moment."""
    cids = set(_snapshot_chunk_ids(out_dir, as_of))
    ms = [m for m in lineage(out_dir) if m["chunk_id"] in cids]
    n_docs = sum(m["n_docs"] for m in ms)
    n_tokens = sum(m["n_tokens"] for m in ms)
    return {
        "n_docs": n_docs,
        "avgdl": (n_tokens / n_docs) if n_docs else 0.0,
        "total_tokens": n_tokens,
        "n_chunks": len(ms),
        "n_postings": sum(m["n_postings"] for m in ms),
        "blob_bytes": sum(m["blob_bytes"] for m in ms),
    }


def load_store_index(spark: SparkSession, out_dir: str) -> DataFrame:
    """The store's best serving relation: the merged form when it is
    current (covers every committed chunk), else the chunk union.  A
    store whose old chunk data was removed by retention
    (:func:`expire_snapshots`) MUST serve from the merged form; if new
    chunks were appended since, fold them first (``compact_index``) —
    raised explicitly rather than silently serving a stale snapshot."""
    cids = _committed_chunk_ids(out_dir)
    mpath = os.path.join(out_dir, "merged", "_COMMIT.json")
    mman = None
    if os.path.exists(mpath):
        with open(mpath) as f:
            mman = json.load(f)
    if mman is not None and mman.get("chunks") == cids:
        return load_merged_index(spark, out_dir)
    if expired_chunk_ids(out_dir):
        raise ValueError(
            "store has expired chunks and a stale merged form — run "
            "compact_index to fold the appended chunks, then serve "
            "from the merged form")
    return load_index(spark, out_dir)


def _retention_path(out_dir: str) -> str:
    return os.path.join(out_dir, "retention.json")


def expired_chunk_ids(out_dir: str) -> list[int]:
    """Chunk ids whose index data was deleted by snapshot retention.

    Read from the store-level ``retention.json`` marker (one small file)
    rather than scanning every chunk manifest — this sits on the hot
    read path (:func:`load_index`), where an O(n_chunks) driver-side
    JSON scan per query would be a real cost at 10^4+ chunks."""
    p = _retention_path(out_dir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return list(json.load(f).get("expired", []))


def expire_snapshots(out_dir: str, keep_last: int = 0) -> dict:
    """Iceberg ``expire_snapshots`` for the chunked store: physically
    delete chunk INDEX data that is already folded into the merged form,
    keeping every manifest (lineage, global stats, the snapshot log) and
    every per-chunk ``docs`` dim (the doc dimension of record — doc_id →
    repo/path lookups survive expiry).

    Requires the merged form to cover EVERY committed chunk (compact
    first): expiry never deletes the only copy of a posting.
    ``keep_last`` retains the newest K chunks' index data, so time
    travel via ``load_index(as_of=...)`` keeps working down to the
    expiry floor; below it readers get a ValueError pointing at the
    merged form.  After expiry the store stays fully live for appends:
    new chunks commit normally and :func:`compact_index` folds them
    incrementally (the fold reads only NEW chunk data + affected merged
    partitions); only a structural FULL re-merge becomes impossible and
    raises.

    At 100 TB this is the difference between storage tracking the live
    index (merged form + recent deltas) and storage tracking corpus
    age (every chunk ever built, forever).
    """
    import shutil

    lin = lineage(out_dir)
    if not lin:
        raise ValueError(f"no committed chunks under {out_dir}")
    cids = [m["chunk_id"] for m in lin]
    mpath = os.path.join(out_dir, "merged", "_COMMIT.json")
    if not os.path.exists(mpath):
        raise ValueError("store has no merged form — compact_index "
                         "before expiring snapshots")
    with open(mpath) as f:
        mman = json.load(f)
    if mman.get("chunks") != cids:
        raise ValueError(
            f"merged form covers chunks {mman.get('chunks')} but "
            f"committed={cids} — compact_index before expiring "
            "(expiry never deletes the only copy of any posting)")
    victims = cids if keep_last <= 0 else cids[:-keep_last]
    expired, freed = [], 0
    for m in lin:
        if m["chunk_id"] not in victims:
            continue
        cpath = _commit_path(out_dir, m["chunk_id"])
        if not m.get("expired"):
            # MARK FIRST, delete second: a crash in between leaves a
            # loudly-flagged chunk (readers raise, fsck reports the
            # leftover data) instead of a silently partial index; the
            # delete below also runs for already-marked chunks, so a
            # re-run completes an interrupted expiry.  The manifest
            # mtime is the snapshot log's committed_at — preserve it.
            mtime = os.path.getmtime(cpath)
            man = dict(m)
            man["expired"] = True
            with open(cpath + ".tmp", "w") as f:
                json.dump(man, f, indent=1)
            os.utime(cpath + ".tmp", (mtime, mtime))
            os.rename(cpath + ".tmp", cpath)
            expired.append(m["chunk_id"])
        ipath = os.path.join(_chunk_dir(out_dir, m["chunk_id"]), "index")
        if os.path.isdir(ipath):
            freed += sum(os.path.getsize(os.path.join(r, f))
                         for r, _, fs in os.walk(ipath) for f in fs)
            shutil.rmtree(ipath)
    # store-level marker LAST (the cheap hot-path source of truth); it
    # is the union of everything ever expired.  A crash before this
    # point leaves manifests marked expired but the marker stale —
    # verify_store reconciles (manifest flags are re-read there), and
    # re-running expire_snapshots rewrites the marker.
    all_expired = sorted({m["chunk_id"] for m in lineage(out_dir)
                          if m.get("expired")})
    rp = _retention_path(out_dir)
    with open(rp + ".tmp", "w") as f:
        json.dump({"expired": all_expired}, f, indent=1)
    os.rename(rp + ".tmp", rp)
    return {"expired": expired,
            "retained": [c for c in cids if c not in victims],
            "index_bytes_freed": freed}


DEFAULT_TERM_BUCKETS = 64  # term-hash partitions of the merged index


def _tb_expr(n_term_buckets: int):
    # term-hash bucket: every segment row of one term lands in ONE
    # on-disk partition, so an incremental fold rewrites only the
    # partitions whose terms the delta touches
    return F.pmod(F.xxhash64("term"), F.lit(n_term_buckets)).cast("int")


def compact_index(spark: SparkSession, out_dir: str,
                  segment_bytes: int | None = None,
                  force: bool = False,
                  serving_table: str | None = None,
                  serving_buckets: int = 64,
                  n_term_buckets: int = DEFAULT_TERM_BUCKETS,
                  trigram: bool = False) -> dict:
    """Compact every committed chunk into the merged global index under
    ``<out_dir>/merged/index/tb=<k>/`` (term-hash-partitioned) — the
    background-merge step of the index lifecycle (build chunks online,
    serve the compacted form).

    TIERED: the manifest records the chunk set the merged form was built
    from; re-running with the same committed chunks is a no-op, and when
    only NEW chunks were appended (chunk ids strictly extend the
    previous set — the build/ingest protocol) the new chunks are merged
    as a DELTA and FOLDED into the existing merged form, touching only
    the term-hash partitions whose terms appear in the delta:

      * per affected term, the delta's merged rows concatenate onto the
        term's TAIL segment (doc ranges only ever append) when the
        combined blob stays within ``segment_bytes``; otherwise they
        land as new bounded segment rows after it — query kernels score
        disjoint doc-range segments of a term independently, so both
        shapes are rank-identical to a from-scratch merge;
      * rows of unaffected terms (and whole unaffected partitions) are
        never re-merged, re-read, or rewritten — compaction work is
        O(delta + affected rows), not O(total index), so cost tracks
        ingest rate instead of corpus age at 10^12-doc scale;
      * a structural change (``force``, different ``segment_bytes`` /
        ``n_term_buckets``, or a non-append chunk-set change) falls back
        to the full merge.

    The merge kernel is :func:`~index_spark.operators.merge.merge_shards`
    — hot terms split into bounded doc-range segments, so compaction has
    no unbounded reducer at any corpus size — and the commit is atomic
    (manifest written last, via rename; the fold stages its partitions
    and swaps them in at directory level), matching the chunk protocol.

    The compact term-dictionary artifact (plans/dictionary.py) is
    (re)published in the same pass — incrementally, on the fold path:
    only the affected terms' catalog rows are recomputed.

    ``serving_table``: additionally publish the merged index as a
    term-bucketed serving table (:func:`~index_spark.plans.storage.
    save_serving_index`) — the point-lookup layout — in the same
    compaction pass; the table name is recorded in the manifest.

    ``trigram``: additionally publish the gram-posting artifact
    (plans/trigram.py) that bounds fuzzy/spell candidate generation.
    It is rebuilt from the (already incremental) dictionary each
    compaction — O(vocabulary), which is millions of rows even at
    10^12 docs, so an incremental gram fold is not worth its
    complexity.

    Returns the manifest: {"chunks", "rows", "terms", "blob_bytes",
    "mode", "skipped", "wall_s", ...} plus fold accounting
    ({"buckets_rewritten", "terms_affected", "rows_folded",
    "rows_appended"}) on the incremental path.
    """
    from index_spark.operators.merge import DEFAULT_SEGMENT_BYTES

    chunks_dir = os.path.join(out_dir, "chunks")
    chunk_ids = sorted(
        int(name) for name in os.listdir(chunks_dir)
        if chunk_is_committed(out_dir, int(name)))
    if not chunk_ids:
        raise ValueError(f"no committed chunks under {chunks_dir}")
    seg_bytes = (DEFAULT_SEGMENT_BYTES if segment_bytes is None
                 else segment_bytes)
    mdir = os.path.join(out_dir, "merged")
    mpath = os.path.join(mdir, "_COMMIT.json")
    prev = None
    if os.path.exists(mpath):
        with open(mpath) as f:
            prev = json.load(f)
    if (prev is not None and not force
            and prev.get("chunks") == chunk_ids
            and prev.get("segment_bytes") == seg_bytes
            and prev.get("n_term_buckets") == n_term_buckets):
        from index_spark.plans.trigram import trigram_path

        if trigram and not os.path.isdir(trigram_path(out_dir)):
            # merged form is current but the gram artifact was never
            # published — derive it from the at-rest dictionary only
            from index_spark.plans.dictionary import load_dictionary
            from index_spark.plans.trigram import (
                trigram_postings,
                write_trigram_postings,
            )

            write_trigram_postings(
                trigram_postings(load_dictionary(spark, out_dir)), out_dir)
            prev["trigram"] = True
            with open(mpath + ".tmp", "w") as f:
                json.dump(prev, f, indent=1)
            os.rename(mpath + ".tmp", mpath)
        prev["skipped"] = True
        return prev

    t0 = time.time()
    incremental = (
        prev is not None and not force
        and prev.get("segment_bytes") == seg_bytes
        and prev.get("n_term_buckets") == n_term_buckets
        and len(chunk_ids) > len(prev.get("chunks", []))
        and chunk_ids[: len(prev["chunks"])] == prev["chunks"]
    )
    if incremental:
        manifest = _fold_new_chunks(
            spark, out_dir, prev,
            new_ids=chunk_ids[len(prev["chunks"]):],
            seg_bytes=seg_bytes, n_term_buckets=n_term_buckets)
    else:
        exp = expired_chunk_ids(out_dir)
        if exp:
            raise ValueError(
                f"full re-merge needs chunks {exp} whose index data was "
                "expired by retention (expire_snapshots) — only "
                "incremental folds with the current segment_bytes/"
                "n_term_buckets remain possible; rebuild from the "
                "corpus to restructure")
        manifest = _full_merge(spark, out_dir, chunk_ids,
                               seg_bytes, n_term_buckets)
    manifest["chunks"] = chunk_ids
    manifest["segment_bytes"] = seg_bytes
    manifest["n_term_buckets"] = n_term_buckets
    manifest["skipped"] = False
    manifest["wall_s"] = round(time.time() - t0, 3)
    if serving_table:
        from index_spark.plans.storage import save_serving_index

        back = spark.read.parquet(os.path.join(mdir, "index")).drop("tb")
        save_serving_index(back, table=serving_table,
                           n_buckets=serving_buckets)
        manifest["serving_table"] = serving_table
    if trigram:
        from index_spark.plans.dictionary import load_dictionary
        from index_spark.plans.trigram import (
            trigram_path,
            trigram_postings,
            write_trigram_postings,
        )

        stage = trigram_path(out_dir) + "_stage"
        write_trigram_postings(
            trigram_postings(load_dictionary(spark, out_dir)),
            out_dir, path=stage)
        if os.path.isdir(trigram_path(out_dir)):
            import shutil

            shutil.rmtree(trigram_path(out_dir))
        os.rename(stage, trigram_path(out_dir))
        manifest["trigram"] = True
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.rename(tmp, mpath)
    return manifest


def _merged_agg(df: DataFrame) -> dict:
    r = df.agg(
        F.count("*").alias("rows"),
        F.countDistinct("term").alias("terms"),
        F.sum(F.length("doc_blob") + F.length("tf_blob")
              + F.length("dl_blob")).alias("blob_bytes")).collect()[0]
    return {"rows": int(r["rows"]), "terms": int(r["terms"]),
            "blob_bytes": int(r["blob_bytes"] or 0)}


def _full_merge(spark: SparkSession, out_dir: str, chunk_ids: list[int],
                seg_bytes: int, n_term_buckets: int) -> dict:
    from index_spark.operators.merge import merge_shards
    from index_spark.plans.dictionary import (
        dictionary_from_index,
        write_dictionary,
    )

    mdir = os.path.join(out_dir, "merged")
    ipath = os.path.join(mdir, "index")
    merged = merge_shards(load_index(spark, out_dir),
                          segment_bytes=seg_bytes)
    os.makedirs(mdir, exist_ok=True)
    (merged.withColumn("tb", _tb_expr(n_term_buckets))
     .write.partitionBy("tb").mode("overwrite").parquet(ipath))

    back = spark.read.parquet(ipath).drop("tb")
    write_dictionary(dictionary_from_index(back), out_dir)
    return {**_merged_agg(back), "mode": "full"}


def _fold_new_chunks(spark: SparkSession, out_dir: str, prev: dict,
                     new_ids: list[int], seg_bytes: int,
                     n_term_buckets: int) -> dict:
    """Fold the new chunks' postings into the merged form in place:
    O(delta + affected-partition rows) work, zero IO on partitions the
    delta's vocabulary does not touch."""
    import shutil

    from index_spark.operators.merge import (
        MERGED_SCHEMA,
        _merge_term,
        _merge_term_zone,
        merge_shards,
    )
    from index_spark.plans.dictionary import (
        dictionary_from_index,
        dictionary_path,
        load_dictionary,
        write_dictionary,
    )
    from pyspark.sql import types as T

    mdir = os.path.join(out_dir, "merged")
    ipath = os.path.join(mdir, "index")
    tb = _tb_expr(n_term_buckets)

    # 1. merge the new chunks alone (bounded segments, shard-parallel)
    delta_src = spark.read.parquet(
        *[os.path.join(_chunk_dir(out_dir, cid), "index")
          for cid in new_ids])
    dmerged = merge_shards(delta_src, segment_bytes=seg_bytes).persist()
    zoned = "zone" in dmerged.columns
    gcols = ["zone", "term"] if zoned else ["term"]
    dterms = dmerged.select(*gcols).distinct().persist()
    buckets = sorted(r["tb"] for r in
                     dterms.select(tb.alias("tb")).distinct().collect())

    # 2. read ONLY the affected term-hash partitions of the merged form
    old = (spark.read.parquet(ipath)
           .filter(F.col("tb").isin(buckets)).drop("tb"))
    old = old.join(F.broadcast(dterms.withColumn("_aff", F.lit(1))),
                   gcols, "left")
    pre_agg = _merged_agg(old)  # affected partitions BEFORE the fold
    pass_old = old.filter(F.col("_aff").isNull()).drop("_aff")
    aff_old = old.filter(F.col("_aff") == 1).drop("_aff")

    # 3. tail segment per affected term — found via a metadata-only
    # aggregate + broadcast join-back (never a window over blob rows)
    tmax = aff_old.groupBy(*gcols).agg(F.max("last_doc").alias("_maxld"))
    aff_old = aff_old.join(F.broadcast(tmax), gcols)
    tail = aff_old.filter(F.col("last_doc") == F.col("_maxld")) \
                  .drop("_maxld")
    body = aff_old.filter(F.col("last_doc") != F.col("_maxld")) \
                  .drop("_maxld")

    # 4. fold decision per term: concatenate the delta onto the tail
    # only when the combined blob stays a bounded segment; otherwise the
    # delta rows append as fresh segments after it (both shapes are
    # rank-identical — kernels score disjoint doc-range rows per term
    # independently and df_g sums across rows)
    blob_len = (F.length("doc_blob") + F.length("tf_blob")
                + F.length("dl_blob") + F.length("pos_blob"))
    dbytes = dmerged.groupBy(*gcols).agg(F.sum(blob_len).alias("_dbytes"))
    foldkeys = (tail.select(*gcols, blob_len.alias("_tbytes"))
                .join(F.broadcast(dbytes), gcols)
                .filter(F.col("_tbytes") + F.col("_dbytes")
                        <= F.lit(seg_bytes))
                .select(*gcols))

    # pseudo-shards order the fold input: tail first (-1), then delta
    # rows by first_doc (doc ranges only ever append, so every delta
    # first_doc > the tail's last_doc; _merge_term_impl sorts by
    # (shard, first_doc) and patches each part's boundary delta)
    foldkeys = foldkeys.persist()
    n_folded = foldkeys.count()  # forced pre-swap: derives from `old`
    fold_tail = tail.join(F.broadcast(foldkeys), gcols, "semi") \
                    .withColumn("shard", F.lit(-1))
    keep_tail = tail.join(F.broadcast(foldkeys), gcols, "anti")
    fold_delta = dmerged.join(F.broadcast(foldkeys), gcols, "semi") \
                        .withColumn("shard", F.lit(0))
    append_delta = dmerged.join(F.broadcast(foldkeys), gcols, "anti")
    n_appended = append_delta.count()

    schema = (T.StructType([T.StructField("zone", T.StringType(), False)]
                           + list(MERGED_SCHEMA.fields))
              if zoned else MERGED_SCHEMA)
    folded = (fold_tail.unionByName(fold_delta)
              .groupBy(*gcols)
              .applyInPandas(_merge_term_zone if zoned else _merge_term,
                             schema=schema))

    out_aff = (pass_old
               .unionByName(body)
               .unionByName(keep_tail)
               .unionByName(folded)
               .unionByName(append_delta))

    # 5. stage the rewritten partitions, then swap them in atomically at
    # directory level (never overwrite a path being read)
    stage = os.path.join(mdir, "index_stage")
    if os.path.isdir(stage):
        shutil.rmtree(stage)
    (out_aff.withColumn("tb", tb)
     .write.partitionBy("tb").mode("overwrite").parquet(stage))
    for b in buckets:
        src, dst = (os.path.join(stage, f"tb={b}"),
                    os.path.join(ipath, f"tb={b}"))
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        os.rename(src, dst)
    shutil.rmtree(stage, ignore_errors=True)

    # 6. patch global stats from the affected partitions' before/after
    # (term-hash partitions make rows/terms/bytes additive per bucket)
    post = (spark.read.parquet(ipath)
            .filter(F.col("tb").isin(buckets)).drop("tb"))
    post_agg = _merged_agg(post)
    fold_stats = {
        "mode": "incremental",
        "new_chunks": list(new_ids),
        "buckets_rewritten": len(buckets),
        "terms_affected": dterms.count(),
        "rows_folded": n_folded,
        "rows_appended": n_appended,
        "rows": prev["rows"] - pre_agg["rows"] + post_agg["rows"],
        "terms": prev["terms"] - pre_agg["terms"] + post_agg["terms"],
        "blob_bytes": (prev["blob_bytes"] - pre_agg["blob_bytes"]
                       + post_agg["blob_bytes"]),
    }

    # 7. incremental dictionary: recompute ONLY the affected terms' rows
    old_dict = load_dictionary(spark, out_dir)
    if "pkey" not in old_dict.columns:
        # catalog written before the phonetic column existed: backfill
        # so the union schema matches (row-local codegen, no reshuffle)
        from index_spark.functions.phonetic import phonetic_key

        old_dict = old_dict.withColumn("pkey", phonetic_key(F.col("term")))
    if "rterm" not in old_dict.columns:
        # catalog written before the reversed-term column existed:
        # backfill (row-local) so the union schema matches and the
        # reversed projection publishes complete
        old_dict = old_dict.withColumn("rterm", F.reverse(F.col("term")))
    new_rows = dictionary_from_index(
        post.join(F.broadcast(dterms), gcols, "semi"))
    dict_stage = dictionary_path(out_dir) + "_stage"
    write_dictionary(
        old_dict.join(F.broadcast(dterms), gcols, "anti")
                .unionByName(new_rows),
        out_dir, path=dict_stage)

    def swap_dir(stage: str, target: str) -> None:
        # rename-aside, rename-in, delete-aside: the unavailable
        # window is two renames (microseconds), not a full rmtree of
        # the old catalog
        from index_spark.plans.dictionary import heal_swapped_dir

        # self-heal first: a prior crash between the two renames left
        # no live catalog but an intact <target>_old (load_dictionary
        # heals the same way on the read side)
        heal_swapped_dir(target)
        old = target + "_old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(target):
            os.rename(target, old)
        os.rename(stage, target)
        if os.path.isdir(old):
            shutil.rmtree(old)

    swap_dir(dict_stage, dictionary_path(out_dir))
    # the rterm-sorted companion stages alongside and swaps second (a
    # reader caught between the two swaps sees a current main catalog
    # and a one-rewrite-old reversed projection — same rows either way
    # for every term outside this fold's delta)
    from index_spark.plans.dictionary import reversed_dictionary_path

    swap_dir(dict_stage + "_r", reversed_dictionary_path(out_dir))

    dmerged.unpersist()
    dterms.unpersist()
    foldkeys.unpersist()
    return fold_stats


def load_merged_index(spark: SparkSession, out_dir: str) -> DataFrame:
    """The compacted global index (compact_index output); raises if no
    compaction has been committed."""
    if not os.path.exists(os.path.join(out_dir, "merged", "_COMMIT.json")):
        raise FileNotFoundError(
            f"no committed compaction under {out_dir}/merged — "
            "run compact_index first")
    return spark.read.parquet(
        os.path.join(out_dir, "merged", "index")).drop("tb")


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
