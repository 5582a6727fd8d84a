"""Index maintenance: logical deletes (tombstones) + physical vacuum.

The reference snapshot is append-only (chunks are written once,
index.cpp:48-58); deletes are the standard production extension of that
lifecycle, implemented Iceberg-style: a logical **tombstone** set makes
deleted docs invisible at query time immediately (query.search accepts
``tombstones=``), and a physical **vacuum** rewrites only the affected
posting rows to purge them, refreshing df/cf/blocks/skips and — through
the '%' doc-marker rows — the global stats.

Scale shape of ``vacuum_index``:

* tombstones route to their doc-range shard (``doc_id // shard_size``)
  and cogroup with that shard's rows — the tombstone set is never
  collected or broadcast whole;
* only shards CONTAINING tombstones are rewritten (the touched-shard id
  list is tiny — bounded by the tombstone count — and is the single
  driver-side piece of state); untouched shards pass through with no
  shuffle, no decode, not even a scan of their blob bytes beyond the
  split filter;
* within a touched shard, rows whose [first_doc, last_doc] range misses
  every tombstone pass through undecoded; only rows actually holding a
  deleted doc are decoded, filtered, and re-encoded (through the same
  blob kernel the build uses, so skips/blocks/offsets stay canonical);
* position streams reset their delta base per posting
  (build.py pos encode), so a vacuumed ``pos_blob`` is a byte-range
  gather of the kept postings' runs — no position re-encode.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from index_spark.functions import varbyte as vb
from index_spark.operators.build import DEFAULT_SHARD_SIZE, _blob_rows


def _member_mask(sorted_arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
    idx = np.searchsorted(sorted_arr, vals)
    hit = idx < sorted_arr.size
    hit[hit] = sorted_arr[idx[hit]] == vals[hit]
    return hit


def _filter_pos(pos_blob: bytes, tfs: np.ndarray, keep: np.ndarray) -> bytes:
    """Byte-range gather of the kept postings' position runs. Valid
    because each posting's run starts with an ABSOLUTE value (per-posting
    delta reset, build.py) — runs concatenate without re-encoding."""
    if not pos_blob:
        return b""
    vals = vb.decode(pos_blob)
    lens = vb.encoded_lengths(vals.astype(np.uint64))
    b_cum = np.concatenate(([0], np.cumsum(lens)))
    v_cum = np.concatenate(([0], np.cumsum(tfs)))
    buf = np.frombuffer(pos_blob, np.uint8)
    parts = [buf[b_cum[v_cum[i]]: b_cum[v_cum[i + 1]]]
             for i in np.flatnonzero(keep)]
    return np.concatenate(parts).tobytes() if parts else b""


def _as_dicts_skips(col):
    return [[{"idx": int(a), "doc": int(b)} for a, b in lst] for lst in col]


def _as_dicts_blocks(col):
    keys = ("start", "last_doc", "max_tf", "min_dl",
            "doc_off", "tf_off", "dl_off")
    return [[dict(zip(keys, tup)) for tup in lst] for lst in col]


def _vacuum_pdf(pdf: pd.DataFrame, banned: np.ndarray) -> pd.DataFrame:
    """Vacuum one shard's rows against the sorted ``banned`` doc ids."""
    has_zone = "zone" in pdf.columns
    passthrough: list[int] = []
    rebuilt: list[pd.DataFrame] = []
    for i, row in enumerate(pdf.itertuples(index=False)):
        lo = np.searchsorted(banned, row.first_doc)
        hi = np.searchsorted(banned, row.last_doc, side="right")
        if hi == lo:  # no tombstone in this row's doc range
            passthrough.append(i)
            continue
        docs = np.cumsum(vb.decode(bytes(row.doc_blob)).astype(np.int64))
        keep = ~_member_mask(banned[lo:hi], docs)
        if keep.all():
            passthrough.append(i)
            continue
        if not keep.any():
            continue  # every posting deleted -> drop the row
        tfs = vb.decode(bytes(row.tf_blob)).astype(np.int64)
        dls = vb.decode(bytes(row.dl_blob)).astype(np.int64)
        sub = _blob_rows(np.array([row.term], dtype=object),
                         np.zeros(int(keep.sum()), np.int64),
                         docs[keep], tfs[keep], dls[keep], int(row.shard))
        pb = bytes(row.pos_blob) if row.pos_blob is not None else b""
        sub.at[0, "pos_blob"] = _filter_pos(pb, tfs, keep)
        # struct columns as dicts, matching the arrow->pandas form of
        # the passthrough rows so the output column is homogeneous
        sub["skips"] = _as_dicts_skips(sub["skips"])
        sub["blocks"] = _as_dicts_blocks(sub["blocks"])
        if has_zone:
            sub["zone"] = row.zone
        rebuilt.append(sub)
    parts = []
    if passthrough:
        parts.append(pdf.iloc[passthrough])
    parts.extend(rebuilt)
    if not parts:
        return pdf.iloc[0:0]
    return pd.concat(parts, ignore_index=True)[list(pdf.columns)]


def vacuum_index(index: DataFrame, tombstones: DataFrame,
                 shard_size: int = DEFAULT_SHARD_SIZE) -> DataFrame:
    """Physically purge tombstoned docs from a SHARDED index.

    Returns a new index DataFrame with the deleted docs' postings
    removed and df/cf/first/last/max_tf/min_dl/skips/blocks/pos_blob
    rebuilt for the affected rows only. The '%' doc-marker rows are
    vacuumed identically, so ``stats_from_index`` / ``doclens_from_index``
    on the result reflect the post-delete corpus. Re-merge
    (``merge_shards``) / re-save serving copies downstream as needed.

    ``shard_size`` must match the build (shard = doc_id // shard_size).
    A merged (shard-less) index should be vacuumed before merging, or
    re-derived from vacuumed shards — raise early to prevent silently
    mis-routed tombstones.
    """
    if "shard" not in index.columns:
        raise ValueError("vacuum_index operates on the sharded index; "
                         "vacuum before merge_shards (or re-merge after)")
    tomb = tombstones.select(
        F.floor(F.col("doc_id") / shard_size).cast("long").alias("shard"),
        F.col("doc_id").cast("long"))
    touched = sorted(r["shard"]
                     for r in tomb.select("shard").distinct().collect())
    if len(touched) <= 10_000:
        # the common case: a bounded touched-shard list as a pushed-down
        # In filter; untouched shards bypass the cogroup entirely
        untouched = index.filter(~F.col("shard").isin(touched))
        cand = index.filter(F.col("shard").isin(touched))
    else:
        # massive delete: the touched set is no longer "a few shards" —
        # skip the literal-list split (a 10k+-element In defeats
        # pushdown) and route every shard through the cogroup; rows
        # without deletes still pass through undecoded
        untouched = index.limit(0)
        cand = index

    def fn(ix_pdf: pd.DataFrame, t_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(ix_pdf):
            return ix_pdf
        banned = np.unique(t_pdf["doc_id"].to_numpy(np.int64))
        return _vacuum_pdf(ix_pdf, banned)

    cleaned = cand.groupby("shard").cogroup(tomb.groupby("shard")) \
        .applyInPandas(fn, schema=index.schema)
    return cleaned.unionByName(untouched)


def _tombstone_dir(out_dir: str) -> str:
    import os

    return os.path.join(out_dir, "tombstones")


def load_tombstones(spark, out_dir: str) -> DataFrame | None:
    """The chunk store's accumulated tombstone log as a (doc_id)
    DataFrame (distinct), or None if no deletes were ever recorded —
    pass straight to ``search(tombstones=...)`` /
    ``QueryEngine(tombstones=...)`` / ``vacuum_index``."""
    import os

    d = _tombstone_dir(out_dir)
    if not os.path.isdir(d) or not any(
            f.endswith(".parquet") for f in os.listdir(d)):
        return None
    # each delete_docs call writes one immutable parquet DIRECTORY;
    # glob them so the union spans the whole log
    return (spark.read.parquet(os.path.join(d, "*.parquet"))
            .select("doc_id").distinct())


def delete_docs(spark, out_dir: str, doc_ids: DataFrame,
                tag: str = "delete") -> int:
    """Append a (doc_id) set to the chunk store's tombstone log (one
    immutable parquet per call — the delete side of the Iceberg-style
    lifecycle). Returns the number of ids written. Idempotent at read
    time: ``load_tombstones`` de-duplicates across log files."""
    import os
    import time as _t

    d = _tombstone_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    # persist before the count+write pair: a nondeterministic input plan
    # must not persist a different id set than the n it reports
    out = doc_ids.select(F.col("doc_id").cast("long")).persist()
    try:
        n = out.count()
        if n:
            out.write.mode("overwrite").parquet(
                os.path.join(d, f"{tag}_{int(_t.time() * 1000)}.parquet"))
    finally:
        out.unpersist()
    return n


def upsert_docs(spark, out_dir: str, new_docs: DataFrame,
                shard_size: int = DEFAULT_SHARD_SIZE, stem: bool = True,
                positions: bool = False, camel: bool = True) -> dict:
    """Iceberg-style MERGE into a chunk store (build_chunked /
    ingest_batch output): rows whose (repo, path) key already exists
    REPLACE the old version — its doc_ids are appended to the tombstone
    log — and every row (replacement or brand-new) is indexed as one
    fresh immutable chunk with new doc ids at the tail of the id space.

    ``new_docs``: (repo, path, content); one row per key (keys are the
    unit of replacement — de-duplicate upstream).

    Scale shape: the old-id lookup is an equi-join of the store's docs
    dimension against the (bounded) upsert batch on the key — broadcast
    the batch side; the tombstone append writes only the matched ids;
    the chunk build is the streaming ingest plan (ONE wide exchange).
    Queries see the post-upsert truth by passing
    ``load_tombstones(out_dir)``; physical reclamation remains the
    vacuum/compact path (delete-then-compact contract).

    Returns the new chunk's manifest plus ``n_replaced``.

    Repeated upserts of one key compose: each round tombstones the
    then-live id (earlier ids are already in the log; the distinct at
    read time keeps the log idempotent).
    """
    from index_spark.plans.checkpoint import load_docs
    from index_spark.streaming.ingest import ingest_batch

    batch = new_docs.select("repo", "path", "content")
    keys = batch.select("repo", "path")
    # The tombstone append MUST materialize BEFORE the new chunk lands:
    # load_docs globs chunks/*/docs at action time, so a lazy old-id
    # plan evaluated after ingest would match the replacement rows'
    # own keys and tombstone the fresh docs.
    import glob as _glob
    import os as _os

    has_docs = bool(_glob.glob(_os.path.join(out_dir, "chunks", "*",
                                             "docs")))
    if has_docs:
        old = load_docs(spark, out_dir).join(
            F.broadcast(keys), ["repo", "path"]).select("doc_id")
        n_replaced = delete_docs(spark, out_dir, old, tag="upsert")
    else:  # empty store: nothing to replace
        n_replaced = 0
    manifest = ingest_batch(spark, batch, out_dir,
                            shard_size=shard_size, stem=stem,
                            positions=positions, camel=camel)
    manifest["n_replaced"] = n_replaced
    return manifest
