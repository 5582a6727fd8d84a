"""Store integrity checker — the user-facing form of the reference's
index self-test (its ``testPL`` walk re-decodes a posting list and
re-derives its invariants; /root/reference/index.cpp's test path).

``verify_store`` re-derives every invariant the build pipeline promises
and reports each as a named check:

  * manifest chain: committed chunk ids dense from 0, doc ranges
    ``[lo, hi)`` contiguous and non-overlapping;
  * per chunk: index + docs parquet readable; the manifest's
    n_docs / n_terms / n_postings / blob_bytes equal independent
    aggregates over the stored rows; the docs dimension has exactly
    one row per doc in range;
  * blob decode (sampled): doc/tf blobs varbyte-decode to df entries,
    doc ids strictly ascend and stay inside the row's shard range,
    tfs are positive — the testPL walk, on live data;
  * merged form (if compacted): manifest chunk set matches the
    committed set prefix; sampled terms' global df in the merged index
    equals the chunk-union sum;
  * dictionary / trigram artifacts (if published): sampled terms agree
    with the merged index (df) and gram-count arithmetic (len + 2).

Every check is bounded: aggregates are map-side-combinable counts,
samples are fixed-size collects — fsck cost is O(index metadata +
sample), never O(corpus text).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _agg_index(idx: DataFrame) -> dict:
    from index_spark.operators.build import DOC_MARKER

    row = idx.agg(
        F.sum(F.when(F.col("term") == DOC_MARKER, F.col("df"))).alias("nd"),
        F.sum(F.when(F.col("term") != DOC_MARKER, F.col("df"))).alias("np"),
        F.count_distinct(F.when(F.col("term") != DOC_MARKER,
                                F.col("term"))).alias("nt"),
        F.sum(F.when(F.col("term") != DOC_MARKER,
                     F.length("doc_blob") + F.length("tf_blob")
                     + F.length("dl_blob"))).alias("bb")).collect()[0]
    return {"n_docs": int(row["nd"] or 0), "n_postings": int(row["np"] or 0),
            "n_terms": int(row["nt"] or 0), "blob_bytes": int(row["bb"] or 0)}


def _decode_check(rows, shard_size: int, errors: list, where: str) -> None:
    import numpy as np

    from index_spark.functions import varbyte as vb

    for r in rows:
        docs = np.cumsum(vb.decode(r["doc_blob"]).astype("int64"))
        tfs = vb.decode(r["tf_blob"]).astype("int64")
        if len(docs) != r["df"] or len(tfs) != r["df"]:
            errors.append(f"{where}: term {r['term']!r} decodes "
                          f"{len(docs)}/{len(tfs)} entries, df={r['df']}")
            continue
        if len(docs) > 1 and not bool((docs[1:] > docs[:-1]).all()):
            errors.append(f"{where}: term {r['term']!r} doc ids not "
                          "strictly ascending")
        if "shard" in r.asDict() and r["shard"] is not None and len(docs):
            lo = int(r["shard"]) * shard_size
            if docs[0] < lo or docs[-1] >= lo + shard_size:
                errors.append(f"{where}: term {r['term']!r} doc ids "
                              f"escape shard range [{lo}, {lo + shard_size})")
        if len(tfs) and int(tfs.min()) < 1:
            errors.append(f"{where}: term {r['term']!r} has tf < 1")


def verify_store(spark: SparkSession, out_dir: str,
                 sample_rows: int = 64) -> dict:
    """Full store walk; returns {"ok", "checks": {name: bool},
    "errors": [...], "chunks": n}. Deterministic sampling (first
    ``sample_rows`` rows per chunk by term order)."""
    from index_spark.operators.build import DOC_MARKER
    from index_spark.plans.checkpoint import chunk_is_committed

    checks: dict[str, bool] = {}
    errors: list[str] = []

    chunks_dir = os.path.join(out_dir, "chunks")
    if not os.path.isdir(chunks_dir):
        return {"ok": False, "checks": {"store_exists": False},
                "errors": [f"no chunks directory under {out_dir}"],
                "chunks": 0}
    cids = sorted(int(n) for n in os.listdir(chunks_dir)
                  if chunk_is_committed(out_dir, int(n)))
    checks["chunks_dense_from_zero"] = cids == list(range(len(cids)))
    if not checks["chunks_dense_from_zero"]:
        errors.append(f"committed chunk ids not dense: {cids}")

    prev_hi = 0
    shard_size = None
    expired_seen: set = set()
    from index_spark.plans.checkpoint import _chunk_dir

    for cid in cids:
        cdir = _chunk_dir(out_dir, cid)
        with open(os.path.join(cdir, "_COMMIT.json")) as f:
            man = json.load(f)
        shard_size = int(man["shard_size"])
        # the contiguity contract is shard-aligned: a chunk starts at the
        # previous doc_hi rounded UP to the next shard boundary (so shard
        # ids stay global across chunks; streaming/ingest.py doc_base)
        want_lo = ((prev_hi + shard_size - 1) // shard_size) * shard_size
        ok_range = man["doc_lo"] == want_lo and man["doc_hi"] > man["doc_lo"]
        if not ok_range:
            errors.append(f"chunk {cid}: doc range [{man['doc_lo']}, "
                          f"{man['doc_hi']}) does not extend {prev_hi} "
                          f"(expected lo {want_lo})")
        prev_hi = man["doc_hi"]
        if man.get("expired"):
            expired_seen.add(cid)
            # retention removed this chunk's index data (its postings
            # live on in the merged form); the docs dim remains the
            # dimension of record and must still be whole
            if os.path.isdir(os.path.join(cdir, "index")):
                errors.append(f"chunk {cid}: marked expired but index "
                              "data is still present (interrupted "
                              "expiry — re-run expire_snapshots to "
                              "finish the deletion)")
            try:
                nd = spark.read.parquet(os.path.join(cdir, "docs")).count()
                if nd != man["n_docs"]:
                    errors.append(f"chunk {cid}: docs dim has {nd} rows, "
                                  f"manifest n_docs={man['n_docs']}")
            except Exception as ex:
                errors.append(f"chunk {cid}: docs dim unreadable: {ex}")
            continue
        try:
            idx = spark.read.parquet(os.path.join(cdir, "index"))
            agg = _agg_index(idx)
        except Exception as ex:  # unreadable parquet IS the finding
            errors.append(f"chunk {cid}: index unreadable: {ex}")
            continue
        for k in ("n_docs", "n_terms", "n_postings", "blob_bytes"):
            if agg[k] != man.get(k, agg[k]):
                errors.append(f"chunk {cid}: manifest {k}={man[k]} but "
                              f"stored rows say {agg[k]}")
        try:
            nd = spark.read.parquet(os.path.join(cdir, "docs")).count()
            if nd != man["n_docs"]:
                errors.append(f"chunk {cid}: docs dim has {nd} rows, "
                              f"manifest n_docs={man['n_docs']}")
        except Exception as ex:
            errors.append(f"chunk {cid}: docs dim unreadable: {ex}")
            continue
        sample = (idx.filter(F.col("term") != DOC_MARKER)
                  .orderBy("term", "shard").limit(sample_rows).collect())
        _decode_check(sample, shard_size, errors, f"chunk {cid}")
    checks["chunk_manifests_consistent"] = not any(
        e.startswith("chunk") for e in errors)

    mdir = os.path.join(out_dir, "merged")
    mpath = os.path.join(mdir, "_COMMIT.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            mman = json.load(f)
        stale = mman.get("chunks") != cids
        checks["merged_covers_committed_chunks"] = not stale
        if stale:
            errors.append(f"merged form built from chunks "
                          f"{mman.get('chunks')} but committed={cids} "
                          "(stale — rerun compact_index)")
        try:
            merged = spark.read.parquet(os.path.join(mdir, "index"))
            if "tb" in merged.columns:
                merged = merged.drop("tb")
            probe = [r["term"] for r in
                     merged.filter(F.col("term") != DOC_MARKER)
                     .select("term").distinct().orderBy("term")
                     .limit(sample_rows).collect()]
        except Exception as ex:  # unreadable merged IS the finding
            errors.append(f"merged: index unreadable: {ex}")
            checks["merged_readable"] = False
            probe = []
        mdf: dict = {}
        if probe:
            mdf = {r["term"]: r["s"] for r in
                   merged.filter(F.col("term").isin(probe))
                   .groupBy("term").agg(F.sum("df").alias("s")).collect()}
        from index_spark.plans.checkpoint import expired_chunk_ids
        mcids = mman.get("chunks") or cids
        # the union-df cross-check needs every covered chunk's index
        # data; retention (expire_snapshots) may have removed some — the
        # merged form is then the only copy and the check has no
        # independent source to compare against
        exp_all = set(expired_chunk_ids(out_dir)) | expired_seen
        if probe and not (exp_all & set(mcids)):
            union = spark.read.parquet(
                *[os.path.join(_chunk_dir(out_dir, c), "index")
                  for c in mcids])
            udf_ = {r["term"]: r["s"] for r in
                    union.filter(F.col("term").isin(probe))
                    .groupBy("term").agg(F.sum("df").alias("s")).collect()}
            bad = [t for t in probe if mdf.get(t) != udf_.get(t)]
            checks["merged_df_matches_chunk_union"] = not bad
            for t in bad[:5]:
                errors.append(f"merged: term {t!r} df={mdf.get(t)} but "
                              f"chunk union says {udf_.get(t)}")
        if probe:
            msample = (merged.filter(F.col("term") != DOC_MARKER)
                       .orderBy("term").limit(sample_rows).collect())
            merrs: list = []
            _decode_check(msample, shard_size or 0, merrs, "merged")
            # merged segments span doc ranges wider than one shard, so
            # the shard-range containment check does not apply there;
            # every other blob invariant (entry counts, ascending ids,
            # tf >= 1) does.
            errors.extend(e for e in merrs
                          if "escape shard range" not in e)
        from index_spark.plans.dictionary import dictionary_path
        if os.path.isdir(dictionary_path(out_dir)) and probe:
            try:
                d = spark.read.parquet(dictionary_path(out_dir))
                # a zoned dictionary has one row per (zone, term) —
                # aggregate like the merged probe so the comparison is
                # df summed across zones on BOTH sides
                ddf = {r["term"]: r["s"] for r in
                       d.filter(F.col("term").isin(probe))
                       .groupBy("term").agg(F.sum("df").alias("s"))
                       .collect()}
                bad = [t for t in probe
                       if t in ddf and ddf[t] != mdf.get(t)]
                checks["dictionary_matches_merged"] = not bad
                for t in bad[:5]:
                    errors.append(f"dictionary: term {t!r} df={ddf[t]} "
                                  f"but merged says {mdf.get(t)}")
            except Exception as ex:
                errors.append(f"dictionary: unreadable: {ex}")
                checks["dictionary_matches_merged"] = False
        from index_spark.plans.trigram import QGRAM_N, trigram_path
        if os.path.isdir(trigram_path(out_dir)) and probe:
            try:
                t3 = spark.read.parquet(trigram_path(out_dir))
                cnt = {r["term"]: r["n"] for r in
                       t3.filter(F.col("term").isin(probe))
                       .groupBy("term").agg(F.count("*").alias("n"))
                       .collect()}
                bad = [t for t in probe
                       if t in cnt and cnt[t] != len(t) + QGRAM_N - 1]
                checks["trigram_gram_counts"] = not bad
                for t in bad[:5]:
                    errors.append(f"trigram: term {t!r} has {cnt[t]} "
                                  f"gram rows, expected "
                                  f"{len(t) + QGRAM_N - 1}")
            except Exception as ex:
                errors.append(f"trigram: unreadable: {ex}")
                checks["trigram_gram_counts"] = False

    checks["blob_invariants"] = not any(
        "decodes" in e or "ascending" in e or "escape" in e or "tf < 1" in e
        for e in errors)
    return {"ok": not errors and all(checks.values()),
            "checks": checks, "errors": errors, "chunks": len(cids)}
