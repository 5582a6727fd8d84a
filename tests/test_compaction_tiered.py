"""Tiered incremental compaction: a second compact_index after new
chunks folds ONLY the affected term-hash partitions — rows of terms
absent from the delta are never re-merged or rewritten (their partition
files stay byte-identical on disk) — and the result is rank-identical
to a from-scratch merge of the same chunk set.
"""

import hashlib
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from index_spark.operators.build import stats_from_index
from index_spark.operators.query import search
from index_spark.plans.checkpoint import (
    build_chunked,
    compact_index,
    load_index,
    load_merged_index,
)
from index_spark.plans.dictionary import (
    dictionary_from_index,
    load_dictionary,
)
from index_spark.streaming.ingest import ingest_batch

SHARD = 64
SEG = 1 << 20  # roomy segments: every delta folds onto its term's tail


def _file_hashes(root: str) -> dict[str, str]:
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, root)] = hashlib.sha1(
                    fh.read()).hexdigest()
    return out


def _narrow_delta(spark):
    # three docs over a deliberately tiny vocabulary, so most term-hash
    # partitions of the merged form are NOT affected
    pdf = pd.DataFrame({
        "repo": ["deltarepo"] * 3,
        "path": [f"new/{i}.py" for i in range(3)],
        "content": ["import zzznewterm"] * 3,
    })
    return spark.createDataFrame(pdf)


@pytest.fixture(scope="module")
def store(spark, tiny_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tiered") / "store")
    ordered = tiny_corpus.sort_values(["repo", "path"]).reset_index(drop=True)
    build_chunked(spark, spark.createDataFrame(ordered.iloc[:100]), out,
                  docs_per_chunk=64, shard_size=SHARD)
    m1 = compact_index(spark, out, segment_bytes=SEG)
    assert m1["mode"] == "full"
    snap = _file_hashes(os.path.join(out, "merged", "index"))
    ingest_batch(spark, _narrow_delta(spark), out, shard_size=SHARD)
    m2 = compact_index(spark, out, segment_bytes=SEG)
    return out, m1, m2, snap


def test_incremental_mode_and_accounting(spark, store):
    out, m1, m2, _ = store
    assert m2["mode"] == "incremental"
    assert m2["new_chunks"] == [2]
    # roomy segments: the whole delta folds onto existing tails (or
    # lands as the sole row of a brand-new term) — nothing appends as an
    # extra segment next to an unmergeable tail
    assert m2["rows_folded"] >= 1
    merged = load_merged_index(spark, out)
    agg = merged.agg(
        F.count("*").alias("rows"),
        F.countDistinct("term").alias("terms")).collect()[0]
    assert m2["rows"] == agg["rows"]
    assert m2["terms"] == agg["terms"]
    # the manifest's patched blob_bytes matches a full recount
    bb = merged.agg(F.sum(
        F.length("doc_blob") + F.length("tf_blob")
        + F.length("dl_blob")).alias("b")).collect()[0]["b"]
    assert m2["blob_bytes"] == bb


def test_untouched_partitions_not_rewritten(spark, store):
    """Term-hash partitions whose terms don't appear in the new chunk
    keep byte-identical files — the fold never read or rewrote them."""
    out, _, m2, snap_before = store
    snap_after = _file_hashes(os.path.join(out, "merged", "index"))
    # affected buckets = hash buckets of the delta chunk's vocabulary
    delta_idx = spark.read.parquet(
        os.path.join(out, "chunks", "00002", "index"))
    n_tb = m2["n_term_buckets"]
    aff = {r["tb"] for r in delta_idx.select(
        F.pmod(F.xxhash64("term"), F.lit(n_tb)).cast("int").alias("tb"))
        .distinct().collect()}
    assert m2["buckets_rewritten"] == len(aff)
    assert len(aff) < n_tb, "delta vocab must not touch every bucket"
    untouched = {p: h for p, h in snap_before.items()
                 if not any(p.startswith(f"tb={b}/") for b in aff)}
    assert untouched, "fixture must leave some partitions untouched"
    for p, h in untouched.items():
        assert snap_after.get(p) == h, f"{p} was rewritten"


def test_untouched_terms_byte_identical_rows(spark, store):
    """Within AFFECTED partitions, rows of terms absent from the delta
    pass through with identical content (df/cf/blobs)."""
    out, _, _, snap_before = store
    # reconstruct the pre-fold state of affected terms from the chunk
    # union restricted to the first two chunks (what m1 merged)
    delta_terms = {r["term"] for r in spark.read.parquet(
        os.path.join(out, "chunks", "00002", "index"))
        .select("term").distinct().collect()}
    merged = load_merged_index(spark, out)
    from index_spark.operators.merge import merge_shards

    pre = merge_shards(spark.read.parquet(
        os.path.join(out, "chunks", "0000[01]", "index")),
        segment_bytes=SEG)
    key = lambda r: (r["term"], r["first_doc"])
    want = {key(r): (r["df"], r["cf"], bytes(r["doc_blob"]),
                     bytes(r["tf_blob"]))
            for r in pre.collect() if r["term"] not in delta_terms}
    got = {key(r): (r["df"], r["cf"], bytes(r["doc_blob"]),
                    bytes(r["tf_blob"]))
           for r in merged.collect() if r["term"] not in delta_terms}
    assert got == want


def test_rank_identity_vs_from_scratch(spark, store):
    out, _, _, _ = store
    union = load_index(spark, out).persist()
    stats = stats_from_index(union)
    queries = ["import return", "def class", "zzznewterm",
               "import zzznewterm"]
    folded = load_merged_index(spark, out)
    res_inc = {q: [(r["doc_id"], round(r["score"], 9)) for r in
                   search(folded, None, stats, q, k=10).collect()]
               for q in queries}
    # union-of-chunks truth
    for q in queries:
        truth = [(r["doc_id"], round(r["score"], 9)) for r in
                 search(union, None, stats, q, k=10).collect()]
        assert res_inc[q] == truth, q
    # from-scratch re-merge of the same chunk set
    m3 = compact_index(spark, out, segment_bytes=SEG, force=True)
    assert m3["mode"] == "full"
    scratch = load_merged_index(spark, out)
    for q in queries:
        res = [(r["doc_id"], round(r["score"], 9)) for r in
               search(scratch, None, stats, q, k=10).collect()]
        assert res_inc[q] == res, q
    union.unpersist()


def test_dictionary_incrementally_updated(spark, store):
    out, _, _, _ = store
    d = load_dictionary(spark, store[0])
    expect = {(r["term"], r["df"], r["cf"]) for r in
              dictionary_from_index(load_merged_index(spark, out))
              .select("term", "df", "cf").collect()}
    got = {(r["term"], r["df"], r["cf"]) for r in
           d.select("term", "df", "cf").collect()}
    assert got == expect


def test_append_path_small_segments(spark, tiny_corpus, tmp_path):
    """With tiny segment targets the delta cannot fold onto full tails —
    it appends as fresh bounded segments; still rank-identical."""
    out = str(tmp_path / "appendstore")
    ordered = tiny_corpus.sort_values(["repo", "path"]).reset_index(drop=True)
    build_chunked(spark, spark.createDataFrame(ordered.iloc[:100]), out,
                  docs_per_chunk=64, shard_size=SHARD)
    compact_index(spark, out, segment_bytes=64)
    ingest_batch(spark, _narrow_delta(spark), out, shard_size=SHARD)
    m2 = compact_index(spark, out, segment_bytes=64)
    assert m2["mode"] == "incremental"
    assert m2["rows_appended"] >= 1
    union = load_index(spark, out).persist()
    stats = stats_from_index(union)
    merged = load_merged_index(spark, out)
    for q in ["import return", "zzznewterm"]:
        a = [(r["doc_id"], round(r["score"], 9)) for r in
             search(merged, None, stats, q, k=10).collect()]
        b = [(r["doc_id"], round(r["score"], 9)) for r in
             search(union, None, stats, q, k=10).collect()]
        assert a == b, q
    union.unpersist()


def test_skip_unchanged_and_full_fallback_flags(spark, store):
    out = store[0]
    m = compact_index(spark, out, segment_bytes=SEG)
    assert m["skipped"] is True
    # changing the segment target is a structural change -> full merge
    m = compact_index(spark, out, segment_bytes=SEG * 2)
    assert m["mode"] == "full" and m["skipped"] is False


def test_fold_preserves_positions(spark, tiny_corpus, tmp_path):
    """Positional chunks fold correctly: pos_blobs are per-doc-local
    streams, so tail concatenation needs no patch — phrase results on
    the folded form match the chunk union exactly."""
    from index_spark.operators.phrase import phrase_search

    out = str(tmp_path / "posstore")
    ordered = tiny_corpus.sort_values(["repo", "path"]).reset_index(drop=True)
    build_chunked(spark, spark.createDataFrame(ordered.iloc[:100]), out,
                  docs_per_chunk=64, shard_size=SHARD, positions=True,
                  stem=False)
    compact_index(spark, out, segment_bytes=SEG)
    ingest_batch(spark, spark.createDataFrame(ordered.iloc[100:]), out,
                 shard_size=SHARD, positions=True, stem=False)
    m2 = compact_index(spark, out, segment_bytes=SEG)
    assert m2["mode"] == "incremental" and m2["rows_folded"] >= 1
    union = load_index(spark, out).persist()
    merged = load_merged_index(spark, out)
    for ph in ["import return", "def class", "uniq7token import"]:
        a = [(r["doc_id"], r["n_matches"]) for r in
             phrase_search(merged, None, ph, k=20, stem=False).collect()]
        b = [(r["doc_id"], r["n_matches"]) for r in
             phrase_search(union, None, ph, k=20, stem=False).collect()]
        assert a == b, ph
    union.unpersist()


def test_double_fold_compounds(spark, tiny_corpus, tmp_path):
    """Two successive incremental compactions compound correctly: the
    second fold patches stats derived from the first fold's manifest,
    and results stay rank-identical to the chunk union."""
    out = str(tmp_path / "doublestore")
    ordered = tiny_corpus.sort_values(["repo", "path"]).reset_index(drop=True)
    build_chunked(spark, spark.createDataFrame(ordered.iloc[:100]), out,
                  docs_per_chunk=64, shard_size=SHARD)
    compact_index(spark, out, segment_bytes=SEG)
    ingest_batch(spark, _narrow_delta(spark), out, shard_size=SHARD)
    m2 = compact_index(spark, out, segment_bytes=SEG)
    assert m2["mode"] == "incremental"
    pdf2 = pd.DataFrame({"repo": ["deltarepo2"] * 2,
                         "path": [f"n2/{i}.py" for i in range(2)],
                         "content": ["zzznewterm yyanother import"] * 2})
    ingest_batch(spark, spark.createDataFrame(pdf2), out, shard_size=SHARD)
    m3 = compact_index(spark, out, segment_bytes=SEG)
    assert m3["mode"] == "incremental" and m3["new_chunks"] == [3]
    merged = load_merged_index(spark, out)
    agg = merged.agg(F.count("*").alias("rows"),
                     F.countDistinct("term").alias("terms")).collect()[0]
    assert (m3["rows"], m3["terms"]) == (agg["rows"], agg["terms"])
    union = load_index(spark, out).persist()
    stats = stats_from_index(union)
    for q in ["import return", "zzznewterm", "yyanother import"]:
        a = [(r["doc_id"], round(r["score"], 9)) for r in
             search(merged, None, stats, q, k=10).collect()]
        b = [(r["doc_id"], round(r["score"], 9)) for r in
             search(union, None, stats, q, k=10).collect()]
        assert a == b, q
    d = load_dictionary(spark, out)
    got = {(r["term"], r["df"]) for r in d.select("term", "df").collect()}
    want = {(r["term"], r["df"]) for r in
            dictionary_from_index(merged).select("term", "df").collect()}
    assert got == want
    union.unpersist()
