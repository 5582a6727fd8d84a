"""Store integrity checker (plans/fsck.py): a freshly built + compacted
store verifies clean; targeted corruptions are each flagged by name."""

import json
import os
import shutil

import pytest

from index_spark.plans.checkpoint import build_chunked, compact_index
from index_spark.plans.fsck import verify_store

SHARD = 64


@pytest.fixture()
def store(spark, tiny_corpus, tmp_path):
    out = str(tmp_path / "store")
    ordered = tiny_corpus.sort_values(["repo", "path"]).reset_index(drop=True)
    build_chunked(spark, spark.createDataFrame(ordered), out,
                  docs_per_chunk=64, shard_size=SHARD)
    compact_index(spark, out, segment_bytes=512, trigram=True)
    return out


def test_clean_store_verifies(spark, store):
    rep = verify_store(spark, store)
    assert rep["ok"], rep["errors"]
    assert rep["chunks"] >= 2
    assert rep["checks"]["chunks_dense_from_zero"]
    assert rep["checks"]["merged_covers_committed_chunks"]
    assert rep["checks"]["merged_df_matches_chunk_union"]
    assert rep["checks"]["dictionary_matches_merged"]
    assert rep["checks"]["trigram_gram_counts"]
    assert rep["checks"]["blob_invariants"]


def test_tampered_manifest_is_flagged(spark, store):
    mpath = os.path.join(store, "chunks", "00000", "_COMMIT.json")
    with open(mpath) as f:
        man = json.load(f)
    man["n_postings"] += 7
    with open(mpath, "w") as f:
        json.dump(man, f)
    rep = verify_store(spark, store)
    assert not rep["ok"]
    assert any("n_postings" in e for e in rep["errors"])


def test_missing_docs_dim_is_flagged(spark, store):
    shutil.rmtree(os.path.join(store, "chunks", "00001", "docs"))
    rep = verify_store(spark, store)
    assert not rep["ok"]
    assert any("docs dim unreadable" in e for e in rep["errors"])


def test_stale_merged_form_is_flagged(spark, store, tiny_corpus):
    # appending a chunk without recompacting leaves the merged form
    # stale — fsck reports it (and compact_index would fold it)
    mpath = os.path.join(store, "merged", "_COMMIT.json")
    with open(mpath) as f:
        man = json.load(f)
    man["chunks"] = man["chunks"][:-1]
    with open(mpath, "w") as f:
        json.dump(man, f)
    rep = verify_store(spark, store)
    assert not rep["ok"]
    assert rep["checks"]["merged_covers_committed_chunks"] is False
    assert any("stale" in e for e in rep["errors"])


def test_corrupt_merged_blob_is_flagged(spark, store):
    # bump one sampled term's df so its blobs no longer decode to df
    # entries — the merged-form decode walk must surface it (it used to
    # be silently swallowed)
    from pyspark.sql import functions as F
    mdir = os.path.join(store, "merged", "index")
    df = spark.read.parquet(mdir)
    from index_spark.operators.build import DOC_MARKER
    first = (df.filter(F.col("term") != DOC_MARKER)
             .orderBy("term").limit(1).collect()[0]["term"])
    tampered = df.withColumn(
        "df", F.when(F.col("term") == first, F.col("df") + F.lit(1))
               .otherwise(F.col("df"))).cache()
    tampered.count()
    tmp = mdir + ".tmp"
    cols = [c for c in tampered.columns if c != "tb"]
    (tampered.select(*cols, "tb").write.partitionBy("tb")
     .mode("overwrite").parquet(tmp))
    shutil.rmtree(mdir)
    os.rename(tmp, mdir)
    rep = verify_store(spark, store)
    assert not rep["ok"]
    assert any("merged" in e and "decodes" in e for e in rep["errors"])


def test_missing_store(spark, tmp_path):
    rep = verify_store(spark, str(tmp_path / "nope"))
    assert not rep["ok"] and rep["chunks"] == 0
