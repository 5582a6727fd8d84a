"""Regressions for the session-8 self-review findings: expiry crash
safety, reader visibility of uncommitted chunks, concat tombstone
carry-over, CLI tombstone routing, line-dedup edge cases."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from index_spark.plans.checkpoint import (
    build_chunked,
    compact_index,
    expire_snapshots,
    expired_chunk_ids,
    load_docs,
    load_index,
    load_stats,
    snapshots,
)
from index_spark.plans.concat import concat_stores

SHARD = 64


@pytest.fixture()
def store(spark, tiny_corpus, tmp_path):
    out = str(tmp_path / "store")
    ordered = tiny_corpus.sort_values(["repo", "path"]).reset_index(drop=True)
    build_chunked(spark, spark.createDataFrame(ordered), out,
                  docs_per_chunk=64, shard_size=SHARD)
    compact_index(spark, out, segment_bytes=512)
    return out


def test_interrupted_expiry_completes_on_rerun(spark, store):
    # simulate a crash between mark and delete: manifest flagged expired,
    # index data still present, retention marker absent
    cpath = os.path.join(store, "chunks", "00000", "_COMMIT.json")
    with open(cpath) as f:
        man = json.load(f)
    man["expired"] = True
    with open(cpath, "w") as f:
        json.dump(man, f)
    idir = os.path.join(store, "chunks", "00000", "index")
    assert os.path.isdir(idir)
    res = expire_snapshots(store)  # re-run finishes the deletion
    assert not os.path.isdir(idir)
    assert 0 in expired_chunk_ids(store)
    # the re-run freed chunk 0's leftover bytes even though it was
    # already marked (so it is not double-counted in "expired")
    assert 0 not in res["expired"]
    assert res["index_bytes_freed"] > 0


def test_expiry_preserves_snapshot_log_times(spark, store):
    before = {s["snapshot_id"]: s["committed_at"] for s in snapshots(store)}
    expire_snapshots(store)
    after = {s["snapshot_id"]: s["committed_at"] for s in snapshots(store)}
    assert after == before


def test_uncommitted_chunk_dir_is_invisible(spark, store):
    n = load_index(spark, store).count()
    nd = load_docs(spark, store).count()
    # a crash mid-append: data files written, no _COMMIT.json
    src = os.path.join(store, "chunks", "00000")
    dst = os.path.join(store, "chunks", "00099")
    shutil.copytree(src, dst)
    os.remove(os.path.join(dst, "_COMMIT.json"))
    assert load_index(spark, store).count() == n
    assert load_docs(spark, store).count() == nd


def test_concat_carries_source_tombstones(spark, tiny_corpus, tmp_path):
    from index_spark.operators.maintenance import (
        delete_docs,
        load_tombstones,
    )
    from index_spark.operators.query import search

    ordered = tiny_corpus.sort_values(["repo", "path"]).reset_index(drop=True)
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    build_chunked(spark, spark.createDataFrame(ordered.iloc[:100]), a,
                  docs_per_chunk=64, shard_size=SHARD)
    build_chunked(spark, spark.createDataFrame(ordered.iloc[100:]), b,
                  docs_per_chunk=64, shard_size=SHARD)
    # delete one source doc that matches the probe query
    hit = search(load_index(spark, b), None, load_stats(b),
                 "import return", k=1, shard_size=SHARD).collect()[0]
    gone_path = (load_docs(spark, b)
                 .filter(F.col("doc_id") == hit["doc_id"])
                 .collect()[0]["path"])
    delete_docs(spark, b, spark.createDataFrame(
        [(int(hit["doc_id"]),)], ["doc_id"]))
    res = concat_stores(spark, a, b)
    assert res["tombstones_carried"] == 1
    tomb = load_tombstones(spark, a)
    top = search(load_index(spark, a), None, load_stats(a),
                 "import return", k=10**6, shard_size=SHARD,
                 tombstones=tomb)
    paths = {r["path"] for r in
             top.join(load_docs(spark, a), "doc_id").collect()}
    assert gone_path not in paths
    assert len(paths) > 0


def test_cli_query_routes_tombstones_at_store_shard_size(
        spark, tiny_corpus, tmp_path, capsys):
    from main import main

    ordered = tiny_corpus.sort_values(["repo", "path"]).reset_index(drop=True)
    out = str(tmp_path / "cli_store")
    build_chunked(spark, spark.createDataFrame(ordered), out,
                  docs_per_chunk=64, shard_size=SHARD)
    main(["--cores", "8", "query", "--index-dir", out,
          "--query", "import return", "-k", "5"])
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rows
    victim = rows[0]["doc_id"]
    from index_spark.operators.maintenance import delete_docs

    delete_docs(spark, out, spark.createDataFrame([(victim,)], ["doc_id"]))
    main(["--cores", "8", "query", "--index-dir", out,
          "--query", "import return", "-k", "5"])
    rows2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert victim not in [r["doc_id"] for r in rows2]


def test_line_dedup_null_text_and_literal_sep(spark):
    from index_spark.operators.contamination import remove_duplicated_lines

    docs = spark.createDataFrame(
        [(0, "a|dup|b"), (1, "dup|c"), (2, None)], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           remove_duplicated_lines(docs, min_docs=2, sep="|").collect()}
    # "|" split literally, not as a regex alternation
    assert out[0]["n_lines"] == 3 and out[0]["text"] == "a|b"
    assert out[1]["text"] == "c"
    # NULL text: zero lines, never -1
    assert out[2]["n_lines"] == 0 and out[2]["n_dropped"] == 0
    assert out[2]["text"] == ""
