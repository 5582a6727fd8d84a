"""Measured full-vs-incremental compaction pair -> BENCH/compaction_tiered.json.

Evidence for the tiered-compaction cost shape: build a chunked store,
compact it fully, ingest ONE small chunk, compact again — the fold must
cost a small fraction of the full merge and rewrite only the term-hash
partitions the delta's vocabulary touches.

Usage: python BENCH/compaction_bench.py [n_docs] [delta_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    delta_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    out = f"/tmp/compact_bench_{n_docs}"

    from pyspark.sql import functions as F

    from index_spark.plans.checkpoint import build_chunked, compact_index
    from index_spark.session import get_spark
    from index_spark.sources.corpus import write_corpus_sharded
    from index_spark.streaming.ingest import ingest_batch

    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      app_name="compaction_bench")

    corpus_dir = os.environ.get("SPARK_GRAFT_200K_DIR",
                                "/tmp/bench_corpus200k")
    if not os.path.exists(os.path.join(corpus_dir, "corpus.parquet")):
        write_corpus_sharded(corpus_dir, n_files=200_000, n_shards=16)
    big = spark.read.parquet(f"{corpus_dir}/corpus.parquet") \
               .select("repo", "path", "content")
    base = big.limit(n_docs).persist()
    base.count()
    import shutil
    shutil.rmtree(out, ignore_errors=True)

    t0 = time.time()
    build_chunked(spark, base, out, docs_per_chunk=8192, shard_size=4096)
    build_s = time.time() - t0

    t0 = time.time()
    m_full = compact_index(spark, out)
    full_s = time.time() - t0

    # one small appended chunk (disjoint keys: rename the repo)
    delta = (big.limit(n_docs + delta_docs).subtract(base)
             .limit(delta_docs)
             .withColumn("repo", F.concat(F.lit("delta/"), F.col("repo"))))
    ingest_batch(spark, delta, out, shard_size=4096)

    t0 = time.time()
    m_inc = compact_index(spark, out)
    inc_s = time.time() - t0

    rec = {
        "n_docs": n_docs,
        "delta_docs": delta_docs,
        "chunk_build_s": round(build_s, 2),
        "full_merge_s": round(full_s, 2),
        "incremental_fold_s": round(inc_s, 2),
        "fold_over_full": round(inc_s / full_s, 4),
        "full_manifest": {k: m_full[k] for k in
                          ("rows", "terms", "blob_bytes", "mode", "wall_s")},
        "fold_manifest": {k: m_inc[k] for k in
                          ("rows", "terms", "blob_bytes", "mode", "wall_s",
                           "buckets_rewritten", "terms_affected",
                           "rows_folded", "rows_appended")},
        "n_term_buckets": m_inc["n_term_buckets"],
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "compaction_tiered.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
