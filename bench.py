"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = the engine's flagship paths (index build, WAND query set,
MinHash dedup) + representative SQL/embedding/relational operators.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from index_spark.operators.build import build_index
    from index_spark.operators.dedup import minhash_near_dup_pairs
    from index_spark.operators.query import search
    from index_spark.session import get_spark

    spark = get_spark(cores=int(cpus), app_name="index_spark_bench",
                      shuffle_partitions=int(cpus))

    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    docs_df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs_df.count()
    corpus = docs_df.select(
        F.col("source").alias("repo"),
        F.format_string("doc%08d", F.col("doc_id")).alias("path"),
        F.col("text").alias("content"),
    )

    # 1. flagship: full index build (tokenize+stem, postings, blobs)
    shard_size = 1024
    state = {}

    def _build():
        docs, index, stats = build_index(corpus, stem=True, shard_size=shard_size)
        docs, index = docs.persist(), index.persist()
        docs.count(), index.count()
        state.update(docs=docs, index=index, stats=stats)

    timed("build_index", _build)

    # 2. query latency: 10-query WAND set via the cached-stats serving
    # path (stats warm excluded from per-query latency, as in a real
    # serving deployment; one-shot search() latency reported separately)
    qset = [" ".join(t) for _, t in entrymod.QUERYSET]

    def _queries():
        from index_spark.operators.query import QueryEngine

        eng = QueryEngine(state["index"], state["stats"], use_wand=True)
        t0 = time.time()
        eng.prepare()  # serving mode: shard-partitioned cached index
        eng.warm(qset)
        timings["query_prepare"] = round(time.time() - t0, 3)
        lat = []
        for q in qset:
            t0 = time.time()
            eng.search(q, k=10)
            lat.append(time.time() - t0)
        lat.sort()
        timings["query_p95"] = round(lat[int(0.95 * (len(lat) - 1))], 3)
        timings["query_mean"] = round(sum(lat) / len(lat), 3)
        t0 = time.time()
        search(state["index"], state["docs"], state["stats"], qset[0], k=10,
               use_wand=True, shard_size=shard_size).collect()
        timings["query_oneshot"] = round(time.time() - t0, 3)
        # whole query set as ONE Spark job (batch/eval-set surface)
        from index_spark.operators.query import search_many

        t0 = time.time()
        search_many(state["index"], state["stats"],
                    dict(enumerate(qset)), k=10).count()
        timings["queryset_batch"] = round(time.time() - t0, 3)

    timed("wand_query_set", _queries)

    # 3. MinHash/LSH near-dup sweep
    timed("minhash_dedup", lambda: minhash_near_dup_pairs(
        docs_df, text_col="text", id_col="doc_id").count())

    # 3b. positions build + exact phrase search (engine path)
    def _phrase():
        from index_spark.operators.build import build_index, release_build
        from index_spark.operators.phrase import phrase_search

        _, pidx, pstats = build_index(corpus, stem=False, camel=False,
                                      positions=True, shard_size=shard_size)
        pidx = pidx.persist()
        pidx.count()
        timings["phrase_query"] = 0.0
        t0 = time.time()
        phrase_search(pidx, pstats, "data table", k=10,
                      stem=False, camel=False).collect()
        timings["phrase_query"] = round(time.time() - t0, 3)
        release_build(pidx)

    timed("phrase_build_query", _phrase)

    # 3c. zoned build + zone-weighted BM25 (engine path)
    def _zones():
        from index_spark.operators.build import (build_zoned_index,
                                                 release_build)
        from index_spark.operators.query import zone_search

        zcorpus = docs_df.select(
            F.lit("corpus").alias("repo"),
            F.format_string("doc%08d", F.col("doc_id")).alias("path"),
            F.col("text").alias("content"), F.col("source").alias("src"))
        _, zidx, zstats = build_zoned_index(
            zcorpus, [("body", "content"), ("src", "src")],
            stem=False, camel=False, shard_size=shard_size)
        zidx = zidx.persist()
        zidx.count()
        t0 = time.time()
        zone_search(zidx, zstats, "data table src3",
                    {"body": 1.0, "src": 2.0}, k=10,
                    stem=False, camel=False).collect()
        timings["zone_query"] = round(time.time() - t0, 3)
        release_build(zidx)

    timed("zone_build_query", _zones)

    # 4-8. representative SQL operators via the entry registry
    qs = entrymod.queries()
    for name in ["bm25_queryset", "term_stats", "ngram_jaccard", "emb_knn",
                 "tpch_q1", "tpch_q3", "events_hourly"]:
        timed(name, lambda n=name: qs[n](spark, sf_dir).count())

    # sub-timings of other entries don't double-count into the total
    total = round(sum(v for k, v in timings.items()
                      if k not in ("query_p95", "query_mean", "query_prepare",
                                   "phrase_query", "zone_query",
                                   "query_oneshot", "queryset_batch")), 3)
    timings["build_docs_per_sec"] = round(n_docs / timings["build_index"], 1)
    print(json.dumps({
        "metric": "index_spark headline suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": int(cpus),
        "n_docs": n_docs,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
