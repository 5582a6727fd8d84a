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


def qps_worker(cores: int) -> None:
    """Standalone concurrent-query throughput probe: build at sf_dir,
    prepare the serving engine, run the query set over a thread pool
    with FAIR scheduling, print one JSON line {"cores", "qps", ...}.

    Run in its OWN process per core count (a JVM's master is fixed at
    startup) — bench.py main() spawns one at 8 and one at 32 cores so
    BENCH_r{N} carries the throughput scaling pair. Single-query p95 at
    local[32] is scheduler-bound and misleading as a scaling signal;
    queries/sec under concurrency is the serving-relevant number.

    Also measures the round-5 ServingReplica FLEET (one in-memory
    replica process per core, fork, no JVM in children): the
    DataFrame thread-pool path is driver-dispatch-bounded (~0.1 s/job
    floor -> flat QPS, the r04 finding), while the replica fleet is
    the deployment serving architecture whose QPS genuinely scales
    with cores — BENCH carries both so the contrast is explicit."""
    from concurrent.futures import ThreadPoolExecutor

    try:  # honest N-core box: cap the whole process tree (JVM included)
        os.sched_setaffinity(0, set(range(cores)))
    except OSError:
        pass

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from index_spark.operators.build import build_index
    from index_spark.operators.query import QueryEngine
    from index_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(cores=cores, app_name=f"qps_worker_{cores}",
                      shuffle_partitions=cores,
                      extra_conf={"spark.scheduler.mode": "FAIR"})
    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("source").alias("repo"),
        F.format_string("doc%08d", F.col("doc_id")).alias("path"),
        F.col("text").alias("content"))
    docs, index, stats = build_index(corpus, stem=True, shard_size=1024)
    eng = QueryEngine(index, stats, use_wand=True)
    qset = [" ".join(t) for _, t in entrymod.QUERYSET]
    eng.prepare()
    eng.warm(qset)
    # saturate the capacity under test: concurrency scales with cores
    # (a fixed small thread count measures scheduling latency, not
    # throughput — each query is sub-second and latency-bound)
    n_threads = cores
    queries = qset * (2 * max(1, n_threads // len(qset) + 1) * 5)
    queries = queries[: 10 * n_threads]

    def one(q: str) -> None:
        eng.search(q, k=10)

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=n_threads) as ex:
        list(ex.map(one, queries))
    dt = time.time() - t0

    # batched throughput: one multi-query job (search_many) — the shape
    # a high-QPS deployment actually runs (per-job dispatch is driver-
    # latency-bound; batching amortizes it across the whole query set)
    from index_spark.operators.query import search_many

    batch = {i: queries[i % len(queries)] for i in range(320)}
    t1 = time.time()
    search_many(index, stats, batch, k=10, stem=True).count()
    bdt = time.time() - t1

    # ServingReplica fleet: `cores` forked processes, each a fixed
    # per-process query count (total work scales with cores, the
    # throughput-scaling shape); children run pure numpy
    from multiprocessing import get_context

    from index_spark.operators.serving import ServingReplica

    global _FLEET_REPLICA, _FLEET_QUERIES
    t2 = time.time()
    _FLEET_REPLICA = ServingReplica.from_index(index, stats)
    rep_load_s = time.time() - t2
    _FLEET_QUERIES = qset
    per_proc = int(os.environ.get("REPLICA_QUERIES_PER_PROC", "400"))
    ctx = get_context("fork")
    with ctx.Pool(cores) as pool:
        pool.map(_replica_fleet_worker, [20] * cores)    # warm
        t3 = time.time()
        pool.map(_replica_fleet_worker, [per_proc] * cores)
        rdt = time.time() - t3
    rep_qps = cores * per_proc / rdt

    print(json.dumps({"cores": cores, "n_queries": len(queries),
                      "threads": n_threads,
                      "wall_s": round(dt, 3),
                      "qps": round(len(queries) / dt, 2),
                      "batch_qps": round(len(batch) / bdt, 2),
                      "replica_qps": round(rep_qps, 2),
                      "replica_load_s": round(rep_load_s, 3),
                      "replica_mb": round(
                          _FLEET_REPLICA.nbytes / 1e6, 1)}))
    spark.stop()


_FLEET_REPLICA = None
_FLEET_QUERIES: list = []


def _replica_fleet_worker(n: int) -> None:
    """Child of the fork pool: n top-10 searches against the inherited
    in-memory replica (no Spark, no JVM — the serving-node hot loop)."""
    qs = _FLEET_QUERIES
    for i in range(n):
        _FLEET_REPLICA.search(qs[i % len(qs)], k=10)


def _host_cpu() -> tuple[int, int, int] | None:
    """(user+nice, system, total) jiffies from /proc/stat — the run's
    measurement-window forensics. This host has documented episodic
    sys-storms (BENCH/machine_noise_probe.json: guest page faults go
    5-30x; sys_frac > 0.5 means the numbers measure the host, not the
    engine), so every bench line records its own window."""
    try:
        with open("/proc/stat") as f:
            v = [int(x) for x in f.readline().split()[1:]]
        return v[0] + v[1], v[2], sum(v)
    except OSError:
        return None


def _await_quiet_window() -> dict:
    """Bounded wait for a user-dominated measurement window.

    This host has documented episodic sys-storms (see _host_cpu note);
    a bench captured inside one measures the host, not the engine.
    Probe the window (BENCH/window_probe.py kernel, inline) every
    ~2 min for up to $BENCH_QUIET_WAIT_S seconds (default 450; 0
    disables); proceed regardless at the deadline — the result JSON
    records how long we waited and the last probe either way, so a
    storm-floor capture is labeled as such instead of silently
    standing in for engine speed."""
    budget = float(os.environ.get("BENCH_QUIET_WAIT_S", "450"))
    rec = {"quiet_waited_s": 0.0, "quiet_probe": None}
    if budget <= 0:
        return rec
    import subprocess

    t0 = time.time()
    while True:
        try:
            out = subprocess.run(
                [sys.executable, os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "BENCH", "window_probe.py")],
                capture_output=True, text=True, timeout=120)
            probe = json.loads(out.stdout.strip().splitlines()[-1])
        except Exception:
            probe = None
        rec["quiet_probe"] = probe
        rec["quiet_waited_s"] = round(time.time() - t0, 1)
        if probe and probe.get("good_window"):
            return rec
        if time.time() - t0 + 120 > budget:
            return rec
        time.sleep(110)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    quiet = _await_quiet_window()
    cpu0 = _host_cpu()

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

    # BENCH_FAST=1: headline whitelist + build_200k only (~3-5 min) —
    # the quiet-window capture shape; a full run rarely fits a window
    fast = os.environ.get("BENCH_FAST") == "1"

    # 8b. session-3 query surfaces over the flagship build — reported
    # as separate keys, excluded from the round-over-round headline
    # total (same policy as build_200k)
    def _extras():
        from index_spark.operators.analytics import facet_counts
        from index_spark.operators.build import assign_doc_ids
        from index_spark.operators.query import (
            more_like_this,
            search_fuzzy,
        )

        idx, dstats, ddocs = state["index"], state["stats"], state["docs"]
        meta = docs_df.select(F.col("doc_id").cast("long"), "source")
        t0 = time.time()
        facet_counts(idx, meta, "data table query", by="source").count()
        timings["facet_query"] = round(time.time() - t0, 3)
        t0 = time.time()
        search_fuzzy(idx, ddocs, dstats, "dat tabl qury", k=10,
                     shard_size=shard_size).collect()
        timings["fuzzy_query"] = round(time.time() - t0, 3)
        # dictionary-path variant: the production shape (compaction
        # publishes the catalog; expansion never scans the index's term
        # column). Catalog derivation is prepare, not query — same
        # policy as query_prepare.
        from index_spark.plans.dictionary import dictionary_from_index
        dic = dictionary_from_index(idx).persist()
        dic.count()
        t0 = time.time()
        search_fuzzy(idx, ddocs, dstats, "dat tabl qury", k=10,
                     shard_size=shard_size, dictionary=dic).collect()
        timings["fuzzy_query_dict"] = round(time.time() - t0, 3)
        # trigram-path variant: gram-posting candidate generation — the
        # 10^9-vocabulary shape where levenshtein runs only on the gram-
        # bounded candidate set. Artifact derivation is prepare (it is
        # published at compaction).
        from index_spark.plans.trigram import trigram_postings
        trg = trigram_postings(dic).persist()
        trg.count()
        t0 = time.time()
        search_fuzzy(idx, ddocs, dstats, "dat tabl qury", k=10,
                     shard_size=shard_size, trigram=trg).collect()
        timings["fuzzy_query_trgm"] = round(time.time() - t0, 3)
        trg.unpersist()
        dic.unpersist()
        allow = meta.filter(F.col("source") == "src3").select("doc_id")
        t0 = time.time()
        search(idx, ddocs, dstats, "data table query", k=10,
               shard_size=shard_size, restrict=allow).collect()
        timings["restrict_query"] = round(time.time() - t0, 3)
        cwi = assign_doc_ids(corpus)
        t0 = time.time()
        more_like_this(idx, ddocs, dstats, cwi, 42, k=10,
                       shard_size=shard_size).collect()
        timings["mlt_query"] = round(time.time() - t0, 3)
        # LM-Dirichlet similarity module (session 9) — same flagship
        # query, alternative ranking function
        from index_spark.operators.query import lm_dirichlet_search
        t0 = time.time()
        lm_dirichlet_search(idx, dstats, "data table query",
                            k=10).collect()
        timings["lmd_query"] = round(time.time() - t0, 3)

    if not fast:
        _extras()

    # 8b. session-3 surfaces: hybrid fusion, collapsing, significant
    # terms, regex expansion, chunking (each one measured number at the
    # headline SF)
    def _extras_s3():
        from index_spark.operators.analytics import (
            matching_docs,
            significant_terms,
        )
        from index_spark.operators.chunk import chunk_documents
        from index_spark.operators.hybrid import hybrid_search
        from index_spark.operators.query import collapse_search, search_regex

        idx, dstats, ddocs = state["index"], state["stats"], state["docs"]
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
        qvec = [float(x) for x in
                emb.filter("vec_id = 0").first()["embedding"]]
        t0 = time.time()
        hybrid_search(idx, None, dstats, emb, "data table query", qvec,
                      k=10, window=100, shard_size=shard_size).collect()
        timings["hybrid_query"] = round(time.time() - t0, 3)
        emb.unpersist()
        meta = docs_df.select(F.col("doc_id").cast("long"), "source")
        t0 = time.time()
        collapse_search(idx, meta, dstats, "data table query",
                        collapse="source", k=10,
                        shard_size=shard_size).collect()
        timings["collapse_query"] = round(time.time() - t0, 3)
        t0 = time.time()
        fg = matching_docs(idx, "spark stream", mode="and")
        significant_terms(idx, fg, dstats["n_docs"], top=20,
                          shard_size=shard_size).collect()
        timings["sigterms_query"] = round(time.time() - t0, 3)
        t0 = time.time()
        search_regex(idx, None, dstats, "quer(y|ies) dat[a-z]+ table",
                     k=10, shard_size=shard_size).collect()
        timings["regex_query"] = round(time.time() - t0, 3)
        t0 = time.time()
        n_chunks = chunk_documents(docs_df, chunk_size=128,
                                   overlap=16).count()
        timings["chunk_docs"] = round(time.time() - t0, 3)
        timings["chunk_docs_n"] = n_chunks

    if not fast:
        _extras_s3()

    # 9. IVF pruned recall@10 at nprobe=2 (pinned config: 4 buckets,
    # build-side n_assign=2 — see tests/test_similarity.py for why the
    # near-uniform synthetic embeddings need the multi-probe build)
    def _ivf_recall():
        from index_spark.operators.similarity import (
            assign_buckets, cosine_topk, ivf_topk, train_centroids)

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
        cents = train_centroids(emb, n_buckets=4)
        b = assign_buckets(emb, cents, n_assign=2).persist()
        recalls = []
        for qid in [0, 7, 23]:
            q = list(emb.where(F.col("vec_id") == qid)
                     .collect()[0]["embedding"])
            exact = [r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()]
            appr = [r["vec_id"] for r in
                    ivf_topk(b, cents, q, k=10, nprobe=2).collect()]
            recalls.append(len(set(exact) & set(appr)) / 10)
        b.unpersist(), emb.unpersist()
        timings["ivf_recall_nprobe2"] = round(sum(recalls) / len(recalls), 3)

    timed("ivf_topk_recall", _ivf_recall)

    # 10. 200k-document build (fixed overhead amortized away — the
    # round-over-round build throughput signal; corpus generation is
    # one-time and excluded from the timing)
    def _build_200k():
        corpus_dir = os.environ.get("SPARK_GRAFT_200K_DIR",
                                    "/tmp/bench_corpus200k")
        if not os.path.exists(os.path.join(corpus_dir, "corpus.parquet")):
            from index_spark.sources.corpus import write_corpus_sharded
            write_corpus_sharded(corpus_dir, n_files=200_000, n_shards=16)
        from index_spark.operators.build import release_build
        big = spark.read.parquet(f"{corpus_dir}/corpus.parquet") \
                   .select("repo", "path", "content") \
                   .repartition(int(cpus)).persist()
        n_big = big.count()
        t0 = time.time()
        docs, index, stats = build_index(big, stem=True, shard_size=4096)
        index.count()
        dt = time.time() - t0
        timings["build_200k"] = round(dt, 3)
        timings["build_200k_docs_per_sec"] = round(n_big / dt, 1)
        release_build(index)
        # warm repeat: same job with python workers spawned + JIT done —
        # the long-lived-executor regime the pinned scaling artifact
        # measures; the cold/warm split localizes where a storm-window
        # number went (worker spawn is the storm-sensitive phase)
        t0 = time.time()
        docs, index, stats = build_index(big, stem=True, shard_size=4096)
        index.count()
        dt = time.time() - t0
        timings["build_200k_warm"] = round(dt, 3)
        timings["build_200k_warm_docs_per_sec"] = round(n_big / dt, 1)
        release_build(index)
        big.unpersist()

    _build_200k()

    # 10b. 200k positional kernels (non-headline scale point for the
    # phrase/zone family — the 5k rows alone say nothing about scaling).
    # ONE zoned positional build serves both exact phrase (zone='body')
    # and weighted multi-zone scoring.
    def _positional_200k():
        from index_spark.operators.build import (
            build_zoned_index,
            release_build,
        )
        from index_spark.operators.phrase import phrase_search
        from index_spark.operators.query import zone_search

        corpus_dir = os.environ.get("SPARK_GRAFT_200K_DIR",
                                    "/tmp/bench_corpus200k")
        big = spark.read.parquet(f"{corpus_dir}/corpus.parquet") \
                   .select("repo", "path", "content") \
                   .repartition(int(cpus)).persist()
        big.count()
        t0 = time.time()
        _, zidx, zstats = build_zoned_index(
            big.withColumn("src", F.col("repo")),
            [("body", "content"), ("src", "src")],
            stem=False, camel=False, shard_size=4096, positions=True)
        zidx = zidx.persist()
        zidx.count()
        timings["pos_zone_build_200k"] = round(time.time() - t0, 3)
        t0 = time.time()
        phrase_search(zidx, None, "import return", k=10, stem=False,
                      camel=False, zone="body").collect()
        timings["phrase_query_200k"] = round(time.time() - t0, 3)
        t0 = time.time()
        zone_search(zidx, zstats, "import return repo0",
                    {"body": 1.0, "src": 2.0}, k=10,
                    stem=False, camel=False).collect()
        timings["zone_query_200k"] = round(time.time() - t0, 3)
        release_build(zidx)
        zidx.unpersist()
        big.unpersist()

    if not fast:
        _positional_200k()

    # 10b2. large-corpus dedup scale points (non-headline): MinHash/LSH
    # over a 20k-doc slice (4x the 5k headline row — the full 200k sweep
    # measured 677s and a 50k slice 209s in storm windows, too heavy for
    # a per-round bench; shingling is O(total tokens) and these docs are
    # ~1,900 tokens) + exact sha256 keep-first over the full 200k corpus
    def _dedup_scale():
        from index_spark.operators.dedup import minhash_near_dup_pairs

        corpus_dir = os.environ.get("SPARK_GRAFT_200K_DIR",
                                    "/tmp/bench_corpus200k")
        big = spark.read.parquet(f"{corpus_dir}/corpus.parquet") \
                   .select("path", "content") \
                   .withColumn("doc_id", F.xxhash64("path")) \
                   .repartition(int(cpus)).persist()
        big.count()
        slice50 = big.limit(20_000).repartition(int(cpus)).persist()
        slice50.count()
        t0 = time.time()
        n_pairs = minhash_near_dup_pairs(slice50, text_col="content",
                                         id_col="doc_id").count()
        timings["minhash_dedup_20k"] = round(time.time() - t0, 3)
        timings["minhash_dedup_20k_pairs"] = n_pairs
        # duplicated-span coverage (word 16-grams) on a 10k slice — the
        # gram-keyed shuffle is the interesting cost (these docs are
        # ~1,900 tokens, so 10k docs ~ 19M gram occurrences)
        from index_spark.operators.contamination import duplicated_spans

        slice10 = big.limit(10_000).repartition(int(cpus)).persist()
        slice10.count()
        t0 = time.time()
        spans = duplicated_spans(slice10, n=16, min_count=2,
                                 text_col="content", id_col="doc_id")
        n_dup_docs = spans.filter("dup_tokens > 0").count()
        timings["dup_spans_10k"] = round(time.time() - t0, 3)
        timings["dup_spans_10k_docs"] = n_dup_docs
        slice10.unpersist()
        t0 = time.time()
        (big.groupBy(F.sha2("content", 256).alias("h"))
            .agg(F.count("*").alias("n"), F.min("doc_id").alias("keep"))
            .filter(F.col("n") > 1).count())
        timings["exact_dedup_200k"] = round(time.time() - t0, 3)
        big.unpersist()

    if not fast:
        _dedup_scale()

    # 10b2s10. session-10 surfaces (non-headline): the Gopher gate
    # battery over the 200k corpus (map-only — the zero-shuffle quality
    # pass a 100-TB first-pass filter runs; throughput is the signal),
    # SRP-LSH near-dup pairs over the sf embeddings, and a binary
    # (hamming) ANN query with exact rerank
    def _s10_scale():
        from index_spark.operators.curate import gopher_quality
        from index_spark.operators.similarity import (
            srp_hamming_topk,
            srp_near_dup_pairs,
        )

        corpus_dir = os.environ.get("SPARK_GRAFT_200K_DIR",
                                    "/tmp/bench_corpus200k")
        big = spark.read.parquet(f"{corpus_dir}/corpus.parquet")                    .select(F.xxhash64("path").alias("doc_id"),
                           F.col("content").alias("text"))                    .repartition(int(cpus)).persist()
        n_big = big.count()
        t0 = time.time()
        gq = gopher_quality(big)
        n_kept = gq.filter("keep").count()
        dt = time.time() - t0
        timings["gopher_200k"] = round(dt, 3)
        timings["gopher_200k_docs_per_sec"] = round(n_big / dt, 1)
        timings["gopher_200k_kept"] = n_kept
        big.unpersist()
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
        emb.count()
        t0 = time.time()
        n_pairs = srp_near_dup_pairs(emb, n_planes=16, band_bits=4,
                                     threshold=0.3).count()
        timings["srp_near_dup"] = round(time.time() - t0, 3)
        timings["srp_near_dup_pairs"] = n_pairs
        qv = [float(x) for x in
              emb.filter("vec_id = 0").first()["embedding"]]
        t0 = time.time()
        srp_hamming_topk(emb, qv, k=10, rerank=50).collect()
        timings["srp_hamming_query"] = round(time.time() - t0, 3)
        emb.unpersist()

    if not fast:
        _s10_scale()

    # 10b2s11. session-11 surfaces (non-headline): ctags-lite symbol
    # extraction over the 200k pseudo-code corpus (map-only
    # regexp_extract_all — the zero-shuffle pass a code-search indexer
    # runs per file; docs/sec is the signal), T5 span corruption over
    # the sf documents (JVM md5 draws + one Arrow span pass), and a
    # Matryoshka truncated+rerank ANN query
    def _s11_scale():
        from index_spark.operators.chunk import span_corrupt
        from index_spark.operators.codesearch import extract_symbols
        from index_spark.operators.similarity import mrl_topk

        corpus_dir = os.environ.get("SPARK_GRAFT_200K_DIR",
                                    "/tmp/bench_corpus200k")
        big = spark.read.parquet(f"{corpus_dir}/corpus.parquet") \
                   .select(F.xxhash64("path").alias("doc_id"),
                           F.col("content").alias("text")) \
                   .repartition(int(cpus)).persist()
        n_big = big.count()
        t0 = time.time()
        n_syms = extract_symbols(big).count()
        dt = time.time() - t0
        timings["symbols_200k"] = round(dt, 3)
        timings["symbols_200k_docs_per_sec"] = round(n_big / dt, 1)
        timings["symbols_200k_defs"] = n_syms
        big.unpersist()
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
        n_docs = docs.count()
        t0 = time.time()
        span_corrupt(docs, rate=0.15, salt="bench") \
            .agg(F.sum("n_masked")).collect()
        dt = time.time() - t0
        timings["t5_corrupt"] = round(dt, 3)
        timings["t5_corrupt_docs_per_sec"] = round(n_docs / dt, 1)
        docs.unpersist()
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
        emb.count()
        qv = [float(x) for x in
              emb.filter("vec_id = 0").first()["embedding"]]
        t0 = time.time()
        mrl_topk(emb, qv, dim=16, k=10, rerank_candidates=50).collect()
        timings["mrl_query"] = round(time.time() - t0, 3)
        emb.unpersist()

    if not fast:
        _s11_scale()

    # 10b2s12. session-12 geo surfaces (non-headline): geohash_grid over
    # 2M synthetic points (codegen cell key + map-side-combinable count)
    # and a 1,500 km radius query exact vs covering-cell pruned — the
    # pruned/unpruned ratio is the scan-width win a cell-partitioned
    # table gets as partition pruning
    def _geo_scale():
        from index_spark.operators.geo import (
            geo_distance_topk,
            geohash_grid,
            geotile_grid,
        )

        n_pts = 2_000_000
        pts = spark.range(0, n_pts).select(
            F.col("id").alias("event_id"),
            (((F.col("id") * 2654435761) % 1800000) / 10000.0
             - 90.0).alias("lat"),
            (((F.col("id") * 2246822519) % 3600000) / 10000.0
             - 180.0).alias("lon")).persist()
        pts.count()
        t0 = time.time()
        geohash_grid(pts, precision=5).count()
        dt = time.time() - t0
        timings["geo_grid_2m"] = round(dt, 3)
        timings["geo_grid_2m_pts_per_sec"] = round(n_pts / dt, 1)
        t0 = time.time()
        geo_distance_topk(pts, 37.7749, -122.4194, k=100,
                          radius_km=1500.0).collect()
        timings["geo_radius_2m"] = round(time.time() - t0, 3)
        t0 = time.time()
        geo_distance_topk(pts, 37.7749, -122.4194, k=100,
                          radius_km=1500.0, prune_precision=2).collect()
        timings["geo_radius_2m_pruned"] = round(time.time() - t0, 3)
        # session 14: Web-Mercator geotile_grid over the same 2M points
        # (pure-codegen z/x/y key, one bounded-key exchange)
        t0 = time.time()
        geotile_grid(pts, zoom=7).count()
        timings["geotile_grid_2m"] = round(time.time() - t0, 3)
        pts.unpersist()

    if not fast:
        _geo_scale()

    # 10b2s14. session-14 surfaces (non-headline), via the registry so
    # the measured plan is the driver-checked plan: one-pass moment
    # matrix, pooled character entropy, funnel frontiers, weekly
    # retention cohorts, capped phrase-prefix expansion
    if not fast:
        for name in ["matrix_stats", "string_stats", "events_funnel",
                     "events_retention", "phrase_prefix_topk"]:
            timed(name, lambda n=name: qs[n](spark, sf_dir).count())

    # 10b2s15. session-15 surfaces (non-headline): gap-filled
    # date_histogram, parent-child join query, one-pass PCA moments
    if not fast:
        for name in ["events_gap_hist", "has_child_scores_topk", "pca_component",
                     "boosting_topk", "distance_feature_topk"]:
            timed(name, lambda n=name: qs[n](spark, sf_dir).count())

    # 10b3. iterative graph/LM surfaces (non-headline): transitive
    # duplicate clustering (large-star/small-star over the jaccard pair
    # graph), bigram-LM scoring, and 3-iteration PageRank — all via the
    # registry entries so the measured plan is the driver-checked plan
    if not fast:
        for name in ["dup_clusters", "lm_xent", "pagerank_scores"]:
            timed(name, lambda n=name: qs[n](spark, sf_dir).count())

    # 10b4. store lifecycle (session 8, non-headline): two half-corpus
    # chunked stores, concat (one patched varbyte per blob), incremental
    # fold of the imported chunks, snapshot expiry — the full
    # addIndexes -> compact -> expire path at sf0.1
    def _store_lifecycle():
        import shutil
        import tempfile

        from index_spark.plans.checkpoint import (
            build_chunked,
            compact_index,
            expire_snapshots,
        )
        from index_spark.plans.concat import concat_stores

        root = tempfile.mkdtemp(prefix="bench_lifecycle_")
        a, b = f"{root}/a", f"{root}/b"
        half = F.pmod(F.xxhash64("path"), F.lit(2))
        t0 = time.time()
        build_chunked(spark, corpus.where(half == 0), a,
                      docs_per_chunk=2048, shard_size=shard_size)
        build_chunked(spark, corpus.where(half == 1), b,
                      docs_per_chunk=2048, shard_size=shard_size)
        compact_index(spark, a)
        timings["lifecycle_build_compact"] = round(time.time() - t0, 3)
        t0 = time.time()
        concat_stores(spark, a, b)
        timings["lifecycle_concat"] = round(time.time() - t0, 3)
        t0 = time.time()
        compact_index(spark, a)  # incremental fold of the imported chunks
        timings["lifecycle_fold"] = round(time.time() - t0, 3)
        t0 = time.time()
        expire_snapshots(a, keep_last=1)
        timings["lifecycle_expire"] = round(time.time() - t0, 3)
        shutil.rmtree(root, ignore_errors=True)

    if not fast:
        _store_lifecycle()

    # 10d. session-17 surface scale points (non-headline): the boolean
    # query_string evaluator, the span/interval positional family, and
    # the decontam pair.  decontam_bloom REPORTS SLOWER than exact at
    # sf<=0.1 — the bloom build/probe overhead only amortizes when the
    # bench-gram broadcast would be large (its win is the fixed ~1 MiB
    # executor footprint at 10^8 bench grams, not small-SF latency)
    def _s17_scale():
        from index_spark.operators.build import build_index, release_build
        from index_spark.operators.contamination import (
            bloom_decontaminate,
            decontaminate,
        )
        from index_spark.operators.phrase import (
            intervals_search,
            span_containing_search,
            span_not_search,
        )
        from index_spark.operators.query import (
            match_bool_prefix_search,
            query_string_search,
        )

        _, pindex, pstats = build_index(corpus, stem=False, camel=False,
                                        positions=True,
                                        shard_size=shard_size)
        pindex = pindex.persist()
        pindex.count()
        t0 = time.time()
        query_string_search(pindex, pstats,
                            "(data AND table) OR (scan NOT filter)",
                            k=10, stem=False, camel=False).collect()
        timings["query_string"] = round(time.time() - t0, 3)
        t0 = time.time()
        intervals_search(pindex, pstats, "data table query",
                         max_gaps=8, k=10, stem=False, camel=False,
                         shard_size=shard_size).collect()
        timings["intervals_query"] = round(time.time() - t0, 3)
        t0 = time.time()
        span_not_search(pindex, pstats, "data table", "query", pre=3,
                        post=3, k=10, stem=False, camel=False,
                        shard_size=shard_size).collect()
        timings["span_not_query"] = round(time.time() - t0, 3)
        t0 = time.time()
        span_containing_search(pindex, pstats, "data", "table",
                               "query", slop=6, k=10, stem=False,
                               camel=False,
                               shard_size=shard_size).collect()
        timings["span_containing_query"] = round(time.time() - t0, 3)
        t0 = time.time()
        match_bool_prefix_search(pindex, pstats, "data tab", k=10,
                                 stem=False, camel=False,
                                 shard_size=shard_size).collect()
        timings["bool_prefix_query"] = round(time.time() - t0, 3)
        docs_tbl = spark.read.parquet(f"{sf_dir}/documents.parquet")
        bench_split = docs_tbl.filter(F.col("doc_id") % 97 == 0)
        train_split = docs_tbl.filter(F.col("doc_id") % 97 != 0)
        t0 = time.time()
        decontaminate(train_split, bench_split, n=4).filter(
            "contaminated").count()
        timings["decontam_exact"] = round(time.time() - t0, 3)
        t0 = time.time()
        bloom_decontaminate(train_split, bench_split, n=4).filter(
            "contaminated").count()
        timings["decontam_bloom"] = round(time.time() - t0, 3)
        release_build(pindex)

    if not fast:
        _s17_scale()

    # 10e. session-18 surface scale points (non-headline), via the
    # registry so the measured plan is the driver-checked plan:
    # CommonTermsQuery (rare-selects combine), terms lookup
    # (constant-score membership), function_score (fvf + LCG random),
    # cross_fields (blended-df dismax), combined_fields (merged
    # pseudo-field BM25)
    if not fast:
        for name in ["common_terms_topk", "terms_lookup_topk",
                     "function_score_topk", "cross_fields_topk",
                     "combined_fields_topk"]:
            timed(name, lambda n=name: qs[n](spark, sf_dir).count())

    # 10f. session-18b surfaces (non-headline): weighted linear fusion,
    # composite-key terms agg, date_range buckets, ERR@10
    if not fast:
        for name in ["hybrid_linear_topk", "events_multi_terms",
                     "events_date_range", "err_eval"]:
            timed(name, lambda n=name: qs[n](spark, sf_dir).count())

    # 10g. session-19 surfaces (non-headline): TermRangeQuery
    # (row-group-pruned range scan), SpanMultiTermQueryWrapper
    # (prefix-expanded phrase), simple_query_string (lenient grammar +
    # constant-score prefix), phonetic sounds-like, categorize_text
    # templates, random_sampler scaled agg, variable-width histogram,
    # sharded terms agg with error bounds
    if not fast:
        for name in ["term_range_topk", "span_multi_topk", "simple_qs_topk",
                     "sounds_like_topk", "log_templates",
                     "random_sampler_facet", "var_width_hist",
                     "terms_shard_error", "sparse_vector_topk",
                     "fuzzy_auto_topk", "collapse_inner_topk",
                     "extended_stats_facet"]:
            timed(name, lambda n=name: qs[n](spark, sf_dir).count())

    # 10h. session-20 surfaces (non-headline): unified highlighting,
    # late-interaction maxsim, change-point detection, the C4 battery,
    # significant_text with duplicate-text filtering, ip_prefix agg,
    # bucket_correlation pipeline agg
    if not fast:
        for name in ["highlight_topk", "maxsim_topk", "events_change_point",
                     "c4_quality", "significant_text", "ip_prefix_facet",
                     "bucket_correlation", "dfr_topk", "langid_nb",
                     "heaps_fit", "grok_fields"]:
            timed(name, lambda n=name: qs[n](spark, sf_dir).count())

    # 10i. session-21 surfaces (non-headline): the DFI / IB / Axiomatic
    # similarity modules, BBQ asymmetric 1-bit ANN, RBP evaluation,
    # Zipf rank-frequency fit, context-filtered completion
    if not fast:
        for name in ["dfi_topk", "ib_topk", "axiomatic_topk", "bbq_topk",
                     "rbp_eval", "zipf_fit", "context_suggest",
                     "lucene_norms_topk", "sig_chi2_terms", "missing_facet",
                     "rocchio_topk", "ltr_features", "rbo_eval",
                     "champion_topk", "freq_of_freqs"]:
            timed(name, lambda n=name: qs[n](spark, sf_dir).count())

    # 10c. concurrent-query throughput at 8 vs 32 cores, each in its
    # own process/JVM (a Spark master is fixed at startup). The
    # serving-relevant scaling number — single-query p95 at local[32]
    # is scheduler-bound and must not be read as a scaling signal.
    def _concurrent_qps():
        import subprocess

        for c in (8, 32):
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--qps-worker", str(c)],
                    capture_output=True, text=True, timeout=900,
                    env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir})
                line = [ln for ln in out.stdout.splitlines()
                        if ln.startswith("{")][-1]
                rec = json.loads(line)
                timings[f"concurrent_qps_{c}"] = rec["qps"]
                timings[f"batch_qps_{c}"] = rec["batch_qps"]
                if "replica_qps" in rec:
                    timings[f"replica_qps_{c}"] = rec["replica_qps"]
            except Exception:
                timings[f"concurrent_qps_{c}"] = -1.0
        if timings.get("concurrent_qps_8", 0) > 0 \
                and timings.get("concurrent_qps_32", 0) > 0:
            timings["concurrent_qps_scaling_8_to_32"] = round(
                timings["concurrent_qps_32"]
                / (timings["concurrent_qps_8"] * 4), 3)
        if timings.get("batch_qps_8", 0) > 0 \
                and timings.get("batch_qps_32", 0) > 0:
            timings["batch_qps_scaling_8_to_32"] = round(
                timings["batch_qps_32"]
                / (timings["batch_qps_8"] * 4), 3)
        if timings.get("replica_qps_8", 0) > 0 \
                and timings.get("replica_qps_32", 0) > 0:
            timings["replica_qps_scaling_8_to_32"] = round(
                timings["replica_qps_32"]
                / (timings["replica_qps_8"] * 4), 3)

    if not fast:
        _concurrent_qps()

    # sub-timings of other entries don't double-count into the total
    # build_200k reports separately (one-off scale row, not part of the
    # round-over-round sf0.1 headline total); recall is a ratio not a time
    # the headline total is a WHITELIST sum (the round-over-round keys
    # shared since BENCH_r02) — every other key is a non-headline scale
    # point, sub-timing, count, or ratio and reports separately; a
    # whitelist can't silently inflate when new keys land (the blacklist
    # form briefly let session-10/11 keys leak into the total)
    headline = ("build_index", "wand_query_set", "minhash_dedup",
                "phrase_build_query", "zone_build_query", "bm25_queryset",
                "term_stats", "ngram_jaccard", "emb_knn", "tpch_q1",
                "tpch_q3", "events_hourly", "ivf_topk_recall")
    total = round(sum(v for k, v in timings.items() if k in headline), 3)
    timings["build_docs_per_sec"] = round(n_docs / timings["build_index"], 1)
    out = {
        "metric": "index_spark headline suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": int(cpus),
        "n_docs": n_docs,
    }
    cpu1 = _host_cpu()
    if cpu0 and cpu1 and cpu1[2] > cpu0[2]:
        d = cpu1[2] - cpu0[2]
        out["host_user_frac"] = round((cpu1[0] - cpu0[0]) / d, 4)
        out["host_sys_frac"] = round((cpu1[1] - cpu0[1]) / d, 4)
    out["quiet_waited_s"] = quiet["quiet_waited_s"]
    if quiet["quiet_probe"] is not None:
        out["pre_probe"] = quiet["quiet_probe"]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--qps-worker":
        qps_worker(int(sys.argv[2]))
    else:
        main()
