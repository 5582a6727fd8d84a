"""spark-submit entry point for the index_spark engine.

Usage (cluster):
    zip -r index_spark.zip index_spark
    spark-submit --py-files index_spark.zip main.py build \
        --corpus s3://bucket/corpus_parquet --out s3://bucket/index \
        --docs-per-chunk 5000000 --shard-size 1048576
    spark-submit --py-files index_spark.zip main.py query \
        --index-dir s3://bucket/index --query "import numpy" -k 10
    spark-submit --py-files index_spark.zip main.py bench

Local smoke (this sandbox):
    python main.py build --corpus /root/testdata/sf0.01/documents.parquet \
        --out /tmp/idx --documents-table --docs-per-chunk 256 --shard-size 64
    python main.py query --index-dir /tmp/idx --query "data table" -k 5

The build is chunked + resumable: re-running the same command after a
failure skips committed chunks (see index_spark/plans/checkpoint.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _spark(args):
    from index_spark.session import get_spark

    return get_spark(cores=args.cores, shuffle_partitions=args.cores
                     if isinstance(args.cores, int) else None)


def cmd_build(args) -> None:
    from pyspark.sql import functions as F

    from index_spark.plans.checkpoint import build_chunked

    spark = _spark(args)
    corpus = spark.read.parquet(args.corpus)
    if args.documents_table:
        corpus = corpus.select(
            F.col("source").alias("repo"),
            F.format_string("doc%08d", F.col("doc_id")).alias("path"),
            F.col("text").alias("content"))
    report = build_chunked(spark, corpus, args.out,
                           docs_per_chunk=args.docs_per_chunk,
                           shard_size=args.shard_size,
                           stem=not args.no_stem,
                           positions=args.positions)
    print(json.dumps(report))


def cmd_query(args) -> None:
    from index_spark.operators.maintenance import load_tombstones
    from index_spark.operators.query import (search, search_fuzzy,
                                             search_regex, search_wildcard)
    from index_spark.plans.checkpoint import (lineage, load_store_index,
                                              load_stats)

    spark = _spark(args)
    # merged form when current (or when retention removed chunk data),
    # chunk union otherwise
    index = load_store_index(spark, args.index_dir)
    stats = load_stats(args.index_dir)
    # the store's tombstone log (deletes/upserts) applies automatically;
    # tombstones cogroup BY SHARD, so the build's shard_size (recorded
    # in every chunk manifest) must reach the kernels — the default
    # would silently mis-route deletes on stores built with any other
    # size
    shard_size = int(lineage(args.index_dir)[0]["shard_size"])
    tomb = load_tombstones(spark, args.index_dir)
    boosts = (spark.read.parquet(args.boosts)
              if getattr(args, "boosts", None) else None)
    after = None
    if getattr(args, "after", None):
        s, d = args.after.split(",")
        after = (float(s), int(d))
    sim = getattr(args, "similarity", "bm25")
    phonetic = getattr(args, "phonetic", False)
    if sim != "bm25" and (args.fuzzy or args.regex or phonetic
                          or "*" in args.query or "?" in args.query):
        # the expansion paths rank with BM25 — fail loudly rather than
        # silently returning BM25 scores under a non-BM25 flag
        raise SystemExit(f"--similarity {sim} supports plain term queries "
                         "(no --fuzzy/--regex/wildcards)")
    if getattr(args, "qs", False):
        # Lucene query_string boolean grammar -> the compositional
        # join-algebra evaluator (no boosts/paging/similarity
        # composition; plain-term flags belong to the flat path)
        from index_spark.operators.query import query_string_search

        if (args.fuzzy or args.regex or phonetic or args.exclude
                or args.mode != "or" or boosts is not None
                or after is not None or sim != "bm25"
                or getattr(args, "min_match", None)):
            raise SystemExit("--qs composes the boolean grammar only — "
                             "drop --fuzzy/--regex/--phonetic/--exclude/"
                             "--mode/--boosts/--after/--similarity/"
                             "--min-match (express them in the query "
                             "string)")
        if "*" in args.query or "?" in args.query:
            # the grammar tokenizer would silently strip glob chars
            raise SystemExit("--qs does not expand wildcards; drop "
                             "--qs to use the wildcard route")
        rows = query_string_search(index, stats, args.query,
                                   k=args.k).collect()
        print(json.dumps([{"doc_id": r["doc_id"], "score": r["score"]}
                          for r in rows]))
        return
    if "*" in args.query or "?" in args.query:
        # glob tokens route to the wildcard path (dictionary-backed
        # when the store has a compacted catalog)
        from index_spark.plans.dictionary import (
            dictionary_path,
            load_dictionary,
            load_reversed_dictionary,
            reversed_dictionary_path,
        )
        d = (load_dictionary(spark, args.index_dir)
             if os.path.isdir(dictionary_path(args.index_dir)) else None)
        rd = (load_reversed_dictionary(spark, args.index_dir)
              if os.path.isdir(reversed_dictionary_path(args.index_dir))
              else None)
        rows = search_wildcard(index, None, stats, args.query, k=args.k,
                               mode=args.mode, exclude=args.exclude,
                               tombstones=tomb, dictionary=d,
                               rdictionary=rd,
                               boosts=boosts, after=after,
                               shard_size=shard_size).collect()
        print(json.dumps([{"doc_id": r["doc_id"], "score": r["score"]}
                          for r in rows]))
        return
    if phonetic:
        if args.fuzzy or args.regex:
            # one expansion mode at a time — silent precedence would
            # return phonetic results under a --fuzzy flag
            raise SystemExit("--phonetic cannot combine with "
                             "--fuzzy/--regex; pick one expansion mode")
        # soundex-key dictionary expansion (functions/phonetic.py)
        from index_spark.operators.query import sounds_like_search
        from index_spark.plans.dictionary import (
            dictionary_path,
            load_dictionary,
        )
        d = (load_dictionary(spark, args.index_dir)
             if os.path.isdir(dictionary_path(args.index_dir)) else None)
        rows = sounds_like_search(index, None, stats, args.query,
                                  k=args.k, mode=args.mode,
                                  exclude=args.exclude, tombstones=tomb,
                                  dictionary=d, boosts=boosts,
                                  after=after,
                                  shard_size=shard_size).collect()
        print(json.dumps([{"doc_id": r["doc_id"], "score": r["score"]}
                          for r in rows]))
        return
    if args.fuzzy or args.regex:
        # expand against the compacted term dictionary when the store
        # has one (plans/dictionary.py); else fall back to the index
        from index_spark.plans.dictionary import (
            dictionary_path,
            load_dictionary,
        )
        d = (load_dictionary(spark, args.index_dir)
             if os.path.isdir(dictionary_path(args.index_dir)) else None)
        fn = search_regex if args.regex else search_fuzzy
        kw = {}
        if not args.regex:
            # gram-bounded candidate generation when the store has the
            # trigram artifact (plans/trigram.py)
            from index_spark.plans.trigram import (
                load_trigram_postings,
                trigram_path,
            )
            if os.path.isdir(trigram_path(args.index_dir)):
                kw["trigram"] = load_trigram_postings(spark, args.index_dir)
        rows = fn(index, None, stats, args.query, k=args.k,
                  mode=args.mode, exclude=args.exclude,
                  tombstones=tomb, dictionary=d,
                  boosts=boosts, after=after,
                  shard_size=shard_size, **kw).collect()
    elif sim != "bm25":
        # alternative similarity modules (LM-Dirichlet / Jelinek-Mercer
        # query likelihood, Lucene ClassicSimilarity TF-IDF); OR-mode
        # only (no exclude/boost/paging composition)
        from index_spark.operators.query import (
            axiomatic_search,
            bm25_lossy_search,
            classic_search,
            dfi_search,
            dfr_search,
            ib_search,
            lm_dirichlet_search,
            lm_jelinek_mercer_search,
        )

        if args.mode != "or" or args.exclude or boosts is not None \
                or after is not None or getattr(args, "min_match", None):
            raise SystemExit(f"--similarity {sim} supports plain OR "
                             "queries (no --mode and/--exclude/--boosts/"
                             "--after/--min-match)")
        if sim == "lmd":
            rows = lm_dirichlet_search(index, stats, args.query,
                                       mu=args.mu, k=args.k,
                                       tombstones=tomb).collect()
        elif sim == "jm":
            rows = lm_jelinek_mercer_search(index, stats, args.query,
                                            lam=args.lam, k=args.k,
                                            tombstones=tomb).collect()
        elif sim == "dfr":
            rows = dfr_search(index, stats, args.query, k=args.k,
                              tombstones=tomb).collect()
        elif sim == "dfi":
            rows = dfi_search(index, stats, args.query, k=args.k,
                              tombstones=tomb).collect()
        elif sim == "ib":
            rows = ib_search(index, stats, args.query, k=args.k,
                             tombstones=tomb).collect()
        elif sim == "axiomatic":
            rows = axiomatic_search(index, stats, args.query, k=args.k,
                                    tombstones=tomb).collect()
        elif sim == "lossy":
            rows = bm25_lossy_search(index, stats, args.query,
                                     k=args.k, tombstones=tomb).collect()
        else:  # classic
            rows = classic_search(index, stats, args.query, k=args.k,
                                  tombstones=tomb).collect()
    else:
        rows = search(index, None, stats, args.query, k=args.k,
                      mode=args.mode, exclude=args.exclude,
                      tombstones=tomb, boosts=boosts,
                      after=after, shard_size=shard_size,
                      min_match=getattr(args, "min_match", None)).collect()
    print(json.dumps([{"doc_id": r["doc_id"], "score": r["score"]} for r in rows]))


def cmd_upsert(args) -> None:
    from index_spark.operators.maintenance import upsert_docs

    spark = _spark(args)
    batch = spark.read.parquet(args.batch)
    m = upsert_docs(spark, args.index_dir, batch,
                    shard_size=args.shard_size, stem=not args.no_stem,
                    positions=args.positions)
    print(json.dumps(m))


def cmd_facets(args) -> None:
    from index_spark.operators.analytics import facet_counts
    from index_spark.plans.checkpoint import load_docs, load_index

    spark = _spark(args)
    index = load_index(spark, args.index_dir)
    meta = load_docs(spark, args.index_dir)
    out = facet_counts(index, meta, args.query, by=args.by,
                       mode=args.mode, top=args.top).collect()
    print(json.dumps([{args.by: r[args.by], "n_docs": r["n_docs"]}
                      for r in out]))


def cmd_percolate(args) -> None:
    from index_spark.operators.build import assign_doc_ids
    from index_spark.operators.percolate import percolate

    spark = _spark(args)
    docs = assign_doc_ids(spark.read.parquet(args.docs))
    queries = {int(k): v for k, v in json.loads(args.queries).items()}
    out = percolate(docs, queries, mode=args.mode).collect()
    print(json.dumps([{"query_id": r["query_id"], "doc_id": r["doc_id"]}
                      for r in out]))


def cmd_eval(args) -> None:
    from index_spark.operators.evaluate import ranking_metrics

    spark = _spark(args)
    res = spark.read.parquet(args.results)
    qrels = spark.read.parquet(args.qrels)
    out = ranking_metrics(res, qrels, k=args.k).collect()
    print(json.dumps([r.asDict() for r in out]))


def cmd_report(args) -> None:
    from index_spark.operators.analytics import index_report
    from index_spark.plans.checkpoint import load_index

    spark = _spark(args)
    r = index_report(load_index(spark, args.index_dir)).collect()[0]
    print(json.dumps(r.asDict()))


def cmd_hygiene(args) -> None:
    """Corpus-hygiene sweep over a documents parquet: curation verdicts
    + duplicated-span coverage + PII stats (and optional benchmark
    decontamination), written as one verdict parquet per gate."""
    from index_spark.operators.contamination import (decontaminate,
                                                     duplicated_spans)
    from index_spark.operators.curate import curate_corpus
    from index_spark.operators.scrub import pii_stats

    spark = _spark(args)
    docs = spark.read.parquet(args.docs)
    summary = {}
    cur = curate_corpus(docs, min_tokens=args.min_tokens)
    cur.write.mode("overwrite").parquet(f"{args.out}/curation")
    summary["curation_kept"] = cur.filter("keep").count()
    spans = duplicated_spans(docs, n=args.span_n, min_count=2)
    spans.write.mode("overwrite").parquet(f"{args.out}/dup_spans")
    summary["dup_span_docs"] = spans.filter("dup_tokens > 0").count()
    if args.remove_spans:
        from index_spark.operators.contamination import (
            remove_duplicated_spans,
        )
        clean = remove_duplicated_spans(docs, n=args.span_n, min_count=2)
        clean.write.mode("overwrite").parquet(f"{args.out}/despanned")
        summary["despanned_docs"] = clean.filter(
            "kept_tokens < n_tokens").count()
    if args.dedup_lines:
        from index_spark.operators.contamination import (
            remove_duplicated_lines,
        )
        ld = remove_duplicated_lines(docs, min_docs=args.line_min_docs)
        ld.write.mode("overwrite").parquet(f"{args.out}/deduped_lines")
        summary["line_dedup_docs"] = ld.filter("n_dropped > 0").count()
    if args.gopher:
        from index_spark.operators.curate import gopher_quality

        gq = gopher_quality(docs, min_words=args.min_words)
        gq.write.mode("overwrite").parquet(f"{args.out}/gopher")
        summary["gopher_kept"] = gq.filter("keep").count()
    pii = pii_stats(docs)
    pii.write.mode("overwrite").parquet(f"{args.out}/pii")
    summary["pii_docs"] = pii.filter("n_pii > 0").count()
    if args.bench:
        bench = spark.read.parquet(args.bench)
        dec = decontaminate(docs, bench, n=args.decontam_n)
        dec.write.mode("overwrite").parquet(f"{args.out}/decontam")
        summary["contaminated_docs"] = dec.filter("contaminated").count()
    print(json.dumps(summary))


def cmd_suggest(args) -> None:
    """Dictionary-backed query understanding: the catalog published by
    `compact` serves both autocompletion and spell suggestions without
    touching the sharded index; falls back to the chunk union when the
    store has no compaction yet."""
    from index_spark.operators.query import complete_terms, suggest_corrections
    from index_spark.plans.checkpoint import load_index
    from index_spark.plans.dictionary import dictionary_path, load_dictionary

    spark = _spark(args)
    if os.path.isdir(dictionary_path(args.index_dir)):
        d, idx = load_dictionary(spark, args.index_dir), None
    else:
        d, idx = None, load_index(spark, args.index_dir)
    out = {}
    if args.prefix:
        rows = complete_terms(idx, args.prefix, limit=args.top,
                              dictionary=d).collect()
        out["complete"] = [{"term": r["term"], "df": r["df"]} for r in rows]
    if args.query:
        rows = suggest_corrections(idx, args.query, dictionary=d).collect()
        out["suggest"] = [{"qterm": r["qterm"], "suggestion": r["suggestion"],
                           "df": r["df"]} for r in rows]
    if args.phrase:
        # whole-query corrections via the bigram LM (needs the corpus
        # text for adjacency counts — the store keeps dims, not text)
        if not args.corpus:
            raise SystemExit("--phrase needs --corpus (documents parquet "
                             "with a text column)")
        from index_spark.operators.query import suggest_phrase

        corpus = spark.read.parquet(args.corpus)
        rows = suggest_phrase(idx, corpus, args.phrase, k=args.top,
                              max_dist=args.max_dist,
                              dictionary=d).collect()
        out["phrase"] = [{"phrase": r["phrase"], "logp": r["logp"],
                          "n_changed": r["n_changed"]} for r in rows]
    print(json.dumps(out))


def cmd_related(args) -> None:
    from index_spark.operators.analytics import related_terms_index
    from index_spark.plans.checkpoint import load_index, load_stats

    spark = _spark(args)
    index = load_index(spark, args.index_dir)
    stats = load_stats(args.index_dir)
    out = related_terms_index(index, args.term,
                              stats["n_docs"], top=args.top).collect()
    print(json.dumps([{"term": r["term"], "cooc": r["cooc"],
                       "df": r["df"], "pmi": r["pmi"]} for r in out]))


def cmd_compact(args) -> None:
    from index_spark.plans.checkpoint import compact_index

    spark = _spark(args)
    report = compact_index(spark, args.index_dir, force=args.force,
                           trigram=args.trigram)
    print(json.dumps(report))


def cmd_vacuum(args) -> None:
    from index_spark.operators.maintenance import vacuum_index
    from index_spark.plans.checkpoint import load_index

    spark = _spark(args)
    index = load_index(spark, args.index_dir)
    tomb = spark.createDataFrame(
        [(int(d),) for d in args.doc_ids], "doc_id long")
    v = vacuum_index(index, tomb, shard_size=args.shard_size)
    v.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"rows": spark.read.parquet(args.out).count()}))


def cmd_phrase(args) -> None:
    from index_spark.operators.phrase import (
        phrase_search,
        sloppy_phrase_search,
        span_first_search,
    )
    from index_spark.plans.checkpoint import load_index, load_stats

    spark = _spark(args)
    index = load_index(spark, args.index_dir)
    stats = load_stats(args.index_dir)
    if args.max_start:
        rows = span_first_search(index, stats, args.phrase, k=args.k,
                                 max_start=args.max_start,
                                 stem=not args.no_stem).collect()
    elif args.slop > 1:
        rows = sloppy_phrase_search(index, stats, args.phrase, k=args.k,
                                    gap=args.slop,
                                    stem=not args.no_stem).collect()
    else:
        rows = phrase_search(index, stats, args.phrase, k=args.k,
                             stem=not args.no_stem).collect()
    print(json.dumps([{"doc_id": r["doc_id"], "n_matches": r["n_matches"]}
                      for r in rows]))


def cmd_collapse(args) -> None:
    """Field collapsing: one best doc per group, top-k groups."""
    from index_spark.operators.maintenance import load_tombstones
    from index_spark.operators.query import collapse_search
    from index_spark.plans.checkpoint import load_docs, load_index, load_stats

    spark = _spark(args)
    index = load_index(spark, args.index_dir)
    stats = load_stats(args.index_dir)
    docs = load_docs(spark, args.index_dir)
    tomb = load_tombstones(spark, args.index_dir)
    rows = collapse_search(index, docs, stats, args.query, collapse=args.by,
                           k=args.k, mode=args.mode,
                           tombstones=tomb).collect()
    print(json.dumps([{args.by: r["group_key"], "doc_id": r["doc_id"],
                       "score": r["score"]} for r in rows]))


def cmd_sigterms(args) -> None:
    """Significant terms (JLH) of a query's match set vs the corpus."""
    from index_spark.operators.analytics import matching_docs, significant_terms
    from index_spark.plans.checkpoint import load_index, load_stats

    spark = _spark(args)
    index = load_index(spark, args.index_dir)
    stats = load_stats(args.index_dir)
    fg = matching_docs(index, args.query, mode=args.mode)
    rows = significant_terms(index, fg, stats["n_docs"], top=args.top,
                             min_fg_df=args.min_fg_df).collect()
    print(json.dumps([{"term": r["term"], "fg_df": r["fg_df"],
                       "df": r["df"], "jlh": r["jlh"]} for r in rows]))


def cmd_hybrid(args) -> None:
    """Hybrid RRF: BM25 over the store (x) cosine over an embedding
    parquet keyed by vec_id == doc_id; query vector = the --qvec-id row."""
    from index_spark.operators.hybrid import hybrid_search
    from index_spark.plans.checkpoint import load_index, load_stats

    spark = _spark(args)
    index = load_index(spark, args.index_dir)
    stats = load_stats(args.index_dir)
    emb = spark.read.parquet(args.emb)
    qvec = [float(x) for x in emb.filter(f"vec_id = {int(args.qvec_id)}")
            .first()["embedding"]]
    rows = hybrid_search(index, None, stats, emb, args.query, qvec,
                         k=args.k, window=args.window).collect()
    print(json.dumps([{"doc_id": r["doc_id"], "rrf": r["rrf"]}
                      for r in rows]))


def cmd_chunk(args) -> None:
    """Chunk a documents parquet into overlapping token windows."""
    from index_spark.operators.chunk import chunk_documents

    spark = _spark(args)
    docs = spark.read.parquet(args.docs)
    out = chunk_documents(docs, chunk_size=args.size, overlap=args.overlap,
                          text_col=args.text_col, id_col=args.id_col)
    out.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"chunks": spark.read.parquet(args.out).count()}))


def cmd_sample(args) -> None:
    """Deterministic stratified sampling + split assignment."""
    from index_spark.operators.sample import assign_splits, sample_stratified

    spark = _spark(args)
    docs = spark.read.parquet(args.docs)
    rates = json.loads(args.rates) if args.rates else {}
    kept = sample_stratified(docs, rates, strata_col=args.strata_col,
                             key_col=args.id_col,
                             default_rate=args.default_rate)
    kept = assign_splits(kept, key_col=args.id_col)
    kept.write.mode("overwrite").parquet(args.out)
    from pyspark.sql import functions as F

    out = spark.read.parquet(args.out)
    per = {r["split"]: r["n"] for r in
           out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    print(json.dumps({"kept": out.count(), "by_split": per}))


def cmd_cluster(args) -> None:
    """Transitive duplicate clusters: n-gram-Jaccard pairs (plus exact
    prefix-star pairs) -> connected components -> (doc_id, cluster)."""
    from pyspark.sql import functions as F

    from index_spark.operators.dedup import dup_clusters, ngram_jaccard_pairs

    spark = _spark(args)
    docs = spark.read.parquet(args.docs)
    pairs = ngram_jaccard_pairs(docs, n=args.n, threshold=args.threshold,
                                text_col=args.text_col, id_col=args.id_col
                                ).select("doc_a", "doc_b")
    out = dup_clusters(docs, pairs, id_col=args.id_col)
    out.write.mode("overwrite").parquet(args.out)
    out = spark.read.parquet(args.out)
    n_docs = out.count()
    n_clusters = out.select("cluster").distinct().count()
    print(json.dumps({"docs": n_docs, "clusters": n_clusters,
                      "dupes_droppable": n_docs - n_clusters}))


def cmd_knn(args) -> None:
    """Vector search over an embeddings parquet: exact cosine (default,
    optionally metadata-filtered), IVF-probed, int8-scalar-quantized,
    product-quantized ADC, binary SRP-hamming, or MMR-diversified —
    the serving tiers of the ANN family, one flag apart."""
    from pyspark.sql import functions as F

    from index_spark.operators import similarity as sim

    spark = _spark(args)
    emb = spark.read.parquet(args.emb)
    q = [float(v) for v in
         emb.filter(F.col("vec_id") == args.query_id)
            .select("embedding").collect()[0][0]]
    restrict = emb.filter(args.filter).select("vec_id") if args.filter \
        else None
    if args.method == "exact":
        out = sim.cosine_topk(emb, q, k=args.k, restrict=restrict)
    elif args.method == "ivf":
        cents = sim.train_centroids(emb, n_buckets=args.buckets)
        bucketed = sim.assign_buckets(emb, cents)
        out = sim.ivf_topk(bucketed, cents, q, k=args.k,
                           nprobe=args.nprobe)
    elif args.method == "sq":
        lo, hi = sim.quantize_bounds(emb)
        codes = sim.scalar_quantize(emb, lo, hi)
        out = sim.sq_topk(codes, lo, hi, q, k=args.k,
                          rerank=args.rerank, emb=emb if args.rerank
                          else None)
    elif args.method == "pq":
        cb = sim.pq_train(emb, m=args.m, k=args.codebook_k)
        out = sim.pq_topk(sim.pq_encode(emb, cb), cb, q, k=args.k,
                          rerank=args.rerank, emb=emb if args.rerank
                          else None)
    elif args.method == "binary":
        out = sim.srp_hamming_topk(emb, q, k=args.k,
                                   n_planes=args.planes,
                                   rerank=args.rerank or None,
                                   restrict=restrict)
    elif args.method == "mmr":
        out = sim.mmr_rerank(emb, q, k=args.k, window=args.window,
                             lam=args.lam, restrict=restrict)
    elif args.method == "mrl":
        out = sim.mrl_topk(emb, q, dim=args.dim, k=args.k,
                           rerank_candidates=args.rerank)
    else:  # ivfpq: the composite billion-vector recipe
        _, cents = sim.kmeans(emb, k=args.buckets, iters=2)
        cb = sim.pq_train(emb, m=args.m, k=args.codebook_k)
        idx = sim.ivf_pq_index(emb, cents, cb)
        out = sim.ivf_pq_topk(idx, cents, cb, q, k=args.k,
                              nprobe=args.nprobe, rerank=args.rerank,
                              emb=emb if args.rerank else None)
    print(json.dumps([r.asDict() for r in out.collect()]))


def cmd_keywords(args) -> None:
    """Per-document tf-idf keywords from a built store (labeling a
    corpus before clustering / dataset cards)."""
    from index_spark.operators.analytics import doc_keywords
    from index_spark.plans.checkpoint import load_stats, load_store_index

    spark = _spark(args)
    index = load_store_index(spark, args.index_dir)
    stats = load_stats(args.index_dir)
    out = doc_keywords(index, stats["n_docs"], top=args.top,
                       zone=args.zone)
    if args.out:
        out.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"rows": out.count(), "out": args.out}))
    else:
        print(json.dumps([r.asDict() for r in out.limit(30).collect()]))


def cmd_concat(args) -> None:
    """Append one store's chunks onto another (Lucene addIndexes): the
    source doc-id space shifts past the destination's — one patched
    varbyte per posting blob, everything else byte-copied."""
    from index_spark.plans.concat import concat_stores

    spark = _spark(args)
    print(json.dumps(concat_stores(spark, args.dst, args.src)))


def cmd_expire(args) -> None:
    """Iceberg-style snapshot retention: delete chunk index data already
    folded into the merged form (manifests and docs dims survive)."""
    from index_spark.plans.checkpoint import expire_snapshots

    print(json.dumps(expire_snapshots(args.index_dir,
                                      keep_last=args.keep_last)))


def cmd_fsck(args) -> None:
    """Store integrity walk (the reference's index self-test, live):
    manifests, stats, blob invariants, merged/dictionary consistency."""
    from index_spark.plans.fsck import verify_store

    spark = _spark(args)
    report = verify_store(spark, args.index_dir,
                          sample_rows=args.sample_rows)
    print(json.dumps(report))
    if not report["ok"]:
        raise SystemExit(1)


def cmd_grep(args) -> None:
    """Trigram-indexed substring/regex search over raw document text
    (grep at corpus scale, byte-exact)."""
    from index_spark.operators.codesearch import (
        build_substring_index,
        grep_search,
        substring_search,
    )

    spark = _spark(args)
    docs = spark.read.parquet(args.docs)
    trgm = build_substring_index(docs) if not args.no_index else None
    if args.lines:
        from index_spark.operators.codesearch import grep_lines

        rows = grep_lines(docs, args.pattern, regex=args.regex,
                          trgm=trgm).limit(args.k).collect()
        print(json.dumps([{"doc_id": r["doc_id"], "line_no": r["line_no"],
                           "line": r["line"]} for r in rows]))
        return
    if args.regex:
        rows = grep_search(docs, args.pattern, regex=True,
                           trgm=trgm).limit(args.k).collect()
        print(json.dumps([{"doc_id": r["doc_id"]} for r in rows]))
    else:
        rows = substring_search(docs, args.pattern,
                                trgm=trgm).limit(args.k).collect()
        print(json.dumps([{"doc_id": r["doc_id"],
                           "n": r["n_occurrences"]} for r in rows]))


def cmd_symbols(args) -> None:
    """ctags-lite symbol-definition extraction / kind-weighted symbol
    search over raw document text."""
    from index_spark.operators.codesearch import extract_symbols, symbol_search

    spark = _spark(args)
    docs = spark.read.parquet(args.docs)
    syms = extract_symbols(docs, text_col=args.text_col)
    if args.query:
        rows = symbol_search(syms, args.query, k=args.k,
                             prefix=args.prefix).collect()
        print(json.dumps([{"doc_id": r["doc_id"], "score": r["score"]}
                          for r in rows]))
    else:
        rows = (syms.orderBy("doc_id", "kind", "symbol")
                .limit(args.k).collect())
        print(json.dumps([{"doc_id": r["doc_id"], "kind": r["kind"],
                           "symbol": r["symbol"], "n_defs": r["n_defs"]}
                          for r in rows]))


def cmd_dsir(args) -> None:
    """DSIR importance log-weights (target-likeness data selection)."""
    from pyspark.sql import functions as F

    from index_spark.operators.dsir import dsir_logratios

    spark = _spark(args)
    docs = spark.read.parquet(args.docs)
    target = spark.read.parquet(args.target)
    out = dsir_logratios(docs, target, n_buckets=args.buckets,
                         alpha=args.alpha)
    out.write.mode("overwrite").parquet(args.out)
    stats = (spark.read.parquet(args.out)
             .agg(F.count("*").alias("n"),
                  F.round(F.avg("log_ratio"), 4).alias("mean_lr"),
                  F.sum((F.col("log_ratio") > 0).cast("long"))
                  .alias("target_like")).first())
    print(json.dumps({"docs": stats["n"], "mean_log_ratio": stats["mean_lr"],
                      "target_like_docs": int(stats["target_like"])}))


def cmd_lmscore(args) -> None:
    """Bigram-LM cross-entropy per doc (CCNet-style quality gate)."""
    from index_spark.operators.lm import bigram_lm_scores

    spark = _spark(args)
    docs = spark.read.parquet(args.docs)
    ref = spark.read.parquet(args.reference) if args.reference else None
    out = bigram_lm_scores(docs, reference=ref, alpha=args.alpha,
                           text_col=args.text_col, id_col=args.id_col)
    out.write.mode("overwrite").parquet(args.out)
    from pyspark.sql import functions as F

    stats = (spark.read.parquet(args.out)
             .agg(F.count("*").alias("n"),
                  F.round(F.avg("xent"), 4).alias("mean_xent"),
                  F.round(F.max("xent"), 4).alias("max_xent")).first())
    print(json.dumps({"docs": stats["n"], "mean_xent": stats["mean_xent"],
                      "max_xent": stats["max_xent"]}))


def cmd_pagerank(args) -> None:
    """PageRank over the symmetrized similarity graph of a corpus."""
    from pyspark.sql import functions as F

    from index_spark.operators.dedup import ngram_jaccard_pairs
    from index_spark.operators.graph import pagerank

    spark = _spark(args)
    docs = spark.read.parquet(args.docs)
    pairs = ngram_jaccard_pairs(docs, n=args.n, threshold=args.threshold,
                                text_col=args.text_col, id_col=args.id_col)
    und = (pairs.select(F.col("doc_a").alias("src"),
                        F.col("doc_b").alias("dst"))
           .unionByName(pairs.select(F.col("doc_b").alias("src"),
                                     F.col("doc_a").alias("dst"))))
    nodes = docs.select(F.col(args.id_col).alias("node"))
    out = pagerank(nodes, und, damping=args.damping, iters=args.iters)
    out.write.mode("overwrite").parquet(args.out)
    top = [{"doc_id": r["node"], "rank": r["rank"]}
           for r in spark.read.parquet(args.out)
           .orderBy(F.desc("rank"), F.asc("node")).limit(5).collect()]
    print(json.dumps({"top": top}))


def cmd_geo(args) -> None:
    """Geo search over a points parquet: --near 'lat,lon' runs a
    geo_distance top-k (optionally radius-bounded); --grid N runs a
    geohash_grid aggregation at precision N."""
    from index_spark.operators.geo import geo_distance_topk, geohash_grid

    spark = _spark(args)
    pts = spark.read.parquet(args.points)
    if args.near:
        qlat, qlon = (float(x) for x in args.near.split(","))
        out = geo_distance_topk(pts, qlat, qlon, k=args.k,
                                radius_km=args.radius,
                                lat_col=args.lat_col, lon_col=args.lon_col,
                                id_col=args.id_col)
        print(json.dumps({"hits": [r.asDict() for r in out.collect()]}))
    elif args.grid:
        out = geohash_grid(pts, precision=args.grid, lat_col=args.lat_col,
                           lon_col=args.lon_col, limit=args.k)
        print(json.dumps({"cells": [r.asDict() for r in out.collect()]}))
    else:
        raise SystemExit("geo: pass --near 'lat,lon' or --grid PRECISION")


def cmd_ingest(args) -> None:
    """Normalize a corpus from any supported format into the canonical
    (doc_id, text, source) documents parquet."""
    from index_spark.sources import ingest as ing

    spark = _spark(args)
    if args.format == "warc":
        docs = ing.read_warc_docs(spark, args.path)
    elif args.format == "jsonl":
        docs = ing.read_jsonl_docs(spark, args.path,
                                   text_field=args.text_field,
                                   key_field=args.key_field)
    elif args.format == "csv":
        docs = ing.read_csv_docs(spark, args.path,
                                 text_field=args.text_field,
                                 key_field=args.key_field)
    elif args.format == "text":
        docs = ing.read_text_dir(spark, args.path)
    else:  # parquet passthrough
        docs = ing.normalize_docs(spark.read.parquet(args.path),
                                  args.text_field, args.key_field)
    docs.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"docs": spark.read.parquet(args.out).count(),
                      "format": args.format}))


def cmd_export(args) -> None:
    """Export a documents parquet to jsonl / csv / warc."""
    spark = _spark(args)
    docs = spark.read.parquet(args.docs)
    if args.format == "warc":
        from pyspark.sql import functions as F

        from index_spark.sources.warc import write_warc_dir
        manifest = write_warc_dir(docs, args.out,
                                  docs_per_file=args.docs_per_file)
        stats = manifest.agg(
            F.count("*").alias("files"),
            F.coalesce(F.sum("n_bytes"), F.lit(0)).alias("bytes")).first()
        print(json.dumps({"files": stats["files"],
                          "bytes": int(stats["bytes"])}))
    else:
        from index_spark.sources.ingest import write_docs
        write_docs(docs, args.out, fmt=args.format)
        print(json.dumps({"docs": docs.count(), "format": args.format}))


def cmd_mix(args) -> None:
    """Rebalance a corpus to target domain proportions (largest
    downsample-only subset; deterministic per-row draw)."""
    from pyspark.sql import functions as F

    from index_spark.operators.sample import balance_corpus, mixture_rates

    spark = _spark(args)
    docs = spark.read.parquet(args.docs)
    if args.alpha is not None:
        # temperature sampling: targets derived from counts (n^alpha)
        from index_spark.operators.sample import temperature_rates

        targets = None
        rates_df = temperature_rates(docs, alpha=args.alpha,
                                     strata_col=args.strata_col) \
            .drop("target_share").persist()
    else:
        if not args.targets:
            raise SystemExit("mix: pass --targets JSON or --alpha")
        targets = {k: float(v) for k, v in json.loads(args.targets).items()}
        rates_df = mixture_rates(docs, targets,
                                 strata_col=args.strata_col).persist()
    kept = balance_corpus(docs, targets, strata_col=args.strata_col,
                          key_col=args.id_col, rates=rates_df)
    kept.write.mode("overwrite").parquet(args.out)
    rates = {r[args.strata_col]: round(r["rate"], 4)
             for r in rates_df.collect()}
    per = {r[args.strata_col]: r["n"] for r in
           spark.read.parquet(args.out).groupBy(args.strata_col)
           .agg(F.count("*").alias("n")).collect()}
    print(json.dumps({"rates": rates, "kept_by_stratum": per}))


def cmd_pipeline(args) -> None:
    """End-to-end training-data pipeline over a canonical documents
    parquet: curation gates -> transitive near-dup keep-first ->
    optional LM quantile gate -> optional mixture rebalance -> splits
    -> curated documents parquet (+ optional searchable index store).
    Every stage writes its relation under --workdir and the manifest
    records per-stage counts."""
    from pyspark.sql import functions as F

    from index_spark.operators.curate import curate_corpus, kept
    from index_spark.operators.dedup import (dup_clusters,
                                             minhash_near_dup_pairs)
    from index_spark.operators.sample import assign_splits, balance_corpus

    spark = _spark(args)
    docs = spark.read.parquet(args.docs)
    wd = args.workdir
    manifest = {"input_docs": docs.count()}

    # 1. curation gates (exact dup + token/alpha stats)
    verdicts = curate_corpus(docs, min_tokens=args.min_tokens)
    verdicts.write.mode("overwrite").parquet(f"{wd}/curation")
    docs = kept(docs, spark.read.parquet(f"{wd}/curation")).persist()
    manifest["after_curation"] = docs.count()

    # 2. transitive near-dup keep-first (MinHash/LSH pairs -> components)
    pairs = minhash_near_dup_pairs(docs).select("doc_a", "doc_b")
    clusters = dup_clusters(docs, pairs)
    clusters.write.mode("overwrite").parquet(f"{wd}/dup_clusters")
    winners = (spark.read.parquet(f"{wd}/dup_clusters")
               .where(F.col("cluster") == F.col("doc_id"))
               .select("doc_id"))
    docs = docs.join(winners, "doc_id", "left_semi").persist()
    manifest["after_near_dup"] = docs.count()

    # 3. optional LM cross-entropy quantile gate (drops the high tail)
    if args.lm_quantile is not None:
        from index_spark.operators.lm import bigram_lm_scores

        scores = bigram_lm_scores(docs)
        scores.write.mode("overwrite").parquet(f"{wd}/lm_scores")
        scores = spark.read.parquet(f"{wd}/lm_scores")
        cut = scores.agg(F.expr(
            f"percentile(xent, {float(args.lm_quantile)})").alias("c"))
        keep_ids = (scores.crossJoin(cut)
                    .where(F.col("xent").isNull() | (F.col("xent") <= F.col("c")))
                    .select("doc_id"))
        docs = docs.join(keep_ids, "doc_id", "left_semi").persist()
        manifest["after_lm_gate"] = docs.count()

    # 4. optional domain-mixture rebalance
    if args.targets:
        targets = {k: float(v) for k, v in json.loads(args.targets).items()}
        docs = balance_corpus(docs, targets).persist()
        manifest["after_mixture"] = docs.count()

    # 5. deterministic splits + final relation
    out = assign_splits(docs)
    out.write.mode("overwrite").parquet(f"{wd}/documents")
    final = spark.read.parquet(f"{wd}/documents")
    manifest["final_docs"] = final.count()
    manifest["by_split"] = {r["split"]: r["n"] for r in
                            final.groupBy("split")
                            .agg(F.count("*").alias("n")).collect()}

    # 6. optional searchable index store over the curated corpus
    if args.build_index:
        from index_spark.plans.checkpoint import build_chunked

        corpus = final.select(
            F.col("source").alias("repo"),
            F.format_string("doc%d", F.col("doc_id")).alias("path"),
            F.col("text").alias("content"))
        report = build_chunked(spark, corpus, f"{wd}/index_store",
                               shard_size=args.shard_size)
        manifest["index_chunks"] = report["n_chunks"]

    with open(f"{wd}/pipeline.json", "w") as fh:
        json.dump(manifest, fh, indent=1)
    print(json.dumps(manifest))


def cmd_classify(args) -> None:
    """Train a hashed-BoW logistic-regression quality classifier on a
    labeled parquet (doc_id, y) and score the whole corpus."""
    from pyspark.sql import functions as F

    from index_spark.operators.classifier import (hashed_features,
                                                  score_logreg, train_logreg)

    spark = _spark(args)
    docs = spark.read.parquet(args.docs)
    labels = spark.read.parquet(args.labels)
    feats = hashed_features(docs, dim=args.dim, text_col=args.text_col,
                            id_col=args.id_col)
    w = train_logreg(feats, labels, iters=args.iters, lr=args.lr)
    out = score_logreg(docs, feats, w, id_col=args.id_col)
    out.write.mode("overwrite").parquet(args.out)
    stats = (spark.read.parquet(args.out)
             .agg(F.count("*").alias("n"),
                  F.round(F.avg("prob"), 4).alias("mean_prob")).first())
    print(json.dumps({"docs": stats["n"], "mean_prob": stats["mean_prob"],
                      "dim": args.dim, "iters": args.iters}))


def cmd_bpe(args) -> None:
    """Learn BPE merges over a corpus; optionally tokenize it with them."""
    from index_spark.operators.bpe import apply_bpe, learn_bpe

    spark = _spark(args)
    docs = spark.read.parquet(args.docs)
    merges = learn_bpe(docs, n_merges=args.merges, text_col=args.text_col)
    rules = [(r["lhs"], r["rhs"]) for r in merges.collect()]
    merges.write.mode("overwrite").parquet(f"{args.out}/merges")
    summary = {"merges": [f"{a}+{b}" for a, b in rules]}
    if args.tokenize:
        toks = apply_bpe(docs, rules, text_col=args.text_col,
                         id_col=args.id_col)
        toks.write.mode("overwrite").parquet(f"{args.out}/tokens")
        from pyspark.sql import functions as F

        summary["total_pieces"] = (spark.read.parquet(f"{args.out}/tokens")
                                   .agg(F.sum(F.size("tokens"))).first()[0])
    print(json.dumps(summary))


def _cli_corpus(args, spark):
    from pyspark.sql import functions as F

    corpus = spark.read.parquet(args.corpus)
    if getattr(args, "documents_table", False):
        corpus = corpus.select(
            F.col("source").alias("repo"),
            F.format_string("doc%08d", F.col("doc_id")).alias("path"),
            F.col("text").alias("content"))
    return corpus


def cmd_export_ref(args) -> None:
    """Build (positions) and serialize every shard in the reference
    chunk grammar (plans/export.py)."""
    from index_spark.operators.build import build_index
    from index_spark.plans.export import export_all_chunks

    spark = _spark(args)
    corpus = _cli_corpus(args, spark)
    docs, index, _ = build_index(corpus, stem=not args.no_stem,
                                 positions=True,
                                 shard_size=args.shard_size)
    index = index.persist()
    metas = export_all_chunks(index, docs, args.out,
                              corpus_tag=args.tag)
    print(json.dumps({"chunks": len(metas),
                      "docs": sum(m["n_docs"] for m in metas),
                      "bytes": sum(m["bytes"] for m in metas)}))


def cmd_serve(args) -> None:
    """One-shot in-memory replica serving: build (or boot from a
    snapshot), answer the query (repeated --bench times if asked)
    without a Spark job per query."""
    if not args.corpus and not args.snapshot:
        raise SystemExit("serve: pass --corpus or --snapshot")
    import time as _t

    from index_spark.operators.serving import ServingReplica

    if args.snapshot:
        # serving-node boot path: numpy/json only, no SparkSession
        t0 = _t.time()
        rep = ServingReplica.load(args.snapshot)
        load_s = _t.time() - t0
    else:
        from index_spark.operators.build import build_index

        spark = _spark(args)
        corpus = _cli_corpus(args, spark)
        docs, index, stats = build_index(corpus, stem=not args.no_stem,
                                         shard_size=args.shard_size)
        index = index.persist()
        t0 = _t.time()
        rep = ServingReplica.from_index(index, stats,
                                        champion_m=args.champion_m,
                                        stem=not args.no_stem)
        load_s = _t.time() - t0
        if args.save_snapshot:
            rep.save(args.save_snapshot)
    t0 = _t.time()
    n = max(1, args.bench)
    for _ in range(n):
        hits = rep.search(args.query, k=args.k)
    dt = (_t.time() - t0) / n
    print(json.dumps({"query": args.query,
                      "hits": [[d, round(s, 4)] for d, s in hits],
                      "replica_mb": round(rep.nbytes / 1e6, 2),
                      "load_s": round(load_s, 3),
                      "query_ms": round(dt * 1e3, 3)}))


def cmd_bench(args) -> None:
    import bench

    bench.main()


def cmd_package(args) -> None:
    """Zip the index_spark package for spark-submit --py-files."""
    import pathlib
    import zipfile

    root = pathlib.Path(__file__).resolve().parent
    out = pathlib.Path(args.out)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted((root / "index_spark").rglob("*.py")):
            zf.write(p, p.relative_to(root))
    names = out.name
    print(json.dumps({"zip": str(out),
                      "usage": f"spark-submit --py-files {names} main.py ..."}))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="index_spark")
    p.add_argument("--cores", default="*",
                   type=lambda s: s if s == "*" else int(s))
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="chunked resumable index build")
    b.add_argument("--corpus", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--docs-per-chunk", type=int, default=5000)
    b.add_argument("--shard-size", type=int, default=4096)
    b.add_argument("--no-stem", action="store_true")
    b.add_argument("--positions", action="store_true",
                   help="store position postings (enables phrase/proximity)")
    b.add_argument("--documents-table", action="store_true",
                   help="corpus is a (doc_id,text,source,...) documents table")
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="top-k BM25 over a built index")
    q.add_argument("--index-dir", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--mode", choices=["or", "and"], default="or",
                   help="disjunctive (default) or conjunctive matching")
    q.add_argument("--exclude", default=None,
                   help="boolean NOT: drop docs containing any of these terms")
    q.add_argument("--fuzzy", action="store_true",
                   help="edit-distance-1 dictionary expansion (glob "
                        "tokens */? route to the wildcard path "
                        "automatically)")
    q.add_argument("--regex", action="store_true",
                   help="tokens with regex metacharacters expand as "
                        "anchored whole-term regexes over the dictionary")
    q.add_argument("--phonetic", action="store_true",
                   help="sounds-like: soundex-key dictionary expansion "
                        "(functions/phonetic.py pinned spec)")
    q.add_argument("--boosts", default=None,
                   help="parquet of (doc_id, boost) function-scoring "
                        "multipliers")
    q.add_argument("--similarity",
                   choices=["bm25", "lmd", "jm", "classic", "dfr",
                            "dfi", "ib", "axiomatic", "lossy"],
                   default="bm25",
                   help="ranking function: bm25 (default), lmd "
                        "(LM-Dirichlet), jm (LM-Jelinek-Mercer), "
                        "classic (TF-IDF), dfr (IneL2), dfi "
                        "(independence), ib (information-based), "
                        "axiomatic (F2EXP), lossy (BM25 with Lucene "
                        "SmallFloat one-byte norms)")
    q.add_argument("--mu", type=float, default=2000.0,
                   help="Dirichlet smoothing parameter (with "
                        "--similarity lmd)")
    q.add_argument("--lam", type=float, default=0.1,
                   help="Jelinek-Mercer interpolation weight (with "
                        "--similarity jm)")
    q.add_argument("--min-match", type=int, default=None, dest="min_match",
                   help="minimum_should_match: docs must contain at least "
                        "this many distinct query terms (mode=or)")
    q.add_argument("--after", default=None,
                   help="deep-pagination cursor 'score,doc_id' (the "
                        "previous page's last row)")
    q.add_argument("--qs", action="store_true",
                   help="parse --query as the Lucene query_string "
                        "boolean grammar (AND/OR/NOT, parens; "
                        "UPPERCASE keywords)")
    q.set_defaults(fn=cmd_query)

    up = sub.add_parser("upsert", help="Iceberg-style MERGE: replace "
                        "existing (repo, path) keys, add new ones")
    up.add_argument("--index-dir", required=True)
    up.add_argument("--batch", required=True,
                    help="parquet with (repo, path, content)")
    up.add_argument("--shard-size", type=int, default=4096)
    up.add_argument("--no-stem", action="store_true")
    up.add_argument("--positions", action="store_true")
    up.set_defaults(fn=cmd_upsert)

    fc = sub.add_parser("facets", help="matching-doc counts per doc "
                        "attribute")
    fc.add_argument("--index-dir", required=True)
    fc.add_argument("--query", required=True)
    fc.add_argument("--by", default="repo")
    fc.add_argument("--mode", default="or", choices=["or", "and"])
    fc.add_argument("--top", type=int, default=20)
    fc.set_defaults(fn=cmd_facets)

    pc = sub.add_parser("percolate", help="route docs against a "
                        "standing query set")
    pc.add_argument("--docs", required=True,
                    help="parquet with (repo, path, content)")
    pc.add_argument("--queries", required=True,
                    help='JSON object {"0": "data table", ...}')
    pc.add_argument("--mode", default="and", choices=["or", "and"])
    pc.set_defaults(fn=cmd_percolate)

    ev = sub.add_parser("eval", help="MRR/nDCG of a results parquet "
                        "against a qrels parquet")
    ev.add_argument("--results", required=True,
                    help="parquet with (query_id, doc_id, rank)")
    ev.add_argument("--qrels", required=True,
                    help="parquet with (query_id, doc_id, rel)")
    ev.add_argument("-k", type=int, default=10)
    ev.set_defaults(fn=cmd_eval)

    rp = sub.add_parser("report", help="index health report (counts, "
                        "bytes, shard skew)")
    rp.add_argument("--index-dir", required=True)
    rp.set_defaults(fn=cmd_report)

    sg = sub.add_parser("suggest", help="prefix autocompletion + "
                                        "'did you mean' over the "
                                        "compacted term dictionary")
    sg.add_argument("--index-dir", required=True)
    sg.add_argument("--prefix", help="autocomplete this prefix")
    sg.add_argument("--query", help="spell-suggest absent terms of this query")
    sg.add_argument("--phrase", help="bigram-LM whole-query correction "
                                     "(phrase 'did you mean')")
    sg.add_argument("--corpus", help="documents parquet for --phrase "
                                     "adjacency counts")
    sg.add_argument("--max-dist", type=int, default=1,
                    help="edit-distance radius for --phrase candidates")
    sg.add_argument("--top", type=int, default=10)
    sg.set_defaults(fn=cmd_suggest)

    rl = sub.add_parser("related", help="PMI co-occurring terms")
    rl.add_argument("--index-dir", required=True)
    rl.add_argument("--term", required=True)
    rl.add_argument("--top", type=int, default=20)
    rl.set_defaults(fn=cmd_related)

    c = sub.add_parser("compact", help="merge committed chunks into the "
                                       "serving index (idempotent)")
    c.add_argument("--index-dir", required=True)
    c.add_argument("--force", action="store_true")
    c.add_argument("--trigram", action="store_true",
                   help="also publish the gram-posting artifact that "
                        "bounds fuzzy/spell candidate generation")
    c.set_defaults(fn=cmd_compact)

    v = sub.add_parser("vacuum", help="physically purge deleted doc_ids")
    v.add_argument("--index-dir", required=True)
    v.add_argument("--out", required=True)
    v.add_argument("--shard-size", type=int, default=4096)
    v.add_argument("doc_ids", nargs="+")
    v.set_defaults(fn=cmd_vacuum)

    ph = sub.add_parser("phrase", help="exact phrase search (needs a "
                                       "--positions build)")
    ph.add_argument("--index-dir", required=True)
    ph.add_argument("--phrase", required=True)
    ph.add_argument("-k", type=int, default=10)
    ph.add_argument("--no-stem", action="store_true")
    ph.add_argument("--slop", type=int, default=1,
                    help="ordered gap bound (1 = exact phrase)")
    ph.add_argument("--max-start", type=int, default=0,
                    help="SpanFirst: only matches starting before "
                         "this token ordinal")
    ph.set_defaults(fn=cmd_phrase)

    hy = sub.add_parser("hygiene", help="curation + dup-span + PII "
                                        "(+ optional decontamination) "
                                        "verdict parquets for a corpus")
    hy.add_argument("--docs", required=True,
                    help="documents parquet (doc_id, text)")
    hy.add_argument("--out", required=True)
    hy.add_argument("--bench", help="benchmark parquet to decontaminate "
                                    "against (doc_id, text)")
    hy.add_argument("--min-tokens", type=int, default=5)
    hy.add_argument("--span-n", type=int, default=16)
    hy.add_argument("--decontam-n", type=int, default=8)
    hy.add_argument("--dedup-lines", action="store_true",
                    help="also write the line-deduplicated rewrite "
                         "(lines shared by >= --line-min-docs docs "
                         "dropped — CCNet/RefinedWeb boilerplate filter)")
    hy.add_argument("--line-min-docs", type=int, default=2)
    hy.add_argument("--remove-spans", action="store_true",
                    help="also write the despanned rewrite (duplicated "
                         "spans REMOVED, Lee et al. 2022)")
    hy.add_argument("--gopher", action="store_true",
                    help="also write the Gopher quality-rule battery "
                         "verdicts (Rae et al. 2021 §A1.1: word-shape, "
                         "symbol/bullet/ellipsis, stopword, and "
                         "duplicate-line gates)")
    hy.add_argument("--min-words", type=int, default=50,
                    help="Gopher word-count floor (with --gopher)")
    hy.set_defaults(fn=cmd_hygiene)

    cl = sub.add_parser("collapse", help="field collapsing: best doc per "
                                         "group, top-k groups")
    cl.add_argument("--index-dir", required=True)
    cl.add_argument("--query", required=True)
    cl.add_argument("--by", default="repo")
    cl.add_argument("-k", type=int, default=10)
    cl.add_argument("--mode", default="or", choices=["or", "and"])
    cl.set_defaults(fn=cmd_collapse)

    st = sub.add_parser("sigterms", help="significant terms (JLH) of a "
                                         "query's match set vs the corpus")
    st.add_argument("--index-dir", required=True)
    st.add_argument("--query", required=True)
    st.add_argument("--mode", default="or", choices=["or", "and"])
    st.add_argument("--top", type=int, default=20)
    st.add_argument("--min-fg-df", type=int, default=2)
    st.set_defaults(fn=cmd_sigterms)

    hb = sub.add_parser("hybrid", help="RRF fusion of BM25 and "
                                       "embedding-cosine rankings")
    hb.add_argument("--index-dir", required=True)
    hb.add_argument("--query", required=True)
    hb.add_argument("--emb", required=True,
                    help="embeddings parquet (vec_id, embedding)")
    hb.add_argument("--qvec-id", type=int, default=0,
                    help="vec_id whose embedding is the query vector")
    hb.add_argument("-k", type=int, default=10)
    hb.add_argument("--window", type=int, default=100,
                    help="per-retriever fusion window")
    hb.set_defaults(fn=cmd_hybrid)

    ck = sub.add_parser("chunk", help="overlapping token-window chunks "
                                      "of a documents parquet")
    ck.add_argument("--docs", required=True)
    ck.add_argument("--out", required=True)
    ck.add_argument("--size", type=int, default=128)
    ck.add_argument("--overlap", type=int, default=0)
    ck.add_argument("--text-col", default="text")
    ck.add_argument("--id-col", default="doc_id")
    ck.set_defaults(fn=cmd_chunk)

    sm = sub.add_parser("sample", help="deterministic stratified sampling "
                                       "+ train/val/test splits")
    sm.add_argument("--docs", required=True)
    sm.add_argument("--out", required=True)
    sm.add_argument("--rates", default=None,
                    help='JSON {"source_value": rate, ...}')
    sm.add_argument("--strata-col", default="source")
    sm.add_argument("--id-col", default="doc_id")
    sm.add_argument("--default-rate", type=float, default=1.0)
    sm.set_defaults(fn=cmd_sample)

    cc = sub.add_parser("cluster", help="transitive duplicate clusters "
                                        "(connected components over "
                                        "near-dup pairs)")
    cc.add_argument("--docs", required=True)
    cc.add_argument("--out", required=True)
    cc.add_argument("--n", type=int, default=3)
    cc.add_argument("--threshold", type=float, default=0.5)
    cc.add_argument("--text-col", default="text")
    cc.add_argument("--id-col", default="doc_id")
    cc.set_defaults(fn=cmd_cluster)

    kn = sub.add_parser("knn", help="vector search: exact / filtered / "
                                    "ivf / sq8 / pq-adc / binary-hamming "
                                    "/ mmr-diversified top-k")
    kn.add_argument("--emb", required=True,
                    help="embeddings parquet (vec_id, embedding, ...)")
    kn.add_argument("--query-id", type=int, default=0,
                    help="vec_id whose embedding is the query")
    kn.add_argument("-k", type=int, default=10)
    kn.add_argument("--method", default="exact",
                    choices=["exact", "ivf", "sq", "pq", "ivfpq",
                             "binary", "mmr", "mrl"])
    kn.add_argument("--filter", help="SQL predicate over the embeddings "
                                     "table (pre-filter allow-set), "
                                     "e.g. \"label = 3\"")
    kn.add_argument("--buckets", type=int, default=16)
    kn.add_argument("--nprobe", type=int, default=4)
    kn.add_argument("--m", type=int, default=4,
                    help="pq subspaces")
    kn.add_argument("--codebook-k", type=int, default=16,
                    help="pq centroids per subspace")
    kn.add_argument("--rerank", type=int, default=0,
                    help="exact rerank pool for sq/pq/binary/mrl")
    kn.add_argument("--dim", type=int, default=16,
                    help="truncated prefix dims for --method mrl")
    kn.add_argument("--planes", type=int, default=16,
                    help="SRP planes for --method binary")
    kn.add_argument("--window", type=int, default=50,
                    help="relevance window for --method mmr")
    kn.add_argument("--lam", type=float, default=0.7,
                    help="MMR relevance weight (1.0 = pure relevance)")
    kn.set_defaults(fn=cmd_knn)

    kwp = sub.add_parser("keywords", help="per-doc tf-idf keywords "
                                          "from a built store")
    kwp.add_argument("--index-dir", required=True)
    kwp.add_argument("--top", type=int, default=3)
    kwp.add_argument("--zone")
    kwp.add_argument("--out", help="write parquet instead of printing "
                                   "the first 30 rows")
    kwp.set_defaults(fn=cmd_keywords)

    ct = sub.add_parser("concat", help="append a source store's chunks "
                                       "onto a destination store "
                                       "(addIndexes; doc ids remapped)")
    ct.add_argument("--dst", required=True)
    ct.add_argument("--src", required=True)
    ct.set_defaults(fn=cmd_concat)

    ex = sub.add_parser("expire", help="snapshot retention: delete chunk "
                                       "index data already folded into "
                                       "the merged form")
    ex.add_argument("--index-dir", required=True)
    ex.add_argument("--keep-last", type=int, default=0,
                    help="retain the newest K chunks' index data "
                         "(time-travel floor)")
    ex.set_defaults(fn=cmd_expire)

    fk = sub.add_parser("fsck", help="verify store integrity: manifests, "
                                     "stats, blob invariants, artifacts")
    fk.add_argument("--index-dir", required=True)
    fk.add_argument("--sample-rows", type=int, default=64)
    fk.set_defaults(fn=cmd_fsck)

    gp = sub.add_parser("grep", help="trigram-indexed substring/regex "
                                     "search over raw text (byte-exact)")
    gp.add_argument("--docs", required=True)
    gp.add_argument("--regex", action="store_true")
    gp.add_argument("--no-index", action="store_true",
                    help="skip the trigram candidate gate (full scan)")
    gp.add_argument("--lines", action="store_true",
                    help="grep -n output: (doc_id, line_no, line) per "
                         "matching line")
    gp.add_argument("-k", type=int, default=50)
    gp.add_argument("pattern")
    gp.set_defaults(fn=cmd_grep)

    sy = sub.add_parser("symbols", help="ctags-lite symbol extraction / "
                                        "kind-weighted symbol search")
    sy.add_argument("--docs", required=True)
    sy.add_argument("--text-col", default="text", dest="text_col")
    sy.add_argument("--query", default=None,
                    help="rank docs by symbol-definition matches "
                         "(omit to list extracted symbols)")
    sy.add_argument("--prefix", action="store_true",
                    help="prefix symbol matching (go-to-symbol style)")
    sy.add_argument("-k", type=int, default=50)
    sy.set_defaults(fn=cmd_symbols)

    ds = sub.add_parser("dsir", help="DSIR importance log-weights: rank "
                                     "raw docs by target-likeness")
    ds.add_argument("--docs", required=True)
    ds.add_argument("--target", required=True,
                    help="target-domain documents parquet")
    ds.add_argument("--out", required=True)
    ds.add_argument("--buckets", type=int, default=64)
    ds.add_argument("--alpha", type=float, default=1.0)
    ds.set_defaults(fn=cmd_dsir)

    lm = sub.add_parser("lmscore", help="bigram-LM cross-entropy per doc "
                                        "(CCNet-style quality gate)")
    lm.add_argument("--docs", required=True)
    lm.add_argument("--out", required=True)
    lm.add_argument("--reference", default=None,
                    help="trusted training corpus parquet (default: "
                         "self-trained)")
    lm.add_argument("--alpha", type=float, default=1.0)
    lm.add_argument("--text-col", default="text")
    lm.add_argument("--id-col", default="doc_id")
    lm.set_defaults(fn=cmd_lmscore)

    pr = sub.add_parser("pagerank", help="PageRank centrality over the "
                                         "similarity graph")
    pr.add_argument("--docs", required=True)
    pr.add_argument("--out", required=True)
    pr.add_argument("--n", type=int, default=3)
    pr.add_argument("--threshold", type=float, default=0.2)
    pr.add_argument("--damping", type=float, default=0.85)
    pr.add_argument("--iters", type=int, default=5)
    pr.add_argument("--text-col", default="text")
    pr.add_argument("--id-col", default="doc_id")
    pr.set_defaults(fn=cmd_pagerank)

    geo = sub.add_parser("geo", help="geo_distance top-k / geohash_grid "
                                     "aggregation over a points parquet")
    geo.add_argument("--points", required=True)
    geo.add_argument("--near", help="query point as 'lat,lon'")
    geo.add_argument("--radius", type=float, default=None,
                     help="max distance in km for --near")
    geo.add_argument("--grid", type=int, default=None,
                     help="geohash_grid precision (1..12)")
    geo.add_argument("--k", type=int, default=10)
    geo.add_argument("--lat-col", default="lat")
    geo.add_argument("--lon-col", default="lon")
    geo.add_argument("--id-col", default="doc_id")
    geo.set_defaults(fn=cmd_geo)

    ig = sub.add_parser("ingest", help="normalize warc/jsonl/csv/text/"
                                       "parquet corpora to documents "
                                       "parquet")
    ig.add_argument("--path", required=True)
    ig.add_argument("--out", required=True)
    ig.add_argument("--format", default="jsonl",
                    choices=["warc", "jsonl", "csv", "text", "parquet"])
    ig.add_argument("--text-field", default="text")
    ig.add_argument("--key-field", default="id")
    ig.set_defaults(fn=cmd_ingest)

    xr = sub.add_parser("export-ref", help="serialize shards in the "
                        "reference chunk grammar")
    xr.add_argument("--corpus", required=True)
    xr.add_argument("--out", required=True)
    xr.add_argument("--shard-size", type=int, default=4096)
    xr.add_argument("--no-stem", action="store_true")
    xr.add_argument("--tag", default="index_spark")
    xr.add_argument("--documents-table", action="store_true")
    xr.set_defaults(fn=cmd_export_ref)

    sv = sub.add_parser("serve", help="in-memory replica point query "
                        "(no Spark job per query)")
    sv.add_argument("--corpus")
    sv.add_argument("--snapshot", help="boot from a replica .npz "
                    "snapshot (numpy-only, no Spark)")
    sv.add_argument("--save-snapshot", help="after building, publish "
                    "the replica snapshot here")
    sv.add_argument("--query", required=True)
    sv.add_argument("-k", type=int, default=10)
    sv.add_argument("--shard-size", type=int, default=4096)
    sv.add_argument("--champion-m", type=int, default=None)
    sv.add_argument("--no-stem", action="store_true")
    sv.add_argument("--bench", type=int, default=1,
                    help="repeat the query N times, report mean ms")
    sv.add_argument("--documents-table", action="store_true")
    sv.set_defaults(fn=cmd_serve)

    ex = sub.add_parser("export", help="export documents parquet to "
                                       "jsonl/csv/warc")
    ex.add_argument("--docs", required=True)
    ex.add_argument("--out", required=True)
    ex.add_argument("--format", default="jsonl",
                    choices=["jsonl", "csv", "warc", "parquet"])
    ex.add_argument("--docs-per-file", type=int, default=50)
    ex.set_defaults(fn=cmd_export)

    mx = sub.add_parser("mix", help="rebalance corpus to target domain "
                                    "proportions (downsample-only)")
    mx.add_argument("--docs", required=True)
    mx.add_argument("--out", required=True)
    mx.add_argument("--targets",
                    help='JSON {"source_value": share, ...} '
                         '(required unless --alpha)')
    mx.add_argument("--alpha", type=float,
                    help="temperature sampling instead of explicit "
                         "targets: shares proportional to n^alpha")
    mx.add_argument("--strata-col", default="source")
    mx.add_argument("--id-col", default="doc_id")
    mx.set_defaults(fn=cmd_mix)

    pl = sub.add_parser("pipeline", help="end-to-end curation pipeline: "
                                         "gates -> near-dup clusters -> "
                                         "LM gate -> mixture -> splits "
                                         "(-> index store)")
    pl.add_argument("--docs", required=True,
                    help="canonical documents parquet (run `ingest` "
                         "first for other formats)")
    pl.add_argument("--workdir", required=True)
    pl.add_argument("--min-tokens", type=int, default=5)
    pl.add_argument("--lm-quantile", type=float, default=None,
                    help="drop docs above this xent quantile (e.g. 0.95)")
    pl.add_argument("--targets", default=None,
                    help='JSON {"source_value": share, ...}')
    pl.add_argument("--build-index", action="store_true")
    pl.add_argument("--shard-size", type=int, default=1024)
    pl.set_defaults(fn=cmd_pipeline)

    cf = sub.add_parser("classify", help="train + apply a hashed-BoW "
                                         "logreg quality classifier")
    cf.add_argument("--docs", required=True)
    cf.add_argument("--labels", required=True,
                    help="parquet (doc_id, y) with y in {0,1}")
    cf.add_argument("--out", required=True)
    cf.add_argument("--dim", type=int, default=4096)
    cf.add_argument("--iters", type=int, default=8)
    cf.add_argument("--lr", type=float, default=1.0)
    cf.add_argument("--text-col", default="text")
    cf.add_argument("--id-col", default="doc_id")
    cf.set_defaults(fn=cmd_classify)

    bp = sub.add_parser("bpe", help="BPE tokenizer-vocabulary induction "
                                    "(+ optional corpus tokenization)")
    bp.add_argument("--docs", required=True)
    bp.add_argument("--out", required=True)
    bp.add_argument("--merges", type=int, default=32)
    bp.add_argument("--tokenize", action="store_true")
    bp.add_argument("--text-col", default="text")
    bp.add_argument("--id-col", default="doc_id")
    bp.set_defaults(fn=cmd_bpe)

    be = sub.add_parser("bench", help="headline benchmark suite")
    be.set_defaults(fn=cmd_bench)

    pk = sub.add_parser("package", help="zip index_spark for --py-files")
    pk.add_argument("--out", default="index_spark.zip")
    pk.set_defaults(fn=cmd_package)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
