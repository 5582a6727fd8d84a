"""Percolation (prospective search / document routing): match INCOMING
documents against a STANDING query set — the dual of the index. A web
crawler/alerting pipeline routes each new doc to the saved searches it
satisfies (the Elasticsearch-percolator / Google-Alerts shape); the
reference's analog surface is its add-time document walk
(/root/reference/index.cpp:112-158), here re-pointed at queries instead
of posting lists.

Scale shape: the standing query set is BOUNDED (it broadcasts); incoming
docs are unbounded. One fused Arrow pass (``doc_term_counts``) turns the
batch into (doc_id, term, tf); a pushed ``isin`` on the query VOCABULARY
drops every non-query term before anything shuffles; the match test is
one map-side-combinable aggregate over (query_id, doc_id). Conjunctive
queries use the count(DISTINCT term)=n_terms gate; disjunctive queries
match on any overlap.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from index_spark.functions.text import tokenize
from index_spark.operators.build import doc_term_counts

PERC_COLS = ["query_id", "doc_id"]


def _query_relation(spark: SparkSession, queries: dict[int, str],
                    stem: bool, camel: bool):
    """(query_id, term, n_terms) rows + the distinct vocabulary."""
    rows = []
    for qid, q in queries.items():
        terms = sorted(set(tokenize(q, stem=stem, camel=camel)))
        for t in terms:
            rows.append((int(qid), t, len(terms)))
    if not rows:
        return None, []
    vocab = sorted({t for _, t, _ in rows})
    return (spark.createDataFrame(rows, "query_id long, term string, "
                                        "n_terms int"), vocab)


def percolate(corpus_with_ids: DataFrame, queries: dict[int, str],
              mode: str = "and", stem: bool = True,
              camel: bool = True) -> DataFrame:
    """All (query_id, doc_id) matches of the standing ``queries`` over
    the given docs. ``mode='and'``: a doc matches iff it contains EVERY
    term of the query; ``'or'``: any term. Rows distinct, unordered
    (aggregate output)."""
    if mode not in ("or", "and"):
        raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
    spark = corpus_with_ids.sparkSession
    qrel, vocab = _query_relation(spark, queries, stem, camel)
    if qrel is None:
        return spark.createDataFrame([], "query_id long, doc_id long")
    toks = (doc_term_counts(corpus_with_ids, stem=stem, camel=camel)
            .filter(F.col("term").isin(vocab))   # query vocab only
            .select("doc_id", "term"))
    joined = toks.join(F.broadcast(qrel), "term")
    if mode == "or":
        return joined.select("query_id", "doc_id").distinct()
    return (joined.groupBy("query_id", "doc_id", "n_terms")
            .agg(F.countDistinct("term").alias("hit"))
            .filter(F.col("hit") == F.col("n_terms"))
            .select("query_id", "doc_id"))


def build_query_postings(standing: DataFrame, stem: bool = True,
                         camel: bool = True) -> DataFrame:
    """Invert a standing-query RELATION (query_id, query) into the
    term -> query posting relation ``(term, query_id, n_terms)`` — the
    percolator's own inverted index, for standing sets far beyond what
    :func:`percolate`'s driver-side dict can carry (10^4–10^6 saved
    searches, the Lucene-percolator regime).

    Tokenization runs through the SAME fused Arrow kernel as documents
    (:func:`~index_spark.operators.build.doc_term_counts` — queries are
    just tiny docs), fully distributed: no standing query ever touches
    the driver. Build once per standing-set update and persist/write;
    routing batches then reuse it."""
    qdocs = standing.select(
        F.col("query_id").cast("long").alias("doc_id"),
        F.col("query").alias("content"))
    tc = (doc_term_counts(qdocs, stem=stem, camel=camel)
          .filter(F.col("term") != ""))  # empty-query sentinel rows
    n = tc.groupBy("doc_id").agg(F.count("*").alias("n_terms"))
    return (tc.select("doc_id", "term").join(n, "doc_id")
            .select(F.col("doc_id").alias("query_id"), "term", "n_terms"))


def percolate_inverted(corpus_with_ids: DataFrame,
                       query_postings: DataFrame,
                       mode: str = "and", stem: bool = True,
                       camel: bool = True) -> DataFrame:
    """Route documents against a LARGE standing set via the inverted
    term->query posting relation (:func:`build_query_postings` output):
    candidates = (query, doc) pairs sharing >=1 term — produced by an
    equi-join of the docs' vocabulary against the posting relation,
    never by broadcasting and evaluating every standing query per doc —
    then the count gate verifies conjunctive matches.

    Scale shape: one equi-join on term (AQE broadcasts the posting
    relation when it is actually small; at 10^6 queries it shuffles —
    Spark's runtime Bloom-filter join injection prunes non-query doc
    terms before the exchange), then one map-side-combinable aggregate
    on (query_id, doc_id). No driver-side vocabulary literal appears in
    the plan, unlike the bounded-dict path's pushed ``isin``. A
    ubiquitous standing term skews the term join — standard hygiene is
    dropping stop-terms from OR routing and salting a hot term's query
    list; conjunctive verification is unaffected either way."""
    if mode not in ("or", "and"):
        raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
    toks = (doc_term_counts(corpus_with_ids, stem=stem, camel=camel)
            .select("doc_id", "term"))
    joined = toks.join(query_postings, "term")
    if mode == "or":
        return joined.select("query_id", "doc_id").distinct()
    return (joined.groupBy("query_id", "doc_id", "n_terms")
            .agg(F.countDistinct("term").alias("hit"))
            .filter(F.col("hit") == F.col("n_terms"))
            .select("query_id", "doc_id"))


def percolate_dsl(corpus_with_ids: DataFrame, queries: dict[int, str],
                  stem: bool = True, camel: bool = True) -> DataFrame:
    """Percolation under full web-query syntax: ``+required bare
    -excluded "exact phrase" -"excluded phrase"`` per standing query
    (:func:`query.parse_query`). A doc matches query q iff it contains
    EVERY required term, every quoted phrase consecutively, NO excluded
    term, NO negated phrase, and (when q has no required terms/phrases)
    at least one bare term.

    Term gates are the same single-aggregate shape as :func:`percolate`
    (kind-tagged broadcast relation, vocabulary filter before the
    shuffle, three conditional counts). Phrase gates verify AFTER the
    term gate, on candidate docs only: candidates join back to the
    tokenized docs and the consecutive-run predicate evaluates as a JVM
    higher-order ``exists`` over start indexes — no Python in the plan,
    cost proportional to candidates (phrase terms already gated as
    required, so candidates are docs containing all of them)."""
    from index_spark.operators.query import parse_query

    spark = corpus_with_ids.sparkSession
    rows = []
    positional: dict[int, tuple[list, list]] = {}
    for qid, q in queries.items():
        req, opt, exc, phrases, neg_p = parse_query(q, stem=stem,
                                                    camel=camel)
        if phrases or neg_p:
            # phrase gates verify positionally AFTER term-level matching
            # (phrase terms already gate as required via parse_query, so
            # the positional pass touches candidate docs only; a
            # NEG-phrase constrains candidates without any term filter)
            positional[int(qid)] = (phrases, neg_p)
        for t in req:
            rows.append((int(qid), t, 0, len(req)))
        for t in opt:
            rows.append((int(qid), t, 1, len(req)))
        for t in exc:
            rows.append((int(qid), t, 2, len(req)))
        if not req and not opt and (neg_p or exc):
            # same guard for every 'no candidate selector' shape: a
            # negation-only query (negated phrase OR excluded terms
            # alone) has nothing that selects candidate docs
            raise ValueError(
                f"query {qid}: only negations — nothing selects "
                "candidate docs (add a required/bare term)")
    if not rows:
        return spark.createDataFrame([], "query_id long, doc_id long")
    qrel = spark.createDataFrame(
        rows, "query_id long, term string, kind int, n_req int")
    vocab = sorted({t for _, t, _, _ in rows})
    toks = (doc_term_counts(corpus_with_ids, stem=stem, camel=camel)
            .filter(F.col("term").isin(vocab))
            .select("doc_id", "term"))
    j = toks.join(F.broadcast(qrel), "term")
    agg = (j.groupBy("query_id", "doc_id", "n_req").agg(
        F.countDistinct(F.when(F.col("kind") == 0, F.col("term")))
         .alias("req_hit"),
        F.max(F.when(F.col("kind") == 1, 1).otherwise(0))
         .alias("opt_hit"),
        F.max(F.when(F.col("kind") == 2, 1).otherwise(0))
         .alias("exc_hit")))
    matched = agg.filter(
        (F.col("exc_hit") == 0)
        & (((F.col("n_req") > 0) & (F.col("req_hit") == F.col("n_req")))
           | ((F.col("n_req") == 0) & (F.col("opt_hit") == 1)))) \
        .select("query_id", "doc_id")
    if not positional:
        return matched

    # positional verification, candidate docs only: join the phrase
    # queries' candidates back to the tokenized docs and evaluate the
    # consecutive-run predicate with JVM higher-order functions (exists
    # over a start-index sequence) — no Python in the plan
    from index_spark.operators.build import tokenized_docs

    def _conj_at(tcol, i, ph):
        pred = None
        for off, t in enumerate(ph):
            c = F.get(tcol, i + F.lit(off)) == t  # 0-based, Column index
            pred = c if pred is None else (pred & c)
        return pred

    plain_ids = [q for q in queries if int(q) not in positional]
    out = matched.filter(F.col("query_id").isin(
        [int(q) for q in plain_ids]) if plain_ids else F.lit(False))
    tok = tokenized_docs(corpus_with_ids, stem=stem, camel=camel) \
        .select("doc_id", "tokens")
    def _occurs(ph):
        # guard short docs: sequence(0, -k) would run DESCENDING and the
        # element get would go out of range; a doc shorter than the
        # phrase trivially lacks it. The closure factory keeps the
        # lambda UNARY — F.exists dispatches on lambda arity.
        def pred(i, _ph=tuple(ph)):
            return _conj_at(F.col("tokens"), i, list(_ph))

        return (F.size("tokens") >= len(ph)) & F.exists(
            F.sequence(F.lit(0), F.size("tokens") - len(ph)),
            lambda i: pred(i))

    for qid, (phrases, neg_p) in positional.items():
        cand = matched.filter(F.col("query_id") == qid).join(tok, "doc_id")
        pred = None
        for ph in phrases:
            c = _occurs(ph)
            pred = c if pred is None else (pred & c)
        for ph in neg_p:
            c = ~_occurs(ph)
            pred = c if pred is None else (pred & c)
        out = out.unionByName(
            cand.filter(pred).select("query_id", "doc_id"))
    return out


def percolate_stream(spark: SparkSession, in_dir: str, out_dir: str,
                     schema, queries: dict[int, str] | None = None,
                     mode: str = "and",
                     stem: bool = True, camel: bool = True,
                     trigger_once: bool = True, syntax: str = "plain",
                     query_postings: DataFrame | None = None):
    """readStream(file source) -> foreachBatch(percolate) -> parquet
    append of (query_id, doc_id, repo, path) match records. Returns the
    StreamingQuery. Each micro-batch routes independently (percolation
    is per-document — no cross-batch state, no watermark needed).
    ``syntax='web'`` routes with :func:`percolate_dsl` (+/-/phrases;
    ``mode`` is then ignored). ``query_postings`` (exclusive with
    ``queries``/``syntax``): route each batch through
    :func:`percolate_inverted` against a pre-built (persisted)
    term->query posting relation — the large-standing-set path."""
    if (query_postings is None) == (queries is None):
        raise ValueError("pass exactly one of queries / query_postings")
    stream = spark.readStream.schema(schema).parquet(in_dir)
    matches_dir = os.path.join(out_dir, "matches")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.withColumn(
            "doc_id", F.xxhash64("repo", "path"))  # stable per-key id
        if query_postings is not None:
            m = percolate_inverted(b, query_postings, mode=mode,
                                   stem=stem, camel=camel)
        elif syntax == "web":
            m = percolate_dsl(b, queries, stem=stem, camel=camel)
        else:
            m = percolate(b, queries, mode=mode, stem=stem, camel=camel)
        (m.join(b.select("doc_id", "repo", "path"), "doc_id")
          .select("query_id", "doc_id", "repo", "path")
          .write.mode("append").parquet(matches_dir))

    writer = stream.writeStream.foreachBatch(handle) \
        .option("checkpointLocation",
                os.path.join(out_dir, "_perc_checkpoint"))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
