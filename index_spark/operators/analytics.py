"""Result-set analytics over the inverted index: matching-doc
enumeration, facet counts, hit counting, index-to-postings export, and
co-occurrence term discovery.

These are the layers a web-scale search service stacks ON TOP of top-k
retrieval: "how many hits, split by language?", "which terms co-occur
with X?". The reference snapshot (/root/reference/index.h — posting-list
ISR iteration only) stops at the posting list; everything here is the
Spark-first result-set surface above it.

Scale notes
-----------
* ``matching_docs`` is the shared primitive: term-pruned columnar scan
  -> ONE shard exchange -> per-shard vectorized decode of only the query
  terms' doc streams (never tf/dl/scores — cheaper than scoring), doc
  sets unioned/intersected shard-locally. Shards hold disjoint doc
  ranges, so the output is globally distinct with no extra shuffle.
* ``facet_counts`` joins the match set to the doc-attribute dimension on
  doc_id and aggregates — a standard shuffle join + partial agg that AQE
  handles at any match-set size (the match set is never collected).
* ``related_terms`` works over the exploded postings relation;
  candidate generation is a doc_id equi-join against the seed term's
  postings, aggregated BEFORE any driver-side limit.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from index_spark.functions import varbyte as vb
from index_spark.functions.text import tokenize
from index_spark.operators.build import DOC_MARKER
from index_spark.operators.query import pin_zone

_DOCS_SCHEMA = T.StructType([T.StructField("doc_id", T.LongType(), False)])

_POSTINGS_SCHEMA = T.StructType([
    T.StructField("term", T.StringType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("tf", T.LongType(), False),
])


def matching_docs(index: DataFrame, query: str, mode: str = "or",
                  stem: bool = True, camel: bool = True,
                  zone: str | None = None,
                  _count_only: bool = False) -> DataFrame:
    """Distinct doc_ids matching the query (no scoring).

    ``mode='or'``: docs containing ANY query term; ``'and'``: docs
    containing EVERY query term. Decodes only the doc streams (delta
    cumsum — no tf/dl/blocks), so enumeration is strictly cheaper than
    scoring. A term split across merged doc-range segment rows counts
    once (per-term union across its rows precedes the modal combine).
    """
    if mode not in ("or", "and"):
        raise ValueError(f"mode must be 'or' or 'and', got {mode!r}")
    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    if not qterms:
        return spark.createDataFrame([], _DOCS_SCHEMA)
    index = pin_zone(index, zone)
    if "shard" not in index.columns:
        index = index.withColumn("shard", F.lit(0))
    hits = index.filter(F.col("term").isin(qterms)) \
                .select("shard", "term", "doc_blob")
    n_q = len(qterms)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": np.empty(0, np.int64)})
        per_term: dict[str, list[np.ndarray]] = {}
        for row in pdf.itertuples(index=False):
            docs = np.cumsum(vb.decode(row.doc_blob).astype(np.int64))
            per_term.setdefault(row.term, []).append(docs)
        if mode == "and" and len(per_term) < n_q:
            return empty
        sets = [np.unique(np.concatenate(v)) for v in per_term.values()]
        if not sets:
            return empty
        if mode == "or":
            out = np.unique(np.concatenate(sets))
        else:
            sets.sort(key=len)
            out = sets[0]
            for s in sets[1:]:
                out = np.intersect1d(out, s, assume_unique=True)
                if out.size == 0:
                    break
        if _count_only:
            return pd.DataFrame({"doc_id": np.array([out.size],
                                                    np.int64)})
        return pd.DataFrame({"doc_id": out})

    return hits.groupBy("shard").applyInPandas(fn, schema=_DOCS_SCHEMA)


def hit_count(index: DataFrame, query: str, mode: str = "or",
              stem: bool = True, camel: bool = True,
              zone: str | None = None) -> DataFrame:
    """Single-row (n_hits) total match count — the "about N results"
    number. Same decode as :func:`matching_docs`, but each shard kernel
    emits ONE count row (shards hold disjoint doc ranges, so per-shard
    distinct counts sum exactly) — the kernel output is |shards| rows,
    never the match set itself, before the final tiny sum."""
    m = matching_docs(index, query, mode=mode, stem=stem, camel=camel,
                      zone=zone, _count_only=True)
    return m.agg(F.coalesce(F.sum("doc_id"), F.lit(0)).alias("n_hits"))


def facet_counts(index: DataFrame, doc_meta: DataFrame, query: str,
                 by: str, mode: str = "or", stem: bool = True,
                 camel: bool = True, zone: str | None = None,
                 top: int | None = None) -> DataFrame:
    """Matching-doc counts per value of attribute ``by`` — search-result
    faceting ("hits by language / repo / source").

    ``doc_meta``: (doc_id, <by>, ...) doc-attribute dimension — any
    DataFrame keyed by the build's doc ids (e.g. the ``docs`` output of
    ``build_index`` joined to catalog metadata). The match set joins it
    on doc_id (shuffle join — neither side collects) and aggregates.
    Rows ordered by (n_docs desc, <by> asc); ``top`` bounds the output
    via the TakeOrderedAndProject tail, not a blind collect.
    """
    m = matching_docs(index, query, mode=mode, stem=stem, camel=camel,
                      zone=zone)
    meta = doc_meta.select(F.col("doc_id").cast("long"), F.col(by))
    out = (m.join(meta, "doc_id")
            .groupBy(by).agg(F.count("*").alias("n_docs"))
            .orderBy(F.desc("n_docs"), F.asc(by)))
    return out.limit(top) if top else out


def postings_from_index(index: DataFrame, zone: str | None = None
                        ) -> DataFrame:
    """Decode the blob index back into the exploded (term, doc_id, tf)
    posting relation — the index's logical scan/export path (feeds
    :func:`related_terms`, external analytics, or re-indexing).

    Distributed decode: ``mapInPandas`` over index rows, one output
    chunk per posting-list row, Arrow-batched. The '%' doc-table rows
    are excluded (they are lengths, not terms)."""
    index = pin_zone(index, zone)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                docs = np.cumsum(vb.decode(row.doc_blob).astype(np.int64))
                tfs = vb.decode(row.tf_blob).astype(np.int64)
                yield pd.DataFrame({
                    "term": np.repeat(row.term, docs.size),
                    "doc_id": docs, "tf": tfs})

    return (index.filter(F.col("term") != DOC_MARKER)
            .select("term", "doc_blob", "tf_blob")
            .mapInPandas(fn, schema=_POSTINGS_SCHEMA))


_COOC_SCHEMA = T.StructType([
    T.StructField("term", T.StringType(), False),
    T.StructField("cooc", T.LongType(), False),
])


def related_terms_index(index: DataFrame, seed_term: str, n_docs: int,
                        top: int = 20, min_cooc: int = 2,
                        zone: str | None = None) -> DataFrame:
    """Index-native :func:`related_terms` — the scale path: never
    materializes the exploded postings relation.

    Plan: (1) shards containing the seed term come from a metadata-only
    scan (term-pushed filter, no blob read) and semi-join the index —
    for a RARE seed only its shards' rows ever load; (2) within each
    surviving shard, the seed row's doc stream decodes once and every
    other term row is counted against it by a sorted-merge membership
    test over its own doc stream (a decode bounded by the shard's rows,
    done where the data sits); (3) per-term partial cooc counts SUM
    across shards (disjoint doc ranges), global dfs come from the
    metadata df column (map-side-combined aggregate, no decode), PMI
    ranks, the top cut is a TakeOrderedAndProject."""
    from index_spark.operators.build import DOC_MARKER

    index = pin_zone(index, zone)  # zoned: ONE zone, validated — else a
    # (term, doc) co-occurrence would count once per zone
    if "shard" not in index.columns:
        index = index.withColumn("shard", F.lit(0))
    seed_shards = (index.filter(F.col("term") == seed_term)
                   .select("shard").distinct())
    pool = (index.filter(F.col("term") != DOC_MARKER)
            .select("shard", "term", "doc_blob")
            .join(seed_shards, "shard", "left_semi"))

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        seed_rows = pdf[pdf["term"] == seed_term]
        if not len(seed_rows):
            return pd.DataFrame({"term": [], "cooc": []})
        seed = np.unique(np.concatenate([
            np.cumsum(vb.decode(b).astype(np.int64))
            for b in seed_rows["doc_blob"]]))
        terms, coocs = [], []
        for row in pdf.itertuples(index=False):
            if row.term == seed_term:
                continue
            docs = np.cumsum(vb.decode(row.doc_blob).astype(np.int64))
            idx = np.searchsorted(seed, docs)
            idx[idx >= seed.size] = seed.size - 1
            c = int((seed[idx] == docs).sum())
            if c:
                terms.append(row.term)
                coocs.append(c)
        return pd.DataFrame({"term": terms,
                             "cooc": np.asarray(coocs, np.int64)})

    cooc = (pool.groupBy("shard").applyInPandas(fn, _COOC_SCHEMA)
            .groupBy("term").agg(F.sum("cooc").alias("cooc"))
            .filter(F.col("cooc") >= min_cooc))
    dfs = (index.filter(F.col("term") != DOC_MARKER)
           .groupBy("term").agg(F.sum("df").alias("df")))
    df_seed = F.broadcast(dfs.filter(F.col("term") == seed_term)
                          .select(F.col("df").alias("df_seed")))
    out = (cooc.join(dfs, "term").crossJoin(df_seed)
           .withColumn("pmi", F.round(
               F.log(F.col("cooc") * F.lit(float(n_docs))
                     / (F.col("df_seed") * F.col("df"))), 6))
           .select("term", "cooc", "df", "pmi")
           .orderBy(F.desc("pmi"), F.desc("cooc"), F.asc("term")))
    return out.limit(top)


def top_bigrams(corpus_with_ids: DataFrame, top: int = 20,
                min_docs: int = 2, stem: bool = True,
                camel: bool = True,
                text_col: str = "content") -> DataFrame:
    """Corpus-wide adjacent-token-pair statistics — the phrase-mining
    pass of a training-data pipeline (collocation discovery, phrase
    vocabulary induction).

    Returns (bigram, n_occurrences, n_docs), ordered by
    (n_occurrences desc, bigram asc), top cut, pairs in fewer than
    ``min_docs`` docs dropped. Plan: one Arrow tokenize pass, then the
    bigram explode happens JVM-side (``transform`` over the token
    indexes + ``explode``) feeding a single map-side-combinable
    aggregate — no Python beyond the tokenizer, one shuffle."""
    from index_spark.operators.build import tokenized_docs

    toks = tokenized_docs(corpus_with_ids, stem=stem, camel=camel,
                          text_col=text_col)
    # outer explode: plain explode's inferred size-filter would inline
    # the bigram transform (tokens inside the lambda) and re-evaluate
    # it per element — O(tokens^2) per doc
    pairs = (toks.select(
        "doc_id",
        F.explode_outer(F.when(F.size("tokens") >= 2, F.transform(
            F.sequence(F.lit(0), F.size("tokens") - 2),
            lambda i: F.concat_ws(" ", F.get("tokens", i),
                                  F.get("tokens", i + F.lit(1)))
        )).otherwise(F.array())).alias("bigram"))
        .filter(F.col("bigram").isNotNull()))
    out = (pairs.groupBy("bigram")
           .agg(F.count("*").alias("n_occurrences"),
                F.countDistinct("doc_id").alias("n_docs"))
           .filter(F.col("n_docs") >= min_docs)
           .orderBy(F.desc("n_occurrences"), F.asc("bigram")))
    return out.limit(top)


def index_report(index: DataFrame, zone: str | None = None) -> DataFrame:
    """One-row operational health report of an index — the numbers an
    on-call engineer checks after every build/merge/vacuum: term and
    row counts, posting totals, per-component blob bytes, and shard
    skew (max/avg postings per shard). Metadata-only aggregates — no
    blob ever decodes; the blob-length sums read the binary columns'
    lengths inside the scan.

    Columns: n_terms, n_rows, n_postings, n_docs, total_tokens,
    doc_bytes, tf_bytes, dl_bytes, pos_bytes, n_shards,
    max_shard_postings, avg_shard_postings, bytes_per_posting."""
    from index_spark.operators.build import DOC_MARKER

    # zoned indexes carry one '%' doc-table row set PER ZONE — summing
    # across zones would overcount n_docs/total_tokens; pin one
    # (validated, default body)
    index = pin_zone(index, zone)
    if "shard" not in index.columns:
        index = index.withColumn("shard", F.lit(0))
    has_pos = "pos_blob" in index.columns
    pos_len = (F.sum(F.length(F.coalesce(F.col("pos_blob"),
                                         F.lit(b""))))
               if has_pos else F.lit(0))
    body = index.filter(F.col("term") != DOC_MARKER)
    marker = index.filter(F.col("term") == DOC_MARKER).agg(
        F.sum("df").alias("n_docs"), F.sum("cf").alias("total_tokens"))
    shard_p = (body.groupBy("shard")
               .agg(F.sum("df").alias("p"))
               .agg(F.count("*").alias("n_shards"),
                    F.max("p").alias("max_shard_postings"),
                    F.round(F.avg("p"), 2).alias("avg_shard_postings")))
    totals = body.agg(
        F.countDistinct("term").alias("n_terms"),
        F.count("*").alias("n_rows"),
        F.sum("df").alias("n_postings"),
        F.sum(F.length("doc_blob")).alias("doc_bytes"),
        F.sum(F.length("tf_blob")).alias("tf_bytes"),
        F.sum(F.length("dl_blob")).alias("dl_bytes"),
        pos_len.alias("pos_bytes"))
    out = totals.crossJoin(marker).crossJoin(shard_p)
    return out.withColumn(
        "bytes_per_posting",
        F.round((F.col("doc_bytes") + F.col("tf_bytes")
                 + F.col("dl_bytes")) / F.col("n_postings"), 3))


def related_terms(postings: DataFrame, seed_term: str, n_docs: int,
                  top: int = 20, min_cooc: int = 2) -> DataFrame:
    """Terms co-occurring with ``seed_term``, ranked by PMI.

    ``postings``: the (term, doc_id, tf) relation — either raw build
    postings or :func:`postings_from_index` output. For every other term
    t, over documents:

        cooc(t)  = |docs containing both seed and t|
        pmi(t)   = ln( cooc * N / (df_seed * df_t) )      [N = n_docs]

    returned as (term, cooc, df, pmi), pmi desc / cooc desc / term asc,
    ``cooc >= min_cooc`` (singleton co-occurrence is noise at any scale).

    Plan: seed doc list (one filtered scan) equi-joins the postings
    relation on doc_id — candidate generation proportional to the seed
    term's corpus footprint, not the corpus; df comes from a map-side
    combined aggregate joined back on term. No driver-side collection;
    the top cut is a TakeOrderedAndProject."""
    seed_docs = (postings.filter(F.col("term") == seed_term)
                 .select("doc_id"))
    dfs = postings.groupBy("term").agg(F.count("*").alias("df"))
    df_seed = F.broadcast(dfs.filter(F.col("term") == seed_term)
                          .select(F.col("df").alias("df_seed")))
    cooc = (postings.join(seed_docs, "doc_id")
            .filter(F.col("term") != seed_term)
            .groupBy("term").agg(F.count("*").alias("cooc"))
            .filter(F.col("cooc") >= min_cooc))
    out = (cooc.join(dfs, "term").crossJoin(df_seed)
           .withColumn("pmi", F.round(
               F.log(F.col("cooc") * F.lit(float(n_docs))
                     / (F.col("df_seed") * F.col("df"))), 6))
           .select("term", "cooc", "df", "pmi")
           .orderBy(F.desc("pmi"), F.desc("cooc"), F.asc("term")))
    return out.limit(top)


STYLE_HIST_SCHEMA = T.StructType([
    T.StructField("term", T.StringType(), False),
    T.StructField("style", T.IntegerType(), False),
    T.StructField("n_occurrences", T.LongType(), False),
])


def style_histogram(index: DataFrame, style_shift: int = 2,
                    zone: str | None = None) -> DataFrame:
    """Per-term style histogram of a STYLED positional index
    (``build_zoned_index(style_spans=...)``): (term, style,
    n_occurrences) for every style code present, the ranking signal the
    reference's 2-bit channel exists for (Heading/Bold hits weigh more;
    /root/reference/index.h:44-60).

    Shape: term-pruned columnar scan of (term, pos_blob) only — doc/tf
    blobs never decode — then a per-partition vectorized unpack
    (low ``style_shift`` bits of each varbyte value) + bincount, then
    one map-side-combinable aggregate over (term, style). Output is
    vocabulary-bounded."""
    from index_spark.functions import varbyte as vb
    from index_spark.operators.build import DOC_MARKER
    from index_spark.operators.query import pin_zone

    idx = pin_zone(index, zone).filter(F.col("term") != DOC_MARKER)
    mask = (1 << style_shift) - 1
    n_codes = 1 << style_shift

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            terms, styles, counts = [], [], []
            for row in pdf.itertuples(index=False):
                blob = bytes(row.pos_blob)
                if not blob:
                    continue
                codes = vb.decode(blob).astype(np.int64) & mask
                c = np.bincount(codes, minlength=n_codes)
                nz = np.flatnonzero(c)
                terms.extend([row.term] * nz.size)
                styles.extend(nz.tolist())
                counts.extend(c[nz].tolist())
            yield pd.DataFrame({"term": terms,
                                "style": np.asarray(styles, np.int32),
                                "n_occurrences": np.asarray(counts,
                                                            np.int64)})

    part = idx.select("term", "pos_blob").mapInPandas(
        fn, schema=STYLE_HIST_SCHEMA)
    return (part.groupBy("term", "style")
            .agg(F.sum("n_occurrences").alias("n_occurrences"))
            .orderBy("term", "style"))


def significant_terms(index: DataFrame, fg_docs: DataFrame, n_docs: int,
                      top: int = 20, min_fg_df: int = 2,
                      zone: str | None = None,
                      shard_size: int | None = None,
                      heuristic: str = "jlh") -> DataFrame:
    """Significant-terms aggregation: terms overrepresented in a
    FOREGROUND document set relative to the whole corpus, ranked by the
    JLH score Elasticsearch uses for the same aggregation:

        fg_pct = fg_df / n_fg          bg_pct = df / n_docs
        jlh    = (fg_pct - bg_pct) * (fg_pct / bg_pct)

    (the absolute-lift x relative-lift product — high-frequency noise
    is damped by the first factor, rare-term noise by ``min_fg_df``).

    ``heuristic`` selects the ES scoring heuristic — "jlh" (default,
    score column ``jlh``), "chi_square" (column ``chi2``) or
    "mutual_information" (column ``mi``). The latter two build the
    2x2 contingency table with ES's ``background_is_superset``
    adjustment (the foreground counts are subtracted from the
    background so the cells are disjoint):

        n11 = fg_df              n10 = n_fg - fg_df
        n01 = df - fg_df         n00 = (N - n_fg) - n01
        chi2 = N * (n11*n00 - n10*n01)^2
               / ((n11+n01)(n11+n10)(n10+n00)(n01+n00))   [0 if a
                                                           margin is 0]
        mi   = sum over cells of (nxy/N) * log2(N*nxy / (rx * cy)),
               zero-count cells contributing 0

    Both are pure row-local arithmetic over the same (fg_df, df) join —
    the plan is heuristic-independent.

    ``fg_docs``: a (doc_id) relation defining the foreground — a query
    match set (:func:`matching_docs`), a metadata filter, a classifier
    verdict. Returns (term, fg_df, df, jlh), jlh desc / term asc.

    Plan: global df comes from the index's df METADATA column (map-side
    combined sum, no blob decode). Foreground term counts decode only
    posting rows that can contain foreground docs: with ``shard_size``
    given (sharded index), the foreground's doc-range shard ids
    semi-join the index scan first, so a foreground clustered in few
    shards never decodes the rest of the corpus; the decoded (term,
    doc_id) stream then inner-joins the foreground relation — an
    equi-join on doc_id that AQE can broadcast when the foreground is
    small. fg counts and the df join are both partial-agg friendly; the
    top cut is a TakeOrderedAndProject of ``top`` rows.
    """
    idx = pin_zone(index, zone)
    terms_meta = (idx.filter(F.col("term") != DOC_MARKER)
                  .groupBy("term").agg(F.sum("df").alias("df")))
    pool = idx
    if shard_size is not None and "shard" in idx.columns:
        fg_shards = fg_docs.select(
            F.floor(F.col("doc_id") / shard_size).cast("long")
            .alias("shard")).distinct()
        pool = idx.join(fg_shards, "shard", "left_semi")
    posts = postings_from_index(pool)  # pool is already zone-pinned
    fg = fg_docs.select(F.col("doc_id").cast("long").alias("doc_id")) \
                .distinct()
    n_fg = fg.count()
    if n_fg == 0:
        raise ValueError("empty foreground")
    fg_df = (posts.join(fg, "doc_id")
             .groupBy("term").agg(F.count("*").alias("fg_df"))
             .filter(F.col("fg_df") >= min_fg_df))
    joined = fg_df.join(terms_meta, "term")
    if heuristic == "jlh":
        fg_pct = F.col("fg_df") / F.lit(float(n_fg))
        bg_pct = F.col("df") / F.lit(float(n_docs))
        score = (fg_pct - bg_pct) * (fg_pct / bg_pct)
        col = "jlh"
    elif heuristic in ("chi_square", "mutual_information"):
        if n_fg > n_docs:
            raise ValueError(
                f"n_docs ({n_docs}) must cover the foreground "
                f"({n_fg} docs): the background must be a superset")
        n = F.lit(float(n_docs))
        n11 = F.col("fg_df").cast("double")
        n10 = F.lit(float(n_fg)) - n11
        n01 = F.col("df").cast("double") - n11
        n00 = (n - F.lit(float(n_fg))) - n01
        # background-is-superset row guards (the ES contract): an
        # n_docs inconsistent with the df relation (e.g. a pinned-zone
        # doc count against all-zone dfs) drives contingency cells
        # negative — chi2 then scores 0 or garbage silently and MI
        # takes log of a negative — fail loudly instead
        n01 = F.when(n01 < 0, F.raise_error(F.concat(
            F.lit("term '"), F.col("term"),
            F.lit("' has df < fg_df: foreground and background "
                  "df come from different corpora")))) \
            .otherwise(n01)
        n00 = F.when(n00 < 0, F.raise_error(F.concat(
            F.lit("term '"), F.col("term"),
            F.lit(f"' has n_fg + df - fg_df > n_docs ({n_docs}): "
                  "n_docs does not cover the background corpus")))) \
            .otherwise(n00)
        if heuristic == "chi_square":
            denom = (n11 + n01) * (n11 + n10) * (n10 + n00) * (n01 + n00)
            score = F.when(
                denom > 0,
                n * F.pow(n11 * n00 - n10 * n01, 2) / denom) \
                .otherwise(F.lit(0.0))
            col = "chi2"
        else:
            r1, r0 = n11 + n10, n01 + n00
            c1, c0 = n11 + n01, n10 + n00

            def cell(nxy, rm, cm):
                return F.when(nxy > 0, (nxy / n)
                              * F.log2(n * nxy / (rm * cm))) \
                        .otherwise(F.lit(0.0))

            score = cell(n11, r1, c1) + cell(n10, r1, c0) \
                + cell(n01, r0, c1) + cell(n00, r0, c0)
            col = "mi"
    else:
        raise ValueError(f"unknown heuristic: {heuristic!r}")
    return (joined
            .withColumn(col, F.round(score, 6))
            .select("term", "fg_df", "df", col)
            .orderBy(F.desc(col), F.asc("term"))
            .limit(top))


def facet_histogram(index: DataFrame, doc_meta: DataFrame, query: str,
                    by: str, bucket_width: float, mode: str = "or",
                    stem: bool = True, camel: bool = True,
                    zone: str | None = None) -> DataFrame:
    """Numeric histogram facet over the match set (Elasticsearch
    ``histogram`` aggregation): matching docs bucketed by
    ``floor(<by> / bucket_width) * bucket_width``.

    Same plan as :func:`facet_counts` — match-set decode, doc_id
    equi-join to the attribute dimension, map-side-combinable count —
    with the bucket key computed in codegen. Returns (bucket, n_docs)
    ordered by bucket; empty buckets are absent (the standard sparse
    histogram — densify client-side if a chart needs zeros)."""
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    m = matching_docs(index, query, mode=mode, stem=stem, camel=camel,
                      zone=zone)
    meta = doc_meta.select(F.col("doc_id").cast("long"),
                           (F.floor(F.col(by) / bucket_width)
                            * F.lit(bucket_width)).alias("bucket"))
    return (m.join(meta, "doc_id")
            .groupBy("bucket").agg(F.count("*").alias("n_docs"))
            .orderBy("bucket"))


def facet_stats(index: DataFrame, doc_meta: DataFrame, query: str,
                value: str, by: str | None = None, mode: str = "or",
                stem: bool = True, camel: bool = True,
                zone: str | None = None) -> DataFrame:
    """Metric aggregation over the match set (Elasticsearch ``stats``
    aggregation): count/min/max/avg/sum of numeric attribute ``value``
    across the docs matching the query, optionally grouped by category
    ``by`` (``stats`` inside a ``terms`` bucket).

    Same plan family as :func:`facet_counts` — match-set decode, doc_id
    equi-join to the attribute dimension, one map-side-combinable
    aggregate. Output is one row (``by=None``) or one row per group,
    ordered by group key; every statistic is a partial-combinable
    aggregate, so the plan is two exchanges total (match-set join +
    final agg) regardless of match-set size."""
    m = matching_docs(index, query, mode=mode, stem=stem, camel=camel,
                      zone=zone)
    cols = [F.col("doc_id").cast("long"), F.col(value).alias("_v")]
    if by is not None:
        cols.append(F.col(by))
    joined = m.join(doc_meta.select(*cols), "doc_id")
    aggs = [F.count("*").alias("n_docs"),
            F.min("_v").alias("min_value"),
            F.max("_v").alias("max_value"),
            F.round(F.avg("_v"), 4).alias("avg_value"),
            F.sum("_v").alias("sum_value")]
    if by is None:
        return joined.agg(*aggs)
    return joined.groupBy(by).agg(*aggs).orderBy(by)


def sort_search(index: DataFrame, doc_meta: DataFrame, query: str,
                by: str, k: int = 10, ascending: bool = False,
                mode: str = "or", stem: bool = True, camel: bool = True,
                zone: str | None = None) -> DataFrame:
    """Top-k matching docs ordered by a document ATTRIBUTE instead of
    relevance (Lucene/ES ``sort`` — "newest matching", "longest
    matching"). Returns (doc_id, <by>).

    Scoring is skipped entirely (the ES contract when a sort replaces
    ``_score``): the match set enumerates via the cheap doc-stream
    decode (:func:`matching_docs`), joins the attribute dimension on
    doc_id, and the global cut compiles to ``TakeOrderedAndProject`` —
    each task keeps a k-row heap over its slice of the match set and
    the driver merges k rows per task, so a billion-doc match set
    never sorts fully or collects. Ties break by doc_id ascending for
    a deterministic page."""
    m = matching_docs(index, query, mode=mode, stem=stem, camel=camel,
                      zone=zone)
    meta = doc_meta.select(F.col("doc_id").cast("long"), F.col(by))
    order = [F.asc(by) if ascending else F.desc(by), F.asc("doc_id")]
    return m.join(meta, "doc_id").orderBy(*order).limit(k)


_TV_SCHEMA = T.StructType([
    T.StructField("term", T.StringType(), False),
    T.StructField("tf", T.LongType(), False),
])


def term_vector(index: DataFrame, doc_id: int,
                shard_size: int = 4096) -> DataFrame:
    """One document's (term, tf) vector — the Elasticsearch
    ``termvectors`` API / the index's per-doc export.

    Point-lookup plan: the doc's doc-range shard id is arithmetic
    (``doc_id // shard_size``), so the scan prunes to ONE shard's rows
    before any blob decode; within the shard each term row binary-
    searches its decoded doc stream for the target (vectorized
    ``searchsorted``), decoding tf only at the hit position. Cost is
    one shard's posting rows at any corpus scale. For a merged
    (shard-less) index every segment row covering the doc's range is
    scanned instead — still bounded by segment fan-out, not corpus
    size."""
    did = int(doc_id)
    if "shard" in index.columns:
        pool = index.filter(F.col("shard") == did // shard_size)
    else:
        pool = index
    pool = pool.filter(F.col("term") != DOC_MARKER) \
               .select("term", "doc_blob", "tf_blob")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            terms, tfs = [], []
            for row in pdf.itertuples(index=False):
                docs = np.cumsum(vb.decode(row.doc_blob).astype(np.int64))
                i = int(np.searchsorted(docs, did))
                if i < docs.size and docs[i] == did:
                    tf = int(vb.decode(row.tf_blob)[i])
                    terms.append(row.term)
                    tfs.append(tf)
            yield pd.DataFrame({"term": terms,
                                "tf": np.asarray(tfs, np.int64)})

    return (pool.mapInPandas(fn, schema=_TV_SCHEMA)
            .groupBy("term").agg(F.sum("tf").alias("tf"))
            .orderBy("term"))


_MTV_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("term", T.StringType(), False),
    T.StructField("tf", T.LongType(), False),
])


def multi_term_vectors(index: DataFrame, doc_ids: list[int],
                       shard_size: int = 4096) -> DataFrame:
    """(doc_id, term, tf) vectors for a BOUNDED driver-known doc set —
    the batch form of :func:`term_vector` (relevance-feedback term
    harvesting, multi-doc termvectors API).

    Same point-lookup plan, one pass for all targets: the scan prunes
    to the targets' doc-range shards (|targets| shard ids, pushed as a
    literal IN), and each posting row binary-searches its decoded doc
    stream for ALL targets at once (one vectorized ``searchsorted``
    per row), decoding tfs only at hit positions. Cost is the targets'
    shards' posting rows at any corpus scale."""
    ids = sorted({int(d) for d in doc_ids})
    spark = index.sparkSession
    if not ids:
        return spark.createDataFrame([], _MTV_SCHEMA)
    if "shard" in index.columns:
        shards = sorted({d // shard_size for d in ids})
        pool = index.filter(F.col("shard").isin(shards))
    else:
        pool = index
    pool = pool.filter(F.col("term") != DOC_MARKER) \
               .select("term", "doc_blob", "tf_blob")
    targets = np.asarray(ids, np.int64)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                docs = np.cumsum(vb.decode(row.doc_blob).astype(np.int64))
                pos = np.searchsorted(docs, targets)
                ok = pos < docs.size
                ok[ok] = docs[pos[ok]] == targets[ok]
                if ok.any():
                    tfs = vb.decode(row.tf_blob).astype(np.int64)
                    out.append(pd.DataFrame({
                        "doc_id": targets[ok],
                        "term": np.repeat(row.term, int(ok.sum())),
                        "tf": tfs[pos[ok]]}))
            if out:
                yield pd.concat(out, ignore_index=True)

    return (pool.mapInPandas(fn, schema=_MTV_SCHEMA)
            .groupBy("doc_id", "term").agg(F.sum("tf").alias("tf")))


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", top_n: int = 2,
                     dup_n: int = 5) -> DataFrame:
    """Per-document repetition quality stats (Gopher quality filters,
    Rae et al. 2021 arXiv:2112.11446 §A1.1): (doc_id, n_tokens,
    top{top_n}_frac, dup{dup_n}_frac), rounded to 4 decimals.

    - ``top{top_n}_frac``: occurrences of the single most frequent
      top_n-gram over total top_n-gram occurrences (Gopher's "top
      n-gram fraction"; Gopher gates n=2,3,4).
    - ``dup{dup_n}_frac``: fraction of dup_n-gram occurrences beyond
      each gram's first — ``(total - distinct) / total`` (Gopher's
      "duplicate n-gram fraction", occurrence-weighted restatement;
      Gopher gates n=5..10).
    Documents shorter than n tokens score 0.0 for that stat.

    Scale shape: the whole operator is MAP-ONLY — no explode, no
    shuffle. The mode count comes from a per-row ``sort_array`` + a
    Catalyst ``aggregate`` fold tracking (prev, run-length, best) over
    the sorted grams; distinct counts come from ``array_distinct``.
    Tokenization is the engine's SQL-parity spec (lower, split on
    [^a-z0-9]+). Per-row cost is O(len log len) in the doc's own token
    count — exactly what a 100-TB quality-gate pass should be."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda x: x != "")

    def grams(n: int) -> str:
        # explicit short-doc guard: sequence(1, 0) DESCENDS in Spark
        return (f"IF(size(toks) < {n}, array(),"
                f" transform(sequence(1, size(toks) - {n - 1}),"
                f" i -> concat_ws(' ', slice(toks, i, {n}))))")

    mode_run = """
aggregate(sort_array(gt),
  struct(CAST('' AS STRING) AS prev, 0L AS run, 0L AS best),
  (a, x) -> struct(x AS prev,
                   IF(x = a.prev, a.run + 1L, 1L) AS run,
                   greatest(a.best, IF(x = a.prev, a.run + 1L, 1L)) AS best),
  a -> a.best)"""
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
        .withColumn("gt", F.expr(grams(top_n)))
        .withColumn("gd", F.expr(grams(dup_n)))
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tokens"),
            F.when(F.size("gt") > 0,
                   F.round(F.expr(mode_run).cast("double") / F.size("gt"), 4))
             .otherwise(F.lit(0.0)).alias(f"top{top_n}_frac"),
            F.when(F.size("gd") > 0,
                   F.round((F.size("gd") - F.size(F.array_distinct("gd")))
                           .cast("double") / F.size("gd"), 4))
             .otherwise(F.lit(0.0)).alias(f"dup{dup_n}_frac"),
        )
    )


def facet_percentiles(index: DataFrame, doc_meta: DataFrame, query: str,
                      value: str, by: str | None = None,
                      percentiles: tuple[float, ...] = (0.25, 0.5, 0.75),
                      mode: str = "or", stem: bool = True,
                      camel: bool = True, zone: str | None = None,
                      approx: bool = False) -> DataFrame:
    """Percentile aggregation over the match set (Elasticsearch
    ``percentiles`` aggregation): exact linear-interpolation quantiles
    of numeric attribute ``value`` across the docs matching the query,
    optionally per category ``by``. Output columns p<pct> (e.g. p25,
    p50, p75), rounded to 4 decimals.

    ``approx=True`` swaps Spark's exact ``percentile`` for
    ``percentile_approx`` (t-digest sketch) — the 100-TB form, where an
    exact percentile's per-group sort is the wrong cost shape; the
    exact default matches DuckDB's ``quantile_cont`` for oracles
    (same linear interpolation, pinned by the corpus_profile entry)."""
    m = matching_docs(index, query, mode=mode, stem=stem, camel=camel,
                      zone=zone)
    cols = [F.col("doc_id").cast("long"), F.col(value).alias("_v")]
    if by is not None:
        cols.append(F.col(by))
    joined = m.join(doc_meta.select(*cols), "doc_id")
    fn = "percentile_approx" if approx else "percentile"
    names = [f"p{round(p * 100)}" for p in percentiles]
    if len(set(names)) < len(names):
        raise ValueError(f"percentiles collide at integer-percent "
                         f"column names: {names}")
    aggs = [F.round(F.expr(f"{fn}(_v, {p!r})"), 4).alias(n)
            for p, n in zip(percentiles, names)]
    if by is None:
        return joined.agg(*aggs)
    return joined.groupBy(by).agg(*aggs).orderBy(by)


def facet_cardinality(index: DataFrame, doc_meta: DataFrame, query: str,
                      value: str, by: str, mode: str = "or",
                      stem: bool = True, camel: bool = True,
                      zone: str | None = None,
                      exact: bool = True) -> DataFrame:
    """Count-distinct aggregation over the match set (Elasticsearch
    ``cardinality`` inside a ``terms`` bucket): per ``by`` group, the
    approximate number of distinct ``value`` attributes across the
    docs matching the query, via the engine-portable HLL sketch
    (operators/sketch.py — reproducible registers, value-checkable by
    an independent engine). Returns (by, [n_exact,] hll_estimate,
    n_registers_hit), estimate rounded to 3 decimals, ordered by group.

    ``exact=True`` adds the true per-group distinct count next to the
    estimate (the validation column — drop it at 10-TB+ match sets,
    where the exact count's full shuffle of distinct pairs is the cost
    the sketch exists to avoid; the sketch itself exchanges <= 256
    register rows per group)."""
    from index_spark.operators.sketch import hll_cardinality_by

    m = matching_docs(index, query, mode=mode, stem=stem, camel=camel,
                      zone=zone)
    # NULL attributes count in NEITHER side: countDistinct skips NULLs,
    # and md5(NULL)'s all-NULL nibbles would otherwise become a real
    # register (inflating the sketch by exactly one "value" per group)
    joined = m.join(doc_meta.select(F.col("doc_id").cast("long"),
                                    F.col(value).alias("_v"),
                                    F.col(by)), "doc_id") \
              .filter(F.col("_v").isNotNull())
    sk = hll_cardinality_by(joined, "_v", by) \
        .withColumn("hll_estimate", F.round("hll_estimate", 3))
    if not exact:
        return sk
    ex = joined.groupBy(by).agg(
        F.countDistinct("_v").cast("long").alias("n_exact"))
    return (sk.join(ex, by)
            .select(by, "n_exact", "hll_estimate", "n_registers_hit")
            .orderBy(by))


def doc_keywords(index: DataFrame, n_docs: int, top: int = 3,
                 zone: str | None = None) -> DataFrame:
    """Per-document keyword extraction: the ``top`` terms of every doc
    by tf·idf (idf = ln(n_docs / df), score rounded to 4 decimals) —
    the standard "tags for every document" pipeline pass (ES
    significant-text per doc, labeling corpora before clustering).
    Returns (doc_id, term, score, kw_rank), kw_rank 1-based by score
    desc / term asc.

    Plan: the postings decode (one mapInPandas over index rows) joins
    the global df aggregate (metadata-only — summed from the stored
    per-row ``df`` column, no blob decode), then one rank window
    partitioned by doc_id — per-partition cardinality is the doc's own
    distinct-term count, so the window is doc-length-bounded, never
    corpus-bounded."""
    posts = postings_from_index(index, zone)
    dfg = (pin_zone(index, zone).filter(F.col("term") != DOC_MARKER)
           .groupBy("term").agg(F.sum("df").alias("_df")))
    scored = (posts.join(dfg, "term")
              .withColumn("score", F.round(
                  F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("_df")),
                  4)))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"),
                                             F.asc("term"))
    return (scored.withColumn("kw_rank",
                              F.row_number().over(w).cast("long"))
            .filter(F.col("kw_rank") <= top)
            .select("doc_id", "term", "score", "kw_rank")
            .orderBy("doc_id", "kw_rank"))


def composite_facet(df: DataFrame, keys: list[str], size: int = 10,
                    after: tuple | None = None) -> DataFrame:
    """Paginated multi-key bucket aggregation (Elasticsearch
    ``composite`` aggregation): distinct key tuples with their doc
    counts, ordered by the keys ascending, returning the first ``size``
    buckets STRICTLY AFTER the ``after`` cursor (the previous page's
    last key tuple). None = first page.

    This is how bucket aggregations paginate at scale: a terms facet
    with 10^8 buckets can't return them all, and OFFSET pagination
    re-aggregates everything it skips. The after-key form is a pushed
    range predicate — buckets before the cursor are FILTERED, not
    computed and discarded, and each page is one combinable aggregate
    + TakeOrderedAndProject over the survivors (no global sort, no
    window). Cursor comparison is lexicographic over the key tuple:
    (k1 > a1) OR (k1 = a1 AND k2 > a2) OR ... — NULL keys are excluded
    (same as ES, whose composite sources skip missing by default).
    """
    if not keys:
        raise ValueError("composite_facet needs at least one key column")
    out = df
    for c in keys:
        out = out.filter(F.col(c).isNotNull())
    if after is not None:
        if len(after) != len(keys):
            raise ValueError(f"after cursor has {len(after)} values for "
                             f"{len(keys)} keys")
        cond = F.lit(False)
        eq = F.lit(True)
        for c, v in zip(keys, after):
            cond = cond | (eq & (F.col(c) > F.lit(v)))
            eq = eq & (F.col(c) == F.lit(v))
        out = out.filter(cond)
    return (out.groupBy(*keys)
            .agg(F.count("*").cast("long").alias("n_docs"))
            .orderBy(*[F.asc(c) for c in keys])
            .limit(size))


def adjacency_matrix(df: DataFrame, filters: dict[str, str],
                     sep: str = "&") -> DataFrame:
    """Pairwise filter-intersection counts (the Elasticsearch
    ``adjacency_matrix`` aggregation): given named boolean filters
    {name: SQL predicate}, return one row per filter and per unordered
    filter pair with the number of rows matching BOTH — the co-occurrence
    matrix behind "how many docs are tagged A and B" dashboards.
    Returns (key, doc_count) with ES's key convention: singletons are
    the filter name, intersections ``a&b`` with names in ascending
    order; empty buckets are omitted; rows ordered by key ascending.

    Plan: each row evaluates every predicate once into a compact
    matched-names array (pure codegen — no join against a filter
    relation), then the array explodes into its <= n(n+1)/2 ordered
    pairs and one map-side-combinable groupBy counts them. At 100 TB
    the cost is the scan + a |filters|^2-bounded fan-out per matching
    row and a <= n^2-cardinality exchange — never a row x filter join.
    ES caps the same blow-up at 100 filters; so does this."""
    if not filters:
        raise ValueError("adjacency_matrix needs at least one filter")
    if len(filters) > 100:
        raise ValueError(f"too many filters ({len(filters)} > 100) — "
                         f"the pair fan-out is quadratic in filters")
    bad = sorted(n for n in filters if sep in n)
    if bad:
        raise ValueError(f"filter names must not contain {sep!r}: {bad}")
    names = sorted(filters)
    matched = F.array_compact(F.array(*[
        F.when(F.expr(filters[n]), F.lit(n)) for n in names]))
    m = df.select(matched.alias("m")).where(F.size("m") > 0)
    pairs = (m.select(F.explode("m").alias("a"), "m")
              .select("a", F.explode("m").alias("b"))
              .where(F.col("a") <= F.col("b")))
    key = F.when(F.col("a") == F.col("b"), F.col("a")) \
           .otherwise(F.concat_ws(sep, "a", "b"))
    return (pairs.groupBy(key.alias("key"))
            .agg(F.count(F.lit(1)).cast("long").alias("doc_count"))
            .orderBy(F.asc("key")))


def matrix_stats(df: DataFrame, cols: list[str],
                 round_at: int = 4) -> DataFrame:
    """ES ``matrix_stats`` aggregation: per-field count/mean/variance
    plus pairwise covariance and correlation over numeric columns, in
    ONE aggregate pass (every statistic is a map-side-combinable
    moment — Spark fuses all of them into a single partial+final
    aggregation, so 100 TB costs one scan and one 1-row exchange).
    Returns the long form: one row per ordered (field, other) pair —
    (field, other, count, mean, variance, covariance, correlation) —
    ordered by (field, other); the diagonal rows carry
    covariance = variance and correlation = 1. Sample (n-1) semantics
    throughout, matching ES and SQL var_samp/covar_samp/corr."""
    if len(cols) < 2:
        raise ValueError("matrix_stats needs at least 2 columns")
    aggs = []
    for a in cols:
        ca = F.col(a).cast("double")
        aggs += [F.count(ca).alias(f"n_{a}"),
                 F.avg(ca).alias(f"mean_{a}"),
                 F.var_samp(ca).alias(f"var_{a}")]
        for b in cols:
            cb = F.col(b).cast("double")
            aggs += [F.covar_samp(ca, cb).alias(f"cov_{a}_{b}"),
                     F.corr(ca, cb).alias(f"corr_{a}_{b}")]
    wide = df.agg(*aggs)
    spark = df.sparkSession
    pairs = spark.createDataFrame(
        [(a, b) for a in cols for b in cols], "field string, other string")
    n = F.when(F.lit(True), F.lit(None).cast("bigint"))
    for a in cols:
        n = F.when(F.col("field") == a, F.col(f"n_{a}")).otherwise(n)
    mean = F.lit(None).cast("double")
    var = F.lit(None).cast("double")
    cov = F.lit(None).cast("double")
    cor = F.lit(None).cast("double")
    for a in cols:
        mean = F.when(F.col("field") == a, F.col(f"mean_{a}")) \
            .otherwise(mean)
        var = F.when(F.col("field") == a, F.col(f"var_{a}")).otherwise(var)
        for b in cols:
            p = (F.col("field") == a) & (F.col("other") == b)
            cov = F.when(p, F.col(f"cov_{a}_{b}")).otherwise(cov)
            cor = F.when(p, F.col(f"corr_{a}_{b}")).otherwise(cor)
    return (pairs.crossJoin(wide)
            .select("field", "other", n.alias("count"),
                    F.round(mean, round_at).alias("mean"),
                    F.round(var, round_at).alias("variance"),
                    F.round(cov, round_at).alias("covariance"),
                    F.round(cor, round_at).alias("correlation"))
            .orderBy("field", "other"))


def string_stats(df: DataFrame, col: str = "text",
                 round_at: int = 4) -> DataFrame:
    """ES ``string_stats`` aggregation (with ``show_distribution``'s
    entropy): count, min/max/avg length, and the Shannon entropy (bits)
    of the CHARACTER distribution across all values. One row out.

    Scale shape: lengths are one fused aggregate; the entropy needs the
    per-character counts — an explode to one row per character, but the
    groupBy key is alphabet-bounded so the exchange after the map-side
    combine is tiny (<= |alphabet| rows per partition). The final
    entropy folds the bounded char relation."""
    c = F.col(col)
    lens = df.agg(
        F.count(c).alias("count"),
        F.min(F.length(c)).cast("long").alias("min_length"),
        F.max(F.length(c)).cast("long").alias("max_length"),
        F.round(F.avg(F.length(c)), round_at).alias("avg_length"))
    chars = (df.select(F.explode(F.split(c, "")).alias("ch"))
             .where(F.length("ch") > 0)
             .groupBy("ch").agg(F.count(F.lit(1)).alias("n")))
    ent = chars.agg(
        F.round(
            -F.sum(F.col("n") * F.log2(F.col("n"))) / F.sum("n")
            + F.log2(F.sum("n")), round_at).alias("entropy"))
    return lens.crossJoin(ent)


def rare_terms(index: DataFrame, max_doc_count: int = 1,
               zone: str | None = None, limit: int | None = None,
               exclude_marker: bool = True) -> DataFrame:
    """ES ``rare_terms`` aggregation over the index dictionary: terms
    whose GLOBAL document frequency is <= ``max_doc_count``, ordered by
    (df asc, term asc) — the long tail a ``terms`` agg's top-N order
    can never surface. Metadata-only: sums the per-shard ``df`` column,
    no posting blob is ever decoded."""
    from index_spark.operators.build import DOC_MARKER
    from index_spark.operators.query import pin_zone

    idx = pin_zone(index, zone) if zone is not None else index
    if exclude_marker:
        idx = idx.filter(F.col("term") != DOC_MARKER)
    out = (idx.groupBy("term").agg(F.sum("df").alias("doc_count"))
           .where(F.col("doc_count") <= max_doc_count)
           .orderBy(F.asc("doc_count"), F.asc("term")))
    return out.limit(limit) if limit is not None else out


def top_hits(df: DataFrame, by: str, sort_col: str, n: int = 3,
             desc: bool = True, cols: list[str] | None = None
             ) -> DataFrame:
    """ES ``top_hits`` sub-aggregation: the top ``n`` rows of every
    ``by`` bucket under the (sort_col, tiebreak-by-all-projected-cols)
    order.  Ties beyond ``sort_col`` break on the projected columns
    ascending so the page is engine-independent.

    Scale shape: ONE shuffle on the bucket key; ``row_number`` keeps a
    single running counter per bucket (never materializes a global
    sort), and rows past ``n`` are dropped before any further exchange.
    """
    from pyspark.sql import Window

    keep = cols or [c for c in df.columns if c not in (by, sort_col)]
    s = F.col(sort_col).desc() if desc else F.col(sort_col).asc()
    w = Window.partitionBy(by).orderBy(s, *[F.asc(c) for c in keep])
    return (df.select(by, sort_col, *keep)
            .withColumn("hit_rank", F.row_number().over(w))
            .where(F.col("hit_rank") <= n)
            .orderBy(F.asc(by), F.asc("hit_rank")))


def percentile_ranks(df: DataFrame, col: str, values: list[float],
                     round_at: int = 4) -> DataFrame:
    """ES ``percentile_ranks`` aggregation, exact CDF form: for each
    probe value v, ``100 * count(x <= v) / count(x)``.  (ES
    approximates from a t-digest; at Spark scale the exact conditional
    counts are one fused map-side-combinable aggregate pass — there is
    nothing to approximate.)  Returns (value, pct_rank) ordered by
    value."""
    if not values:
        raise ValueError("percentile_ranks needs at least one value")
    c = F.col(col).cast("double")
    aggs = [F.count(c).alias("_n")]
    vals = sorted(set(float(v) for v in values))
    for i, v in enumerate(vals):
        aggs.append(F.count(F.when(c <= v, 1)).alias(f"_le_{i}"))
    wide = df.agg(*aggs)
    spark = df.sparkSession
    probes = spark.createDataFrame([(v,) for v in vals], "value double")
    rank = F.lit(None).cast("double")
    for i, v in enumerate(vals):
        rank = F.when(F.col("value") == v,
                      F.lit(100.0) * F.col(f"_le_{i}") / F.col("_n")) \
                .otherwise(rank)
    return (probes.crossJoin(wide)
            .select("value", F.round(rank, round_at).alias("pct_rank"))
            .orderBy("value"))


def weighted_avg(df: DataFrame, value_col: str, weight_col: str,
                 by: list[str] | None = None,
                 round_at: int = 4) -> DataFrame:
    """ES ``weighted_avg`` aggregation: ``sum(value*weight) /
    sum(weight)`` per bucket.  Rows where either side is NULL are
    skipped entirely (the ES default ``missing``-less behavior: a
    document missing value OR weight contributes nothing to either
    sum).  One map-side-combinable aggregate."""
    keys = by or []
    v = F.col(value_col).cast("double")
    w = F.col(weight_col).cast("double")
    ok = v.isNotNull() & w.isNotNull()
    out = (df.groupBy(*keys)
           .agg(F.round(F.sum(F.when(ok, v * w)) /
                        F.sum(F.when(ok, w)), round_at)
                .alias("weighted_avg"),
                F.count(F.when(ok, F.lit(1))).alias("doc_count")))
    return out.orderBy(*keys) if keys else out


def median_absolute_deviation(df: DataFrame, col: str,
                              by: list[str] | None = None,
                              round_at: int = 4) -> DataFrame:
    """ES ``median_absolute_deviation`` aggregation, exact form:
    ``median(|x - median(x)|)`` per bucket.  ES approximates over
    t-digests; this pins exact linear-interpolation percentiles
    (Spark ``percentile`` == DuckDB ``quantile_cont``) so independent
    engines agree bit-for-bit at any scale.

    Two aggregate passes by construction (the inner median must
    complete before deviations exist); the per-bucket median travels
    back via a broadcast-size relation (one row per bucket), never a
    wide shuffle."""
    keys = by or []
    v = F.col(col).cast("double")
    med = df.groupBy(*keys).agg(F.percentile(v, F.lit(0.5)).alias("_med"))
    joined = (df.join(F.broadcast(med), on=keys) if keys
              else df.crossJoin(F.broadcast(med)))
    dev = F.abs(v - F.col("_med"))
    out = (joined.groupBy(*keys)
           .agg(F.round(F.percentile(dev, F.lit(0.5)), round_at)
                .alias("mad"),
                F.round(F.any_value(F.col("_med")), round_at)
                .alias("median")))
    return out.orderBy(*keys) if keys else out


def boxplot_agg(df: DataFrame, col: str, by: list[str] | None = None,
                round_at: int = 4) -> DataFrame:
    """ES ``boxplot`` aggregation, exact form: per bucket — min, q1,
    q2 (median), q3, max, and the Tukey whiskers ES reports (``lower``
    / ``upper``: the nearest actual values inside q1-1.5·IQR /
    q3+1.5·IQR).  Quartiles pin exact linear interpolation (ES uses
    t-digest); whiskers need the fence before they can clip, so they
    ride a second conditional min/max over the same relation — the
    fences travel back as a one-row-per-bucket broadcast."""
    keys = by or []
    v = F.col(col).cast("double")
    q = (df.groupBy(*keys)
         .agg(F.min(v).alias("min"),
              F.percentile(v, F.lit(0.25)).alias("q1"),
              F.percentile(v, F.lit(0.50)).alias("q2"),
              F.percentile(v, F.lit(0.75)).alias("q3"),
              F.max(v).alias("max")))
    joined = (df.join(F.broadcast(q), on=keys) if keys
              else df.crossJoin(F.broadcast(q)))
    iqr = F.col("q3") - F.col("q1")
    lo_fence = F.col("q1") - 1.5 * iqr
    hi_fence = F.col("q3") + 1.5 * iqr
    out = (joined.groupBy(*keys)
           .agg(*[F.round(F.any_value(F.col(c)), round_at).alias(c)
                  for c in ("min", "q1", "q2", "q3", "max")],
                F.round(F.min(F.when(v >= lo_fence, v)), round_at)
                .alias("lower"),
                F.round(F.max(F.when(v <= hi_fence, v)), round_at)
                .alias("upper")))
    return out.orderBy(*keys) if keys else out


def t_test_agg(df: DataFrame, value_col: str, group_col: str,
               group_a: str, group_b: str,
               kind: str = "heteroscedastic",
               round_at: int = 4) -> DataFrame:
    """ES ``t_test`` aggregation (unpaired): Welch's t
    (``heteroscedastic``, the ES default) or pooled-variance Student's
    t (``homoscedastic``) between the ``value_col`` populations where
    ``group_col`` equals ``group_a`` vs ``group_b``.  Returns one row:
    (t_stat, dof, mean_a, mean_b, n_a, n_b) — t uses sample variance,
    Welch dof via Welch–Satterthwaite.  ES reports a p-value from
    these; the (t, dof) pair is the engine-checkable statistic, the
    CDF lookup is presentation.

    ONE fused conditional aggregate over the relation (count/avg/
    var_samp per side in the same pass) — a single map-side-combinable
    pass, one 1-row result."""
    if kind not in ("heteroscedastic", "homoscedastic"):
        raise ValueError(f"kind must be heteroscedastic|homoscedastic, "
                         f"got {kind!r}")
    v = F.col(value_col).cast("double")
    g = F.col(group_col)
    va = F.when(g == group_a, v)
    vbv = F.when(g == group_b, v)
    agg = df.agg(
        F.count(va).alias("n_a"), F.count(vbv).alias("n_b"),
        F.avg(va).alias("mean_a"), F.avg(vbv).alias("mean_b"),
        F.var_samp(va).alias("var_a"), F.var_samp(vbv).alias("var_b"))
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    va_, vb_ = F.col("var_a"), F.col("var_b")
    diff = F.col("mean_a") - F.col("mean_b")
    if kind == "heteroscedastic":
        se2 = va_ / na + vb_ / nb
        t = diff / F.sqrt(se2)
        dof = (se2 * se2) / ((va_ / na) * (va_ / na) / (na - 1)
                             + (vb_ / nb) * (vb_ / nb) / (nb - 1))
    else:
        sp2 = (((na - 1) * va_ + (nb - 1) * vb_) / (na + nb - 2))
        t = diff / F.sqrt(sp2 * (1.0 / na + 1.0 / nb))
        dof = na + nb - 2
    return agg.select(
        F.round(t, round_at).alias("t_stat"),
        F.round(dof, round_at).alias("dof"),
        F.round(F.col("mean_a"), round_at).alias("mean_a"),
        F.round(F.col("mean_b"), round_at).alias("mean_b"),
        "n_a", "n_b")


def range_facet(df: DataFrame, col: str,
                ranges: list[tuple[float | None, float | None]],
                value_col: str | None = None,
                by: list[str] | None = None,
                round_at: int = 4) -> DataFrame:
    """ES ``range`` aggregation: explicit [from, to) buckets (ES
    half-open semantics: ``from`` inclusive, ``to`` exclusive; None =
    unbounded), labeled the ES way ("a-b", "*-b", "a-*").  Buckets may
    overlap in ES; a doc lands in EVERY range it satisfies, so each
    range is an independent conditional count — ONE fused aggregate
    pass over the relation, no explode, no shuffle beyond the groupBy
    keys.  Optional ``value_col`` adds a per-range sum."""
    if not ranges:
        raise ValueError("ranges must be non-empty")
    keys = by or []
    v = F.col(col).cast("double")
    aggs = []
    for lo, hi in ranges:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (v >= float(lo))
        if hi is not None:
            cond = cond & (v < float(hi))
        label = (f"{'*' if lo is None else format(lo, 'g')}"
                 f"-{'*' if hi is None else format(hi, 'g')}")
        aggs.append(F.count(F.when(cond, F.lit(1)))
                    .alias(f"count:{label}"))
        if value_col is not None:
            aggs.append(F.round(
                F.sum(F.when(cond, F.col(value_col).cast("double"))),
                round_at).alias(f"sum:{label}"))
    wide = df.groupBy(*keys).agg(*aggs)
    # unpivot to the ES bucket shape: one row per (keys, range)
    pairs = []
    for lo, hi in ranges:
        label = (f"{'*' if lo is None else format(lo, 'g')}"
                 f"-{'*' if hi is None else format(hi, 'g')}")
        fields = [F.lit(label).alias("range"),
                  F.col(f"`count:{label}`").alias("doc_count")]
        if value_col is not None:
            fields.append(F.col(f"`sum:{label}`").alias("sum_value"))
        pairs.append(F.struct(*fields))
    out = (wide.select(*keys, F.explode(F.array(*pairs)).alias("b"))
           .select(*keys, "b.*"))
    return out.orderBy(*keys, "range") if keys else out.orderBy("range")


def filters_facet(df: DataFrame, filters: dict[str, str],
                  value_col: str | None = None,
                  other_bucket: bool = False,
                  round_at: int = 4) -> DataFrame:
    """ES ``filters`` aggregation: one bucket per NAMED predicate
    (plain SQL expressions), each counted independently (a doc can
    land in several — ES filters buckets are not exclusive), plus an
    optional ``_other_`` bucket for docs matching none.  ONE fused
    conditional-aggregate pass, like :func:`range_facet` — N filters
    cost one scan, not N."""
    if not filters:
        raise ValueError("filters must be non-empty")
    conds = {name: F.expr(expr) for name, expr in filters.items()}
    if other_bucket:
        none_match = F.lit(True)
        for c in conds.values():
            none_match = none_match & ~F.coalesce(c, F.lit(False))
        conds = {**conds, "_other_": none_match}
    aggs = []
    for name, c in conds.items():
        aggs.append(F.count(F.when(c, F.lit(1))).alias(f"count:{name}"))
        if value_col is not None:
            aggs.append(F.round(
                F.sum(F.when(c, F.col(value_col).cast("double"))),
                round_at).alias(f"sum:{name}"))
    wide = df.agg(*aggs)
    pairs = []
    for name in conds:
        fields = [F.lit(name).alias("filter"),
                  F.col(f"`count:{name}`").alias("doc_count")]
        if value_col is not None:
            fields.append(F.col(f"`sum:{name}`").alias("sum_value"))
        pairs.append(F.struct(*fields))
    return (wide.select(F.explode(F.array(*pairs)).alias("b"))
            .select("b.*").orderBy("filter"))


def frequent_item_pairs(df: DataFrame, txn_col: str, item_col: str,
                        min_support: float = 0.1,
                        size: int = 10) -> DataFrame:
    """ES ``frequent_item_sets`` aggregation, pair form (Apriori level
    2 — ES's own FP-growth caps the set size; pairs are the level
    analysts read): co-occurring DISTINCT item pairs across
    transactions with support ≥ ``min_support`` (fraction of all
    transactions containing both), top ``size`` by (support desc,
    items asc).

    Distributed Apriori shape: (1) dedupe to the distinct
    (transaction, item) relation — one groupBy; (2) count items,
    prune below min_support (the Apriori monotonicity cut: a pair
    can't beat a support its items don't reach) and BROADCAST the
    bounded frequent-item set; (3) self-join the pruned relation on
    the transaction key (a < b, so each pair once); (4) count pairs,
    filter, top-k.  The self-join's per-transaction fan-out is
    |frequent items in txn|² — bounded by the support prune, the
    reason Apriori survives at scale where a naive all-pairs join
    would not."""
    if not 0.0 < min_support <= 1.0:
        raise ValueError(
            f"min_support must be in (0, 1], got {min_support}")
    t, it = F.col(txn_col), F.col(item_col)
    txn_items = df.select(t.alias("_t"), it.alias("_i")).distinct()
    n_txn = txn_items.select("_t").distinct().count()
    floor = min_support * n_txn
    freq = (txn_items.groupBy("_i")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") >= floor)
            .select("_i"))
    pruned = txn_items.join(F.broadcast(freq), "_i").select("_t", "_i")
    a = pruned.select("_t", F.col("_i").alias("item_a"))
    b = pruned.select("_t", F.col("_i").alias("item_b"))
    pairs = (a.join(b, "_t")
             .filter(F.col("item_a") < F.col("item_b"))
             .groupBy("item_a", "item_b")
             .agg(F.count(F.lit(1)).alias("doc_count")))
    ratio = F.col("doc_count") / F.lit(float(n_txn))
    out = (pairs
           .filter(ratio >= min_support)  # unrounded, oracle-identical
           .withColumn("support", F.round(ratio, 4))
           .orderBy(F.desc("support"), F.asc("item_a"),
                    F.asc("item_b"))
           .limit(size))
    return out


def top_metrics(df: DataFrame, by: str, sort_col: str,
                metric_cols: list[str], ascending: bool = False,
                round_at: int = 4) -> DataFrame:
    """ES ``top_metrics`` aggregation: per bucket, the metric columns
    of the single row with the best ``sort_col`` (max by default, min
    with ``ascending``); deterministic under sort ties via the first
    metric column as tiebreak.  One bucket-key window pass with rows
    past rank 1 dropped map-side (same shape as ``top_hits`` n=1, but
    returning a metric row, the ES distinction)."""
    if not metric_cols:
        raise ValueError("metric_cols must be non-empty")
    s = F.col(sort_col)
    order = [s.asc() if ascending else s.desc()] + \
        [F.col(c).asc() for c in metric_cols]
    w = Window.partitionBy(by).orderBy(*order)
    out = (df.withColumn("_rn", F.row_number().over(w))
           .filter(F.col("_rn") == 1)
           .select(by, F.round(s.cast("double"), round_at).alias("sort"),
                   *[F.round(F.col(c).cast("double"), round_at)
                     .alias(c) for c in metric_cols]))
    return out.orderBy(by)


def rate_agg(events: DataFrame, unit: str = "day",
             interval: str = "month", ts_col: str = "ts",
             value_col: str | None = None,
             by: list[str] | None = None,
             round_at: int = 4) -> DataFrame:
    """ES ``rate`` aggregation: per date-histogram bucket, the event
    count (or sum of ``value_col``) RE-SCALED to a per-``unit`` rate —
    rate = bucket_total / (bucket_span / unit_span), with the ES
    calendar rule pinned to the bucket's ACTUAL span (a 31-day month
    divides by 31 when unit='day').  One groupBy; the span arithmetic
    is row-local on the bucket timestamp."""
    units_s = {"second": 1.0, "minute": 60.0, "hour": 3600.0,
               "day": 86400.0, "week": 604800.0}
    if unit not in units_s:
        raise ValueError(f"unit must be one of {sorted(units_s)}, "
                         f"got {unit!r}")
    intervals = ("minute", "hour", "day", "week", "month", "quarter",
                 "year")
    if interval not in intervals:  # goes into an INTERVAL literal
        raise ValueError(f"interval must be one of {intervals}, "
                         f"got {interval!r}")
    keys = by or []
    t = F.col(ts_col).cast("timestamp")
    bucket = F.date_trunc(interval, t)
    agg = (F.sum(F.col(value_col).cast("double")) if value_col
           else F.count(F.lit(1)).cast("double"))
    grouped = (events.groupBy(*keys, bucket.alias("bucket"))
               .agg(agg.alias("_total")))
    # Spark's interval grammar has no QUARTER unit (date_trunc does) —
    # a quarter is exactly three calendar months
    step = ("INTERVAL 3 month" if interval == "quarter"
            else f"INTERVAL 1 {interval}")
    nxt = F.col("bucket") + F.expr(step)
    span_s = F.unix_timestamp(nxt) - F.unix_timestamp(F.col("bucket"))
    rate = F.col("_total") / (span_s / F.lit(units_s[unit]))
    return (grouped.select(*keys, "bucket",
                           F.round(F.col("_total"), round_at)
                           .alias("total"),
                           F.round(rate, round_at)
                           .alias(f"rate_per_{unit}"))
            .orderBy(*keys, "bucket"))


def multi_terms_facet(df: DataFrame, keys: list[str], size: int = 10,
                      value_col: str | None = None,
                      round_at: int = 4) -> DataFrame:
    """ES ``multi_terms`` aggregation: buckets keyed by the COMPOSITE
    of several fields (the terms agg generalized to key tuples),
    ordered doc_count desc with the key tuple ascending as the pinned
    tiebreak, truncated to ``size``.  One groupBy + a k-row
    TakeOrdered — the compound key shuffles exactly like a single
    terms agg; optional ``value_col`` adds a per-bucket sum."""
    if not keys:
        raise ValueError("keys must be non-empty")
    aggs = [F.count(F.lit(1)).alias("doc_count")]
    if value_col is not None:
        aggs.append(F.round(F.sum(F.col(value_col).cast("double")),
                            round_at).alias("sum_value"))
    out = df.groupBy(*keys).agg(*aggs)
    return (out.orderBy(F.desc("doc_count"),
                        *[F.asc(k) for k in keys])
            .limit(size))


def categorize_text(df: DataFrame, text_col: str = "text",
                    max_tokens: int = 8, top: int = 20) -> DataFrame:
    """ES ``categorize_text`` aggregation, deterministically restated:
    a document's category TEMPLATE is its first ``max_tokens`` analyzer
    tokens with every digit-bearing token replaced by ``<num>`` (the
    drain-style log-templating rule — variable fields in machine logs
    are overwhelmingly numeric); buckets are (template, doc_count),
    count desc / template asc, first ``top``.  ES's own categorizer is
    an online token-tree whose buckets depend on encounter order —
    unusable as a distributed-correctness target — so the template
    rule is pinned instead, keeping the aggregation one shuffle-free
    map + a map-side-combinable count at any corpus size (pure
    codegen: split/slice/transform/array_join, no UDF)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
        lambda x: x != F.lit(""))
    head = F.slice(toks, 1, int(max_tokens))
    tmpl = F.array_join(
        F.transform(head, lambda x: F.when(x.rlike("[0-9]"),
                                           F.lit("<num>")).otherwise(x)),
        " ")
    return (df.select(tmpl.alias("template"))
            .groupBy("template")
            .agg(F.count("*").alias("doc_count"))
            .orderBy(F.desc("doc_count"), F.asc("template"))
            .limit(int(top)))


def variable_width_histogram(df: DataFrame, value_col: str,
                             buckets: int = 5,
                             key_col: str | None = None,
                             round_at: int | None = None) -> DataFrame:
    """ES ``variable_width_histogram``, deterministically restated as
    equal-frequency clustering: rows sort by (value, key) and split
    into ``buckets`` ntiles; each bucket reports min/max/avg/count.
    ES's agg is a one-pass streaming clusterer whose centroids depend
    on shard encounter order — not a distributed-correctness target —
    so the rank-based rule is pinned (same spirit: bucket widths adapt
    to density).

    Scale note: ``ntile`` over an unpartitioned window is a single
    sort — exact and fine to ~10^8 rows; at full corpus scale swap the
    boundary step for ``percentile_approx`` + a broadcast range join
    (the aggregate below is unchanged)."""
    order = [F.col(value_col).asc()]
    if key_col is not None:
        order.append(F.col(key_col).asc())
    w = Window.orderBy(*order)
    avg = F.avg(value_col)
    if round_at is not None:
        avg = F.round(avg, round_at)
    return (df.select(value_col, *( [key_col] if key_col else [] ))
            .withColumn("bucket", F.ntile(int(buckets)).over(w))
            .groupBy("bucket")
            .agg(F.min(value_col).alias("min_val"),
                 F.max(value_col).alias("max_val"),
                 avg.alias("avg_val"),
                 F.count("*").alias("doc_count"))
            .orderBy("bucket"))


def terms_facet_sharded(df: DataFrame, key_col: str, shard_key: str,
                        n_shards: int = 4, size: int = 5,
                        shard_size: int = 3) -> DataFrame:
    """The ES ``terms`` aggregation's DISTRIBUTED protocol, made
    first-class: every shard returns only its local top ``shard_size``
    keys by count (count desc, key asc — ties pinned); the coordinator
    sums what it received and reports, per merged key, ES's
    ``doc_count_error_upper_bound`` — the worst-case undercount, equal
    to the sum over NON-reporting shards of that shard's smallest
    returned count (a key absent from a shard's top-K can hide at most
    just under that cutoff there).  A shard that returned ALL its keys
    (fewer distinct keys than ``shard_size``) contributes 0 error —
    nothing can hide in an exhausted shard (ES's rule).

    This is the aggregation shape that makes top-N facets cheap at
    1000 executors — per-shard partial top-K bounds what shuffles to
    the coordinator — and the error bound is what makes the
    approximation honest.  Shards are pinned as
    ``pmod(shard_key, n_shards)`` so any engine reproduces the exact
    routing (on a real cluster it is the natural data partition)."""
    base = df.select(F.col(key_col).alias("key"),
                     F.pmod(F.col(shard_key), F.lit(int(n_shards)))
                     .cast("long").alias("shard"))
    pc = base.groupBy("shard", "key").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("shard").orderBy(F.desc("cnt"), F.asc("key"))
    rk = (pc.withColumn("rn", F.row_number().over(w))
          .withColumn("nk", F.count("*").over(Window.partitionBy("shard"))))
    tops = rk.filter(F.col("rn") <= int(shard_size))
    sm = (tops.groupBy("shard")
          .agg(F.when(F.max("nk") > int(shard_size), F.min("cnt"))
               .otherwise(F.lit(0)).alias("shard_min")))
    tot = sm.agg(F.sum("shard_min").alias("_tot"))
    merged = (tops.join(sm, "shard")
              .groupBy("key")
              .agg(F.sum("cnt").alias("doc_count"),
                   F.sum("shard_min").alias("_covered")))
    return (merged.crossJoin(F.broadcast(tot))
            .select(F.col("key").alias(key_col),
                    F.col("doc_count").cast("long").alias("doc_count"),
                    (F.col("_tot") - F.col("_covered")).cast("long")
                    .alias("doc_count_error_upper_bound"))
            .orderBy(F.desc("doc_count"), F.asc(key_col))
            .limit(int(size)))


def facet_extended_stats(index: DataFrame, doc_meta: DataFrame,
                         query: str, value: str, by: str | None = None,
                         sigma: float = 2.0, mode: str = "or",
                         stem: bool = True, camel: bool = True,
                         zone: str | None = None,
                         round_at: int = 4) -> DataFrame:
    """ES ``extended_stats`` aggregation over the match set: the
    ``stats`` block plus sum_of_squares, population variance /
    std_deviation, and the ``std_deviation_bounds`` band
    (avg ± sigma·std).  Variance is PINNED to the naive-sums form
    ``sos/n − avg²`` — every statistic is then a pure function of the
    three partial-combinable sums (n, Σv, Σv²), so the plan is the
    same two exchanges as :func:`facet_stats` at any match-set size,
    and any SQL engine restates the arithmetic bit-for-bit (streaming
    Welford implementations differ in last-ulp; rounding pins the
    rest). The naive form can round to a tiny NEGATIVE value on
    near-constant groups, so variance clamps at 0 (the same clamp ES
    applies) — otherwise std_deviation and both bounds would be NaN."""
    m = matching_docs(index, query, mode=mode, stem=stem, camel=camel,
                      zone=zone)
    cols = [F.col("doc_id").cast("long"), F.col(value).alias("_v")]
    if by is not None:
        cols.append(F.col(by))
    joined = m.join(doc_meta.select(*cols), "doc_id")
    n = F.count("*")
    s = F.sum("_v")
    sos = F.sum(F.col("_v") * F.col("_v"))
    avg = s / n
    var = F.greatest(sos / n - avg * avg, F.lit(0.0))
    std = F.sqrt(var)
    r = round_at
    aggs = [n.alias("n_docs"),
            F.min("_v").alias("min_value"),
            F.max("_v").alias("max_value"),
            F.round(avg, r).alias("avg_value"),
            F.sum("_v").alias("sum_value"),
            F.round(sos, r).alias("sum_of_squares"),
            F.round(var, r).alias("variance"),
            F.round(std, r).alias("std_deviation"),
            F.round(avg + sigma * std, r).alias("std_upper"),
            F.round(avg - sigma * std, r).alias("std_lower")]
    if by is None:
        return joined.agg(*aggs)
    return joined.groupBy(by).agg(*aggs).orderBy(by)


def significant_text(docs: DataFrame, fg_predicate: str,
                     text_col: str = "text", id_col: str = "doc_id",
                     top: int = 20, min_fg_df: int = 2,
                     filter_duplicate_text: bool = True) -> DataFrame:
    """ES ``significant_text`` aggregation — :func:`significant_terms`
    re-pointed at RAW text (no index required), with ES's
    ``filter_duplicate_text`` de-duplication: exact duplicate texts
    (sha256 keep-first by id) count ONCE, so boilerplate/mirror pages
    cannot manufacture significance. Foreground = rows satisfying the
    ``fg_predicate`` SQL expression (evaluated after dedup — the
    sampled-hits analog).

    Same JLH score and tie order as ``significant_terms``; doc-level
    df (distinct docs containing the term, fg and bg alike). Returns
    (term, fg_df, df, jlh).

    Plan: dedup = one hash groupBy (min_by id); tokenize/explode +
    two conditional doc-level aggregates fused in one pass (fg_df via
    count-if over the predicate flag); no second scan, no window. The
    top cut is a TakeOrderedAndProject.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    base = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                       txt.alias("_x"),
                       F.expr(fg_predicate).cast("boolean").alias("_fg"))
    if filter_duplicate_text:
        first = (base.groupBy(F.sha2("_x", 256).alias("_h"))
                 .agg(F.min("doc_id").alias("doc_id")))
        base = base.join(first, "doc_id", "left_semi")
    counts = base.agg(
        F.count("*").alias("n"),
        F.count_if(F.col("_fg")).alias("nfg")).collect()[0]
    n_tot, n_fg = counts["n"], counts["nfg"]
    if n_fg == 0:
        raise ValueError("empty foreground")
    toks = F.filter(F.split(F.lower(F.col("_x")), "[^a-z0-9]+"),
                    lambda x: x != "")
    terms = (base
             .select("doc_id", "_fg",
                     F.explode_outer(toks).alias("term"))
             .filter(F.col("term").isNotNull())
             .groupBy("term")
             .agg(F.count_distinct("doc_id").alias("df"),
                  F.count_distinct(
                      F.when(F.col("_fg"), F.col("doc_id")))
                  .alias("fg_df"))
             .filter(F.col("fg_df") >= int(min_fg_df)))
    fg_pct = F.col("fg_df") / F.lit(float(n_fg))
    bg_pct = F.col("df") / F.lit(float(n_tot))
    return (terms
            .withColumn("jlh", F.round((fg_pct - bg_pct)
                                       * (fg_pct / bg_pct), 6))
            .select("term", "fg_df", "df", "jlh")
            .orderBy(F.desc("jlh"), F.asc("term"))
            .limit(top))


def ip_prefix_facet(df: DataFrame, ip_col: str, prefix_length: int = 16,
                    min_doc_count: int = 1) -> DataFrame:
    """ES ``ip_prefix`` aggregation over IPv4 addresses stored as
    unsigned 32-bit integers (the at-rest form a 100-TB event table
    wants — 4 bytes, range-prunable; dotted strings parse once at
    ingest, never per query).

    Buckets rows by the ``prefix_length``-bit network prefix; emits the
    dotted CIDR label the ES agg returns. One map-side-combinable
    groupBy on a codegen'd integer key — no UDF, no string parsing in
    the aggregate path.

    Returns (prefix, n_rows) ordered by the numeric prefix ascending.
    """
    if not 1 <= int(prefix_length) <= 32:
        raise ValueError("prefix_length must be in 1..32")
    p = int(prefix_length)
    ip = F.col(ip_col).cast("long")
    net = (F.shiftleft(F.shiftright(ip, 32 - p), 32 - p)
           if p < 32 else ip)
    octets = F.concat_ws(
        ".",
        ((F.col("_net").bitwiseAND(F.lit(0xFF000000))) / F.lit(2**24))
        .cast("long").cast("string"),
        ((F.col("_net").bitwiseAND(F.lit(0x00FF0000))) / F.lit(2**16))
        .cast("long").cast("string"),
        ((F.col("_net").bitwiseAND(F.lit(0x0000FF00))) / F.lit(2**8))
        .cast("long").cast("string"),
        (F.col("_net").bitwiseAND(F.lit(0x000000FF)))
        .cast("string"))
    return (df.select(net.alias("_net"))
            .groupBy("_net").agg(F.count("*").alias("n_rows"))
            .filter(F.col("n_rows") >= int(min_doc_count))
            .select(F.concat(octets, F.lit(f"/{p}")).alias("prefix"),
                    "n_rows", F.col("_net").alias("_o"))
            .orderBy(F.asc("_o"))
            .drop("_o"))


def bucket_correlation(buckets: DataFrame, curve: list[float],
                       order_col: str = "bucket",
                       value_col: str = "n_events",
                       round_at: int = 6) -> DataFrame:
    """ES ``bucket_correlation`` pipeline aggregation — Pearson
    correlation between a sibling aggregation's per-bucket counts (in
    bucket order) and a caller-supplied indicator ``curve`` of the same
    length (the ES use case: correlate a term's date-histogram counts
    against a known event profile).

    The bucket relation is BOUNDED (one row per bucket); the curve
    joins positionally via one ``posexplode`` of the literal array and
    a row_number over the ordered buckets, then a single ``corr``
    aggregate. Raises if the lengths disagree (ES requires equal
    lengths too).
    """
    n = buckets.count()
    if n != len(curve):
        raise ValueError(
            f"curve length {len(curve)} != bucket count {n}")
    w = Window.orderBy(F.asc(order_col))
    ranked = buckets.select(
        F.col(value_col).cast("double").alias("_v"),
        F.row_number().over(w).alias("_i"))
    lit_curve = F.array(*[F.lit(float(x)) for x in curve])
    curve_df = (buckets.sparkSession.range(1)
                .select(F.posexplode(lit_curve).alias("_p", "_c"))
                .select((F.col("_p") + 1).alias("_i"), "_c"))
    return (ranked.join(curve_df, "_i")
            .agg(F.round(F.corr("_v", "_c"), round_at)
                 .alias("correlation")))


def langid_nb(docs: DataFrame, label_col: str = "lang",
              text_col: str = "text", id_col: str = "doc_id",
              max_chars: int = 200, alpha: float = 1.0,
              round_at: int = 6) -> DataFrame:
    """Char-trigram Naive Bayes language identifier — the trainable
    upgrade of the heuristic lang-id gate (the cld3/fastText-style
    character-n-gram profile classifier, trained here on the corpus's
    own labels and scoring every row; split train/apply by passing a
    labeled slice as ``docs`` and joining predictions back).

    Pinned model (restatable in any SQL dialect):

    - features: all character trigrams (with multiplicity) of
      ``substr(lower(text), 1, max_chars)``;
    - ``p(g | l) = (c(g, l) + alpha) / (tot_l + alpha * V)`` with V =
      corpus-wide distinct trigram count (add-alpha smoothing —
      unseen grams hit the same denominator);
    - ``score(d, l) = ln(n_l / n) + sum over d's gram occurrences of
      ln p(g | l)``, rounded at ``round_at`` BEFORE the argmax;
    - prediction = max score, ties to the lexicographically smallest
      label.

    Returns (doc_id, label, pred, score). Docs whose truncated text
    yields NO trigram (fewer than 3 characters, or NULL) have no
    evidence to score and are ABSENT from the result — join back
    against the corpus and default such rows (e.g. to the majority
    prior) if a total labeling is required. Scale shape: the model is a
    (labels x vocab)-bounded relation built by one map-side-combinable
    aggregate; scoring fans each gram occurrence out by |labels| (a
    broadcast-joinable dimension), sums per (doc, label), and ranks
    with a window partitioned by doc_id whose partitions hold exactly
    |labels| rows — never a corpus-wide window.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    s = F.substring(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                    1, int(max_chars))
    base = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                       F.col(label_col).alias("label"),
                       s.alias("_s"))
    g = (base
         .select("doc_id", "label",
                 F.explode_outer(F.when(
                     F.length("_s") >= 3,
                     F.expr("transform(sequence(1, length(_s) - 2), "
                            "i -> substr(_s, i, 3))"))).alias("gram"))
         .filter(F.col("gram").isNotNull()))

    cnt = g.groupBy("label", "gram").agg(F.count("*").alias("c"))
    tot = g.groupBy("label").agg(F.count("*").alias("tot"))
    v = g.select("gram").distinct().count()
    n_by = {r["label"]: r["n"] for r in
            base.groupBy("label").agg(F.count("*").alias("n")).collect()}
    n_all = float(sum(n_by.values()))
    if not n_by:
        raise ValueError("empty corpus")
    labels = docs.sparkSession.createDataFrame(
        [(lb, float(np.log(n / n_all))) for lb, n in sorted(n_by.items())],
        "cand string, ln_prior double")

    av = float(alpha) * float(v)
    scored = (g.crossJoin(F.broadcast(labels))
              .join(F.broadcast(tot.withColumnRenamed("label", "cand")),
                    "cand")
              .join(F.broadcast(cnt
                                .withColumnRenamed("label", "cand")),
                    ["cand", "gram"], "left")
              .groupBy("doc_id", "cand", "ln_prior")
              .agg(F.sum(F.log((F.coalesce(F.col("c"), F.lit(0))
                                + F.lit(float(alpha)))
                               / (F.col("tot") + F.lit(av))))
                   .alias("_ll"))
              .select("doc_id", "cand",
                      F.round(F.col("ln_prior") + F.col("_ll"),
                              round_at).alias("score")))
    wd = Window.partitionBy("doc_id").orderBy(F.desc("score"),
                                              F.asc("cand"))
    pred = (scored.withColumn("_rk", F.row_number().over(wd))
            .filter(F.col("_rk") == 1)
            .select("doc_id", F.col("cand").alias("pred"), "score"))
    return (base.select("doc_id", "label").join(pred, "doc_id")
            .select("doc_id", "label", "pred", "score")
            .orderBy("doc_id"))


def heaps_law(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id", n_buckets: int = 32,
              round_at: int = 6) -> DataFrame:
    """Heaps'-law fit of the corpus's vocabulary growth — V(N) ≈ K·N^β
    (Heaps 1978), the profiling statistic that sizes a term dictionary
    / predicts how the index's distinct-term count scales to 100 TB
    before you build it.

    Pinned construction: docs partition into ``n_buckets`` contiguous
    doc-id ranges of width ``floor(max_id / n_buckets) + 1``; per
    bucket, token count and NEW-term count (terms whose global
    first-seen doc falls in the bucket — one ``min(doc_id)`` aggregate
    per term, the cumulative-cardinality decomposition, no prefix
    rescans); running sums over the bounded bucket axis give the
    (N_i, V_i) growth curve; β and ln K come from ordinary least
    squares of ln V on ln N (``regr_slope`` / ``regr_intercept`` — both
    engines compute the same covariance ratio).

    Returns one row: (n_points, beta, k_coef). Scale shape: two
    map-side-combinable aggregates over the token stream, a window
    over ≤ ``n_buckets`` rows, and a 1-row regression aggregate —
    corpus-size-independent memory everywhere.
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    toks = F.filter(F.split(F.lower(F.coalesce(F.col(text_col),
                                               F.lit(""))),
                            "[^a-z0-9]+"), lambda x: x != "")
    base = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                       toks.alias("_t"))
    max_id = base.agg(F.max("doc_id").alias("m")).collect()[0]["m"]
    if max_id is None:
        raise ValueError("empty corpus")
    width = int(max_id) // int(n_buckets) + 1
    g = (base.select((F.col("doc_id") / width).cast("long")
                     .alias("bucket"), "doc_id",
                     F.explode_outer("_t").alias("term"))
         .filter(F.col("term").isNotNull()))
    tok_per = g.groupBy("bucket").agg(F.count("*").alias("n_toks"))
    new_per = (g.groupBy("term").agg(F.min("doc_id").alias("first_doc"))
               .select((F.col("first_doc") / width).cast("long")
                       .alias("bucket"))
               .groupBy("bucket").agg(F.count("*").alias("n_new")))
    w = (Window.orderBy(F.asc("bucket"))
         .rowsBetween(Window.unboundedPreceding, 0))
    curve = (tok_per.join(new_per, "bucket", "left")
             .withColumn("n_new", F.coalesce("n_new", F.lit(0)))
             .select("bucket",
                     F.sum("n_toks").over(w).alias("cum_n"),
                     F.sum("n_new").over(w).alias("cum_v"))
             .filter((F.col("cum_n") > 0) & (F.col("cum_v") > 0))
             .select(F.log(F.col("cum_n").cast("double")).alias("x"),
                     F.log(F.col("cum_v").cast("double")).alias("y")))
    return (curve.agg(
        F.count("*").cast("long").alias("n_points"),
        F.round(F.expr("regr_slope(y, x)"), round_at).alias("beta"),
        F.round(F.exp(F.expr("regr_intercept(y, x)")),
                round_at).alias("k_coef")))


def zipf_law(docs: DataFrame, text_col: str = "text",
             top_n: int = 256, skip: int = 0,
             round_at: int = 6) -> DataFrame:
    """Zipf's-law fit of the corpus term-frequency distribution —
    f(r) ~ C * r^(-s) (Zipf 1949) — :func:`heaps_law`'s companion
    profiling statistic: the rank-frequency exponent predicts posting-
    list skew (how hot the hot terms are), which sizes the hot-term
    salting / segmented-merge strategy before a 100-TB build.

    Pinned construction: global cf per term (one map-side-combinable
    aggregate over the token stream); terms rank by (cf desc, term asc)
    — the term tiebreak makes the rank assignment engine-independent —
    the top ``top_n`` ranks after dropping the first ``skip`` (the
    classic fit excludes the flattened head when function words
    dominate); s and ln C come from OLS of ln cf on ln rank
    (``regr_slope`` / ``regr_intercept``). Returns one row:
    (n_points, s_exp, c_coef) with s_exp = -slope (positive for a
    Zipfian corpus).

    Scale shape: one aggregate + one ``top_n``-row ordered cut + a
    1-row regression — the window never sees more than ``top_n + skip``
    rows because the cut happens first via LIMIT."""
    if top_n < 2:
        raise ValueError("top_n must be >= 2")
    if skip < 0:
        raise ValueError("skip must be >= 0")
    toks = F.filter(F.split(F.lower(F.coalesce(F.col(text_col),
                                               F.lit(""))),
                            "[^a-z0-9]+"), lambda x: x != "")
    cf = (docs.select(F.explode_outer(toks).alias("term"))
          .filter(F.col("term").isNotNull())
          .groupBy("term").agg(F.count("*").alias("cf"))
          .orderBy(F.desc("cf"), F.asc("term"))
          .limit(skip + top_n))
    w = Window.orderBy(F.desc("cf"), F.asc("term"))
    curve = (cf.select(F.row_number().over(w).alias("rank"), "cf")
             .filter(F.col("rank") > skip)
             .select(F.log(F.col("rank").cast("double")).alias("x"),
                     F.log(F.col("cf").cast("double")).alias("y")))
    return (curve.agg(
        F.count("*").cast("long").alias("n_points"),
        F.round(-F.expr("regr_slope(y, x)"), round_at).alias("s_exp"),
        F.round(F.exp(F.expr("regr_intercept(y, x)")),
                round_at).alias("c_coef")))


def missing_facet(df: DataFrame, field: str, by: str | None = None
                  ) -> DataFrame:
    """The ES ``missing`` aggregation: how many documents LACK a value
    for a field — the data-quality counterpart of ``value_count``
    (missing + value_count = doc_count, pinned here by returning all
    three). ``by``: optional bucket column (the agg nested under a
    terms agg); without it one global row (``bucket`` = NULL-free
    literal '_all').

    One conditional aggregate, map-side combinable; at 100 TB this is
    a scan + partial agg, no shuffle beyond the |buckets|-row final
    combine."""
    if field not in df.columns:
        raise ValueError(f"unknown field: {field!r}")
    key = (F.col(by).cast("string") if by is not None
           else F.lit("_all")).alias("bucket")
    out = (df.groupBy(key).agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.count(field).alias("value_count"),
        F.sum(F.col(field).isNull().cast("long")).alias("missing")))
    return out.orderBy("bucket")


def good_turing(docs: DataFrame, text_col: str = "text",
                max_r: int = 16, round_at: int = 6) -> DataFrame:
    """Good–Turing frequency-of-frequencies profile (Good 1953; the
    Gale & Sampson 1995 presentation) — the third corpus-law profiler
    next to :func:`heaps_law` and :func:`zipf_law`: how many DISTINCT
    terms occur exactly r times, the smoothed count r* the estimator
    assigns them, and each class's share of the token mass. n_1/N is
    the Turing estimate of UNSEEN-species mass — what a 100-TB crawl
    still hasn't shown you, the number that says whether the term
    dictionary has converged.

    Returns one row per frequency class r = 1..``max_r``:

        (r, n_r, r_star, mass_frac)
        r_star    = (r + 1) * n_{r+1} / n_r   (NULL when n_{r+1}
                                               is absent — the raw
                                               estimator's gap)
        mass_frac = r * n_r / N               (N = total tokens)

    ordered by r. Plan: one token aggregate (cf per term), one
    |vocab|-row aggregate to frequency classes, a lead() window over
    <= max_r rows — corpus-size-independent memory past the first
    combine."""
    if max_r < 1:
        raise ValueError(f"max_r must be >= 1, got {max_r}")
    toks = F.filter(F.split(F.lower(F.coalesce(F.col(text_col),
                                               F.lit(""))),
                            "[^a-z0-9]+"), lambda x: x != "")
    cf = (docs.select(F.explode_outer(toks).alias("term"))
          .filter(F.col("term").isNotNull())
          .groupBy("term").agg(F.count("*").alias("cf")))
    # materialize the (tiny, vocab-bounded) class relation ONCE — the
    # eager localCheckpoint runs the corpus scan a single time; both
    # the driver-side total and the returned lineage read the
    # checkpoint instead of recomputing the dominant aggregate
    nr_all = (cf.groupBy(F.col("cf").alias("r"))
              .agg(F.count("*").alias("n_r"))
              .localCheckpoint())
    row = nr_all.agg(F.sum(F.col("r") * F.col("n_r")).alias("t")) \
                .collect()[0]
    total = row["t"]
    if not total:
        raise ValueError("empty corpus")
    # keep class max_r+1 through the window so r = max_r still gets
    # its r* from the real n_{r+1}; drop it in the final select
    nr = nr_all.filter(F.col("r") <= max_r + 1)
    w = Window.orderBy(F.asc("r"))
    nxt = F.lead("n_r").over(w)
    nxt_r = F.lead("r").over(w)
    # lead() pairs adjacent ROWS; r+1 may be an empty class (no term
    # occurs exactly r+1 times), in which case n_{r+1} = 0 -> NULL gap
    r_star = F.when(nxt_r == F.col("r") + 1,
                    (F.col("r") + 1.0) * nxt / F.col("n_r"))
    # window first (over classes up to max_r+1), cut after — Catalyst
    # cannot push a non-partition-key filter below the window, so the
    # lead() at r = max_r still sees the real n_{r+1}
    full = nr.select(
        F.col("r").cast("long").alias("r"),
        F.col("n_r").cast("long").alias("n_r"),
        F.round(r_star, round_at).alias("r_star"),
        F.round(F.col("r") * F.col("n_r") / F.lit(float(total)),
                round_at).alias("mass_frac"))
    return full.filter(F.col("r") <= max_r).orderBy("r")


def drill_sideways(df: DataFrame, filters: dict[str, object],
                   facet_cols: list[str] | None = None,
                   top: int | None = None) -> DataFrame:
    """Lucene ``DrillSideways`` faceting (lucene/facet
    ``DrillSideways.search``): given a drill-down with constraints on
    several dimensions, return for EACH dimension the facet counts
    computed with that dimension's own constraint REMOVED and all other
    constraints applied — the counts a UI shows next to the sibling
    values of every selected filter ("lang: en (120) | de (41) ..."
    while source=src18 stays applied).  ``facet_cols`` adds
    unconstrained dimensions, which count under ALL filters (plain
    drill-down facets).

    Returns (dim, value, n_docs), NULL dimension values skipped (the
    :func:`missing_facet` concern), ordered by (dim, n_docs desc,
    value); ``top`` keeps the ``top`` heaviest values per dimension.

    Scale shape: ONE scan — each row emits at most one (dim, value)
    struct per dimension through a filtered array + explode (no
    k-scans-for-k-dims union), then one map-side-combinable groupBy;
    the optional per-dim cut windows over #dims partitions of
    value-cardinality rows, never over docs."""
    if not filters:
        raise ValueError("filters must name at least one dimension")
    dims = list(filters) + [c for c in (facet_cols or [])
                            if c not in filters]
    arms = []
    for dim in dims:
        cond = F.lit(True)
        for c, v in filters.items():
            if c != dim:
                cond = cond & (F.col(c) == F.lit(v))
        cond = cond & F.col(dim).isNotNull()
        arms.append(F.when(cond, F.struct(
            F.lit(dim).alias("dim"),
            F.col(dim).cast("string").alias("value"))))
    cells = F.filter(F.array(*arms), lambda x: x.isNotNull())
    out = (df.select(F.explode(cells).alias("s"))
           .groupBy(F.col("s.dim").alias("dim"),
                    F.col("s.value").alias("value"))
           .agg(F.count(F.lit(1)).alias("n_docs")))
    if top is not None:
        if top < 1:
            raise ValueError(f"top must be >= 1, got {top}")
        w = Window.partitionBy("dim").orderBy(F.desc("n_docs"),
                                              F.asc("value"))
        out = (out.withColumn("_r", F.row_number().over(w))
               .filter(F.col("_r") <= top).drop("_r"))
    return out.orderBy("dim", F.desc("n_docs"), "value")
