"""Learning-to-rank feature extraction.

The training-data side of the query engine: for every (query, candidate
document) pair, emit the classic lexical feature vector (MSLR / ES LTR
plugin style) that a downstream ranker trains on — BM25, matched-term
counts, coverage, tf mass, idf statistics, document length. The
reference snapshot has no ranker (SURVEY.md §3.4), so the pinned spec
is the same Robertson/Zaragoza BM25 contract as operators/query.py.

Plan shape: the same one-exchange sharded-decode kernel as the scoring
paths — candidates are exactly the docs matching >= 1 query term, every
feature is a per-(term, doc) posting contribution folded with
sum/count/max (all map-side decomposable), and because the index is
doc-range sharded every doc's postings for all query terms live in ONE
shard, so per-shard aggregation is already complete per doc: no second
aggregate after the exchange. At 10^12 docs the feature relation
streams straight to the feature store partitioned by query batch.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from index_spark.functions import varbyte as vb
from index_spark.functions.text import tokenize
from index_spark.operators.build import B, K1
from index_spark.operators.query import pin_zone

LTR_SCHEMA = T.StructType([
    T.StructField("query_id", T.LongType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("bm25", T.DoubleType(), False),
    T.StructField("sum_tf", T.LongType(), False),
    T.StructField("n_matched", T.LongType(), False),
    T.StructField("coverage", T.DoubleType(), False),
    T.StructField("sum_idf", T.DoubleType(), False),
    T.StructField("max_idf", T.DoubleType(), False),
    T.StructField("dl", T.LongType(), False),
])


def ltr_features(index: DataFrame, stats: dict,
                 queries: dict[int, str], stem: bool = True,
                 camel: bool = True, zone: str | None = None,
                 order_global: bool = False) -> DataFrame:
    """Per-(query, candidate-doc) LTR features over the sharded index.

    Candidates: docs matching >= 1 query term (the standard first-stage
    recall set; cut it downstream if a top-k candidate cap is wanted).
    Features, all pinned so a SQL oracle restates them:

        bm25      sum_t idf_t * tf/(tf + k1*(1-b+b*dl/avgdl))  [4dp]
        sum_tf    total tf of matched query terms
        n_matched number of DISTINCT matched query terms
        coverage  n_matched / |distinct query terms|            [6dp]
        sum_idf   sum of idf over matched terms                 [6dp]
        max_idf   max idf over matched terms                    [6dp]
        dl        document length (tokens)

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)) with GLOBAL df from the
    segment metadata (bounded aggregate, no blob decode). Each term
    row decodes ONCE even when several queries share the term.

    Rows come back sorted (query_id, doc_id) WITHIN each partition
    only; the feature relation is unbounded and a global total sort
    would cost an extra exchange before it streams to the feature
    store. Pass ``order_global=True`` for the pre-r4 globally-ordered
    contract (one extra range exchange)."""
    spark = index.sparkSession
    qterms: dict[int, list[str]] = {}
    for qid, qtext in queries.items():
        ts = sorted(set(tokenize(qtext, stem=stem, camel=camel)))
        if ts:
            qterms[int(qid)] = ts
    if not qterms:
        return spark.createDataFrame([], LTR_SCHEMA)
    all_terms = sorted({t for ts in qterms.values() for t in ts})
    n_docs = float(stats.get("n_docs") or 0)
    avgdl = float(stats.get("avgdl") or 0)
    if n_docs <= 0 or avgdl <= 0:
        raise ValueError("stats['n_docs'] and stats['avgdl'] must be "
                         "positive (zoned index: pass the pinned "
                         "zone's stats)")
    index = pin_zone(index, zone)
    if "shard" not in index.columns:
        index = index.withColumn("shard", F.lit(0))
    matched = index.filter(F.col("term").isin(all_terms))
    idf = {r["term"]: math.log(1.0 + (n_docs - float(r["df"]) + 0.5)
                               / (float(r["df"]) + 0.5))
           for r in matched.select("term", "df").groupBy("term")
                           .agg(F.sum("df").alias("df")).collect()}
    if not idf:
        return spark.createDataFrame([], LTR_SCHEMA)
    hits = matched.filter(F.col("term").isin(sorted(idf))) \
                  .select("shard", "term", "doc_blob", "tf_blob",
                          "dl_blob")
    qlist = sorted(qterms.items())

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        per_term: dict[str, list[tuple]] = {}
        for row in pdf.itertuples(index=False):
            docs = np.cumsum(vb.decode(row.doc_blob).astype(np.int64))
            tfs = vb.decode(row.tf_blob).astype(np.int64)
            dls = vb.decode(row.dl_blob).astype(np.int64)
            per_term.setdefault(row.term, []).append((docs, tfs, dls))
        frames = []
        for qid, terms in qlist:
            present = [t for t in terms if t in per_term]
            if not present:
                continue
            d_l, tf_l, dl_l, w_l = [], [], [], []
            for t in present:        # ascending-term pinned order
                for docs, tfs, dls in per_term[t]:
                    d_l.append(docs)
                    tf_l.append(tfs)
                    dl_l.append(dls)
                    w_l.append(np.full(docs.size, idf[t]))
            docs = np.concatenate(d_l)
            tfs = np.concatenate(tf_l).astype(np.float64)
            dls = np.concatenate(dl_l).astype(np.float64)
            ws = np.concatenate(w_l)
            part = ws * tfs / (tfs + K1 * (1.0 - B + B * dls / avgdl))
            uniq, inv = np.unique(docs, return_inverse=True)
            bm25 = np.zeros(uniq.size)
            np.add.at(bm25, inv, part)
            sum_tf = np.zeros(uniq.size, np.int64)
            np.add.at(sum_tf, inv, tfs.astype(np.int64))
            n_m = np.zeros(uniq.size, np.int64)
            np.add.at(n_m, inv, 1)
            sum_idf = np.zeros(uniq.size)
            np.add.at(sum_idf, inv, ws)
            max_idf = np.zeros(uniq.size)
            np.maximum.at(max_idf, inv, ws)
            dl_out = np.zeros(uniq.size, np.int64)
            np.maximum.at(dl_out, inv, np.concatenate(dl_l))
            frames.append(pd.DataFrame({
                "query_id": np.full(uniq.size, qid, np.int64),
                "doc_id": uniq,
                "bm25": bm25,
                "sum_tf": sum_tf,
                "n_matched": n_m,
                "coverage": n_m / float(len(terms)),
                "sum_idf": sum_idf,
                "max_idf": max_idf,
                "dl": dl_out,
            }))
        if not frames:
            return pd.DataFrame(
                {f.name: pd.Series(dtype="float64" if f.dataType ==
                                   T.DoubleType() else "int64")
                 for f in LTR_SCHEMA.fields})
        return pd.concat(frames, ignore_index=True)

    # rounds happen JVM-side (F.round, half-away like the SQL oracles);
    # np.round is banker's rounding and would diverge at exact halves
    out = (hits.groupBy("shard").applyInPandas(fn, schema=LTR_SCHEMA)
           .select("query_id", "doc_id",
                   F.round("bm25", 4).alias("bm25"),
                   "sum_tf", "n_matched",
                   F.round("coverage", 6).alias("coverage"),
                   F.round("sum_idf", 6).alias("sum_idf"),
                   F.round("max_idf", 6).alias("max_idf"),
                   "dl"))
    if order_global:
        return out.orderBy("query_id", "doc_id")
    # partition-local order only: the feature relation is unbounded
    # (every query x matching doc), and a global orderBy would
    # total-sort it through one extra exchange before it streams to
    # the feature store — callers that need a global order sort the
    # (small) slice they take, or pass order_global=True
    return out.sortWithinPartitions("query_id", "doc_id")
