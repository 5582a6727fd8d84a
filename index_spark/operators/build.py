"""Index build pipeline: corpus -> docs/postings -> sharded posting blobs.

Spark-first re-expression of the reference build kernel
(/root/reference/index.cpp:112-162 ``Index::addDocument`` and the
PostingList machinery, index.h:139-284):

  read corpus -> tokenize+normalize+stem (Arrow pandas UDF)
              -> posexplode -> groupBy(term, doc_id).agg(tf)
              -> shard = doc_id // shard_size
              -> groupBy(term, shard).applyInPandas(build blob)
              -> term+shard-keyed index table

Design notes for 100 TB / 10^12-file scale:

- **doc_id assignment** avoids the single-partition global window: range
  partition by (repo, path), sort within partitions, then per-partition
  offsets from a metadata-size count pass (classic scalable zipWithIndex).
- **sharding IS the skew handling** (north_rule's explicit hot-term
  salting, range-salt variant from SURVEY.md §4.1): every term's postings
  are range-partitioned by ``doc_id // shard_size``, so a hot term like
  ``import`` (present in ~every doc) is split into bounded-size blobs
  instead of one giant reducer key. Shard boundaries are global, so the
  shards of different terms align and the query side can run
  document-at-a-time scoring per shard. Cold terms occupy few shards by
  construction (df small), so the overhead is bounded.
- **merge to the global per-term index** (north_star's sorted-merge
  stage) is concatenation + boundary-delta patching, because range shards
  hold disjoint, ordered doc_id ranges — see :mod:`.merge`.
- blobs: sorted doc_ids -> deltas -> leading-ones varbyte
  (index.h:63-74 semantics); skip pointers at power-of-two doc_id
  crossings (index.h:276-281 semantics); block-max metadata per
  128-posting block (Ding & Suel, SIGIR'11) for WAND.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from index_spark.functions import varbyte as vb
from index_spark.functions.text import tokenize_series

K1 = 1.2
B = 0.75
BLOCK_SIZE = 128
DEFAULT_SHARD_SIZE = 4096

TOKENS_SCHEMA = T.ArrayType(T.StringType())

INDEX_SCHEMA = T.StructType([
    T.StructField("term", T.StringType(), False),
    T.StructField("shard", T.LongType(), False),
    T.StructField("df", T.LongType(), False),
    T.StructField("cf", T.LongType(), False),
    T.StructField("first_doc", T.LongType(), False),
    T.StructField("last_doc", T.LongType(), False),
    T.StructField("doc_blob", T.BinaryType(), False),
    T.StructField("tf_blob", T.BinaryType(), False),
    T.StructField("skips", T.ArrayType(
        T.StructType([
            T.StructField("idx", T.LongType(), False),
            T.StructField("doc", T.LongType(), False),
        ])), False),
    T.StructField("blocks", T.ArrayType(
        T.StructType([
            T.StructField("start", T.LongType(), False),
            T.StructField("last_doc", T.LongType(), False),
            T.StructField("ub", T.DoubleType(), False),
        ])), False),
    T.StructField("max_ub", T.DoubleType(), False),
])


def assign_doc_ids(corpus: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Deterministic doc_id = 0-based rank of (repo, path).

    Scalable zipWithIndex: range-partition + sort-within + per-partition
    offset from a count pass. No global single-partition window — the
    count pass moves only one long per partition to the driver, so this
    holds at 10^12 rows (the reference's insertion-ordinal docID,
    index.cpp:160-161, is inherently sequential; rank order replaces it).
    """
    spark = corpus.sparkSession
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 2)
    ranged = corpus.repartitionByRange(num_partitions, "repo", "path") \
                   .sortWithinPartitions("repo", "path")
    ranged = ranged.cache()  # pin range boundaries for both passes
    counts = (
        ranged.groupBy(F.spark_partition_id().alias("_pid"))
        .count()
        .collect()
    )
    by_pid = {r["_pid"]: r["count"] for r in counts}
    offsets = {}
    acc = 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]

    out_schema = T.StructType(ranged.schema.fields + [T.StructField("doc_id", T.LongType(), False)])

    def add_ids(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, 0)
        for pdf in pdf_iter:
            pdf = pdf.copy()
            pdf["doc_id"] = np.arange(base, base + len(pdf), dtype=np.int64)
            base += len(pdf)
            yield pdf

    return ranged.mapInPandas(add_ids, schema=out_schema)


def tokenized_docs(corpus_with_ids: DataFrame, stem: bool = True,
                   text_col: str = "content") -> DataFrame:
    """(doc_id, tokens, doc_len) via the vectorized tokenize+stem UDF."""

    @F.pandas_udf(TOKENS_SCHEMA)
    def _tok(texts: pd.Series) -> pd.Series:
        return tokenize_series(texts, stem=stem)

    return (
        corpus_with_ids
        .select("doc_id", _tok(F.col(text_col)).alias("tokens"))
        .withColumn("doc_len", F.size("tokens").cast("long"))
    )


def postings(tok_docs: DataFrame, positions: bool = False) -> DataFrame:
    """(term, doc_id, tf[, positions], doc_len) — map-side combinable agg."""
    exploded = tok_docs.select(
        "doc_id", "doc_len", F.posexplode("tokens").alias("pos", "term")
    )
    aggs = [
        F.count("*").alias("tf"),
        F.first("doc_len").alias("doc_len"),
    ]
    if positions:
        aggs.append(F.sort_array(F.collect_list("pos")).alias("positions"))
    return exploded.groupBy("term", "doc_id").agg(*aggs)


def corpus_stats(tok_docs: DataFrame) -> dict:
    row = tok_docs.agg(
        F.count("*").alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
        F.sum("doc_len").alias("total_tokens"),
    ).collect()[0]
    return {"n_docs": row["n_docs"], "avgdl": float(row["avgdl"] or 0.0),
            "total_tokens": row["total_tokens"]}


def _build_blob_group(pdf: pd.DataFrame, n_docs: int, avgdl: float) -> pd.DataFrame:
    """Build one (term, shard) posting blob. Runs inside applyInPandas."""
    term = pdf["term"].iloc[0]
    shard = int(pdf["shard"].iloc[0])
    order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
    docs = pdf["doc_id"].to_numpy()[order].astype(np.int64)
    tfs = pdf["tf"].to_numpy()[order].astype(np.int64)
    dls = pdf["doc_len"].to_numpy()[order].astype(np.float64)

    deltas = np.empty_like(docs)
    deltas[0] = docs[0]
    np.subtract(docs[1:], docs[:-1], out=deltas[1:])
    doc_blob = vb.encode(deltas.astype(np.uint64))
    tf_blob = vb.encode(tfs.astype(np.uint64))

    # skip pointers at power-of-two doc_id crossings (index.h:276-281)
    max_doc = int(docs[-1])
    pows = 2 ** np.arange(0, max(max_doc, 1).bit_length() + 1, dtype=np.int64)
    pows = pows[pows <= max_doc]
    sk_idx = np.searchsorted(docs, pows, side="left")
    keep = np.unique(sk_idx)
    skips = [(int(i), int(docs[i])) for i in keep]

    # block-max upper bounds (idf uses the term's GLOBAL df, carried as a
    # column so no vocabulary-sized driver state exists)
    df_local = len(docs)
    df_global = int(pdf["df_global"].iloc[0]) if "df_global" in pdf else df_local
    idf = math.log((n_docs - df_global + 0.5) / (df_global + 0.5) + 1.0)
    contrib = idf * tfs / (tfs + K1 * (1.0 - B + B * dls / avgdl))
    nblocks = (len(docs) + BLOCK_SIZE - 1) // BLOCK_SIZE
    blocks = []
    for bi in range(nblocks):
        lo, hi = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, len(docs))
        blocks.append((int(lo), int(docs[hi - 1]), float(contrib[lo:hi].max())))

    return pd.DataFrame([{
        "term": term,
        "shard": shard,
        "df": df_local,
        "cf": int(tfs.sum()),
        "first_doc": int(docs[0]),
        "last_doc": int(docs[-1]),
        "doc_blob": doc_blob,
        "tf_blob": tf_blob,
        "skips": skips,
        "blocks": blocks,
        "max_ub": float(contrib.max()),
    }])


def build_sharded_index(post_df: DataFrame, stats: dict,
                        shard_size: int = DEFAULT_SHARD_SIZE,
                        global_idf: bool = True) -> DataFrame:
    """(term, doc_id, tf, doc_len) -> sharded blob index.

    One shuffle: groupBy(term, shard). Hot terms split across all shards
    (bounded reducer keys); the blob build is a vectorized numpy kernel
    per group.
    """
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    sharded = post_df.withColumn(
        "shard", (F.col("doc_id") / F.lit(shard_size)).cast("long")
    )
    if global_idf:
        # exact global df per term (one posting row per (term, doc)),
        # joined back on term — vocabulary never touches the driver; the
        # join co-partitions with the groupBy(term, shard) that follows
        gdf = sharded.groupBy("term").agg(F.count("*").alias("df_global"))
        sharded = sharded.join(gdf, "term")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _build_blob_group(pdf, n_docs, avgdl)

    return sharded.groupBy("term", "shard").applyInPandas(fn, schema=INDEX_SCHEMA)


def build_index(corpus: DataFrame, stem: bool = True,
                shard_size: int = DEFAULT_SHARD_SIZE):
    """Full build: corpus -> (docs_df, index_df, stats).

    docs_df is the docID -> (repo, path) dimension (the reference's
    ``vector<string> documents``, index.h:294).
    """
    with_ids = assign_doc_ids(corpus)
    docs = with_ids.select("doc_id", "repo", "path")
    toks = tokenized_docs(with_ids, stem=stem)
    toks = toks.persist()
    stats = corpus_stats(toks)
    post = postings(toks)
    index = build_sharded_index(post, stats, shard_size=shard_size)
    docs = docs.join(toks.select("doc_id", "doc_len"), "doc_id")
    return docs, index, stats
