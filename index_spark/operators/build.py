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
    T.StructField("dl_blob", T.BinaryType(), False),
    T.StructField("skips", T.ArrayType(
        T.StructType([
            T.StructField("idx", T.LongType(), False),
            T.StructField("doc", T.LongType(), False),
        ])), False),
    T.StructField("blocks", T.ArrayType(
        T.StructType([
            T.StructField("start", T.LongType(), False),
            T.StructField("last_doc", T.LongType(), False),
            T.StructField("max_tf", T.LongType(), False),
            T.StructField("min_dl", T.DoubleType(), False),
        ])), False),
    T.StructField("max_tf", T.LongType(), False),
    T.StructField("min_dl", T.DoubleType(), False),
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
    """(term, doc_id, tf[, positions], doc_len) — map-side combinable agg.

    Kept for position-carrying builds; the fused ``doc_term_counts`` path
    below is the fast path when positions aren't needed (it counts inside
    the tokenize UDF and skips this 1-row-per-token shuffle entirely)."""
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


_COUNTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("term", T.StringType(), False),
    T.StructField("tf", T.LongType(), False),
    T.StructField("doc_len", T.LongType(), False),
])


def doc_term_counts(corpus_with_ids: DataFrame, stem: bool = True,
                    text_col: str = "content") -> DataFrame:
    """Fused tokenize + per-doc term counting in ONE Arrow pass.

    Emits (doc_id, term, tf, doc_len) — already aggregated per document,
    so the per-token explode + groupBy(term, doc_id) shuffle of the naive
    plan disappears; the only shuffle left in the whole build is the
    groupBy(shard) of the blob stage. Counting is vectorized for the
    whole batch: factorize terms, combine (doc, term) into one int64 key,
    count with np.unique on ints.

    Empty documents emit a single sentinel row (term='', tf=0) so
    docs/stats stay exact; the index build filters it out.
    """
    import gc

    from index_spark.functions.text import tokenize_flat

    # CPython's generational GC goes superlinear when millions of small
    # objects (token strings) are alive at once: every gen-2 collection
    # walks them all. Working in bounded sub-batches with the collector
    # paused keeps the kernel linear — measured 2.5-10x on 4096-doc Arrow
    # batches.
    SUB_BATCH = 512

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        doc_ids = pdf["doc_id"].to_numpy()
        flat, lens = tokenize_flat(pdf[text_col], stem=stem)
        if flat.size == 0:
            return pd.DataFrame({"doc_id": doc_ids,
                                 "term": [""] * n,
                                 "tf": np.zeros(n, dtype=np.int64),
                                 "doc_len": np.zeros(n, dtype=np.int64)})
        codes, uniques = pd.factorize(flat)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        key = doc_idx * len(uniques) + codes
        uk, counts = np.unique(key, return_counts=True)  # int sort: fast
        d = uk // len(uniques)
        t = uk % len(uniques)
        out = pd.DataFrame({
            "doc_id": doc_ids[d],
            "term": np.asarray(uniques, dtype=object)[t],
            "tf": counts.astype(np.int64),
            "doc_len": lens[d],
        })
        empty = np.flatnonzero(lens == 0)
        if empty.size:
            out = pd.concat([out, pd.DataFrame({
                "doc_id": doc_ids[empty], "term": [""] * empty.size,
                "tf": np.zeros(empty.size, dtype=np.int64),
                "doc_len": np.zeros(empty.size, dtype=np.int64)})],
                ignore_index=True)
        return out

    def fn(batches):
        gc_was_on = gc.isenabled()
        try:
            for pdf in batches:
                if gc_was_on:
                    gc.disable()
                for lo in range(0, len(pdf), SUB_BATCH):
                    yield _one(pdf.iloc[lo : lo + SUB_BATCH])
                if gc_was_on:
                    gc.enable()
                    gc.collect(0)
        finally:
            if gc_was_on and not gc.isenabled():
                gc.enable()

    cols = [c for c in corpus_with_ids.columns if c in ("doc_id", text_col)]
    return corpus_with_ids.select(*cols).mapInPandas(fn, schema=_COUNTS_SCHEMA)


def corpus_stats(tok_docs: DataFrame) -> dict:
    row = tok_docs.agg(
        F.count("*").alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
        F.sum("doc_len").alias("total_tokens"),
    ).collect()[0]
    return {"n_docs": row["n_docs"], "avgdl": float(row["avgdl"] or 0.0),
            "total_tokens": row["total_tokens"]}


def _build_shard(pdf: pd.DataFrame) -> pd.DataFrame:
    """Build ALL term blobs of one shard in one vectorized kernel.

    One applyInPandas call per *shard* (not per (term, shard)) — per-call
    overhead amortizes over every term in the shard, and the varbyte
    encode runs ONCE over the shard's whole delta stream; per-term blobs
    are byte-range slices located via encoded_lengths cumsums.

    Semantics per term are unchanged: sorted doc_ids -> deltas (first
    absolute) + varbyte; skip pointers at power-of-two doc_id crossings
    (reference index.h:276-281); 128-posting block-max (max_tf, min_dl).
    """
    shard = int(pdf["shard"].iloc[0])
    term_codes, terms = pd.factorize(pdf["term"])
    docs = pdf["doc_id"].to_numpy().astype(np.int64)
    tfs = pdf["tf"].to_numpy().astype(np.int64)
    dls = pdf["doc_len"].to_numpy().astype(np.int64)

    order = np.lexsort((docs, term_codes))
    tc = term_codes[order]
    docs, tfs, dls = docs[order], tfs[order], dls[order]

    starts = np.concatenate(([0], np.flatnonzero(np.diff(tc)) + 1))
    ends = np.concatenate((starts[1:], [len(tc)]))
    term_of_group = np.asarray(terms, dtype=object)[tc[starts]]

    deltas = docs.copy()
    deltas[1:] -= docs[:-1]
    deltas[starts] = docs[starts]  # first posting of each term: absolute

    # one encode per stream; per-term byte ranges from length cumsums
    def _enc_with_offsets(vals: np.ndarray):
        lens = vb.encoded_lengths(vals.astype(np.uint64))
        cum = np.concatenate(([0], np.cumsum(lens)))
        return vb.encode(vals.astype(np.uint64)), cum

    doc_bytes, doc_cum = _enc_with_offsets(deltas)
    tf_bytes, tf_cum = _enc_with_offsets(tfs)
    dl_bytes, dl_cum = _enc_with_offsets(dls)

    # per-term aggregates, vectorized via reduceat
    df_g = (ends - starts).astype(np.int64)
    cf_g = np.add.reduceat(tfs, starts)
    first_doc = docs[starts]
    last_doc = docs[ends - 1]
    max_tf_g = np.maximum.reduceat(tfs, starts)
    min_dl_g = np.minimum.reduceat(dls, starts)

    n_terms = len(starts)
    doc_blobs = [doc_bytes[doc_cum[s] : doc_cum[e]] for s, e in zip(starts, ends)]
    tf_blobs = [tf_bytes[tf_cum[s] : tf_cum[e]] for s, e in zip(starts, ends)]
    dl_blobs = [dl_bytes[dl_cum[s] : dl_cum[e]] for s, e in zip(starts, ends)]

    skips_col = []
    blocks_col = []
    for g in range(n_terms):
        s, e = int(starts[g]), int(ends[g])
        d = docs[s:e]
        md = int(d[-1])
        pows = 2 ** np.arange(0, max(md, 1).bit_length() + 1, dtype=np.int64)
        pows = pows[pows <= md]
        sk_idx = np.unique(np.searchsorted(d, pows, side="left"))
        skips_col.append([(int(i), int(d[i])) for i in sk_idx])
        nb = (e - s + BLOCK_SIZE - 1) // BLOCK_SIZE
        blocks = []
        for bi in range(nb):
            lo, hi = s + bi * BLOCK_SIZE, min(s + (bi + 1) * BLOCK_SIZE, e)
            blocks.append((int(lo - s), int(docs[hi - 1]),
                           int(tfs[lo:hi].max()), float(dls[lo:hi].min())))
        blocks_col.append(blocks)

    return pd.DataFrame({
        "term": term_of_group,
        "shard": np.full(n_terms, shard, dtype=np.int64),
        "df": df_g,
        "cf": cf_g.astype(np.int64),
        "first_doc": first_doc,
        "last_doc": last_doc,
        "doc_blob": doc_blobs,
        "tf_blob": tf_blobs,
        "dl_blob": dl_blobs,
        "skips": skips_col,
        "blocks": blocks_col,
        "max_tf": max_tf_g.astype(np.int64),
        "min_dl": min_dl_g.astype(np.float64),
    })


def build_sharded_index(post_df: DataFrame,
                        shard_size: int = DEFAULT_SHARD_SIZE) -> DataFrame:
    """(term, doc_id, tf, doc_len) rows -> sharded blob index.

    ONE shuffle: groupBy(shard). A shard is a bounded doc_id range, so
    reducer keys stay bounded no matter how hot a term is (the explicit
    skew handling — a term like ``import`` is split across every shard).
    Inside each shard the kernel is vectorized numpy over all terms.
    No global statistics are needed at build time (block-max stores raw
    (max_tf, min_dl)), so chunked/resumable builds compose without
    cross-chunk coordination.
    """
    sharded = post_df.filter(F.col("term") != "").withColumn(
        "shard", (F.col("doc_id") / F.lit(shard_size)).cast("long")
    )
    return sharded.groupBy("shard").applyInPandas(_build_shard, schema=INDEX_SCHEMA)


def doc_lengths(counts: DataFrame) -> DataFrame:
    """(doc_id, doc_len) from the fused counts (includes empty docs)."""
    return counts.groupBy("doc_id").agg(F.first("doc_len").alias("doc_len"))


def stats_from_doclens(doclens: DataFrame) -> dict:
    row = doclens.agg(
        F.count("*").alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
        F.sum("doc_len").alias("total_tokens"),
    ).collect()[0]
    return {"n_docs": row["n_docs"], "avgdl": float(row["avgdl"] or 0.0),
            "total_tokens": row["total_tokens"]}


def build_index(corpus: DataFrame, stem: bool = True,
                shard_size: int = DEFAULT_SHARD_SIZE):
    """Full build: corpus -> (docs_df, index_df, stats).

    Plan (exactly one heavy shuffle):
      scan -> assign ids (range partition) -> fused tokenize+count UDF
           -> groupBy(shard) -> vectorized blob kernel -> index rows

    docs_df is the docID -> (repo, path) dimension (the reference's
    ``vector<string> documents``, index.h:294).
    """
    with_ids = assign_doc_ids(corpus)
    counts = doc_term_counts(with_ids, stem=stem).persist()
    doclens = doc_lengths(counts)
    stats = stats_from_doclens(doclens)
    index = build_sharded_index(counts, shard_size=shard_size)
    docs = with_ids.select("doc_id", "repo", "path").join(doclens, "doc_id")
    return docs, index, stats
