"""Query engine: top-k BM25, document-at-a-time with block-max WAND.

The reference snapshot has no ranker (SURVEY.md §3.4); the pinned spec is
Robertson/Zaragoza BM25 (k1=1.2, b=0.75) + Ding & Suel block-max WAND
(SIGIR'11), scores summed in ascending term order so results are
bit-comparable to the single-threaded oracle (tests/oracle.py).

Distributed shape: the sharded index aligns every term's postings on the
same global doc_id ranges (build.py), so each shard holds *all* query
terms' postings for its doc range — document-at-a-time scoring
parallelizes per shard with no cross-shard traffic:

  index.filter(term IN qterms)      # term-pruned columnar scan
    -> repartition('shard')
    -> applyInPandas(per-shard DAAT WAND -> local top-k)
    -> orderBy(score desc, doc_id asc).limit(k)    # tiny global merge

At 10^12 docs each task scores one bounded doc range; the global merge
moves only num_shards*k rows.
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from index_spark.functions import varbyte as vb
from index_spark.functions.text import tokenize
from index_spark.operators.build import B, BLOCK_SIZE, K1

TOPK_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("score", T.DoubleType(), False),
])


def _decode_lists(pdf: pd.DataFrame):
    """Decode a shard's (term -> docs, tfs, blocks) from blob rows."""
    lists = []
    for row in pdf.itertuples(index=False):
        deltas = vb.decode(row.doc_blob).astype(np.int64)
        docs = np.cumsum(deltas)
        tfs = vb.decode(row.tf_blob).astype(np.int64)
        lists.append((row.term, docs, tfs, row.blocks, float(row.idf)))
    # ascending term order pins the score summation order
    lists.sort(key=lambda x: x[0])
    return lists


def _score_shard_exhaustive(pdf: pd.DataFrame, avgdl: float,
                            doc_len: np.ndarray, base_doc: int,
                            k: int) -> pd.DataFrame:
    """Vectorized exhaustive DAAT over one shard (numpy scatter-add)."""
    lists = _decode_lists(pdf)
    if not lists:
        return pd.DataFrame({"doc_id": [], "score": []})
    lo = min(int(l[1][0]) for l in lists)
    hi = max(int(l[1][-1]) for l in lists)
    width = hi - lo + 1
    acc = np.zeros(width, dtype=np.float64)
    for term, docs, tfs, blocks, idf in lists:
        dl = doc_len[docs - base_doc]
        contrib = idf * tfs / (tfs + K1 * (1.0 - B + B * dl / avgdl))
        acc[docs - lo] += contrib
    nz = np.flatnonzero(acc)
    if nz.size == 0:
        return pd.DataFrame({"doc_id": [], "score": []})
    scores = acc[nz]
    order = np.lexsort((nz, -scores))[:k]  # score desc, doc_id asc
    return pd.DataFrame({"doc_id": (nz + lo).astype(np.int64)[order],
                         "score": scores[order]})


def _score_shard_wand(pdf: pd.DataFrame, avgdl: float,
                      doc_len: np.ndarray, base_doc: int,
                      k: int) -> pd.DataFrame:
    """Block-max WAND: score-exact top-k with block skipping.

    Classic DAAT WAND pivoting (term lists sorted by current doc_id;
    skip when the sum of max upper bounds of lists above the pivot is
    below the heap threshold), refined with per-block upper bounds.
    """
    lists = _decode_lists(pdf)
    if not lists:
        return pd.DataFrame({"doc_id": [], "score": []})

    # cursors: [ptr, term_order] per list; block ubs as arrays
    n = len(lists)
    ptrs = [0] * n
    docs_arr = [l[1] for l in lists]
    tfs_arr = [l[2] for l in lists]
    idfs = [l[4] for l in lists]
    blk_last = [np.array([b["last_doc"] for b in l[3]], dtype=np.int64) for l in lists]
    blk_ub = [np.array([b["ub"] for b in l[3]], dtype=np.float64) for l in lists]
    max_ub = [float(u.max()) for u in blk_ub]

    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top-k
    theta = 0.0

    def cur_doc(i: int) -> int:
        p = ptrs[i]
        return int(docs_arr[i][p]) if p < docs_arr[i].size else 1 << 62

    def block_ub_at(i: int, doc: int) -> float:
        bi = int(np.searchsorted(blk_last[i], doc, side="left"))
        if bi >= blk_ub[i].size:
            return 0.0
        return float(blk_ub[i][bi])

    live = list(range(n))
    while True:
        live = [i for i in live if ptrs[i] < docs_arr[i].size]
        if not live:
            break
        live.sort(key=cur_doc)
        # find pivot: smallest prefix whose summed max_ub exceeds theta
        acc_ub = 0.0
        pivot = -1
        for j, i in enumerate(live):
            acc_ub += max_ub[i]
            if len(heap) < k or acc_ub >= theta:
                pivot = j
                break
        if pivot < 0:
            break
        pivot_doc = cur_doc(live[pivot])
        if pivot_doc >= (1 << 62):
            break
        # block-max refinement on the pivot prefix; skip only when the
        # bound is STRICTLY below theta so exact ties (dup docs) survive
        block_sum = sum(block_ub_at(i, pivot_doc) for i in live[: pivot + 1])
        if len(heap) >= k and block_sum < theta:
            # safe jump target: past the earliest block boundary among the
            # prefix lists (beyond it at least one block ub changes)
            nxt = pivot_doc + 1
            boundaries = []
            for i in live[: pivot + 1]:
                bi = int(np.searchsorted(blk_last[i], pivot_doc, side="left"))
                if bi < blk_last[i].size:
                    boundaries.append(int(blk_last[i][bi]) + 1)
            if boundaries:
                nxt = max(nxt, min(boundaries))
            adv = max(live[: pivot + 1], key=lambda i: max_ub[i])
            ptrs[adv] = int(np.searchsorted(docs_arr[adv], nxt, side="left"))
            continue
        if cur_doc(live[0]) == pivot_doc:
            # all prefix lists aligned on pivot_doc -> full evaluation,
            # summed in ascending term order (lists already term-sorted:
            # iterate original index order)
            score = 0.0
            dl = float(doc_len[pivot_doc - base_doc])
            norm = K1 * (1.0 - B + B * dl / avgdl)
            for i in range(n):
                if ptrs[i] < docs_arr[i].size and int(docs_arr[i][ptrs[i]]) == pivot_doc:
                    tf = float(tfs_arr[i][ptrs[i]])
                    score += idfs[i] * tf / (tf + norm)
                    ptrs[i] += 1
            item = (score, -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
            if len(heap) >= k:
                theta = heap[0][0]
        else:
            # advance all lists before the pivot up to pivot_doc
            for i in live[:pivot]:
                if cur_doc(i) < pivot_doc:
                    ptrs[i] = int(np.searchsorted(docs_arr[i], pivot_doc, side="left"))

    rows = sorted(((s, -nd) for s, nd in heap), key=lambda x: (-x[0], x[1]))
    return pd.DataFrame({"doc_id": [int(d) for _, d in rows],
                         "score": [float(s) for s, _ in rows]})


def search(index: DataFrame, docs: DataFrame, stats: dict, query: str,
           k: int = 10, stem: bool = True, use_wand: bool = True,
           shard_size: int = 4096) -> DataFrame:
    """Top-k BM25 over the sharded index. Returns (doc_id, score)."""
    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem)))
    if not qterms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]

    hits = index.filter(F.col("term").isin(qterms))
    # per-term global df for idf: sum of shard dfs (exact — one posting
    # per (term, doc), ranges disjoint)
    tstats = hits.groupBy("term").agg(F.sum("df").alias("df_g"))
    hits = hits.join(F.broadcast(tstats), "term").withColumn(
        "idf",
        F.log((F.lit(float(n_docs)) - F.col("df_g") + 0.5) / (F.col("df_g") + 0.5) + 1.0),
    )

    # doc_len lookup per shard: ship the shard's slice via cogroup-free
    # trick — doc lengths are derivable from the docs dimension; for the
    # per-shard UDF we pass a dense doc_len array per shard
    dl_df = docs.withColumn("shard", (F.col("doc_id") / F.lit(shard_size)).cast("long"))

    scorer = _score_shard_wand if use_wand else _score_shard_exhaustive

    def fn(key, idx_pdf, dl_pdf) -> pd.DataFrame:
        if len(idx_pdf) == 0:
            return pd.DataFrame({"doc_id": [], "score": []})
        base = int(key[0]) * shard_size
        dl = np.zeros(shard_size, dtype=np.float64)
        ids = dl_pdf["doc_id"].to_numpy() - base
        dl[ids] = dl_pdf["doc_len"].to_numpy()
        return scorer(idx_pdf, avgdl, dl, base, k)

    local = (
        hits.groupBy("shard")
        .cogroup(dl_df.groupBy("shard"))
        .applyInPandas(fn, schema=TOPK_SCHEMA)
    )
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
