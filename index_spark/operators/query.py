"""Query engine: top-k BM25, document-at-a-time with block-max WAND.

The reference snapshot has no ranker (SURVEY.md §3.4); the pinned spec is
Robertson/Zaragoza BM25 (k1=1.2, b=0.75) + Ding & Suel block-max WAND
(SIGIR'11), scores summed in ascending term order so results are
bit-comparable to the single-threaded oracle (tests/oracle.py).

Distributed shape: the sharded index aligns every term's postings on the
same global doc_id ranges (build.py), so each shard holds *all* query
terms' postings for its doc range — document-at-a-time scoring
parallelizes per shard with no cross-shard traffic, and doc lengths ride
in the index itself (dl_blob), so the query plan is:

  index.filter(term IN qterms)        # term-pruned columnar scan
    -> groupBy('shard').applyInPandas(DAAT WAND -> local top-k)
    -> orderBy(score desc, doc_id asc).limit(k)   # tiny global merge

Exactly ONE shuffle of a few small rows per query; no join against the
docs dimension. At 10^12 docs each task scores one bounded doc range and
the global merge moves only num_shards_with_hits * k rows.

Block upper bounds are derived query-side from the stored (max_tf,
min_dl): ub = idf * max_tf / (max_tf + k1*(1-b+b*min_dl/avgdl)), valid
because the BM25 term contribution is increasing in tf and decreasing in
dl. idf uses the exact global df = sum of shard dfs of the term.
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
from index_spark.operators.build import B, K1

TOPK_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("score", T.DoubleType(), False),
])

_INF_DOC = 1 << 62


def _ub(tf, dl, idf: float, avgdl: float):
    """BM25 upper bound for a (max_tf, min_dl) pair (scalar or ndarray)."""
    return idf * tf / (tf + K1 * (1.0 - B + B * dl / avgdl))


def _decode_lists(pdf: pd.DataFrame, avgdl: float):
    """Decode a shard's rows -> per-term (docs, tfs, dls, block arrays).

    Rows may carry a per-row ``avgdl`` column (zoned indexes: each zone
    has its own doc-length distribution); absent that, the global scalar
    applies. The sum order is pinned by (term, zone) so zoned scoring
    stays deterministic."""
    lists = []
    has_avgdl = "avgdl" in pdf.columns
    has_zone = "zone" in pdf.columns
    for row in pdf.itertuples(index=False):
        docs = np.cumsum(vb.decode(row.doc_blob).astype(np.int64))
        tfs = vb.decode(row.tf_blob).astype(np.int64)
        dls = vb.decode(row.dl_blob).astype(np.float64)
        idf = float(row.idf)
        l_avgdl = float(row.avgdl) if has_avgdl else avgdl
        blk_last = np.fromiter((b["last_doc"] for b in row.blocks), np.int64)
        blk_ub = _ub(
            np.fromiter((b["max_tf"] for b in row.blocks), np.float64),
            np.fromiter((b["min_dl"] for b in row.blocks), np.float64),
            idf, l_avgdl)
        sort_key = (row.term, row.zone if has_zone else "")
        lists.append((sort_key, docs, tfs, dls, idf, blk_last, blk_ub,
                      l_avgdl))
    lists.sort(key=lambda x: x[0])  # ascending (term, zone) = pinned order
    return lists


def _score_shard_exhaustive(pdf: pd.DataFrame, avgdl: float, k: int) -> pd.DataFrame:
    """Vectorized exhaustive DAAT over one shard (numpy scatter-add)."""
    lists = _decode_lists(pdf, avgdl)
    if not lists:
        return pd.DataFrame({"doc_id": [], "score": []})
    lo = min(int(l[1][0]) for l in lists)
    hi = max(int(l[1][-1]) for l in lists)
    acc = np.zeros(hi - lo + 1, dtype=np.float64)
    for _, docs, tfs, dls, idf, _, _, l_avgdl in lists:
        acc[docs - lo] += idf * tfs / (tfs + K1 * (1.0 - B + B * dls / l_avgdl))
    nz = np.flatnonzero(acc)
    if nz.size == 0:
        return pd.DataFrame({"doc_id": [], "score": []})
    scores = acc[nz]
    order = np.lexsort((nz, -scores))[:k]  # score desc, doc_id asc
    return pd.DataFrame({"doc_id": (nz + lo).astype(np.int64)[order],
                         "score": scores[order]})


def _score_shard_wand(pdf: pd.DataFrame, avgdl: float, k: int) -> pd.DataFrame:
    """Block-max WAND: score-exact top-k with block skipping."""
    lists = _decode_lists(pdf, avgdl)
    if not lists:
        return pd.DataFrame({"doc_id": [], "score": []})
    n = len(lists)
    ptrs = [0] * n
    docs_arr = [l[1] for l in lists]
    tfs_arr = [l[2] for l in lists]
    dls_arr = [l[3] for l in lists]
    idfs = [l[4] for l in lists]
    blk_last = [l[5] for l in lists]
    blk_ub = [l[6] for l in lists]
    avgdls = [l[7] for l in lists]
    max_ub = [float(u.max()) for u in blk_ub]

    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top-k
    theta = 0.0

    def cur_doc(i: int) -> int:
        p = ptrs[i]
        return int(docs_arr[i][p]) if p < docs_arr[i].size else _INF_DOC

    def block_ub_at(i: int, doc: int) -> float:
        bi = int(np.searchsorted(blk_last[i], doc, side="left"))
        return float(blk_ub[i][bi]) if bi < blk_ub[i].size else 0.0

    live = list(range(n))
    while True:
        live = [i for i in live if ptrs[i] < docs_arr[i].size]
        if not live:
            break
        live.sort(key=cur_doc)
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
        if pivot_doc >= _INF_DOC:
            break
        # extend the pivot through lists tied at pivot_doc — with
        # fragmented per-range lists, several lists commonly sit on the
        # same doc; their upper bounds must count before any skip
        ext = pivot
        while ext + 1 < len(live) and cur_doc(live[ext + 1]) == pivot_doc:
            ext += 1
        # block-max refinement; skip only when STRICTLY below theta so
        # exact ties (duplicate docs) survive
        block_sum = sum(block_ub_at(i, pivot_doc) for i in live[: ext + 1])
        if len(heap) >= k and block_sum < theta:
            nxt = pivot_doc + 1
            boundaries = []
            for i in live[: ext + 1]:
                bi = int(np.searchsorted(blk_last[i], pivot_doc, side="left"))
                if bi < blk_last[i].size:
                    boundaries.append(int(blk_last[i][bi]) + 1)
            if boundaries:
                nxt = max(nxt, min(boundaries))
            if ext + 1 < len(live):
                # the window may not cross the next list's current doc —
                # its contribution is not in block_sum
                nxt = min(nxt, cur_doc(live[ext + 1]))
            adv = max(live[: ext + 1], key=lambda i: max_ub[i])
            ptrs[adv] = int(np.searchsorted(docs_arr[adv], nxt, side="left"))
            continue
        if cur_doc(live[0]) == pivot_doc:
            # aligned -> full evaluation in ascending term order
            score = 0.0
            for i in range(n):
                p = ptrs[i]
                if p < docs_arr[i].size and int(docs_arr[i][p]) == pivot_doc:
                    tf = float(tfs_arr[i][p])
                    dl = float(dls_arr[i][p])
                    score += idfs[i] * tf / (tf + K1 * (1.0 - B + B * dl / avgdls[i]))
                    ptrs[i] += 1
            item = (score, -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
            if len(heap) >= k:
                theta = heap[0][0]
        else:
            for i in live[:pivot]:
                if cur_doc(i) < pivot_doc:
                    ptrs[i] = int(np.searchsorted(docs_arr[i], pivot_doc, side="left"))

    rows = sorted(((s, -nd) for s, nd in heap), key=lambda x: (-x[0], x[1]))
    return pd.DataFrame({"doc_id": [int(d) for _, d in rows],
                         "score": [float(s) for s, _ in rows]})


# below this many postings in a shard, the numpy scatter-add exhaustive
# scan beats the pointer-chasing WAND loop (both are score-exact)
AUTO_WAND_MIN_POSTINGS = 200_000


def search(index: DataFrame, docs: DataFrame | None, stats: dict, query: str,
           k: int = 10, stem: bool = True, use_wand: bool | str = "auto",
           shard_size: int = 4096, camel: bool = True) -> DataFrame:
    """Top-k BM25 over the sharded index. Returns (doc_id, score).

    ``use_wand``: True (always WAND), False (always exhaustive), or
    "auto" — per shard, exhaustive below AUTO_WAND_MIN_POSTINGS postings,
    WAND above. All modes are score-exact; auto just picks the faster
    kernel for the density.

    ``docs`` is accepted for API symmetry but unused — doc lengths live in
    the index (dl_blob); ``shard_size`` likewise (shard ids are stored).
    """
    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    if not qterms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]

    if "shard" not in index.columns:
        # a merged global index (merge_shards output) is one doc-range
        # row per term — score it as a single logical shard
        index = index.withColumn("shard", F.lit(0))
    hits = index.filter(F.col("term").isin(qterms))
    # exact global df per term = sum of its shard dfs (ranges disjoint).
    # A map-side-combined aggregate + BROADCAST join-back (the stats
    # relation is <= |query terms| rows): the hit rows never shuffle by
    # term. A window over term would funnel a hot term's every shard row
    # into one task at 10^12-doc shard counts.
    dfs = hits.groupBy("term").agg(F.sum("df").alias("df_g"))
    hits = hits.join(F.broadcast(dfs), "term").withColumn(
        "idf",
        F.log((F.lit(float(n_docs)) - F.col("df_g") + 0.5) / (F.col("df_g") + 0.5) + 1.0),
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if use_wand == "auto":
            wand = int(pdf["df"].sum()) >= AUTO_WAND_MIN_POSTINGS
        else:
            wand = bool(use_wand)
        scorer = _score_shard_wand if wand else _score_shard_exhaustive
        return scorer(pdf, avgdl, k)

    local = hits.groupBy("shard").applyInPandas(fn, schema=TOPK_SCHEMA)
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


class QueryEngine:
    """Low-latency repeated-query interface over a built index.

    ``search()`` above is the one-shot DataFrame API (used by the oracle
    parity tests); it derives global term dfs with a window function
    every call — 3 exchanges per query. A real serving path amortizes
    index statistics across queries, so this engine:

      * caches global per-term df (one tiny filtered aggregate per batch
        of unseen terms — the merged index's term catalog at 10^12 scale),
      * injects idf JVM-side via a literal ``create_map`` (no window, no
        Python in the plan until the scorer),
      * runs the per-shard DAAT scorer, then merges per-shard top-ks with
        the ``orderBy().limit(k)`` tail — Spark compiles it to
        ``TakeOrderedAndProject`` (each task keeps its own top-k heap; the
        driver merges k rows per TASK, never per shard), so the merge
        stays bounded at 10^12-doc shard counts where a collect of
        shards-with-hits x k rows would OOM the driver.

    Per query: scan(term-pruned) -> exchange(shard, a few KB) -> scorer
    -> TakeOrderedAndProject. One exchange total.
    """

    def __init__(self, index: DataFrame, stats: dict, stem: bool = True,
                 use_wand: bool | str = "auto", camel: bool = True):
        self.index = index
        self.stats = stats
        self.stem = stem
        self.camel = camel
        self.use_wand = use_wand
        self._df_cache: dict[str, int] = {}
        self._prepared = False

    def prepare(self, num_partitions: int | None = None) -> "QueryEngine":
        """Serving-mode warm-up: cache the index HASH-PARTITIONED BY
        SHARD. Every query's ``groupBy('shard')`` then finds its required
        distribution already satisfied by the cached relation — the
        per-query exchange disappears and the scorer reads in-memory
        columnar batches (measured ~10x lower per-query latency at
        sandbox scale). The at-rest analog is writing the serving copy
        bucketed by shard. Call once; ``release()`` to unpin."""
        if not self._prepared:
            spark = self.index.sparkSession
            if num_partitions is None:
                num_partitions = max(spark.sparkContext.defaultParallelism, 2)
            self.index = self.index.repartition(num_partitions, "shard") \
                                   .persist()
            self.index.count()
            self._prepared = True
        return self

    def release(self) -> None:
        if self._prepared:
            self.index.unpersist()
            self._prepared = False

    def _ensure_stats(self, terms: list[str]) -> None:
        missing = [t for t in terms if t not in self._df_cache]
        if not missing:
            return
        rows = (self.index.filter(F.col("term").isin(missing))
                .groupBy("term").agg(F.sum("df").alias("df")).collect())
        for r in rows:
            self._df_cache[r["term"]] = int(r["df"])
        for t in missing:
            self._df_cache.setdefault(t, 0)

    def warm(self, queries: list[str]) -> None:
        """Prefetch stats for a query set in one job."""
        terms: set[str] = set()
        for q in queries:
            terms.update(tokenize(q, stem=self.stem, camel=self.camel))
        self._ensure_stats(sorted(terms))

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        df = self.topk_df(query, k)
        if df is None:
            return []
        return [(int(r["doc_id"]), float(r["score"])) for r in df.collect()]

    def topk_df(self, query: str, k: int = 10) -> DataFrame | None:
        """The query's top-k plan as a DataFrame (None for empty/unknown
        queries) — collect() yields exactly k rows via the distributed
        TakeOrderedAndProject merge."""
        qterms = sorted(set(tokenize(query, stem=self.stem,
                                     camel=self.camel)))
        if not qterms:
            return None
        self._ensure_stats(qterms)
        n_docs, avgdl = self.stats["n_docs"], self.stats["avgdl"]
        idf = {
            t: math.log((n_docs - self._df_cache[t] + 0.5)
                        / (self._df_cache[t] + 0.5) + 1.0)
            for t in qterms if self._df_cache[t] > 0
        }
        if not idf:
            return None
        use_wand = self.use_wand
        mapping = F.create_map(
            *[F.lit(x) for kv in idf.items() for x in kv])
        hits = (self.index.filter(F.col("term").isin(list(idf)))
                .withColumn("idf", mapping[F.col("term")]))

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            if use_wand == "auto":
                wand = int(pdf["df"].sum()) >= AUTO_WAND_MIN_POSTINGS
            else:
                wand = bool(use_wand)
            scorer = _score_shard_wand if wand else _score_shard_exhaustive
            return scorer(pdf, avgdl, k)

        local = hits.groupBy("shard").applyInPandas(fn, schema=TOPK_SCHEMA)
        return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def zone_search(index: DataFrame, zone_stats: dict, query: str,
                zone_weights: dict[str, float], k: int = 10,
                stem: bool = True, use_wand: bool | str = "auto",
                camel: bool = True) -> DataFrame:
    """Top-k zone-weighted BM25 over a zoned index (build_zoned_index).

    score(d) = sum over zones z of  w_z * BM25_z(q, d), where BM25_z uses
    the zone's own df / N / avgdl (zones are independent sub-indexes; the
    reference's analog is querying '@'-prefixed title keys next to bare
    body keys, index.h:320-326, with caller-side weighting).

    Plan shape is identical to ``search``: term+zone-pruned scan -> one
    shard exchange -> per-shard DAAT (the zone's weight is folded into
    the row's idf; each row carries its zone's avgdl) -> distributed
    top-k. Zone lists of the same doc range land in the same shard group,
    so the weighted sum needs no extra join or shuffle.
    """
    spark = index.sparkSession
    qterms = sorted(set(tokenize(query, stem=stem, camel=camel)))
    zones = sorted(z for z in zone_weights if z in zone_stats)
    if not qterms or not zones:
        return spark.createDataFrame([], TOPK_SCHEMA)

    hits = index.filter(F.col("term").isin(qterms)
                        & F.col("zone").isin(zones))
    # per-(zone, term) global df via aggregate + broadcast join-back
    # (skew-safe; see ``search``)
    dfs = hits.groupBy("zone", "term").agg(F.sum("df").alias("df_g"))
    hits = hits.join(F.broadcast(dfs), ["zone", "term"])
    n_map = F.create_map(*[F.lit(x) for z in zones
                           for x in (z, float(zone_stats[z]["n_docs"]))])
    w_map = F.create_map(*[F.lit(x) for z in zones
                           for x in (z, float(zone_weights[z]))])
    a_map = F.create_map(*[F.lit(x) for z in zones
                           for x in (z, float(zone_stats[z]["avgdl"]))])
    hits = (hits
            .withColumn("idf", w_map[F.col("zone")] * F.log(
                (n_map[F.col("zone")] - F.col("df_g") + 0.5)
                / (F.col("df_g") + 0.5) + 1.0))
            .withColumn("avgdl", a_map[F.col("zone")]))

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if use_wand == "auto":
            wand = int(pdf["df"].sum()) >= AUTO_WAND_MIN_POSTINGS
        else:
            wand = bool(use_wand)
        scorer = _score_shard_wand if wand else _score_shard_exhaustive
        return scorer(pdf, 0.0, k)  # per-row avgdl overrides the scalar

    local = hits.groupBy("shard").applyInPandas(fn, schema=TOPK_SCHEMA)
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


MULTI_TOPK_SCHEMA = T.StructType([
    T.StructField("query_id", T.LongType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("score", T.DoubleType(), False),
])


def _score_shard_multi(pdf: pd.DataFrame, avgdl: float,
                       qmap: dict[int, list[str]], k: int) -> pd.DataFrame:
    """Multi-query exhaustive DAAT over one shard: every term's posting
    list decodes ONCE and its per-posting BM25 contributions are shared
    across all queries containing the term; per query a numpy scatter-add
    + local top-k. Sum order stays pinned (ascending term)."""
    lists = _decode_lists(pdf, avgdl)
    contrib: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for key, docs, tfs, dls, idf, _, _, l_avgdl in lists:
        s = idf * tfs / (tfs + K1 * (1.0 - B + B * dls / l_avgdl))
        t = key[0]
        if t in contrib:
            d0, s0 = contrib[t]
            contrib[t] = (np.concatenate([d0, docs]),
                          np.concatenate([s0, s]))
        else:
            contrib[t] = (docs, s)
    out_q, out_d, out_s = [], [], []
    for qid, terms in qmap.items():
        terms_in = sorted(t for t in terms if t in contrib)
        if not terms_in:
            continue
        lo = min(int(contrib[t][0].min()) for t in terms_in)
        hi = max(int(contrib[t][0].max()) for t in terms_in)
        acc = np.zeros(hi - lo + 1, dtype=np.float64)
        for t in terms_in:
            d, s = contrib[t]
            acc[d - lo] += s
        nz = np.flatnonzero(acc)
        if nz.size == 0:
            continue
        scores = acc[nz]
        order = np.lexsort((nz, -scores))[:k]
        out_q.append(np.full(order.size, qid, dtype=np.int64))
        out_d.append((nz + lo).astype(np.int64)[order])
        out_s.append(scores[order])
    if not out_q:
        return pd.DataFrame({"query_id": np.empty(0, np.int64),
                             "doc_id": np.empty(0, np.int64),
                             "score": np.empty(0, np.float64)})
    return pd.DataFrame({"query_id": np.concatenate(out_q),
                         "doc_id": np.concatenate(out_d),
                         "score": np.concatenate(out_s)})


def search_many(index: DataFrame, stats: dict, queries: dict[int, str],
                k: int = 10, stem: bool = True,
                camel: bool = True) -> DataFrame:
    """Batch top-k BM25: the WHOLE query set in ONE Spark job.

    Returns (query_id, doc_id, score, rank), rank 1..k per query by
    (score desc, doc_id asc). All queries' terms prune one scan; each
    shard kernel decodes every hit list once and shares the per-posting
    contributions across queries — the throughput surface for eval-set /
    mining workloads where per-query job latency would dominate. The
    final per-query rank window sees at most shards-with-hits x k rows
    per query (pre-pruned by the shard kernel's local top-k).
    """
    from pyspark.sql import Window as W

    spark = index.sparkSession
    qmap = {int(qid): sorted(set(tokenize(q, stem=stem, camel=camel)))
            for qid, q in queries.items()}
    all_terms = sorted(set().union(*qmap.values())) if qmap else []
    if not all_terms:
        return spark.createDataFrame(
            [], T.StructType(MULTI_TOPK_SCHEMA.fields
                             + [T.StructField("rank", T.LongType(), False)]))
    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    if "shard" not in index.columns:
        index = index.withColumn("shard", F.lit(0))
    hits = index.filter(F.col("term").isin(all_terms))
    dfs = hits.groupBy("term").agg(F.sum("df").alias("df_g"))
    hits = hits.join(F.broadcast(dfs), "term").withColumn(
        "idf",
        F.log((F.lit(float(n_docs)) - F.col("df_g") + 0.5)
              / (F.col("df_g") + 0.5) + 1.0))

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _score_shard_multi(pdf, avgdl, qmap, k)

    local = hits.groupBy("shard").applyInPandas(fn, schema=MULTI_TOPK_SCHEMA)
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (local.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k))
