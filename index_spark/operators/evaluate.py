"""Ranking evaluation: MRR@k and nDCG@k of a result relation against a
graded relevance (qrels) relation — the eval harness a search team runs
over its query set on every index build.

All pure SQL expressions (codegen): one join of the top-k results to
qrels, two grouped aggregates, and one window over query_id for the
ideal ranking. The window partitions by QUERY — qrel sets are curated
and bounded per query, so unlike a window over terms/docs this cannot
concentrate unbounded data on one task at corpus scale.

Pinned definitions (restatable in any SQL dialect):

    rel(q, d)   caller-supplied grade (>= 0)
    full(q)     = max rel over the query's qrels (best achievable)
    RR@k        = 1 / min{rank <= k : rel > 0}, else 0   (standard MRR)
    RRfull@k    = 1 / min{rank <= k : rel = full(q) > 0}, else 0
                  (strict variant: first MAX-grade hit — NOT comparable
                  to standard MRR on graded qrels; reported as rr_full)
    DCG@k       = sum_{rank <= k} rel / log2(rank + 1)
    IDCG@k      = DCG of the qrels sorted (rel desc, doc_id asc), top k
    nDCG@k      = DCG / IDCG (0 when IDCG = 0)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranking_metrics(results: DataFrame, qrels: DataFrame,
                    k: int = 10) -> DataFrame:
    """Per-query metrics. ``results``: (query_id, doc_id, rank) with
    rank 1-based; ``qrels``: (query_id, doc_id, rel). Returns
    (query_id, rr, rr_full, dcg, idcg, ndcg), 6-decimal rounds, ordered
    by query_id; ``rr`` is standard reciprocal rank (first rel>0 hit),
    ``rr_full`` the strict first-max-grade variant."""
    res = results.select("query_id", "doc_id",
                         F.col("rank").cast("long").alias("rank")) \
                 .filter(F.col("rank") <= k)
    qr = qrels.select("query_id", "doc_id",
                      F.col("rel").cast("double").alias("rel"))
    full = qr.groupBy("query_id").agg(F.max("rel").alias("full"))

    # left joins throughout: a query with no qrels at all still scores
    # (rr=0, ndcg=0) instead of dropping from the report, and a query
    # whose judgments are all rel=0 has NO fully-relevant doc (the
    # full>0 guard — otherwise unjudged results would "achieve" full=0)
    j = (res.join(qr, ["query_id", "doc_id"], "left")
         .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0.0)))
         .join(full, "query_id", "left")
         .withColumn("full", F.coalesce(F.col("full"), F.lit(0.0))))
    gain = F.col("rel") / F.log2(F.col("rank") + 1)
    per_q = j.groupBy("query_id").agg(
        F.sum(gain).alias("dcg"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("first_rel"),
        F.min(F.when((F.col("rel") == F.col("full"))
                     & (F.col("full") > 0),
                     F.col("rank"))).alias("first_full"))

    w = Window.partitionBy("query_id").orderBy(F.desc("rel"),
                                               F.asc("doc_id"))
    ideal = (qr.withColumn("i", F.row_number().over(w))
             .filter(F.col("i") <= k)
             .groupBy("query_id")
             .agg(F.sum(F.col("rel") / F.log2(F.col("i") + 1))
                  .alias("idcg")))

    out = (per_q.join(ideal, "query_id", "left")
           .withColumn("idcg", F.coalesce(F.col("idcg"), F.lit(0.0)))
           .select(
               "query_id",
               F.round(F.when(F.col("first_rel").isNotNull(),
                              1.0 / F.col("first_rel"))
                       .otherwise(0.0), 6).alias("rr"),
               F.round(F.when(F.col("first_full").isNotNull(),
                              1.0 / F.col("first_full"))
                       .otherwise(0.0), 6).alias("rr_full"),
               F.round("dcg", 6).alias("dcg"),
               F.round("idcg", 6).alias("idcg"),
               F.round(F.when(F.col("idcg") > 0,
                              F.col("dcg") / F.col("idcg"))
                       .otherwise(0.0), 6).alias("ndcg")))
    return out.orderBy("query_id")


def hard_negatives(run: DataFrame, qrels: DataFrame, n_neg: int = 5,
                   min_rel: float = 1.0) -> DataFrame:
    """Hard-negative mining for retriever training (the DPR /
    sentence-transformers recipe, Karpukhin et al. 2020 §3.2): the
    top-scored documents a first-stage ranker retrieves that are NOT
    relevant — the informative negatives a dual-encoder trains
    against, far harder than random negatives.

    ``run``: (query_id, doc_id, score) from a bounded top-k retrieval
    (e.g. ``search_many``); ``qrels``: (query_id, doc_id, rel).
    Returns (query_id, doc_id, neg_rank, score): per query the
    ``n_neg`` highest-scored run docs whose judgment has
    rel < ``min_rel`` (unjudged docs count as rel=0 — the standard
    pooling assumption), neg_rank 1-based by score desc / doc_id asc.

    Scale shape: one left-anti join of the run against the relevant
    qrels slice, then a rank window partitioned by query_id — the run
    is k-bounded per query by contract (same as
    :func:`ranking_metrics`), so no unbounded-key window."""
    rel = (qrels.filter(F.col("rel").cast("double") >= min_rel)
           .select("query_id", "doc_id"))
    neg = run.select("query_id", F.col("doc_id").cast("long").alias("doc_id"),
                     F.col("score").cast("double").alias("score")) \
             .join(rel, ["query_id", "doc_id"], "left_anti")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("doc_id"))
    return (neg.withColumn("neg_rank",
                           F.row_number().over(w).cast("long"))
            .filter(F.col("neg_rank") <= n_neg)
            .select("query_id", "doc_id", "neg_rank", "score")
            .orderBy("query_id", "neg_rank"))


def precision_recall_metrics(results: DataFrame, qrels: DataFrame,
                             k: int = 10) -> DataFrame:
    """The set-based IR metrics completing :func:`ranking_metrics`
    (which covers RR/nDCG): per query — precision@k, recall@k, and
    average precision (AP@k, the per-query MAP summand: mean over
    relevant RETRIEVED ranks of precision-at-that-rank, divided by
    total relevant, the trec_eval definition).  Binary relevance:
    rel > 0 counts.  Returns (query_id, n_rel, n_rel_ret, p_at_k,
    r_at_k, ap), 6-decimal rounds.

    One join + two bounded aggregates (per-query state is the ≤ k
    retrieved rows); the running precision inside AP is a window over
    those same ≤ k rows — bounded by the cut, never the corpus."""
    from pyspark.sql import Window

    res = results.select("query_id", "doc_id",
                         F.col("rank").cast("long").alias("rank")) \
        .filter(F.col("rank") <= k)
    qr = qrels.select("query_id", "doc_id",
                      (F.col("rel").cast("double") > 0).alias("_isrel"))
    n_rel = (qr.filter("_isrel").groupBy("query_id")
             .agg(F.count(F.lit(1)).alias("n_rel")))
    j = (res.join(qr, ["query_id", "doc_id"], "left")
         .withColumn("_isrel",
                     F.coalesce(F.col("_isrel"), F.lit(False))))
    w = (Window.partitionBy("query_id").orderBy("rank")
         .rowsBetween(Window.unboundedPreceding, 0))
    j = j.withColumn("_cumrel",
                     F.sum(F.col("_isrel").cast("long")).over(w))
    per_q = j.groupBy("query_id").agg(
        F.sum(F.col("_isrel").cast("long")).alias("n_rel_ret"),
        F.sum(F.when(F.col("_isrel"),
                     F.col("_cumrel") / F.col("rank"))).alias("_ap_num"))
    qids = results.select("query_id").distinct()
    out = (qids.join(per_q, "query_id", "left")
           .join(n_rel, "query_id", "left")
           .select(
               "query_id",
               F.coalesce("n_rel", F.lit(0)).cast("long").alias("n_rel"),
               F.coalesce("n_rel_ret", F.lit(0)).cast("long")
               .alias("n_rel_ret"),
               F.round(F.coalesce("n_rel_ret", F.lit(0))
                       / F.lit(float(k)), 6).alias("p_at_k"),
               F.round(F.when(F.col("n_rel") > 0,
                              F.coalesce("n_rel_ret", F.lit(0))
                              / F.col("n_rel")).otherwise(0.0), 6)
               .alias("r_at_k"),
               F.round(F.when(F.col("n_rel") > 0,
                              F.coalesce("_ap_num", F.lit(0.0))
                              / F.col("n_rel")).otherwise(0.0), 6)
               .alias("ap")))
    return out.orderBy("query_id")


def err_metric(results: DataFrame, qrels: DataFrame, k: int = 10,
               max_grade: float | None = None) -> DataFrame:
    """Expected Reciprocal Rank at k (Chapelle et al., CIKM 2009) —
    the cascade-model graded metric ES exposes through the
    ``rank_eval`` API:

        R_i    = (2^rel_i - 1) / 2^g_max
        ERR@k  = sum_{i <= k}  R_i / i * prod_{j < i} (1 - R_j)

    ``g_max`` defaults to the maximum grade over the WHOLE qrels
    relation (ES's ``maximum_relevance``); pass ``max_grade`` to pin
    it.  Unjudged retrieved docs take rel = 0 (R = 0 — they never
    stop the cascade).

    One join + one bounded window per query (<= k rows of state): the
    prefix product is a windowed ``product`` aggregate over the
    shifted frame, so no per-rank rescans.  Returns (query_id, err),
    6-decimal rounds, ordered by query_id."""
    res = results.select("query_id", "doc_id",
                         F.col("rank").cast("long").alias("rank")) \
        .filter(F.col("rank") <= k)
    qr = qrels.select("query_id", "doc_id",
                      F.col("rel").cast("double").alias("rel"))
    if max_grade is None:
        row = qr.agg(F.max("rel")).collect()[0][0]
        max_grade = float(row) if row is not None else 0.0
    if max_grade <= 0:
        qids = results.select("query_id").distinct()
        return (qids.select("query_id", F.lit(0.0).alias("err"))
                .orderBy("query_id"))
    denom = float(2.0 ** max_grade)
    j = (res.join(qr, ["query_id", "doc_id"], "left")
         .withColumn("_r", (F.pow(F.lit(2.0),
                                  F.coalesce("rel", F.lit(0.0)))
                            - 1.0) / F.lit(denom)))
    w = (Window.partitionBy("query_id").orderBy("rank")
         .rowsBetween(Window.unboundedPreceding, -1))
    j = j.withColumn("_stop",
                     F.coalesce(F.product(1.0 - F.col("_r")).over(w),
                                F.lit(1.0)))
    per_q = (j.groupBy("query_id")
             .agg(F.sum(F.col("_r") / F.col("rank") * F.col("_stop"))
                  .alias("_err")))
    qids = results.select("query_id").distinct()
    return (qids.join(per_q, "query_id", "left")
            .select("query_id",
                    F.round(F.coalesce("_err", F.lit(0.0)), 6)
                    .alias("err"))
            .orderBy("query_id"))


def rbp_metric(results: DataFrame, qrels: DataFrame, k: int = 10,
               p: float = 0.8) -> DataFrame:
    """Rank-Biased Precision at depth k (Moffat & Zobel, TOIS 2008) —
    the user-model metric completing :func:`ranking_metrics` (RR/nDCG),
    :func:`precision_recall_metrics` (P/R/AP) and :func:`err_metric`:
    a user inspects rank i+1 with persistence ``p``, so

        rbp      = (1 - p) * sum_{i<=k} [rel_i > 0] * p^(i-1)
        residual = p^k        (the mass an evaluation truncated at k
                               cannot observe — RBP's upper-bound gap)

    Binary relevance (rel > 0), unjudged = non-relevant, 6-decimal
    rounds, one row per query ordered by query_id. A query whose
    retrieved set has no judged-relevant doc scores rbp=0 rather than
    dropping. One join + one bounded aggregate over the <= k retrieved
    rows per query — never the corpus."""
    if not 0.0 < p < 1.0:
        raise ValueError(f"persistence p must be in (0, 1), got {p}")
    res = results.select("query_id", "doc_id",
                         F.col("rank").cast("long").alias("rank")) \
        .filter(F.col("rank") <= k)
    qr = qrels.select("query_id", "doc_id",
                      (F.col("rel").cast("double") > 0).alias("_isrel"))
    j = (res.join(qr, ["query_id", "doc_id"], "left")
         .withColumn("_isrel", F.coalesce(F.col("_isrel"),
                                          F.lit(False))))
    gain = F.when(F.col("_isrel"),
                  F.pow(F.lit(float(p)), F.col("rank") - 1)) \
            .otherwise(F.lit(0.0))
    return (j.groupBy("query_id")
            .agg(F.round((1.0 - p) * F.sum(gain), 6).alias("rbp"),
                 F.round(F.lit(float(p) ** k), 6).alias("residual"))
            .orderBy("query_id"))


def rbo_metric(run_a: DataFrame, run_b: DataFrame, k: int = 10,
               p: float = 0.9) -> DataFrame:
    """Rank-Biased Overlap between two rankings (Webber, Moffat &
    Zobel, TOIS 2010) — the top-weighted rank-similarity metric for
    comparing two engines / two configurations on the same query set
    (e.g. this engine vs the reference, exact vs quantized norms).

    Pinned contract — the truncated prefix form at depth ``k``:

        X_d  = |A[:d] n B[:d]|          (shared docs at depth d)
        rbo  = (1 - p) * sum_{d=1..k} p^(d-1) * X_d / d
        overlap_at_k = X_k / k

    Inputs: (query_id, doc_id, rank) each, rank 1-based; ranks beyond
    ``k`` are ignored. Identical prefixes give rbo = 1 - p^k (the
    truncated maximum); disjoint ones 0. 6-decimal rounds, one row per
    query (a query present in either run scores — no silent drops).

    Plan: one equi-join on (query_id, doc_id) — a shared doc enters
    X_d for every d >= max(rank_a, rank_b) — then a k-row literal
    depth relation joins per query (k*|queries| rows total) and one
    bounded aggregate; nothing scales with the corpus."""
    if not 0.0 < p < 1.0:
        raise ValueError(f"persistence p must be in (0, 1), got {p}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = run_a.sparkSession
    a = run_a.select("query_id", "doc_id",
                     F.col("rank").cast("long").alias("rank_a")) \
        .filter(F.col("rank_a") <= k)
    b = run_b.select("query_id", "doc_id",
                     F.col("rank").cast("long").alias("rank_b")) \
        .filter(F.col("rank_b") <= k)
    shared = (a.join(b, ["query_id", "doc_id"])
              .select("query_id",
                      F.greatest("rank_a", "rank_b").alias("m")))
    qs = (a.select("query_id").union(b.select("query_id")).distinct())
    depths = spark.range(1, k + 1).select(F.col("id").alias("d"))
    x = (shared.join(depths, shared["m"] <= depths["d"])
         .groupBy("query_id", "d")
         .agg(F.count(F.lit(1)).alias("x")))
    grid = qs.crossJoin(depths)
    per_d = (grid.join(x, ["query_id", "d"], "left")
             .withColumn("x", F.coalesce("x", F.lit(0))))
    term = F.pow(F.lit(float(p)), F.col("d") - 1) * F.col("x") \
        / F.col("d")
    return (per_d.groupBy("query_id")
            .agg(F.round((1.0 - p) * F.sum(term), 6).alias("rbo"),
                 F.round(F.max(F.when(F.col("d") == k, F.col("x")))
                         / float(k), 6).alias("overlap_at_k"))
            .orderBy("query_id"))


def _tdi_coin(query_id: int, rnd: int, seed: int) -> bool:
    """Pinned fair coin for team-draft round ``rnd``: True = team A
    picks first. Same portable LCG family as function_score's
    random_score (query.py) so any engine reproduces the draft; the
    round passes THROUGH the multiplier — an additive-only round term
    would shift h by a few thousand out of 2^32 and almost never flip
    the top-bit coin within a draft.  The seed is avalanched with
    splitmix32 and XOR-mixed into the state BEFORE the multiplier (not
    added to the round slot, which would make seed s round r equal
    seed 0 round r+s — round-shifted, fully correlated
    "re-randomizations"; and a single-multiply Knuth hash left ~69%
    top-bit agreement between seeds).  XORing out splitmix32(0) makes
    seed 0 the exact identity, so seed-0 drafts are unchanged.  Pure
    shift/xor/multiply — restatable in any SQL engine."""
    sh = _splitmix32(seed) ^ 2462723854       # splitmix32(0)
    h = (((query_id * 4096 + rnd) ^ sh) * 1103515245 + 12345) \
        % 4294967296
    return h < 2147483648


def _splitmix32(x: int) -> int:
    """32-bit splitmix finalizer (public domain; Steele et al. 2014
    'Fast Splittable Pseudorandom Number Generators', 32-bit constants
    per the widely-used murmur3-finalizer variant)."""
    m = 4294967296
    x = (x + 0x9E3779B9) % m
    x ^= x >> 16
    x = (x * 0x85EBCA6B) % m
    x ^= x >> 13
    x = (x * 0xC2B2AE35) % m
    return x ^ (x >> 16)


def team_draft_interleave(run_a: DataFrame, run_b: DataFrame,
                          k: int = 10, seed: int = 0) -> DataFrame:
    """Team-draft interleaving (Radlinski, Kurup & Joachims, CIKM
    2008) — the online-evaluation primitive: merge two rankings into
    ONE list to show users, remembering which team contributed each
    position so clicks credit a side (:func:`team_draft_credit`).

    Per query and round r = 0, 1, ...: a pinned coin (:func:`_tdi_coin`
    — deterministic, so the same (query, seed) always serves the same
    list) decides which team picks first; each team then appends its
    highest-ranked document not already in the interleaved list, until
    ``k`` positions are filled or both rankings are exhausted.

    Inputs: (query_id, doc_id, rank) each. Returns (query_id, pos,
    doc_id, team) with pos 1-based and team 'a'/'b'.

    Plan: ranks are capped at 2k before the draft (a team can be
    blocked at most k times, so depth 2k suffices), the union is
    grouped per query_id and drafted in a BOUNDED <= 4k-row pandas
    kernel — per-query state never scales with the corpus — and the
    output is <= k rows per query. Sequential drafting is inherent to
    the protocol; the parallelism axis is queries, which is the axis
    an interleaving experiment actually has."""
    from pyspark.sql import types as T
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cap = 2 * k
    a = run_a.select("query_id", "doc_id",
                     F.col("rank").cast("long").alias("rank"),
                     F.lit("a").alias("team")).filter(F.col("rank") <= cap)
    b = run_b.select("query_id", "doc_id",
                     F.col("rank").cast("long").alias("rank"),
                     F.lit("b").alias("team")).filter(F.col("rank") <= cap)
    both = a.unionByName(b)
    schema = T.StructType([
        T.StructField("query_id", T.LongType(), False),
        T.StructField("pos", T.LongType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("team", T.StringType(), False),
    ])

    def draft(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["query_id"].iloc[0])
        ranks = {}
        for t in ("a", "b"):
            sub = pdf[pdf["team"] == t].sort_values("rank")
            ranks[t] = [int(d) for d in sub["doc_id"]]
        chosen: list[tuple] = []
        in_list: set = set()
        ptr = {"a": 0, "b": 0}

        def pick(t: str) -> bool:
            lst = ranks[t]
            while ptr[t] < len(lst) and lst[ptr[t]] in in_list:
                ptr[t] += 1
            if ptr[t] >= len(lst):
                return False
            d = lst[ptr[t]]
            in_list.add(d)
            chosen.append((qid, len(chosen) + 1, d, t))
            return True

        rnd = 0
        while len(chosen) < k:
            first = "a" if _tdi_coin(qid, rnd, seed) else "b"
            second = "b" if first == "a" else "a"
            got_first = pick(first) if len(chosen) < k else False
            got_second = pick(second) if len(chosen) < k else False
            if not got_first and not got_second:
                break
            rnd += 1
        return pd.DataFrame(chosen,
                            columns=["query_id", "pos", "doc_id",
                                     "team"])

    return (both.groupBy("query_id").applyInPandas(draft, schema=schema)
            .orderBy("query_id", "pos"))


def team_draft_credit(interleaved: DataFrame, clicks: DataFrame
                      ) -> DataFrame:
    """Click-credit attribution for a team-draft experiment: join the
    interleaved list against observed clicks (query_id, doc_id), count
    clicked positions per team, and call the per-query winner ('a',
    'b', or 'tie' — including the no-clicks case, the TDI convention).
    Two bounded joins; rows per query <= k."""
    cl = clicks.select("query_id", "doc_id").distinct() \
               .withColumn("_c", F.lit(1))
    j = (interleaved.join(cl, ["query_id", "doc_id"], "left")
         .withColumn("_c", F.coalesce("_c", F.lit(0))))
    out = (j.groupBy("query_id").agg(
        F.sum(F.when(F.col("team") == "a", F.col("_c"))
              .otherwise(F.lit(0))).alias("clicks_a"),
        F.sum(F.when(F.col("team") == "b", F.col("_c"))
              .otherwise(F.lit(0))).alias("clicks_b")))
    return (out.withColumn(
        "winner",
        F.when(F.col("clicks_a") > F.col("clicks_b"), F.lit("a"))
         .when(F.col("clicks_b") > F.col("clicks_a"), F.lit("b"))
         .otherwise(F.lit("tie")))
        .orderBy("query_id"))
